package graft.extract

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.{Footer, ParquetFileReader, ParquetFileWriter}

/** `_metadata` summary sink (K2, reference cli.py:245-273): collect the
  * footer of every data fragment under a table directory and write one
  * combined `_metadata` file, so planners can enumerate row groups and
  * stats without listing or opening fragments.
  *
  * Spark itself only writes `_SUCCESS`; this uses parquet-hadoop's
  * writeMetadataFile, which rewrites fragment paths relative to the
  * output directory — the same relative-path contract the reference
  * implements by hand (cli.py:259-268).
  */
object MetadataSink {

  /** Collect footers of all `*.parquet` files under `tableDir`
    * (recursive, skipping `_`-prefixed files) and write
    * `tableDir/_metadata`. Returns the number of fragments summarized.
    */
  def writeMetadata(tableDir: String, conf: Configuration): Int = {
    val dir = new Path(tableDir)
    val fs = dir.getFileSystem(conf)
    val it = fs.listFiles(dir, true)
    val files = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next()).toList
      .filter { s =>
        val n = s.getPath.getName
        n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
      }
      .sortBy(_.getPath.toString)
    val footers = files.map { s =>
      val meta = ParquetFileReader.readFooter(conf, s.getPath,
        ParquetMetadataConverter.NO_FILTER)
      new Footer(s.getPath, meta)
    }
    if (footers.nonEmpty)
      ParquetFileWriter.writeMetadataFile(conf, dir, footers.asJava)
    footers.size
  }

  /** Total row count recorded in a `_metadata` file — the cheap
    * "plan without opening fragments" read path.
    */
  def rowCountFromMetadata(tableDir: String, conf: Configuration): Long = {
    val p = new Path(tableDir, ParquetFileWriter.PARQUET_METADATA_FILE)
    val meta = ParquetFileReader.readFooter(conf, p, ParquetMetadataConverter.NO_FILTER)
    meta.getBlocks.asScala.map(_.getRowCount).sum
  }
}
