package graft.extract

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.format.converter.ParquetMetadataConverter
import org.apache.parquet.hadoop.{Footer, ParquetFileReader, ParquetFileWriter}

import graft.plans.Partition

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
    *
    * Only safe when every fragment on disk belongs to the current plan —
    * prefer [[writeMetadata(tableDir:String,plan:Seq[graft\.plans\.Partition],conf:org\.apache\.hadoop\.conf\.Configuration)*
    * the plan-scoped overload]], which cannot double-count blocks when a
    * grown range makes a larger tier supersede smaller partitions
    * (reference writes `_metadata` from the current plan's partitions
    * only, cli.py:328 + cli.py:245-273).
    */
  def writeMetadata(tableDir: String, conf: Configuration): Int = {
    val dir = new Path(tableDir)
    val fs = dir.getFileSystem(conf)
    writeFooters(dir, listFragments(fs, dir, conf), conf)
  }

  /** Plan-scoped `_metadata`: summarize ONLY fragments inside the given
    * plan's partition directories. Fragments of superseded partitions
    * (a smaller tier now covered by a larger one) are excluded, so
    * `_metadata`-driven readers never see a block twice even if stale
    * directories still exist on disk.
    */
  def writeMetadata(tableDir: String, plan: Seq[Partition],
      conf: Configuration): Int = {
    val dir = new Path(tableDir)
    val fs = dir.getFileSystem(conf)
    val files = plan.map(p => new Path(dir, p.relativePath))
      .filter(fs.exists)
      .flatMap(pd => listFragments(fs, pd, conf))
      .sortBy(_.toString)
    writeFooters(dir, files, conf)
  }

  /** Delete partition directories under `tableDir` that are provably
    * SUPERSEDED by the current plan: a directory `[start, end)` of tier
    * `size` is stale only when some plan partition of a STRICTLY larger
    * tier fully covers it (`p.size > size && p.start <= start &&
    * end <= p.end`) — i.e. its rows are guaranteed to also exist inside a
    * bigger fragment written by this plan. Everything else survives:
    *  - partitions past the plan's aligned end (e.g. head partitions
    *    written by [[graft.streaming.StreamingExtract]] sharing the same
    *    table directory — their source rows are already consumed and
    *    unrecoverable),
    *  - tiers not present in the plan's `partitionSizes`,
    *  - any directory whose segments don't parse as a partition,
    *  - committed data when the catalog's block range regresses (reorg):
    *    a shrunken plan covers nothing it didn't write.
    * The reference never deletes files at all (cli.py:328); pruning here
    * is purely the supersede cleanup, so it must never be lossy.
    * Returns the deleted directories. Safe after a successful extract:
    * plan content is deterministic and the watermark commits later, so a
    * crash between write and prune just re-prunes next run (idempotent).
    */
  def pruneStalePartitions(tableDir: String, plan: Seq[Partition],
      conf: Configuration): Seq[String] = {
    val dir = new Path(tableDir)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return Nil
    val planSet = plan.map(_.relativePath).toSet
    def seg(name: String, prefix: String): Option[Long] =
      if (name.startsWith(prefix)) name.stripPrefix(prefix).toLongOption
      else None
    def superseded(size: Long, start: Long, end: Long): Boolean =
      plan.exists(p => p.size > size && p.start <= start && end <= p.end)
    val stale = for {
      sizeDir <- fs.listStatus(dir).toSeq if sizeDir.isDirectory
      size <- seg(sizeDir.getPath.getName, "partition_size=").toSeq
      startDir <- fs.listStatus(sizeDir.getPath).toSeq if startDir.isDirectory
      start <- seg(startDir.getPath.getName, "start_partition=").toSeq
      endDir <- fs.listStatus(startDir.getPath).toSeq if endDir.isDirectory
      end <- seg(endDir.getPath.getName, "end_partition=").toSeq
      rel = s"${sizeDir.getPath.getName}/${startDir.getPath.getName}/${endDir.getPath.getName}"
      if !planSet.contains(rel) && superseded(size, start, end)
    } yield endDir.getPath
    stale.foreach(fs.delete(_, true))
    // drop now-empty intermediate dirs so listings stay clean
    for {
      sizeDir <- fs.listStatus(dir).toSeq if sizeDir.isDirectory &&
        sizeDir.getPath.getName.startsWith("partition_size=")
      startDir <- fs.listStatus(sizeDir.getPath).toSeq if startDir.isDirectory
      if fs.listStatus(startDir.getPath).isEmpty
    } fs.delete(startDir.getPath, false)
    for {
      sizeDir <- fs.listStatus(dir).toSeq if sizeDir.isDirectory &&
        sizeDir.getPath.getName.startsWith("partition_size=")
      if fs.listStatus(sizeDir.getPath).isEmpty
    } fs.delete(sizeDir.getPath, false)
    stale.map(_.toString)
  }

  private def listFragments(fs: org.apache.hadoop.fs.FileSystem, dir: Path,
      conf: Configuration): List[Path] = {
    val it = fs.listFiles(dir, true)
    Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next()).toList
      .filter { s =>
        val n = s.getPath.getName
        n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(_.getPath)
      .sortBy(_.toString)
  }

  private def writeFooters(dir: Path, files: Seq[Path],
      conf: Configuration): Int = {
    val footers = files.map { p =>
      val meta = ParquetFileReader.readFooter(conf, p,
        ParquetMetadataConverter.NO_FILTER)
      new Footer(p, meta)
    }
    if (footers.nonEmpty)
      ParquetFileWriter.writeMetadataFile(conf, dir, footers.asJava)
    footers.size
  }

  /** Incremental `_metadata` update: footers of fragments under
    * `written` partitions are read fresh; every other plan partition's
    * row-group metadata is lifted out of the EXISTING `_metadata` file
    * instead of re-opening its fragments. An incremental run therefore
    * does O(|new fragments|) footer reads, not O(|all fragments|) — the
    * difference between a constant-cost head append and a full remote
    * directory sweep once a table holds thousands of fragments.
    * Falls back to the full plan-scoped rebuild when no `_metadata`
    * exists yet. Output is byte-equivalent to a full rebuild (covered by
    * ExtractPipelineSpec).
    */
  def writeMetadata(tableDir: String, plan: Seq[Partition],
      written: Seq[Partition], conf: Configuration): Int = {
    val dir = new Path(tableDir)
    val fs = dir.getFileSystem(conf)
    val metaPath = new Path(dir, ParquetFileWriter.PARQUET_METADATA_FILE)
    if (!fs.exists(metaPath)) return writeMetadata(tableDir, plan, conf)

    val old = ParquetFileReader.readFooter(conf, metaPath,
      ParquetMetadataConverter.NO_FILTER)
    val writtenPrefixes = written.map(_.relativePath)
    val keepPrefixes = plan.map(_.relativePath)
      .filterNot(writtenPrefixes.contains)
    // old blocks, grouped per fragment file, for plan partitions that
    // were NOT rewritten this run
    val kept = old.getBlocks.asScala.toSeq
      .filter { b =>
        val p = b.getPath
        // segment-safe prefix: "end_partition=10" must not match
        // "end_partition=100/..."
        keepPrefixes.exists(pre => p.startsWith(pre + "/"))
      }
      .groupBy(_.getPath)
      .toSeq
      .map { case (rel, blocks) =>
        // qualify so kept and freshly-listed paths sort/relativize alike
        new Footer(fs.makeQualified(new Path(dir, rel)),
          new org.apache.parquet.hadoop.metadata.ParquetMetadata(
            old.getFileMetaData, blocks.asJava))
      }
    // fresh footers only for this run's partitions
    val fresh = written.map(p => new Path(dir, p.relativePath))
      .filter(fs.exists)
      .flatMap(pd => listFragments(fs, pd, conf))
      .map { p =>
        new Footer(p, ParquetFileReader.readFooter(conf, p,
          ParquetMetadataConverter.NO_FILTER))
      }
    val footers = (kept ++ fresh).sortBy(_.getFile.toString)
    if (footers.nonEmpty)
      ParquetFileWriter.writeMetadataFile(conf, dir, footers.asJava)
    footers.size
  }

  /** Fragment file paths recorded in a `_metadata` file, resolved
    * against `tableDir` — the reader-side half of the summary contract:
    * a planner enumerates exactly the fragments the writer summarized,
    * without listing the directory tree (reference readers build their
    * dataset from `_metadata` the same way,
    * tests/test_get_column_info.py:117-122).
    */
  def fragmentPaths(tableDir: String, conf: Configuration): Seq[String] = {
    val dir = new Path(tableDir)
    val p = new Path(dir, ParquetFileWriter.PARQUET_METADATA_FILE)
    // zero-fragment tables legitimately have no _metadata (the writer
    // skips empty footer lists) — that's "no fragments", not an error
    if (!dir.getFileSystem(conf).exists(p)) return Nil
    val meta = ParquetFileReader.readFooter(conf, p, ParquetMetadataConverter.NO_FILTER)
    meta.getBlocks.asScala.map(_.getPath).distinct.toSeq
      .map(rel => new Path(dir, rel).toString)
  }

  /** Total row count recorded in a `_metadata` file — the cheap
    * "plan without opening fragments" read path.
    */
  def rowCountFromMetadata(tableDir: String, conf: Configuration): Long = {
    val p = new Path(tableDir, ParquetFileWriter.PARQUET_METADATA_FILE)
    if (!p.getFileSystem(conf).exists(p)) return 0L
    val meta = ParquetFileReader.readFooter(conf, p, ParquetMetadataConverter.NO_FILTER)
    meta.getBlocks.asScala.map(_.getRowCount).sum
  }
}
