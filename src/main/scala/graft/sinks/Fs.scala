package graft.sinks

import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Small-file I/O through the Hadoop FileSystem abstraction.
  *
  * The reference hand-rolls transparent local/S3 writes with temp files
  * and a CloudPath prefix hack (subgraph_extractor/cli.py:220-243);
  * Hadoop's FileSystem gives the same transparency for `file://`,
  * `s3a://`, `hdfs://`, ... natively, so state/config files land next to
  * the data wherever the data lives.
  */
object Fs {

  def fs(path: String, conf: Configuration): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(conf), p)
  }

  def writeString(path: String, content: String, conf: Configuration): Unit = {
    val (f, p) = fs(path, conf)
    val out = f.create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def readString(path: String, conf: Configuration): Option[String] = {
    val (f, p) = fs(path, conf)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  def exists(path: String, conf: Configuration): Boolean = {
    val (f, p) = fs(path, conf)
    f.exists(p)
  }

  def delete(path: String, conf: Configuration): Boolean = {
    val (f, p) = fs(path, conf)
    f.delete(p, true)
  }
}
