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

  /** Atomic small-file write: content goes to a hidden sibling temp file
    * which is then renamed over the destination, so a reader (or a crash
    * mid-write) can only ever observe the old complete file, no file, or
    * the new complete file — never a truncated one. This is the commit
    * point of the whole pipeline ([[graft.plans.Watermark.commit]] and the
    * config write go through here), mirroring the reference's
    * temp-file-then-upload discipline (subgraph_extractor/cli.py:226-243).
    */
  def writeString(path: String, content: String, conf: Configuration): Unit = {
    val (f, p) = fs(path, conf)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = f.create(tmp, true)
    try {
      out.write(content.getBytes(StandardCharsets.UTF_8))
      out.hflush()
    } finally out.close()
    try {
      // FileContext.rename(OVERWRITE) is atomic on HDFS and posix-rename
      // on local; fall back to delete+rename where FileContext is
      // unsupported (old complete vs new complete — still never partial).
      org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
        .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException |
          _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        if (f.exists(p)) f.delete(p, false)
        if (!f.rename(tmp, p))
          throw new java.io.IOException(s"atomic rename $tmp -> $p failed")
    }
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
