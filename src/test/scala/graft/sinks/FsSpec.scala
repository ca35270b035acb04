package graft.sinks

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.plans.Watermark

/** Atomicity of the state-file commit point: `Fs.writeString` must never
  * leave a truncated destination visible — the pipeline's crash
  * consistency hangs on `latest.json` always parsing (reference
  * temp-then-upload semantics, cli.py:226-243).
  */
class FsSpec extends AnyFunSuite with SparkTestBase {

  private def conf = spark.sparkContext.hadoopConfiguration

  private def tmp(): String = Files.createTempDirectory("graft-fs").toString

  test("writeString round-trips and overwrites") {
    val p = s"${tmp()}/latest.json"
    Fs.writeString(p, "v1", conf)
    assert(Fs.readString(p, conf).contains("v1"))
    Fs.writeString(p, "v2-longer-content", conf)
    assert(Fs.readString(p, conf).contains("v2-longer-content"))
  }

  test("no temp residue is left after a successful write") {
    val dir = tmp()
    val p = s"$dir/latest.json"
    Fs.writeString(p, "content", conf)
    Fs.writeString(p, "content2", conf)
    // Hadoop's checksummed local FS keeps a `.crc` sibling; what must NOT
    // remain is the write's own `.tmp` staging file
    val listed = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filterNot(_.endsWith(".crc"))
    assert(listed.toSeq === Seq(p))
  }

  test("a crash mid-write leaves the old committed file intact") {
    val dir = tmp()
    val root = dir
    val wm = Watermark("sg", "dep", 1L, 0L, 100L)
    Watermark.commit(root, wm, conf)

    // simulate a writer that died after partially writing its temp file:
    // the half-written bytes live at the hidden temp path, never at the
    // destination
    val truncated = Watermark.toJson(wm.copy(latestBlock = 200L)).take(17)
    Files.write(Paths.get(dir, ".latest.json.tmp"), truncated.getBytes)

    // the committed watermark still parses — the commit is all-or-nothing
    assert(Watermark.read(root, conf).contains(wm))

    // and the next commit succeeds and wins
    val wm2 = wm.copy(latestBlock = 300L)
    Watermark.commit(root, wm2, conf)
    assert(Watermark.read(root, conf).contains(wm2))
  }

  test("first-ever commit: reader sees either nothing or a complete file") {
    val root = tmp()
    // before any commit: absent, not half-present
    assert(Watermark.read(root, conf).isEmpty)
    // a crashed first attempt leaves only temp residue — still absent
    Files.write(Paths.get(root, ".latest.json.tmp"), "{\"subgr".getBytes)
    assert(Watermark.read(root, conf).isEmpty)
    val wm = Watermark("sg", "dep", 1L, 0L, 50L)
    Watermark.commit(root, wm, conf)
    assert(Watermark.read(root, conf).contains(wm))
  }
}
