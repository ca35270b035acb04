package graft.streaming

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The streaming admission loop's contract: the registry grows BETWEEN
  * micro-batches (a copy arriving in a later file is rejected by store
  * content the stream itself admitted), replays converge instead of
  * duplicating, and a later drain picks up only new files.
  */
class StreamingIngestSpec extends AnyFunSuite with SparkTestBase {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def writeDrop(dir: String, name: String, mtime: Long,
      rows: Seq[(Long, String)]): Unit = {
    val s = spark
    import s.implicits._
    val tmp = Files.createTempDirectory("drop-stage").toString
    rows.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new File(tmp).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    val dst = new File(dir, name)
    Files.copy(part.toPath, dst.toPath)
    // deterministic batch ORDER: the file source sorts by mod time
    assert(dst.setLastModified(mtime))
  }

  test("registry grows across micro-batches; replays and re-drains converge") {
    val src = Files.createTempDirectory("stream-ingest-src").toString
    val store = Files.createTempDirectory("stream-ingest-store").toString + "/data"
    val ckpt = Files.createTempDirectory("stream-ingest-ckpt").toString

    val txtA = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "mu nu xi omicron pi rho sigma tau upsilon phi")
    val txtNear = txtA.replace("phi", "chi") // jaccard 17/19 >= 0.8
    val txtB = "one two three four five six seven eight nine ten eleven"
    val txtC = "totally different content with many new words in this row"

    val t0 = 1700000000000L
    writeDrop(src, "drop1.parquet", t0, Seq(1L -> txtA, 2L -> txtB))
    // file 2 lands later: an exact copy, a near copy, and a fresh doc —
    // all three probe against what file 1's batch ADMITTED
    writeDrop(src, "drop2.parquet", t0 + 60000, Seq(
      10L -> txtA, 11L -> txtNear, 12L -> txtC))

    StreamingIngest.run(spark, src, schema, store, ckpt)
    def stored(): Set[Long] = spark.read.parquet(store)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(stored() == Set(1L, 2L, 12L),
      "file-2 copies must be rejected by file-1's admitted content")

    // replay: same checkpoint, no new files -> no change
    StreamingIngest.run(spark, src, schema, store, ckpt)
    assert(stored() == Set(1L, 2L, 12L))

    // a later drain admits only the novel doc of the new drop
    writeDrop(src, "drop3.parquet", t0 + 120000, Seq(
      20L -> txtC, 21L -> "yet more unseen words appear here today friends"))
    StreamingIngest.run(spark, src, schema, store, ckpt)
    assert(stored() == Set(1L, 2L, 12L, 21L),
      "doc 20 is an exact copy of admitted doc 12; 21 is novel")
    spark.catalog.clearCache()
  }
}
