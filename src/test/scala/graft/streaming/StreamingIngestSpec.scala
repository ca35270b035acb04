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

  test("an unreadable index dir (crash mid index write) heals instead of wedging the stream") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("heal-store").toString + "/data"
    // an existing store with one admitted doc, but an index dir that a
    // crash left EXISTING yet holding no committed parquet — before the
    // fix, reading it to count threw on every micro-batch, ahead of the
    // heal, wedging the stream permanently
    Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "src", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(store)
    val iDir = StreamingIngest.indexDir(store)
    assert(new File(iDir, "_temporary").mkdirs())
    val batch = Seq(
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "src", 10L),
      (3L, "completely novel words that match nothing admitted before now", "en", "src", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    StreamingIngest.admitBatch(batch, store)
    val stored = spark.read.parquet(store)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(stored == Set(1L, 3L),
      "doc 2 is an exact copy of stored doc 1; the heal must let the probe see it")
    // the healed index covers the whole store (1:1 with store rows)
    assert(spark.read.parquet(iDir).count() === 2L)
    spark.catalog.clearCache()
  }

  test("the validation memo never excuses a missing index; invalidate() forces the heal") {
    val s = spark
    import s.implicits._
    def doc(id: Long, text: String) = (id, text, "en", "src", text.length.toLong)
    def batch(rows: (Long, String, String, String, Long)*) =
      rows.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
    val store = Files.createTempDirectory("memo-store").toString + "/data"
    val iDir = StreamingIngest.indexDir(store)
    def storeN() = spark.read.parquet(store).count()
    def idxN() = spark.read.parquet(iDir).count()

    // batch 1 creates the store and marks the memo fresh
    StreamingIngest.admitBatch(batch(doc(1L,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa")), store)
    assert(storeN() == 1L && idxN() == 1L)

    // an external DELETE of the index inside the cadence window: the
    // memo must not excuse a missing dir — the next batch heals instead
    // of throwing on the index read
    assert(graft.sinks.Fs.delete(iDir, spark.sparkContext.hadoopConfiguration))
    StreamingIngest.admitBatch(batch(doc(2L,
      "completely novel words that match nothing admitted before now")), store)
    assert(storeN() == 2L && idxN() == 2L, "missing index must re-derive")

    // an out-of-band divergence the existence probe CANNOT see: an
    // extra fragment duplicated into the index dir. The memo (still
    // inside its 64-batch cadence) legitimately skips the count check —
    // the divergence persists through the next batch...
    val part = new File(iDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.copy(part.toPath, new File(iDir, "dup-" + part.getName).toPath)
    val diverged = idxN()
    assert(diverged > storeN())
    StreamingIngest.admitBatch(batch(doc(3L,
      "further fresh content keeps arriving with unseen vocabulary")), store)
    assert(idxN() == diverged + 1L, "memo window: divergence persists")
    // ...until an out-of-band writer declares itself: invalidate()
    // drops the memo and the next batch takes the full disk check
    StreamingIngest.invalidate(store)
    StreamingIngest.admitBatch(batch(doc(4L,
      "one more entirely distinct document closes out the scenario")), store)
    assert(storeN() == 4L && idxN() == 4L,
      "post-invalidate batch must heal the diverged index")
    spark.catalog.clearCache()
  }

  test("streaming quartile drops equal the batch pipeline's admitted store") {
    // the capstone equivalence: four file-drops drained one per
    // micro-batch admit EXACTLY the docs four watermark-chained batch
    // runs admit — the registry semantics (previously ADMITTED content
    // only) are the same state machine in both execution models
    val d = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, d)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    val dmax = docs.last._1
    val tier = graft.operators.Dedup.ingestTier(dmax)
    def cov(k: Int): Long = (dmax + 1) * k / 4 / tier * tier

    // batch side: four chained IngestionPipeline runs
    val storeB = Files.createTempDirectory("equiv-batch").toString
    (1 to 4).foreach { k =>
      graft.extract.IngestionPipeline.ingest(spark, d, storeB,
        latestDocId = (dmax + 1) * k / 4, tierSizes = Seq(4L * tier, tier))
    }
    val batchAdmitted = graft.extract.IngestionPipeline
      .committedStore(spark, d, storeB, Seq(4L * tier, tier))
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // stream side: the same quartiles as files, one per micro-batch
    val src = Files.createTempDirectory("equiv-src").toString
    val storeS = Files.createTempDirectory("equiv-store").toString + "/data"
    val ckpt = Files.createTempDirectory("equiv-ckpt").toString
    val t0 = 1700000000000L
    (1 to 4).foreach { k =>
      val rows = docs.filter { case (id, _) => id >= cov(k - 1) && id < cov(k) }
      if (rows.nonEmpty)
        writeDrop(src, s"q$k.parquet", t0 + k * 60000, rows.toSeq)
    }
    StreamingIngest.run(spark, src, schema, storeS, ckpt)
    val streamAdmitted = spark.read.parquet(storeS)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamAdmitted == batchAdmitted,
      s"stream-only: ${(streamAdmitted -- batchAdmitted).toSeq.sorted.take(5)}; " +
        s"batch-only: ${(batchAdmitted -- streamAdmitted).toSeq.sorted.take(5)}")
    spark.catalog.clearCache()
  }
}
