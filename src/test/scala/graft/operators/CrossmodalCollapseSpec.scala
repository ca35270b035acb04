package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.Tables

/** Pins that the guarded group-collapse in [[Similarity.crossmodalAudit]]
  * is row-identical to the naive shape (expand pairs, join embeddings
  * per pair, cosine per pair) — on real testdata AND on a doctored
  * fixture whose exact-dup group carries MIXED embeddings, which forces
  * the per-pair fallback path the collapse must not skip.
  */
class CrossmodalCollapseSpec extends AnyFunSuite with SparkTestBase {

  /** The pre-collapse implementation, kept as the reference semantics. */
  private def naiveAudit(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    Dedup.dedupMinhashLshPairs(spark, d)
      .join(emb.toDF("doc_a", "emb_a"), Seq("doc_a"), "left")
      .join(emb.toDF("doc_b", "emb_b"), Seq("doc_b"), "left")
      .select(col("doc_a"), col("doc_b"), col("est_jaccard_e4"),
        when(col("emb_a").isNotNull && col("emb_b").isNotNull,
          Similarity.cosE6Declarative("emb_a", "emb_b")).as("cos_e6"))
      .withColumn("embeds_agree",
        coalesce(col("cos_e6") >= Similarity.DefaultCrossmodalMinCos, lit(false)))
      .orderBy("doc_a", "doc_b")
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString)

  test("collapsed audit is row-identical to the naive shape on sf0.01") {
    val d = "/root/testdata/sf0.01"
    val got = rows(Similarity.crossmodalAuditPairs(spark, d))
    val want = rows(naiveAudit(spark, d))
    assert(got.size == want.size, s"row counts differ: ${got.size} vs ${want.size}")
    assert(got == want)
    spark.catalog.clearCache()
  }

  test("mixed-embedding exact-dup group routes through the fallback, identically") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("crossmodal-fx").toString
    // five docs, three exact-dup groups:
    //   {1,2,3}: identical text, doc 3's embedding DIFFERS -> non-uniform
    //   {4,5}:   identical text, identical embeddings     -> uniform
    // doc text is long enough to shingle (>= 3 tokens)
    val txt1 = "alpha beta gamma delta epsilon zeta eta theta"
    val txt2 = "iota kappa lambda mu nu xi omicron pi rho sigma"
    Seq(
      (1L, txt1, "en", "srcA", txt1.length.toLong),
      (2L, txt1, "en", "srcA", txt1.length.toLong),
      (3L, txt1, "en", "srcA", txt1.length.toLong),
      (4L, txt2, "en", "srcB", txt2.length.toLong),
      (5L, txt2, "en", "srcB", txt2.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = Array(0.6f, 0.8f, 0.0f)
    val eOther = Array(0.8f, -0.6f, 0.0f)
    Seq(
      (1L, e, "a"), (2L, e, "a"), (3L, eOther, "b"),
      (4L, eOther, "b"), (5L, eOther, "b"))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val got = Similarity.crossmodalAuditPairs(spark, dir)
    val want = naiveAudit(spark, dir)
    assert(rows(got) == rows(want))
    // the doctored group must actually disagree: (1,3) and (2,3) are
    // text-identical (est 10000) but orthogonal vectors (cos 0)
    val byPair = got.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(byPair((1L, 3L))._1 == 10000L)
    assert(byPair((1L, 3L))._2 == 0L && !byPair((1L, 3L))._3)
    // identical vectors: cosine ~1e6 up to float rounding, verdict true
    assert(byPair((1L, 2L))._2 >= 999000L && byPair((1L, 2L))._3)
    assert(byPair((4L, 5L))._2 >= 999000L && byPair((4L, 5L))._3)
    spark.catalog.clearCache()
  }
}
