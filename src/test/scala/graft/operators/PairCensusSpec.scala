package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the counts-census faces against their own expanded audit faces:
  * the collapsed multiplicity arithmetic (|A|·|B| cross pairs, C(s,2)
  * intra pairs, union+distinct doc touches) must be ALGEBRAICALLY
  * identical to aggregating the member-level pair dump — the identity
  * the DuckDB oracles assert cross-engine, pinned here Spark-side so a
  * regression fails `sbt test` before the driver gate. The n_docs
  * column is the delicate one: it needs per-key DISTINCT over docs that
  * may be touched by many pairs, computed without ever materializing
  * member pairs.
  */
class PairCensusSpec extends AnyFunSuite with SparkTestBase {

  private val d = "/root/testdata/sf0.01"

  /** Aggregate an expanded pair dump into the census shape over `keys`. */
  private def censusOf(pairs: DataFrame, keys: Seq[String]): Seq[String] = {
    val kc = keys.map(col)
    val p = pairs.groupBy(kc: _*).agg(count(lit(1)).as("n_pairs"))
    val dd = pairs.select(kc :+ col("doc_a").as("doc_id"): _*)
      .unionByName(pairs.select(kc :+ col("doc_b").as("doc_id"): _*))
      .distinct()
      .groupBy(kc: _*).agg(count(lit(1)).as("n_docs"))
    p.join(dd, keys).orderBy(kc: _*)
      .collect().toSeq.map(_.toString)
  }

  test("minhash-lsh census equals the aggregated pair dump") {
    val got = Dedup.dedupMinhashLsh(spark, d)
      .orderBy("est_jaccard_e4").collect().toSeq.map(_.toString)
    val want = censusOf(Dedup.dedupMinhashLshPairs(spark, d),
      Seq("est_jaccard_e4"))
    assert(got.nonEmpty, "census is empty — funnel found no pairs at sf0.01")
    assert(got == want)
    spark.catalog.clearCache()
  }

  test("simhash64 census equals the aggregated pair dump") {
    val got = Dedup.dedupSimhash64(spark, d)
      .orderBy("hamming").collect().toSeq.map(_.toString)
    val want = censusOf(Dedup.dedupSimhash64Pairs(spark, d),
      Seq("hamming", "within_3"))
    assert(got.nonEmpty, "census is empty — banding found no pairs at sf0.01")
    assert(got == want)
    spark.catalog.clearCache()
  }

  test("estimator-audit census equals the aggregated pair dump") {
    val got = Dedup.minhashEstAudit(spark, d)
      .orderBy("est_e4", "exact_e4").collect().toSeq.map(_.toString)
    val want = censusOf(Dedup.minhashEstAuditPairs(spark, d),
      Seq("est_e4", "exact_e4", "err_e4"))
    assert(got.nonEmpty, "census is empty — no candidate pairs at sf0.01")
    assert(got == want)
    spark.catalog.clearCache()
  }

  test("edit-distance census equals the aggregated pair dump") {
    val got = Dedup.dedupEditDistance(spark, d)
      .orderBy("edit_dist", "sim_e4").collect().toSeq.map(_.toString)
    val want = censusOf(Dedup.dedupEditDistancePairs(spark, d),
      Seq("edit_dist", "sim_e4"))
    assert(got.nonEmpty, "census is empty — no candidate pairs at sf0.01")
    assert(got == want)
    spark.catalog.clearCache()
  }

  test("crossmodal census equals the aggregated pair dump on sf0.01") {
    val got = Similarity.crossmodalAudit(spark, d)
      .orderBy("est_jaccard_e4", "embeds_agree").collect().toSeq.map(_.toString)
    val want = censusOf(Similarity.crossmodalAuditPairs(spark, d),
      Seq("est_jaccard_e4", "embeds_agree"))
    assert(got.nonEmpty, "census is empty — audit found no pairs at sf0.01")
    assert(got == want)
    spark.catalog.clearCache()
  }

  test("crossmodal census survives a mixed-embedding group (slow path)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("crosscensus-fx").toString
    val txt1 = "alpha beta gamma delta epsilon zeta eta theta"
    val txt2 = "iota kappa lambda mu nu xi omicron pi rho sigma"
    (Seq((1L, txt1), (2L, txt1), (3L, txt1), (4L, txt2), (5L, txt2))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) })
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = Array(0.6f, 0.8f, 0.0f)
    val eOther = Array(0.8f, -0.6f, 0.0f)
    // group {1,2,3} is NON-uniform (doc 3 differs) -> slow path;
    // group {4,5} is uniform -> fast self-cosine path
    Seq((1L, e, "a"), (2L, e, "a"), (3L, eOther, "b"),
      (4L, eOther, "b"), (5L, eOther, "b"))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.crossmodalAudit(spark, dir)
      .orderBy("est_jaccard_e4", "embeds_agree").collect().toSeq.map(_.toString)
    val want = censusOf(Similarity.crossmodalAuditPairs(spark, dir),
      Seq("est_jaccard_e4", "embeds_agree"))
    assert(got == want)
    // the doctored disagreement is VISIBLE in the census: est 10000
    // must carry a false-verdict bucket ((1,3), (2,3): orthogonal)
    val disagree = Similarity.crossmodalAudit(spark, dir).collect()
      .find(r => r.getLong(0) == 10000L && !r.getBoolean(1))
    assert(disagree.isDefined, "mixed group's disagreement lost by the census")
    assert(disagree.get.getLong(2) >= 2L, "expected at least pairs (1,3),(2,3)")
    spark.catalog.clearCache()
  }

  test("census counts respect multiplicity on a doctored mass-dup fixture") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("census-fx").toString
    // group A: 3 identical docs; group B: 2 identical docs; A and B are
    // near-dups of each other (share most shingles); C: 1 unrelated doc
    val txtA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val txtB = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val txtC = "completely different words nothing shared here at all ok"
    (Seq((1L, txtA), (2L, txtA), (3L, txtA), (10L, txtB), (11L, txtB),
      (20L, txtC))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) })
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.dedupMinhashLsh(spark, dir)
      .orderBy("est_jaccard_e4").collect().toSeq.map(_.toString)
    val want = censusOf(Dedup.dedupMinhashLshPairs(spark, dir),
      Seq("est_jaccard_e4"))
    assert(got == want)
    // multiplicity pins, independent of whether A×B happens to band:
    // intra mass is C(3,2) + C(2,2) = 4 pairs over 5 docs, always; a
    // cross A×B canonical pair expands to EXACTLY 3·2 = 6 member pairs
    val pairRows = Dedup.dedupMinhashLshPairs(spark, dir).collect()
    val groupA = Set(1L, 2L, 3L); val groupB = Set(10L, 11L)
    val nCross = pairRows.count(r =>
      (groupA(r.getLong(0)) && groupB(r.getLong(1))) ||
        (groupB(r.getLong(0)) && groupA(r.getLong(1))))
    val nIntra = pairRows.count(r =>
      (groupA(r.getLong(0)) && groupA(r.getLong(1))) ||
        (groupB(r.getLong(0)) && groupB(r.getLong(1))))
    assert(nIntra == 4, s"intra member pairs: expected C(3,2)+C(2,2)=4, got $nIntra")
    assert(nCross == 0 || nCross == 6,
      s"cross expansion must be all-or-nothing |A|·|B|=6, got $nCross")
    val totalPairs = Dedup.dedupMinhashLsh(spark, dir)
      .agg(sum("n_pairs")).collect()(0).getLong(0)
    assert(totalPairs == (4 + nCross).toLong,
      s"census total $totalPairs != expanded ${4 + nCross}")
    spark.catalog.clearCache()
  }
}
