package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Driver-side model checks for the shingle-novelty score and the LSH
  * tuning report.
  */
class NoveltyTuningSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def tokens(text: String): Vector[String] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase(java.util.Locale.ROOT)).toVector

  private def shingles(toks: Vector[String]): Vector[String] =
    if (toks.size < 3) Vector.empty
    else toks.sliding(3).map(_.mkString(" ")).toVector

  test("novelty is the unique-shingle fraction of the driver model") {
    val sets = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingles(tokens(r.getString(1))).distinct)
      .filter(_._2.nonEmpty).toMap
    val df = sets.values.flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = TextAnalysis.textNovelty(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSet === sets.keySet)
    rows.foreach { case (id, nSh, nUniq, e4) =>
      val model = sets(id)
      val uniq = model.count(s => df(s) == 1L).toLong
      assert(nSh === model.size.toLong, s"doc $id shingle count")
      assert(nUniq === uniq, s"doc $id unique count")
      assert(e4 === uniq * 10000L / model.size, s"doc $id novelty")
    }
    // the corpus has both boilerplate and fresh text — score must spread
    assert(rows.map(_._4).distinct.length > 1)
  }

  test("minhash estimator audit exposes the affine-family bias it documents") {
    val rows = Dedup.minhashEstAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, est, exact, err) =>
      assert(est >= 0L && est <= 10000L, s"pair ($a,$b) est out of range")
      assert(exact >= 0L && exact <= 10000L, s"pair ($a,$b) exact out of range")
      assert(err === est - exact, s"pair ($a,$b) err arithmetic")
      // identical shingle sets agree on every component — est must be 1.0
      if (exact == 10000L) assert(est === 10000L, s"pair ($a,$b) exact dup")
    }
    // the operator's raison d'être: the h1 + j*h2 family's correlated
    // minimizers make the agreement fraction a BIASED per-pair
    // estimator — this corpus must exhibit the divergence the scaladoc
    // documents (if this ever fails, the family changed; re-read the doc)
    assert(rows.exists(r => math.abs(r._5) > 4000L),
      "expected at least one high-bias pair under the affine family")
  }

  test("lsh tuning report equals a driver-side aggregation of the band rows") {
    // band values derived through the same compiled kernel the operator
    // uses (kernel itself is pinned by TextHashSpec); the report's
    // AGGREGATION is what this re-derives independently
    val sigs = graft.sources.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.GraftFunctions.minhash_sig(
          org.apache.spark.sql.functions.col("text"), 16).as("sig"))
      .where(org.apache.spark.sql.functions.col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    val bandRows = sigs.flatMap { case (_, sig) =>
      (0 until 4).map(b => (b, sig.slice(4 * b, 4 * b + 4).mkString("-")))
    }
    val model = bandRows.groupBy(_._1).view.mapValues { rs =>
      val buckets = rs.groupBy(_._2).values.map(_.size.toLong).toSeq
      (buckets.size.toLong, buckets.max,
        buckets.count(_ > 1).toLong, buckets.map(s => s * (s - 1) / 2).sum)
    }.toMap
    val rows = Dedup.lshTuning(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq === (0 until 4))
    rows.foreach { case (band, got) =>
      assert(got === model(band), s"band $band profile")
    }
  }
}
