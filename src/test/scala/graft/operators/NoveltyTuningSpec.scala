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

  /** Driver-side MinHash signature: the h1 + j*h2 family over sha256
    * halves — the cross-engine contract re-derived in pure Scala.
    */
  private def sigModel(shingleSet: Seq[String], numHashes: Int = 16): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val halves = shingleSet.map { s =>
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex.substring(0, 14), 16),
        java.lang.Long.parseLong(hex.substring(14, 28), 16))
    }
    (0 until numHashes).map(j => halves.map { case (h1, h2) => h1 + j * h2 }.min)
  }

  test("minhash estimator audit matches driver models and exposes the affine-family bias") {
    val sets = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingles(tokens(r.getString(1))).distinct)
      .filter(_._2.nonEmpty).toMap
    val sigsModel = sets.map { case (id, ss) => id -> sigModel(ss) }
    val rows = Dedup.minhashEstAuditPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, est, exact, err) =>
      // est against an independent driver-side signature recomputation
      val matches = sigsModel(a).zip(sigsModel(b)).count { case (x, y) => x == y }
      assert(est === matches.toLong * 10000L / 16L, s"pair ($a,$b) est model")
      // exact against an independent driver-side Jaccard
      val (sa, sb) = (sets(a).toSet, sets(b).toSet)
      assert(exact === (sa & sb).size.toLong * 10000L / (sa | sb).size,
        s"pair ($a,$b) exact model")
      assert(err === est - exact, s"pair ($a,$b) err column")
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
