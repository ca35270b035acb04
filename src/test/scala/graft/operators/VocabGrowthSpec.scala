package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Model checks for the two vocabulary-growth panels:
  * [[TextAnalysis.vocabCoverage]] against a driver-side recomputation
  * from the raw token counts, and [[TextAnalysis.ngramSaturation]]
  * against a BigInt first-appearance model — both on the real sf0.001
  * corpus, so the invariants hold on the exact frame the oracle hashes.
  */
class VocabGrowthSpec extends AnyFunSuite with SparkTestBase {

  private val d = "/root/testdata/sf0.001"

  test("vocab coverage matches a driver-side Zipf recomputation") {
    val out = TextAnalysis.vocabCoverage(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // independent model: collect the token counts and integrate the
    // rank-frequency curve in plain Scala with the same tie order
    val counts = graft.sources.Tables.documents(spark, d)
      .select(explode(expr(TextAnalysis.tokensSpark)).as("token"))
      .groupBy("token").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }
    val total = counts.map(_._2).sum
    val model = TextAnalysis.VocabCoverageCuts.map { k =>
      val in = counts.take(k)
      (k.toLong, in.length.toLong, in.map(_._2).sum, in.map(_._2).min,
        in.map(_._2).sum * 1000000L / total, counts.length.toLong, total)
    }
    assert(out.toSeq == model, "panel must equal the driver-side model")
    // structural invariants a tokenizer designer relies on
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 <= b._5, "coverage must be monotone in the budget")
      assert(a._4 >= b._4, "the boundary count must be non-increasing")
    }
    val saturated = out.filter(r => r._2 == r._6)
    assert(saturated.nonEmpty && saturated.forall(_._5 == 1000000L),
      "a budget >= the vocabulary must cover the whole corpus")
  }

  test("ngram saturation matches a first-appearance model and telescopes") {
    val rows = TextAnalysis.ngramSaturation(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq == (0L until TextAnalysis.SaturationSlices).toSeq)
    // model: per-doc slice by the shared sha bucket, shingles as strings
    val docs = graft.sources.Tables.documents(spark, d)
      .select(col("doc_id"), expr(TextAnalysis.tokensSpark).as("toks"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    def slice(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("SHA-256")
        .digest(id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % TextAnalysis.SaturationSlices
    }
    val grams = docs.flatMap { case (id, toks) =>
      if (toks.length < 3) Seq.empty
      else toks.sliding(3).map(g => (slice(id), g.mkString(" "))).toSeq
    }
    val occBySlice = grams.groupBy(_._1).map { case (s, g) => s -> g.length.toLong }
    val firstSlice = grams.groupBy(_._2).map { case (_, occ) => occ.map(_._1).min }
    val newBySlice = firstSlice.groupBy(identity).map { case (s, g) => s -> g.size.toLong }
    var (docsCum, occCum, gramCum) = (0L, 0L, 0L)
    val model = (0L until TextAnalysis.SaturationSlices).map { s =>
      val nd = docs.count(x => slice(x._1) == s).toLong
      val occ = occBySlice.getOrElse(s, 0L)
      val ng = newBySlice.getOrElse(s, 0L)
      docsCum += nd; occCum += occ; gramCum += ng
      (s, docsCum, occCum, ng,
        gramCum, if (occ > 0) ng * 1000000L / occ else 0L)
    }
    assert(rows.toSeq == model, "curve must equal the first-appearance model")
    // telescoping: the last cumulative row IS the corpus totals
    val last = rows.last
    assert(last._2 == docs.length.toLong)
    assert(last._3 == grams.length.toLong)
    assert(last._5 == firstSlice.size.toLong)
    // the discovery rate must actually decay on a saturating corpus
    assert(rows.head._6 > rows.last._6,
      "first slice must discover at a higher rate than the last")
  }
}
