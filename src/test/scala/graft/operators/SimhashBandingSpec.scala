package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The banding S-curve contract between the two simhash64 faces: a
  * 2×32-bit wide band matches exactly when BOTH of its constituent
  * 16-bit bands match, so the wide candidate set must be a SUBSET of
  * the narrow one, with identical Hamming distances on the shared
  * pairs — and every pair within the wide face's detection guarantee
  * (Hamming ≤ 1) must be caught by it.
  */
class SimhashBandingSpec extends AnyFunSuite with SparkTestBase {

  private val d = "/root/testdata/sf0.01"

  test("wide-band candidates are a subset of narrow-band candidates, distances agree") {
    val narrow = Dedup.dedupSimhash64Pairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val wide = Dedup.dedupSimhash64Wide(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(wide.nonEmpty && wide.size < narrow.size,
      s"expected a strict, non-empty reduction: ${wide.size} vs ${narrow.size}")
    for ((pair, h) <- wide) {
      assert(narrow.contains(pair), s"wide pair $pair missing from narrow")
      assert(narrow(pair) == h, s"hamming disagrees on $pair")
    }
    // the wide face's guarantee: every narrow pair at Hamming <= 1 has
    // at least one undamaged 32-bit block, so the wide bands catch it
    for ((pair, h) <- narrow if h <= 1)
      assert(wide.contains(pair), s"pair $pair at hamming $h evaded the wide bands")
    spark.catalog.clearCache()
  }

  test("manku banding detects exactly the narrow face's Hamming<=3 mass") {
    // both bandings have PERFECT recall for d <= 3 (pigeonhole), so the
    // within_3 = true census rows must be identical; only the
    // false-positive tail (hamming > 3) may differ between them
    def within3(rows: Array[org.apache.spark.sql.Row]) = rows
      .filter(_.getBoolean(1))
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    val narrow = within3(Dedup.dedupSimhash64(spark, d).collect())
    val manku = within3(Dedup.dedupSimhash64Manku(spark, d).collect())
    assert(narrow.nonEmpty, "no within-3 mass at sf0.01 — fixture too small")
    assert(manku == narrow)
    spark.catalog.clearCache()
  }

  test("band-mode default widens with corpus size") {
    assert(Dedup.simhash64BandModeFor(60000L) == "narrow")
    assert(Dedup.simhash64BandModeFor(999999L) == "narrow")
    assert(Dedup.simhash64BandModeFor(1000000L) == "manku")
    assert(Dedup.simhash64BandModeFor(1L << 40) == "manku")
  }
}
