package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the per-doc candidate-partner cap ([[Dedup.capPairs]]) — the
  * round-8 degeneracy guard composed into the MinHash and winnow pair
  * funnels. The oracle gate cannot exercise it (the default cap is a
  * deliberate no-op at every fixture SF), so the binding behavior is
  * model-checked here on synthetic pair frames.
  */
class CapPairsSpec extends AnyFunSuite with SparkTestBase {

  private def pairsDf(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("doc_a", "doc_b", "w")
  }

  private def capped(rows: Seq[(Long, Long, Long)], n: Int): Set[(Long, Long)] =
    Dedup.capPairs(pairsDf(rows), "w", n)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private val clique5: Seq[(Long, Long, Long)] =
    for {
      i <- 1L to 5L
      j <- (i + 1) to 5L
    } yield (i, j, 7L) // equal weights: the replica-clique worst case

  test("cap is a no-op when every doc has fewer partners than the cap") {
    assert(capped(clique5, 128) === clique5.map(p => (p._1, p._2)).toSet)
  }

  test("cap keeps top-N of either endpoint on an equal-weight clique") {
    // equal weights tie-break by partner id: doc_a side keeps (i, i+1),
    // doc_b side keeps (1, j) — C(5,2)=10 pairs contract to 7, and on an
    // R-clique the same rule yields O(N*R) instead of C(R,2)
    val expected = Set[(Long, Long)](
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), // each doc_a's best partner
      (1L, 3L), (1L, 4L), (1L, 5L)) // each doc_b's best predecessor
    assert(capped(clique5, 1) === expected)
  }

  test("hub fan-out survives through satellites' own rankings") {
    // a hub (doc 1) pairs with 2..5 at descending weights; the keep-if-
    // either rule preserves every hub pair at cap 1 because each
    // satellite ranks the hub first on its own side — satellites never
    // lose their view of the hub (the recall property of the union rule)
    val rows = Seq(
      (1L, 2L, 9L), (1L, 3L, 8L), (1L, 4L, 7L), (1L, 5L, 6L),
      (4L, 5L, 5L))
    assert(capped(rows, 1) === rows.map(p => (p._1, p._2)).toSet)
  }

  test("a pair below the cap on both endpoints is dropped") {
    // doc_b=4 ranks (2,4) w1 below (1,4) w9, and doc_a=2 ranks it below
    // (2,3) w8 — below the cap on BOTH sides, so it is pruned
    val rows = Seq(
      (1L, 4L, 9L), (2L, 3L, 8L), (2L, 4L, 1L))
    assert(capped(rows, 1) === Set[(Long, Long)]((1L, 4L), (2L, 3L)))
  }

  test("pair volume is linear in clique size under a binding cap") {
    val r = 40L
    val clique = for {
      i <- 1L to r
      j <- (i + 1) to r
    } yield (i, j, 3L)
    val n = 4
    val kept = capped(clique, n).size
    assert(kept < clique.size / 2,
      s"cap should prune the ${clique.size}-pair clique, kept $kept")
    // keep-if-either bounds pairs by 2N per doc
    assert(kept <= 2 * n * r, s"kept $kept exceeds the 2N*R bound")
  }
}
