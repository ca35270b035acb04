package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Structural invariants of the connected-components operator that the
  * hash-oracle can't articulate: labels are genuine component
  * representatives (idempotent, minimal, edge-consistent). Run on the
  * real sf0.001 corpus so the edge graph is the production funnel's.
  */
class DedupClustersSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val clusters = Dedup.dedupClusters(spark, sf).collect()
    .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private lazy val verifiedPairs =
    Dedup.dedupNgramJaccard(spark, sf).where(col("jaccard_e4") >= 5000)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  test("every doc with shingles gets a label; reps are minimal and idempotent") {
    assert(clusters.nonEmpty)
    clusters.foreach { case (doc, rep) =>
      assert(rep <= doc, s"rep $rep exceeds member $doc")
      assert(clusters(rep) === rep, s"rep $rep of $doc is not its own rep")
    }
  }

  test("threshold sweep is monotone and reconciles with the verified pairs") {
    val rows = Dedup.dedupThresholdSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === Dedup.SweepThresholdsE4, "full grid emitted")
    // raising the threshold can only shrink the flagged sets
    rows.sliding(2).foreach { case Array((_, p1, d1), (_, p2, d2)) =>
      assert(p2 <= p1 && d2 <= d1, "sweep must be non-increasing")
    }
    // each point reconciles with an independent filter of the pair frame
    val pairs = Dedup.dedupNgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (t, nPairs, nDocs) =>
      val cleared = pairs.filter(_._3 >= t)
      assert(nPairs === cleared.length.toLong, s"pairs at $t")
      assert(nDocs === cleared.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong,
        s"docs at $t")
    }
    assert(rows.head._2 > 0L, "fixture should clear the lowest threshold")
  }

  test("soft-dedup weights are exactly 1e6 div cluster size over the labels") {
    val sizes = clusters.values.groupBy(identity).map { case (r, o) => r -> o.size.toLong }
    val rows = Dedup.softDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === clusters.size, "every labeled doc gets a weight")
    rows.foreach { case (doc, rep, size, ppm) =>
      assert(rep === clusters(doc), s"doc $doc rep")
      assert(size === sizes(rep), s"doc $doc cluster size")
      assert(ppm === 1000000L / size, s"doc $doc weight")
    }
    // the reweighting contract: each cluster's total weight is ~1e6
    // (exactly, up to the floor remainder < cluster_size)
    rows.groupBy(_._2).foreach { case (rep, members) =>
      val tot = members.map(_._4).sum
      assert(tot <= 1000000L && tot > 1000000L - members.length,
        s"cluster $rep effective frequency should flatten to ~1")
    }
    assert(rows.exists(_._4 < 1000000L), "fixture should contain real clusters")
  }

  test("both endpoints of every verified near-dup pair share a cluster") {
    assert(verifiedPairs.nonEmpty, "fixture should produce near-dup pairs")
    verifiedPairs.foreach { case (a, b) =>
      assert(clusters(a) === clusters(b),
        s"edge ($a, $b) split across clusters ${clusters(a)} / ${clusters(b)}")
    }
  }

  test("star contraction produces the same clusters as label propagation") {
    val star = Dedup.dedupClustersStar(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star === clusters)
  }

  test("labels are exactly the transitive closure (driver union-find twin)") {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    clusters.keys.foreach(k => parent(k) = k)
    verifiedPairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the minimum label like the operator does
    val expected = clusters.keys.map(k => k -> find(k)).toMap
    assert(clusters === expected)
  }
}
