package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The precomputed-bounds range exchange (MetaRangeBounds footer-stat
  * bounds + GraftRangeBridge partition-id-passthrough shuffle) against
  * its contract: it must produce EXACTLY what `orderBy` produces —
  * a total global order by (partition index, within-partition order) —
  * while never running a sampling pass over the child.
  */
class MetaRangeSpec extends AnyFunSuite with SparkTestBase {

  private val d = "/root/testdata/sf0.1"
  private def conf = spark.sparkContext.hadoopConfiguration

  test("footer bounds are strictly increasing and bounded by the ask") {
    val b = MetaRangeBounds.boundsFor(
      conf, s"$d/lineitem.parquet", "l_orderkey", 16).get
    assert(b.nonEmpty && b.length <= 15)
    assert(b.sameElements(b.distinct.sorted), s"not strictly increasing: ${b.toSeq}")
    // single-partition ask needs no bounds; missing column falls back
    assert(MetaRangeBounds.boundsFor(
      conf, s"$d/lineitem.parquet", "l_orderkey", 1).get.isEmpty)
    assert(MetaRangeBounds.boundsFor(
      conf, s"$d/lineitem.parquet", "no_such_column", 8).isEmpty)
  }

  test("partitionFor: equal keys always land together, bounds are upper-inclusive") {
    val bounds = Array(10L, 20L, 30L)
    assert(MetaRangeBounds.partitionFor(bounds, Long.MinValue) == 0)
    assert(MetaRangeBounds.partitionFor(bounds, 10L) == 0) // (−∞, 10]
    assert(MetaRangeBounds.partitionFor(bounds, 11L) == 1) // (10, 20]
    assert(MetaRangeBounds.partitionFor(bounds, 20L) == 1)
    assert(MetaRangeBounds.partitionFor(bounds, 30L) == 2)
    assert(MetaRangeBounds.partitionFor(bounds, 31L) == 3)
    assert(MetaRangeBounds.partitionFor(bounds, Long.MaxValue) == 3)
  }

  test("bridge + sortWithinPartitions reproduces orderBy exactly") {
    val src = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val bounds = MetaRangeBounds.boundsFor(
      conf, s"$d/lineitem.parquet", "l_orderkey", 8).get
    val bridged = org.apache.spark.sql.GraftRangeBridge
      .repartitionByPrecomputedRange(src, "l_orderkey", bounds)
      .sortWithinPartitions("l_orderkey", "l_linenumber")
      .collect()
    val expected = src.orderBy("l_orderkey", "l_linenumber").collect()
    assert(bridged.length == expected.length)
    // rows must appear in the SAME total order (l_quantity ties are
    // stable within equal sort keys only up to the pair key, so compare
    // the sort keys positionally and the full rows as multisets)
    assert(bridged.map(r => (r.getLong(0), r.get(1).toString))
      .sameElements(expected.map(r => (r.getLong(0), r.get(1).toString))))
    assert(bridged.map(_.toString).sorted
      .sameElements(expected.map(_.toString).sorted))
  }

  test("bridge partitions are range-ordered by index with no overlap") {
    val src = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey")
    val bounds = MetaRangeBounds.boundsFor(
      conf, s"$d/lineitem.parquet", "l_orderkey", 8).get
    val ranges = org.apache.spark.sql.GraftRangeBridge
      .repartitionByPrecomputedRange(src, "l_orderkey", bounds)
      .select(spark_partition_id().as("pid"), col("l_orderkey"))
      .groupBy("pid")
      .agg(min("l_orderkey").as("mn"), max("l_orderkey").as("mx"),
        count(lit(1)).as("n"))
      .orderBy("pid")
      .collect()
    // empty partitions emit no group row, so <= not ==
    assert(ranges.length >= 2 && ranges.length <= bounds.length + 1)
    ranges.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(0).getLong(2) < w(1).getLong(1),
          s"partition overlap: ${w(0)} vs ${w(1)}")
    }
    // equi-depth: no partition holds more than 4x its fair share (the
    // footer-uniformity assumption is approximate, not exact)
    val total = ranges.map(_.getLong(3)).sum
    val fair = total / ranges.length
    assert(ranges.map(_.getLong(3)).max <= 4 * fair,
      s"skewed partitions: ${ranges.map(_.getLong(3)).toSeq}")
  }
}
