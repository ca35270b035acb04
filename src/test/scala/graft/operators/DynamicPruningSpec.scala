package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.Tables

/** Capability pin for DYNAMIC PARTITION PRUNING — the scan-side dual of
  * the static pushdown pinned in PlanContractSpec: when a
  * day-partitioned fact joins a dim whose filter only resolves at run
  * time, the scan must prune to the joined partitions instead of
  * reading the whole layout. At 100 TB this is the difference between
  * scanning a year and scanning a week, and it is exactly the layout
  * the extract pipeline writes (partitioned parquet directories), so a
  * regression here would silently un-prune every downstream join.
  */
class DynamicPruningSpec extends AnyFunSuite with SparkTestBase {

  test("a runtime dim filter prunes the partitioned fact scan") {
    val d = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("graft-dpp").toString

    // day-partitioned fact layout (the extract-pipeline shape)
    Tables.events(spark, d)
      .select(col("event_id"), col("user_id"), col("value"),
        (col("event_id") % 10L).as("day"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val fact = spark.read.parquet(dir)
    val nDays = 2L
    val dim = spark.range(0L, 10L).select(col("id").as("day"),
      concat(lit("d"), col("id")).as("tag"))
      .where(col("day") < nDays) // the runtime-side filter

    val joined = fact.join(dim, "day")
    val rows = joined.collect()
    // correctness: only the two filtered days survive
    // partition-dir values read back as int (directory-name inference)
    assert(rows.nonEmpty &&
      rows.forall(_.getAs[Number]("day").longValue < nDays))

    // the materialized plan must carry a dynamic pruning predicate on
    // the partition column and touch only the pruned partition count
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic pruning expression in the fact scan:\n$plan")
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // AQE wrappers and materialized query stages are collect()-leaves;
    // descend into them explicitly
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec        => allNodes(q.plan)
      case o                        => o.children.flatMap(allNodes)
    })
    val factScan = allNodes(joined.queryExecution.executedPlan).collectFirst {
      case s: FileSourceScanExec
        if s.metadata.get("Location").exists(_.contains("graft-dpp")) => s
    }
    assert(factScan.nonEmpty,
      s"fact parquet scan not found in:\n${joined.queryExecution.executedPlan}")
    // after execution the scan reports how many partitions it actually read
    val selected = factScan.get.metrics.get("numPartitions").map(_.value)
    assert(selected.contains(nDays),
      s"expected $nDays partitions read, got $selected")
  }
}
