package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.Tables

/** Co-located join via bucketing — the 100 TB fact⋈fact strategy:
  * writing both tables bucketed (and sorted) by the join key means the
  * join needs NO shuffle at read time; Spark matches bucket files
  * pairwise. This spec proves the property on the physical plan: the
  * bucketed join contains no ShuffleExchange, the unbucketed one does.
  */
class BucketedJoinSpec extends AnyFunSuite with SparkTestBase {

  test("bucketed fact-fact join eliminates the shuffle") {
    val d = "/root/testdata/sf0.001"
    val nBuckets = 4

    Tables.lineitem(spark, d)
      .select("l_orderkey", "l_quantity")
      .write.mode("overwrite")
      .bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, d)
      .select("o_orderkey", "o_custkey")
      .write.mode("overwrite")
      .bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bucketed")

    // exchanges appear only after EnsureRequirements; with AQE on they
    // live inside the AdaptiveSparkPlanExec wrapper
    def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
      val plan = df.queryExecution.executedPlan
      val inner = plan.collectFirst {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
      }.getOrElse(plan)
      inner.collect { case s: ShuffleExchangeExec => s }.size
    }

    // disable broadcast so the join strategy is the bucket-aware
    // sort-merge join, as it would be for two large facts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val unbucketed = Tables.lineitem(spark, d).select("l_orderkey", "l_quantity")
        .join(Tables.orders(spark, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
      assert(shuffles(bucketed) === 0,
        bucketed.queryExecution.executedPlan.toString)
      assert(shuffles(unbucketed) > 0)
      // and it is still correct
      assert(bucketed.count() === unbucketed.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
