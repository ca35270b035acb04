package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Capability pin for the AQE skew-join path: `q_agg_salted` handles
  * skewed AGGREGATION by manual salting and `q_skew_diagnostics`
  * profiles the keys, but for skewed JOINS the engine's contract is
  * that AQE's OptimizeSkewedJoin splits the hot partition at runtime —
  * no manual salt, no plan rewrite. This test manufactures a join
  * where one key holds ~90% of the fact rows and asserts the executed
  * (adaptive) plan actually split it (`skew=true` on the join node).
  * If a Spark upgrade or a session-conf drift disabled the path, this
  * fails here instead of as a straggler task on the cluster.
  */
class SkewJoinAqeSpec extends AnyFunSuite with SparkTestBase {

  test("AQE splits the hot partition of a skewed shuffle join") {
    val confs = Seq(
      // force a shuffle join (the dim side would otherwise broadcast)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // thresholds scaled down so the test-sized hot partition trips them
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256k",
      // coalescing first would hide the skew split on this tiny input
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~90% of 2M fact rows land on key 0; dim is uniform over 1k keys
      val fact = spark.range(2000000L).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id") % 1000L).as("k"),
        concat(lit("payload-payload-payload-"), col("id")).as("payload"))
      val dim = spark.range(1000L).select(col("id").as("k"),
        concat(lit("dim-"), col("id")).as("attr"))
      val joined = fact.join(dim, "k")
      // execute THIS dataframe's own QueryExecution — count()/foreach()
      // plan separate queries and would leave this adaptive plan
      // unmaterialized
      assert(joined.queryExecution.toRdd.count() === 2000000L)
      val adaptive = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other                    => other.toString
      }
      assert(adaptive.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$adaptive")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
