package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.Partitioner

/** The reference's signature hierarchical range-partition planner (R1,
  * cli.py:171-186) and incremental work-list (A2, cli.py:302-313),
  * surfaced as driver-checkable queries.
  *
  * The plan itself is driver-side by design — its size is one tuple per
  * output FILE (a few thousand at 100 TB), so only two scalar
  * aggregates (min/max block) ever cross from the data to the driver.
  * The DuckDB oracles re-derive the tier cursor with a recursive CTE —
  * an independent implementation of the same algorithm, which makes
  * this a genuine cross-check rather than a self-comparison.
  */
object PlannerQueries {

  private val Tiers = Seq(4096L, 512L, 64L)

  /** min/max(event_id) → hierarchical plan rows. */
  def partitionPlan(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val Row(lo: Long, hi: Long) =
      graft.sources.Tables.events(spark, d)
        .agg(min("event_id"), max("event_id")).head()
    Partitioner.plan(lo, hi + 1, Tiers)
      .map(p => (p.size, p.start, p.end))
      .toDF("partition_size", "start_block", "end_block")
      .orderBy(col("partition_size").desc, col("start_block"))
  }

  private def planCte(hiExpr: String, stName: String): String = {
    val tierRows = Tiers.zipWithIndex
      .map { case (s, i) => s"($i, ${s}::BIGINT)" }.mkString(", ")
    s"""tiers(idx, sz) AS (VALUES $tierRows),
       |$stName(idx, cursor) AS (
       |  SELECT 0, (SELECT lo FROM bounds)
       |  UNION ALL
       |  SELECT s.idx + 1,
       |    CASE WHEN ($hiExpr) // t.sz * t.sz > s.cursor // t.sz * t.sz
       |         THEN ($hiExpr) // t.sz * t.sz ELSE s.cursor END
       |  FROM $stName s JOIN tiers t ON t.idx = s.idx
       |  WHERE s.idx < ${Tiers.length})""".stripMargin
  }

  // DuckDB 1.0's generate_series cannot take lateral column parameters;
  // unnest(range(...)) in the select list can.
  private def planSelect(hiExpr: String, stName: String): String =
    s"""SELECT partition_size, start_block, start_block + partition_size AS end_block
       |FROM (SELECT t.sz AS partition_size,
       |        unnest(range(s.cursor // t.sz * t.sz, ($hiExpr) // t.sz * t.sz, t.sz)) AS start_block
       |      FROM $stName s JOIN tiers t ON t.idx = s.idx)"""
      .stripMargin

  val partitionPlanSql: String =
    s"""WITH RECURSIVE bounds AS (
       |  SELECT min(event_id) AS lo, max(event_id) + 1 AS hi FROM events),
       |${planCte("SELECT hi FROM bounds", "st")}
       |${planSelect("SELECT hi FROM bounds", "st")}
       |ORDER BY partition_size DESC, start_block""".stripMargin

  /** Incremental work-list: plan of the full range MINUS plan of the
    * previous watermark range (prev head = lo + 2/3 of the range). The
    * oracle runs the recursive planner twice and EXCEPTs.
    */
  def worklistDiff(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    graft.sources.Tables.events(spark, d)
      .agg(min("event_id"), max("event_id")).head() match {
      case Row(lo: Long, hiRaw: Long) =>
        val hi = hiRaw + 1
        val prevHi = lo + (hi - lo) * 2 / 3
        val work = Partitioner.worklist(
          Partitioner.plan(lo, hi, Tiers),
          Partitioner.plan(lo, prevHi, Tiers))
        work.map(p => (p.size, p.start, p.end))
          .toDF("partition_size", "start_block", "end_block")
          .orderBy(col("partition_size").desc, col("start_block"))
    }
  }

  val worklistDiffSql: String =
    s"""WITH RECURSIVE bounds AS (
       |  SELECT min(event_id) AS lo, max(event_id) + 1 AS hi,
       |         min(event_id) + (max(event_id) + 1 - min(event_id)) * 2 // 3 AS prev_hi
       |  FROM events),
       |${planCte("SELECT hi FROM bounds", "st_new")},
       |${planCte("SELECT prev_hi FROM bounds", "st_old").split("\n").drop(1).mkString("\n")}
       |SELECT * FROM (
       |  ${planSelect("SELECT hi FROM bounds", "st_new").replace("\n", " ")}
       |  EXCEPT
       |  ${planSelect("SELECT prev_hi FROM bounds", "st_old").replace("\n", " ")}
       |) ORDER BY partition_size DESC, start_block""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_r1_partition_plan" -> (partitionPlan _),
    "q_a2_worklist_diff" -> (worklistDiff _))

  val oracles: Map[String, String] = Map(
    "q_r1_partition_plan" -> partitionPlanSql,
    "q_a2_worklist_diff" -> worklistDiffSql)
}
