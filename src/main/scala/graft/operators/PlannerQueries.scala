package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.Partitioner

/** The reference's signature hierarchical range-partition planner (R1,
  * cli.py:171-186) and incremental work-list (A2, cli.py:302-313),
  * surfaced as driver-checkable queries.
  *
  * The plan itself is driver-side by design — its size is one tuple per
  * output FILE — so the TIERS must scale with the id-space WIDTH to
  * keep it that way: fixed 4096/512/64 tiers against a replica whose
  * ids span ~10^11 would emit millions of plan tuples and make the
  * driver loop, not the data, the bottleneck (the same lesson as
  * [[Dedup.ingestTier]]). [[planTier]] grows the base tier 8× until the
  * top tier covers the width in ≤ ~1024 partitions; at the generated
  * testdata widths it stays 64, so the tier pyramid is exactly the
  * reference's 4096/512/64 shape there. Only two scalar aggregates
  * (min/max block) ever cross from the data to the driver.
  *
  * The DuckDB oracles re-derive the tier cursor with a recursive CTE —
  * an independent implementation of the same algorithm — and compute
  * the identical base tier from an integer CASE ladder (no float log;
  * engines must agree bit-for-bit).
  */
object PlannerQueries {

  /** Smallest base tier 64·8^i whose TOP tier (64×) covers `width` in
    * ≤ 1024 partitions, i.e. width ≤ tier·2^16 — clamped at the
    * oracle ladder's ELSE arm (64·8^13) so both engines compute the
    * same tier at any width a long can hold.
    */
  private[graft] def planTier(width: Long): Long = {
    var t = 64L
    while (width > (t << 16) && t < (64L << 39)) t *= 8L
    t
  }

  /** The reference's three-tier pyramid (4096/512/64 at base 64),
    * scaled: factor 8 between tiers, every size divides the next.
    */
  private[graft] def tiersFor(width: Long): Seq[Long] = {
    val t = planTier(width)
    Seq(64L * t, 8L * t, t)
  }

  /** The same ladder as [[planTier]] in SQL: i = 0..12 enumerated,
    * ELSE = the clamp arm (64·8^13). Thresholds are tier·2^16; the
    * largest enumerated constant is 2^58, comfortably inside int64.
    */
  private def tierLadder(wExpr: String): String =
    (0 to 12)
      .map(i => s"WHEN ($wExpr) <= ${4194304L << (3 * i)} THEN ${64L << (3 * i)}")
      .mkString("CASE ", " ", s" ELSE ${64L << 39} END")

  /** Width-derived tier pyramid, shared by every plan in the query —
    * bounds must expose `lo` and `hi` (half-open).
    */
  private val tiersCte: String = tiersCteNamed("tiers", "tw", "hi - lo")

  /** Same pyramid from an arbitrary width expression under arbitrary
    * CTE names — [[worklistDiffSql]] needs TWO pyramids (the new plan's
    * and the previous deployment's).
    */
  private def tiersCteNamed(tiers: String, tw: String, wExpr: String): String =
    s"""$tw AS (SELECT ${tierLadder(wExpr)} AS bt FROM bounds),
       |$tiers(idx, sz) AS (
       |  SELECT 0, 64 * bt FROM $tw
       |  UNION ALL SELECT 1, 8 * bt FROM $tw
       |  UNION ALL SELECT 2, bt FROM $tw)""".stripMargin

  /** min/max(event_id) → hierarchical plan rows. */
  def partitionPlan(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val Row(lo: Long, hi: Long) =
      graft.sources.Tables.events(spark, d)
        .agg(min("event_id"), max("event_id")).head()
    Partitioner.plan(lo, hi + 1, tiersFor(hi + 1 - lo))
      .map(p => (p.size, p.start, p.end))
      .toDF("partition_size", "start_block", "end_block")
      .orderBy(col("partition_size").desc, col("start_block"))
  }

  private def planCte(hiExpr: String, stName: String,
      tiersName: String = "tiers"): String =
    s"""$stName(idx, cursor) AS (
       |  SELECT 0, (SELECT lo FROM bounds)
       |  UNION ALL
       |  SELECT s.idx + 1,
       |    CASE WHEN ($hiExpr) // t.sz * t.sz > s.cursor // t.sz * t.sz
       |         THEN ($hiExpr) // t.sz * t.sz ELSE s.cursor END
       |  FROM $stName s JOIN $tiersName t ON t.idx = s.idx
       |  WHERE s.idx < 3)""".stripMargin

  // DuckDB 1.0's generate_series cannot take lateral column parameters;
  // unnest(range(...)) in the select list can.
  private def planSelect(hiExpr: String, stName: String,
      tiersName: String = "tiers"): String =
    s"""SELECT partition_size, start_block, start_block + partition_size AS end_block
       |FROM (SELECT t.sz AS partition_size,
       |        unnest(range(s.cursor // t.sz * t.sz, ($hiExpr) // t.sz * t.sz, t.sz)) AS start_block
       |      FROM $stName s JOIN $tiersName t ON t.idx = s.idx)"""
      .stripMargin

  val partitionPlanSql: String =
    s"""WITH RECURSIVE bounds AS (
       |  SELECT min(event_id) AS lo, max(event_id) + 1 AS hi FROM events),
       |$tiersCte,
       |${planCte("SELECT hi FROM bounds", "st")}
       |${planSelect("SELECT hi FROM bounds", "st")}
       |ORDER BY partition_size DESC, start_block""".stripMargin

  /** Incremental work-list: plan of the full range MINUS plan of the
    * previous watermark range (prev head = lo + 2/3 of the range). The
    * oracle runs the recursive planner twice and EXCEPTs. Each plan
    * derives its tiers FROM ITS OWN width — the previous deployment
    * planned (and laid out its directories) when the table was
    * narrower, so modeling its plan with today's pyramid would diff
    * against tiles that were never on disk. When growth crosses a
    * [[planTier]] threshold the two pyramids differ and the EXCEPT
    * correctly degenerates toward a full retile: the old layout's
    * tiles simply are not tiles of the new plan.
    */
  def worklistDiff(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    graft.sources.Tables.events(spark, d)
      .agg(min("event_id"), max("event_id")).head() match {
      case Row(lo: Long, hiRaw: Long) =>
        val hi = hiRaw + 1
        val prevHi = lo + (hi - lo) * 2 / 3
        val work = Partitioner.worklist(
          Partitioner.plan(lo, hi, tiersFor(hi - lo)),
          Partitioner.plan(lo, prevHi, tiersFor(prevHi - lo)))
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
       |${tiersCteNamed("tiers_new", "tw_new", "hi - lo")},
       |${tiersCteNamed("tiers_old", "tw_old", "prev_hi - lo")},
       |${planCte("SELECT hi FROM bounds", "st_new", "tiers_new")},
       |${planCte("SELECT prev_hi FROM bounds", "st_old", "tiers_old")}
       |SELECT * FROM (
       |  ${planSelect("SELECT hi FROM bounds", "st_new", "tiers_new").replace("\n", " ")}
       |  EXCEPT
       |  ${planSelect("SELECT prev_hi FROM bounds", "st_old", "tiers_old").replace("\n", " ")}
       |) ORDER BY partition_size DESC, start_block""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_r1_partition_plan" -> (partitionPlan _),
    "q_a2_worklist_diff" -> (worklistDiff _))

  val oracles: Map[String, String] = Map(
    "q_r1_partition_plan" -> partitionPlanSql,
    "q_a2_worklist_diff" -> worklistDiffSql)
}
