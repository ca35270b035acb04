package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables
import graft.sources.Tables.dec2

/** Analytics over the `events` stream table and the star schema —
  * window functions, sessionization, as-of joins, rollups, and set
  * operations (SURVEY.md §2.7/§2.8 are absent in the reference; these
  * are the beyond-parity operators a real pipeline needs).
  *
  * Time discipline: all comparisons/arithmetic run on integer epoch
  * micros/nanos (`ts_ns` longs), never on engine timestamp types, so
  * Spark (micros) and DuckDB (nanos) agree exactly; timestamps in
  * output are formatted strings.
  */
object EventAnalytics {

  /** Tumbling 1-hour windowed aggregation per event type — the batch
    * twin of the Structured Streaming windowed aggregation (the
    * streaming module reuses this shape with a watermark).
    */
  def eventsWindowedAgg(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(
        window(col("ts"), "1 hour").getField("start").as("hour_start"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum((dec2(col("value")) * 100).cast(DecimalType(38, 0)))
          .cast(LongType).as("sum_value_cents"),
        countDistinct("user_id").as("n_users"))
      .select(
        date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss").as("hour_s"),
        col("event_type"), col("n_events"), col("sum_value_cents"), col("n_users"))
      .orderBy("hour_s", "event_type")

  val eventsWindowedAggSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_s,
      |  event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_value_cents,
      |  count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2 ORDER BY hour_s, event_type""".stripMargin

  /** RECENCY-DECAYED per-user value: each event's cents contribute
    * `cents >> (age_weeks)` — an exact half-life-of-one-week decay —
    * summed per user beside the undecayed total. The standard
    * recency-weighted engagement/LTV feature, in the only decay family
    * that is bit-exact across engines: exp(-λ·age) ties the hash to
    * libm, but halving per period is an integer shift in both (Spark
    * `shiftright`, DuckDB `>>`). The reference instant is the corpus
    * max timestamp (a one-row broadcast), NOT the wall clock, so the
    * result is a pure function of the data.
    *
    * Scale: one scalar broadcast, map-side shift, one per-user partial
    * aggregation — the feature-extraction plan shape.
    */
  def decayScore(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
      .select(col("user_id"), col("ts_ns"),
        (dec2(col("value")) * 100).cast(LongType).as("cents"))
    val ref = e.agg(max("ts_ns").as("ref_ns"))
    e.crossJoin(broadcast(ref))
      .withColumn("age_weeks",
        expr("least((ref_ns - ts_ns) div 604800000000000L, 62L)"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum("cents").as("raw_cents"),
        // sign-aware shift: decay must converge to ZERO for refunds too
        // (an arithmetic shift leaves -1 >> k == -1 forever)
        sum(expr(
          """CASE WHEN cents >= 0 THEN shiftright(cents, cast(age_weeks as int))
            |ELSE -shiftright(-cents, cast(age_weeks as int)) END""".stripMargin))
          .as("decayed_cents"))
      .orderBy("user_id")
  }

  val decayScoreSql: String =
    """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns,
      |             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |           FROM events),
      |r AS (SELECT max(ts_ns) AS ref_ns FROM e),
      |a AS (SELECT user_id, cents,
      |        CAST(least((ref_ns - ts_ns) // 604800000000000, 62) AS INT) AS k
      |      FROM e, r)
      |SELECT user_id, count(*) AS n_events,
      |  CAST(sum(cents) AS BIGINT) AS raw_cents,
      |  CAST(sum(CASE WHEN cents >= 0 THEN cents >> k
      |           ELSE -((-cents) >> k) END) AS BIGINT) AS decayed_cents
      |FROM a GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Sessionization: 30-minute inactivity gap splits a user's events
    * into sessions (lag + running sum of boundaries — one shuffle on
    * user_id, then linear window work; the standard scalable shape).
    */
  def eventsSessionize(spark: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_ns")
    val gapNs = 30L * 60 * 1000000000L
    Tables.events(spark, d)
      .select(col("user_id"), col("ts_ns"), col("event_id"))
      .withColumn("prev_ns", lag("ts_ns", 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ns").isNull || col("ts_ns") - col("prev_ns") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("is_new").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        min("event_id").as("first_event_id"),
        max("event_id").as("last_event_id"),
        expr("(max(ts_ns) - min(ts_ns)) div 1000000000").as("duration_s"))
      .orderBy("user_id", "session_seq")
  }

  /** Session-scoped event-TRANSITION matrix: counts of (event_type →
    * next event_type) within a session, with the conditional
    * probability in ppm-style e6 — the Markov view of user behavior
    * (the data-prep step behind next-action models and the sanity
    * check behind funnel definitions: a funnel step pair that never
    * appears as a transition is a fiction). Transitions never cross
    * the 30-minute session boundary — the lead() is partitioned by
    * (user, session), not by user.
    *
    * Scale: the session assignment is the [[eventsSessionize]] lag/
    * cumsum form (user-partitioned windows — well-keyed); the lead()
    * reuses the SAME user-keyed exchange; the transition aggregation
    * shuffles |types|² partials, model-sized. Nothing corpus-sized is
    * windowed globally.
    */
  def eventTransitions(spark: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    val gapNs = 30L * 60 * 1000000000L
    val s = Tables.events(spark, d)
      .select(col("user_id"), col("ts_ns"), col("event_id"), col("event_type"))
      .withColumn("prev_ns", lag("ts_ns", 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ns").isNull || col("ts_ns") - col("prev_ns") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum("is_new").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("to_type", lead("event_type", 1).over(
        Window.partitionBy("user_id", "session_seq")
          .orderBy("ts_ns", "event_id")))
      .where(col("to_type").isNotNull)
    val counts = s.groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("from_total",
        sum("n").over(Window.partitionBy("from_type")))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 1000000L div from_total").as("p_e6"))
      .orderBy("from_type", "to_type")
  }

  val eventTransitionsSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) AS ts_ns, event_id, event_type,
      |    lag(epoch_ns(ts)) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ns(ts), event_id) AS prev_ns
      |  FROM events),
      |m AS (
      |  SELECT *, CASE WHEN prev_ns IS NULL OR ts_ns - prev_ns > 1800000000000 THEN 1 ELSE 0 END AS is_new
      |  FROM e),
      |s AS (
      |  SELECT user_id, ts_ns, event_id, event_type,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM m),
      |t AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id, session_seq
      |      ORDER BY ts_ns, event_id) AS to_type
      |  FROM s),
      |c AS (SELECT from_type, to_type, count(*) AS n FROM t
      |      WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
      |SELECT from_type, to_type, n,
      |  CAST(n * 1000000 // sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS p_e6
      |FROM c ORDER BY from_type, to_type""".stripMargin

  /** Batch face of the native `session_window` sessionizer (shared plan
    * with the streaming twin — see [[graft.streaming.EventStream
    * .sessionWindows]]; the watermark is a no-op in batch). Kept beside
    * [[eventsSessionize]] deliberately: the lag/cumsum form is what you
    * write when you need custom per-session logic, the native operator
    * is what you run when you don't — and on a stream only the native
    * form gets engine-managed bounded state. Boundary semantics match
    * the lag form: a gap of EXACTLY the 30-minute window still merges
    * (verified empirically on Spark 4.1.2 — two events 30:00 apart form
    * one session ending at +1:00); only a strictly larger gap splits.
    */
  def eventsSessionWindow(spark: SparkSession, d: String): DataFrame =
    graft.streaming.EventStream.sessionWindows(
        Tables.events(spark, d).select("user_id", "ts", "event_id"))
      .orderBy("user_id", "session_start_us")

  val eventsSessionWindowSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id,
      |    lag(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000) AS prev_us
      |  FROM events),
      |m AS (
      |  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
      |  FROM e),
      |s AS (
      |  SELECT user_id, ts_us, event_id,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM m)
      |SELECT user_id, min(ts_us) AS session_start_us,
      |  max(ts_us) + 1800000000 AS session_end_us,
      |  count(*) AS n_events,
      |  min(event_id) AS first_event_id, max(event_id) AS last_event_id
      |FROM s GROUP BY user_id, session_seq
      |ORDER BY user_id, session_start_us""".stripMargin

  val eventsSessionizeSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) AS ts_ns, event_id,
      |    lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)) AS prev_ns
      |  FROM events),
      |m AS (
      |  SELECT *, CASE WHEN prev_ns IS NULL OR ts_ns - prev_ns > 1800000000000 THEN 1 ELSE 0 END AS is_new
      |  FROM e),
      |s AS (
      |  SELECT user_id, ts_ns, event_id,
      |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ns
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM m)
      |SELECT user_id, session_seq, count(*) AS n_events,
      |  min(event_id) AS first_event_id, max(event_id) AS last_event_id,
      |  (max(ts_ns) - min(ts_ns)) // 1000000000 AS duration_s
      |FROM s GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** Per-user activity stats with a global rank — top-20 users. */
  def eventsUserStats(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum((dec2(col("value")) * 100).cast(DecimalType(38, 0)))
          .cast(LongType).as("sum_value_cents"),
        countDistinct("event_type").as("n_types"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_events").desc, col("user_id"))))
      .where(col("rank") <= 20)
      .orderBy("rank")

  val eventsUserStatsSql: String =
    """WITH u AS (
      |  SELECT user_id, count(*) AS n_events,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_value_cents,
      |    count(DISTINCT event_type) AS n_types
      |  FROM events GROUP BY user_id)
      |SELECT user_id, n_events, sum_value_cents, n_types,
      |  row_number() OVER (ORDER BY n_events DESC, user_id) AS rank
      |FROM u QUALIFY rank <= 20 ORDER BY rank""".stripMargin

  /** As-of join: each purchase matched to the same user's most recent
    * click at-or-before it. Spark has no ASOF JOIN; the scalable
    * re-expression is union → one shuffle+sort per user → running
    * `last(_, ignoreNulls)` — linear in events, no range-join blowup.
    * The DuckDB oracle uses its native ASOF JOIN, making this a true
    * cross-engine semantics check.
    */
  def joinAsof(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(col("user_id"), expr("ts_ns div 1000").as("t_us"),
        col("event_id"), col("event_type"))
    // kind 0 = click (right side) sorts before kind 1 = purchase (left
    // side) at equal t_us, making the match inclusive (click at the same
    // instant is visible to the purchase). Ties of clicks at the SAME
    // t_us resolve to the max click_id (running last over click_id
    // order); the oracle collapses such ties identically, since DuckDB's
    // ASOF JOIN is otherwise free to pick any tied row.
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("t_us"), lit(0).as("kind"),
        col("event_id").as("click_id"), lit(null).cast(LongType).as("purchase_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("t_us"), lit(1).as("kind"),
        lit(null).cast(LongType).as("click_id"), col("event_id").as("purchase_id"))
    val w = Window.partitionBy("user_id")
      .orderBy("t_us", "kind", "click_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("last_click_id", last("click_id", ignoreNulls = true).over(w))
      .where(col("kind") === 1)
      .select(col("purchase_id"), col("user_id"), col("t_us").as("purchase_us"),
        col("last_click_id"))
      .orderBy("purchase_id")
  }

  val joinAsofSql: String =
    """WITH c0 AS (SELECT user_id, epoch_ns(ts) // 1000 AS t_us, event_id
      |            FROM events WHERE event_type = 'click'),
      |c AS (SELECT user_id, t_us, max(event_id) AS event_id
      |      FROM c0 GROUP BY user_id, t_us),
      |p AS (SELECT user_id, epoch_ns(ts) // 1000 AS t_us, event_id
      |      FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id AS purchase_id, p.user_id, p.t_us AS purchase_us,
      |  c.event_id AS last_click_id
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.t_us >= c.t_us
      |ORDER BY purchase_id""".stripMargin

  /** ROLLUP over region → nation of customer balances (grouping-set
    * aggregation; partial aggregation applies per grouping set).
    */
  def aggRollup(spark: SparkSession, d: String): DataFrame = {
    Tables.customer(spark, d).createOrReplaceTempView("customer_v")
    Tables.nation(spark, d).createOrReplaceTempView("nation_v")
    Tables.region(spark, d).createOrReplaceTempView("region_v")
    spark.sql(
      """SELECT /*+ BROADCAST(n), BROADCAST(r) */ r_name, n_name,
        |  CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))) AS BIGINT) AS sum_acctbal_cents,
        |  count(*) AS n_customers,
        |  CAST(grouping(r_name) * 2 + grouping(n_name) AS BIGINT) AS grouping_level
        |FROM customer_v c
        |JOIN nation_v n ON c_nationkey = n_nationkey
        |JOIN region_v r ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
  }

  val aggRollupSql: String =
    """SELECT r_name, n_name,
      |  CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_acctbal_cents,
      |  count(*) AS n_customers,
      |  CAST(grouping(r_name) * 2 + grouping(n_name) AS BIGINT) AS grouping_level
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  /** Batch face of the stream-stream interval join (see
    * [[graft.streaming.EventStream.clickAttribution]] — every purchase
    * matched to the same user's clicks in the preceding 30 minutes, the
    * attribution join). Shared expression with the streaming twin
    * (StreamingJoinSpec pins stream == batch); in batch the watermarks
    * are no-ops and the plan is an equi-join on user_id with the time
    * band as a residual predicate — NOT a pure range join, so no
    * quadratic blowup: pairs only form within a user's partition.
    */
  def joinAttribution(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    graft.streaming.EventStream.clickAttribution(ev, ev)
      .orderBy("purchase_id", "click_id")
  }

  val joinAttributionSql: String =
    """WITH c AS (SELECT user_id, epoch_ns(ts) // 1000 AS c_us, event_id AS click_id
      |           FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, epoch_ns(ts) // 1000 AS p_us, event_id AS purchase_id
      |      FROM events WHERE event_type = 'purchase')
      |SELECT p.purchase_id, c.click_id, p.user_id, p.p_us, c.c_us
      |FROM p JOIN c ON p.user_id = c.user_id
      |  AND c.c_us <= p.p_us AND c.c_us >= p.p_us - 1800000000
      |ORDER BY purchase_id, click_id""".stripMargin

  /** CUBE grouping sets — the full 2^k lattice where [[aggRollup]]
    * walks only the hierarchy: per-(source × lang) corpus volumes with
    * every marginal, the cross-dimension report a mixture dashboard
    * reads. NULL group labels are coalesced to '<all>' so the total
    * ORDER BY needs no engine-specific NULLS placement, with the
    * grouping-bit vector kept to disambiguate.
    *
    * Scale: Spark plans CUBE as one Expand (4 rows per input here) into
    * the same partial+final hash agg — group count is |sources|·|langs|
    * sized, tiny at any corpus scale.
    */
  def aggCube(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .cube("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        expr("CAST(grouping_id() AS BIGINT)").as("gid"))
      .select(
        coalesce(col("source"), lit("<all>")).as("source"),
        coalesce(col("lang"), lit("<all>")).as("lang"),
        col("n_docs"), col("sum_chars"), col("gid"))
      .orderBy("gid", "source", "lang")

  val aggCubeSql: String =
    """SELECT coalesce(source, '<all>') AS source,
      |  coalesce(lang, '<all>') AS lang,
      |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(GROUPING(source, lang) AS BIGINT) AS gid
      |FROM documents GROUP BY CUBE (source, lang)
      |ORDER BY gid, source, lang""".stripMargin

  /** MERGE / UPSERT semantics (the lakehouse write pattern, expressed
    * engine-neutrally): an incoming batch is merged into a base
    * snapshot by key — matched rows take the incoming version
    * (`update`), unmatched incoming rows are inserted, unmatched base
    * rows survive (`keep`). Base = even doc_ids, incoming = every
    * third doc with a modified payload, so all three actions occur.
    * The per-row action tag is what a MERGE audit log materializes.
    *
    * Scale: one full-outer shuffle join on the key — Spark plans
    * sort-merge with map-side partials on both scans; on a partitioned
    * base table the same expression runs per-partition and dynamic
    * partition overwrite rewrites only touched partitions (the
    * ExtractPipeline bulk path already demonstrates that write side).
    */
  def mergeUpsert(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
    val base = docs.where(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("n_chars").as("base_chars"))
    val incoming = docs.where(col("doc_id") % 3 === 0)
      .select(col("doc_id"), (col("n_chars") + 7).as("new_chars"))
    mergeFrames(base, incoming).orderBy("doc_id")
  }

  /** Frame-in MERGE over (doc_id, base_chars) × (doc_id, new_chars).
    * Classification and the final value are keyed on ROW PRESENCE, not
    * payload nullness: MERGE matches on the key, so a matched incoming
    * row with a NULL payload is still an `update` and its (null)
    * payload wins — the oracle classifies by join-key presence the same
    * way. Unit-tested on crafted NULL payloads in ReshapeSpec.
    */
  def mergeFrames(base: DataFrame, incoming: DataFrame): DataFrame =
    base.withColumn("in_base", lit(true))
      .join(incoming.withColumn("in_inc", lit(true)), Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        when(col("in_inc") && col("in_base"), "update")
          .when(col("in_inc"), "insert")
          .otherwise("keep").as("action"),
        when(col("in_inc"), col("new_chars"))
          .otherwise(col("base_chars")).as("n_chars_final"))

  val mergeUpsertSql: String =
    """WITH base AS (SELECT doc_id, n_chars AS base_chars FROM documents
      |              WHERE doc_id % 2 = 0),
      |inc AS (SELECT doc_id, n_chars + 7 AS new_chars FROM documents
      |        WHERE doc_id % 3 = 0)
      |SELECT coalesce(base.doc_id, inc.doc_id) AS doc_id,
      |  CASE WHEN inc.doc_id IS NOT NULL AND base.doc_id IS NOT NULL THEN 'update'
      |       WHEN inc.doc_id IS NOT NULL THEN 'insert'
      |       ELSE 'keep' END AS action,
      |  CAST(CASE WHEN inc.doc_id IS NOT NULL THEN inc.new_chars
      |            ELSE base.base_chars END AS BIGINT) AS n_chars_final
      |FROM base FULL OUTER JOIN inc ON base.doc_id = inc.doc_id
      |ORDER BY doc_id""".stripMargin

  /** Set operations (§2.8): INTERSECT / EXCEPT / UNION ALL in one
    * result — market-segment customers split by purchase activity.
    */
  def setOps(spark: SparkSession, d: String): DataFrame = {
    val building = Tables.customer(spark, d)
      .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val buyers = Tables.orders(spark, d)
      .select(col("o_custkey").as("c_custkey")).distinct()
    building.intersect(buyers).select(lit("active").as("tag"), col("c_custkey"))
      .unionAll(
        building.except(buyers).select(lit("dormant").as("tag"), col("c_custkey")))
      .orderBy("tag", "c_custkey")
  }

  val setOpsSql: String =
    """SELECT 'active' AS tag, c_custkey
      |FROM (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |      INTERSECT SELECT o_custkey FROM orders)
      |UNION ALL
      |SELECT 'dormant' AS tag, c_custkey
      |FROM (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |      EXCEPT SELECT o_custkey FROM orders)
      |ORDER BY tag, c_custkey""".stripMargin

  /** TPC-H Q3 shape: selective join across customer→orders→lineitem
    * with aggregation and top-10 — the classic shuffle-join benchmark.
    * Customer (filtered) broadcasts; orders⋈lineitem shuffles on the
    * order key.
    */
  def q3Shipping(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(spark, d).where(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, d)
      .where(col("o_orderdate") < lit("1998-01-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey"),
        (dec2(col("l_extendedprice")) * 100).cast(LongType).as("price_c"),
        (dec2(col("l_discount")) * 100).cast(LongType).as("disc_pct"))
    ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(
        sum(expr("price_c * (100 - disc_pct)")).as("revenue_e4"),
        min(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("orderdate_s"))
      .orderBy(col("revenue_e4").desc, col("o_orderkey"))
      .limit(10)
  }

  val q3ShippingSql: String =
    """SELECT o_orderkey,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |         * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))) AS BIGINT) AS revenue_e4,
      |  min(strftime(o_orderdate, '%Y-%m-%d')) AS orderdate_s
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY o_orderkey
      |ORDER BY revenue_e4 DESC, o_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q18 shape (large-volume orders): the HAVING-filtered
    * semi-aggregate feeding a multi-join report. The quantity rollup is
    * ONE map-side-combined exchange on l_orderkey; only the surviving
    * large orders (a tiny fraction by construction) join onward, so the
    * customer join streams a filtered fact side. Cents-integer
    * discipline as in [[q1Agg]]; threshold shared with the oracle.
    */
  val Q18QtyCentsMin = 25000L

  def q18LargeOrders(spark: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(spark, d)
      .select(col("l_orderkey"),
        (dec2(col("l_quantity")) * 100).cast(LongType).as("qty_c"))
      .groupBy("l_orderkey").agg(sum("qty_c").as("sum_qty_cents"))
      .where(col("sum_qty_cents") > Q18QtyCentsMin)
    Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate_s"),
        (dec2(col("o_totalprice")) * 100).cast(LongType).as("totalprice_c"))
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, d).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("orderdate_s"), col("totalprice_c"), col("sum_qty_cents"))
      .orderBy(col("totalprice_c").desc, col("o_orderkey"))
  }

  val q18LargeOrdersSql: String =
    s"""SELECT c_name, c_custkey, o_orderkey,
       |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate_s,
       |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS totalprice_c,
       |  big.sum_qty_cents
       |FROM orders
       |JOIN (SELECT l_orderkey,
       |        CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_qty_cents
       |      FROM lineitem GROUP BY l_orderkey
       |      HAVING sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) > $Q18QtyCentsMin) big
       |  ON o_orderkey = big.l_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY totalprice_c DESC, o_orderkey""".stripMargin

  /** TPC-H Q10 shape (returned-item report): revenue lost to returns
    * per customer, top 20. The return-flag filter prunes the fact scan
    * BEFORE any join (pushed to parquet); customer and nation are
    * broadcast dimensions; one customer-keyed aggregation; the global
    * top-20 rides the bounded TakeOrdered path.
    */
  def q10ReturnedItem(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (dec2(col("l_extendedprice")) * 100).cast(LongType).as("price_c"),
        (dec2(col("l_discount")) * 100).cast(LongType).as("disc_pct"))
    Tables.orders(spark, d).select("o_orderkey", "o_custkey")
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.customer(spark, d)
        .select("c_custkey", "c_name", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, d)
        .select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(expr("price_c * (100 - disc_pct)"))
        .cast(DecimalType(38, 0)).cast(LongType).as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("c_custkey"))
      .limit(20)
  }

  val q10ReturnedItemSql: String =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |         * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))) AS BIGINT) AS revenue_e4
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation ON n_nationkey = c_nationkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue_e4 DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q14 shape (promotion effect): the conditional-aggregate
    * ratio over a dimension attribute. Part is a broadcast dimension;
    * the whole corpus folds into ONE row of Decimal(38,0) partials, and
    * the ppm ratio is exact integer division — emitted beside the raw
    * sums (as digit strings, the [[q1Agg]] overflow discipline).
    */
  def q14PromoEffect(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .select(col("l_partkey"),
        (dec2(col("l_extendedprice")) * 100).cast(LongType).as("price_c"),
        (dec2(col("l_discount")) * 100).cast(LongType).as("disc_pct"))
    li.join(broadcast(Tables.part(spark, d).select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .select(
        expr("case when p_type = 'PROMO' then price_c * (100 - disc_pct) else 0L end")
          .cast(DecimalType(38, 0)).as("promo_e4"),
        expr("price_c * (100 - disc_pct)").cast(DecimalType(38, 0)).as("rev_e4"))
      .agg(sum("promo_e4").as("p"), sum("rev_e4").as("r"))
      .select(
        col("p").cast(DecimalType(38, 0)).cast(StringType).as("promo_revenue_e4"),
        col("r").cast(DecimalType(38, 0)).cast(StringType).as("total_revenue_e4"),
        expr("cast(p * 1000000 div r as bigint)").as("promo_ratio_ppm"))
  }

  val q14PromoEffectSql: String =
    """WITH t AS (SELECT
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)) AS rev_e4,
      |    p_type
      |  FROM lineitem JOIN part ON p_partkey = l_partkey),
      |s AS (SELECT
      |    CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END) AS DECIMAL(38,0)) AS p,
      |    CAST(sum(rev_e4) AS DECIMAL(38,0)) AS r
      |  FROM t)
      |SELECT CAST(p AS VARCHAR) AS promo_revenue_e4,
      |  CAST(r AS VARCHAR) AS total_revenue_e4,
      |  -- DECIMAL // in DuckDB ROUNDS; HUGEINT // is the true floor
      |  CAST(CAST(p AS HUGEINT) * 1000000 // CAST(r AS HUGEINT) AS BIGINT) AS promo_ratio_ppm
      |FROM s""".stripMargin

  /** TPC-H Q4 shape (priority check): per-priority count of one year's
    * orders having at least one returned line — the EXISTS decorrelates
    * to a LEFT-SEMI join, the shape Spark plans it as natively (one
    * shuffle on the order key, no duplication of matching orders, the
    * semi side carries only the join key). The date filter prunes the
    * orders scan before the join.
    */
  def q4PriorityExists(spark: SparkSession, d: String): DataFrame = {
    val returned = Tables.lineitem(spark, d)
      .where(col("l_returnflag") === "R").select("l_orderkey")
    Tables.orders(spark, d)
      .where(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .select("o_orderkey", "o_orderpriority")
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q4PriorityExistsSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    * join with a predicate INSIDE the join condition (customers keep a
    * row even when every order is filtered away — semantically distinct
    * from a WHERE, which would drop them), then two cascaded
    * aggregations. The second groupBy is tiny (|distinct counts| keys);
    * all the weight is the first customer-keyed count.
    */
  def q13CustDist(spark: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(spark, d)
      .where(col("o_orderpriority") =!= "1-URGENT")
      .select("o_orderkey", "o_custkey")
    Tables.customer(spark, d).select("c_custkey")
      .join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey").agg(count("o_orderkey").as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13CustDistSql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    * count per part descriptor, EXCLUDING a supplier blocklist — the
    * NOT-IN decorrelates to a LEFT-ANTI join on the fact's supplier
    * key (broadcast: the blocklist is dimension-sized), the part
    * dimension broadcasts with its filters pushed into the build side,
    * and the distinct count is the one real shuffle.
    */
  def q16SupplierCnt(spark: SparkSession, d: String): DataFrame = {
    val excluded = Tables.supplier(spark, d)
      .where(col("s_name").endsWith("7")).select("s_suppkey")
    Tables.lineitem(spark, d).select("l_partkey", "l_suppkey")
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(Tables.part(spark, d)
        .where(col("p_brand") =!= "Brand#45" && col("p_size") <= 25)
        .select("p_partkey", "p_brand", "p_type", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q16SupplierCntSql: String =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#45' AND p_size <= 25
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                        WHERE s_name LIKE '%7')
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q17 shape (small-quantity-order revenue): revenue from
    * lineitems whose quantity is below 20% of their part's average —
    * the correlated AVG subquery decorrelates to a per-part aggregate
    * joined back to the fact. The average never materializes as a
    * fraction: `qty < sum/n/5` is evaluated as the integer
    * cross-multiplication `5·qty·n < sum`, exact in both engines.
    * Total divides by 7 ("yearly" normalization) with integer div.
    */
  def q17SmallQtyRevenue(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .select(col("l_partkey"),
        (dec2(col("l_quantity")) * 100).cast(LongType).as("qty_c"),
        (dec2(col("l_extendedprice")) * 100).cast(LongType).as("price_c"))
    val brandParts = Tables.part(spark, d)
      .where(col("p_brand") === "Brand#23").select("p_partkey")
    val perPart = li.groupBy("l_partkey")
      .agg(sum("qty_c").as("sum_qty_c"), count(lit(1)).as("n_li"))
    li.join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      .join(perPart, Seq("l_partkey"))
      .where(col("qty_c") * col("n_li") * 5 < col("sum_qty_c"))
      .agg(coalesce(sum("price_c"), lit(0L)).as("s"))
      .select(expr("s div 7").as("avg_yearly_c"))
  }

  val q17SmallQtyRevenueSql: String =
    """WITH li AS (SELECT l_partkey,
      |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_c,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
      |  FROM lineitem),
      |pp AS (SELECT l_partkey, CAST(sum(qty_c) AS BIGINT) AS sum_qty_c,
      |    count(*) AS n_li FROM li GROUP BY l_partkey)
      |SELECT CAST(coalesce(sum(price_c), 0) AS BIGINT) // 7 AS avg_yearly_c
      |FROM li
      |JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#23'
      |JOIN pp USING (l_partkey)
      |WHERE qty_c * n_li * 5 < sum_qty_c""".stripMargin

  /** TPC-H Q22 shape (global sales opportunity): per-nation count and
    * balance of above-average-balance customers who never placed an
    * urgent order. Two decorrelations in one plan: the scalar AVG
    * subquery becomes a 1-row broadcast joined to every customer
    * (compared exactly via `bal·n > sum` cross-multiplication), and
    * the NOT EXISTS becomes a LEFT-ANTI join against the urgent-order
    * customer keys. Both joins leave the customer table unshuffled
    * until the final small nation-keyed aggregate.
    */
  def q22NoUrgent(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(spark, d)
      .select(col("c_custkey"), col("c_nationkey"),
        (dec2(col("c_acctbal")) * 100).cast(LongType).as("bal_c"))
    val posStats = cust.where(col("bal_c") > 0L)
      .agg(sum("bal_c").as("sum_pos_c"), count(lit(1)).as("n_pos"))
    val urgent = Tables.orders(spark, d)
      .where(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    cust.crossJoin(broadcast(posStats))
      .where(col("bal_c") * col("n_pos") > col("sum_pos_c"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"), sum("bal_c").as("totacctbal_c"))
      .orderBy("c_nationkey")
  }

  val q22NoUrgentSql: String =
    """WITH cust AS (SELECT c_custkey, c_nationkey,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
      |  FROM customer),
      |pos AS (SELECT CAST(sum(bal_c) AS BIGINT) AS sum_pos_c, count(*) AS n_pos
      |  FROM cust WHERE bal_c > 0)
      |SELECT c_nationkey, count(*) AS numcust,
      |  CAST(sum(bal_c) AS BIGINT) AS totacctbal_c
      |FROM cust, pos
      |WHERE bal_c * n_pos > sum_pos_c
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** Salted two-phase aggregation: the skew-safe shape for hot keys at
    * 100 TB. Phase 1 aggregates on (key, salt) — a hot key's rows split
    * across SaltBuckets reducers — phase 2 merges the partials per key.
    * Results are EXACTLY the plain GROUP BY (integer sums are
    * associative), which is what the oracle checks; only the shuffle
    * distribution differs. Salt is derived deterministically from
    * event_id so re-runs are stable.
    */
  def aggSalted(spark: SparkSession, d: String): DataFrame = {
    val SaltBuckets = 8
    Tables.events(spark, d)
      .select(col("user_id"),
        (col("event_id") % SaltBuckets).as("salt"),
        (dec2(col("value")) * 100).cast(DecimalType(38, 0)).as("cents"))
      .groupBy("user_id", "salt")
      .agg(count(lit(1)).as("n_partial"), sum("cents").as("cents_partial"))
      .groupBy("user_id")
      .agg(sum("n_partial").as("n_events"),
        sum("cents_partial").cast(LongType).as("sum_value_cents"))
      .orderBy("user_id")
  }

  val aggSaltedSql: String =
    """SELECT user_id, count(*) AS n_events,
      |  CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_value_cents
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** TPC-H Q5 shape: six-table join — dimensions broadcast down the
    * chain, the orders⋈lineitem shuffle keyed on the order key, revenue
    * summed per nation only where supplier and customer share the
    * nation (the classic local-supplier-volume semantics).
    */
  def q5LocalSupplier(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d).select(
      col("l_orderkey"), col("l_suppkey"),
      (dec2(col("l_extendedprice")) * 100).cast(LongType).as("price_c"),
      (dec2(col("l_discount")) * 100).cast(LongType).as("disc_pct"))
    li.join(Tables.orders(spark, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(spark, d).select("c_custkey", "c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, d).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      // nation-level groups are unbounded at corpus scale and the addend
      // is e4-scale, so accumulate + emit as Decimal(38,0)→string (same
      // discipline as Q1's charge_e6)
      .agg(sum(expr("cast(price_c * (100 - disc_pct) as decimal(38,0))"))
          .cast(DecimalType(38, 0)).cast(StringType).as("revenue_e4"),
        count(lit(1)).as("n_lineitems"))
      .orderBy("r_name", "n_name")
  }

  val q5LocalSupplierSql: String =
    """SELECT r_name, n_name,
      |  CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |         * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))) AS DECIMAL(38,0)) AS VARCHAR) AS revenue_e4,
      |  count(*) AS n_lineitems
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Sliding window frame: 7-row trailing revenue average per day —
    * ROWS BETWEEN frame semantics over an ordered daily series.
    */
  def windowFrames(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day_s"))
      .agg(sum((dec2(col("value")) * 100).cast(LongType)).as("rev_c"))
    daily
      .withColumn("trailing_avg_c", expr(
        """sum(rev_c) OVER (ORDER BY day_s ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
          | div count(rev_c) OVER (ORDER BY day_s ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"""
          .stripMargin.replace("\n", "")))
      .select(col("day_s"), col("rev_c").as("rev_cents"),
        col("trailing_avg_c"))
      .orderBy("day_s")
  }

  val windowFramesSql: String =
    """WITH daily AS (
      |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day_s,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c
      |  FROM events GROUP BY 1)
      |SELECT day_s, rev_c AS rev_cents,
      |  CAST(sum(rev_c) OVER w AS BIGINT)
      |    // count(rev_c) OVER w AS trailing_avg_c
      |FROM daily
      |WINDOW w AS (ORDER BY day_s ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY day_s""".stripMargin

  /** RANGE-frame rolling window: 7-day rolling revenue/event counts per
    * event type over integer epoch-days — the frame mode [[windowFrames]]
    * (ROWS) can't express: RANGE bounds are VALUE distances, so days
    * missing from the series still age out of the window correctly
    * (ROWS 6 PRECEDING would reach back past a gap). Epoch-day integers
    * keep the frame arithmetic engine-exact.
    *
    * Scale: the heavy input is pre-aggregated to one row per
    * (type, day) — partial map-side combine — before the window, so the
    * window sorts |types|·|days| short rows, never raw events.
    */
  /** One row per (event_type, epoch_day) with event count and cents
    * revenue — the shared pre-aggregation under [[windowRange]] and
    * [[eventsAnomaly]] (partial map-side combine; raw events never
    * reach their windows/joins).
    */
  private def dailyRevenue(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(col("event_type"), expr("ts_ns div 86400000000000L").as("epoch_day"))
      .agg(count(lit(1)).as("n_events"),
        sum((dec2(col("value")) * 100).cast(LongType)).as("rev_c"))

  def windowRange(spark: SparkSession, d: String): DataFrame = {
    val daily = dailyRevenue(spark, d)
    val w = Window.partitionBy("event_type").orderBy("epoch_day")
      .rangeBetween(-6, Window.currentRow)
    daily
      .withColumn("roll7_rev_c", sum("rev_c").over(w))
      .withColumn("roll7_events", sum("n_events").over(w))
      .select(col("event_type"), col("epoch_day"), col("rev_c"),
        col("roll7_rev_c"), col("roll7_events"))
      .orderBy("event_type", "epoch_day")
  }

  val windowRangeSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS epoch_day,
      |    count(*) AS n_events,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, epoch_day, rev_c,
      |  CAST(sum(rev_c) OVER w AS BIGINT) AS roll7_rev_c,
      |  CAST(sum(n_events) OVER w AS BIGINT) AS roll7_events
      |FROM daily
      |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_day
      |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY event_type, epoch_day""".stripMargin

  /** ANOMALY detection on the daily revenue series: flag days strictly more
    * than 2 standard deviations from their event type's mean, with the z-test
    * rewritten DIVISION-FREE over integers —
    * `(n·x − S)² > 4·(n·Q − S²)` (S = Σx, Q = Σx², n = days) is exactly
    * `(x − μ)² > (2σ)²` with both sides multiplied by n², so the
    * boolean is bit-identical on any engine with exact integer
    * arithmetic (Decimal(38,0) here, HUGEINT in DuckDB). No float
    * mean/variance ever exists to round.
    *
    * Scale: the series is pre-aggregated per (type, day), the per-type
    * moment row is a broadcast, and the flag is a map-side comparison —
    * the same two-pass (moments, then score) shape any z-score monitor
    * runs; at 100 TB only the daily pre-aggregation touches raw events.
    */
  def eventsAnomaly(spark: SparkSession, d: String): DataFrame = {
    val daily = dailyRevenue(spark, d).select("event_type", "epoch_day", "rev_c")
    val stats = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("rev_c").cast(DecimalType(38, 0))).as("s"),
        sum(col("rev_c").cast(DecimalType(38, 0)) * col("rev_c")).as("q"))
    daily.join(broadcast(stats), "event_type")
      .withColumn("dev2", expr(
        "(n * CAST(rev_c AS DECIMAL(38,0)) - s) * (n * CAST(rev_c AS DECIMAL(38,0)) - s)"))
      .withColumn("bound2", expr("4 * (n * q - s * s)"))
      .select(col("event_type"), col("epoch_day"), col("rev_c"),
        (col("n") >= 2 && col("dev2") > col("bound2")).as("is_anomaly"))
      .orderBy("event_type", "epoch_day")
  }

  val eventsAnomalySql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS epoch_day,
      |    CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, count(*) AS n, sum(rev_c) AS s,
      |    sum(rev_c * rev_c) AS q
      |  FROM daily GROUP BY 1)
      |SELECT event_type, epoch_day, rev_c,
      |  (n >= 2 AND (n * rev_c - s) * (n * rev_c - s) > 4 * (n * q - s * s)) AS is_anomaly
      |FROM daily JOIN st USING (event_type)
      |ORDER BY event_type, epoch_day""".stripMargin

  /** Range (band) join: each lineitem priced into a value band via a
    * non-equi join against a tiny broadcast band table — the pattern
    * for histogram/banding joins; Spark plans a broadcast nested-loop,
    * which is exactly right when one side is a handful of ranges.
    */
  def joinRange(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      (0L, 2000000L, "low"),
      (2000000L, 6000000L, "mid"),
      (6000000L, 12000000L, "high"))
      .toDF("lo_cents", "hi_cents", "band")
    Tables.lineitem(spark, d)
      .select((dec2(col("l_extendedprice")) * 100).cast(LongType).as("cents"))
      .join(broadcast(bands),
        col("cents") >= col("lo_cents") && col("cents") < col("hi_cents"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_items"),
        sum(col("cents").cast(DecimalType(38, 0))).cast(LongType)
          .as("sum_cents"))
      .orderBy("band")
  }

  val joinRangeSql: String =
    """WITH bands(lo_cents, hi_cents, band) AS (
      |  VALUES (0, 2000000, 'low'), (2000000, 6000000, 'mid'),
      |         (6000000, 12000000, 'high')),
      |li AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |       FROM lineitem)
      |SELECT band, count(*) AS n_items,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM li JOIN bands ON cents >= lo_cents AND cents < hi_cents
      |GROUP BY band ORDER BY band""".stripMargin

  /** Semi-structured extraction: parse the JSON `props` payload
    * (get_json_object is codegen'd; a production pipeline would use
    * from_json with a schema — same plan shape) and aggregate on the
    * extracted field.
    */
  def jsonExtract(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .where(col("k").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  val jsonExtractSql: String =
    """WITH j AS (SELECT event_type,
      |             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |           FROM events)
      |SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
      |  min(k) AS min_k, max(k) AS max_k
      |FROM j WHERE k IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** HLL sketch distinct-count (approx_count_distinct). Engines' sketch
    * values differ, so the approximate count itself can't be hash-compared
    * cross-engine; instead the query emits the exact count plus a
    * Spark-side accuracy assertion `|approx - exact| * 100 <= exact * 15`
    * (within 15%: the default 5% rsd is a standard deviation, not a
    * bound — at sf0.1 one group's sketch sits past 5%), and the
    * oracle emits the same exact count with a literal `true`. The sketch
    * is thereby oracle-checked: a broken HLL fails the boolean, a broken
    * grouping fails the exact column.
    */
  def hllDistinct(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy("event_type")
      .agg(approx_count_distinct("user_id").as("approx_users"),
        countDistinct("user_id").as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) * 100 <= col("exact_users") * 15)
          .as("within_15pct"))
      .orderBy("event_type")

  val hllDistinctSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS exact_users,
      |  true AS within_15pct
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Strict ordered funnel (view → click → purchase): a user reaches
    * step k only with an event STRICTLY AFTER the event that completed
    * step k-1 (earliest-completion semantics, the standard product
    * funnel). Times compare as exact epoch-nanos, so both engines agree
    * to the tick.
    *
    * Scale shape: one conditional min-aggregate per step, each keyed by
    * user_id — after the first exchange the per-step frames are
    * co-partitioned on the same key, so the step joins add no extra
    * redistribution of the big side, and every aggregate is map-side
    * partial first. Steps are a fixed small chain (3 here), not a
    * per-row iteration.
    */
  def eventsFunnel(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
      .select(col("user_id"), col("event_type"), col("ts_ns"))
    val t1 = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_ns").as("t1"))
    val t2 = ev.where(col("event_type") === "click")
      .join(t1, "user_id").where(col("ts_ns") > col("t1"))
      .groupBy("user_id").agg(min("ts_ns").as("t2"))
    val t3 = ev.where(col("event_type") === "purchase")
      .join(t2, "user_id").where(col("ts_ns") > col("t2"))
      .groupBy("user_id").agg(min("ts_ns").as("t3"))
    val steps = Seq(
      (1L, "view", t1), (2L, "view>click", t2), (3L, "view>click>purchase", t3))
    steps.map { case (no, name, df) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(no).as("step_no"), lit(name).as("step"), col("n_users"))
    }.reduce(_ unionByName _).orderBy("step_no")
  }

  val eventsFunnelSql: String =
    """WITH t1 AS (SELECT user_id, min(epoch_ns(ts)) AS t1 FROM events
      |            WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t2
      |       FROM events e JOIN t1 ON e.user_id = t1.user_id
      |       WHERE e.event_type = 'click' AND epoch_ns(e.ts) > t1.t1
      |       GROUP BY e.user_id),
      |t3 AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t3
      |       FROM events e JOIN t2 ON e.user_id = t2.user_id
      |       WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > t2.t2
      |       GROUP BY e.user_id)
      |SELECT CAST(1 AS BIGINT) AS step_no, 'view' AS step, count(*) AS n_users FROM t1
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), 'view>click', count(*) FROM t2
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), 'view>click>purchase', count(*) FROM t3
      |ORDER BY step_no""".stripMargin

  /** Weekly retention cohorts: users grouped by the epoch-week of their
    * FIRST event; each cell counts how many of a cohort's users were
    * active `week_offset` weeks later — the standard retention triangle.
    * Week arithmetic is integer division of epoch-nanos, so both
    * engines agree exactly. Shuffles: the per-user first-event min
    * (map-side partial), the cohort join back on user_id, and the
    * (cohort, offset) distinct-count. The cohort table is deliberately
    * NOT hint-broadcast: it is one row per distinct USER, which at
    * consumer scale is billions — AQE broadcasts it when it is actually
    * small and falls back to the user_id-keyed shuffle join when not.
    */
  def eventsRetention(spark: SparkSession, d: String): DataFrame = {
    val WeekNs = 604800000000000L // 7 * 86400 * 1e9
    val ev = Tables.events(spark, d).select(col("user_id"), col("ts_ns"))
    val cohorts = ev.groupBy("user_id")
      .agg(expr(s"min(ts_ns) div $WeekNs").as("cohort_week"))
    ev.join(cohorts, "user_id")
      .select(col("user_id"), col("cohort_week"),
        (expr(s"ts_ns div $WeekNs") - col("cohort_week")).as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_active_users"))
      .orderBy("cohort_week", "week_offset")
  }

  val eventsRetentionSql: String =
    """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts_ns FROM events),
      |c AS (SELECT user_id, min(ts_ns) // 604800000000000 AS cohort_week
      |      FROM e GROUP BY user_id)
      |SELECT c.cohort_week,
      |  e.ts_ns // 604800000000000 - c.cohort_week AS week_offset,
      |  count(DISTINCT e.user_id) AS n_active_users
      |FROM e JOIN c ON e.user_id = c.user_id
      |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin

  /** SKEW DIAGNOSTICS: the per-key frequency profile a pipeline reads
    * BEFORE deciding to salt a key (the q_agg_salted / AQE-skew-join
    * decision input): the k hottest keys with their absolute counts,
    * corpus share in ppm, and ratio to the mean key (×100) — "user X
    * carries 37× the average load" is the number that triggers salting.
    *
    * Scale: one shuffle on the key with map-side partial counts (the
    * profile never materializes the raw rows), one broadcast one-row
    * total, TakeOrderedAndProject for the top-k — |keys| rows reach the
    * final ordering, k leave it. The ratio arithmetic runs in
    * Decimal(38,0) so count·1e6 and count·100·n_keys cannot overflow
    * BIGINT on a 10^12-row corpus.
    */
  def skewDiagnostics(spark: SparkSession, d: String, k: Int = 10): DataFrame = {
    val counts = Tables.events(spark, d)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val tot = counts.agg(sum("n_events").as("total"), count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(tot))
      .select(col("user_id"), col("n_events"),
        expr("CAST(CAST(n_events AS DECIMAL(38,0)) * 1000000 div total AS BIGINT)")
          .as("share_ppm"),
        expr("CAST(CAST(n_events AS DECIMAL(38,0)) * 100 * n_keys div total AS BIGINT)")
          .as("vs_mean_x100"))
      .orderBy(col("n_events").desc, col("user_id")).limit(k)
  }

  val skewDiagnosticsSql: String =
    """WITH c AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
      |t AS (SELECT sum(n_events) AS total, count(*) AS n_keys FROM c)
      |SELECT user_id, n_events,
      |  CAST(n_events * 1000000 // total AS BIGINT) AS share_ppm,
      |  CAST(n_events * 100 * n_keys // total AS BIGINT) AS vs_mean_x100
      |FROM c, t ORDER BY n_events DESC, user_id LIMIT 10""".stripMargin

  /** Z-ORDER (Morton) layout key: interleave the low 16 bits of two
    * scan dimensions — here user_id and epoch-day — into one sort key,
    * the multi-dimensional data-skipping layout (Delta/Iceberg
    * Z-ordering): sorting by `zkey` makes fragments cluster in BOTH
    * dimensions at once, so per-fragment min/max stats prune scans
    * filtered on either (a time-range scan and a user-range scan both
    * skip most files, where a plain sort serves only its leading
    * column).
    *
    * Scale: the key is a pure map-side bit-interleave (the compiled
    * `zorder_key` kernel — whole-stage codegen); the ORDER BY is the range
    * partitioning a layout write performs anyway — at 100 TB this IS
    * the write job's sort, not an extra step. Pure integer bit ops,
    * engine-exact.
    */
  /** Declarative reference semantics of the interleave — what the
    * compiled [[graft.functions.ZOrderKey]] kernel computes (disjoint
    * bit positions make the fold's `+` an OR); pinned equal in
    * GraphLayoutSpec. The query uses the kernel so the key projection
    * stays inside whole-stage codegen instead of evaluating an
    * interpreted lambda frame per bit per row.
    */
  val zkeyDeclarative: String =
    """aggregate(sequence(0, 15), 0L, (acc, k) ->
      |  acc + shiftleft((shiftright(x, k) & 1), 2 * k)
      |      + shiftleft((shiftright(y, k) & 1), 2 * k + 1))""".stripMargin

  def zorderLayout(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .select(col("event_id"),
        (col("user_id") % 65536).as("x"),
        expr("(ts_ns div 86400000000000) % 65536").as("y"))
      .withColumn("zkey",
        graft.functions.GraftFunctions.zorder_key(col("x"), col("y")))
      .orderBy("zkey", "event_id")

  val zorderLayoutSql: String =
    """WITH z AS (SELECT event_id,
      |  user_id % 65536 AS x,
      |  (epoch_ns(ts) // 86400000000000) % 65536 AS y
      |  FROM events)
      |SELECT event_id, x, y,
      |  CAST(list_sum(list_transform(range(0, 16), k ->
      |    (((x >> k) & 1) << (2 * k)) + (((y >> k) & 1) << (2 * k + 1)))) AS BIGINT) AS zkey
      |FROM z ORDER BY zkey, event_id""".stripMargin

  /** The event-type vocabulary, fixed in the fixtures. PIVOT always
    * receives it EXPLICITLY: without a values list Spark runs a
    * distinct-scan job first to discover the columns — an extra corpus
    * pass, and a nondeterministic schema if a new type ever lands
    * mid-pipeline. At scale the vocabulary is config, not discovery.
    */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** PIVOT: daily event counts reshaped wide, one column per event
    * type — the long→wide face of the reporting/feature-matrix
    * reshape. Missing cells densified to 0 so the wide frame is a
    * total function of (day × type).
    *
    * Scale: Spark lowers pivot-with-values to TWO aggregates — a
    * (day, type) count with map-side partials (the only exchange the
    * raw events cross), then a day-keyed pivot over the pre-aggregated
    * |days|·|types| rows, whose exchange is negligible by
    * construction. No Expand, no discovery scan; pinned in
    * PlanContractSpec.
    */
  def pivotDaily(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .select(expr("ts_ns div 86400000000000").as("day"), col("event_type"))
      .groupBy("day")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("day")

  val pivotDailySql: String =
    s"""SELECT epoch_ns(ts) // 86400000000000 AS day,
       |${EventTypes.map(t =>
            s"  CAST(count(*) FILTER (WHERE event_type = '$t') AS BIGINT) AS $t")
          .mkString(",\n")}
       |FROM events GROUP BY day ORDER BY day""".stripMargin

  /** UNPIVOT: the wide daily matrix melted back to (day, event_type,
    * n_events) long form — the wide→long face (Spark's native
    * `unpivot`/MELT operator, a zero-shuffle row fan-out). Zero cells
    * from the densified pivot are KEPT: the round trip is the identity
    * on the dense matrix, which is the property the pair test pins.
    */
  def unpivotDaily(spark: SparkSession, d: String): DataFrame =
    pivotDaily(spark, d)
      .unpivot(Array(col("day")), EventTypes.map(col(_)).toArray,
        "event_type", "n_events")
      .orderBy("day", "event_type")

  val unpivotDailySql: String =
    s"""WITH c AS (SELECT epoch_ns(ts) // 86400000000000 AS day, event_type,
       |             count(*) AS n FROM events GROUP BY 1, 2),
       |dd AS (SELECT DISTINCT day FROM c),
       |tt AS (SELECT unnest([${EventTypes.map(t => s"'$t'").mkString(", ")}]) AS event_type)
       |SELECT dd.day, tt.event_type, CAST(coalesce(c.n, 0) AS BIGINT) AS n_events
       |FROM dd CROSS JOIN tt
       |LEFT JOIN c ON c.day = dd.day AND c.event_type = tt.event_type
       |ORDER BY dd.day, tt.event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pivot_daily" -> (pivotDaily _),
    "q_unpivot_daily" -> (unpivotDaily _),
    "q_skew_diagnostics" -> ((s, d) => skewDiagnostics(s, d)),
    "q_zorder_layout" -> (zorderLayout _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "q_agg_salted" -> (aggSalted _),
    "q_window_frames" -> (windowFrames _),
    "q_window_range" -> (windowRange _),
    "q_events_anomaly" -> (eventsAnomaly _),
    "q_join_range" -> (joinRange _),
    "q_json_extract" -> (jsonExtract _),
    "q_events_funnel" -> (eventsFunnel _),
    "q_events_retention" -> (eventsRetention _),
    "q_hll_distinct" -> (hllDistinct _),
    "q_events_windowed_agg" -> (eventsWindowedAgg _),
    "q_events_sessionize" -> (eventsSessionize _),
    "q_event_transitions" -> (eventTransitions _),
    "q_decay_score" -> (decayScore _),
    "q_events_session_window" -> (eventsSessionWindow _),
    "q_events_user_stats" -> (eventsUserStats _),
    "q_join_asof" -> (joinAsof _),
    "q_join_attribution" -> (joinAttribution _),
    "q_agg_rollup" -> (aggRollup _),
    "q_agg_cube" -> (aggCube _),
    "q_set_ops" -> (setOps _),
    "q_merge_upsert" -> (mergeUpsert _),
    "q3_shipping" -> (q3Shipping _),
    "q10_returned_item" -> (q10ReturnedItem _),
    "q14_promo_effect" -> (q14PromoEffect _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q4_priority_exists" -> (q4PriorityExists _),
    "q13_custdist" -> (q13CustDist _),
    "q16_supplier_cnt" -> (q16SupplierCnt _),
    "q17_small_qty_revenue" -> (q17SmallQtyRevenue _),
    "q22_no_urgent" -> (q22NoUrgent _))

  val oracles: Map[String, String] = Map(
    "q_pivot_daily" -> pivotDailySql,
    "q_unpivot_daily" -> unpivotDailySql,
    "q_skew_diagnostics" -> skewDiagnosticsSql,
    "q_zorder_layout" -> zorderLayoutSql,
    "q5_local_supplier" -> q5LocalSupplierSql,
    "q_agg_salted" -> aggSaltedSql,
    "q_window_frames" -> windowFramesSql,
    "q_window_range" -> windowRangeSql,
    "q_events_anomaly" -> eventsAnomalySql,
    "q_join_range" -> joinRangeSql,
    "q_json_extract" -> jsonExtractSql,
    "q_events_funnel" -> eventsFunnelSql,
    "q_events_retention" -> eventsRetentionSql,
    "q_hll_distinct" -> hllDistinctSql,
    "q_events_windowed_agg" -> eventsWindowedAggSql,
    "q_events_sessionize" -> eventsSessionizeSql,
    "q_event_transitions" -> eventTransitionsSql,
    "q_decay_score" -> decayScoreSql,
    "q_events_session_window" -> eventsSessionWindowSql,
    "q_events_user_stats" -> eventsUserStatsSql,
    "q_join_asof" -> joinAsofSql,
    "q_join_attribution" -> joinAttributionSql,
    "q_agg_rollup" -> aggRollupSql,
    "q_agg_cube" -> aggCubeSql,
    "q_set_ops" -> setOpsSql,
    "q_merge_upsert" -> mergeUpsertSql,
    "q3_shipping" -> q3ShippingSql,
    "q10_returned_item" -> q10ReturnedItemSql,
    "q14_promo_effect" -> q14PromoEffectSql,
    "q18_large_orders" -> q18LargeOrdersSql,
    "q4_priority_exists" -> q4PriorityExistsSql,
    "q13_custdist" -> q13CustDistSql,
    "q16_supplier_cnt" -> q16SupplierCntSql,
    "q17_small_qty_revenue" -> q17SmallQtyRevenueSql,
    "q22_no_urgent" -> q22NoUrgentSql)
}
