package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, StreamingQuery, TimeMode, TimerValues, Trigger, TTLConfig, ValueState}
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table shape (SURVEY.md §2.10:
  * the reference's incremental loop is batch-polling with a watermark
  * file; this module is the Spark-idiomatic continuous alternative —
  * `readStream → transform → writeStream` with event-time watermarks,
  * checkpointed state, and `Trigger.AvailableNow` for catch-up runs).
  *
  * The transforms are shared with batch: the same function builds the
  * plan whether its input came from `read` or `readStream`, which is
  * how the batch oracles also validate the streaming semantics.
  */
object EventStream {

  /** Raw parquet schema of the events table as a writer using
    * TIMESTAMP(NANOS) produces it under `nanosAsLong` (ts as epoch-nanos
    * Long). readStream requires an explicit schema; [[readEventStream]]
    * prefers the schema of files already present so either timestamp
    * encoding works, and falls back to this for an empty source dir.
    */
  val RawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream of events parquet under `dir`. The streaming
    * source needs a fixed schema up front, so peek at whatever files are
    * already in the dir (a one-footer batch read — cheap) to learn which
    * `ts` encoding this corpus uses; only an empty dir assumes nanos.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema =
      try spark.read.parquet(dir).schema
      catch { case _: Exception => RawSchema }
    normalize(spark.readStream.schema(schema).parquet(dir))
  }

  /** Same timestamp recovery as the batch reader (graft.sources.Tables
    * .events): normalize any of nanos-Long / TIMESTAMP_NTZ / TIMESTAMP
    * to (`ts` TimestampType micros, `ts_ns` Long epoch-nanos).
    */
  def normalize(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case _ =>
        raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
    }

  /** Tumbling 1-hour windowed aggregation per event type, tolerating
    * 2 hours of event-time lateness. On a stream this is incremental
    * state per (window, type); in batch it degenerates to a plain
    * windowed groupBy (watermark is a no-op) — one shared plan shape.
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum((col("value").cast(DecimalType(18, 2)) * 100).cast(LongType))
          .cast(DecimalType(38, 0)).as("sum_value_cents"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_s"),
        col("event_type"), col("n_events"), col("sum_value_cents"))

  /** NATIVE session windows: Spark's `session_window` operator merges
    * events whose 30-minute windows overlap into one variable-length
    * session per user — the engine-managed alternative to both the
    * batch lag/cumsum sessionizer (operators.EventAnalytics
    * .eventsSessionize) and hand-rolled flatMapGroupsWithState state: on
    * a stream the state store holds one open window per (user, session)
    * and the event-time watermark both closes sessions and expires
    * state, so state is bounded by the lateness horizon at any corpus
    * rate.
    *
    * Boundary semantics (pinned by the oracle, verified empirically on
    * Spark 4.1.2): a gap of EXACTLY 30 minutes still MERGES — two
    * events 30:00 apart form one session ending at +1:00 — and only a
    * strictly larger gap splits, matching the lag-based batch twin's
    * `> gap` test; `session_end_us` is
    * last_event + gap, the operator's window end. Timestamps compare in
    * micros (the nanos→micros truncation happens in `normalize`/Tables
    * before the window).
    */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        min("event_id").as("first_event_id"),
        max("event_id").as("last_event_id"))
      .select(
        col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        unix_micros(col("sw.end")).as("session_end_us"),
        col("n_events"), col("first_event_id"), col("last_event_id"))

  final case class UserActivity(user_id: Long, n_events: Long, total_cents: Long)

  /** Stateful per-user running totals via mapGroupsWithState — the
    * custom-state primitive a real pipeline uses for sessionization /
    * online features. State is one (count, cents) pair per user, stored
    * in the checkpointed state store.
    */
  def userActivity(events: DataFrame): Dataset[UserActivity] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), UserActivity](GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[(Long, Long)]) =>
          val (n0, c0) = state.getOption.getOrElse((0L, 0L))
          var n = n0; var c = c0
          rows.foreach { case (_, cents) => n += 1; c += cents }
          state.update((n, c))
          UserActivity(user, n, c)
      }
  }

  /** [[userActivity]]'s twin on the `transformWithState` API (the
    * arbitrary-stateful-processing v2 of Spark 4): state lives in NAMED,
    * individually-evolvable handles (here one ValueState) inside a
    * [[StatefulProcessor]], runs on the RocksDB state store (required by
    * the API — state spills to disk instead of capping at executor
    * heap), and supports per-state TTL — the production replacement for
    * mapGroupsWithState once state outgrows memory. Kept semantically
    * identical to the v1 twin so one spec pins both to the same batch
    * totals.
    */
  class UserTotalsProcessor
      extends StatefulProcessor[Long, (Long, Long), UserActivity] {
    @transient private var totals: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)](
        "totals", org.apache.spark.sql.Encoders.product[(Long, Long)],
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[UserActivity] = {
      val (n0, c0) = if (totals.exists()) totals.get() else (0L, 0L)
      var n = n0; var c = c0
      rows.foreach { case (_, cents) => n += 1; c += cents }
      totals.update((n, c))
      Iterator.single(UserActivity(key, n, c))
    }
  }

  /** Per-user running totals via [[UserTotalsProcessor]]. Requires
    * `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider on the session running the stream.
    */
  def userActivityTws(events: DataFrame): Dataset[UserActivity] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new UserTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Streaming replay-dedup: an at-least-once upstream (file re-drops,
    * producer retries) delivers the same event more than once; this
    * keeps the first arrival per `event_id` and drops replays. State is
    * kept only within the event-time watermark, so the state store is
    * bounded by the lateness window — NOT the whole stream history,
    * which is what plain dropDuplicates would require and what makes it
    * a non-starter at 100 TB. The batch dedup family (operators.Dedup)
    * handles content-level duplicates; this handles delivery-level ones.
    */
  def dedupReplays(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** STREAM-STREAM interval join: each purchase matched to the same
    * user's clicks in the preceding 30 minutes — the two-sided stateful
    * join (attribution, funnel stitching) that only works bounded when
    * BOTH sides carry a watermark and the join condition carries a time
    * band: Spark then knows a click older than (purchase watermark −
    * 30 min) can never match again and evicts it, so state is
    * O(rate × window), not O(stream). In batch the same expression
    * degenerates to a plain range join (watermarks are no-ops) — one
    * shared plan, pinned stream==batch by StreamingJoinSpec.
    *
    * Inputs are the same normalized events frame (batch or stream),
    * filtered per side HERE so both faces split identically.
    */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "2 hours")
    val p = purchases.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "2 hours")
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
        unix_micros(col("p_ts")).as("p_us"), unix_micros(col("c_ts")).as("c_us"))
  }

  /** Run a streaming DataFrame to an in-memory table until all
    * currently-available input is processed (catch-up semantics — the
    * streaming analog of the reference's incremental batch run).
    */
  def runAvailableNow(df: DataFrame, sinkTable: String, checkpoint: String,
      mode: OutputMode): StreamingQuery = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(sinkTable)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
