package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.Tables

/** Streaming semantics pinned to batch: running the shared transforms
  * over a file stream with Trigger.AvailableNow must produce exactly
  * the batch results on the same data (complete/update modes surface
  * all state; watermarking only matters for continuous late data).
  */
class EventStreamSpec extends AnyFunSuite with SparkTestBase {

  private val SfDir = "/root/testdata/sf0.001"

  private def stageStreamDir(): String = {
    val dir = Files.createTempDirectory("graft-stream")
    Files.copy(Paths.get(s"$SfDir/events.parquet"),
      dir.resolve("events-000.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("streaming windowed agg (AvailableNow, complete) equals batch") {
    val dir = stageStreamDir()
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val stream = EventStream.readEventStream(spark, dir)
    EventStream.runAvailableNow(EventStream.windowedAgg(stream),
      "win_sink", ckpt, OutputMode.Complete())
    val streamed = spark.table("win_sink")
      .orderBy("hour_s", "event_type").collect()

    val batch = EventStream.windowedAgg(
        Tables.events(spark, SfDir).select("ts", "event_type", "value"))
      .orderBy("hour_s", "event_type").collect()

    assert(streamed.length === batch.length)
    assert(streamed.map(_.toString) === batch.map(_.toString))
    assert(streamed.nonEmpty)
  }

  test("stateful user activity (mapGroupsWithState) equals batch totals") {
    val dir = stageStreamDir()
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val stream = EventStream.readEventStream(spark, dir)
    EventStream.runAvailableNow(EventStream.userActivity(stream).toDF(),
      "user_sink", ckpt, OutputMode.Update())
    // update mode may emit a user several times across micro-batches;
    // the LAST emission per user is the final state
    import org.apache.spark.sql.functions._
    val streamed = spark.table("user_sink")
      .groupBy("user_id")
      .agg(max_by(struct(col("n_events"), col("total_cents")), col("n_events"))
        .as("last"))
      .select(col("user_id"), col("last.n_events"), col("last.total_cents"))
      .orderBy("user_id").collect()

    val batch = Tables.events(spark, SfDir)
      .select(col("user_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("cents").as("total_cents"))
      .orderBy("user_id").collect()

    assert(streamed.map(_.toString) === batch.map(_.toString))
    assert(streamed.nonEmpty)
  }

  test("transformWithState user totals equal batch (RocksDB state store)") {
    val dir = stageStreamDir()
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    // the v2 stateful API requires the RocksDB provider
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = EventStream.readEventStream(spark, dir)
      EventStream.runAvailableNow(EventStream.userActivityTws(stream).toDF(),
        "tws_sink", ckpt, OutputMode.Update())
      import org.apache.spark.sql.functions._
      val streamed = spark.table("tws_sink")
        .groupBy("user_id")
        .agg(max_by(struct(col("n_events"), col("total_cents")), col("n_events"))
          .as("last"))
        .select(col("user_id"), col("last.n_events"), col("last.total_cents"))
        .orderBy("user_id").collect()
      val batch = Tables.events(spark, SfDir)
        .select(col("user_id"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum("cents").as("total_cents"))
        .orderBy("user_id").collect()
      assert(streamed.map(_.toString) === batch.map(_.toString))
      assert(streamed.nonEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("replay dedup: duplicated input files collapse to distinct events") {
    val dir = Files.createTempDirectory("graft-stream")
    // the same events parquet dropped TWICE under different names — the
    // file source reads both, simulating an at-least-once upstream
    Files.copy(Paths.get(s"$SfDir/events.parquet"),
      dir.resolve("events-000.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get(s"$SfDir/events.parquet"),
      dir.resolve("events-001.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val stream = EventStream.readEventStream(spark, dir.toString)
    EventStream.runAvailableNow(EventStream.dedupReplays(stream),
      "dedup_sink", ckpt, OutputMode.Append())
    val total = Tables.events(spark, SfDir).count()
    val streamed = spark.table("dedup_sink")
    assert(streamed.select("event_id").distinct().count() === total)
    assert(streamed.count() === total) // each replayed event kept exactly once
  }

  test("native session windows (AvailableNow, complete) equal batch") {
    val dir = stageStreamDir()
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val stream = EventStream.readEventStream(spark, dir)
      .select("user_id", "ts", "event_id")
    EventStream.runAvailableNow(EventStream.sessionWindows(stream),
      "sess_sink", ckpt, OutputMode.Complete())
    val streamed = spark.table("sess_sink")
      .orderBy("user_id", "session_start_us").collect()

    val batch = EventStream.sessionWindows(
        Tables.events(spark, SfDir).select("user_id", "ts", "event_id"))
      .orderBy("user_id", "session_start_us").collect()

    assert(streamed.nonEmpty)
    assert(streamed.map(_.toString) === batch.map(_.toString))
  }
}
