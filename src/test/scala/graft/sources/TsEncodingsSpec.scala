package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Round-8 lesson: the driver regenerated events.parquet with
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) — TIMESTAMP_NTZ to Spark —
  * and the untested fallback arm of [[Tables.events]] broke 24 queries.
  * This spec writes its OWN tiny fixture in each `ts` encoding the
  * normalizer claims to handle, so coverage no longer depends on what
  * the driver last generated:
  *
  *   - epoch-nanos Long (what TIMESTAMP(NANOS) + `nanosAsLong` yields),
  *   - TIMESTAMP_NTZ (pandas/pyarrow/DuckDB default),
  *   - TIMESTAMP (isAdjustedToUTC=true, Spark's own default output).
  *
  * All three must normalize to the same (`ts` TimestampType micros,
  * `ts_ns` Long epoch-nanos) pair under the UTC session.
  */
class TsEncodingsSpec extends AnyFunSuite with SparkTestBase {

  // 2024-03-01T12:34:56.789012Z — micros-precision so every encoding
  // can represent it exactly (plus a sub-micro nanos case for the Long arm)
  private val BaseUs = 1709296496789012L

  private def normalized(dir: String): (DataType, Long, Long) = {
    val df = Tables.events(spark, dir)
    val row = df.select(unix_micros(col("ts")), col("ts_ns")).head()
    (df.schema("ts").dataType, row.getLong(0), row.getLong(1))
  }

  test("epoch-nanos Long arm (TIMESTAMP(NANOS) via nanosAsLong)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ts-nanos").toString
    // 345 trailing nanos: ts must truncate to micros, ts_ns keep them
    Seq((1L, BaseUs * 1000L + 345L, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val (dt, us, ns) = normalized(dir)
    assert(dt == TimestampType)
    assert(us == BaseUs)
    assert(ns == BaseUs * 1000L + 345L)
  }

  test("TIMESTAMP_NTZ arm (micros, isAdjustedToUTC=false)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ts-ntz").toString
    Seq((1L, BaseUs, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us")).cast(TimestampNTZType))
      .drop("ts_us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // regime check: the file really is NTZ on disk
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType == TimestampNTZType)
    val (dt, us, ns) = normalized(dir)
    assert(dt == TimestampType)
    assert(us == BaseUs, "UTC session: NTZ cast must be instant-exact")
    assert(ns == BaseUs * 1000L)
  }

  test("TIMESTAMP arm (isAdjustedToUTC=true, Spark default output)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ts-tz").toString
    Seq((1L, BaseUs, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType == TimestampType)
    val (dt, us, ns) = normalized(dir)
    assert(dt == TimestampType)
    assert(us == BaseUs)
    assert(ns == BaseUs * 1000L)
  }

  test("streaming normalize agrees with the batch reader on NTZ input") {
    import spark.implicits._
    val batch = Seq((1L, BaseUs, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us")).cast(TimestampNTZType))
      .drop("ts_us")
    val out = graft.streaming.EventStream.normalize(batch)
      .select(unix_micros(col("ts")), col("ts_ns")).head()
    assert(out.getLong(0) == BaseUs)
    assert(out.getLong(1) == BaseUs * 1000L)
  }
}
