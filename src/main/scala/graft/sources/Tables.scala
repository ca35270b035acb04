package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * One quirk is handled here so every operator sees a sane schema:
  * `events.ts` is written as parquet TIMESTAMP(NANOS) which Spark's
  * vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]). Sessions
  * set `spark.sql.legacy.parquet.nanosAsLong=true`, so the column arrives
  * as a Long of epoch-nanos; [[events]] derives a proper microsecond
  * `ts` (TimestampType, UTC session) plus the raw nanos as `ts_ns`.
  */
object Tables {

  val All: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"${sfDir.stripSuffix("/")}/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = table(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")

  /** `events` with `ts` normalized to TimestampType (microseconds, UTC
    * session — matching DuckDB's `epoch_us`) and the raw nanos kept as
    * `ts_ns`, whatever encoding the parquet writer chose:
    *
    *   - TIMESTAMP(NANOS): Spark's vectorized reader rejects it outright
    *     ([PARQUET_TYPE_ILLEGAL]); sessions set
    *     `spark.sql.legacy.parquet.nanosAsLong=true` so it arrives as a
    *     Long of epoch-nanos (the LongType arm).
    *   - TIMESTAMP(MICROS/MILLIS, isAdjustedToUTC=false): arrives as
    *     TIMESTAMP_NTZ (the pandas/pyarrow/DuckDB default). With the UTC
    *     session timezone the NTZ→TZ cast is instant-exact.
    *   - TIMESTAMP(…, isAdjustedToUTC=true): arrives as TimestampType
    *     already.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    val raw = table(spark, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // `div`, not `/`: Long./ is double division, and epoch-nanos
        // (~1.7e18) are far beyond double's 2^53 exact-integer range.
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
      case _ => raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
    }
  }

  /** Money/measure doubles in the testdata are 2-decimal values; casting
    * to DECIMAL(18,2) makes downstream sums exact and therefore
    * order-independent — a double sum would vary with partial-aggregation
    * order and could never hash-match a single-threaded oracle.
    */
  def dec2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast(DecimalType(18, 2))
}
