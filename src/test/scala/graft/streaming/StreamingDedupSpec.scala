package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Dedup
import graft.sources.Tables

/** Streaming exact dedup at ingest ([[Dedup.streamExactDedup]]):
  * `dropDuplicatesWithinWatermark` keyed on the content hash, state
  * bounded by the watermark horizon. The stream sees the corpus TWICE
  * (file 000, then a doc_id-shifted re-crawl as file 001, one file per
  * micro-batch so arrival order is deterministic); the admitted set
  * must equal the batch face's min-doc_id-per-hash canonicals — i.e.
  * every re-crawled copy is dropped, every first arrival kept.
  */
class StreamingDedupSpec extends AnyFunSuite with SparkTestBase {

  private val SfDir = "/root/testdata/sf0.001"

  test("streamed ingest dedup equals batch first-arrival canonicals") {
    val dir = Files.createTempDirectory("graft-dedupstream")
    Files.copy(Paths.get(s"$SfDir/documents.parquet"),
      dir.resolve("documents-000.parquet"), StandardCopyOption.REPLACE_EXISTING)
    // the re-crawl: identical text under fresh doc_ids, arriving second
    Tables.documents(spark, SfDir)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("recrawl").toString)
    val recrawl = Files.list(dir.resolve("recrawl")).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    Files.copy(Paths.get(recrawl), dir.resolve("documents-001.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val ckpt = Files.createTempDirectory("graft-dedupstream-ckpt").toString
    val schema = Tables.documents(spark, SfDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // 000 then 001 — deterministic order
      .parquet(s"${dir.toString}/documents-*.parquet")
    Dedup.streamExactDedup(stream)
      .writeStream
      .format("memory").queryName("dedup_sink")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()

    val streamed = spark.table("dedup_sink")
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    // batch face on the SAME doubled corpus: min doc_id per content hash
    val both = Tables.documents(spark, SfDir).unionByName(
      Tables.documents(spark, SfDir).withColumn("doc_id", col("doc_id") + 1000000L))
    val batch = Dedup.ingestHashFrames(both)
      .groupBy("content_hash").agg(min("doc_id").as("doc_id"))
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    assert(streamed.length === batch.length)
    assert(streamed === batch)
    // every admitted id is a first arrival (file 000), none re-crawled
    assert(streamed.forall(_ < 1000000L))
    assert(streamed.nonEmpty)
  }
}
