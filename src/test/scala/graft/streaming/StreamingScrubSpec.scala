package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Curation
import graft.sources.Tables

/** PII scrubbing as a STREAM: [[Curation.scrubFrames]] is a stateless
  * regex projection, so the same code must scrub a documents file
  * stream at ingestion time and emit exactly the batch verdicts — PII
  * removal is precisely the transform a pipeline wants done before
  * raw text is ever persisted downstream.
  */
class StreamingScrubSpec extends AnyFunSuite with SparkTestBase {

  private val SfDir = "/root/testdata/sf0.001"

  test("streaming scrub (AvailableNow, append) equals batch") {
    val dir = Files.createTempDirectory("graft-scrubstream")
    Files.copy(Paths.get(s"$SfDir/documents.parquet"),
      dir.resolve("documents-000.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val ckpt = Files.createTempDirectory("graft-scrubstream-ckpt").toString

    val schema = Tables.documents(spark, SfDir).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    Curation.scrubFrames(stream)
      .writeStream
      .format("memory").queryName("scrub_sink")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()

    val streamed = spark.table("scrub_sink").orderBy("doc_id").collect()
    val batch = Curation.piiScrub(spark, SfDir).collect()
    assert(streamed.length === batch.length)
    assert(streamed.map(_.toString) === batch.map(_.toString))
    assert(streamed.nonEmpty)
  }
}
