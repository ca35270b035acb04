package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Curation
import graft.sources.Tables

/** The curation verdict as a STREAM: [[Curation.verdictFlags]] is a
  * stateless map-side transform, so the same code must run unchanged
  * over a documents file stream and emit exactly the batch flags —
  * the "score documents as they land" deployment of the curation layer.
  */
class StreamingVerdictSpec extends AnyFunSuite with SparkTestBase {

  private val SfDir = "/root/testdata/sf0.001"

  test("streaming verdict flags (AvailableNow, append) equal batch") {
    val dir = Files.createTempDirectory("graft-docstream")
    Files.copy(Paths.get(s"$SfDir/documents.parquet"),
      dir.resolve("documents-000.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val ckpt = Files.createTempDirectory("graft-docstream-ckpt").toString

    val schema = Tables.documents(spark, SfDir).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    // append mode works because the transform is stateless — the same
    // projection chain the batch queries use, no agg, no watermark
    Curation.verdictFlags(stream)
      .select("doc_id", "len_ok", "tok_ok", "stop_ok", "rep_ok", "lang_ok", "keep")
      .writeStream
      .format("memory").queryName("verdict_sink")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()

    val streamed = spark.table("verdict_sink").orderBy("doc_id").collect()
    val batch = Curation.curationVerdict(spark, SfDir).collect()
    assert(streamed.length === batch.length)
    assert(streamed.map(_.toString) === batch.map(_.toString))
    assert(streamed.nonEmpty)
  }
}
