package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Curation
import graft.sources.Tables

/** Length-outlier admission control as a STREAM-STATIC join: the
  * per-source (median, MAD) bounds are FIT in batch
  * ([[Curation.sourceBounds]] — rank windows need the full corpus) and
  * APPLIED to a documents file stream by the stateless
  * [[Curation.admitFrames]] — the production ingest shape (model fit
  * offline, verdicts at ingestion, no state store, append mode). The
  * static side reaches every micro-batch as a broadcast; stream
  * verdicts must equal the batch query's exactly.
  */
class StreamingAdmitSpec extends AnyFunSuite with SparkTestBase {

  private val SfDir = "/root/testdata/sf0.001"

  test("streaming admission (AvailableNow, append) equals the batch filter") {
    val dir = Files.createTempDirectory("graft-admitstream")
    Files.copy(Paths.get(s"$SfDir/documents.parquet"),
      dir.resolve("documents-000.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val ckpt = Files.createTempDirectory("graft-admitstream-ckpt").toString

    val bounds = Curation.sourceBounds(Tables.documents(spark, SfDir))
    val schema = Tables.documents(spark, SfDir).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    Curation.admitFrames(stream, bounds)
      .writeStream
      .format("memory").queryName("admit_sink")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()

    val streamed = spark.table("admit_sink").orderBy("doc_id").collect()
    val batch = Curation.robustFilter(spark, SfDir).collect()
    assert(streamed.length === batch.length)
    assert(streamed.map(_.toString) === batch.map(_.toString))
    assert(streamed.nonEmpty)
  }
}
