package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Curation
import graft.sources.Tables

/** Learned-filter scoring at ingest: the classifier weight vector
  * travels as one broadcast map row ([[Curation.qcWeightsRow]]) and is
  * APPLIED by the stateless [[Curation.qualityScoreFrames]] — a per-row
  * token fold, no explode, no state store. The stream verdicts must
  * equal both the batch application AND the oracle-checked explode+join
  * form (`q_quality_classifier`), pinning that all three faces compute
  * the identical score and keep verdict.
  */
class StreamingQualitySpec extends AnyFunSuite with SparkTestBase {

  private val SfDir = "/root/testdata/sf0.001"

  test("streamed classifier scores equal the batch fold and the exchange form") {
    val weights = Curation.qcWeightsRow(spark)

    // face 1: the oracle-checked explode+join query
    val exchange = Curation.qualityClassifier(spark, SfDir).collect()
    // face 2: the stateless fold applied in batch
    val fold = Curation
      .qualityScoreFrames(Tables.documents(spark, SfDir), weights)
      .orderBy("doc_id").collect()
    assert(fold.map(_.toString) === exchange.map(_.toString),
      "batch fold diverges from the exchange form")

    // face 3: the same fold over a file stream
    val dir = Files.createTempDirectory("graft-qcstream")
    Files.copy(Paths.get(s"$SfDir/documents.parquet"),
      dir.resolve("documents-000.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val ckpt = Files.createTempDirectory("graft-qcstream-ckpt").toString
    val schema = Tables.documents(spark, SfDir).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    Curation.qualityScoreFrames(stream, weights)
      .writeStream
      .format("memory").queryName("qc_sink")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    val streamed = spark.table("qc_sink").orderBy("doc_id").collect()
    assert(streamed.map(_.toString) === exchange.map(_.toString),
      "streamed scores diverge from the batch query")
    assert(streamed.nonEmpty)
  }
}
