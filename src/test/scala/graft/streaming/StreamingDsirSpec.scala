package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Curation
import graft.sources.Tables

/** DSIR scoring at ingest: the bucket model is FIT in batch
  * ([[Curation.dsirModelRow]] — two corpus aggregates) and APPLIED by
  * the stateless [[Curation.dsirScoreFrames]] — a per-row fold against
  * the broadcast map, no explode, no state store. The stream verdicts
  * must equal both the batch application AND the oracle-checked
  * explode+join form (`q_dsir_weights`), pinning that all three
  * faces compute the identical weight.
  */
class StreamingDsirSpec extends AnyFunSuite with SparkTestBase {

  private val SfDir = "/root/testdata/sf0.001"

  test("streamed DSIR scores equal the batch fold and the exchange form") {
    val model = Curation.dsirModelRow(Tables.documents(spark, SfDir))

    // face 1: the oracle-checked explode+join query
    val exchange = Curation.dsirWeights(spark, SfDir).collect()
    // face 2: the stateless fold applied in batch
    val fold = Curation.dsirScoreFrames(Tables.documents(spark, SfDir), model)
      .orderBy("doc_id").collect()
    assert(fold.map(_.toString) === exchange.map(_.toString),
      "batch fold diverges from the exchange form")

    // face 3: the same fold over a file stream
    val dir = Files.createTempDirectory("graft-dsirstream")
    Files.copy(Paths.get(s"$SfDir/documents.parquet"),
      dir.resolve("documents-000.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val ckpt = Files.createTempDirectory("graft-dsirstream-ckpt").toString
    val schema = Tables.documents(spark, SfDir).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    Curation.dsirScoreFrames(stream, model)
      .writeStream
      .format("memory").queryName("dsir_sink")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    val streamed = spark.table("dsir_sink").orderBy("doc_id").collect()
    assert(streamed.map(_.toString) === exchange.map(_.toString),
      "streamed scores diverge from the batch query")
    assert(streamed.nonEmpty)
  }
}
