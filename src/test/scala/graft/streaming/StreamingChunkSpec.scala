package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.TrainingPrep
import graft.sources.Tables

/** Context-window chunking as a STREAM: [[TrainingPrep.chunkFrames]] is
  * a stateless explode/slice projection, so the same code must chunk a
  * documents file stream at ingestion time and emit exactly the batch
  * chunks — the "shard the corpus as it lands" deployment of the
  * training-prep layer.
  */
class StreamingChunkSpec extends AnyFunSuite with SparkTestBase {

  private val SfDir = "/root/testdata/sf0.001"

  test("streaming chunking (AvailableNow, append) equals batch") {
    val dir = Files.createTempDirectory("graft-chunkstream")
    Files.copy(Paths.get(s"$SfDir/documents.parquet"),
      dir.resolve("documents-000.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val ckpt = Files.createTempDirectory("graft-chunkstream-ckpt").toString

    val schema = Tables.documents(spark, SfDir).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    TrainingPrep.chunkFrames(stream)
      .writeStream
      .format("memory").queryName("chunk_sink")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()

    val streamed = spark.table("chunk_sink")
      .orderBy("doc_id", "chunk_idx").collect()
    val batch = TrainingPrep.chunkSliding(spark, SfDir).collect()
    assert(streamed.length === batch.length)
    assert(streamed.map(_.toString) === batch.map(_.toString))
    assert(streamed.nonEmpty)
  }
}
