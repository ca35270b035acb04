package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Dedup
import graft.sources.Tables

/** Near-dup admission at ingest as a STREAM against a STATIC registry
  * index: the registry's canonical LSH bands / shingle sets / content
  * hashes are built once in batch ([[Dedup.registryIndex]]) and every
  * micro-batch of new documents probes them through the stateless
  * [[Dedup.incrementalLshProbe]] inside `foreachBatch` — the production
  * ingestion shape (the registry IS the state; no state store). The
  * streamed verdicts must equal the oracle-checked batch query
  * `q_dedup_incremental_lsh` row for row.
  */
class StreamingIncrementalLshSpec extends AnyFunSuite with SparkTestBase {

  private val SfDir = "/root/testdata/sf0.001"

  test("foreachBatch probe over a doc stream equals the batch query") {
    val srcDir = Files.createTempDirectory("graft-lshstream").toString
    // the stream carries ONLY the new (odd) documents, in two files so
    // AvailableNow genuinely runs multiple micro-batches
    val odd = Tables.documents(spark, SfDir).where(col("doc_id") % 2 === 1)
    odd.where(col("doc_id") < 25).write.parquet(s"$srcDir/part-a")
    odd.where(col("doc_id") >= 25).write.parquet(s"$srcDir/part-b")
    val ckpt = Files.createTempDirectory("graft-lshstream-ckpt").toString

    val (regBands, regSets, regHashes) = Dedup.registryIndex(spark, SfDir)
    val collected = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val schema = Tables.documents(spark, SfDir).schema
    spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Dedup.incrementalLshProbe(batch, regBands, regSets, regHashes)
          .collect().foreach(r => collected.add(r.toString))
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()

    val streamed = collected.toArray(Array.empty[String]).sorted
    val batch = Dedup.dedupIncrementalLsh(spark, SfDir)
      .collect().map(_.toString).sorted
    assert(streamed.length === batch.length)
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    spark.catalog.clearCache()
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
