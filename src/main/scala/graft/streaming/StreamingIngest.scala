package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.Dedup

/** STREAMING twin of [[graft.extract.IngestionPipeline]]: document
  * drops arrive as a parquet file stream; each micro-batch probes the
  * CURRENT admitted store ([[Dedup.registryIndexOver]] +
  * [[Dedup.incrementalLshProbe]] — the same stateless per-batch half
  * the batch pipeline runs), appends the admitted rows, and the
  * registry therefore GROWS BETWEEN MICRO-BATCHES: a near-dup arriving
  * two files after its original is rejected by store content the stream
  * itself admitted. The Structured Streaming checkpoint replaces the
  * batch pipeline's watermark file (source offsets tracked per file).
  *
  * Replay safety without any extra state: micro-batches are
  * at-least-once, but a REPLAYED admitted doc is by then an exact
  * content hit against the store (itself), so the probe drops it — the
  * store converges instead of duplicating. The store append is
  * localCheckpoint-severed from the registry scan of the same path.
  *
  * Scale shape: per batch, one linear probe of the batch against
  * canonical registry signatures (band equi-join, never all-pairs) and
  * an append of only the admitted rows. The registry index is rebuilt
  * per batch from the store — the incremental form (signatures stored
  * at admission, probe triple from stored rows with zero re-hashing)
  * is what the batch pipeline runs: [[Dedup.registryIndexRows]] /
  * [[Dedup.registryIndexFromRows]] in
  * [[graft.extract.IngestionPipeline]].
  */
object StreamingIngest {

  /** Drain all currently-available document files into the store,
    * `filesPerBatch` files per micro-batch (1 = maximal registry
    * growth between batches; the admission semantics only get STRICTER
    * with smaller batches, since later docs see more registry).
    */
  def run(
      spark: SparkSession,
      sourceDir: String,
      sourceSchema: StructType,
      storeDir: String,
      checkpoint: String,
      filesPerBatch: Int = 1): Unit = {
    val raw = spark.readStream.schema(sourceSchema)
      .option("maxFilesPerTrigger", filesPerBatch)
      .parquet(sourceDir)
    val q = raw.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        admitBatch(batch, storeDir)
      }
      .start()
    q.awaitTermination()
  }

  private[streaming] def admitBatch(batch: DataFrame, storeDir: String): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    if (batch.isEmpty) return
    val reg =
      if (graft.sinks.Fs.exists(storeDir, conf))
        spark.read.parquet(storeDir).select(batch.columns.map(col): _*)
      else batch.where(lit(false))
    val (regBands, regSets, regHashes) = Dedup.registryIndexOver(reg)
    val verdicts = Dedup.incrementalLshProbe(
      batch.select(col("doc_id"), col("text")), regBands, regSets, regHashes)
    val admitted = batch
      .join(verdicts.where(!col("is_dup")).select("doc_id"), Seq("doc_id"),
        "left_semi")
      // sever the store scan feeding the registry before appending to
      // the same path (Spark refuses a write into its own read lineage)
      .localCheckpoint(true)
    if (!admitted.isEmpty)
      admitted.write.mode("append").parquet(storeDir)
  }
}
