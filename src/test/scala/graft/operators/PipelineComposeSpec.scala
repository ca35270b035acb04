package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.Tables

/** End-to-end composition of the training-data pipeline: curate + dedup
  * (q_corpus_emit) → context-window chunking → exact chunk-level dedup.
  * Each stage is its own oracle-checked query; this spec pins that they
  * COMPOSE — frame out of one stage is a valid input to the next, and
  * the volumes reconcile with the per-stage invariants.
  */
class PipelineComposeSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("emit -> chunk -> chunk-dedup chain reconciles") {
    val emitted = Curation.corpusEmit(spark, sf)
    val nEmitted = emitted.count()
    assert(nEmitted > 0)
    // the emitted corpus is a strict, duplicate-free subset
    val nDocs = Tables.documents(spark, sf).count()
    assert(nEmitted < nDocs)
    assert(emitted.select("doc_id").distinct().count() === nEmitted)

    // chunk the emitted corpus (frame-in reuse, not a re-read)
    val docs = Tables.documents(spark, sf)
      .join(emitted.select("doc_id"), Seq("doc_id"), "left_semi")
    val chunks = TrainingPrep.chunkFrames(docs).cache()
    val byDoc = chunks.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"), sum("n_tok").as("sum_tok"))
    // every emitted doc with tokens produced >= 1 chunk, and chunk token
    // volume >= the doc's token count (overlap only adds)
    val stats = docs.select(col("doc_id"),
        graft.functions.GraftFunctions.text_stats(col("text"), Nil)
          .getItem(0).as("n_tok"))
      .join(byDoc, Seq("doc_id"), "left")
    assert(stats.where(col("n_tok") > 0 && col("n_chunks").isNull).count() === 0)
    assert(stats.where(col("n_tok") > 0 && col("sum_tok") < col("n_tok")).count() === 0)

    // chunk-level exact dedup drops the copies the overlap manufactures
    // across near-identical docs but keeps at least one row per sig
    val nChunks = chunks.count()
    val nDistinctSigs = chunks.select("chunk_sig").distinct().count()
    assert(nDistinctSigs > 0 && nDistinctSigs <= nChunks)
    chunks.unpersist()
  }
}
