package graft.extract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.plans.{Partition, Partitioner, Watermark}
import graft.sources.Tables

/** INCREMENTAL INGESTION-WITH-ADMISSION capstone: the reference's
  * extract lifecycle — tiered partition planning, worklist = new plan
  * minus committed plan, per-directory overwrite writes, watermark
  * committed LAST (cli.py:290-339 and the crash regression
  * tests/test_get_column_info.py:164-225) — composed with the near-dup
  * admission registry ([[Dedup.registryIndexOver]] +
  * [[Dedup.incrementalLshProbe]]). Each run:
  *
  *   1. plans doc-id partitions over `[0, latest)` and diffs against
  *      the COMMITTED watermark's plan — the registry it probes is
  *      exactly the committed store (a crashed run's orphan partition
  *      directories are never read, because the watermark that would
  *      make them visible was never written);
  *   2. probes the docs NEW since committed coverage against the
  *      registry index — one batch, stateless
  *      ([[Dedup.incrementalLshProbe]]'s contract: in-batch near-dups
  *      are the batch family's job; the registry is the state, merged
  *      between runs by this pipeline);
  *   3. writes each worklist partition's ADMITTED rows (overwrite).
  *      Consolidated tiles straddling the old coverage boundary MERGE
  *      previously-admitted rows from the committed store with this
  *      run's newly admitted rows — re-probing already-admitted docs
  *      would self-hit in the registry and silently drop them;
  *   4. commits the watermark — the single commit point. A crash
  *      anywhere before it makes the next run redo this batch
  *      identically (deterministic content + overwrite = idempotent).
  *
  * Scale shape: one linear probe of the NEW docs per run (band
  * equi-join against canonical registry signatures — never all-pairs,
  * never registry-sized rewrites beyond the straddling tiles), and the
  * registry store is read watermark-bounded, partition-pruned by plan
  * directories. The per-doc verdict frame is returned (persisted) so
  * callers can audit admission without re-probing.
  */
object IngestionPipeline {

  val Subgraph = "corpus"
  val Table = "admitted"
  val DefaultTierSizes: Seq[Long] = Seq(64L, 16L)

  final case class IngestResult(
      work: Vector[Partition],
      nSeen: Long,
      nAdmitted: Long,
      verdicts: DataFrame,
      watermark: Watermark)

  /** Coverage end of a plan: the first doc id NOT covered. */
  private def coverage(plan: Seq[Partition]): Long =
    plan.map(_.end).maxOption.getOrElse(0L)

  def ingest(
      spark: SparkSession,
      srcDir: String,
      storeRoot: String,
      latestDocId: Long,
      tierSizes: Seq[Long] = DefaultTierSizes,
      nowMillis: Long = System.currentTimeMillis(),
      numHashes: Int = Dedup.DefaultNumHashes,
      numBands: Int = Dedup.DefaultNumBands,
      thresholdE4: Long = Dedup.IncrementalLshThresholdE4): IngestResult = {
    val conf = spark.sparkContext.hadoopConfiguration
    val prev = Watermark.read(storeRoot, conf)
    val newPlan = Partitioner.plan(0L, latestDocId, tierSizes)
    val oldPlan = prev match {
      case Some(w) => Partitioner.plan(0L, w.latestBlock, tierSizes)
      case None    => Vector.empty
    }
    val work = Partitioner.worklist(newPlan, oldPlan)
    val prevCov = coverage(oldPlan)
    val newCov = coverage(newPlan)
    val tDir = Partitioner.tableDir(storeRoot, Subgraph, Table)

    val docs = Tables.documents(spark, srcDir)
    // committed registry: the watermark-bounded plan's directories only
    val regDocs =
      if (oldPlan.isEmpty) docs.where(lit(false))
      else spark.read.parquet(
        oldPlan.map(p => Partitioner.partitionDir(tDir, p)): _*)
        .select(docs.columns.map(col): _*)
    val newDocs = docs
      .where(col("doc_id") >= prevCov && col("doc_id") < newCov)
      .persist()
    val nSeen = newDocs.count()

    val (regBands, regSets, regHashes) =
      Dedup.registryIndexOver(regDocs, numHashes, numBands)
    // verdicts persist + force BEFORE any store write: the probe's plan
    // reads the committed directories this run may not touch, and the
    // verdict must be fixed before admitted rows land anywhere
    val verdicts = Dedup.incrementalLshProbe(
      newDocs.select(col("doc_id"), col("text")),
      regBands, regSets, regHashes, numHashes, numBands, thresholdE4)
      .persist()
    verdicts.count()

    val admittedNew = newDocs
      .join(verdicts.where(!col("is_dup")).select("doc_id"), Seq("doc_id"),
        "left_semi")
    // merge: committed rows below the old coverage + this run's
    // admitted rows above it; each worklist directory takes its slice
    val allAdmitted = regDocs.unionByName(admittedNew).persist()
    allAdmitted.count()
    work.foreach { p =>
      allAdmitted
        .where(col("doc_id") >= p.start && col("doc_id") < p.end)
        .repartition(1)
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(Partitioner.partitionDir(tDir, p))
    }
    val nAdmitted = admittedNew.count()
    // K2 composed in: plan-scoped `_metadata` over the NEW plan's
    // directories (superseded tiles excluded), before the commit point
    // so a crash re-summarizes with the re-run
    if (work.nonEmpty) MetadataSink.writeMetadata(tDir, newPlan, conf)

    // THE commit point — everything above is redoable, nothing below
    val wm = Watermark(Subgraph, Table, nowMillis, 0L, latestDocId)
    Watermark.commit(storeRoot, wm, conf)
    newDocs.unpersist()
    allAdmitted.unpersist()
    IngestResult(work, nSeen, nAdmitted, verdicts, wm)
  }

  /** The committed admitted store: rows of every partition directory in
    * the CURRENT watermark's plan (none → empty frame with the
    * documents schema).
    */
  def committedStore(spark: SparkSession, srcDir: String, storeRoot: String,
      tierSizes: Seq[Long] = DefaultTierSizes): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val docs = Tables.documents(spark, srcDir)
    Watermark.read(storeRoot, conf) match {
      case None => docs.where(lit(false))
      case Some(w) =>
        val plan = Partitioner.plan(0L, w.latestBlock, tierSizes)
        if (plan.isEmpty) docs.where(lit(false))
        else {
          val tDir = Partitioner.tableDir(storeRoot, Subgraph, Table)
          spark.read.parquet(plan.map(p => Partitioner.partitionDir(tDir, p)): _*)
            .select(docs.columns.map(col): _*)
        }
    }
  }
}
