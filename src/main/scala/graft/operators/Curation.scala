package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Corpus-curation operators over `documents`: reproducible sampling,
  * train/val/test split assignment, and benchmark decontamination — the
  * selection layer of a training-data pipeline.
  *
  * Sampling/splits use HASH-BUCKET membership (`first 32 bits of
  * sha256(doc_id) mod 100`), not random samplers: the assignment is a
  * pure function of the key, so it is reproducible across runs, engines,
  * partitionings, and retries — which is exactly why production
  * pipelines split this way (Spark's Bernoulli sampler is seed- AND
  * partitioning-dependent, and can't be reproduced by another engine).
  * Everything here is a map-side projection or a broadcast membership
  * probe; nothing shuffles the corpus.
  */
object Curation {

  /** Deterministic bucket in [0, 100): first 32 sha-hex bits of the id,
    * mod 100 — identical arithmetic in both engines.
    */
  private val bucketSpark: Column =
    expr("cast(conv(substring(sha2(cast(doc_id as string), 256), 1, 8), 16, 10) as bigint) % 100")

  private val bucketDuck: String =
    "('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100"

  /** Reproducible 10% sample: hash-bucket membership, with the sampled
    * rows listed (the operator a pipeline chains a human-eval or a
    * quality-audit job onto).
    */
  def sampleHash(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .withColumn("bucket", bucketSpark)
      .where(col("bucket") < 10)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")

  val sampleHashSql: String =
    s"""SELECT doc_id, lang, source, n_chars FROM documents
       |WHERE $bucketDuck < 10
       |ORDER BY doc_id""".stripMargin

  /** Train/val/test assignment (90/5/5) from the same hash bucket, with
    * per-(lang, split) counts — the split must be a key-pure function so
    * a document can never migrate between splits across runs (train/test
    * leakage). Counts keep the oracle small; the per-doc labels are the
    * same expression.
    */
  def splitAssign(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .withColumn("bucket", bucketSpark)
      .withColumn("split",
        when(col("bucket") < 90, lit("train"))
          .when(col("bucket") < 95, lit("val"))
          .otherwise(lit("test")))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("lang", "split")

  val splitAssignSql: String =
    s"""WITH b AS (SELECT lang, n_chars, $bucketDuck AS bucket FROM documents)
       |SELECT lang,
       |  CASE WHEN bucket < 90 THEN 'train'
       |       WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
       |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM b GROUP BY 1, 2 ORDER BY lang, split""".stripMargin

  /** Benchmark decontamination: documents sharing any 3-gram shingle
    * with the "benchmark" set (here: doc_id < 5, standing in for an eval
    * suite) are flagged. The benchmark shingle set is aggregated to ONE
    * broadcast row — the corpus streams past it with an arrays_overlap
    * probe, no shuffle and no pair join (the same broadcast-membership
    * shape as the IVF centroid argmax). At production scale the
    * benchmark side stays small by construction (eval suites are a few
    * thousand documents) and the probe cost is one set-intersection per
    * corpus row.
    */
  def decontaminate(spark: SparkSession, d: String): DataFrame = {
    val sets = Tables.documents(spark, d)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.shingle_set(col("text")).as("sset"))
      .where(col("sset").isNotNull)
    val benchArr = sets.where(col("doc_id") < 5)
      .agg(array_distinct(flatten(collect_list(col("sset")))).as("bench"))
    sets.where(col("doc_id") >= 5)
      .crossJoin(broadcast(benchArr))
      .select(col("doc_id"),
        size(array_intersect(col("sset"), col("bench"))).cast(LongType)
          .as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") > 0)
      .orderBy("doc_id")
  }

  val decontaminateSql: String = {
    import TextAnalysis.{tokensDuck, shinglesDuck}
    s"""WITH t AS (SELECT doc_id, $tokensDuck AS toks FROM documents),
       |sh AS (SELECT doc_id, list_distinct($shinglesDuck) AS sset
       |       FROM t WHERE len($shinglesDuck) > 0),
       |bench AS (SELECT coalesce(list_distinct(flatten(list(sset))), []) AS b
       |          FROM sh WHERE doc_id < 5)
       |SELECT doc_id,
       |  CAST(len(list_intersect(sset, b)) AS BIGINT) AS n_overlap,
       |  len(list_intersect(sset, b)) > 0 AS contaminated
       |FROM sh, bench WHERE doc_id >= 5
       |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sample_hash" -> (sampleHash _),
    "q_split_assign" -> (splitAssign _),
    "q_decontaminate" -> (decontaminate _))

  val oracles: Map[String, String] = Map(
    "q_sample_hash" -> sampleHashSql,
    "q_split_assign" -> splitAssignSql,
    "q_decontaminate" -> decontaminateSql)
}
