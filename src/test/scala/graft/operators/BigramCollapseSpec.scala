package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.Tables

/** Pins that [[TrainingPrep.bigramCoherence]]'s duplication-adaptive
  * content-collapse branch is row-identical to the direct branch: the
  * weighted LM counts (Σ copies per distinct content) equal the
  * occurrence counts, and n_bigrams/score are per-text facts, so
  * expanding per-content rows through the (doc_id, ch) membership
  * reproduces the direct per-doc rows exactly.
  */
class BigramCollapseSpec extends AnyFunSuite with SparkTestBase {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString)

  private def replicatedFixture(r: Int): String = {
    val dir = Files.createTempDirectory("bigram-collapse-fx").toString
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(40)
    val reps = (0 until r).map { k =>
      base.select((col("doc_id") + lit(k * 1000L)).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_.unionByName(_))
    reps.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("collapsed coherence is row-identical to the direct form at 5x copies") {
    val d = replicatedFixture(5)
    val direct = rows(
      TrainingPrep.bigramCoherence(spark, d, collapse = Some(false)))
    val collapsed = rows(
      TrainingPrep.bigramCoherence(spark, d, collapse = Some(true)))
    assert(direct.size == collapsed.size,
      s"row counts differ: ${direct.size} vs ${collapsed.size}")
    assert(direct == collapsed)
    spark.catalog.clearCache()
  }

  test("auto branch agrees with direct on replicated AND near-unique corpora") {
    val d = replicatedFixture(4)
    assert(rows(TrainingPrep.bigramCoherence(spark, d)) ==
      rows(TrainingPrep.bigramCoherence(spark, d, collapse = Some(false))))
    val sf = "/root/testdata/sf0.001"
    assert(rows(TrainingPrep.bigramCoherence(spark, sf)) ==
      rows(TrainingPrep.bigramCoherence(spark, sf, collapse = Some(false))))
    spark.catalog.clearCache()
  }
}
