package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Curation
import graft.sources.Tables

/** `observe` metrics ride the write — no second scan. The spec runs the
  * corpus-emission write ONCE with attached metrics and checks the
  * observed row against an independent aggregation of the same frame.
  */
class MetricsSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("observed write reports the same tallies as a separate aggregation") {
    val emitted = Curation.corpusEmit(spark, sf)
    val (observedDf, obs) = Metrics.observed(emitted, "emit_metrics",
      count(lit(1)).as("rows"),
      sum("n_chars").as("sum_chars"),
      count_if(col("lang").isNull).as("null_langs"))

    val out = Files.createTempDirectory("graft-observe").toString
    observedDf.write.mode("overwrite").parquet(out)

    val m = obs.get
    val check = emitted.agg(count(lit(1)), sum("n_chars")).head()
    assert(m("rows") === check.getLong(0))
    assert(m("sum_chars") === check.getLong(1))
    assert(m("null_langs") === 0L)
    // and the metrics describe what actually landed on disk
    assert(spark.read.parquet(out).count() === check.getLong(0))
  }
}
