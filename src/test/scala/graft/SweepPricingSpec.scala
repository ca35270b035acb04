package graft

import org.apache.spark.sql.functions.sum
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.Sweep

/** Pins the contract behind the sweep's expansion-bound pricing rows:
  * every excluded dump has a census twin, and the twin's `n_pairs`
  * column counts exactly the member-pair rows the dump would emit — so
  * `expected_output_rows` in a `priced` sweep row is the dump's true
  * output volume at that fixture, computed without expanding it.
  */
class SweepPricingSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("every expansion-bound dump has a census twin, and twins are registered") {
    val missing = Sweep.ExpansionBound.diff(Sweep.CensusTwin.keySet)
    assert(missing.isEmpty,
      s"expansion-bound faces without a census twin: $missing")
    val unregistered = Sweep.CensusTwin.values.toSet.diff(
      SparkEntry.queries.keySet)
    assert(unregistered.isEmpty,
      s"census twins not in the query registry: $unregistered")
  }

  test("census sum(n_pairs) equals the dump's row count, all nine families") {
    for ((dump, twin) <- Sweep.CensusTwin.toSeq.sortBy(_._1)) {
      val dumpRows = SparkEntry.queries(dump)(spark, dir).count()
      val row = SparkEntry.queries(twin)(spark, dir)
        .agg(sum("n_pairs")).collect()(0)
      val censusPairs = if (row.isNullAt(0)) 0L else row.getLong(0)
      assert(censusPairs == dumpRows,
        s"$twin prices $dump at $censusPairs rows but the dump emits " +
          s"$dumpRows at sf0.001")
    }
  }
}
