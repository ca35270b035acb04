package graft

import org.scalatest.funsuite.AnyFunSuite

/** LOCAL verify gate: a red or structurally-absent query must fail
  * `sbt test`, not only the driver's DuckDB compare (round-10 lesson:
  * an uncompilable tree produced an EMPTY correctness report, not a red
  * one; round 8's crashed queries silently shrank it). This spec walks
  * the full driver contract the way `graft.Verify` does — every
  * registered query is CONSTRUCTED against real testdata (which runs
  * each operator's eager persist/force prelude) and its plan is
  * ANALYZED, so a missing symbol, an unresolved column, a schema drift,
  * or a thrown prelude reddens the suite locally. Execution-dump +
  * hash-compare stays the driver's (and tools/oracle_check.py's) job.
  */
class VerifyGateSpec extends AnyFunSuite with SparkTestBase {

  private val d = "/root/testdata/sf0.001"

  test("every registered query has an oracle and every oracle a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${(o -- q).mkString(", ")}")
    assert((q -- o).isEmpty, s"queries without oracles: ${(q -- o).mkString(", ")}")
  }

  test("the registered surface only grows (floor pinned at round 13)") {
    // 172 = round-9's 166 + three *_pairs/census audit faces + manku
    // banding + the two ingestion-capstone faces; a refactor that
    // silently drops a registration fails here first
    // 175 = round 11's 174 + the streaming-face ingestion capstone
    // 176 = round 12's 175 + S2 column-type introspection
    // 178 = round 13's 176 + K2 _metadata summary + E4/E6 cast matrix
    // 179 = + embedding outlier detection (q_embed_outliers)
    // 181 = + vocabulary-coverage panel + n-gram saturation curve
    // 182 = + embedding near-dup census (the replica-scale face of
    //       q_dedup_embedding, whose raw pair dump is output-bound)
    // 183 = + cross-family pair-volume budget (q_pairs_budget: prices
    //       each banding family's candidate join without running it)
    // 184 = + wide-band simhash census (the sweepable twin of the
    //       q_dedup_simhash64_wide member-pair dump)
    // 186 = + jaccard/containment census twins (the last pair-dump
    //       default faces move to audit; census is the sweep face)
    assert(SparkEntry.queries.size >= 186,
      s"query surface shrank to ${SparkEntry.queries.size} (< 186)")
  }

  test("every query constructs and analyzes against sf0.001") {
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, d)
        df.queryExecution.assertAnalyzed()
        assert(df.schema.nonEmpty)
      } catch {
        case e: Throwable =>
          failures(name) =
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
      }
      spark.catalog.clearCache()
    }
    assert(failures.isEmpty,
      failures.map { case (k, v) => s"$k -> $v" }.mkString("\n"))
  }

  test("the flagship entry returns rows") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1L)
  }
}
