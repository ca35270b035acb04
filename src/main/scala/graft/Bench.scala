package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line.
  *
  * Protocol: each query runs SPARK_GRAFT_BENCH_REPS times (default 3) and
  * reports the MEDIAN — single runs at this scale carry 20-30% machine
  * noise, which round 2 showed can masquerade as broad regressions. The
  * cache is cleared between reps so persisted intermediates don't
  * compound across repetitions.
  *
  * Failures are loud: a failing query is named in the `failed` array and
  * the process exits non-zero — a broken query must never make the bench
  * look faster.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = Sessions.local("graft-bench")
    // JVM/codegen/parquet-reader warmup on a non-benchmarked tiny table
    // so the first timed query doesn't absorb session start-up cost.
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()

    val failures = scala.collection.mutable.LinkedHashSet[String]()
    // a failed rep yields None: its (tiny) fast-fail duration must never
    // enter the median or the total — a broken query would otherwise make
    // the bench look FASTER
    def timeOnce(name: String, fn: (SparkSession, String) => DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      val ok =
        // noop DSv2 sink: materializes EVERY output column and keeps the
        // final sort — count() would let Catalyst prune the projections
        // and eliminate the orderBy, timing a fraction of the query
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable =>
            failures += s"$name:${e.getClass.getSimpleName}"
            false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      if (ok) Some(dt) else None
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = Seq.fill(reps)(timeOnce(name, fn)).flatten.sorted
      name -> (if (times.isEmpty) -1.0 else times(times.size / 2))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // total covers successful queries only (failed ones report -1)
    val total = results.values.filter(_ >= 0).sum
    val failed = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"failed":$failed}""")
    spark.stop()
    if (failures.nonEmpty) {
      System.err.println(s"BENCH FAILURES: ${failures.mkString(", ")}")
      sys.exit(1)
    }
  }
}
