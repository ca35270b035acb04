package graft.tools

import graft.Sessions

/** Profiling tool: reps the crossmodal census with GRAFT_XMODAL_TIMING
  * lap prints so the small-scale constant can be attributed to its
  * phases (funnel, memT, cls, perGroup, canonCos, hasFault, census).
  * Artifact: bench_out/XMODAL_PROFILE_r14.json.
  *
  * Usage: GRAFT_XMODAL_TIMING=1 runMain graft.tools.ProfileXmodal <sfDir> [reps]
  */
object ProfileXmodal {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local("graft-xmodal-profile")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.operators.Similarity.crossmodalAudit(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[xmodal] rep$i%d total ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
