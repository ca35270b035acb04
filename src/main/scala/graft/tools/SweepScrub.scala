package graft.tools

import graft.Sessions

/** Replica-sweep tool: times the boilerplate-scrub DIRECT and COLLAPSED
  * shapes explicitly forced on a given data dir. The adaptive sketch
  * always picks collapsed on replicated fixtures, so the direct shape
  * needs the override to be measured at scale (it is the shape a
  * genuinely unique corpus runs).
  *
  * Usage: runMain graft.tools.SweepScrub <sfDir> [direct|collapsed|both]
  */
object SweepScrub {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SweepScrub <sfDir> [direct|collapsed|both]")
    val dir = args(0)
    val which = if (args.length > 1) args(1) else "both"
    val spark = Sessions.local("graft-sweep-scrub")
    val faces = Seq("direct" -> Some(false), "collapsed" -> Some(true))
      .filter { case (l, _) => which == "both" || which == l }
    for ((label, c) <- faces) {
      val t0 = System.nanoTime()
      graft.operators.TextAnalysis.boilerplateScrub(spark, dir, collapse = c)
        .write.format("noop").mode("overwrite").save()
      println(f"[sweep-scrub] $label ${(System.nanoTime() - t0) / 1e9}%.1f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
