package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's planning-time probe (`Bench.planningSeconds`): it
  * must force the full physical plan (so a driver-side optimizer
  * regression shows up in its wall time — the r14 DotKernelCompile
  * lesson: the execution-time box canaries are expression-light and
  * blind to planning cost) while executing NO job, so the probe itself
  * never contaminates the timed passes with cached results or page
  * cache warmth.
  */
class BenchPlanningSpec extends AnyFunSuite with SparkTestBase {

  test("planningSeconds forces the physical plan without running a job") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    // warm the session before installing the listener so lazy session
    // init jobs (none expected, but cheap insurance) don't count
    spark.range(1).count()
    spark.sparkContext.addSparkListener(l)
    try {
      val secs = Bench.planningSeconds(
        spark.range(1000).selectExpr("id % 7 AS k", "id AS v")
          .groupBy("k").sum("v").orderBy("k"))
      assert(secs > 0.0, "planning probe must report positive wall time")
      // job-start events post asynchronously; give the bus a beat —
      // a probe that RAN a job would enqueue the event synchronously
      // with the action, well inside this window
      Thread.sleep(300)
      assert(jobs.get === 0,
        s"planning probe executed ${jobs.get} job(s) — it must only plan")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("planningSeconds swallows a failing builder") {
    // a query whose BUILDER throws must not kill the bench at probe
    // time — the failure is recorded by the timed passes themselves
    val secs = Bench.planningSeconds(sys.error("builder boom"))
    assert(secs >= 0.0)
  }
}
