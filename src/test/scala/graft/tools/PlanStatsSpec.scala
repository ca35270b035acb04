package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the TaskMetrics accounting PlanStats relies on: a query with a
  * known shuffle registers task counts, fresh file-scan input bytes,
  * and matching shuffle write/read volumes through a listener — the
  * measurement instrument behind PLANSTATS artifacts must not silently
  * read zero (an async-bus drain or metrics API change would otherwise
  * fake "no shuffle" evidence).
  */
class PlanStatsSpec extends AnyFunSuite with SparkTestBase {

  test("a shuffling aggregation registers tasks, input, and shuffle bytes") {
    val tasks = new LongAdder; val input = new LongAdder
    val sw = new LongAdder; val sr = new LongAdder
    val l = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          tasks.increment()
          input.add(m.inputMetrics.bytesRead)
          sw.add(m.shuffleWriteMetrics.bytesWritten)
          sr.add(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .groupBy("l_orderkey").agg(sum("l_quantity"))
        .write.format("noop").mode("overwrite").save()
      // drain the async listener bus the way the tool does
      Thread.sleep(2000)
      assert(tasks.sum() > 0, "no task-end events observed")
      assert(input.sum() > 0, "file scan registered zero input bytes")
      assert(sw.sum() > 0, "group-by registered zero shuffle write")
      assert(sr.sum() > 0 && sr.sum() == sw.sum(),
        s"shuffle read (${sr.sum()}) must equal shuffle write (${sw.sum()})")
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
