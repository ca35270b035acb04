package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.Tables

/** Stream-stream interval join: both sides watermarked, time-banded
  * condition → bounded state. The batch face of the same expression is
  * a plain range join, so stream == batch is the correctness pin.
  */
class StreamingJoinSpec extends AnyFunSuite with SparkTestBase {

  private val SfDir = "/root/testdata/sf0.001"

  test("stream-stream click attribution (append) equals the batch range join") {
    val dir = Files.createTempDirectory("graft-joinstream")
    Files.copy(Paths.get(s"$SfDir/events.parquet"),
      dir.resolve("events-000.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val ckpt = Files.createTempDirectory("graft-joinstream-ckpt").toString

    val stream = EventStream.readEventStream(spark, dir.toString)
    EventStream.clickAttribution(stream, stream)
      .writeStream
      .format("memory").queryName("attr_sink")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
      .awaitTermination()

    val streamed = spark.table("attr_sink")
      .orderBy("purchase_id", "click_id").collect()
    val batchEvents = Tables.events(spark, SfDir)
    val batch = EventStream.clickAttribution(batchEvents, batchEvents)
      .orderBy("purchase_id", "click_id").collect()
    assert(streamed.length === batch.length)
    assert(streamed.map(_.toString) === batch.map(_.toString))
    assert(streamed.nonEmpty)
    // every match respects the band
    streamed.foreach { r =>
      val (p, c) = (r.getLong(3), r.getLong(4))
      assert(c <= p && c >= p - 30L * 60 * 1000000, s"row $r outside band")
    }
  }
}
