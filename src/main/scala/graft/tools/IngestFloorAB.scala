package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.sources.Tables

/** Calibration A/B for the streaming batch floor's trickle guard
  * (`Tables.FloorMinRowsPerCore`): the guard's cliff — the micro-batch
  * size below which one hash exchange plus cores-wide stages cost more
  * than the single-task admission they replace — is hardware-dependent,
  * and as of r14 the 2048 rows/core constant had exactly two measured
  * points on one box. This tool brackets it: for each batch size B it
  * stages a drops directory of fixed-size parquet drops and runs the
  * REAL streaming admission (StreamingIngest.run) three times in the
  * off → on → off bracketing protocol (r14 lesson: on a drifting box,
  * an unbracketed A/B measures the drift), where "on"/"off" force the
  * floor's exchange via the `spark.graft.floorMinRowsPerCore` session
  * knob (1 = always exchange, huge = never) so the guard itself — not
  * the batch sizes the fixture happens to produce — is what's measured.
  *
  * Usage: runMain graft.tools.IngestFloorAB <sfDir> <outJson>
  *   [batchSizes csv, default 8192,32768,131072,524288]
  *   [totalDocs, default 1048576]
  */
object IngestFloorAB {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: IngestFloorAB <sfDir> <outJson> " +
      "[batchSizes csv] [totalDocs]")
    val sfDir = args(0)
    val out = java.nio.file.Paths.get(args(1))
    val sizes = (if (args.length > 2) args(2) else "8192,32768,131072,524288")
      .split(",").map(_.trim.toInt).toSeq
    val total = if (args.length > 3) args(3).toLong else 1048576L
    val spark = Sessions.local("graft-floor-ab")
    spark.range(1000).selectExpr("sum(id)").collect()

    val docs = Tables.documents(spark, sfDir)
    // contiguous batch index over the first `total` docs by doc_id —
    // one-time fixture prep, not part of any timed run
    val seq = docs.orderBy("doc_id").limit(total.toInt)
      .withColumn("rn", row_number().over(Window.orderBy("doc_id")) - 1)
      .localCheckpoint(true)
    val schema = docs.schema
    val cores = spark.sparkContext.defaultParallelism

    def timedRun(drops: String, root: String, floorMin: Long): Double = {
      val prior = spark.conf.getOption("spark.graft.floorMinRowsPerCore")
      spark.conf.set("spark.graft.floorMinRowsPerCore", floorMin.toString)
      val t0 = System.nanoTime()
      try graft.streaming.StreamingIngest.run(spark, drops, schema,
        s"$root/store", s"$root/ckpt")
      finally prior match {
        case Some(v) => spark.conf.set("spark.graft.floorMinRowsPerCore", v)
        case None => spark.conf.unset("spark.graft.floorMinRowsPerCore")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }

    val results = sizes.map { b =>
      val nBatches = (total / b).toInt
      val root = java.nio.file.Files
        .createTempDirectory(s"floor-ab-$b-").toString
      val dropsDir = new java.io.File(root, "drops")
      dropsDir.mkdirs()
      val t0ms = 1700000000000L
      (0 until nBatches).foreach { k =>
        val stage = s"$root/stage$k"
        seq.where(col("rn") >= k.toLong * b && col("rn") < (k + 1).toLong * b)
          .drop("rn").coalesce(1).write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(dropsDir, f"drop$k%05d.parquet")
        java.nio.file.Files.copy(part.toPath, dst.toPath)
        require(dst.setLastModified(t0ms + k * 60000L))
      }
      // off → on → off: each state gets a FRESH store/checkpoint (the
      // admission is stateful; a reused store would shrink later runs)
      def fresh(tag: String): String = {
        val d = s"$root/$tag"; new java.io.File(d).mkdirs(); d
      }
      val off1 = timedRun(dropsDir.toString, fresh("off1"), Long.MaxValue / 4)
      val on = timedRun(dropsDir.toString, fresh("on"), 1L)
      val off2 = timedRun(dropsDir.toString, fresh("off2"), Long.MaxValue / 4)
      println(f"[floor-ab] B=$b%7d x$nBatches%3d batches  " +
        f"off $off1%6.1f / on $on%6.1f / off $off2%6.1f s  " +
        f"(rows/core = ${b / cores}%d)")
      (b, nBatches, off1, on, off2)
    }

    val json = results.map { case (b, n, off1, on, off2) =>
      String.format(java.util.Locale.ROOT,
        """{"batch_rows":%d,"n_batches":%d,"rows_per_core":%d,""" +
          """"off1_sec":%.2f,"on_sec":%.2f,"off2_sec":%.2f}""",
        Int.box(b), Int.box(n), Long.box(b.toLong / cores),
        Double.box(off1), Double.box(on), Double.box(off2))
    }.mkString(
      s"""{"sf":"$sfDir","total_docs":$total,"cores":$cores,""" +
        s""""default_rows_per_core":${Tables.FloorMinRowsPerCore},""" +
        "\"runs\":[\n", ",\n", "\n]}")
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(out, json + "\n")
    println(s"[floor-ab] wrote $out")
    spark.stop()
  }
}
