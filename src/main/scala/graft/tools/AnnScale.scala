package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.operators.Similarity

/** ANN quality at replica scale: the sf0.1 oracle gates IVF recall and
  * k-means cell purity at fixture size only, but the trained-centroid
  * geometry and bucket balance SHIFT with corpus size — this tool runs
  * the same recall/purity faces on a replica dir and records the
  * aggregate quality numbers (not just wall time), so "do probe counts
  * need to scale with corpus the way banding already does?" is a
  * measured answer instead of a guess.
  *
  * Usage: runMain graft.tools.AnnScale <sfDir> <outJson>
  */
object AnnScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: AnnScale <sfDir> <outJson>")
    val dir = args(0)
    val out = java.nio.file.Paths.get(args(1))
    val spark = Sessions.local("graft-ann-scale")
    spark.range(1000).selectExpr("sum(id)").collect()

    val t0 = System.nanoTime()
    val rec = Similarity.annRecall(spark, dir)
      .agg(count(lit(1)).as("n_queries"),
        avg("recall_e4").as("avg_recall_e4"),
        min("recall_e4").as("min_recall_e4"),
        expr("percentile(recall_e4, 0.1)").as("p10_recall_e4"))
      .collect()(0)
    val tRec = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()

    val t1 = System.nanoTime()
    val pur = Similarity.clusterPurity(spark, dir)
      .agg(count(lit(1)).as("n_cells"),
        // double, not integer, arithmetic: truncating long division
        // loses up to 1e-4 of purity and sum*10000 can overflow long on
        // extreme corpora — this is a recorded quality metric
        round(sum("n_top") * lit(10000.0) / sum("n_cell"))
          .cast("long").as("weighted_purity_e4"),
        min("purity_e4").as("min_purity_e4"),
        max("n_cell").as("max_cell"), min("n_cell").as("min_cell"))
      .collect()(0)
    val tPur = (System.nanoTime() - t1) / 1e9
    spark.catalog.clearCache()

    def f(v: Any): String = v match {
      case null => "null"
      case d: java.math.BigDecimal => d.toPlainString
      case x => x.toString
    }
    val json = String.format(java.util.Locale.ROOT,
      """{"sf":"%s","recall":{"n_queries":%s,"avg_recall_e4":%s,""" +
        """"min_recall_e4":%s,"p10_recall_e4":%s,"sec":%.1f},""" +
        """"purity":{"n_cells":%s,"weighted_purity_e4":%s,""" +
        """"min_purity_e4":%s,"max_cell":%s,"min_cell":%s,"sec":%.1f}}""",
      dir, f(rec.get(0)), f(rec.get(1)), f(rec.get(2)), f(rec.get(3)),
      Double.box(tRec), f(pur.get(0)), f(pur.get(1)), f(pur.get(2)),
      f(pur.get(3)), f(pur.get(4)), Double.box(tPur))
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(out, json + "\n")
    println(s"[ann-scale] $json")
    spark.stop()
  }
}
