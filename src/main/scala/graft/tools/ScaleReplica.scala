package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.sources.Tables

/** Scale-up experiment data generator: writes an N× replica of a
  * testdata directory (default 10× — sf0.1 → ~sf1) by unioning shifted
  * copies of every fact table, so the bench can measure how each query's
  * runtime actually scales with data volume (the cheap empirical check
  * that nothing is accidentally super-linear).
  *
  * Key columns shift by a large per-copy offset so cardinalities scale
  * the way real growth would: 10× orders/customers/documents/users, with
  * join integrity preserved (o_custkey and c_custkey shift together) and
  * the tiny dimension tables (region, nation) kept single — they are
  * broadcast catalogs at any scale. Row CONTENT is repeated, which is
  * exactly what stresses dedup: every document gains 9 true near-dups.
  *
  * Usage: runMain graft.tools.ScaleReplica <srcDir> <dstDir> [copies] [files]
  * (never point dstDir at /root/testdata — this is a /tmp experiment).
  *
  * Replicated tables are written as `files` parquet files (default 32,
  * hash-distributed on the first shifted key) so scan stages parallelize
  * the way a real multi-executor deployment would. A single-file replica
  * is ONE row group, and parquet cannot split a row group — every scan
  * stage over it runs as one task, so scan-bound kernels measure
  * single-thread throughput instead of the plan (the round-13 fixture
  * handicap: up to 32× understated on a 32-core box). Dimension tables
  * (region, nation) stay single-file — they are broadcast catalogs.
  */
object ScaleReplica {

  /** Per-copy key offset — far above any key in the generated testdata. */
  val ShiftStep = 100000000L

  val shiftCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleReplica <srcDir> <dstDir> [copies]")
    val (src, dst) = (args(0), args(1))
    require(!dst.startsWith("/root/testdata") && !dst.startsWith("/root/reference"),
      s"refusing to write replica into $dst")
    val copies = if (args.length > 2) args(2).toInt else 10
    require(copies >= 1, s"copies must be >= 1, got $copies")
    val files = if (args.length > 3) args(3).toInt else 32
    require(files >= 1, s"files must be >= 1, got $files")
    val spark = Sessions.local("graft-scale-replica")
    replicate(spark, src, dst, copies, files)
    spark.stop()
  }

  def replicate(spark: org.apache.spark.sql.SparkSession, src: String,
      dst: String, copies: Int, files: Int): Unit = {
    for (t <- Tables.All) {
      val df = Tables.table(spark, src, t)
      val out = shiftCols.get(t) match {
        case None => df // dimension table: one copy, one file
        case Some(cols) =>
          // one cross join with a copy-index range, not a `copies`-way
          // union: the union plan is O(copies) deep and chokes Catalyst
          // past a few hundred copies; this stays one operator at any
          // multiplier
          val rep = df.crossJoin(
            spark.range(copies).select(col("id").as("__copy")))
          val shifted = cols.foldLeft(rep) { (d, c) =>
            // shifted keys WIDEN to long instead of casting back to the
            // source dtype: an int32 key would silently wrap once
            // copies * ShiftStep passes 2^31 (reachable now that the
            // cross-join rewrite handles hundreds of copies)
            d.withColumn(c,
              (col(c).cast("long") + col("__copy") * ShiftStep))
          }.drop("__copy")
          // hash-distribute on the first shifted key so the table lands
          // as `files` similar-size parquet files → parallel scan stages
          shifted.repartition(files, col(cols.head))
      }
      out.write.mode("overwrite").parquet(s"${dst.stripSuffix("/")}/$t.parquet")
      val nf = if (shiftCols.contains(t)) files else 1
      println(s"replicated $t x${if (shiftCols.contains(t)) copies else 1} in $nf files")
    }
  }
}
