package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.operators.Similarity
import graft.sources.Tables

/** The compiled cosine kernel must be bit-identical to the declarative
  * left-fold form the DuckDB oracles reproduce.
  */
class VectorOpsSpec extends AnyFunSuite with SparkTestBase {

  test("CosineSimE6 equals the declarative fold on real embeddings") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .join(emb.select(col("vec_id").as("ib"), col("embedding").as("b")),
        col("ia") < col("ib") && col("ib") < 40)
    val declarative = pairs
      .select(col("ia"), col("ib"),
        Similarity.cosE6Declarative("a", "b").as("c"))
      .orderBy("ia", "ib").collect()
    val compiled = pairs
      .select(col("ia"), col("ib"), GraftFunctions.cosine_e6(col("a"), col("b")).as("c"))
      .orderBy("ia", "ib").collect()
    assert(compiled.length === declarative.length)
    assert(compiled.map(_.toString) === declarative.map(_.toString))
    assert(compiled.nonEmpty)
  }

  test("length mismatch and zero norm yield null") {
    import spark.implicits._
    val df = Seq(
      (Seq(1f, 2f), Seq(1f, 2f, 3f)), // length mismatch
      (Seq(0f, 0f), Seq(1f, 2f)))     // zero norm
      .toDF("a", "b")
      .select(GraftFunctions.cosine_e6(col("a"), col("b")).as("c"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("JaccardE4 equals the declarative intersect/union form") {
    import spark.implicits._
    val df = Seq(
      (Seq("a b c", "b c d", "c d e"), Seq("b c d", "x y z")),
      (Seq("a b c"), Seq("a b c")),
      (Seq("a b c", "a b c"), Seq("a b c")), // dup elements = set semantics
      (Seq("q"), Seq("r")),
      (Seq.empty[String], Seq("r")))
      .toDF("sa", "sb")
    val declarative = df.select(
      expr("size(array_intersect(sa, sb)) * 10000L div size(array_union(sa, sb))"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    val compiled = df.select(GraftFunctions.jaccard_e4(col("sa"), col("sb")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(compiled.toSeq === declarative.toSeq)
  }

  test("OverlapStats equals the declarative intersect/distinct sizes") {
    import spark.implicits._
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("a")), // dup elements = set semantics
      (Seq("q"), Seq("r")),
      (Seq.empty[String], Seq("r")),
      (Seq.empty[String], Seq.empty[String]))
      .toDF("sa", "sb")
    val declarative = df.select(array(
        expr("size(array_intersect(sa, sb))").cast("long"),
        expr("size(array_distinct(sa))").cast("long"),
        expr("size(array_distinct(sb))").cast("long")))
      .collect().map(_.getSeq[Long](0))
    val compiled = df.select(GraftFunctions.overlap_stats(col("sa"), col("sb")))
      .collect().map(_.getSeq[Long](0))
    assert(compiled.toSeq === declarative.toSeq)
  }
}
