package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The uint256 SUM aggregate: must equal BigInteger addition across
  * partial/merge phases (values land in different partitions), honor
  * SQL SUM null semantics, and resolve through the SQL surface.
  */
class Uint256SumSpec extends AnyFunSuite with SparkTestBase {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] = {
    var seed = Seed(11L)
    val out = Seq.newBuilder[A]
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(out += _)
      seed = seed.next
      i += 1
    }
    out.result()
  }

  // < 2^248 each so sums of 30 never exceed 2^256
  private val genVal: Gen[BigInt] = for {
    bits <- Gen.choose(0, 248)
    bytes <- Gen.listOfN((bits + 7) / 8, Gen.choose(0, 255))
  } yield bytes.foldLeft(BigInt(0))((acc, b) => (acc << 8) | BigInt(b))
    .mod(BigInt(1) << 248)

  test("uint256_sum equals BigInteger sum across partition merges") {
    import spark.implicits._
    (0 until 10).foreach { round =>
      val vs = samples(genVal, 30).map(v => v + round) // vary per round
      val got = vs.map(_.toString).toDF("s").repartition(4)
        .select(GraftFunctions.uint256_encode(col("s")).as("u"))
        .agg(GraftFunctions.uint256_sum(col("u")).as("sum"))
        .head().getAs[Array[Byte]](0)
      assert(BigInt(1, got) === vs.sum)
    }
  }

  test("grouped sums with nulls: null inputs ignored, all-null group is null") {
    import spark.implicits._
    val df = Seq(
      ("a", Some("5")), ("a", None), ("a", Some("7")),
      ("b", None), ("b", None))
      .toDF("k", "s")
      .select(col("k"),
        when(col("s").isNotNull, GraftFunctions.uint256_encode(col("s"))).as("u"))
    val rows = df.groupBy("k")
      .agg(GraftFunctions.uint256_sum(col("u")).as("sum"))
      .orderBy("k").collect()
    assert(BigInt(1, rows(0).getAs[Array[Byte]]("sum")) === BigInt(12))
    assert(rows(1).isNullAt(1))
  }

  test("sum past 2^256 fails loudly instead of wrapping") {
    import spark.implicits._
    val big = (BigInt(1) << 256) - 1
    val df = Seq(big.toString, "1").toDF("s")
      .select(GraftFunctions.uint256_encode(col("s")).as("u"))
    val e = intercept[Exception](
      df.agg(GraftFunctions.uint256_sum(col("u"))).head())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("uint256")), messages(e).mkString("; "))
  }

  test("SQL surface: uint256_sum resolves and sums") {
    val viaSql = spark.sql(
      "SELECT hex(uint256_sum(uint256_encode(CAST(v AS DECIMAL(38,0))))) AS h " +
        "FROM VALUES (1), (2), (252) AS t(v)").head().getString(0)
    assert(BigInt(viaSql, 16) === BigInt(255))
  }
}
