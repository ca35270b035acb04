package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, Uint256Encode, Uint256RoundTrip}

class GraftExtensionsSpec extends AnyFunSuite with SparkTestBase {

  private def roundTripDf = {
    import spark.implicits._
    Seq("10000000000000000000", "0", "123")
      .toDF("s")
      .select(GraftFunctions.uint256_to_decimal(
        GraftFunctions.uint256_encode(col("s").cast("decimal(38,0)")))
        .as("v"))
  }

  test("optimizer eliminates the encode/decode round-trip") {
    // range source: a local Seq would be constant-folded away entirely
    val df = spark.range(3)
      .select(GraftFunctions.uint256_to_decimal(
        GraftFunctions.uint256_encode(col("id").cast("decimal(38,0)")))
        .as("v"))
    val optimized = df.queryExecution.optimizedPlan
    val exprs = optimized.expressions.flatMap(_.collect { case e => e })
    assert(exprs.exists(_.isInstanceOf[Uint256RoundTrip]),
      s"expected Uint256RoundTrip in: $optimized")
    assert(!exprs.exists(_.isInstanceOf[Uint256Encode]),
      s"carrier materialization survived: $optimized")
  }

  test("rewritten plan produces the round-trip values") {
    val got = roundTripDf.collect().map(_.getDecimal(0).toBigInteger.toString)
    assert(got.sorted === Array("0", "10000000000000000000", "123").sorted)
  }

  test("rewrite preserves negative-rejection semantics") {
    import spark.implicits._
    val df = Seq("-5").toDF("s")
      .select(GraftFunctions.uint256_to_decimal(
        GraftFunctions.uint256_encode(col("s").cast("decimal(38,0)"))))
    val e = intercept[Exception](df.collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("negative")), messages(e).mkString("; "))
  }
}
