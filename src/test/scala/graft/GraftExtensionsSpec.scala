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

  test("extension injects the full SQL function surface (no registerAll)") {
    // the shared session is built via withExtensions(new GraftExtensions)
    // and registerAll is never called — every kernel resolving in plain
    // SQL proves ext.injectFunction carried it in
    val row = spark.sql(
      """SELECT
        |  hex(uint256_encode(CAST(255 AS DECIMAL(38,0)))) AS enc,
        |  CAST(uint256_to_decimal(uint256_encode(CAST(7 AS DECIMAL(38,0)))) AS STRING) AS rt,
        |  CAST(uint256_div(uint256_encode(CAST(100 AS DECIMAL(38,0))), 3) AS STRING) IS NOT NULL AS div_lit,
        |  CAST(uint256_div(uint256_encode(CAST(100 AS DECIMAL(38,0))),
        |                   uint256_encode(CAST(3 AS DECIMAL(38,0)))) AS STRING) IS NOT NULL AS div_bin,
        |  uint256_hex(uint256_encode(CAST(255 AS DECIMAL(38,0)))) AS hx,
        |  size(minhash_sig('one two three four five')) AS mh,
        |  size(minhash_sig('one two three four five', 8)) AS mh8,
        |  simhash16('hello world hello') IS NOT NULL AS sh,
        |  size(simhash64_bands('hello world hello')) AS sh64,
        |  size(shingle_set('a b c d')) AS ss,
        |  size(text_fingerprint('a b c d e')) AS fp,
        |  content_hash('Hello,  World!') = content_hash('hello world') AS ch,
        |  size(text_stats('the cat sat')) AS ts,
        |  size(text_stats('the cat sat', 'cat')) AS ts2,
        |  cosine_e6(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)),
        |            array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS cos,
        |  lang_scores('der hund und die katze') AS ls,
        |  size(winnow_fps('a b c d e f g h')) AS wf,
        |  size(rolling_hashes('a b c d e')) AS rh,
        |  jaccard_e4(array('x', 'y'), array('y', 'z')) AS jac,
        |  hex(uint256_sum(uint256_encode(CAST(3 AS DECIMAL(38,0))))) AS us,
        |  size(winnow_fps('a b c d e f g h', 2)) AS wf2,
        |  CAST(uint256_to_decimal(uint256_mul(
        |    uint256_encode(CAST(6 AS DECIMAL(38,0))),
        |    uint256_encode(CAST(7 AS DECIMAL(38,0))))) AS STRING) AS mul,
        |  overlap_stats(array('x', 'y', 'y'), array('y', 'z')) AS ov,
        |  zorder_key(3L, 5L) AS zk,
        |  quantize_stats(array(CAST(1 AS FLOAT), CAST(-0.5 AS FLOAT))) AS qs
        |""".stripMargin).head()
    assert(row.getAs[String]("enc").endsWith("FF"))
    assert(row.getAs[String]("rt") === "7")
    assert(row.getAs[Boolean]("div_lit") && row.getAs[Boolean]("div_bin"))
    assert(row.getAs[String]("hx").endsWith("FF"))
    assert(row.getAs[Int]("mh") === 16 && row.getAs[Int]("mh8") === 8)
    assert(row.getAs[Boolean]("sh"))
    assert(row.getAs[Int]("sh64") === 4)
    assert(row.getAs[Int]("ss") === 2)
    assert(row.getAs[Int]("fp") === 3)
    assert(row.getAs[Boolean]("ch"))
    assert(row.getAs[Int]("ts") === 4 && row.getAs[Int]("ts2") === 4)
    assert(row.getAs[Long]("cos") === 1000000L)
    // de markers: der, und, die → 3 hits; en 'a' etc absent → 0
    assert(row.getAs[Seq[Long]]("ls") === Seq(3L, 0L, 0L, 0L, 0L))
    // 8 tokens -> 6 shingle hashes; w=4 -> 3 windows (<=3 distinct mins),
    // w=2 -> 5 windows; both at least 1
    assert(row.getAs[Int]("wf") >= 1 && row.getAs[Int]("wf") <= 3)
    assert(row.getAs[Int]("rh") === 3) // 5 tokens -> 3 positional hashes
    assert(row.getAs[Long]("jac") === 3333L) // |{y}| / |{x,y,z}|
    assert(BigInt(row.getAs[String]("us"), 16) === BigInt(3))
    assert(row.getAs[Int]("wf2") >= 1 && row.getAs[Int]("wf2") <= 5)
    assert(row.getAs[String]("mul") === "42")
    assert(row.getAs[Seq[Long]]("ov") === Seq(1L, 2L, 2L)) // inter, |A|, |B|
    // x=3 (bits 0,1 -> even slots 0,2), y=5 (bits 0,2 -> odd slots 1,5):
    // 1 + 4 + 2 + 32 = 39
    assert(row.getAs[Long]("zk") === 39L)
    // [1.0, -0.5]: scale 1e6, codes [127, -63], checksum 127 - 126 = 1,
    // err = |1e6 - 1e6| + |-5e5 - (-496062)| = 3938
    assert(row.getAs[Seq[Long]]("qs") === Seq(1000000L, 1L, -63L, 127L, 3938L))
  }

  test("extension class is instantiable the way spark.sql.extensions needs") {
    // the conf mechanism requires a public no-arg constructor yielding a
    // SparkSessionExtensions => Unit; instantiate exactly that way
    val f = Class.forName("graft.GraftExtensions").getDeclaredConstructor()
      .newInstance().asInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit]
    f(new org.apache.spark.sql.SparkSessionExtensions) // must not throw
  }

  test("registerAll installs the same surface as temp functions") {
    GraftFunctions.registerAll(spark)
    assert(spark.sql("SELECT content_hash('x') AS h").head().getString(0).length === 64)
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
