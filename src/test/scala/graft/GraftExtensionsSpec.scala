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

  private val DotFold =
    "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"

  /** Two long-array columns off a range source (a local Seq would
    * constant-fold before the plan assertion can look at it).
    */
  private def dotFrame = spark.range(4).select(
    expr("transform(sequence(1L, 3L), i -> i + id)").as("a"),
    expr("transform(sequence(1L, 3L), i -> i * 2L)").as("b"))

  test("optimizer compiles the declarative long dot fold into the kernel") {
    val df = dotFrame.select(expr(DotFold).as("dot"), col("a"))
    val exprs = df.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case e => e })
    assert(exprs.exists(_.isInstanceOf[graft.functions.DotLongExact]),
      s"kernel missing from: ${df.queryExecution.optimizedPlan}")
    assert(!exprs.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ArrayAggregate]),
      "interpreted fold survived the rewrite")
    // values match the hand-computed fold: Σ (i + id)·(2i), i = 1..3
    val got = df.collect().map(_.getLong(0)).sorted
    val want = (0L until 4L).map(id => (1L to 3L).map(i => (i + id) * 2 * i).sum)
    assert(got === want.sorted.toArray)
  }

  test("dot-fold rewrite reproduces null and length-mismatch semantics") {
    // null element poisons the fold; zip_with pads a length mismatch
    // with nulls — both must stay NULL through the kernel
    // arrays depend on id so constant folding can't collapse the fold
    // before the rewrite is observable
    val df = spark.range(1).select(
      expr("aggregate(zip_with(array(1L + id, null), array(2L, 3L), (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("n1"),
      expr("aggregate(zip_with(array(1L + id, 2L, 3L), array(4L, 5L), (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("n2"),
      expr("aggregate(zip_with(array(1L + id, 2L), array(4L, 5L), (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("ok"))
    val row = df.head()
    assert(row.isNullAt(0) && row.isNullAt(1))
    assert(row.getLong(2) === 14L)
    // and those columns really did go through the kernel
    val exprs = df.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case e => e })
    assert(exprs.count(_.isInstanceOf[graft.functions.DotLongExact]) === 3)
  }

  test("dot-fold rewrite keeps ANSI overflow failing") {
    val df = spark.range(1).select(
      expr(s"aggregate(zip_with(array(${Long.MaxValue}L, 1L), array(2L, 1L), (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
    assert(spark.conf.get("spark.sql.ansi.enabled") === "true")
    intercept[Exception](df.collect())
  }

  test("non-dot folds are left alone") {
    val df = dotFrame.select(
      expr("aggregate(zip_with(a, b, (x, y) -> x + y), 0L, (acc, v) -> acc + v)").as("sumzip"),
      expr("aggregate(zip_with(a, a, (x, y) -> x * x), 0L, (acc, v) -> acc + v)").as("selfsq"))
    val exprs = df.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case e => e })
    assert(!exprs.exists(_.isInstanceOf[graft.functions.DotLongExact]),
      "rewrite matched a non-dot pattern")
    // and the semantics stay Spark's own
    val row = df.head()
    assert(row.getLong(0) === (1L to 3L).map(i => i + 2 * i).sum)
    assert(row.getLong(1) === (1L to 3L).map(i => i * i).sum)
  }

  test("dot_long and outlier_stats resolve in plain SQL") {
    val row = spark.sql(
      """SELECT
        |  dot_long(array(1L, 2L, 3L), array(4L, 5L)) AS d,
        |  size(outlier_stats(array(CAST(1.5 AS FLOAT), CAST(-0.25 AS FLOAT)))) AS os,
        |  outlier_stats(array(CAST(1.5 AS FLOAT), CAST(-0.25 AS FLOAT)), 2) AS os2
        |""".stripMargin).head()
    assert(row.getAs[Long]("d") === 14L) // min-length prefix contract
    assert(row.getAs[Int]("os") === 4)   // 2 coords + sumsq + bucket
    // q = [1500, -250], sumsq = 2312500; planes=2, stride=1: signs (+,−) → bucket 1
    assert(row.getAs[Seq[Long]]("os2") === Seq(1500L, -250L, 2312500L, 1L))
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
