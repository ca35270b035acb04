package graft.functions

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.model.{ColumnMapping, TableConfig, TargetType}

/** Property tests for the transform core (E1-E3): the Column-algebra
  * pipeline must equal a pure-BigInt reference model — floor-division
  * downscale, clamp-with-default, and the validity flag — across random
  * values, scale factors, and clamp bounds. This is the money-carrying
  * path (reference README.md:56-88), so the declarative decimal
  * arithmetic (incl. the `(a - a%b)/b` exact floor form) gets the same
  * randomized scrutiny as the planner.
  */
class TransformsSpec extends AnyFunSuite with SparkTestBase {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] = {
    var seed = Seed(99L)
    val out = Seq.newBuilder[A]
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(out += _)
      seed = seed.next
      i += 1
    }
    out.result()
  }

  private val genValue: Gen[BigInt] = Gen.oneOf(
    Gen.choose(0L, Long.MaxValue).map(BigInt(_)),
    // full Decimal(38) domain via digit strings
    Gen.listOfN(38, Gen.choose(0, 9)).map(ds => BigInt(ds.mkString)),
    Gen.oneOf(BigInt(0), BigInt(1), BigInt("18446744073709551615"),
      BigInt("18446744073709551616"), BigInt(10).pow(38) - 1))

  private case class Cfg(downscale: Option[BigInt], max: BigInt, default: BigInt)

  private val genCfg: Gen[Cfg] = for {
    down <- Gen.option(Gen.oneOf(BigInt(1), BigInt(2), BigInt(1000),
      BigInt(1000000000L), BigInt(10).pow(18)))
    max <- Gen.oneOf(BigInt("18446744073709551615"), BigInt(12345),
      BigInt(10).pow(30), BigInt(0))
    default <- Gen.oneOf(BigInt(0), BigInt(7))
  } yield Cfg(down, max, default)

  private def model(v: BigInt, c: Cfg): (BigInt, Boolean) = {
    val base = c.downscale.map(v / _).getOrElse(v)
    val valid = base <= c.max
    (if (valid) base else c.default, valid)
  }

  test("downscale + clamp + validity equal the BigInt model") {
    val schema = StructType(Seq(StructField("v", DecimalType(38, 0))))
    samples(genCfg, 8).foreach { cfg =>
      val values = samples(genValue, 60)
      val rows = values.map(v => Row(new JBigDecimal(v.bigInteger)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema)
      val tc = TableConfig(Seq(1024L), Map("v" -> Seq(
        ColumnMapping("out", TargetType.Numeric38,
          downscale = cfg.downscale,
          maxValue = Some(cfg.max),
          default = Some(cfg.default),
          validityColumn = Some("out_valid")))))
      val got = Transforms.convertColumns(df, Map.empty, tc)
        .select("out", "out_valid").collect()
        .map(r => (BigInt(r.getDecimal(0).toBigInteger), r.getBoolean(1)))
      // row order within the job is stable (no shuffle: one projection)
      val want = values.map(model(_, cfg))
      assert(got.sorted.toSeq === want.sorted,
        s"cfg=$cfg")
    }
  }

  test("uint64 target with uint64 clamp never overflows Decimal(20,0)") {
    val u64max = BigInt("18446744073709551615")
    val schema = StructType(Seq(StructField("v", DecimalType(38, 0))))
    val values = samples(genValue, 60)
    val rows = values.map(v => Row(new JBigDecimal(v.bigInteger)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val tc = TableConfig(Seq(1024L), Map("v" -> Seq(
      ColumnMapping("out", TargetType.UInt64,
        maxValue = Some(u64max), default = Some(BigInt(0)),
        validityColumn = Some("out_valid")))))
    val got = Transforms.convertColumns(df, Map.empty, tc)
      .select("out", "out_valid").collect()
      .map(r => (BigInt(r.getDecimal(0).toBigInteger), r.getBoolean(1)))
    val want = values.map { v =>
      val valid = v <= u64max
      (if (valid) v else BigInt(0), valid)
    }
    assert(got.sorted.toSeq === want.sorted)
    got.foreach { case (v, _) => assert(v >= 0 && v <= u64max) }
  }
}
