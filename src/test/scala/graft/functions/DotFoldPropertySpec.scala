package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property twin for the dot-fold kernel the [[graft.DotKernelCompile]]
  * rule plants: [[VectorOps.dotLongExact]] must equal a pure-Scala model
  * of the declarative `aggregate(zip_with(a, b, (x, y) -> x * y), 0L,
  * (acc, v) -> acc + v)` — zip_with pads the shorter side with nulls, a
  * null product poisons the fold to null, otherwise the products sum.
  * Sampled deterministically (no scalatest-scalacheck bridge in the
  * offline cache).
  */
class DotFoldPropertySpec extends AnyFunSuite {

  private def forAllSamples[A](gen: Gen[A], n: Int = 2000)(f: A => Unit): Unit = {
    var seed = Seed(20260815L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  // values capped so no product or partial sum can overflow a long
  // (overflow identity is pinned separately in GraftExtensionsSpec)
  private val elemGen: Gen[Option[Long]] = Gen.frequency(
    9 -> Gen.choose(-1000000L, 1000000L).map(Some(_)),
    1 -> Gen.const(None))

  private val caseGen: Gen[(List[Option[Long]], List[Option[Long]])] = for {
    nA <- Gen.choose(0, 12)
    nB <- Gen.choose(0, 12)
    a  <- Gen.listOfN(nA, elemGen)
    b  <- Gen.listOfN(nB, elemGen)
  } yield (a, b)

  private def model(a: List[Option[Long]], b: List[Option[Long]]): Option[Long] = {
    val n = math.max(a.size, b.size)
    val products = (0 until n).map { i =>
      for {
        x <- if (i < a.size) a(i) else None
        y <- if (i < b.size) b(i) else None
      } yield x * y
    }
    products.foldLeft(Option(0L)) {
      case (Some(acc), Some(p)) => Some(acc + p)
      case _                    => None
    }
  }

  private def arr(xs: List[Option[Long]]): GenericArrayData =
    new GenericArrayData(xs.map(_.map(Long.box).orNull).toArray[Any])

  test("dotLongExact equals the zip-pad/null-poison/sum model") {
    forAllSamples(caseGen) { case (a, b) =>
      val got = Option(VectorOps.dotLongExact(arr(a), arr(b),
        failOnOverflow = true)).map(_.longValue())
      assert(got === model(a, b), s"a=$a b=$b")
    }
  }

  test("dotLong (min-length contract) equals the prefix-sum model") {
    // null-free arrays only — the prefix kernel's domain
    val denseGen = for {
      nA <- Gen.choose(0, 12)
      nB <- Gen.choose(0, 12)
      a  <- Gen.listOfN(nA, Gen.choose(-1000000L, 1000000L))
      b  <- Gen.listOfN(nB, Gen.choose(-1000000L, 1000000L))
    } yield (a, b)
    forAllSamples(denseGen) { case (a, b) =>
      val got = VectorOps.dotLong(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
      val want = a.zip(b).map { case (x, y) => x * y }.sum
      assert(got === want, s"a=$a b=$b")
    }
  }
}
