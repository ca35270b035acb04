package graft.functions

import java.math.BigInteger

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The uint256 carrier's contract (reference cli.py:139-141): 32-byte
  * big-endian, lossless, and ORDER-PRESERVING under unsigned
  * lexicographic byte comparison — that last property is what lets
  * range predicates/sorts/joins run on the carrier with Spark's native
  * BinaryType ordering. Sampled deterministically (no
  * scalatest-scalacheck bridge in the offline cache).
  */
class Uint256Spec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 500)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(for { a <- ga; b <- gb } yield (a, b))(f.tupled)

  private val genUint256: Gen[BigInteger] = for {
    bits <- Gen.choose(0, 256)
    bytes <- Gen.listOfN((bits + 7) / 8, Gen.choose(0, 255))
  } yield {
    val v = bytes.foldLeft(BigInteger.ZERO)((acc, b) =>
      acc.shiftLeft(8).or(BigInteger.valueOf(b.toLong)))
    v.mod(BigInteger.ONE.shiftLeft(256))
  }

  test("encode/decode round-trips any uint256") {
    forAll(genUint256) { v =>
      val b = Uint256.encode(v)
      assert(b.length === 32)
      assert(Uint256.decode(b) === v)
    }
  }

  test("byte order preserves numeric order (unsigned lexicographic)") {
    def unsignedCompare(a: Array[Byte], b: Array[Byte]): Int = {
      var i = 0
      while (i < 32) {
        val c = java.lang.Integer.compare(a(i) & 0xff, b(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      0
    }
    forAll(genUint256, genUint256) { (x, y) =>
      val c = unsignedCompare(Uint256.encode(x), Uint256.encode(y))
      assert(Integer.signum(c) === x.compareTo(y))
    }
  }

  test("division matches BigInteger floor division") {
    forAll(genUint256, Gen.choose(1L, Long.MaxValue)) { (x, d) =>
      val got = Uint256.decode(Uint256.divideLong(Uint256.encode(x), d))
      assert(got === x.divide(BigInteger.valueOf(d)))
    }
  }

  test("carrier/carrier division matches BigInteger; zero divisor is null") {
    forAll(genUint256, genUint256) { (x, y) =>
      val r = Uint256.divideOrNull(Uint256.encode(x), Uint256.encode(y))
      if (y.signum() == 0) assert(r === null)
      else assert(Uint256.decode(r) === x.divide(y))
    }
    assert(Uint256.divideOrNull(Uint256.encode(BigInteger.TEN),
      Uint256.encode(BigInteger.ZERO)) === null)
  }

  test("multiplication matches BigInteger; overflow past 2^256 throws") {
    val max = BigInteger.ONE.shiftLeft(256).subtract(BigInteger.ONE)
    forAll(genUint256, genUint256) { (x, y) =>
      val prod = x.multiply(y)
      if (prod.compareTo(max) > 0)
        assertThrows[IllegalArgumentException](
          Uint256.multiply(Uint256.encode(x), Uint256.encode(y)))
      else
        assert(Uint256.decode(
          Uint256.multiply(Uint256.encode(x), Uint256.encode(y))) === prod)
    }
  }

  test("multiplication long fast-path boundary is exact") {
    // nlz(a)+nlz(b) = 65 is the largest product the fast path may take;
    // straddle the boundary with 31-bit × 32-bit and 32-bit × 32-bit
    val a31 = BigInteger.ONE.shiftLeft(31).subtract(BigInteger.ONE)
    val b32 = BigInteger.ONE.shiftLeft(32).subtract(BigInteger.ONE)
    for ((x, y) <- Seq((a31, b32), (b32, b32), (a31, a31),
        (BigInteger.ZERO, b32), (BigInteger.ONE, b32))) {
      assert(Uint256.decode(
        Uint256.multiply(Uint256.encode(x), Uint256.encode(y))) ===
        x.multiply(y))
    }
  }

  test("negative and oversized values are rejected") {
    assertThrows[IllegalArgumentException](Uint256.encode(BigInteger.valueOf(-1)))
    assertThrows[IllegalArgumentException](
      Uint256.encode(BigInteger.ONE.shiftLeft(256)))
  }

  test("decimal narrowing rejects values over 38 digits") {
    val big = new BigInteger("1" + "0" * 38) // 39 digits
    assertThrows[ArithmeticException](
      Uint256.decodeDecimal(Uint256.encode(big)))
    val ok = new BigInteger("9" * 38)
    assert(Uint256.decodeDecimal(Uint256.encode(ok)).toJavaBigDecimal
      .toBigInteger === ok)
  }
}
