package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the layout/quantization kernels against pure
  * models, sampled deterministically (no scalatest-scalacheck bridge in
  * the offline cache — same pattern as Uint256Spec).
  */
class LayoutOpsSpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 500)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val gen16 = Gen.choose(0L, 65535L)

  test("zorderKey is a bijection on 16-bit pairs (de-interleave round-trips)") {
    forAll(for { x <- gen16; y <- gen16 } yield (x, y)) { case (x, y) =>
      val z = LayoutOps.zorderKey(x, y)
      var (rx, ry) = (0L, 0L)
      for (k <- 0 until 16) {
        rx |= ((z >> (2 * k)) & 1L) << k
        ry |= ((z >> (2 * k + 1)) & 1L) << k
      }
      assert(rx === x && ry === y)
      assert(z >= 0L && z < (1L << 32))
    }
  }

  test("zorderKey only reads the low 16 bits (matches the declarative fold's domain)") {
    forAll(for { x <- Gen.choose(Long.MinValue, Long.MaxValue)
                 y <- Gen.choose(Long.MinValue, Long.MaxValue) } yield (x, y)) {
      case (x, y) =>
        assert(LayoutOps.zorderKey(x, y) ===
          LayoutOps.zorderKey(x & 0xFFFFL, y & 0xFFFFL))
    }
  }

  test("zorderKey preserves per-dimension monotonicity within a row/column") {
    // fixing one dim, the key is strictly monotone in the other — the
    // property that makes min/max fragment stats prunable on each dim
    forAll(for { x <- gen16; y <- gen16; d <- Gen.choose(1L, 100L) } yield (x, y, d)) {
      case (x, y, d) =>
        val x2 = math.min(x + d, 65535L)
        val y2 = math.min(y + d, 65535L)
        assert(LayoutOps.zorderKey(x, y) <= LayoutOps.zorderKey(x2, y))
        assert(LayoutOps.zorderKey(x, y) <= LayoutOps.zorderKey(x, y2))
    }
  }

  /** Pure-Scala model of the quantization stats (mirrors QuantizeSpec). */
  private def model(vec: Seq[Float]): Seq[Long] = {
    val ve6 = vec.map(x => math.floor(x.toDouble * 1e6).toLong)
    val m6 = if (ve6.isEmpty) 0L else ve6.map(math.abs).max
    val codes = ve6.map(v => if (m6 == 0) 0L else v * 127 / m6)
    Seq(
      m6,
      codes.zipWithIndex.map { case (c, i) => c * (i + 1) }.sum,
      if (codes.isEmpty) 0L else codes.min,
      if (codes.isEmpty) 0L else codes.max,
      ve6.zip(codes)
        .map { case (v, c) => math.abs(v - (if (m6 == 0) 0L else c * m6 / 127)) }
        .sum)
  }

  test("quantizeStats matches the model on random vectors (incl. negatives, zeros)") {
    val genVec = for {
      n <- Gen.choose(1, 128)
      xs <- Gen.listOfN(n, Gen.chooseNum(-10.0f, 10.0f, 0.0f, -1.0f, 1.0f))
    } yield xs
    forAll(genVec, n = 300) { xs =>
      val got = VectorOps.quantizeStats(
        new GenericArrayData(xs.toArray)).toLongArray.toSeq
      assert(got === model(xs), s"vector $xs")
      // int8 discipline holds for every input
      assert(got(2) >= -127L && got(3) <= 127L)
    }
  }
}
