package graft.operators

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Pins the two charDiversity regimes the fixture corpus never reaches
  * (ADVICE round 8): zero-alnum docs must be EMITTED (diverse_ok =
  * false), and docs past ~3×10⁶ alnum chars must not wrap BIGINT in
  * N²·10⁶ (the Decimal(38,0) accumulation).
  */
class CharDiversitySpec extends AnyFunSuite with SparkTestBase {

  private def panel(rows: Seq[(Long, String)]): Map[Long, Row] = {
    import spark.implicits._
    TextAnalysis.charDiversityFrom(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("zero-alnum docs are emitted with diverse_ok = false") {
    val out = panel(Seq(
      1L -> "!!! ??? ¿¡ ☃☃☃",  // pure symbol/emoji spam
      2L -> "a normal sentence with letters 123"))
    assert(out.keySet == Set(1L, 2L), "zero-alnum doc must not be filtered")
    val z = out(1L)
    assert(z.getLong(1) == 0L)            // n_alnum
    assert(z.getLong(2) == 0L)            // eff_alphabet_ppm
    assert(z.getLong(3) == 0L)            // top_share_e4
    assert(z.getLong(4) == 0L)            // n_distinct_chars
    assert(!z.getBoolean(5), "diverse_ok must be false for zero-alnum")
    assert(out(2L).getBoolean(5))
  }

  test("single-char doc collapses to the floor values") {
    val out = panel(Seq(3L -> ("x" * 100)))
    val r = out(3L)
    assert(r.getLong(1) == 100L)
    assert(r.getLong(2) == 1000000L)      // eff alphabet = exactly 1 char
    assert(r.getLong(3) == 10000L)        // top share = 100%
    assert(r.getLong(4) == 1L)
    assert(!r.getBoolean(5))
  }

  test("4M-char doc: N^2*1e6 exceeds Long.MaxValue yet ppm stays exact") {
    val n = 4_000_000L
    assert(n * n > Long.MaxValue / 1000000L, "regime check: would wrap BIGINT")
    // 2M 'a' + 2M 'b': sum c^2 = 2*(2e6)^2 = 8e12; eff = N^2*1e6/8e12 = 2e6
    val out = panel(Seq(4L -> ("a" * 2000000 + "b" * 2000000)))
    val r = out(4L)
    assert(r.getLong(1) == n)
    assert(r.getLong(2) == 2000000L, "effective alphabet must be exactly 2 chars")
    assert(r.getLong(3) == 5000L)
    assert(r.getLong(4) == 2L)
  }
}
