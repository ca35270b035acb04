package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Differential check for the multi-round BPE trainer: a third,
  * plain-Scala implementation (explicit symbol vectors, no strings-as-
  * segmentations, no SQL) trains on the same sf0.001 corpus and must
  * learn the identical merge list, weighted counts, and symbol
  * inventory sizes. The DuckDB oracle already pins Spark==SQL; this
  * pins both against an implementation that shares no representation
  * with either.
  */
class BpeTrainSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def tokens(text: String): Vector[String] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase(java.util.Locale.ROOT)).toVector

  /** Greedy left-to-right non-overlapping fuse of (a, b) in one word. */
  private def fuse(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def modelTrain(rounds: Int): Seq[(Long, String, Long, Long)] = {
    val wordFreq: Map[String, Long] =
      graft.sources.Tables.documents(spark, sf)
        .select("text").collect()
        .flatMap(r => tokens(r.getString(0)))
        .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var segs: Map[String, (Vector[String], Long)] =
      wordFreq.map { case (w, cf) => w -> (w.map(_.toString).toVector, cf) }
    (1 to rounds).map { r =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      segs.values.foreach { case (syms, cf) =>
        syms.zip(syms.tail).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + cf)
      }
      // argmax with the engines' tie-break: count desc, then the
      // rendered "a+b" string ascending
      val ((a, b), cnt) = counts.toSeq
        .minBy { case ((x, y), c) => (-c, x + "+" + y) }
      segs = segs.map { case (w, (syms, cf)) => w -> (fuse(syms, a, b), cf) }
      val nSyms = segs.values.flatMap(_._1).toSet.size.toLong
      (r.toLong, a + "+" + b, cnt, nSyms)
    }
  }

  test("spark trainer matches the independent scala model") {
    val rounds = TextAnalysis.DefaultBpeTrainRounds
    val got = TextAnalysis.bpeTrain(spark, sf, rounds).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === modelTrain(rounds))
  }

  test("merge-pair counts are non-increasing across rounds") {
    // fusing cannot create a pair more frequent than the one it fused:
    // every new (x, ab) occurrence was an (x, a) occurrence before
    val counts = TextAnalysis.bpeTrain(spark, sf).collect().map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (prev, next) => next <= prev })
  }
}
