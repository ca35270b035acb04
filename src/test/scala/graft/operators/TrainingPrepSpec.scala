package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Structural invariants of the training-prep operators, checked
  * against independent driver-side models on the real sf0.001 corpus —
  * the properties the hash oracle can't articulate (coverage, ordering,
  * arithmetic identities).
  */
class TrainingPrepSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def tokens(text: String): Vector[String] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase(java.util.Locale.ROOT)).toVector

  private lazy val docs: Map[Long, Vector[String]] =
    graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tokens(r.getString(1))).toMap

  /** Driver twin of the CDC boundary rule (the compiled rolling-hash
    * chain + mask cut): chunk token-vectors per document.
    */
  private def cdcChunks(toks: Vector[String],
      mask: Long = TrainingPrep.CdcMask): Vector[Vector[String]] = {
    if (toks.isEmpty) return Vector.empty
    val bounds: Vector[Int] =
      if (toks.size < 3) Vector(0, toks.size)
      else {
        val md = java.security.MessageDigest.getInstance("SHA-256")
        def tv(t: String): Long = java.lang.Long.parseLong(
          md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
            .substring(0, 8), 16) % 1000000007L
        val tvs = toks.map(tv)
        val rhs = (0 until toks.size - 2).map(i =>
          ((tvs(i) * 131 + tvs(i + 1)) % 1000000007L * 131 + tvs(i + 2)) % 1000000007L)
        (0 +: rhs.zipWithIndex.collect {
          case (h, i) if h % mask == 0 => i + 3
        } :+ toks.size).distinct.sorted.toVector
      }
    bounds.sliding(2).map { case Vector(a, b) => toks.slice(a, b) }.toVector
  }

  test("CDC chunks match the driver boundary model on the real corpus") {
    val rows = TrainingPrep.chunkCdc(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getBoolean(5)))
    val expected = docs.toVector.flatMap { case (id, toks) =>
      cdcChunks(toks).zipWithIndex.map { case (c, k) =>
        (id, (k + 1).toLong, c.size.toLong, c.mkString(" ")) }
    }
    val gotChunks = rows.map(r => (r._1, r._2, r._3)).sorted
    assert(gotChunks === expected.map(e => (e._1, e._2, e._3)).sorted)
    // copy counts: every digest's n_copies equals its multiplicity
    val mult = expected.groupBy(_._4).view.mapValues(_.size.toLong).toMap
    val digestOf = expected.map(e => (e._1, e._2) -> e._4).toMap
    rows.foreach { case (id, k, _, _, copies, dup) =>
      val m = mult(digestOf((id, k)))
      assert(copies === m, s"doc $id chunk $k copy count")
      assert(dup === (m > 1), s"doc $id chunk $k dup flag")
    }
    // chunks must re-join to the exact document (total coverage, order)
    docs.foreach { case (id, toks) =>
      assert(cdcChunks(toks).flatten === toks, s"doc $id coverage")
    }
  }

  test("CDC boundaries re-align after an edit where fixed strides do not") {
    // take a long doc, prepend tokens (the classic early edit), and
    // require that most CDC chunk digests survive — the property that
    // justifies content-defined over fixed-offset chunking
    val (_, toks) = docs.maxBy(_._2.size)
    assume(toks.size >= 40, "need a long doc for the property")
    val edited = Vector("zzzz", "qqqq", "jjjj") ++ toks
    val orig = cdcChunks(toks).map(_.mkString(" "))
    val after = cdcChunks(edited).map(_.mkString(" ")).toSet
    val shared = orig.count(after)
    assert(shared >= orig.size - 2,
      s"only $shared/${orig.size} CDC chunks survived the prefix edit")
    // fixed-stride comparison: the same edit shifts every 16-token
    // window, so at most the trailing partial chunk can coincide
    def strideChunks(ts: Vector[String]): Vector[String] =
      (0 until (ts.size + 15) / 16).map(c =>
        ts.slice(c * 16, c * 16 + 32).mkString(" ")).toVector
    val fixedShared = strideChunks(toks).count(strideChunks(edited).toSet)
    assert(fixedShared < shared,
      s"fixed-stride chunks ($fixedShared) should not survive as well as CDC ($shared)")
  }

  test("chunking covers every token exactly per the stride model") {
    val chunk = 32
    val stride = 16
    val rows = TrainingPrep.chunkSliding(spark, sf, chunk, stride).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val byDoc = rows.groupBy(_._1)
    docs.foreach { case (id, toks) =>
      val n = toks.size
      if (n == 0) assert(!byDoc.contains(id))
      else {
        val expected = (n - 1) / stride + 1
        val cs = byDoc(id).sortBy(_._2)
        assert(cs.length === expected, s"doc $id: chunk count")
        cs.zipWithIndex.foreach { case ((_, idx, start, nTok), i) =>
          assert(idx === i)
          assert(start === i.toLong * stride)
          assert(nTok === math.min(chunk, n - start).toLong)
        }
        // the windows cover all n tokens: last chunk reaches the end
        val (_, _, lastStart, lastN) = cs.last
        assert(lastStart + lastN === n.toLong)
      }
    }
  }

  test("degenerate chunk parameters are rejected") {
    intercept[IllegalArgumentException] {
      TrainingPrep.chunkSliding(spark, sf, chunkTokens = 16, strideTokens = 32)
    }
    intercept[IllegalArgumentException] {
      TrainingPrep.chunkSliding(spark, sf, chunkTokens = 0, strideTokens = 0)
    }
  }

  test("mixture weights are floor-exact token shares that sum to <= 1e6") {
    val rows = TrainingPrep.mixWeights(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // tallies match a driver recount joined on source
    val bySource = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val tokBySource = docs.toSeq.groupBy { case (id, _) => bySource(id) }
      .map { case (s, ds) => s -> (ds.size.toLong, ds.map(_._2.size.toLong).sum) }
    val total = tokBySource.values.map(_._2).sum
    rows.foreach { case (s, nDocs, nTok, ppm) =>
      val (mDocs, mTok) = tokBySource(s)
      assert(nDocs === mDocs, s"source $s docs")
      assert(nTok === mTok, s"source $s tokens")
      assert(ppm === mTok * 1000000L / total, s"source $s ppm")
    }
    val ppmSum = rows.map(_._4).sum
    assert(ppmSum <= 1000000L && ppmSum > 1000000L - rows.length,
      s"floor shares must sum to (1e6 - #sources, 1e6]: $ppmSum")
  }

  test("temperature reweighting flattens the mix monotonically") {
    val natural = TrainingPrep.mixWeights(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val rows = TrainingPrep.mixTemperature(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSet === natural.keySet)
    // model: the nested floor-sqrt spec + floor renormalization
    val w2 = rows.map { case (s, _, ppm, _, _) =>
      s -> math.floor(math.sqrt(ppm.toDouble * 1e6)).toLong
    }.toMap
    val w4 = w2.view.mapValues(w => math.floor(math.sqrt(w.toDouble * 1e6)).toLong).toMap
    val (tot2, tot4) = (w2.values.sum, w4.values.sum)
    rows.foreach { case (s, _, ppm, t2, t4) =>
      assert(ppm === natural(s), s"source $s natural share")
      assert(t2 === w2(s) * 1000000L / tot2, s"source $s t2")
      assert(t4 === w4(s) * 1000000L / tot4, s"source $s t4")
    }
    // flattening: spread (max-min) strictly shrinks as T grows, and the
    // share ORDER is preserved (reweighting is monotone in the share)
    def spread(xs: Seq[Long]) = xs.max - xs.min
    assert(spread(rows.map(_._4).toSeq) <= spread(rows.map(_._3).toSeq))
    assert(spread(rows.map(_._5).toSeq) <= spread(rows.map(_._4).toSeq))
    val byNatural = rows.sortBy(_._3)
    assert(byNatural.map(_._4).toSeq === byNatural.map(_._4).sorted.toSeq, "t2 order")
    assert(byNatural.map(_._5).toSeq === byNatural.map(_._5).sorted.toSeq, "t4 order")
  }

  test("bpe pair counts equal a driver recount over the vocabulary") {
    val rows = TextAnalysis.bpePairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val vocab = docs.toSeq.flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pairCounts = vocab.toSeq.filter(_._1.length >= 2).flatMap { case (w, cf) =>
      w.sliding(2).map(p => (p, w, cf))
    }
    val model = pairCounts.groupBy(_._1).map { case (p, xs) =>
      p -> (xs.map(_._3).sum, xs.map(_._2).distinct.size.toLong)
    }
    val top = model.toSeq.sortBy { case (p, (n, _)) => (-n, p) }.take(30)
    assert(rows.map(_._1).toSeq === top.map(_._1))
    rows.foreach { case (p, n, nw) =>
      assert((n, nw) === model(p), s"pair $p")
    }
  }

  test("bpe apply re-segments greedily and recounts like the driver model") {
    val vocab = docs.toSeq.flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    // round 1: argmax character pair (ties to the smallest pair)
    val round1 = vocab.toSeq.filter(_._1.length >= 2).flatMap { case (w, cf) =>
      w.sliding(2).map(_ -> cf)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val merge = round1.toSeq.minBy { case (p, n) => (-n, p) }._1
    // greedy left-to-right re-segmentation
    def segment(w: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < w.length) {
        if (i + 1 < w.length && w.substring(i, i + 2) == merge) {
          out += merge; i += 2
        } else { out += w.substring(i, i + 1); i += 1 }
      }
      out.result()
    }
    val round2 = vocab.toSeq.flatMap { case (w, cf) =>
      val syms = segment(w)
      syms.zip(syms.drop(1)).map { case (a, b) => (s"$a+$b", w, cf) }
    }
    val model = round2.groupBy(_._1).map { case (p, xs) =>
      p -> (xs.map(_._3).sum, xs.map(_._2).distinct.size.toLong)
    }
    val top = model.toSeq.sortBy { case (p, (n, _)) => (-n, p) }.take(30)
    val rows = TextAnalysis.bpeApply(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.forall(_._1 == merge), "applied rule must be the argmax pair")
    assert(rows.map(_._2).toSeq === top.map(_._1))
    rows.foreach { case (_, p, n, nw) => assert((n, nw) === model(p), s"pair $p") }
    // the applied merge must no longer exist as a char+char pair
    assert(!model.contains(s"${merge(0)}+${merge(1)}"),
      "merged symbol must be fused everywhere")
  }

  test("quantiles equal the rank-arithmetic model and are monotone") {
    val bySource = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val lens = docs.toSeq.map { case (id, toks) =>
      (bySource(id), id, toks.size.toLong)
    }
    val model = lens.groupBy(_._1).map { case (s, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2)).map(_._3)
      def at(p: Int) = sorted(((sorted.size.toLong * p + 99) / 100 - 1).toInt)
      s -> (at(50), at(90), at(99), sorted.size.toLong)
    }
    val rows = TrainingPrep.quantileStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, p99, n) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert((p50, p90, p99, n) === model(r.getString(0)))
      assert(p50 <= p90 && p90 <= p99)
    }
  }

  test("bigram coherence matches the driver LM on every doc") {
    val bigrams = docs.toSeq.flatMap { case (id, toks) =>
      toks.sliding(2).collect { case Vector(a, b) => (id, a, b) }
    }
    val lm = bigrams.groupBy(t => (t._2, t._3)).map { case (k, v) => k -> v.size.toLong }
    val heads = bigrams.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val model = bigrams.groupBy(_._1).map { case (id, bs) =>
      val ps = bs.map { case (_, a, b) => lm((a, b)) * 1000000L / heads(a) }
      id -> (bs.size.toLong, ps.sum / bs.size)
    }
    val rows = TrainingPrep.bigramCoherence(spark, sf).collect()
    assert(rows.length === model.size)
    rows.foreach { r =>
      assert((r.getLong(1), r.getLong(2)) === model(r.getLong(0)),
        s"doc ${r.getLong(0)}")
    }
  }

  test("collocations match the driver phrase-score model") {
    val allToks = docs.toSeq.flatMap(_._2)
    val uni = allToks.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val nUni = allToks.size.toLong
    val bigrams = docs.toSeq.flatMap(_._2.sliding(2).collect {
      case Vector(a, b) => (a, b)
    })
    val expected = bigrams.groupBy(identity).toSeq
      .map { case ((a, b), xs) =>
        val c12 = xs.size.toLong
        val score = (BigInt(c12 - TrainingPrep.CollocDiscount) * nUni * 1000000L /
          (BigInt(uni(a)) * uni(b))).toLong
        (a, b, c12, uni(a), uni(b), score)
      }
      .filter(_._3 >= TrainingPrep.MinCollocCount)
      .sortBy(t => (-t._6, t._1, t._2))
      .take(TrainingPrep.DefaultCollocTopK)
    val got = TrainingPrep.collocations(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
    assert(got.nonEmpty, "fixture should produce collocations")
  }

  test("length histogram buckets every doc once with floor-exact shares") {
    val bySource = graft.sources.Tables.documents(spark, sf)
      .select("source", "doc_id").collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val model = bySource.map { case (src, ids) =>
      val buckets = ids.map(id => math.min(docs(id).size / 50, 19).toLong)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      src -> buckets
    }
    val rows = TrainingPrep.lengthHistogram(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    rows.foreach { case (src, bucket, fromTok, n, share) =>
      assert(n === model(src)(bucket), s"($src, $bucket) count")
      assert(fromTok === bucket * 50, s"($src, $bucket) lower edge")
      assert(share === n * 10000L / bySource(src).length, s"($src, $bucket) share")
    }
    // every doc lands in exactly one bucket
    model.foreach { case (src, buckets) =>
      assert(rows.filter(_._1 == src).map(_._4).sum === bySource(src).length.toLong,
        s"$src coverage")
      assert(rows.filter(_._1 == src).map(_._2).toSet === buckets.keySet, s"$src buckets")
    }
  }
}
