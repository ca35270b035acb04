package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Driver-side model checks for int8 scalar quantization and the
  * semantic-dedup verdict.
  */
class QuantizeSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Pure-Scala twin of the quantization arithmetic. */
  private def model(vec: Seq[Float]): (Long, Long, Long, Long, Long) = {
    val ve6 = vec.map(x => math.floor(x.toDouble * 1e6).toLong)
    val m6 = ve6.map(math.abs).max
    val codes = ve6.map(v => if (m6 == 0) 0L else v * 127 / m6)
    val checksum = codes.zipWithIndex.map { case (c, i) => c * (i + 1) }.sum
    val err = ve6.zip(codes)
      .map { case (v, c) => math.abs(v - (if (m6 == 0) 0L else c * m6 / 127)) }
      .sum
    (m6, checksum, codes.min, codes.max, err)
  }

  test("quantization matches the integer model on the real corpus") {
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val rows = Similarity.embedQuantize(spark, sf).collect()
    assert(rows.length === vecs.size)
    rows.foreach { r =>
      val (m6, checksum, cMin, cMax, err) = model(vecs(r.getLong(0)))
      assert(r.getLong(1) === m6, s"vec ${r.getLong(0)} scale")
      assert(r.getLong(2) === checksum, s"vec ${r.getLong(0)} checksum")
      assert(r.getLong(3) === cMin && r.getLong(4) === cMax,
        s"vec ${r.getLong(0)} code range")
      assert(r.getLong(5) === err, s"vec ${r.getLong(0)} err")
      // int8 range discipline: codes live in [-127, 127]
      assert(cMin >= -127 && cMax <= 127, s"vec ${r.getLong(0)} out of int8")
      // relative reconstruction error is bounded by 1/127 per coordinate
      assert(m6 == 0 || err <= 64L * (m6 / 127 + 1), s"vec ${r.getLong(0)} error bound")
    }
  }

  test("product quantization matches a pure-Scala fit + encode model") {
    val pqM = Similarity.PqM
    val pqK = Similarity.PqK
    val subDims = 64 / pqM
    val vecs: Seq[(Long, Array[Long])] = graft.sources.Tables
      .embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6).toLong).toArray)
      .sortBy(_._1)
    def slice(v: Array[Long], m: Int): Array[Long] =
      v.slice(m * subDims, (m + 1) * subDims)
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // seeds: the pqK hash-smallest vec_ids' slices
    val seeds = vecs
      .sortBy { case (id, _) =>
        (graft.functions.TextHash.sha256Hex(id.toString).substring(0, 16), id)
      }.take(pqK).map(_._2)
    var cb: Map[(Int, Long), Array[Long]] = (for {
      (v, c) <- seeds.zipWithIndex; m <- 0 until pqM
    } yield (m, c.toLong) -> slice(v, m)).toMap
    def assign(v: Array[Long], m: Int): Long =
      (0L until pqK.toLong).minBy(c => (l2(slice(v, m), cb((m, c))), c))
    for (_ <- 0 until Similarity.PqIters) {
      val members = vecs.flatMap { case (_, v) =>
        (0 until pqM).map(m => (m, assign(v, m)) -> slice(v, m))
      }.groupBy(_._1)
      cb = cb.map { case (key, old) =>
        key -> members.get(key).map { ms =>
          val n = ms.size
          (0 until subDims).map(i => ms.map(_._2(i)).sum / n).toArray
        }.getOrElse(old)
      }
    }
    // the Spark fit must equal the model codebook cell-for-cell
    val fitted = Similarity.fitPqCodebooks(spark, sf)
    assert(fitted.size === pqM * pqK)
    fitted.foreach { case (m, c, ce6) =>
      assert(ce6.toArray === cb((m, c)), s"codebook cell ($m, $c)")
    }
    // and the encoded output must equal the model encode
    val rows = Similarity.pqCodes(spark, sf).collect()
    assert(rows.length === vecs.size)
    val byId = vecs.toMap
    rows.foreach { r =>
      val v = byId(r.getLong(0))
      val codes = (0 until pqM).map(m => assign(v, m))
      assert(r.getString(1) === codes.mkString(","), s"vec ${r.getLong(0)} codes")
      assert(r.getLong(2) === codes.zipWithIndex.map { case (c, m) => c * (m + 1) }.sum,
        s"vec ${r.getLong(0)} checksum")
      val err = (0 until pqM).map { m =>
        slice(v, m).zip(cb((m, codes(m)))).map { case (x, y) => math.abs(x - y) }.sum
      }.sum
      assert(r.getLong(3) === err, s"vec ${r.getLong(0)} reconstruction error")
    }
  }

  test("zero and constant vectors take the guarded paths") {
    import spark.implicits._
    val dims = 64
    val crafted = Seq(
      (0L, Seq.fill(dims)(0.0f)),              // zero vector: scale 0, codes 0
      (1L, Seq.fill(dims)(1.0f)),              // constant: every code = 127
      (2L, Seq.tabulate(dims)(i => if (i == 0) -1.0f else 0.0f))) // single -1
      .toDF("vec_id", "embedding")
    val rows = Similarity.quantizeFrames(crafted).orderBy("vec_id").collect()
    val zero = rows(0)
    assert(zero.getLong(1) === 0L && zero.getLong(2) === 0L &&
      zero.getLong(5) === 0L, "zero vector must quantize to all-zero, no error")
    val const = rows(1)
    assert(const.getLong(3) === 127L && const.getLong(4) === 127L &&
      const.getLong(5) === 0L, "constant vector is exact at code 127")
    val neg = rows(2)
    assert(neg.getLong(3) === -127L && neg.getLong(4) === 0L,
      "negative spike maps to -127")
  }

  test("semantic dedup keeps each cell's smallest id and only drops verified near-dups") {
    val rows = Similarity.dedupSemantic(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    assert(rows.map(_._1).toSet === vecs.keySet)
    def cosE6(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = a.map(x => x * x).sum
      val nb = b.map(x => x * x).sum
      math.floor(dot / math.sqrt(na * nb) * 1e6).toLong
    }
    val byCell = rows.groupBy(r => (r._2, r._3))
    byCell.foreach { case (cell, members) =>
      // the smallest id in a cell has no earlier neighbor: always kept
      val smallest = members.minBy(_._1)
      assert(smallest._4, s"cell $cell: smallest id ${smallest._1} was dropped")
      // every drop is justified by a verified earlier near-dup in-cell
      members.filter(!_._4).foreach { case (id, _, _, _) =>
        val earlier = members.filter(_._1 < id)
        assert(earlier.exists(e => cosE6(vecs(e._1), vecs(id)) >= 300000L),
          s"vec $id dropped without an earlier in-cell near-dup")
      }
      // every kept non-smallest member has NO earlier near-dup in-cell
      members.filter(m => m._4 && m._1 != smallest._1).foreach { case (id, _, _, _) =>
        val earlier = members.filter(_._1 < id)
        assert(!earlier.exists(e => cosE6(vecs(e._1), vecs(id)) >= 300000L),
          s"vec $id kept despite an earlier in-cell near-dup")
      }
    }
  }

  test("cluster purity is a consistent contingency of the IVF assignment") {
    // full numeric correctness (k-means fit + assignment + contingency)
    // is pinned by the unrolled-SQL DuckDB oracle; this checks the
    // report's internal arithmetic and its consistency with the
    // centroid audit's independent aggregation path
    val labels = graft.sources.Tables.embeddings(spark, sf)
      .select("label").collect().map(_.getInt(0)).toSet
    val nVecs = graft.sources.Tables.embeddings(spark, sf).count()
    val purity = Similarity.clusterPurity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(purity.map(_._2).sum === nVecs, "cells must partition the corpus")
    purity.foreach { case (cell, nCell, topLabel, nTop, e4, nLabels) =>
      assert(labels.contains(topLabel), s"cell $cell: unknown majority label")
      assert(nTop >= 1 && nTop <= nCell, s"cell $cell: majority count range")
      assert(nLabels >= 1 && nLabels <= labels.size.toLong, s"cell $cell: label count")
      assert(e4 === nTop * 10000L / nCell, s"cell $cell: purity arithmetic")
      // majority must cover at least its proportional share
      assert(nTop * nLabels >= nCell, s"cell $cell: majority below uniform share")
    }
    val audit = Similarity.ivfCentroids(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    purity.foreach { case (cell, nCell, _, _, _, _) =>
      assert(audit.get(cell).contains(nCell),
        s"cell $cell: contingency count $nCell disagrees with the centroid audit")
    }
  }

  test("ann recall is the driver set-intersection of the two top-k faces") {
    val truth = Similarity.simTopkBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Similarity.simTopkIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = Similarity.annRecall(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === truth.keySet)
    got.foreach { case (q, (nTruth, nHits, e4)) =>
      val hits = (truth(q) intersect approx.getOrElse(q, Set.empty)).size.toLong
      assert(nTruth === truth(q).size.toLong, s"q $q truth size")
      assert(nHits === hits, s"q $q intersection")
      assert(e4 === hits * 10000L / nTruth, s"q $q recall arithmetic")
    }
    // the 2-of-8-cell probe must find a non-trivial share of the truth
    assert(got.values.map(_._2).sum > 0, "IVF found nothing — index broken")
  }

  test("crossmodal audit annotates exactly the minhash pairs with driver cosines") {
    val pairs = Dedup.dedupMinhashLshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cosModel(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      math.floor(dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
        * 1e6).toLong
    }
    val got = Similarity.crossmodalAuditPairs(spark, sf).collect()
      .map { r =>
        // cos_e6 is nullable: fail loudly on a fixture with a missing
        // embedding row instead of letting getLong silently read 0
        assert(!r.isNullAt(3),
          s"pair (${r.getLong(0)},${r.getLong(1)}) has NULL cos_e6 — " +
            "fixture lost an embedding row")
        (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getBoolean(4)))
      }.toMap
    assert(got.keySet === pairs.keySet, "audit must cover exactly the funnel pairs")
    got.foreach { case ((a, b), (jac, cos, agree)) =>
      assert(jac === pairs((a, b)), s"pair ($a,$b) jaccard passthrough")
      assert(cos === cosModel(vecs(a), vecs(b)), s"pair ($a,$b) cosine")
      assert(agree === (cos >= 300000L), s"pair ($a,$b) verdict arithmetic")
    }
  }

  test("multi-probe LSH candidates strictly contain the single-bucket candidates") {
    val single = Similarity.simTopkLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val multi = Similarity.simTopkLshMulti(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // same schema, same k-bound
    assert(multi.groupBy(_._1).values.forall(_.size <= 5))
    // every single-probe rank list can only IMPROVE: at equal rank, the
    // multi-probe cosine is >= the single-probe cosine (supersets of
    // candidates can't make top-k worse)
    val sByQ: Map[Long, Seq[Long]] = single.groupBy(_._1).view
      .mapValues(_.map(_._3).toSeq.sorted.reverse).toMap
    val mByQ: Map[Long, Seq[Long]] = multi.groupBy(_._1).view
      .mapValues(_.map(_._3).toSeq.sorted.reverse).toMap
    sByQ.foreach { case (q, sCos) =>
      val mCos: Seq[Long] = mByQ.getOrElse(q, Seq.empty)
      sCos.zip(mCos).foreach { case (s, m) =>
        assert(m >= s, s"query $q: multi-probe top-k regressed ($m < $s)")
      }
      assert(mCos.size >= sCos.size, s"query $q: multi-probe returned fewer rows")
    }
    // and against brute truth, multi-probe recall must not be lower
    val truth = Similarity.simTopkBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def recallOf(rows: Array[(Long, Long, Long)]): Double = {
      val byQ = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      truth.map { case (q, t) =>
        (t intersect byQ.getOrElse(q, Set.empty)).size.toDouble / t.size
      }.sum / truth.size
    }
    assert(recallOf(multi) >= recallOf(single),
      "multi-probe recall fell below single-probe")
  }
}
