package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Driver-side exact-arithmetic twin for the embedding outlier flags:
  * the whole operator is integer math on e3-quantized coordinates, so a
  * BigInt model must reproduce every output bit on the real corpus.
  */
class EmbedOutliersSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Pure-Scala twin: e3 quantization, strided sign bucket, per-bucket
    * sufficient stats, variance-ratio flag + e4 share.
    */
  private def model(vecs: Map[Long, Seq[Float]])
      : Map[Long, (Int, Long, Long, Boolean)] = {
    val planes = Similarity.DefaultNumPlanes
    val stride = 64 / planes
    def bucket(v: Seq[Float]): Int =
      (0 until planes).map(k => if (v(stride * k) >= 0f) 1 << k else 0).sum
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => BigInt(math.floor(x.toDouble * 1000).toLong))
    }
    val byBucket = q.groupBy { case (id, _) => bucket(vecs(id)) }
    byBucket.flatMap { case (b, members) =>
      val n = BigInt(members.size)
      val s = (0 until 64).map(j => members.valuesIterator.map(_(j)).sum)
      val t = members.valuesIterator.map(_.map(x => x * x).sum).sum
      val sumd2 = n * n * t - n * s.map(x => x * x).sum
      members.map { case (id, qi) =>
        val d2 = (0 until 64).map { j =>
          val d = n * qi(j) - s(j); d * d
        }.sum
        val share =
          if (sumd2 > 0) (d2 * n * 10000 / sumd2).toLong else 0L
        id -> (b, n.toLong, share, d2 * n > Similarity.OutlierC * sumd2)
      }
    }
  }

  test("outlier flags match the BigInt model on the real corpus") {
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val m = model(vecs)
    val rows = Similarity.embedOutliers(spark, sf).collect()
    assert(rows.length === vecs.size)
    rows.foreach { r =>
      val (b, n, share, flag) = m(r.getLong(0))
      assert(r.getInt(1) === b, s"vec ${r.getLong(0)} bucket")
      assert(r.getLong(2) === n, s"vec ${r.getLong(0)} n_bucket")
      assert(r.getLong(3) === share, s"vec ${r.getLong(0)} share_e4")
      assert(r.getBoolean(4) === flag, s"vec ${r.getLong(0)} is_outlier")
    }
    // the synthetic corpus is CLEAN (Gaussian-ish, no junk vectors), so
    // the 4×-mean rule correctly flags nothing here — but the shares
    // must still be data-dependent, not a degenerate constant
    assert(rows.map(_.getLong(3)).distinct.length > 10,
      "share_e4 degenerate: expected data-dependent variance shares")
  }

  test("a planted far vector is flagged; its bucket peers are not") {
    import spark.implicits._
    // 9 tight vectors + 1 far one, all in the all-positive sign bucket
    val base = Seq.tabulate(9) { i =>
      (i.toLong, Seq.tabulate(64)(j => 0.5f + 0.001f * ((i + j) % 3)))
    }
    val far = (9L, Seq.tabulate(64)(_ => 3.0f))
    val emb = (base :+ far).toDF("vec_id", "embedding")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding")
    val out = Similarity.embedOutliersFrom(emb).collect()
    assert(out.length === 10)
    assert(out.forall(_.getLong(2) === 10L), "one bucket expected")
    assert(out.filter(_.getBoolean(4)).map(_.getLong(0)).toSeq === Seq(9L))
    // the far vector owns nearly all the bucket variance
    assert(out.find(_.getLong(0) == 9L).get.getLong(3) > 80000L)
  }

  test("degenerate buckets (identical members) flag nothing, share 0") {
    import spark.implicits._
    val emb = Seq.tabulate(4) { i =>
      (i.toLong, Seq.tabulate(64)(j => if (j % 2 == 0) 0.25f else -0.75f))
    }.toDF("vec_id", "embedding")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding")
    val out = Similarity.embedOutliersFrom(emb).collect()
    assert(out.length === 4)
    assert(out.forall(r => !r.getBoolean(4) && r.getLong(3) === 0L))
  }
}
