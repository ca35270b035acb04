package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The corpus-size-driven sign-LSH plane count (`numPlanesFor`, the
  * simhash band-mode rule applied to the embedding paths) and its two
  * load-bearing contracts:
  *
  *  1. SMALL CORPORA KEEP 8 PLANES — the DuckDB oracles, every sf0.01 /
  *     sf0.1 fixture, and the frozen bench canaries bucket exactly as
  *     they did before the rule existed (auto == explicit 8).
  *  2. WIDER BUCKETINGS REFINE, NEVER RESHUFFLE — the doubling steps'
  *     evenly-strided coordinate sets nest (stride-8 coords are the
  *     stride-4 coords at even positions), so a 16-plane bucket match
  *     implies an 8-plane match and the candidate/pair set can only
  *     SHRINK as the corpus grows.
  */
class SimilarityPlanesSpec extends AnyFunSuite with SparkTestBase {

  private val d = "/root/testdata/sf0.01"

  test("numPlanesFor: flip points double planes as the corpus grows") {
    assert(Similarity.numPlanesFor(0L) == 8)
    assert(Similarity.numPlanesFor(2000L) == 8)       // the sf0.1 fixture
    assert(Similarity.numPlanesFor(200000L) == 8)     // the 100x replica
    assert(Similarity.numPlanesFor(4096L << 8) == 8)  // last 8-plane corpus
    assert(Similarity.numPlanesFor((4096L << 8) + 1) == 16)
    assert(Similarity.numPlanesFor(2000000L) == 16)   // the 1000x replica
    assert(Similarity.numPlanesFor(4096L << 16) == 16)
    assert(Similarity.numPlanesFor((4096L << 16) + 1) == 32)
    assert(Similarity.numPlanesFor(100000000000L) == 32) // ~100 TB corpus
    assert(Similarity.numPlanesFor(4096L << 32) == 32)
    assert(Similarity.numPlanesFor((4096L << 32) + 1) == 64)
    assert(Similarity.numPlanesFor(Long.MaxValue) == 64) // capped at Dims
  }

  test("auto plane resolution equals explicit 8 planes on the fixtures") {
    // the oracle-twinned faces must be BYTE-identical under AutoPlanes:
    // every testdata corpus sits far below the first flip point
    val auto = Similarity.dedupEmbedding(spark, d).collect()
    val eight = Similarity.dedupEmbedding(spark, d, numPlanes = 8).collect()
    assert(auto.toSeq == eight.toSeq)
    assert(auto.nonEmpty)
  }

  test("doubling planes refines buckets: 16-plane pairs are a subset of 8-plane pairs") {
    // sf0.1, not sf0.01: the smaller fixture has no 16-plane bucket
    // collision above the cosine threshold, which would pass vacuously
    val d = "/root/testdata/sf0.1"
    val p8 = Similarity.dedupEmbedding(spark, d, numPlanes = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val p16 = Similarity.dedupEmbedding(spark, d, numPlanes = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(p16.nonEmpty, "16-plane candidate set must not collapse on the fixture")
    for ((pair, cos) <- p16) {
      assert(p8.contains(pair), s"16-plane pair $pair missing from 8-plane set")
      assert(p8(pair) == cos, s"cosine disagrees on $pair")
    }
  }

  test("census face aggregates exactly the pair dump") {
    val dump = Similarity.dedupEmbedding(spark, d).collect()
    val expected = dump.groupBy(_.getLong(2) / 100000L).map { case (band, rs) =>
      band -> (rs.length.toLong,
        rs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct.length.toLong)
    }
    val census = Similarity.dedupEmbeddingCensus(spark, d)
    val got = census.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    census.unpersist()
    assert(got == expected)
  }

  test("tableRows reads exact footer counts without a scan job") {
    val n = graft.sources.Tables.tableRows(spark, d, "embeddings")
    assert(n == spark.read.parquet(s"$d/embeddings.parquet").count())
    assert(n > 0)
  }
}
