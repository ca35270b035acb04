package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.plans.{Partition, Partitioner}

/** Ports the reference's hypothesis suite (tests/test_partitioning.py)
  * to ScalaCheck generators: totality, contiguity, non-increasing tier
  * sizes. Valid tier lists are cumulative products so each divides the
  * next (test_partitioning.py:7-14). Sampled deterministically (no
  * scalatest-scalacheck bridge in the offline cache).
  */
class PartitionerSpec extends AnyFunSuite {

  private def forAllSamples[A](gen: Gen[A], n: Int = 500)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  // Python's hypothesis uses unbounded ints; cap the factor count so the
  // cumulative products stay within Long (100^8 < 2^63).
  private val tierSizesGen: Gen[List[Long]] = for {
    first   <- Gen.choose(1L, 100L)
    n       <- Gen.choose(0, 7)
    factors <- Gen.listOfN(n, Gen.choose(1L, 100L))
  } yield factors.scanLeft(first)(_ * _)

  private val caseGen: Gen[(Long, Long, List[Long])] = for {
    a     <- Gen.choose(0L, 1000L)
    b     <- Gen.choose(0L, 1000L)
    sizes <- tierSizesGen
  } yield (math.min(a, b), math.max(a, b), sizes)

  test("totality: any valid range and tier list yields a plan") {
    forAllSamples(caseGen) { case (lo, hi, sizes) =>
      assert(Partitioner.plan(lo, hi, sizes).length >= 0)
    }
  }

  test("contiguity: each partition's end is the next partition's start") {
    forAllSamples(caseGen) { case (lo, hi, sizes) =>
      val plan = Partitioner.plan(lo, hi, sizes)
      plan.sliding(2).foreach {
        case Vector(a, b) => assert(a.end == b.start, s"$a then $b in $plan")
        case _            =>
      }
    }
  }

  test("sizes are monotonically non-increasing across the plan") {
    forAllSamples(caseGen) { case (lo, hi, sizes) =>
      val plan = Partitioner.plan(lo, hi, sizes)
      plan.sliding(2).foreach {
        case Vector(a, b) => assert(a.size >= b.size)
        case _            =>
      }
    }
  }

  test("alignment and terminal boundary") {
    forAllSamples(caseGen) { case (lo, hi, sizes) =>
      val plan = Partitioner.plan(lo, hi, sizes)
      plan.foreach(p => assert(p.start % p.size == 0, s"unaligned $p"))
      if (plan.nonEmpty) {
        val smallest = sizes.min
        assert(plan.last.end == math.floorDiv(hi, smallest) * smallest)
      }
    }
  }

  test("None bounds yield an empty plan (unknown catalog range)") {
    assert(Partitioner.plan(None, Some(10L), Seq(1L)).isEmpty)
    assert(Partitioner.plan(Some(10L), None, Seq(1L)).isEmpty)
  }

  test("reference fixture shape: tiers [524288, 32768, 1024]") {
    // Blocks 18460372..18888119 (tests/resources/example_db.sql:55-60).
    val plan = Partitioner.plan(18460372L, 18888119L, Seq(524288L, 32768L, 1024L))
    assert(plan.head == Partition(524288L, 18350080L, 18874368L))
    assert(plan.sliding(2).forall { case Vector(a, b) => a.end == b.start; case _ => true })
    assert(plan.last.end == math.floorDiv(18888119L, 1024L) * 1024L)
  }

  test("worklist: new minus previous, order preserved") {
    val prev = Partitioner.plan(0L, 100L, Seq(10L))
    val next = Partitioner.plan(0L, 130L, Seq(10L))
    val work = Partitioner.worklist(next, prev)
    assert(work == Vector(Partition(10, 100, 110), Partition(10, 110, 120), Partition(10, 120, 130)))
  }

  test("paths are Hive-style key=value segments") {
    val dir = Partitioner.partitionDir(
      Partitioner.tableDir("/out/ds/v1", "sg", "t"), Partition(1024, 2048, 3072))
    assert(dir == "/out/ds/v1/data/subgraph=sg/table=t/partition_size=1024/start_partition=2048/end_partition=3072")
  }

  test("planner tiers scale with the id-space width, plan stays driver-sized") {
    import graft.operators.PlannerQueries.{planTier, tiersFor}
    // generated-testdata widths keep the reference pyramid exactly
    assert(tiersFor(120000L) == Seq(4096L, 512L, 64L))
    assert(tiersFor(4194304L) == Seq(4096L, 512L, 64L))
    // each 8x tier step covers 8x more width; monotone, never shrinking
    var prev = 64L
    var w = 1L
    while (w > 0 && w < (1L << 62)) {
      val t = planTier(w)
      assert(t >= prev, s"planTier not monotone at width $w")
      prev = t
      w *= 2
    }
    // clamp arm: the widest widths still produce the ladder's ELSE tier
    assert(planTier(Long.MaxValue / 2) == (64L << 39))
    // the bound that keeps plans one-tuple-per-file at any width:
    // top tier covers the width in <= 1024 partitions (clamp excepted)
    for (w <- Seq(1L << 20, 1L << 30, 123456789L, 1L << 45, (1L << 58) - 1)) {
      val t = planTier(w)
      assert(w <= (t << 16), s"width $w not covered by 1024 top tiers of ${64 * t}")
      val plan = Partitioner.plan(0L, w, tiersFor(w))
      assert(plan.size <= 1024 + 16, s"plan for width $w has ${plan.size} tuples")
    }
  }
}
