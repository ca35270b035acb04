package graft.extract

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.plans.Partition
import graft.sinks.Fs

/** Prune semantics: pruning is a SUPERSEDE cleanup, never lossy. A
  * partition directory may only be deleted when a strictly larger tier in
  * the current plan fully covers its block range — directories past the
  * plan's coverage (stream-written head partitions), foreign tiers, and
  * committed data under a regressed catalog range must all survive.
  * (The reference never deletes files at all, cli.py:328.)
  */
class MetadataSinkSpec extends AnyFunSuite with SparkTestBase {

  private def conf = spark.sparkContext.hadoopConfiguration

  private def tmp(): String =
    Files.createTempDirectory("graft-meta").toString

  private def mkPartition(tableDir: String, p: Partition): String = {
    val dir = s"$tableDir/${p.relativePath}"
    Fs.writeString(s"$dir/part-00000.parquet", "stub", conf)
    dir
  }

  private def exists(tableDir: String, p: Partition): Boolean =
    Fs.exists(s"$tableDir/${p.relativePath}", conf)

  test("smaller tier fully covered by a strictly larger plan tier is pruned") {
    val t = tmp()
    val small = Seq(Partition(1024, 0, 1024), Partition(1024, 1024, 2048))
    small.foreach(mkPartition(t, _))
    val plan = Seq(Partition(4096, 0, 4096))
    plan.foreach(mkPartition(t, _))
    val deleted = MetadataSink.pruneStalePartitions(t, plan, conf)
    assert(deleted.size === 2)
    small.foreach(p => assert(!exists(t, p)))
    assert(exists(t, plan.head))
  }

  test("stream-written head partition past plan coverage survives") {
    val t = tmp()
    val plan = Seq(Partition(4096, 0, 4096))
    plan.foreach(mkPartition(t, _))
    // head partitions beyond the catalog-aligned end, written by the
    // streaming twin sharing this table dir — their source rows are
    // already consumed; deletion would be unrecoverable
    val head = Seq(Partition(1024, 4096, 5120), Partition(1024, 5120, 6144))
    head.foreach(mkPartition(t, _))
    val deleted = MetadataSink.pruneStalePartitions(t, plan, conf)
    assert(deleted.isEmpty)
    head.foreach(p => assert(exists(t, p)))
  }

  test("partition only partially covered by the plan survives") {
    val t = tmp()
    // straddles the plan's end: [3072, 5120) extends past [0, 4096)
    val straddle = Partition(2048, 3072, 5120)
    mkPartition(t, straddle)
    val plan = Seq(Partition(4096, 0, 4096))
    plan.foreach(mkPartition(t, _))
    assert(MetadataSink.pruneStalePartitions(t, plan, conf).isEmpty)
    assert(exists(t, straddle))
  }

  test("same-size partition not in plan survives (no strictly-larger cover)") {
    val t = tmp()
    val other = Partition(4096, 4096, 8192)
    mkPartition(t, other)
    val plan = Seq(Partition(4096, 0, 4096))
    plan.foreach(mkPartition(t, _))
    assert(MetadataSink.pruneStalePartitions(t, plan, conf).isEmpty)
    assert(exists(t, other))
  }

  test("catalog range regression (reorg) deletes nothing") {
    val t = tmp()
    val committed = Seq(Partition(4096, 0, 4096), Partition(1024, 4096, 5120))
    committed.foreach(mkPartition(t, _))
    // shrunken plan after a reorg: covers less than what's on disk
    val plan = Seq(Partition(1024, 0, 1024))
    assert(MetadataSink.pruneStalePartitions(t, plan, conf).isEmpty)
    committed.foreach(p => assert(exists(t, p)))
  }

  test("unparseable directory names are never deleted") {
    val t = tmp()
    val weird = s"$t/partition_size=big/start_partition=0/end_partition=10"
    Fs.writeString(s"$weird/part-00000.parquet", "stub", conf)
    val plan = Seq(Partition(4096, 0, 4096))
    plan.foreach(mkPartition(t, _))
    assert(MetadataSink.pruneStalePartitions(t, plan, conf).isEmpty)
    assert(Fs.exists(weird, conf))
  }

  test("prune is idempotent and cleans empty intermediate dirs") {
    val t = tmp()
    val small = Partition(1024, 0, 1024)
    mkPartition(t, small)
    val plan = Seq(Partition(4096, 0, 4096))
    plan.foreach(mkPartition(t, _))
    assert(MetadataSink.pruneStalePartitions(t, plan, conf).size === 1)
    // intermediate size/start dirs of the deleted tier are gone
    assert(!Fs.exists(s"$t/partition_size=1024", conf))
    // second prune: nothing left to do
    assert(MetadataSink.pruneStalePartitions(t, plan, conf).isEmpty)
    assert(exists(t, plan.head))
  }

  test("property: prune never deletes an interval the plan doesn't re-cover") {
    // randomized supersede safety: whatever mix of plan dirs, stale
    // smaller tiers, head partitions, and foreign tiers is on disk,
    // every deleted dir's [start, end) must be fully inside a surviving
    // strictly-larger plan partition — no block interval is ever lost
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val tierGen: Gen[List[Long]] = for {
      first   <- Gen.oneOf(1L, 2L, 4L)
      factors <- Gen.listOfN(2, Gen.oneOf(2L, 4L, 8L))
    } yield factors.scanLeft(first)(_ * _)
    val caseGen: Gen[(Long, Long, List[Long], List[(Long, Long)])] = for {
      lo    <- Gen.choose(0L, 64L)
      span  <- Gen.choose(0L, 192L)
      sizes <- tierGen
      nDirs <- Gen.choose(0, 6)
      dirs  <- Gen.listOfN(nDirs, for {
        sz <- Gen.oneOf(1L, 2L, 3L, 4L, 8L, 16L, 32L) // incl. foreign tiers
        st <- Gen.choose(0L, 16L)
      } yield (sz, st * sz))
    } yield (lo, lo + span, sizes, dirs)

    var seed = Seed(7L)
    var i = 0
    while (i < 40) {
      caseGen.apply(Gen.Parameters.default, seed).foreach {
        case (lo, hi, sizes, dirs) =>
          val t = tmp()
          val plan = graft.plans.Partitioner.plan(lo, hi, sizes)
          val onDisk = (plan ++ dirs.map { case (sz, st) => Partition(sz, st, st + sz) }).distinct
          onDisk.foreach(mkPartition(t, _))
          val deleted = MetadataSink.pruneStalePartitions(t, plan, conf).toSet
          onDisk.foreach { p =>
            val wasDeleted = deleted.exists(_.endsWith(p.relativePath))
            val covered = plan.exists(q =>
              q.size > p.size && q.start <= p.start && p.end <= q.end)
            if (wasDeleted) {
              assert(covered, s"deleted uncovered $p (plan=$plan)")
              assert(!plan.contains(p), s"deleted a plan partition $p")
            } else {
              assert(exists(t, p) === true, s"$p neither on disk nor deleted")
            }
          }
          // plan partitions always survive
          plan.foreach(p => assert(exists(t, p)))
      }
      seed = seed.next
      i += 1
    }
  }

  test("grown range supersedes small tiers through the full pipeline") {
    import graft.model.{ExtractConfig, TableConfig}
    import graft.plans.Partitioner
    val src = tmp(); val out = tmp()
    val cfg = ExtractConfig("pruned", "0.0.1", GraphNodeFixture.Subgraph,
      Map(GraphNodeFixture.Table -> TableConfig(Seq(524288L, 32768L))))
    val root = s"$out/pruned/0.0.1"
    val tDir = Partitioner.tableDir(root, GraphNodeFixture.Subgraph,
      GraphNodeFixture.Table)

    // 18500000 yields big [17825792,18350080) then 32768-tiers up to
    // 18481152; the later full run's big [18350080,18874368) covers them
    GraphNodeFixture.write(spark, src, 18500000L)
    val r1 = ExtractPipeline.extract(spark, new ParquetEntitySource(src), cfg, out, 1L)
    val smallTiers1 = r1.tables.head.written.filter(_.size == 32768L)
    assert(smallTiers1.nonEmpty)

    // head advances far enough that a 524288 tier covers earlier 32768s
    GraphNodeFixture.write(spark, src, 19000000L)
    val r2 = ExtractPipeline.extract(spark, new ParquetEntitySource(src), cfg, out, 2L)
    val bigTiers2 = r2.tables.head.written.filter(_.size == 524288L)
    assert(bigTiers2.nonEmpty)
    // every first-run small tier now covered by a big tier is gone...
    val (covered, uncovered) = smallTiers1.partition(p =>
      bigTiers2.exists(b => b.start <= p.start && p.end <= b.end))
    assert(covered.nonEmpty)
    covered.foreach(p => assert(!exists(tDir, p)))
    // ...and nothing the plan still claims was touched
    uncovered.foreach(p => assert(exists(tDir, p)))
    // whole-directory read double-counts nothing
    assert(spark.read.parquet(tDir).count() === 6)
  }
}
