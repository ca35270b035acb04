package graft.plans

/** One planned output partition: a half-open block interval `[start, end)`
  * produced by a tier of width `size` (so `start % size == 0` and
  * `end == start + size`).
  */
final case class Partition(size: Long, start: Long, end: Long) {
  require(end == start + size, s"partition [$start,$end) must have width $size")

  /** Hive-style relative path under a table directory. Readers get
    * partition-pruning on these keys for free (reference:
    * subgraph_extractor/cli.py:189-197).
    */
  def relativePath: String =
    s"partition_size=$size/start_partition=$start/end_partition=$end"
}

/** Hierarchical range-partition planner.
  *
  * Re-expresses the reference's signature layout algorithm
  * (subgraph_extractor/cli.py:171-186): given a block range `[min, max)`
  * and a set of tier sizes (each smaller size divides the next larger),
  * cover the range with the largest possible aligned partitions first,
  * then cover the remainder with successively smaller tiers. Large
  * immutable history gets few big files; the recent head gets small files
  * that are superseded by bigger tiers as the range grows.
  *
  * Invariants (property-tested, mirroring the reference's hypothesis
  * suite tests/test_partitioning.py):
  *   - contiguity: `plan(i).end == plan(i+1).start`
  *   - sizes are monotonically non-increasing across the plan
  *   - totality: any `0 <= min <= max` and any VALID tier list yields a
  *     (possibly empty) plan without error
  *
  * Tier-list validity is a precondition, not part of totality: every
  * size must be positive and divide the next larger size (the
  * reference's own hypothesis generator only ever produces such lists,
  * test_partitioning.py:7-14 — non-dividing tiers would duplicate
  * blocks across partitions). [[validateTiers]] enforces it; configs are
  * checked at parse time ([[graft.model.ExtractConfig.fromJson]]) so a
  * bad tier list is an upfront config error, never a mid-extract crash.
  *
  * This is pure driver-side planning — partition counts are tiny (one per
  * output file), so no DataFrame is involved. At 100 TB scale the plan
  * stays small because tier sizes grow geometrically with history length.
  */
object Partitioner {

  /** Plan partitions for `[minBlock, maxBlock)`. `None` bounds (unknown
    * catalog range) yield an empty plan, matching cli.py:172-173.
    */
  def plan(
      minBlock: Option[Long],
      maxBlock: Option[Long],
      tierSizes: Seq[Long]): Vector[Partition] = (minBlock, maxBlock) match {
    case (Some(lo), Some(hi)) => plan(lo, hi, tierSizes)
    case _                    => Vector.empty
  }

  /** Tier-list precondition: non-empty, positive, and each size divides
    * the next larger one. The contiguity invariant relies on
    * divisibility (a smaller tier's aligned start then always lands
    * exactly on the previous tier's coverage end); non-dividing tiers —
    * e.g. [10, 3] over [0, 25) — would start the smaller tier BEFORE the
    * cursor and duplicate blocks across partitions. Called at
    * config-parse time so invalid configs fail upfront, and again by
    * [[plan]] as a guard for direct callers.
    */
  def validateTiers(tierSizes: Seq[Long]): Unit = {
    require(tierSizes.nonEmpty, "at least one partition tier size required")
    require(tierSizes.forall(_ > 0), s"tier sizes must be positive: $tierSizes")
    tierSizes.distinct.sorted(Ordering[Long].reverse).sliding(2).foreach {
      case Seq(larger, smaller) =>
        require(larger % smaller == 0,
          s"tier size $smaller must divide the next larger tier $larger " +
            s"(tiers: $tierSizes)")
      case _ => ()
    }
  }

  def plan(minBlock: Long, maxBlock: Long, tierSizes: Seq[Long]): Vector[Partition] = {
    validateTiers(tierSizes)
    val out = Vector.newBuilder[Partition]
    var cursor = minBlock
    tierSizes.distinct.sorted(Ordering[Long].reverse).foreach { size =>
      // Align down: the first partition of a tier may begin before `cursor`
      // (it still only ever contains rows that exist in the source range).
      val firstStart = math.floorDiv(cursor, size) * size
      val endAllowed = math.floorDiv(maxBlock, size) * size
      var start = firstStart
      while (start < endAllowed) {
        out += Partition(size, start, start + size)
        start += size
      }
      if (start > firstStart) cursor = start // tier covered up to here
    }
    out.result()
  }

  /** Incremental work-list: partitions present in `newPlan` but absent from
    * `previousPlan` (reference cli.py:302-313). Plans are driver-sized
    * (one tuple per output file), so a Set difference is correct at any
    * data scale — the data itself never flows through here.
    */
  def worklist(newPlan: Seq[Partition], previousPlan: Seq[Partition]): Vector[Partition] = {
    val existing = previousPlan.toSet
    newPlan.iterator.filterNot(existing).toVector
  }

  /** Absolute location of one partition's parquet directory. The reference
    * writes a single `data.parquet` file (cli.py:189-197); Spark writes a
    * directory of part-files — the Hive-style key=value segments are the
    * compatibility surface, not the leaf file name.
    */
  def partitionDir(tableDir: String, p: Partition): String =
    s"${tableDir.stripSuffix("/")}/${p.relativePath}"

  /** Table directory under the dataset root (cli.py:299-301). */
  def tableDir(outputRoot: String, subgraph: String, table: String): String =
    s"${outputRoot.stripSuffix("/")}/data/subgraph=$subgraph/table=$table"
}
