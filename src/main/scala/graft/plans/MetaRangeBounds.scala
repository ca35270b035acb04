package graft.plans

import org.apache.hadoop.conf.Configuration

/** Equi-depth range bounds for an integral column, computed from parquet
  * ROW-GROUP FOOTER STATISTICS alone — no Spark job, no data read.
  *
  * Why this exists: Spark's range partitioning (`orderBy`,
  * `repartitionByRange`) computes its bounds by SAMPLING the child plan,
  * which means the child executes twice — once for the reservoir sample,
  * once for the real shuffle. For a global sort over a scan-dominated
  * frame that doubles the query (measured: the e6 cast matrix's sampling
  * stage cost ~30k task-seconds vs the real sort stage's ~22k at the
  * 1000× replica, `bench_out/PLANSTATS_E6_1000x_r15.json`). Parquet
  * footers already carry per-row-group (min, max, rowCount) for every
  * column, which is enough to place equi-depth boundaries without
  * touching a single data page: treat each row group as a uniform
  * distribution over its [min, max], slice it into sub-points, and walk
  * the merged histogram emitting a boundary at every crossing of
  * total/n. The uniform-within-group assumption is exactly the error a
  * RANGE of row groups averages out; boundary placement only steers
  * partition SIZES (correctness needs just monotone bounds — binary
  * search sends equal keys to one partition whatever the bounds are).
  *
  * Returns None when any row group lacks stats for the column (ancient
  * writer, NaN-ish types) — callers fall back to the sampling path.
  */
object MetaRangeBounds {

  /** Minimum per-row-group histogram slices. The REAL slice count
    * scales with the asked partition count (2× numPartitions per
    * group): when a table is HASH-distributed on the bounds column,
    * every row group spans the same global [min, max] and coinciding
    * groups add NO resolution — with a fixed 8 slices the merged
    * histogram holds ~8 distinct positions however many groups exist,
    * and a 340-partition ask collapses onto ~8 effective boundaries
    * (measured on the 1000× replica: bounds came out as consecutive
    * longs clustered at the 8 slice positions). 2× the ask per group
    * keeps equi-depth resolution even in the fully-coinciding case,
    * and the driver-side walk stays trivial (192 groups × 680 points
    * ≈ 130k tuples for the worst real ask).
    */
  private val SlicesPerGroup = 8

  def boundsFor(conf: Configuration, path: String, column: String,
      numPartitions: Int): Option[Array[Long]] = {
    if (numPartitions <= 1) return Some(Array.empty)
    val groups = statsFor(conf, path, column).getOrElse(return None)
    if (groups.isEmpty) return None
    val totalRows = groups.iterator.map(_._3).sum
    if (totalRows <= 0L) return Some(Array.empty)
    // merged fine histogram: (value, weight) sub-points, uniform within
    // each group's [min, max]
    val slices = math.max(SlicesPerGroup, 2 * numPartitions)
    val points = groups.flatMap { case (min, max, rows) =>
      val w = rows.toDouble / slices
      (0 until slices).map { j =>
        val frac = (2 * j + 1).toDouble / (2 * slices)
        // double-space interpolation: (max - min) as a long can overflow
        // when the column spans most of the long range
        ((min + (max.toDouble - min.toDouble) * frac).toLong, w)
      }
    }.sortBy(_._1)
    val target = totalRows.toDouble / numPartitions
    val bounds = scala.collection.mutable.ArrayBuffer.empty[Long]
    var cum = 0.0
    var nextCut = target
    points.foreach { case (v, w) =>
      cum += w
      // one boundary per crossed cut; a value hot enough to span several
      // cuts emits once (bounds must be strictly increasing for binary
      // search), merging the partitions it would have split
      while (cum >= nextCut && bounds.length < numPartitions - 1) {
        if (bounds.isEmpty || bounds.last < v) bounds += v
        nextCut += target
      }
    }
    Some(bounds.toArray)
  }

  /** Partition index for a key against strictly increasing bounds:
    * the count of bounds < key — partition i holds keys in
    * (bounds(i-1), bounds(i)]. Equal keys always land together, so a
    * boundary can never split a sort-key group across partitions.
    */
  def partitionFor(bounds: Array[Long], key: Long): Int = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) < key) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** (min, max, rows) of `column` per row group, or None when any group
    * lacks usable stats.
    */
  private def statsFor(conf: Configuration, path: String,
      column: String): Option[Seq[(Long, Long, Long)]] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val rootStr = fs.makeQualified(root).toString
    val out = Seq.newBuilder[(Long, Long, Long)]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      val rel = st.getPath.toString.stripPrefix(rootStr).stripPrefix("/")
      val hidden = rel.split("/")
        .exists(c => c.startsWith("_") || c.startsWith("."))
      if (st.isFile && st.getLen > 0 && !hidden) {
        val footer =
          try org.apache.parquet.hadoop.ParquetFileReader.readFooter(
            conf, st.getPath,
            org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
          catch { case scala.util.control.NonFatal(_) => return None }
        footer.getBlocks.forEach { block =>
          val chunk = block.getColumns.stream()
            .filter(c => c.getPath.toDotString == column)
            .findFirst().orElse(null)
          if (chunk == null) return None
          val stats = chunk.getStatistics
          if (stats == null || !stats.hasNonNullValue) return None
          // a NULL key would read undefined bytes in the bridge's
          // row.getLong and scatter across partitions — any row group
          // holding nulls disqualifies the footer path (caller falls
          // back to Spark's sampling-based range partitioning)
          if (!stats.isNumNullsSet || stats.getNumNulls > 0) return None
          val (mn, mx) = (stats.genericGetMin, stats.genericGetMax) match {
            case (a: java.lang.Long, b: java.lang.Long) =>
              (a.longValue, b.longValue)
            case (a: java.lang.Integer, b: java.lang.Integer) =>
              (a.longValue, b.longValue)
            case _ => return None
          }
          out += ((mn, mx, block.getRowCount))
        }
      }
    }
    val groups = out.result()
    if (groups.isEmpty) None else Some(groups)
  }
}
