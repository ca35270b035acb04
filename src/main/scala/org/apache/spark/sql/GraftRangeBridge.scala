package org.apache.spark.sql

import org.apache.spark.{Partitioner, ShuffleDependency}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.{LogicalRDD, ShuffledRowRDD, UnsafeRowSerializer}
import org.apache.spark.sql.execution.metric.SQLShuffleReadMetricsReporter

import graft.plans.MetaRangeBounds

/** Bridge into Spark's `private[sql]` shuffle machinery: a RANGE
  * repartition with PRECOMPUTED bounds.
  *
  * Spark's own range exchange (`orderBy` / `repartitionByRange`) has no
  * API for caller-supplied bounds — `RangePartitioner` always computes
  * them by reservoir-sampling the child RDD, which EXECUTES THE CHILD
  * TWICE (sample pass + shuffle pass; for a scan-dominated global sort
  * the sample pass costs as much as the sort itself —
  * `bench_out/PLANSTATS_E6_1000x_r15.json`). When the bounds are already
  * known — here, equi-depth boundaries derived from parquet row-group
  * footer stats ([[graft.plans.MetaRangeBounds]]) — the sampling pass is
  * pure waste. This shim assembles the same physical pieces the built-in
  * exchange uses (`UnsafeRowSerializer` → `ShuffleDependency` with a
  * partition-id passthrough → `ShuffledRowRDD`), with the partition id
  * computed per row by binary search over the static bounds array.
  *
  * Output partition `i` holds exactly the keys in
  * `(bounds(i-1), bounds(i)]`, so partitions are RANGE-ORDERED BY INDEX:
  * a downstream `sortWithinPartitions` on the key yields a total global
  * order, same contract as `repartitionByRange(n, key).sortWithin…` —
  * pinned against `orderBy` in `MetaRangeSpec`. Like
  * [[GraftColumnBridge]], this modifies no Spark behavior; it only
  * composes `private[sql]` constructors.
  */
object GraftRangeBridge {

  /** Repartition `df` into `bounds.length + 1` range partitions on the
    * integral column `keyCol` (LongType or IntegerType) without a
    * sampling pass. `bounds` must be strictly increasing.
    */
  def repartitionByPrecomputedRange(df: DataFrame, keyCol: String,
      bounds: Array[Long]): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    val qe = df.queryExecution
    val attrs = qe.analyzed.output
    val ordinal = df.schema.fieldIndex(keyCol)
    val isInt = df.schema(ordinal).dataType ==
      org.apache.spark.sql.types.IntegerType
    val n = bounds.length + 1
    val withPid: RDD[Product2[Int, InternalRow]] =
      qe.toRdd.mapPartitions { iter =>
        iter.map { row =>
          // getLong on a null field reads undefined bytes and would
          // scatter the row silently — nulls are a contract violation
          // (MetaRangeBounds.statsFor rejects inputs whose row groups
          // report any nulls), so fail loudly if one slips through
          if (row.isNullAt(ordinal))
            throw new IllegalStateException(
              s"repartitionByPrecomputedRange: NULL in key column " +
                s"'$keyCol' — precomputed range bounds require a " +
                "null-free key")
          val k = if (isInt) row.getInt(ordinal).toLong
                  else row.getLong(ordinal)
          (MetaRangeBounds.partitionFor(bounds, k), row.copy())
        }
      }
    val dep = new ShuffleDependency[Int, InternalRow, InternalRow](
      withPid,
      new Partitioner {
        override def numPartitions: Int = n
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      },
      new UnsafeRowSerializer(attrs.length))
    val shuffled = new ShuffledRowRDD(dep,
      SQLShuffleReadMetricsReporter.createShuffleReadMetrics(
        spark.sparkContext))
    classic.Dataset.ofRows(spark, LogicalRDD(attrs, shuffled)(spark))
  }
}
