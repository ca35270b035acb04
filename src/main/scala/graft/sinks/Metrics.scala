package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Single-pass data-quality metrics via Spark's `observe` API.
  *
  * A production pipeline wants every emitted dataset validated — row
  * counts, value sums, null tallies — but a separate validation
  * aggregation re-reads what was just written (at 100 TB, a second full
  * scan). `observe` attaches the metric aggregates to the WRITE plan
  * itself: they are computed by the same tasks that produce the output
  * rows and surface on the driver after the action, for exactly zero
  * extra passes. The natural consumers here are the extract sink (rows
  * per partition into `_metadata`-adjacent bookkeeping) and the corpus
  * emission step (token/doc tallies for the training-run manifest).
  */
object Metrics {

  /** Attach named metric columns to `df`. The returned [[Observation]]
    * yields the metric row (`obs.get`) after the frame's first action —
    * the caller runs the write, then reads the metrics. Metric
    * expressions must be aggregates over the frame's columns
    * (`count`, `sum`, `count_if(x IS NULL)`, ...).
    */
  def observed(df: DataFrame, name: String,
      first: Column, rest: Column*): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, first, rest: _*), obs)
  }
}
