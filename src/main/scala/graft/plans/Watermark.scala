package graft.plans

import org.apache.hadoop.conf.Configuration
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.sinks.Fs

/** Incremental-extract watermark (reference `latest.yaml`,
  * subgraph_extractor/cli.py:290-294 and 329-339; here JSON).
  *
  * Crash-consistency contract, mirrored exactly from the reference and its
  * regression test (tests/test_get_column_info.py:181-225): the watermark
  * is written ONLY after every table's partitions and `_metadata` have
  * succeeded. A crashed run therefore re-plans from the previous
  * watermark and re-extracts its partitions — at-least-once writes made
  * idempotent by deterministic per-partition content and per-directory
  * overwrite. Progress is never inferred from files on disk.
  */
final case class Watermark(
    subgraph: String,
    deployment: String,
    updatedEpochMillis: Long,
    earliestBlock: Long,
    latestBlock: Long)

object Watermark {
  val FileName = "latest.json"

  def toJson(w: Watermark): String = JsonMethods.pretty(
    JsonMethods.render(
      JObject(
        JField("subgraph", JString(w.subgraph)),
        JField("deployment", JString(w.deployment)),
        JField("updated_epoch_millis", JLong(w.updatedEpochMillis)),
        JField("earliest_block", JLong(w.earliestBlock)),
        JField("latest_block", JLong(w.latestBlock)))))

  def fromJson(s: String): Watermark = {
    val j = JsonMethods.parse(s)
    def str(f: String) = (j \ f) match {
      case JString(v) => v
      case other      => throw new IllegalArgumentException(s"$f: $other")
    }
    def long(f: String) = (j \ f) match {
      case JInt(v)  => v.toLong
      case JLong(v) => v
      case other    => throw new IllegalArgumentException(s"$f: $other")
    }
    Watermark(str("subgraph"), str("deployment"), long("updated_epoch_millis"),
      long("earliest_block"), long("latest_block"))
  }

  def path(outputRoot: String): String = s"${outputRoot.stripSuffix("/")}/$FileName"

  def read(outputRoot: String, conf: Configuration): Option[Watermark] =
    Fs.readString(path(outputRoot), conf).map(fromJson)

  /** The commit point of an extract run — call last. */
  def commit(outputRoot: String, w: Watermark, conf: Configuration): Unit =
    Fs.writeString(path(outputRoot), toJson(w), conf)
}
