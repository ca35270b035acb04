package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pivot/unpivot reshape pair: the wide matrix is a total function of
  * (day × type), and melting it back is the identity on the dense form.
  */
class ReshapeSpec extends AnyFunSuite with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val model: Map[(Long, String), Long] =
    graft.sources.Tables.events(spark, sf)
      .selectExpr("ts_ns div 86400000000000 as day", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap

  test("pivot cells match per-(day, type) counts; absent cells are 0") {
    val rows = EventAnalytics.pivotDaily(spark, sf).collect()
    val days = model.keys.map(_._1).toSet
    assert(rows.map(_.getLong(0)).toSet === days)
    rows.foreach { r =>
      val day = r.getLong(0)
      EventAnalytics.EventTypes.zipWithIndex.foreach { case (t, i) =>
        assert(r.getLong(i + 1) === model.getOrElse((day, t), 0L),
          s"cell ($day, $t)")
      }
    }
  }

  test("merge classifies by key presence, even with NULL payloads") {
    import spark.implicits._
    val base = Seq((1L, Some(10L)), (2L, Some(20L)), (6L, None: Option[Long]))
      .toDF("doc_id", "base_chars")
    val inc = Seq((2L, None: Option[Long]), (3L, Some(37L)), (6L, Some(66L)))
      .toDF("doc_id", "new_chars")
    val got = EventAnalytics.mergeFrames(base, inc).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(got.toSeq === Seq(
      (1L, "keep", Some(10L)),   // base-only survives
      (2L, "update", None),      // matched: NULL incoming payload WINS
      (3L, "insert", Some(37L)), // incoming-only inserts
      (6L, "update", Some(66L)))) // NULL base payload still an update
  }

  test("unpivot is the identity on the dense matrix") {
    val long = EventAnalytics.unpivotDaily(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
    val days = model.keys.map(_._1).toSet
    assert(long.length === days.size * EventAnalytics.EventTypes.size)
    long.foreach { case ((day, t), n) =>
      assert(n === model.getOrElse((day, t), 0L), s"cell ($day, $t)")
    }
  }

  test("event transitions match a driver session-walk model") {
    val gapNs = 30L * 60 * 1000000000L
    val events = graft.sources.Tables.events(spark, sf)
      .select("user_id", "ts_ns", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val transitions = events.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._2, e._3))
      // split into sessions at >30 min gaps, then take adjacent pairs
      val sessions = ordered.foldLeft(Vector.empty[Vector[(Long, Long, Long, String)]]) {
        case (acc, e) =>
          if (acc.isEmpty || e._2 - acc.last.last._2 > gapNs) acc :+ Vector(e)
          else acc.init :+ (acc.last :+ e)
      }
      sessions.flatMap(s => s.zip(s.drop(1)).map { case (a, b) => (a._4, b._4) })
    }
    val counts = transitions.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fromTotals = transitions.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = EventAnalytics.eventTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet === counts.keySet)
    got.foreach { case ((f, t), (n, p)) =>
      assert(n === counts((f, t)), s"transition $f -> $t count")
      assert(p === n * 1000000L / fromTotals(f), s"transition $f -> $t prob")
    }
    // per-from probabilities must nearly sum to 1e6 (floor-division slack)
    got.toSeq.groupBy(_._1._1).foreach { case (f, xs) =>
      val sum = xs.map(_._2._2).sum
      assert(sum <= 1000000L && sum > 1000000L - xs.size,
        s"from $f: probabilities sum to $sum")
    }
  }

  test("decay score matches a driver shift model and never exceeds raw") {
    val events = graft.sources.Tables.events(spark, sf)
      .selectExpr("user_id", "ts_ns",
        "cast(cast(value as decimal(18,2)) * 100 as bigint) as cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ref = events.map(_._2).max
    // sign-aware shift toward zero, matching the operator's contract
    def decay(c: Long, k: Int): Long = if (c >= 0) c >> k else -((-c) >> k)
    val expected = events.groupBy(_._1).map { case (u, evs) =>
      val decayed = evs.map { case (_, ts, c) =>
        decay(c, math.min((ref - ts) / 604800000000000L, 62L).toInt)
      }.sum
      u -> ((evs.length.toLong, evs.map(_._3).sum, decayed))
    }
    val got = EventAnalytics.decayScore(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expected)
    got.values.foreach { case (_, raw, dec) =>
      assert(math.abs(dec) <= math.abs(raw) || raw < 0 && dec >= raw,
        "decay must move toward zero, not grow")
    }
    // the sign-aware shift itself: negative amounts decay to zero too
    assert(decay(-1L, 5) === 0L && decay(-100L, 62) === 0L && decay(100L, 62) === 0L)
    // the 30-day fixture spans >1 week, so decay must actually bite
    assert(got.values.exists { case (_, raw, dec) => dec < raw })
  }
}
