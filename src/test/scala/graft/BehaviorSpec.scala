package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantic invariants for the behavioral-analytics area — value
  * correctness is pinned by the DuckDB oracles (tools/compare.py);
  * these assert the properties that must hold at ANY scale factor. */
class BehaviorSpec extends SparkSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("scd2 versions tile each user's timeline with one open version") {
    val rows = q("scd2_dimension")
      .select("user_id", "valid_from", "valid_to", "is_current", "attr")
      .collect()
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, vs) =>
      val sorted = vs.sortBy(_.getTimestamp(1).getTime)
      // exactly one current (open) version per user, and it is the last
      assert(sorted.count(_.getBoolean(3)) == 1)
      assert(sorted.last.getBoolean(3))
      // consecutive versions abut exactly and never repeat the attribute
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(2) == b.getTimestamp(1))
          assert(a.getString(4) != b.getString(4))
        case _ =>
      }
    }
  }

  test("transition probabilities sum to 1 per source state") {
    val sums = q("evt_transition_matrix")
      .groupBy("src").agg(sum("p").as("total")).collect()
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-4))
    // pair count identity: every user contributes (events - 1) pairs
    val ev = table("events")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    val total = q("evt_transition_matrix").agg(sum("n")).head.getLong(0)
    assert(total == expected)
  }

  test("attribution credits never exceed the purchase count") {
    val purchases = table("events").filter(col("event_type") === "purchase").count()
    val credited = q("evt_attribution_last_touch")
      .agg(sum("conversions")).head.getLong(0)
    assert(credited > 0 && credited <= purchases)
  }

  test("peak concurrency is within [1, events-of-type]") {
    val counts = table("events").groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q("evt_peak_concurrency").collect().foreach { r =>
      val (tpe, peak) = (r.getString(0), r.getLong(1))
      assert(peak >= 1 && peak <= counts(tpe))
    }
  }

  test("cohort offset-0 cell holds the full cohort") {
    val m = q("cohort_retention_matrix").collect()
    val cohortSize = m.filter(_.getInt(1) == 0)
      .map(r => r.getTimestamp(0) -> r.getLong(2)).toMap
    // a later-week active count can never exceed the week-0 cohort
    m.foreach(r => assert(r.getLong(2) <= cohortSize(r.getTimestamp(0))))
    val users = table("events").select("user_id").distinct().count()
    assert(cohortSize.values.sum == users)
  }

  test("mad outliers all clear the modified-z threshold") {
    val rows = q("outlier_mad").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(3)) > 3.49))
  }

  test("seasonal anomalies exceed their hour-of-day threshold") {
    q("ts_seasonal_anomaly").collect().foreach { r =>
      assert(r.getDouble(3) > r.getDouble(4) - 1e-3)
    }
  }

  test("clamped balance equals the replayed max(0, b+x) recurrence") {
    val rows = table("events")
      .filter(col("event_type").isin("purchase", "error"))
      .select("user_id", "ts", "event_id", "event_type", "value")
      .collect().groupBy(_.getLong(0))
    val expected = rows.toSeq.flatMap { case (_, rs) =>
      var b = BigDecimal(0)
      rs.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2))).toSeq.map { r =>
        val x = BigDecimal(r.getDouble(4)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        b = (b + (if (r.getString(3) == "purchase") x else -x)).max(0)
        r.getLong(2) -> b.toDouble
      }
    }.toMap
    val got = q("ts_clamped_balance").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, v) => assert(math.abs(v - expected(id)) < 1e-9, s"event $id") }
  }

  test("top paths are 3-step, ranked by count descending") {
    val r = q("evt_top_paths").collect()
    assert(r.length == 20)
    r.foreach(x => assert(x.getString(0).split(">").length == 3))
    val ns = r.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("A B+ C pattern matching on a hand-traced sequence") {
    import spark.implicits._
    // per key k1: A B B C (match, n_b=2) then B C alone (no A — no match),
    // then A C adjacent (no B — no match), then A B C (match, n_b=1)
    val rows = Seq(
      ("k1", 1L, "A"), ("k1", 2L, "B"), ("k1", 3L, "B"), ("k1", 4L, "C"),
      ("k1", 5L, "B"), ("k1", 6L, "C"),
      ("k1", 7L, "A"), ("k1", 8L, "C"),
      ("k1", 9L, "A"), ("k1", 10L, "B"), ("k1", 11L, "C"),
      ("k2", 1L, "B"), ("k2", 2L, "B")) // run with no anchors — no match
      .toDF("k", "seq", "t")
    val got = graft.operators.PatternMatch.matchABplusC(
        rows, "k", Seq("seq"), "seq",
        isA = col("t") === "A", isB = col("t") === "B", isC = col("t") === "C")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.sortBy(x => (x._1, x._2)).toSeq ===
      Seq(("k1", 1L, 4L, 2L), ("k1", 9L, 11L, 1L)))
  }

  test("3-rise pattern counts match a replayed scan") {
    // replay per user in driver memory at the tiny test SF
    val ev = table("events").select("user_id", "ts", "event_id", "value")
      .collect().groupBy(_.getLong(0))
    val expected = ev.map { case (u, rows) =>
      val vs = rows.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2))).map(_.getDouble(3))
      u -> vs.sliding(3).count(w => w.length == 3 && w(0) < w(1) && w(1) < w(2))
    }.filter(_._2 > 0)
    val got = q("evt_pattern_3rise").collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got == expected)
  }
}
