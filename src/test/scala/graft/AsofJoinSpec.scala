package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    ("A", ts("2024-01-01 10:00:00"), 100.0),
    ("A", ts("2024-01-01 10:05:00"), 101.0),
    ("A", ts("2024-01-01 10:10:00"), 102.0),
    ("B", ts("2024-01-01 10:02:00"), 50.0)
  ).toDF("sym", "qts", "price")

  private val trades = Seq(
    ("A", ts("2024-01-01 10:03:00"), 1L),  // matches 10:00 quote
    ("A", ts("2024-01-01 10:05:00"), 2L),  // equal ts matches 10:05
    ("A", ts("2024-01-01 09:59:00"), 3L),  // before any quote → null
    ("B", ts("2024-01-01 11:00:00"), 4L),  // matches B 10:02
    ("C", ts("2024-01-01 10:00:00"), 5L)   // no right key → null
  ).toDF("sym", "tts", "trade_id")

  test("backward asof picks latest earlier-or-equal right row") {
    val r = AsofJoin.asof(trades, quotes, Seq("sym"), "tts", "qts")
      .select($"trade_id", $"price").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) null else x.getDouble(1))).toMap
    assert(r(1L) === 100.0)
    assert(r(2L) === 101.0)
    assert(r(3L) == null)
    assert(r(4L) === 50.0)
    assert(r(5L) == null)
  }

  test("forward asof picks earliest later-or-equal right row") {
    val r = AsofJoin.asof(trades, quotes, Seq("sym"), "tts", "qts", direction = "forward")
      .select($"trade_id", $"price").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) null else x.getDouble(1))).toMap
    assert(r(1L) === 101.0)   // next quote at 10:05
    assert(r(2L) === 101.0)   // equal ts
    assert(r(3L) === 100.0)   // first quote after 09:59
    assert(r(4L) == null)     // no B quote after 11:00
  }

  test("tolerance nulls out matches outside the window") {
    val r = AsofJoin.asof(trades, quotes, Seq("sym"), "tts", "qts",
        toleranceSeconds = Some(120))
      .select($"trade_id", $"price").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) null else x.getDouble(1))).toMap
    assert(r(1L) == null)     // 10:03 vs 10:00 = 180s > 120s
    assert(r(2L) === 101.0)   // exact match, 0s
    assert(r(4L) == null)     // 58 min away
  }

  test("inner drops unmatched left rows") {
    val n = AsofJoin.asof(trades, quotes, Seq("sym"), "tts", "qts", joinType = "inner").count()
    assert(n === 3)
  }

  test("left row count is always preserved for left join") {
    val n = AsofJoin.asof(trades, quotes, Seq("sym"), "tts", "qts").count()
    assert(n === trades.count())
  }

  test("duplicate right timestamps: one match per left row") {
    val dupQuotes = quotes.union(Seq(("A", ts("2024-01-01 10:00:00"), 999.0)).toDF("sym", "qts", "price"))
    val n = AsofJoin.asof(trades, dupQuotes, Seq("sym"), "tts", "qts").count()
    assert(n === trades.count())
  }

  test("inner keeps matched rows whose right payload is all NULL") {
    // right row exists (qts matches) but its only payload value is NULL —
    // regression for the any-non-null match inference that dropped these
    val nullQuotes = Seq(("A", ts("2024-01-01 10:00:00"), Option.empty[Double]))
      .toDF("sym", "qts", "price")
    val r = AsofJoin.asof(trades.filter($"sym" === "A"), nullQuotes,
      Seq("sym"), "tts", "qts", joinType = "inner")
    // trades at 10:03 and 10:05 match the 10:00 quote (null price); 09:59 doesn't
    assert(r.count() === 2)
    assert(r.select($"price").collect().forall(_.isNullAt(0)))
  }

  test("null join keys match nothing (SQL semantics, not partition-grouping)") {
    val lNull = Seq((Option.empty[String], ts("2024-01-01 10:05:00"), 7L))
      .toDF("sym", "tts", "trade_id")
    val rNull = Seq((Option.empty[String], ts("2024-01-01 10:00:00"), 77.0))
      .toDF("sym", "qts", "price")
    val left = AsofJoin.asof(lNull, quotes.union(rNull), Seq("sym"), "tts", "qts")
    assert(left.count() === 1 && left.select($"price").head.isNullAt(0))
    val inner = AsofJoin.asof(lNull, quotes.union(rNull), Seq("sym"), "tts", "qts",
      joinType = "inner")
    assert(inner.count() === 0)
  }

  test("tolerance boundary is inclusive") {
    // trade at 10:03, quote at 10:00 → exactly 180 s
    val one = trades.filter($"trade_id" === 1L)
    val atBoundary = AsofJoin.asof(one, quotes, Seq("sym"), "tts", "qts",
      toleranceSeconds = Some(180)).select($"price").head
    assert(atBoundary.getDouble(0) === 100.0)
    val justUnder = AsofJoin.asof(one, quotes, Seq("sym"), "tts", "qts",
      toleranceSeconds = Some(179)).select($"price").head
    assert(justUnder.isNullAt(0))
  }

  test("colliding right column names get the rightSuffix") {
    val qSame = quotes.withColumnRenamed("qts", "tts")
    val r = AsofJoin.asof(trades, qSame, Seq("sym"), "tts", "tts")
    assert(r.columns.count(_ == "tts") === 1)
    assert(r.columns.contains("tts_r"))
    val row = r.filter($"trade_id" === 1L).select($"tts_r").head
    assert(row.getTimestamp(0) === ts("2024-01-01 10:00:00"))
  }

  test("nearest asof picks the closer side, ties to backward") {
    // trade 1 at 10:03: backward 10:00 (180 s) vs forward 10:05 (120 s) → forward
    // trade 2 at 10:05: exact match, dt = 0 → that quote
    // trade 3 at 09:59: only forward exists → 10:00
    // trade 4 (B) at 11:00: only backward exists → 50.0
    // trade 5 (C): no right rows → null
    val r = AsofJoin.asofNearest(trades, quotes, Seq("sym"), "tts", "qts")
      .select($"trade_id", $"price").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) null else x.getDouble(1))).toMap
    assert(r(1L) === 101.0)
    assert(r(2L) === 101.0)
    assert(r(3L) === 100.0)
    assert(r(4L) === 50.0)
    assert(r(5L) == null)
  }

  test("nearest asof: exact tie between sides goes to the earlier row") {
    val mid = Seq(("A", ts("2024-01-01 10:02:30"), 9L)).toDF("sym", "tts", "trade_id")
    val r = AsofJoin.asofNearest(mid, quotes, Seq("sym"), "tts", "qts")
      .select($"price").head
    assert(r.getDouble(0) === 100.0) // 150 s both ways → backward (10:00)
  }

  test("nearest asof honors tolerance and inner join type") {
    val far = Seq(("A", ts("2024-01-01 12:00:00"), 7L)).toDF("sym", "tts", "trade_id")
    val left = AsofJoin.asofNearest(far, quotes, Seq("sym"), "tts", "qts",
      toleranceSeconds = Some(600))
    assert(left.count() === 1 && left.select($"price").head.isNullAt(0))
    val inner = AsofJoin.asofNearest(far, quotes, Seq("sym"), "tts", "qts",
      joinType = "inner", toleranceSeconds = Some(600))
    assert(inner.count() === 0)
  }

  test("jaro_winkler matches the published worked examples") {
    import org.apache.spark.sql.functions.expr
    val r = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"),
      ("DIXON", "DICKSONX"), ("same", "same"), ("", "x"))
      .toDF("a", "b")
      .select(expr("round(jaro_winkler(a, b), 6)")).collect().map(_.getDouble(0))
    assert(r.toSeq === Seq(0.961111, 0.84, 0.813333, 1.0, 0.0))
  }
}
