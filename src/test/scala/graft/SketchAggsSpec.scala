package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Ops

class SketchAggsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("window_funnel: full chain, partial chain, window cut-off") {
    val events = Seq(
      // user 1: full funnel inside window
      (1L, ts("2024-01-01 10:00:00"), 0),
      (1L, ts("2024-01-01 10:10:00"), 1),
      (1L, ts("2024-01-01 10:20:00"), 2),
      // user 2: step1 outside 1h window
      (2L, ts("2024-01-01 10:00:00"), 0),
      (2L, ts("2024-01-01 11:30:00"), 1),
      // user 3: steps out of order only
      (3L, ts("2024-01-01 10:00:00"), 1),
      (3L, ts("2024-01-01 10:10:00"), 0),
      // user 4: no step 0
      (4L, ts("2024-01-01 10:00:00"), 2)
    ).toDF("uid", "ts", "step")
    val r = events.groupBy($"uid")
      .agg(Ops.windowFunnel(3600, $"ts", $"step", 3).as("d"))
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r(1L) === 3)
    assert(r(2L) === 1)
    assert(r(3L) === 1)  // step0 at 10:10 starts a chain of depth 1
    assert(r(4L) === 0)
  }

  test("window_funnel equal timestamps don't satisfy strict order") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 0),
      (1L, ts("2024-01-01 10:00:00"), 1)
    ).toDF("uid", "ts", "step")
    val r = events.groupBy($"uid")
      .agg(Ops.windowFunnel(3600, $"ts", $"step", 2).as("d")).head.getInt(1)
    assert(r === 1)
  }

  test("window_funnel modes: deduplication, fixed, increase (reference semantics)") {
    def funnel(rows: Seq[(Long, String, Int)], mode: Int, steps: Int = 3): Int =
      rows.toDF("uid", "t", "step")
        .selectExpr("uid", "CAST(t AS TIMESTAMP) AS ts", "step")
        .groupBy($"uid")
        .agg(expr(s"window_funnel(3600, ts, step, $steps, $mode)").as("d"))
        .head.getInt(1)

    // deduplication (1): step1 recurs while the chain is live → chain
    // dies at its level so far; later events can't extend it
    val dedupRows = Seq(
      (1L, "2024-01-01 10:00:00", 0), (1L, "2024-01-01 10:05:00", 1),
      (1L, "2024-01-01 10:10:00", 1), // duplicate step1 kills the chain
      (1L, "2024-01-01 10:15:00", 2))
    assert(funnel(dedupRows, 1) === 2) // reached 0,1 before the kill
    assert(funnel(dedupRows, 0) === 3) // default greedy ignores the repeat

    // fixed (2): a leap (step2 before step1) after the chain started →
    // chain dies at its depth so far (1); with no later step0 nothing
    // restarts. Default mode just ignores the out-of-order leap.
    val leapRows = Seq(
      (1L, "2024-01-01 10:00:00", 0), (1L, "2024-01-01 10:05:00", 2),
      (1L, "2024-01-01 10:10:00", 1), (1L, "2024-01-01 10:15:00", 2))
    assert(funnel(leapRows, 2) === 1)
    assert(funnel(leapRows, 0) === 3)
    // a later step0 DOES restart a fixed-mode chain to completion
    val restartRows = leapRows ++ Seq(
      (1L, "2024-01-01 10:20:00", 0), (1L, "2024-01-01 10:25:00", 1),
      (1L, "2024-01-01 10:30:00", 2))
    assert(funnel(restartRows, 2) === 3)

    // increase (4): equal timestamps can't promote
    val eqRows = Seq(
      (1L, "2024-01-01 10:00:00", 0), (1L, "2024-01-01 10:00:00", 1))
    assert(funnel(eqRows, 4, steps = 2) === 1)
    // non-equal still promotes under increase
    val incRows = Seq(
      (1L, "2024-01-01 10:00:00", 0), (1L, "2024-01-01 10:00:01", 1))
    assert(funnel(incRows, 4, steps = 2) === 2)
  }

  test("retention composes bool_or correctly") {
    val events = Seq(
      (1L, "signup"), (1L, "purchase"),
      (2L, "purchase"),
      (3L, "signup")
    ).toDF("uid", "et")
    val r = events.groupBy($"uid")
      .agg(Ops.retention(Seq($"et" === "signup", $"et" === "purchase")).as("r"))
      .select($"uid", $"r" (0), $"r" (1)).collect()
      .map(x => x.getLong(0) -> (x.getBoolean(1), x.getBoolean(2))).toMap
    assert(r(1L) === (true, true))
    assert(r(2L) === (false, false)) // no signup → second cond false too
    assert(r(3L) === (true, false))
  }

  test("approx_top_k is exact below map size and ordered") {
    val words = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c") ++ Seq("d")
    val r = words.toDF("w").agg(Ops.approxTopK($"w", 3).as("t"))
      .select(explode($"t")).select($"col.item", $"col.count")
      .collect().map(x => (x.getString(0), x.getLong(1)))
    assert(r.toSeq === Seq(("a", 50L), ("b", 30L), ("c", 20L)))
  }

  test("bitmap union/count/ops round-trip") {
    val df = Seq(1L, 2L, 3L, 2L, 1L).toDF("v")
    val cnt = df.agg(Ops.bitmapUnionCount($"v")).head.getLong(0)
    assert(cnt === 3)

    val a = Seq(1L, 2L, 3L).toDF("v").agg(Ops.bitmapUnion($"v").as("bm"))
    val b = Seq(2L, 3L, 4L).toDF("v").agg(Ops.bitmapUnion($"v").as("bm"))
    val joined = a.select($"bm".as("a")).crossJoin(b.select($"bm".as("b")))
    val r = joined.select(
      Ops.bitmapCount(Ops.bitmapAnd($"a", $"b")),
      Ops.bitmapCount(Ops.bitmapOr($"a", $"b")),
      Ops.bitmapCount(Ops.bitmapXor($"a", $"b")),
      Ops.bitmapToArray(Ops.bitmapAnd($"a", $"b"))).head
    assert(r.getLong(0) === 2)
    assert(r.getLong(1) === 4)
    assert(r.getLong(2) === 2)
    assert(r.getSeq[Long](3) === Seq(2L, 3L))
  }

  test("bitmap SQL functions registered") {
    val r = spark.sql(
      "SELECT bitmap_count(bitmap_union(to_bitmap(v))) FROM VALUES (1), (2), (2), (5) AS t(v)")
      .head.getLong(0)
    assert(r === 3)
  }

  test("approx_count_distinct within 5% of exact on lineitem") {
    val r = table("lineitem")
      .agg(approx_count_distinct($"l_partkey").as("a"), countDistinct($"l_partkey").as("e"))
      .head
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.05, s"approx $a vs exact $e")
  }

  test("hll sketch agg (Spark builtin, DataSketches) union + estimate") {
    val h = table("lineitem").limit(1000)
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").as("nd"),
        countDistinct($"l_partkey").as("e")).head
    val (a, e) = (h.getLong(0).toDouble, h.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.1)
  }

  test("min_n/max_n: bounded heap, sorted output, null skip, repartition merge") {
    val df = (1 to 1000).map(i => (i % 7, (i * 131) % 997))
      .toDF("g", "v").union(Seq((0, null.asInstanceOf[Integer])).toDF("g", "v"))
      .repartition(8) // force partial buffers through serialize/merge
    val r = df.groupBy($"g")
      .agg(expr("min_n(v, 3)").as("lo"), expr("max_n(v, 3)").as("hi"))
      .collect().map(x => x.getInt(0) -> (x.getSeq[Int](1), x.getSeq[Int](2))).toMap
    val byG = (1 to 1000).map(i => (i % 7, (i * 131) % 997)).groupBy(_._1)
    byG.foreach { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      assert(r(g)._1 === sorted.take(3), s"min_n group $g")
      assert(r(g)._2 === sorted.reverse.take(3), s"max_n group $g")
    }
  }

  test("min_n on strings keeps lexicographic order") {
    val r = Seq("pear", "apple", "fig", "kiwi", "banana").toDF("s")
      .repartition(4)
      .agg(expr("min_n(s, 2)")).head.getSeq[String](0)
    assert(r === Seq("apple", "banana"))
  }

  test("map_agg builds a key-sorted map") {
    val r = Seq(("b", 2), ("a", 1), ("c", 3)).toDF("k", "v")
      .agg(to_json(expr("map_agg(k, v)"))).head.getString(0)
    assert(r === """{"a":1,"b":2,"c":3}""")
  }

  test("intersect_count: overlap across filter values") {
    val df = Seq(
      (1L, "x"), (1L, "y"), (2L, "x"), (3L, "y"), (4L, "x"), (4L, "y"), (4L, "z")
    ).toDF("uid", "tag").repartition(4)
    val r = df.agg(
      expr("intersect_count(uid, tag, 'x', 'y')").as("xy"),
      expr("intersect_count(uid, tag, 'x', 'y', 'z')").as("xyz"),
      expr("intersect_count(uid, tag, 'x', 'nope')").as("xn")).head
    assert(r.getLong(0) === 2)  // uids 1 and 4
    assert(r.getLong(1) === 1)  // uid 4
    assert(r.getLong(2) === 0)
  }

  test("theta: exact at low cardinality, <5% error at 100k, set algebra") {
    val exact = spark.range(1000).toDF("v")
      .agg(expr("ds_theta_count_distinct(v)")).head.getLong(0)
    assert(exact === 1000)
    val big = spark.range(100000).toDF("v")
      .agg(expr("ds_theta_count_distinct(v)")).head.getLong(0)
    assert(math.abs(big - 100000.0) / 100000.0 < 0.05, s"theta estimate $big")
    // A = 0..599, B = 400..999 → |A∪B|=1000, |A∩B|=200, |A\B|=400
    val ops = spark.range(1000).toDF("v").agg(
      expr("ds_theta_sketch_agg(CASE WHEN v < 600 THEN v END)").as("a"),
      expr("ds_theta_sketch_agg(CASE WHEN v >= 400 THEN v END)").as("b"))
      .select(
        expr("ds_theta_estimate(ds_theta_union(a, b))"),
        expr("ds_theta_estimate(ds_theta_intersect(a, b))"),
        expr("ds_theta_estimate(ds_theta_diff(a, b))")).head
    assert(ops.getLong(0) === 1000)
    assert(ops.getLong(1) === 200)
    assert(ops.getLong(2) === 400)
  }

  test("tdigest: storable state, union of partials, bounded rank error") {
    val df = spark.range(1, 100001).toDF("v")
      .withColumn("part", $"v" % 10)
    val partials = df.groupBy($"part").agg(expr("percentile_agg(v)").as("st"))
    val merged = partials.agg(
      expr("percentile_approx_raw(percentile_union(st), 0.5d)").as("p50"),
      expr("percentile_approx_raw(percentile_union(st), 0.99d)").as("p99")).head
    assert(math.abs(merged.getDouble(0) - 50000.0) / 50000.0 < 0.02)
    assert(math.abs(merged.getDouble(1) - 99000.0) / 99000.0 < 0.02)
  }
}
