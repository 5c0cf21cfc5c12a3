package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, CountMin, Ops}
import util._

/** Custom aggregate + temporal operator surface: window_funnel,
  * retention, approx_top_k, bitmap_*, sum_map, histogram, ASOF join,
  * Mann-Whitney U (reference kernels cited in the implementing
  * classes; MW: `be/src/exprs/agg/mann_whitney.h`).
  */
object Sketches extends graft.QueryArea {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // funnel signup → purchase → share within 7 days, per user; then
    // distribution of depths
    // Count-min join-size estimation (the CBO cardinality probe):
    // sketch orders and lineitem on the join key, estimate
    // |orders ⋈ lineitem| from the sketch inner product, and emit the
    // exact size beside it — with 4096-wide rows and ~1.5k keys the
    // estimate is EXACT, so the oracle pins both columns equal.
    "sketch_join_estimate" -> ((spark, dir) => {
      val so = CountMin.build(
        t(spark, dir, "orders").filter(col("o_orderkey") % 149 === 0),
        "o_orderkey", depth = 5, width = 16384)
      val sl = CountMin.build(
        t(spark, dir, "lineitem").filter(col("l_orderkey") % 149 === 0)
          .withColumnRenamed("l_orderkey", "o_orderkey"),
        "o_orderkey", depth = 5, width = 16384)
      CountMin.innerProduct(so, sl)
    }),
    // Benford first-digit conformance (fraud screening): observed
    // leading-digit distribution of order totals vs the Benford
    // expectation (pinned 6-dp literals so both engines use identical
    // constants), per-digit chi-square terms DECIMAL-routed.
    "stat_benford" -> ((spark, dir) => sqlq(spark, dir)(benfordSql)),
    // Two-proportion A/B z-test: deterministic hash split of users
    // into variants, conversion = any purchase; z from the pooled-
    // variance formula in IEEE double over exact integer counts —
    // the experiment-analysis report shape.
    "stat_ab_test" -> ((spark, dir) => {
      val perUser = t(spark, dir, "events")
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
        .withColumn("variant",
          when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B"))
      val cells = perUser.groupBy("variant")
        .agg(count(lit(1)).as("n"), sum("conv").cast("long").as("x"))
      val wide = cells.groupBy()
        .pivot("variant", Seq("A", "B"))
        .agg(first("n").as("n"), first("x").as("x"))
        .select(col("A_n"), col("A_x"), col("B_n"), col("B_x"))
      wide.select(col("A_n"), col("A_x"), col("B_n"), col("B_x"), {
        val (na, xa) = (col("A_n").cast("double"), col("A_x").cast("double"))
        val (nb, xb) = (col("B_n").cast("double"), col("B_x").cast("double"))
        val (pa, pb) = (xa / na, xb / nb)
        val pool = (xa + xb) / (na + nb)
        round((pa - pb) / sqrt(pool * (lit(1.0) - pool) *
          (lit(1.0) / na + lit(1.0) / nb)), 6).as("z")
      })
    }),
    // Chi-square test of independence (event_type × 6-hour band
    // contingency): expected counts from window-summed marginals over
    // the TINY cell table, per-cell terms routed through DECIMAL so
    // the statistic is merge-order stable. Companion to mann_whitney
    // in the hypothesis-testing family.
    "stat_chi_square" -> ((spark, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val cells = t(spark, dir, "events")
        .select(col("event_type"),
          floor(hour(col("ts")) / 6.0).cast("int").as("band"))
        .groupBy("event_type", "band").agg(count(lit(1)).as("o"))
      val tot = cells
        .withColumn("rt", sum("o").over(w.partitionBy("event_type")))
        .withColumn("ct", sum("o").over(w.partitionBy("band")))
        .withColumn("nn", sum("o").over(w.partitionBy()))
      val e = col("rt").cast("double") * col("ct") / col("nn")
      tot.select((((col("o") - e) * (col("o") - e)) / e)
          .cast("decimal(28,12)").as("term"),
          col("event_type"), col("band"))
        .agg(round(sum("term").cast("double"), 6).as("chi2"),
          ((countDistinct("event_type") - 1) *
            (countDistinct("band") - 1)).cast("int").as("dof"))
    }),
    // Count-min sketch point estimates (operators/CountMin.scala):
    // depth 5 × width 4096 over per-event user occurrences. With 150
    // distinct keys the chance any key collides with another in ALL 5
    // hash rows is ~1e-14, so every estimate equals the exact count
    // and the oracle is the exact GROUP BY — an exactness the gate
    // VERIFIES rather than assumes (a hash/merge regression shows up
    // as an inflated estimate and a hash mismatch).
    "sketch_count_min" -> ((spark, dir) => {
      val ev = t(spark, dir, "events")
      val sk = CountMin.build(ev, "user_id", depth = 5, width = 4096)
      CountMin.estimate(sk, ev.select("user_id").distinct(), "user_id",
          depth = 5, width = 4096)
        .orderBy("user_id")
    }),
    "funnel_events" -> ((spark, dir) => {
      val e = t(spark, dir, "events")
      val step = when(col("event_type") === "signup", 0)
        .when(col("event_type") === "click", 1)
        .when(col("event_type") === "purchase", 2)
        .otherwise(-1)
      e.groupBy(col("user_id"))
        .agg(Ops.windowFunnel(7L * 86400, col("ts"), step, 3).as("depth"))
        .groupBy(col("depth"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("depth"))
    }),
    "retention_events" -> ((spark, dir) => {
      val e = t(spark, dir, "events")
      e.groupBy(col("user_id"))
        .agg(Ops.retention(Seq(
          col("event_type") === "signup",
          col("event_type") === "purchase",
          col("event_type") === "error")).as("r"))
        .select(col("user_id"), col("r")(0).as("r0"), col("r")(1).as("r1"), col("r")(2).as("r2"))
        .orderBy(col("user_id"))
    }),
    "approx_top_k_words" -> ((spark, dir) => {
      val d = t(spark, dir, "documents")
      d.select(explode(split(col("text"), " ")).as("word"))
        .agg(Ops.approxTopK(col("word"), 10, 4096).as("top"))
        .select(explode(col("top")).as("e"))
        .select(col("e.item").as("item"), col("e.count").as("cnt"))
        .orderBy(col("cnt").desc, col("item"))
    }),
    "bitmap_distinct" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(Ops.bitmapUnionCount(col("l_partkey")).as("nd_part_bitmap"),
          countDistinct(col("l_partkey")).as("nd_part_exact"))
        .orderBy(col("l_returnflag"))
    }),
    "bitmap_ops" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
      val byFlag = li.groupBy(col("l_returnflag"))
        .agg(Ops.bitmapUnion(col("l_partkey")).as("bm"))
      val a = byFlag.filter(col("l_returnflag") === "A").select(col("bm").as("bm_a"))
      val r = byFlag.filter(col("l_returnflag") === "R").select(col("bm").as("bm_r"))
      a.crossJoin(r).select(
        Ops.bitmapCount(Ops.bitmapAnd(col("bm_a"), col("bm_r"))).as("n_and"),
        Ops.bitmapCount(Ops.bitmapOr(col("bm_a"), col("bm_r"))).as("n_or"),
        Ops.bitmapCount(Ops.bitmapXor(col("bm_a"), col("bm_r"))).as("n_xor"))
    }),
    // bitmap scalar extensions (reference bitmap_functions.cpp:
    // sub_bitmap, bitmap_min/max/contains, bitmap_andnot)
    "bitmap_scalar_ops" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(Ops.bitmapUnion(col("l_partkey")).as("bm"))
        .select(col("l_returnflag"),
          expr("bitmap_min(bm)").as("mn"),
          expr("bitmap_max(bm)").as("mx"),
          expr("bitmap_contains(bm, 1)").as("has1"),
          expr("bitmap_count(sub_bitmap(bm, 0, 100))").as("first100"),
          expr("bitmap_count(sub_bitmap(bm, -50, 50))").as("last50"),
          expr("bitmap_count(bitmap_andnot(bm, bm))").as("self_diff"),
          expr("bitmap_has_any(bm, bm)").as("self_any"))
        .orderBy(col("l_returnflag"))
    }),
    // bitmap text round-trip + intersect agg (reference
    // bitmap_functions.cpp from/to_string, agg/bitmap_intersect.h)
    "bitmap_text_roundtrip" -> ((spark, dir) => sqlq(spark, dir)(
      """WITH per AS (
        |  SELECT o_orderstatus, bitmap_union(to_bitmap(o_custkey)) AS bm
        |  FROM orders GROUP BY 1)
        |SELECT
        |  bitmap_count(bitmap_intersect(bm)) AS n_all_status,
        |  bitmap_to_string(bitmap_remove(bitmap_from_string('1,2,3,4,5'), 3)) AS removed,
        |  bitmap_count(array_to_bitmap(array(1L, 2L, 3L, 2L))) AS arr_cnt,
        |  bitmap_count(bitmap_empty()) AS empty_cnt
        |FROM per""".stripMargin)),
    // unnest_bitmap / subdivide_bitmap TVFs (reference:
    // be/src/exprs/table_function/unnest_bitmap.h, subdivide_bitmap.h):
    // bitmap → rows via bitmap_to_array + explode; subdivide = bucket
    // elements into fixed-size chunks scan-side.
    "tvf_unnest_bitmap" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem").filter(col("l_orderkey") % 97 === 0)
      li.groupBy(col("l_returnflag"))
        .agg(Ops.bitmapUnion(col("l_partkey")).as("bm"))
        .select(col("l_returnflag"), explode(expr("bitmap_to_array(bm)")).as("pk"))
        .orderBy(col("l_returnflag"), col("pk"))
    }),
    "tvf_subdivide_bitmap" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem").filter(col("l_orderkey") % 97 === 0)
      li.groupBy(col("l_returnflag"))
        .agg(Ops.bitmapUnion(col("l_partkey")).as("bm"))
        // arr projected as an attribute so the chunking lambda doesn't
        // re-decode the bitmap per chunk (interpreted-HOF rule)
        .select(col("l_returnflag"), expr("bitmap_to_array(bm)").as("arr"))
        .select(col("l_returnflag"),
          posexplode(expr("transform(sequence(0, cast(ceil(size(arr) / 100.0) as int) - 1), " +
            "i -> slice(arr, i * 100 + 1, 100))")))
        .select(col("l_returnflag"), col("pos").as("chunk_idx"),
          size(col("col")).as("chunk_size"),
          col("col")(0).as("first_pk"))
        .orderBy(col("l_returnflag"), col("chunk_idx"))
    }),
    "sum_map_events" -> ((spark, dir) => {
      val e = t(spark, dir, "events")
      val mapped = e.select(col("user_id"),
        map(col("event_type"), col("value").cast("decimal(18,6)")).as("m"))
      Ops.sumMap(mapped, Seq("user_id"), "m")
        .select(col("user_id"),
          to_json(transform_values(col("sum_map"), (_, v) => v.cast("double"))).as("sums"))
        .orderBy(col("user_id"))
    }),
    "histogram_prices" -> ((spark, dir) => {
      Ops.histogram(t(spark, dir, "orders"), "o_totalprice", 10, 0.0, 400000.0)
        .select(col("bucket"), col("n"), col("bucket_lo"),
          col("lo_seen"), col("hi_seen"))
    }),
    // ASOF backward: each purchase matched to the user's latest prior signup
    "asof_backward" -> ((spark, dir) => {
      val e = t(spark, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val signups = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("signup_ts"), col("event_id").as("signup_id"))
      AsofJoin.asof(purchases, signups, Seq("user_id"), "ts", "signup_ts",
          direction = "backward", joinType = "left")
        .select(col("event_id"), col("user_id"), col("signup_id"))
        .orderBy(col("event_id"))
    }),
    // ASOF forward: each signup matched to the user's next error event
    "asof_forward" -> ((spark, dir) => {
      val e = t(spark, dir, "events")
      val signups = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id"))
      val errors = e.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts").as("err_ts"), col("event_id").as("err_id"))
      AsofJoin.asof(signups, errors, Seq("user_id"), "ts", "err_ts",
          direction = "forward", joinType = "left")
        .select(col("event_id"), col("user_id"), col("err_id"))
        .orderBy(col("event_id"))
    }),
    // ASOF NEAREST (AsofJoin.asofNearest): each purchase matched to
    // the time-closest click of the same user in EITHER direction,
    // ties to the earlier side — both frames computed in one window
    // pass; the oracle recomputes via join + row_number argmin
    "asof_nearest" -> ((spark, dir) => {
      val e = t(spark, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      AsofJoin.asofNearest(purchases, clicks, Seq("user_id"), "ts", "click_ts")
        .select(col("event_id"), col("user_id"), col("click_id"))
        .orderBy(col("event_id"))
    }),
    // intersect_count (reference be/src/exprs/agg/intersect_count.h):
    // audience overlap — customers with BOTH an O and an F order — in
    // one aggregation pass over per-status bitmaps
    "agg_intersect_count" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
      o.agg(
        expr("intersect_count(o_custkey, o_orderstatus, 'O', 'F')").as("n_both"),
        expr("intersect_count(o_custkey, o_orderstatus, 'O', 'F', 'P')").as("n_all3"))
    }),
    // theta sketch distinct counts (reference
    // be/src/exprs/agg/ds_theta_count_distinct.h). lgK=14 ⇒ exact mode
    // at gate cardinalities, so the count(DISTINCT) oracle hash-matches.
    "agg_theta_distinct" -> ((spark, dir) => {
      val c = t(spark, dir, "customer")
      c.groupBy(col("c_mktsegment"))
        .agg(expr("ds_theta_count_distinct(c_nationkey)").as("nd_nation"),
          expr("ds_theta_count_distinct(c_custkey)").as("nd_cust"),
          countDistinct(col("c_custkey")).as("nd_cust_exact"))
        .orderBy(col("c_mktsegment"))
    }),
    // theta set algebra — union/intersection/difference over stored
    // sketches (difference is what HLL cannot do), plus a union_agg
    // roll-up of per-nation sketches to a global count
    "theta_sketch_ops" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
      val sk = o.agg(
        expr("ds_theta_sketch_agg(CASE WHEN o_orderstatus = 'O' THEN o_custkey END)").as("sk_o"),
        expr("ds_theta_sketch_agg(CASE WHEN o_orderstatus = 'F' THEN o_custkey END)").as("sk_f"))
      sk.select(
        expr("ds_theta_estimate(ds_theta_union(sk_o, sk_f))").as("n_union"),
        expr("ds_theta_estimate(ds_theta_intersect(sk_o, sk_f))").as("n_inter"),
        expr("ds_theta_estimate(ds_theta_diff(sk_o, sk_f))").as("n_only_o"))
    }),
    "theta_union_rollup" -> ((spark, dir) => {
      val c = t(spark, dir, "customer")
      // per-nation sketches stored as an AGG table would store them,
      // then re-merged — the two-level ingest/query split
      c.groupBy(col("c_nationkey"))
        .agg(expr("ds_theta_sketch_agg(c_custkey)").as("sk"))
        .agg(expr("ds_theta_estimate(ds_theta_union_agg(sk))").as("nd_total"))
    }),
    // storable t-digest percentile state (reference be/src/types/
    // tdigest.h): partial digests per (flag, status) merged up to flag
    // via percentile_union — the AGG-table percentile column flow. The
    // gate pins the exact median AND asserts the digest median falls
    // inside the exact [q0.47, q0.53] band (t-digest bounds RANK error,
    // so that is the principled check for an approximate value).
    "percentile_tdigest" -> ((spark, dir) => {
      val li = t(spark, dir, "lineitem")
      val partial = li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(expr("percentile_agg(l_extendedprice)").as("pstate"))
      val merged = partial.groupBy(col("l_returnflag"))
        .agg(expr("percentile_approx_raw(percentile_union(pstate), 0.5d)").as("p50_td"))
      // exact baseline via distributed selection (ExactPercentile) —
      // builtin percentile() would re-introduce the one-reducer
      // value-buffering this sketch exists to avoid
      val exact = graft.operators.ExactPercentile.percentiles(
        li, Seq("l_returnflag"), "l_extendedprice",
        Seq("q_lo" -> 0.47, "p50_exact" -> 0.5, "q_hi" -> 0.53))
      merged.join(exact, "l_returnflag")
        .select(col("l_returnflag"),
          round(col("p50_exact"), 4).as("p50_exact"),
          (col("p50_td") >= col("q_lo") && col("p50_td") <= col("q_hi")).as("p50_ok"))
        .orderBy(col("l_returnflag"))
    }),
    // Mann-Whitney U (composed from rank windows; reference
    // be/src/exprs/agg/mann_whitney.h) comparing prices of returnflag
    // A vs R
    "mann_whitney_u" -> ((spark, dir) => sqlq(spark, dir)(
      """WITH pool AS (
        |  SELECT l_extendedprice AS v, CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS grp
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |ranked AS (
        |  SELECT grp, CAST(rank() OVER (ORDER BY v) AS DOUBLE)
        |    + (CAST(count(*) OVER (PARTITION BY v) AS DOUBLE) - 1) / 2.0 AS r
        |  FROM pool)
        |SELECT
        |  round(sum(CASE WHEN grp = 1 THEN r ELSE 0 END)
        |    - (sum(grp) * (sum(grp) + 1)) / 2.0, 4) AS u1,
        |  sum(grp) AS n1, count(*) - sum(grp) AS n2
        |FROM ranked""".stripMargin)))

  private val benfordSql: String =
    """WITH digits AS (
      |  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
      |    AS VARCHAR(20)), 1, 1) AS INT) AS d
      |  FROM orders WHERE o_totalprice >= 1),
      |obs AS (SELECT d, count(*) AS n FROM digits GROUP BY d),
      |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM obs),
      |expd AS (SELECT * FROM (VALUES
      |  (1, 0.30103), (2, 0.176091), (3, 0.124939), (4, 0.09691),
      |  (5, 0.079181), (6, 0.066947), (7, 0.057992), (8, 0.051153),
      |  (9, 0.045757)) e(d, p))
      |SELECT e.d, CAST(coalesce(o.n, 0) AS BIGINT) AS n,
      |  round(coalesce(o.n, 0) / t.t, 6) AS observed_p,
      |  CAST(e.p AS DOUBLE) AS expected_p,
      |  round(CAST(sum(CAST(
      |      (coalesce(o.n, 0) - e.p * t.t) * (coalesce(o.n, 0) - e.p * t.t)
      |        / (e.p * t.t) AS DECIMAL(28,10))) OVER () AS DOUBLE), 4) AS chi2
      |FROM expd e LEFT JOIN obs o ON e.d = o.d CROSS JOIN tot t
      |ORDER BY e.d""".stripMargin

  def oracles: Map[String, String] = Map(
    "stat_benford" -> benfordSql,
    "sketch_count_min" ->
      """SELECT user_id, count(*) AS est FROM events
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "sketch_join_estimate" ->
      """SELECT CAST(count(*) AS BIGINT) AS est_join_size
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey % 149 = 0""".stripMargin,
    "stat_ab_test" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant
        |  FROM events GROUP BY user_id),
        |c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS a_n,
        |    CAST(sum(CASE WHEN variant = 'A' THEN conv ELSE 0 END) AS BIGINT) AS a_x,
        |    CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS b_n,
        |    CAST(sum(CASE WHEN variant = 'B' THEN conv ELSE 0 END) AS BIGINT) AS b_x
        |  FROM pu)
        |SELECT a_n AS "A_n", a_x AS "A_x", b_n AS "B_n", b_x AS "B_x",
        |  round((CAST(a_x AS DOUBLE) / a_n - CAST(b_x AS DOUBLE) / b_n)
        |    / sqrt((CAST(a_x AS DOUBLE) + b_x) / (CAST(a_n AS DOUBLE) + b_n)
        |      * (1.0 - (CAST(a_x AS DOUBLE) + b_x) / (CAST(a_n AS DOUBLE) + b_n))
        |      * (1.0 / a_n + 1.0 / b_n)), 6) AS z
        |FROM c""".stripMargin,
    "stat_chi_square" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(floor(hour(ts) / 6.0) AS INT) AS band,
        |    count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, band, o,
        |    sum(o) OVER (PARTITION BY event_type) AS rt,
        |    sum(o) OVER (PARTITION BY band) AS ct,
        |    sum(o) OVER () AS nn
        |  FROM cells),
        |terms AS (
        |  SELECT CAST((o - CAST(rt AS DOUBLE) * ct / nn)
        |            * (o - CAST(rt AS DOUBLE) * ct / nn)
        |            / (CAST(rt AS DOUBLE) * ct / nn) AS DECIMAL(28,12)) AS term
        |  FROM tot)
        |SELECT round(CAST(sum(term) AS DOUBLE), 6) AS chi2,
        |  (SELECT CAST((count(DISTINCT event_type) - 1)
        |     * (count(DISTINCT band) - 1) AS INT) FROM cells) AS dof
        |FROM terms""".stripMargin,
    // greedy-chain funnel mirrored in SQL (see WindowFunnelAgg scaladoc)
    "funnel_events" ->
      """WITH t0 AS (
        |  SELECT user_id, min(ts) AS ts0 FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |t1 AS (
        |  SELECT e.user_id, min(e.ts) AS ts1 FROM events e JOIN t0 ON e.user_id = t0.user_id
        |  WHERE e.event_type = 'click' AND e.ts > t0.ts0
        |    AND e.ts <= t0.ts0 + INTERVAL 7 DAY GROUP BY e.user_id),
        |t2 AS (
        |  SELECT e.user_id, min(e.ts) AS ts2 FROM events e
        |  JOIN t0 ON e.user_id = t0.user_id JOIN t1 ON e.user_id = t1.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > t1.ts1
        |    AND e.ts <= t0.ts0 + INTERVAL 7 DAY GROUP BY e.user_id),
        |depths AS (
        |  SELECT u.user_id,
        |    CASE WHEN t2.user_id IS NOT NULL THEN 3
        |         WHEN t1.user_id IS NOT NULL THEN 2
        |         WHEN t0.user_id IS NOT NULL THEN 1 ELSE 0 END AS depth
        |  FROM (SELECT DISTINCT user_id FROM events) u
        |  LEFT JOIN t0 ON u.user_id = t0.user_id
        |  LEFT JOIN t1 ON u.user_id = t1.user_id
        |  LEFT JOIN t2 ON u.user_id = t2.user_id)
        |SELECT CAST(depth AS INT) AS depth, count(*) AS n_users FROM depths
        |GROUP BY depth ORDER BY depth""".stripMargin,
    "retention_events" ->
      """SELECT user_id,
        |  bool_or(event_type = 'signup') AS r0,
        |  bool_or(event_type = 'signup') AND bool_or(event_type = 'purchase') AS r1,
        |  bool_or(event_type = 'signup') AND bool_or(event_type = 'error') AS r2
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "approx_top_k_words" ->
      """SELECT word AS item, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY cnt DESC, item LIMIT 10""".stripMargin,
    "bitmap_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS nd_part_bitmap,
        |  count(DISTINCT l_partkey) AS nd_part_exact
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "bitmap_ops" ->
      """WITH a AS (SELECT DISTINCT l_partkey AS k FROM lineitem WHERE l_returnflag = 'A'),
        |     r AS (SELECT DISTINCT l_partkey AS k FROM lineitem WHERE l_returnflag = 'R')
        |SELECT
        |  (SELECT count(*) FROM a JOIN r USING (k)) AS n_and,
        |  (SELECT count(*) FROM (SELECT k FROM a UNION SELECT k FROM r)) AS n_or,
        |  (SELECT count(*) FROM (SELECT k FROM a UNION SELECT k FROM r))
        |    - (SELECT count(*) FROM a JOIN r USING (k)) AS n_xor""".stripMargin,
    "bitmap_text_roundtrip" ->
      """SELECT
        |  (SELECT count(*) FROM (
        |    SELECT o_custkey FROM orders GROUP BY o_custkey
        |    HAVING count(DISTINCT o_orderstatus) =
        |      (SELECT count(DISTINCT o_orderstatus) FROM orders))) AS n_all_status,
        |  '1,2,4,5' AS removed,
        |  CAST(3 AS BIGINT) AS arr_cnt,
        |  CAST(0 AS BIGINT) AS empty_cnt""".stripMargin,
    "bitmap_scalar_ops" ->
      """WITH d AS (SELECT DISTINCT l_returnflag, l_partkey AS pk FROM lineitem)
        |SELECT l_returnflag,
        |  CAST(min(pk) AS BIGINT) AS mn,
        |  CAST(max(pk) AS BIGINT) AS mx,
        |  bool_or(pk = 1) AS has1,
        |  CAST(least(count(*), 100) AS BIGINT) AS first100,
        |  CAST(least(count(*), 50) AS BIGINT) AS last50,
        |  CAST(0 AS BIGINT) AS self_diff,
        |  true AS self_any
        |FROM d GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "tvf_unnest_bitmap" ->
      """SELECT l_returnflag, pk FROM (
        |  SELECT DISTINCT l_returnflag, l_partkey AS pk FROM lineitem WHERE l_orderkey % 97 = 0)
        |ORDER BY l_returnflag, pk""".stripMargin,
    "tvf_subdivide_bitmap" ->
      """WITH arrs AS (
        |  SELECT l_returnflag, list_sort(list_distinct(list(l_partkey))) AS arr
        |  FROM lineitem WHERE l_orderkey % 97 = 0 GROUP BY l_returnflag),
        |chunks AS (
        |  SELECT l_returnflag, i AS chunk_idx, arr[i*100+1 : i*100+100] AS chunk
        |  FROM arrs, unnest(generate_series(0, CAST(ceil(len(arr) / 100.0) AS INT) - 1)) AS u(i))
        |SELECT l_returnflag, CAST(chunk_idx AS INT) AS chunk_idx,
        |  CAST(len(chunk) AS INT) AS chunk_size, chunk[1] AS first_pk
        |FROM chunks ORDER BY l_returnflag, chunk_idx""".stripMargin,
    "sum_map_events" ->
      """SELECT user_id,
        |  concat('{"', string_agg(concat(event_type, '":', CAST(CAST(s AS DOUBLE) AS VARCHAR)), ',"' ORDER BY event_type), '}') AS sums
        |FROM (
        |  SELECT user_id, event_type, SUM(CAST(value AS DECIMAL(18,6))) AS s
        |  FROM events GROUP BY user_id, event_type)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "histogram_prices" ->
      """SELECT CAST(floor(o_totalprice / 40000.0) AS BIGINT) AS bucket,
        |  count(*) AS n,
        |  CAST(floor(o_totalprice / 40000.0) AS BIGINT) * 40000.0 AS bucket_lo,
        |  min(o_totalprice) AS lo_seen, max(o_totalprice) AS hi_seen
        |FROM orders WHERE o_totalprice >= 0 AND o_totalprice < 400000
        |GROUP BY 1 ORDER BY bucket""".stripMargin,
    "asof_backward" ->
      """SELECT p.event_id, p.user_id, s.signup_id
        |FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts AS signup_ts, event_id AS signup_id
        |                FROM events WHERE event_type = 'signup') s
        |ON p.user_id = s.user_id AND p.ts >= s.signup_ts
        |ORDER BY p.event_id""".stripMargin,
    "asof_forward" ->
      """SELECT s.event_id, s.user_id, e.err_id
        |FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup') s
        |ASOF LEFT JOIN (SELECT user_id, ts AS err_ts, event_id AS err_id
        |                FROM events WHERE event_type = 'error') e
        |ON s.user_id = e.user_id AND s.ts <= e.err_ts
        |ORDER BY s.event_id""".stripMargin,
    "asof_nearest" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts AS click_ts, event_id AS click_id
        |  FROM events WHERE event_type = 'click'),
        |j AS (
        |  SELECT p.event_id, p.user_id, c.click_id,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY abs(epoch_us(p.ts) - epoch_us(c.click_ts)), c.click_ts) AS rn
        |  FROM p LEFT JOIN c ON p.user_id = c.user_id)
        |SELECT event_id, user_id, click_id FROM j WHERE rn = 1
        |ORDER BY event_id""".stripMargin,
    "agg_intersect_count" ->
      """SELECT
        |  (SELECT count(*) FROM (
        |    SELECT o_custkey FROM orders WHERE o_orderstatus IN ('O','F')
        |    GROUP BY o_custkey HAVING count(DISTINCT o_orderstatus) = 2)) AS n_both,
        |  (SELECT count(*) FROM (
        |    SELECT o_custkey FROM orders WHERE o_orderstatus IN ('O','F','P')
        |    GROUP BY o_custkey HAVING count(DISTINCT o_orderstatus) = 3)) AS n_all3""".stripMargin,
    "agg_theta_distinct" ->
      """SELECT c_mktsegment,
        |  count(DISTINCT c_nationkey) AS nd_nation,
        |  count(DISTINCT c_custkey) AS nd_cust,
        |  count(DISTINCT c_custkey) AS nd_cust_exact
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "theta_sketch_ops" ->
      """WITH o AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
        |     f AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
        |SELECT
        |  (SELECT count(*) FROM (SELECT k FROM o UNION SELECT k FROM f)) AS n_union,
        |  (SELECT count(*) FROM o JOIN f USING (k)) AS n_inter,
        |  (SELECT count(*) FROM o WHERE k NOT IN (SELECT k FROM f)) AS n_only_o""".stripMargin,
    "theta_union_rollup" ->
      """SELECT count(DISTINCT c_custkey) AS nd_total FROM customer""".stripMargin,
    "percentile_tdigest" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
        |  true AS p50_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "mann_whitney_u" ->
      """WITH pool AS (
        |  SELECT l_extendedprice AS v, CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS grp
        |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |ranked AS (
        |  SELECT grp, CAST(rank() OVER (ORDER BY v) AS DOUBLE)
        |    + (CAST(count(*) OVER (PARTITION BY v) AS DOUBLE) - 1) / 2.0 AS r
        |  FROM pool)
        |SELECT
        |  round(sum(CASE WHEN grp = 1 THEN r ELSE 0 END)
        |    - (sum(grp) * (sum(grp) + 1)) / 2.0, 4) AS u1,
        |  CAST(sum(grp) AS BIGINT) AS n1,
        |  CAST(count(*) - sum(grp) AS BIGINT) AS n2
        |FROM ranked""".stripMargin)
}
