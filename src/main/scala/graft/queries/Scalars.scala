package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import util._

/** Scalar function surface — reference `gensrc/script/functions.py`
  * (993 signatures): string (`be/src/exprs/string_functions.cpp`),
  * date/time (`time_functions.cpp`), math (`math_functions.cpp`),
  * conditional (`condition_expr.cpp`, `case_expr.cpp`), cast
  * (`cast_expr.cpp` — MySQL-lenient: bad input → NULL, mirrored by
  * DuckDB TRY_CAST in the oracles), hash/crypto
  * (`hash_functions.cpp`, `encryption_functions.cpp`).
  *
  * Trig/irrational outputs are rounded on both sides: Java Math and
  * C libm may differ in the last ulp.
  */
object Scalars extends graft.QueryArea {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "str_functions" -> ((spark, dir) => {
      val p = t(spark, dir, "part")
      p.select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          substring(col("p_name"), 1, 5).as("sub"),
          substring(col("p_name"), -4, 4).as("sub_neg"),
          length(col("p_name")).cast("long").as("len"),
          concat_ws("|", col("p_brand"), col("p_type")).as("cw"),
          lpad(col("p_brand"), 12, "*").as("lp"),
          rpad(col("p_brand"), 12, "#").as("rp"),
          trim(lit("  pad  ")).as("tr"),
          reverse(col("p_brand")).as("rev"),
          repeat(col("p_brand"), 2).as("rep"),
          split_part(col("p_type"), lit(" "), lit(1)).as("first_word"),
          instr(col("p_name"), "a").cast("long").as("pos_a"),
          translate(col("p_brand"), "#", "_").as("transl"),
          initcap(col("p_type")).as("icap"),
          ascii(col("p_brand")).cast("long").as("asc"),
          replace(col("p_type"), lit(" "), lit("-")).as("repl"))
        .orderBy(col("p_partkey")).limit(500)
    }),
    // fuzzy matching with BLOCKING: candidate pairs come from an EQUI
    // join on a prefix block key, and the edit distance evaluates only
    // inside blocks — the shape that keeps fuzzy self-joins off the
    // full cross product at 100 TB (the block key shuffles both sides
    // once; a cross join would never finish)
    "str_fuzzy_pairs" -> ((spark, dir) => {
      val names = t(spark, dir, "part").select(col("p_name")).distinct()
        .withColumn("blk", substring(col("p_name"), 1, 4))
      val a = names.select(col("blk"), col("p_name").as("name_a"))
      val b = names.select(col("blk"), col("p_name").as("name_b"))
      a.join(b, Seq("blk")).filter(col("name_a") < col("name_b"))
        .filter(levenshtein(col("name_a"), col("name_b")) <= 5)
        .select(col("name_a"), col("name_b"),
          levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
        .orderBy(col("name_a"), col("name_b"))
    }),
    // Jaro-Winkler scoring of the same blocked candidate pairs (the
    // entity-resolution ranking stage after Levenshtein's filter;
    // functions/KernelExpressions.scala JaroWinklerExpr). Oracle is
    // DuckDB's independent jaro_winkler_similarity implementation —
    // the two agree bit-for-bit on the standard definition.
    "str_jaro_winkler" -> ((spark, dir) => {
      val names = t(spark, dir, "part").select(col("p_name")).distinct()
        .withColumn("blk", substring(col("p_name"), 1, 4))
      val a = names.select(col("blk"), col("p_name").as("name_a"))
      val b = names.select(col("blk"), col("p_name").as("name_b"))
      a.join(b, Seq("blk")).filter(col("name_a") < col("name_b"))
        .select(col("name_a"), col("name_b"),
          round(expr("jaro_winkler(name_a, name_b)"), 6).as("jw"))
        .filter(col("jw") >= 0.93)
        .orderBy(col("name_a"), col("name_b"))
    }),
    "str_regexp" -> ((spark, dir) => {
      val p = t(spark, dir, "part")
      p.select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_token"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devowel"),
          col("p_name").rlike("^[a-m]").as("starts_early"),
          col("p_type").like("%BRASS%").as("is_brass"),
          col("p_type").startsWith("STANDARD").as("is_std"),
          col("p_type").endsWith("TIN").as("is_tin"))
        .orderBy(col("p_partkey")).limit(500)
    }),
    "date_functions" -> ((spark, dir) => {
      val o = t(spark, dir, "orders")
      o.select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("d"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow0"),
          weekofyear(col("o_orderdate")).cast("long").as("woy"),
          dayofyear(col("o_orderdate")).cast("long").as("doy"),
          date_trunc("month", col("o_orderdate")).as("mstart"),
          last_day(col("o_orderdate")).cast("timestamp").as("mend"),
          date_add(col("o_orderdate").cast("date"), 30).cast("timestamp").as("plus30"),
          add_months(col("o_orderdate").cast("date"), 2).cast("timestamp").as("plus2m"),
          datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date")).cast("long").as("days_to_end"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso"))
        .orderBy(col("o_orderkey")).limit(1000)
    }),
    "date_compat" -> ((spark, dir) => sqlq(spark, dir)(
      """SELECT o_orderkey,
        |  dayname(o_orderdate) AS dname,
        |  monthname(o_orderdate) AS mname,
        |  months_add(o_orderdate, 3) AS m3,
        |  days_sub(o_orderdate, 10) AS d10,
        |  hours_add(o_orderdate, 5) AS h5,
        |  time_slice(o_orderdate, 7, 'day') AS slice7d,
        |  str_to_date('2024-03-05 10:20:30', '%Y-%m-%d %H:%i:%s') AS parsed
        |FROM orders ORDER BY o_orderkey LIMIT 1000""".stripMargin)),
    "math_functions" -> ((spark, dir) => {
      // top-k on raw sort keys FIRST: guarantees the 18 computed
      // columns are evaluated for 2000 rows, not the whole scan
      val li = t(spark, dir, "lineitem")
        .orderBy(col("l_orderkey"), col("l_linenumber")).limit(2000)
      li.select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("ad"),
          round(col("l_extendedprice") * 0.137, 6).as("r1"),
          round(col("l_extendedprice"), -2).as("rm2"),
          ceil(col("l_quantity") / 7).cast("long").as("c7"),
          floor(col("l_quantity") / 7).cast("long").as("f7"),
          round(sqrt(col("l_extendedprice")), 6).as("sq"),
          round(ln(col("l_extendedprice") + 1), 6).as("lg"),
          round(log10(col("l_extendedprice") + 1), 6).as("l10"),
          round(exp(col("l_discount")), 6).as("ex"),
          round(pow(col("l_quantity"), 1.5), 4).as("pw"),
          round(sin(col("l_discount")), 8).as("sn"),
          round(cos(col("l_discount")), 8).as("cs"),
          round(atan(col("l_discount")), 8).as("at"),
          signum(col("l_discount") - 0.05).as("sg"),
          greatest(col("l_tax"), col("l_discount")).as("gr"),
          least(col("l_tax"), col("l_discount")).as("ls"),
          pmod(col("l_orderkey"), lit(97)).as("pm"),
          (col("l_orderkey") % 97).as("md"))
        .orderBy(col("l_orderkey"), col("l_linenumber")).limit(2000)
    }),
    "bit_functions" -> ((spark, dir) => sqlq(spark, dir)(
      """SELECT o_orderkey,
        |  bitand(o_orderkey, 255) AS ba,
        |  bitor(o_orderkey, 16) AS bo,
        |  bitxor(o_orderkey, 85) AS bx,
        |  bitnot(o_orderkey) AS bn,
        |  bitshiftleft(o_orderkey, 2) AS bsl,
        |  bitshiftright(o_orderkey, 3) AS bsr
        |FROM orders ORDER BY o_orderkey LIMIT 1000""".stripMargin)),
    "conditional_functions" -> ((spark, dir) => {
      val c = t(spark, dir, "customer")
      c.select(
          col("c_custkey"),
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "low")
            .otherwise("high").as("bal_class"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(bldg)")).as("seg_or"),
          expr("if(c_acctbal > 0, 'pos', 'nonpos')").as("if_bal"),
          expr("ifnull(nullif(c_nationkey, 3), -1)").cast("long").as("ifn"),
          expr("nvl2(nullif(c_nationkey, 3), 'set', 'null')").as("nvl2"))
        .orderBy(col("c_custkey"))
    }),
    "cast_lenient" -> ((spark, dir) => {
      val p = t(spark, dir, "part")
      p.select(
          col("p_partkey"),
          concat(lit("x"), col("p_size")).cast("int").as("bad_int"),
          col("p_size").cast("string").as("as_str"),
          col("p_retailprice").cast("int").as("trunc_int"),
          lit("2024-02-30").cast("date").as("bad_date"),
          lit("123.5").cast("double").as("good_double"),
          col("p_size").cast("double").as("i2d"))
        .orderBy(col("p_partkey")).limit(500)
    }),
    "hash_crypto" -> ((spark, dir) => {
      val c = t(spark, dir, "customer")
      c.select(
          col("c_custkey"),
          md5(col("c_name")).as("m5"),
          sha2(col("c_name"), 256).as("s256"),
          base64(col("c_name").cast("binary")).as("b64"),
          unbase64(base64(col("c_name").cast("binary"))).cast("string").as("roundtrip"))
        .orderBy(col("c_custkey")).limit(500)
    }),
    // URL functions (reference: url_functions.cpp / url_coding):
    // synthesize a URL per customer, then parse it back apart
    "url_functions" -> ((spark, dir) => {
      val c = t(spark, dir, "customer")
        .withColumn("url", concat(lit("https://shop.example.com/seg/"),
          col("c_mktsegment"), lit("/item?cust="), col("c_custkey"), lit("&tier=gold")))
      c.select(
          col("c_custkey"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("cust")).as("q_cust"),
          url_decode(url_encode(col("url"))).as("roundtrip"))
        .orderBy(col("c_custkey")).limit(500)
    }),
    "str_money_strcmp" -> ((spark, dir) => sqlq(spark, dir)(
      """SELECT c_custkey,
        |  money_format(c_acctbal) AS money,
        |  strcmp(c_mktsegment, 'HOUSEHOLD') AS cmp,
        |  strleft(c_name, 8) AS l8,
        |  strright(c_name, 4) AS r4,
        |  null_or_empty(c_name) AS empty1,
        |  append_trailing_char_if_absent(c_mktsegment, 'G') AS atc
        |FROM customer ORDER BY c_custkey LIMIT 500""".stripMargin)),
    // round-2 compat batch: {unit}s_diff family, adddate/makedate/week,
    // timestampadd/timestampdiff, arithmetic-by-name, base64, md5sum
    "compat_datetime_math" -> ((spark, dir) => sqlq(spark, dir)(
      """SELECT o_orderkey,
        |  CAST(adddate(o_orderdate, 10) AS TIMESTAMP) AS d_add,
        |  CAST(subdate(o_orderdate, 3) AS TIMESTAMP) AS d_sub,
        |  days_diff(o_orderdate, timestamp'1995-01-01 00:00:00') AS dd,
        |  hours_diff(o_orderdate, timestamp'1995-01-01 00:00:00') AS hd,
        |  weeks_diff(o_orderdate, timestamp'1995-01-01 00:00:00') AS wd,
        |  months_diff(o_orderdate, timestamp'1995-01-01 00:00:00') AS md,
        |  timestampadd(DAY, 5, o_orderdate) AS ts_add,
        |  timestampdiff(HOUR, timestamp'1995-01-01 00:00:00', o_orderdate) AS ts_diff,
        |  CAST(makedate(1995, o_orderkey % 300 + 1) AS TIMESTAMP) AS mk,
        |  week(o_orderdate) AS wk,
        |  dayofweek_iso(o_orderdate) AS dow_iso,
        |  round(square(o_totalprice), 2) AS sq,
        |  round(fmod(o_totalprice, 97.0), 4) AS fm,
        |  md5sum(o_orderstatus, o_orderpriority) AS m5,
        |  to_base64(o_orderpriority) AS b64,
        |  CAST(from_base64(to_base64(o_orderstatus)) AS STRING) AS b64rt
        |FROM orders WHERE o_orderkey <= 3000 ORDER BY o_orderkey""".stripMargin)),
    // DataFrame form of the original SQL (unchanged as the oracle):
    // the single-row-group events file plans as ONE scan task, so the
    // per-row JSON parsing + the multi-distinct Expand ran on one
    // core — project the JSON extracts once, fan out (guide §2.5;
    // no-op with real file splits), then the same aggregates.
    // group_concat is array_sort-based (order-independent), the
    // distinct aggregates and max/min/bool_or are order-free, so the
    // result is bit-identical.
    "compat_json_agg" -> ((spark, dir) => {
      val e = graft.operators.Ops.fanOut(
          t(spark, dir, "events")
            .select(col("user_id"), col("event_type"), col("value"), col("props")))
        .select(col("user_id"), col("event_type"),
          expr("CAST(value AS DECIMAL(18,6))").as("__dv"),
          expr("get_json_int(props, '$.k')").as("__jk"),
          expr("json_exists(props, '$.k')").as("__ek"),
          expr("json_exists(props, '$.nope')").as("__en"),
          expr("json_length(props)").as("__jl"),
          expr("json_object('t', event_type, 'u', user_id)").as("__jo"))
      e.groupBy(col("user_id"))
        .agg(expr("group_concat(event_type, '|')").as("types"),
          expr("multi_distinct_count(event_type)").as("ndt"),
          expr("CAST(multi_distinct_sum(__dv) AS DOUBLE)").as("sd"),
          max(col("__jk")).as("mk"),
          expr("bool_or(__ek)").as("has_k"),
          expr("bool_or(__en)").as("has_nope"),
          max(col("__jl")).as("jlen"),
          min(col("__jo")).as("jobj"))
        .orderBy(col("user_id"))
    }))

  def oracles: Map[String, String] = Map(
    "compat_datetime_math" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate + INTERVAL 10 DAY AS TIMESTAMP) AS d_add,
        |  CAST(o_orderdate - INTERVAL 3 DAY AS TIMESTAMP) AS d_sub,
        |  CAST(floor((epoch(o_orderdate) - epoch(TIMESTAMP '1995-01-01')) / 86400) AS BIGINT) AS dd,
        |  CAST(floor((epoch(o_orderdate) - epoch(TIMESTAMP '1995-01-01')) / 3600) AS BIGINT) AS hd,
        |  CAST(floor((epoch(o_orderdate) - epoch(TIMESTAMP '1995-01-01')) / 604800) AS BIGINT) AS wd,
        |  CAST((year(o_orderdate) * 12 + month(o_orderdate)) - (1995 * 12 + 1) AS BIGINT) AS md,
        |  o_orderdate + INTERVAL 5 DAY AS ts_add,
        |  CAST(floor((epoch(o_orderdate) - epoch(TIMESTAMP '1995-01-01')) / 3600) AS BIGINT) AS ts_diff,
        |  CAST(DATE '1995-01-01' + CAST(o_orderkey % 300 AS INT) AS TIMESTAMP) AS mk,
        |  CAST(weekofyear(o_orderdate) AS INT) AS wk,
        |  CAST(isodow(o_orderdate) AS INT) AS dow_iso,
        |  round(o_totalprice * o_totalprice, 2) AS sq,
        |  round(o_totalprice - 97.0 * CAST(trunc(o_totalprice / 97.0) AS BIGINT), 4) AS fm,
        |  md5(concat(o_orderstatus, o_orderpriority)) AS m5,
        |  to_base64(CAST(o_orderpriority AS BLOB)) AS b64,
        |  o_orderstatus AS b64rt
        |FROM orders WHERE o_orderkey <= 3000 ORDER BY o_orderkey""".stripMargin,
    "compat_json_agg" ->
      """SELECT user_id,
        |  string_agg(event_type, '|' ORDER BY event_type) AS types,
        |  count(DISTINCT event_type) AS ndt,
        |  CAST(SUM(DISTINCT CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sd,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS mk,
        |  bool_or(json_extract_string(props, '$.k') IS NOT NULL) AS has_k,
        |  bool_or(json_extract_string(props, '$.nope') IS NOT NULL) AS has_nope,
        |  CAST(1 AS INT) AS jlen,
        |  min(concat('{"t":"', event_type, '","u":', CAST(user_id AS VARCHAR), '}')) AS jobj
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "str_functions" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up, lower(p_brand) AS lo,
        |  substring(p_name, 1, 5) AS sub,
        |  CASE WHEN length(p_name) >= 4 THEN substring(p_name, length(p_name)-3, 4) ELSE substring(p_name, greatest(length(p_name)+(-4)+1,1), 4) END AS sub_neg,
        |  CAST(length(p_name) AS BIGINT) AS len,
        |  concat_ws('|', p_brand, p_type) AS cw,
        |  lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '#') AS rp,
        |  trim('  pad  ') AS tr, reverse(p_brand) AS rev,
        |  repeat(p_brand, 2) AS rep,
        |  split_part(p_type, ' ', 1) AS first_word,
        |  CAST(instr(p_name, 'a') AS BIGINT) AS pos_a,
        |  replace(p_brand, '#', '_') AS transl,
        |  array_to_string(list_transform(string_split(p_type, ' '),
        |    w -> concat(upper(w[1:1]), lower(w[2:]))), ' ') AS icap,
        |  CAST(ascii(p_brand) AS BIGINT) AS asc,
        |  replace(p_type, ' ', '-') AS repl
        |FROM part ORDER BY p_partkey LIMIT 500""".stripMargin,
    "str_regexp" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS first_token,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
        |  regexp_matches(p_name, '^[a-m]') AS starts_early,
        |  p_type LIKE '%BRASS%' AS is_brass,
        |  starts_with(p_type, 'STANDARD') AS is_std,
        |  ends_with(p_type, 'TIN') AS is_tin
        |FROM part ORDER BY p_partkey LIMIT 500""".stripMargin,
    "str_fuzzy_pairs" ->
      """WITH t AS (SELECT DISTINCT p_name FROM part),
        |blocked AS (SELECT p_name, substring(p_name, 1, 4) AS blk FROM t)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        |FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 5
        |ORDER BY name_a, name_b""".stripMargin,
    "str_jaro_winkler" ->
      """WITH t AS (SELECT DISTINCT p_name FROM part),
        |blocked AS (SELECT p_name, substring(p_name, 1, 4) AS blk FROM t),
        |scored AS (
        |  SELECT a.p_name AS name_a, b.p_name AS name_b,
        |    round(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
        |  FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.p_name < b.p_name)
        |SELECT name_a, name_b, jw FROM scored
        |WHERE jw >= 0.93 ORDER BY name_a, name_b""".stripMargin,
    "date_functions" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS d,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  CAST(dayofweek(o_orderdate) AS BIGINT) AS dow0,
        |  CAST(weekofyear(o_orderdate) AS BIGINT) AS woy,
        |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        |  date_trunc('month', o_orderdate) AS mstart,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS mend,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS plus30,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS TIMESTAMP) AS plus2m,
        |  datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_end,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  strftime(o_orderdate, '%Y-%m-%d') AS iso
        |FROM orders ORDER BY o_orderkey LIMIT 1000""".stripMargin,
    "date_compat" ->
      """SELECT o_orderkey,
        |  dayname(o_orderdate) AS dname,
        |  monthname(o_orderdate) AS mname,
        |  o_orderdate + INTERVAL 3 MONTH AS m3,
        |  o_orderdate - INTERVAL 10 DAY AS d10,
        |  o_orderdate + INTERVAL 5 HOUR AS h5,
        |  make_timestamp(CAST(floor(epoch(o_orderdate) / (7*86400)) * 7*86400*1000000 AS BIGINT)) AS slice7d,
        |  TIMESTAMP '2024-03-05 10:20:30' AS parsed
        |FROM orders ORDER BY o_orderkey LIMIT 1000""".stripMargin,
    "math_functions" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - 0.05) AS ad,
        |  round(l_extendedprice * 0.137, 6) AS r1,
        |  round(l_extendedprice, -2) AS rm2,
        |  CAST(ceil(l_quantity / 7) AS BIGINT) AS c7,
        |  CAST(floor(l_quantity / 7) AS BIGINT) AS f7,
        |  round(sqrt(l_extendedprice), 6) AS sq,
        |  round(ln(l_extendedprice + 1), 6) AS lg,
        |  round(log10(l_extendedprice + 1), 6) AS l10,
        |  round(exp(l_discount), 6) AS ex,
        |  round(pow(l_quantity, 1.5), 4) AS pw,
        |  round(sin(l_discount), 8) AS sn,
        |  round(cos(l_discount), 8) AS cs,
        |  round(atan(l_discount), 8) AS at,
        |  CASE WHEN l_discount - 0.05 > 0 THEN 1.0 WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS sg,
        |  greatest(l_tax, l_discount) AS gr,
        |  least(l_tax, l_discount) AS ls,
        |  l_orderkey % 97 AS pm,
        |  l_orderkey % 97 AS md
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 2000""".stripMargin,
    "bit_functions" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS ba,
        |  o_orderkey | 16 AS bo,
        |  xor(o_orderkey, 85) AS bx,
        |  ~o_orderkey AS bn,
        |  o_orderkey << 2 AS bsl,
        |  o_orderkey >> 3 AS bsr
        |FROM orders ORDER BY o_orderkey LIMIT 1000""".stripMargin,
    "conditional_functions" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bal_class,
        |  COALESCE(nullif(c_mktsegment, 'BUILDING'), '(bldg)') AS seg_or,
        |  CASE WHEN c_acctbal > 0 THEN 'pos' ELSE 'nonpos' END AS if_bal,
        |  CAST(COALESCE(nullif(c_nationkey, 3), -1) AS BIGINT) AS ifn,
        |  CASE WHEN nullif(c_nationkey, 3) IS NOT NULL THEN 'set' ELSE 'null' END AS nvl2
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "cast_lenient" ->
      """SELECT p_partkey,
        |  TRY_CAST(concat('x', p_size) AS INT) AS bad_int,
        |  CAST(p_size AS VARCHAR) AS as_str,
        |  CAST(trunc(p_retailprice) AS INT) AS trunc_int,
        |  TRY_CAST('2024-02-30' AS DATE) AS bad_date,
        |  CAST('123.5' AS DOUBLE) AS good_double,
        |  CAST(p_size AS DOUBLE) AS i2d
        |FROM part ORDER BY p_partkey LIMIT 500""".stripMargin,
    "hash_crypto" ->
      """SELECT c_custkey,
        |  md5(c_name) AS m5,
        |  sha256(c_name) AS s256,
        |  to_base64(CAST(c_name AS BLOB)) AS b64,
        |  c_name AS roundtrip
        |FROM customer ORDER BY c_custkey LIMIT 500""".stripMargin,
    "url_functions" ->
      """WITH u AS (
        |  SELECT c_custkey,
        |    concat('https://shop.example.com/seg/', c_mktsegment,
        |           '/item?cust=', CAST(c_custkey AS VARCHAR), '&tier=gold') AS url
        |  FROM customer)
        |SELECT c_custkey,
        |  regexp_extract(url, 'https?://([^/]+)', 1) AS host,
        |  regexp_extract(url, '://[^/]+([^?]*)', 1) AS path,
        |  regexp_extract(url, 'cust=([^&]*)', 1) AS q_cust,
        |  url AS roundtrip
        |FROM u ORDER BY c_custkey LIMIT 500""".stripMargin,
    "str_money_strcmp" ->
      """SELECT c_custkey,
        |  concat(CASE WHEN c_acctbal < 0 THEN '-' ELSE '' END,
        |    format('{:,}', CAST(floor(abs(c_acctbal)) AS BIGINT)), '.',
        |    lpad(CAST(CAST(round((abs(c_acctbal) - floor(abs(c_acctbal))) * 100) AS BIGINT) AS VARCHAR), 2, '0')) AS money,
        |  CASE WHEN c_mktsegment < 'HOUSEHOLD' THEN -1 WHEN c_mktsegment = 'HOUSEHOLD' THEN 0 ELSE 1 END AS cmp,
        |  c_name[1:8] AS l8,
        |  c_name[-4:] AS r4,
        |  (c_name IS NULL OR c_name = '') AS empty1,
        |  CASE WHEN ends_with(c_mktsegment, 'G') THEN c_mktsegment ELSE c_mktsegment || 'G' END AS atc
        |FROM customer ORDER BY c_custkey LIMIT 500""".stripMargin)
}
