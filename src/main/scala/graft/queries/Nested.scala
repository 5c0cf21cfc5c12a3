package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import util._

/** Nested types + table functions — reference ARRAY/MAP/STRUCT/JSON
  * columns (`be/src/column/{array,map,struct}_column.h`,
  * `be/src/types/json_value.h`), array kernels
  * (`be/src/exprs/array_functions.cpp`, lambdas
  * `be/src/exprs/array_map_expr.cpp`), map kernels
  * (`map_functions.cpp`), JSON (`json_functions.cpp`), and the TVF
  * surface (`be/src/exprs/table_function/`: unnest, generate_series,
  * json_each).
  *
  * Spark: arrays/maps/structs are native column types; lambdas map to
  * higher-order functions (transform/filter/aggregate — codegen'd);
  * unnest ≡ explode/posexplode (Generate operator); generate_series ≡
  * sequence() + explode.
  */
object Nested extends graft.QueryArea {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "arr_basics" -> ((spark, dir) => {
      val d = t(spark, dir, "documents")
      d.withColumn("words", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("words")).cast("long").as("n_words"),
          array_contains(col("words"), "spark").as("has_spark"),
          array_join(array_sort(array_distinct(col("words"))), ",").as("vocab"),
          array_join(slice(col("words"), 2, 3), ",").as("w2_4"),
          element_at(col("words"), 1).as("first_w"),
          element_at(col("words"), -1).as("last_w"),
          arrays_overlap(col("words"), array(lit("join"), lit("scan"))).as("has_join_scan"),
          array_join(array_sort(array_intersect(col("words"), array(lit("join"), lit("scan"), lit("sort")))), ",").as("ops_used"),
          array_position(col("words"), "data").cast("long").as("pos_data"))
        .orderBy(col("doc_id")).limit(300)
    }),
    "arr_higher_order" -> ((spark, dir) => {
      val d = t(spark, dir, "documents")
      d.withColumn("words", split(col("text"), " "))
        .select(
          col("doc_id"),
          expr("array_join(transform(words, w -> cast(length(w) as string)), ',')").as("lens"),
          expr("array_join(filter(words, w -> length(w) > 4), ',')").as("long_words"),
          expr("aggregate(words, 0, (acc, w) -> acc + length(w))").cast("long").as("total_chars"),
          expr("exists(words, w -> w = 'spark')").as("any_spark"),
          expr("forall(words, w -> length(w) > 1)").as("all_gt1"),
          expr("size(filter(words, w -> w like '%a%'))").cast("long").as("n_with_a"))
        .orderBy(col("doc_id")).limit(300)
    }),
    // unnest: one row per word (LEFT JOIN semantics via explode_outer)
    // regexp_extract_all as a row generator: every 's…' word 4+ chars
    // per doc with its match ordinal — the regex-TVF surface
    "tvf_regexp_rows" -> ((spark, dir) => {
      t(spark, dir, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"),
          posexplode(expr("regexp_extract_all(text, '\\\\bs[a-z]{3,}', 0)"))
            .as(Seq("ord", "m")))
        .orderBy("doc_id", "ord")
    }),
    "tvf_explode_words" -> ((spark, dir) => {
      val d = t(spark, dir, "documents")
      d.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n").desc, col("word"))
        .limit(30)
    }),
    "tvf_posexplode" -> ((spark, dir) => {
      val d = t(spark, dir, "documents")
      d.select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos1"), col("col").as("word"))
        .filter(col("pos1") <= 3)
        .orderBy(col("doc_id"), col("pos1"))
        .limit(600)
    }),
    "tvf_generate_series" -> ((spark, dir) => {
      // events per day over a generated date spine (empty days kept)
      val e = t(spark, dir, "events")
      val spine = spark.range(1).select(explode(sequence(
        lit("2024-01-01").cast("date"), lit("2024-01-31").cast("date"),
        expr("interval 1 day"))).as("day"))
      val daily = e.groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      spine.join(daily, Seq("day"), "left")
        .select(col("day").cast("timestamp").as("day"), coalesce(col("n"), lit(0L)).as("n"))
        .orderBy(col("day"))
    }),
    "map_functions" -> ((spark, dir) => {
      val d = t(spark, dir, "documents")
      d.withColumn("m", expr("str_to_map(concat('lang:', lang, ',src:', source, ',len:', n_chars), ',', ':')"))
        .select(
          col("doc_id"),
          array_join(map_keys(col("m")), ",").as("ks"),
          element_at(col("m"), "lang").as("m_lang"),
          element_at(col("m"), "missing").as("m_missing"),
          size(col("m")).cast("long").as("m_size"),
          expr("map_contains_key(m, 'src')").as("has_src"))
        .orderBy(col("doc_id")).limit(300)
    }),
    // custom array kernels (array_cum_sum / array_difference /
    // array_contains_all) + reference-named aliases, on a fixed
    // 3-wide array so the oracle is explicit arithmetic
    "arr_kernels" -> ((spark, dir) => sqlq(spark, dir)(
      """SELECT o_orderkey,
        |  array_join(cast(array_cum_sum(array(o_orderkey % 10, o_orderkey % 7, o_orderkey % 3)) as array<bigint>), ',') AS cs,
        |  array_join(cast(array_difference(array(o_orderkey % 10, o_orderkey % 7, o_orderkey % 3)) as array<bigint>), ',') AS df,
        |  array_contains_all(array(o_orderkey % 10, o_orderkey % 7), array(o_orderkey % 10)) AS ca_t,
        |  array_contains_all(array(o_orderkey % 10, o_orderkey % 7), array(11L)) AS ca_f,
        |  array_join(array_concat(array(o_orderkey % 10), array(99L)), ',') AS cc,
        |  all_match(array(o_orderkey % 10, o_orderkey % 7), x -> x >= 0) AS am,
        |  any_match(array(o_orderkey % 10, o_orderkey % 7), x -> x > 8) AS nm,
        |  array_join(array_sortby(array(o_orderstatus, o_orderpriority), array(2, 1)), ',') AS sb,
        |  round(ngram_search(o_orderpriority, o_orderpriority, 3), 4) AS ng_self,
        |  round(ngram_search('abcdef', 'abcx', 3), 4) AS ng_half,
        |  round(ngram_search('abcdef', 'xyz', 3), 4) AS ng_none
        |FROM orders WHERE o_orderkey <= 3000 ORDER BY o_orderkey""".stripMargin)),
    // numeric array kernels over embeddings (array_sum/avg are custom
    // expressions; min/max/size are Spark builtins under the same names)
    "arr_numeric" -> ((spark, dir) => {
      val e = t(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding")).filter(col("vec_id") < 50)
      e.select(col("vec_id"),
          round(expr("array_sum(embedding)"), 4).as("s"),
          round(expr("array_avg(embedding)"), 4).as("m"),
          round(array_min(col("embedding")).cast("double"), 4).as("mn"),
          round(array_max(col("embedding")).cast("double"), 4).as("mx"),
          size(col("embedding")).as("n"))
        .orderBy(col("vec_id"))
    }),
    "struct_functions" -> ((spark, dir) => {
      val c = t(spark, dir, "customer")
      c.select(col("c_custkey"),
          struct(col("c_name").as("name"), col("c_acctbal").as("bal")).as("s"))
        .select(
          col("c_custkey"),
          col("s.name").as("sname"),
          col("s.bal").as("sbal"),
          to_json(col("s")).as("sjson"))
        .orderBy(col("c_custkey")).limit(500)
    }),
    "json_functions" -> ((spark, dir) => {
      val e = t(spark, dir, "events")
      e.select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val"),
          from_json(col("props"), org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)).getItem("k").cast("long").as("k_via_map"),
          get_json_object(col("props"), "$.nope").as("missing"),
          to_json(struct(col("event_type").as("t"), col("user_id").as("u"))).as("built"))
        .orderBy(col("event_id")).limit(1000)
    }),
    // Flat JSON (reference Flat_json.md): synthesize a mixed-shape
    // JSON doc from events (string t, long u, 2/3-present long v,
    // double r, 10%-present rare), profile + flatten at a 0.5 hit
    // ratio — t/u/v/r promote to typed columns, rare stays in the
    // remain JSON — then aggregate the typed columns. The oracle
    // recomputes every figure from the base columns directly, proving
    // the profile→extract→remain pipeline is lossless and typed
    // correctly.
    "json_flatten_profile" -> ((spark, dir) => {
      val e = t(spark, dir, "events")
      val jdoc = concat(
        lit("{\"t\":\""), col("event_type"), lit("\",\"u\":"), col("user_id").cast("string"),
        coalesce(when(col("event_id") % 3 =!= 0,
          concat(lit(",\"v\":"), (col("user_id") % 7).cast("string"))), lit("")),
        lit(",\"r\":"), (col("user_id") % 100).cast("string"), lit(".5"),
        coalesce(when(col("event_id") % 10 === 0, lit(",\"rare\":1")), lit("")),
        lit("}"))
      // profile on the deterministic event_id%7 band (presence ratios
      // are %3- and %10-periodic, so the band preserves them); the
      // extract pass still reads every row
      val flat = graft.operators.FlatJson.flatten(
        e.select(col("event_id"), jdoc.as("jdoc")), "jdoc", minHitRatio = 0.5,
        profileOn = Some(e.filter(col("event_id") % 7 === 0)
          .select(jdoc.as("jdoc"))))
      flat.groupBy(col("t"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("u")).cast("bigint").as("su"),
          sum(col("v")).cast("bigint").as("sv"),
          sum(col("r").cast("decimal(18,6)")).cast("double").as("sr"),
          count(get_json_object(col("jdoc_remain"), "$.rare")).cast("bigint").as("nr"))
        .orderBy(col("t"))
    }),
    // json_each ≡ explode the parsed map (reference json_each TVF)
    "tvf_json_each" -> ((spark, dir) => {
      val e = t(spark, dir, "events")
      e.select(col("event_id"), explode(from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType))))
        .select(col("event_id"), col("key"), col("value").cast("long").as("value"))
        .orderBy(col("event_id"), col("key")).limit(1000)
    }))

  def oracles: Map[String, String] = Map(
    "arr_basics" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |  array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') AS vocab,
        |  array_to_string(string_split(text, ' ')[2:4], ',') AS w2_4,
        |  string_split(text, ' ')[1] AS first_w,
        |  string_split(text, ' ')[-1] AS last_w,
        |  list_has_any(string_split(text, ' '), ['join', 'scan']) AS has_join_scan,
        |  COALESCE(array_to_string(list_sort(list_intersect(string_split(text, ' '), ['join','scan','sort'])), ','), '') AS ops_used,
        |  CAST(COALESCE(list_position(string_split(text, ' '), 'data'), 0) AS BIGINT) AS pos_data
        |FROM documents ORDER BY doc_id LIMIT 300""".stripMargin,
    "arr_higher_order" ->
      """SELECT doc_id,
        |  array_to_string(list_transform(string_split(text, ' '), w -> CAST(length(w) AS VARCHAR)), ',') AS lens,
        |  array_to_string(list_filter(string_split(text, ' '), w -> length(w) > 4), ',') AS long_words,
        |  CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS BIGINT) AS total_chars,
        |  len(list_filter(string_split(text, ' '), w -> w = 'spark')) > 0 AS any_spark,
        |  len(list_filter(string_split(text, ' '), w -> length(w) <= 1)) = 0 AS all_gt1,
        |  CAST(len(list_filter(string_split(text, ' '), w -> w LIKE '%a%')) AS BIGINT) AS n_with_a
        |FROM documents ORDER BY doc_id LIMIT 300""".stripMargin,
    "tvf_regexp_rows" ->
      """WITH m AS (
        |  SELECT doc_id, regexp_extract_all(text, '\bs[a-z]{3,}') AS ms
        |  FROM documents WHERE doc_id < 50),
        |p AS (SELECT doc_id, unnest(generate_series(1, len(ms))) AS i, ms FROM m)
        |SELECT doc_id, CAST(i - 1 AS INT) AS ord, ms[i] AS m
        |FROM p ORDER BY doc_id, ord""".stripMargin,
    "tvf_explode_words" ->
      """SELECT word, count(*) AS n, count(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY n DESC, word LIMIT 30""".stripMargin,
    "tvf_posexplode" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS pos1, string_split(text, ' ')[i] AS word
        |FROM documents, unnest(generate_series(1, len(string_split(text, ' ')))) AS u(i)
        |WHERE i <= 3
        |ORDER BY doc_id, pos1 LIMIT 600""".stripMargin,
    "tvf_generate_series" ->
      """WITH spine AS (
        |  SELECT unnest(generate_series(DATE '2024-01-01', DATE '2024-01-31', INTERVAL 1 DAY)) AS day),
        |daily AS (
        |  SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, count(*) AS n FROM events GROUP BY 1)
        |SELECT CAST(spine.day AS TIMESTAMP) AS day, COALESCE(daily.n, 0) AS n
        |FROM spine LEFT JOIN daily ON spine.day = daily.day
        |ORDER BY spine.day""".stripMargin,
    "map_functions" ->
      """SELECT doc_id,
        |  'lang,src,len' AS ks,
        |  lang AS m_lang,
        |  NULL AS m_missing,
        |  CAST(3 AS BIGINT) AS m_size,
        |  true AS has_src
        |FROM documents ORDER BY doc_id LIMIT 300""".stripMargin,
    "arr_kernels" ->
      """SELECT o_orderkey,
        |  concat(CAST(o_orderkey % 10 AS VARCHAR), ',',
        |         CAST(o_orderkey % 10 + o_orderkey % 7 AS VARCHAR), ',',
        |         CAST(o_orderkey % 10 + o_orderkey % 7 + o_orderkey % 3 AS VARCHAR)) AS cs,
        |  concat('0,', CAST(o_orderkey % 7 - o_orderkey % 10 AS VARCHAR), ',',
        |         CAST(o_orderkey % 3 - o_orderkey % 7 AS VARCHAR)) AS df,
        |  true AS ca_t,
        |  false AS ca_f,
        |  concat(CAST(o_orderkey % 10 AS VARCHAR), ',99') AS cc,
        |  true AS am,
        |  (o_orderkey % 10 > 8) AS nm,
        |  concat(o_orderpriority, ',', o_orderstatus) AS sb,
        |  1.0 AS ng_self,
        |  0.5 AS ng_half,
        |  0.0 AS ng_none
        |FROM orders WHERE o_orderkey <= 3000 ORDER BY o_orderkey""".stripMargin,
    "arr_numeric" ->
      """SELECT vec_id,
        |  round(list_sum(CAST(embedding AS DOUBLE[])), 4) AS s,
        |  round(list_avg(CAST(embedding AS DOUBLE[])), 4) AS m,
        |  round(list_min(CAST(embedding AS DOUBLE[])), 4) AS mn,
        |  round(list_max(CAST(embedding AS DOUBLE[])), 4) AS mx,
        |  CAST(len(embedding) AS INT) AS n
        |FROM embeddings WHERE vec_id < 50 ORDER BY vec_id""".stripMargin,
    "struct_functions" ->
      """SELECT c_custkey,
        |  c_name AS sname,
        |  c_acctbal AS sbal,
        |  concat('{"name":"', c_name, '","bal":', CAST(c_acctbal AS VARCHAR), '}') AS sjson
        |FROM customer ORDER BY c_custkey LIMIT 500""".stripMargin,
    "json_functions" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_via_map,
        |  json_extract_string(props, '$.nope') AS missing,
        |  concat('{"t":"', event_type, '","u":', CAST(user_id AS VARCHAR), '}') AS built
        |FROM events ORDER BY event_id LIMIT 1000""".stripMargin,
    "tvf_json_each" ->
      """SELECT event_id, 'k' AS key, CAST(json_extract_string(props, '$.k') AS BIGINT) AS value
        |FROM events ORDER BY event_id, key LIMIT 1000""".stripMargin,
    "json_flatten_profile" ->
      """SELECT event_type AS t, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(user_id) AS BIGINT) AS su,
        |  CAST(SUM(CASE WHEN event_id % 3 <> 0 THEN user_id % 7 END) AS BIGINT) AS sv,
        |  CAST(SUM(CAST((user_id % 100) + 0.5 AS DECIMAL(18,6))) AS DOUBLE) AS sr,
        |  CAST(COUNT(CASE WHEN event_id % 10 = 0 THEN 1 END) AS BIGINT) AS nr
        |FROM events GROUP BY event_type ORDER BY t""".stripMargin)
}
