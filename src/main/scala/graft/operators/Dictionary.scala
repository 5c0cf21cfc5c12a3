package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global dictionary for LOW-CARDINALITY string columns — the
  * Spark-native shape of the reference's global-dict machinery
  * (FE low-cardinality dict optimization / `dict_mapping`,
  * `bitmap_dict`; the BE rewrites string group-bys and predicates to
  * int codes when a column's NDV is under its threshold).
  *
  * The dictionary is DETERMINISTIC: code = dense rank of the value in
  * sorted order, so two builds over the same value set agree — the
  * property that lets codes be persisted, shared across tables, and
  * reproduced by an oracle.
  *
  * Scale: `build` is a distinct + sort over the value set, which is
  * small BY CONTRACT (that is what low-cardinality means — the
  * reference likewise only builds dicts under an NDV cap); encode and
  * decode are broadcast hash joins against the kilobyte-sized dict,
  * adding no shuffle to the fact side. Aggregations and joins over
  * the encoded int column then shuffle 4-byte codes instead of
  * strings — the same win the reference's rewrite buys.
  */
object Dictionary {

  /** (value, code) pairs; codes are 1-based dense ranks in sorted
    * value order. NULL is not encoded (stays NULL through encode). */
  def build(df: DataFrame, valueCol: String): DataFrame = {
    val distinct = df.select(col(valueCol).as("value"))
      .filter(col("value").isNotNull).distinct()
    // the window runs over the (small, by contract) distinct set only
    distinct.withColumn("code",
      row_number().over(Window.orderBy(col("value"))).cast("int"))
  }

  /** Replace valueCol with its int code (column name preserved). */
  def encode(df: DataFrame, valueCol: String, dict: DataFrame): DataFrame = {
    val d = dict.withColumnRenamed("value", valueCol)
    df.join(broadcast(d), Seq(valueCol), "left")
      .drop(valueCol)
      .withColumnRenamed("code", valueCol)
  }

  /** Inverse of encode: int codes back to strings. */
  def decode(df: DataFrame, codeCol: String, dict: DataFrame): DataFrame = {
    val d = dict.withColumnRenamed("code", codeCol)
    df.join(broadcast(d), Seq(codeCol), "left")
      .drop(codeCol)
      .withColumnRenamed("value", codeCol)
  }

  // ---- persisted incremental global dictionary ----

  /** Upsert a batch of values into a PERSISTED global dictionary
    * backed by a Lake table of (value STRING, id LONG) — the
    * reference's AUTO_INCREMENT global-dict acceleration
    * (`docs/en/using_starrocks/query_acceleration_with_auto_increment.md`:
    * map string keys to integer ids once at load time, then
    * COUNT(DISTINCT) and joins run on 8-byte ids). Unlike [[build]]'s
    * dense ranks, ids here are STABLE across loads: existing values
    * keep their id, new values get fresh ids above the table's
    * high-water mark — unique and monotonically increasing with gaps
    * allowed, the AUTO_INCREMENT contract.
    *
    * Scale: new-value discovery is one anti-join of the batch's
    * distinct values against the dict; id assignment is
    * `monotonically_increasing_id` plus the persisted high-water
    * offset — no global sort, no single-partition window, no dict
    * scan for max(id) (the next offset rides the snapshot props; the
    * per-load id budget is numPartitions × 2^33, burned from a
    * 63-bit space). Concurrent loaders are safe: the id range is
    * RESERVED first — an OCC props commit pinned to the version the
    * offset was read from — so a racing loader conflicts before any
    * row lands; a crash after the reservation wastes the range (gaps
    * are allowed), and a lost ceiling prop is recovered by a one-off
    * max(id) scan. Returns the dict version. */
  def upsertGlobalDict(spark: org.apache.spark.sql.SparkSession,
      dictTable: String, values: DataFrame, valueCol: String): Int = {
    val vals = values.select(col(valueCol).cast("string").as("value"))
      .filter(col("value").isNotNull).distinct()
    val cur = graft.sources.Lake.currentVersion(spark, dictTable)
    val fresh =
      if (cur == 0) Pins.loopPin(vals)
      else Pins.loopPin(vals.join(graft.sources.Lake.read(spark, dictTable)
        .select(col("value")), Seq("value"), "left_anti"))
    if (cur > 0 && fresh.isEmpty) return cur
    val parts = math.max(fresh.rdd.getNumPartitions, 1).toLong
    if (cur == 0) {
      // first build: write rows with ids from 1, then record the
      // ceiling. A racing first build conflicts on the v1 commit; a
      // crash before setProps is healed by the scan-max fallback below.
      val assigned = fresh.withColumn("id",
        monotonically_increasing_id() + lit(1L))
      val v = graft.sources.Lake.write(assigned, dictTable, Nil)
      return graft.sources.Lake.setProps(spark, dictTable,
        Map("dict.nextId" -> (1L + (parts << 33)).toString),
        expectVersion = Some(v))
    }
    // RESERVE the id range FIRST (an OCC metadata commit pinned to the
    // current version — a racing loader conflicts here, BEFORE any row
    // lands, so duplicate ids are impossible; a crash after the
    // reservation merely wastes the range, which AUTO_INCREMENT
    // permits), then write the rows inside it. If a past crash lost
    // the ceiling prop, recover it from the table itself.
    val snap = graft.sources.Lake.readSnapshot(spark, dictTable, cur)
    val offset = snap.props.get("dict.nextId").map(_.toLong).getOrElse {
      graft.sources.Lake.read(spark, dictTable)
        .agg(max(col("id"))).head.getLong(0) + 1L
    }
    graft.sources.Lake.setProps(spark, dictTable,
      Map("dict.nextId" -> (offset + (parts << 33)).toString),
      expectVersion = Some(cur))
    val assigned = fresh.withColumn("id",
      monotonically_increasing_id() + lit(offset))
    graft.sources.Lake.write(assigned, dictTable, Nil, mode = "append")
  }

  /** Attach the dictionary id for `valueCol` as `<valueCol>_id`
    * (NULL for values never loaded into the dict). The dict side can
    * be arbitrarily large — this is a plain keyed join, broadcast
    * only when the planner decides it fits. */
  def encodeGlobal(spark: org.apache.spark.sql.SparkSession,
      df: DataFrame, valueCol: String, dictTable: String): DataFrame = {
    val d = graft.sources.Lake.read(spark, dictTable)
      .select(col("value").as(valueCol), col("id").as(s"${valueCol}_id"))
    df.withColumn(valueCol, col(valueCol).cast("string"))
      .join(d, Seq(valueCol), "left")
  }
}
