package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Flat JSON — promote frequently-present JSON fields to typed
  * columns (reference: `docs/en/using_starrocks/Flat_json.md`,
  * BE `be/src/storage/flat_json_*`): the reference profiles a JSON
  * column at compaction, extracts fields whose presence ratio clears
  * a threshold into typed subcolumns (BIGINT > DOUBLE > STRING by
  * inference), and keeps everything else in a `remain` JSON so no
  * data is lost.
  *
  * Same contract here, over any DataFrame JSON-string column:
  *
  *  - [[profile]]: one distributed pass — parse each document as
  *    map<string,string>, explode, per-key presence + castability
  *    counts. The collect is bounded by the number of DISTINCT KEYS
  *    (schema-scale, not data-scale — same driver footprint as any
  *    schema inference).
  *  - [[flatten]]: fields with hit ratio >= threshold become typed
  *    top-level columns (codegen'd get_json_object + cast — the
  *    columnar fast path); the rest stay in a `<col>_remain` JSON
  *    built by map_filter, so `flatten` is information-preserving.
  *
  * Scale shape: profile is scan + one agg keyed by json key (tiny);
  * flatten is pure per-row expressions (no shuffle). At 100 TB the
  * expensive repeated JSON parse of hot fields happens ONCE here
  * instead of in every downstream query — the reference's stated
  * purpose for the feature.
  */
object FlatJson {

  final case class FieldStat(key: String, hits: Long, ratio: Double, tpe: DataType)

  private val asMap = MapType(StringType, StringType)

  /** Presence + inferred type per JSON key. Type inference mirrors
    * the reference's order: BIGINT if every present value casts to
    * long, else DOUBLE if every present value casts to double, else
    * STRING (nested objects/arrays surface as their JSON text).
    */
  def profile(df: DataFrame, jsonCol: String): Seq[FieldStat] = {
    val total = df.where(col(jsonCol).isNotNull).count()
    if (total == 0) return Seq.empty
    // JSON parse per row is the cost here — spread a degenerate
    // single-split scan before it (no-op with real file splits)
    val kv = Ops.fanOut(df.select(col(jsonCol)))
      .select(explode(from_json(col(jsonCol), asMap)).as(Seq("k", "v")))
    // Integer lexeme check, NOT cast-to-long: Spark's lenient cast turns
    // "1.5" into 1L (non-null), which would misclassify every double as long.
    kv.groupBy(col("k")).agg(
        count(lit(1)).as("hits"),
        count(col("v")).as("nonnull"),
        count(when(col("v").rlike("^[+-]?\\d+$"), lit(1))).as("longs"),
        count(col("v").cast("double")).as("doubles"))
      .collect() // one row per distinct key — schema-scale
      .map { r =>
        val (hits, nonnull) = (r.getLong(1), r.getLong(2))
        val tpe =
          if (nonnull > 0 && r.getLong(3) == nonnull) LongType
          else if (nonnull > 0 && r.getLong(4) == nonnull) DoubleType
          else StringType
        FieldStat(r.getString(0), hits, hits.toDouble / total, tpe)
      }
      .sortBy(_.key).toSeq
  }

  /** Extract every field whose presence ratio clears `minHitRatio`
    * into a typed column named after the key; keep un-extracted
    * fields in `<jsonCol>_remain` (valid JSON, "{}" when empty).
    * The source JSON column is replaced by its flat projection.
    *
    * `profileOn`: run the key-discovery scan on this frame instead of
    * the full input — the reference profiles flat-JSON shape on
    * SAMPLED ingest data for the same reason: the profile pass parses
    * every doc it sees, and at 100 TB a deterministic slice (e.g. a
    * stable id-hash band) fixes the promoted-column set at a fraction
    * of the cost while the extract pass still reads everything. The
    * caller owns the slice's representativeness: a key whose presence
    * ratio sits near `minHitRatio` can promote differently than under
    * a full profile.
    */
  def flatten(df: DataFrame, jsonCol: String, minHitRatio: Double = 0.3,
      profileOn: Option[DataFrame] = None): DataFrame = {
    val fields = profile(profileOn.getOrElse(df), jsonCol)
      .filter(_.ratio >= minHitRatio)
    val keep = fields.map(_.key)
    val extracted = fields.map { f =>
      get_json_object(col(jsonCol), s"$$.${f.key}").cast(f.tpe).as(f.key)
    }
    val remain = to_json(map_filter(from_json(col(jsonCol), asMap),
      (k, _) => !k.isin(keep: _*))).as(s"${jsonCol}_remain")
    val others = df.columns.filterNot(_ == jsonCol).map(col).toSeq
    // the extraction parses the JSON column (fields + 1) times per
    // row — CPU-bound; spread a degenerate-parallelism input first
    Ops.fanOut(df).select(others ++ extracted :+ remain: _*)
  }
}
