package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.operators.FlatJson

/** Flat JSON promotion: presence profiling, type-inference order
  * (long > double > string), hit-ratio cutoff, and the lossless
  * remain column.
  */
class FlatJsonSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    """{"a":1,"b":"x","c":1.5,"nest":{"z":1}}""",
    """{"a":2,"b":"y","c":3,"rare":"only-here"}""",
    """{"a":3,"b":"z","c":2.5}""",
    """{"a":4,"b":"w"}""").toDF("j")

  test("profile counts presence and infers types in reference order") {
    val p = FlatJson.profile(docs, "j").map(f => f.key -> f).toMap
    assert(p("a").tpe === LongType && p("a").ratio === 1.0)
    assert(p("b").tpe === StringType)
    assert(p("c").tpe === DoubleType && p("c").hits === 3) // "3" alone is long, the set is double
    assert(p("nest").tpe === StringType) // nested object -> its JSON text
    assert(p("rare").ratio === 0.25)
  }

  test("flatten promotes frequent fields, keeps the rest in remain") {
    val flat = FlatJson.flatten(docs, "j", minHitRatio = 0.5)
    assert(flat.columns.toSet === Set("a", "b", "c", "j_remain"))
    val rows = flat.orderBy("a").collect()
    assert(rows(0).getLong(0) === 1L && rows(0).getString(1) === "x" && rows(0).getDouble(2) === 1.5)
    // integer-typed "3" reads back as double through the inferred type
    assert(rows(1).getDouble(2) === 3.0)
    // missing c -> null, not a parse error
    assert(rows(3).isNullAt(2))
    // remain holds exactly the un-promoted keys
    val remains = flat.select(col("j_remain")).orderBy(col("a")).as[String].collect()
    assert(remains.exists(_.contains("rare")) && remains.exists(_.contains("nest")))
    assert(!remains.exists(r => r.contains("\"a\"") || r.contains("\"b\"")))
    assert(remains.count(_ == "{}") === 2) // docs with nothing left over
  }

  test("flatten is information-preserving: extracted + remain covers every key") {
    val flat = FlatJson.flatten(docs, "j", minHitRatio = 0.5)
    val remainKeys = flat
      .select(explode(from_json(col("j_remain"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))))
      .select(col("key")).distinct().as[String].collect().toSet
    assert(remainKeys === Set("nest", "rare"))
  }

  test("null and empty documents survive") {
    val weird = Seq("""{"a":1}""", null, """{}""").toDF("j")
    val p = FlatJson.profile(weird, "j")
    assert(p.map(_.key) === Seq("a"))
    val flat = FlatJson.flatten(weird, "j", minHitRatio = 0.4)
    assert(flat.count() === 3)
  }
}
