package graft

import org.apache.spark.sql.functions._
import graft.operators.Dictionary
import graft.sources.Lake

/** Persisted incremental global dictionary — the reference's
  * AUTO_INCREMENT global-dict acceleration
  * (`docs/en/using_starrocks/query_acceleration_with_auto_increment.md`):
  * stable ids across loads, fresh ids above the high-water mark.
  */
class GlobalDictSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/d"

  test("ids are stable across loads; new values get fresh ids") {
    val dict = tmp("gdict")
    val load1 = spark.range(0, 100).select(concat(lit("u"), $"id").as("u"))
    Dictionary.upsertGlobalDict(spark, dict, load1, "u")
    val ids1 = Lake.read(spark, dict).as[(String, Long)].collect().toMap
    assert(ids1.size === 100)
    assert(ids1.values.toSet.size === 100, "ids must be unique")
    // second load: 50 repeats + 50 new
    val load2 = spark.range(50, 150).select(concat(lit("u"), $"id").as("u"))
    Dictionary.upsertGlobalDict(spark, dict, load2, "u")
    val ids2 = Lake.read(spark, dict).as[(String, Long)].collect().toMap
    assert(ids2.size === 150)
    assert(ids2.values.toSet.size === 150)
    ids1.foreach { case (v, id) =>
      assert(ids2(v) === id, s"id of $v changed across loads") }
    // new ids sit above every old id (monotonic high-water contract)
    val oldMax = ids1.values.max
    (100 until 150).foreach(i =>
      assert(ids2(s"u$i") > oldMax, s"u$i id not above high-water"))
    // no-op load: all values known -> no new version
    val v = Lake.currentVersion(spark, dict)
    assert(Dictionary.upsertGlobalDict(spark, dict, load1, "u") === v)
  }

  test("encodeGlobal attaches ids; distinct counts agree with strings") {
    val dict = tmp("gdict2")
    val df = spark.range(0, 1000)
      .select(($"id" % 37).cast("string").as("k"), $"id".as("x"))
    Dictionary.upsertGlobalDict(spark, dict, df, "k")
    val enc = Dictionary.encodeGlobal(spark, df, "k", dict)
    assert(enc.filter($"k_id".isNull).count() === 0L)
    assert(enc.select(countDistinct($"k_id")).as[Long].head() ===
      df.select(countDistinct($"k")).as[Long].head())
    // unknown values encode as NULL
    val foreign = Seq("zzz").toDF("k")
    assert(Dictionary.encodeGlobal(spark, foreign, "k", dict)
      .filter($"k_id".isNull).count() === 1L)
    // NULL values are never loaded
    Dictionary.upsertGlobalDict(spark, dict,
      Seq(null.asInstanceOf[String], "fresh").toDF("k"), "k")
    assert(Lake.read(spark, dict).filter($"value".isNull).count() === 0L)
    assert(Lake.read(spark, dict).filter($"value" === "fresh").count() === 1L)
  }

  test("maybeCompact: a structurally-impossible compact reports no action") {
    val dir = tmp("mcomp2")
    // 5 small files, one per partition — compact has nothing to group
    Lake.write(spark.range(0, 500).select($"id".as("k"),
      ($"id" % 5).cast("int").as("p")).coalesce(1), dir, Seq("p"))
    val s = Lake.compactionScore(spark, dir, smallFileBytes = 512L << 20)
    assert(s.smallFiles >= 4)
    assert(Lake.maybeCompact(spark, dir, smallFileBytes = 512L << 20).isEmpty,
      "no version committed -> no action reported")
  }

  test("maybeCompact: small files trigger compact, DV debt triggers fold") {
    val dir = tmp("mcomp")
    // 6 tiny appends -> small-file debt
    Lake.write(spark.range(0, 100).select($"id".as("k")), dir, Nil)
    (1 to 5).foreach(i => Lake.write(
      spark.range(i * 100L, i * 100L + 100).select($"id".as("k")),
      dir, Nil, mode = "append"))
    val s1 = Lake.compactionScore(spark, dir)
    assert(s1.smallFiles >= 4)
    val Some(v1) = Lake.maybeCompact(spark, dir): @unchecked
    assert(Lake.read(spark, dir, Some(v1)).count() === 600L)
    assert(Lake.compactionScore(spark, dir).files <
      s1.files, "compaction must shrink the file count")
    // below thresholds: no action
    assert(Lake.maybeCompact(spark, dir).isEmpty)
    // DV debt above ratio (but few small files) -> fold only
    Lake.deleteMor(spark, dir, $"k" % 10 === 0)
    val s2 = Lake.compactionScore(spark, dir)
    assert(s2.dvRows === 60L && s2.dvRatio > 0.05)
    val Some(v2) = Lake.maybeCompact(spark, dir): @unchecked
    assert(Lake.readSnapshot(spark, dir, v2).dvFiles.isEmpty, "fold expected")
    assert(Lake.read(spark, dir).count() === 540L)
    assert(Lake.maybeCompact(spark, dir).isEmpty)
  }
}
