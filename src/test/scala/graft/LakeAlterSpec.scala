package graft

import org.apache.spark.sql.functions._
import graft.sources.Lake

/** Fast schema evolution (`Lake.addColumn` / `dropColumn` /
  * `renameColumn`) — metadata-only ALTER TABLE, the reference's fast
  * schema evolution (schema changes as catalog operations, data files
  * untouched). */
class LakeAlterSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def mk = spark.range(0, 1000)
    .select($"id".as("k"), ($"id" % 5).cast("int").as("grp"),
      ($"id" * 2).cast("double").as("price"))

  test("addColumn is metadata-only; old files surface NULL, appends fill it") {
    val dir = tmp("alter_add")
    Lake.write(mk, dir, Nil)
    val before = Lake.readSnapshot(spark, dir, 1)
    Lake.addColumn(spark, dir, "note", org.apache.spark.sql.types.StringType)
    val after = Lake.readSnapshot(spark, dir, 2)
    assert(after.files.map(_.path) === before.files.map(_.path), "no rewrite")
    assert(after.schema.fieldNames.toSeq === Seq("k", "grp", "price", "note"))
    assert(Lake.read(spark, dir).filter($"note".isNull).count() === 1000L)
    Lake.write(Seq((5000L, 1, 1.0, "tagged")).toDF("k", "grp", "price", "note"),
      dir, Nil, mode = "append")
    assert(Lake.read(spark, dir).filter($"note" === "tagged").count() === 1L)
  }

  test("dropColumn is metadata-only; time travel still sees the column") {
    val dir = tmp("alter_drop")
    Lake.write(mk, dir, Nil)
    Lake.dropColumn(spark, dir, "price")
    val after = Lake.readSnapshot(spark, dir, 2)
    assert(after.schema.fieldNames.toSeq === Seq("k", "grp"))
    assert(Lake.readSnapshot(spark, dir, 1).files.map(_.path) ===
      after.files.map(_.path))
    assert(!Lake.read(spark, dir).columns.contains("price"))
    assert(Lake.read(spark, dir, Some(1)).columns.contains("price"))
    intercept[IllegalArgumentException] { Lake.dropColumn(spark, dir, "nope") }
  }

  test("renameColumn is metadata-only; reads render the new name; appends map back") {
    val dir = tmp("alter_ren")
    Lake.write(mk, dir, Nil)
    val v = Lake.renameColumn(spark, dir, "price", "amount")
    val snap = Lake.readSnapshot(spark, dir, v)
    assert(snap.files.map(_.path) ===
      Lake.readSnapshot(spark, dir, 1).files.map(_.path), "no rewrite")
    val df = Lake.read(spark, dir)
    assert(df.columns.toSeq === Seq("k", "grp", "amount"))
    assert(df.agg(sum($"amount")).collect()(0).getDouble(0) ===
      (0 until 1000).map(_ * 2.0).sum)
    // append with the LOGICAL name: physical files keep the old name
    Lake.write(Seq((9999L, 0, 123.0)).toDF("k", "grp", "amount"),
      dir, Nil, mode = "append")
    val df2 = Lake.read(spark, dir)
    assert(df2.columns.toSeq === Seq("k", "grp", "amount"))
    assert(df2.filter($"k" === 9999).select($"amount").as[Double].head() === 123.0)
    // physical schema in the manifest still uses the original name
    assert(Lake.readSnapshot(spark, dir, Lake.currentVersion(spark, dir))
      .schema.fieldNames.contains("price"))
  }

  test("filter on a renamed column still prunes files via manifest stats") {
    val dir = tmp("alter_ren_prune")
    Lake.sortKeyWrite(mk, dir, Seq("k"), nFiles = 8)
    Lake.renameColumn(spark, dir, "k", "key_id")
    val (df, index) = Lake.readIndexed(spark, dir)
    val got = df.filter($"key_id" === 777L).select($"grp").collect()
    assert(got.map(_.getInt(0)).toSeq === Seq((777 % 5)))
    assert(index.lastStatsSkippedFileCount >= 6,
      s"stats pruning through rename broken: skipped=${index.lastStatsSkippedFileCount}")
  }

  test("CoW update after rename materializes the rename once, then updates") {
    val dir = tmp("alter_ren_cow")
    Lake.write(mk, dir, Nil)
    Lake.renameColumn(spark, dir, "price", "amount")
    Lake.update(spark, dir, col("k") < 10, Map("amount" -> lit(-1.0)))
    val df = Lake.read(spark, dir)
    assert(df.columns.toSeq === Seq("k", "grp", "amount"))
    assert(df.filter($"amount" === -1.0).count() === 10L)
    // rename props cleared by materialization
    val snap = Lake.readSnapshot(spark, dir, Lake.currentVersion(spark, dir))
    assert(!snap.props.keys.exists(_.startsWith("rename.")))
    assert(snap.schema.fieldNames.contains("amount"))
  }

  test("rename chains resolve to the original physical name") {
    val dir = tmp("alter_ren_chain")
    Lake.write(mk, dir, Nil)
    Lake.renameColumn(spark, dir, "price", "amount")
    Lake.renameColumn(spark, dir, "amount", "cost")
    val df = Lake.read(spark, dir)
    assert(df.columns.toSeq === Seq("k", "grp", "cost"))
    val snap = Lake.readSnapshot(spark, dir, Lake.currentVersion(spark, dir))
    assert(snap.props("rename.price") === "cost")
    assert(snap.props.size === 1)
  }

  test("deleteMor predicate binds logical names on a renamed table") {
    val dir = tmp("alter_ren_mor")
    Lake.write(mk, dir, Nil)
    Lake.renameColumn(spark, dir, "price", "amount")
    Lake.deleteMor(spark, dir, col("amount") >= 1000.0)
    assert(Lake.read(spark, dir).count() === 500L)
  }

  test("partition columns refuse rename/drop; duplicate names refuse") {
    val dir = tmp("alter_guard")
    Lake.write(mk, dir, Seq("grp"))
    intercept[IllegalArgumentException] { Lake.renameColumn(spark, dir, "grp", "g2") }
    intercept[IllegalArgumentException] { Lake.dropColumn(spark, dir, "grp") }
    intercept[IllegalArgumentException] { Lake.renameColumn(spark, dir, "price", "k") }
    intercept[IllegalArgumentException] { Lake.addColumn(spark, dir, "k",
      org.apache.spark.sql.types.StringType) }
  }

  test("referencesColumn: identifiers yes, string-literal text no") {
    assert(Lake.referencesColumn("a + b", "a"))
    assert(Lake.referencesColumn("`a` + 1", "a"))
    assert(!Lake.referencesColumn("abc + 1", "a"))
    // literal text must not read as a reference...
    assert(!Lake.referencesColumn("concat(x, 'a')", "a"))
    assert(!Lake.referencesColumn("concat(x, 'it''s a day')", "a"))
    // ...but identifiers AROUND literals still do
    assert(Lake.referencesColumn("concat(a, 'x')", "a"))
    assert(Lake.referencesColumn("concat('x', a)", "a"))
    // unbalanced quoting degrades to over-matching (fail-safe)
    assert(Lake.referencesColumn("x || 'unterminated a", "a"))
  }

  test("unescapePathName: %XX decodes, '+' stays literal, UTF-8 runs") {
    import graft.sources.PathNames.unescapePathName
    assert(unescapePathName("a+b") === "a+b")
    assert(unescapePathName("a%20b") === "a b")
    assert(unescapePathName("a%2Bb") === "a+b")
    assert(unescapePathName("%C3%A9t%C3%A9") === "été")
    assert(unescapePathName("100%") === "100%")
    assert(unescapePathName("%zz") === "%zz")
    assert(unescapePathName("plain") === "plain")
  }
}
