package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.sources.Lake

/** Property-based checks of the lake table invariants that matter at
  * fleet scale: randomized delete-vector stacks match a relational
  * model, and partition values survive the Hive path-escaping round
  * trip for arbitrary printable strings. */
class LakePropertySpec extends SparkSuite {

  /** Same scalatest/scalacheck bridge as PropertySpec (no bridge
    * artifact in the offline cache): few, big cases. */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(res.passed, res.status.toString)
  }
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("stacked deleteMor of arbitrary id sets == relational NOT IN; fold preserves") {
    val idSets = Gen.listOfN(2, Gen.listOf(Gen.choose(0L, 499L)).map(_.toSet))
    check(forAll(idSets) { sets =>
      val dir = tmp("prop_mor")
      Lake.write(spark.range(0, 500).select($"id".as("k"), ($"id" * 3).as("v"))
        .repartition(4), dir, Nil)
      sets.foreach { s =>
        if (s.nonEmpty) Lake.deleteMor(spark, dir, col("k").isInCollection(s))
      }
      val expect = (0L until 500L).filterNot(sets.flatten.toSet).sorted
      val masked = Lake.read(spark, dir).select($"k").as[Long].collect().sorted
      Lake.foldDeletes(spark, dir)
      val folded = Lake.read(spark, dir).select($"k").as[Long].collect().sorted
      val ok = masked.toSeq == expect && folded.toSeq == expect
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      ok
    })
  }

  test("partition values round-trip Hive path escaping for arbitrary printable strings") {
    // printable ASCII incl. the escaped set ( % : / = # etc.), no
    // empty string (that is the Hive default-partition sentinel)
    val partVal = Gen.nonEmptyListOf(Gen.choose(32.toChar, 126.toChar))
      .map(_.mkString.trim).suchThat(_.nonEmpty)
    check(forAll(Gen.listOfN(3, partVal)) { raws =>
      val vals = raws.distinct
      val dir = tmp("prop_esc")
      val df = vals.zipWithIndex.flatMap { case (v, i) =>
        Seq((i.toLong, v), (i + 100L, v)) }.toDF("k", "p")
      Lake.write(df, dir, Seq("p"))
      val got = Lake.read(spark, dir).select($"p").distinct()
        .as[String].collect().toSet
      // and partition pruning by the raw value still finds the rows
      val one = Lake.read(spark, dir).filter($"p" === vals.head).count()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      got == vals.toSet && one == 2L
    })
  }

  test("deleteMor versions compose with append: mask applies only to pre-append files") {
    val gen = Gen.zip(Gen.listOf(Gen.choose(0L, 199L)).map(_.toSet),
      Gen.choose(1, 50))
    check(forAll(gen) { case (dels, nNew) =>
      val dir = tmp("prop_morapp")
      Lake.write(spark.range(0, 200).select($"id".as("k")), dir, Nil)
      if (dels.nonEmpty) Lake.deleteMor(spark, dir, col("k").isInCollection(dels))
      Lake.write(spark.range(1000, 1000 + nNew).select($"id".as("k")),
        dir, Nil, mode = "append")
      val got = Lake.read(spark, dir).select($"k").as[Long].collect().sorted
      val expect = ((0L until 200L).filterNot(dels) ++
        (1000L until (1000L + nNew))).sorted
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      got.toSeq == expect
    })
  }
}
