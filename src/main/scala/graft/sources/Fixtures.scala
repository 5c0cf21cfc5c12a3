package graft.sources

import org.apache.spark.sql.SparkSession

/** Locator for the VENDORED foreign-engine fixtures under
  * `src/test/resources/fixtures/` — real tables written by real
  * engines (paimon-0.4 via Flink/Spark, hudi-0.12, Delta-Lake 3.1.0 on
  * Apache Spark 3.5), copied from the reference's Apache-2.0-licensed
  * test resources (see fixtures/LICENSE-NOTICE.md). The foreign-interop
  * gates and specs read THESE tables, so they prove the readers against
  * bytes this repo never wrote.
  *
  * Resolution: `spark.graft.fixtures.dir` if set, else
  * `src/test/resources/fixtures` relative to the working directory
  * (the repo root for sbt, Verify and Bench alike). Missing fixtures
  * fail loudly with the expected location rather than as an opaque
  * read error. */
object Fixtures {

  def root(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.fixtures.dir").getOrElse(
      new java.io.File("src/test/resources/fixtures").getAbsolutePath)

  def dir(spark: SparkSession, name: String): String = {
    val d = new java.io.File(root(spark), name)
    require(d.exists,
      s"vendored fixture '$name' not found under ${root(spark)} — run from " +
        "the repo root or set spark.graft.fixtures.dir to the fixtures tree")
    d.getAbsolutePath
  }
}
