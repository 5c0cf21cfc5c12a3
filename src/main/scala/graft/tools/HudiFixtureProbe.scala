package graft.tools

import graft.Engine
import graft.sources.HudiRead

/** Dump a REAL hudi-0.12-written MoR fixture (the reference's
  * hudi-reader tests) through this repo's timeline + log readers —
  * the discovery run behind the HudiReadSpec foreign-interop pins. */
object HudiFixtureProbe {
  def main(args: Array[String]): Unit = {
    val table = args.headOption.getOrElse(
      "src/test/resources/fixtures/test_hudi_mor")
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    println("instants: " + HudiRead.instants(spark, table))
    HudiRead.liveGroups(spark, table).foreach { case (gid, g) =>
      println(s"group $gid base=${g.base.path} pp='${g.base.partitionPath}' logs=${g.logs}")
    }
    val base = spark.read.parquet(s"$table/" +
      HudiRead.liveGroups(spark, table).head._2.base.path)
    println("base schema: " + base.schema.treeString)
    base.show(20, false)
    val df = HudiRead.read(spark, table)
    println("merged:")
    df.show(20, false)
    // as-of the FIRST instant: base only
    val first = HudiRead.instants(spark, table).head
    println(s"as-of $first:")
    HudiRead.read(spark, table, Some(first)).show(20, false)
    spark.stop()
  }
}
