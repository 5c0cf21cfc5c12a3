package graft.tools

import graft.{Engine, SparkEntry}

/** Dev tool: run a SparkEntry query and print its operator profile
  * (EXPLAIN ANALYZE view). args: sfDir queryName [queryName...] */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.head
    args.drop(1).foreach { name =>
      println(s"==== $name ====")
      println(graft.plans.QueryProfile.profileString(SparkEntry.queries(name)(spark, dir)))
    }
    spark.stop()
  }
}
