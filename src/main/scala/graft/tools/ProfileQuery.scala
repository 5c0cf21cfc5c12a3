package graft.tools

import graft.{Engine, SparkEntry}

/** Dev tool: run a SparkEntry query and print its operator profile
  * (EXPLAIN ANALYZE view). args: sfDir queryName [queryName...] */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    require(args.nonEmpty, "usage: ProfileQuery sfDir queryName [queryName...]")
    val dir = args.head
    val all = SparkEntry.queries ++ graft.queries.Pipeline.benchOnly
    args.drop(1).foreach { name =>
      println(s"==== $name ====")
      println(graft.plans.QueryProfile.profileString(all(name)(spark, dir)))
    }
    spark.stop()
  }
}
