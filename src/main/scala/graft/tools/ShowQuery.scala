package graft.tools

import graft.{Engine, SparkEntry, Tables}

/** Dev tool: run a SparkEntry query and print its rows — used to
  * regenerate planted-fixture oracles. args: sfDir queryName... */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.head
    Tables.registerAll(spark, dir)
    args.drop(1).foreach { name =>
      println(s"==== $name ====")
      SparkEntry.queries(name)(spark, dir).show(1000, truncate = false)
    }
    spark.stop()
  }
}
