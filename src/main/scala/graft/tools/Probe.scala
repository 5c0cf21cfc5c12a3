package graft.tools

import graft.{Engine, Tables}

/** Scratch probe main for interactive development (not part of the
  * library surface). Pass Scala-ish SQL on the command line. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    Tables.registerAll(spark, args.headOption.getOrElse("/root/testdata/sf0.001"))
    args.drop(1).foreach { q =>
      try {
        val df = spark.sql(q)
        df.printSchema()
        df.show(20, truncate = false)
      } catch { case e: Throwable => println(s"ERROR: ${e}") }
    }
    spark.stop()
  }
}
