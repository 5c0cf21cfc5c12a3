package graft.tools

import graft.{Engine, Tables}

/** Dev tool: time ad-hoc SQL against the registered tables (noop
  * sink, 1 warm + 3 timed, median) — for isolating which expression
  * in a slow gate carries the cost. args: sfDir sql [sql...] */
object SqlBench {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.head
    Tables.registerAll(spark, dir)
    args.drop(1).foreach { sql =>
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.sql(sql).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val ts = (1 to 3).map(_ => once()).sorted
      println(f"${ts(1)}%8.3f s  | ${sql.replaceAll("\\s+", " ").take(110)}")
    }
    spark.stop()
  }
}
