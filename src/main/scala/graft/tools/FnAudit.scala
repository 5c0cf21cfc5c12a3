package graft.tools

import graft.Engine

/** Dev tool: which reference function names resolve in this engine
  * (Spark builtins + graft registry)? args: file of names, one/line. */
object FnAudit {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    val names = scala.io.Source.fromFile(args(0)).getLines().map(_.trim).filter(_.nonEmpty).toSeq
    val missing = names.filterNot(n => spark.catalog.functionExists(n))
    println("MISSING_START")
    missing.foreach(println)
    println("MISSING_END")
    spark.stop()
  }
}
