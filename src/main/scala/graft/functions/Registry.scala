package graft.functions

import org.apache.spark.sql.SparkSession

/** Central registration point for graft's SQL-visible functions.
  *
  * Mirrors the reference's function registry
  * (`gensrc/script/functions.py`, `be/src/exprs/agg/factory/`): every
  * compat alias and custom expression/aggregate the engine adds to
  * Spark's FunctionRegistry goes through here so `Engine.session` and
  * the test harness agree on the surface.
  */
object Registry {
  @volatile private var registered = false

  def registerAll(spark: SparkSession): Unit = synchronized {
    Compat.register(spark)
    registered = true
  }
}
