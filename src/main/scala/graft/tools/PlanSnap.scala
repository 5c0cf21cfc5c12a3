package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.{Engine, Session, SparkEntry}

/** Dev tool: snapshot `explain("formatted")` for named gates into
  * plans/<tag>/<gate>_<suffix>.txt — the before/after plan evidence
  * for optimization rounds. args: sfDir tag suffix gate [gate...] */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanSnap sfDir tag suffix gate...")
    val Array(sfDir, tag, suffix) = args.take(3)
    val spark = Engine.session()
    spark.sparkContext.setLogLevel("ERROR")
    Session.prepare(spark)
    val all = SparkEntry.queries ++ graft.queries.Pipeline.benchOnly
    Files.createDirectories(Paths.get(s"plans/$tag"))
    args.drop(3).foreach { name =>
      val df = all(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(s"plans/$tag/${name}_$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      println(s"wrote plans/$tag/${name}_$suffix.txt (${plan.linesIterator.size} lines)")
    }
    spark.stop()
  }
}
