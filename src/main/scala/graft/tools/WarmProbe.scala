package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Engine, Session, SparkEntry}

/** Cold vs warm per-query timing: how much of sf0.1 wall-clock is
  * one-time codegen/planning vs steady-state execution. */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.configure(SparkSession.builder().appName("warmprobe"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Session.prepare(spark)
    val qs = Seq("q1_pricing_summary", "q6_forecast_revenue", "q5_local_supplier_volume",
      "q21_waiting_supplier", "win_ntile_cume", "agg_percentiles", "subq_scalar_correlated")
    qs.foreach { name =>
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[warm] $name cold=${times.head}%.2f warm=${times.tail.min}%.2f")
    }
    spark.stop()
  }
}
