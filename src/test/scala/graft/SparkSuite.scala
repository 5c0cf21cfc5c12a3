package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared session across all suites (forked test JVM). */
object TestSpark {
  lazy val spark: SparkSession = Engine.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
}

trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sf: String = "/root/testdata/sf0.001"
  def table(name: String) = Tables.load(spark, sf, name)
}
