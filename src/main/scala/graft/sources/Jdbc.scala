package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** External JDBC table scan — the connector path.
  *
  * Reference: ConnectorScanNode + the JDBC connector
  * (`be/src/exec/connector_scan_node.cpp`,
  * `be/src/connector/jdbc/`, FE `ConnectorType.java` JDBC entry): an
  * external RDBMS table is a first-class scan source with predicate
  * pushdown and parallel range-split reads.
  *
  * Spark mapping: the built-in JDBC DataSource IS the connector —
  * filters and column pruning push into the remote SQL (visible as
  * `PushedFilters` on the RowDataSourceScan node), and
  * partitionColumn/numPartitions splits the scan into concurrent
  * range queries, the same splitting the reference's connector does.
  * The backing database here is in-process Derby (the only JDBC
  * engine in the sandbox); against MySQL/Postgres only the URL and
  * driver class change.
  */
object Jdbc {

  /** In-memory Derby instance shared by the JVM (driver+executors are
    * one process under local[*]; a real cluster would point at a real
    * network-reachable RDBMS instead). */
  val url = "jdbc:derby:memory:graftext;create=true"

  def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  /** Create-or-replace an external table from a DataFrame (test/dev
    * seeding for the roundtrip gates). */
  def loadTable(df: DataFrame, table: String): Unit = synchronized {
    // Derby has no DROP IF EXISTS; swallow the "does not exist" error
    val conn = DriverManager.getConnection(url)
    try {
      try conn.createStatement().executeUpdate(s"DROP TABLE $table")
      catch { case _: java.sql.SQLException => }
    } finally conn.close()
    df.write.mode(SaveMode.ErrorIfExists).jdbc(url, table, props)
  }

  /** Scan an external table (single connection). */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Parallel range-split scan: numPartitions concurrent range queries
    * over [lower, upper] of an integral column — the connector-side
    * split the reference plans for big external tables. */
  def readPartitioned(spark: SparkSession, table: String, partitionColumn: String,
      lower: Long, upper: Long, numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lower, upper, numPartitions, props)
}
