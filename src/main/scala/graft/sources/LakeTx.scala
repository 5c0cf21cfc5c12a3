package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-table ATOMIC visibility for lake tables — the reference's
  * multi-table load transaction (Stream Load TX / INSERT groups): a
  * catalog file pins (table → snapshot version); a commit writes every
  * table's new snapshot FIRST (unreferenced — invisible to catalog
  * readers) and then swaps the single catalog pointer via
  * write-temp + atomic rename. Readers resolving through the catalog
  * therefore see all of a transaction's tables or none of them; a
  * crash before the swap leaves the previous catalog intact and the
  * orphaned snapshots are vacuum fodder.
  *
  * The swap is one ~100-byte file rename regardless of data size —
  * the same O(1) commit point every table-format catalog uses. */
object LakeTx {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def catalogFile(root: String) = new Path(s"$root/_catalog.json")

  /** Current pinned versions (empty before the first commit). */
  def catalog(spark: SparkSession, root: String): Map[String, Int] = {
    val f = fs(spark, root)
    if (!f.exists(catalogFile(root))) return Map.empty
    val in = f.open(catalogFile(root))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val node = new ObjectMapper().readTree(text)
    val out = scala.collection.mutable.Map[String, Int]()
    node.fields().forEachRemaining(e => out(e.getKey) = e.getValue.asInt)
    out.toMap
  }

  /** Atomically publish a multi-table write: each table's data commits
    * as its next snapshot, then ONE catalog swap makes every table's
    * new version visible together. Returns the published versions. */
  def commit(spark: SparkSession, root: String,
      writes: Map[String, (DataFrame, Seq[String])]): Map[String, Int] = {
    require(writes.nonEmpty, "empty transaction")
    val prior = catalog(spark, root)
    val next = prior ++ writes.map { case (t, (df, parts)) =>
      t -> Lake.write(df, s"$root/$t", parts, mode = "overwrite")
    }
    val mapper = new ObjectMapper()
    val json = next.toSeq.sortBy(_._1)
      .map { case (t, v) => s"${mapper.writeValueAsString(t)}:$v" }
      .mkString("{", ",", "}")
    val f = fs(spark, root)
    val tmp = new Path(s"$root/_catalog.json.tmp")
    val out = f.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    // rename over the old pointer: the atomic commit point
    f.delete(catalogFile(root), false)
    require(f.rename(tmp, catalogFile(root)), "catalog swap failed")
    next
  }

  /** Read a table at its CATALOG-pinned version (not the table's own
    * latest — a half-committed transaction stays invisible). */
  def read(spark: SparkSession, root: String, table: String): DataFrame = {
    val pinned = catalog(spark, root).getOrElse(table,
      throw new IllegalArgumentException(s"$table not in catalog at $root"))
    Lake.read(spark, s"$root/$table", Some(pinned))
  }
}
