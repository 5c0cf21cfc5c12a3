package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-table ATOMIC visibility for lake tables — the reference's
  * multi-table load transaction (Stream Load TX / INSERT groups): a
  * catalog file pins (table → snapshot version); a commit writes every
  * table's new snapshot FIRST (unreferenced — invisible to catalog
  * readers) and then publishes the next immutable `_catalog-vN.json`
  * via exclusive create; readers pick the highest N. Readers resolving
  * through the catalog therefore see all of a transaction's tables or
  * none of them; a crash before the publish leaves the previous
  * catalog file untouched (there is no delete/rename window in which
  * no catalog exists) and the orphaned snapshots are vacuum fodder.
  * Racing committers conflict on the exclusive create instead of
  * losing updates.
  *
  * The commit point is one ~100-byte file create regardless of data
  * size — the same O(1) commit point every table-format catalog uses. */
object LakeTx {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val CatalogName = """_catalog-v(\d+)\.json""".r

  private def catalogFile(root: String, v: Long) =
    new Path(f"$root/_catalog-v$v%06d.json")

  /** Highest committed catalog version, 0 if none. The catalog is a
    * monotone chain of immutable `_catalog-vN.json` files: readers pick
    * the max N, so there is never a moment with NO catalog visible (the
    * delete-then-rename swap this replaces had exactly that window). */
  private def latestCatalogVersion(spark: SparkSession, root: String): Long = {
    val f = fs(spark, root)
    val rootP = new Path(root)
    if (!f.exists(rootP)) return 0L
    f.listStatus(rootP).iterator.map(_.getPath.getName).collect {
      case CatalogName(n) => n.toLong
    }.foldLeft(0L)(math.max)
  }

  /** Current pinned versions (empty before the first commit). */
  def catalog(spark: SparkSession, root: String): Map[String, Int] =
    catalogAt(spark, root, latestCatalogVersion(spark, root))

  private def parseCatalog(spark: SparkSession, p: Path): Map[String, Int] = {
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = f.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val node = new ObjectMapper().readTree(text)
    val out = scala.collection.mutable.Map[String, Int]()
    node.fields().forEachRemaining(e => out(e.getKey) = e.getValue.asInt)
    out.toMap
  }

  private def catalogAt(spark: SparkSession, root: String, v: Long): Map[String, Int] = {
    if (v == 0L) {
      // Migration path: a root committed with the pre-versioned format
      // (single swap-by-rename `_catalog.json`) must not read as empty —
      // that would drop every pinned table on the next commit. Fall back
      // to the legacy file when no versioned catalog exists yet; the
      // next commit publishes its content (plus the tx) as v1.
      val legacy = new Path(s"$root/_catalog.json")
      if (fs(spark, root).exists(legacy)) return parseCatalog(spark, legacy)
      return Map.empty
    }
    parseCatalog(spark, catalogFile(root, v))
  }

  /** GC old immutable catalog versions (à la [[Lake.vacuum]]): keep the
    * newest `keepLast` versioned files, delete the rest plus any legacy
    * `_catalog.json` already superseded by a versioned commit. Readers
    * of retained versions are untouched; the latest is never deleted. */
  def vacuumCatalog(spark: SparkSession, root: String, keepLast: Int = 10): Seq[Long] = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val f = fs(spark, root)
    val rootP = new Path(root)
    if (!f.exists(rootP)) return Nil
    val vs = f.listStatus(rootP).iterator.map(_.getPath.getName).collect {
      case CatalogName(n) => n.toLong
    }.toSeq.sorted
    val drop = vs.dropRight(keepLast)
    drop.foreach(v => f.delete(catalogFile(root, v), false))
    val legacy = new Path(s"$root/_catalog.json")
    if (vs.nonEmpty && f.exists(legacy)) f.delete(legacy, false)
    drop
  }

  /** Atomically publish a multi-table write: each table's data commits
    * as its next snapshot, then ONE catalog-version publish makes every
    * table's new version visible together. Returns published versions.
    *
    * OCC: the base catalog version is read ONCE up front; the commit
    * point is the exclusive create of base+1, so a transaction that
    * raced past another's publish conflicts (never silently carries
    * the stale table pointers it read at start). `expectedVersion`
    * lets a caller (or test) pin the base explicitly for retry loops. */
  def commit(spark: SparkSession, root: String,
      writes: Map[String, (DataFrame, Seq[String])],
      expectedVersion: Option[Long] = None): Map[String, Int] = {
    require(writes.nonEmpty, "empty transaction")
    val baseV = expectedVersion.getOrElse(latestCatalogVersion(spark, root))
    val prior = catalogAt(spark, root, baseV)
    // a racing transaction can also conflict at an underlying TABLE's
    // manifest (both staged a write to the same table concurrently) —
    // surface it as the same retryable transaction-conflict signal the
    // catalog publish uses, so callers have ONE retry contract
    val next = prior ++ writes.map { case (t, (df, parts)) =>
      try t -> Lake.write(df, s"$root/$t", parts, mode = "overwrite")
      catch { case e: java.util.ConcurrentModificationException =>
        throw new IllegalStateException(
          s"transaction conflict on table $t — retry the transaction", e)
      }
    }
    val mapper = new ObjectMapper()
    val json = next.toSeq.sortBy(_._1)
      .map { case (t, v) => s"${mapper.writeValueAsString(t)}:$v" }
      .mkString("{", ",", "}")
    val f = fs(spark, root)
    // Exclusive publish of the NEXT catalog version is the atomic
    // commit point (AtomicPublish — torn-read-free): a racing
    // committer loses loudly instead of silently clobbering, and a
    // crash at any point leaves the previous catalog fully visible.
    val target = catalogFile(root, baseV + 1)
    try AtomicPublish.publish(spark, target, json.getBytes("UTF-8"))
    catch { case e: java.util.ConcurrentModificationException =>
      throw new IllegalStateException(
        s"concurrent catalog commit detected at $target — retry the transaction", e)
    }
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
