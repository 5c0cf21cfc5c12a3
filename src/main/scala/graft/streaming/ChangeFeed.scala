package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Lake

/** Exactly-once incremental consumption of a Lake table's row-level
  * change feed ([[Lake.changes]]) — the downstream half of the
  * reference's incremental-MV / CDC-subscription story, in the same
  * ledger shape as [[RoutineLoad]]: a tiny cursor file records the
  * last APPLIED version; each [[poll]] hands the consumer the
  * `changes(cursor, current)` retraction rows and advances the cursor
  * only AFTER the apply returns. A crash between apply and cursor
  * commit replays the same (from, to] window — at-least-once apply +
  * an idempotent consumer (write state keyed by the `to` version and
  * pointer-swap, as the gate demonstrates) = exactly-once state.
  *
  * Scale: each poll moves O(rows changed since the cursor) — the
  * feed is manifest-derived, so a poll against a 100 TB table that
  * ingested one batch reads one batch.
  *
  * Retention contract (the Delta-CDF constraint): a poll reads the
  * manifests and data files of every version in (cursor, current], so
  * [[Lake.vacuum]]'s `retainLast` must cover the slowest consumer's
  * lag — a cursor older than the retained window fails the poll
  * (missing manifest) rather than serving partial changes. */
object ChangeFeed {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Last applied version, or None before the first poll. A crash
    * inside [[commitCursor]]'s delete-then-rename window leaves only
    * the fully-written `.tmp` — recover from it rather than falling
    * back to `initialVersion` and replaying all history (or failing
    * on vacuumed versions). */
  def readCursor(spark: SparkSession, ledgerPath: String): Option[Long] = {
    val f = fs(spark, ledgerPath)
    def slurp(p: Path): Option[Long] =
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
        Some(new String(bytes, "UTF-8").trim.toLong)
      }
    slurp(new Path(ledgerPath)).orElse(slurp(new Path(ledgerPath + ".tmp")))
  }

  def commitCursor(spark: SparkSession, ledgerPath: String, v: Long): Unit = {
    val f = fs(spark, ledgerPath)
    val tmp = new Path(ledgerPath + ".tmp")
    // the tmp file is COMPLETE before the live file is deleted, so
    // readCursor can always recover the newest committed value
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    f.delete(new Path(ledgerPath), false)
    if (!f.rename(tmp, new Path(ledgerPath)))
      throw new IllegalStateException(s"cursor commit failed at $ledgerPath")
  }

  /** One poll. `apply(changes, from, to)` receives the retraction
    * rows for (from, to]; the cursor advances to `to` only after it
    * returns. Returns the applied window, or None when the table has
    * nothing new. `initialVersion` seeds the cursor on the very first
    * poll (the version the consumer's baseline state was built at).
    * `failBeforeCommit` simulates a crash after the apply (test hook
    * for the replay proof). */
  def poll(spark: SparkSession, table: String, ledgerPath: String,
      initialVersion: Int = 1, failBeforeCommit: Boolean = false)(
      apply: (DataFrame, Int, Int) => Unit): Option[(Int, Int)] = {
    val cursor = readCursor(spark, ledgerPath)
      .map(_.toInt).getOrElse(initialVersion)
    val cur = Lake.currentVersion(spark, table)
    if (cur <= cursor) return None
    apply(Lake.changes(spark, table, cursor, cur), cursor, cur)
    if (failBeforeCommit)
      throw new IllegalStateException("simulated crash before cursor commit")
    commitCursor(spark, ledgerPath, cur)
    Some((cursor, cur))
  }

  /** [[poll]] against a DELTA table (any writer's — this repo's
    * export or a foreign one): the same ledger discipline over
    * [[graft.sources.DeltaRead.changesCdf]], which serves writer-side
    * `_change_data` files when the commit carries `cdc` actions and
    * falls back to the action-derived feed otherwise. The cursor
    * stores the last applied DELTA version (0-based — seed
    * `initialVersion = 0` to start after the initial commit, whose
    * rows are the baseline, not changes). */
  def pollDelta(spark: SparkSession, table: String, ledgerPath: String,
      initialVersion: Int = 0, failBeforeCommit: Boolean = false)(
      apply: (DataFrame, Int, Int) => Unit): Option[(Int, Int)] = {
    val cursor = readCursor(spark, ledgerPath)
      .map(_.toInt).getOrElse(initialVersion)
    val cur = graft.sources.DeltaRead.versions(spark, table).last.toInt
    if (cur <= cursor) return None
    apply(graft.sources.DeltaRead.changesCdf(spark, table, cursor.toLong,
      cur.toLong), cursor, cur)
    if (failBeforeCommit)
      throw new IllegalStateException("simulated crash before cursor commit")
    commitCursor(spark, ledgerPath, cur)
    Some((cursor, cur))
  }

  /** [[poll]] against a PAIMON table: the same ledger discipline over
    * [[graft.sources.PaimonRead.changes]] (PK tables emit the
    * retraction contract; COMPACT commits contribute nothing). The
    * cursor stores the last applied SNAPSHOT id — seed
    * `initialVersion = 1` to treat snapshot 1 as the baseline. */
  def pollPaimon(spark: SparkSession, table: String, ledgerPath: String,
      initialVersion: Long = 1L, failBeforeCommit: Boolean = false)(
      apply: (DataFrame, Long, Long) => Unit): Option[(Long, Long)] = {
    val cursor = readCursor(spark, ledgerPath).getOrElse(initialVersion)
    // snapshot ids are Long end to end — a long-lived table outgrows Int
    val cur = graft.sources.PaimonRead.latestSnapshotId(spark, table)
    if (cur <= cursor) return None
    apply(graft.sources.PaimonRead.changes(spark, table, cursor, cur),
      cursor, cur)
    if (failBeforeCommit)
      throw new IllegalStateException("simulated crash before cursor commit")
    commitCursor(spark, ledgerPath, cur)
    Some((cursor, cur))
  }
}
