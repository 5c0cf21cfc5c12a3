package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table keys models + DML rewrites.
  *
  * Reference: `fe/fe-parser/.../sql/ast/KeysType.java` — DUP_KEYS
  * (append), PRIMARY/UNIQUE_KEYS (upsert), AGG_KEYS (fold on ingest);
  * DML planners `InsertPlanner`/`UpdatePlanner`/`DeletePlanner`/
  * `MergeIntoPlanner` (`sql/StatementPlanner.java:169-177`).
  *
  * Spark mapping: tables are parquet directories. PRIMARY KEY reads
  * are merge-on-read (latest version per key wins — one window, one
  * shuffle); AGG KEYS fold is a groupBy on write. UPDATE/DELETE/MERGE
  * rewrite the affected files (read → transform → atomic directory
  * swap), which is exactly the copy-on-write lake pattern.
  */
object KeysModels {

  /** Merge-on-read view of a PRIMARY KEY table: latest version per
    * key; rows whose latest version has deleteCol=true are dropped. */
  def upsertView(df: DataFrame, keys: Seq[String], versionCol: String,
      deleteCol: Option[String] = None): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(versionCol).desc)
    val latest = df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    deleteCol.map(d => latest.filter(!col(d)).drop(d)).getOrElse(latest)
  }

  /** AGG KEYS fold: collapse rows to one per key with the given
    * aggregate exprs (applied at ingest for an AGG table). */
  def aggFold(df: DataFrame, keys: Seq[String],
      aggs: Map[String, String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(aggs)

  /** UPDATE table_dir SET (via rewrite): returns the new DataFrame;
    * caller persists with atomicOverwrite. */
  def update(df: DataFrame, condition: org.apache.spark.sql.Column,
      assignments: Map[String, org.apache.spark.sql.Column]): DataFrame =
    assignments.foldLeft(df) { case (acc, (c, v)) =>
      acc.withColumn(c, when(condition, v).otherwise(col(c)))
    }

  /** DELETE via rewrite. SQL DELETE removes only rows where the
    * predicate is TRUE — rows where it evaluates NULL are KEPT, so the
    * keep-filter is NOT(cond) OR cond IS NULL, not plain NOT(cond). */
  def delete(df: DataFrame, condition: org.apache.spark.sql.Column): DataFrame =
    df.filter(coalesce(!condition, lit(true)))

  /** MERGE INTO target USING source ON keys: source rows upsert
    * (update-on-match, insert-on-no-match). Both sides must share the
    * schema; `versionCol` breaks ties (source wins). */
  def mergeInto(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val tagged = target.withColumn("__src", lit(0))
      .unionByName(source.withColumn("__src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__src").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }

  /** Partial-column upsert — the reference's partial_update load mode
    * on a PRIMARY KEY table (`fe/fe-core/.../load/streamload/
    * StreamLoadInfo.java` partial-update flag; BE merges provided
    * columns into the stored row): the source carries the key columns
    * plus a SUBSET of the value columns. Matched target rows take the
    * source's values for exactly the provided columns — including an
    * explicitly provided NULL, which is why this is a matched-flag
    * override and not a per-column coalesce — and keep their stored
    * values for every other column; unmatched source keys insert with
    * the unprovided columns NULL. Cost: one shuffle (the full-outer
    * equi-join on the key), same as any merge — no per-column passes. */
  def partialUpdate(target: DataFrame, source: DataFrame,
      keys: Seq[String]): DataFrame = {
    val provided = source.columns.filterNot(keys.contains).toSeq
    require(provided.nonEmpty, "source must provide at least one non-key column")
    val unknown = provided.filterNot(target.columns.contains)
    require(unknown.isEmpty, s"source columns not in target: ${unknown.mkString(",")}")
    val s = source
      .select(keys.map(col) ++ provided.map(c => col(c).as(s"__s_$c")): _*)
      .withColumn("__matched", lit(true))
    target.join(s, keys, "full_outer")
      .select(target.columns.toSeq.map { c =>
        if (provided.contains(c))
          when(col("__matched"), col(s"__s_$c")).otherwise(col(c)).as(c)
        else col(c)
      }: _*)
  }

  /** Version-aware MERGE: highest versionCol wins per key; the source
    * row wins a version tie (the conditional-update mode of a PRIMARY
    * table with a sequence column, vs plain mergeInto's source-wins). */
  def mergeIntoVersioned(target: DataFrame, source: DataFrame, keys: Seq[String],
      versionCol: String): DataFrame = {
    val tagged = target.withColumn("__src", lit(0))
      .unionByName(source.withColumn("__src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col("__src").desc)
    tagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__src")
  }

  /** Atomic directory swap write: write to tmp, swap — the poor-man's
    * txn commit matching the reference's publish-version step
    * (`transaction/` 2PC → visible version). */
  def atomicOverwrite(df: DataFrame, dir: String): Unit = {
    val tmp = dir + ".tmp-" + java.util.UUID.randomUUID().toString
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(dir)
    recoverFromBackup(fs, dst)
    val bak = new org.apache.hadoop.fs.Path(dir + ".bak-" + System.nanoTime())
    // a FALSE here must abort: renaming tmp onto a still-existing dst
    // DIRECTORY would nest it inside instead of replacing it
    if (fs.exists(dst)) require(fs.rename(dst, bak), s"failed to back up $dst")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dst),
      s"failed to install $dst")
    if (fs.exists(bak)) fs.delete(bak, true)
  }

  /** Crash window: a failure between the two renames above leaves the
    * table only as its .bak-* sibling. Restore the newest backup when
    * the table dir is missing — readers/writers that land here first
    * then see the pre-crash version, never an absent table. */
  private def recoverFromBackup(fs: org.apache.hadoop.fs.FileSystem,
      dst: org.apache.hadoop.fs.Path): Unit = {
    if (fs.exists(dst)) return
    val parent = dst.getParent
    if (parent == null || !fs.exists(parent)) return
    val prefix = dst.getName + ".bak-"
    val baks = fs.listStatus(parent).map(_.getPath)
      .filter(_.getName.startsWith(prefix))
    if (baks.nonEmpty) require(fs.rename(baks.maxBy(_.getName), dst),
      s"failed to restore $dst from backup")
  }
}
