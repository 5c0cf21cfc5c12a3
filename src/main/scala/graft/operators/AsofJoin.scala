package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ASOF (temporal) join — for each left row, the nearest right row by
  * time within the same keys.
  *
  * Reference: ASOF_INNER / ASOF_LEFT_OUTER join types
  * (`gensrc/thrift/PlanNodes.thrift:844-845`, hash-map impl
  * `be/src/exec/join/join_hash_map_asof_inst.cpp`, FE rule
  * `PushDownAsofJoinTemporalExpressionToChildProject.java`).
  *
  * Spark has no built-in ASOF join; a naive range-join would plan a
  * nested-loop. This implementation is the union+window formulation:
  * tag both sides, union, then one window pass per key ordered by
  * (time, side) carrying the last (backward) / next (forward) right
  * payload to each left row.
  *
  * Scale: exactly ONE shuffle (hash by keys) + per-partition sort —
  * the same cost as a sort-merge join, no quadratic probe. Skewed hot
  * keys are handled by AQE; tolerance filtering happens post-match so
  * it's a cheap map.
  */
object AsofJoin {

  /** direction = "backward": latest right.ts <= left.ts;
    * "forward": earliest right.ts >= left.ts.
    * joinType = "inner" | "left".
    * toleranceSeconds: optional max |left.ts - right.ts|.
    * rightSuffix: appended to right payload columns whose name collides
    * with a left column (SQL join semantics: both survive, disambiguated).
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      direction: String = "backward",
      joinType: String = "left",
      toleranceSeconds: Option[Long] = None,
      rightSuffix: String = "_r"): DataFrame = {
    require(Seq("backward", "forward").contains(direction), s"direction: $direction")
    require(Seq("inner", "left").contains(joinType), s"joinType: $joinType")

    val leftCols = left.columns.toSeq
    val rightCols = right.columns.toSeq.filterNot(on.contains)

    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(payloadType(right, rightCols)))
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__payload", struct(rightCols.map(col): _*))
      .drop(rightCols.filterNot(leftCols.contains): _*)

    // SQL join semantics: a NULL key matches nothing. partitionBy groups
    // NULLs together, so drop right rows with null keys pre-union (left
    // rows keep flowing and simply find no payload in their partition).
    val rValid = on.foldLeft(rTagged)((df, k) => df.filter(col(k).isNotNull))

    val unioned = lTagged.select((on.map(col) ++ leftCols.filterNot(on.contains).map(col) ++
        Seq(col("__t"), col("__side"), col("__payload"))): _*)
      .unionByName(
        rValid.select((on.map(col) ++ Seq(col("__t"), col("__side"), col("__payload"))): _*),
        allowMissingColumns = true)

    // backward: right rows sort BEFORE left at equal ts (side 0 < 1) so
    // ts_right == ts_left matches; forward symmetric with side flipped.
    val w = direction match {
      case "backward" =>
        Window.partitionBy(on.map(col): _*)
          .orderBy(col("__t").asc, col("__side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      case "forward" =>
        Window.partitionBy(on.map(col): _*)
          .orderBy(col("__t").asc, col("__side").desc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    }
    val matchFn = if (direction == "backward") last(col("__payload"), ignoreNulls = true)
      else first(col("__payload"), ignoreNulls = true)

    val matched = unioned.withColumn("__m", matchFn.over(w))
      .filter(col("__side") === 1)

    val withTol = toleranceSeconds match {
      case Some(tol) =>
        val dt = abs(col("__t").cast("long") - col("__m").getField(rightTime).cast("long"))
        matched.withColumn("__m", when(dt <= tol, col("__m")))
      case None => matched
    }

    // __m is the whole right-payload struct: struct(...) is non-null for
    // every real right row even when all its fields are NULL, so
    // __m IS NOT NULL is exactly "matched" (fixes the all-NULL-payload
    // inner-join drop). Filter BEFORE projecting __m away.
    val kept = if (joinType == "inner") withTol.filter(col("__m").isNotNull) else withTol

    kept.select(
      leftCols.map(col) ++
        rightCols.map { c =>
          val name = if (leftCols.contains(c)) c + rightSuffix else c
          col("__m").getField(c).as(name)
        }: _*)
  }

  /** ASOF NEAREST: match each left row to the right row with the
    * smallest |left.ts − right.ts| (ties → the backward/earlier
    * candidate). Same union-then-window plan as [[asof]], but BOTH
    * frame directions are evaluated in the one Window pass (same
    * partitioning and ordering, two frames — one sort, no second
    * shuffle), then the closer candidate is chosen per row. Time
    * distances compare as epoch-second doubles: exact to the
    * microsecond for any timestamp below 2^53 µs. */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      joinType: String = "left",
      toleranceSeconds: Option[Long] = None,
      rightSuffix: String = "_r"): DataFrame = {
    require(Seq("inner", "left").contains(joinType), s"joinType: $joinType")
    val leftCols = left.columns.toSeq
    val rightCols = right.columns.toSeq.filterNot(on.contains)

    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(payloadType(right, rightCols)))
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__payload", struct(rightCols.map(col): _*))
      .drop(rightCols.filterNot(leftCols.contains): _*)
    val rValid = on.foldLeft(rTagged)((df, k) => df.filter(col(k).isNotNull))
    val unioned = lTagged.select((on.map(col) ++ leftCols.filterNot(on.contains).map(col) ++
        Seq(col("__t"), col("__side"), col("__payload"))): _*)
      .unionByName(
        rValid.select((on.map(col) ++ Seq(col("__t"), col("__side"), col("__payload"))): _*),
        allowMissingColumns = true)

    // one ordering serves both frames; at equal ts the right row sorts
    // first, so the backward frame sees it (dt = 0 — wins every tie) and
    // the forward frame missing it is harmless
    val ord = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val matched = unioned
      .withColumn("__mb", last(col("__payload"), ignoreNulls = true).over(wb))
      .withColumn("__mf", first(col("__payload"), ignoreNulls = true).over(wf))
      .filter(col("__side") === 1)
    def dt(m: Column): Column =
      abs(col("__t").cast("double") - m.getField(rightTime).cast("double"))
    val chosen = matched.withColumn("__m",
        when(col("__mb").isNull, col("__mf"))
          .when(col("__mf").isNull, col("__mb"))
          .when(dt(col("__mb")) <= dt(col("__mf")), col("__mb"))
          .otherwise(col("__mf")))
      .drop("__mb", "__mf")
    val withTol = toleranceSeconds match {
      case Some(tol) => chosen.withColumn("__m",
        when(dt(col("__m")) <= tol, col("__m")))
      case None => chosen
    }
    val kept = if (joinType == "inner") withTol.filter(col("__m").isNotNull) else withTol
    kept.select(
      leftCols.map(col) ++
        rightCols.map { c =>
          val name = if (leftCols.contains(c)) c + rightSuffix else c
          col("__m").getField(c).as(name)
        }: _*)
  }

  private def payloadType(right: DataFrame, cols: Seq[String]): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(cols.map(c => right.schema(c)))
}
