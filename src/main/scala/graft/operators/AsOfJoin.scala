package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the time-series join Spark lacks natively: for
  * every left row, attach the newest right row whose timestamp is at or
  * before the left timestamp, per key (and within `tolerance` when given).
  *
  * Implementation is the scalable tagged-union pattern, NOT a per-left
  * range join: both sides union into one frame ordered by
  * `(key, ts, side, right-payload)`, and a single running `last(right,
  * ignoreNulls)` window carries the newest right row forward onto each
  * left row. Cost = exactly ONE shuffle+sort on the key — independent of
  * how many right rows precede each left row, so a 100 TB event stream
  * pays the same shape as a 100 MB one. (A join on `r.ts <= l.ts` would
  * be a BroadcastNestedLoopJoin — quadratic and driver-bound.)
  *
  * Matching is deterministic under timestamp ties: among right rows with
  * equal `ts`, the one greatest in right-payload order (the struct's
  * field order, e.g. max id) wins, and a right row at exactly `l.ts`
  * matches (`<=` semantics). Left rows with no match keep NULL right
  * columns (left-outer semantics).
  *
  * Column contract: `left`'s columns pass through unchanged; `right`'s
  * non-key columns are appended and must not collide with `left`'s —
  * rename on the way in.
  */
object AsOfJoin {

  /** @param keys       equi-join key columns (present on both sides)
    * @param leftTs     left timestamp column (numeric or timestamp)
    * @param rightTs    right timestamp column; appended to the output
    * @param tolerance  max lookback: right rows older than
    *                   `leftTs - tolerance` do not match (same unit as
    *                   the timestamp columns) */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadCols = right.columns.toSeq.filterNot(keys.contains)
    require(payloadCols.contains(rightTs),
      s"rightTs $rightTs must be a non-key column of right")
    val collisions = leftCols.intersect(payloadCols)
    require(collisions.isEmpty,
      s"right payload columns collide with left: $collisions — rename")

    // one tagged frame: right rows first within a timestamp (__side 0 < 1)
    // so a right row AT the left timestamp is visible to it
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTs).cast("long").as("__ts"),
        lit(0).as("__side"),
        struct(payloadCols.map(col): _*).as("__r")): _*)
    val l = left.select(
      keys.map(col) ++ Seq(col(leftTs).cast("long").as("__ts"),
        lit(1).as("__side"),
        lit(null).cast(r.schema("__r").dataType).as("__r"),
        struct(leftCols.map(col): _*).as("__l")): _*)
    val unioned = r.withColumn("__l",
        lit(null).cast(l.schema("__l").dataType))
      .unionByName(l)

    // running newest-right; ROWS frame (not the default RANGE) so
    // ordering peers cannot leak a later-sorted right into an earlier row
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val gated = tolerance.fold(carried) { tol =>
      carried.withColumn("__m",
        when(col("__m").getField(rightTs).cast("long") >=
          col("__ts") - tol, col("__m")))
    }
    gated.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        payloadCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}
