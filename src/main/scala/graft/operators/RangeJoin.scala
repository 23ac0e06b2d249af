package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed interval (range) join: pairs every left row with the right rows
  * whose timestamp falls in `[leftTs + lo, leftTs + hi)`, per key.
  *
  * A raw inequality join compiles to a nested-loop join (quadratic per
  * key, and BroadcastNestedLoop when Catalyst can't equi-split it) — the
  * classic range-join scale trap. This operator bins time instead: with
  * bin width = the next power of two ≥ `hi − lo`, a left window overlaps
  * at most TWO bins, so the left side explodes into exactly 2 bin rows,
  * the right side maps to exactly one, and the join is a plain equi-join
  * on `(key, bin)` — hash partitioned, AQE-skew-splittable, no nested
  * loop anywhere. The exact interval predicate then prunes the
  * (bin-bounded) candidates. Output pairs are exact and unique: each
  * right row lives in one bin, so a (left, right) pair can only meet
  * once. Bins are computed with arithmetic shifts, never floating-point
  * division — epoch-nanosecond longs (~1.7e18) exceed a double's exact
  * integer range, and a float-derived bin id silently misses boundary
  * rows.
  *
  * Column contract: output = left columns ++ right's non-key columns
  * (rename collisions on the way in).
  */
object RangeJoin {

  def byKeyAndWindow(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String,
                     lo: Long, hi: Long): DataFrame = {
    require(hi > lo, s"empty window [$lo, $hi)")
    val span = hi - lo
    require(span < (1L << 62), s"window span $span too large")
    // ceil(log2(span)): arithmetic shift right by this = exact floor
    // division by the power-of-two bin width (negatives included)
    val shift = 64 - java.lang.Long.numberOfLeadingZeros(span - 1)
    val payloadCols = right.columns.toSeq.filterNot(keys.contains)
    val collisions = left.columns.toSeq.intersect(payloadCols)
    require(collisions.isEmpty,
      s"right payload columns collide with left: $collisions — rename")

    val lBinStart = shiftright(col(leftTs).cast("long") + lo, shift)
    val l = left.withColumn("__bin",
      explode(array(lBinStart, lBinStart + 1)))
    val r = right.withColumn("__bin",
      shiftright(col(rightTs).cast("long"), shift))
    l.join(r, keys :+ "__bin")
      .filter(col(rightTs).cast("long") >= col(leftTs).cast("long") + lo &&
        col(rightTs).cast("long") < col(leftTs).cast("long") + hi)
      .drop("__bin")
  }
}
