package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen-friendly higher-order functions (no UDFs): `zip_with` +
  * `aggregate` compile to a sequential left-fold in whole-stage codegen,
  * which makes results bit-for-bit deterministic (and therefore
  * oracle-checkable) — every element is widened to float64 first, then
  * summed left-to-right.
  */
object VectorFunctions {

  /** Sequential float64 dot product of two array<float/double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 for zero-norm inputs. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, lit(0.0)).otherwise(d / nn)
  }

  /** Squared L2 distance (for IVF centroid assignment). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val dxy = x.cast("double") - y.cast("double")
        dxy * dxy
      }),
      lit(0.0),
      (acc, v) => acc + v)
}
