package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Vector math over `array<float>` embedding columns, backed by the
  * native codegen'd expressions in [[VectorExpressions]] (one fused loop
  * per row — no UDFs, no intermediate arrays). Results are bit-for-bit
  * deterministic (and therefore oracle-checkable): every element is
  * widened to float64 first, then accumulated left-to-right — identical
  * to the `zip_with`+`aggregate` HOF formulation these replaced.
  */
object VectorFunctions {

  private def binary(f: (Expression, Expression) => Expression)
      (a: Column, b: Column): Column =
    ColumnBridge.column(
      f(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Sequential float64 dot product of two array<float/double> columns. */
  def dot(a: Column, b: Column): Column = binary(DotF64.apply)(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 for zero-norm inputs. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, lit(0.0)).otherwise(d / nn)
  }

  /** Squared L2 distance (for IVF centroid assignment). */
  def l2sq(a: Column, b: Column): Column = binary(L2SqF64.apply)(a, b)

  /** Argmin-L2² over a cid-ascending `array<struct<cid, cv>>` candidate
    * column — the zero-shuffle centroid-assignment projection
    * ([[ArgMinL2]]); null for an empty candidate list. */
  def argMinL2(vec: Column, cands: Column): Column =
    binary(ArgMinL2.apply)(vec, cands)

  private def unary(f: Expression => Expression)(a: Column): Column =
    ColumnBridge.column(f(ColumnBridge.expression(a)))

  /** int8-quantization scale `max|x|/127` (NULL for empty vectors). */
  def quantScale(a: Column): Column = unary(QuantScale.apply)(a)

  /** Comma-joined int8 codes of a vector (scale computed internally —
    * see [[QuantVec]] for why it must NOT be a separate column). */
  def quantVec(a: Column): Column = unary(QuantVec.apply)(a)
}
