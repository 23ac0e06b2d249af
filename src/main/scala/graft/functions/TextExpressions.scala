package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial document fingerprint
  * `fold(7, (acc, cp) => (acc*31 + cp) % 1e9+7)` over the CODEPOINTS of
  * the lowercased text — one native pass in whole-stage codegen.
  *
  * Replaces the `aggregate(split(lower(text), ""), ...)` higher-order
  * formulation: Spark's HOFs are CodegenFallback (interpreted per
  * element, one single-character UTF8String allocated per char), which
  * made the fingerprint ~40% of the text-analysis bench. Semantics match
  * the DuckDB oracle (`list_reduce` + `ascii`, SparkEntry p40) exactly:
  * DuckDB's `ascii` returns the code POINT, so iterating codepoints —
  * not the surrogate code units `split(text, "")` yields — is the
  * formulation that agrees beyond the BMP too. Lowercasing is
  * `UTF8String.toLowerCase`, identical to `lower()`.
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"PolyHash expects a string, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"${PolyHash.getClass.getName.stripSuffix("$")}.hash($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object PolyHash {
  val Mod = 1000000007L

  /** Shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val str = s.toLowerCase.toString
    // both split('') formulations (Java regex AND DuckDB string_split)
    // yield [''] for the EMPTY string — one ascii=0 fold step
    if (str.isEmpty) return (7L * 31L) % Mod
    var acc = 7L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}
