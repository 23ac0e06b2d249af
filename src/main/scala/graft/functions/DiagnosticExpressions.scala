package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.LongAccumulator

/** Pass-through diagnostic tap: evaluates to its boolean child and adds
  * 1 to `acc` whenever the child is true (null counts as false). Kept
  * as a projected column through a materialization boundary, it feeds a
  * [[graft.core.Diagnostics]] warning from whatever job computes the
  * pass — observability inside whole-stage codegen, with no extra job
  * and no row-conversion fence (the `mapPartitions` alternative paid an
  * InternalRow→Row→InternalRow copy per row here).
  *
  * `deterministic = false` pins the tap where it was placed: the
  * optimizer must not collapse, duplicate, or push it (each extra
  * evaluation would double-count). Task retries can still recount a
  * partition — the standard accumulator caveat, acceptable for a
  * warning channel and documented at the registration site.
  */
case class AccumulateIf(child: Expression, acc: LongAccumulator)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override lazy val deterministic: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BooleanType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"AccumulateIf expects a boolean, got ${child.dataType.catalogString}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val hit = v != null && v.asInstanceOf[Boolean]
    if (hit) acc.add(1L)
    hit
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val accRef = ctx.addReferenceObj("acc", acc,
      classOf[LongAccumulator].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} = !${c.isNull} && ${c.value};
        if (${ev.value}) { $accRef.add(1L); }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
