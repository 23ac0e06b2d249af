package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math over
  * `array<float|double>` columns — one tight fused loop in whole-stage
  * codegen instead of `zip_with` (allocates the products array) +
  * `aggregate` (folds it). Semantics are bit-for-bit the HOF
  * formulation's: every element widens to float64, accumulation is
  * sequential left-to-right (deterministic, oracle-checkable), length
  * mismatch or a null element yields NULL, empty arrays yield 0.0.
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"${getClass.getSimpleName} expects array<float|double> inputs, " +
          s"got ${left.dataType.catalogString}, " +
          s"${right.dataType.catalogString}")
    }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** Interpreted accumulation step. */
  protected def step(acc: Double, x: Double, y: Double): Double
  /** Java source for the accumulation step over double vars x,y into acc. */
  protected def stepCode(acc: String, x: String, y: String): String

  private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _         => a.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]
    val y = r.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lt = elemType(left); val rt = elemType(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc = step(acc, get(x, i, lt), get(y, i, rt))
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val getX = CodeGenerator.getValue(a, elemType(left), i)
      val getY = CodeGenerator.getValue(b, elemType(right), i)
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    double $xv = (double)($getX);
         |    double $yv = (double)($getY);
         |    ${stepCode(acc, xv, yv)}
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
}

/** Sequential float64 dot product (reference semantics: the HOF
  * formulation in [[VectorFunctions.dot]]). */
case class DotF64(left: Expression, right: Expression) extends VectorFold {
  override protected def step(acc: Double, x: Double, y: Double): Double =
    acc + x * y
  override protected def stepCode(acc: String, x: String, y: String): String =
    s"$acc += $x * $y;"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sequential float64 squared L2 distance. */
case class L2SqF64(left: Expression, right: Expression) extends VectorFold {
  override protected def step(acc: Double, x: Double, y: Double): Double = {
    val d = x - y; acc + d * d
  }
  override protected def stepCode(acc: String, x: String, y: String): String =
    s"{ double __d = $x - $y; $acc += __d * __d; }"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
