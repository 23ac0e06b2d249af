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

/** Argmin-L2² centroid assignment as ONE projection: given a vector and
  * a cid-ASCENDING `array<struct<cid bigint, cv array<float|double>>>`
  * candidate list (broadcast-sized by construction — k centroids), pick
  * the cid minimizing the sequential-float64 squared L2 distance
  * ([[L2SqF64]] arithmetic verbatim, same element widening and fold
  * order).
  *
  * This replaces the `vectors × centroids join → Window(row_number
  * ORDER BY dist ASC, cid ASC) → rn = 1` assignment shape, whose
  * corpus×k intermediate paid a full Exchange + per-key sort on every
  * Lloyd round. The winner is IDENTICAL, including edge ordering:
  *  - distance ties keep the LOWEST cid (candidates arrive
  *    cid-ascending; replacement is strictly-less via
  *    `java.lang.Double.compare`, which also ranks NaN greatest —
  *    Spark's sort order for doubles);
  *  - a NULL distance (length mismatch, null element, or a null input
  *    vector — exactly when [[L2SqF64]] yields null) sorts FIRST under
  *    the window's default ASC NULLS FIRST, so the lowest-cid
  *    null-distance candidate wins: iterating cid-ascending, the first
  *    one seen is returned immediately;
  *  - an EMPTY candidate array yields NULL — callers filter those rows,
  *    mirroring the former inner join dropping every vector when the
  *    centroid side is empty.
  * Candidate entries themselves are never null (they come from
  * `collect_list(struct(...))`, which skips nulls and builds non-null
  * structs); a defensive skip keeps a malformed entry from NPE-ing.
  */
case class ArgMinL2(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def vecElem(t: DataType): Option[DataType] = t match {
    case ArrayType(e, _) if e == FloatType || e == DoubleType => Some(e)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val candsOk = right.dataType match {
      case ArrayType(StructType(fs), _) if fs.length == 2 &&
          fs(0).dataType == LongType &&
          vecElem(fs(1).dataType).isDefined => true
      case _ => false
    }
    if (vecElem(left.dataType).isDefined && candsOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "ArgMinL2 expects (array<float|double>, array<struct<bigint, " +
        s"array<float|double>>>), got ${left.dataType.catalogString}, " +
        right.dataType.catalogString)
  }

  private lazy val vecIsFloat =
    vecElem(left.dataType).contains(FloatType)
  private lazy val cvIsFloat = right.dataType match {
    case ArrayType(StructType(fs), _) =>
      vecElem(fs(1).dataType).contains(FloatType)
    case _ => false
  }

  override def eval(
      input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val cands = right.eval(input)
    if (cands == null) return null
    // the vector side may be null WITHOUT nulling the result: a null
    // vector gives every candidate a null distance, and NULLS FIRST
    // means the lowest cid still wins — eval is therefore custom, not
    // nullSafeEval
    val vec = left.eval(input)
    ArgMinL2.compute(vec.asInstanceOf[ArrayData],
      cands.asInstanceOf[ArrayData], vecIsFloat, cvIsFloat)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val lg = left.genCode(ctx)
    val rg = right.genCode(ctx)
    val res = ctx.freshName("argmin")
    val obj = s"${ArgMinL2.getClass.getName.stripSuffix("$")}"
    ev.copy(code =
      code"""
         |${lg.code}
         |${rg.code}
         |boolean ${ev.isNull} = true;
         |long ${ev.value} = -1L;
         |if (!${rg.isNull}) {
         |  Object $res = $obj.compute(
         |    ${lg.isNull} ? null :
         |      (org.apache.spark.sql.catalyst.util.ArrayData) ${lg.value},
         |    (org.apache.spark.sql.catalyst.util.ArrayData) ${rg.value},
         |    $vecIsFloat, $cvIsFloat);
         |  if ($res != null) {
         |    ${ev.isNull} = false;
         |    ${ev.value} = ((java.lang.Long) $res).longValue();
         |  }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArgMinL2 {
  /** Null-distance-aware L2² — exactly [[L2SqF64]]'s semantics,
    * returning null (boxed) on length mismatch or null element. */
  private def l2(x: ArrayData, y: ArrayData, xf: Boolean,
      yf: Boolean): java.lang.Double = {
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      acc += d * d
      i += 1
    }
    acc
  }

  /** Shared by interpreted eval and generated code. `vec` may be null
    * (null distances, NULLS FIRST); returns a boxed Long cid or null
    * for an empty candidate list. */
  def compute(vec: ArrayData, cands: ArrayData, vecFloat: Boolean,
      cvFloat: Boolean): Any = {
    val k = cands.numElements()
    var bestCid = 0L
    var bestDist = 0.0
    var has = false
    var i = 0
    while (i < k) {
      if (!cands.isNullAt(i)) { // defensive: producers never emit null
        val st = cands.getStruct(i, 2)
        if (!st.isNullAt(0)) {
          val cid = st.getLong(0)
          val d: java.lang.Double =
            if (vec == null || st.isNullAt(1)) null
            else l2(vec, st.getArray(1), vecFloat, cvFloat)
          // null distance: ASC NULLS FIRST beats every number, and the
          // cid-ascending iteration makes this the lowest such cid
          if (d == null) return java.lang.Long.valueOf(cid)
          if (!has || java.lang.Double.compare(d, bestDist) < 0) {
            has = true; bestDist = d; bestCid = cid
          }
        }
      }
      i += 1
    }
    if (has) java.lang.Long.valueOf(bestCid) else null
  }
}
