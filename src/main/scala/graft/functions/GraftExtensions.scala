package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Divide, EqualTo, Expression, ExpressionInfo, Literal, Multiply, Sqrt}

/** `SparkSessionExtensions` entry point: registers the engine's native
  * vector expressions as SQL functions, so `spark.sql` users get the
  * same fused codegen'd loops the DataFrame surface uses —
  *
  *   spark.sql("SELECT graft_dot(a.embedding, b.embedding) ...")
  *
  * Cluster use: `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  * Existing sessions: `GraftExtensions.register(spark)` (same registry,
  * no restart). This is the only extension point the engine needs —
  * every operator else is expressible in the declarative API, and
  * Catalyst plans it better than a hand-written rule would (SURVEY §7).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[VectorFold].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def binary(name: String,
      f: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo,
         Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      info(name, s"$name(a, b) over array<float|double> columns"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$name takes 2 arguments")
        f(args(0), args(1))
      })

  private def unary(name: String, f: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo,
         Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      info(name, s"$name(a) over an array<float|double> column"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name takes 1 argument")
        f(args(0))
      })

  /** (identifier, info, builder) triples — shared by the extensions
    * injector and [[register]]. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    binary("graft_dot", DotF64.apply),
    binary("graft_l2sq", L2SqF64.apply),
    unary("graft_quant_scale", QuantScale.apply),
    unary("graft_quant_vec", QuantVec.apply),
    binary("graft_cosine", (a, b) => {
      // raw catalyst tree (the Column-API formulation would hand the
      // registry unresolved column nodes): dot/(|a||b|), 0 on zero norm
      val nn = Multiply(Sqrt(DotF64(a, a)), Sqrt(DotF64(b, b)))
      CaseWhen(Seq((EqualTo(nn, Literal(0.0)), Literal(0.0))),
        Some(Divide(DotF64(a, b), nn)))
    }))

  /** Register into an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      org.apache.spark.sql.graft.ColumnBridge
        .registerFunction(spark, id, inf, builder)
    }
}
