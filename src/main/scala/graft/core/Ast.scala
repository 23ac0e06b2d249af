package graft.core

/** Query AST — the engine's logical query description.
  *
  * Mirrors the *shape* of the reference's immutable query descriptor
  * (reference: include/query/query.hpp:469-521 — FROM SchemaRef + ordered
  * clauses + optional TemporalSnapshot) but is deliberately tiny: all
  * execution semantics live in [[graft.planner.Planner]], which compiles this
  * AST to a Spark DataFrame plan and lets Catalyst do the optimization.
  */
object Ast {

  /** Comparison operators (reference: include/query/query.hpp:74-84).
    * The reference's vectorized path degrades string ops to equality
    * (src/query/query.cpp:635-649) — we implement the *intended* semantics.
    */
  sealed trait CmpOp
  object CmpOp {
    case object Eq extends CmpOp
    case object NotEq extends CmpOp
    case object Gt extends CmpOp
    case object Lt extends CmpOp
    case object Gte extends CmpOp
    case object Lte extends CmpOp
    case object Contains extends CmpOp
    case object StartsWith extends CmpOp
    case object EndsWith extends CmpOp
  }

  /** `alias.field[.mapKey...]` — path beyond the first element addresses
    * nested MAP keys (reference: src/query/execution.cpp:32-164). */
  final case class FieldRef(alias: String, path: List[String]) {
    require(path.nonEmpty, "FieldRef needs at least a field name")
    def field: String = path.head
    def mapPath: List[String] = path.tail
    override def toString: String = (alias :: path).mkString(".")
  }
  object FieldRef {
    /** Parse "u.age" / "u.props.role". */
    def parse(s: String): FieldRef = {
      val parts = s.split('.').toList
      require(parts.length >= 2, s"field ref must be alias.field: $s")
      FieldRef(parts.head, parts.tail)
    }
  }

  /** Scalar expression tree — beyond-reference (the reference grammar's
    * `factor` is only identifier-path or literal, TundraQL.g4:102; SURVEY
    * §2.6 [ABSENT] row says to expose what Spark gives for free).
    * Functions are a fixed whitelist compiled to codegen'd
    * `org.apache.spark.sql.functions`. */
  sealed trait ScalarExpr {
    def aliases: Set[String] = this match {
      case SRef(r)          => Set(r.alias)
      case SLit(_)          => Set.empty
      case SFunc(_, args)   => args.flatMap(_.aliases).toSet
      case SArith(_, l, r)  => l.aliases ++ r.aliases
    }
    def +(o: ScalarExpr): ScalarExpr = SArith('+', this, o)
    def -(o: ScalarExpr): ScalarExpr = SArith('-', this, o)
    def *(o: ScalarExpr): ScalarExpr = SArith('*', this, o)
    def /(o: ScalarExpr): ScalarExpr = SArith('/', this, o)
    def %(o: ScalarExpr): ScalarExpr = SArith('%', this, o)
    def ===(o: ScalarExpr): WhereExpr = ExprComparison(this, CmpOp.Eq, o)
    def =!=(o: ScalarExpr): WhereExpr = ExprComparison(this, CmpOp.NotEq, o)
    def >(o: ScalarExpr): WhereExpr = ExprComparison(this, CmpOp.Gt, o)
    def <(o: ScalarExpr): WhereExpr = ExprComparison(this, CmpOp.Lt, o)
    def >=(o: ScalarExpr): WhereExpr = ExprComparison(this, CmpOp.Gte, o)
    def <=(o: ScalarExpr): WhereExpr = ExprComparison(this, CmpOp.Lte, o)
  }
  final case class SRef(ref: FieldRef) extends ScalarExpr
  final case class SLit(v: Any) extends ScalarExpr
  final case class SFunc(name: String, args: List[ScalarExpr])
      extends ScalarExpr
  final case class SArith(op: Char, l: ScalarExpr, r: ScalarExpr)
      extends ScalarExpr

  /** WHERE expression tree (reference: include/query/query.hpp:374-428). */
  sealed trait WhereExpr {
    def &&(other: WhereExpr): WhereExpr = And(this, other)
    def ||(other: WhereExpr): WhereExpr = Or(this, other)
    /** All aliases referenced anywhere in this expression. */
    def aliases: Set[String] = this match {
      case Comparison(f, _, v: FieldRef)  => Set(f.alias, v.alias)
      case Comparison(f, _, _)            => Set(f.alias)
      case ExprComparison(l, _, r)        => l.aliases ++ r.aliases
      case And(l, r)                      => l.aliases ++ r.aliases
      case Or(l, r)                       => l.aliases ++ r.aliases
    }
  }
  /** rhs is a literal (Int/Long/Double/String/Boolean/null) or a FieldRef
    * for cross-alias predicates (deferred post-WHERE, reference F7:
    * src/query/filter_executor.cpp:10-47). */
  final case class Comparison(field: FieldRef, op: CmpOp, rhs: Any)
      extends WhereExpr
  /** Comparison over scalar expressions (function calls / arithmetic on
    * either side) — beyond-reference; plain field-vs-literal comparisons
    * stay [[Comparison]] so the reference's strict-typing rules (F3)
    * apply there unchanged. */
  final case class ExprComparison(l: ScalarExpr, op: CmpOp, r: ScalarExpr)
      extends WhereExpr
  final case class And(l: WhereExpr, r: WhereExpr) extends WhereExpr
  final case class Or(l: WhereExpr, r: WhereExpr) extends WhereExpr

  /** Join semantics of a traversal hop (reference: src/query/join.cpp).
    * Semi/Anti are beyond-reference (SURVEY §2.3 [ABSENT] row — "free in
    * Spark"): existence/absence tests that bind NO columns for the hop's
    * target or edge alias — the hop filters its source rows only. */
  sealed trait JoinKind
  object JoinKind {
    case object Inner extends JoinKind
    case object Left extends JoinKind
    case object Right extends JoinKind
    case object Full extends JoinKind
    case object Semi extends JoinKind
    case object Anti extends JoinKind
  }

  sealed trait Clause
  final case class WhereClause(expr: WhereExpr) extends Clause
  /** One hop `(src)-[edgeAlias:edgeType KIND]->(dst:dstLabel)`.
    * Direction reversal (`<-[..]-`) is normalized at build time by swapping
    * ends, like the reference shell (apps/tundra_shell.cpp:568-579).
    * `srcLabel` is only needed when the source alias is new (multi-pattern
    * second chains, reference J8). */
  final case class TraverseClause(
      srcAlias: String,
      edgeType: String,
      edgeAlias: Option[String],
      dstAlias: String,
      dstLabel: String,
      kind: JoinKind,
      srcLabel: Option[String] = None,
      /** Variable-length hop `*min..max` (beyond-reference, SURVEY §2.3
        * [ABSENT] row) — INNER-only; the edge alias exposes `hops`. */
      range: Option[(Int, Int)] = None,
      /** Undirected hop `-[..]-` (beyond-reference, SURVEY §2.3 [ABSENT]
        * row): the edge matches in either orientation. Self-label edge
        * sets only. */
      undirected: Boolean = false
  ) extends Clause

  /** SELECT item: bare alias (expands to all its columns, reference P1:
    * src/query/execution.cpp:585-635) or a field ref, optionally renamed. */
  sealed trait SelectItem
  final case class SelectAlias(alias: String) extends SelectItem
  final case class SelectField(ref: FieldRef, as: Option[String] = None)
      extends SelectItem
  /** Computed SELECT item (scalar function / arithmetic) — beyond the
    * reference (its select list is bare fields only); requires AS. */
  final case class SelectExpr(expr: ScalarExpr, as: String)
      extends SelectItem
  /** Aggregate SELECT item — beyond the reference (its grammar has no
    * aggregation, SURVEY §2 preamble); exposed because Spark provides it
    * natively. Non-aggregate SELECT items become the implicit GROUP BY
    * keys. `ref` is None only for COUNT(*). */
  final case class SelectAgg(fn: AggFn, ref: Option[FieldRef], as: String)
      extends SelectItem
  sealed trait AggFn
  object AggFn {
    case object Count extends AggFn
    case object CountDistinct extends AggFn
    case object Sum extends AggFn
    case object Avg extends AggFn
    case object Min extends AggFn
    case object Max extends AggFn
  }

  /** ORDER BY key over OUTPUT column names (post-projection / post-agg:
    * `alias.field`, an AS name, or an aggregate's AS name). */
  final case class OrderKey(key: String, asc: Boolean = true)

  val INF: Long = Long.MaxValue

  /** Bitemporal snapshot; INF means "now"/unconstrained on that axis
    * (reference: include/query/temporal_context.hpp:20-39). */
  final case class TemporalSnapshot(validTime: Long = INF, txTime: Long = INF)

  /** Post-aggregation filter over an OUTPUT column (an aggregate's AS
    * name or a group key's output name) — beyond-reference HAVING. */
  final case class HavingCond(outName: String, op: CmpOp, value: Any)

  final case class GraphQuery(
      fromAlias: String,
      fromLabel: String,
      clauses: List[Clause] = Nil,
      select: List[SelectItem] = Nil,
      asOf: Option[TemporalSnapshot] = None,
      orderBy: List[OrderKey] = Nil,
      limit: Option[Long] = None,
      distinct: Boolean = false,
      having: List[HavingCond] = Nil,
      offset: Option[Long] = None
  )

  // --------------------------------------------------------------------
  // Fluent builder — parity with the reference Query::Builder
  // (include/query/query.hpp:524-682).
  // --------------------------------------------------------------------

  final class QueryBuilder private[core] (
      fromAlias: String,
      fromLabel: String
  ) {
    private var clauses = List.empty[Clause]
    private var selectItems = List.empty[SelectItem]
    private var snapshot: Option[TemporalSnapshot] = None
    private var ordering = List.empty[OrderKey]
    private var limitN: Option[Long] = None
    private var offsetN: Option[Long] = None
    private var distinctFlag = false
    private var havingConds = List.empty[HavingCond]

    def where(expr: WhereExpr): QueryBuilder = {
      clauses :+= WhereClause(expr); this
    }
    def traverse(
        src: String,
        edgeType: String,
        dst: String,
        kind: JoinKind = JoinKind.Inner,
        edgeAlias: Option[String] = None,
        undirected: Boolean = false
    ): QueryBuilder = {
      val (dstAlias, dstLabel) = splitTyped(dst)
      val (srcAlias, srcLabel) = src.split(':') match {
        case Array(a, l) => (a, Some(l))
        case Array(a)    => (a, None)
        case _ => throw new IllegalArgumentException(s"bad src: $src")
      }
      clauses :+= TraverseClause(srcAlias, edgeType, edgeAlias, dstAlias,
        dstLabel, kind, srcLabel, undirected = undirected)
      this
    }
    /** Variable-length hop `*min..max` (INNER; edge alias exposes
      * `hops`). */
    def traverseRange(
        src: String, edgeType: String, dst: String,
        minHops: Int, maxHops: Int,
        edgeAlias: Option[String] = None): QueryBuilder = {
      val (dstAlias, dstLabel) = splitTyped(dst)
      val (srcAlias, srcLabel) = src.split(':') match {
        case Array(a, l) => (a, Some(l))
        case Array(a)    => (a, None)
        case _ => throw new IllegalArgumentException(s"bad src: $src")
      }
      clauses :+= TraverseClause(srcAlias, edgeType, edgeAlias, dstAlias,
        dstLabel, JoinKind.Inner, srcLabel, Some((minHops, maxHops)))
      this
    }

    def select(items: String*): QueryBuilder = {
      selectItems ++= items.map { s =>
        if (s.contains('.')) SelectField(FieldRef.parse(s))
        else SelectAlias(s)
      }
      this
    }
    def selectAs(ref: String, as: String): QueryBuilder = {
      selectItems :+= SelectField(FieldRef.parse(ref), Some(as)); this
    }
    /** Computed SELECT item (scalar function / arithmetic). */
    def selectExpr(expr: ScalarExpr, as: String): QueryBuilder = {
      selectItems :+= SelectExpr(expr, as); this
    }
    def agg(fn: AggFn, ref: String, as: String): QueryBuilder = {
      selectItems :+= SelectAgg(fn, Some(FieldRef.parse(ref)), as); this
    }
    def count(as: String): QueryBuilder = {
      selectItems :+= SelectAgg(AggFn.Count, None, as); this
    }
    def orderBy(keys: (String, Boolean)*): QueryBuilder = {
      ordering ++= keys.map { case (k, asc) => OrderKey(k, asc) }; this
    }
    def orderBy(key: String): QueryBuilder = {
      ordering :+= OrderKey(key, asc = true); this
    }
    def limit(n: Long): QueryBuilder = { limitN = Some(n); this }
    /** Skip the first `n` output rows (applies after ORDER BY,
      * before LIMIT — SQL `LIMIT … OFFSET …` semantics). */
    def offset(n: Long): QueryBuilder = { offsetN = Some(n); this }
    /** Row-level DISTINCT over the projected output. */
    def distinct(): QueryBuilder = { distinctFlag = true; this }
    /** HAVING over an output column name (agg AS name or group key). */
    def having(outName: String, op: CmpOp, value: Any): QueryBuilder = {
      havingConds :+= HavingCond(outName, op, value); this
    }
    def asOfValidTime(vt: Long): QueryBuilder = {
      snapshot = Some(snapshot.getOrElse(TemporalSnapshot()).copy(validTime = vt)); this
    }
    def asOfTxTime(tt: Long): QueryBuilder = {
      snapshot = Some(snapshot.getOrElse(TemporalSnapshot()).copy(txTime = tt)); this
    }
    def asOf(vt: Long, tt: Long): QueryBuilder = {
      snapshot = Some(TemporalSnapshot(vt, tt)); this
    }
    def build: GraphQuery =
      GraphQuery(fromAlias, fromLabel, clauses, selectItems, snapshot,
        ordering, limitN, distinctFlag, havingConds, offsetN)

    private def splitTyped(s: String): (String, String) = s.split(':') match {
      case Array(a, l) => (a, l)
      case Array(a)    => (a, a)
      case _ => throw new IllegalArgumentException(s"bad alias:label: $s")
    }
  }

  object Q {
    /** `Q.from("c:customer")` or `Q.from("c", "customer")`. */
    def from(aliasLabel: String): QueryBuilder = aliasLabel.split(':') match {
      case Array(a, l) => new QueryBuilder(a, l)
      case Array(a)    => new QueryBuilder(a, a)
      case _ => throw new IllegalArgumentException(s"bad from: $aliasLabel")
    }
    def from(alias: String, label: String): QueryBuilder =
      new QueryBuilder(alias, label)
  }

  /** Scalar DSL: `sfn("length", sref("u.name")) > slit(5)`,
    * `sref("u.age") + slit(1)`. */
  def sref(s: String): ScalarExpr = SRef(FieldRef.parse(s))
  def slit(v: Any): ScalarExpr = SLit(v)
  def sfn(name: String, args: ScalarExpr*): ScalarExpr =
    SFunc(name, args.toList)

  /** Predicate DSL: `ref("u.age") > 30`, `ref("u.name") contains "x"`. */
  final case class RefOps(ref: FieldRef) {
    def ===(v: Any): WhereExpr = Comparison(ref, CmpOp.Eq, v)
    def =!=(v: Any): WhereExpr = Comparison(ref, CmpOp.NotEq, v)
    def >(v: Any): WhereExpr = Comparison(ref, CmpOp.Gt, v)
    def <(v: Any): WhereExpr = Comparison(ref, CmpOp.Lt, v)
    def >=(v: Any): WhereExpr = Comparison(ref, CmpOp.Gte, v)
    def <=(v: Any): WhereExpr = Comparison(ref, CmpOp.Lte, v)
    def contains(v: String): WhereExpr = Comparison(ref, CmpOp.Contains, v)
    def startsWith(v: String): WhereExpr =
      Comparison(ref, CmpOp.StartsWith, v)
    def endsWith(v: String): WhereExpr = Comparison(ref, CmpOp.EndsWith, v)
  }
  def ref(s: String): RefOps = RefOps(FieldRef.parse(s))
}
