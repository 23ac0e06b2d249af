package graft

import org.apache.spark.sql.types._

import graft.core.Ast._
import graft.planner.Planner
import graft.store.GraphStore

/** Ports /root/reference/tests/where_expression_test.cpp +
  * where_pushdown_join_test.cpp semantics: AND/OR precedence, strict
  * typing errors, unknown-field errors, and the invariant that inlined
  * (scan-attached) and post filters agree.
  */
class WhereSemanticsSpec extends SparkSpec {

  private def db(): GraphStore = {
    val s = new GraphStore(spark)
    s.createSchema("User", "name" -> StringType, "age" -> IntegerType,
      "city" -> StringType, "salary" -> IntegerType)
    s.createSchema("Company", "name" -> StringType, "size" -> IntegerType,
      "city" -> StringType)
    Seq(("alice", 30, "nyc", 120), ("bob", 45, "sf", 90),
      ("carol", 25, "nyc", 150), ("dan", 55, "la", 60)).foreach {
      case (n, a, c, sal) => s.createNode("User",
        Map("name" -> n, "age" -> a, "city" -> c, "salary" -> sal))
    }
    Seq(("acme", 100, "nyc"), ("globex", 5000, "sf")).foreach {
      case (n, sz, c) =>
        s.createNode("Company", Map("name" -> n, "size" -> sz, "city" -> c))
    }
    s.connect("User", 0, "works", "Company", 0)
    s.connect("User", 1, "works", "Company", 1)
    s
  }

  private def names(s: GraphStore, w: WhereExpr): Set[Any] =
    new Planner(s).plan(Q.from("u:User").where(w).select("u.name").build)
      .collect().map(_.get(0)).toSet

  test("AND binds tighter than OR (grammar precedence)") {
    val s = db()
    // age < 28 OR (city = nyc AND salary > 100)
    assert(names(s, ref("u.age") < 28 ||
      (ref("u.city") === "nyc" && ref("u.salary") > 100)) ===
      Set("alice", "carol"))
  }

  test("parenthesized OR inside AND") {
    val s = db()
    assert(names(s, (ref("u.city") === "nyc" || ref("u.city") === "sf") &&
      ref("u.age") >= 30) === Set("alice", "bob"))
  }

  test("unknown field errors at plan time") {
    val s = db()
    val e = intercept[IllegalArgumentException] {
      names(s, ref("u.wat") === 1)
    }
    assert(e.getMessage.contains("unknown field"))
  }

  test("NULL comparisons restricted to = / != (F3)") {
    val s = db()
    assert(intercept[IllegalArgumentException] {
      names(s, Comparison(FieldRef.parse("u.age"), CmpOp.Gt, null))
    }.getMessage.contains("NULL"))
    // = NULL works as IS NULL
    assert(names(s, Comparison(FieldRef.parse("u.name"), CmpOp.Eq, null))
      === Set())
  }

  test("AND of single-alias conjunct with cross-alias OR: conjunct " +
      "inlines, OR defers (OrWithMultipleVariablesNotInlined, " +
      "where_expression_test.cpp:467)") {
    val s = db()
    // alice: age 30, city nyc? reference fixture: user city LA matching
    // via the COMPANY side of the OR — use bob (45, sf) -> globex (5000):
    // u.age = 45 AND (u.city = "nyc" OR c.size > 1000): city misses, the
    // company side of the OR carries the row
    val res = new Planner(s).plan(Q.from("u:User")
      .traverse("u", "works", "c:Company")
      .where(ref("u.age") === 45 &&
        (ref("u.city") === "nyc" || ref("c.size") > 1000))
      .select("u.age", "u.city", "c.size").build)
    assert(rowBag(res) === Map(Seq(45, "sf", 5000) -> 1))
  }

  test("per-alias filters across a 2-hop chain + cross-alias post filter " +
      "(TraversalWhereCombinations3, where_expression_test.cpp:583)") {
    val s = db()
    s.createEdgeSchema("employs", "Company", "User")
    s.connect("Company", 1, "employs", "User", 2) // globex employs carol
    val plan0 = Q.from("u:User")
      .where(ref("u.age") >= 35)
      .traverse("u", "works", "c:Company")
      .where(ref("c.size") > 1000)
      .traverse("c", "employs", "u2:User")
    // u2.city = nyc (inlined on u2) AND u.city = la (cross-hop post): bob
    // is sf, not la -> zero rows, exactly like the reference case
    val zero = new Planner(s).plan(plan0
      .where(ref("u2.city") === "nyc" && ref("u.city") === "la")
      .select("u.name", "c.name", "u2.name").build)
    assert(zero.count() === 0)
    // flipping the post predicate to the matching city yields the row
    val one = new Planner(s).plan(Q.from("u:User")
      .where(ref("u.age") >= 35)
      .traverse("u", "works", "c:Company")
      .where(ref("c.size") > 1000)
      .traverse("c", "employs", "u2:User")
      .where(ref("u2.city") === "nyc" && ref("u.city") === "sf")
      .select("u.name", "c.name", "u2.name").build)
    assert(rowBag(one) === Map(Seq("bob", "globex", "carol") -> 1))
  }

  test("inlined target filter on outer join = NULL row when all targets filtered") {
    val s = db()
    // bob works at globex(size 5000); filter size < 1000 removes it →
    // bob must appear with NULL company (filter is scan-inlined, not
    // post-join — reference where_pushdown_join_test invariant)
    val res = new Planner(s).plan(Q.from("u:User")
      .traverse("u", "works", "c:Company", JoinKind.Left)
      .where(ref("c.size") < 1000)
      .select("u.name", "c.name").build)
    assert(rowBag(res) === Map(
      Seq("alice", "acme") -> 1,
      Seq("bob", null) -> 1,
      Seq("carol", null) -> 1,
      Seq("dan", null) -> 1))
  }

  test("cross-alias predicate runs post-join and kills NULL rows (F7)") {
    val s = db()
    val res = new Planner(s).plan(Q.from("u:User")
      .traverse("u", "works", "c:Company", JoinKind.Left)
      .where(Comparison(FieldRef.parse("c.size"), CmpOp.Gt,
        FieldRef.parse("u.salary")))
      .select("u.name", "c.name").build)
    // only bob: globex(5000) > 90; acme(100) < alice's 120; NULL rows die
    assert(rowBag(res) === Map(Seq("bob", "globex") -> 1))
  }

  test("string ops on map-free columns honor intended semantics (F2)") {
    val s = db()
    assert(names(s, ref("u.name").contains("ar")) === Set("carol"))
    assert(names(s, ref("u.name").startsWith("a")) === Set("alice"))
    assert(names(s, ref("u.name").endsWith("n")) === Set("dan"))
  }
}
