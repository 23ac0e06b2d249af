package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.core.Ast._
import graft.operators.{AsOfJoin, RangeJoin}
import graft.planner.Planner
import graft.ql.Shell
import graft.store.GraphStore

/** Beyond-reference join surface (SURVEY §2.3 [ABSENT] rows): semi/anti
  * hops, undirected hops, as-of joins, keyed interval joins.
  */
class ExtendedJoinsSpec extends SparkSpec {

  private def db(): GraphStore = {
    val s = new GraphStore(spark)
    s.createSchema("users", "name" -> StringType, "age" -> LongType)
    s.createSchema("companies", "name" -> StringType, "size" -> LongType)
    Seq(("alex", 25L), ("bob", 31L), ("jeff", 33L)).foreach { case (n, a) =>
      s.createNode("users", Map("name" -> n, "age" -> a))
    }
    Seq(("ibm", 1000L), ("aws", 5000L)).foreach { case (n, sz) =>
      s.createNode("companies", Map("name" -> n, "size" -> sz))
    }
    s.connect("users", 0, "works-at", "companies", 0) // alex -> ibm
    s.connect("users", 1, "works-at", "companies", 1) // bob -> aws
    s
  }

  private def q(s: GraphStore, query: GraphQuery) =
    new Planner(s).plan(query)

  test("SEMI hop keeps sources with a matching edge+target, binds nothing") {
    val s = db()
    // target-scoped WHERE: only big companies count for the existence test
    val res = q(s, Q.from("u:users")
      .traverse("u", "works-at", "c:companies", JoinKind.Semi)
      .where(ref("c.size") > 2000L)
      .select("u.name").build)
    assert(rowBag(res) === Map(Seq("bob") -> 1))
    // without the target filter both employed users survive
    val all = q(s, Q.from("u:users")
      .traverse("u", "works-at", "c:companies", JoinKind.Semi)
      .select("u.name").build)
    assert(rowBag(all) === Map(Seq("alex") -> 1, Seq("bob") -> 1))
  }

  test("ANTI hop keeps sources with NO matching edge+target") {
    val s = db()
    val res = q(s, Q.from("u:users")
      .traverse("u", "works-at", "c:companies", JoinKind.Anti)
      .select("u.name").build)
    assert(rowBag(res) === Map(Seq("jeff") -> 1))
    // scoped: nobody works at a big company except bob
    val scoped = q(s, Q.from("u:users")
      .traverse("u", "works-at", "c:companies", JoinKind.Anti)
      .where(ref("c.size") > 2000L)
      .select("u.name").build)
    assert(rowBag(scoped) === Map(Seq("alex") -> 1, Seq("jeff") -> 1))
  }

  test("semi/anti aliases are unusable in SELECT and cross-alias WHERE") {
    val s = db()
    val e1 = intercept[IllegalArgumentException] {
      q(s, Q.from("u:users")
        .traverse("u", "works-at", "c:companies", JoinKind.Semi)
        .select("u.name", "c.name").build)
    }
    assert(e1.getMessage.contains("binds no columns"))
    val e2 = intercept[IllegalArgumentException] {
      q(s, Q.from("u:users")
        .traverse("u", "works-at", "c:companies", JoinKind.Anti)
        .where(Comparison(FieldRef.parse("c.size"), CmpOp.Gt,
          FieldRef.parse("u.age")))
        .select("u.name").build)
    }
    assert(e2.getMessage.contains("binds no columns"))
    // a later binding hop materializes the alias again
    val ok = q(s, Q.from("u:users")
      .traverse("u", "works-at", "c:companies", JoinKind.Semi)
      .traverse("u", "works-at", "c:companies")
      .select("u.name", "c.name").build)
    assert(rowBag(ok) === Map(
      Seq("alex", "ibm") -> 1, Seq("bob", "aws") -> 1))
  }

  test("cyclic SEMI/ANTI gate an already-bound pair on edge existence") {
    val s = db()
    s.connect("users", 0, "friend", "users", 1) // alex -> bob
    val base = Q.from("u:users")
      .traverse("u", "works-at", "c:companies")
      .traverse("u2:users", "works-at", "c:companies")
    val semi = q(s, base
      .traverse("u", "friend", "u2:users", JoinKind.Semi)
      .select("u.name", "u2.name").build)
    assert(rowBag(semi) === Map.empty) // alex/bob work at different places
    val s2 = db()
    s2.connect("users", 0, "friend", "users", 0) // self-loop at alex
    val semi2 = q(s2, Q.from("u:users")
      .traverse("u", "works-at", "c:companies")
      .traverse("u2:users", "works-at", "c:companies")
      .traverse("u", "friend", "u2:users", JoinKind.Semi)
      .select("u.name", "u2.name").build)
    assert(rowBag(semi2) === Map(Seq("alex", "alex") -> 1))
  }

  test("undirected hop sees both orientations (QL `-[..]-` syntax)") {
    val s = db()
    s.createEdgeSchema("knows", "users", "users")
    s.connect("users", 0, "knows", "users", 1) // alex -> bob, stored once
    val sh = new Shell(s)
    val directed = sh.execute(
      "MATCH (a:users)-[:knows]->(b:users) SELECT a.name, b.name;").get
    assert(rowBag(directed) === Map(Seq("alex", "bob") -> 1))
    val undirected = sh.execute(
      "MATCH (a:users)-[:knows]-(b:users) SELECT a.name, b.name;").get
    assert(rowBag(undirected) === Map(
      Seq("alex", "bob") -> 1, Seq("bob", "alex") -> 1))
    // SEMI/ANTI parse in QL too
    val semi = sh.execute(
      "MATCH (a:users)-[:knows SEMI]->(b:users) SELECT a.name;").get
    assert(rowBag(semi) === Map(Seq("alex") -> 1))
    val anti = sh.execute(
      "MATCH (a:users)-[:knows ANTI]->(b:users) SELECT a.name;").get
    assert(rowBag(anti) === Map(Seq("bob") -> 1, Seq("jeff") -> 1))
  }

  // ---------------- as-of join ----------------

  private def eventsDf(rows: Seq[(Long, Long, Long)], idName: String,
                       tsName: String) = {
    import spark.implicits._
    rows.toDF(idName, "k", tsName)
  }

  test("as-of join: newest right at-or-before, per key, left-outer") {
    val left = eventsDf(Seq((1L, 7L, 100L), (2L, 7L, 200L), (3L, 7L, 50L),
      (4L, 8L, 100L)), "lid", "lts")
    val right = eventsDf(Seq((10L, 7L, 60L), (11L, 7L, 150L),
      (12L, 9L, 10L)), "rid", "rts")
    val res = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts")
      .select("lid", "rid", "rts")
    assert(rowBag(res) === Map(
      Seq(1L, 10L, 60L) -> 1, // newest <= 100 is 60
      Seq(2L, 11L, 150L) -> 1, // newest <= 200 is 150
      Seq(3L, null, null) -> 1, // nothing at or before 50
      Seq(4L, null, null) -> 1)) // key 8 has no rights
  }

  test("as-of join: exact-timestamp match, deterministic tie-break, " +
      "tolerance") {
    val left = eventsDf(Seq((1L, 7L, 100L)), "lid", "lts")
    val right = eventsDf(Seq((10L, 7L, 100L), (11L, 7L, 100L),
      (9L, 7L, 40L)), "rid", "rts")
    // a right AT the left ts matches; among ties the max payload wins
    val res = AsOfJoin.backward(left, right, Seq("k"), "lts", "rts")
      .select("lid", "rid")
    assert(rowBag(res) === Map(Seq(1L, 11L) -> 1))
    // tolerance: drop matches older than lts - tol
    val far = AsOfJoin.backward(left,
      eventsDf(Seq((9L, 7L, 40L)), "rid", "rts"),
      Seq("k"), "lts", "rts", tolerance = Some(50L))
      .select("lid", "rid")
    assert(rowBag(far) === Map(Seq(1L, null) -> 1))
    val near = AsOfJoin.backward(left,
      eventsDf(Seq((9L, 7L, 40L)), "rid", "rts"),
      Seq("k"), "lts", "rts", tolerance = Some(60L))
      .select("lid", "rid")
    assert(rowBag(near) === Map(Seq(1L, 9L) -> 1))
  }

  test("range join: [lo, hi) boundaries exact across bin edges") {
    val left = eventsDf(Seq((1L, 7L, 1000L)), "lid", "lts")
    // window [1000+0, 1000+100): 999 out, 1000 in, 1099 in, 1100 out
    val right = eventsDf(Seq((20L, 7L, 999L), (21L, 7L, 1000L),
      (22L, 7L, 1099L), (23L, 7L, 1100L), (24L, 8L, 1050L)),
      "rid", "rts")
    val res = RangeJoin.byKeyAndWindow(left, right, Seq("k"),
      "lts", "rts", 0L, 100L).select("lid", "rid")
    assert(rowBag(res) === Map(Seq(1L, 21L) -> 1, Seq(1L, 22L) -> 1))
    // negative lo: window [900, 1000)
    val back = RangeJoin.byKeyAndWindow(left, right, Seq("k"),
      "lts", "rts", -100L, 0L).select("lid", "rid")
    assert(rowBag(back) === Map(Seq(1L, 20L) -> 1))
  }

  test("range join: epoch-nanosecond timestamps stay exact " +
      "(beyond double precision)") {
    // 1.7e18 ns — a double rounds these to multiples of 256; the shift-
    // based binning must not
    val base = 1700000000000000000L
    val left = eventsDf(Seq((1L, 7L, base)), "lid", "lts")
    val right = eventsDf(Seq((20L, 7L, base - 1L), (21L, 7L, base),
      (22L, 7L, base + 3599999999999L), (23L, 7L, base + 3600000000000L)),
      "rid", "rts")
    val res = RangeJoin.byKeyAndWindow(left, right, Seq("k"),
      "lts", "rts", 0L, 3600000000000L).select("lid", "rid")
    assert(rowBag(res) === Map(Seq(1L, 21L) -> 1, Seq(1L, 22L) -> 1))
  }
}
