package graft

import org.apache.spark.sql.types._

import graft.core.Ast._
import graft.planner.Planner
import graft.store.GraphStore

/** Ports the semantics of the reference's join suite
  * (/root/reference/tests/join_test.cpp) — same fixture
  * (join_test.cpp:72-96: users alex/bob/jeff/sam/matt, companies
  * ibm/google/aws, per-schema ids from 0), same expected row multisets.
  */
class JoinSemanticsSpec extends SparkSpec {

  /** join_test.cpp setup_test_db */
  private def db(): GraphStore = {
    val s = new GraphStore(spark)
    s.createSchema("users", "name" -> StringType, "age" -> LongType)
    s.createSchema("companies", "name" -> StringType, "size" -> LongType)
    Seq(("alex", 25L), ("bob", 31L), ("jeff", 33L), ("sam", 21L),
      ("matt", 40L)).foreach { case (n, a) =>
      s.createNode("users", Map("name" -> n, "age" -> a))
    }
    Seq(("ibm", 1000L), ("google", 3000L), ("aws", 5000L)).foreach {
      case (n, sz) => s.createNode("companies", Map("name" -> n, "size" -> sz))
    }
    s
  }

  private def q(s: GraphStore, query: GraphQuery) =
    new Planner(s).plan(query)

  test("per-schema ids start at 0 (README.md:139)") {
    val s = db()
    assert(rowBag(q(s, Q.from("u:users").select("u.id").build)) ===
      Map(Seq(0L) -> 1, Seq(1L) -> 1, Seq(2L) -> 1, Seq(3L) -> 1,
        Seq(4L) -> 1))
    assert(rowBag(q(s, Q.from("c:companies").select("c.id").build)).keySet ===
      Set(Seq(0L), Seq(1L), Seq(2L)))
  }

  test("CartesianProductExplosion (join_test.cpp:524): 6 rows") {
    val s = db()
    s.connect("users", 0, "friend", "users", 1)
    s.connect("users", 0, "friend", "users", 2)
    s.connect("users", 0, "friend", "users", 3)
    s.connect("users", 1, "works-at", "companies", 0)
    s.connect("users", 1, "works-at", "companies", 1)
    s.connect("users", 2, "works-at", "companies", 1)
    s.connect("users", 2, "works-at", "companies", 2)
    s.connect("users", 3, "works-at", "companies", 0)
    s.connect("users", 3, "works-at", "companies", 2)
    val res = q(s, Q.from("u:users")
      .traverse("u", "friend", "f:users")
      .traverse("f", "works-at", "c:companies")
      .select("f.name", "c.name").build)
    val bag = rowBag(res)
    assert(bag.values.sum === 6)
    assert(bag === Map(
      Seq("bob", "ibm") -> 1, Seq("bob", "google") -> 1,
      Seq("jeff", "google") -> 1, Seq("jeff", "aws") -> 1,
      Seq("sam", "ibm") -> 1, Seq("sam", "aws") -> 1))
  }

  test("LeftJoin (join_test.cpp:581): NULL row for friend w/o company") {
    val s = db()
    s.connect("users", 0, "friend", "users", 1)
    s.connect("users", 0, "friend", "users", 2)
    s.connect("users", 1, "works-at", "companies", 1)
    val res = q(s, Q.from("u:users")
      .traverse("u", "friend", "f:users")
      .traverse("f", "works-at", "c:companies", JoinKind.Left)
      .select("u.id", "f.name", "c.name").build)
    assert(rowBag(res) === Map(
      Seq(0L, "bob", "google") -> 1,
      Seq(0L, "jeff", null) -> 1))
  }

  test("RightJoin (join_test.cpp:691): all companies incl. unmatched") {
    val s = db()
    s.connect("users", 0, "friend", "users", 1)
    s.connect("users", 0, "friend", "users", 2)
    s.connect("users", 1, "works-at", "companies", 1)
    s.connect("users", 2, "works-at", "companies", 2)
    s.connect("users", 3, "works-at", "companies", 0) // sam not alex's friend
    val res = q(s, Q.from("u:users")
      .traverse("u", "friend", "f:users")
      .traverse("f", "works-at", "c:companies", JoinKind.Right)
      .select("f.name", "c.name").build)
    val bag = rowBag(res)
    // google+aws matched via friends; ibm kept with NULL source (sam's
    // edge is outside the frontier)
    assert(bag === Map(
      Seq("bob", "google") -> 1,
      Seq("jeff", "aws") -> 1,
      Seq(null, "ibm") -> 1))
  }

  test("RIGHT self-join dedup formula (join.cpp:184-198 worked example)") {
    val s = db()
    s.connect("users", 0, "friends", "users", 1)
    s.connect("users", 0, "friends", "users", 2)
    // users 3, 4 isolated
    val res = q(s, Q.from("u:users")
      .traverse("u", "friends", "f:users", JoinKind.Right)
      .select("u.id", "f.id").build)
    // all_targets − matched_sources = {0..4} − {0} = {1,2,3,4};
    // matched pairs (0,1) (0,2); extras = {3,4}
    assert(rowBag(res) === Map(
      Seq(0L, 1L) -> 1, Seq(0L, 2L) -> 1,
      Seq(null, 3L) -> 1, Seq(null, 4L) -> 1))
  }

  test("CombinedJoinTypes (join_test.cpp:742): LEFT then RIGHT") {
    val s = db()
    s.connect("users", 0, "friend", "users", 1)
    s.connect("users", 0, "friend", "users", 2)
    s.connect("users", 1, "works-at", "companies", 1)
    s.connect("users", 4, "works-at", "companies", 0) // matt -> ibm
    val res = q(s, Q.from("u:users")
      .traverse("u", "friend", "f:users", JoinKind.Left)
      .traverse("f", "works-at", "c:companies", JoinKind.Right)
      .select("u.id", "f.id", "c.id").build)
    val bag = rowBag(res)
    assert(bag(Seq(0L, 1L, 1L)) === 1)   // alex->bob->google
    assert(bag(Seq(0L, 2L, null)) === 1) // alex->jeff->NULL (RIGHT keeps
                                         // unmatched intermediate source)
    assert(bag.keys.exists(r => r(0) == null && r(2) == 2L)) // NULL->aws
    assert(bag.keys.exists(r => r(0) == null && r(2) == 0L)) // NULL->ibm
    // matt has no friends; FROM sources a LEFT hop so he's kept
    assert(bag(Seq(4L, null, null)) === 1)
  }

  test("MultiLevelLeftJoin (join_test.cpp:876): two LEFT hops off same alias") {
    val s = db()
    s.connect("users", 0, "friend", "users", 1)
    s.connect("users", 0, "friend", "users", 2)
    s.connect("users", 0, "friend", "users", 3)
    s.connect("users", 1, "works-at", "companies", 1)
    s.connect("users", 2, "likes", "companies", 0)
    val res = q(s, Q.from("u:users")
      .traverse("u", "friend", "f:users", JoinKind.Left)
      .traverse("f", "works-at", "c:companies", JoinKind.Left)
      .traverse("f", "likes", "l:companies", JoinKind.Left)
      .select("f.id", "c.name", "l.name").build)
    val bag = rowBag(res)
    assert(bag(Seq(1L, "google", null)) === 1) // bob works, likes nothing
    assert(bag(Seq(2L, null, "ibm")) === 1)    // jeff likes ibm
    assert(bag(Seq(3L, null, null)) === 1)     // sam neither
  }

  test("SelfJoinWithLeftJoin (join_test.cpp:1010): all users as managers") {
    val s = db()
    s.connect("users", 0, "manages", "users", 1)
    s.connect("users", 1, "manages", "users", 2)
    s.connect("users", 1, "manages", "users", 3)
    val res = q(s, Q.from("manager:users")
      .traverse("manager", "manages", "employee:users", JoinKind.Left)
      .select("manager.id", "employee.id").build)
    val bag = rowBag(res)
    assert(bag === Map(
      Seq(0L, 1L) -> 1, Seq(1L, 2L) -> 1, Seq(1L, 3L) -> 1,
      Seq(2L, null) -> 1, Seq(3L, null) -> 1, Seq(4L, null) -> 1))
  }

  test("FullOuterJoin (join_test.cpp:1127)") {
    val s = db()
    s.connect("users", 0, "friend", "users", 1)
    s.connect("users", 0, "friend", "users", 2)
    s.connect("users", 1, "works-at", "companies", 1)
    s.connect("users", 4, "works-at", "companies", 0)
    val res = q(s, Q.from("u:users")
      .traverse("u", "friend", "f:users", JoinKind.Full)
      .traverse("f", "works-at", "c:companies", JoinKind.Full)
      .select("u.id", "f.id", "c.id").build)
    // Mechanically derived from the reference's alias-keyed row passes:
    // FULL hop1 keeps every u root (FULL gating) AND emits
    // all − matched_sources − matched_targets as NULL-source f extras;
    // FULL hop2 NULL-extends and adds unreached-company extras.
    assert(rowBag(res) === Map(
      Seq(0L, 1L, 1L) -> 1,      // alex->bob->google
      Seq(0L, 2L, null) -> 1,    // alex->jeff->NULL company
      Seq(1L, null, null) -> 1,  // bob as root, no friends
      Seq(2L, null, null) -> 1,  // jeff as root
      Seq(3L, null, null) -> 1,  // sam as root
      Seq(4L, null, null) -> 1,  // matt as root
      Seq(null, 3L, null) -> 1,  // sam as unreached friend target
      Seq(null, 4L, 0L) -> 1,    // matt as unreached friend target — his
                                 // works-at edge still expands to ibm
      Seq(null, null, 2L) -> 1)) // aws unreached by anything
  }

  test("EmptyResultFromInnerJoin: INNER prunes everything") {
    val s = db()
    s.connect("users", 0, "friend", "users", 1)
    val res = q(s, Q.from("u:users")
      .where(ref("u.age") > 100)
      .traverse("u", "friend", "f:users")
      .select("u.id").build)
    assert(res.count() === 0)
  }

  test("SelectClauseFiltering (join_test.cpp:1283): alias.field naming") {
    val s = db()
    s.connect("users", 0, "friend", "users", 1)
    val res = q(s, Q.from("u:users")
      .traverse("u", "friend", "f:users")
      .select("u.name", "f.name").build)
    assert(res.columns.toSeq === Seq("u.name", "f.name"))
    // bare-alias expansion
    val res2 = q(s, Q.from("u:users")
      .traverse("u", "friend", "f:users")
      .select("u").build)
    assert(res2.columns.toSeq === Seq("u.id", "u.name", "u.age"))
    // empty select = all alias columns
    val res3 = q(s, Q.from("u:users")
      .traverse("u", "friend", "f:users").build)
    assert(res3.columns.toSet ===
      Set("u.id", "u.name", "u.age", "f.id", "f.name", "f.age"))
  }

  test("multi-pattern shared target intersects (join_test.cpp:1646 shape)") {
    val s = db()
    // alex and bob both work at google; jeff works at aws
    s.connect("users", 0, "works-at", "companies", 1)
    s.connect("users", 1, "works-at", "companies", 1)
    s.connect("users", 2, "works-at", "companies", 2)
    val res = q(s, Q.from("a:users")
      .traverse("a", "works-at", "c:companies")
      .traverse("b:users", "works-at", "c:companies")
      .where(Comparison(FieldRef.parse("a.id"), CmpOp.Lt,
        FieldRef.parse("b.id")))
      .select("a.name", "b.name", "c.name").build)
    // companies reached by both patterns: google (alex,bob), aws (jeff
    // alone fails a.id < b.id)
    assert(rowBag(res) === Map(Seq("alex", "bob", "google") -> 1))
  }

  test("multi-pattern shared target LEFT unions (join.cpp:119-137)") {
    val s = db()
    // pattern 1 (INNER): alex works-at ibm, bob works-at google
    s.connect("users", 0, "works-at", "companies", 0)
    s.connect("users", 1, "works-at", "companies", 1)
    // pattern 2 (LEFT): jeff likes google, sam likes aws
    s.connect("users", 2, "likes", "companies", 1)
    s.connect("users", 3, "likes", "companies", 2)
    val res = q(s, Q.from("u:users")
      .traverse("u", "works-at", "c:companies")
      .traverse("v:users", "likes", "c:companies", JoinKind.Left)
      .select("u.name", "c.name", "v.name").build)
    // target-id union {ibm,google} ∪ {google,aws} — every company kept;
    // LEFT never prunes pattern-2 sources, so like-less users appear with
    // NULL target (single-pattern LEFT rule, join.cpp:80-118)
    assert(rowBag(res) === Map(
      Seq("alex", "ibm", null) -> 1, // existing target, pattern 2 missed
      Seq("bob", "google", "jeff") -> 1, // both patterns reached google
      Seq(null, "aws", "sam") -> 1, // target only pattern 2 reached
      Seq(null, null, "alex") -> 1, // pattern-2 sources with no edge
      Seq(null, null, "bob") -> 1,
      Seq(null, null, "matt") -> 1))
  }

  test("cyclic RIGHT: row gated on back-edge + unreached-target extras") {
    val s = db()
    // MultiPatternWithSharedVars fixture (join_test.cpp:1646) with the
    // cyclic hop flipped to RIGHT — expectation derived from the
    // strategies being hop-position-independent (join.cpp:243-331):
    // matched rows survive (INNER gating, as at the FROM root), unreached
    // companies append as NULL-source rows.
    s.connect("users", 0, "FRIEND", "users", 1)
    s.connect("users", 0, "FRIEND", "users", 2)
    s.connect("users", 0, "WORKS_AT", "companies", 1)
    s.connect("users", 2, "WORKS_AT", "companies", 1)
    s.connect("users", 1, "WORKS_AT", "companies", 0)
    val res = q(s, Q.from("u:users")
      .traverse("u", "FRIEND", "f:users")
      .traverse("f", "WORKS_AT", "c:companies")
      .traverse("u", "WORKS_AT", "c:companies", JoinKind.Right)
      .select("u.name", "f.name", "c.name").build)
    assert(rowBag(res) === Map(
      Seq("alex", "jeff", "google") -> 1,
      Seq(null, null, "ibm") -> 1, // visited=google only: ibm rows were
      Seq(null, null, "aws") -> 1)) // gated out, so ibm is "unreached"
  }

  test("cyclic FULL: NULL-extend on missing back-edge + target extras") {
    val s = db()
    s.connect("users", 0, "FRIEND", "users", 1)
    s.connect("users", 0, "FRIEND", "users", 2)
    s.connect("users", 0, "WORKS_AT", "companies", 1)
    s.connect("users", 2, "WORKS_AT", "companies", 1)
    s.connect("users", 1, "WORKS_AT", "companies", 0)
    val res = q(s, Q.from("u:users")
      .traverse("u", "FRIEND", "f:users")
      .traverse("f", "WORKS_AT", "c:companies")
      .traverse("u", "WORKS_AT", "c:companies", JoinKind.Full)
      .select("u.name", "f.name", "c.name").build)
    // FULL = LEFT (rows without the back-edge survive) + RIGHT extras —
    // mirrors the FULL-self both-sides emission pinned by
    // FullOuterJoin (join_test.cpp:1127): ibm appears both in its
    // surviving row and as an unreached target.
    assert(rowBag(res) === Map(
      Seq("alex", "bob", "ibm") -> 1, // no alex->ibm edge: NULL-extended
      Seq("alex", "jeff", "google") -> 1,
      Seq(null, null, "ibm") -> 1,
      Seq(null, null, "aws") -> 1))
  }

  test("cyclic pattern: both ends bound") {
    val s = db()
    s.connect("users", 0, "friend", "users", 1)
    s.connect("users", 1, "friend", "users", 0)
    s.connect("users", 1, "friend", "users", 2)
    val res = q(s, Q.from("u:users")
      .traverse("u", "friend", "f:users")
      .traverse("f", "friend", "u:users") // back-edge
      .select("u.id", "f.id").build)
    assert(rowBag(res) === Map(Seq(0L, 1L) -> 1, Seq(1L, 0L) -> 1))
  }

  test("MultiPatternWithSharedVars (join_test.cpp:1646): cyclic INNER") {
    val s = db()
    s.connect("users", 0, "FRIEND", "users", 1)
    s.connect("users", 0, "FRIEND", "users", 2)
    s.connect("users", 0, "WORKS_AT", "companies", 1)
    s.connect("users", 2, "WORKS_AT", "companies", 1)
    s.connect("users", 1, "WORKS_AT", "companies", 0)
    val res = q(s, Q.from("u:users")
      .traverse("u", "FRIEND", "f:users")
      .traverse("f", "WORKS_AT", "c:companies")
      .traverse("u", "WORKS_AT", "c:companies")
      .select("u.name", "f.name", "c.name").build)
    assert(rowBag(res) === Map(Seq("alex", "jeff", "google") -> 1))
  }

  test("cyclic LEFT: both ends bound keeps rows without the back-edge") {
    val s = db()
    s.connect("users", 0, "friend", "users", 1)
    s.connect("users", 1, "friend", "users", 0) // mutual
    s.connect("users", 0, "friend", "users", 2) // one-way
    val res = q(s, Q.from("u:users")
      .traverse("u", "friend", "f:users")
      .traverse("f", "friend", "u:users", JoinKind.Left,
        edgeAlias = Some("back"))
      .select("u.id", "f.id", "back.id").build)
    val bag = rowBag(res)
    assert(bag.size === 3)
    // mutual pairs have a back-edge id, the one-way pair a NULL
    assert(bag.keys.count(r => r(2) != null) === 2)
    assert(bag.keys.exists(r => r(0) == 0L && r(1) == 2L && r(2) == null))
  }

  test("InnerJoinFromSameNodeMultiTarget (join_test.cpp:248): branch product") {
    val s = db()
    s.connect("users", 0, "friend", "users", 1)
    s.connect("users", 0, "friend", "users", 2)
    s.connect("users", 0, "works-at", "companies", 1) // alex -> google
    val res = q(s, Q.from("u:users")
      .traverse("u", "friend", "f:users")
      .traverse("u", "works-at", "c:companies")
      .select("u.name", "f.name", "c.name").build)
    assert(rowBag(res) === Map(
      Seq("alex", "bob", "google") -> 1,
      Seq("alex", "jeff", "google") -> 1))
  }

  test("MultiPathToSameTarget (join_test.cpp:456): friends at same company") {
    val s = db()
    s.connect("users", 0, "friend", "users", 1)
    s.connect("users", 0, "friend", "users", 2)
    s.connect("users", 0, "works-at", "companies", 0) // alex -> ibm
    s.connect("users", 1, "works-at", "companies", 0) // bob -> ibm
    s.connect("users", 2, "works-at", "companies", 1) // jeff -> google
    val res = q(s, Q.from("u:users")
      .traverse("u", "friend", "f:users")
      .traverse("u", "works-at", "c1:companies")
      .traverse("f", "works-at", "c2:companies")
      .where(ref("c1.id") === 0L)
      .where(ref("c2.id") === 0L)
      .select("u.name", "f.name", "c1.name", "c2.name").build)
    assert(rowBag(res) === Map(Seq("alex", "bob", "ibm", "ibm") -> 1))
  }
}
