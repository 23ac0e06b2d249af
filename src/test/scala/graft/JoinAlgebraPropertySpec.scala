package graft

import scala.util.Random

import org.apache.spark.sql.types._

import graft.core.Ast._
import graft.planner.Planner
import graft.store.GraphStore

/** Property-style checks of the join-strategy algebra (SURVEY.md §5):
  * on seeded random graphs, the reference's set identities must hold
  * between join kinds.
  */
class JoinAlgebraPropertySpec extends SparkSpec {

  private def randomGraph(seed: Int): (GraphStore, Int) = {
    val rnd = new Random(seed)
    val s = new GraphStore(spark)
    s.createSchema("users", "name" -> StringType)
    s.createSchema("companies", "name" -> StringType)
    val nU = 4 + rnd.nextInt(4)
    val nC = 2 + rnd.nextInt(3)
    (0 until nU).foreach(i => s.createNode("users", Map("name" -> s"u$i")))
    (0 until nC).foreach(i =>
      s.createNode("companies", Map("name" -> s"c$i")))
    (0 until nU + nC).foreach { _ =>
      if (rnd.nextBoolean())
        s.connect("users", rnd.nextInt(nU), "friend", "users",
          rnd.nextInt(nU))
      if (rnd.nextBoolean())
        s.connect("users", rnd.nextInt(nU), "works", "companies",
          rnd.nextInt(nC))
    }
    // guarantee at least one edge of each type so scans resolve
    s.connect("users", 0, "friend", "users", nU - 1)
    s.connect("users", 0, "works", "companies", 0)
    (s, nU)
  }

  private def rows(s: GraphStore, kind: JoinKind, edge: String,
                   dst: String): Map[Seq[Any], Int] =
    rowBag(new Planner(s).plan(Q.from("u:users")
      .traverse("u", edge, dst, kind)
      .select("u.id", s"${dst.split(':')(0)}.id").build))

  test("INNER = LEFT minus null rows; FULL superset of LEFT (seeded)") {
    (1 to 5).foreach { seed =>
      val (s, _) = randomGraph(seed)
      for ((edge, dst) <- Seq(("friend", "f:users"), ("works", "c:companies"))) {
        val inner = rows(s, JoinKind.Inner, edge, dst)
        val left = rows(s, JoinKind.Left, edge, dst)
        val full = rows(s, JoinKind.Full, edge, dst)
        val leftMatched = left.filter(_._1(1) != null)
        assert(leftMatched === inner, s"seed=$seed $edge")
        // FULL contains every LEFT row
        left.foreach { case (r, n) =>
          assert(full.getOrElse(r, 0) >= n, s"seed=$seed $edge FULL ⊉ LEFT: $r")
        }
      }
    }
  }

  test("RIGHT-self formula: extras = all − matched_sources − matched_targets") {
    (1 to 5).foreach { seed =>
      val (s, nU) = randomGraph(seed)
      val inner = rows(s, JoinKind.Inner, "friend", "f:users")
      val right = rows(s, JoinKind.Right, "friend", "f:users")
      val matchedSrc = inner.keys.map(_(0)).toSet
      val matchedTgt = inner.keys.map(_(1)).toSet
      val expectedExtras =
        (0L until nU).map(x => x: Any).toSet -- matchedSrc -- matchedTgt
      val actualExtras = right.filter(_._1(0) == null).keys.map(_(1)).toSet
      assert(actualExtras === expectedExtras, s"seed=$seed")
      assert(right.filter(_._1(0) != null) === inner, s"seed=$seed matched")
    }
  }

  test("RIGHT cross-schema: null-src rows are exactly unreached targets") {
    (1 to 5).foreach { seed =>
      val (s, _) = randomGraph(seed)
      val nC = s.nodes("companies").count()
      val inner = rows(s, JoinKind.Inner, "works", "c:companies")
      val right = rows(s, JoinKind.Right, "works", "c:companies")
      val matchedTgt = inner.keys.map(_(1)).toSet
      val expected = (0L until nC).map(x => x: Any).toSet -- matchedTgt
      assert(right.filter(_._1(0) == null).keys.map(_(1)).toSet === expected,
        s"seed=$seed")
      assert(right.filter(_._1(0) != null) === inner, s"seed=$seed")
    }
  }

  test("cyclic RIGHT/FULL hop identities (seeded): RIGHT = gated ∪ " +
      "extras, FULL = NULL-extended ∪ extras") {
    // pattern: (u)-[:friend]->(f), then a cyclic hop (u)-[:friend2]->(f)
    // with both ends bound. Identities derived from the strategies being
    // hop-position-independent (reference src/query/join.cpp:243-331).
    (1 to 5).foreach { seed =>
      val rnd = new Random(seed * 31)
      val s = new GraphStore(spark)
      s.createSchema("users", "name" -> StringType)
      val nU = 4 + rnd.nextInt(3)
      (0 until nU).foreach(i => s.createNode("users", Map("name" -> s"u$i")))
      // unique edges: duplicate edges legitimately multiply joined rows,
      // which would make the row-level identities below multiplicity-
      // sensitive for no semantic gain
      (0 until 2 * nU).foreach { _ =>
        if (rnd.nextBoolean())
          s.connect("users", rnd.nextInt(nU), "friend", "users",
            rnd.nextInt(nU), unique = true)
        if (rnd.nextBoolean())
          s.connect("users", rnd.nextInt(nU), "friend2", "users",
            rnd.nextInt(nU), unique = true)
      }
      s.connect("users", 0, "friend", "users", nU - 1, unique = true)
      s.connect("users", 0, "friend2", "users", nU - 1, unique = true)
      def cyc(kind: JoinKind): Map[Seq[Any], Int] =
        rowBag(new Planner(s).plan(Q.from("u:users")
          .traverse("u", "friend", "f:users")
          .traverse("u", "friend2", "f:users", kind)
          .select("u.id", "f.id").build))
      val inner = cyc(JoinKind.Inner)
      val right = cyc(JoinKind.Right)
      val full = cyc(JoinKind.Full)
      val base = rows(s, JoinKind.Inner, "friend", "f:users")
      // RIGHT matched part == INNER (edge-gated rows)
      assert(right.filter(_._1.forall(_ != null)) === inner,
        s"seed=$seed RIGHT matched")
      // FULL non-extra part == the first hop's rows (cyclic hop only
      // NULL-extends, never prunes); u stays bound so no half-null rows
      assert(full.filter(_._1(0) != null) === base, s"seed=$seed FULL kept")
      // extras for BOTH kinds: all − this hop's edge-MATCHED nodes (both
      // sides, self-join rule). A NULL-extended FULL row does NOT mark
      // its nodes visited — mirrors the reference's FULL-self both-sides
      // emission (join_test.cpp:1127), where an unmatched source is kept
      // NULL-extended AND re-emitted as an extra.
      def extras(m: Map[Seq[Any], Int]) = {
        val visited = inner.keys.flatMap(r => Seq(r(0), r(1)))
          .filter(_ != null).toSet
        val exp = (0L until nU).map(x => x: Any).toSet -- visited
        assert(m.filter(_._1(0) == null).keys.map(_(1)).toSet === exp,
          s"seed=$seed extras")
      }
      extras(right)
      extras(full)
    }
  }

  test("VarLength.pairs: shortest hops, cycle-safe, bounded") {
    import spark.implicits._
    // chain 0->1->2->3 plus a cycle 3->0 and a shortcut 0->2
    val e = Seq((0L,1L),(1L,2L),(2L,3L),(3L,0L),(0L,2L)).toDF("src","dst")
    val got = graft.planner.VarLength.pairs(e, 1, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got((0L,1L)) === 1)
    assert(got((0L,2L)) === 1) // shortcut beats the 2-hop path
    assert(got((0L,3L)) === 2) // via the shortcut
    assert(got((1L,0L)) === 3) // 1->2->3->0
    assert(got((0L,0L)) === 3) // cycle back to self found at depth 3
    assert(!got.contains((1L,1L))) // its cycle needs 4 hops > max
    // minHops filter
    val deep = graft.planner.VarLength.pairs(e, 2, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!deep.contains((0L,1L)) && deep.contains((0L,3L)))
  }
}
