package graft

import graft.core.MockClock
import graft.core.Ast._
import graft.ql.Shell
import graft.store.GraphStore

/** Beyond-reference TundraQL surface (SURVEY §2 preamble / §2.5 [ABSENT]
  * notes say to expose what Spark gives for free): aggregates with
  * implicit GROUP BY, ORDER BY / LIMIT, AS OF, and `*min..max`
  * variable-length hops.
  */
class QlExtensionsSpec extends SparkSpec {

  private def shell(): Shell = new Shell(new GraphStore(spark))

  private def seeded(): Shell = {
    val sh = shell()
    sh.execute("""
      CREATE SCHEMA User (name: STRING, team: STRING, age: INT64);
      CREATE SCHEMA Company (name: STRING);
      CREATE NODE User (name = "a", team = "eng", age = 30);
      CREATE NODE User (name = "b", team = "eng", age = 40);
      CREATE NODE User (name = "c", team = "ops", age = 50);
      CREATE NODE Company (name = "acme");
      CREATE EDGE WORKS_AT FROM User(0) TO Company(0);
      CREATE EDGE WORKS_AT FROM User(1) TO Company(0);
    """)
    sh
  }

  test("ORDER BY / LIMIT via QL") {
    val sh = seeded()
    val res = sh.execute(
      "MATCH (u:User) SELECT u.name ORDER BY u.name DESC LIMIT 2;").get
    assert(res.collect().map(_.getString(0)).toSeq === Seq("c", "b"))
    val asc = sh.execute(
      "MATCH (u:User) SELECT u.name, u.age ORDER BY u.age LIMIT 1;").get
    assert(asc.collect().map(_.getString(0)).toSeq === Seq("a"))
  }

  test("OFFSET pages past ORDER BY (QL + builder)") {
    val sh = seeded()
    val res = sh.execute(
      "MATCH (u:User) SELECT u.name ORDER BY u.name LIMIT 2 OFFSET 1;").get
    assert(res.collect().map(_.getString(0)).toSeq === Seq("b", "c"))
    val bare = sh.execute(
      "MATCH (u:User) SELECT u.name ORDER BY u.name OFFSET 2;").get
    assert(bare.collect().map(_.getString(0)).toSeq === Seq("c"))
  }

  test("aggregates with implicit GROUP BY via QL") {
    val sh = seeded()
    val res = sh.execute(
      "MATCH (u:User) SELECT u.team, COUNT(*) AS n, SUM(u.age) AS total, " +
        "AVG(u.age) AS mean ORDER BY u.team;").get
    assert(res.columns.toSeq === Seq("u.team", "n", "total", "mean"))
    assert(res.collect().map(_.toSeq).toSeq === Seq(
      Seq("eng", 2L, 70L, 35.0), Seq("ops", 1L, 50L, 50.0)))
  }

  test("global aggregate (no group keys), COUNT(DISTINCT)") {
    val sh = seeded()
    val res = sh.execute(
      "MATCH (u:User) SELECT COUNT(*) AS n, COUNT(DISTINCT u.team) AS teams, " +
        "MIN(u.age) AS lo, MAX(u.age) AS hi;").get
    assert(res.collect().head.toSeq === Seq(3L, 2L, 30L, 50L))
  }

  test("aggregate over a traversal") {
    val sh = seeded()
    val res = sh.execute(
      "MATCH (u:User)-[:WORKS_AT]->(c:Company) " +
        "SELECT c.name, COUNT(u.id) AS staff;").get
    assert(rowBag(res) === Map(Seq("acme", 2L) -> 1))
  }

  test("SELECT DISTINCT, HAVING, IN lists (QL)") {
    val sh = seeded()
    val d = sh.execute("MATCH (u:User) SELECT DISTINCT u.team;").get
    assert(rowBag(d) === Map(Seq("eng") -> 1, Seq("ops") -> 1))
    // HAVING filters on the aggregate's output name, post-grouping
    val h = sh.execute("MATCH (u:User) SELECT u.team, COUNT(*) AS n " +
      "HAVING n > 1;").get
    assert(rowBag(h) === Map(Seq("eng", 2L) -> 1))
    val h2 = sh.execute("MATCH (u:User) SELECT u.team, COUNT(*) AS n, " +
      "SUM(u.age) AS total HAVING n > 0 AND total < 60;").get
    assert(rowBag(h2) === Map(Seq("ops", 1L, 50L) -> 1)) // eng total 70 out
    val e = intercept[IllegalArgumentException] {
      sh.execute("MATCH (u:User) SELECT u.team, COUNT(*) AS n " +
        "HAVING bogus > 1;").get.collect()
    }
    assert(e.getMessage.contains("unknown output column"))
    // IN desugars to equality OR chain (strict typing per value)
    val in = sh.execute("MATCH (u:User) WHERE u.name IN (\"a\", \"c\") " +
      "SELECT u.name;").get
    assert(rowBag(in) === Map(Seq("a") -> 1, Seq("c") -> 1))
    val typed = intercept[IllegalArgumentException] {
      sh.execute("MATCH (u:User) WHERE u.name IN (1, 2) SELECT u.name;")
        .get.collect()
    }
    assert(typed.getMessage.contains("type error"))
  }

  test("scalar functions + arithmetic in WHERE and SELECT (QL)") {
    val sh = seeded()
    val res = sh.execute(
      "MATCH (u:User) WHERE length(u.team) = 3 AND u.age % 20 = 10 " +
        "SELECT u.name, upper(u.team) AS team_u, u.age * 2 + 1 AS a2;").get
    assert(res.columns.toSeq === Seq("u.name", "team_u", "a2"))
    // len-3 teams = eng AND ops; age%20=10 keeps a (30) and c (50)
    assert(rowBag(res) === Map(
      Seq("a", "ENG", 61L) -> 1, Seq("c", "OPS", 101L) -> 1))
    // precedence: * binds tighter than +
    val prec = sh.execute(
      "MATCH (u:User) WHERE u.name = \"a\" " +
        "SELECT u.age + 2 * 10 AS x, (u.age + 2) * 10 AS y;").get
    assert(prec.collect().head.toSeq === Seq(50L, 320L))
    // concat/substr/round compile; computed items need AS
    val f = sh.execute(
      "MATCH (u:User) WHERE u.name = \"c\" " +
        "SELECT concat(u.name, u.team) AS nt, substr(u.team, 1, 2) AS t2, " +
        "round(u.age / 7, 1) AS r;").get
    assert(f.collect().head.toSeq === Seq("cops", "op", 7.1))
    val e = intercept[IllegalArgumentException] {
      sh.execute("MATCH (u:User) SELECT u.age + 1;")
    }
    assert(e.getMessage.contains("AS"))
    val uf = intercept[IllegalArgumentException] {
      sh.execute("MATCH (u:User) SELECT frobnicate(u.age) AS x;").get
        .collect()
    }
    assert(uf.getMessage.contains("unknown function"))
  }

  test("scalar expressions via the builder DSL") {
    val store = new GraphStore(spark)
    store.createSchema("User",
      "name" -> org.apache.spark.sql.types.StringType,
      "age" -> org.apache.spark.sql.types.LongType)
    Seq(("alice", 30L), ("bo", 41L)).foreach { case (n, a) =>
      store.createNode("User", Map("name" -> n, "age" -> a))
    }
    val planner = new graft.planner.Planner(store)
    val res = planner.plan(Q.from("u:User")
      .where(sfn("length", sref("u.name")) > slit(2))
      .selectExpr(sfn("upper", sref("u.name")), "nm")
      .selectExpr(sref("u.age") * slit(2L), "a2")
      .build)
    assert(rowBag(res) === Map(Seq("ALICE", 60L) -> 1))
  }

  test("duplicate default aggregate names rejected at parse time") {
    val sh = seeded()
    // SUM(u.age) and SUM(c.age) would both default to sum_age — an
    // ambiguous output schema; the parser names the fix
    val e = intercept[IllegalArgumentException] {
      sh.execute("MATCH (u:User)-[:WORKS_AT]->(c:Company) " +
        "SELECT SUM(u.age), SUM(c.age);")
    }
    assert(e.getMessage.contains("use AS"))
    assert(e.getMessage.contains("sum_age"))
    // two COUNT(*) collide on the bare default 'count' too
    val e2 = intercept[IllegalArgumentException] {
      sh.execute("MATCH (u:User) SELECT COUNT(*), COUNT(*);")
    }
    assert(e2.getMessage.contains("use AS"))
    // AS disambiguation keeps it legal
    val ok = sh.execute("MATCH (u:User) SELECT SUM(u.age) AS a, " +
      "SUM(u.age) AS b;").get
    assert(ok.collect().head.toSeq === Seq(120L, 120L))
  }

  test("AS OF VALID via QL sees historical versions") {
    val clock = new MockClock(1000L)
    val store = new GraphStore(spark, versioningEnabled = true, clock = clock)
    val sh = new Shell(store)
    sh.execute("""
      CREATE SCHEMA User (name: STRING, age: INT64);
      CREATE NODE User (name = "a", age = 1);
    """)
    clock.set(2000L)
    sh.execute("UPDATE User(0) SET age = 2;")
    val past = sh.execute(
      "MATCH (u:User) AS OF VALID 1500 SELECT u.age;").get
    assert(past.collect().map(_.getLong(0)).toSeq === Seq(1L))
    val now = sh.execute("MATCH (u:User) SELECT u.age;").get
    assert(now.collect().map(_.getLong(0)).toSeq === Seq(2L))
    val bitemporal = sh.execute(
      "MATCH (u:User) AS OF VALID 1500 TX 1500 SELECT u.age;").get
    assert(bitemporal.collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("variable-length hop *1..2 via QL with hops exposed") {
    val sh = shell()
    sh.execute("""
      CREATE SCHEMA User (name: STRING);
      CREATE NODE User (name = "a");
      CREATE NODE User (name = "b");
      CREATE NODE User (name = "c");
      CREATE EDGE FRIEND FROM User(0) TO User(1);
      CREATE EDGE FRIEND FROM User(1) TO User(2);
    """)
    val res = sh.execute(
      "MATCH (u:User)-[e:FRIEND*1..2]->(f:User) " +
        "WHERE u.name = \"a\" SELECT u.name, f.name, e.hops;").get
    assert(rowBag(res) === Map(
      Seq("a", "b", 1) -> 1, Seq("a", "c", 2) -> 1))
    // hops predicate attaches to the pair set
    val two = sh.execute(
      "MATCH (u:User)-[e:FRIEND*1..2]->(f:User) " +
        "WHERE u.name = \"a\" AND e.hops >= 2 SELECT f.name;").get
    assert(rowBag(two) === Map(Seq("c") -> 1))
  }

  test("UNION / INTERSECT / EXCEPT between MATCH results (QL)") {
    val sh = seeded()
    // UNION dedups; UNION ALL keeps both copies
    val u = sh.execute("MATCH (u:User) WHERE u.team = \"eng\" " +
      "SELECT u.name UNION MATCH (u:User) WHERE u.age >= 40 " +
      "SELECT u.name;").get
    assert(rowBag(u) === Map(Seq("a") -> 1, Seq("b") -> 1, Seq("c") -> 1))
    val ua = sh.execute("MATCH (u:User) WHERE u.team = \"eng\" " +
      "SELECT u.name UNION ALL MATCH (u:User) WHERE u.age >= 40 " +
      "SELECT u.name;").get
    assert(rowBag(ua) === Map(Seq("a") -> 1, Seq("b") -> 2, Seq("c") -> 1))
    val i = sh.execute("MATCH (u:User) WHERE u.team = \"eng\" " +
      "SELECT u.name INTERSECT MATCH (u:User) WHERE u.age >= 40 " +
      "SELECT u.name;").get
    assert(rowBag(i) === Map(Seq("b") -> 1))
    // left-associative chain: (eng EXCEPT age>=40) UNION ops
    val chain = sh.execute("MATCH (u:User) WHERE u.team = \"eng\" " +
      "SELECT u.name EXCEPT MATCH (u:User) WHERE u.age >= 40 " +
      "SELECT u.name UNION MATCH (u:User) WHERE u.team = \"ops\" " +
      "SELECT u.name;").get
    assert(rowBag(chain) === Map(Seq("a") -> 1, Seq("c") -> 1))
    // mismatched output columns are rejected up front
    val e = intercept[IllegalArgumentException] {
      sh.execute("MATCH (u:User) SELECT u.name UNION " +
        "MATCH (u:User) SELECT u.age;")
    }
    assert(e.getMessage.contains("matching output columns"))
  }

  test("CONTAINS / STARTS_WITH / ENDS_WITH in QL WHERE") {
    val sh = seeded()
    val c = sh.execute("MATCH (u:User) WHERE u.team CONTAINS \"n\" " +
      "SELECT u.name;").get
    assert(rowBag(c) === Map(Seq("a") -> 1, Seq("b") -> 1)) // eng only
    val s = sh.execute("MATCH (u:User) WHERE u.team STARTS_WITH \"op\" " +
      "SELECT u.name;").get
    assert(rowBag(s) === Map(Seq("c") -> 1))
    val e = sh.execute("MATCH (u:User) WHERE u.team ENDS_WITH \"g\" " +
      "SELECT u.name;").get
    assert(rowBag(e) === Map(Seq("a") -> 1, Seq("b") -> 1))
    // strict typing (F3): string ops demand string operands
    val bad = intercept[IllegalArgumentException] {
      sh.execute("MATCH (u:User) WHERE u.age CONTAINS \"3\" " +
        "SELECT u.name;").get.collect()
    }
    assert(bad.getMessage.toLowerCase.contains("string"))
  }

  test("builder surface: agg, orderBy, limit") {
    val store = new GraphStore(spark)
    store.createSchema("User",
      "name" -> org.apache.spark.sql.types.StringType,
      "age" -> org.apache.spark.sql.types.LongType)
    Seq(("a", 30L), ("b", 40L), ("c", 50L)).foreach { case (n, a) =>
      store.createNode("User", Map("name" -> n, "age" -> a))
    }
    val planner = new graft.planner.Planner(store)
    val top = planner.plan(Q.from("u:User")
      .select("u.name").orderBy("u.name" -> false).limit(2).build)
    assert(top.collect().map(_.getString(0)).toSeq === Seq("c", "b"))
    val agged = planner.plan(Q.from("u:User")
      .agg(AggFn.Sum, "u.age", "total").count("n").build)
    assert(agged.collect().head.toSeq === Seq(120L, 3L))
  }
}
