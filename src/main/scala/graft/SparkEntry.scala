package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Ast._
import graft.core.MockClock
import graft.planner.Planner
import graft.store.GraphStore
import graft.tpch.TpchGraph

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry runs through the engine surface (Query AST →
  * Planner → DataFrame, or GraphStore DML), never raw SQL, so the DuckDB
  * oracle genuinely gates engine semantics.
  */
object SparkEntry {

  private def planner(spark: SparkSession, dir: String): Planner =
    new Planner(TpchGraph.store(spark, dir))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Shape = the reference's flagship bench query (filter → hop → filter,
    * bench/tundra_runner.cpp:118-131) on the testdata graph. */
  def entry(spark: SparkSession): DataFrame =
    planner(spark, "/root/testdata/sf0.001").plan(
      Q.from("c:customer")
        .where(ref("c.mktsegment") === "BUILDING" && ref("c.acctbal") > 1000)
        .traverse("c", "placed", "o:orders")
        .where(ref("o.totalprice") > 50000)
        .select("c.id", "c.name", "o.id", "o.totalprice")
        .build)

  /** Builds the bitemporal fixture used by q17/q18: customer v0 at t=0;
    * at tx=2000 a retroactive correction (valid_from=500) bumps acctbal by
    * 100 for ids divisible by 3 (reference T1-T4 semantics). */
  private def versionedCustomers(spark: SparkSession,
                                 dir: String): GraphStore = {
    val clock = new MockClock(0L)
    val s = new GraphStore(spark, versioningEnabled = true, clock = clock)
    s.attachNodes("customer",
      spark.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").as("id"), col("c_name").as("name"),
          col("c_acctbal").as("acctbal")), "id")
    clock.set(2000L)
    s.updateWhere("customer", col("id") % 3 === 0,
      Map("acctbal" -> (col("acctbal") + 100)), validFrom = Some(500L))
    s
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- S1 scan + P1 projection
    "q01_scan" -> ((s, dir) =>
      planner(s, dir).plan(Q.from("c:customer")
        .selectAs("c.id", "c_id").selectAs("c.name", "c_name").build)),
    // ---- F1/F2 numeric filter
    "q02_filter_numeric" -> ((s, dir) =>
      planner(s, dir).plan(Q.from("c:customer")
        .where(ref("c.acctbal") > 1000)
        .selectAs("c.id", "c_id").selectAs("c.acctbal", "c_acctbal").build)),
    // ---- F2 string predicates (intended semantics, not the reference's
    // degraded arrow path)
    "q03_filter_string" -> ((s, dir) =>
      planner(s, dir).plan(Q.from("c:customer")
        .where(ref("c.name").startsWith("Customer#") &&
          ref("c.name").endsWith("7") && ref("c.name").contains("12"))
        .selectAs("c.id", "c_id").selectAs("c.name", "c_name").build)),
    // ---- F4 AND/OR tree + F3 strict typing
    "q04_filter_andor" -> ((s, dir) =>
      planner(s, dir).plan(Q.from("o:orders")
        .where((ref("o.status") === "F" || ref("o.totalprice") > 100000.0) &&
          ref("o.priority") =!= "1-URGENT")
        .selectAs("o.id", "o_id").selectAs("o.status", "o_status")
        .selectAs("o.totalprice", "o_totalprice").build)),
    // ---- J1+J2 INNER hop
    "q05_join_inner" -> ((s, dir) =>
      planner(s, dir).plan(Q.from("c:customer")
        .traverse("c", "placed", "o:orders")
        .selectAs("c.id", "c_id").selectAs("o.id", "o_id").build)),
    // ---- J3 LEFT hop
    "q06_join_left" -> ((s, dir) =>
      planner(s, dir).plan(Q.from("c:customer")
        .traverse("c", "placed", "o:orders", JoinKind.Left)
        .selectAs("c.id", "c_id").selectAs("o.id", "o_id").build)),
    // ---- J4 RIGHT cross-schema
    "q07_join_right" -> ((s, dir) =>
      planner(s, dir).plan(Q.from("c:customer")
        .where(ref("c.acctbal") > 9000)
        .traverse("c", "placed", "o:orders", JoinKind.Right)
        .selectAs("c.id", "c_id").selectAs("o.id", "o_id").build)),
    // ---- J6 FULL cross-schema
    "q08_join_full" -> ((s, dir) =>
      planner(s, dir).plan(Q.from("c:customer")
        .where(ref("c.acctbal") > 9000)
        .traverse("c", "placed", "o:orders", JoinKind.Full)
        .selectAs("c.id", "c_id").selectAs("o.id", "o_id").build)),
    // ---- J7 two hops + F6 inlined WHERE
    "q09_two_hop" -> ((s, dir) =>
      planner(s, dir).plan(Q.from("c:customer")
        .where(ref("c.mktsegment") === "BUILDING")
        .traverse("c", "placed", "o:orders")
        .traverse("o", "contains", "l:lineitem")
        .where(ref("l.quantity") > 40.0)
        .selectAs("c.id", "c_id").selectAs("o.id", "o_id")
        .selectAs("l.linenumber", "l_linenumber").build)),
    // ---- J5 RIGHT self-join dedup: target_ids = all − matched_sources
    "q10_self_right" -> ((s, dir) =>
      planner(s, dir).plan(Q.from("s:supplier")
        .where(ref("s.acctbal") > 5000.0)
        .traverse("s", "same_nation", "t:supplier", JoinKind.Right)
        .selectAs("s.id", "s_id").selectAs("t.id", "t_id").build)),
    // ---- J8 multi-pattern intersection on shared alias n
    "q11_multi_pattern" -> ((s, dir) =>
      planner(s, dir).plan(Q.from("c:customer")
        .where(ref("c.acctbal") > 9500.0)
        .traverse("c", "in_nation", "n:nation")
        .traverse("s:supplier", "in_nation", "n:nation")
        .where(ref("s.acctbal") > 9000.0)
        .selectAs("c.id", "c_id").selectAs("s.id", "s_id")
        .selectAs("n.name", "n_name").build)),
    // ---- F7 cross-alias deferred WHERE
    "q12_cross_alias_where" -> ((s, dir) =>
      planner(s, dir).plan(Q.from("c:customer")
        .traverse("c", "placed", "o:orders")
        .where(Comparison(FieldRef.parse("o.totalprice"), CmpOp.Gt,
          FieldRef.parse("c.acctbal")))
        .where(ref("c.acctbal") > 9900.0)
        .selectAs("c.id", "c_id").selectAs("o.id", "o_id").build)),
    // ---- P2/F5 nested MAP projection + predicate
    "q13_map_props" -> ((s, dir) =>
      planner(s, dir).plan(Q.from("e:events")
        .where(ref("e.props.type") === "error" && ref("e.props.k") > 50)
        .selectAs("e.id", "e_id").selectAs("e.props.k", "k").build)),
    // ---- D7 ARRAY append semantics via bulk update
    "q14_array_append" -> ((s, dir) => {
      val store = TpchGraph.store(s, dir)
      val parts = s.read.parquet(s"$dir/part.parquet")
      val st = new GraphStore(s)
      st.attachNodes("item", parts.select(col("p_partkey").as("id"),
        split(col("p_name"), " ").as("tags")), "id")
      st.updateWhere("item", col("id") % 2 === 0, Map("tags" -> lit("X")),
        append = Set("tags"))
      new Planner(st).plan(Q.from("i:item")
        .selectAs("i.id", "p_id").selectAs("i.tags", "tags").build)
    }),
    // ---- D5/D6 UPDATE then read-back
    "q15_update_readback" -> ((s, dir) => {
      val store = TpchGraph.store(s, dir)
      store.updateWhere("customer", col("acctbal") < 0,
        Map("mktsegment" -> lit("X")))
      new Planner(store).plan(Q.from("c:customer")
        .selectAs("c.id", "c_id")
        .selectAs("c.mktsegment", "c_mktsegment").build)
    }),
    // ---- D8/D9 DELETE nodes + incident edges, then read edges back
    "q16_delete_readback" -> ((s, dir) => {
      val store = TpchGraph.store(s, dir)
      store.deleteWhere("customer", col("acctbal") < 0)
      store.edges("placed", "customer", "orders").select(
        col("src").as("src"), col("dst").as("dst"))
    }),
    // ---- T1/T2 valid-time as-of (sees the retroactive correction)
    "q17_asof_valid" -> ((s, dir) =>
      new Planner(versionedCustomers(s, dir)).plan(
        Q.from("c:customer").asOfValidTime(2500L)
          .selectAs("c.id", "c_id").selectAs("c.acctbal", "acctbal").build)),
    // ---- T2 bitemporal: tx-time 1500 predates the correction (tx=2000)
    "q18_asof_bitemporal" -> ((s, dir) =>
      new Planner(versionedCustomers(s, dir)).plan(
        Q.from("c:customer").asOf(1000L, 1500L)
          .selectAs("c.id", "c_id").selectAs("c.acctbal", "acctbal").build)),
    // ---- J9 edge alias: predicates + projection on typed edge props
    "q19_edge_props" -> ((s, dir) =>
      planner(s, dir).plan(Q.from("l:lineitem")
        .traverse("l", "supplied_by", "s:supplier",
          edgeAlias = Some("e"))
        .where(ref("e.quantity") > 45.0)
        .selectAs("l.id", "l_id").selectAs("e.quantity", "quantity")
        .selectAs("s.id", "s_id").build))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_scan" ->
      "SELECT c_custkey AS c_id, c_name FROM customer",
    "q02_filter_numeric" ->
      "SELECT c_custkey AS c_id, c_acctbal FROM customer WHERE c_acctbal > 1000",
    "q03_filter_string" ->
      ("SELECT c_custkey AS c_id, c_name FROM customer WHERE " +
        "c_name LIKE 'Customer#%' AND c_name LIKE '%7' AND c_name LIKE '%12%'"),
    "q04_filter_andor" ->
      ("SELECT o_orderkey AS o_id, o_orderstatus AS o_status, " +
        "o_totalprice FROM orders WHERE (o_orderstatus = 'F' OR " +
        "o_totalprice > 100000) AND o_orderpriority <> '1-URGENT'"),
    "q05_join_inner" ->
      ("SELECT c_custkey AS c_id, o_orderkey AS o_id FROM customer " +
        "JOIN orders ON o_custkey = c_custkey"),
    "q06_join_left" ->
      ("SELECT c_custkey AS c_id, o_orderkey AS o_id FROM customer " +
        "LEFT JOIN orders ON o_custkey = c_custkey"),
    "q07_join_right" ->
      ("SELECT c_custkey AS c_id, o_orderkey AS o_id FROM " +
        "(SELECT * FROM customer WHERE c_acctbal > 9000) c " +
        "RIGHT JOIN orders ON o_custkey = c_custkey"),
    "q08_join_full" ->
      ("SELECT c_custkey AS c_id, o_orderkey AS o_id FROM " +
        "(SELECT * FROM customer WHERE c_acctbal > 9000) c " +
        "FULL OUTER JOIN orders ON o_custkey = c_custkey"),
    "q09_two_hop" ->
      ("SELECT c_custkey AS c_id, o_orderkey AS o_id, " +
        "l_linenumber FROM customer " +
        "JOIN orders ON o_custkey = c_custkey " +
        "JOIN lineitem ON l_orderkey = o_orderkey " +
        "WHERE c_mktsegment = 'BUILDING' AND l_quantity > 40"),
    "q10_self_right" ->
      ("WITH e AS (SELECT a.s_suppkey AS src, b.s_suppkey AS dst " +
        "FROM supplier a JOIN supplier b ON a.s_nationkey = b.s_nationkey " +
        "AND a.s_suppkey < b.s_suppkey), " +
        "m AS (SELECT e.src, e.dst FROM e JOIN supplier f " +
        "ON f.s_suppkey = e.src WHERE f.s_acctbal > 5000) " +
        "SELECT m.src AS s_id, m.dst AS t_id FROM m " +
        "UNION ALL SELECT NULL AS s_id, s_suppkey AS t_id FROM supplier " +
        "WHERE s_suppkey NOT IN (SELECT src FROM m UNION SELECT dst FROM m)"),
    "q11_multi_pattern" ->
      ("SELECT c_custkey AS c_id, s_suppkey AS s_id, n_name FROM customer " +
        "JOIN nation ON n_nationkey = c_nationkey " +
        "JOIN supplier ON s_nationkey = n_nationkey " +
        "WHERE c_acctbal > 9500 AND s_acctbal > 9000"),
    "q12_cross_alias_where" ->
      ("SELECT c_custkey AS c_id, o_orderkey AS o_id FROM customer " +
        "JOIN orders ON o_custkey = c_custkey " +
        "WHERE o_totalprice > c_acctbal AND c_acctbal > 9900"),
    "q13_map_props" ->
      ("SELECT event_id AS e_id, json_extract_string(props, '$.k') AS k " +
        "FROM events WHERE event_type = 'error' AND " +
        "CAST(json_extract_string(props, '$.k') AS BIGINT) > 50"),
    "q14_array_append" ->
      ("SELECT p_partkey AS p_id, CASE WHEN p_partkey % 2 = 0 THEN " +
        "list_append(string_split(p_name, ' '), 'X') " +
        "ELSE string_split(p_name, ' ') END AS tags FROM part"),
    "q15_update_readback" ->
      ("SELECT c_custkey AS c_id, CASE WHEN c_acctbal < 0 THEN 'X' " +
        "ELSE c_mktsegment END AS c_mktsegment FROM customer"),
    "q16_delete_readback" ->
      ("SELECT o_custkey AS src, o_orderkey AS dst FROM orders " +
        "JOIN customer ON c_custkey = o_custkey WHERE c_acctbal >= 0"),
    "q17_asof_valid" ->
      ("SELECT c_custkey AS c_id, CASE WHEN c_custkey % 3 = 0 THEN " +
        "c_acctbal + 100 ELSE c_acctbal END AS acctbal FROM customer"),
    "q18_asof_bitemporal" ->
      "SELECT c_custkey AS c_id, c_acctbal AS acctbal FROM customer",
    "q19_edge_props" ->
      (s"SELECT ${TpchGraph.LineitemIdSql} AS l_id, " +
        "l_quantity AS quantity, l_suppkey AS s_id FROM lineitem " +
        "WHERE l_quantity > 45")
  )
}
