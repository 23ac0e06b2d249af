package graft

import graft.core.Ast._
import graft.planner.Planner
import graft.tpch.TpchGraph

/** Physical-plan audits over the sf0.001 testdata: the scale properties
  * that make these operators survive 100 TB — filter pushdown into the
  * parquet scan, column pruning, broadcast joins for small dims, partial
  * (map-side) aggregation, fused sort+limit — asserted as tests so a
  * regression fails CI instead of only showing up in a benchmark.
  */
class PlanAuditSpec extends SparkSpec {

  private lazy val planner =
    new Planner(TpchGraph.store(spark, "/root/testdata/sf0.001"))

  private def physical(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // let AQE finalize the plan
    df.queryExecution.executedPlan.toString
  }

  test("single-alias predicates push into the parquet scan (F6)") {
    val df = planner.plan(Q.from("c:customer")
      .where(ref("c.mktsegment") === "BUILDING")
      .traverse("c", "placed", "o:orders")
      .where(ref("o.totalprice") > 50000.0)
      .select("c.id", "o.id").build)
    val plan = physical(df)
    assert(plan.contains("PushedFilters"), "no pushed filters at all")
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"customer filter not pushed:\n$plan")
    assert(plan.contains("GreaterThan(o_totalprice,50000.0)"),
      s"orders filter not pushed:\n$plan")
  }

  test("projection prunes the parquet ReadSchema (P1)") {
    val df = planner.plan(
      Q.from("l:lineitem").select("l.id", "l.quantity").build)
    val plan = physical(df)
    // the scan must not read the wide lineitem row — quantity plus the
    // id-hash inputs only
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("l_comment") && !plan.contains("l_returnflag"),
      s"unpruned lineitem scan:\n$plan")
  }

  test("small-dimension joins broadcast (no shuffle of the big side)") {
    val df = planner.plan(Q.from("c:customer")
      .traverse("c", "in_nation", "n:nation")
      .select("c.id", "n.name").build)
    val plan = physical(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"nation join did not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"unexpected sort-merge join for a dim join:\n$plan")
  }

  test("aggregation is partial (map-side combine) + fused sort-limit") {
    val df = planner.plan(Q.from("c:customer")
      .traverse("c", "in_nation", "n:nation")
      .selectAs("n.name", "nation").count("cnt")
      .orderBy("cnt" -> false, "nation" -> true).limit(5).build)
    val plan = physical(df)
    // partial + final HashAggregate pair around one exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"no partial aggregation:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"ORDER BY+LIMIT not fused (global sort instead):\n$plan")
  }

  test("no cartesian products in multi-hop traversals") {
    val df = planner.plan(Q.from("c:customer")
      .traverse("c", "placed", "o:orders")
      .traverse("o", "contains", "l:lineitem")
      .select("c.id", "o.id", "l.linenumber").build)
    val plan = physical(df)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi join appeared in a hop chain:\n$plan")
  }
}
