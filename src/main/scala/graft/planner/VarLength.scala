package graft.planner

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Variable-length path expansion (`(a)-[:t*min..max]->(b)`) — [ABSENT]
  * in the reference grammar (SURVEY.md §2.3), composed here from the
  * existing edge scans as iterated joins.
  *
  * Returns distinct `(src, dst, hops)` pairs where `hops` is the
  * SHORTEST path length in [1, maxHops], filtered to `hops >= minHops`.
  * Each round joins the frontier of newly-reached pairs against the edge
  * set and anti-joins what is already known — BFS as relational algebra,
  * so the work per round is frontier-sized, not all-pairs, and maxHops
  * bounds the iteration. Self-pairs (cycles back to the source) are kept
  * only when a genuine path exists (src != dst guard excluded on
  * purpose: the reference has no cycle semantics to match, and callers
  * can filter).
  *
  * Two consequences of the per-round materialization below that callers
  * should know: (1) under AQE, `localCheckpoint` materializes the
  * checkpointed plan's shuffle stages at CALL time, so building a
  * var-length plan (including EXPLAIN of a `*1..k` query) already runs
  * the BFS rounds; (2) each call pins maxHops+1 sets of checkpoint
  * blocks in executor storage until the returned frame's driver
  * references are GC'd — same lifecycle note as the dedup pipeline
  * operators ([[graft.pipeline.Dedup]] scaladoc): long-lived drivers
  * looping many such queries should not hold stale result references.
  *
  * Fault-tolerance tradeoff: `localCheckpoint` blocks live in executor
  * storage and are NOT recomputable — lineage is truncated at the
  * checkpoint, so losing an executor mid-query fails the whole
  * var-length query (and [[graft.pipeline.Similarity]]'s ivfTrain,
  * which uses the same per-round discipline) instead of recomputing.
  * That is the documented cost of killing the exponential re-derivation.
  * Opt-out: configure `sc.setCheckpointDir(...)` and every such
  * materialization point ([[graft.core.Materialize]]) switches to
  * reliable, recomputable-from-storage checkpoints — the right trade
  * for long-running drivers that expect executor churn.
  */
object VarLength {

  def pairs(edges: DataFrame, minHops: Int, maxHops: Int): DataFrame = {
    require(minHops >= 1 && maxHops >= minHops, "need 1 <= min <= max")
    // Each round is materialized (lazy localCheckpoint): round k's
    // frontier feeds BOTH round k+1's expansion and the final union, and
    // Catalyst does not dedupe shared subtrees — left lazy, every round
    // re-derives all earlier rounds and total work grows exponentially
    // in maxHops. Checkpointing makes each round's rows compute exactly
    // once (frontier-sized), which is also what bounds lineage depth for
    // deep expansions — the standard iterative-algorithm discipline.
    val e = edges.select(col("src"), col("dst")).distinct()
      .transform(graft.core.Materialize(_))
    var known = e.withColumn("hops", lit(1))
    var frontier = known
    (2 to maxHops).foreach { k =>
      val expanded = frontier.select(col("src"), col("dst").as("__mid"))
        .join(e.select(col("src").as("__mid"), col("dst")), "__mid")
        .select(col("src"), col("dst")).distinct()
      val fresh = expanded.join(known.select("src", "dst"),
        Seq("src", "dst"), "left_anti")
        .withColumn("hops", lit(k))
        .transform(graft.core.Materialize(_))
      known = known.unionByName(fresh)
      frontier = fresh
    }
    known.filter(col("hops") >= minHops)
  }
}
