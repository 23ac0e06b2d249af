package graft.analytics

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.store.GraphStore

/** Batch graph analytics over the store, lifted into GraphX.
  *
  * GraphX requires globally-unique VertexIds while the engine keeps
  * per-label id namespaces (reference README.md:139) — vertex ids are
  * namespaced as `labelIndex << 60 | nodeId` (same pitfall the reference's
  * RIGHT-self-join handles, SURVEY.md §2.10). 60 id bits cover the
  * md5-derived lineitem ids; 3 label bits (sign bit stays clear) allow 8
  * labels per lift. Out-of-range ids fail hard instead of silently
  * colliding with label bits.
  */
object GraphAnalytics {

  private val IdBits = 60
  private val MaxId = 1L << IdBits

  private def namespaced(labelIdx: Long, id: org.apache.spark.sql.Column) = {
    require(labelIdx < (1L << (63 - IdBits)),
      s"at most ${1L << (63 - IdBits)} labels per lifted graph")
    when(assert_true(id >= 0 && id < MaxId,
      lit(s"node id out of [0, 2^$IdBits) — cannot namespace")).isNull,
      lit(labelIdx << IdBits).bitwiseOR(id))
  }

  /** Build a GraphX graph from one or more (edgeType, srcLabel, dstLabel)
    * edge sets of the store. `undirected` adds the reversed orientation of
    * every edge (a narrow 2× of the edge RDD, applied before partitioning
    * — never a 2× of any joined result). */
  def lift(store: GraphStore,
           edgeSets: Seq[(String, String, String)],
           undirected: Boolean = false): Graph[Long, Int] = {
    val labels = edgeSets.flatMap(e => Seq(e._2, e._3)).distinct
    val labelIdx = labels.zipWithIndex.toMap
    val vertexDfs = labels.map { l =>
      store.nodes(l).select(
        namespaced(labelIdx(l).toLong, col("id")).as("vid"))
    }
    val vertices = vertexDfs.reduce(_ union _)
      .rdd.map(r => (r.getLong(0): VertexId, r.getLong(0)))
    val edgeRdds = edgeSets.map { case (t, s, d) =>
      val fwd = store.edges(t, s, d).select(
        namespaced(labelIdx(s).toLong, col("src")).as("s"),
        namespaced(labelIdx(d).toLong, col("dst")).as("d"))
        .rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1))
      if (undirected) fwd.union(fwd.map(e => Edge(e.dstId, e.srcId, 1)))
      else fwd
    }
    Graph(vertices, edgeRdds.reduce(_ union _),
      defaultVertexAttr = 0L,
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
  }

  private def denamespace(vid: org.apache.spark.sql.Column) =
    vid.bitwiseAND(MaxId - 1)

  /** Connected components → (id, component) with the engine's node ids
    * (component = min namespaced vertex id, denamespaced). */
  def connectedComponents(store: GraphStore,
                          edgeSets: Seq[(String, String, String)]): DataFrame = {
    val g = lift(store, edgeSets)
    val spark = store.spark
    import spark.implicits._
    g.connectedComponents().vertices
      .toDF("vid", "component")
      .select(denamespace(col("vid")).as("id"),
        denamespace(col("component")).as("component"))
  }

  /** Per-vertex triangle counts. Edges are canonicalized (srcId < dstId)
    * as triangleCount requires. */
  def triangleCounts(store: GraphStore,
                     edgeSets: Seq[(String, String, String)]): DataFrame = {
    val g = lift(store, edgeSets)
      .partitionBy(org.apache.spark.graphx.PartitionStrategy.EdgePartition2D)
    val spark = store.spark
    import spark.implicits._
    g.triangleCount().vertices.toDF("vid", "triangles")
      .select(denamespace(col("vid")).as("id"), col("triangles"))
  }

  /** Per-node degree profile → (id, in_deg, out_deg, deg) including
    * isolated nodes (degree 0) — the standard first look at a graph's
    * shape (skew detection before a traversal-heavy workload: a hot
    * vertex here is a hot join key later). Aggregation-only — one
    * map-side-combined count per direction, no Pregel. */
  def degrees(store: GraphStore,
              edgeSets: Seq[(String, String, String)]): DataFrame = {
    val g = lift(store, edgeSets)
    val spark = store.spark
    import spark.implicits._
    val v = g.vertices.map(_._1).toDF("vid")
    val outd = g.outDegrees.toDF("vid", "out_deg")
    val ind = g.inDegrees.toDF("vid", "in_deg")
    v.join(outd, Seq("vid"), "left_outer")
      .join(ind, Seq("vid"), "left_outer")
      .select(denamespace(col("vid")).as("id"),
        coalesce(col("in_deg"), lit(0)).as("in_deg"),
        coalesce(col("out_deg"), lit(0)).as("out_deg"),
        (coalesce(col("in_deg"), lit(0)) +
          coalesce(col("out_deg"), lit(0))).as("deg"))
  }

  /** Unweighted landmark shortest paths → (id, landmark, dist), reachable
    * pairs only. GraphX Pregel: per round, frontier-sized messages flow
    * along edges and each vertex keeps its min-distance map — O(diameter)
    * rounds, cost per round proportional to the active frontier, never
    * the whole graph. Landmarks are (label, id) pairs namespaced like the
    * lift; `undirected` matches an undirected reading of the edges. */
  def shortestPaths(store: GraphStore,
                    edgeSets: Seq[(String, String, String)],
                    landmarks: Seq[(String, Long)],
                    undirected: Boolean = true): DataFrame = {
    val labels = edgeSets.flatMap(e => Seq(e._2, e._3)).distinct
    val labelIdx = labels.zipWithIndex.toMap
    val lm = landmarks.map { case (label, id) =>
      require(labelIdx.contains(label), s"landmark label $label not in graph")
      require(id >= 0 && id < MaxId, s"landmark id $id out of range")
      (labelIdx(label).toLong << IdBits) | id
    }
    val g = lift(store, edgeSets, undirected)
    val spark = store.spark
    import spark.implicits._
    // ShortestPaths follows OUT-edges from each vertex toward landmarks;
    // with `undirected` both orientations exist so the distinction
    // vanishes. Unreachable landmarks are simply absent from the map.
    org.apache.spark.graphx.lib.ShortestPaths.run(g, lm)
      .vertices
      .flatMap { case (vid, dists) =>
        dists.map { case (l, d) => (vid, l, d) }
      }
      .toDF("vid", "lm", "dist")
      .select(denamespace(col("vid")).as("id"),
        denamespace(col("lm")).as("landmark"), col("dist"))
  }

  /** Deterministic label-propagation communities → (id, community).
    * Synchronous LPA with two deliberate choices that make the result
    * reproducible (GraphX's built-in LabelPropagation breaks ties
    * arbitrarily and oscillates on bipartite shapes):
    * (a) the vertex's OWN label joins the neighbor tally — damping that
    * kills the classic 2-cycle oscillation (a pair would otherwise swap
    * labels forever); (b) ties break to the SMALLEST label. On clique
    * graphs this converges in one superstep to the min id per clique.
    * Pregel cost: edges × iterations, frontier = everything (LPA is a
    * dense iteration by nature); labels flow along edge direction, so
    * pass `undirected = true` (default) for community semantics. */
  def labelPropagation(store: GraphStore,
                       edgeSets: Seq[(String, String, String)],
                       maxIters: Int = 5,
                       undirected: Boolean = true): DataFrame = {
    import org.apache.spark.graphx._
    val g = lift(store, edgeSets, undirected)
    val spark = store.spark
    import spark.implicits._
    val init = g.mapVertices((vid, _) => vid: VertexId)
    val res = Pregel(init, Map.empty[VertexId, Long], maxIters)(
      vprog = (_, attr, msg) =>
        if (msg.isEmpty) attr
        else {
          val tally = msg.updated(attr, msg.getOrElse(attr, 0L) + 1L)
          tally.maxBy { case (l, c) => (c, -l) }._1
        },
      sendMsg = t => Iterator((t.dstId, Map(t.srcAttr -> 1L))),
      mergeMsg = (a, b) => (a.keySet ++ b.keySet)
        .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap)
    res.vertices.toDF("vid", "community")
      .select(denamespace(col("vid")).as("id"),
        denamespace(col("community")).as("community"))
  }

  /** PageRank → (id, rank). Iterative float algorithm: verified
    * rows-only (no closed-form oracle). */
  def pageRank(store: GraphStore, edgeSets: Seq[(String, String, String)],
               iters: Int = 10, resetProb: Double = 0.15): DataFrame = {
    val g = lift(store, edgeSets)
    val spark = store.spark
    import spark.implicits._
    g.staticPageRank(iters, resetProb).vertices.toDF("vid", "rank")
      .select(denamespace(col("vid")).as("id"), col("rank"))
  }
}
