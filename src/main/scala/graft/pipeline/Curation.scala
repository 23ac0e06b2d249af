package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond dedup/similarity: benchmark decontamination, token-budget
  * sequence packing, stratified sampling, and duplicate-cluster
  * canonicalization. Each is written around its 100 TB shape (noted per
  * operator); none touches the driver except for tiny (partition-count- or
  * stratum-count-sized) metadata.
  */
object Curation {

  /** Benchmark decontamination: flag training documents sharing word
    * k-grams with an evaluation/benchmark set — the standard guard against
    * test-set leakage into a training corpus. Output per input document:
    * `overlap_cnt` (distinct shared k-grams), `overlap_ratio`
    * (shared / document's distinct k-grams), `contaminated`
    * (ratio >= `ratioThreshold`).
    *
    * 100 TB shape: the benchmark gram set is benchmark-sized (small by
    * nature — eval sets are thousands of documents, not billions), so it
    * is distinct-reduced and broadcast; the corpus side is one projection
    * (shingling), one explode, a broadcast hash join, and one
    * hash-aggregate back to document grain. No corpus-sized shuffle except
    * the final per-doc aggregate, which map-side-combines on the exploded
    * grams.
    */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, idCol: String,
                    textCol: String, k: Int = 3,
                    ratioThreshold: Double = 0.5): DataFrame = {
    // Grams are compared as xxhash64 longs, never as strings: tokens are
    // hashed once in a codegen'd projection, gram hashes derive from
    // k-slices of the token-hash array, and the (id, gram-hash array)
    // rows — far smaller than the text — are materialized eagerly BEFORE
    // the explode. Without that, Catalyst collapses the gram expression
    // into the Generate, whose input runs on the interpreted path
    // (measured 6.8s → 0.9s at sf0.1, the same trap minhashLsh
    // documents). Hash-equality is string-equality modulo negligible
    // 64-bit collisions (same argument as minhash's hashed Jaccard).
    val tokenHashes = transform(split(lower(trim(col(textCol))), "\\s+"),
      t => xxhash64(t)).as("__th")
    val benchGrams = benchmark.select(tokenHashes)
      .select(Dedup.hashedShingles(col("__th"), k).as("__gh"))
      .transform(graft.core.Materialize(_))
      .select(explode(col("__gh")).as("__gram"))
      .distinct()
      .withColumn("__hit", lit(1))
    docs.select(col(idCol).as("__id"), tokenHashes)
      .select(col("__id"), Dedup.hashedShingles(col("__th"), k).as("__gh"))
      .transform(graft.core.Materialize(_))
      .select(col("__id"), size(col("__gh")).as("__total"),
        explode(col("__gh")).as("__gram"))
      .join(broadcast(benchGrams), Seq("__gram"), "left_outer")
      .groupBy("__id")
      .agg(max(col("__total")).as("__total"),
        count(col("__hit")).as("overlap_cnt"))
      .select(col("__id").as(idCol), col("overlap_cnt"),
        (col("overlap_cnt").cast("double") /
          greatest(col("__total").cast("double"), lit(1.0)))
          .as("overlap_ratio"),
        (col("overlap_cnt").cast("double") /
          greatest(col("__total").cast("double"), lit(1.0)) >=
          ratioThreshold).as("contaminated"))
  }

  /** Token-budget sequence packing: assign documents (in id order) to
    * contiguous training-sequence bins of ~`budgetTokens` whitespace
    * tokens — the sort-and-chunk packing large pipelines run before
    * example assembly. `bin = exclusive_prefix_sum(tokens) div budget`,
    * so a document straddling a boundary goes to the earlier bin
    * (documented deviation from sequential first-fit, which is a state
    * machine and cannot scale past one thread).
    *
    * 100 TB shape: a single global running sum would be a one-partition
    * window. Instead ids are range-chunked by a pure projection
    * (`floor(id / width)` — no repartition shuffle, deterministic across
    * retries unlike `spark_partition_id`), per-chunk token totals (tiny —
    * one row per chunk) come back to the driver to form prefix offsets,
    * and the running sum is a per-chunk window plus the broadcast offset:
    * the same two-job prefix-sum used for dense id assignment in
    * `GraphStore.createNodes`.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    budgetTokens: Long, chunks: Int = 0): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val spark = docs.sparkSession
    val nChunks = math.max(1,
      if (chunks > 0) chunks else spark.sparkContext.defaultParallelism)
    val toks = docs.select(col(idCol).cast("long").as("__id"),
      graft.pipeline.TextAnalysis.tokenCountWs(col(textCol))
        .cast("long").as("n_tokens"))
    val maxId = toks.agg(max("__id")).head.get(0)
      .asInstanceOf[java.lang.Long]
    if (maxId == null) {
      return toks.select(col("__id").as(idCol), col("n_tokens"),
        lit(0L).as("bin"))
    }
    val width = math.max(1L, (maxId + nChunks) / nChunks)
    val withChunk = toks.withColumn("__c",
      expr(s"__id DIV $width"))
    val sums = withChunk.groupBy("__c").agg(sum("n_tokens").as("__s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val prefix = sums.map(_._2).scanLeft(0L)(_ + _).init
    import spark.implicits._
    val offsets = sums.map(_._1).zip(prefix).toSeq.toDF("__c", "__off")
    val w = Window.partitionBy("__c").orderBy("__id")
    withChunk
      .join(broadcast(offsets), Seq("__c"))
      .withColumn("__before",
        sum(col("n_tokens")).over(w) - col("n_tokens") + col("__off"))
      .select(col("__id").as(idCol), col("n_tokens"),
        expr(s"__before DIV $budgetTokens").as("bin"))
  }

  /** Deterministic stratified sampling: keep a per-stratum percentage of
    * rows, selected by the same md5-id-hash buckets as
    * [[Corpus.assignSplits]] — so the sample is stable as the corpus
    * grows, reproducible across engines, and consistent with split
    * assignment (a row's bucket never changes). Pure projection + filter:
    * no shuffle, no state; the stratum→rate map is a CASE expression, so
    * the 100 TB cost is the scan itself.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: Column,
                       pctByStratum: Map[String, Int],
                       defaultPct: Int = 0): DataFrame = {
    require((defaultPct +: pctByStratum.values.toSeq)
      .forall(p => p >= 0 && p <= 100), "percentages must be in [0,100]")
    val bucket = pmod(conv(substring(
      md5(col(idCol).cast("string")), 1, 15), 16, 10).cast("long"), lit(100))
    val pct = pctByStratum.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
        when(stratumCol === s, lit(p)).otherwise(acc)
      }
    df.filter(bucket < pct)
  }

  /** Duplicate-cluster canonicalization: given near-dup pairs (any of the
    * [[Dedup]] generators), compute the transitive closure — connected
    * components — and assign every document the minimum id of its cluster
    * as the canonical representative. Documents in no pair are their own
    * cluster. This is the step that turns pairwise near-dup evidence into
    * a keep/drop decision (`keep = id == cluster`) without the
    * order-dependence of greedy pair dropping (a-b and b-c collapse to one
    * cluster even though a-c was never directly compared).
    *
    * 100 TB shape: GraphX connected components — O(diameter) Pregel
    * rounds of id-keyed message exchange; near-dup clusters have tiny
    * diameters, and vertices/edges partition across the cluster. The
    * pairs frame is near-dup-sized (≪ corpus), the docs side contributes
    * ids only.
    */
  def dupClusters(docs: DataFrame, idCol: String, pairs: DataFrame,
                  aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    import org.apache.spark.graphx.{Edge, Graph, VertexId}
    val spark = docs.sparkSession
    import spark.implicits._
    val vertices = docs.select(col(idCol).cast("long"))
      .rdd.map(r => (r.getLong(0): VertexId, ()))
    val edges = pairs.select(col(aCol).cast("long"), col(bCol).cast("long"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
    Graph(vertices, edges, (),
      edgeStorageLevel = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .connectedComponents().vertices
      .toDF(idCol, "cluster")
  }

  /** Keep one canonical document per duplicate cluster (the minimum id —
    * GraphX's component label). */
  def canonical(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    dupClusters(docs, idCol, pairs)
      .filter(col(idCol) === col("cluster"))
      .select(col(idCol))
}
