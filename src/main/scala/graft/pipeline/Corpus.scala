package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composite training-corpus preparation: quality gate → exact dedup →
  * (optionally) near-dedup. The composition is what a real data pipeline
  * runs end-to-end; each stage keeps its scale shape (projection filter,
  * one hash-aggregate shuffle, LSH candidate join).
  */
object Corpus {

  /** Quality-filter then exact-dedup a document set. Returns one row per
    * surviving distinct text: representative (min id) + multiplicity. */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            minQuality: Double = 0.5): DataFrame =
    Dedup.exact(
      docs.filter(
        TextAnalysis.qualityScoreFast(col(textCol)) >= minQuality),
      idCol, Seq(textCol))

  /** Deterministic train/validation/test split assignment by content-id
    * hash — the standard way to keep held-out sets STABLE as a corpus
    * grows (a random split reshuffles documents across splits on every
    * run and between engines; a hash split never moves a document). The
    * bucket is the first 60 bits of md5(id) mod 100 — a pure projection
    * (no shuffle, no state), and the exact formula is expressible in
    * DuckDB for the oracle gate (same trick as TpchGraph.LineitemIdSql).
    *
    * @param trainPct buckets `[0, trainPct)` -> "train"
    * @param valPct   buckets `[trainPct, trainPct+valPct)` -> "val";
    *                 the rest -> "test" */
  def assignSplits(docs: DataFrame, idCol: String, trainPct: Int = 90,
                   valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split percentages: train=$trainPct val=$valPct")
    val bucket = pmod(conv(substring(
      md5(col(idCol).cast("string")), 1, 15), 16, 10).cast("long"), lit(100))
    docs.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Corpus health profile — the one-row dashboard a real pipeline runs
    * after every ingest batch: document and token volume, exact-dup
    * pressure, quality- and language-gate pass counts, and empty-doc
    * count. All fields are INTEGER aggregates of per-row deterministic
    * signals, so the row hash-gates exactly (a double mean would be
    * summation-order-dependent across partitions — derive means
    * downstream from the integer fields instead).
    *
    * 100 TB shape: one pass + two map-side-combined aggregates (the
    * global counts and the distinct-text count via a hash-grain
    * two-level aggregate — text itself never crosses the wire). */
  def profile(docs: DataFrame, idCol: String, textCol: String,
              minQuality: Double = 0.5): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val stats = docs.select(
      when(length(trim(t)) === 0, 1L).otherwise(0L).as("__empty"),
      TextAnalysis.tokenCountWs(t).cast("long").as("__toks"),
      when(TextAnalysis.qualityScoreFast(t) >= minQuality, 1L)
        .otherwise(0L).as("__q"),
      when(TextAnalysis.langId(t) === "en", 1L).otherwise(0L).as("__en"),
      xxhash64(t).as("__h"))
    val base = stats.agg(
      count(lit(1)).as("n_docs"),
      sum(col("__toks")).as("n_tokens"),
      sum(col("__empty")).as("n_empty"),
      sum(col("__q")).as("n_quality_pass"),
      sum(col("__en")).as("n_lang_en"))
    val distinctTexts = stats.select("__h").distinct()
      .agg(count(lit(1)).as("n_distinct_text"))
    base.join(distinctTexts)
      .select(col("n_docs"), col("n_tokens"), col("n_empty"),
        col("n_quality_pass"), col("n_lang_en"), col("n_distinct_text"),
        (col("n_docs") - col("n_distinct_text")).as("n_exact_dup"))
  }

  /** Full pipeline: quality gate, exact dedup, then drop near-duplicates
    * (minhash-LSH; the lower-id member of each near-dup pair survives).
    * Returns the surviving representative ids. */
  def cleanNearDedup(docs: DataFrame, idCol: String, textCol: String,
                     minQuality: Double = 0.5,
                     jaccardThreshold: Double = 0.8): DataFrame = {
    val exact = clean(docs, idCol, textCol, minQuality)
    val kept = docs.join(exact.select(col(idCol)), idCol)
    val nearDups = Dedup.minhashLsh(kept, idCol, textCol,
      threshold = jaccardThreshold)
      .select(col("id_b").as(idCol)).distinct()
    kept.join(nearDups, Seq(idCol), "left_anti").select(col(idCol))
  }
}
