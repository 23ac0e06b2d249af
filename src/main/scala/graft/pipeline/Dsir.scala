package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling — the DSIR shape (Xie et
  * al. 2023, "Data Selection for Language Models via Importance
  * Resampling"): score every candidate document by how much more
  * likely its hashed-n-gram bag is under a TARGET distribution (the
  * data you want more of) than under the SOURCE distribution (the raw
  * corpus), then resample top-k by importance weight + Gumbel noise.
  * This is the standard published recipe for tilting a 100 TB crawl
  * toward a curated target (Wikipedia/books in the paper) without
  * training a classifier.
  *
  * Features are unigrams + bigrams over the repo-wide whitespace
  * contract (lower → trim → split `\s+`, empties dropped — the same
  * tokenization p91/p99 gate). With `buckets = 0` features stay raw
  * strings (exactly SQL-replayable — the oracle-gated form); with
  * `buckets > 0` they hash to `xxhash64 % buckets` (the paper's 10k
  * hash buckets — the 100 TB form, capping both count tables at
  * `buckets` rows regardless of corpus vocabulary).
  *
  * 100 TB shape: one shuffle per count table at FEATURE grain
  * (vocabulary-sized for strings, `buckets`-sized when hashed —
  * broadcastable), one explode+join+aggregate pass over the scored
  * relation at occurrence grain, map-side combined. No driver-side
  * state; the two 1-row total frames cross in as broadcasts.
  * [[resample]]'s top-k is TakeOrdered (per-partition heads, no full
  * sort shuffle).
  *
  * The reference has no data-selection surface — beyond-parity,
  * SURVEY §2.10 (the LLM-pipeline family).
  */
object Dsir {

  /** Materialized (id, token array) base of a relation — the
    * tokenize-once artifact [[feats]] explodes. Split out (r16
    * optimization) so [[weights]] can SHARE one base between its
    * scored/target/source roles when a caller passes the same frame
    * for several of them (the common DSIR shape scores the raw corpus
    * against itself as the source — the bench, the QL surface and
    * p120 all do), instead of scanning + tokenizing + checkpointing
    * the corpus once per role. */
  private def tokBase(rel: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val toks = split(lower(trim(coalesce(col(textCol), lit("")))), "\\s+")
    rel.select(col(idCol).cast("long").as("__id"),
        filter(toks, t => t =!= "").as("__w"))
      .transform(graft.core.Materialize(_))
  }

  /** (id, feature) occurrence table over a [[tokBase]]: every unigram
    * and bigram position counts once. Feature column `__f` is STRING
    * when `buckets == 0`, LONG (hash bucket) otherwise. The
    * array-building projection is materialized BEFORE the explode (the
    * repo-wide Generate-collapse lesson: expressions feeding an
    * explode run interpreted). */
  private def featsOf(base: DataFrame, buckets: Int): DataFrame = {
    val uni = base.select(col("__id"), explode(col("__w")).as("__f"))
    val bi = base.select(col("__id"), explode(
      when(size(col("__w")) >= 2,
        transform(sequence(lit(0), size(col("__w")) - 2), i =>
          concat(element_at(col("__w"), i + 1), lit(" "),
            element_at(col("__w"), i + 2))))
        .otherwise(array().cast("array<string>"))).as("__f"))
    val all = uni.unionAll(bi)
    if (buckets > 0)
      all.select(col("__id"),
        pmod(xxhash64(col("__f")), lit(buckets.toLong)).as("__f"))
    else all
  }

  private def feats(df: DataFrame, idCol: String, textCol: String,
                    buckets: Int): DataFrame =
    featsOf(tokBase(df, idCol, textCol), buckets)

  /** Per-document importance weights of `df` against a target/source
    * relation pair. Output: (idCol, n_feats, sum_tc, sum_sc, logw) —
    * the three integer columns are the exact hash-gated skeleton
    * (occurrence count and the summed target/source feature counts);
    * `logw` is the add-one-smoothed log importance ratio
    * `Σ_occ [ln(tc+1) − ln(sc+1)] + n_feats·[ln(Ts+1) − ln(Tt+1)]`
    * (Tt/Ts = total target/source feature occurrences — the totals
    * normalization that makes weights comparable across doc lengths).
    * Documents with no features (empty text) emit no row, matching
    * the SQL replay. */
  def weights(df: DataFrame, target: DataFrame, source: DataFrame,
              idCol: String, textCol: String,
              buckets: Int = 0): DataFrame = {
    // tokenize each DISTINCT input frame once: when the caller passes
    // the same frame for several roles (reference equality — the
    // common source-is-the-scored-corpus shape), the roles share one
    // materialized token base instead of re-scanning the corpus per
    // role (r16 optimization; values unchanged by construction)
    val dfBase = tokBase(df, idCol, textCol)
    val tgtBase =
      if (target eq df) dfBase else tokBase(target, idCol, textCol)
    val srcBase =
      if (source eq df) dfBase
      else if (source eq target) tgtBase
      else tokBase(source, idCol, textCol)
    val t = featsOf(tgtBase, buckets)
      .groupBy("__f").agg(count(lit(1)).as("__tc"))
      .transform(graft.core.Materialize(_))
    val s = featsOf(srcBase, buckets)
      .groupBy("__f").agg(count(lit(1)).as("__sc"))
      .transform(graft.core.Materialize(_))
    val occ = featsOf(dfBase, buckets)
      .join(t, Seq("__f"), "left")
      .join(s, Seq("__f"), "left")
      .select(col("__id"),
        coalesce(col("__tc"), lit(0L)).as("__tc"),
        coalesce(col("__sc"), lit(0L)).as("__sc"))
    val perDoc = occ.groupBy("__id").agg(
      count(lit(1)).as("n_feats"),
      sum(col("__tc")).as("sum_tc"),
      sum(col("__sc")).as("sum_sc"),
      sum(log(col("__tc") + 1.0) - log(col("__sc") + 1.0)).as("__lr"))
    perDoc
      .crossJoin(broadcast(t.agg(sum(col("__tc")).as("__Tt"))))
      .crossJoin(broadcast(s.agg(sum(col("__sc")).as("__Ts"))))
      .select(col("__id").as(idCol), col("n_feats"),
        col("sum_tc"), col("sum_sc"),
        (col("__lr") + col("n_feats") *
          (log(col("__Ts") + 1.0) - log(col("__Tt") + 1.0)))
          .as("logw"))
  }

  /** Gumbel-top-k importance resampling over a [[weights]] frame
    * (the paper's sampling-without-replacement trick: rank by
    * `logw + Gumbel(0,1)` and take k — equivalent to weighted
    * sampling without replacement). Noise is seeded from
    * `xxhash64(id, seed)` so the draw is deterministic and
    * partition-independent; top-k runs as TakeOrdered, never a full
    * sort shuffle. */
  def resample(weighted: DataFrame, idCol: String, k: Int,
               seed: Long): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // uniform in (0,1): top 53 bits of the hash over 2^53
    val u = greatest(
      shiftrightunsigned(xxhash64(col(idCol), lit(seed)), 11)
        .cast("double") / lit((1L << 53).toDouble),
      lit(java.lang.Double.MIN_VALUE))
    val gumbel = -log(-log(u))
    weighted.orderBy((col("logw") + gumbel).desc).limit(k)
  }
}
