package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: distributed merge TRAINING (Sennrich
  * et al. 2016 — the algorithm GPT-2/Llama-family vocabularies are
  * built with) plus the standard greedy lowest-rank APPLY.
  *
  * Training never touches the corpus after one pass: merges are learned
  * on the DISTINCT-WORD frequency table (vocabulary-grain, ≪ corpus —
  * the classical formulation), so each of the `numMerges` rounds is a
  * pair-count aggregate over that table plus a 1-row argmax collect.
  * 100 TB shape: one corpus-wide word-count shuffle up front; per round
  * one vocabulary-grain aggregate (map-side combined) and one
  * vocabulary-grain rewrite confined to words CONTAINING the winning
  * pair; the driver holds one (pair, count) row per round and the final
  * merge list (numMerges entries). The word table is materialized per
  * round (the ivfTrain lesson: without the barrier round i's plan nests
  * every earlier round's aggregation).
  *
  * Apply is a broadcast of the rank map + one `mapPartitions` pass:
  * per word, repeatedly merge the lowest-rank adjacent pair (the
  * reference BPE apply loop). Words are bounded (symbols ≤ word length
  * + 1), so the loop is per-word bounded; the corpus-side cost is the
  * scan. Tokens use the `</w>` end-of-word marker convention.
  */
object Bpe {

  /** End-of-word marker symbol (the Sennrich convention). */
  val Eow = "</w>"

  private def words(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(trim(col(textCol))), "\\s+"))
        .as("__w"))
      .filter(col("__w") =!= "")
      .groupBy("__w").agg(count(lit(1)).as("__cnt"))

  /** Initial symbol sequence of a word: its characters plus [[Eow]]. */
  private def initSymbols(w: Column): Column =
    concat(split(w, ""), array(lit(Eow)))

  /** Train `numMerges` merges. Returns the ordered merge list —
    * (left, right) by rank — which IS the tokenizer artifact a real
    * pipeline persists. Ties break on (count desc, left asc, right
    * asc) so training is deterministic across partitionings. */
  def train(df: DataFrame, textCol: String,
            numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    var vocab = words(df, textCol)
      .select(col("__cnt"), initSymbols(col("__w")).as("__s"))
      .transform(graft.core.Materialize(_))
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val best = vocab
        .select(col("__cnt"), explode(when(size(col("__s")) >= 2,
          transform(sequence(lit(0), size(col("__s")) - 2), i =>
            struct(element_at(col("__s"), i + 1).as("l"),
              element_at(col("__s"), i + 2).as("r"))))
          .otherwise(filter(array(struct(lit("").as("l"),
            lit("").as("r"))), _ => lit(false)))).as("__p"))
        .groupBy(col("__p")("l").as("__l"), col("__p")("r").as("__r"))
        .agg(sum(col("__cnt")).as("__n"))
        .orderBy(col("__n").desc, col("__l").asc, col("__r").asc)
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r) = (best(0).getString(0), best(0).getString(1))
        merges += ((l, r))
        // rewrite only words containing the pair: a left-to-right fold
        // replacing adjacent (l, r) with l+r (non-overlapping, leftmost
        // first — the reference semantics)
        val hasPair = exists(
          when(size(col("__s")) >= 2,
            transform(sequence(lit(0), size(col("__s")) - 2), i =>
              element_at(col("__s"), i + 1) === l &&
                element_at(col("__s"), i + 2) === r))
            .otherwise(array().cast("array<boolean>")), p => p)
        val mergedSymbols = aggregate(col("__s"),
          array().cast("array<string>"),
          (acc, s) => when(size(acc) > 0 &&
              element_at(acc, -1) === l && s === r,
            concat(slice(acc, lit(1), size(acc) - 1),
              array(lit(l + r))))
            .otherwise(concat(acc, array(s))))
        vocab = vocab.select(col("__cnt"),
          when(hasPair, mergedSymbols).otherwise(col("__s")).as("__s"))
          .transform(graft.core.Materialize(_))
        round += 1
      }
    }
    merges.toSeq
  }

  /** Greedy BPE apply (the reference tokenizer loop): per word, merge
    * the lowest-rank adjacent pair until none applies. */
  private[pipeline] def encodeWord(
      word: String, rank: Map[(String, String), Int]): Seq[String] = {
    var syms = word.map(_.toString).toVector :+ Eow
    var done = false
    while (!done && syms.length >= 2) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))).foreach { rk =>
          if (rk < bestRank) { bestRank = rk; bestAt = i }
        }
        i += 1
      }
      if (bestAt < 0) done = true
      else syms = (syms.take(bestAt) :+ (syms(bestAt) +
        syms(bestAt + 1))) ++ syms.drop(bestAt + 2)
    }
    syms
  }

  /** Tokenize `textCol` with a trained merge list. Output per input
    * row: `tokens` (space-joined — BPE symbols never contain spaces,
    * whitespace is the word split), `n_tokens`, and `detok` — the
    * reconstruction (tokens concatenated, [[Eow]] back to spaces),
    * which must equal the whitespace-normalized lowercased input for
    * ANY merge list (the correctness invariant the oracle gates). */
  def tokenize(df: DataFrame, idCol: String, textCol: String,
               merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val rankBc = spark.sparkContext.broadcast(
      merges.zipWithIndex.toMap)
    import org.apache.spark.sql.{Encoder, Row}
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("__id", LongType),
      StructField("tokens", StringType),
      StructField("n_tokens", IntegerType),
      StructField("detok", StringType)))
    implicit val enc: Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    df.select(col(idCol).cast("long").as("__id"),
        coalesce(col(textCol), lit("")).as("__t"))
      .mapPartitions { it =>
        val rank = rankBc.value
        it.map { r =>
          // Locale.ROOT: a Turkish default locale would dot-map 'I'
          // differently from Spark's lower() used in training
          val ws = r.getString(1).trim
            .toLowerCase(java.util.Locale.ROOT)
            .split("\\s+").filter(_.nonEmpty)
          val perWord = ws.map(w => encodeWord(w, rank))
          val toks = perWord.flatten
          // Detok strips exactly ONE trailing marker per word — never a
          // global replace: a word may CONTAIN the literal text "</w>"
          // (its characters reconstruct inside the joined symbols, or
          // training may even merge them into a symbol equal to the
          // marker), and a replace would corrupt it. Within one word
          // the marker is always the final suffix: pairs never span
          // words, so no merge can move Eow off the word end.
          val detok = perWord
            .map(_.mkString("").stripSuffix(Eow)).mkString(" ")
          Row(r.getLong(0), toks.mkString(" "), toks.length, detok)
        }
      }(enc)
      .withColumnRenamed("__id", idCol)
  }
}
