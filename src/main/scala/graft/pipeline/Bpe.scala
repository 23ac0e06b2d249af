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

  /** Above this many distinct words the merge loop stays distributed;
    * at or below it the vocabulary is collected once and all rounds run
    * driver-side. Natural-language vocabularies plateau (Heaps' law) at
    * a few million distinct words even at 100 TB, so the local path is
    * the common case; the distributed loop remains the safety net for
    * adversarial corpora (e.g. random-string keys).
    *
    * The local path's driver cost is real (advice r14): each collected
    * word carries its string, count, symbol list, and entries in the
    * incremental pair-stats HashMap + pair→word-id index — budget
    * ~1 KB per distinct word end to end. The default therefore derives
    * from the driver heap (at most half of `Runtime.maxMemory` at that
    * budget, capped at 2M — a default-sized 1g driver gets ~500k, a
    * 4g+ driver the full 2M). Callers passing an explicit
    * `localVocabLimit` own the corresponding driver-heap requirement:
    * limit × ~1 KB must fit comfortably alongside everything else on
    * the driver. */
  def DefaultLocalVocabLimit: Long =
    math.min(2000000L, Runtime.getRuntime.maxMemory() / 2048)

  /** Train `numMerges` merges. Returns the ordered merge list —
    * (left, right) by rank — which IS the tokenizer artifact a real
    * pipeline persists. Ties break on (count desc, left asc, right
    * asc) so training is deterministic across partitionings.
    *
    * Job-count shape: ONE corpus-wide word-count shuffle, then a
    * count-probe of the distinct-word table (the CC tail-finish
    * pattern, `Curation.scala`). When the vocabulary is bounded
    * (≤ `localVocabLimit`) it is collected once and every merge round
    * runs driver-side with incrementally-maintained pair statistics —
    * 2 Spark jobs total instead of 2 per merge (a production 32K-merge
    * vocabulary would otherwise schedule ~64K barrier jobs). Both
    * paths produce the identical merge list (asserted in BpeSpec). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            localVocabLimit: Long = DefaultLocalVocabLimit)
      : Seq[(String, String)] = {
    require(numMerges >= 0, "numMerges must be >= 0")
    val wc = words(df, textCol).transform(graft.core.Materialize(_))
    if (wc.count() <= localVocabLimit)
      trainLocal(wc.collect().map(r =>
        (r.getString(0), r.getLong(1))), numMerges)
    else trainDistributed(wc, numMerges)
  }

  /** The distributed merge loop: per round one vocabulary-grain pair
    * aggregate + a 1-row argmax collect + a rewrite confined to words
    * containing the winner. Correct at any vocabulary size; ~2 Spark
    * jobs per merge, so scheduler-bound at production merge counts —
    * [[train]] routes bounded vocabularies to [[trainLocal]]. */
  private[pipeline] def trainDistributed(
      wc: DataFrame, numMerges: Int): Seq[(String, String)] = {
    var vocab = wc
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

  /** Codepoint-grain split — the grain Spark's `split(w, "")` uses in
    * the distributed path (measured: UTF8String keeps surrogate pairs
    * together, while JAVA's `"x".split("")` splits them into UTF-16
    * halves — relying on it made trainLocal/encodeWord diverge from
    * distributed training on astral-plane characters). */
  private def cpSplit(w: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** UTF-8 bytewise comparison — Spark's StringType `asc` ordering.
    * Java String.compareTo is UTF-16 code-unit order, which disagrees
    * with code-point order for supplementary characters; the local
    * tie-break must match the distributed `orderBy` exactly. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Driver-side merge loop over a collected (word, count) vocabulary.
    * Pair statistics and a pair→word-ids index are maintained
    * INCREMENTALLY: each round touches only the words containing the
    * winning pair, so a 32K-merge run is O(corpus-vocab init + touched
    * rewrites), not O(rounds × vocab). Semantics are identical to the
    * distributed loop (leftmost-first non-overlapping rewrite, ties on
    * count desc / left asc / right asc in UTF-8 order) — BpeSpec
    * asserts both paths yield the same merge list. */
  private[pipeline] def trainLocal(
      words0: Array[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    val syms = mutable.ArrayBuffer.empty[Array[String]]
    val cnts = mutable.ArrayBuffer.empty[Long]
    words0.foreach { case (w, c) =>
      syms += (cpSplit(w) :+ Eow)
      cnts += c
    }
    val stats = mutable.HashMap.empty[(String, String), Long]
    val index = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    var wi = 0
    while (wi < syms.length) {
      val s = syms(wi); val c = cnts(wi)
      var i = 0
      while (i < s.length - 1) {
        val k = (s(i), s(i + 1))
        stats.update(k, stats.getOrElse(k, 0L) + c)
        index.getOrElseUpdate(k, mutable.Set.empty) += wi
        i += 1
      }
      wi += 1
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < numMerges && stats.nonEmpty) {
      var bl: String = null; var br: String = null; var bn = -1L
      stats.foreach { case ((l, r), n) =>
        if (n > bn || (n == bn && (utf8Lt(l, bl) ||
            (l == bl && utf8Lt(r, br))))) { bl = l; br = r; bn = n }
      }
      val best = (bl, br)
      merges += best
      index.getOrElse(best, mutable.Set.empty).toArray.foreach { id =>
        val old = syms(id); val c = cnts(id)
        // leftmost-first non-overlapping fold — the distributed
        // `aggregate` semantics verbatim
        val nw = mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < old.length) {
          if (nw.nonEmpty && nw.last == bl && old(i) == br)
            nw(nw.length - 1) = bl + br
          else nw += old(i)
          i += 1
        }
        if (nw.length != old.length) {
          var j = 0
          while (j < old.length - 1) {
            val k = (old(j), old(j + 1))
            val left = stats(k) - c
            if (left <= 0L) { stats.remove(k); index.remove(k) }
            else { stats(k) = left; index(k) -= id }
            j += 1
          }
          syms(id) = nw.toArray
          j = 0
          while (j < nw.length - 1) {
            val k = (nw(j), nw(j + 1))
            stats.update(k, stats.getOrElse(k, 0L) + c)
            index.getOrElseUpdate(k, mutable.Set.empty) += id
            j += 1
          }
        }
      }
      round += 1
    }
    merges.toSeq
  }

  /** Greedy BPE apply (the reference tokenizer loop): per word, merge
    * the lowest-rank adjacent pair until none applies. Initial symbols
    * are CODEPOINT grain via split("") — the same grain training's
    * initSymbols/trainLocal use; the former `word.map(_.toString)`
    * split surrogate pairs into UTF-16 halves, so a merge learned on
    * an astral-plane symbol could never fire at apply time (the detok
    * invariant masked it — halves still concatenate back). */
  private[pipeline] def encodeWord(
      word: String, rank: Map[(String, String), Int]): Seq[String] = {
    var syms = cpSplit(word).toVector :+ Eow
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
          // differently from Spark's lower() used in training.
          // No .trim here: Java trim strips all chars <= U+0020 while
          // training/oracle trim strip spaces only — the one shared
          // whitespace contract is the \s+ split with empties dropped.
          val ws = r.getString(1)
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
