package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * Everything is a pure column expression (whole-stage codegen, no UDFs,
  * no shuffles) so each operator scales linearly with the scan.
  */
object TextAnalysis {

  /** Small English stopword list used by the quality/langid heuristics. */
  val EnStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "at", "by", "this", "be", "or", "are")

  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-space symbols — a cheap proxy for subword tokenizer load. */
  def tokenCountBpe(text: Column): Column =
    size(call_function("regexp_extract_all", text,
      lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))

  def stopwordCount(text: Column): Column =
    size(filter(tokens(lower(text)),
      t => t.isInCollection(EnStopwords)))

  def stopwordRatio(text: Column): Column =
    stopwordCount(text).cast("double") /
      greatest(tokenCountWs(text).cast("double"), lit(1.0))

  def punctCount(text: Column): Column =
    size(call_function("regexp_extract_all", text,
      lit("[.,;:!?()-]"), lit(0)))

  def avgWordLen(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t))
      .cast("double") /
      greatest(tokenCountWs(text).cast("double"), lit(1.0))

  /** Composite quality score in [0,1]-ish: rewards stopword presence and
    * moderate word length, penalizes punctuation soup. Deterministic
    * arithmetic over ints → oracle-checkable. */
  def qualityScore(text: Column): Column =
    stopwordRatio(text) * 0.5 +
      when(avgWordLen(text).between(3.0, 8.0), 0.3).otherwise(0.0) +
      when(punctCount(text).cast("double") /
        greatest(length(text).cast("double"), lit(1.0)) < 0.1, 0.2)
        .otherwise(0.0)

  /** N-gram-free language ID heuristic: English if the stopword ratio
    * clears a threshold — the cheap single-signal dial.
    * [[langIdNgram]] is the real n-gram classifier. */
  def langId(text: Column, threshold: Double = 0.05): Column =
    when(stopwordRatio(text) >= threshold, "en").otherwise("und")

  /** Built-in character-trigram profiles for [[langIdNgram]] —
    * function-word trigrams (spaces significant) for en/fr/de/es, in
    * the Cavnar-Trenkle style. A language dial: ship your own map
    * for other languages. ASCII-only so the lowercasing boundary
    * (SCALE.md) can never matter. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" th", "the", "he ", " an", "and", "nd ", "ing",
      "ng ", " of", "of ", " to", "to ", "ion", "ent", " in", "in ",
      "er ", "es ", " is", "is ", "at ", "ed ", " on", "tha"),
    "fr" -> Seq(" le", "le ", " de", "de ", "es ", " la", "la ",
      "et ", " et", "ent", "que", " qu", "ue ", "les", " un", "ne ",
      "re ", " pa", "ons", "ait", "eur", "sur", " su", "des"),
    "de" -> Seq(" de", "der", "er ", "ie ", "die", " di", "und",
      " un", "nd ", "ein", " ei", "ich", "ch ", "sch", "che", "en ",
      " da", "das", "ten", "gen", "ber", "cht", "ung", "ist"),
    "es" -> Seq(" de", "de ", " el", "el ", "la ", " la", "os ",
      " lo", "los", " en", "en ", " co", "con", "ado", " es", "es ",
      " se", "del", "as ", "ar ", "una", "par", "que", " po"))

  /** Character-trigram language ID (Cavnar & Trenkle 1994, set-overlap
    * form): the document's distinct lowercased trigrams intersect each
    * profile; most hits wins (ties to the smallest language tag, zero
    * hits is `und`). Integer overlap counts — exactly SQL-replayable,
    * unlike a float-scored classifier. Native codegen'd expression
    * ([[graft.functions.LangIdNgram]]); one scan, no shuffle. Returns
    * `struct(lang, hits)`. */
  def langIdNgram(text: Column,
      profiles: Seq[(String, Seq[String])] = LangProfiles): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.LangIdNgram(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          coalesce(text, lit(""))), profiles))

  /** Cavnar-Trenkle profile TRAINING (the actual published method —
    * 1994 §4.1: rank a language's character n-grams by corpus
    * frequency, keep the top k): per label, count every lowercased
    * codepoint trigram occurrence (spaces significant, the
    * [[langIdNgram]] grain) and keep the `k` most frequent, ties
    * broken by trigram ascending so the profile is deterministic.
    * Emits one row per kept trigram — `(lang, rank, tri, cnt)` —
    * exactly replayable in SQL (group-count + window rank), so the
    * trained profile itself hash-gates.
    *
    * 100 TB shape: trigram explode → (lang, tri) partial-aggregated
    * count (map-side combine collapses to ≤ |alphabet|³ cells per
    * task before the shuffle); the window ranks the already-tiny
    * count table. One shuffle at (lang, tri) grain; document text
    * never crosses the wire. */
  def langIdTrainProfiles(df: DataFrame, labelCol: String,
                          textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"profile size k must be >= 1, got $k")
    // one native pass per row ([[graft.functions.CharNgrams]]): the
    // substr-per-index HOF it replaces re-scanned from the string
    // start per element (O(len²)/doc) and ran interpreted — measured
    // 4.8 s → 0.6 s on the sf0.1 bench corpus
    val tris = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.CharNgrams(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          lower(coalesce(col(textCol), lit("")))), 3))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("cnt").desc, col("tri").asc)
    // materialize the trigram arrays BEFORE the explode: expressions
    // feeding a Generate collapse into it and run interpreted per
    // element (the bigramLm/minhashLsh lesson)
    df.select(col(labelCol).cast("string").as("lang"), tris.as("__tris"))
      .transform(graft.core.Materialize(_))
      .select(col("lang"), explode(col("__tris")).as("tri"))
      .groupBy("lang", "tri").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("lang", "rank", "tri", "cnt")
  }

  /** [[langIdTrainProfiles]] collected into [[langIdNgram]]'s
    * constructor shape — the data-driven replacement for the
    * hardcoded [[LangProfiles]] dial. The collect is bounded by
    * construction (≤ #labels × k rows, guarded below — the
    * mixing-config grain rule); train once, classify everywhere. */
  def langIdTrainedProfiles(df: DataFrame, labelCol: String,
      textCol: String, k: Int): Seq[(String, Seq[String])] = {
    require(k <= 1000,
      s"trained profile size k must be <= 1000 (driver-side " +
        s"constructor data), got $k")
    val rows = langIdTrainProfiles(df, labelCol, textCol, k)
      .select("lang", "rank", "tri").take(100001)
    require(rows.length <= 100000,
      "too many (label × k) profile rows to hold as constructor " +
        "data — reduce k or the label set")
    rows.groupBy(_.getString(0)).toSeq.sortBy(_._1).map {
      case (lang, rs) =>
        lang -> rs.sortBy(_.getLong(1)).map(_.getString(2)).toSeq
    }
  }

  /** Document fingerprint: polynomial rolling hash over the codepoints of
    * the lowercased text, mod 1e9+7 — identical formula is expressible in
    * DuckDB (list_reduce + ascii) for the oracle gate. Native codegen'd
    * expression ([[graft.functions.PolyHash]]); the HOF formulation it
    * replaced is pinned equivalent in VectorExpressionsSpec. */
  def fingerprint(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.PolyHash(
        org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  /** Numeric character references: `&#NNN;` (decimal) and `&#xHH;`
    * (hex) — real crawl HTML is full of them (advice/verdict r14).
    * Decodes VALID Unicode scalar values only (1 … 0x10FFFF excluding
    * the surrogate block); anything else (`&#0;`, `&#xD800;`,
    * out-of-range) passes through verbatim. Implementation is pure
    * built-in expressions: split on the reference pattern, decode each
    * match (codepoint → UTF-32BE bytes → string; Spark has no
    * codepoint `chr` above 255), and re-interleave with `zip_with` —
    * one scan, no UDF. Applied BEFORE the named-entity pass so
    * `&amp;#65;` single-decodes to the literal `&#65;`, matching the
    * named pass's `&amp;`-last contract. */
  private[pipeline] val NumEntityRe =
    "&#([0-9]{1,7}|[xX][0-9A-Fa-f]{1,6});"

  /** `partTransform` is applied to the text BETWEEN numeric
    * references BEFORE the decoded characters are re-interleaved —
    * this is what makes the combined numeric+named decode ONE pass: a
    * numeric-decoded `&` (from `&#38;`) can never be re-consumed by a
    * named-entity replace, because the named replaces only ever see
    * the original inter-reference text (review r15: `&#38;lt;` must
    * yield the literal `&lt;`, not `<`; a named entity cannot span a
    * numeric reference, so per-part decoding loses nothing). */
  private[pipeline] def decodeNumericEntities(
      c: Column, partTransform: Column => Column = identity): Column = {
    val parts = split(c, NumEntityRe, -1)
    val ents = regexp_extract_all(c, lit(NumEntityRe), lit(1))
    def decodeOne(e: Column): Column = {
      val cp = when(e.rlike("^[xX]"),
        conv(e.substr(lit(2), length(e)), 16, 10).cast("long"))
        .otherwise(e.cast("long"))
      val valid = cp >= 1L && cp <= 0x10FFFFL &&
        !(cp >= 0xD800L && cp <= 0xDFFFL)
      when(valid, decode(unhex(lpad(hex(cp), 8, "0")), "UTF-32"))
        .otherwise(concat(lit("&#"), e, lit(";")))
    }
    // split yields n+1 parts for n references; pad the decoded array
    // to the same length so zip_with never concats against null
    array_join(zip_with(transform(parts, p => partTransform(p)),
      concat(transform(ents, decodeOne(_)), array(lit(""))),
      (p, d) => concat(p, d)), "")
  }

  /** The pre-r16 built-in-expression entity decode (numeric pass +
    * six-`replace` named fold per inter-reference part) — retained as
    * the independently-derived reference formulation that the fused
    * native [[graft.functions.HtmlEntityDecode]] is property-tested
    * against (VectorExpressionsSpec). Not on any query path. */
  private[graft] def decodeEntitiesBuiltin(c: Column): Column = {
    def named(x: Column): Column = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(x) { case (acc, (k, v)) =>
        org.apache.spark.sql.functions.replace(acc, lit(k), lit(v))
      }
    decodeNumericEntities(c, named)
  }

  /** HTML → text extraction (the CCNet/RefinedWeb pre-tokenization
    * step): drop script/style/comment blocks WITH their contents (a
    * tag-only strip would leak javascript into the corpus), strip the
    * remaining tags, decode numeric character references and the six
    * ubiquitous named entities in one fused native pass
    * ([[graft.functions.HtmlEntityDecode]] — one-pass contract:
    * `&amp;lt;` single-decodes to `&lt;`), and normalize whitespace
    * runs.
    * All built-in codegen'd expressions; the regexes use only syntax
    * both java.util.regex and RE2 (the DuckDB oracle) share — `(?is)`
    * inline flags and lazy quantifiers, no backrefs/lookaround. */
  def stripHtml(html: Column): Column = {
    val noBlocks = regexp_replace(coalesce(html, lit("")),
      "(?is)<(script|style)[^>]*>.*?</(script|style)\\s*>", " ")
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "(?s)<[^>]*>", " ")
    // numeric + named entity decode fused into ONE native pass
    // ([[graft.functions.HtmlEntityDecode]]); semantics pinned
    // identical to the built-in formulation kept in
    // [[decodeEntitiesBuiltin]] by a VectorExpressionsSpec
    // property test and the unchanged p111/p112 gates
    val decoded = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.HtmlEntityDecode(
        org.apache.spark.sql.graft.ColumnBridge.expression(noTags)))
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** The Gopher quality-rule word list (Rae et al. 2021, table A1):
    * a document must contain at least 2 of these to pass. */
  val GopherRequiredWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher quality-filter rules (Rae et al. 2021 §A.1.1 — the
    * published heuristic suite MassiveWeb was filtered with; also the
    * backbone of RefinedWeb/Dolma's rule stacks). Emits the INTEGER
    * signal skeleton — exactly SQL-replayable, the p91 discipline —
    * plus `gopher_pass` (0/1) applying the paper's thresholds:
    *
    *   - 50 ≤ word count ≤ 100,000
    *   - 3 ≤ mean word length ≤ 10  (integer form: 3·n ≤ chars ≤ 10·n)
    *   - symbol-to-word ratio (`#` or `…`) ≤ 0.1  (10·sym ≤ n)
    *   - < 90% of lines start with a bullet  (10·bullet < 9·lines)
    *   - ≤ 30% of lines end with an ellipsis  (10·ell ≤ 3·lines)
    *   - ≥ 80% of words contain an alphabetic char  (5·alpha ≥ 4·n)
    *   - ≥ 2 of `requiredWords` present (default
    *     [[GopherRequiredWords]], the paper's English list — a
    *     language-specific dial; non-English pipelines pass their own)
    *
    * Ratio thresholds are applied in cross-multiplied INTEGER form so
    * the pass bit is bit-reproducible in any engine — no float
    * division anywhere. Lines are non-empty after trim; words are the
    * repo-wide whitespace contract. Pure codegen'd projection: the
    * 100 TB cost is the scan. */
  def gopherSignals(df: DataFrame, idCol: String, textCol: String,
      requiredWords: Seq[String] = GopherRequiredWords): DataFrame = {
    require(requiredWords.nonEmpty, "requiredWords must be non-empty")
    // matched against LOWERCASED tokens — a caller passing "The"
    // would otherwise silently never match (review r15), the same
    // normalization c4Clean applies to badWords
    val reqLower = requiredWords
      .map(_.toLowerCase(java.util.Locale.ROOT))
    val raw = coalesce(col(textCol), lit(""))
    // all eight integer signals in ONE fused native pass
    // ([[graft.functions.GopherStats]] — r16 optimization): the
    // per-column HOF/regex formulation re-derived the token and line
    // arrays up to eight times per row on the interpreted
    // CodegenFallback path. Signal semantics are bit-identical —
    // property-tested against [[gopherSignalsBuiltin]] and re-gated by
    // the unchanged p121/p122 oracles. The struct lands as ONE column
    // first (GopherStats is not collapse-cheap, so CollapseProject
    // keeps a single evaluation — the GramTopStats pattern).
    val st = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.GopherStats(
        org.apache.spark.sql.graft.ColumnBridge.expression(raw),
        reqLower))
    val base = df.select(col(idCol), st.as("__gs"))
      .select(Seq(col(idCol)) ++ GopherSignalCols.map(c =>
        col("__gs")(c).as(c)): _*)
    base.withColumn("gopher_pass", gopherPass)
  }

  private val GopherSignalCols = Seq("n_words", "n_chars", "n_sym",
    "n_lines", "n_bullet", "n_ellipsis", "n_alpha_words", "n_required")

  /** The paper's thresholds in cross-multiplied integer form, applied
    * to the signal columns (shared by the fused and built-in paths). */
  private def gopherPass: Column =
    (col("n_words") >= 50L && col("n_words") <= 100000L &&
      col("n_chars") >= col("n_words") * 3L &&
      col("n_chars") <= col("n_words") * 10L &&
      col("n_sym") * 10L <= col("n_words") &&
      col("n_bullet") * 10L < col("n_lines") * 9L &&
      col("n_ellipsis") * 10L <= col("n_lines") * 3L &&
      col("n_alpha_words") * 5L >= col("n_words") * 4L &&
      col("n_required") >= 2L).cast("int")

  /** The pre-r16 per-column HOF/regex formulation — retained as the
    * independently-derived executable spec the fused
    * [[graft.functions.GopherStats]] pass is property-tested against
    * (VectorExpressionsSpec). Not on any query path. */
  private[graft] def gopherSignalsBuiltin(df: DataFrame, idCol: String,
      textCol: String,
      requiredWords: Seq[String] = GopherRequiredWords): DataFrame = {
    require(requiredWords.nonEmpty, "requiredWords must be non-empty")
    val reqLower = requiredWords
      .map(_.toLowerCase(java.util.Locale.ROOT))
    val raw = coalesce(col(textCol), lit(""))
    val toks = filter(split(trim(raw), "\\s+"), t => t =!= "")
    val lines = filter(transform(split(raw, "\n"), l => trim(l)),
      l => l =!= "")
    val lowToks = transform(toks, t => lower(t))
    val base = df.select(
      col(idCol),
      size(toks).cast("long").as("n_words"),
      // Σ len(token) == len(separator-less join) — one native pass,
      // not a per-element interpreted aggregate() fold (the
      // gopherRepetition charSum lesson, same diff)
      length(array_join(toks, "")).cast("long").as("n_chars"),
      size(call_function("regexp_extract_all", raw, lit("[#…]"),
        lit(0))).cast("long").as("n_sym"),
      size(lines).cast("long").as("n_lines"),
      size(filter(lines, l => l.rlike("^[-*•‣▪]")))
        .cast("long").as("n_bullet"),
      // \z, not $: Java's $ also matches before a final \r or U+0085,
      // so a CRLF corpus line "foo...\r" would count here while the
      // RE2/DuckDB oracle (strict-end $) says no (r16; the Encoding
      // sieve had the same hole)
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\z")))
        .cast("long").as("n_ellipsis"),
      size(filter(toks, t => t.rlike("[A-Za-z]")))
        .cast("long").as("n_alpha_words"),
      size(filter(
        array(reqLower.map(lit): _*),
        w => array_contains(lowToks, w))).cast("long").as("n_required"))
    base.withColumn("gopher_pass", gopherPass)
  }

  /** The C4 line-level policy phrases (Raffel et al. 2020 §2.2, as
    * published in the TensorFlow-datasets `c4_utils` reference
    * implementation): a line containing any of these is dropped. */
  val C4PolicyPhrases: Seq[String] = Seq(
    "terms of use", "privacy policy", "cookie policy",
    "uses cookies", "use of cookies", "use cookies")

  /** The C4 cleaning rules (Raffel et al. 2020 §2.2 — the heuristic
    * suite the Colossal Clean Crawled Corpus was built with; with
    * [[gopherSignals]] the other canonical published rule stack).
    * Line-level: keep lines that end in a terminal punctuation mark
    * (`.?!"` — the reference implementation's `_END_MARKS`), carry at
    * least 5 whitespace words, contain neither the word `javascript`
    * nor a [[C4PolicyPhrases]] policy phrase. Page-level signals over
    * the result: `clean` (kept lines joined with `\n`), `n_lines_kept`,
    * `n_sentences` (terminal-punctuation count over the kept text — a
    * deterministic proxy for the paper's NLTK sentence count, which is
    * not reproducible across engines), and `c4_pass` applying the
    * paper's page rules: ≥ 3 sentences, no `lorem ipsum`, no curly
    * brace `{` (code pages), and no `badWords` token (the paper's
    * blocklist is a parameter — its published list is an English
    * dial; empty disables the rule, token-grain case-insensitive).
    *
    * Page-level containment rules test the RAW page (the paper drops
    * the page when the phrase appears anywhere, kept line or not).
    * Pure codegen'd projection — one scan, no shuffle, no UDF; every
    * signal is integer/string arithmetic so the gate replays exactly. */
  def c4Clean(df: DataFrame, idCol: String, textCol: String,
      badWords: Seq[String] = Nil): DataFrame = {
    val raw = coalesce(col(textCol), lit(""))
    val trimmedLines = transform(split(raw, "\n", -1), l => trim(l))
    def lineKeeps(l: Column): Column = {
      val low = lower(l)
      // \z, not $ (advice r15): Java's $ matches before a final line
      // terminator, so "sentence.\r" (CRLF text — split("\n") keeps
      // the \r and Spark's trim strips only spaces) would be KEPT
      // here while both the RE2/DuckDB oracle and the C4 reference's
      // endswith drop it
      l.rlike("[.?!\"]\\z") &&
        size(filter(split(l, "\\s+"), w => w =!= "")) >= 5 &&
        !low.rlike("\\bjavascript\\b") &&
        !C4PolicyPhrases.map(p => low.contains(lit(p)))
          .reduce(_ || _)
    }
    val kept = filter(trimmedLines, lineKeeps(_))
    val clean = array_join(kept, "\n")
    val lowRaw = lower(raw)
    val badHit =
      if (badWords.isEmpty) lit(false)
      else exists(split(lowRaw, "\\s+"),
        t => t.isInCollection(badWords.map(_.toLowerCase(
          java.util.Locale.ROOT))))
    val pageBad = lowRaw.contains("lorem ipsum") ||
      raw.contains("{") || badHit
    df.select(
        col(idCol),
        clean.as("clean"),
        size(kept).cast("long").as("n_lines_kept"),
        size(call_function("regexp_extract_all", clean, lit("[.?!]"),
          lit(0))).cast("long").as("n_sentences"),
        pageBad.as("__pagebad"))
      .withColumn("c4_pass",
        (col("n_sentences") >= 3L && !col("__pagebad")).cast("int"))
      .drop("__pagebad")
  }

  /** Unicode normalization (NFC by default) — the canonical-form step
    * a dedup/fingerprint pipeline runs first: `café` composed and
    * `café` decomposed (e + U+0301) are the same text but different
    * codepoints, so exact/MinHash dedup misses the pair without it.
    * Implemented as a native codegen'd Catalyst expression
    * ([[graft.functions.UnicodeNormalize]] — `java.text.Normalizer`
    * with an `isNormalized` fast path, so the overwhelmingly-common
    * already-normalized ASCII row allocates nothing); forms NFC / NFD
    * / NFKC / NFKD. One scan, no shuffle; NFC is gated against
    * DuckDB's `nfc_normalize` (utf8proc) — two independent
    * implementations of UAX #15. */
  def normalizeUnicode(c: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.UnicodeNormalize(
        org.apache.spark.sql.graft.ColumnBridge.expression(c), form))

  /** The Gopher REPETITION-filter suite (Rae et al. 2021 §A.1.1,
    * table A1 — the within-document repetition rules MassiveWeb was
    * filtered with, alongside the quality rules of [[gopherSignals]]).
    * Emits the integer signal skeleton per document:
    *
    *   - `n_chars` — codepoints of the raw text,
    *   - `n_lines` / `n_dup_lines` — non-blank trimmed lines, and
    *     occurrences beyond each line's first (the duplicate-line
    *     count),
    *   - `chars_lines` / `chars_dup_lines` — their codepoint totals
    *     (`chars_dup_lines = chars_lines − Σ len(distinct lines)`),
    *   - the paragraph twins (`\n\n`-separated blocks),
    *   - `top{2,3,4}_cnt` / `top{2,3,4}_len` — the occurrence count
    *     and codepoint length of the document's most frequent word
    *     {2,3,4}-gram (count ties break to the LONGEST gram — the
    *     conservative worst-case char fraction; 0/0 when the document
    *     has fewer than n words),
    *
    * plus `rep_pass` applying the paper's thresholds in
    * cross-multiplied INTEGER form (exact in any engine):
    * duplicate-line fraction ≤ 0.30, duplicate-paragraph ≤ 0.30,
    * duplicate-line-chars ≤ 0.20, duplicate-paragraph-chars ≤ 0.20,
    * top-2-gram char fraction ≤ 0.20, top-3-gram ≤ 0.18, top-4-gram
    * ≤ 0.16 (numerator `top_cnt · top_len`, denominator `n_chars`),
    * and the paper's remaining six rules — duplicate-{5..10}-gram
    * COVERAGE fractions ≤ {0.15, 0.14, 0.13, 0.12, 0.11, 0.10}:
    * `dup{n}_chars` is the codepoint total of words inside ANY
    * occurrence of an n-gram repeated within the document (overlaps
    * counted once — a word-position interval union, computed by the
    * fused [[graft.functions.DupGramCoverage]] pass), over
    * `n_word_chars` (all word codepoints; separators excluded on
    * both numerator and denominator — the word-grain accounting is a
    * documented deviation from the paper's unspecified raw-character
    * form, chosen because the position union replays exactly in SQL).
    *
    * 100 TB shape: ZERO-shuffle — the entire operator is one
    * projection. The line/paragraph signals are per-doc array
    * expressions; the top-n-gram winners come from
    * [[graft.functions.GramTopStats]], a fused native pass (the most
    * frequent n-gram is a WITHIN-document property, so the per-row
    * hash map replaces what was a corpus-wide (doc, n, gram-hash)
    * count shuffle — measured 82 s → scan-speed at the 100× rung).
    * Gram classes compare by 64-bit hash (collision merges, the
    * hashed-gram discipline, here scoped per document). */
  def gopherRepetition(df: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val raw = coalesce(col(textCol), lit(""))
    // all eight line/paragraph signals in ONE fused native pass
    // ([[graft.functions.LineRepStats]] — r16 optimization): the
    // per-column split + trim-transform + filter + array_distinct +
    // array_join chains re-derived the line and paragraph arrays up
    // to four times each per row on the interpreted CodegenFallback
    // path. Signal semantics are bit-identical — property-tested
    // against the array formulation in VectorExpressionsSpec and
    // re-gated by the unchanged p133/p134 oracles.
    val lineStats = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.LineRepStats(
        org.apache.spark.sql.graft.ColumnBridge.expression(raw)))
    val topGrams = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.GramTopStats(
        org.apache.spark.sql.graft.ColumnBridge.expression(raw),
        Seq(2, 3, 4)))
    val dupCov = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.DupGramCoverage(
        org.apache.spark.sql.graft.ColumnBridge.expression(raw),
        Seq(5, 6, 7, 8, 9, 10)))
    val base = df.select(
        col(idCol).as("__id"),
        length(raw).cast("long").as("n_chars"),
        lineStats.as("__lr"),
        topGrams.as("__tg"), dupCov.as("__dc"))
      .select(
        col("__id"), col("n_chars"),
        col("__lr")("n_lines").as("n_lines"),
        col("__lr")("n_dup_lines").as("n_dup_lines"),
        col("__lr")("chars_lines").as("chars_lines"),
        col("__lr")("chars_dup_lines").as("chars_dup_lines"),
        col("__lr")("n_paras").as("n_paras"),
        col("__lr")("n_dup_paras").as("n_dup_paras"),
        col("__lr")("chars_paras").as("chars_paras"),
        col("__lr")("chars_dup_paras").as("chars_dup_paras"),
        col("__tg"), col("__dc"))
    base
      .withColumn("top2_cnt", col("__tg")("top2_cnt"))
      .withColumn("top2_len", col("__tg")("top2_len"))
      .withColumn("top3_cnt", col("__tg")("top3_cnt"))
      .withColumn("top3_len", col("__tg")("top3_len"))
      .withColumn("top4_cnt", col("__tg")("top4_cnt"))
      .withColumn("top4_len", col("__tg")("top4_len"))
      .drop("__tg")
      .withColumn("n_word_chars", col("__dc")("n_word_chars"))
      .withColumn("dup5_chars", col("__dc")("dup5_chars"))
      .withColumn("dup6_chars", col("__dc")("dup6_chars"))
      .withColumn("dup7_chars", col("__dc")("dup7_chars"))
      .withColumn("dup8_chars", col("__dc")("dup8_chars"))
      .withColumn("dup9_chars", col("__dc")("dup9_chars"))
      .withColumn("dup10_chars", col("__dc")("dup10_chars"))
      .drop("__dc")
      .withColumn("rep_pass",
        (col("n_dup_lines") * 10L <= col("n_lines") * 3L &&
          col("n_dup_paras") * 10L <= col("n_paras") * 3L &&
          col("chars_dup_lines") * 5L <= col("chars_lines") &&
          col("chars_dup_paras") * 5L <= col("chars_paras") &&
          col("top2_cnt") * col("top2_len") * 5L <= col("n_chars") &&
          col("top3_cnt") * col("top3_len") * 50L <=
            col("n_chars") * 9L &&
          col("top4_cnt") * col("top4_len") * 25L <=
            col("n_chars") * 4L &&
          col("dup5_chars") * 100L <= col("n_word_chars") * 15L &&
          col("dup6_chars") * 100L <= col("n_word_chars") * 14L &&
          col("dup7_chars") * 100L <= col("n_word_chars") * 13L &&
          col("dup8_chars") * 100L <= col("n_word_chars") * 12L &&
          col("dup9_chars") * 100L <= col("n_word_chars") * 11L &&
          col("dup10_chars") * 10L <= col("n_word_chars"))
          .cast("int"))
      .withColumnRenamed("__id", idCol)
  }

  /** RFC 9309 robots.txt evaluation — `true` when `agent` may fetch
    * `path` under the `rules` body: group selection by product token
    * (exact beats `*`), longest-pattern match with `*`/`$` wildcards,
    * Allow wins length ties, no match → allowed. Native codegen'd
    * expression ([[graft.functions.RobotsAllowed]]) — the
    * crawl-politeness filter applied before any fetch-derived row
    * enters a corpus. One scan, no shuffle. */
  def robotsAllowed(rules: Column, path: Column,
                    agent: String): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.RobotsAllowed(
        org.apache.spark.sql.graft.ColumnBridge.expression(rules),
        org.apache.spark.sql.graft.ColumnBridge.expression(path),
        agent))

  /** Email addresses — RE2-compatible (the oracle's DuckDB regex engine)
    * AND java.util.regex-compatible, so both engines see identical
    * matches. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Digit runs of 3+ (phone fragments, ids, SSN-ish blocks). */
  val DigitRunRe = "[0-9]{3,}"

  /** PII scrub for training corpora: mask emails first (so their digits
    * don't half-match), then long digit runs. Pure codegen'd projection —
    * the 100 TB shape is one pass over the text column, no shuffle. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"),
      DigitRunRe, "<NUM>")

  /** Within-document repetition: 1 − |distinct tokens| / |tokens| — the
    * cheap boilerplate/spam signal (template pages repeat their
    * vocabulary). 0 = all tokens distinct, → 1 = one token repeated. */
  def repetitionRatio(text: Column): Column =
    lit(1.0) - size(array_distinct(tokens(lower(text)))).cast("double") /
      greatest(tokenCountWs(text).cast("double"), lit(1.0))

  /** Fused token statistics (one native pass —
    * [[graft.functions.TextStats]]); field semantics identical to the
    * HOF formulations above, pinned equivalent in the test suite. */
  def stats(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.TextStats(
        org.apache.spark.sql.graft.ColumnBridge.expression(text),
        EnStopwords))

  /** The quality formula over a [[stats]] struct — same arithmetic as
    * [[qualityScore]], sourcing counts from the fused pass. */
  private def qualityOf(st: Column): Column = {
    val nTok = greatest(st.getField("n_ws").cast("double"), lit(1.0))
    val ratio = st.getField("stop_cnt").cast("double") / nTok
    val awl = st.getField("char_sum").cast("double") / nTok
    ratio * 0.5 +
      when(awl.between(3.0, 8.0), 0.3).otherwise(0.0) +
      when(st.getField("punct_cnt").cast("double") /
        greatest(st.getField("n_chars").cast("double"), lit(1.0)) < 0.1,
        0.2).otherwise(0.0)
  }

  /** [[qualityScore]] backed by the fused native pass — bit-identical
    * output (same Column arithmetic over the same integer counts). */
  def qualityScoreFast(text: Column): Column = qualityOf(stats(text))

  /** Corpus vocabulary: the `k` most frequent lowercased whitespace
    * tokens with document frequency — the exact top-k a tokenizer-vocab
    * build runs. One explode + one map-side-combined count shuffle
    * (distinct tokens, not corpus tokens, cross the wire), then a
    * rank-k cut. Ties break on the term ascending so the cut is
    * deterministic and oracle-checkable. At 100 TB the count table is
    * vocabulary-sized; the final global sort ranks only that table. */
  def topTerms(df: DataFrame, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("term").asc)))
      .filter(col("rank") <= k)
  }

  /** Per-document TF-IDF over the top-`vocab` corpus terms:
    * `tf · ln(N / df)`. The integer skeleton (tf, df — the joins and
    * counts that ARE the operator) is oracle-gated; the float `tfidf`
    * projection is spec-gated only, because `ln` is not guaranteed
    * bit-identical across engines' libm in the last ulp. Document
    * frequency comes from one distinct-(doc, term) aggregate; the
    * vocabulary cut bounds output width. */
  def tfIdf(df: DataFrame, idCol: String, textCol: String,
            vocab: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = df.count()
    // ONE corpus pass (r16 optimization): the (doc, term, tf) table is
    // the only occurrence-grain aggregate, and every other relation the
    // operator needs derives from it at (doc, term)-or-smaller grain —
    //   df   = count of (doc, term) rows per term (≡ the former
    //          distinct-token explode: distinct (doc, term) pairs),
    //   rank = row_number over total occurrences Σtf (≡ topTerms'
    //          occurrence count — same ties, term ascending).
    // The former shape exploded the corpus THREE times (docTerm
    // distinct, topTerms, tf), paying three tokenize passes; the tf
    // table here feeds two consumers (the vocabulary cut and the
    // final join), and is MATERIALIZED because neither static
    // ReuseExchange nor AQE stage reuse dedups the shared subtree
    // when the source is a cached relation (measured: the executed
    // adaptive plan carried the tf shuffle twice — a Spark 4
    // TableCacheQueryStage canonicalization quirk; with AQE off the
    // static rule does fire, kept as plans/r16/tfidf_after_noaqe.txt).
    // Net: 3 corpus scans + 1 (doc,term) shuffle → 1 scan + 1 shuffle
    // + a (doc,term)-grain checkpoint (≪ corpus text). Values are
    // bit-identical: same counts, same rank order, same `tf·ln(n/df)`
    // doubles (p51/p52 re-gated); 3-way interleaved A/B: old 0.463 /
    // unmaterialized 0.501 / this 0.481 s min locally.
    val tf = df.select(col(idCol).as("doc"),
      explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy("doc", "term").agg(count(lit(1)).as("tf"))
      .transform(graft.core.Materialize(_))
    val termStats = tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cnt"))
    val top = termStats
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("term").asc)))
      .filter(col("rank") <= vocab)
      .select("term", "df")
    tf.join(broadcast(top), "term")
      .select(col("doc"), col("term"), col("tf"), col("df"),
        (col("tf").cast("double") *
          log(lit(n.toDouble) / col("df").cast("double"))).as("tfidf"))
  }

  /** Typed empty `array<struct<w1,bg>>` literal (a bare `array()` is
    * `array<null>`). */
  private def emptyBigrams: Column =
    filter(array(struct(lit(0L).as("w1"), lit(0L).as("bg"))),
      _ => lit(false))

  /** Corpus-trained bigram language-model scoring — the CCNet-style
    * perplexity quality signal: train add-one-smoothed bigram
    * probabilities on the corpus itself, then score every document by
    * `sum ln((c2(w1,w2) + 1) / (c1(w1) + V))` over its adjacent
    * lowercased-token pairs, where `c2` is the corpus bigram count,
    * `c1` the corpus count of `w1` as a bigram prefix, and `V` the
    * distinct-token vocabulary size. Output per document with >= 1
    * bigram: `n_bigrams`, `sum_c2`, `sum_c1` (the INTEGER skeleton the
    * oracle gates — the joins and counts that ARE the operator),
    * `logprob` and `ppl = exp(-logprob / n_bigrams)` (spec-gated only:
    * `ln` is not bit-guaranteed across engines' libm, the tfIdf
    * precedent).
    *
    * 100 TB shape: bigrams cross the two counting shuffles as xxhash64
    * longs (the hashed-gram discipline; a collision MERGES two bigram
    * classes, inflating a count, never splitting one); the count tables
    * are vocabulary-grain, ≪ corpus; scoring is one hash join per count
    * table plus a map-side-combined doc-grain aggregate; `V` rides in
    * as a broadcast 1-row cross join, never a driver collect.
    */
  def bigramLm(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val th = transform(tokens(lower(col(textCol))), t => xxhash64(t))
    // (id, [(prefix-hash, bigram-hash)]) materialized BEFORE the explode
    // (expressions feeding a Generate run interpreted — the minhashLsh
    // lesson); both count sides re-derive the cheap explode from it
    val base = df.select(col(idCol).as("__id"), th.as("__th"))
      .select(col("__id"), col("__th"),
        when(size(col("__th")) >= 2,
          transform(sequence(lit(0), size(col("__th")) - 2),
            i => struct(element_at(col("__th"), i + 1).as("w1"),
              xxhash64(slice(col("__th"), i + 1, lit(2))).as("bg"))))
          .otherwise(emptyBigrams).as("__bs"))
      .transform(graft.core.Materialize(_))
    val pairs = base.select(col("__id"), explode(col("__bs")).as("__b"))
      .select(col("__id"), col("__b")("w1").as("__w1"),
        col("__b")("bg").as("__bg"))
    // r16 optimization: the occurrence table probes ONE combined
    // (bg → c2, c1) table instead of joining c2 (by bigram) and then
    // c1 (by prefix) separately — the prefix is functionally determined
    // by the bigram (min is a tie-break only a 64-bit bigram-hash
    // collision could exercise, the same merge-only collision class the
    // hashed-bigram shuffle already accepts), so c1 attaches at
    // BIGRAM-COUNT grain (vocabulary-sized) rather than occurrence
    // grain. At scale this removes one occurrence-grain shuffle join;
    // the gated integer skeleton is unchanged (p91 re-gated).
    val c2 = pairs.groupBy("__bg")
      .agg(count(lit(1)).as("__c2"), min(col("__w1")).as("__w1"))
    val c1 = pairs.groupBy("__w1").agg(count(lit(1)).as("__c1"))
    val cTab = c2.join(c1, Seq("__w1"))
      .select(col("__bg"), col("__c2"), col("__c1"))
    val vocab = base.select(explode(col("__th")).as("__t"))
      .agg(countDistinct(col("__t")).as("__v"))
    pairs.join(cTab, Seq("__bg"))
      .join(broadcast(vocab))
      .groupBy("__id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("__c2")).as("sum_c2"),
        sum(col("__c1")).as("sum_c1"),
        sum(log((col("__c2") + 1).cast("double") /
          (col("__c1") + col("__v")).cast("double"))).as("logprob"))
      .select(col("__id").as(idCol), col("n_bigrams"),
        col("sum_c2"), col("sum_c1"), col("logprob"),
        exp(-col("logprob") / col("n_bigrams").cast("double")).as("ppl"))
  }

  /** Convenience: annotate a document DataFrame with all signals. One
    * fused native pass feeds every token-derived column. */
  def annotate(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val withStats = df.withColumn("__st", stats(t))
    val st = col("__st")
    val nTok = greatest(st.getField("n_ws").cast("double"), lit(1.0))
    withStats
      .withColumn("n_tokens", st.getField("n_ws"))
      .withColumn("n_tokens_bpe", tokenCountBpe(t))
      .withColumn("stopword_ratio",
        st.getField("stop_cnt").cast("double") / nTok)
      .withColumn("avg_word_len",
        st.getField("char_sum").cast("double") / nTok)
      .withColumn("quality", qualityOf(st))
      .withColumn("lang_pred",
        when(st.getField("stop_cnt").cast("double") / nTok >= 0.05, "en")
          .otherwise("und"))
      .withColumn("fingerprint", fingerprint(t))
      .drop("__st")
  }
}
