package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Curation, Encoding, TextAnalysis}

/** Totality fuzz over the r14 scan-shaped curation operators: seeded
  * random strings drawn from an adversarial alphabet (every Latin-1
  * lead/continuation byte class, broken tag/entity fragments, URL
  * metacharacters, astral codepoints) must never throw — the stake is
  * real: Spark 4's `decode` THROWS on malformed UTF-8, so a single
  * hole in repairMojibake's validity sieve would crash a corpus task
  * rather than pass the payload through. */
class CurationFuzzSpec extends SparkSpec {

  private val alphabet: IndexedSeq[String] = IndexedSeq(
    // ASCII + whitespace
    "a", "Z", "0", " ", "\t", "\n", "\r\n",
    // every mojibake byte class as Latin-1 chars: C0/C1 (invalid
    // leads), C2-DF, E0/ED (restricted seconds), E1-EC, EE-EF,
    // F0/F4 (restricted), F5-FF (invalid), continuations 80-BF,
    // bare continuation without lead
    "À", "Á", "Â", "ß", "à", "á",
    "ì", "í", "î", "ï", "ð", "ñ",
    "ô", "õ", "ÿ", "", "", " ",
    "¿", "©",
    // genuine non-Latin-1 unicode incl. astral + replacement char
    "é", "中", "𝄞", "�", "İ", "Σ", "ς",
    // markup/entity fragments (broken on purpose)
    "<", ">", "<p", "</", "<script", "</script>", "<!--", "-->",
    "&amp;", "&lt", "&#x1F600;", "\"", "'",
    // URL metacharacters
    "http://", "HTTPS://", "://", "?", "&", "#", "=", ":80", "%20",
    "utm_source=x", "//")

  test("repairMojibake / toMojibake / stripHtml / canonicalizeUrl / " +
      "chunkDocuments are total over 400 seeded adversarial strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(414)
    def randText(): String =
      (0 until rnd.nextInt(40)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    val docs = (0L until 400L).map(i => (i, randText()))
      .toDF("id", "text")
      .transform(graft.core.Materialize(_, eager = true))
    // each op must complete and emit no nulls where totality promises
    // a string (repair/strip/url return the input when unsure)
    val out = docs.select(
      Encoding.repairMojibake(col("text")).as("fix"),
      Encoding.repairMojibake(Encoding.toMojibake(col("text")))
        .as("roundtrip"),
      Encoding.mojibakeScore(col("text")).as("score"),
      TextAnalysis.stripHtml(col("text")).as("clean"),
      Curation.canonicalizeUrl(col("text")).as("url"))
    assert(out.count() === 400)
    assert(out.filter(col("fix").isNull || col("clean").isNull ||
      col("url").isNull || col("score").isNull).count() === 0)
    // the corrupt→repair round trip must reproduce the input even on
    // adversarial text: toMojibake always yields a VALID
    // UTF-8-as-Latin-1 image, so repair must always fire and invert
    val broken = docs.select(col("text"),
      Encoding.repairMojibake(Encoding.toMojibake(col("text")))
        .as("rt")).filter(col("text") =!= col("rt"))
    assert(broken.count() === 0, broken.collect().take(3).mkString(";"))
    assert(Curation.chunkDocuments(docs, "id", "text",
      budget = 5, overlap = 2).count() >= 0)
  }

  test("r15 wave: c4Clean / gopherSignals / gopherRepetition / " +
      "dedupLines / dedupSentenceSpans / normalizeUnicode / " +
      "filterBlockedHosts are total over 400 seeded adversarial " +
      "strings; count invariants hold") {
    import spark.implicits._
    val rnd = new scala.util.Random(1515)
    def randText(): String =
      (0 until rnd.nextInt(40)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    val docs = (0L until 400L).map(i => (i, randText()))
      .toDF("id", "text")
      .transform(graft.core.Materialize(_, eager = true))
    val c4 = TextAnalysis.c4Clean(docs, "id", "text")
    assert(c4.count() === 400)
    assert(c4.filter(col("clean").isNull || col("c4_pass").isNull)
      .count() === 0)
    val gq = TextAnalysis.gopherSignals(docs, "id", "text")
    assert(gq.count() === 400)
    val gr = TextAnalysis.gopherRepetition(docs, "id", "text")
    assert(gr.count() === 400)
    // skeleton sanity: dup counts never exceed totals, never negative
    assert(gr.filter(col("n_dup_lines") < 0 ||
      col("n_dup_lines") > col("n_lines") ||
      col("chars_dup_lines") < 0 ||
      col("chars_dup_lines") > col("chars_lines") ||
      col("n_dup_paras") > col("n_paras")).count() === 0)
    val dl = Curation.dedupLines(docs, "id", "text",
      minKeptLines = 0L)
    assert(dl.count() === 400) // floor 0: every doc survives
    assert(dl.filter(col("n_kept") < 0 || col("n_removed") < 0)
      .count() === 0)
    val ds = Curation.dedupSentenceSpans(docs, "id", "text",
      minKeptSentences = 0L)
    assert(ds.count() === 400)
    assert(ds.filter(col("n_kept") < 0 || col("n_removed") < 0)
      .count() === 0)
    val nf = docs.select(
      TextAnalysis.normalizeUnicode(col("text"), "NFC").as("nfc"),
      TextAnalysis.normalizeUnicode(col("text"), "NFKD").as("nfkd"))
    assert(nf.filter(col("nfc").isNull || col("nfkd").isNull)
      .count() === 0)
    // blocklist filter: adversarial non-URLs are all KEPT (no match),
    // and the op never throws on them
    assert(Curation.filterBlockedHosts(docs.withColumnRenamed(
      "text", "url"), "id", "url", Seq("ads.example.com"))
      .count() <= 400)
  }
}
