package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mojibake detection and repair — the encoding-fix step (ftfy's core
  * case) every web-corpus pipeline runs before tokenization: text that
  * was UTF-8 on the wire but got decoded as Latin-1 once ends up as
  * `Ã©` for `é`, `Ã¢â‚¬` soup for punctuation, etc. The repair is the
  * inverse mis-step: re-encode the string as Latin-1 and decode the
  * bytes as UTF-8 — applied ONLY when the string actually looks like
  * UTF-8-seen-as-Latin-1 (every non-ASCII char participates in a
  * valid UTF-8 byte pattern and at least one multi-byte signature is
  * present), so genuine Latin-1/Unicode prose passes through
  * untouched. One round only (ftfy loops for double-encoded text;
  * chain the column twice for that).
  *
  * Everything here is built-in codegen'd expressions (`encode` /
  * `decode` / `rlike` / `regexp_count`) — no UDF, fully pushdown- and
  * whole-stage-codegen-friendly, so the 100 TB cost is one scan.
  *
  * The reference has no text-normalization surface — beyond-parity,
  * SURVEY §2.10 (the LLM-pipeline family).
  */
object Encoding {

  /** Every char is ASCII or part of a VALID UTF-8 byte pattern seen
    * as Latin-1 — the exact RFC 3629 grammar (E0/ED/F0/F4 second-byte
    * restrictions included), so overlong encodings and UTF-8'd
    * surrogates never pass. Exactness matters: Spark 4's `decode`
    * THROWS on malformed UTF-8 (MALFORMED_CHARACTER_CODING), so the
    * sieve must guarantee the repair branch can never see one. */
  private val AllMojibakeSafe =
    "^(?:[\\x00-\\x7F]" +
      "|[\\xC2-\\xDF][\\x80-\\xBF]" +
      "|\\xE0[\\xA0-\\xBF][\\x80-\\xBF]" +
      "|[\\xE1-\\xEC][\\x80-\\xBF]{2}" +
      "|\\xED[\\x80-\\x9F][\\x80-\\xBF]" +
      "|[\\xEE-\\xEF][\\x80-\\xBF]{2}" +
      "|\\xF0[\\x90-\\xBF][\\x80-\\xBF]{2}" +
      "|[\\xF1-\\xF3][\\x80-\\xBF]{3}" +
      // \z, NOT $: Java's $ matches BEFORE a final line terminator,
      // and U+0085 (NEL — byte 0x85 in the Latin-1 view, a lone UTF-8
      // continuation byte) is one of Java's line terminators — under
      // $, any string ENDING in 0x85 passed the sieve and the
      // "guarded" UTF-8 decode behind it threw
      // MALFORMED_CHARACTER_CODING (r16; the same engine-divergence
      // class as the c4Clean CR advice)
      "|\\xF4[\\x80-\\x8F][\\x80-\\xBF]{2})*\\z"

  /** At least one multi-byte signature (a bare all-ASCII string is
    * identical under the mis-decode — nothing to repair). */
  private val MojibakeSignature = "[\\xC2-\\xF4][\\x80-\\xBF]"

  /** True when a Latin-1 byte view is valid UTF-8 (the exact sieve
    * above; pure ASCII passes). Shared with [[Ingest.httpSplit]]'s
    * charset salvage — the guarantee is the same one [[repairMojibake]]
    * relies on: the UTF-8 `decode` behind a true sieve can never see a
    * malformed sequence, so it can never throw. */
  private[pipeline] def looksLikeUtf8(latin1View: Column): Column =
    latin1View.rlike(AllMojibakeSafe)

  /** Number of mojibake signature sequences — the per-document signal
    * a curation pass thresholds on (0 for clean ASCII and for genuine
    * accented prose like `déjà vu`, which has no continuation-range
    * follower). */
  def mojibakeScore(c: Column): Column =
    regexp_count(coalesce(c, lit("")), lit(MojibakeSignature))

  /** The corruption itself (fixture twin of [[repairMojibake]], and
    * the exact classic mis-step): interpret the text's UTF-8 bytes as
    * Latin-1. Lossless and invertible for ANY input — Latin-1 maps
    * every byte 0x00-0xFF to U+0000-U+00FF. */
  def toMojibake(c: Column): Column =
    decode(encode(c, "UTF-8"), "ISO-8859-1")

  /** Repair one round of Latin-1 mis-decoding, or return the input
    * unchanged when it doesn't look corrupted: every non-ASCII char
    * must sit in a valid UTF-8-as-Latin-1 pattern (the exact sieve
    * above — so the decode can never throw) and at least one
    * signature must be present. */
  def repairMojibake(c: Column): Column = {
    val s = coalesce(c, lit(""))
    when(s.rlike(AllMojibakeSafe) && s.rlike(MojibakeSignature),
      decode(encode(s, "ISO-8859-1"), "UTF-8"))
      .otherwise(s)
  }
}
