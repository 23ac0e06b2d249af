package graft

/** DuckDB-dialect SQL generators that mirror the engine's xxhash64-based
  * operators EXACTLY, so the approximate-by-design pipeline queries
  * (minhash banding, simhash, hyperplane LSH, IVF) get hard independent
  * oracles instead of rows-only checks.
  *
  * The mirror computes Spark's `xxhash64` (XXH64, seed 42 — the public
  * specification at github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md)
  * inside DuckDB itself, in HUGEINT over the unsigned [0, 2^64) domain:
  * mul/add are mod-2^64 arithmetic (HUGEINT never overflows: every
  * product operand is pre-split to 32 bits), rotations and right shifts
  * are pure arithmetic (multiply/divide by 2^k), xor is DuckDB's native
  * `xor`. The formulation is validated on randomized inputs against
  * Spark's own `xxhash64` by `tools/duck_xxh64_proto.py` (string, int,
  * long, chained and array paths — including multi-byte UTF-8 and
  * >= 32-byte stripe inputs).
  *
  * Known mirror boundary — LOWERCASING, not hashing: oracles that
  * tokenize via `lower()` (the simhash/fingerprint replays) rely on the
  * two engines lowercasing identically. Measured divergences (r12):
  * Spark/Java lowercases contextually — `İ` → `i` + U+0307 combining
  * dot, word-final `Σ` → `ς` — while DuckDB's `lower()` applies simple
  * mappings (`İ` → `i`, `Σ` → `σ` everywhere). The non-ASCII gate
  * fixtures therefore use pre-lowercased text (covering 2-, 3- and
  * 4-byte UTF-8, where both engines agree and the byte-level XXH64
  * mirror is exact). Mixed-case Turkish/Greek is CLOSED as of round
  * 14: [[contextualLowerSql]] mirrors the contextual semantics in
  * DuckDB SQL (İ expansion + Final_Sigma), hash-proven by gate p113
  * over a mixed-case fixture — oracles that need it opt in per
  * expression. The ENGINE was always unaffected — its semantics are
  * Java/ICU-consistent.
  *
  * Two structural lessons the prototypes hit, baked in here:
  *  - nesting the closed forms explodes (each avalanche step duplicates
  *    its input 2-3x; two chained hashes reached 24 MB of SQL) — fixed-
  *    width hashes are emitted as lateral-alias column CHAINS instead;
  *  - DuckDB inlines both lateral aliases and plain CTEs by
  *    substitution, so chained hash stages must cross `AS MATERIALIZED`
  *    boundaries to keep the bound expression tree small.
  */
object DuckOracleSql {

  private val M = "18446744073709551616::HUGEINT"
  private val P1 = "11400714785074694791::HUGEINT"
  private val P2 = "14029467366897019727::HUGEINT"
  private val P3 = "1609587929392839161::HUGEINT"
  private val P4 = "9650029242287828579::HUGEINT"
  private val P5 = "2870177450012600261::HUGEINT"

  private def add(a: String, b: String) = s"((($a) + ($b)) % $M)"

  /** (a*b) mod 2^64: a_lo*b < 2^96 and the hi-cross term < 2^64, both
    * safely inside HUGEINT. */
  private def mul(a: String, b: String) =
    s"(((($a) % 4294967296) * ($b) + (((($a) // 4294967296) * " +
      s"(($b) % 4294967296)) % 4294967296) * 4294967296) % $M)"

  private def rotl(x: String, r: Int) = {
    val lo = BigInt(2).pow(64 - r)
    val hi = BigInt(2).pow(r)
    s"(((($x) % $lo::HUGEINT) * $hi::HUGEINT) + (($x) // $lo::HUGEINT))"
  }

  private def shr(x: String, n: Int) =
    s"(($x) // ${BigInt(2).pow(n)}::HUGEINT)"

  private def xor(a: String, b: String) =
    s"xor(($a)::HUGEINT, ($b)::HUGEINT)"

  /** XXH64 round with acc=0: rotl31(c*P2)*P1. */
  private def round0(c: String) = mul(rotl(mul(c, P2), 31), P1)

  /** Unsigned [0,2^64) HUGEINT -> the signed BIGINT Spark columns hold. */
  def toSigned(col: String): String =
    s"CASE WHEN ($col) >= 9223372036854775808::HUGEINT THEN " +
      s"(($col) - $M)::BIGINT ELSE ($col)::BIGINT END"

  /** Spark XXH64.hashInt(value, seed) as a lateral-alias column chain.
    * `value` must already be the unsigned 32-bit reinterpretation.
    * Returns (select-list fragment, output column name); value and seed
    * are each referenced exactly once. */
  def xxh64IntAliases(value: String, seed: String,
                      pfx: String): (String, String) = {
    val steps = Seq(
      s"${pfx}a" -> add(add(seed, P5), "4::HUGEINT"),
      s"${pfx}b" -> xor(s"${pfx}a", mul(value, P1)),
      s"${pfx}c" -> add(mul(rotl(s"${pfx}b", 23), P2), P3),
      s"${pfx}d" -> xor(s"${pfx}c", shr(s"${pfx}c", 33)),
      s"${pfx}e" -> mul(s"${pfx}d", P2),
      s"${pfx}f" -> xor(s"${pfx}e", shr(s"${pfx}e", 29)),
      s"${pfx}g" -> mul(s"${pfx}f", P3),
      s"${pfx}h" -> xor(s"${pfx}g", shr(s"${pfx}g", 32)))
    (steps.map { case (n, e) => s"$e AS $n" }.mkString(", "), s"${pfx}h")
  }

  /** Spark XXH64.hashLong(value, seed) as a lateral-alias column chain:
    * acc = seed + P5 + 8; acc ^= rotl31(value*P2)*P1;
    * acc = rotl27(acc)*P1 + P4; then the standard avalanche — the
    * public spec's 8-byte-chunk + finalize path. `value` must already
    * be the unsigned 64-bit reinterpretation (HUGEINT in [0, 2^64)).
    * Returns (select-list fragment, output column name); value and
    * seed are each referenced exactly once. Validated against Spark's
    * own `xxhash64` over BIGINT inputs by tools/duck_xxh64_proto.py. */
  def xxh64LongAliases(value: String, seed: String,
                       pfx: String): (String, String) = {
    val steps = Seq(
      s"${pfx}a" -> round0(value),
      s"${pfx}b" -> xor(add(add(seed, P5), "8::HUGEINT"), s"${pfx}a"),
      s"${pfx}c" -> add(mul(rotl(s"${pfx}b", 27), P1), P4),
      s"${pfx}d" -> xor(s"${pfx}c", shr(s"${pfx}c", 33)),
      s"${pfx}e" -> mul(s"${pfx}d", P2),
      s"${pfx}f" -> xor(s"${pfx}e", shr(s"${pfx}e", 29)),
      s"${pfx}g" -> mul(s"${pfx}f", P3),
      s"${pfx}h" -> xor(s"${pfx}g", shr(s"${pfx}g", 32)))
    (steps.map { case (n, e) => s"$e AS $n" }.mkString(", "), s"${pfx}h")
  }

  /** Fixture-side guard for the lowercasing boundary documented above
    * (r12 verdict #6 — the boundary was measured and documented, but
    * nothing STOPPED a future mixed-case Turkish/Greek fixture from
    * walking into it): Java/Spark lowercases contextually (`İ` →
    * `i` + U+0307, word-final `Σ` → `ς`) while DuckDB's `lower()`
    * applies simple per-codepoint mappings — any text whose two
    * lowerings differ CANNOT be hash-replayed through the mirror's
    * `lower()`-tokenizing oracles. Fixture builders call this on every
    * literal pool they inject, so a boundary-crossing fixture refuses
    * LOUDLY at plan-build time (the same discipline as the mirror's
    * in-SQL `error()` codepoint-split guard) instead of surfacing as a
    * confusing downstream hash mismatch. Simple mapping here =
    * `Character.toLowerCase` per codepoint, which is exactly the
    * 1:1-mapping subset utf8proc (DuckDB) applies. */
  def assertLowerMirrorSafe(label: String, text: String): Unit = {
    val simple = {
      val sb = new java.lang.StringBuilder(text.length)
      text.codePoints().forEach { cp =>
        sb.appendCodePoint(Character.toLowerCase(cp)); ()
      }
      sb.toString
    }
    val contextual = text.toLowerCase(java.util.Locale.ROOT)
    require(contextual == simple,
      s"$label: text crosses the Java-vs-DuckDB lowercasing boundary " +
        s"""(contextual "$contextual" != simple "$simple" — e.g. """ +
        "Turkish İ or Greek word-final Σ). The XXH64 mirror's " +
        "lower()-tokenizing oracles cannot replay it: pre-lowercase " +
        "the fixture text, or port the oracle side to an " +
        "ICU-contextual lower (DuckOracleSql boundary note)")
  }

  /** CONTEXTUAL lowercase of a VARCHAR expression — the Java/ICU
    * `toLowerCase(Locale.ROOT)` semantics the engine's `lower()`
    * applies, mirrored in DuckDB SQL (closing the r12/r13 "mixed-case
    * Turkish/Greek corpora can't be hash-replayed" boundary):
    *
    *  - `İ` (U+0130) expands to `i` + U+0307 combining dot (DuckDB's
    *    simple lower() gives a bare `i`);
    *  - `Σ` follows the Unicode Final_Sigma rule — `ς` iff preceded by
    *    a cased letter (skipping case-ignorable characters) and NOT
    *    followed by one (same skip), else `σ`;
    *  - every other codepoint takes the simple 1:1 mapping, where the
    *    two engines agree.
    *
    * Per position the rule scans the codepoint list through
    * `list_filter(range(i), …)` — O(n²) worst case, fine at gate/
    * fixture scale (the per-codepoint `string_split` discipline is the
    * same one the XXH64 mirror validates). Class approximations:
    * cased ≈ `[\p{Lu}\p{Ll}\p{Lt}]`, case-ignorable ≈
    * `[\p{Mn}\p{Me}\p{Cf}\p{Lm}\p{Sk}'.·:]` — exact for letters,
    * combining marks and the MidLetter/MidNumLet punctuation a real
    * corpus puts next to a sigma; Other_Uppercase/Other_Lowercase
    * oddities (circled letters, modifier vowels) are outside the
    * mirror's contract. Validated against the engine's own `lower()`
    * by the p113 hash gate over a mixed-case fixture. */
  def contextualLowerSql(col: String): String =
    contextualLowerFromList(s"string_split($col, '')")

  /** [[contextualLowerSql]] over an ALREADY-SPLIT codepoint-list
    * column. At corpus scale the split must be computed once in an
    * `AS MATERIALIZED` CTE and this form applied to the list column —
    * the inlined form re-references the split ~8×, and DuckDB's
    * CTE/alias inlining re-evaluates it (the same blowup lesson the
    * XXH64 chains hit); measured: the inline form did not finish on
    * the 30× corpus, the materialized-list form runs in ~100 s. */
  def contextualLowerFromList(cp: String): String = {
    def cased(c: String) =
      s"regexp_matches($c, '^[\\p{Lu}\\p{Ll}\\p{Lt}]$$')"
    def ign(c: String) =
      s"regexp_matches($c, '^[\\p{Mn}\\p{Me}\\p{Cf}\\p{Lm}" +
        s"\\p{Sk}''.·:]$$')"
    val prev = s"list_filter(range(i), j -> NOT ${ign(s"$cp[j + 1]")})"
    val nxt = s"list_filter(range(i + 1, len($cp)), " +
      s"j -> NOT ${ign(s"$cp[j + 1]")})"
    val finalSigma =
      s"len($prev) > 0 AND ${cased(s"$cp[$prev[-1] + 1]")} AND NOT " +
        s"(len($nxt) > 0 AND ${cased(s"$cp[$nxt[1] + 1]")})"
    s"array_to_string(list_transform(range(len($cp)), i -> " +
      s"CASE WHEN $cp[i + 1] = 'İ' THEN 'i' || chr(775) " +
      s"WHEN $cp[i + 1] = 'Σ' THEN " +
      s"(CASE WHEN $finalSigma THEN 'ς' ELSE 'σ' END) " +
      s"ELSE lower($cp[i + 1]) END), '')"
  }

  /** UTF-8 byte list of a VARCHAR column (codepoint → byte arithmetic).
    * DuckDB v1.0.0's `string_split(s, '')` splits per CODEPOINT (an NFD
    * combining sequence, a ZWJ emoji family and a Devanagari conjunct
    * all come back one codepoint per element — validated against
    * Spark's own `xxhash64` in `tools/duck_xxh64_proto.py`), so the
    * expansion is correct for ALL of Unicode, multi-codepoint grapheme
    * clusters included. The `length(c) != 1` guard costs nothing under
    * that behavior and fails LOUDLY (DuckDB `error()`) if a future
    * DuckDB ever switches the empty-delimiter split to grapheme
    * clusters, instead of silently mis-hashing. */
  private def utf8Bytes(col: String) =
    s"flatten(list_transform(list_filter(string_split($col, ''), " +
      "c -> c <> ''), c -> " +
      "CASE WHEN length(c) != 1 THEN [CAST(error(" +
      "'xxh64 mirror: multi-codepoint split element; per-codepoint " +
      "string_split assumption violated') AS BIGINT)] " +
      "WHEN unicode(c) < 128 THEN [unicode(c)] " +
      "WHEN unicode(c) < 2048 THEN " +
      "[192 + unicode(c) // 64, 128 + unicode(c) % 64] " +
      "WHEN unicode(c) < 65536 THEN [224 + unicode(c) // 4096, " +
      "128 + (unicode(c) // 64) % 64, 128 + unicode(c) % 64] " +
      "ELSE [240 + unicode(c) // 262144, 128 + (unicode(c) // 4096) % 64, " +
      "128 + (unicode(c) // 64) % 64, 128 + unicode(c) % 64] END))"

  /** Little-endian 8-byte load from the 1-based list `bs` at offset
    * expression `off` (0-based byte position). */
  private def le64(bs: String, off: String) =
    "(" + (0 until 8).map { j =>
      s"($bs)[($off) + ${j + 1}]::HUGEINT * ${BigInt(256).pow(j)}::HUGEINT"
    }.mkString(" + ") + ")"

  private def le32(bs: String, off: String) =
    "(" + (0 until 4).map { j =>
      s"($bs)[($off) + ${j + 1}]::HUGEINT * ${BigInt(256).pow(j)}::HUGEINT"
    }.mkString(" + ") + ")"

  /** CTE chain computing the full XXH64 (seed 42, stripe loop included)
    * of VARCHAR column `col` of relation `src`; emits relation `out`
    * carrying all of src's columns plus `xh` (unsigned HUGEINT). Meant
    * for small relations (e.g. a distinct-token vocabulary). */
  def xxh64StrCtes(src: String, col: String, out: String): String = {
    val seed = "42::HUGEINT"
    val init = s"[${add(add(seed, P1), P2)}, ${add(seed, P2)}, $seed, " +
      s"(($seed) + ($M) - ($P1)) % $M]"
    val stripeLanes = (0 until 4)
      .map(l => le64("bs", s"32*(s-1) + ${8 * l}")).mkString(", ")
    val stripeStep = "[" + (0 until 4).map { i =>
      mul(rotl(add(s"acc[${i + 1}]", mul(s"st[${i + 1}]", P2)), 31), P1)
    }.mkString(", ") + "]"
    val h0 = s"CASE WHEN n >= 32 THEN (${rotl("vv[1]", 1)} + " +
      s"${rotl("vv[2]", 7)} + ${rotl("vv[3]", 12)} + " +
      s"${rotl("vv[4]", 18)}) % $M ELSE ${add(seed, P5)} END"
    val merges = (0 until 4).map { i =>
      val prev = if (i == 0) "h0" else s"hm$i"
      s", CASE WHEN n >= 32 THEN " +
        add(mul(xor(prev, round0(s"vv[${i + 1}]")), P1), P4) +
        s" ELSE $prev END AS hm${i + 1}"
    }.mkString
    val chunk8Step = add(mul(rotl(xor("acc", round0("c")), 27), P1), P4)
    val byteStep = mul(rotl(xor("acc", mul("b", P5)), 11), P1)
    s"""
__xb AS (SELECT *, ${utf8Bytes(col)} AS bs FROM $src),
__xc AS (SELECT *, len(bs) AS n, (len(bs) // 32) * 32 AS soff FROM __xb),
__xd AS (SELECT *,
  list_reduce(list_prepend($init,
    [[$stripeLanes] FOR s IN range(1, n // 32 + 1)]),
    (acc, st) -> $stripeStep) AS vv,
  soff + 8 * ((n - soff) // 8) AS off4 FROM __xc),
__xe AS (SELECT *, $h0 AS h0$merges,
  CASE WHEN n - off4 >= 4 THEN off4 + 4 ELSE off4 END AS off1 FROM __xd),
__xf AS (SELECT *,
  list_reduce(list_prepend((hm4 + n) % $M,
    [${le64("bs", "soff + 8*(j-1)")} FOR j IN range(1, (n - soff) // 8 + 1)]),
    (acc, c) -> $chunk8Step) AS h8 FROM __xe),
__xg AS (SELECT *, CASE WHEN n - off4 >= 4 THEN
    ${add(mul(rotl(xor("h8", mul(le32("bs", "off4"), P1)), 23), P2), P3)}
  ELSE h8 END AS h4 FROM __xf),
__xh AS (SELECT *, list_reduce(list_prepend(h4,
    [bs[j]::HUGEINT FOR j IN range(off1 + 1, n + 1)]),
    (acc, b) -> $byteStep) AS h1 FROM __xg),
$out AS (SELECT *, ${xor("h1", shr("h1", 33))} AS fx1,
  ${mul("fx1", P2)} AS fx2, ${xor("fx2", shr("fx2", 29))} AS fx3,
  ${mul("fx3", P3)} AS fx4, ${xor("fx4", shr("fx4", 32))} AS xh
  FROM __xh)"""
  }
}
