#!/usr/bin/env python3
"""Prototype: generate DuckDB SQL that computes Spark's xxhash64 —
validated against tools/xxh64.py (itself validated against Spark).
The final SQL generators live in SparkEntry.scala; this file is the
development twin that proves the formulation on randomized inputs.

Everything runs in HUGEINT over the unsigned [0, 2^64) domain:
  - mul/add are mod-2^64 arithmetic (HUGEINT never overflows here)
  - rotations/shifts are pure arithmetic (divide/multiply by 2^k)
  - xor is DuckDB's native xor(HUGEINT, HUGEINT)
"""
M = "18446744073709551616::HUGEINT"
P1 = "11400714785074694791::HUGEINT"
P2 = "14029467366897019727::HUGEINT"
P3 = "1609587929392839161::HUGEINT"
P4 = "9650029242287828579::HUGEINT"
P5 = "2870177450012600261::HUGEINT"


def add(a, b):
    return f"((({a}) + ({b})) % {M})"


def mul(a, b):
    # (a*b) mod 2^64 without overflowing HUGEINT:
    # a_lo*b < 2^96, (a_hi*(b mod 2^32) mod 2^32)*2^32 < 2^64
    return (f"(((({a}) % 4294967296) * ({b}) + "
            f"(((({a}) // 4294967296) * (({b}) % 4294967296)) % 4294967296)"
            f" * 4294967296) % {M})")


def rotl(x, r):
    lo = 2 ** (64 - r)
    hi = 2 ** r
    return (f"(((({x}) % {lo}::HUGEINT) * {hi}::HUGEINT) + "
            f"(({x}) // {lo}::HUGEINT))")


def shr(x, n):
    return f"(({x}) // {2 ** n}::HUGEINT)"


def xor(a, b):
    return f"xor(({a})::HUGEINT, ({b})::HUGEINT)"


def round0(c):
    """XXH64 round with acc=0: rotl31(c*P2)*P1."""
    return mul(rotl(mul(c, P2), 31), P1)


def fmix_aliases(h, pfx):
    """Avalanche as lateral-alias select-list steps; returns (cols, out)."""
    steps = [
        (f"{pfx}1", xor(h, shr(h, 33))),
        (f"{pfx}2", mul(f"{pfx}1", P2)),
        (f"{pfx}3", xor(f"{pfx}2", shr(f"{pfx}2", 29))),
        (f"{pfx}4", mul(f"{pfx}3", P3)),
        (f"{pfx}5", xor(f"{pfx}4", shr(f"{pfx}4", 32))),
    ]
    cols = ", ".join(f"{e} AS {n}" for n, e in steps)
    return cols, f"{pfx}5"


def xxh64_int_aliases(value, seed, pfx):
    """Spark XXH64.hashInt(value, seed) as a lateral-alias column chain
    (linear SQL size — the closed form explodes when nested: each fmix
    step duplicates its input ~2-3x, compounding to MBs two levels deep).
    Returns (select_cols, out_col); value/seed referenced once each."""
    steps = [
        (f"{pfx}a", add(add(seed, P5), "4::HUGEINT")),
        (f"{pfx}b", xor(f"{pfx}a", mul(value, P1))),
        (f"{pfx}c", add(mul(rotl(f"{pfx}b", 23), P2), P3)),
        (f"{pfx}d", xor(f"{pfx}c", shr(f"{pfx}c", 33))),
        (f"{pfx}e", mul(f"{pfx}d", P2)),
        (f"{pfx}f", xor(f"{pfx}e", shr(f"{pfx}e", 29))),
        (f"{pfx}g", mul(f"{pfx}f", P3)),
        (f"{pfx}h", xor(f"{pfx}g", shr(f"{pfx}g", 32))),
    ]
    cols = ", ".join(f"{e} AS {n}" for n, e in steps)
    return cols, f"{pfx}h"


def xxh64_int(value, seed):
    """Closed-form Spark XXH64.hashInt(value, seed) — value must already
    be the unsigned 32-bit reinterpretation (0..2^32). NOTE: only safe
    when value/seed are short expressions (size compounds ~70x)."""
    h = add(add(seed, P5), "4::HUGEINT")
    h = xor(h, mul(value, P1))
    h = add(mul(rotl(h, 23), P2), P3)
    f1 = xor(h, shr(h, 33))
    f2 = mul(f1, P2)
    f3 = xor(f2, shr(f2, 29))
    f4 = mul(f3, P3)
    return xor(f4, shr(f4, 32))


def xxh64_long(value, seed):
    """Closed-form Spark XXH64.hashLong(value, seed) — value unsigned."""
    h = add(add(seed, P5), "8::HUGEINT")
    h = xor(h, round0(value))
    h = add(mul(rotl(h, 27), P1), P4)
    f1 = xor(h, shr(h, 33))
    f2 = mul(f1, P2)
    f3 = xor(f2, shr(f2, 29))
    f4 = mul(f3, P3)
    return xor(f4, shr(f4, 32))


def utf8_bytes(col):
    """UTF-8 byte list of a VARCHAR (codepoint -> bytes arithmetic).
    DuckDB v1.0.0's string_split(s, '') splits per CODEPOINT (validated
    below on NFD / ZWJ / conjunct canaries), so the expansion is correct
    for all of Unicode, multi-codepoint grapheme clusters included; the
    length(c) != 1 guard errors loudly if a future DuckDB switches the
    empty-delimiter split to grapheme clusters."""
    return (
        "flatten(list_transform(list_filter(string_split(" + col +
        ", ''), c -> c <> ''), c -> "
        "CASE WHEN length(c) != 1 THEN [CAST(error("
        "'xxh64 mirror: multi-codepoint split element; per-codepoint "
        "string_split assumption violated') AS BIGINT)] "
        "WHEN unicode(c) < 128 THEN [unicode(c)] "
        "WHEN unicode(c) < 2048 THEN "
        "[192 + unicode(c) // 64, 128 + unicode(c) % 64] "
        "WHEN unicode(c) < 65536 THEN [224 + unicode(c) // 4096, "
        "128 + (unicode(c) // 64) % 64, 128 + unicode(c) % 64] "
        "ELSE [240 + unicode(c) // 262144, 128 + (unicode(c) // 4096) % 64, "
        "128 + (unicode(c) // 64) % 64, 128 + unicode(c) % 64] END))")


def le64(bs, off):
    """Little-endian 8-byte load from 1-based list `bs` at offset expr."""
    terms = " + ".join(
        f"({bs})[({off}) + {j + 1}]::HUGEINT * {256 ** j}::HUGEINT"
        for j in range(8))
    return f"({terms})"


def le32(bs, off):
    terms = " + ".join(
        f"({bs})[({off}) + {j + 1}]::HUGEINT * {256 ** j}::HUGEINT"
        for j in range(4))
    return f"({terms})"


def xxh64_str_ctes(src, col, out="xh"):
    """CTE chain hashing VARCHAR column `col` of relation `src` with
    seed 42; emits relation `out` with all of src's columns plus `xh`
    (unsigned HUGEINT). Full XXH64: stripe loop included."""
    seed = "42::HUGEINT"
    init = (f"[{add(add(seed, P1), P2)}, {add(seed, P2)}, {seed}, "
            f"(({seed}) + ({M}) - ({P1})) % {M}]")
    stripe_lanes = ", ".join(
        le64("bs", f"32*(s-1) + {8 * l}") for l in range(4))
    racc = lambda i: f"acc[{i + 1}]"
    stripe_step = "[" + ", ".join(
        mul(rotl(add(racc(i), mul(f"st[{i + 1}]", P2)), 31), P1)
        for i in range(4)) + "]"
    h0 = (f"CASE WHEN n >= 32 THEN ({rotl('vv[1]', 1)} + {rotl('vv[2]', 7)}"
          f" + {rotl('vv[3]', 12)} + {rotl('vv[4]', 18)}) % {M} "
          f"ELSE {add(seed, P5)} END")
    merges = ""
    prev = "h0"
    for i in range(4):
        cur = f"hm{i + 1}"
        merges += (f", CASE WHEN n >= 32 THEN "
                   f"{add(mul(xor(prev, round0(f'vv[{i + 1}]')), P1), P4)} "
                   f"ELSE {prev} END AS {cur}")
        prev = cur
    chunk8_step = add(mul(rotl(xor("acc", round0("c")), 27), P1), P4)
    byte_step = mul(rotl(xor("acc", mul("b", P5)), 11), P1)
    av_cols, av_out = fmix_aliases("h1", "av")
    return f"""
__xb AS (SELECT *, {utf8_bytes(col)} AS bs FROM {src}),
__xc AS (SELECT *, len(bs) AS n, (len(bs) // 32) * 32 AS soff FROM __xb),
__xd AS (SELECT *,
  list_reduce(list_prepend({init},
    [[{stripe_lanes}] FOR s IN range(1, n // 32 + 1)]),
    (acc, st) -> {stripe_step}) AS vv,
  soff + 8 * ((n - soff) // 8) AS off4 FROM __xc),
__xe AS (SELECT *, {h0} AS h0{merges},
  CASE WHEN n - off4 >= 4 THEN off4 + 4 ELSE off4 END AS off1 FROM __xd),
__xf AS (SELECT *,
  list_reduce(list_prepend((hm4 + n) % {M},
    [{le64('bs', 'soff + 8*(j-1)')} FOR j IN range(1, (n - soff) // 8 + 1)]),
    (acc, c) -> {chunk8_step}) AS h8 FROM __xe),
__xg AS (SELECT *, CASE WHEN n - off4 >= 4 THEN
    {add(mul(rotl(xor('h8', mul(le32('bs', 'off4'), P1)), 23), P2), P3)}
  ELSE h8 END AS h4 FROM __xf),
__xh AS (SELECT *, list_reduce(list_prepend(h4,
    [bs[j]::HUGEINT FOR j IN range(off1 + 1, n + 1)]),
    (acc, b) -> {byte_step}) AS h1 FROM __xg),
{out} AS (SELECT *, {av_cols}, av5 AS xh FROM __xh)"""


def to_signed(col):
    return (f"CASE WHEN ({col}) >= 9223372036854775808::HUGEINT THEN "
            f"(({col}) - {M})::BIGINT ELSE ({col})::BIGINT END")


if __name__ == "__main__":
    import random
    import string
    import sys
    sys.path.insert(0, "tools")
    import duckdb
    from xxh64 import xxh64, xxh64_int as pi, xxh64_long as pl

    con = duckdb.connect()
    rng = random.Random(7)
    # string path: lengths 0..100, ascii + some multibyte
    words = ["".join(rng.choices(string.ascii_lowercase + "0123456789",
                                 k=rng.randint(0, 100))) for _ in range(300)]
    words += ["héllo", "naïve", "日本語テスト", "emoji🚀mix", "αβγδε" * 9, ""]
    # multi-codepoint grapheme-cluster canaries: NFD e+U+0301, a ZWJ
    # emoji family, a Devanagari conjunct, halfwidth-kana + voicing mark
    # — under per-codepoint splitting these hash correctly; under
    # grapheme-cluster splitting the utf8_bytes guard errors loudly
    words += ["é", "café late", "\U0001F468‍\U0001F469‍\U0001F467",
              "क्ष", "áb̂c̃", "ｱﾞ"]
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ",".join(f"('{w}')" for w in words) + ") v(tok)")
    sql = ("WITH" + xxh64_str_ctes("t", "tok") +
           " SELECT tok, xh FROM xh")
    bad = 0
    for tok, xh in con.sql(sql).fetchall():
        exp = xxh64(tok.encode("utf-8"))
        if int(xh) != exp:
            bad += 1
            print("STR MISMATCH", repr(tok), int(xh), exp)
    print(f"string path: {len(words)} cases, {bad} mismatches")

    # int path (unsigned reinterpretation of signed int32)
    cases = [(rng.randint(-2**31, 2**31 - 1), rng.randint(0, 2**64 - 1))
             for _ in range(200)]
    expr = xxh64_int("u::HUGEINT", "s::HUGEINT")
    con.execute("CREATE TABLE ti (u HUGEINT, s HUGEINT)")
    con.executemany("INSERT INTO ti VALUES (?, ?)",
                    [(v & 0xFFFFFFFF, s) for v, s in cases])
    got = con.sql(f"SELECT {expr} FROM ti").fetchall()
    bad = sum(1 for (g,), (v, s) in zip(got, cases) if int(g) != pi(v, s))
    print(f"int path: {len(cases)} cases, {bad} mismatches")

    # long path
    cases = [(rng.randint(-2**63, 2**63 - 1), rng.randint(0, 2**64 - 1))
             for _ in range(200)]
    con.execute("CREATE TABLE tl (u HUGEINT, s HUGEINT)")
    con.executemany("INSERT INTO tl VALUES (?, ?)",
                    [(v & (2**64 - 1), s) for v, s in cases])
    expr = xxh64_long("u::HUGEINT", "s::HUGEINT")
    got = con.sql(f"SELECT {expr} FROM tl").fetchall()
    bad = sum(1 for (g,), (v, s) in zip(got, cases) if int(g) != pl(v, s))
    print(f"long path: {len(cases)} cases, {bad} mismatches")

    # guard path: a forced multi-codepoint element must error loudly
    # (this is the assertion that a DuckDB behavior change to
    # grapheme-cluster splitting cannot silently mis-hash)
    try:
        con.sql("SELECT list_transform(['xy'], c -> CASE WHEN "
                "length(c) != 1 THEN [CAST(error('guard') AS BIGINT)] "
                "ELSE [1::BIGINT] END)").fetchall()
        print("guard path: FAILED — error() did not fire")
    except Exception:
        print("guard path: error() fires on multi-codepoint elements")
