#!/bin/bash
# Isolated-JVM bench protocol (VERDICT r8 "Next round" #6): run each
# bench query in its OWN fresh JVM via SPARK_GRAFT_BENCH_ONLY, so
# suite-position effects (earlier queries' cached/spilled blocks
# crowding the shared heap — the round-5 decontaminate and round-8
# varlength-at-sf10 findings) are measured out by default instead of by
# ad-hoc investigation. In-suite numbers stay the headline (they match
# how the driver runs Bench); this is the cross-check that tells a
# suite-position artifact from a real regression.
#
# Usage: SPARK_GRAFT_SF_DIR=... tools/bench_isolated.sh [out.json] [q1 q2 ...]
# Defaults: out=target/bench_isolated.json, all 25 queries.
set -u
cd "$(dirname "$0")/.." || exit 1
OUT="${1:-target/bench_isolated.json}"
shift 2>/dev/null || true
QUERIES=("$@")
if [ ${#QUERIES[@]} -eq 0 ]; then
  QUERIES=(full_scan filtered_query simple_join complex_join friend_join
    agg_pricing window_agg dedup_exact text_quality minhash_lsh
    node_insert ann_topk asof_join range_join decontaminate
    pack_sequences quantize_int8 simhash_pairs cosine_lsh tfidf
    dup_clusters varlength_paths ann_ivf_probe pagerank temporal_asof)
fi
: "${SPARK_GRAFT_SF_DIR:=/root/testdata/sf0.1}"
export SPARK_GRAFT_SF_DIR
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
for q in "${QUERIES[@]}"; do
  echo "[bench-isolated] $q" >&2
  SPARK_GRAFT_BENCH_ONLY="$q" tools/run.sh graft.Bench \
    >"$TMP/$q.json" 2>"$TMP/$q.err" || {
      echo "[bench-isolated] $q FAILED:" >&2; tail -3 "$TMP/$q.err" >&2; }
done
python3 - "$OUT" "$TMP" "${QUERIES[@]}" <<'PY'
import json, sys
out, tmp, queries = sys.argv[1], sys.argv[2], sys.argv[3:]
med, mn, calib = {}, {}, []
for q in queries:
    try:
        # the metric line is the only stdout line starting with '{'
        line = next(l for l in open(f"{tmp}/{q}.json")
                    if l.startswith('{"metric"'))
        d = json.loads(line)
        med[q] = d["queries"][q]
        mn[q] = d["queries_min"][q]
        calib.append(d["calib_spark"])
    except (StopIteration, FileNotFoundError, KeyError) as e:
        med[q] = mn[q] = -1.0
total = sum(v for v in med.values() if v >= 0)
doc = {"metric": "total", "value": round(total, 3), "unit": "sec",
       "protocol": "isolated-jvm (one fresh JVM per query)",
       "queries": med, "queries_min": mn,
       "calib_spark_range": [min(calib), max(calib)] if calib else None,
       "sf": __import__("os").environ.get("SPARK_GRAFT_SF_DIR")}
json.dump(doc, open(out, "w"), indent=1)
print(json.dumps(doc))
PY
