#!/bin/bash
# Standalone re-baseline (round-8, verdict item 3): each query runs in its
# OWN JVM (fresh session, own warmup, 3-iteration median) so the per-query
# history stops eroding as the co-resident registry grows — the r6/r7
# "regressions" on unchanged queries (a8 +44%, t1 +38%) were GC/cache
# pressure from 200+ co-resident queries' blocks, not plan changes.
# Usage: tools/standalone_bench.sh <sfDir> <outJson> q1 q2 ...
set -u
SF="$1"; OUT="$2"; shift 2
TMP=$(mktemp -d)
for q in "$@"; do
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_ONLY="$q" \
    SPARK_GRAFT_BENCH_ITERS=3 SPARK_GRAFT_BENCH_OUT="$TMP/$q.json" \
    sbt -batch "runMain graft.Bench" > "$TMP/$q.log" 2>&1
  echo "[standalone] $q: $(head -c 200 "$TMP/$q.json" 2>/dev/null)"
done
python3 - "$SF" "$OUT" "$TMP" "$@" <<'EOF'
import json, sys
sf, out, tmp = sys.argv[1:4]
queries = sys.argv[4:]
std, builds = {}, {}
for q in queries:
    try:
        d = json.loads(open(f"{tmp}/{q}.json").readline())
        std[q] = d["queries"][q]
        for k, v in d.get("builds", {}).items():
            builds.setdefault(k, v)
    except Exception as e:
        std[q] = -1.0
json.dump({"metric": "standalone", "unit": "sec", "iters": 3,
           "stat": "median", "note": "one JVM per query, own warmup",
           "sf": sf, "builds": builds, "queries": std},
          open(out, "w"), indent=None, separators=(",", ":"))
print("wrote", out)
EOF
