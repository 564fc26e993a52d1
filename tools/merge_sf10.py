#!/usr/bin/env python3
"""Merge the back-to-back sf1/sf10 spot-bench runs into BENCH_sf10.json:
per-query medians at both scales plus the sf1->sf10 growth ratio (10x
data), raw samples, and disclosed base-build seconds. Protocol
(PLANS.md): same harness (graft.Bench), SPARK_GRAFT_BENCH_ONLY spot
list, 3 iterations, medians, back-to-back on a quiet machine.

Usage: merge_sf10.py <sf1.json> <sf10.json> <out.json>
"""
import json
import sys


def main() -> None:
    sf1_path, sf10_path, out = sys.argv[1:4]
    with open(sf1_path) as f:
        sf1 = json.loads(f.readline())
        sf1_samples = json.loads(f.readline())
    with open(sf10_path) as f:
        sf10 = json.loads(f.readline())
        sf10_samples = json.loads(f.readline())
    queries = {}
    for q in sorted(sf1["queries"]):
        a, b = sf1["queries"][q], sf10["queries"].get(q)
        ratio = round(b / a, 2) if a and b and a > 0 and b > 0 else None
        queries[q] = {"sf1_sec": a, "sf10_sec": b, "ratio": ratio}
    doc = {
        "metric": "sf1_to_sf10_growth",
        "data_ratio": 10,
        "iters": sf1["iters"],
        "stat": "median",
        "sf1_dir": sf1["sf"],
        "sf10_dir": sf10["sf"],
        "sf1_failures": sf1.get("failures", []),
        "sf10_failures": sf10.get("failures", []),
        "builds_sf1": sf1.get("builds", {}),
        "builds_sf10": sf10.get("builds", {}),
        "queries": queries,
        "samples_sf1": sf1_samples.get("samples", {}),
        "samples_sf10": sf10_samples.get("samples", {}),
    }
    with open(out, "w") as f:
        json.dump(doc, f, separators=(",", ":"))
    print(f"{'query':34s} {'sf1':>8s} {'sf10':>9s} {'ratio':>6s}")
    for q, r in queries.items():
        # a query missing/failed at either tier has sec=None — print FAIL
        # in that column too, never feed None to a float format
        sf1_s = f"{r['sf1_sec']:8.2f}" if r.get("sf1_sec") is not None else f"{'FAIL':>8s}"
        sf10_s = f"{r['sf10_sec']:9.2f}" if r.get("sf10_sec") is not None else f"{'FAIL':>9s}"
        ratio = f"{r['ratio']:5.1f}x" if r.get("ratio") else "  FAIL"
        print(f"{q:34s} {sf1_s} {sf10_s} {ratio}")


if __name__ == "__main__":
    main()
