#!/usr/bin/env python3
"""Merge two Bench runs (same query set, different SF dirs) into
SCALECURVE.json — the empirical scaling-curve artifact (round 15).

Usage: tools/scalecurve.py <bench_sf0.1.json> <bench_sf1.json> <data_factor> [out]

Each input is a Bench full-map artifact ({"queries": {name: secs}, ...},
per-query MIN across interleaved passes). Output: per-query wall-time
growth ratio at `data_factor`x data, plus a classification against the
pass bar (near-linear: ratio <= 1.2 * data_factor for shuffle-bound
shapes — the VERDICT r14 #2 criterion). Queries exceeding the bar are
listed for a plan read; the artifact stores the numbers either way.
"""
import json
import sys


def main():
    small_path, big_path = sys.argv[1], sys.argv[2]
    factor = float(sys.argv[3])
    out_path = sys.argv[4] if len(sys.argv) > 4 else "SCALECURVE.json"
    small = json.load(open(small_path))
    big = json.load(open(big_path))
    sq, bq = small["queries"], big["queries"]
    shared = sorted(set(sq) & set(bq))
    bar = 1.2 * factor
    rows = {}
    for n in shared:
        # floor tiny denominators: a 0.2s query's ratio is mostly fixed
        # per-query overhead (plan/codegen/jobs), not data work
        ratio = bq[n] / max(sq[n], 0.05)
        rows[n] = {
            "small_s": round(sq[n], 3),
            "big_s": round(bq[n], 3),
            "ratio": round(ratio, 2),
            "superlinear": ratio > bar,
        }
    n_super = sum(1 for r in rows.values() if r["superlinear"])
    ratios = sorted(r["ratio"] for r in rows.values())

    def pct(p):
        return ratios[min(len(ratios) - 1, round(p * (len(ratios) - 1)))]

    artifact = {
        "metric": "walltime_growth_ratio",
        "data_factor": factor,
        "pass_bar": bar,
        "n_queries": len(rows),
        "n_superlinear": n_super,
        "median_ratio": pct(0.5),
        "p90_ratio": pct(0.9),
        "small_sf": small.get("sf"),
        "big_sf": big.get("sf"),
        "small_errors": small.get("errors", {}),
        "big_errors": big.get("errors", {}),
        "queries": rows,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"== {len(rows)} queries, median ratio {pct(0.5)}x, "
          f"p90 {pct(0.9)}x at {factor}x data; "
          f"{n_super} over the {bar:.1f}x bar ==")
    for n, r in sorted(rows.items(), key=lambda kv: -kv[1]["ratio"]):
        flag = " <-- SUPERLINEAR" if r["superlinear"] else ""
        print(f"{n}: {r['small_s']}s -> {r['big_s']}s "
              f"({r['ratio']}x){flag}")


if __name__ == "__main__":
    main()
