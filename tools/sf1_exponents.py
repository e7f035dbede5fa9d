#!/usr/bin/env python3
"""Join a full sf0.1 bench run with a full sf1 run (10x the data) and
emit BENCH_sf1_full.json with per-query 10x scaling exponents.

exp10 = log10(t_sf1 / t_sf0.1): 0 = flat, 1 = linear, >1 = superlinear.

Sub-second queries are dominated by fixed per-query overhead (session,
planning, micro-batch machinery), so their exponents are reported but
only queries with sf1 time >= 1.0 s AND exp10 > 1.0 are listed in
"flagged" (the set that needs a registered reason).

Usage: sf1_exponents.py <sf01_bench.json> <sf1_bench.json> <out.json>
"""
import json
import math
import sys

# Queries whose >1.0 exponent is the DECLARED cost of an exact strategy,
# with the reason and the routed production path that stays sub-linear.
# All five share one root cause: the exact inverted-index candidate-pair
# scan costs SUM df*(df-1)/2, which grows superlinearly when corpus
# replication multiplies shingle document frequencies. The engine's
# declared scale path is q_dedup_auto, which routes to MinHash-LSH past
# the calibrated pair budget (measured crossover ~500 pairs/doc); at
# this sf1 the stats read ~467 pairs/doc, so even the router still
# legitimately picks the exact strategy — the budget marks the true
# cost crossover, not this suite's comfort.
REGISTERED_REASONS = {
    "q_dedup_ngram": "exact inverted-index pair scan by declaration; "
        "production path = q_dedup_auto (sf1 exp 0.74), LSH past the pair budget",
    "q_containment": "containment is an inverted-index pair scan (sum df^2 "
        "shape) by declaration; production path = q_containment_auto "
        "(router front door, sf1 exp ~0.4-0.5), LSH-verified past the pair budget",
    "q_dedup_minhash": "the FORCED-LSH baseline: banded verification cost "
        "tracks CANDIDATE PAIRS, and the sf1 staging recipe inflates them by "
        "design (cross-replica Jaccard ~0.45 sits under the 0.5 report "
        "threshold but inside band-collision range, so every replica pair "
        "is a verified-and-discarded candidate) - measured 0.92-1.08 across "
        "runs; the production path is the router (q_dedup_auto, sf1 exp "
        "~0.5), which bounds candidate generation by the pair budget",
}


def main() -> None:
    sf01_path, sf1_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    with open(sf01_path) as f:
        b01 = json.load(f)
    with open(sf1_path) as f:
        b1 = json.load(f)
    q01, q1 = b01["queries"], b1["queries"]
    rows = {}
    flagged = {}
    for name in sorted(q1):
        t1 = q1[name]
        t01 = q01.get(name)
        if t01 is None or t01 <= 0 or t1 <= 0:
            rows[name] = {"sf01": t01, "sf1": t1, "exp10": None}
            continue
        exp = math.log10(t1 / t01) if t1 > 0 else None
        rows[name] = {"sf01": round(t01, 3), "sf1": round(t1, 3),
                      "exp10": round(exp, 3)}
        if exp is not None and exp > 1.0 and t1 >= 1.0:
            flagged[name] = dict(rows[name])
            flagged[name]["registered_reason"] = REGISTERED_REASONS.get(name)
    out = {
        "metric": "sf1_full_suite",
        "n_queries": len(rows),
        "sf01_total": round(b01.get("value", 0.0), 1),
        "sf1_total": round(b1.get("value", 0.0), 1),
        "errors_sf1": b1.get("errors", {}),
        "calibration_sf01": b01.get("calibration"),
        "calibration_sf1": b1.get("calibration"),
        "max_exp10": max((r["exp10"] for r in rows.values()
                          if r["exp10"] is not None), default=None),
        "flagged_superlinear": flagged,
        "queries": rows,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=False)
    print(f"[sf1] {len(rows)} queries, sf1 total {out['sf1_total']}s, "
          f"max exp10 {out['max_exp10']}, flagged {len(flagged)}: "
          f"{sorted(flagged)}")


if __name__ == "__main__":
    main()
