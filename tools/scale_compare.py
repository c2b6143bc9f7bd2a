#!/usr/bin/env python3
"""Cross-SF scaling audit: per-query ratio between two bench artifacts
(e.g. sf1 vs sf0.1 = a 10x data jump) classified against the data factor.

A query is `superlinear` when its time grew by more than SLACK x the data
factor — the scale-claim red flag the r8 verdict asked the sf1 checkpoint
to surface ("any query whose ratio-vs-sf0.1 grows super-linearly gets a
plan note"). `sublinear` (< 1x the factor... i.e. grew less than the data)
is the good column: fixed-cost-dominated or pruned plans.

Times at the small SF are mostly fixed cost (job launch, codegen, driver
rounds): a 0.1 s query that becomes 0.4 s at 10x data is NOT superlinear
work, it's amortization. So queries under MIN_BASE seconds at the base SF
are reported separately (`fixed_cost_regime`) instead of being graded.

Usage: python3 tools/scale_compare.py <base_bench.json> <big_bench.json> <data_factor> [out.json]

`out.json` defaults to SCALE_AUDIT.json (the sf0.1→sf1 decade); the sf10
checkpoint writes SCALE_AUDIT_sf10.json so the two decades coexist.
Hand-authored plan_notes are carried forward from the OUTPUT artifact
(each decade keeps its own notes).
"""
import json
import statistics
import sys

SLACK = 1.6        # growth beyond factor*SLACK = superlinear
MIN_BASE = 0.35    # below this, base time is fixed-cost-dominated


def main(argv):
    base_path, big_path, factor = argv[0], argv[1], float(argv[2])
    out_path = argv[3] if len(argv) > 3 else "SCALE_AUDIT.json"
    base = json.load(open(base_path))["queries"]
    big = json.load(open(big_path))["queries"]
    shared = sorted(set(base) & set(big))
    rows = []
    for q in shared:
        b, g = float(base[q]), float(big[q])
        rows.append((q, b, g, g / b if b > 0 else float("inf")))
    graded = [r for r in rows if r[1] >= MIN_BASE]
    fixed = [r for r in rows if r[1] < MIN_BASE]
    superlin = [r for r in graded if r[3] > factor * SLACK]
    sublin = [r for r in graded if r[3] <= factor]
    ratios = [r[3] for r in rows]
    print(f"queries: {len(shared)} shared, {len(graded)} graded "
          f"(base >= {MIN_BASE}s), {len(fixed)} fixed-cost-regime")
    print(f"growth median {statistics.median(ratios):.2f}x vs data factor {factor}x")
    print(f"\nsuperlinear (> {factor * SLACK:.0f}x): {len(superlin)}")
    for q, b, g, r in sorted(superlin, key=lambda r: -r[3]):
        print(f"  {q:32s} {b:7.2f}s -> {g:8.2f}s  {r:6.1f}x")
    print(f"\nworst 15 graded by growth:")
    for q, b, g, r in sorted(graded, key=lambda r: -r[3])[:15]:
        print(f"  {q:32s} {b:7.2f}s -> {g:8.2f}s  {r:6.1f}x")
    print(f"\nfixed-cost-regime queries that still grew > {factor * SLACK:.0f}x "
          f"AND exceed 2s at the big SF (worth a look, not graded):")
    for q, b, g, r in sorted(fixed, key=lambda r: -r[2]):
        if r > factor * SLACK and g > 2.0:
            print(f"  {q:32s} {b:7.2f}s -> {g:8.2f}s  {r:6.1f}x")
    out = {
        "base": base_path, "big": big_path, "factor": factor,
        "growth_median": round(statistics.median(ratios), 3),
        "superlinear": {q: {"base_sec": round(b, 3), "big_sec": round(g, 3),
                            "growth": round(r, 2)} for q, b, g, r in superlin},
    }
    # The committed artifact carries hand-authored plan notes (the process
    # requires one per superlinear query). Carry them forward across
    # regeneration instead of silently dropping them; warn on any
    # superlinear query that still lacks a note.
    try:
        prior_notes = json.load(open(out_path)).get("plan_notes", {})
    except (FileNotFoundError, json.JSONDecodeError):
        prior_notes = {}
    out["plan_notes"] = prior_notes
    missing = sorted(set(out["superlinear"]) - set(prior_notes))
    if missing:
        print(f"\nWARNING: superlinear queries missing a plan note "
              f"(add to {out_path} plan_notes): {missing}")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
