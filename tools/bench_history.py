#!/usr/bin/env python3
"""Cross-round bench-variance trending.

Appends one round's full bench artifact (BENCH_FULL.json — per-query
min-of-reps and cv) into BENCH_HISTORY.json and classifies per-query
drift vs the previous recorded round, so "the whole run is uniformly
1.3x slower = shared-box noise" is machine-checkable instead of
judge-inferred.

Classifier: for every query present in both rounds, ratio = cur_min /
prev_min. The MEDIAN ratio is the round's shared drift (the box). A
query is flagged `query_drift` only when its ratio departs from that
shared factor by more than DEPART (default 1.5x) in either direction —
i.e. it moved relative to its peers, not with them. Everything else
that moved >2x but tracked the median is `shared_drift` (box noise by
construction). Queries absent from the previous round are `new`.

Usage:
  python3 tools/bench_history.py <round-label> [bench_full_path]
  python3 tools/bench_history.py r07            # default BENCH_FULL.json
  python3 tools/bench_history.py --seed-tail r05 BENCH_r05.json
     (recover what a truncated BENCH_r{N}.json tail still holds —
      per-query mins only, no cv; used once to backfill history)

Re-running with the same label replaces that round's entry (idempotent).

Label convention (r9): ONE entry per round, labeled `rNN` exactly so the
round-health fold-in finds CORRECTNESS_rNN.json. Mid-round dev sweeps are
not appended (or are appended under the final label and overwritten); the
canonical append happens at round CLOSE, after the correctness artifact
exists, so every recorded round carries its health counts.
"""
import json
import re
import statistics
import sys

HISTORY = "BENCH_HISTORY.json"
DEPART = 1.5


def load_history():
    try:
        with open(HISTORY) as f:
            return json.load(f)
    except FileNotFoundError:
        return {"rounds": []}


def classify(prev, cur):
    shared = sorted(set(prev) & set(cur))
    if not shared:
        return {"shared_ratio_median": None, "query_drift": {},
                "shared_drift": {}, "new": sorted(set(cur) - set(prev))}
    ratios = {q: cur[q]["min"] / prev[q]["min"] for q in shared
              if prev[q]["min"] > 0}
    med = statistics.median(ratios.values())
    qdrift = {q: round(r, 3) for q, r in ratios.items()
              if r / med > DEPART or med / r > DEPART}
    sdrift = {q: round(r, 3) for q, r in ratios.items()
              if q not in qdrift and (r > 2.0 or r < 0.5)}
    return {
        "shared_ratio_median": round(med, 3),
        # moved RELATIVE to peers -> the operator (or its data) changed
        "query_drift": dict(sorted(qdrift.items())),
        # moved >2x but WITH the pack -> the box, not the code
        "shared_drift": dict(sorted(sdrift.items())),
        "new": sorted(set(cur) - set(prev)),
    }


def entry_from_full(label, path):
    with open(path) as f:
        d = json.load(f)
    qs = {q: {"min": v, "cv": float(d.get("cv", {}).get(q, 0.0))}
          for q, v in d["queries"].items()}
    return {"round": label, "source": path, "total": d.get("value"),
            "rc": d.get("rc"),
            "errors": sorted(d.get("errors", {})),
            "storage_mem_high_water_bytes":
                d.get("storage_mem_high_water_bytes"),
            "storage_budget_bytes": d.get("storage_budget_bytes"),
            "storage_over_budget": d.get("storage_over_budget"),
            "queries": qs}


def correctness_counts(path, catalog_names):
    """Summarize a CORRECTNESS_r0N.json into per-round health counts.

    green      = oracle hash match
    rows_only  = no SQL oracle (rows>0 + named-spec coverage instead)
    fail       = present but mismatched, or an explicit error entry
    absent     = in the bench catalog but with NO correctness row at all —
                 the r7 failure mode (a query whose dump failed left no
                 row, so 18 breakages hid as a silent 111->108 drop)
    """
    with open(path) as f:
        d = json.load(f)
    green = sum(1 for v in d.values() if v.get("hash_match") is True)
    rows_only = sum(1 for v in d.values() if v.get("err") == "no_oracle")
    fail = sorted(q for q, v in d.items()
                  if (v.get("err") not in (None, "no_oracle"))
                  or (v.get("err") is None and not v.get("hash_match")))
    out = {"rows": len(d), "oracle_green": green,
           "rows_only": rows_only, "fail": fail}
    if catalog_names:
        absent = sorted(set(catalog_names) - set(d))
        out["absent_from_catalog"] = absent
    return out


def entry_from_tail(label, path):
    with open(path) as f:
        d = json.load(f)
    qs = {q: {"min": float(v), "cv": None}
          for q, v in re.findall(r'"(q\d+_\w+)":([0-9.]+)', d["tail"])}
    return {"round": label, "source": path + " (truncated tail)",
            "total": None, "queries": qs}


def main(argv):
    seed_tail = "--seed-tail" in argv
    argv = [a for a in argv if a != "--seed-tail"]
    if not argv:
        print(__doc__)
        return 2
    label = argv[0]
    path = argv[1] if len(argv) > 1 else "BENCH_FULL.json"
    entry = (entry_from_tail if seed_tail else entry_from_full)(label, path)
    # round-health line: fold the same round's correctness artifact in, so
    # a coverage regression (fewer rows than the catalog) is a one-line
    # diff in BENCH_HISTORY instead of a judge excavation
    corr_path = f"CORRECTNESS_{label}.json"
    catalog = sorted(set(entry["queries"]) | set(entry.get("errors", [])))
    try:
        entry["correctness"] = correctness_counts(corr_path, catalog)
    except FileNotFoundError:
        pass
    hist = load_history()
    hist["rounds"] = [r for r in hist["rounds"] if r["round"] != label]
    prevs = [r for r in hist["rounds"] if r["round"] < label]
    if prevs:
        prev = max(prevs, key=lambda r: r["round"])
        entry["drift_vs"] = prev["round"]
        entry["drift"] = classify(prev["queries"], entry["queries"])
    hist["rounds"].append(entry)
    hist["rounds"].sort(key=lambda r: r["round"])
    with open(HISTORY, "w") as f:
        json.dump(hist, f, indent=1)
    c = entry.get("correctness")
    if c:
        print(f"{label} correctness: {c['oracle_green']} green, "
              f"{c['rows_only']} rows-only, {len(c['fail'])} fail, "
              f"{len(c.get('absent_from_catalog', []))} absent "
              f"(catalog {len(catalog)})")
    d = entry.get("drift")
    if d:
        print(f"{label} vs {entry['drift_vs']}: shared ratio "
              f"{d['shared_ratio_median']}, query_drift "
              f"{list(d['query_drift'])}, shared_drift(box) "
              f"{len(d['shared_drift'])} queries")
    else:
        print(f"{label}: recorded {len(entry['queries'])} queries "
              "(no prior round to compare)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
