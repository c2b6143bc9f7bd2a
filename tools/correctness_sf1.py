#!/usr/bin/env python3
"""Compose the sf1 scale-checkpoint correctness artifact (CORRECTNESS_sf1
.json) from a Verify dump's per-query oracle results (check_results.json,
written by check_each.py), its rows-only invariant manifest
(rows_only_checks.json), and its engine-error ledger (errors.json).

Mirrors the driver's CORRECTNESS_r{N}.json shape (one entry per catalog
id) and adds the statuses unique to a big-scale probe: `oracle_oom` /
`oracle_timeout` — the ENGINE produced its dump, only the DuckDB
reference recompute was infeasible at this scale.

Usage: python3 tools/correctness_sf1.py <verifyOutDir> [out.json]
"""
import json
import sys


def main():
    out_dir = sys.argv[1]
    dest = sys.argv[2] if len(sys.argv) > 2 else "CORRECTNESS_sf1.json"
    checks = json.load(open(f"{out_dir}/check_results.json"))
    ro = json.load(open(f"{out_dir}/rows_only_checks.json"))
    errors = json.load(open(f"{out_dir}/errors.json"))
    out = {}
    for name, r in sorted(checks.items()):
        ok = r["status"] == "ok"
        out[name] = {
            "rows_match": ok or None, "schema_match": ok or None,
            "hash_match": ok or None,
            "err": None if ok else r["status"],
            "detail": None if ok else r["detail"],
        }
    for name, r in sorted(ro.items()):
        out[name] = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "err": "no_oracle",
            "rows_only_pass": bool(r["pass"]),
            "invariant": r["invariant"],
            "failures": r.get("failures", []),
        }
    for name, msg in errors.items():
        out.setdefault(name, {})["err"] = f"engine_error: {msg}"
    n_or = sum(1 for v in out.values()
               if v.get("hash_match") is True)
    n_cost = sum(1 for v in out.values()
                 if str(v.get("err", "")).startswith("oracle_"))
    n_ro = sum(1 for v in out.values() if v.get("err") == "no_oracle")
    n_ro_ok = sum(1 for v in out.values() if v.get("rows_only_pass") is True)
    n_fail = len(out) - n_or - n_cost - n_ro
    json.dump(out, open(dest, "w"), indent=1, sort_keys=True)
    print(f"{dest}: {len(out)} ids — {n_or} oracle hash-green, "
          f"{n_ro_ok}/{n_ro} rows-only green, {n_cost} oracle cost "
          f"exceptions, {n_fail} FAIL")
    sys.exit(1 if n_fail or n_ro_ok != n_ro else 0)


main()
