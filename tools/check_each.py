#!/usr/bin/env python3
"""Per-query oracle check with a wall-clock budget per query.

Runs tools/check.py one query at a time under `timeout`, so a DuckDB
oracle that is quadratic at the probed scale (exact-kNN references,
all-pairs graph oracles) can't stall the whole gate — it gets recorded
as `oracle_timeout` (a documented cost exception: the ENGINE's answer
was produced and dumped; only the REFERENCE recompute is infeasible in
the oracle engine at this scale) instead of hanging the run.

Usage: python3 tools/check_each.py <sfDir> <verifyOutDir> [budget_sec]
Writes <verifyOutDir>/check_results.json and prints a summary.
"""
import json
import os
import subprocess
import sys

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    here = os.path.dirname(os.path.abspath(__file__))
    results = {}
    for name in sorted(oracle):
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(here, "check.py"),
                 sf_dir, out_dir, name],
                capture_output=True, text=True, timeout=budget,
                env={**os.environ, "DUCKDB_MEM_LIMIT": "24GiB",
                     "DUCKDB_TMP_DIR": "/tmp/duckdb_check"})
            out = p.stdout.strip().splitlines()
            line = next((l for l in out if l.startswith(("OK", "FAIL"))), "")
            # an oracle whose own recompute exhausts the oracle engine's
            # memory/spill budget is a cost exception like a timeout (the
            # engine's dump exists; no comparison happened), not a mismatch
            oom = "duckdb error" in line and any(
                m in line for m in ("Out of Memory", "No space left",
                                    "temp_directory", "OutOfMemory"))
            status = ("ok" if line.startswith("OK")
                      else "oracle_oom" if oom else "fail")
            results[name] = {"status": status, "detail": line}
        except subprocess.TimeoutExpired:
            results[name] = {"status": "oracle_timeout",
                             "detail": f"oracle recompute exceeded {budget}s"}
        print(f"{results[name]['status']:>14}  {name}", flush=True)
    with open(f"{out_dir}/check_results.json", "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    n = len(results)
    ok = sum(1 for r in results.values() if r["status"] == "ok")
    to = sum(1 for r in results.values()
             if r["status"] in ("oracle_timeout", "oracle_oom"))
    bad = n - ok - to
    print(f"== {ok} ok, {bad} fail, {to} oracle_timeout/oom of {n} ==")
    sys.exit(1 if bad else 0)

main()
