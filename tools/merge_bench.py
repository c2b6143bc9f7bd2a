#!/usr/bin/env python3
"""Merge per-id re-measurements into a frozen bench artifact.

Scale artifacts (BENCH_sf1.json / BENCH_sf10.json) are measured once per
round for the ids whose operators changed; this tool overwrites exactly
those ids' times (and drops stale error entries for ids that now have a
timing), recomputes the total, and records the merge provenance so the
artifact stays honest about mixed-run origins.

Usage: tools/merge_bench.py <artifact.json> <patch.json> <note>
"""
import json
import sys


def main():
    art_path, patch_path, note = sys.argv[1], sys.argv[2], sys.argv[3]
    art = json.load(open(art_path))
    patch = json.load(open(patch_path))
    merged = []
    for q, t in patch.get("queries", {}).items():
        art["queries"][q] = t
        art.get("errors", {}).pop(q, None)
        merged.append(q)
    for q, e in patch.get("errors", {}).items():
        if q not in patch.get("queries", {}):
            art.setdefault("errors", {})[q] = e
            art["queries"].pop(q, None)
            merged.append(q + " (error)")
    art["value"] = sum(art["queries"].values())
    prov = art.setdefault("merge_notes", [])
    prov.append({"ids": sorted(merged), "note": note,
                 "source": patch_path.split("/")[-1]})
    json.dump(art, open(art_path, "w"), indent=1, sort_keys=True)
    print(f"{art_path}: merged {len(merged)} ids, new total "
          f"{art['value']:.1f}s, errors={list(art.get('errors', {}))}")


main()
