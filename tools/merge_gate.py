#!/usr/bin/env python3
"""Merge a subset gate re-run into an existing GATE_SCALE artifact.

Usage: python3 tools/merge_gate.py <base.json> <patch.json> <out.json> \
         [note]

Each query result in the patch REPLACES the base entry (or is added if
new); the summary is recomputed; a `patched` block records which
queries were re-run and why, so the artifact stays self-explaining.
"""
import json
import sys


def main():
    base_p, patch_p, out_p = sys.argv[1:4]
    note = sys.argv[4] if len(sys.argv) > 4 else ""
    with open(base_p) as f:
        base = json.load(f)
    with open(patch_p) as f:
        patch = json.load(f)
    replaced = sorted(patch["results"].keys())
    base["results"].update(patch["results"])
    summary = {}
    for r in base["results"].values():
        summary[r["status"]] = summary.get(r["status"], 0) + 1
    base["summary"] = dict(sorted(summary.items()))
    base["total"] = len(base["results"])
    base.setdefault("patched", []).append(
        {"queries": replaced, "note": note,
         "patch_sf_dir": patch.get("sf_dir"),
         "patch_timeout_sec": patch.get("timeout_sec")})
    with open(out_p, "w") as f:
        json.dump(base, f, indent=1, sort_keys=True)
    print(f"merged {len(replaced)} entries -> {out_p}; "
          f"summary={base['summary']}")


if __name__ == "__main__":
    main()
