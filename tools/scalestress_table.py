#!/usr/bin/env python3
"""Render a gated scalestress artifact as the BASELINE.md table.

Usage: python3 tools/scalestress_table.py bench/scalestress_r09.json
Prints a GitHub-markdown table (query, 1x median, Nx median, ratio,
worst per-rep swing) ready to paste under the SCALESTRESS_TABLE marker.
"""
import json, sys


def main():
    path = sys.argv[1]
    d = json.load(open(path))
    f = d["factor"]
    print(f"| query | 1× (s) | {f}× (s) | ratio | worst rep swing |")
    print("|---|---|---|---|---|")
    for q in sorted(d["base_sec"]):
        swings = []
        for tag in ("1x", f"{f}x"):
            xs = d.get("per_rep", {}).get(f"{tag}/{q}", [])
            if len(xs) > 1:
                swings.append(max(xs) / max(min(xs), 1e-9))
        worst = f"{max(swings):.2f}×" if swings else "—"
        print(f"| `{q}` | {d['base_sec'][q]:.1f} | {d['scaled_sec'][q]:.1f} "
              f"| **{d['ratio'][q]:.1f}×** | {worst} |")
    print(f"| **total** | **{d['base_total']:.1f}** | **{d['scaled_total']:.1f}** "
          f"| **{d['scaled_total']/d['base_total']:.1f}×** | |")
    print(f"\n(reps={d['reps']}, medians; canary {d.get('canary_sec', -1):.3f}s)")


if __name__ == "__main__":
    main()
