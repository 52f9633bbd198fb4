#!/usr/bin/env python3
"""Render gated scalestress artifact(s) as the BASELINE.md table.

Usage: python3 tools/scalestress_table.py bench/scalestress_r10_*.json
Accepts one or more artifacts (the recorder supports recording the
family as separate subset runs so each fits inside one of this host's
short calm windows); rows are merged into one table, and the footer
lists each artifact's reps/canary so the gating evidence stays
visible. All artifacts must share the same factor. Prints a
GitHub-markdown table (query, 1x median, Nx median, ratio, worst
per-rep swing) ready to paste under the SCALESTRESS_TABLE marker.
"""
import json, sys


def main():
    arts = [(p, json.load(open(p))) for p in sys.argv[1:]]
    factors = {d["factor"] for _, d in arts}
    assert len(factors) == 1, f"mixed factors across artifacts: {factors}"
    f = factors.pop()
    print(f"| query | 1× (s) | {f}× (s) | ratio | worst rep swing |")
    print("|---|---|---|---|---|")
    base_total = scaled_total = 0.0
    rows = {}
    for _, d in arts:
        for q in d["base_sec"]:
            assert q not in rows, f"query {q} present in two artifacts"
            swings = []
            for tag in ("1x", f"{f}x"):
                xs = d.get("per_rep", {}).get(f"{tag}/{q}", [])
                if len(xs) > 1:
                    swings.append(max(xs) / max(min(xs), 1e-9))
            worst = f"{max(swings):.2f}×" if swings else "—"
            rows[q] = (f"| `{q}` | {d['base_sec'][q]:.1f} | {d['scaled_sec'][q]:.1f} "
                       f"| **{d['ratio'][q]:.1f}×** | {worst} |")
        base_total += d["base_total"]
        scaled_total += d["scaled_total"]
    for q in sorted(rows):
        print(rows[q])
    print(f"| **total** | **{base_total:.1f}** | **{scaled_total:.1f}** "
          f"| **{scaled_total/base_total:.1f}×** | |")
    gates = "; ".join(
        f"{p.rsplit('/', 1)[-1]}: reps={d['reps']}, canary {d.get('canary_sec', -1):.3f}s"
        for p, d in arts)
    print(f"\n(per-query medians; {gates})")


if __name__ == "__main__":
    main()
