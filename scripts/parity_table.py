"""Render the RESULTS.md comparison table from results_*.json dumps.

    python scripts/parity_table.py results_torch.json results_jax_default.json \
        [more.json ...]

First file is the anchor; every later column is compared against it.
Prints a markdown table over all shared metrics plus a win/tie/loss count
(>= anchor - 0.002 counts as matching, same tolerance RESULTS.md used in
round 2).
"""

from __future__ import annotations

import json
import sys

TOL = 0.002


def main() -> None:
    paths = sys.argv[1:]
    if len(paths) < 2:
        sys.exit("need anchor + at least one comparison file")
    cols = []
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        label = d.get("label") or p.replace("results_", "").replace(
            ".json", ""
        )
        cols.append((label, d["metrics"]))
    anchor_label, anchor = cols[0]
    keys = sorted(
        k for k in anchor
        if not k.endswith("__w") and all(k in m for _, m in cols[1:])
    )
    header = "| metric | " + " | ".join(label for label, _ in cols) + " |"
    print(header)
    print("|" + "---|" * (len(cols) + 1))
    wins = {label: 0 for label, _ in cols[1:]}
    for k in keys:
        row = [k.replace("all/", "")]
        a = anchor[k]
        row.append(f"{a:.4f}")
        for label, m in cols[1:]:
            v = m[k]
            mark = "**" if v >= a - TOL else ""
            if v >= a - TOL:
                wins[label] += 1
            row.append(f"{mark}{v:.4f}{mark}")
        print("| " + " | ".join(row) + " |")
    n = len(keys)
    print()
    for label, w in wins.items():
        print(f"{label}: matches-or-beats {anchor_label} on {w}/{n} metrics")


if __name__ == "__main__":
    main()
