"""Win-count-vs-steps crossover table (VERDICT r3 ask #1, path b).

Aligns the periodic test-split eval curves of the two frameworks — the
jax side's ``<ckpt_dir>/test_curve.jsonl`` (train/loop.py test_eval_every)
and the torch anchor's ``results_torch_curve*.jsonl``
(scripts/parity_experiment.py) — at each shared global-epoch boundary and
reports, per budget, how many of the 42 task metrics the framework matches
or beats (same 0.002 tolerance as scripts/parity_table.py).

    python scripts/crossover_table.py results_torch_curve_l.jsonl \
        checkpoints_parity_l/test_curve.jsonl [more_jax_curves...]

Writes bench_queue/crossover.json and prints a markdown table.
"""

from __future__ import annotations

import json
import os
import sys

TOL = 0.002
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_curve(path: str) -> dict:
    rows = {}
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            r = json.loads(line)
            rows[int(r["global_epoch"])] = r
    return rows


def main() -> None:
    paths = sys.argv[1:]
    if len(paths) < 2:
        sys.exit("need anchor curve + at least one framework curve")
    anchor = load_curve(paths[0])
    frameworks = [(os.path.basename(os.path.dirname(p)) or p, load_curve(p))
                  for p in paths[1:]]

    out_rows = []
    print("| epoch | steps | " + " | ".join(
        f"{lbl} wins/42" for lbl, _ in frameworks
    ) + " | weakest metrics (first framework) |")
    print("|---|---|" + "---|" * (len(frameworks) + 1))
    for ep in sorted(anchor):
        a = anchor[ep]
        keys = sorted(
            k for k in a
            if "/" in k and not k.endswith("__w")
        )
        cells, win_counts = [], []
        worst = []
        for li, (lbl, fw) in enumerate(frameworks):
            if ep not in fw:
                cells.append("—")
                win_counts.append(None)
                continue
            m = fw[ep]
            wins = sum(1 for k in keys if k in m and m[k] >= a[k] - TOL)
            n = sum(1 for k in keys if k in m)
            cells.append(f"{wins}/{n}")
            win_counts.append(wins)
            if li == 0:
                gaps = sorted(
                    ((a[k] - m[k], k) for k in keys if k in m), reverse=True
                )[:3]
                worst = [f"{k.replace('all/', '')} −{g:.3f}" for g, k in gaps]
        out_rows.append({
            "global_epoch": ep,
            "steps": a.get("steps"),
            "wins": {lbl: w for (lbl, _), w in zip(frameworks, win_counts)},
        })
        print(f"| {ep} | {a.get('steps')} | " + " | ".join(cells)
              + " | " + ", ".join(worst) + " |")

    out = {
        "anchor": paths[0],
        "frameworks": paths[1:],
        "tolerance": TOL,
        "rows": out_rows,
    }
    out_path = os.environ.get(
        "CROSSOVER_OUT", os.path.join(ROOT, "bench_queue", "crossover.json")
    )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
