#!/usr/bin/env python
"""Compare two training runs' loss trajectories (VERDICT r4 ask #5).

Reads the metrics JSONL of two runs of the SAME recipe/seed (e.g. int8-dense
MXU compute vs bf16 compute), aligns on step, and reports the relative loss
divergence over the run — the evidence that a compute-path change does not
bend the optimization trajectory.

Usage:
  python scripts/compare_runs.py A/metrics.jsonl B/metrics.jsonl \
      [--label-a int8_dense --label-b bf16] [--out docs/runs/r5_traj.md]

Exit code 1 if the final-window divergence exceeds --fail-threshold
(default 5%), so queues can gate on it.
"""

import argparse
import json
import sys


def load(path):
    rows = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if "loss" in rec and "step" in rec:
                rows[int(rec["step"])] = float(rec["loss"])
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--label-a", default="A")
    ap.add_argument("--label-b", default="B")
    ap.add_argument("--out", default=None)
    ap.add_argument("--fail-threshold", type=float, default=0.05,
                    help="max allowed |mean_a-mean_b|/mean_b over the final "
                         "window (default 5%%)")
    ap.add_argument("--window", type=int, default=10,
                    help="number of trailing log points for the final-window "
                         "mean")
    args = ap.parse_args()

    a, b = load(args.a), load(args.b)
    steps = sorted(set(a) & set(b))
    if len(steps) < 3:
        print(f"only {len(steps)} common steps — not comparable", file=sys.stderr)
        return 2

    diffs = [(s, a[s], b[s], abs(a[s] - b[s]) / max(abs(b[s]), 1e-12)) for s in steps]
    max_rel = max(d for _, _, _, d in diffs)
    mean_rel = sum(d for _, _, _, d in diffs) / len(diffs)
    w = min(args.window, len(steps))
    tail = steps[-w:]
    ma = sum(a[s] for s in tail) / w
    mb = sum(b[s] for s in tail) / w
    final_rel = abs(ma - mb) / max(abs(mb), 1e-12)

    lines = [
        f"# Trajectory comparison: {args.label_a} vs {args.label_b}",
        "",
        f"- runs: `{args.a}` vs `{args.b}` ({len(steps)} common log points, "
        f"steps {steps[0]}-{steps[-1]})",
        f"- per-point relative |loss| difference: mean {mean_rel:.2%}, "
        f"max {max_rel:.2%}",
        f"- final-{w}-window means: {args.label_a} {ma:.5f} vs "
        f"{args.label_b} {mb:.5f} (rel diff {final_rel:.2%})",
        "",
        "| step | " + args.label_a + " | " + args.label_b + " | rel diff |",
        "|---|---|---|---|",
    ]
    stride = max(len(diffs) // 20, 1)
    for s, la, lb, d in diffs[::stride]:
        lines.append(f"| {s} | {la:.5f} | {lb:.5f} | {d:.2%} |")
    report = "\n".join(lines) + "\n"
    print(report)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report)
    if final_rel > args.fail_threshold:
        print(f"DIVERGED: final-window rel diff {final_rel:.2%} > "
              f"{args.fail_threshold:.2%}", file=sys.stderr)
        return 1
    print(f"OK: final-window rel diff {final_rel:.2%} <= "
          f"{args.fail_threshold:.2%}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
