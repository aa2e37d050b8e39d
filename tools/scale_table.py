#!/usr/bin/env python3
"""Render a SCALE_r*.json sweep as the README's scale table.

Usage: scale_table.py SCALE_rN.json [--full]

Emits GitHub markdown: a summary line (per-suite median/extreme wall
ratios for factor-times data) and a table of the ops that carry signal —
ratio >= 4 or scaled wall >= 4 s (everything else sits at or near the
per-job scheduling floor, where ratios are noise). --full prints every
op. The numbers come straight from the artifact so the README table can
never drift from the recorded sweep.
"""
import json
import statistics
import sys


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    full = "--full" in sys.argv
    if len(args) != 1:
        sys.exit(__doc__)
    data = json.load(open(args[0]))
    fx = data.get("fixture", {})
    ops = data["ops"]
    factor = fx.get("factor", "?")

    def suite(prefix):
        return {k: v for k, v in ops.items() if k.startswith(prefix)}

    # base-wall column label comes from the artifact's recorded source
    # dir, not a literal — a sweep over another base must not render a
    # table claiming to be sf0.1 (r18 ADVICE)
    base = fx.get("src", "base").rstrip("/").rsplit("/", 1)[-1]

    for name, sub in (("t-suite", suite("t")), ("q-suite", suite("q"))):
        if not sub:
            continue
        ratios = sorted(v["ratio"] for v in sub.values())
        med = statistics.median(ratios)
        hi_op = max(sub, key=lambda k: sub[k]["ratio"])
        print(f"{name}: {len(sub)} ops, median wall ratio {med:.2f}x for "
              f"{factor}x data, max {sub[hi_op]['ratio']:.1f}x ({hi_op})")
    print()
    print(f"| op | {base} wall (s) | "
          f"{factor}x wall (s) | ratio |")
    print("|---|---|---|---|")
    rows = [(v["ratio"], k, v) for k, v in ops.items()
            if full or v["ratio"] >= 4 or v["scaled_s"] >= 4]
    for r, k, v in sorted(rows, reverse=True):
        print(f"| {k} | {v['base_s']:.2f} | {v['scaled_s']:.2f} | {r:.2f}x |")


if __name__ == "__main__":
    main()
