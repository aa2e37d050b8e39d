#!/usr/bin/env python3
"""Compare two ScaleProbe sweeps (SCALE_r*.json) op-by-op.

Usage: scale_compare.py OLD.json NEW.json [--tol 1.5]

Each input is the JSON ScaleProbe streams to <outDir>/SCALE.json:
{"fixture": {...}, "ops": {"t01_...": {"base_s", "scaled_s", "ratio"}}}.

The comparison statistic is each op's scale RATIO (scaled wall / base
wall) — the quantity the 146-green oracle gate and the sf0.1 bench
cannot see (r17: a 21x regex slow path and a doubled levenshtein DP
both hid behind green hashes and a flat bench; only the 30x ratio
moved). An op "moves" when the larger ratio exceeds the smaller by
more than the tolerance factor (default 1.5) AND the absolute scaled
wall changed by > 0.5 s (an op whose 30x wall is fractions of a second
sits on the per-job scheduling floor, where ratios are noise).

Fixture configs must match (factor/mode/events/tpch) — ratios from
different fixtures are not comparable; mismatch is an error, not a
finding. Ops present in only one file are listed informationally
(suite grew or shrank) and do not affect the exit code.

Exit 0: no op moved. Exit 1: at least one op's scale curve genuinely
changed — re-probe it in isolation before believing either sweep.
"""
import json
import sys


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tol = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--tol"):
            tol = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    if len(args) != 2:
        sys.exit(__doc__)
    old, new = (json.load(open(p)) for p in args)

    fo, fn = old.get("fixture", {}), new.get("fixture", {})
    keys = ("factor", "mode", "events", "tpch")
    if any(fo.get(k) != fn.get(k) for k in keys):
        sys.exit(f"fixture mismatch: {fo} vs {fn} — ratios not comparable")

    oo, on = old["ops"], new["ops"]
    added = sorted(set(on) - set(oo))
    removed = sorted(set(oo) - set(on))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    movers = []
    for op in sorted(set(oo) & set(on)):
        r0, r1 = oo[op]["ratio"], on[op]["ratio"]
        w0, w1 = oo[op]["scaled_s"], on[op]["scaled_s"]
        worse = max(r0, r1) / max(min(r0, r1), 1e-9)
        if worse > tol and abs(w1 - w0) > 0.5:
            movers.append((worse, op, r0, r1, w0, w1))
    for worse, op, r0, r1, w0, w1 in sorted(movers, reverse=True):
        direction = "REGRESSED" if r1 > r0 else "improved"
        print(f"{op:28s} ratio {r0:6.2f} -> {r1:6.2f} ({direction} {worse:.2f}x)"
              f"  scaled wall {w0:6.2f} -> {w1:6.2f} s")
    regressions = [m for m in movers if m[3] > m[2]]
    if not movers:
        print(f"ok: {len(set(oo) & set(on))} shared ops, no scale-curve mover at tol {tol}")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
