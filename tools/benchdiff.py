#!/usr/bin/env python3
"""Round-over-round bench comparison (the reading the judge does by hand).

Usage:
    python3 tools/benchdiff.py BENCH_r04.json bench_out.json [threshold_pct]

Accepts either the driver's BENCH_r{N}.json wrapper (the JSON line lives in
its "tail" field) or graft.Bench's raw bench_out.json line. Prints per-query
deltas beyond the threshold (default 10%) plus totals; exits 1 if any query
regressed beyond the threshold AND by more than 0.15 s absolute — both gates,
so sub-second noise on a 32-core box doesn't page anyone.
"""
import json
import sys


def load(path):
    with open(path) as f:
        raw = f.read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return d["queries"]
    if isinstance(d, dict) and "tail" in d:
        # Prefer the line carrying the per-query map; Bench also prints a
        # compact summary line (no "queries") last for the driver's tail.
        lines = [l for l in d["tail"].splitlines() if l.startswith('{"metric"')]
        for l in reversed(lines):
            parsed = json.loads(l)
            if "queries" in parsed:
                return parsed["queries"]
    for line in raw.splitlines():
        if line.startswith('{"metric"'):
            parsed = json.loads(line)
            if "queries" in parsed:
                return parsed["queries"]
    raise SystemExit(f"no bench JSON found in {path}")


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) / 100 if len(sys.argv) > 3 else 0.10
    regressions = 0
    for name in sorted(set(old) | set(new)):
        a, b = old.get(name), new.get(name)
        if a is None or b is None:
            shown = "" if b is None else (
                f" ({b})" if isinstance(b, str) else f" ({b:.2f}s)")
            print(f"{'ADDED' if a is None else 'REMOVED':8s} {name}{shown}")
            regressions += isinstance(b, str)
            continue
        if isinstance(a, str) or isinstance(b, str):
            print(f"{'ERROR':8s} {name}: {a} -> {b}")
            regressions += isinstance(b, str)
            continue
        delta = b - a
        if a > 0 and abs(delta) / a >= threshold and abs(delta) >= 0.15:
            tag = "SLOWER" if delta > 0 else "faster"
            print(f"{tag:8s} {name}: {a:.2f}s -> {b:.2f}s ({delta:+.2f}s, "
                  f"{delta / a * 100:+.0f}%)")
            regressions += delta > 0
    ot = sum(v for v in old.values() if not isinstance(v, str))
    nt = sum(v for v in new.values() if not isinstance(v, str))
    # Totals over different query sets are still comparable enough to
    # print; the ADDED/REMOVED lines above flag the set change itself.
    print(f"total: {ot:.1f}s -> {nt:.1f}s ({nt - ot:+.1f}s); "
          f"{regressions} significant regression(s)")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
