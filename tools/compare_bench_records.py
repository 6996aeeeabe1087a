"""Compare two BENCH_LOCAL-format records' per-query WARM medians —
the round-10 verdict's stability done-bar: two consecutive same-HEAD
full-registry records must agree within ±30% for >= 95% of entries.

Usage: python tools/compare_bench_records.py A.json B.json [tol] [frac]
Exit 0 when the bar is met; prints the offenders either way.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    a_path, b_path = sys.argv[1], sys.argv[2]
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 0.30
    frac = float(sys.argv[4]) if len(sys.argv) > 4 else 0.95
    a = json.load(open(a_path))["queries"]
    b = json.load(open(b_path))["queries"]
    common = sorted(set(a) & set(b))
    if not common:
        print("no common queries")
        sys.exit(2)
    bad = []
    for q in common:
        x, y = a[q], b[q]
        hi, lo = max(x, y), min(x, y)
        # ±30% band around the smaller value; sub-100ms entries are
        # scheduler-noise-dominated — compare with a 50ms floor
        if hi > max(lo, 0.05) * (1.0 + tol) and hi - lo > 0.05:
            bad.append((q, x, y, round(hi / max(lo, 1e-9), 2)))
    ok = len(common) - len(bad)
    share = ok / len(common)
    print(
        f"{ok}/{len(common)} queries within ±{tol:.0%} "
        f"({share:.1%}; bar {frac:.0%})"
    )
    for q, x, y, r in sorted(bad, key=lambda t: -t[3]):
        print(f"  DIVERGENT {q}: {x} vs {y} ({r}x)")
    sys.exit(0 if share >= frac else 1)


if __name__ == "__main__":
    main()
