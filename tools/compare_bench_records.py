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
    a_rec = json.load(open(a_path))
    b_rec = json.load(open(b_path))
    a, b = a_rec["queries"], b_rec["queries"]
    common = sorted(set(a) & set(b))
    # sentinel-aware exclusion (r11): when both records carry the
    # constant-work host sentinel, drop queries whose sentinel in
    # EITHER record exceeds 3x that record's own sentinel median —
    # those segments were measured during a host stall burst, and a
    # per-query statistic at REPS=3 cannot survive a stall spanning
    # whole reps (SCALING.md round 11). The exclusion is reported, so
    # a record pair that only agrees by dropping half its entries is
    # visibly doing so.
    # r12: prefer the JVM-side sentinel when both records carry it —
    # the Python loop only sees driver-thread scheduling; executor-
    # side vCPU theft (the r12 run1/run2 divergence pattern: 1.3-5x
    # same-code swings with flat py-sentinels) shows only in the
    # fixed Spark range-sum job. The py sentinel stays as a fallback
    # and a secondary flag source.
    noise_hit: list[str] = []
    for key, mult in (("sentinel_jvm", 2.0), ("sentinel", 3.0)):
        sa, sb = a_rec.get(key) or {}, b_rec.get(key) or {}
        if not (sa and sb):
            continue
        med_a = sorted(sa.values())[len(sa) // 2]
        med_b = sorted(sb.values())[len(sb) // 2]
        hit = [
            q
            for q in common
            if sa.get(q, 0) > mult * med_a or sb.get(q, 0) > mult * med_b
        ]
        noise_hit.extend(q for q in hit if q not in noise_hit)
        common = [q for q in common if q not in set(hit)]
        print(
            f"{key} medians {med_a}/{med_b}s (x{mult:g} flag); "
            f"{len(hit)} queries excluded as burst-hit: "
            f"{sorted(hit)[:12]}{'...' if len(hit) > 12 else ''}"
        )
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
