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
    sa, sb = a_rec.get("sentinel") or {}, b_rec.get("sentinel") or {}
    noise_hit = []
    if sa and sb:
        med_a = sorted(sa.values())[len(sa) // 2]
        med_b = sorted(sb.values())[len(sb) // 2]
        noise_hit = [
            q
            for q in common
            if sa.get(q, 0) > 3 * med_a or sb.get(q, 0) > 3 * med_b
        ]
        common = [q for q in common if q not in set(noise_hit)]
        print(
            f"sentinel medians {med_a}/{med_b}s; "
            f"{len(noise_hit)} queries excluded as burst-hit: "
            f"{sorted(noise_hit)[:12]}{'...' if len(noise_hit) > 12 else ''}"
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
