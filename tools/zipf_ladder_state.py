"""LM model-state decade over the independent Zipf ladder
(tools/gen_zipf_ladder.py): per rung — tokens, vocabulary (Heaps),
distinct 3/5-gram types, and the order-5 singleton fraction (what
KenLM-style prune_min_count=2 removes). Pure DuckDB.

Usage: python tools/zipf_ladder_state.py [ladder_root]
Writes zipf_ladder_state.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

Q = """
WITH d AS (SELECT list_filter(
             regexp_split_to_array(lower(text), '[^0-9a-z_]+'),
             x -> len(x) > 0) AS t
           FROM '{path}'),
pos AS (SELECT t, unnest(generate_series(1, len(t))) AS i FROM d),
g AS (SELECT CASE WHEN i > 4 THEN
               t[i-4] || ' ' || t[i-3] || ' ' || t[i-2] || ' ' ||
               t[i-1] || ' ' || t[i] END AS g5,
             CASE WHEN i > 2 THEN
               t[i-2] || ' ' || t[i-1] || ' ' || t[i] END AS g3,
             t[i] AS w
      FROM pos),
c5 AS (SELECT g5, count(*) AS c FROM g WHERE g5 IS NOT NULL GROUP BY g5),
c3 AS (SELECT count(DISTINCT g3) AS n FROM g WHERE g3 IS NOT NULL)
SELECT (SELECT count(*) FROM g) AS tokens,
       (SELECT count(DISTINCT w) FROM g) AS vocab,
       (SELECT n FROM c3) AS grams3,
       (SELECT count(*) FROM c5) AS grams5,
       (SELECT round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 4) FROM c5)
         AS g5_singleton_frac
"""


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else ".scale/zipf"
    con = duckdb.connect()
    con.execute(f"SET threads TO {max(4, (os.cpu_count() or 4) // 2)}")
    out = {}
    for d in sorted(
        os.listdir(root), key=lambda s: int(s.lstrip("n"))
    ):
        p = os.path.join(root, d, "documents.parquet")
        if not os.path.exists(p):
            continue
        row = con.execute(Q.format(path=p)).fetchone()
        out[d] = dict(
            zip(
                ["tokens", "vocab", "grams3", "grams5",
                 "g5_singleton_frac"],
                [
                    int(x) if isinstance(x, (int,)) else float(x)
                    for x in row
                ],
            )
        )
        print(d, out[d])
    rungs = list(out)
    for a, b in zip(rungs, rungs[1:]):
        out[f"growth_{a}_to_{b}"] = {
            k: round(out[b][k] / out[a][k], 3)
            for k in ("tokens", "vocab", "grams3", "grams5")
        }
        print(f"growth {a} -> {b}:", out[f"growth_{a}_to_{b}"])
    with open("zipf_ladder_state.json", "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
