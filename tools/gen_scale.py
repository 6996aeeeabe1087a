"""Generate a PERF-ONLY ~10x-sf0.1 synthetic slice (documents +
events) matching the driver testdata's marginal distributions, so the
scaling sweep (tools/scaling.py) can add a 4th point one decade above
the largest provided scale factor.

This data is NEVER used for correctness gating — the oracle/bench
inputs remain the driver's /root/testdata parquet exactly as shipped.
Text is drawn from the observed sf0.1 vocabulary with the observed
document-length distribution (seeded, reproducible); events replay the
observed event-type mix and time range over 10x the users.

Usage: python tools/gen_scale.py [out_dir]   (default /tmp/sparker_sf1)
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
N_DOCS = 50_000
N_EVENTS = 1_000_000
N_USERS = 15_000
SEED = 20260814


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparker_sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    rng = random.Random(SEED)

    vocab = [
        r[0]
        for r in con.execute(
            "SELECT DISTINCT w FROM (SELECT"
            " unnest(regexp_split_to_array(lower(text), '\\s+')) AS w"
            f" FROM '{SRC}/documents.parquet') WHERE w <> '' ORDER BY w"
        ).fetchall()
    ]
    lengths = [
        r[0]
        for r in con.execute(
            "SELECT len(regexp_split_to_array(lower(text), '\\s+'))"
            f" FROM '{SRC}/documents.parquet'"
        ).fetchall()
    ]
    langs = [
        r[0]
        for r in con.execute(
            f"SELECT lang FROM '{SRC}/documents.parquet'"
        ).fetchall()
    ]
    sources = [
        r[0]
        for r in con.execute(
            f"SELECT source FROM '{SRC}/documents.parquet'"
        ).fetchall()
    ]

    doc_ids, texts, dlangs, dsources, nchars = [], [], [], [], []
    for i in range(N_DOCS):
        n = rng.choice(lengths)
        t = " ".join(rng.choice(vocab) for _ in range(n))
        doc_ids.append(i)
        texts.append(t)
        dlangs.append(rng.choice(langs))
        dsources.append(rng.choice(sources))
        nchars.append(len(t))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "text": texts,
                "lang": dlangs,
                "source": dsources,
                "n_chars": pa.array(nchars, pa.int64()),
            }
        ),
        f"{out}/documents.parquet",
    )

    types = [
        r[0]
        for r in con.execute(
            f"SELECT event_type FROM '{SRC}/events.parquet'"
        ).fetchall()
    ]
    t0, t1 = con.execute(
        f"SELECT epoch_us(min(ts)), epoch_us(max(ts)) FROM '{SRC}/events.parquet'"
    ).fetchone()
    eids, etss, eusers, etypes, evals, eprops = [], [], [], [], [], []
    for i in range(N_EVENTS):
        eids.append(i)
        etss.append(rng.randrange(int(t0), int(t1)))
        eusers.append(rng.randrange(N_USERS))
        etypes.append(rng.choice(types))
        evals.append(round(rng.uniform(0, 100), 2))
        eprops.append('{"k": %d}' % rng.randrange(100))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(eids, pa.int64()),
                "ts": pa.array(etss, pa.timestamp("us")),
                "user_id": pa.array(eusers, pa.int64()),
                "event_type": etypes,
                "value": pa.array(evals, pa.float64()),
                "props": eprops,
            }
        ),
        f"{out}/events.parquet",
    )
    print(f"wrote {N_DOCS} documents + {N_EVENTS} events to {out}")


if __name__ == "__main__":
    main()
