"""Generate PERF-ONLY synthetic slices at 10x / 100x the sf0.1
testdata (documents + events), so the scaling sweep can extend two
decades above the largest provided scale factor.

This data is NEVER used for correctness gating — the oracle/bench
inputs remain the driver's /root/testdata parquet exactly as shipped.

Document text is drawn from the observed sf0.1 vocabulary with the
observed document-length distribution (seeded, reproducible). The
vocabulary GROWS with corpus size following Heaps' law (V ~ N^0.5,
the empirically standard exponent): each base word is suffixed into
ceil(V_target / V_0) variants and draws spread uniformly across them.
A fixed vocabulary at 100x would make every token block ~100x denser
and the ER co-occurrence OUTPUT inherently quadratic in input — real
corpora grow vocabulary as they grow, and the scaling question we are
answering is about INPUT scaling of the plans, not about densifying
the key space. (The round-5 10x slice used a fixed vocabulary; its
documented quadratic-output WNP number is kept in SCALING.md for
contrast.)

Events replay the observed event-type mix and time range over
factor-scaled users.

Usage: python tools/gen_scale.py [out_dir] [factor]
       factor 10 (default) -> 50k docs / 1M events
       factor 100          -> 500k docs / 10M events
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
BASE_DOCS = 5_000
BASE_EVENTS = 100_000
BASE_USERS = 1_500
SEED = 20260814


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparker_sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_docs = BASE_DOCS * factor
    n_events = BASE_EVENTS * factor
    n_users = BASE_USERS * factor
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    rng = np.random.default_rng(SEED + factor)

    vocab = [
        r[0]
        for r in con.execute(
            "SELECT DISTINCT w FROM (SELECT"
            " unnest(regexp_split_to_array(lower(text), '\\s+')) AS w"
            f" FROM '{SRC}/documents.parquet') WHERE w <> '' ORDER BY w"
        ).fetchall()
    ]
    # Heaps growth: V(factor) = V0 * factor^0.5, realized by suffixing
    # each base word into `variants` forms; draws spread uniformly so
    # the relative frequency shape of the base vocabulary is preserved
    variants = max(1, int(math.ceil(math.sqrt(factor))))
    lengths = np.array(
        [
            r[0]
            for r in con.execute(
                "SELECT len(regexp_split_to_array(lower(text), '\\s+'))"
                f" FROM '{SRC}/documents.parquet'"
            ).fetchall()
        ],
        dtype=np.int64,
    )
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

    doc_lens = rng.choice(lengths, size=n_docs)
    total_toks = int(doc_lens.sum())
    word_idx = rng.integers(0, len(vocab), size=total_toks)
    var_idx = rng.integers(0, variants, size=total_toks)
    texts = []
    pos = 0
    if variants == 1:
        words = [vocab[w] for w in word_idx]
    else:
        words = [
            vocab[w] if v == 0 else f"{vocab[w]}~{v}"
            for w, v in zip(word_idx, var_idx)
        ]
    for ln in doc_lens:
        texts.append(" ".join(words[pos : pos + ln]))
        pos += ln
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_docs), pa.int64()),
                "text": texts,
                "lang": [
                    langs[i] for i in rng.integers(0, len(langs), size=n_docs)
                ],
                "source": [
                    sources[i]
                    for i in rng.integers(0, len(sources), size=n_docs)
                ],
                "n_chars": pa.array(
                    np.array([len(t) for t in texts], dtype=np.int64),
                    pa.int64(),
                ),
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
    etss = rng.integers(int(t0), int(t1), size=n_events)
    ek = rng.integers(0, 100, size=n_events)
    type_pick = rng.integers(0, len(types), size=n_events)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n_events), pa.int64()),
                "ts": pa.array(etss, pa.timestamp("us")),
                "user_id": pa.array(
                    rng.integers(0, n_users, size=n_events), pa.int64()
                ),
                "event_type": [types[i] for i in type_pick],
                "value": pa.array(
                    np.round(rng.uniform(0, 100, size=n_events), 2),
                    pa.float64(),
                ),
                "props": ['{"k": %d}' % k for k in ek],
            }
        ),
        f"{out}/events.parquet",
    )
    print(
        f"wrote {n_docs} documents (vocab x{variants}) + {n_events} events"
        f" to {out}"
    )


if __name__ == "__main__":
    main()
