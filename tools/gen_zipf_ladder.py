"""Generate an INDEPENDENT scale ladder for the documents table —
fresh Zipf-drawn text at every rung (verdict r11 ask #4).

Usage:
    python tools/gen_zipf_ladder.py [dst_root] [rungs]
    # default: .scale/zipf  5000,50000,500000

Why not tools/gen_scale.py's tiling: the `~k` token-suffix bijection
preserves per-replica structure exactly, but it DISTORTS cross-corpus
statistics both ways — LM vocabulary is shared within a replica and
disjoint across them (sub-linear model-state growth that measures the
tiling, not Heaps' law), while the gsmb keygen strips the suffix and
sees quadratic cross-replica pair growth (SCALING.md r11 artifact
notes). This generator instead draws EVERY rung i.i.d. from one fixed
process, so growth measurements transfer without caveats:

* tokens ~ Zipf(a) over an UNBOUNDED integer support ("w<rank>"):
  vocabulary grows naturally with corpus size (Heaps-law emergence,
  the thing the LM-state decade is supposed to measure), frequency
  structure is scale-free, and no rung shares a seed path with
  another (seed = base_seed + rung index).
* doc lengths ~ clamped lognormal around ~60 tokens — matches the
  driver corpus's short-document regime.
* 5% exact duplicates + 5% near duplicates (a copied earlier doc
  with ~10% of tokens resampled): gsmb's exact-duplicate labels and
  the dedup pipelines keep a stable amount of real work per rung.
* lang / source columns drawn categorically like the driver's table
  (4 langs, 20 sources) so mix/ppl queries remain runnable.

Deterministic per (seed, rung): numpy Generator(PCG64). Writes ONLY
documents.parquet per rung directory — the ladder exists for the
corpus-shaped decade measurements (text_lm5*, pipeline_gsmb_e2e,
dedup/LSH); TPC-H-shaped queries keep using the driver testdata.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["en", "es", "de", "fr"]
LANG_P = [0.55, 0.2, 0.15, 0.1]
N_SOURCES = 20
ZIPF_A = 1.3  # unbounded-support Zipf exponent (heavy, finite mean)
MEAN_LOG_LEN = 4.0  # ln-space mean -> ~55 tokens median
SD_LOG_LEN = 0.35
MIN_LEN, MAX_LEN = 8, 200
EXACT_DUP_FRAC = 0.05
NEAR_DUP_FRAC = 0.05
NEAR_DUP_EDIT = 0.1
BASE_SEED = 20260817


def gen_rung(n_docs: int, seed: int) -> pa.Table:
    rng = np.random.Generator(np.random.PCG64(seed))
    lens = np.clip(
        np.exp(rng.normal(MEAN_LOG_LEN, SD_LOG_LEN, n_docs)),
        MIN_LEN,
        MAX_LEN,
    ).astype(np.int64)
    texts: list[str] = []
    n_base = 0
    for i in range(n_docs):
        u = rng.random()
        if i > 0 and u < EXACT_DUP_FRAC:
            texts.append(texts[int(rng.integers(0, i))])
            continue
        if i > 0 and u < EXACT_DUP_FRAC + NEAR_DUP_FRAC:
            src = texts[int(rng.integers(0, i))].split(" ")
            k = max(1, int(len(src) * NEAR_DUP_EDIT))
            idx = rng.integers(0, len(src), k)
            ranks = rng.zipf(ZIPF_A, k)
            for j, r in zip(idx, ranks):
                src[int(j)] = f"w{int(r)}"
            texts.append(" ".join(src))
            continue
        ranks = rng.zipf(ZIPF_A, int(lens[i]))
        texts.append(" ".join(f"w{int(r)}" for r in ranks))
        n_base += 1
    langs = rng.choice(len(LANGS), n_docs, p=LANG_P)
    sources = rng.integers(0, N_SOURCES, n_docs)
    return pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([LANGS[k] for k in langs], pa.string()),
            "source": pa.array(
                [f"src{int(s)}" for s in sources], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def main() -> None:
    dst_root = sys.argv[1] if len(sys.argv) > 1 else ".scale/zipf"
    rungs = [
        int(x)
        for x in (
            sys.argv[2] if len(sys.argv) > 2 else "5000,50000,500000"
        ).split(",")
    ]
    for ri, n in enumerate(rungs):
        d = os.path.join(dst_root, f"n{n}")
        os.makedirs(d, exist_ok=True)
        t = gen_rung(n, BASE_SEED + ri)
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        toks = sum(s.count(" ") + 1 for s in t.column("text").to_pylist())
        vocab = len(
            {
                w
                for s in t.column("text").to_pylist()
                for w in s.split(" ")
            }
        )
        print(f"{d}: {n} docs, {toks} tokens, vocab {vocab}")


if __name__ == "__main__":
    main()
