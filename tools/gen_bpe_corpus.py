"""Generate a Zipf-distributed text corpus with a large derivational
vocabulary — the input a PRODUCTION BPE merge budget (32k) needs.

The driver's graded documents table has a deliberately tiny
vocabulary (the token-blocking stress corpus), so byte-level BPE
saturates after a few hundred merges (every remaining pair drops
below min_count — measured: 392 merges at sf1.0). Real web corpora
have Heaps-law vocabularies; this generator builds one the honest
way: words are syllable compositions (CV/CVC units drawn with
realistic consonant/vowel frequencies) plus derivational suffixes,
frequencies are Zipf(1.07) over the rank space, and documents are
~TOKENS_PER_DOC draws. Deterministic (fixed seed).

Usage:
    python tools/gen_bpe_corpus.py [out_dir] [n_vocab] [n_tokens]
    # defaults: .scale/bpe_corpus, 200_000 words, 20_000_000 tokens
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TOKENS_PER_DOC = 200

CONSONANTS = list("tnsrhldcmfpgwybvkxjqz")
C_W = np.array([9.0, 7.0, 6.3, 6.0, 6.1, 4.0, 4.0, 2.8, 2.4, 2.2,
                1.9, 2.0, 2.4, 2.0, 1.5, 0.8, 0.2, 0.2, 0.1, 0.1, 0.07])
VOWELS = list("eaoiu")
V_W = np.array([12.7, 8.2, 7.5, 7.0, 2.8])
SUFFIXES = ["", "s", "ed", "ing", "er", "ly", "tion", "ness", "ment", "al"]


def _syllables(rng: np.random.Generator, n: int) -> list[str]:
    c1 = rng.choice(CONSONANTS, size=n, p=C_W / C_W.sum())
    v = rng.choice(VOWELS, size=n, p=V_W / V_W.sum())
    c2 = rng.choice(CONSONANTS, size=n, p=C_W / C_W.sum())
    closed = rng.random(n) < 0.4
    return [
        f"{a}{b}{c}" if cl else f"{a}{b}"
        for a, b, c, cl in zip(c1, v, c2, closed)
    ]


def build_vocab(rng: np.random.Generator, n_vocab: int) -> np.ndarray:
    syl = _syllables(rng, 4096)
    words = set()
    # draw until we have n_vocab distinct words; 1-4 syllables + a
    # Zipf-ish suffix choice gives heavy shared-substring structure —
    # exactly what BPE exists to exploit
    while len(words) < n_vocab:
        need = n_vocab - len(words)
        k = rng.integers(1, 5, size=need * 2)
        idx = rng.integers(0, len(syl), size=(len(k), 4))
        sfx = rng.choice(SUFFIXES, size=len(k), p=np.array(
            [30, 14, 12, 12, 9, 8, 5, 4, 3, 3], dtype=float) / 100)
        for ki, row, s in zip(k, idx, sfx):
            words.add("".join(syl[j] for j in row[:ki]) + s)
            if len(words) >= n_vocab:
                break
    return np.array(sorted(words))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale",
        "bpe_corpus",
    )
    n_vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    n_tokens = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000_000
    rng = np.random.default_rng(1234)
    vocab = build_vocab(rng, n_vocab)
    # Zipf ranks: standard s=1.07 over the vocab, sampled via inverse
    # CDF on precomputed weights (np.random.zipf has unbounded support)
    ranks = np.arange(1, n_vocab + 1, dtype=float)
    w = 1.0 / ranks**1.07
    w /= w.sum()
    draws = rng.choice(n_vocab, size=n_tokens, p=w)
    toks = vocab[draws]
    n_docs = n_tokens // TOKENS_PER_DOC
    texts = [
        " ".join(toks[i * TOKENS_PER_DOC:(i + 1) * TOKENS_PER_DOC])
        for i in range(n_docs)
    ]
    os.makedirs(out, exist_ok=True)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tbl, f"{out}/documents.parquet")
    distinct = len(set(toks[: min(len(toks), n_tokens)]))
    print(
        f"wrote {out}: {n_docs} docs, {n_tokens} tokens, "
        f"{distinct} distinct words realized of {n_vocab} vocab"
    )


if __name__ == "__main__":
    main()
