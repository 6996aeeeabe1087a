"""BPE trainer/encoder (sparker_spark/llm/bpe.py) vs an independent
pure-Python reference implementation (written here, straight from the
Sennrich et al. 2016 algorithm description)."""

import pytest
from pyspark.sql import functions as F

from sparker_spark.llm.bpe import BPE


# ----------------------------------------------------------- reference
def ref_train(word_counts: dict[str, int], k: int, min_count: int = 2):
    state = {w: tuple(w) for w in word_counts}
    merges = []
    for _ in range(k):
        counts = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + word_counts[w]
        if not counts:
            break
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if pair[1] < min_count:
            break
        (a, b) = pair[0]
        merges.append((a, b))
        state = {
            w: tuple(_ref_merge(list(s), a, b)) for w, s in state.items()
        }
    return merges


def _ref_merge(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def ref_encode(word: str, merges: list[tuple[str, str]]):
    rank = {p: r for r, p in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        cands = [
            (rank[(syms[i], syms[i + 1])], (syms[i], syms[i + 1]))
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in rank
        ]
        if not cands:
            break
        _, (a, b) = min(cands)
        syms = _ref_merge(syms, a, b)
    return syms


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "low lower newest widest",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )


def _word_counts():
    wc = {}
    for t in CORPUS:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def test_pair_counts_hand_checked(spark):
    state = BPE._init_state(BPE.word_vocab(_docs(spark)))
    rows = {
        (r["left"], r["right"]): r["n"]
        for r in BPE.pair_counts(state).collect()
    }
    wc = _word_counts()
    # ('l','o') occurs once in 'low' and once in 'lower'
    assert rows[("l", "o")] == wc["low"] + wc["lower"]
    # ('e','s') occurs in 'newest' and 'widest'
    assert rows[("e", "s")] == wc["newest"] + wc["widest"]


def test_train_matches_reference(spark):
    got = [
        (r["left"], r["right"])
        for r in BPE.train(_docs(spark), 8).orderBy("rank").collect()
    ]
    assert got == ref_train(_word_counts(), 8)
    assert len(got) == 8


def test_train_local_matches_distributed(spark):
    docs = _docs(spark)
    d = BPE.train(docs, 6).orderBy("rank").collect()
    l = BPE.train_local(docs, 6).orderBy("rank").collect()
    assert [tuple(r) for r in d] == [tuple(r) for r in l]


def test_train_local_cap_guard(spark):
    with pytest.raises(ValueError, match="vocab_cap"):
        BPE.train_local(_docs(spark), 2, vocab_cap=3)


def test_encode_matches_reference_priority_order(spark):
    """Priority (lowest-rank-first) encoding, including on words the
    trainer never saw."""
    docs = _docs(spark)
    merges_df = BPE.train_local(docs, 8)
    merges = [
        (r["left"], r["right"])
        for r in merges_df.orderBy("rank").collect()
    ]
    unseen = spark.createDataFrame(
        [(0, "lowest newestest slow"), (1, None), (2, "")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in BPE.encode(unseen, merges_df).collect()
    }
    expect0 = []
    for w in "lowest newestest slow".split():
        expect0.extend(ref_encode(w, merges))
    assert out[0] == (expect0, len(expect0))
    assert out[1] == ([], 0)
    assert out[2] == ([], 0)


def test_merge_expr_overlapping_candidates(spark):
    """(a,a) on 'aaa' must merge left-to-right non-overlapping:
    ['aa','a'], never ['a','aa'] or ['aaaa']."""
    df = spark.createDataFrame([("aaa",), ("aaaa",), ("a",)], ["word"])
    out = df.select(
        F.col("word"),
        BPE._merge_expr(
            F.filter(F.split("word", ""), lambda x: x != F.lit("")),
            "a",
            "a",
        ).alias("s"),
    ).collect()
    got = {r["word"]: list(r["s"]) for r in out}
    assert got == {"aaa": ["aa", "a"], "aaaa": ["aa", "aa"], "a": ["a"]}


def test_encode_feeds_packing(spark):
    """The tokenizer story end-to-end: trained merges -> encode ->
    pack via counts_col/tokens_col; rendered sequences reassemble the
    encoded stream."""
    from sparker_spark.llm.packing import SequencePacking

    docs = _docs(spark)
    merges = BPE.train_local(docs, 6)
    enc = BPE.encode(docs, merges)
    plan = SequencePacking.pack_plan(enc, 8, counts_col="n_tokens")
    seqs = SequencePacking.pack_texts(
        enc, plan, 8, tokens_col="tokens", sep="<s>"
    ).collect()
    stream = " ".join(
        r["text"] for r in sorted(seqs, key=lambda r: r["seq_id"])
    )
    toks = [t for t in stream.split() if t != "<s>"]
    enc_rows = enc.orderBy("doc_id").collect()
    expect = [t for r in enc_rows for t in r["tokens"]]
    assert toks == expect


def test_vocab_ids_layout_and_unknowns(spark):
    from sparker_spark.llm.bpe import BPEVocab

    docs = _docs(spark)
    merges = BPE.train_local(docs, 4)
    vocab = {
        r["token"]: r["token_id"]
        for r in BPEVocab.build(docs, merges).collect()
    }
    # base chars of the corpus: sorted, ids 0..C-1
    chars = sorted({c for t in CORPUS for c in t.replace(" ", "")})
    for i, c in enumerate(chars):
        assert vocab[c] == i
    # merged symbols follow in rank order
    for r in merges.orderBy("rank").collect():
        assert vocab[r["merged"]] == len(chars) + r["rank"] - 1
    # unseen character maps to unk
    unseen = spark.createDataFrame([(0, "loZw"), (1, "")], ["doc_id", "text"])
    enc = BPE.encode(unseen, merges)
    ids = {
        r["doc_id"]: list(r["token_ids"])
        for r in BPEVocab.encode_ids(enc, BPEVocab.build(docs, merges)).collect()
    }
    assert -1 in ids[0]  # 'Z' unseen
    assert ids[1] == []  # empty doc -> empty ids, not [null]


def test_prepare_training_data_bpe_merges(spark):
    """The two-call story: train merges, hand them to
    prepare_training_data — packed sequences are BPE token streams of
    the curation survivors."""
    from sparker_spark.pretrain import prepare_training_data

    docs = _docs(spark)
    merges = BPE.train_local(docs, 6)
    out = prepare_training_data(
        docs,
        seq_len=16,
        redact=False,
        min_quality=None,
        max_top_ngram_frac=None,
        max_dup_ngram_frac=None,
        exact_dedup=True,
        jaccard_threshold=None,
        bpe_merges=merges,
    ).collect()
    stream = " ".join(
        r["text"] for r in sorted(out, key=lambda r: r["seq_id"])
    )
    toks = [t for t in stream.split() if t != "<|sep|>"]
    enc = BPE.encode(docs, merges).orderBy("doc_id").collect()
    expect = [t for r in enc for t in r["tokens"]]
    assert toks == expect
    # mutual exclusion with the other tokenization modes
    with pytest.raises(ValueError, match="at most one"):
        prepare_training_data(
            docs, seq_len=16, bpe_merges=merges,
            tokenizer=lambda c: c,
        )


def test_vertical_tab_whitespace_portability(spark):
    """Regression (r8 review): \\x0B is whitespace under Java's \\s but
    not RE2/DuckDB's — word_vocab, the encoder's Python splitter, and
    the SQL oracles all use the SAME explicit class (which names \\x0B
    as a member), so every engine splits 'a\\x0bb' identically
    (verified against DuckDB's regexp_split_to_array in the gates)."""
    docs = spark.createDataFrame([(0, "a\x0bb c")], ["doc_id", "text"])
    words = {r["word"] for r in BPE.word_vocab(docs).collect()}
    assert words == {"a", "b", "c"}
    merges = spark.createDataFrame(
        [], "rank int, left string, right string, merged string"
    )
    enc = BPE.encode(docs, merges).collect()[0]
    assert list(enc["tokens"]) == ["a", "b", "c"]


def test_codepoint_split_non_bmp(spark):
    """Regression (r9 ADVICE): _chars must split by CODEPOINT, not
    UTF-16 code unit — a non-BMP character (emoji) is ONE symbol on
    every path (distributed state init, train_local's tuple(word),
    the encoder's list(word)), so trained merges and encodings agree
    across paths and with the DuckDB oracles' regexp_extract_all
    (word, '.')."""
    emoji_docs = spark.createDataFrame(
        [(0, "a\U0001f600b a\U0001f600b a\U0001f600b xy")],
        ["doc_id", "text"],
    )
    from sparker_spark.llm.bpe import _chars

    cs = (
        emoji_docs.select(_chars(F.col("text")).alias("c")).first()["c"]
    )
    assert "\U0001f600" in cs  # one symbol, not two surrogate halves
    dist = [
        (r["left"], r["right"])
        for r in BPE.train(emoji_docs, 2, min_count=2)
        .orderBy("rank")
        .collect()
    ]
    loc = [
        (r["left"], r["right"])
        for r in BPE.train_local(emoji_docs, 2, min_count=2)
        .orderBy("rank")
        .collect()
    ]
    assert dist == loc and dist[0] == ("a", "\U0001f600")


def test_encode_preserves_id_type(spark):
    """Regression (r9 ADVICE): encode's output schema derives from the
    input id column type — string ids flow through instead of being
    coerced to long inside mapInPandas."""
    docs = spark.createDataFrame(
        [("k1", "th th"), ("k2", "x")], "doc_id string, text string"
    )
    merges = spark.createDataFrame(
        [(1, "t", "h", "th")],
        "rank int, left string, right string, merged string",
    )
    enc = BPE.encode(docs, merges)
    assert dict(enc.dtypes)["doc_id"] == "string"
    rows = {r["doc_id"]: list(r["tokens"]) for r in enc.collect()}
    assert rows == {"k1": ["th", "th"], "k2": ["x"]}


def test_vocab_dedups_colliding_merge_strings(spark):
    """Regression (r9 ADVICE): two distinct merges can concatenate to
    the same string (('ab','c') and ('a','bc') both yield 'abc');
    BPEVocab keeps ONE row per token (lowest id) so encode_ids' join
    never duplicates positions."""
    from sparker_spark.llm.bpe import BPEVocab

    docs = spark.createDataFrame([(0, "abc abc")], ["doc_id", "text"])
    merges = spark.createDataFrame(
        [
            (1, "a", "b", "ab"),
            (2, "b", "c", "bc"),
            (3, "ab", "c", "abc"),
            (4, "a", "bc", "abc"),
        ],
        "rank int, left string, right string, merged string",
    )
    vocab = BPEVocab.build(docs, merges)
    toks = [r["token"] for r in vocab.collect()]
    assert len(toks) == len(set(toks))
    out = BPEVocab.encode_ids(BPE.encode(docs, merges), vocab).collect()[0]
    # 'abc abc' encodes to two 'abc' tokens; ids must not duplicate
    assert out["n_tokens"] == 2 and len(out["token_ids"]) == 2


# ------------------------------------------------- byte-level mode


def test_bytes_to_unicode_bijection():
    """The GPT-2 stand-in alphabet is a bijection over all 256 bytes,
    never collides with the chr(30)/chr(31) oracle wrapping, and
    contains no space (so space-joined token rendering is safe)."""
    from sparker_spark.llm.bpe import bytes_to_unicode, unicode_to_bytes

    b2u = bytes_to_unicode()
    assert sorted(b2u) == list(range(256))
    assert len(set(b2u.values())) == 256
    assert all(len(c) == 1 for c in b2u.values())
    assert " " not in b2u.values()
    assert chr(30) not in b2u.values() and chr(31) not in b2u.values()
    u2b = unicode_to_bytes()
    assert all(u2b[c] == b for b, c in b2u.items())


def test_byte_level_train_local_matches_distributed(spark):
    docs = spark.createDataFrame(
        [(0, "straße straße café"), (1, "café straße no\U0001f600pe")],
        ["doc_id", "text"],
    )
    dist = [
        tuple(r)
        for r in BPE.train(docs, 6, min_count=2, byte_level=True)
        .orderBy("rank")
        .collect()
    ]
    loc = [
        tuple(r)
        for r in BPE.train_local(docs, 6, min_count=2, byte_level=True)
        .orderBy("rank")
        .collect()
    ]
    assert dist == loc and len(dist) > 0


def test_byte_level_encode_unk_free_and_roundtrip(spark):
    """The byte-level guarantee: text with characters ABSENT from
    training still encodes to known ids only (base alphabet covers
    every byte), and byte_decode inverts the tokens."""
    from sparker_spark.llm.bpe import BPEVocab, byte_decode

    train_docs = spark.createDataFrame(
        [(0, "the then there other")], ["doc_id", "text"]
    )
    merges = BPE.train_local(train_docs, 4, byte_level=True)
    unseen = spark.createDataFrame(
        [(0, "σπάρκ \U0001f680 zebra­!")], ["doc_id", "text"]
    )
    enc = BPE.encode(unseen, merges, byte_level=True)
    vocab = BPEVocab.build(train_docs, merges, byte_level=True)
    out = BPEVocab.encode_ids(enc, vocab).collect()[0]
    assert out["n_tokens"] > 0
    assert all(i >= 0 for i in out["token_ids"]), out["token_ids"]
    # ids 0..255 are exactly the byte values; merges follow at 256+
    vrows = {r["token"]: r["token_id"] for r in vocab.collect()}
    assert vrows["a"] == ord("a") and len(vrows) == 256 + merges.count()
    # round-trip: the concatenated byte stream reassembles the exact
    # input words (per-token decode would split codepoints — tokens
    # are BYTE spans, the GPT-2 semantics; byte_decode on a token
    # whose span covers whole codepoints also works, e.g. 'zebra')
    from sparker_spark.llm.bpe import unicode_to_bytes

    u2b = unicode_to_bytes()
    toks = enc.collect()[0]["tokens"]
    stream = bytes(u2b[c] for t in toks for c in t)
    assert stream.decode("utf-8") == "σπάρκ\U0001f680zebra­!"
    assert byte_decode("zebra") == "zebra"


def test_prepare_training_data_byte_level(spark):
    """byte_level=True threads through prepare_training_data: packed
    input_ids equal the direct encode->ids->plan->pack composition and
    contain no unk."""
    from pyspark.sql import functions as F
    from sparker_spark.pretrain import prepare_training_data

    docs = spark.createDataFrame(
        [(i, f"the thing n{i} café is the thing") for i in range(8)],
        ["doc_id", "text"],
    )
    merges = BPE.train_local(docs, 5, byte_level=True)
    out = prepare_training_data(
        docs,
        seq_len=16,
        redact=False,
        exact_dedup=False,
        jaccard_threshold=None,
        max_top_ngram_frac=None,
        max_dup_ngram_frac=None,
        bpe_merges=merges,
        return_ids=True,
        byte_level=True,
    )
    rows = out.orderBy("seq_id").collect()
    assert rows and all(
        i >= -1 for r in rows for i in r["input_ids"]
    )  # -1 only as the sep_id sentinel
    flat = [i for r in rows for i in r["input_ids"] if i != -1]
    assert flat and all(i >= 0 for i in flat)


# ------------------------------------------------- batched training
# State-level harness: the sequential reference and a batched trainer
# that drives BPE._select_batch, both over an explicit (word -> symbol
# tuple, count) state so adversarial multi-char-symbol states can be
# injected directly.


def _seq_train_state(state, counts, k, min_count=2):
    merges = []
    for _ in range(k):
        pc = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + counts[w]
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((a, b))
        state = {w: tuple(_ref_merge(list(s), a, b)) for w, s in state.items()}
    return merges


def _batched_train_state(state, counts, k, batch_pairs, min_count=2):
    merges = []
    # the real trainers' invariant: every multi-codepoint symbol in
    # the state came from a RECORDED merge (base symbols are single
    # codepoints) — injected mid-training states must reflect it
    merged_seen = {
        s for syms in state.values() for s in syms if len(s) >= 2
    }
    while len(merges) < k:
        pc = {}
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pc[p] = pc.get(p, 0) + counts[w]
        if not pc:
            break
        ordered = sorted(
            ((a, b, n) for (a, b), n in pc.items()),
            key=lambda p: (-p[2], p[0], p[1]),
        )
        if ordered[0][2] < min_count:
            break
        kept = BPE._select_batch(
            ordered,
            complete=True,
            batch_pairs=batch_pairs,
            remaining=k - len(merges),
            merged_seen=merged_seen,
            min_count=min_count,
        )
        for a, b, _n in kept:
            merges.append((a, b))
            merged_seen.add(a + b)
            state = {
                w: tuple(_ref_merge(list(s), a, b))
                for w, s in state.items()
            }
    return merges


def test_batched_matches_sequential_randomized():
    """The batch-selection soundness property: for ANY corpus, the
    batched trainer produces EXACTLY the sequential trainer's merge
    table (same pairs, same order). 300 seeded random corpora over a
    tiny alphabet (maximal pair-interaction pressure)."""
    import random

    for seed in range(300):
        rng = random.Random(seed)
        words = [
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(2, 12))
        ]
        counts = {w: rng.randint(1, 9) for w in words}
        state = {w: tuple(w) for w in counts}
        k = rng.randint(1, 12)
        bp = rng.choice([2, 3, 4, 8])
        seq = _seq_train_state(dict(state), counts, k)
        bat = _batched_train_state(dict(state), counts, k, bp)
        assert bat == seq, (seed, bp, counts, seq, bat)


def test_batched_tie_with_created_pair():
    """Adversarial construction: merging (a,z) creates (az,y) whose
    count TIES a disjoint accepted pair (b,k) and whose left symbol
    'az' sorts BEFORE 'b' — the naive disjoint-prefix batch would emit
    (b,k) second where the sequential trainer emits (az,y). The
    strict-count truncation must catch it."""
    state = {
        "xazy": ("x", "a", "z", "y"),
        "az": ("a", "z"),
        "bk": ("b", "k"),
    }
    counts = {"xazy": 90, "az": 10, "bk": 91}
    seq = _seq_train_state(dict(state), counts, 3)
    for bp in (2, 3, 8):
        assert _batched_train_state(dict(state), counts, 3, bp) == seq


def test_batched_merged_symbol_collision():
    """Adversarial construction: 'ab' already exists as a symbol, so
    merging (a,b) INCREASES the count of the existing pair (x,ab) —
    the one case where an old pair's count can grow. The merged-seen /
    existing-merge collision stop must prevent batching across it."""
    # first merge creates 'ab'; later state then hits the collision
    state = {
        "xab": ("x", "a", "b"),
        "xAB": ("x", "ab"),
        "cd": ("c", "d"),
        "ab2": ("a", "b"),
    }
    counts = {"xab": 90, "xAB": 90, "cd": 91, "ab2": 10}
    seq = _seq_train_state(dict(state), counts, 4)
    for bp in (2, 3, 8):
        assert _batched_train_state(dict(state), counts, 4, bp) == seq


def test_batched_randomized_with_multichar_states():
    """Randomized states that START with multi-char symbols (as mid-
    training states do), driving the merged-string collision paths."""
    import random

    for seed in range(200):
        rng = random.Random(10_000 + seed)
        alphabet = ["a", "b", "c", "ab", "bc", "abc"]
        words = {}
        for wi in range(rng.randint(2, 10)):
            syms = tuple(
                rng.choice(alphabet) for _ in range(rng.randint(1, 5))
            )
            words[f"w{wi}"] = syms
        counts = {w: rng.randint(1, 9) for w in words}
        k = rng.randint(1, 10)
        bp = rng.choice([2, 4, 8])
        # pre-seed merged_seen as if ab/bc/abc came from earlier merges
        seq = _seq_train_state(dict(words), counts, k)
        bat = _batched_train_state(dict(words), counts, k, bp)
        assert bat == seq, (seed, bp, words, counts, seq, bat)


def test_spark_batched_train_matches_sequential(spark):
    docs = _docs(spark)
    seq = [
        tuple(r)
        for r in BPE.train(docs, 8).orderBy("rank").collect()
    ]
    for bp in (3, 8):
        bat = [
            tuple(r)
            for r in BPE.train(docs, 8, batch_pairs=bp)
            .orderBy("rank")
            .collect()
        ]
        assert bat == seq, (bp, seq, bat)


def test_spark_batched_byte_level(spark):
    docs = spark.createDataFrame(
        [(0, "straße straße café café the the then")], ["doc_id", "text"]
    )
    seq = [
        tuple(r)
        for r in BPE.train(docs, 6, byte_level=True)
        .orderBy("rank")
        .collect()
    ]
    bat = [
        tuple(r)
        for r in BPE.train(docs, 6, byte_level=True, batch_pairs=4)
        .orderBy("rank")
        .collect()
    ]
    assert bat == seq


def test_train_local_batched_matches(spark):
    docs = _docs(spark)
    seq = [
        tuple(r)
        for r in BPE.train_local(docs, 8).orderBy("rank").collect()
    ]
    bat = [
        tuple(r)
        for r in BPE.train_local(docs, 8, batch_pairs=8)
        .orderBy("rank")
        .collect()
    ]
    assert bat == seq


def test_resume_equals_uninterrupted(spark):
    """train(D, n, resume_merges=prefix_of_its_own_merges) must equal
    train(D, n) for ANY prefix — including one that splits a batch —
    because _apply_ranked_passes replays the exact training-state
    evolution (rank-order single passes; re-exposed earlier pairs stay
    unmerged)."""
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the the the banana bandana banana"),
            (2, "aaaa aaa aa a abab ababab"),
            (3, "low lower lowest newer newest wider widest"),
        ]
        * 5,
        ["doc_id", "text"],
    )
    full = [
        tuple(r)
        for r in BPE.train(docs, 24, byte_level=True, batch_pairs=6)
        .orderBy("rank")
        .collect()
    ]
    for cut in (1, 7, 12, 23):
        prefix = [(k, l, r) for k, l, r, _m in full if k <= cut]
        resumed = [
            tuple(r)
            for r in BPE.train(
                docs,
                24,
                byte_level=True,
                batch_pairs=6,
                resume_merges=prefix,
            )
            .orderBy("rank")
            .collect()
        ]
        assert resumed == full, (cut, full, resumed)


def test_resume_rejects_gapped_ranks(spark):
    docs = spark.createDataFrame([(0, "ab ab ab ab")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        BPE.train(docs, 4, resume_merges=[(2, "a", "b")])


def test_apply_ranked_passes_skips_reexposed_pair():
    """A pair re-exposed AFTER its rank has passed must stay unmerged
    — the point where training-state replay differs from the priority
    encoder."""
    # merges: 1=(a,b)->ab  2=(c,ab)->cab  3=(x,c)->xc
    # word 'xcab': rank1 fires -> [x,c,ab]; rank2 fires -> [x,cab];
    # rank3's pair (x,c) was consumed before it could fire at rank 3?
    # no — after rank2 the word is [x,cab]: (x,c) never adjacent again.
    rank_of = {("a", "b"): 1, ("c", "ab"): 2, ("x", "c"): 3}
    assert BPE._apply_ranked_passes(list("xcab"), rank_of) == ["x", "cab"]
    # word 'cxab': rank1 -> [c,x,ab]; rank2 pair (c,ab) NOT adjacent;
    # rank3 pair (x,c) NOT adjacent (order is c,x) -> stops.
    assert BPE._apply_ranked_passes(list("cxab"), rank_of) == [
        "c",
        "x",
        "ab",
    ]
    # re-exposure: merges 1=(b,c) 2=(a,b). word 'abc': rank1 fires
    # -> [a, bc]; rank2's (a,b) is gone. word 'abbc': rank1 ->
    # [a,b,bc]; rank2 fires -> [ab, bc]. Now suppose merge 3=(a,b)
    # cannot exist twice — instead check a LOWER rank re-exposed:
    # merges 1=(a,b) 2=(b,c). word 'abbcb' + later exposure of (a,b)
    # via rank2 cannot happen (merges only create new symbols), but
    # (b,c) exposed by rank1? 'ab' consumed b. Use the classic case:
    # merges 1=(b,b) 2=(a,b). 'abb': rank1 -> [a, bb]; (a,b) gone.
    assert BPE._apply_ranked_passes(
        list("abb"), {("b", "b"): 1, ("a", "b"): 2}
    ) == ["a", "bb"]


# ------------------------------------------- incremental trainer
def test_incremental_matches_reference(spark):
    got = [
        (r["left"], r["right"])
        for r in BPE.train_incremental(_docs(spark), 8)
        .orderBy("rank")
        .collect()
    ]
    assert got == ref_train(_word_counts(), 8)
    assert len(got) == 8


def test_incremental_matches_local_and_distributed(spark):
    docs = _docs(spark)
    inc = [
        tuple(r)
        for r in BPE.train_incremental(docs, 6).orderBy("rank").collect()
    ]
    loc = [
        tuple(r) for r in BPE.train_local(docs, 6).orderBy("rank").collect()
    ]
    dist = [tuple(r) for r in BPE.train(docs, 6).orderBy("rank").collect()]
    assert inc == loc == dist and len(inc) == 6


def test_incremental_byte_level_matches_local(spark):
    docs = spark.createDataFrame(
        [(0, "straße straße café"), (1, "café straße no\U0001f600pe")],
        ["doc_id", "text"],
    )
    inc = [
        tuple(r)
        for r in BPE.train_incremental(docs, 6, byte_level=True)
        .orderBy("rank")
        .collect()
    ]
    loc = [
        tuple(r)
        for r in BPE.train_local(docs, 6, byte_level=True)
        .orderBy("rank")
        .collect()
    ]
    assert inc == loc and len(inc) > 0


def test_incremental_randomized_matches_local(spark):
    """Randomized corpora sweep the incremental bookkeeping (lazy-heap
    staleness, occurrence-index maintenance, self-pairs, counts hitting
    zero) against train_local's recount-everything sequential loop."""
    import random

    for seed in range(6):
        rng = random.Random(7000 + seed)
        vocab = ["ab", "abc", "aab", "bba", "cab", "abab", "aa", "bb", "c"]
        docs_rows = []
        for di in range(rng.randint(2, 5)):
            text = " ".join(
                rng.choice(vocab) for _ in range(rng.randint(3, 12))
            )
            docs_rows.append((di, text))
        docs = spark.createDataFrame(docs_rows, ["doc_id", "text"])
        k = rng.randint(1, 12)
        inc = [
            tuple(r)
            for r in BPE.train_incremental(docs, k).orderBy("rank").collect()
        ]
        loc = [
            tuple(r)
            for r in BPE.train_local(docs, k).orderBy("rank").collect()
        ]
        assert inc == loc, (seed, k, docs_rows, inc, loc)


def test_incremental_min_count_floor_and_observer(spark):
    # every pair is a singleton -> zero merges at the default floor
    docs = spark.createDataFrame([(0, "qwx yzj")], ["doc_id", "text"])
    assert BPE.train_incremental(docs, 10).count() == 0
    # observer sees every learned merge in rank order with its count
    seen = []
    BPE.train_incremental(
        _docs(spark),
        4,
        observer=lambda k, l, r, n: seen.append((k, l, r, n)),
    )
    assert [s[0] for s in seen] == [1, 2, 3, 4]
    want = ref_train(_word_counts(), 4)
    assert [(l, r) for _, l, r, _ in seen] == want
    assert all(n >= 2 for *_, n in seen)


def test_incremental_cap_guard(spark):
    with pytest.raises(ValueError, match="vocab_cap"):
        BPE.train_incremental(_docs(spark), 2, vocab_cap=3)
