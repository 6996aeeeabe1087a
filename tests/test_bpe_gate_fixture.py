"""The two properties that make the bpe_encode_fixed oracle exact
(entry_r8.BPE_FIXED_MERGES): asserted structurally AND verified
empirically on the real corpus vocabulary.

Property 1 (replace == one greedy pass): every pair has left != right,
so occurrences of the wrapped pattern cannot overlap and a
simultaneous string replace equals the left-to-right non-overlapping
merge pass.

Property 2 (rank order == priority encode): no merge's RESULT equals a
LATER-applied... precisely: for i < j, result_j is not an operand of
pair_i — so applying merges once each in rank order can never miss a
pair that priority encoding (BPE.encode's loop) would still find.
"""

from sparker_spark.entry_r8 import BPE_FIXED_MERGES
from sparker_spark.llm.bpe import BPE


def _rank_order_encode(word: str):
    syms = list(word)
    for a, b in BPE_FIXED_MERGES:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_fixture_structural_properties():
    results = [a + b for a, b in BPE_FIXED_MERGES]
    for i, (a, b) in enumerate(BPE_FIXED_MERGES):
        # property 1
        assert a != b, f"pair {i} violates left != right"
        # operands are single chars or earlier results (cascade order)
        for op in (a, b):
            assert len(op) == 1 or op in results[:i], (
                f"pair {i} operand {op!r} not available at its rank"
            )
    # property 2: a later result never equals an earlier pair's operand
    for i, (a, b) in enumerate(BPE_FIXED_MERGES):
        for j in range(i + 1, len(BPE_FIXED_MERGES)):
            assert results[j] not in (a, b), (
                f"result of rank {j + 1} re-exposes pair {i + 1}"
            )


def test_priority_equals_rank_order_on_corpus(spark):
    """Empirical closure: for every distinct word in the sf0.001
    documents corpus, the priority encoder (what the gated query runs)
    and the rank-order replay (what the SQL oracle computes) produce
    identical token sequences."""
    from sparker_spark.entry import load

    rank_of = {p: r for r, p in enumerate(BPE_FIXED_MERGES)}
    words = [
        r["word"]
        for r in BPE.word_vocab(
            load(spark, "/root/testdata/sf0.001", "documents")
        )
        .select("word")
        .collect()
    ]
    assert len(words) > 10
    # plus adversarial constructions exercising every merge and their
    # adjacency interactions (the synthetic corpus vocab is small)
    words += [
        "the", "then", "there", "and", "ander", "onion", "rere",
        "thethe", "inthe", "andon", "rethere", "ananan", "thandon",
        "xtheryz", "ererer", "intherein",
    ]
    for w in words:
        assert BPE._encode_word(w, rank_of) == _rank_order_encode(w), w
