"""One-call pretraining data preparation: raw documents in, packed
training sequences out.

``prepare_training_data`` composes the two public pipeline APIs this
engine ships — :func:`sparker_spark.curate.curate` (boilerplate / PII
/ quality / dedup / decontamination) and
:class:`sparker_spark.llm.packing.SequencePacking` (the concat-and-
chunk layout) — into the end-to-end flow a pretraining run actually
executes:

    raw docs -> cleaned corpus -> (seq_id, n_docs, n_tokens, text)

Every stage is an oracle-gated operator (see curate.py / packing.py
for the per-stage plan rationale); this module adds composition only.
The packing order is ascending doc_id over the SURVIVING documents —
deterministic for a given corpus + knobs, which is what makes training
runs reproducible.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparker_spark.curate import curate
from sparker_spark.llm.packing import SequencePacking


def prepare_training_data(
    documents: DataFrame,
    seq_len: int,
    eval_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep_tokens: int = 1,
    sep: str = "<|sep|>",
    return_plan: bool = False,
    tokenizer: Callable[[Column], Column] | None = None,
    token_counts: DataFrame | None = None,
    bpe_merges: DataFrame | None = None,
    return_ids: bool = False,
    sep_id: int = -1,
    byte_level: bool = False,
    max_doc_tokens: int | None = None,
    **curate_knobs,
) -> DataFrame:
    """Cleaned, packed training sequences
    ``(seq_id, n_docs, n_tokens, text)``.

    * ``seq_len`` / ``sep_tokens`` / ``sep``: the packing layout
      (packing.SequencePacking semantics; separators are reserved in
      the offsets and rendered at their in-sequence positions).
    * ``eval_docs`` + ``**curate_knobs``: forwarded to
      :func:`curate` (quality floor, repetition filter, near-dup
      threshold, boilerplate removal, decontamination, ...).
    * ``tokenizer``: a Column -> Column(array) expression replacing
      the whitespace default for BOTH the plan's counts and the
      materialized slices — how a BPE-ish regex (or any Spark-
      expressible tokenization) plugs in consistently. Applied to the
      CURATED text, so it composes with redaction/boilerplate.
    * ``token_counts``: a precomputed ``(id_col, n)`` relation from an
      EXTERNAL tokenizer run; the plan lays out the curation survivors
      under those counts (inner join — every surviving doc must have a
      count). The engine cannot materialize text slices for a
      tokenization it didn't perform, so this requires
      ``return_plan=True`` (the plan is the artifact to persist when
      one corpus feeds several tokenizations); it is also mutually
      exclusive with ``tokenizer``. NOTE: external counts are counts
      of the text as tokenized OUTSIDE this call — disable the
      text-mutating stages (``redact=False``, no boilerplate removal)
      or the counts will describe different bytes than the survivors.
    * ``bpe_merges``: a merge table from :class:`sparker_spark.llm.
      bpe.BPE` (``train_incremental`` / ``train`` / ``train_local`` —
      identical tables; ``train_incremental`` is the production-budget
      path, 32k byte-level merges in ~5 min, SCALING.md round 11) —
      the CURATED corpus is BPE-encoded (priority encoder,
      Arrow-batched) and the packed sequences are streams of BPE
      tokens. The full story in two calls::

          merges = BPE.train_incremental(docs, 32_000, byte_level=True)
          seqs = prepare_training_data(docs, 4096, bpe_merges=merges,
                                       byte_level=True)

      With ``return_ids=True`` the output is the TRAINABLE relation
      ``(seq_id, n_docs, n_tokens, input_ids: array<long>)``: token
      ids under the deterministic BPEVocab layout (sorted base chars,
      merges by rank; ``sep_id`` at in-sequence separator positions).
      Requires ``bpe_merges``.

      ``byte_level=True`` (with ``bpe_merges`` trained byte-level)
      encodes over the fixed 256-byte base alphabet — ids are byte
      values 0..255 then merges, and NO input can produce an unknown
      id (the production-tokenizer guarantee).

    * ``return_plan=True`` returns the (seq_id, doc_id, tok_start,
      tok_end, n_toks, seq_pos) plan relation instead of materialized
      text.
    """
    n_tok_modes = sum(
        x is not None for x in (tokenizer, token_counts, bpe_merges)
    )
    if n_tok_modes > 1:
        raise ValueError(
            "pass at most one of tokenizer, token_counts, bpe_merges"
        )
    if token_counts is not None and not return_plan:
        raise ValueError(
            "token_counts (an external tokenization) requires "
            "return_plan=True — text slices cannot be materialized for "
            "a tokenizer this engine did not run"
        )
    clean = curate(
        documents,
        eval_docs=eval_docs,
        id_col=id_col,
        text_col=text_col,
        **curate_knobs,
    )
    counts_col = None
    tokens_col = None
    if token_counts is not None:
        clean = clean.join(
            token_counts.select(
                F.col(id_col), F.col("n").alias("_ext_n")
            ),
            id_col,
        )
        counts_col = "_ext_n"
    if return_ids and bpe_merges is None:
        raise ValueError("return_ids=True requires bpe_merges")
    if bpe_merges is not None:
        from sparker_spark.llm.bpe import BPE, BPEVocab

        encoded = BPE.encode(
            clean,
            bpe_merges,
            text_col=text_col,
            id_col=id_col,
            byte_level=byte_level,
        ).withColumnRenamed("doc_id", id_col)
        if return_ids:
            vocab = BPEVocab.build(
                clean,
                bpe_merges,
                text_col=text_col,
                byte_level=byte_level,
            )
            clean = BPEVocab.encode_ids(
                encoded.withColumnRenamed(id_col, "doc_id"), vocab
            ).withColumnRenamed("doc_id", id_col)
            counts_col, tokens_col = "n_tokens", "token_ids"
        else:
            clean = encoded
            counts_col, tokens_col = "n_tokens", "tokens"
    plan = SequencePacking.pack_plan(
        clean,
        seq_len,
        text_col=text_col,
        id_col=id_col,
        sep_tokens=sep_tokens,
        tokenizer=tokenizer,
        counts_col=counts_col,
        max_doc_tokens=max_doc_tokens,
    )
    if return_plan:
        return plan
    if return_ids:
        return SequencePacking.pack_token_ids(
            clean,
            plan,
            seq_len,
            tokens_col,
            id_col=id_col,
            sep_id=sep_id,
            sep_tokens=sep_tokens,
            max_doc_tokens=max_doc_tokens,
        )
    return SequencePacking.pack_texts(
        clean,
        plan,
        seq_len,
        text_col=text_col,
        id_col=id_col,
        sep=sep,
        sep_tokens=sep_tokens,
        tokenizer=tokenizer,
        tokens_col=tokens_col,
        max_doc_tokens=max_doc_tokens,
    )
