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

from pyspark.sql import DataFrame

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
    * ``return_plan=True`` returns the (seq_id, doc_id, tok_start,
      tok_end, n_toks, seq_pos) plan relation instead of materialized
      text — the form to persist when the same corpus feeds several
      tokenizations.
    """
    clean = curate(
        documents,
        eval_docs=eval_docs,
        id_col=id_col,
        text_col=text_col,
        **curate_knobs,
    )
    plan = SequencePacking.pack_plan(
        clean,
        seq_len,
        text_col=text_col,
        id_col=id_col,
        sep_tokens=sep_tokens,
    )
    if return_plan:
        return plan
    return SequencePacking.pack_texts(
        clean,
        plan,
        seq_len,
        text_col=text_col,
        id_col=id_col,
        sep=sep,
        sep_tokens=sep_tokens,
    )
