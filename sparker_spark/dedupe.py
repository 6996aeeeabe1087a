"""One-call generic dedup API over arbitrary DataFrames.

SURVEY §7.1 M8's north-star wrapper: ``dedupe(df, ...) -> matches``
composes the whole engine (EAV profile load -> blocking -> purging ->
filtering -> edge weighting -> pruning) behind a single function, so a
user with ANY DataFrame gets candidate matches keyed by their own ids
without touching pipeline internals. Every stage is the same
DataFrame-native operator the oracle-checked queries run — this module
adds composition and id round-tripping only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparker_spark.blocking.blockers import Blocking
from sparker_spark.filters import BlockFiltering, BlockPurging
from sparker_spark.metablocking.pruning_utils import (
    ComparisonTypes,
    ThresholdTypes,
    WeightTypes,
)
from sparker_spark.metablocking.weights import EdgeWeighting
from sparker_spark.wrappers import DataFrameWrapper

_PRUNERS = ("wnp", "wep", "cep", "cnp", "none")


def dedupe(
    df: DataFrame,
    id_col: str,
    df2: DataFrame | list[DataFrame] | None = None,
    columns: list[str] | None = None,
    blocking: str = "token",
    ngram_size: int = 3,
    purge_smooth: float = 1.025,
    filter_r: float = 0.8,
    weight_type: str = WeightTypes.CBS,
    pruning: str = "wnp",
    threshold_type: str = ThresholdTypes.AVG,
    comparison_type: str = ComparisonTypes.OR,
) -> DataFrame:
    """Candidate matches for one DataFrame (dirty ER) or across two
    or more (clean-clean ER): ``(id1, id2, weight)`` in the CALLER's
    id space.

    * ``df`` / ``df2``: any DataFrames; ``id_col`` names the unique
      record id in each. With ``df2`` set (a DataFrame, or a LIST of
      DataFrames for k-source clean-clean ER — reference
      old_versions/multi-data-source-sparker), only cross-frame pairs
      are emitted; each frame is its own source. With a single
      ``df2`` DataFrame the output keeps the 2-frame contract
      (``id1`` from ``df``, ``id2`` from ``df2``); with a LIST the
      output additionally carries ``source1``/``source2`` (0 = ``df``,
      i = ``df2[i-1]``, always ``source1 < source2``) so pairs stay
      attributable when frames share an id namespace.
    * ``columns``: attribute subset to block on (default: all except
      the id column).
    * ``blocking``: ``"token"`` (schema-agnostic token blocking) or
      ``"ngram"`` (character n-grams of size ``ngram_size``).
    * ``purge_smooth`` / ``filter_r``: the reference's block purging
      and filtering knobs (SURVEY §2.4); ``None`` skips the stage.
    * ``weight_type`` + ``pruning`` (+ threshold/comparison): any of
      the engine's six edge weights and WNP/WEP/CEP/CNP pruners;
      ``pruning="none"`` returns the full weighted edge relation.
    """
    from sparker_spark.blocking.strategies import BlockingKeysStrategies

    if pruning not in _PRUNERS:
        raise ValueError(f"pruning must be one of {_PRUNERS}")

    def prep(frame: DataFrame, source_id: int, start_id: int) -> DataFrame:
        use = frame if columns is None else frame.select(id_col, *columns)
        return DataFrameWrapper.load_profiles(
            use, start_id_from=start_id, real_id_field=id_col, source_id=source_id
        )

    extra = (
        [] if df2 is None else (df2 if isinstance(df2, list) else [df2])
    )
    clean = bool(extra)
    # an empty df2 list is a dirty-ER run: without this guard it would
    # take the k-source output shape (source1/source2 columns) while
    # clean=False, contradicting the documented list contract
    multi = clean and isinstance(df2, list)
    # Per-frame id offsets from each frame's OWN row count — one cheap
    # independent job per frame over the raw input. (Deriving the
    # offset from max(profile_id) of the growing union re-executes the
    # whole melt lineage of every earlier frame per step: O(k²).)
    counts = [df.count()] + [f.count() for f in extra]
    starts = [0]
    for c in counts[:-1]:
        starts.append(starts[-1] + c)
    profiles = prep(df, 0, starts[0])
    for i, frame in enumerate(extra, start=1):
        profiles = profiles.unionByName(prep(frame, i, starts[i]))
    profiles = profiles.cache()

    if blocking == "token":
        keys = BlockingKeysStrategies.token_blocking(profiles)
    elif blocking == "ngram":
        keys = BlockingKeysStrategies.ngrams_blocking(profiles, ngram_size=ngram_size)
    else:
        raise ValueError("blocking must be 'token' or 'ngram'")

    blocks = Blocking.blocks_from_keys(keys, clean=clean)
    if purge_smooth is not None:
        blocks = BlockPurging.block_purging(blocks, purge_smooth)
    if filter_r is not None:
        _, pb_filtered, blocks = BlockFiltering.block_filtering_quick(
            blocks, filter_r
        )
    else:
        from sparker_spark.blocking.converters import Converters

        pb_filtered = Converters.blocks_to_profile_blocks(blocks)

    ctx = EdgeWeighting.weighted_edges(blocks, pb_filtered, weight_type)
    if pruning == "wnp":
        from sparker_spark.metablocking.wnp import WNP

        edges = WNP.prune(ctx, threshold_type, comparison_type)
    elif pruning == "wep":
        from sparker_spark.metablocking.wep import WEP

        edges = WEP.prune(ctx)
    elif pruning == "cep":
        from sparker_spark.metablocking.cep import CEP

        edges = CEP.prune(ctx, CEP.num_edges_to_keep(blocks))
    elif pruning == "cnp":
        from sparker_spark.metablocking.cnp import CNP

        n_profiles = profiles.select("profile_id").distinct().count()
        k = CNP.compute_cnp_threshold(blocks, n_profiles)
        edges = CNP.prune(ctx, k, comparison_type=comparison_type)
    else:
        edges = ctx.half()

    # back to the caller's ids (original_id is the stringified id_col);
    # profile ids ascend with source index, and edges hold p1 < p2, so
    # source1 <= source2 (strictly < for clean-clean cross-source)
    ids = profiles.select("profile_id", "original_id", "source_id").distinct()
    out = (
        edges.join(
            ids.select(
                F.col("profile_id").alias("p1"),
                F.col("original_id").alias("id1"),
                F.col("source_id").alias("source1"),
            ),
            "p1",
        )
        .join(
            ids.select(
                F.col("profile_id").alias("p2"),
                F.col("original_id").alias("id2"),
                F.col("source_id").alias("source2"),
            ),
            "p2",
        )
    )
    if multi:
        # k-source mode: frames may share an id namespace — keep the
        # source indexes so every pair stays attributable
        return out.select("id1", "id2", "source1", "source2", "weight")
    return out.select("id1", "id2", "weight")
