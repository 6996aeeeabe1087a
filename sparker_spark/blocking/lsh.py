"""Profile-level MinHash-LSH blocking — parity with the reference's
old_versions tree (old_versions/sparker/.../BlockBuildingMethods/
LSHTwitter.scala:30-71 ``createBlocks``): each profile's token set gets
a MinHash signature, the signature is banded, and every LSH bucket
becomes a block (instead of one block per token). Near-duplicate
profiles land together even with zero exact token overlap in a band's
view, and the number of blocks is bounded by #profiles × #bands
regardless of vocabulary size.

Spark-first design: the whole operator is three hash aggregations —
token hash, per-profile min per permutation, bucket groupBy — all
map-side combinable; no RDDs, no driver state. The bucket relation is
fed through :meth:`Blocking.blocks_from_keys`, so singleton filtering,
clean-clean source rules, comparison counts, and dense-id assignment
are exactly the same code path every other blocker uses (the reference
separately re-implements the block-building tail, LSHTwitter.scala:64-70).

Hashing is the engine-portable construction from
``sparker_spark.llm.hashing`` (60-bit md5 prefix reduced mod 2^31−1,
seeded affine permutations) so the DuckDB oracle replays signatures
bit-for-bit. Banding uses the reference band-count formula
(``attribute_clustering.band_chunks``: decrement-and-overshoot band
count, sliding chunks, short last band tolerated). The reference
instead delegates to Algebird's ``MinHasher32`` (LSHTwitter.scala:40:
``pickBands`` + byte-sliced buckets) — same (b, r) S-curve family,
different constants; we keep ONE minhash construction across the
whole repo rather than replicating Algebird's byte layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparker_spark.attribute_clustering import band_chunks
from sparker_spark.blocking.blockers import BlockCollection, Blocking
from sparker_spark.llm.hashing import (
    MERSENNE_31,
    SPARK_HASH60,
    minhash_coefficients,
    minhash_expr,
)


class LSHBlocking:
    @staticmethod
    def profile_signatures(
        keys: DataFrame, num_hashes: int, seed: int = 1234
    ) -> DataFrame:
        """(profile_id, source_id, mh_0..mh_{k-1}) MinHash signatures
        over each profile's key set.

        ``keys``: (profile_id, source_id, key) from any
        BlockingKeysStrategies generator — the tokenizer stays the
        caller's choice, like every other blocker (the reference
        hard-codes its tokenizer inside the LSH blocker,
        LSHTwitter.scala:44-48).

        One shuffle: hash each key (map-side), then
        groupBy(profile) with k partial-aggregable mins. The reference
        builds per-token Algebird signatures and monoid-merges them in
        a groupByKey (LSHTwitter.scala:50-56) — same result, but
        groupByKey ships every token signature; the min-aggregate
        combines map-side.
        """
        coeffs = minhash_coefficients(num_hashes, seed)
        hashed = keys.withColumn(
            "h31", F.expr(SPARK_HASH60.format(x="key")) % MERSENNE_31
        )
        aggs = [
            F.min(F.expr(minhash_expr(a, b))).alias(f"mh_{i}")
            for i, (a, b) in enumerate(coeffs)
        ]
        return hashed.groupBy("profile_id", "source_id").agg(*aggs)

    @staticmethod
    def bucket_keys(
        sigs: DataFrame, num_hashes: int, target_threshold: float
    ) -> DataFrame:
        """Band the signatures into LSH buckets: one output row per
        (profile, band), key = '{band_index}_{band signature values}'
        (equality is all that matters downstream; hashing the string,
        as Algebird's buckets do, saves nothing but cross-engine
        portability)."""
        chunks = band_chunks(num_hashes, target_threshold)
        bucket_cols = F.array(
            *[
                F.concat_ws(
                    "_",
                    F.lit(bi),
                    *[F.col(f"mh_{start + r}") for r in range(length)],
                )
                for bi, (start, length) in enumerate(chunks)
            ]
        )
        return sigs.select(
            "profile_id",
            "source_id",
            F.explode(bucket_cols).alias("key"),
        )

    @staticmethod
    def create_blocks_lsh(
        keys: DataFrame,
        num_hashes: int = 128,
        target_threshold: float = 0.8,
        clean: bool = False,
        assign_ids: bool = True,
        seed: int = 1234,
    ) -> BlockCollection:
        """LSH blocking end-to-end — LSHTwitter.scala:30-71 semantics:
        signature → bands → one block per bucket with ≥1 comparison
        (dirty: ≥2 members; clean-clean: ≥2 non-empty sources —
        blocks_from_keys applies the same rules the reference's
        BlockDirty/BlockClean filter does, :66-70)."""
        sigs = LSHBlocking.profile_signatures(keys, num_hashes, seed)
        buckets = LSHBlocking.bucket_keys(sigs, num_hashes, target_threshold)
        return Blocking.blocks_from_keys(
            buckets, clean=clean, assign_ids=assign_ids
        )
