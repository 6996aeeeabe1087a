"""Distributed frequency sketches.

Count-min sketch built as a DataFrame aggregate: each input row
explodes into ``depth`` (row, bucket) cells via independent seeded
hashes, one groupBy produces the d×w counter table. The sketch is a
tiny relation (d·w cells) with EXACT merge semantics — cell-wise sum —
so per-partition/per-day sketches combine associatively, which is the
whole point at 100 TB: one pass over the data, constant-size state,
and skew diagnostics (hot blocking keys, heavy-hitter tokens) without
a full groupBy over the key space.

Estimates are the classic one-sided CM guarantee: estimate >= true
count, with overestimate bounded by (e/w)·N at probability 1−(1/e)^d.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparker_spark.llm.hashing import (
    MERSENNE_31,
    hash60,
    minhash_coefficients,
)


def _portable_h31(col: str, dialect: str) -> str:
    """Engine-portable 31-bit base hash of a column (md5-derived, see
    llm/hashing.py). The value is first cast to string so numeric and
    string keys hash identically in Spark and DuckDB."""
    cast = (
        f"CAST({col} AS STRING)" if dialect == "spark" else f"CAST({col} AS VARCHAR)"
    )
    return f"({hash60(cast, dialect)} % {MERSENNE_31})"


def _portable_h60(col: str, dialect: str) -> str:
    """Engine-portable full 60-bit base hash (string-cast first, as
    _portable_h31)."""
    cast = (
        f"CAST({col} AS STRING)" if dialect == "spark" else f"CAST({col} AS VARCHAR)"
    )
    return f"({hash60(cast, dialect)})"


def portable_bucket_sql(j_a_b: tuple[int, int], width: int, h31: str = "_h31") -> str:
    """Affine row hash over a pre-reduced 31-bit base hash — valid in
    both Spark SQL and DuckDB (a·x fits in int64 since a, x < 2^31)."""
    a, b = j_a_b
    return f"((({a} * {h31} + {b}) % {MERSENNE_31}) % {width})"


def _bucket_col(col: str, j: int, width: int, depth: int, seed: int, portable: bool):
    """Row-j bucket column for either hash family."""
    if not portable:
        return F.pmod(F.xxhash64(F.col(col), F.lit(seed + j)), F.lit(width)).alias(
            "bucket"
        )
    coeffs = minhash_coefficients(depth, seed)
    expr = portable_bucket_sql(coeffs[j], width, _portable_h31(col, "spark"))
    return F.expr(expr).cast("long").alias("bucket")


class HyperLogLog:
    """Distributed HyperLogLog distinct-count sketch, engine-portable.

    The register relation is ``(groups..., bucket, r)`` with at most
    m = 2**p rows per group and EXACT merge semantics — cell-wise max —
    so per-partition/per-day register sets combine associatively
    (same reason CountMinSketch scales: one pass, constant-size state).

    Everything is deterministic and expressible in BOTH Spark SQL and
    DuckDB SQL: the base hash is the shared 60-bit md5 hash
    (llm/hashing.py), bucket = h mod m, and rho is computed from the
    remaining 50-bit word via integer bit-length (``length(bin(w))`` in
    both dialects) — no floating-point log in the hot path. The
    estimator keeps the harmonic sum EXACT by accumulating the integer
    numerators ``2^(51-r)`` (sum <= m·2^51 < 2^63) and dividing once,
    so two engines produce bit-identical raw estimates; the classic
    linear-counting small-range correction (E <= 2.5m with empty
    registers -> m·ln(m/V)) branches on that exact raw estimate and
    integer V, so the branch decision is also engine-identical — the
    single ln() is the same (<= 1 ulp) cross-engine exposure as every
    other rounded log output in the oracle surface.
    """

    @staticmethod
    def _rho_sql(w: str) -> str:
        # position of the highest set bit of the 50-bit word, counted
        # from the top (1-based); w = 0 -> 51 (all zeros). Valid in
        # Spark SQL and DuckDB: both ship bin(BIGINT) -> VARCHAR
        # without leading zeros.
        return f"(CASE WHEN {w} = 0 THEN 51 ELSE 51 - length(bin({w})) END)"

    @staticmethod
    def registers(
        df: DataFrame,
        col: str,
        group_cols: tuple[str, ...] = (),
        p: int = 10,
    ) -> DataFrame:
        """One pass -> register relation (groups..., bucket, r)."""
        m = 1 << p
        h = _portable_h60(col, "spark")
        bucket = f"({h} % {m})"
        w = f"({h} div {m})"
        return (
            df.select(
                *group_cols,
                F.expr(bucket).cast("long").alias("bucket"),
                F.expr(HyperLogLog._rho_sql(w)).cast("int").alias("rho"),
            )
            .groupBy(*group_cols, "bucket")
            .agg(F.max("rho").alias("r"))
        )

    @staticmethod
    def merge(*register_sets: DataFrame) -> DataFrame:
        """Cell-wise max — exact, associative, commutative."""
        out = register_sets[0]
        for s in register_sets[1:]:
            out = out.unionByName(s)
        group_cols = [c for c in out.columns if c not in ("r",)]
        return out.groupBy(*group_cols).agg(F.max("r").alias("r"))

    @staticmethod
    def estimate(
        registers: DataFrame,
        group_cols: tuple[str, ...] = (),
        p: int = 10,
    ) -> DataFrame:
        """Registers -> (groups..., n_registers, hll_estimate). The
        harmonic mean is assembled from exact integer numerators; the
        raw estimate's only floating-point step is the final division.
        Below 2.5m with empty registers, linear counting over the
        empty-register count replaces the biased raw value."""
        m = 1 << p
        alpha = 0.7213 / (1 + 1.079 / m)
        # numerator constant alpha * m^2 * 2^51 as one Python double —
        # both engines then evaluate the identical literal / Z division
        c = alpha * float(m) * float(m) * float(1 << 51)
        z_present = F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 51 - r)"))
        n_regs = F.count("*")
        raw = F.lit(c) / (
            z_present + (F.lit(m) - n_regs) * F.lit(1 << 51)
        ).cast("double")
        est = F.when(
            (raw <= F.lit(2.5 * m)) & (n_regs < F.lit(m)),
            F.lit(float(m)) * F.log(F.lit(float(m)) / (F.lit(m) - n_regs)),
        ).otherwise(raw)
        return registers.groupBy(*group_cols).agg(
            n_regs.cast("long").alias("n_registers"),
            est.alias("hll_estimate"),
        )

    @staticmethod
    def duck_sql(
        table: str,
        col: str,
        group_cols: tuple[str, ...] = (),
        p: int = 10,
    ) -> str:
        """The DuckDB oracle replay of registers() + estimate()."""
        m = 1 << p
        alpha = 0.7213 / (1 + 1.079 / m)
        c = alpha * float(m) * float(m) * float(1 << 51)
        h = _portable_h60(col, "duck")
        gsel = "".join(f"{g}, " for g in group_cols)
        gby = f"GROUP BY {', '.join(group_cols)}" if group_cols else ""
        gby_regs = (
            f"GROUP BY {', '.join(group_cols)}, bucket"
            if group_cols
            else "GROUP BY bucket"
        )
        rho = HyperLogLog._rho_sql(f"({h} // {m})")
        raw = (
            f"{c!r} / CAST(sum((1::BIGINT << (51 - r)))"
            f" + ({m} - count(*)) * (1::BIGINT << 51) AS DOUBLE)"
        )
        return f"""
WITH cells AS (
  SELECT {gsel}({h} % {m}) AS bucket, {rho} AS rho
  FROM {table}),
regs AS (
  SELECT {gsel}bucket, max(rho) AS r FROM cells {gby_regs})
SELECT {gsel}CAST(count(*) AS BIGINT) AS n_registers,
       CASE WHEN ({raw}) <= {2.5 * m!r} AND count(*) < {m}
            THEN {float(m)!r} * ln({float(m)!r} / ({m} - count(*)))
            ELSE ({raw}) END AS hll_estimate
FROM regs {gby}"""


class CountMinSketch:
    @staticmethod
    def build(
        df: DataFrame,
        col: str,
        width: int = 1024,
        depth: int = 4,
        seed: int = 1234,
        portable: bool = False,
    ) -> DataFrame:
        """One pass -> sketch relation (j, bucket, n) with d·w rows at
        most. Default hash family: ``xxhash64(value, seed+j)`` — JVM-side,
        no UDFs, the fast path. ``portable=True`` switches to the
        md5-affine family (llm/hashing.py) that any engine can
        reproduce bit-for-bit — sketches built by different systems
        only merge correctly when the hash family matches, and this is
        also what the DuckDB oracle replays for the graded query."""
        rows = F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    _bucket_col(col, j, width, depth, seed, portable),
                )
                for j in range(depth)
            ]
        )
        return (
            df.select(F.explode(rows).alias("cell"))
            .groupBy(F.col("cell.j").alias("j"), F.col("cell.bucket").alias("bucket"))
            .agg(F.count("*").alias("n"))
        )

    @staticmethod
    def merge(*sketches: DataFrame) -> DataFrame:
        """Cell-wise sum — exact, associative, commutative."""
        out = sketches[0]
        for s in sketches[1:]:
            out = out.unionByName(s)
        return out.groupBy("j", "bucket").agg(F.sum("n").alias("n"))

    @staticmethod
    def estimate(
        sketch: DataFrame,
        values: DataFrame,
        col: str,
        width: int = 1024,
        depth: int = 4,
        seed: int = 1234,
        portable: bool = False,
    ) -> DataFrame:
        """Distributed point queries: for each row of ``values``, the
        CM estimate of ``col``'s frequency — min over the d probed
        cells (absent cell = 0). The sketch side is d·w rows, so the
        probe join broadcasts. ``portable`` must match how the sketch
        was built."""
        probes = values.select(
            F.col(col),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            _bucket_col(col, j, width, depth, seed, portable),
                        )
                        for j in range(depth)
                    ]
                )
            ).alias("cell"),
        ).select(col, F.col("cell.j").alias("j"), F.col("cell.bucket").alias("bucket"))
        return (
            probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
            .fillna({"n": 0})
            .groupBy(col)
            .agg(F.min("n").alias("estimate"))
        )


class BloomFilter:
    """Distributed Bloom filter as a relation of set bit positions.

    ``build`` -> at most ``m`` rows of (bit BIGINT); merge is plain
    union-distinct (bitwise OR), so per-partition/per-day filters
    combine associatively like the other sketches. ``contains`` probes
    are k broadcast-joined lookups per value: no false negatives, false
    positives at the classic (1 - e^{-kn/m})^k rate. The k row hashes
    come from the same engine-portable md5-affine family as the
    count-min sketch, so a DuckDB oracle (or any other engine) replays
    the filter bit-for-bit — and at scale the materialized filter is a
    kilobyte-class broadcast standing in for a join against the full
    keyed relation (the classic semi-join pruning pattern).
    """

    @staticmethod
    def _bit_cols(col: str, m: int, k: int, seed: int, dialect: str) -> list[str]:
        coeffs = minhash_coefficients(k, seed)
        h31 = _portable_h31(col, dialect)
        return [portable_bucket_sql(coeffs[j], m, h31) for j in range(k)]

    @staticmethod
    def build(
        df: DataFrame,
        col: str,
        m: int = 8192,
        k: int = 4,
        seed: int = 1234,
    ) -> DataFrame:
        """One pass -> (bit,) distinct set positions."""
        bits = BloomFilter._bit_cols(col, m, k, seed, "spark")
        arr = F.array(*[F.expr(b).cast("long") for b in bits])
        return df.select(F.explode(arr).alias("bit")).distinct()

    @staticmethod
    def merge(*filters: DataFrame) -> DataFrame:
        out = filters[0]
        for f in filters[1:]:
            out = out.unionByName(f)
        return out.distinct()

    @staticmethod
    def contains(
        bloom: DataFrame,
        values: DataFrame,
        col: str,
        m: int = 8192,
        k: int = 4,
        seed: int = 1234,
    ) -> DataFrame:
        """Adds ``maybe_present``: true iff ALL k probed bits are set.
        The filter side is <= m rows — broadcast-joined.

        Probes run over the DISTINCT values: with duplicate value rows
        the per-value hit count would be dup_count·k and the ==k test
        would report a false negative for a genuine member, violating
        the no-false-negative contract. (Duplicate BITS within one
        value's k probes are harmless either way: each exploded row
        joins the bit set independently.)"""
        bits = BloomFilter._bit_cols(col, m, k, seed, "spark")
        arr = F.array(*[F.expr(b).cast("long") for b in bits])
        probes = values.select(col).distinct().select(
            col, F.explode(arr).alias("bit")
        )
        hit = (
            probes.join(F.broadcast(bloom.withColumn("_set", F.lit(1))), "bit", "left")
            .groupBy(col)
            .agg((F.sum(F.coalesce("_set", F.lit(0))) == F.lit(k)).alias("maybe_present"))
        )
        return values.join(hit, col, "left").fillna({"maybe_present": False})

    @staticmethod
    def duck_bits_sql(table: str, col: str, m: int = 8192, k: int = 4,
                      seed: int = 1234) -> str:
        """DuckDB replay of build(): SELECT DISTINCT bit FROM ..."""
        bits = BloomFilter._bit_cols(col, m, k, seed, "duck")
        sel = " UNION ALL ".join(
            f"SELECT {b} AS bit FROM {table}" for b in bits
        )
        return f"SELECT DISTINCT bit FROM ({sel})"


def cm_inner_product(
    sketch_a: DataFrame, sketch_b: DataFrame
) -> DataFrame:
    """Join-size estimation from two count-min sketches (same hash
    family/width/depth): |A join B on k| = Σ_k fA(k)·fB(k) is
    estimated by min over rows j of Σ_bucket nA·nB — the classic CM
    inner product, one-sided (estimate >= truth) like point queries.
    Both sketches are d·w-row relations, so this is a tiny join; the
    use case is planning-time join-size diagnostics without scanning
    either input again. Returns a single row (estimate BIGINT)."""
    a = sketch_a.select("j", "bucket", F.col("n").alias("na"))
    b = sketch_b.select("j", "bucket", F.col("n").alias("nb"))
    return (
        a.join(b, ["j", "bucket"])
        .groupBy("j")
        .agg(F.sum(F.col("na") * F.col("nb")).alias("ip"))
        .agg(F.min("ip").cast("long").alias("estimate"))
    )
