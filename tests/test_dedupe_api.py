"""The one-call dedupe() wrapper (SURVEY §7.1 M8): arbitrary
DataFrames in, caller-keyed matches out, for dirty and clean-clean ER
and every pruner."""

import pytest

from sparker_spark.dedupe import dedupe


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        ("a1", "john smith", "12 oak street", "portland"),
        ("a2", "jon smith", "12 oak street", "portland"),     # dup of a1
        ("a3", "mary jones", "9 pine road", "salem"),
        ("a4", "mary jones", "9 pine rd", "salem"),           # dup of a3
        ("a5", "bob brown", "77 elm avenue", "eugene"),
        ("a6", "alice white", "3 birch lane", "bend"),
    ]
    return spark.createDataFrame(rows, ["rid", "name", "addr", "city"])


def test_dedupe_dirty_finds_planted_dups(people):
    out = dedupe(people, "rid", purge_smooth=None)
    pairs = {tuple(sorted((r["id1"], r["id2"]))) for r in out.collect()}
    assert ("a1", "a2") in pairs
    assert ("a3", "a4") in pairs
    # fully unrelated records never pair
    assert ("a5", "a6") not in pairs


def test_dedupe_clean_clean_cross_only(people, spark):
    crawl2 = spark.createDataFrame(
        [
            ("b1", "jon smith", "12 oak street", "portland"),  # matches a1/a2
            ("b2", "new person", "unknown", "nowhere"),
        ],
        ["rid", "name", "addr", "city"],
    )
    out = dedupe(people, "rid", df2=crawl2, purge_smooth=None)
    got = [(r["id1"], r["id2"]) for r in out.collect()]
    # every pair crosses the two frames
    assert got and all(a.startswith("a") and b.startswith("b") for a, b in got)
    assert ("a1", "b1") in got


# two representatives keep the composition covered without re-running
# the full pipeline 4x — each pruner's semantics has its own oracle
# query and unit suite
@pytest.mark.parametrize("pruning", ["cep", "none"])
def test_dedupe_pruner_matrix(people, pruning):
    out = dedupe(people, "rid", purge_smooth=None, pruning=pruning)
    assert {"id1", "id2", "weight"} == set(out.columns)
    assert out.count() > 0


def test_dedupe_column_subset_and_ngrams(people):
    out = dedupe(
        people, "rid", columns=["name"], blocking="ngram", purge_smooth=None
    )
    pairs = {tuple(sorted((r["id1"], r["id2"]))) for r in out.collect()}
    assert ("a3", "a4") in pairs  # identical names


def test_dedupe_on_cora_recall(spark):
    """The one-call wrapper on a REAL labeled dataset: dedupe() over
    the reference's cora corpus must recover most groundtruth matches
    (the same pipeline the parity suite verifies stage-by-stage)."""
    import os

    cora = "/root/reference/python/datasets/dirty/cora/cora.csv"
    gt = "/root/reference/python/datasets/dirty/cora/groundtruth.csv"
    if not os.path.exists(cora):
        import pytest

        pytest.skip("reference datasets not present")
    df = spark.read.option("header", True).csv(cora)
    # the dirty-datasets notebook params (purge 1.025, filter 0.8);
    # 1.005 is the BLAST setting and over-purges cora's blocks
    out = dedupe(df, "id", purge_smooth=1.025, filter_r=0.8)
    pairs = {
        tuple(sorted((r["id1"], r["id2"]))) for r in out.collect()
    }
    gt_pairs = {
        tuple(sorted((r["id1"], r["id2"])))
        for r in spark.read.option("header", True).csv(gt).collect()
    }
    hits = len(pairs & gt_pairs)
    recall = hits / len(gt_pairs)
    assert recall > 0.95  # measured 0.98 PC at these params


def test_dedupe_clean_clean_on_dblp_acm(spark):
    """The wrapper's clean-clean mode on the reference's labeled
    DblpAcm citation corpus: cross-frame matches only, recall above
    the notebook's ballpark."""
    import os

    d1 = "/root/reference/python/datasets/clean/DblpAcm/dataset1.json"
    d2 = "/root/reference/python/datasets/clean/DblpAcm/dataset2.json"
    gt = "/root/reference/python/datasets/clean/DblpAcm/groundtruth.json"
    if not os.path.exists(d1):
        import pytest

        pytest.skip("reference datasets not present")
    f1 = spark.read.json(d1)
    f2 = spark.read.json(d2)
    out = dedupe(
        f1, "realProfileID", df2=f2, purge_smooth=1.025, filter_r=0.8
    )
    pairs = {(r["id1"], r["id2"]) for r in out.collect()}
    gt_pairs = {
        (str(r["id1"]), str(r["id2"]))
        for r in spark.read.json(gt).collect()
    }
    hits = len(pairs & gt_pairs)
    recall = hits / len(gt_pairs)
    assert recall > 0.9
    # clean-clean: every emitted pair crosses the two frames (id
    # spaces overlap numerically, so check against frame membership)
    ids1 = {str(r["realProfileID"]) for r in f1.select("realProfileID").collect()}
    ids2 = {str(r["realProfileID"]) for r in f2.select("realProfileID").collect()}
    assert all(a in ids1 and b in ids2 for a, b in pairs)


def test_dedupe_numeric_and_null_columns(spark):
    """Arbitrary DataFrames include numeric and NULL-bearing columns;
    the EAV melt stringifies values and drops empties, so dedupe()
    must work unchanged."""
    rows = [
        ("n1", 42, 3.14, "acme corp"),
        ("n2", 42, 3.14, "acme corp"),    # numeric+string dup of n1
        ("n3", None, None, "solo widgets"),
        ("n4", 7, 2.72, None),
    ]
    df = spark.createDataFrame(rows, ["rid", "qty", "score", "vendor"])
    out = dedupe(df, "rid", purge_smooth=None)
    pairs = {tuple(sorted((r["id1"], r["id2"]))) for r in out.collect()}
    assert ("n1", "n2") in pairs


def test_dedupe_clean_clean_empty_first_frame(spark):
    """An empty first DataFrame must yield an empty result, not a
    TypeError from int(None) when deriving the second source's id
    offset."""
    empty = spark.createDataFrame([], "rid string, name string")
    b = spark.createDataFrame(
        [("x", "john smith"), ("y", "jane doe")], ["rid", "name"]
    )
    out = dedupe(empty, "rid", df2=b, purge_smooth=None)
    assert out.count() == 0


def test_dedupe_three_sources_cross_only(spark):
    """df2 as a LIST runs k-source clean-clean ER: pairs are emitted
    only ACROSS frames, never within one."""
    a = spark.createDataFrame(
        [("a1", "john smith acme"), ("a2", "john smith acme")], ["rid", "name"]
    )
    b = spark.createDataFrame([("b1", "john smith acme")], ["rid", "name"])
    c = spark.createDataFrame([("c1", "john smith acme")], ["rid", "name"])
    out = dedupe(a, "rid", df2=[b, c], purge_smooth=None)
    pairs = {tuple(sorted((r["id1"], r["id2"]))) for r in out.collect()}
    # cross-source pairs only: a1/a2 (same frame) must NOT pair
    assert ("a1", "a2") not in pairs
    for want in (("a1", "b1"), ("a2", "b1"), ("a1", "c1"), ("b1", "c1")):
        assert want in pairs, want


def test_semantic_dedup_groups_and_singletons(spark):
    """SemanticDedup: identical vectors group transitively (a~b, b~c
    => one component, min-id canonical); dissimilar vectors stay
    canonical singletons; every input vector is labeled."""
    from pyspark.sql import functions as F

    from sparker_spark.llm.dedup import SemanticDedup

    base = [1.0] * 8
    near = [1.0] * 7 + [1.05]
    anti = [-1.0] * 8
    ortho = [1.0, -1.0] * 4
    rows = [
        (0, base),
        (1, base),
        (2, near),
        (10, anti),
        (20, ortho),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r
        for r in SemanticDedup.dedup(df, 0.99, num_cells=16).collect()
    }
    assert len(out) == 5  # every vector labeled
    # 0,1,2 join one group (0-1 exact, 1-2 cosine > 0.99) IF they share
    # a cell — identical/near-identical vectors always do (same signs)
    assert out[0]["component"] == out[1]["component"] == out[2]["component"]
    assert out[0]["cluster_size"] == 3
    assert out[0]["is_canonical"] and not out[1]["is_canonical"]
    # anti/ortho: no near-dup -> canonical singletons
    for vid in (10, 20):
        assert out[vid]["cluster_size"] == 1 and out[vid]["is_canonical"]


def test_semantic_pairs_threshold(spark):
    from sparker_spark.llm.dedup import SemanticDedup

    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = SemanticDedup.pairs(df, 0.999, num_cells=16).collect()
    assert [(r["p1"], r["p2"]) for r in got] == [(0, 1)]
    assert got[0]["cosine"] >= 0.999


def test_semantic_multi_probe_catches_boundary_pairs(spark):
    """Near-identical vectors can straddle one hyperplane and land in
    Hamming-1 cells — single-probe misses them, multi_probe=True
    enumerates them exactly once."""
    import random

    from sparker_spark.llm.dedup import SemanticDedup
    from sparker_spark.llm.similarity import IVFIndex

    # construct the straddle deterministically: project a random base
    # ONTO plane 0 (zero dot product), then nudge +-eps along the
    # plane normal — the two copies differ only in sign bit 0 while
    # staying ~identical in cosine
    planes = IVFIndex._planes(16, 16, 1234)
    p0 = planes[0]
    rng = random.Random(7)
    base = [rng.gauss(0, 1) for _ in range(16)]
    dot = sum(b * x for b, x in zip(base, p0))
    nn = sum(x * x for x in p0)
    on_plane = [b - dot * x / nn for b, x in zip(base, p0)]
    eps = 1e-3
    rows = [
        (0, [b + eps * x for b, x in zip(on_plane, p0)]),
        (1, [b - eps * x for b, x in zip(on_plane, p0)]),
    ] + [
        (i, [x + rng.gauss(0, 0.02) for x in on_plane])
        for i in range(2, 40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cells = {
        r["vec_id"]: r["cell"]
        for r in IVFIndex.build(df, num_cells=16).indexed.select(
            "vec_id", "cell"
        ).collect()
    }
    ham1 = [
        (i, j)
        for i in cells
        for j in cells
        if i < j and bin(cells[i] ^ cells[j]).count("1") == 1
    ]
    assert ham1, "fixture must straddle at least one plane"
    single = {
        (r["p1"], r["p2"])
        for r in SemanticDedup.pairs(df, 0.99, num_cells=16).collect()
    }
    multi = {
        (r["p1"], r["p2"])
        for r in SemanticDedup.pairs(
            df, 0.99, num_cells=16, multi_probe=True
        ).collect()
    }
    assert single <= multi
    gained = multi - single
    assert gained and all(
        bin(cells[i] ^ cells[j]).count("1") == 1 for i, j in gained
    )
    # exactly-once: multi is a SET relation (no duplicate pairs)
    raw = SemanticDedup.pairs(
        df, 0.99, num_cells=16, multi_probe=True
    ).collect()
    assert len(raw) == len(multi)


def test_cells_for_target_sizing():
    """cells ~ N/k, power of two, clamped — the linear-candidate
    production rule; floor(x+0.5) (never banker's round) so the SQL
    oracle's floor formula replays it exactly."""
    from sparker_spark.llm.similarity import IVFIndex

    assert IVFIndex.cells_for_target(0, 100) == 16
    assert IVFIndex.cells_for_target(100, 100) == 16  # clamp floor
    assert IVFIndex.cells_for_target(1_000_000, 1000) == 1024
    assert IVFIndex.cells_for_target(10_000, 100) == 128
    # candidate volume stays ~N*k across a decade: cells track N
    c1 = IVFIndex.cells_for_target(100_000, 100)
    c2 = IVFIndex.cells_for_target(1_000_000, 100)
    assert 4 <= (c2 / c1) * 2 <= 32  # power-of-two rounding wiggle


def test_margin_probe_containment_and_recall(spark):
    """home-only ⊆ margin-pruned ⊆ full Hamming-1 (pair sets AND
    candidate counts); the margin variant recovers the deliberately
    planted boundary pair that home-only misses."""
    import random

    from sparker_spark.llm.dedup import SemanticDedup
    from sparker_spark.llm.similarity import IVFIndex

    planes = IVFIndex._planes(16, 16, 1234)
    p0 = planes[0]
    rng = random.Random(11)
    base = [rng.gauss(0, 1) for _ in range(16)]
    dot = sum(b * x for b, x in zip(base, p0))
    nn = sum(x * x for x in p0)
    on_plane = [b - dot * x / nn for b, x in zip(base, p0)]
    eps = 1e-3
    rows = [
        (0, [b + eps * x for b, x in zip(on_plane, p0)]),
        (1, [b - eps * x for b, x in zip(on_plane, p0)]),
    ] + [
        (i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(2, 60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    def pairs(**kw):
        return {
            (r["p1"], r["p2"])
            for r in SemanticDedup.pairs(df, 0.999, num_cells=16, **kw).collect()
        }

    home = pairs()
    margin = pairs(multi_probe="margin", probe_margin=0.05)
    full = pairs(multi_probe=True)
    assert home <= margin <= full
    assert (0, 1) in margin and (0, 1) not in home  # boundary recovery
    c_home = SemanticDedup.pairs(df, None, num_cells=16).count()
    c_margin = SemanticDedup.pairs(
        df, None, num_cells=16, multi_probe="margin", probe_margin=0.05
    ).count()
    c_full = SemanticDedup.pairs(
        df, None, num_cells=16, multi_probe=True
    ).count()
    assert c_home <= c_margin < c_full  # pruning really prunes


def test_target_cell_size_dedup_groups(spark):
    """The production sizing path dedups identical vectors exactly as
    the pinned path does (grouping is sizing-invariant for identical
    vectors: same signs => same cell at ANY cell count)."""
    from sparker_spark.llm.dedup import SemanticDedup

    rows = [(i, [float(i % 7), 1.0, -2.0, 0.5]) for i in range(70)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = SemanticDedup.dedup(df, 0.999999, target_cell_size=10)
    comp = {r["vec_id"]: r["component"] for r in out.collect()}
    assert len(comp) == 70
    for i in range(70):
        assert comp[i] == comp[i % 7]  # identical vectors co-group
