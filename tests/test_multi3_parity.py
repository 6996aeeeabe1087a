"""Three-source clean-clean parity vs the actual reference library.

The reference supports k > 2 data sources (old_versions/
multi-data-source-sparker/README.md:1-3): blocks keep one profile set
PER SOURCE (BlockingUtils.separate_profiles), a block survives when
>= 2 source groups are non-empty, comparisons are cross-source only,
and the ARCS denominator is the PRODUCT of per-source group sizes
(common_node_pruning.py:195-196) — which only diverges from the
pairwise comparison count at k >= 3. This suite runs the reference
engine and ours side-by-side on a 3-source fixture and compares block
structure plus the exact directed weighted edge relation for every
weight type.
"""

import sys

import pytest
from pyspark.sql import functions as F

REFERENCE_PY = "/root/reference/python"

# three overlapping mini-catalogs; shared tokens create cross-source
# blocks with uneven per-source populations (so prod != pairwise)
SRC0 = [
    ("a1", "apple iphone 13 pro"),
    ("a2", "samsung galaxy s21"),
    ("a3", "google pixel 6"),
    ("a4", "apple iphone 12"),
    ("a5", "nokia brick classic"),
]
SRC1 = [
    ("b1", "iphone 13 pro max apple"),
    ("b2", "galaxy s21 ultra samsung"),
    ("b3", "pixel 6 pro google"),
    ("b4", "xiaomi mi 11"),
]
SRC2 = [
    ("c1", "apple iphone 13"),
    ("c2", "samsung galaxy note"),
    ("c3", "oneplus 9 pro"),
]


@pytest.fixture(scope="module")
def reference(spark):
    sys.path.insert(0, REFERENCE_PY)
    import sparker as ref  # noqa

    yield ref
    sys.path.remove(REFERENCE_PY)


@pytest.fixture(scope="module")
def ref3(spark, reference):
    """Reference pipeline on the 3-source fixture (no purge/filter:
    the point is block-structure + weight parity, not stage params)."""
    import pandas as pd

    ref = reference
    rdds, start = [], 0
    seps = []
    for i, rows in enumerate((SRC0, SRC1, SRC2)):
        pdf = pd.DataFrame(rows, columns=["id", "title"])
        p = ref.PandasWrapper.load_profiles(
            pdf, start_id_from=start, real_id_field="id", source_id=i
        )
        n = p.count()
        start += n
        if i < 2:
            seps.append(start - 1)
        rdds.append(p)
    sc = spark.sparkContext
    profiles = sc.union(rdds)
    max_id = start - 1
    blocks = ref.Blocking.create_blocks(profiles, separator_ids=seps)
    blocks.cache()
    pb = ref.Converters.blocks_to_profile_blocks(blocks)
    block_index = sc.broadcast(
        blocks.map(lambda b: (b.block_id, b.profiles)).collectAsMap()
    )
    pbsi = sc.broadcast(
        pb.map(lambda x: (x.profile_id, len(x.blocks))).collectAsMap()
    )
    rid = dict(profiles.map(lambda p: (p.profile_id, p.original_id)).collect())
    return {
        "ref": ref,
        "profiles": profiles,
        "blocks": blocks,
        "pb": pb,
        "block_index": block_index,
        "pbsi": pbsi,
        "max_id": max_id,
        "separator_ids": seps,
        "rid": rid,
    }


@pytest.fixture(scope="module")
def ours3(spark):
    from sparker_spark.blocking.blockers import Blocking
    from sparker_spark.blocking.converters import Converters
    from sparker_spark.wrappers import DataFrameWrapper

    parts, start = [], 0
    for i, rows in enumerate((SRC0, SRC1, SRC2)):
        df = spark.createDataFrame(rows, ["id", "title"])
        p = DataFrameWrapper.load_profiles(
            df, start_id_from=start, real_id_field="id", source_id=i
        )
        start += df.count()
        parts.append(p)
    profiles = parts[0]
    for p in parts[1:]:
        profiles = profiles.unionByName(p)
    profiles = profiles.cache()
    blocks = Blocking.create_blocks(profiles, clean=True).cache()
    pb = Converters.blocks_to_profile_blocks(blocks).cache()
    oid = {
        r["profile_id"]: r["original_id"]
        for r in profiles.select("profile_id", "original_id")
        .distinct()
        .collect()
    }
    return {"profiles": profiles, "blocks": blocks, "pb": pb, "oid": oid}


def test_multi3_block_structure(ref3, ours3):
    """Same number of surviving blocks, and per-key identical
    source-partitioned membership (compared via original ids)."""
    ref_blocks = {}
    rid = ref3["rid"]
    for b in ref3["blocks"].collect():
        groups = frozenset(
            frozenset(rid[p] for p in grp) for grp in b.profiles if grp
        )
        ref_blocks[b.block_id] = groups
    # compare as a multiset of source-group structures (keys are not
    # retained by the reference's token blocking)
    ref_shapes = sorted(
        tuple(sorted(tuple(sorted(g)) for g in grps))
        for grps in ref_blocks.values()
    )
    oid = ours3["oid"]
    rows = ours3["blocks"].assignments.select(
        "block_id", "profile_id", "source_id"
    ).collect()
    by_block = {}
    for r in rows:
        by_block.setdefault(r["block_id"], {}).setdefault(
            r["source_id"], set()
        ).add(oid[r["profile_id"]])
    our_shapes = sorted(
        tuple(sorted(tuple(sorted(g)) for g in grps.values()))
        for grps in by_block.values()
    )
    assert our_shapes == ref_shapes


# ARCS is excluded here: on blocks where a source group is EMPTY the
# reference's np.prod denominator is 0 and calc_weights raises
# ZeroDivisionError (common_node_pruning.py:196-199) — the reference
# ARCS is simply undefined for k >= 3 unless every block is fully
# populated. test_multi3_arcs_parity_fully_populated covers the
# defined subset; test_multi3_arcs_total_on_partial_blocks pins our
# total-function extension.
@pytest.mark.parametrize("wt", ["cbs", "js", "ecbs", "chi_square", "ejs"])
def test_multi3_weighted_edges_parity(spark, ref3, ours3, wt):
    """Exact directed weighted-edge parity for every weight type on
    the 3-source collection at k=3.

    EJS runs the reference's get_edges with CORRECTED statistics: the
    reference's own compute_statistics has a reset bug — the cleanup
    loop zeroes local_weights[i] for i in range(neighbors_number)
    instead of local_weights[neighbors[i]]
    (common_node_pruning.py:94-95) — so neighbor flags leak across
    profiles within a partition and its EJS statistics depend on
    partitioning (observed: profile c3 counted 1 neighbor instead of
    its true 3). We compute the intended per-profile distinct-neighbor
    counts and distinct-edge total exactly (driver-side over the tiny
    fixture) and feed them to the reference formula, which is the
    semantics this engine implements."""
    ref = ref3["ref"]
    ref_wt = {
        "cbs": ref.WeightTypes.CBS,
        "js": ref.WeightTypes.JS,
        "ecbs": ref.WeightTypes.ECBS,
        "chi_square": ref.WeightTypes.CHI_SQUARE,
        "arcs": ref.WeightTypes.ARCS,
        "ejs": ref.WeightTypes.EJS,
    }[wt]
    if wt == "ejs":
        from sparker.pruning_utils import PruningUtils

        sc = spark.sparkContext
        bindex = ref3["block_index"].value
        neigh = {}
        for pb in ref3["pb"].collect():
            pid = pb.profile_id
            s = set()
            for blk in pb.blocks:
                bid = blk.block_id
                if bid in bindex:
                    s |= PruningUtils.get_all_neighbors(
                        pid, bindex[bid], ref3["separator_ids"]
                    )
            neigh[pid] = s
        number_of_edges = (
            sum(len(s) for s in neigh.values()) // 2
        )
        epp = sc.broadcast({p: len(s) for p, s in neigh.items()})
        results = ref.WNP.get_edges(
            ref3["pb"],
            ref3["block_index"],
            ref3["max_id"],
            ref3["separator_ids"],
            ref_wt,
            ref3["pbsi"],
            False,
            None,
            float(number_of_edges),
            epp,
        )
    else:
        results = ref.WNP.get_all_edges(
            ref3["pb"],
            ref3["block_index"],
            ref3["max_id"],
            separator_ids=ref3["separator_ids"],
            weight_type=ref_wt,
            profile_blocks_size_index=ref3["pbsi"],
        )
    rid = ref3["rid"]
    ref_w = {
        (rid[p1], rid[p2]): w
        for p1, p2, w in results.flatMap(lambda x: x).collect()
    }
    assert ref_w, "fixture produced no reference edges"

    from sparker_spark.metablocking.pruning_utils import WeightTypes
    from sparker_spark.metablocking.weights import EdgeWeighting

    our_wt = {
        "cbs": WeightTypes.CBS,
        "js": WeightTypes.JS,
        "ecbs": WeightTypes.ECBS,
        "chi_square": WeightTypes.CHI_SQUARE,
        "arcs": WeightTypes.ARCS,
        "ejs": WeightTypes.EJS,
    }[wt]
    ctx = EdgeWeighting.weighted_edges(
        ours3["blocks"], ours3["pb"], weight_type=our_wt
    )
    oid = ours3["oid"]
    our_w = {
        (oid[r["src"]], oid[r["dst"]]): r["weight"]
        for r in ctx.edges.where("src != dst").collect()
    }
    # get_all_edges runs calc_cbs with first_step=False, so the
    # reference emits only the lower-id orientation of each edge;
    # our directed relation holds both. ARCS/EJS weights are
    # src-asymmetric — comparing the reference's (p1, p2) against our
    # (src=p1, dst=p2) row keeps the src identical on both sides.
    assert set(ref_w) <= set(our_w)
    assert len(our_w) == 2 * len(ref_w)
    for k, w in ref_w.items():
        assert abs(our_w[k] - w) <= 1e-9 * max(1.0, abs(w)), (k, w, our_w[k])


# fully-populated fixture: every token appears in >= 1 profile of ALL
# THREE sources (or in only one source, whose block is dropped), so
# the reference ARCS product is defined everywhere
FP0 = [
    ("a1", "alpha beta filler01"),
    ("a2", "gamma delta filler02"),
    ("a3", "alpha gamma filler03"),
]
FP1 = [
    ("b1", "alpha delta filler11"),
    ("b2", "beta gamma filler12"),
]
FP2 = [
    ("c1", "alpha beta gamma delta filler21"),
    ("c2", "alpha filler22"),
]


def _load_both(spark, reference, sources):
    import pandas as pd

    from sparker_spark.blocking.blockers import Blocking
    from sparker_spark.blocking.converters import Converters
    from sparker_spark.wrappers import DataFrameWrapper

    ref = reference
    rdds, parts, start, seps = [], [], 0, []
    for i, rows in enumerate(sources):
        pdf = pd.DataFrame(rows, columns=["id", "title"])
        rdds.append(
            ref.PandasWrapper.load_profiles(
                pdf, start_id_from=start, real_id_field="id", source_id=i
            )
        )
        df = spark.createDataFrame(rows, ["id", "title"])
        parts.append(
            DataFrameWrapper.load_profiles(
                df, start_id_from=start, real_id_field="id", source_id=i
            )
        )
        start += len(rows)
        if i < len(sources) - 1:
            seps.append(start - 1)
    sc = spark.sparkContext
    rprofiles = sc.union(rdds)
    rblocks = ref.Blocking.create_blocks(rprofiles, separator_ids=seps)
    rblocks.cache()
    rpb = ref.Converters.blocks_to_profile_blocks(rblocks)
    block_index = sc.broadcast(
        rblocks.map(lambda b: (b.block_id, b.profiles)).collectAsMap()
    )
    pbsi = sc.broadcast(
        rpb.map(lambda x: (x.profile_id, len(x.blocks))).collectAsMap()
    )
    rid = dict(rprofiles.map(lambda p: (p.profile_id, p.original_id)).collect())

    profiles = parts[0]
    for p in parts[1:]:
        profiles = profiles.unionByName(p)
    profiles = profiles.cache()
    blocks = Blocking.create_blocks(profiles, clean=True).cache()
    pb = Converters.blocks_to_profile_blocks(blocks).cache()
    oid = {
        r["profile_id"]: r["original_id"]
        for r in profiles.select("profile_id", "original_id").distinct().collect()
    }
    return {
        "ref": ref, "rpb": rpb, "block_index": block_index, "pbsi": pbsi,
        "max_id": start - 1, "seps": seps, "rid": rid,
        "blocks": blocks, "pb": pb, "oid": oid,
    }


def test_multi3_arcs_parity_fully_populated(spark, reference):
    """Exact ARCS parity at k=3 on the subset where the reference is
    defined (every block has all three source groups populated) —
    pins the product-of-source-sizes denominator."""
    env = _load_both(spark, reference, (FP0, FP1, FP2))
    ref = env["ref"]
    results = ref.WNP.get_all_edges(
        env["rpb"], env["block_index"], env["max_id"],
        separator_ids=env["seps"], weight_type=ref.WeightTypes.ARCS,
        profile_blocks_size_index=env["pbsi"],
    )
    rid = env["rid"]
    ref_w = {
        (rid[p1], rid[p2]): w
        for p1, p2, w in results.flatMap(lambda x: x).collect()
    }
    assert ref_w

    from sparker_spark.metablocking.pruning_utils import WeightTypes
    from sparker_spark.metablocking.weights import EdgeWeighting

    ctx = EdgeWeighting.weighted_edges(
        env["blocks"], env["pb"], weight_type=WeightTypes.ARCS
    )
    oid = env["oid"]
    our_w = {
        (oid[r["src"]], oid[r["dst"]]): r["weight"]
        for r in ctx.edges.where("src != dst").collect()
    }
    assert set(ref_w) <= set(our_w)
    assert len(our_w) == 2 * len(ref_w)
    for k, w in ref_w.items():
        assert abs(our_w[k] - w) <= 1e-9 * max(1.0, abs(w)), (k, w, our_w[k])


def test_multi3_arcs_total_on_partial_blocks(spark, ref3, ours3):
    """Our ARCS is TOTAL at k=3: blocks with an empty source group —
    where the reference divides by np.prod(...)=0 and raises — take
    the product over the NON-EMPTY groups (the natural extension that
    coincides with the reference wherever it is defined, and with the
    pairwise count at k=2). Every weight must be finite and positive."""
    import math

    from sparker_spark.metablocking.pruning_utils import WeightTypes
    from sparker_spark.metablocking.weights import EdgeWeighting

    ctx = EdgeWeighting.weighted_edges(
        ours3["blocks"], ours3["pb"], weight_type=WeightTypes.ARCS
    )
    rows = ctx.edges.where("src != dst").collect()
    assert rows
    for r in rows:
        assert math.isfinite(r["weight"]) and r["weight"] > 0, r


def test_multi3_wnp_pruning_parity(spark, ref3, ours3):
    """End-to-end WNP (CBS/AVG/OR) parity at k=3: same retained edge
    set through the reference's broadcast-index pruning and our
    DataFrame pruning — pins get_all_neighbors' cross-source
    neighborhood selection and the threshold pass at three sources."""
    ref = ref3["ref"]
    sc = spark.sparkContext
    pbsi = ref3["pbsi"]
    results = ref.WNP.wnp(
        ref3["pb"],
        ref3["block_index"],
        ref3["max_id"],
        separator_ids=ref3["separator_ids"],
        weight_type=ref.WeightTypes.CBS,
        threshold_type=ref.ThresholdTypes.AVG,
        comparison_type=ref.ComparisonTypes.OR,
        profile_blocks_size_index=pbsi,
    )
    rid = ref3["rid"]
    ref_edges = {
        frozenset((rid[p1], rid[p2]))
        for _, _, edges in results.collect()
        for p1, p2, _ in edges
    }
    assert ref_edges

    from sparker_spark.metablocking.pruning_utils import (
        ComparisonTypes,
        ThresholdTypes,
        WeightTypes,
    )
    from sparker_spark.metablocking.wnp import WNP

    kept = WNP.wnp(
        ours3["blocks"],
        ours3["pb"],
        threshold_type=ThresholdTypes.AVG,
        weight_type=WeightTypes.CBS,
        comparison_type=ComparisonTypes.OR,
    )
    oid = ours3["oid"]
    our_edges = {
        frozenset((oid[r["p1"]], oid[r["p2"]])) for r in kept.collect()
    }
    assert our_edges == ref_edges
