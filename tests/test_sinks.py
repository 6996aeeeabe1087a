"""Bucketed sink: the written layout must eliminate the join exchange."""

import pytest
from pyspark.sql import functions as F

from sparker_spark.sinks import BucketedSink


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    left = docs.select("doc_id", "lang")
    right = docs.select("doc_id", F.length("text").alias("text_len"))
    BucketedSink.write(left, "bt_left", "doc_id", num_buckets=8)
    BucketedSink.write(right, "bt_right", "doc_id", num_buckets=8)
    yield "bt_left", "bt_right"
    spark.sql("DROP TABLE IF EXISTS bt_left")
    spark.sql("DROP TABLE IF EXISTS bt_right")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    a, b = spark.table(lt), spark.table(rt)
    # disable AQE broadcast demotion noise: force the sort-merge path
    joined = a.hint("merge").join(b, "doc_id")
    plan = _plan(joined)
    assert "Exchange" not in plan, plan  # co-located: zero shuffle
    assert joined.count() == a.count()


def test_unbucketed_join_does_exchange(spark, sf_dir):
    """Control: the same join on plain parquet shuffles — proves the
    assertion above is detecting bucketing, not a trivial plan."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = docs.select("doc_id", "lang")
    b = docs.select("doc_id", F.length("text").alias("text_len"))
    plan = _plan(a.hint("merge").join(b, "doc_id"))
    assert "Exchange" in plan


def test_bucketed_roundtrip_values(spark, sf_dir, bucketed_tables):
    lt, _ = bucketed_tables
    back = {r["doc_id"]: r["lang"] for r in BucketedSink.read(spark, lt).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    orig = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    assert back == orig


def test_orc_wrapper_matches_dataframe_wrapper(spark, tmp_path):
    from sparker_spark.wrappers import DataFrameWrapper, ORCWrapper

    df = spark.createDataFrame(
        [("r1", "alice", "pdx"), ("r2", "bob", "sea")], ["rid", "name", "city"]
    )
    p = str(tmp_path / "orc_src")
    df.write.orc(p)
    via_orc = ORCWrapper.load_profiles(spark, p, real_id_field="rid")
    direct = DataFrameWrapper.load_profiles(spark.read.orc(p), real_id_field="rid")
    assert sorted(map(tuple, via_orc.collect())) == sorted(
        map(tuple, direct.collect())
    )
    assert via_orc.count() == 4  # 2 rows x 2 non-id attrs


def test_partitioned_sink_prunes(spark, tmp_path):
    import io
    from contextlib import redirect_stdout

    from sparker_spark.sinks import PartitionedSink

    df = spark.createDataFrame(
        [(i, f"src{i % 3}", float(i)) for i in range(30)],
        ["id", "source", "v"],
    )
    p = str(tmp_path / "part")
    PartitionedSink.write(df, p, "source")
    back = spark.read.parquet(p)
    q = back.where("source = 'src1'")
    assert q.count() == 10
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain(True)
    plan = buf.getvalue()
    # the predicate must prune DIRECTORIES, not filter rows post-scan
    assert "PartitionFilters" in plan and "src1" in plan


def test_compaction(spark, tmp_path):
    from sparker_spark.sinks import PartitionedSink

    src = str(tmp_path / "many")
    spark.range(1000).repartition(64).write.parquet(src)
    out = str(tmp_path / "few")
    PartitionedSink.compact(spark, src, 4, out)
    import glob

    files = glob.glob(out + "/part-*")
    assert len(files) == 4
    assert spark.read.parquet(out).count() == 1000


def test_tpch_q3_broadcasts_small_dim(spark):
    """Join-strategy plan assertion: the BUILDING-segment customer
    slice is small, so AQE/Catalyst must pick a broadcast hash join
    somewhere in the q3 plan — a shuffle-everything plan here would be
    the 100 TB red flag audit_plans can't see (it only checks nested
    loops)."""
    import io
    from contextlib import redirect_stdout

    from sparker_spark.entry import QUERIES

    df = QUERIES["tpch_q3"](spark, "/root/testdata/sf0.001")
    df.collect()  # let AQE finalize the adaptive plan
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    assert "BroadcastHashJoin" in buf.getvalue()
