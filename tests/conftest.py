import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

# Make both this repo and the reference library importable inside Spark's
# executor Python workers (they inherit PYTHONPATH from the JVM process).
_extra = f"{REPO_ROOT}:/root/reference/python"
os.environ["PYTHONPATH"] = (
    _extra + ":" + os.environ["PYTHONPATH"]
    if os.environ.get("PYTHONPATH")
    else _extra
)

# One session serves ~300 tests; caches and localCheckpoint RDDs
# accumulate across modules, and on the 4 g session default that heap
# pressure produced order-dependent Py4J/executor flakes (r5: two
# tests failed in the full run, both green in isolation). Tests run at
# sf0.001 so no single plan needs memory — the budget is for the
# ACCUMULATION, handled by (a) a roomier heap and (b) the module-
# boundary cache sweep below. Env still wins for ad-hoc runs.
os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")

from sparker_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="sparker_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield spark


@pytest.fixture(scope="module", autouse=True)
def _free_session_memory():
    """Drop cached relations and lingering localCheckpoint RDDs at
    every module boundary.

    Caches are per-test working state here (nothing is shared across
    modules — a module that needs a relation rebuilds it in seconds at
    sf0.001), but left alone they pile up in the ONE shared JVM for
    the whole suite and eventually evict/GC-thrash later modules.
    gc.collect() matters as much as clearCache: checkpointed RDDs are
    only released when Python GC drives the py4j unreference.

    SUITE INVARIANT for future fixtures: clearCache() unpersists EVERY
    cached relation on the shared session, so no cached relation may
    outlive its module — a session-scoped fixture that caches a
    relation for cross-module reuse would be silently uncached here
    and re-pay its build per module. Keep shared state as plain
    (uncached) DataFrames or rebuild per module."""
    yield
    import gc

    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        try:
            active.catalog.clearCache()
        except Exception:
            pass  # session already stopped (e.g. streaming teardown)
    gc.collect()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
