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


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
