"""Lint: no tokenizer may use \\s — Java regex \\s includes \\x0B,
RE2 (the DuckDB oracle) \\s does not, so every whitespace regex must
spell the explicit class from llm/hashing.py (WS_CLASS). This test
froze the round-10 sweep that converted every occurrence; it fails on
any regression, including in oracle SQL blobs.
"""

import pathlib
import re

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent

# file-text patterns that indicate a \s-based whitespace regex in any
# of the three embedding contexts (Java direct, Spark-SQL-embedded,
# DuckDB SQL blob). \\s inside a comment/docstring is also flagged —
# docs should show the real class.
BAD = re.compile(r"\\s[+*]|\[\^?[^]\n]*\\s[^]\n]*\]")

# python-regex \s used on driver-side strings (argparse helpers etc.)
# is fine ONLY in tools/, never in the engine or its oracles
SCAN_DIRS = ["sparker_spark", "tests"]
SCAN_FILES = ["__spark_entry__.py", "bench.py"]


def _py_files():
    for d in SCAN_DIRS:
        yield from (ROOT / d).rglob("*.py")
    for f in SCAN_FILES:
        p = ROOT / f
        if p.exists():
            yield p


def test_no_backslash_s_tokenizers():
    offenders = []
    for p in _py_files():
        if p.name == "test_ws_class.py":
            continue
        for i, line in enumerate(p.read_text().splitlines(), 1):
            if BAD.search(line):
                offenders.append(f"{p.relative_to(ROOT)}:{i}: {line.strip()}")
    assert not offenders, (
        "\\s-based whitespace regex found (use llm/hashing.WS_CLASS / "
        "WS_CLASS_SQL — Java vs RE2 \\x0B divergence):\n"
        + "\n".join(offenders)
    )


def test_ws_class_matches_java_semantics():
    # the explicit class must equal Java's \s exactly: [ \t\n\x0B\f\r]
    from sparker_spark.llm.hashing import WS_CLASS, WS_CLASS_SQL

    rx = re.compile(WS_CLASS)
    for ch in " \t\n\x0b\f\r":
        assert rx.fullmatch(ch), repr(ch)
    for ch in "x0B\u00a0\u2028":  # literals + unicode spaces stay OUT
        assert not rx.match(ch), repr(ch)
    # the Spark-SQL-embedded form is the same class one escape level up
    assert WS_CLASS_SQL.replace("\\\\", "\\") == WS_CLASS


def test_spark_and_duckdb_agree_on_vertical_tab():
    import duckdb

    got = duckdb.connect().execute(
        "SELECT regexp_split_to_array('a' || chr(11) || 'b', "
        "'[ \\t\\r\\n\\f\\x0B]+')"
    ).fetchone()[0]
    assert got == ["a", "b"]


@pytest.mark.usefixtures()
def test_spark_split_on_vertical_tab(spark):
    from pyspark.sql import functions as F

    from sparker_spark.llm.hashing import WS_CLASS

    df = spark.createDataFrame([("a\x0bb c",)], "text string")
    row = df.select(F.split("text", WS_CLASS).alias("t")).first()
    assert row.t == ["a", "b", "c"]
