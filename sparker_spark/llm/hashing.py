"""Deterministic, engine-portable hashing primitives.

Everything here is expressible in BOTH Spark SQL and DuckDB SQL so the
driver's DuckDB oracle can replay it bit-for-bit: the base token hash
is the first 60 bits of md5 (both engines produce identical md5 hex),
and MinHash permutations are seeded affine maps mod the Mersenne prime
2^31−1 (the reference uses the same construction with a different
prime and seed: attribute_clustering.py:11-32, seed 1234 — we keep
seed 1234).
"""

from __future__ import annotations

import random

MERSENNE_31 = 2147483647  # 2^31 - 1, prime

# Canonical whitespace tokenizer class — NEVER use \s in a tokenizer:
# Java regex \s is exactly [ \t\n\x0B\f\r] but RE2 (DuckDB) \s
# excludes \x0B, so engine and oracle diverge on any document
# containing a vertical tab. Spelling the class out keeps both
# engines bit-identical (Java-side behavior is unchanged — the class
# IS Java's \s). WS_CLASS is for direct Java/Python regex args
# (F.split / F.regexp_replace / re) and for DuckDB SQL text (DuckDB
# string literals don't unescape, RE2 reads the \t escapes);
# WS_CLASS_SQL is for regexes embedded in SPARK SQL string literals,
# which unescape one backslash level first. tests/test_ws_class.py
# lints the tree against \s regressions.
WS_CLASS = "[ \\t\\r\\n\\f\\x0B]+"
WS_CLASS_SQL = "[ \\\\t\\\\r\\\\n\\\\f\\\\x0B]+"

# Spark SQL fragment: 60-bit bigint hash of a string expression
SPARK_HASH60 = "CAST(conv(substring(md5({x}), 1, 15), 16, 10) AS BIGINT)"
# DuckDB equivalent (verified identical output)
DUCK_HASH60 = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"


def minhash_coefficients(num_hashes: int, seed: int = 1234) -> list[tuple[int, int]]:
    """Seeded (a, b) pairs for h_i(x) = (a_i·x + b_i) mod (2^31−1).

    ``x`` must already be reduced mod 2^31−1 so a·x fits in int64.
    """
    rnd = random.Random(seed)
    return [
        (rnd.randint(1, MERSENNE_31 - 1), rnd.randint(0, MERSENNE_31 - 1))
        for _ in range(num_hashes)
    ]


def hash60(x_sql: str, dialect: str) -> str:
    tpl = SPARK_HASH60 if dialect == "spark" else DUCK_HASH60
    return tpl.format(x=x_sql)


def minhash_expr(a: int, b: int, hcol: str = "h31") -> str:
    """One permutation over a pre-reduced 31-bit hash column (both
    dialects)."""
    return f"(({a} * {hcol} + {b}) % {MERSENNE_31})"


def xor_expr(a: str, b: str, dialect: str) -> str:
    if dialect == "spark":
        return f"({a} ^ {b})"
    return f"xor({a}, {b})"
