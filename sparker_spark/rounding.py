"""Bit-deterministic cross-engine rounding.

Native round() differs between engines at exact .5 boundaries (Spark:
HALF_UP on the BigDecimal expansion of the double; DuckDB: C-library
behaviour on the scaled double). ``floor(x·10ⁿ + 0.5)/10ⁿ`` uses only
IEEE multiply/add/floor, so two engines holding the identical double
produce identical output — which is what the driver's value-hash
comparison needs. Used for every floating-point OUTPUT column in the
oracle-checked query surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(col: Column | str, n: int = 6) -> Column:
    """Spark-side deterministic round-half-up."""
    if isinstance(col, str):
        col = F.col(col)
    scale = float(10**n)
    return F.floor(col * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def _next_round(sql: str) -> int:
    """Index of the first ``round(`` occurrence OUTSIDE single-quoted
    SQL string literals ('' is the quote escape), or -1. Quote state is
    tracked from the start of the string, so a literal containing
    "round(" is never rewritten."""
    in_q = False
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if in_q:
            if ch == "'":
                if sql[i + 1 : i + 2] == "'":
                    i += 2
                    continue
                in_q = False
        elif ch == "'":
            in_q = True
        elif (
            sql.startswith("round(", i)
            and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_"))
        ):
            return i
        i += 1
    return -1


def rewrite_rounds(sql: str) -> str:
    """Rewrite every ``round(expr, n)`` call in a SQL string into the
    deterministic floor formula (paren-matching, handles nesting of the
    inner expr; quoted literals are left untouched; unbalanced parens
    raise ValueError instead of walking off the string)."""
    while True:
        start = _next_round(sql)
        if start < 0:
            return sql
        i = start + len("round(")
        depth = 1
        last_comma = None
        in_q = False
        while i < len(sql) and depth > 0:
            ch = sql[i]
            if in_q:
                if ch == "'":
                    if sql[i + 1 : i + 2] == "'":
                        i += 2
                        continue
                    in_q = False
            elif ch == "'":
                in_q = True
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 1:
                last_comma = i
            i += 1
        if depth > 0:
            raise ValueError(
                f"unbalanced parentheses in round() call at offset {start}"
            )
        end = i  # position after closing paren
        inner = sql[start + len("round(") : end - 1]
        if last_comma is None:
            expr, n = inner, 0
        else:
            expr = sql[start + len("round(") : last_comma]
            n = int(sql[last_comma + 1 : end - 1].strip())
        sql = sql[:start] + sql_rnd(expr, n) + sql[end:]


def sql_rnd(expr: str, n: int = 6) -> str:
    """Dialect-neutral SQL fragment of the same formula."""
    scale = float(10**n)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
