"""Scalar function vocabulary (SURVEY §2.8, F1-F6).

Thin, named wrappers over ``pyspark.sql.functions`` so every scalar the
reference uses has a single, documented home. All of these stay JVM-side
(whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_string(col: str | Column) -> Column:
    """TRIM (F1 — etl_medallion.py:119-121)."""
    return F.trim(col)


def normalize_email(col: str | Column) -> Column:
    """LOWER(TRIM(email)) composition (F2 — etl_medallion.py:121)."""
    return F.lower(F.trim(col))


def concat_null_propagating(*cols: Column) -> Column:
    """SQL ``||`` concatenation semantics (F3 — etl_medallion.py:171).

    NULL-propagating: any NULL operand yields NULL — matches BigQuery's
    ``first_name || ' ' || last_name`` on an unmatched left-join row.
    Deliberately NOT ``concat_ws`` (which skips NULLs).
    """
    return F.concat(*cols)


def full_name(first: str | Column, last: str | Column) -> Column:
    """``first || ' ' || last`` (F3)."""
    return concat_null_propagating(F.col(first) if isinstance(first, str) else first,
                                   F.lit(" "),
                                   F.col(last) if isinstance(last, str) else last)


def year_of(col: str | Column) -> Column:
    """EXTRACT(YEAR FROM d) (F4 — etl_medallion.py:200)."""
    return F.year(col)


def month_of(col: str | Column) -> Column:
    """EXTRACT(MONTH FROM d) (F4 — etl_medallion.py:201)."""
    return F.month(col)


def money_round(col: Column, scale: int = 2) -> Column:
    """ROUND(x, 2) (F5 — etl_medallion.py:190,206,362,371).

    Spark HALF_UP == BigQuery half-away-from-zero for the all-positive
    amounts this engine rounds (SURVEY §2.4 note).
    """
    return F.round(col, scale)
