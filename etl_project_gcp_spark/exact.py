"""Cross-engine-deterministic money aggregation.

Two failure modes make naive ``round(sum(double), 2)`` diverge between a
distributed Spark plan and any single-threaded oracle engine:

1. **Summation order.** Doubles don't associate; partition order changes
   the last bits, and a sum landing near a ``.005`` boundary rounds
   differently (observed: 638065.645 → .65 vs .64).
2. **round() semantics on doubles.** Given the *same* double, Spark
   rounds its shortest decimal representation (BigDecimal HALF_UP) while
   DuckDB/C round the binary value — 1225101.535 → .54 vs .53.

Both disappear if arithmetic stays in *decimal* space until the final
emit: money columns have fixed decimal precision, so (a) summation in
``DECIMAL`` is exact and order-independent (100 TB-safe: works no matter
how AQE re-partitions), and (b) decimal→decimal rescaling rounds
half-away-from-zero identically in Spark, DuckDB, and BigQuery (the
reference's engine). Averages use exact integer arithmetic:
``round_half_up(S / (10^s · n))`` computed as ``(2·S·10^out + d) div
(2·d)`` with ``d = n·10^s`` — carried in DECIMAL(38,0) on the Spark
side and HUGEINT (int128) in the DuckDB oracle, so the scaled sum can
reach 10^38/10^32 before overflow (a BIGINT carrier would overflow at
a raw sum of ~4.6e14 — real at 100 TB for near-global money averages).

Assumes non-negative aggregated values for the half-up averages (all
money/quantity columns here; matches the reference whose ROUND only ever
sees positive amounts — SURVEY §2.4).

Each Spark-side helper has an ``o``-prefixed twin emitting the
equivalent ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column, scale: int = 2) -> Column:
    """Exact decimal sum emitted as double (no final rounding)."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def dsum_round(col: Column, scale: int = 2, out: int = 2) -> Column:
    """Exact decimal sum, rescaled (rounds half-up in decimal space),
    emitted as double."""
    return (
        F.sum(col.cast(f"decimal(18,{scale})"))
        .cast(f"decimal(28,{out})")
        .cast("double")
    )


def _avg_expr(s_int: Column, n: Column, scale: int, out: int) -> Column:
    # DECIMAL(38,0) carriers: exact up to 10^38, where a BIGINT num
    # (= 2·S·10^(scale+out)) would overflow at raw sums ≈ 4.6e14
    d = n.cast("decimal(38,0)") * (10**scale)
    num = s_int * (2 * 10**out) + d
    den = d * 2
    # exact integer quotient (num - num%den is divisible by den), small
    # enough for a long; the final /10^out division is exact in double
    r = ((num - num % den) / den).cast("long")
    return F.when(n > 0, r / (10**out))


def davg(col: Column, scale: int = 2, out: int = 2) -> Column:
    """Exact average rounded half-up to ``out`` decimals, as double.

    Integer arithmetic: S = sum·10^scale (exact), d = n·10^scale,
    result = ((2·S·10^out + d) div (2·d)) / 10^out — carried in
    DECIMAL(38,0), so safe for near-global 100 TB money sums.
    NULL when the group has no non-null values (COUNT=0) — preserves the
    reference's NULL-on-empty-group semantics (etl_medallion.py:188-190).
    """
    s_int = (
        F.sum(col.cast(f"decimal(18,{scale})")) * (10**scale)
    ).cast("decimal(38,0)")
    return _avg_expr(s_int, F.count(col), scale, out)


def davg_over(col: Column, window, scale: int = 2, out: int = 2) -> Column:
    """``davg`` as a window expression — the scalar-subquery pattern
    ("value vs average over all rows") without re-scanning the input:
    an empty-frame window over an already-aggregated (small) frame
    computes the global average in one extra exchange of |groups| rows,
    where the self-join formulation would duplicate the whole upstream
    scan+aggregate subtree."""
    s_int = (
        F.sum(col.cast(f"decimal(18,{scale})")).over(window) * (10**scale)
    ).cast("decimal(38,0)")
    return _avg_expr(s_int, F.count(col).over(window), scale, out)


def dround(col: Column, scale: int = 4, out: int = 2) -> Column:
    """Per-row deterministic round of a fixed-precision expression:
    snap to its exact decimal value (scale), rescale half-up (out),
    emit double. Spark's decimal→decimal cast rounds HALF_UP."""
    return col.cast(f"decimal(18,{scale})").cast(f"decimal(18,{out})").cast("double")


def osum(expr: str, scale: int = 2) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def osum_round(expr: str, scale: int = 2, out: int = 2) -> str:
    # NOTE: DuckDB's decimal→decimal CAST *truncates*; round() on a
    # decimal rounds half-away-from-zero (= Spark's decimal rescale
    # HALF_UP for positives), so round, then cast.
    return (
        f"CAST(round(sum(CAST({expr} AS DECIMAL(18,{scale}))), {out}) AS DOUBLE)"
    )


def ddiv_round(num: Column, den: Column, out: int = 2) -> Column:
    """Exact round-half-up(num/den, out) for non-negative integer
    columns, as double: ((2·num·10^out + den) div (2·den)) / 10^out.
    NULL-safe: NULL when den is 0."""
    n = num.cast("long")
    d = den.cast("long")
    big = F.lit(2) * n * (10**out) + d
    two_d = F.lit(2) * d
    r = (big - big % two_d) / two_d
    return F.when(d > 0, r / (10**out))


def odiv_round(num: str, den: str, out: int = 2) -> str:
    n = f"CAST({num} AS BIGINT)"
    d = f"CAST({den} AS BIGINT)"
    return (
        f"CASE WHEN {d} > 0 THEN "
        f"CAST((2 * {n} * {10**out} + {d}) // (2 * {d}) AS DOUBLE) / {10**out} END"
    )


def oround(expr: str, scale: int = 4, out: int = 2) -> str:
    # round() on decimal is exact half-away-from-zero in DuckDB
    # (its decimal→decimal CAST would truncate — do not use).
    return f"CAST(round(CAST({expr} AS DECIMAL(18,{scale})), {out}) AS DOUBLE)"


def oavg(expr: str, scale: int = 2, out: int = 2) -> str:
    # HUGEINT (int128) carriers — the oracle twin of davg's DECIMAL(38,0)
    s_int = f"CAST(sum(CAST({expr} AS DECIMAL(18,{scale}))) * {10**scale} AS HUGEINT)"
    d = f"(CAST(count({expr}) AS HUGEINT) * {10**scale})"
    num = f"(2 * {s_int} * {10**out} + {d})"
    den = f"(2 * {d})"
    return (
        f"CASE WHEN count({expr}) > 0 "
        f"THEN CAST({num} // {den} AS DOUBLE) / {10**out} END"
    )
