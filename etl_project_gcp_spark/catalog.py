"""Catalog / metadata operators (SURVEY §2.9 M1-M4, §2.1 S8).

The reference exposes schema introspection as a first-class feature:
INFORMATION_SCHEMA.TABLES / .COLUMNS queries (etl_medallion.py:228-233,
:280-286) and notebook printSchema/columns (etl_spark.ipynb cell-9/22).
Spark's catalog API is the native equivalent; these wrappers return
DataFrame-friendly plain structures and mirror the reference's ordering
contracts (ORDER BY table_name; ordinal column positions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_namespace(spark: SparkSession, name: str) -> None:
    """CREATE SCHEMA IF NOT EXISTS (M4/S8 — etl_medallion.py:78,110,156)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def list_tables(spark: SparkSession, database: str | None = None) -> list[str]:
    """Table names in a namespace, sorted (M1 — INFORMATION_SCHEMA.TABLES
    ... WHERE table_type='BASE TABLE' ORDER BY table_name)."""
    tables = spark.catalog.listTables(database) if database else spark.catalog.listTables()
    return sorted(t.name for t in tables if t.tableType not in ("VIEW", "TEMPORARY"))


def list_views(spark: SparkSession, database: str | None = None) -> list[str]:
    tables = spark.catalog.listTables(database) if database else spark.catalog.listTables()
    return sorted(t.name for t in tables if t.tableType in ("VIEW", "TEMPORARY"))


def list_columns(spark: SparkSession, table: str, limit: int | None = None) -> list[dict]:
    """Columns in ordinal position (M2 — INFORMATION_SCHEMA.COLUMNS
    ORDER BY ordinal_position [LIMIT n])."""
    cols = [
        {"column_name": c.name, "data_type": c.dataType, "ordinal_position": i + 1}
        for i, c in enumerate(spark.catalog.listColumns(table))
    ]
    return cols[:limit] if limit is not None else cols


def table_schema(df: DataFrame) -> list[tuple[str, str]]:
    """printSchema-equivalent as data (M3): (name, type) in order."""
    return [(f.name, f.dataType.simpleString()) for f in df.schema.fields]


def register_corpus_views(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...],
    reader=None,
) -> None:
    """Expose the parquet corpus as temp views so spark.sql() queries and
    catalog introspection work over it.

    ``reader`` (optional): callable ``(spark, sf_dir, name) -> DataFrame``
    supplying each table's frame — the engine passes its memoized table
    scan (``queries._t``), because ``spark.read.parquet`` resolves the
    footer schema eagerly (~100 ms/table) and the catalog entries
    re-register every run: 12 corpus tables made the metadata-only
    entries pay ~1 s of pure re-resolution per run (r15 bench).
    Default stays the plain parquet read (no import cycle, and callers
    outside the engine keep the unmemoized behavior)."""
    for n in names:
        df = (
            reader(spark, sf_dir, n)
            if reader is not None
            else spark.read.parquet(f"{sf_dir}/{n}.parquet")
        )
        df.createOrReplaceTempView(n)


# --- INFORMATION_SCHEMA-style DataFrames (M1/M2 as queryable rows) ---------
#
# The reference's metadata queries return *rows* that downstream SQL can
# filter and sort (INFORMATION_SCHEMA.TABLES at etl_medallion.py:228-233,
# .COLUMNS with ordinal_position at :280-286). The list_* helpers above
# return Python lists for driver convenience; these twins return the same
# facts as DataFrames so metadata composes with every relational operator.
# Building them is a driver-side createDataFrame over catalog metadata —
# O(tables × columns) rows, no data scan — exactly how INFORMATION_SCHEMA
# behaves in the delegated engines.

def information_schema_columns(spark: SparkSession, tables: list[str]) -> DataFrame:
    """INFORMATION_SCHEMA.COLUMNS over registered tables/views
    (etl_medallion.py:280-286): one row per column with its 1-based
    ordinal_position and Spark simpleString data_type, ordered
    (table_name, ordinal_position)."""
    rows = [
        (t, f.name, i + 1, f.dataType.simpleString())
        for t in sorted(tables)
        for i, f in enumerate(spark.table(t).schema.fields)
    ]
    return spark.createDataFrame(
        rows, "table_name string, column_name string, ordinal_position long, data_type string"
    )


def information_schema_tables(spark: SparkSession, tables: list[str]) -> DataFrame:
    """INFORMATION_SCHEMA.TABLES analog (etl_medallion.py:228-233): one
    row per table with its column count, ordered by table_name."""
    rows = [(t, len(spark.table(t).schema.fields)) for t in sorted(tables)]
    return spark.createDataFrame(rows, "table_name string, column_count long")
