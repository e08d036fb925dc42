"""Local mirror of the driver's DuckDB-oracle comparison.

Replicates the contract in __spark_entry__.py: for a query name, run the
Spark DataFrame and the DuckDB oracle SQL on the same parquet dir and
compare row-count, column names, and order-insensitive values. Floats
are compared EXACTLY (the engine rounds on both sides by design), so a
pass here is strong evidence the driver's value hash will match.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

CORPUS = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in CORPUS:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        norm = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                norm.append(None)
            elif isinstance(v, float):
                norm.append(round(v, 9))
            elif hasattr(v, "isoformat"):
                norm.append(v.isoformat())
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                norm.append(tuple(round(float(x), 6) for x in v))
            else:
                norm.append(v)
        rows.append(tuple(norm))
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


def compare(spark_df, oracle: str, sf_dir: str) -> None:
    """Assert Spark result == DuckDB oracle result (order-insensitive)."""
    sp = spark_df.toPandas()
    dk = duckdb_run(oracle, sf_dir)
    assert sorted(sp.columns) == sorted(dk.columns), (
        f"column mismatch: spark={sorted(sp.columns)} duckdb={sorted(dk.columns)}"
    )
    assert len(sp) == len(dk), f"row count mismatch: spark={len(sp)} duckdb={len(dk)}"
    nsp, ndk = _normalize(sp), _normalize(dk)
    for i, (a, b) in enumerate(zip(nsp, ndk)):
        assert a == b, f"value mismatch at sorted row {i}:\n  spark={a}\n  duckdb={b}"
