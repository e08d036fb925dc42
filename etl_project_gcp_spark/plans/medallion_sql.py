"""SQL-first medallion twin: the reference's literal interface.

The reference pipeline IS a list of SQL strings handed to an engine
(etl_medallion.py:90-210 — `CREATE SCHEMA`, `LOAD DATA OVERWRITE`,
`CREATE OR REPLACE TABLE … AS SELECT`). `plans/medallion.py` re-homes
those semantics onto the DataFrame API; this module re-homes them onto
``spark.sql`` so a user who *writes SQL* can run the same pipeline
unchanged in spirit: every silver/gold statement below is the
reference's SELECT body with only the table-path syntax adapted.

Differences from BigQuery, made explicit:
- `LOAD DATA OVERWRITE … FROM FILES` has no Spark SQL equivalent — the
  bronze load stays a strict DataFrameReader call (same semantics:
  header skip, FAILFAST, autodetect).
- Spark's v1 catalog has no `CREATE OR REPLACE TABLE … AS SELECT`; the
  idempotent-overwrite contract is `DROP TABLE IF EXISTS` + CTAS.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from etl_project_gcp_spark.sources.readers import read_csv_bronze

LAYER_DBS = ("bronze_sql", "silver_sql", "gold_sql")

SILVER_STATEMENTS = {
    # etl_medallion.py:116-126
    "employees": """
        SELECT employee_id,
               TRIM(first_name)    AS first_name,
               TRIM(last_name)     AS last_name,
               LOWER(TRIM(email))  AS email,
               department,
               salary,
               hire_date
        FROM bronze_sql.employees
        WHERE email IS NOT NULL AND salary > 0
    """,
    # etl_medallion.py:130-133
    "products": """
        SELECT * FROM bronze_sql.products
        WHERE price > 0 AND is_active = true
    """,
    # etl_medallion.py:137-140
    "sales": """
        SELECT * FROM bronze_sql.sales
        WHERE quantity > 0 AND total_amount > 0
    """,
}

GOLD_STATEMENTS = {
    # etl_medallion.py:161-178 — 12-col 3-way left join; `||` concat is
    # NULL-propagating in Spark SQL exactly like BigQuery (F3 semantics)
    "sales_analytics": """
        SELECT s.transaction_id,
               s.sale_date,
               s.quantity,
               s.total_amount,
               p.product_name,
               p.category,
               p.price AS unit_price,
               e.first_name || ' ' || e.last_name AS sales_rep,
               e.department,
               s.customer_segment,
               s.channel,
               s.region
        FROM silver_sql.sales s
        LEFT JOIN silver_sql.products p  ON s.product_id = p.product_id
        LEFT JOIN silver_sql.employees e ON s.sales_rep_id = e.employee_id
    """,
    # etl_medallion.py:182-195 — zero-sale products kept: COUNT()=0,
    # SUM/AVG stay NULL (not coalesced)
    "product_metrics": """
        SELECT p.product_id,
               p.product_name,
               p.category,
               COUNT(s.transaction_id)        AS total_sales,
               SUM(s.quantity)                AS total_quantity_sold,
               SUM(s.total_amount)            AS total_revenue,
               ROUND(AVG(s.total_amount), 2)  AS avg_sale_amount
        FROM silver_sql.products p
        LEFT JOIN silver_sql.sales s ON p.product_id = s.product_id
        GROUP BY p.product_id, p.product_name, p.category
    """,
    # etl_medallion.py:198-209
    "sales_summary": """
        SELECT EXTRACT(YEAR FROM sale_date)   AS year,
               EXTRACT(MONTH FROM sale_date)  AS month,
               channel,
               region,
               COUNT(*)                       AS total_transactions,
               SUM(total_amount)              AS total_revenue,
               ROUND(AVG(total_amount), 2)    AS avg_transaction_value
        FROM silver_sql.sales
        GROUP BY 1, 2, 3, 4
    """,
}


class MedallionSQL:
    """Run the medallion pipeline as SQL statements (managed tables in
    the session catalog, one database per layer)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def run_etl(self, sources: dict[str, str]) -> dict:
        ok: dict[str, dict[str, bool]] = {}
        for db in LAYER_DBS:
            self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")

        ok["bronze"] = {}
        for table, path in sources.items():
            try:
                df = read_csv_bronze(self.spark, path)
                self.spark.sql(f"DROP TABLE IF EXISTS bronze_sql.{table}")
                df.write.saveAsTable(f"bronze_sql.{table}")
                ok["bronze"][table] = True
            except Exception:
                ok["bronze"][table] = False
        if not all(ok["bronze"].values()):
            return {"success": False, "layers": ok}

        for layer, statements in (
            ("silver", SILVER_STATEMENTS),
            ("gold", GOLD_STATEMENTS),
        ):
            ok[layer] = {}
            for table, select_body in statements.items():
                try:
                    self.spark.sql(f"DROP TABLE IF EXISTS {layer}_sql.{table}")
                    self.spark.sql(
                        f"CREATE TABLE {layer}_sql.{table} USING parquet AS "
                        + select_body
                    )
                    ok[layer][table] = True
                except Exception:
                    ok[layer][table] = False
            if not all(ok[layer].values()):
                return {"success": False, "layers": ok}
        return {"success": True, "layers": ok}

    def drop_all(self) -> None:
        for db in LAYER_DBS:
            self.spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
