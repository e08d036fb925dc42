"""etl_project_gcp_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``FrancoDiAahumada/etl-Project-GCP`` (a GCP medallion ETL
that delegates execution to BigQuery / stock PySpark), re-expressed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, plus
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal column plumbing) designed for 100 TB scale.

Layout (SURVEY.md §7):
  session       SparkSession factory (replaces import-time client,
                reference etl_medallion.py:56)
  sources       readers/writers: CSV bronze ingest, Parquet lakehouse (S1-S7)
  catalog       layer namespaces + metadata ops (S8, M1-M4)
  functions     scalar function vocabulary (F1-F5, null-propagating concat)
  operators     relational / window / event / text / dedup / vector ops
  plans         medallion pipeline, verification, reports
  streaming     Structured Streaming variants of the event operators
"""

from etl_project_gcp_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
