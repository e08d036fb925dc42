from etl_project_gcp_spark.sources.readers import (
    read_csv_bronze,
    read_csv_delimited,
    read_jsonl,
    read_orc,
    read_parquet,
    read_tables,
)
from etl_project_gcp_spark.sources.writers import (
    write_bucketed_table,
    write_csv,
    write_jsonl,
    write_orc,
    write_parquet_overwrite,
    write_table_overwrite,
)

__all__ = [
    "read_csv_bronze",
    "read_csv_delimited",
    "read_jsonl",
    "read_orc",
    "read_parquet",
    "read_tables",
    "write_bucketed_table",
    "write_csv",
    "write_jsonl",
    "write_orc",
    "write_parquet_overwrite",
    "write_table_overwrite",
]
