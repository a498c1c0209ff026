"""Sources & sinks: scans (CSV/parquet/table), writers, metadata catalog."""

from azure_medicine_data_engineering_spark.sources.readers import (
    from_rows,
    read_csv,
    read_parquet,
    read_table,
    register_view,
)
from azure_medicine_data_engineering_spark.sources.writers import (
    save_table,
    write_parquet,
    write_single_csv,
)
from azure_medicine_data_engineering_spark.sources.catalog import (
    META_SCHEMA,
    create_table_with_meta,
    read_meta,
)

__all__ = [
    "from_rows",
    "read_csv",
    "read_parquet",
    "read_table",
    "register_view",
    "save_table",
    "write_parquet",
    "write_single_csv",
    "META_SCHEMA",
    "create_table_with_meta",
    "read_meta",
]
