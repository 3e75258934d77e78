from vcf2db_spark.sinks.sqlite import write_gemini_db, write_sqlite_table
from vcf2db_spark.sinks.writers import (
    compact_parquet,
    optimize_parquet,
    varchar_widths,
    write_bucketed,
    write_jdbc,
    write_parquet,
)

__all__ = [
    "compact_parquet",
    "optimize_parquet",
    "varchar_widths",
    "write_bucketed",
    "write_gemini_db",
    "write_jdbc",
    "write_parquet",
    "write_sqlite_table",
]
