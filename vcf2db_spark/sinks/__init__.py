from vcf2db_spark.sinks.sqlite import write_gemini_db, write_sqlite_table
from vcf2db_spark.sinks.writers import varchar_widths, write_jdbc, write_parquet

__all__ = [
    "varchar_widths",
    "write_gemini_db",
    "write_jdbc",
    "write_parquet",
    "write_sqlite_table",
]
