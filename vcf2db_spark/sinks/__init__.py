from vcf2db_spark.sinks.writers import varchar_widths, write_jdbc, write_parquet

__all__ = ["varchar_widths", "write_jdbc", "write_parquet"]
