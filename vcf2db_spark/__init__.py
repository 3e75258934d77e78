"""vcf2db_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of quinlan-lab/vcf2db (see SURVEY.md).

Layers
------
- ``sources``   : VCF/PED readers, header→StructType inference (SURVEY §2A A1/A2/A9)
- ``operators`` : impacts explode + severity ranking, dedup, similarity,
                  interval joins (SURVEY §2A A6/A7, §2C)
- ``functions`` : codec UDFs, vector math, text analysis (SURVEY §2A A8, §2C)
- ``queries``   : the declared-query registry backing ``__spark_entry__``
- ``sinks``     : JDBC / parquet writers (SURVEY §2A A10)
- ``streaming`` : Structured Streaming variants (SURVEY §2C C7-C11)
"""

__version__ = "0.1.0"
