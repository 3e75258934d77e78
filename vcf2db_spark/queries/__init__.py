"""Declared-query modules. Importing this package populates the registry."""

from vcf2db_spark.queries import (  # noqa: F401
    etl,
    extensions,
    pipeline_ext,
    relational,
    streaming_dq,
    windows,
)
from vcf2db_spark.registry import ORACLES, QUERIES  # noqa: F401
