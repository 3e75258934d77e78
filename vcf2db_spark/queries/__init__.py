"""Declared-query modules. Importing this package populates the registry."""

from vcf2db_spark.queries import etl, extensions, relational, windows  # noqa: F401
from vcf2db_spark.registry import ORACLES, QUERIES  # noqa: F401
