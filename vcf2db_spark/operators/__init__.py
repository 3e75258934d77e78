from vcf2db_spark.operators.impacts import explode_impacts, top_impacts, with_top_impact
from vcf2db_spark.operators.variants import (
    assign_variant_id,
    with_genotype_stats,
    with_variant_type,
)

__all__ = [
    "explode_impacts",
    "top_impacts",
    "with_top_impact",
    "assign_variant_id",
    "with_genotype_stats",
    "with_variant_type",
]
