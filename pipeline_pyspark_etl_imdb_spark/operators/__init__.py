from pipeline_pyspark_etl_imdb_spark.operators.topk import top_k_per_group
from pipeline_pyspark_etl_imdb_spark.operators.dedup import (
    dedup_exact_rows,
    dedup_by_key,
    dedup_by_key_deterministic,
)

__all__ = [
    "top_k_per_group",
    "dedup_exact_rows",
    "dedup_by_key",
    "dedup_by_key_deterministic",
]
