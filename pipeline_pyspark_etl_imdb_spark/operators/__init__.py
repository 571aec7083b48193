from pipeline_pyspark_etl_imdb_spark.operators.topk import top_k_per_group
from pipeline_pyspark_etl_imdb_spark.operators.dedup import (
    dedup_exact_rows,
    dedup_by_key,
    dedup_by_key_deterministic,
)
from pipeline_pyspark_etl_imdb_spark.operators.asof import asof_join
from pipeline_pyspark_etl_imdb_spark.operators.rangejoin import range_join
from pipeline_pyspark_etl_imdb_spark.operators.skew import salted_agg, salted_join
from pipeline_pyspark_etl_imdb_spark.operators.util import fan_out

__all__ = [
    "top_k_per_group",
    "dedup_exact_rows",
    "dedup_by_key",
    "dedup_by_key_deterministic",
    "asof_join",
    "range_join",
    "salted_agg",
    "salted_join",
    "fan_out",
]
