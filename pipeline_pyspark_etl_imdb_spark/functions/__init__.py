from pipeline_pyspark_etl_imdb_spark.functions.cleaning import (
    null_if_equal,
    to_int,
    to_double,
    norm_token,
    half_point_bucket,
    width_bucket,
)

__all__ = [
    "null_if_equal",
    "to_int",
    "to_double",
    "norm_token",
    "half_point_bucket",
    "width_bucket",
]
