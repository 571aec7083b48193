from pipeline_pyspark_etl_imdb_spark.sources.tsv import read_tsv, replace_null_markers
from pipeline_pyspark_etl_imdb_spark.sources.parquet_io import read_parquet, write_parquet
from pipeline_pyspark_etl_imdb_spark.sources.tables import FIXTURE_TABLES, load_tables

__all__ = [
    "read_tsv",
    "replace_null_markers",
    "read_parquet",
    "write_parquet",
    "FIXTURE_TABLES",
    "load_tables",
]
