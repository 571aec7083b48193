"""PySpark-native analytics engine with the capability class of
maldiouma/Pipeline-PySpark-ETL-IMDb (see SURVEY.md).

Layout:
  session       - SparkSession builder (AQE on, UTC, sane shuffle parallelism)
  sources/      - scans & sinks: gzip-TSV with null-marker normalization, Parquet
  functions/    - column-level helpers (cleaning, casts, bucketing, text)
  operators/    - engine operators: dedup, similarity search, text analysis,
                  top-k, multimodal plumbing
  plans/        - end-to-end pipelines (imdb star-schema parity, analytics marts)
  streaming/    - Structured Streaming event-window operators

Everything is DataFrame/SQL-first: logical plans go to Catalyst, Python
stays out of the hot path (Pandas UDFs only where built-ins can't express
the semantics).
"""

from pipeline_pyspark_etl_imdb_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
