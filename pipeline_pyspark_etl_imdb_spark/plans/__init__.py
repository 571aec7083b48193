from pipeline_pyspark_etl_imdb_spark.plans import imdb

__all__ = ["imdb"]
