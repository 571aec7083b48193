"""Compaction: many small files in, few right-sized files out, identical
data."""

from pipeline_pyspark_etl_imdb_spark.sources.parquet_io import compact_parquet
from tests.conftest import SF_SMOKE


def test_compact_reduces_file_count_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    dest = str(tmp_path / "compacted")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    orders.repartition(64).write.parquet(src)  # simulate a fragmented sink

    n_files = compact_parquet(spark, src, dest, target_file_bytes=1 << 20)
    out_files = [p for p in __import__("pathlib").Path(dest).glob("*.parquet")]
    assert len(out_files) == n_files
    assert n_files < 64

    before = orders.orderBy("o_orderkey").collect()
    after = spark.read.parquet(dest).orderBy("o_orderkey").collect()
    assert before == after
