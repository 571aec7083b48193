"""Sink round-trips: compaction (many small files in, few right-sized
files out, identical data) and the CSV/JSON export sinks."""

from pipeline_pyspark_etl_imdb_spark.sources.parquet_io import (
    compact_parquet,
    write_csv,
    write_json,
)
from pipeline_pyspark_etl_imdb_spark.sources.tsv import read_tsv
from tests.conftest import SF_SMOKE


def test_csv_and_json_sinks_round_trip(spark, tmp_path):
    nation = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    csv_path, json_path = str(tmp_path / "csv"), str(tmp_path / "json")

    write_csv(nation, csv_path)
    back = read_tsv(
        spark, csv_path, schema="n_nationkey bigint, n_name string, n_regionkey bigint"
    )
    assert sorted(back.collect()) == sorted(nation.collect())

    write_json(nation, json_path)
    back_j = spark.read.json(json_path).select("n_nationkey", "n_name", "n_regionkey")
    assert sorted(back_j.collect()) == sorted(nation.collect())


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


def test_orc_sink_round_trip(spark, tmp_path):
    from pipeline_pyspark_etl_imdb_spark.sources.parquet_io import read_orc, write_orc

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    write_orc(df, str(tmp_path / "orders_orc"), partition_cols=["o_orderstatus"])
    back = read_orc(spark, str(tmp_path / "orders_orc"))
    assert back.count() == df.count()
    got = sorted(
        (r.o_orderkey, r.o_custkey, r.o_orderstatus)
        for r in back.select("o_orderkey", "o_custkey", "o_orderstatus").collect()
    )
    want = sorted(
        (r.o_orderkey, r.o_custkey, r.o_orderstatus)
        for r in df.select("o_orderkey", "o_custkey", "o_orderstatus").collect()
    )
    assert got == want


def test_jsonl_source_round_trip_and_dead_letter(spark, tmp_path):
    from pipeline_pyspark_etl_imdb_spark.sources.parquet_io import read_jsonl

    p = tmp_path / "feed"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"id": 1, "v": "a"}\n'
        '{"id": 2, "v": "b"}\n'
        "this is not json\n"
        '{"id": "NaN-ish", "v": "c"}\n'
    )
    df = read_jsonl(spark, str(p), "id BIGINT, v STRING")
    rows = df.collect()
    good = {(r.id, r.v) for r in rows if r._corrupt_record is None}
    bad = [r for r in rows if r._corrupt_record is not None]
    assert (1, "a") in good and (2, "b") in good
    # both the non-JSON line and the type-mismatched record dead-letter
    # with the raw line preserved for replay
    assert len(bad) == 2
    assert any("not json" in r._corrupt_record for r in bad)


def test_xml_round_trip_with_pinned_schema(spark, tmp_path):
    from pipeline_pyspark_etl_imdb_spark.sources.parquet_io import read_xml, write_xml

    src = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    path = str(tmp_path / "nation_xml")
    write_xml(src, path, row_tag="nation")
    back = read_xml(
        spark,
        path,
        row_tag="nation",
        schema="n_nationkey bigint, n_name string, n_regionkey bigint",
    )
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(tuple(r) for r in src.select(*back.columns).collect())
    assert got == want
