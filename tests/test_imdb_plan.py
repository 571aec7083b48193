"""IMDb star-schema parity: the exact edge semantics the reference
implements (SURVEY.md §2) on tiny hand-built TSV fixtures — null markers,
cast-to-NULL, 3VL filters, dedup survivorship, inner explode, bucketing,
vote thresholds, top-K ties — plus the end-to-end CLI zone layout."""

import gzip
import pathlib

import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.plans import imdb
from pipeline_pyspark_etl_imdb_spark.plans.imdb_cli import main as cli_main
from pipeline_pyspark_etl_imdb_spark.sources.tsv import read_tsv

TITLE_BASICS = """tconst\ttitleType\tprimaryTitle\toriginalTitle\tisAdult\tstartYear\tendYear\truntimeMinutes\tgenres
tt1\tmovie\tAlpha\tAlpha\t0\t1990\t\\N\t100\tDrama,Comedy
tt2\tmovie\tBeta\tBeta\t0\t1990\t\\N\t\\N\tdrama
tt3\tshort\tGamma\tGamma\t0\t1991\t\\N\t15\tComedy
tt4\tmovie\tDelta\tDelta\t0\t\\N\t\\N\tbad\t\\N
tt5\tmovie\tEpsilon\tEpsilon\t1\t1991\t\\N\t90\t Comedy , Horror
tt1\tmovie\tAlphaDup\tAlphaDup\t0\t1990\t\\N\t101\tDrama
tt6\t\\N\tZeta\tZeta\t0\t1992\t\\N\t80\tDrama
"""

TITLE_RATINGS = """tconst\taverageRating\tnumVotes
tt1\t8.0\t2000
tt2\t7.25\t1500
tt4\t6.5\t999
tt5\t\\N\t1200
tt9\t5.0\t50
"""


@pytest.fixture(scope="module")
def raw_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imdb_raw")
    for name, body in [
        ("title.basics.tsv.gz", TITLE_BASICS),
        ("title.ratings.tsv.gz", TITLE_RATINGS),
    ]:
        with gzip.open(d / name, "wt") as fh:
            fh.write(body)
    return d


@pytest.fixture(scope="module")
def staged(spark, raw_dir):
    titles = imdb.stage_titles(read_tsv(spark, str(raw_dir / "title.basics.tsv.gz")))
    ratings = imdb.stage_ratings(read_tsv(spark, str(raw_dir / "title.ratings.tsv.gz")))
    return titles.cache(), ratings.cache()


def test_stage_titles_semantics(staged):
    titles, _ = staged
    rows = {r.tconst: r for r in titles.collect()}
    # 3VL: NULL titleType (tt6 via \N) and non-movie (tt3) are dropped;
    # dedup keeps exactly one row per tconst
    assert set(rows) == {"tt1", "tt2", "tt4", "tt5"}
    # \N -> NULL then int cast; non-numeric 'bad' casts to NULL not error
    assert rows["tt4"].startYear is None and rows["tt4"].runtimeMinutes is None
    assert rows["tt2"].runtimeMinutes is None
    assert rows["tt1"].startYear == 1990


def test_stage_ratings_types(staged):
    _, ratings = staged
    rows = {r.tconst: r for r in ratings.collect()}
    assert rows["tt2"].averageRating == 7.25 and rows["tt2"].numVotes == 1500
    assert rows["tt5"].averageRating is None


def test_dim_year_distinct_non_null(staged):
    titles, _ = staged
    years = {r.year for r in imdb.build_dim_year(titles).collect()}
    assert years == {1990, 1991}


def test_genre_explode_trim_lower(staged):
    titles, _ = staged
    dim_genre, bridge = imdb.build_dim_genre_and_bridge(titles)
    assert {r.genrekey for r in dim_genre.collect()} == {"drama", "comedy", "horror"}
    pairs = {(r.titlekey, r.genrekey) for r in bridge.collect()}
    # tt4 (\N genres) contributes nothing (inner explode); ' Comedy , Horror'
    # trims + lowers; tt1's 'Drama,Comedy' splits into two rows
    assert pairs == {
        ("tt1", "drama"),
        ("tt1", "comedy"),
        ("tt2", "drama"),
        ("tt5", "comedy"),
        ("tt5", "horror"),
    }


def test_fact_inner_join(staged):
    titles, ratings = staged
    fact = imdb.build_fact_ratings(titles, ratings)
    rows = {r.titlekey: r for r in fact.collect()}
    # inner: tt9 (ratings only) and any unrated movie drop out
    assert set(rows) == {"tt1", "tt2", "tt4", "tt5"}
    assert rows["tt1"].yearkey == 1990 and rows["tt1"].num_votes == 2000


def test_mart_year_kpi_null_group_and_agg_nulls(staged):
    titles, ratings = staged
    kpi = imdb.build_mart_year_kpi(imdb.build_fact_ratings(titles, ratings))
    by_year = {r.yearkey: r for r in kpi.collect()}
    # NULL yearkey (tt4) forms its own group; count(*) counts it
    assert None in by_year and by_year[None].n_movies == 1
    # avg skips NULL ratings: 1991 has only tt5 whose rating is NULL
    assert by_year[1991].mean_rating is None and by_year[1991].total_votes == 1200
    assert by_year[1990].mean_rating == pytest.approx((8.0 + 7.25) / 2)


def test_mart_tops_threshold_and_rank(staged):
    titles, ratings = staged
    fact = imdb.build_fact_ratings(titles, ratings)
    _, bridge = imdb.build_dim_genre_and_bridge(titles)
    top = imdb.build_mart_top_genre_year(
        fact, bridge, min_votes=1000, top_n=10, deterministic=True
    )
    rows = top.collect()
    # tt4 filtered by min_votes (999); every surviving row ranks from 1
    assert all(r.num_votes >= 1000 for r in rows)
    drama_1990 = sorted(
        [r for r in rows if r.yearkey == 1990 and r.genrekey == "drama"],
        key=lambda r: r.rk,
    )
    assert [r.titlekey for r in drama_1990] == ["tt1", "tt2"]  # 2000 > 1500 votes


def test_rating_distribution_buckets(staged):
    titles, ratings = staged
    dist = imdb.build_mart_rating_distribution(imdb.build_fact_ratings(titles, ratings))
    buckets = {(r.yearkey, r.rating_bucket): r["count"] for r in dist.collect()}
    # 8.0 -> 8.0 bucket; 7.25 -> 7.0 bucket (floor(x*2)/2); NULL rating -> NULL bucket
    assert buckets[(1990, 8.0)] == 1
    assert buckets[(1990, 7.0)] == 1
    assert buckets[(1991, None)] == 1


def test_cli_end_to_end_zone_layout(spark, raw_dir, tmp_path, monkeypatch):
    # the CLI builds its own session via get_spark; getOrCreate reuses ours
    dw, marts = tmp_path / "dw", tmp_path / "marts"
    monkeypatch.setattr(
        "pipeline_pyspark_etl_imdb_spark.plans.imdb_cli.get_spark", lambda name: spark
    )
    monkeypatch.setattr(spark, "stop", lambda: None)
    cli_main(
        [
            "--raw-dir", str(raw_dir),
            "--dw-dir", str(dw),
            "--marts-dir", str(marts),
            "--min-votes", "1000",
        ]
    )
    assert (dw / "fact_ratings").is_dir()
    # fact is hive-partitioned by yearkey
    assert any(p.name.startswith("yearkey=") for p in (dw / "fact_ratings").iterdir())
    for mart in ("mart_year_kpi", "mart_top_genre_year",
                 "mart_top_year_by_rating", "mart_rating_distribution"):
        assert (marts / mart).is_dir(), mart
    # written marts read back with the expected grain
    kpi = spark.read.parquet(str(marts / "mart_year_kpi"))
    assert kpi.count() == 3  # 1990, 1991, NULL-year group


def test_marts_consumable_from_pandas(spark, raw_dir, tmp_path, monkeypatch):
    """Reference EP3 (demo_colab.ipynb consumption cells): the published
    marts must be directly consumable by plain pandas — no Spark in the
    reader's loop — with schema and values intact."""
    import math

    import pandas as pd

    dw, marts = tmp_path / "dw", tmp_path / "marts"
    monkeypatch.setattr(
        "pipeline_pyspark_etl_imdb_spark.plans.imdb_cli.get_spark", lambda name: spark
    )
    monkeypatch.setattr(spark, "stop", lambda: None)
    cli_main(
        [
            "--raw-dir", str(raw_dir),
            "--dw-dir", str(dw),
            "--marts-dir", str(marts),
            "--min-votes", "1000",
        ]
    )
    kpi = pd.read_parquet(marts / "mart_year_kpi")
    assert {"yearkey", "n_movies", "mean_rating", "total_votes"} <= set(kpi.columns)
    y1990 = kpi[kpi.yearkey == 1990].iloc[0]
    assert y1990.n_movies == 2 and y1990.total_votes == 3500
    assert abs(y1990.mean_rating - 7.625) < 1e-12
    y1991 = kpi[kpi.yearkey == 1991].iloc[0]
    assert math.isnan(y1991.mean_rating)  # NULL aggregate survives the trip
    top = pd.read_parquet(marts / "mart_top_genre_year")
    assert (top.num_votes >= 1000).all()
    # the hive-partitioned fact zone supports the partition-pruned read a
    # pandas consumer actually does (reading one yearkey directory; a full
    # unpartitioned read would also drag the NULL-year partition through
    # pyarrow's dictionary unification, which rejects nulls)
    fact_1990 = pd.read_parquet(dw / "fact_ratings" / "yearkey=1990")
    assert set(fact_1990.titlekey) == {"tt1", "tt2"}
