"""IMDb star-schema warehouse: Raw TSV -> Staging -> DW core -> BI marts.

Reproduces the full output contract of the reference pipeline
(SURVEY.md §1.4; /root/reference/src/etl_imdb.py) on top of this engine's
generic operators, with the physical-plan fixes the reference lacks:

- staging DataFrames are cached once and shared by every downstream table
  (the reference recomputes titles_stg ~9x per run — SURVEY.md §3 EP1.7);
- the fact table is written partitioned by year and the marts can be
  rebuilt from the written core instead of re-deriving raw;
- top-K marts use the group-limit-optimizable rank pattern with
  deterministic tie-breaking available.

Output tables and their exact semantics (null handling, dedup, bucketing,
tie behavior) match the reference contract:

  dim_year(year)                               reference :152-153
  dim_title(titlekey, primaryTitle, originalTitle, titleType,
            startYear, runtimeMinutes, isAdult) reference :156-165
  dim_genre(genrekey)                          reference :168-179
  bridge_title_genre(titlekey, genrekey)       reference :180-182
  fact_ratings(titlekey, yearkey, avg_rating,
               num_votes, runtime_min)         reference :185-193
  mart_year_kpi(yearkey, n_movies, mean_rating,
                total_votes)                   reference :196-205
  mart_top_genre_year(yearkey, genrekey, titlekey,
                      avg_rating, num_votes, rk) reference :214-222
  mart_top_year_by_rating(yearkey, titlekey,
                      avg_rating, num_votes, rk) reference :224-228
  mart_rating_distribution(yearkey, rating_bucket,
                      count)                   reference :230-235
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.functions.cleaning import (
    half_point_bucket,
    norm_token,
    to_double,
    to_int,
)
from pipeline_pyspark_etl_imdb_spark.operators.dedup import dedup_by_key, dedup_exact_rows
from pipeline_pyspark_etl_imdb_spark.operators.topk import top_k_per_group
from pipeline_pyspark_etl_imdb_spark.sources.tsv import read_tsv, replace_null_markers

TITLE_BASICS_COLS_TO_CLEAN = (
    "startYear",
    "runtimeMinutes",
    "genres",
    "primaryTitle",
    "originalTitle",
    "titleType",
)


def stage_titles(titles_raw: DataFrame) -> DataFrame:
    """Clean + type the title.basics feed and keep one row per movie.

    Contract (reference :129-140): \\N -> NULL on the text/numeric columns,
    int casts with null-on-error, keep only titleType == 'movie' (3-valued
    logic drops NULL titleType), then one arbitrary survivor per tconst.
    """
    cleaned = replace_null_markers(titles_raw, TITLE_BASICS_COLS_TO_CLEAN)
    typed = cleaned.select(
        "tconst",
        "titleType",
        "primaryTitle",
        "originalTitle",
        to_int("isAdult").alias("isAdult"),
        to_int("startYear").alias("startYear"),
        to_int("runtimeMinutes").alias("runtimeMinutes"),
        "genres",
    )
    movies = typed.where(F.col("titleType") == "movie")
    return dedup_by_key(movies, ["tconst"])


def stage_ratings(ratings_raw: DataFrame) -> DataFrame:
    """Type the title.ratings feed; one row per tconst (reference :143-148)."""
    typed = replace_null_markers(ratings_raw, ["averageRating", "numVotes"]).select(
        "tconst",
        to_double("averageRating").alias("averageRating"),
        to_int("numVotes").alias("numVotes"),
    )
    return dedup_by_key(typed, ["tconst"])


def build_dim_year(titles_stg: DataFrame) -> DataFrame:
    """Distinct non-null start years (reference :152-153)."""
    return dedup_exact_rows(
        titles_stg.where(F.col("startYear").isNotNull()).select(
            F.col("startYear").alias("year")
        )
    )


def build_dim_title(titles_stg: DataFrame) -> DataFrame:
    """Title dimension keyed by tconst (reference :156-165)."""
    return titles_stg.select(
        F.col("tconst").alias("titlekey"),
        "primaryTitle",
        "originalTitle",
        "titleType",
        "startYear",
        "runtimeMinutes",
        "isAdult",
    )


def explode_genres(titles_stg: DataFrame) -> DataFrame:
    """(titlekey, genre) rows from the comma-joined multi-value column.

    Contract (reference :168-177): NULL-marker genres dropped, split on
    ',', inner explode (rows with no genres vanish), trim+lower
    normalization.
    """
    # genres was already marker-cleaned in stage_titles (it is in
    # TITLE_BASICS_COLS_TO_CLEAN); the NULL filter alone encodes the
    # contract here
    with_genres = titles_stg.select(
        F.col("tconst").alias("titlekey"),
        F.col("genres"),
    ).where(F.col("genres").isNotNull())
    exploded = with_genres.select(
        "titlekey", F.explode(F.split("genres", ",")).alias("raw_genre")
    )
    return exploded.select("titlekey", norm_token("raw_genre").alias("genre"))


def build_dim_genre_and_bridge(titles_stg: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Genre dimension + N:N title<->genre bridge (reference :168-182).

    The reference re-joins the exploded rows against the genre dim to form
    the bridge; since genrekey IS the normalized genre string, the join is
    an identity — we build the bridge directly from the exploded rows
    (same result, one shuffle and one self-join cheaper at scale).
    """
    title_genres = explode_genres(titles_stg)
    dim_genre = dedup_exact_rows(title_genres.select(F.col("genre").alias("genrekey")))
    bridge = dedup_exact_rows(
        title_genres.select("titlekey", F.col("genre").alias("genrekey"))
    )
    return dim_genre, bridge


def build_fact_ratings(titles_stg: DataFrame, ratings_stg: DataFrame) -> DataFrame:
    """Rated movies fact: titles ⋈ ratings inner on tconst (reference :185-193)."""
    return titles_stg.join(ratings_stg, "tconst", "inner").select(
        F.col("tconst").alias("titlekey"),
        F.col("startYear").alias("yearkey"),
        F.col("averageRating").alias("avg_rating"),
        F.col("numVotes").alias("num_votes"),
        F.col("runtimeMinutes").alias("runtime_min"),
    )


def build_mart_year_kpi(fact_ratings: DataFrame) -> DataFrame:
    """Per-year movie count / mean rating / vote volume (reference :196-205).

    count(*) keeps NULL-yearkey rows as their own group; avg/sum skip NULLs.
    """
    return (
        fact_ratings.groupBy("yearkey")
        .agg(
            F.count("*").alias("n_movies"),
            F.avg("avg_rating").alias("mean_rating"),
            F.sum("num_votes").alias("total_votes"),
        )
        .orderBy("yearkey")
    )


def build_mart_top_genre_year(
    fact_ratings: DataFrame,
    bridge: DataFrame,
    *,
    min_votes: int = 0,
    top_n: int = 10,
    deterministic: bool = False,
) -> DataFrame:
    """Top-N titles per (year, genre) by votes (reference :214-222).

    ``deterministic=True`` adds a titlekey tie-breaker (the reference's bare
    desc(num_votes) ordering picks arbitrary rows on ties).
    """
    joined = fact_ratings.join(bridge, "titlekey", "inner").where(
        F.col("num_votes") >= min_votes
    )
    order = [F.desc("num_votes")] + ([F.asc("titlekey")] if deterministic else [])
    ranked = top_k_per_group(joined, ["yearkey", "genrekey"], order, top_n)
    return ranked.select("yearkey", "genrekey", "titlekey", "avg_rating", "num_votes", "rk")


def build_mart_top_year_by_rating(
    fact_ratings: DataFrame,
    *,
    min_votes: int = 0,
    top_n: int = 10,
    deterministic: bool = False,
) -> DataFrame:
    """Top-N titles per year by rating (reference :224-228)."""
    filtered = fact_ratings.where(F.col("num_votes") >= min_votes)
    order = [F.desc("avg_rating")] + ([F.asc("titlekey")] if deterministic else [])
    ranked = top_k_per_group(filtered, ["yearkey"], order, top_n)
    return ranked.select("yearkey", "titlekey", "avg_rating", "num_votes", "rk")


def build_mart_rating_distribution(fact_ratings: DataFrame) -> DataFrame:
    """Histogram of ratings in 0.5-wide buckets per year (reference :230-235)."""
    return (
        fact_ratings.withColumn("rating_bucket", half_point_bucket("avg_rating"))
        .groupBy("yearkey", "rating_bucket")
        .agg(F.count("*").alias("count"))
        .orderBy("yearkey", "rating_bucket")
    )


@dataclass
class ImdbWarehouse:
    """End-to-end builder that owns caching and table lifecycle.

    Unlike the reference's main() (which re-derives staging for every one
    of its ~20 downstream jobs), staging tables are cached on first use and
    released by close(). On a cluster the cache is MEMORY_AND_DISK, so spill
    is graceful at scale.
    """

    spark: SparkSession
    title_basics_path: str
    title_ratings_path: str
    min_votes: int = 1000
    top_n: int = 10
    _cached: list[DataFrame] = field(default_factory=list)

    def _cache(self, df: DataFrame) -> DataFrame:
        df = df.persist()
        self._cached.append(df)
        return df

    def build(self) -> dict[str, DataFrame]:
        titles_stg = self._cache(stage_titles(read_tsv(self.spark, self.title_basics_path)))
        ratings_stg = self._cache(
            stage_ratings(read_tsv(self.spark, self.title_ratings_path))
        )
        dim_genre, bridge = build_dim_genre_and_bridge(titles_stg)
        fact = self._cache(build_fact_ratings(titles_stg, ratings_stg))
        return {
            "titles_stg": titles_stg,
            "ratings_stg": ratings_stg,
            "dim_year": build_dim_year(titles_stg),
            "dim_title": build_dim_title(titles_stg),
            "dim_genre": dim_genre,
            "bridge_title_genre": self._cache(bridge),
            "fact_ratings": fact,
            "mart_year_kpi": build_mart_year_kpi(fact),
            "mart_top_genre_year": build_mart_top_genre_year(
                fact, bridge, min_votes=self.min_votes, top_n=self.top_n
            ),
            "mart_top_year_by_rating": build_mart_top_year_by_rating(
                fact, min_votes=self.min_votes, top_n=self.top_n
            ),
            "mart_rating_distribution": build_mart_rating_distribution(fact),
        }

    def close(self) -> None:
        for df in self._cached:
            df.unpersist()
        self._cached.clear()
