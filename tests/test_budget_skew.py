"""key_skew_profile, temperature_mix_plan, select_to_token_budget.

The registry/oracle suite (test_entry_oracle.py) pins all three against
DuckDB on the fixtures; these tests pin the SEMANTIC invariants on
engineered inputs the fixtures can't exercise (saturated hot keys, NULL
keys, budget edge cases, decomposition == naive global cumsum).
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.corpus import select_to_token_budget
from pipeline_pyspark_etl_imdb_spark.operators.importance import temperature_mix_plan
from pipeline_pyspark_etl_imdb_spark.operators.text import quality_expr, tokens
from pipeline_pyspark_etl_imdb_spark.operators.warehouse import key_skew_profile


def test_key_skew_profile_hot_and_null_keys(spark):
    # 90 rows of key 'hot', 9 of 'warm', 1 NULL -> 3 distinct keys
    rows = [("hot",)] * 90 + [("warm",)] * 9 + [(None,)]
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_profile(df, "k", top_n=2).collect()
    assert [r.key_value for r in out] == ["hot", "warm"]
    hot = out[0]
    assert hot.cnt == 90
    assert abs(hot.row_share - 0.9) < 1e-12
    # skew factor: 90 * 3 keys / 100 rows = 2.7x a uniform reducer
    assert abs(hot.skew_factor - 2.7) < 1e-12
    # NULL is a real key: with top_n=3 it must appear (hashes to one reducer too)
    out3 = key_skew_profile(df, "k", top_n=3).collect()
    assert out3[2].key_value is None and out3[2].cnt == 1


def test_key_skew_profile_uniform_is_flat(spark):
    df = spark.range(100).select((F.col("id") % 10).alias("k"))
    out = key_skew_profile(df, "k", top_n=10).collect()
    assert len(out) == 10
    assert all(abs(r.skew_factor - 1.0) < 1e-12 for r in out)


def test_temperature_mix_flattens_shares(spark):
    docs = spark.createDataFrame(
        [(i, "big", "w " * 99 + "w") for i in range(90)]
        + [(i + 1000, "small", "w " * 9 + "w") for i in range(10)],
        "doc_id long, lang string, text string",
    )
    out = {r.domain: r for r in temperature_mix_plan(docs, token_budget=10_000).collect()}
    big, small = out["big"], out["small"]
    # raw shares: 9000/9100 vs 100/9100; sqrt-temperature must pull the
    # small domain UP and the big domain DOWN, both summing to 1
    assert small.temp_share > small.raw_share
    assert big.temp_share < big.raw_share
    assert abs(big.temp_share + small.temp_share - 1.0) < 1e-9
    assert abs(big.raw_share + small.raw_share - 1.0) < 1e-9
    # planned tokens follow temperature shares; repeat>1 == upsampled
    assert big.planned_tokens + small.planned_tokens <= 10_000
    assert small.repeat_factor > 1.0  # 10k * ~0.25 / 100 tokens available


def _naive_budget_keep(spark, docs, budget):
    scored = docs.select(
        "doc_id",
        quality_expr(F.col("text")).alias("quality"),
        F.size(tokens(F.lower(F.col("text")))).cast("bigint").alias("n_tokens"),
    ).where(F.col("n_tokens") >= 1)
    w = (
        Window.orderBy(F.desc("quality"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        scored.withColumn(
            "p", F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("bigint"))
        )
        .where(F.col("p") < budget)
        .select("doc_id")
    )


def test_token_budget_matches_naive_global_cumsum(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    for budget in (1, 5_000, 20_000, 10**9):
        got = {r.doc_id for r in select_to_token_budget(docs, budget).collect()}
        want = {r.doc_id for r in _naive_budget_keep(spark, docs, budget).collect()}
        assert got == want, f"budget={budget}: {len(got)} vs {len(want)}"


def test_token_budget_edges(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, "delta epsilon")],
        "doc_id long, text string",
    )
    # zero budget keeps nothing; empty doc never appears even with a huge one
    assert select_to_token_budget(docs, 0).count() == 0
    kept = {r.doc_id for r in select_to_token_budget(docs, 10**9).collect()}
    assert kept == {1, 3}
    # tight budget agrees with the naive global cumsum on the same frame
    got = {r.doc_id for r in select_to_token_budget(docs, 3).collect()}
    want = {r.doc_id for r in _naive_budget_keep(spark, docs, 3).collect()}
    assert got == want
