"""Hot-shingle df-cap gates (the MassiveText boilerplate guard).

A shingle shared by f documents contributes f^2 rows to the shingle
self-join; one saturated shingle in a large corpus is the classic dedup
scale-killer. df_capped_shingles must (1) drop exactly the saturated
shingles, (2) bound the candidate join on a corpus where every document
shares one boilerplate phrase, and (3) leave fixture-scale results
byte-identical to the uncapped path (max observed fixture df is 25 <<
the default cap of 1000 — the cap is a pure scale guard there).
"""

import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.neardup import (
    df_capped_shingles,
    jaccard_pairs,
    shingle_sets,
)
from tests.conftest import SF_ORACLE

# 30 docs that all open with the same boilerplate sentence (a saturated
# 3-shingle) and continue with per-doc unique words; docs 0 and 1
# additionally share a rare 5-word phrase (a TRUE near-dup signal).
_BOILER = "terms of service apply"
_RARE = "quick brown fox jumps high"


def _saturated_docs(spark):
    rows = []
    for i in range(30):
        uniq = " ".join(f"w{i}x{j}" for j in range(6))
        body = _RARE if i in (0, 1) else uniq
        rows.append((i, f"{_BOILER} {body}"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_cap_drops_only_saturated_shingles(spark):
    docs = _saturated_docs(spark)
    sh = shingle_sets(docs, k=3)
    capped = df_capped_shingles(sh, max_shingle_df=10)
    kept = {r.shingle for r in capped.select("shingle").distinct().collect()}
    # every shingle fully inside the boilerplate prefix is saturated (df=30)
    assert "terms of service" not in kept
    assert "of service apply" not in kept
    # the rare cross-doc phrase (df=2) must survive
    assert "quick brown fox" in kept


def test_cap_bounds_candidate_pairs_on_saturated_corpus(spark):
    docs = _saturated_docs(spark)
    sh = df_capped_shingles(shingle_sets(docs, k=3), max_shingle_df=10)
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    n_cand = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .count()
    )
    # uncapped, the saturated shingle alone creates C(30,2)=435 candidate
    # pairs; capped, only documents sharing RARE shingles meet. The only
    # rare overlaps are the doc0/doc1 phrase and the boundary shingles
    # that straddle boilerplate->body (df<=2 each), all within {0,1}.
    assert n_cand <= 3  # vastly fewer than 435, and only among true dups
    pairs = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .collect()
    )
    assert all((r.doc_a, r.doc_b) == (0, 1) for r in pairs)


def test_capped_jaccard_still_finds_true_neardups(spark):
    docs = _saturated_docs(spark)
    got = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(docs, k=3, threshold=0.5, max_shingle_df=10).collect()
    }
    assert got == {(0, 1)}


def test_cap_is_inert_at_fixture_scale(spark):
    """Default cap (1000) must leave the fixture result identical to the
    uncapped computation — the guard binds only on saturated shingles."""
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    capped = {
        (r.doc_a, r.doc_b, round(r.jaccard, 12))
        for r in jaccard_pairs(docs, k=3, threshold=0.8).collect()
    }
    uncapped = {
        (r.doc_a, r.doc_b, round(r.jaccard, 12))
        for r in jaccard_pairs(docs, k=3, threshold=0.8, max_shingle_df=None).collect()
    }
    assert capped == uncapped


def test_capped_plan_caches_shingles_once(spark):
    """Four subtrees (a-side, b-side, both size frames) consume the capped
    shingle rows; the plan must read them from ONE cached relation — the
    shingle explode + df window may appear only once, with every other
    consumer an InMemoryTableScan (Spark does not reuse exchanges across
    the aliased copies, so an uncached plan shows 4 Windows)."""
    from pipeline_pyspark_etl_imdb_spark.operators.util import release_tracked

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    try:
        plan = (
            jaccard_pairs(docs, k=3, threshold=0.8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # every consumer must hit the cache (the textual plan repeats the
        # cached subtree under each scan, so count scans, not Windows)
        assert plan.count("InMemoryTableScan") >= 4
    finally:
        release_tracked()


def test_minhash_estimate_identical_docs_perfect(spark):
    from pipeline_pyspark_etl_imdb_spark.operators import neardup
    from pipeline_pyspark_etl_imdb_spark.operators.util import release_tracked

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "totally different words here entirely now"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b): r
        for r in neardup.minhash_jaccard_estimates(docs).collect()
    }
    release_tracked()
    r = got[(1, 2)]
    assert r.est_jaccard == 1.0 and r.exact_jaccard == 1.0 and r.abs_err == 0.0
    # any (1,3)/(2,3) band collision would be reported with a LOW exact
    # jaccard, not silently dropped — the report surfaces estimator
    # false positives rather than hiding them
    for pair, row in got.items():
        if 3 in pair:
            assert row.exact_jaccard < 0.5


def test_minhash_estimate_agrees_with_verified_pairs(spark):
    """est >= matching-components consistency: pairs whose exact jaccard
    passes 0.8 must be exactly lsh_verified_pairs' output."""
    from pipeline_pyspark_etl_imdb_spark.operators import neardup
    from pipeline_pyspark_etl_imdb_spark.operators.util import release_tracked
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    report = {
        (r.doc_a, r.doc_b): r.exact_jaccard
        for r in neardup.minhash_jaccard_estimates(docs).collect()
    }
    verified = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in neardup.lsh_verified_pairs(docs, threshold=0.8).collect()
    }
    release_tracked()
    assert {p for p, j in report.items() if j >= 0.8} == set(verified)
    for p in verified:
        assert report[p] == verified[p]


def test_tfidf_cosine_identical_docs_top_ranked(spark):
    from pipeline_pyspark_etl_imdb_spark.operators import neardup
    from pipeline_pyspark_etl_imdb_spark.operators.util import release_tracked

    rows = [(i, f"rare{i} unique{i} token{i} filler") for i in range(40)]
    rows += [(100, "aardvark zebra quokka lemur"), (101, "aardvark zebra quokka lemur")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = neardup.tfidf_cosine_pairs(docs, min_sim=0.3, max_df_frac=0.1).collect()
    release_tracked()
    assert got, "identical docs must surface"
    top = got[0]
    assert (top.doc_a, top.doc_b) == (100, 101)
    assert top.cosine == pytest.approx(1.0)


def test_consensus_decomposes_into_both_signals(spark):
    from pipeline_pyspark_etl_imdb_spark.operators import neardup, similarity
    from pipeline_pyspark_etl_imdb_spark.operators.util import release_tracked
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    out = neardup.dedup_signal_consensus(docs, emb).collect()
    text_pairs = {
        (r.doc_a, r.doc_b)
        for r in neardup.lsh_verified_pairs(docs, threshold=0.8).collect()
    }
    emb_pairs = {
        (r.doc_a, r.doc_b)
        for r in similarity.cosine_dup_pairs(emb, threshold=0.35).collect()
    }
    release_tracked()
    assert {(r.doc_a, r.doc_b) for r in out if r.in_text} == text_pairs
    assert {(r.doc_a, r.doc_b) for r in out if r.in_embedding} == emb_pairs
    for r in out:
        assert r.in_text or r.in_embedding
        assert (r.text_jaccard is not None) == r.in_text
