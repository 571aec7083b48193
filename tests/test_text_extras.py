"""Edge gates for the text extras: the distinct-n windower must not emit
phantom n-grams for docs shorter than n (Spark's sequence(1, 0) runs
DESCENDING — the guard is load-bearing)."""

import pytest

from pipeline_pyspark_etl_imdb_spark.operators import text as text_ops


def test_ngram_diversity_short_doc_guard(spark):
    docs = spark.createDataFrame(
        [(1, "one", "en"), (2, "two words", "en"), (3, "a b c d", "fr")],
        "doc_id long, text string, lang string",
    )
    got = {
        (r.lang, r.n): (r.total_ngrams, r.distinct_ngrams)
        for r in text_ops.ngram_diversity(docs).collect()
    }
    # en: 3 unigrams; one bigram ("two words"); NO trigram anywhere in en
    assert got[("en", 1)] == (3, 3)
    assert got[("en", 2)] == (1, 1)
    assert ("en", 3) not in got
    assert got[("fr", 3)] == (2, 2)  # "a b c", "b c d"


def test_ngram_diversity_counts_duplicates(spark):
    docs = spark.createDataFrame(
        [(1, "x x x", "en")], "doc_id long, text string, lang string"
    )
    got = {
        (r.lang, r.n): (r.total_ngrams, r.distinct_ngrams, r.diversity)
        for r in text_ops.ngram_diversity(docs).collect()
    }
    assert got[("en", 1)] == (3, 1, 1 / 3)
    assert got[("en", 2)] == (2, 1, 0.5)


def test_lang_confusion_rows_stochastic(spark):
    from tests.conftest import SF_SMOKE

    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog is in a house of mine", "en"),
            (2, "el la de y que los un gato", "es"),
            (3, "zzz qqq xxx", "fr"),  # no stopword hits -> 'und'
        ],
        "doc_id long, text string, lang string",
    )
    got = {(r.label_lang, r.pred_lang): r for r in text_ops.lang_confusion(docs).collect()}
    assert got[("en", "en")].n == 1 and got[("en", "en")].recall == 1.0
    assert got[("es", "es")].n == 1
    assert got[("fr", "und")].n == 1
    # row-stochastic: per-label recalls sum to 1
    sums: dict = {}
    for (lab, _), r in got.items():
        sums[lab] = sums.get(lab, 0.0) + r.recall
    assert all(abs(v - 1.0) < 1e-12 for v in sums.values())


def test_kappa_perfect_and_skew_corrected(spark):
    # perfect agreement -> kappa 1
    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog is here of it", "en"),
            (2, "el la de y que los un", "es"),
            (3, "le la les et un une des", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    r = text_ops.lang_id_kappa(docs).collect()[0]
    assert r.accuracy == 1.0 and r.kappa == pytest.approx(1.0)
    # constant predictor on skewed labels: accuracy high, kappa 0
    docs2 = spark.createDataFrame(
        [(i, "the cat and of is a to in", "en") for i in range(9)]
        + [(9, "the cat and of is a to in", "fr")],
        "doc_id long, text string, lang string",
    )
    r2 = text_ops.lang_id_kappa(docs2).collect()[0]
    assert r2.accuracy == 0.9
    assert r2.kappa == pytest.approx(0.0)


def test_lang_token_entropy_uniform_and_skewed(spark):
    import math

    from pipeline_pyspark_etl_imdb_spark.operators.text import lang_token_entropy

    docs = spark.createDataFrame(
        [
            ("uni", "a b c d"),          # 4 tokens, each once: H = ln 4
            ("skew", "x x x x x x x y"), # heavy head: H << ln 2? (no: 2 types)
            ("mono", "z z z z"),         # single type: H = 0, efficiency NULL
        ],
        "lang string, text string",
    )
    out = {r.lang: r for r in lang_token_entropy(docs).collect()}
    assert abs(out["uni"].entropy_nats - math.log(4)) < 1e-12
    assert abs(out["uni"].entropy_efficiency - 1.0) < 1e-12
    p = 7 / 8
    want = -(p * math.log(p) + (1 - p) * math.log(1 - p))
    assert abs(out["skew"].entropy_nats - want) < 1e-12
    assert out["skew"].entropy_efficiency < 1.0
    assert out["mono"].entropy_nats == 0.0
    assert out["mono"].entropy_efficiency is None


def test_vocab_coverage_curve_hand_built(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.text import vocab_coverage_curve

    # counts: the 4, quick 2, fox 1, brown 1  (8 tokens, 4 types)
    docs = spark.createDataFrame(
        [(1, "the the quick fox"), (2, "the quick brown"), (3, "the")],
        "doc_id long, text string",
    )
    rows = {
        r.vocab_size: r
        for r in vocab_coverage_curve(docs, sizes=(1, 2, 3, 8)).collect()
    }
    assert rows[1].n_types == 4 and rows[1].n_tokens == 8
    assert rows[1].covered_tokens == 4  # "the"
    assert rows[1].coverage == pytest.approx(0.5)
    assert rows[2].covered_tokens == 6  # + "quick"
    assert rows[3].covered_tokens == 7  # + "brown" (tie with fox, token asc)
    assert rows[8].covered_tokens == 8
    assert rows[8].covered_types == 4  # capped at n_types
    assert rows[8].coverage == pytest.approx(1.0)


def test_distinctive_logodds_matches_python(spark):
    import math

    from pipeline_pyspark_etl_imdb_spark.operators.text import (
        distinctive_tokens_logodds,
    )
    from pyspark.sql import functions as F

    # group A over-uses "alpha", B over-uses "beta"; "common" is shared
    rows = []
    for i in range(30):
        rows.append((i, "alpha common word" if i % 3 else "alpha alpha common", "en"))
    for i in range(30, 60):
        rows.append((i, "beta common word" if i % 3 else "beta beta common", "fr"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r.token: r
        for r in distinctive_tokens_logodds(
            docs, in_group=(F.col("lang") == "en"), top_k=10, min_count=1
        ).collect()
    }
    # recompute in python
    from collections import Counter

    ca: Counter = Counter()
    cb: Counter = Counter()
    for _, text, lang in rows:
        (ca if lang == "en" else cb).update(text.split())
    vocab = set(ca) | set(cb)
    n_a, n_b = sum(ca.values()), sum(cb.values())
    total = n_a + n_b
    a0 = 1000.0
    z = {}
    for w in vocab:
        ya, yb = ca[w], cb[w]
        aw = a0 * (ya + yb) / total
        delta = math.log((ya + aw) / (n_a + a0 - ya - aw)) - math.log(
            (yb + aw) / (n_b + a0 - yb - aw)
        )
        var = 1 / (ya + aw) + 1 / (yb + aw)
        z[w] = delta / math.sqrt(var)
    assert got["alpha"].z_logodds == pytest.approx(z["alpha"], rel=1e-12)
    assert got["beta"].z_logodds == pytest.approx(z["beta"], rel=1e-12)
    # alpha is the most en-distinctive, beta the least
    ordered = sorted(got.values(), key=lambda r: -r.z_logodds)
    assert ordered[0].token == "alpha"
    assert z["alpha"] > 0 > z["beta"]
