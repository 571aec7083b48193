"""Edge gates for the text extras: the distinct-n windower must not emit
phantom n-grams for docs shorter than n (Spark's sequence(1, 0) runs
DESCENDING — the guard is load-bearing)."""

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
