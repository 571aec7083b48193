"""Tokenizer-vocab / LM-scoring / chunking / sampling edge cases the
fixture-data oracle suite doesn't pin: chunk boundary arithmetic, ties,
determinism, and the corpus_build composition invariants."""

import math

from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.corpus import (
    chunk_documents,
    corpus_build,
    group_hash_sample,
)
from pipeline_pyspark_etl_imdb_spark.operators.text import unigram_logprob, vocab_build


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_chunk_boundaries_and_overlap(spark):
    text10 = " ".join(f"t{i}" for i in range(10))
    docs = _docs(spark, [(1, text10, "en"), (2, "a b", "en")])
    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_text, r.n_tokens)
        for r in chunk_documents(docs, max_tokens=8, overlap=2).collect()
    }
    # doc 1: 10 tokens, stride 6 -> chunks [0..8) and [6..10); overlap t6,t7
    assert got[(1, 0)] == (" ".join(f"t{i}" for i in range(8)), 8)
    assert got[(1, 1)] == (" ".join(f"t{i}" for i in range(6, 10)), 4)
    # doc 2: shorter than max -> single whole chunk
    assert got[(2, 0)] == ("a b", 2)
    assert len(got) == 3


def test_chunk_every_token_covered(spark):
    n = 100
    docs = _docs(spark, [(1, " ".join(str(i) for i in range(n)), "en")])
    chunks = chunk_documents(docs, max_tokens=16, overlap=4).collect()
    seen = set()
    for r in chunks:
        seen.update(r.chunk_text.split(" "))
    assert seen == {str(i) for i in range(n)}
    # chunk count formula: ceil((n - overlap) / stride)
    assert len(chunks) == math.ceil((n - 4) / 12)


def test_chunk_rejects_degenerate_overlap(spark):
    docs = _docs(spark, [(1, "a b c", "en")])
    try:
        chunk_documents(docs, max_tokens=4, overlap=4)
        raise AssertionError("expected ValueError")
    except ValueError as exc:
        assert "overlap" in str(exc)


def test_vocab_rank_and_tiebreak(spark):
    docs = _docs(spark, [(1, "b b b a a c", "en"), (2, "a z", "en")])
    rows = {r.token: (r.n, r.token_id) for r in vocab_build(docs, size=3).collect()}
    # a:3, b:3 (tie -> 'a' first alphabetically), c:1, z:1 (cut at size=3, 'c' < 'z')
    assert rows == {"a": (3, 0), "b": (3, 1), "c": (1, 2)}


def test_vocab_lowercases(spark):
    docs = _docs(spark, [(1, "Foo foo FOO", "en")])
    [row] = vocab_build(docs, size=10).collect()
    assert (row.token, row.n) == ("foo", 3)


def test_unigram_logprob_uniform_corpus(spark):
    # 4 equally frequent tokens -> every doc scores exactly ln(4)
    docs = _docs(spark, [(1, "a b", "en"), (2, "c d", "en")])
    rows = unigram_logprob(docs).collect()
    for r in rows:
        assert abs(r.avg_neg_logprob - math.log(4)) < 1e-12
        assert r.n_tokens == 2


def test_unigram_logprob_rare_scores_higher(spark):
    docs = _docs(spark, [(1, "x x x x x x x", "en"), (2, "q", "en")])
    got = {r.doc_id: r.avg_neg_logprob for r in unigram_logprob(docs).collect()}
    assert got[2] > got[1]


def test_group_hash_sample_bounds_and_determinism(spark):
    rows = [(i, f"text {i}", "en" if i % 2 else "fr") for i in range(100)]
    docs = _docs(spark, rows)
    a = {r.doc_id for r in group_hash_sample(docs, "lang", k=5).collect()}
    b = {r.doc_id for r in group_hash_sample(docs, "lang", k=5).collect()}
    assert a == b and len(a) == 10  # 5 per lang, reproducible
    # different salt -> different (still valid) sample
    c = {r.doc_id for r in group_hash_sample(docs, "lang", k=5, salt="other").collect()}
    assert len(c) == 10 and c != a


def test_corpus_build_invariants(spark):
    rows = (
        [(i, "the is and of a quality document with many common words " * 3, "en") for i in range(20)]
        + [(100 + i, "!!!??? ###", "en") for i in range(5)]  # low quality
        + [(200, "the is and unique text of doc two hundred " * 3, "zz")]  # no quota
    )
    docs = _docs(spark, rows)
    got = corpus_build(docs, {"en": 1.0}, quality_min=0.5, n_shards=4).collect()
    ids = {r.doc_id for r in got}
    # low-quality docs dropped; unquoted lang dropped; exact dups collapse to min id
    assert ids == {0}
    assert all(0 <= r.shard < 4 for r in got)


def test_chunk_exact_dedup_keeps_first_occurrence(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.corpus import chunk_exact_dedup

    a = " ".join(f"a{i}" for i in range(4))
    b = " ".join(f"b{i}" for i in range(4))
    c = " ".join(f"c{i}" for i in range(4))
    docs = _docs(
        spark,
        [
            (1, f"{a} {b}", "en"),   # both chunks novel -> fully kept
            (2, f"{b} {c}", "en"),   # b already seen in doc 1 -> only c kept
            (3, a, "en"),            # fully duplicate -> nothing kept
        ],
    )
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.clean_md5)
        for r in chunk_exact_dedup(docs, chunk_tokens=4).collect()
    }
    assert {k: v[:2] for k, v in got.items()} == {1: (2, 2), 2: (2, 1), 3: (1, 0)}
    assert got[3][2] is None  # nothing survives -> NULL digest
    assert got[1][2] is not None and got[2][2] is not None and got[1][2] != got[2][2]


def test_chunk_exact_dedup_within_doc_repetition(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.corpus import chunk_exact_dedup

    rep = " ".join(f"r{i}" for i in range(4))
    docs = _docs(spark, [(1, f"{rep} {rep} {rep}", "en")])
    [r] = chunk_exact_dedup(docs, chunk_tokens=4).collect()
    # intra-document repeats collapse too: 3 chunks, 1 kept
    assert (r.n_chunks, r.n_kept) == (3, 1)
