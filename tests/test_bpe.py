"""Distributed BPE pinned bit-exact against a pure-Python reference.

The operator is rows-only for the driver (the iterative argmax loop is
not one ANSI-SQL query), so this suite is its correctness contract:
same corpus -> same merges, same counts, on both implementations.
"""

from collections import Counter

import pytest

from pipeline_pyspark_etl_imdb_spark.operators import bpe
from tests.conftest import SF_SMOKE


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Independent BPE: dict/Counter arithmetic, no Spark. Tie-break
    (count desc, left asc, right asc) and greedy left-to-right apply
    order mirror the documented operator contract."""
    seg = {w: [c for c in w] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for w, syms in seg.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += word_counts[w]
        if not pair_counts:
            break
        (left, right), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, cnt))
        for w, syms in seg.items():
            out = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            seg[w] = out
    token_counts: Counter = Counter()
    for w, syms in seg.items():
        for t in syms:
            token_counts[t] += word_counts[w]
    return merges, dict(token_counts)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


@pytest.fixture(scope="module")
def ref(spark, docs):
    wc = {
        r.word: r.wcount
        for r in bpe.word_counts(docs).collect()
    }
    return wc, _reference_bpe(wc, 8)


def test_word_counts_match_python(docs, ref):
    wc, _ = ref
    texts = [r.text for r in docs.select("text").collect()]
    expected: Counter = Counter()
    for t in texts:
        for w in (t or "").split():
            expected[w] += 1
    assert wc == dict(expected)


def test_merges_exact(docs, ref):
    _, (ref_merges, _) = ref
    got = [
        (r.left, r.right, int(r.pair_count))
        for r in bpe.bpe_merge_table(docs, n_merges=8).collect()
    ]
    assert got == ref_merges


def test_merge_table_shape(docs):
    rows = bpe.bpe_merge_table(docs, n_merges=3).collect()
    assert [r.merge_rank for r in rows] == [0, 1, 2]
    assert all(r.merged == r.left + r.right for r in rows)


def test_token_counts_exact(docs, ref):
    _, (_, ref_tokens) = ref
    got = {
        r.token: int(r.n_total)
        for r in bpe.bpe_token_counts(docs, n_merges=8).collect()
    }
    assert got == ref_tokens


def test_distributed_regime_matches_local(docs, ref):
    """Past the size guard (forced with local_vocab_max=0) the per-round
    distributed loop must produce the identical model — merges AND final
    token counts — as the local fit / pure-Python reference."""
    _, (ref_merges, ref_tokens) = ref
    got_merges = [
        (r.left, r.right, int(r.pair_count))
        for r in bpe.bpe_merge_table(docs, n_merges=8, local_vocab_max=0).collect()
    ]
    assert got_merges == ref_merges
    got_tokens = {
        r.token: int(r.n_total)
        for r in bpe.bpe_token_counts(docs, n_merges=8, local_vocab_max=0).collect()
    }
    assert got_tokens == ref_tokens


def test_greedy_overlap_apply(spark):
    """'aaa' with merge (a,a) segments to [aa, a] — leftmost-first."""
    df = spark.createDataFrame([("aaa aaa b",)], "text string")
    model = bpe.bpe_learn(df, n_merges=1)
    assert model.merges[0][:2] == ("a", "a")
    segs = {r.word: list(r.syms) for r in model.segmented.collect()}
    model.segmented.unpersist()
    assert segs["aaa"] == ["aa", "a"]


def test_encode_docs_matches_python(spark, docs, ref):
    """bpe_encode_docs vs applying the reference merges word-by-word."""
    _wc, (merges, _tok) = ref
    rows = docs.select("doc_id", "text").collect()
    want = {}
    for r in rows:
        words = [w for w in r.text.split() if w]
        n_tok = n_chars = 0
        for w in words:
            syms = [c for c in w]
            for left, right, _cnt in merges:
                out = []
                for x in syms:
                    if out and out[-1] == left and x == right:
                        out[-1] = left + right
                    else:
                        out.append(x)
                syms = out
            n_tok += len(syms)
            n_chars += len(w)
        if words:
            want[r.doc_id] = (len(words), n_tok, n_chars)
    got = {
        r.doc_id: (r.n_words, r.n_tokens, r.n_chars)
        for r in bpe.bpe_encode_docs(docs, n_merges=8).collect()
    }
    assert got == want


def test_encode_docs_broadcasts_vocab_join(spark, docs):
    out = bpe.bpe_encode_docs(docs, n_merges=2)
    # localCheckpoint hides the original plan; re-derive the join shape
    # from a non-checkpointed equivalent of the final stage instead
    from pyspark.sql import functions as F

    model = bpe.bpe_learn(docs, 2)
    seg_sizes = F.broadcast(
        model.segmented.select("word", F.size("syms").alias("t"))
    )
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), r"\s+")).alias("word")
    ).where(F.col("word") != "")
    plan = (
        words.join(seg_sizes, "word")
        .groupBy("doc_id")
        .count()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    model.segmented.unpersist()
    assert "BroadcastHashJoin" in plan
    assert out.count() > 0


def test_source_fertility_matches_python(spark, docs, ref):
    """bpe_source_fertility vs the word-by-word reference replay,
    aggregated per source; ratios are exact-sum divisions."""
    _wc, (merges, _tok) = ref
    rows = docs.select("source", "doc_id", "text").collect()
    agg: dict = {}
    for r in rows:
        words = [w for w in r.text.split() if w]
        if not words:
            continue
        a = agg.setdefault(r.source, [set(), 0, 0, 0])
        a[0].add(r.doc_id)
        for w in words:
            syms = [c for c in w]
            for left, right, _cnt in merges:
                out = []
                for x in syms:
                    if out and out[-1] == left and x == right:
                        out[-1] = left + right
                    else:
                        out.append(x)
                syms = out
            a[1] += 1
            a[2] += len(syms)
            a[3] += len(w)
    got = {r.source: r for r in bpe.bpe_source_fertility(docs, n_merges=8).collect()}
    assert set(got) == set(agg)
    for src, (ids, n_w, n_t, n_c) in agg.items():
        g = got[src]
        assert (g.n_docs, g.n_words, g.n_tokens, g.n_chars) == (
            len(ids), n_w, n_t, n_c
        )
        assert g.tokens_per_word == n_t / n_w
        assert g.chars_per_token == n_c / n_t


def test_bpe_oracle_separator_precondition():
    """The BPE oracles' delimited-symbol encoding (plans/oracles.py
    _bpe_rounds_sql) assumes chr(31) never occurs in the corpus — if a
    future fixture violates this, fail HERE with a clear message rather
    than as an opaque hash mismatch."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        n = duckdb.connect().execute(
            f"SELECT count(*) FROM read_parquet("
            f"'/root/testdata/{sf}/documents.parquet') "
            "WHERE contains(text, chr(31))"
        ).fetchone()[0]
        assert n == 0, (
            f"{sf}: {n} documents contain chr(31); the _bpe_rounds_sql "
            "delimited-symbol encoding needs a different separator"
        )
