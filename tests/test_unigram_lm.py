"""Unigram-LM trainer pinned against an independent pure-Python
implementation (same tie-breaks: strictly-greater Viterbi replacement
scanning split points ascending, (-count, piece) pruning order)."""

import math

import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators import unigram_lm
from tests.conftest import SF_SMOKE


def _ref_train(word_counts, seed_size, vocab_size, n_iters, max_len):
    def substrings(w):
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_len) + 1):
                yield w[i:j]

    counts: dict = {}
    for w, c in word_counts.items():
        for p in substrings(w):
            counts[p] = counts.get(p, 0) + c
    seed = dict(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    )
    chars: dict = {}
    for w, c in word_counts.items():
        for ch in w:
            chars[ch] = chars.get(ch, 0) + c
    for ch, c in chars.items():
        seed.setdefault(ch, c)
    char_set = set(chars)
    counts = seed

    def to_logp(c):
        total = sum(c.values())
        return {k: math.log(v / total) for k, v in c.items()}

    def viterbi(word, logp):
        n = len(word)
        best = [float("-inf")] * (n + 1)
        back = [0] * (n + 1)
        best[0] = 0.0
        for i in range(1, n + 1):
            for j in range(max(0, i - max_len), i):
                piece = word[j:i]
                lp = logp.get(piece)
                if lp is None or best[j] == float("-inf"):
                    continue
                score = best[j] + lp
                if score > best[i]:
                    best[i] = score
                    back[i] = j
        out = []
        i = n
        while i > 0:
            j = back[i]
            out.append(word[j:i])
            i = j
        return out[::-1]

    logp = to_logp(counts)
    for _ in range(n_iters):
        nxt: dict = {}
        for w, c in word_counts.items():
            for p in viterbi(w, logp):
                nxt[p] = nxt.get(p, 0) + c
        for ch in char_set:
            nxt.setdefault(ch, 1)
        if len(nxt) > vocab_size:
            multi = sorted(
                ((k, v) for k, v in nxt.items() if k not in char_set),
                key=lambda kv: (-kv[1], kv[0]),
            )
            keep = dict(multi[: max(0, vocab_size - len(char_set))])
            keep.update({ch: nxt[ch] for ch in char_set})
            nxt = keep
        counts = nxt
        logp = to_logp(counts)
    return counts, logp


@pytest.mark.parametrize(
    "source,seed,vocab,iters",
    [("synthetic", 200, 40, 2), ("fixture", 800, 120, 2)],
)
def test_trainer_matches_reference(spark, source, seed, vocab, iters):
    if source == "synthetic":
        docs = spark.createDataFrame(
            [
                (1, "banana bandana ana ana banana"),
                (2, "nan banana band and anna"),
                (3, "dana nab nab banana bandana"),
            ],
            "doc_id long, text string",
        )
    else:
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(80)
    wc = {}
    for r in docs.select("text").collect():
        for w in r.text.split():
            if w:
                wc[w] = wc.get(w, 0) + 1
    want_counts, want_logp = _ref_train(wc, seed, vocab, iters, 4)
    got = unigram_lm.unigram_lm_train(
        docs, seed_size=seed, vocab_size=vocab, n_iters=iters
    ).collect()
    got_counts = {r.token: r.n for r in got}
    assert got_counts == want_counts
    for r in got:
        assert r.logprob == pytest.approx(want_logp[r.token], rel=1e-12)


def test_single_chars_survive_pruning(spark):
    docs = spark.createDataFrame(
        [(1, "aaa bbb aaa ccc")], "doc_id long, text string"
    )
    got = {r.token for r in unigram_lm.unigram_lm_train(
        docs, seed_size=50, vocab_size=4, n_iters=2
    ).collect()}
    assert {"a", "b", "c"} <= got  # coverage invariant
