"""Property test for the BPE oracle's delimited-symbol encoding.

The rows-only -> hash-oracle conversion of the BPE family
(plans/oracles.py _bpe_rounds_sql) rests on one lemma: the greedy
LEFTMOST-FIRST merge fold (operators/bpe.py _apply_merge — the exact
semantics the pure-Python reference and Spark both implement) equals a
left-to-right non-overlapping string replace() under the encoding
  enc([s1, s2, ...]) = SEP s1 SEP SEP s2 SEP ... SEP sn SEP
with pattern SEP L SEP SEP R SEP -> SEP L R SEP.

This file checks the lemma itself over randomized symbol sequences and
merge pairs (including pathological self-merges like (a, a) on runs of
a, and merged symbols that extend one of their parts), independent of
any engine — if the encoding were subtly wrong, this is where it fails
first, not as an opaque sf0.1 hash mismatch."""

from hypothesis import given, settings
from hypothesis import strategies as st

SEP = "\x1f"


def fold_merge(syms: list[str], left: str, right: str) -> list[str]:
    # verbatim greedy leftmost-first apply (operators/bpe.py _apply_merge,
    # tests/test_bpe.py reference)
    out: list[str] = []
    for x in syms:
        if out and out[-1] == left and x == right:
            out[-1] = left + right
        else:
            out.append(x)
    return out


def enc(syms: list[str]) -> str:
    return "".join(SEP + s + SEP for s in syms)


def dec(seg: str) -> list[str]:
    if not seg:
        return []
    return seg[1:-1].split(SEP + SEP)


def replace_merge(seg: str, left: str, right: str) -> str:
    # Python str.replace is left-to-right non-overlapping — the same
    # contract as SQL replace() in DuckDB and Spark
    return seg.replace(
        SEP + left + SEP + SEP + right + SEP, SEP + left + right + SEP
    )


# symbols drawn from a tiny alphabet so adjacent collisions, self-merges,
# and prefix/suffix confusions (e.g. symbol "ab" vs pair (a, b)) are COMMON
_sym = st.text(alphabet="ab", min_size=1, max_size=3)


@settings(max_examples=500, deadline=None)
@given(
    syms=st.lists(_sym, min_size=0, max_size=12),
    left=_sym,
    right=_sym,
)
def test_fold_equals_delimited_replace_single_merge(syms, left, right):
    assert dec(replace_merge(enc(syms), left, right)) == fold_merge(
        syms, left, right
    )


@settings(max_examples=200, deadline=None)
@given(
    words=st.lists(st.text(alphabet="ab", min_size=1, max_size=8), min_size=1, max_size=8),
    merges=st.lists(st.tuples(_sym, _sym), min_size=1, max_size=5),
)
def test_fold_equals_delimited_replace_merge_sequence(words, merges):
    # a full training-style sequence: later merges see symbols CREATED by
    # earlier ones (the regime the single-merge test can't reach)
    for w in words:
        syms = list(w)
        seg = enc(syms)
        for left, right in merges:
            syms = fold_merge(syms, left, right)
            seg = replace_merge(seg, left, right)
            assert dec(seg) == syms
