"""The active driver window IS the staleness emission (VERDICT r7 #2).

The driver hash-checks the first 50 registry entries per round;
staleness.py computes the rotation that keeps every query's driver
signal fresh. As of r9 the rotation is CHANGE-AWARE (VERDICT r8 #1):
queries whose reachable call-graph nodes changed since their last green
driver row are promoted ahead of merely-stale ones, because a green row
certifies the code as of its round — not the code that exists now.

These pins make the window change auditable: the applied _R9_WINDOW
must equal what the tool proposes from the records and marker commits
that existed when the window was chosen (through r8), and the
registry's first 50 keys must be that window.
"""

import staleness
from pipeline_pyspark_etl_imdb_spark.plans.registry import (
    QUERIES,
    ROWS_ONLY,
    _R9_WINDOW,
)

WINDOW_ROUND = 9  # bump alongside the _R<N>_WINDOW rotation


def test_active_window_is_the_staleness_emission():
    proposal = staleness.propose_window(through_round=WINDOW_ROUND - 1)
    assert list(_R9_WINDOW) == proposal


def test_registry_head_is_the_window():
    assert list(QUERIES)[:50] == list(_R9_WINDOW)


def test_no_oracle_backed_query_is_invisible():
    """Zero-visibility-debt invariant: every oracle-backed query has a
    green driver row on record (a NEW query must enter through the
    window head, where staleness.propose_window puts it)."""
    last_green, last_seen, _ = staleness.load_history()
    rows_only = set(ROWS_ONLY)
    never = [
        n
        for n in QUERIES
        if n not in rows_only and last_green.get(n, 0) == 0
    ]
    # queries in the CURRENT window may legitimately await this round's
    # record; anything never-green OUTSIDE the window is invisible debt
    debt = [n for n in never if n not in set(_R9_WINDOW)]
    assert not debt, f"oracle-backed queries with no driver signal: {debt}"


# --- change-detection pins (stable: they compare marker COMMITS) ----------


def test_r8_plan_change_is_attributed_to_its_functions():
    """VERDICT r8 item #1's named instance: the three materialize_input
    callers changed in r8 (ranks.total_order_ranks + their text.py
    bodies) after their last green rows (r5/r4), so the r9 rotation must
    promote them — and the detector must name the actual functions."""
    nodes = staleness.changed_nodes("vocab_coverage_curve", 5, 8)
    assert "operators.ranks.total_order_ranks" in nodes
    assert "operators.text.vocab_coverage_curve" in nodes
    assert staleness.query_changed("token_gini_concentration", 5, 8)
    assert staleness.query_changed("vocab_zipf_fit", 4, 8)
    for q in ("vocab_coverage_curve", "token_gini_concentration", "vocab_zipf_fit"):
        assert q in _R9_WINDOW


def test_unchanged_queries_do_not_promote():
    """Function-level granularity: file- or round-level diffing would
    promote these (their MODULES changed in r4-r8), but the functions on
    their plan paths are byte-identical AST — their r3 green rows still
    certify the current code."""
    for q in ("region_revenue", "semdedup_lsh", "embedding_neardup",
              "doc_bigram_logprob", "skew_safe_flag_totals"):
        assert not staleness.query_changed(q, 3, 8), q


def test_rotation_metadata_does_not_promote():
    """The window reorder itself (QUERIES/_R*_WINDOW/ROWS_ONLY churn in
    registry.py) must never count as a plan change, or every rotation
    would promote the whole registry."""
    assert not staleness.query_changed("ann_pq", 5, 8)  # reads KNN_QUERY_IDS
    assert not staleness.query_changed("ann_lsh", 6, 8)
