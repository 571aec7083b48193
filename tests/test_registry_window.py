"""The active driver window IS the staleness emission (VERDICT r7 #2).

The driver hash-checks the first 50 registry entries per round;
staleness.py computes the rotation that keeps every query's driver
signal fresh. These pins make the window change auditable: the applied
_R8_WINDOW must equal what the tool proposed from the records that
existed when the window was chosen (through r7), and the registry's
first 50 keys must be that window.
"""

import staleness
from pipeline_pyspark_etl_imdb_spark.plans.registry import (
    QUERIES,
    ROWS_ONLY,
    _R8_WINDOW,
)

WINDOW_ROUND = 8  # bump alongside the _R<N>_WINDOW rotation


def test_active_window_is_the_staleness_emission():
    proposal = staleness.propose_window(through_round=WINDOW_ROUND - 1)
    assert list(_R8_WINDOW) == proposal


def test_registry_head_is_the_window():
    assert list(QUERIES)[:50] == list(_R8_WINDOW)


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
    debt = [n for n in never if n not in set(_R8_WINDOW)]
    assert not debt, f"oracle-backed queries with no driver signal: {debt}"
