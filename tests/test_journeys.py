"""Journey-analytics edge semantics: funnel step ordering is STRICTLY
after the previous reach, cohorts anchor on first activity, and gap
stats stay NULL-correct for single-event users."""

import pandas as pd

from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.journeys import (
    cohort_retention,
    funnel,
    inter_arrival,
)

US = 1_000_000
SCHEMA = "event_id bigint, ts bigint, user_id bigint, event_type string"


def _events(spark, rows):
    # ts in nanoseconds (the bigint-nanos storage path ts_micros handles)
    return spark.createDataFrame(
        [(i, int(t * US * 1000), u, s) for i, (t, u, s) in enumerate(rows)], SCHEMA
    )


def test_funnel_requires_order(spark):
    rows = [
        # user 1 completes in order: view@1 click@2 purchase@3
        (1, 1, "view"), (2, 1, "click"), (3, 1, "purchase"),
        # user 2's click precedes its only view: stops at depth 1
        (1, 2, "click"), (2, 2, "view"), (3, 2, "signup"),
        # user 3 never views: depth 0 (no row contribution)
        (1, 3, "click"), (2, 3, "purchase"),
    ]
    got = {
        r.step_idx: (r.step, r.n_users)
        for r in funnel(_events(spark, rows), ("view", "click", "purchase")).collect()
    }
    assert got == {1: ("view", 2), 2: ("click", 1), 3: ("purchase", 1)}


def test_funnel_simultaneous_event_not_counted(spark):
    # click at EXACTLY the first view's timestamp is not strictly after it
    rows = [(5, 1, "view"), (5, 1, "click"), (7, 1, "click")]
    got = {r.step_idx: r.n_users for r in funnel(_events(spark, rows), ("view", "click")).collect()}
    assert got == {1: 1, 2: 1}  # reached via the t=7 click, not the t=5 one

    rows_no_later = [(5, 2, "view"), (5, 2, "click")]
    got2 = {
        r.step_idx: r.n_users
        for r in funnel(_events(spark, rows_no_later), ("view", "click")).collect()
    }
    assert got2 == {1: 1}


def test_cohort_retention_offsets(spark):
    week = 604_800
    rows = [
        # user 1: weeks 0, 1, 3 -> cohort 0, offsets 0/1/3
        (10, 1, "view"), (week + 10, 1, "view"), (3 * week + 10, 1, "view"),
        # user 2: week 1 only -> cohort 1, offset 0
        (week + 20, 2, "view"),
    ]
    got = {
        (r.cohort_bucket, r.bucket_offset): (r.n_users, r.retention)
        for r in cohort_retention(_events(spark, rows)).collect()
    }
    assert got == {
        (0, 0): (1, 1.0), (0, 1): (1, 1.0), (0, 3): (1, 1.0), (1, 0): (1, 1.0),
    }


def test_inter_arrival_single_event_user_null_gaps(spark):
    rows = [(1, 1, "view"), (4, 1, "view"), (9, 1, "view"), (2, 2, "view")]
    got = {r.user_id: r for r in inter_arrival(_events(spark, rows)).collect()}
    assert (got[1].n_events, got[1].n_gaps) == (3, 2)
    assert got[1].avg_gap_s == 4.0  # gaps 3s + 5s over 2
    assert got[1].max_gap_s == 5.0
    assert (got[2].n_events, got[2].n_gaps) == (1, 0)
    assert got[2].avg_gap_s is None and got[2].max_gap_s is None


def test_funnel_single_shuffle(spark):
    """Plan gate: the funnel is one aggregation over user_id plus the tiny
    step-count agg — NOT a per-step join cascade (no joins at all)."""
    rows = [(1, 1, "view"), (2, 1, "click")]
    plan = (
        funnel(_events(spark, rows), ("view", "click", "purchase"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for join in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"):
        assert join not in plan


def test_funnel_matches_cascade_reference_property(spark):
    """Property check against an independent formulation: the cascading
    strictly-after minimum (t_k = min time of step k events with
    t > t_{k-1}), computed in plain Python over many randomized streams
    with timestamp collisions — must equal the fold's step counts."""
    import random

    rng = random.Random(7)
    steps = ("view", "click", "purchase")
    types = steps + ("noise",)
    for trial in range(25):
        rows = [
            (rng.randrange(1, 6), rng.choice(types), rng.randrange(0, 8))
            for _ in range(rng.randrange(1, 30))
        ]
        # independent reference: per user, cascade of strictly-after minima
        want = {i: 0 for i in range(1, len(steps) + 1)}
        for u in {r[0] for r in rows}:
            t_prev = -1
            for k, s in enumerate(steps, start=1):
                cand = [t for (uu, ty, t) in rows if uu == u and ty == s and t > t_prev]
                if not cand:
                    break
                t_prev = min(cand)
                want[k] += 1
        want = {k: v for k, v in want.items() if v > 0}

        got = {
            r.step_idx: r.n_users
            for r in funnel(
                _events(spark, [(t, u, ty) for (u, ty, t) in rows]), steps
            ).collect()
        }
        assert got == want, f"trial {trial}: rows={rows}"
