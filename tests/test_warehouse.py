"""Warehouse-lifecycle operators: MERGE/SCD2/profile/orphan/heavy-hitter
edge cases the oracle suite's fixture data doesn't pin — NULL-valued
updates winning a merge, order ties in a change log, all-null columns."""

from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
    column_profile,
    heavy_hitters,
    merge_upsert,
    orphan_check,
    scd2,
)


def test_merge_upsert_update_insert_carry(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, name string, bal double"
    )
    changes = spark.createDataFrame(
        [(2, "b2", 25.0), (9, "new", 0.0)], "k int, name string, bal double"
    )
    got = {r.k: (r.name, r.bal) for r in merge_upsert(base, changes, ["k"]).collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 25.0), 3: ("c", 30.0), 9: ("new", 0.0)}


def test_merge_upsert_null_update_wins(spark):
    """MERGE semantics: the change row replaces the base row wholesale —
    a NULL in the change row must land, not fall back to the base value
    (the trap of per-column coalesce)."""
    base = spark.createDataFrame([(1, "keep")], "k int, name string")
    changes = spark.createDataFrame([(1, None)], "k int, name string")
    [row] = merge_upsert(base, changes, ["k"]).collect()
    assert (row.k, row.name) == (1, None)


def test_merge_upsert_schema_mismatch_rejected(spark):
    base = spark.createDataFrame([(1, "a")], "k int, name string")
    changes = spark.createDataFrame([(1,)], "k int")
    try:
        merge_upsert(base, changes, ["k"])
        raise AssertionError("expected ValueError")
    except ValueError as exc:
        assert "schema mismatch" in str(exc)


def test_scd2_versions_and_ties(spark):
    log = spark.createDataFrame(
        [
            # key 1: A, A (no change), B, B — two versions
            (1, "A", 10, 100),
            (1, "A", 20, 101),
            (1, "B", 30, 102),
            (1, "B", 40, 103),
            # key 2: tie on order_col resolved by tiebreak: A(seq 0) then B(seq 1)
            (2, "A", 10, 200),
            (2, "B", 10, 201),
        ],
        "k int, attr string, t int, seq int",
    )
    rows = {
        (r.k, r.attr): (r.valid_from, r.valid_to, r.is_current)
        for r in scd2(log, "k", ["attr"], "t", "seq").collect()
    }
    assert rows == {
        (1, "A"): (10, 30, False),
        (1, "B"): (30, None, True),
        (2, "A"): (10, 10, False),
        (2, "B"): (10, None, True),
    }


def test_scd2_reverted_attr_reopens_version(spark):
    """A->B->A produces THREE versions (type-2 keeps history), not a
    merged A spanning the B interval."""
    log = spark.createDataFrame(
        [(1, "A", 1, 0), (1, "B", 2, 1), (1, "A", 3, 2)], "k int, attr string, t int, seq int"
    )
    got = sorted(
        (r.attr, r.valid_from, r.valid_to) for r in scd2(log, "k", ["attr"], "t", "seq").collect()
    )
    assert got == [("A", 1, 2), ("A", 3, None), ("B", 2, 3)]


def test_column_profile_nulls_and_distinct(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y"), (None, "y")], "a int, b string"
    )
    prof = {r.col_name: r for r in column_profile(df, ["a", "b"]).collect()}
    assert prof["a"].n_rows == 4
    assert prof["a"].n_null == 1
    assert prof["a"].n_distinct == 2  # count_distinct ignores NULL
    assert (prof["a"].min_value, prof["a"].max_value) == ("1", "2")
    assert prof["b"].n_null == 1
    assert (prof["b"].min_value, prof["b"].max_value) == ("x", "y")


def test_orphan_check_counts_and_null_fks(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id int, fk int"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk int")
    [row] = orphan_check([("c->p", child, "fk", parent, "pk")]).collect()
    # NULL FK is neither child-counted nor an orphan (3VL: unknown, not broken)
    assert (row.relationship, row.n_child, row.n_orphans) == ("c->p", 3, 1)


def test_heavy_hitters_threshold(spark):
    df = spark.createDataFrame(
        [("hot",)] * 60 + [("warm",)] * 30 + [("cold",)] * 10, "k string"
    )
    got = {r.k: (r.n, r.share) for r in heavy_hitters(df, ["k"], 0.25).collect()}
    assert got == {"hot": (60, 0.6), "warm": (30, 0.3)}


def test_merge_upsert_single_shuffle_join(spark):
    """Plan gate: the merge is ONE join (full outer on the key), not a
    union of three filtered joins."""
    base = spark.range(100).withColumn("v", F.col("id") * 2)
    changes = spark.range(50, 150).withColumn("v", F.col("id") * 3)
    plan = (
        merge_upsert(base, changes, ["id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") + plan.count(
        "BroadcastHashJoin"
    ) == 1


def test_merge_partial_aggregates_equals_full_recompute(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        merge_partial_aggregates,
    )

    rows = [(i % 3, float(i), i) for i in range(100)]
    df = spark.createDataFrame(rows, "k int, v double, id int")

    def part(d):
        return d.groupBy("k").agg(
            F.count("*").alias("n"),
            F.sum(F.col("v").cast("decimal(18,4)")).alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )

    merged = merge_partial_aggregates(
        [part(df.where("id % 2 = 0")), part(df.where("id % 2 = 1"))],
        ["k"],
        {
            "n": F.sum("n"),
            "s": F.sum("s"),
            "mn": F.min("mn"),
            "mx": F.max("mx"),
        },
    )
    full = part(df)
    got = {r.k: (r.n, float(r.s), r.mn, r.mx) for r in merged.collect()}
    want = {r.k: (r.n, float(r.s), r.mn, r.mx) for r in full.collect()}
    assert got == want


def test_sketch_rollup_merge_is_lossless_and_bounded(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        sketch_distinct_rollup,
    )

    # 2 keys x 10 sub-buckets, items overlapping across buckets
    rows = [(k, i % 10, (i * 7) % 500) for k in ("a", "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "k string, sub int, item int")
    rolled = {
        r.k: (r.approx_distinct, r.n_rows, r.n_buckets)
        for r in sketch_distinct_rollup(df, ["k"], "sub", "item").collect()
    }
    exact = {
        r.k: r.d
        for r in df.groupBy("k").agg(F.count_distinct("item").alias("d")).collect()
    }
    for k in ("a", "b"):
        approx, n_rows, n_buckets = rolled[k]
        assert n_rows == 2000 and n_buckets == 10
        # unioned per-bucket sketches stay in the sketch's accuracy class
        # (HLL union is not bit-identical to direct sketching — the union
        # finalizes through a different register path — but the error
        # bound is the same)
        assert abs(approx - exact[k]) / exact[k] < 0.05


def test_snapshot_diff_property_vs_python_reference(spark):
    from hypothesis import given, settings, strategies as st

    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import snapshot_diff

    row = st.tuples(
        st.integers(0, 9),  # key
        st.one_of(st.none(), st.sampled_from(["a", "b", ""])),  # v1 (incl NULL/empty)
        st.integers(0, 3),  # v2
    )

    def py_diff(old_rows, new_rows):
        old = {k: (v1, v2) for k, v1, v2 in old_rows}
        new = {k: (v1, v2) for k, v1, v2 in new_rows}
        out = {}
        for k in set(old) | set(new):
            if k not in old:
                out[k] = "ADDED"
            elif k not in new:
                out[k] = "REMOVED"
            elif old[k] != new[k]:
                out[k] = "CHANGED"
            else:
                out[k] = "UNCHANGED"
        return out

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(row, max_size=10, unique_by=lambda r: r[0]),
        st.lists(row, max_size=10, unique_by=lambda r: r[0]),
    )
    def check(old_rows, new_rows):
        schema = "k long, v1 string, v2 long"
        old_df = spark.createDataFrame(old_rows, schema)
        new_df = spark.createDataFrame(new_rows, schema)
        got = {
            r.k: r.status for r in snapshot_diff(old_df, new_df, keys=["k"]).collect()
        }
        assert got == py_diff(old_rows, new_rows)

    check()


def test_revenue_concentration_hand_built(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        revenue_concentration,
    )

    # 10 customers: one whale with 910, nine with 10 each -> total 1000
    rows = [(i, i, float(910 if i == 0 else 10)) for i in range(10)]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double"
    )
    got = {
        r.top_pct: (r.n_top, r.revenue_top, r.share)
        for r in revenue_concentration(df, thresholds=(0.1, 0.5)).collect()
    }
    assert got[0.1] == (1, 910.0, 0.91)  # top 10% = the whale
    assert got[0.5] == (5, 950.0, 0.95)  # whale + 4 minnows


def test_revenue_concentration_share_monotone_on_fixture(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        revenue_concentration,
    )
    from tests.conftest import SF_SMOKE

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    rows = revenue_concentration(orders).collect()
    shares = [r.share for r in sorted(rows, key=lambda r: r.top_pct)]
    assert shares == sorted(shares)
    assert all(0 < s <= 1 for s in shares)
    # concentration sanity: top 1% must out-earn a uniform 1%
    assert rows[0].share > 0.01


def test_join_size_estimate_exact_side_and_determinism(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        join_size_estimate,
    )

    left = spark.createDataFrame(
        [(k,) for k in range(100) for _ in range(3)], "a long"
    )
    right = spark.createDataFrame(
        [(k,) for k in range(50, 150) for _ in range(2)], "b long"
    )
    r1 = join_size_estimate(left, right, "a", "b").collect()[0]
    r2 = join_size_estimate(left, right, "a", "b").collect()[0]
    # exact side: 50 shared keys x 3 x 2
    assert r1.exact_rows == 50 * 6
    assert (r1.est_rows, r1.rel_err) == (r2.est_rows, r2.rel_err)
    assert r1.est_rows % (16 * 6) == 0  # sampled keys each carry 3*2, x16


def test_join_size_estimate_fixture_reasonable(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        join_size_estimate,
    )
    from tests.conftest import SF_SMOKE

    got = join_size_estimate(
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet"),
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet"),
        "o_orderkey",
        "l_orderkey",
    ).collect()[0]
    assert got.exact_rows > 0
    assert got.rel_err < 0.5  # 1/16 key sample on ~1.5k keys


def test_expectation_report_nulls_are_violations(spark):
    from pyspark.sql import functions as F

    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import expectation_report

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0), (None, 4.0)],
        "k int, v double",
    )
    out = {
        r.rule: r
        for r in expectation_report(
            df,
            [
                ("v_positive", F.col("v") > 0),  # NULL v must count as violation
                ("k_not_null", F.col("k").isNotNull()),
            ],
            min_pass_rate=0.5,
        ).collect()
    }
    assert out["v_positive"].n_violations == 2  # NULL and -5.0
    assert out["k_not_null"].n_violations == 1
    assert out["v_positive"].passed and out["k_not_null"].passed
    strict = expectation_report(
        df, [("k_not_null", F.col("k").isNotNull())], min_pass_rate=1.0
    ).collect()[0]
    assert not strict.passed


def test_expectation_report_single_pass(spark):
    from pyspark.sql import functions as F

    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import expectation_report

    from tests.conftest import SF_ORACLE

    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    plan = (
        expectation_report(
            orders,
            [
                ("a", F.col("o_totalprice") > 0),
                ("b", F.col("o_custkey") > 0),
                ("c", F.col("o_orderdate").isNotNull()),
            ],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # R rules = ONE scan + one partial/final aggregate pair, never R jobs
    assert plan.count("FileScan") == 1
    assert plan.count("HashAggregate") <= 2


def test_incremental_join_delta_bilinearity(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        incremental_join_delta,
    )

    from tests.conftest import SF_ORACLE

    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").select(
        "o_orderkey", F.col("o_custkey").alias("custkey")
    )
    cust = spark.read.parquet(f"{SF_ORACLE}/customer.parquet").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    a, da = orders.where("o_orderkey % 7 != 0"), orders.where("o_orderkey % 7 = 0")
    b, db = cust.where("custkey % 11 != 0"), cust.where("custkey % 11 = 0")

    delta = incremental_join_delta(a, da, b, db, "custkey")
    old = a.join(b, "custkey")
    new = orders.join(cust, "custkey")
    key = lambda r: (r.o_orderkey, r.custkey)
    got = {key(r) for r in old.collect()} | {key(r) for r in delta.collect()}
    want = {key(r) for r in new.collect()}
    assert got == want
    # ΔJ is disjoint from the old view (insert-only semantics)
    assert not ({key(r) for r in delta.collect()} & {key(r) for r in old.collect()})


def test_incremental_join_delta_never_shuffles_bases(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        incremental_join_delta,
    )

    from tests.conftest import SF_ORACLE

    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").select(
        "o_orderkey", F.col("o_custkey").alias("custkey")
    )
    cust = spark.read.parquet(f"{SF_ORACLE}/customer.parquet").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    plan = (
        incremental_join_delta(
            orders.where("o_orderkey % 7 != 0"),
            orders.where("o_orderkey % 7 = 0"),
            cust.where("custkey % 11 != 0"),
            cust.where("custkey % 11 = 0"),
            "custkey",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every join broadcasts a delta: no sort-merge join, no shuffle
    # Exchange of a base table anywhere in the refresh
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 3
    assert "Exchange hashpartitioning" not in plan


def test_signed_join_delta_random_mixed_batches(spark):
    import random

    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        apply_signed,
        signed_join_delta,
    )

    rng = random.Random(11)
    a_rows = [(k, f"a{i}") for i, k in enumerate(rng.choices(range(8), k=30))]
    b_rows = [(k, f"b{i}") for i, k in enumerate(rng.choices(range(8), k=20))]
    # mixed batch: retract ~1/3 of existing rows, insert fresh ones
    a_retract = [r for r in a_rows if rng.random() < 0.33]
    a_insert = [(rng.randrange(8), f"a_new{i}") for i in range(10)]
    b_retract = [r for r in b_rows if rng.random() < 0.33]
    b_insert = [(rng.randrange(8), f"b_new{i}") for i in range(6)]

    A = spark.createDataFrame(a_rows, "k int, av string")
    B = spark.createDataFrame(b_rows, "k int, bv string")
    dA = spark.createDataFrame(
        [(*r, -1) for r in a_retract] + [(*r, 1) for r in a_insert],
        "k int, av string, sign int",
    )
    dB = spark.createDataFrame(
        [(*r, -1) for r in b_retract] + [(*r, 1) for r in b_insert],
        "k int, bv string, sign int",
    )
    view_old = A.join(B, "k")
    refreshed = apply_signed(view_old, signed_join_delta(A, dA, B, dB, "k"))

    a_new = [r for r in a_rows if r not in a_retract] + a_insert
    b_new = [r for r in b_rows if r not in b_retract] + b_insert
    want = {
        (k, av, bv) for k, av in a_new for k2, bv in b_new if k == k2
    }
    got = {(r.k, r.av, r.bv) for r in refreshed.collect()}
    assert got == want


def test_signed_agg_refresh_deletes_can_empty_a_group(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import signed_agg_refresh

    view = spark.createDataFrame(
        [("d1", 2, 30.0), ("d2", 1, 5.0)], "day string, n long, total double"
    )
    # retract both d1 rows -> the whole group disappears; d2 gains a row
    delta = spark.createDataFrame(
        [("d1", 10.0, -1), ("d1", 20.0, -1), ("d2", 7.0, 1)],
        "day string, v double, sign int",
    )
    out = {r.day: r for r in signed_agg_refresh(view, delta, ["day"], "v").collect()}
    assert set(out) == {"d2"}
    assert out["d2"].n == 2 and out["d2"].total == 12.0


def test_pit_join_same_date_empty_run_loses_tie(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        pit_dimension_join,
        scd2,
    )

    # customer 1 changes priority twice on day 2 (keys 20 < 21): the
    # run [d2, d2) is EMPTY and must never decorate a fact; facts on d2
    # and later get 'C', facts on d1 get 'A'
    log = spark.createDataFrame(
        [(1, "A", "2024-01-01", 10), (1, "B", "2024-01-02", 20),
         (1, "C", "2024-01-02", 21), (1, "C", "2024-01-03", 30)],
        "k int, prio string, d string, seq int",
    ).select("k", "prio", F.to_date("d").alias("d"), "seq")
    vers = scd2(log, key="k", attrs=["prio"], order_col="d", tiebreak_col="seq")
    facts = spark.createDataFrame(
        [(1, "2024-01-01"), (1, "2024-01-02"), (1, "2024-01-04")],
        "k int, d string",
    ).select("k", F.to_date("d").alias("d"))
    out = {
        str(r.d): r.prio
        for r in pit_dimension_join(facts, vers, "k", "d", ["prio"]).collect()
    }
    assert out == {"2024-01-01": "A", "2024-01-02": "C", "2024-01-04": "C"}


def test_expectation_report_quoted_rule_name_and_empty_rules(spark):
    import pytest

    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import expectation_report

    df = spark.createDataFrame([(1.0,), (None,)], "v double")
    out = expectation_report(
        df, [("price isn't null", F.col("v").isNotNull())], min_pass_rate=0.4
    ).collect()
    assert out[0].rule == "price isn't null"
    assert out[0].n_violations == 1
    with pytest.raises(ValueError):
        expectation_report(df, [])


def test_quantile_sketch_null_keys_dropped_and_no_cross_column_collision(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        hash_sample_quantile_sketch,
    )

    df = spark.createDataFrame(
        [("g", "x", None, 1.0), ("g", None, "x", 2.0), ("g", "a", "b", 3.0),
         ("g", "c", "d", 4.0)],
        "g string, k1 string, k2 string, v double",
    )
    out = hash_sample_quantile_sketch(
        df, ["g"], "v", ["k1", "k2"], k=10, quantiles=(0.5,)
    ).collect()[0]
    # both NULL-key rows dropped; remaining 2 rows sampled whole
    assert out.n_sample == 2
    assert out.p50_est == 3.5
