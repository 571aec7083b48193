"""Association-rule gates: a hand-built basket set with known
support/confidence/lift, the basket-size cap lever, and the plan shape
(TakeOrdered, partial agg, broadcast item counts)."""

import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators.basket import association_rules


@pytest.fixture()
def baskets(spark):
    # 4 baskets: {1,2} x3, {1,3} x1 -> pair (1,2): n_ab=3, n_1=4, n_2=3
    rows = []
    for o, items in enumerate([(1, 2), (1, 2), (1, 2), (1, 3)]):
        rows += [(o, i) for i in items]
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def test_hand_built_scores(spark, baskets):
    got = {
        (r.item_a, r.item_b): r
        for r in association_rules(baskets, min_support=1, top_n=10).collect()
    }
    r12 = got[(1, 2)]
    assert (r12.n_ab, r12.n_a, r12.n_b) == (3, 4, 3)
    assert r12.support == pytest.approx(3 / 4)
    assert r12.confidence == pytest.approx(3 / 4)
    assert r12.lift == pytest.approx(4.0 * 3 / (4 * 3))
    r13 = got[(1, 3)]
    assert r13.lift == pytest.approx(4.0 * 1 / (4 * 1))


def test_min_support_prunes(spark, baskets):
    got = association_rules(baskets, min_support=2, top_n=10).collect()
    assert [(r.item_a, r.item_b) for r in got] == [(1, 2)]


def test_basket_cap_drops_megacart(spark):
    rows = [(0, 1), (0, 2)] + [(1, i) for i in range(50)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    capped = association_rules(df, min_support=1, top_n=2000, max_basket=10)
    assert capped.count() == 1  # only basket 0 survives the cap


def test_plan_take_ordered_and_broadcast(spark, baskets):
    plan = (
        association_rules(baskets, min_support=1, top_n=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
