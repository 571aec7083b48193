"""The r4 statistics batch pinned against independent references:
quantile bands and KS vs sorted-Python/NumPy definitions, Gini vs the
closed form on a known distribution, the bootstrap CI vs a pure-Python
replay of the identical md5 draw, the DSIR draw vs the A-ES definition
computed from the operator's own (r3-driver-green) weights.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_SMOKE}/orders.parquet")


def test_quantile_bands_match_sorted_reference(spark, orders):
    from pipeline_pyspark_etl_imdb_spark.operators.selection import (
        grouped_quantile_bands,
    )

    rows = orders.where(
        F.col("o_totalprice").isNotNull() & F.col("o_orderpriority").isNotNull()
    ).select("o_orderpriority", "o_totalprice").collect()
    by_g: dict[str, list[int]] = {}
    for r in rows:
        by_g.setdefault(r.o_orderpriority, []).append(
            int(round(r.o_totalprice * 100))
        )
    got = {
        r.o_orderpriority: r
        for r in grouped_quantile_bands(
            orders, "o_orderpriority", "o_totalprice"
        ).collect()
    }
    assert set(got) == set(by_g)
    for g, vals in by_g.items():
        vals.sort()
        n = len(vals)
        assert got[g].n_rows == n
        for col, num, den in (
            ("p10", 1, 10),
            ("p25", 1, 4),
            ("p50", 1, 2),
            ("p75", 3, 4),
            ("p90", 9, 10),
        ):
            k = -((-num * n) // den)  # ceil(q*n)
            assert got[g][col] == vals[k - 1] / 100, (g, col)


def test_ks_two_sample_matches_python(spark, orders):
    from pipeline_pyspark_etl_imdb_spark.operators.evalmetrics import (
        ks_two_sample_report,
    )

    rows = orders.where(F.col("o_totalprice").isNotNull()).select(
        "o_orderstatus", "o_totalprice"
    ).collect()
    a = sorted(
        int(round(r.o_totalprice * 100)) for r in rows if r.o_orderstatus == "O"
    )
    b = sorted(
        int(round(r.o_totalprice * 100)) for r in rows if r.o_orderstatus == "F"
    )
    values = sorted(set(a) | set(b))
    import bisect

    best, best_at = -1.0, None
    for v in values:
        d = abs(
            bisect.bisect_right(a, v) / len(a) - bisect.bisect_right(b, v) / len(b)
        )
        if d > best:
            best, best_at = d, v
    got = ks_two_sample_report(
        orders, "o_orderstatus", "o_totalprice", "O", "F"
    ).collect()[0]
    assert got.n_a == len(a) and got.n_b == len(b)
    assert got.ks_stat == pytest.approx(best, abs=0)
    assert got.at_value == best_at / 100


def test_gini_uniform_distribution_is_zero(spark):
    """Equal frequencies -> Gini exactly (V+1)/V * 0 ... = 0 by the
    rank formula: 2*sum(i*f)/(V*V*f) - (V+1)/V with f constant."""
    from pipeline_pyspark_etl_imdb_spark.operators.text import (
        gini_token_concentration,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(10)], "doc_id int, text string"
    )
    got = gini_token_concentration(docs).collect()[0]
    assert got.n_types == 4 and got.n_tokens == 40
    assert got.gini == pytest.approx(0.0, abs=1e-12)


def test_gini_matches_closed_form(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.text import (
        gini_token_concentration,
    )

    # frequencies: a x1, b x2, c x3, d x4 -> sorted asc [1,2,3,4]
    text = "a " + "b b " + "c c c " + "d d d d"
    docs = spark.createDataFrame([(0, text)], "doc_id int, text string")
    got = gini_token_concentration(docs).collect()[0]
    f = [1, 2, 3, 4]
    v, t = len(f), sum(f)
    expect = 2 * sum((i + 1) * x for i, x in enumerate(f)) / (v * t) - (v + 1) / v
    assert got.gini == pytest.approx(expect, rel=1e-12)


def _md5_uniform(
    key: str, n_chars: int = 8, offset: float = 0.0, start: int = 0
) -> float:
    h = hashlib.md5(key.encode()).hexdigest()
    val = 0
    for ch in h[start : start + n_chars]:
        val = val * 16 + int(ch, 16)
    return (val + offset) / float(16**n_chars)


def test_bootstrap_ci_matches_python_replay(spark, orders):
    """Replay the exact md5 Poisson draw in pure Python; the replicate
    means and the CI must match bit-for-bit (same division order)."""
    from pipeline_pyspark_etl_imdb_spark.operators.evalmetrics import (
        POISSON1_CDF,
        bootstrap_mean_ci,
    )

    B = 32
    rows = orders.where(F.col("o_totalprice").isNotNull()).select(
        "o_orderkey", "o_totalprice"
    ).collect()
    data = [(str(r.o_orderkey), int(round(r.o_totalprice * 100))) for r in rows]
    means = []
    for rep in range(B):
        s = nb = 0
        for rid, c in data:
            # block-hash scheme: replicate 4*blk + j reads digest chars
            # [8j, 8j+8) of md5(id:blk:salt)
            u = _md5_uniform(f"{rid}:{rep // 4}:boot", start=8 * (rep % 4))
            cnt = 6
            for lvl, cdf in enumerate(POISSON1_CDF):
                if u < cdf:
                    cnt = lvl
                    break
            s += cnt * c
            nb += cnt
        if nb:
            means.append(float(s) / nb / 100.0)
    means.sort()
    k_lo = max(1, math.ceil(0.025 * B))
    k_hi = min(B, math.ceil(0.975 * B))
    got = bootstrap_mean_ci(
        orders, "o_totalprice", "o_orderkey", n_replicates=B
    ).collect()[0]
    n = len(data)
    assert got.n_rows == n and got.n_replicates == B
    assert got.mean == float(sum(c for _, c in data)) / n / 100.0
    assert got.ci_lo == means[k_lo - 1]
    assert got.ci_hi == means[k_hi - 1]
    assert got.ci_lo < got.mean < got.ci_hi


def test_dsir_sample_is_aes_on_own_weights(spark):
    """The draw must equal the Efraimidis-Spirakis order computed in
    Python from the operator's own logweights (which carry their own
    driver-green contract)."""
    from pipeline_pyspark_etl_imdb_spark.operators.importance import (
        dsir_importance_sample,
        dsir_logweights,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    lw = {
        r.doc_id: r.dsir_logweight
        for r in dsir_logweights(docs, F.col("lang") == "en").collect()
    }
    keyed = sorted(
        (
            math.log(-math.log(_md5_uniform(f"{did}:dsir", offset=0.5))) - w,
            did,
        )
        for did, w in lw.items()
    )
    expect = sorted(did for _, did in keyed[:50])
    got = sorted(
        r.doc_id
        for r in dsir_importance_sample(docs, F.col("lang") == "en", k=50).collect()
    )
    assert got == expect


def test_prefix_sums_match_window(spark, orders):
    """total_order_prefix_sums == the single-partition window on a frame
    small enough to check that way."""
    from pipeline_pyspark_etl_imdb_spark.operators.ranks import (
        total_order_prefix_sums,
    )

    per_value = (
        orders.where(F.col("o_totalprice").isNotNull())
        .select(F.round(F.col("o_totalprice")).cast("bigint").alias("c"))
        .groupBy("c")
        .agg(F.count("*").alias("n"))
    )
    got = {
        r.c: r.cum_n
        for r in total_order_prefix_sums(per_value, ["c"], ["n"]).collect()
    }
    rows = sorted((r.c, r.n) for r in per_value.collect())
    cum = 0
    for c, n in rows:
        cum += n
        assert got[c] == cum


def test_hill_tail_index_matches_numpy(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.text import hill_tail_index

    import numpy as np

    vals = [int(1000 / (i + 1) ** 0.5) for i in range(400)]  # alpha ~ 2
    df = spark.createDataFrame([(v,) for v in vals], "n int")
    got = hill_tail_index(df, "n", k=50).collect()[0]
    xs = np.sort(np.array([float(v) for v in vals]))[::-1]
    hill = float(np.mean(np.log(xs[:50]) - np.log(xs[50])))
    assert got.k_eff == 50
    assert got.x_tail == xs[50]
    assert got.hill == pytest.approx(hill, rel=1e-12)
    assert got.tail_alpha == pytest.approx(1.0 / hill, rel=1e-12)


def test_hill_small_input_adapts_k(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.text import hill_tail_index

    df = spark.createDataFrame([(10,), (20,), (30,)], "n int")
    got = hill_tail_index(df, "n", k=100).collect()[0]
    assert got.k_eff == 2  # n-1
    assert got.x_tail == 10.0


def test_readability_pinned_example(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.text import readability_scores

    docs = spark.createDataFrame(
        [(1, "The cat sat. The dog ran! Did it?")], "doc_id int, text string"
    )
    got = readability_scores(docs).collect()[0]
    assert got.n_words == 8
    assert got.n_sentences == 3
    # vowel groups: e,a,a,e,o,a,i,i -> 8
    assert got.n_syllables == 8
    wps, spw = 8 / 3, 8 / 8
    assert got.flesch_ease == pytest.approx(206.835 - 1.015 * wps - 84.6 * spw)
    assert got.fk_grade == pytest.approx(0.39 * wps + 11.8 * spw - 15.59)


def test_daily_acf_matches_numpy(spark, tmp_path):
    import numpy as np
    from pipeline_pyspark_etl_imdb_spark.plans.analytics import daily_revenue_acf

    # deterministic series with a strong period-7 cycle
    days = 60
    rows = []
    for i in range(days):
        total = 1000.0 + 200.0 * (i % 7) + 3.0 * i
        rows.append((f"2020-01-{1:02d}", i, total))
    import datetime as dt

    base = dt.date(2020, 1, 1)
    data = [
        (dt.datetime.combine(base + dt.timedelta(days=i), dt.time()), t)
        for _, i, t in rows
    ]
    df = spark.createDataFrame(data, "o_orderdate timestamp, o_totalprice double")
    p = str(tmp_path / "orders.parquet")
    df.write.parquet(p)
    got = {r.lag: r for r in daily_revenue_acf(spark, str(tmp_path), 14).collect()}

    y = np.array([t for _, t in data])
    ybar = y.mean()
    ss = ((y - ybar) ** 2).sum()
    for k in (1, 7, 14):
        num = ((y[k:] - ybar) * (y[:-k] - ybar)).sum()
        assert got[k].acf == pytest.approx(num / ss, rel=1e-9)
        assert got[k].n_pairs == days - k
        assert got[k].n_days == days
    assert got[7].acf > got[1].acf  # the cycle dominates


def test_theilsen_resists_outlier(spark, tmp_path):
    import datetime as dt
    from pipeline_pyspark_etl_imdb_spark.plans.analytics import (
        theilsen_revenue_trend,
    )

    base = dt.date(2021, 1, 1)
    data = []
    for i in range(30):
        total = 100.0 + 5.0 * i
        if i == 17:
            total = 100000.0  # one corrupt day
        data.append(
            (dt.datetime.combine(base + dt.timedelta(days=i), dt.time()), total)
        )
    df = spark.createDataFrame(data, "o_orderdate timestamp, o_totalprice double")
    df.write.parquet(str(tmp_path / "orders.parquet"))
    got = theilsen_revenue_trend(spark, str(tmp_path)).collect()[0]
    assert got.n_days == 30
    assert got.n_pairs == 30 * 29 // 2
    # OLS slope would be blown far from 5 by the outlier; Theil-Sen holds
    assert got.slope_per_day == pytest.approx(5.0, abs=0.2)
    assert got.intercept == pytest.approx(100.0, abs=5.0)


def test_reconciliation_audit_hand_built(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        reconciliation_audit,
    )

    orders = spark.createDataFrame(
        [
            (1, 110.0),   # exact: 100 * (1-0) * (1+0.10) = 110.00
            (2, 50.01),   # off by one cent: charge 50.00
            (3, 75.00),   # off by 25.00: charge 50.00
            (4, 10.00),   # no lineitems
        ],
        "o_orderkey long, o_totalprice double",
    )
    lineitem = spark.createDataFrame(
        [
            (1, 100.0, 0.0, 0.10),
            (2, 50.0, 0.0, 0.0),
            (3, 100.0, 0.5, 0.0),
        ],
        "l_orderkey long, l_extendedprice double, l_discount double, l_tax double",
    )
    got = reconciliation_audit(orders, lineitem).collect()[0]
    assert got.n_orders == 4
    assert got.n_with_lines == 3
    assert got.n_exact == 1
    assert got.n_within_tol == 1
    assert got.n_beyond_tol == 1
    assert got.max_abs_diff == pytest.approx(25.0)
    assert got.total_abs_diff == pytest.approx(25.01)


def test_benford_digit_audit_hand_built(spark):
    import math
    from pipeline_pyspark_etl_imdb_spark.operators.warehouse import (
        benford_digit_audit,
    )

    # 10 ones, 5 twos, 1 nine; zero/negative excluded; digit 3..8 absent
    amounts = [1.23] * 10 + [25.0] * 5 + [900.5] + [0.0, -4.0]
    df = spark.createDataFrame([(a,) for a in amounts], "amt double")
    rows = {r.digit: r for r in benford_digit_audit(df, "amt").collect()}
    assert sorted(rows) == list(range(1, 10))
    assert rows[1].n == 10 and rows[2].n == 5 and rows[9].n == 1
    assert rows[3].n == 0
    total = 16.0
    for d in range(1, 10):
        e = math.log10(1 + 1 / d)
        assert rows[d].exp_share == pytest.approx(e, rel=1e-12)
        assert rows[d].obs_share == pytest.approx(rows[d].n / total, rel=1e-12)
        assert rows[d].chisq_term == pytest.approx(
            (rows[d].n - total * e) ** 2 / (total * e), rel=1e-9
        )
