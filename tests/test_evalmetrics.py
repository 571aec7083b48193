"""Rank-sum AUC pinned on hand-built separations; threshold metrics
pinned against a hand confusion matrix; OLS trend pinned against NumPy
polyfit."""

import numpy as np
import pytest

from pipeline_pyspark_etl_imdb_spark.operators.evalmetrics import (
    rank_sum_auc,
    threshold_metrics,
)
from tests.conftest import SF_ORACLE


def test_auc_perfect_separation(spark):
    rows = [(i, float(i), i >= 5) for i in range(10)]
    df = spark.createDataFrame(rows, "id bigint, s double, y boolean")
    got = rank_sum_auc(df, "s", "y", "id").collect()[0]
    assert (got.n_pos, got.n_neg) == (5, 5)
    assert got.auc == pytest.approx(1.0)


def test_auc_inverted_is_zero(spark):
    rows = [(i, float(-i), i >= 5) for i in range(10)]
    df = spark.createDataFrame(rows, "id bigint, s double, y boolean")
    assert rank_sum_auc(df, "s", "y", "id").collect()[0].auc == pytest.approx(0.0)


def test_auc_matches_sklearn_style_reference(spark):
    rng = [(i, ((i * 37) % 101) / 101.0, (i * 53) % 7 < 3) for i in range(200)]
    df = spark.createDataFrame(rng, "id bigint, s double, y boolean")
    got = rank_sum_auc(df, "s", "y", "id").collect()[0]
    # reference: fraction of (pos, neg) pairs ranked correctly under the
    # same (score, id) tie-break order
    order = sorted(rng, key=lambda r: (r[1], r[0]))
    ranks = {r[0]: i + 1 for i, r in enumerate(order)}
    pos = [r for r in rng if r[2]]
    neg = [r for r in rng if not r[2]]
    rank_sum = sum(ranks[r[0]] for r in pos)
    want = (rank_sum - len(pos) * (len(pos) + 1) / 2) / (len(pos) * len(neg))
    assert got.auc == pytest.approx(want, rel=1e-12)


def test_threshold_metrics_hand_built(spark):
    # scores .1 .4 .6 .9 with labels F F T T at t=0.5: tp=2 fp=0 fn=0 tn=2
    df = spark.createDataFrame(
        [(0.1, False), (0.4, False), (0.6, True), (0.9, True)],
        "s double, y boolean",
    )
    got = {r.threshold: r for r in threshold_metrics(df, "s", "y", [0.5, 0.95]).collect()}
    m = got[0.5]
    assert (m.tp, m.fp, m.fn, m.tn) == (2, 0, 0, 2)
    assert m.precision == 1.0 and m.recall == 1.0 and m.f1 == 1.0
    m2 = got[0.95]
    assert (m2.tp, m2.fp, m2.fn, m2.tn) == (0, 0, 2, 2)
    assert m2.precision == 0.0 and m2.recall == 0.0 and m2.f1 == 0.0


def test_segment_price_trend_matches_numpy(spark):
    from pipeline_pyspark_etl_imdb_spark.plans.analytics import (
        _table,
        segment_price_trend,
    )

    got = {r.c_mktsegment: r for r in segment_price_trend(spark, SF_ORACLE).collect()}
    orders = _table(spark, SF_ORACLE, "orders")
    cust = _table(spark, SF_ORACLE, "customer")
    pdf = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .selectExpr(
            "c_mktsegment", "year(o_orderdate) AS x", "CAST(o_totalprice AS DOUBLE) AS y"
        )
        .toPandas()
    )
    for seg, grp in pdf.groupby("c_mktsegment"):
        slope, intercept = np.polyfit(grp.x, grp.y, 1)
        assert got[seg].slope == pytest.approx(slope, rel=1e-6), seg
        assert got[seg].intercept == pytest.approx(intercept, rel=1e-6), seg
        r = np.corrcoef(grp.x, grp.y)[0, 1]
        assert got[seg].r2 == pytest.approx(r * r, rel=1e-6), seg


def test_calibration_perfectly_calibrated_scores(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.evalmetrics import (
        calibration_bins,
    )

    # score == empirical positive rate within each bin by construction:
    # 100 rows at score .25 with 25% positives, 100 at .75 with 75%
    rows = [(0.25, i % 4 == 0) for i in range(100)] + [
        (0.75, i % 4 != 0) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "s double, y boolean")
    got = {r.bin: r for r in calibration_bins(df, "s", "y", n_bins=4).collect()}
    assert set(got) == {1, 3}
    assert got[1].frac_positive == 0.25 and got[3].frac_positive == 0.75
    assert got[1].n == 100


def test_calibration_top_bin_folds_score_one(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.evalmetrics import (
        calibration_bins,
    )

    df = spark.createDataFrame([(1.0, True), (0.95, False)], "s double, y boolean")
    got = calibration_bins(df, "s", "y", n_bins=10).collect()
    assert len(got) == 1 and got[0].bin == 9 and got[0].n == 2


def test_psi_identical_halves_is_near_zero(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.evalmetrics import psi_drift

    rows = [(i / 100.0, i % 2 == 0) for i in range(100)]
    df = spark.createDataFrame(rows, "v double, half boolean")
    got = psi_drift(df, "v", "half").collect()[0]
    assert got.n_expected == 50 and got.n_actual == 50
    assert abs(got.psi) < 1e-3


def test_psi_shifted_distribution_alarms(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.evalmetrics import psi_drift

    # expected uniform on [0, 0.5); actual uniform on [0.5, 1.0)
    rows = [(i / 200.0, False) for i in range(100)] + [
        (0.5 + i / 200.0, True) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "v double, half boolean")
    got = psi_drift(df, "v", "half").collect()[0]
    assert got.psi > 0.25  # "significant shift" band


def test_conformal_cutoff_coverage_and_k(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.evalmetrics import (
        conformal_cutoff,
    )
    import math

    # uniform-ish deterministic scores over 4000 ids
    df = spark.createDataFrame(
        [(i, ((i * 37) % 4000) / 4000.0) for i in range(4000)],
        "doc_id long, score double",
    )
    out = conformal_cutoff(df, "score", alphas=(0.1, 0.3), id_col="doc_id").collect()
    assert [r.alpha for r in out] == [0.1, 0.3]
    for r in out:
        assert r.k == min(r.n_calib, math.ceil((r.n_calib + 1) * (1 - r.alpha)))
        # exchangeable split + exact order statistic: keep-rate within
        # sampling noise of 1 - alpha (n_test ~ 2000 -> sd ~ 0.01)
        assert abs(r.test_keep_rate - (1 - r.alpha)) < 0.05
    # lower alpha -> higher cutoff (monotone gates)
    assert out[0].cutoff >= out[1].cutoff


def test_isotonic_pav_matches_reference_and_is_monotone(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.evalmetrics import (
        isotonic_calibration,
    )

    # deliberately non-monotone reliability: mid bins worse than low
    rows = []
    data = [(0.05, 0.0), (0.15, 1.0), (0.25, 0.2), (0.35, 0.9), (0.45, 0.4)]
    rid = 0
    for score, p in data:
        for i in range(50):
            rows.append((rid, score, 1 if i < int(p * 50) else 0))
            rid += 1
    df = spark.createDataFrame(rows, "id long, score double, y int")
    out = isotonic_calibration(df, "score", "y", n_bins=10).collect()
    cal = [r.calibrated for r in sorted(out, key=lambda r: r.bin)]
    assert cal == sorted(cal)  # isotonic by construction
    # PAV weighted mean is conserved within each pooled block
    total_pos = sum(r.frac_pos * r.n for r in out)
    total_cal = sum(r.calibrated * r.n for r in out)
    assert abs(total_pos - total_cal) < 1e-9
    # independent PAV on the known bins
    import numpy as np

    bins = {}
    for _, score, y in rows:
        k = min(int(score * 10), 9)
        n, p = bins.get(k, (0, 0))
        bins[k] = (n + 1, p + y)
    xs = sorted(bins)
    w = [bins[k][0] for k in xs]
    v = [bins[k][1] / bins[k][0] for k in xs]
    # classic PAV
    w2, v2, idx = [], [], []
    for i in range(len(xs)):
        w2.append(w[i]); v2.append(v[i]); idx.append([xs[i]])
        while len(v2) >= 2 and v2[-2] > v2[-1]:
            wv = w2[-2] + w2[-1]
            vv = (v2[-2] * w2[-2] + v2[-1] * w2[-1]) / wv
            w2[-2:] = [wv]; v2[-2:] = [vv]; idx[-2:] = [idx[-2] + idx[-1]]
    want = {}
    for val, members in zip(v2, idx):
        for k in members:
            want[k] = val
    got = {r.bin: r.calibrated for r in out}
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_ranking_eval_perfect_and_degenerate(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.evalmetrics import ranking_eval

    # two tight clusters far apart: retrieval within a cluster is perfect,
    # so nDCG@k == 1 and MRR == 1 for a clustered query; a singleton-label
    # query has no ideal ranking -> NULL nDCG, MRR 0
    rows = []
    for i in range(4):  # label 0 cluster near (1, 0)
        rows.append((i, [1.0, float(i) * 1e-4], 0))
    for i in range(4):  # label 1 cluster near (0, 1)
        rows.append((10 + i, [float(i) * 1e-4, 1.0], 1))
    rows.append((99, [-1.0, -1.0], 2))  # singleton label
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        r.query_id: r
        for r in ranking_eval(emb, query_ids=[0, 99], k=3).collect()
    }
    q0 = out[0]
    assert (q0.n_rel_corpus, q0.n_retrieved_rel) == (3, 3)
    assert abs(q0.ndcg - 1.0) < 1e-12
    assert q0.mrr == 1.0
    q99 = out[99]
    assert q99.n_rel_corpus == 0 and q99.ndcg is None and q99.mrr == 0.0


def test_brier_decomposition_matches_python(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.evalmetrics import (
        brier_decomposition,
    )

    # deterministic scores spanning all bins, mixed labels
    rows = [((i * 37 % 100) / 100.0, 1 if (i * 53) % 7 < 3 else 0) for i in range(400)]
    df = spark.createDataFrame(rows, "score double, y int")
    got = brier_decomposition(df, "score", "y", n_bins=10).collect()[0]

    n = len(rows)
    obar = sum(y for _, y in rows) / n
    brier = sum((f - y) ** 2 for f, y in rows) / n
    bins: dict = {}
    for f, y in rows:
        b = min(int(f * 10), 9)
        nk, sf, so = bins.get(b, (0, 0.0, 0.0))
        bins[b] = (nk + 1, sf + f, so + y)
    rel = sum(nk * (sf / nk - so / nk) ** 2 for nk, sf, so in bins.values()) / n
    res = sum(nk * (so / nk - obar) ** 2 for nk, sf, so in bins.values()) / n
    unc = obar * (1 - obar)
    assert got.n == n
    assert got.base_rate == pytest.approx(obar, rel=1e-12)
    assert got.brier == pytest.approx(brier, rel=1e-12)
    assert got.reliability == pytest.approx(rel, rel=1e-9)
    assert got.resolution == pytest.approx(res, rel=1e-9)
    assert got.uncertainty == pytest.approx(unc, rel=1e-12)
    assert got.within_bin_residual == pytest.approx(
        brier - (rel - res + unc), abs=1e-9
    )


def test_brier_constant_within_bin_identity_is_exact(spark):
    from pipeline_pyspark_etl_imdb_spark.operators.evalmetrics import (
        brier_decomposition,
    )

    # forecasts at bin centers only -> residual must vanish
    rows = []
    for b in range(10):
        f = b / 10.0 + 0.05
        for i in range(20):
            rows.append((f, 1 if i < b * 2 else 0))
    df = spark.createDataFrame(rows, "score double, y int")
    got = brier_decomposition(df, "score", "y", n_bins=10).collect()[0]
    assert abs(got.within_bin_residual) < 1e-12
