"""Nonparametric/multiple-testing inference battery, containment dedup,
corpus JSD, and compaction planning against independent pure-Python
replays on the sf0.001 fixtures (the abtest-test discipline: same data,
different engine, exact or 1e-12-relative agreement)."""

import hashlib
import math
import re
from decimal import Decimal
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from pipeline_pyspark_etl_imdb_spark.operators import corpus, eventtime, inference, neardup, text as text_ops
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_SMOKE}/orders.parquet")


@pytest.fixture(scope="module")
def events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def _dec2(x) -> Decimal:
    return Decimal(str(x)).quantize(Decimal("0.01"))


def _normal_sf_py(z_abs: float) -> float:
    # the A&S 7.1.26 tree of inference.normal_sf_two_sided, verbatim
    x = z_abs / math.sqrt(2.0)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = 1.061405429
    for a in (-1.453152027, 1.421413741, -0.284496736, 0.254829592):
        poly = a + t * poly
    return t * poly * math.exp(-x * x)


def test_mannwhitney_matches_python(orders):
    rows = orders.where(F.col("o_orderstatus").isin("O", "F")).select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        (F.col("o_orderstatus") == "O").alias("is_a"),
    ).collect()
    per_v: dict = {}
    for r in rows:
        c = per_v.setdefault(r.v, [0, 0])
        c[0] += 1
        c[1] += 1 if r.is_a else 0
    two_r_a = tie = 0
    cum = 0
    for v in sorted(per_v):
        cnt, cnt_a = per_v[v]
        two_r_a += cnt_a * (2 * cum + cnt + 1)
        tie += cnt**3 - cnt
        cum += cnt
    n_a = sum(c[1] for c in per_v.values())
    n_b = cum - n_a
    two_u = two_r_a - n_a * (n_a + 1)
    n = n_a + n_b
    sigma2 = (n_a * n_b / 12.0) * ((n + 1.0) - tie / (n * (n - 1.0)))
    got = inference.mannwhitney_u_report(
        orders,
        F.col("o_totalprice").cast("decimal(18,2)"),
        F.col("o_orderstatus"),
        "O",
        "F",
    ).collect()[0]
    assert (got.n_a, got.n_b) == (n_a, n_b)
    assert got.u_stat == pytest.approx(two_u / 2.0, rel=1e-12)
    assert got.tie_term == float(tie)
    assert got.z == pytest.approx(
        (float(two_u) - float(n_a) * float(n_b)) / (2.0 * math.sqrt(sigma2)),
        rel=1e-12,
    )


def test_runs_test_matches_python(spark, events):
    rows = events.select(
        "event_type",
        "event_id",
        F.col("value").cast("decimal(18,4)").alias("v"),
        eventtime.ts_micros(events).alias("us"),
    ).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append((r.us, r.event_id, r.v))
    expected = {}
    for et, seq in by_type.items():
        seq.sort(key=lambda t: (t[0], t[1]))
        s = sum((t[2] for t in seq), Decimal(0))
        n_rows = len(seq)
        sides = [1 if t[2] * n_rows > s else 0 for t in seq if t[2] * n_rows != s]
        n1, n0 = sum(sides), len(sides) - sum(sides)
        n_runs = sum(
            1 for i, a in enumerate(sides) if i == 0 or sides[i - 1] != a
        )
        two = 2.0 * n1 * n0
        ntot = float(n1 + n0)
        e_r = 1.0 + two / ntot
        var_r = two * (two - ntot) / (ntot * ntot * (ntot - 1.0))
        expected[et] = (n1, n0, n_runs, (n_runs - e_r) / math.sqrt(var_r))
    base = events.select(
        "event_type",
        "event_id",
        F.col("value").cast("decimal(18,4)").alias("v_dec"),
        eventtime.ts_micros(events).alias("us"),
    )
    got = inference.runs_test_report(
        base, "event_type", F.col("v_dec"), ["us", "event_id"]
    ).collect()
    assert len(got) == len(expected)
    for r in got:
        n1, n0, n_runs, z = expected[r.event_type]
        assert (r.n_above, r.n_below, r.n_runs) == (n1, n0, n_runs)
        assert r.z == pytest.approx(z, rel=1e-12)


def test_anova_matches_python(orders):
    rows = orders.select(
        "o_orderpriority", F.col("o_totalprice").cast("decimal(18,2)").alias("v")
    ).collect()
    per_g: dict = {}
    for r in rows:
        g = per_g.setdefault(r.o_orderpriority, [0, Decimal(0), Decimal(0)])
        g[0] += 1
        g[1] += r.v
        g[2] += r.v * r.v
    k = len(per_g)
    n_t = sum(g[0] for g in per_g.values())
    s_t = sum((g[1] for g in per_g.values()), Decimal(0))
    ss_t = sum((g[2] for g in per_g.values()), Decimal(0))
    sum_sq_over_n = sum(
        float(g[1]) * float(g[1]) / float(g[0]) for g in per_g.values()
    )
    ssb = sum_sq_over_n - float(s_t) * float(s_t) / n_t
    sst = float(ss_t) - float(s_t) * float(s_t) / n_t
    got = inference.anova_report(
        orders, "o_orderpriority", F.col("o_totalprice").cast("decimal(18,2)")
    ).collect()[0]
    assert (got.k, got.n_total) == (k, n_t)
    assert got.f_stat == pytest.approx(
        (ssb / (k - 1.0)) / ((sst - ssb) / (n_t - float(k))), rel=1e-9
    )
    assert got.eta_squared == pytest.approx(ssb / sst, rel=1e-9)


def test_permutation_test_matches_python(orders):
    rows = orders.select(
        F.col("o_orderkey").cast("string").alias("k"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
        (F.col("o_orderpriority") == "1-URGENT").alias("in_a"),
    ).collect()
    s_a = sum((r.v for r in rows if r.in_a), Decimal(0))
    n_a = sum(1 for r in rows if r.in_a)
    s_b = sum((r.v for r in rows if not r.in_a), Decimal(0))
    n_b = len(rows) - n_a
    obs = float(s_a) / n_a - float(s_b) / n_b
    B = 50  # smaller than the registry's 200: the kernel is identical
    # replay the block-hashed coin words: 15 hex chars = 60 bits per
    # (key, block), replicate b reads bit b%60 of word b//60
    n_ge = n_reps = 0
    words = {
        r.k: int(
            hashlib.md5(f"{r.k}:0:perm1".encode()).hexdigest()[:15], 16
        )
        for r in rows
    }
    for b in range(B):
        s1 = s0 = Decimal(0)
        n1 = n0 = 0
        for r in rows:
            if (words[r.k] >> b) & 1:
                s1 += r.v
                n1 += 1
            else:
                s0 += r.v
                n0 += 1
        if n1 and n0:
            n_reps += 1
            diff = float(s1) / n1 - float(s0) / n0
            if abs(diff) >= abs(obs):
                n_ge += 1
    got = inference.permutation_mean_test(
        orders,
        F.col("o_orderkey"),
        F.col("o_totalprice").cast("decimal(18,2)"),
        F.col("o_orderpriority") == "1-URGENT",
        n_replicates=B,
        salt="perm1",
    ).collect()[0]
    assert got.obs_diff == pytest.approx(obs, rel=1e-12)
    assert (got.n_replicates, got.n_ge) == (n_reps, n_ge)
    assert got.p_value == pytest.approx((n_ge + 1.0) / (n_reps + 1.0), rel=1e-12)


def test_bh_fdr_matches_python(events):
    rows = events.select(
        "event_type", F.col("value").cast("decimal(18,4)").alias("v")
    ).collect()
    per_g: dict = {}
    for r in rows:
        g = per_g.setdefault(r.event_type, [0, Decimal(0), Decimal(0)])
        g[0] += 1
        g[1] += r.v
        g[2] += r.v * r.v
    n_t = sum(g[0] for g in per_g.values())
    s_t = sum((g[1] for g in per_g.values()), Decimal(0))
    ss_t = sum((g[2] for g in per_g.values()), Decimal(0))
    m = len(per_g)
    scored = []
    for et, (n, s, ss) in per_g.items():
        nr = n_t - n
        sr, ssr = s_t - s, ss_t - ss
        var_g = (float(ss) - float(s) * float(s) / n) / (n - 1.0)
        var_r = (float(ssr) - float(sr) * float(sr) / nr) / (nr - 1.0)
        z = (float(s) / n - float(sr) / nr) / math.sqrt(var_g / n + var_r / nr)
        scored.append((et, n, z, _normal_sf_py(abs(z))))
    scored.sort(key=lambda t: (t[3], t[0]))
    max_rej = 0
    for i, (_, _, _, p) in enumerate(scored, start=1):
        if p <= i / m * 0.05:
            max_rej = i
    expected = {
        et: (n, z, p, i / m * 0.05, i <= max_rej)
        for i, (et, n, z, p) in enumerate(scored, start=1)
    }
    got = inference.bh_fdr_report(
        events, "event_type", F.col("value").cast("decimal(18,4)"), alpha=0.05
    ).collect()
    assert len(got) == m
    for r in got:
        n, z, p, crit, rej = expected[r.event_type]
        assert r.n == n
        assert r.z == pytest.approx(z, rel=1e-12)
        assert r.p_value == pytest.approx(p, rel=1e-9)
        assert r.bh_critical == pytest.approx(crit, rel=1e-12)
        assert r.rejected == rej


def test_bivariate_outliers_match_python(spark, orders):
    customer = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("spend")
    )
    joined = customer.join(
        spend, customer["c_custkey"] == spend["o_custkey"]
    ).select(
        "c_custkey",
        F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
        "spend",
    )
    rows = joined.collect()
    n = len(rows)
    sx = sum((r.bal for r in rows), Decimal(0))
    sy = sum((r.spend for r in rows), Decimal(0))
    sxx = sum((r.bal * r.bal for r in rows), Decimal(0))
    sxy = sum((r.bal * r.spend for r in rows), Decimal(0))
    syy = sum((r.spend * r.spend for r in rows), Decimal(0))
    mx, my = float(sx) / n, float(sy) / n
    s_xx = float(sxx) - float(sx) * float(sx) / n
    s_xy = float(sxy) - float(sx) * float(sy) / n
    s_yy = float(syy) - float(sy) * float(sy) / n
    det = s_xx * s_yy - s_xy * s_xy
    # chi^2_2 0.9 cut: the sf0.001 fixture has no 0.999-tail outliers, and
    # an empty-vs-empty comparison would test nothing
    cutoff = 4.605170185988092
    expected = {}
    for r in rows:
        dx, dy = float(r.bal) - mx, float(r.spend) - my
        d2 = (n - 1.0) * (dx * dx * s_yy - 2.0 * dx * dy * s_xy + dy * dy * s_xx) / det
        if d2 > cutoff:
            expected[r.c_custkey] = d2
    got = inference.bivariate_outlier_report(
        joined, "c_custkey", F.col("bal"), F.col("spend"), cutoff=cutoff
    ).collect()
    assert {r.c_custkey for r in got} == set(expected)
    assert len(got) > 0, "fixture should contain at least one bivariate outlier"
    for r in got:
        assert r.d2 == pytest.approx(expected[r.c_custkey], rel=1e-9)


def test_grouped_spearman_matches_python(spark, orders):
    customer = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend")
    )
    joined = customer.join(
        spend, customer["c_custkey"] == spend["o_custkey"]
    ).select(
        "c_mktsegment",
        F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
        "spend",
    )
    rows = joined.collect()
    by_seg: dict = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, []).append((r.bal, r.spend))

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            mr = (i + 1 + j) / 2.0  # mean of ranks i+1..j
            for t in range(i, j):
                ranks[order[t]] = mr
            i = j
        return ranks

    expected = {}
    for seg, pairs in by_seg.items():
        rx = midranks([p[0] for p in pairs])
        ry = midranks([p[1] for p in pairs])
        nn = len(pairs)
        mrx, mry = sum(rx) / nn, sum(ry) / nn
        cov = sum((a - mrx) * (b - mry) for a, b in zip(rx, ry))
        vx = sum((a - mrx) ** 2 for a in rx)
        vy = sum((b - mry) ** 2 for b in ry)
        expected[seg] = (nn, cov / math.sqrt(vx * vy))
    got = inference.grouped_spearman(
        joined, "c_mktsegment", F.col("bal"), F.col("spend")
    ).collect()
    assert len(got) == len(expected)
    for r in got:
        nn, rho = expected[r.c_mktsegment]
        assert r.n == nn
        assert r.spearman_rho == pytest.approx(rho, rel=1e-9)


def test_mannwhitney_group_swap_negates_z(orders):
    a = inference.mannwhitney_u_report(
        orders,
        F.col("o_totalprice").cast("decimal(18,2)"),
        F.col("o_orderstatus"),
        "O",
        "F",
    ).collect()[0]
    b = inference.mannwhitney_u_report(
        orders,
        F.col("o_totalprice").cast("decimal(18,2)"),
        F.col("o_orderstatus"),
        "F",
        "O",
    ).collect()[0]
    # U_A + U_B = n_a * n_b holds with or without ties (midranks), and
    # the z statistic negates exactly (integer-derived doubles, shared
    # sigma)
    assert a.u_stat + b.u_stat == float(a.n_a) * float(a.n_b)
    assert (b.n_a, b.n_b) == (a.n_b, a.n_a)
    assert b.z == -a.z


def test_anova_shift_invariance(spark):
    rows = [("a", 1), ("a", 2), ("a", 6), ("b", 4), ("b", 5), ("b", 9), ("c", 7)]
    df = spark.createDataFrame(rows, ["g", "v"])
    base = inference.anova_report(
        df, "g", F.col("v").cast("decimal(18,2)")
    ).collect()[0]
    shifted = inference.anova_report(
        df, "g", (F.col("v") + F.lit(1000)).cast("decimal(18,2)")
    ).collect()[0]
    assert base.f_stat == pytest.approx(shifted.f_stat, rel=1e-6)
    assert base.eta_squared == pytest.approx(shifted.eta_squared, rel=1e-6)
    assert 0.0 <= base.eta_squared <= 1.0


def test_permutation_flag_inversion_preserves_p(orders):
    kwargs = dict(n_replicates=30, salt="perm1")
    a = inference.permutation_mean_test(
        orders,
        F.col("o_orderkey"),
        F.col("o_totalprice").cast("decimal(18,2)"),
        F.col("o_orderpriority") == "1-URGENT",
        **kwargs,
    ).collect()[0]
    b = inference.permutation_mean_test(
        orders,
        F.col("o_orderkey"),
        F.col("o_totalprice").cast("decimal(18,2)"),
        F.col("o_orderpriority") != "1-URGENT",
        **kwargs,
    ).collect()[0]
    # inverting the flag negates obs_diff; the coin stream is unchanged,
    # so |diff| >= |obs| tallies — and hence p — are identical
    assert b.obs_diff == -a.obs_diff
    assert (b.n_ge, b.p_value) == (a.n_ge, a.p_value)
    assert 1.0 / (a.n_replicates + 1) <= a.p_value <= 1.0


def test_bh_alpha_one_rejects_all(events):
    got = inference.bh_fdr_report(
        events, "event_type", F.col("value").cast("decimal(18,4)"), alpha=1.0
    ).collect()
    # at alpha=1 the rank-m criterion p <= (m/m)*1 always holds, so the
    # suffix-max rejects the entire battery
    assert all(r.rejected for r in got)


def test_spearman_perfect_monotone(spark):
    rows = [("g", i, i * i) for i in range(1, 30)]  # monotone, nonlinear
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    got = inference.grouped_spearman(df, "g", F.col("x"), F.col("y")).collect()[0]
    assert got.spearman_rho == pytest.approx(1.0, abs=1e-12)


def test_runs_test_extreme_sequences(spark):
    # alternating above/below -> n_runs == n; two monotone blocks -> 2
    alt = [("alt", i, 10 if i % 2 == 0 else 0) for i in range(20)]
    blk = [("blk", i, 0 if i < 10 else 10) for i in range(20)]
    df = spark.createDataFrame(alt + blk, ["k", "pos", "v"])
    got = {
        r.k: r
        for r in inference.runs_test_report(
            df, "k", F.col("v").cast("decimal(18,4)"), ["pos"]
        ).collect()
    }
    assert got["alt"].n_runs == 20 and got["alt"].z > 0
    assert got["blk"].n_runs == 2 and got["blk"].z < 0


def test_containment_pairs_match_bruteforce(docs):
    rows = docs.select("doc_id", "text").collect()
    texts = {r.doc_id: r.text for r in rows}
    expected = set()
    for a, ta in texts.items():
        if len(re.split(r"\s+", ta)) < 5:
            continue
        for b, tb in texts.items():
            if a != b and ta in tb:
                expected.add((a, b))
    got = neardup.containment_pairs(docs).collect()
    assert {(r.inner_doc, r.outer_doc) for r in got} == expected
    for r in got:
        assert r.inner_chars == len(texts[r.inner_doc])
        assert r.outer_chars == len(texts[r.outer_doc])


def test_containment_synthetic_edge_cases(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),  # contained in 2
        (2, "prefix alpha beta gamma delta epsilon zeta suffix"),
        (3, "alpha beta"),  # < 5 tokens: excluded as inner even though in 2
        (4, "xxalpha beta gamma delta epsilon zetaxx"),  # fused boundary tokens
        (5, "alpha beta gamma delta epsilon zeta"),  # exact duplicate of 1
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.inner_doc, r.outer_doc)
        for r in neardup.containment_pairs(docs).collect()
    }
    # 1 in 2, 1 in 4 (interior shingles survive the char fusion), 1<->5,
    # 5 in 2, 5 in 4; 3 never as inner (too short)
    assert got == {(1, 2), (1, 4), (1, 5), (5, 1), (5, 2), (5, 4)}


def test_containment_df_cap_excludes_boilerplate_inners(spark):
    # ten identical boilerplate docs: every interior shingle has df=10,
    # so candidate fan-out is quadratic; plus one genuine containment
    # pair with rare interiors
    rows = [(i, "common one two three four five") for i in range(1, 11)] + [
        (11, "alpha beta gamma delta epsilon zeta"),
        (12, "xx alpha beta gamma delta epsilon zeta yy"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    complete = {
        (r.inner_doc, r.outer_doc)
        for r in neardup.containment_pairs(docs).collect()
    }
    # complete form: all 90 ordered boilerplate pairs + the rare pair
    assert (11, 12) in complete
    assert len(complete) == 90 + 1
    capped = {
        (r.inner_doc, r.outer_doc)
        for r in neardup.containment_pairs(docs, df_frac_cap=0.5).collect()
    }
    # cap at 50%: the boilerplate docs' rarest interior shingle has
    # df=10 > 6, so they leave the inner side; the rare pair survives
    assert capped == {(11, 12)}


def test_source_token_jsd_matches_python(docs):
    rows = docs.select("source", "text").collect()
    counts: dict = {}
    for r in rows:
        for t in re.split(r"\s+", r.text):
            counts[(r.source, t)] = counts.get((r.source, t), 0) + 1
    totals: dict = {}
    for (g, _), n in counts.items():
        totals[g] = totals.get(g, 0) + n
    probs = {(g, t): n / totals[g] for (g, t), n in counts.items()}
    h = {}
    for g in totals:
        h[g] = -sum(p * math.log(p) for (gg, _), p in probs.items() if gg == g)
    got = text_ops.source_token_jsd(docs).collect()
    pairs = {(r.source_a, r.source_b) for r in got}
    gs = sorted(totals)
    assert pairs == {(a, b) for i, a in enumerate(gs) for b in gs[i + 1 :]}
    for r in got:
        union = {
            t
            for (g, t) in probs
            if g in (r.source_a, r.source_b)
        }
        hm = 0.0
        for t in union:
            mval = (
                probs.get((r.source_a, t), 0.0) + probs.get((r.source_b, t), 0.0)
            ) / 2.0
            hm += -mval * math.log(mval)
        jsd = hm - (h[r.source_a] + h[r.source_b]) / 2.0
        assert r.n_union_tokens == len(union)
        assert r.jsd_nats == pytest.approx(jsd, rel=1e-9, abs=1e-12)
        assert -1e-12 <= r.jsd_nats <= math.log(2.0) + 1e-12
        assert r.jsd_bits == pytest.approx(jsd / math.log(2.0), rel=1e-9, abs=1e-12)


def test_compaction_plan_greedy_contract(spark):
    sizes = {
        "p1": [10, 20, 30, 5, 100, 1, 49, 50],
        "p2": [200],
        "p3": [1, 1, 1],
    }
    rows = [
        (p, i, s) for p, ss in sizes.items() for i, s in enumerate(ss)
    ]
    files = spark.createDataFrame(rows, ["part", "file_id", "size_bytes"])
    target = 50
    got = corpus.compaction_plan(files, "part", "file_id", "size_bytes", target)
    plan = got.collect()
    # replay the rule: group = (cumulative bytes before this file) div target
    expected: dict = {}
    for p, ss in sizes.items():
        cum = 0
        for i, s in enumerate(ss):
            g = cum // target
            key = (p, g)
            e = expected.setdefault(key, [0, 0, i, i])
            e[0] += 1
            e[1] += s
            e[3] = i
            cum += s
    assert {(r.part, r.merge_group) for r in plan} == set(expected)
    for r in plan:
        n_files, group_bytes, first, last = expected[(r.part, r.merge_group)]
        assert (r.n_files, r.group_bytes, r.first_file, r.last_file) == (
            n_files,
            group_bytes,
            first,
            last,
        )
    # every group except a partition's last holds >= target bytes
    by_part: dict = {}
    for r in plan:
        by_part.setdefault(r.part, []).append(r)
    for p, groups in by_part.items():
        groups.sort(key=lambda r: r.merge_group)
        for r in groups[:-1]:
            assert r.group_bytes >= target


def test_anova_degenerate_inputs_yield_null(spark):
    # one group -> k = 1: f_stat undefined (guarded NULL), eta^2 NULL
    # when total variance is zero; both formerly hit engine-dependent 0/0
    one_group = spark.createDataFrame(
        [("a", Decimal("1.00")), ("a", Decimal("2.00"))], "g string, v decimal(18,2)"
    )
    row = inference.anova_report(one_group, "g", F.col("v")).collect()[0]
    assert row.k == 1 and row.f_stat is None and row.eta_squared is not None

    # all values identical across groups -> sst = ssw = 0 exactly:
    # BOTH statistics are guarded NULL (never NaN/inf)
    const = spark.createDataFrame(
        [("a", Decimal("5.00")), ("a", Decimal("5.00")),
         ("b", Decimal("5.00")), ("b", Decimal("5.00"))],
        "g string, v decimal(18,2)",
    )
    row = inference.anova_report(const, "g", F.col("v")).collect()[0]
    assert row.f_stat is None and row.eta_squared is None

    # k = n_total (every group a singleton) -> within df = 0: NULL f_stat
    singletons = spark.createDataFrame(
        [("a", Decimal("1.00")), ("b", Decimal("2.00")), ("c", Decimal("4.00"))],
        "g string, v decimal(18,2)",
    )
    row = inference.anova_report(singletons, "g", F.col("v")).collect()[0]
    assert row.f_stat is None and row.eta_squared is not None


def test_bh_fdr_degenerate_groups_null_and_rank_last(spark):
    # battery of 3: two healthy groups and one singleton. The singleton's
    # z/p are guarded NULL, it ranks LAST (nulls-last pinned), it never
    # rejects, and m still counts it as a hypothesis.
    rows = (
        [("a", float(i % 7) + 0.25) for i in range(40)]
        + [("b", float(i % 5) + 9.5) for i in range(40)]
        + [("lonely", 3.0)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = inference.bh_fdr_report(
        df, "g", F.col("v").cast("decimal(18,4)"), alpha=0.05
    ).collect()
    by_g = {r.g: r for r in got}
    assert by_g["lonely"].z is None and by_g["lonely"].p_value is None
    assert by_g["lonely"].rejected is False
    # NULL p ranks last: its bh_critical carries the max rank i = m
    assert by_g["lonely"].bh_critical == pytest.approx(3 / 3 * 0.05)
    assert all(r.z is not None for g, r in by_g.items() if g != "lonely")

    # m = 1 battery (complement empty): guarded NULL, no crash
    solo = spark.createDataFrame([("only", 1.0), ("only", 2.0)], "g string, v double")
    row = inference.bh_fdr_report(
        solo, "g", F.col("v").cast("decimal(18,4)")
    ).collect()[0]
    assert row.z is None and row.rejected is False

    # zero pooled variance (both sides constant): NULL, never NaN
    const = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 1.0)], "g string, v double"
    )
    for r in inference.bh_fdr_report(
        const, "g", F.col("v").cast("decimal(18,4)")
    ).collect():
        assert r.z is None and r.rejected is False


def test_containment_df_profile_pinned(spark):
    # corpus of 6 docs: 3 copies of one 6-token text (eligible inners,
    # interior shingles shared by all three), one distinct eligible doc,
    # two short docs (< 5 tokens -> not inner-eligible)
    dup = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [(1, dup), (2, dup), (3, dup), (4, "one two three four five six seven"),
         (5, "tiny doc"), (6, "x y z")],
        "doc_id bigint, text string",
    )
    row = neardup.containment_df_profile(docs).collect()[0]
    assert row.n_docs == 6 and row.n_inner_docs == 4
    # the 3 clones: every interior shingle has df = 3; doc 4's are unique
    assert row.max_df == 3 and row.candidate_rows == 3 * 3 + 1
    # df=3 of 6 docs -> 3*100 > 6 and 3*10 > 6: all three clones exceed
    # both thresholds; doc 4 (df=1) exceeds the 10% one (1*10 > 6)
    assert row.docs_over_1pct == 4 and row.docs_over_10pct == 4


def test_dedup_cascade_stages_and_partition(spark, docs):
    # hand-built corpus hitting all four stages:
    #   1/2: exact dups          -> 2 drops 'exact' against canonical 1
    #   3:   contained in 1      -> drops 'contained' (>= 5 tokens, inside 1)
    #   4/5: near-dups (J >= .8) -> 5 drops 'near' against canonical 4
    #   6:   unique              -> kept
    big = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # 15 tokens differing only in the last -> 12 of 13 shingles shared,
    # J = 12/14 = 0.857 >= 0.8
    near_a = ("one two three four five six seven eight nine ten "
              "red green blue white black")
    near_b = ("one two three four five six seven eight nine ten "
              "red green blue white pink")
    tiny = spark.createDataFrame(
        [(1, big), (2, big), (3, "beta gamma delta epsilon zeta eta"),
         (4, near_a), (5, near_b), (6, "completely different text here okay")],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in neardup.dedup_cascade(tiny).collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6}, "exactly one row per doc"
    assert (got[2].keep, got[2].stage, got[2].canonical_id) == (False, "exact", 1)
    assert (got[3].keep, got[3].stage, got[3].canonical_id) == (
        False, "contained", 1)
    assert (got[5].keep, got[5].stage, got[5].canonical_id) == (False, "near", 4)
    for kept_id in (1, 4, 6):
        assert (got[kept_id].keep, got[kept_id].stage,
                got[kept_id].canonical_id) == (True, "kept", kept_id)

    # partition invariant on the real fixture corpus: one row per doc,
    # kept rows are self-canonical, dropped rows point at a kept doc
    rep = neardup.dedup_cascade(docs).collect()
    assert len(rep) == docs.count()
    assert len({r.doc_id for r in rep}) == len(rep)
    kept = {r.doc_id for r in rep if r.keep}
    for r in rep:
        if r.keep:
            assert r.canonical_id == r.doc_id and r.stage == "kept"
        elif r.stage in ("exact", "near"):
            # exact/near canonicals are group minima -> always kept
            assert r.canonical_id in kept and r.canonical_id < r.doc_id
        else:
            # containment witnesses may themselves be contained in a
            # larger kept doc (transitive chain) — only ordering holds
            assert r.stage == "contained" and r.canonical_id != r.doc_id


def test_split_leakage_report_matches_replay(spark, docs):
    # replay the composition from its two audited components: jaccard
    # pairs at 0.8 and the hash split assignment — the report must be
    # exactly the cross-split subset, aggregated per unordered split pair
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in neardup.jaccard_pairs(docs, k=3, threshold=0.8).collect()
    }
    assign = {
        r.doc_id: r.split for r in corpus.dataset_split(docs).collect()
    }
    want: dict = {}
    for (a, b), j in pairs.items():
        sa, sb = assign[a], assign[b]
        if sa == sb:
            continue
        key = (min(sa, sb), max(sa, sb))
        e = want.setdefault(key, [0, set(), 0.0])
        e[0] += 1
        e[1].update((a, b))
        e[2] = max(e[2], j)
    got = {
        (r.split_a, r.split_b): r
        for r in corpus.split_leakage_report(docs).collect()
    }
    assert set(got) == set(want)
    for key, (n_pairs, d, mx) in want.items():
        r = got[key]
        assert (r.n_crossing_pairs, r.n_leaked_docs) == (n_pairs, len(d))
        assert r.max_jaccard == mx
