"""Nonparametric statistics (queries/npstatq.py) — semantics pinned
against independent pure-Python references on hand-checkable corpora
(oracle parity cannot catch a formula bug both engines share)."""

from __future__ import annotations

import math

from rick_and_morty_data_pipeline_project_spark.queries import npstatq


def _run_patched(spark, fn, df):
    """Run a catalog query body against a synthetic events frame."""
    orig = npstatq.t
    try:
        npstatq.t = lambda s, sf, name: df  # noqa: ARG005
        return fn(spark, "unused").collect()
    finally:
        npstatq.t = orig


def _mw_reference(treat: list[float], base: list[float]):
    """Independent midrank Mann–Whitney with tie-corrected z."""
    combined = sorted(
        [(v, "t") for v in treat] + [(v, "b") for v in base]
    )
    n = len(combined)
    ranks: dict[int, float] = {}
    i = 0
    while i < n:
        j = i
        while j < n and combined[j][0] == combined[i][0]:
            j += 1
        mid = (i + 1 + j) / 2.0  # mean of ranks i+1..j
        for k in range(i, j):
            ranks[k] = mid
        i = j
    r1 = sum(ranks[k] for k in range(n) if combined[k][1] == "t")
    n1, n2 = len(treat), len(base)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    # tie counts
    ties: dict[float, int] = {}
    for v, _ in combined:
        ties[v] = ties.get(v, 0) + 1
    tsum = sum(c**3 - c for c in ties.values())
    sigma = math.sqrt(
        n1 * n2 / 12.0 * ((n + 1) - tsum / (n * (n - 1)))
    )
    z = (u1 - n1 * n2 / 2.0) / sigma
    return u1, z


def test_mann_whitney_hand_checked(spark):
    treat = [3.0, 5.0, 5.0, 9.0, 12.0]
    base = [1.0, 2.0, 5.0, 7.0]
    rows = [
        ("e1", "2024-01-01 00:00:00", v) for v in treat
    ] + [
        ("view", "2024-01-01 00:00:00", v) for v in base
    ]
    df = spark.createDataFrame(
        [(i, t, ts, v) for i, (t, ts, v) in enumerate(rows)],
        "user_id long, event_type string, ts string, value double",
    ).selectExpr(
        "user_id", "event_type", "CAST(ts AS TIMESTAMP) ts", "value"
    )
    got = _run_patched(spark, npstatq.events_mann_whitney, df)
    assert len(got) == 1
    r = got[0]
    u_ref, z_ref = _mw_reference(treat, base)
    assert r["event_type"] == "e1"
    assert (r["n_treat"], r["n_base"]) == (5, 4)
    assert abs(r["u_stat"] - round(u_ref, 6)) < 1e-9
    assert abs(r["z"] - round(z_ref, 6)) < 1e-6


def test_mann_whitney_symmetry_on_identical_samples(spark):
    # identical value multisets in both arms → U = n1·n2/2, z = 0
    vals = [1.0, 2.0, 3.0, 4.0]
    rows = [("e1", v) for v in vals] + [("view", v) for v in vals]
    df = spark.createDataFrame(
        [(i, t, "2024-01-01 00:00:00", v) for i, (t, v) in enumerate(rows)],
        "user_id long, event_type string, ts string, value double",
    ).selectExpr(
        "user_id", "event_type", "CAST(ts AS TIMESTAMP) ts", "value"
    )
    r = _run_patched(spark, npstatq.events_mann_whitney, df)[0]
    assert r["u_stat"] == 8.0  # 4·4/2
    assert r["z"] == 0.0


def _ts_reference(series: list[tuple[int, float]]) -> float:
    slopes = sorted(
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(series)
        for (x2, y2) in series[i + 1 :]
    )
    n = len(slopes)
    # p·(n−1) linear interpolation at p=0.5 (Spark percentile /
    # DuckDB quantile_cont)
    pos = 0.5 * (n - 1)
    lo, hi = int(math.floor(pos)), int(math.ceil(pos))
    frac = pos - lo
    return slopes[lo] + (slopes[hi] - slopes[lo]) * frac


def _events_from_daily(spark, daily: list[tuple[str, float]]):
    return spark.createDataFrame(
        [
            (1, "click", f"{d} 12:00:00", v)
            for d, v in daily
        ],
        "user_id long, event_type string, ts string, value double",
    ).selectExpr(
        "user_id", "event_type", "CAST(ts AS TIMESTAMP) ts", "value"
    )


def test_theil_sen_hand_checked(spark):
    daily = [
        ("2024-01-01", 1.0),
        ("2024-01-02", 3.0),
        ("2024-01-03", 4.0),
        ("2024-01-05", 10.0),
    ]
    df = _events_from_daily(spark, daily)
    r = _run_patched(spark, npstatq.events_theil_sen_slope, df)[0]
    series = [(i, v) for i, (_, v) in enumerate(daily)]
    # rebuild with real day numbers (gap on Jan 4)
    series = [(0, 1.0), (1, 3.0), (2, 4.0), (4, 10.0)]
    assert (r["n_days"], r["n_pairs"]) == (4, 6)
    assert abs(r["theil_sen_slope"] - round(_ts_reference(series), 6)) < 1e-9


def _kendall_reference(series: list[tuple[int, float]]):
    c = d = ty = 0
    for i, (x1, y1) in enumerate(series):
        for x2, y2 in series[i + 1 :]:
            if y2 > y1:
                c += 1
            elif y2 < y1:
                d += 1
            else:
                ty += 1
    n0 = c + d + ty
    return c, d, (c - d) / math.sqrt(n0 * (n0 - ty))


def test_kendall_tau_hand_checked(spark):
    daily = [
        ("2024-01-01", 1.0),
        ("2024-01-02", 3.0),
        ("2024-01-03", 2.0),
        ("2024-01-04", 3.0),   # tie with day 2
        ("2024-01-06", 5.0),
    ]
    df = _events_from_daily(spark, daily)
    r = _run_patched(spark, npstatq.events_kendall_tau, df)[0]
    series = [(0, 1.0), (1, 3.0), (2, 2.0), (3, 3.0), (5, 5.0)]
    c, d, tau = _kendall_reference(series)
    assert (r["n_days"], r["concordant"], r["discordant"]) == (5, c, d)
    assert abs(r["tau_b"] - round(tau, 6)) < 1e-9


def test_kendall_tau_extremes(spark):
    # strictly increasing → τ = 1; strictly decreasing → τ = −1;
    # all-tied y → row filtered out (denominator would be 0)
    inc = [(f"2024-01-{d:02d}", float(d)) for d in range(1, 6)]
    assert _run_patched(
        spark, npstatq.events_kendall_tau, _events_from_daily(spark, inc)
    )[0]["tau_b"] == 1.0
    dec_ = [(f"2024-01-{d:02d}", float(10 - d)) for d in range(1, 6)]
    assert _run_patched(
        spark, npstatq.events_kendall_tau, _events_from_daily(spark, dec_)
    )[0]["tau_b"] == -1.0
    flat = [(f"2024-01-{d:02d}", 7.0) for d in range(1, 6)]
    assert (
        _run_patched(
            spark, npstatq.events_kendall_tau, _events_from_daily(spark, flat)
        )
        == []
    )


def test_seasonal_decompose_recovers_planted_weekly_pattern(spark):
    # 28 days of y = 100 + weekly effect (zero-sum): interior rows'
    # 7-day centered MA is exactly 100, so the dow seasonal estimates
    # recover the planted effects and the additive identity holds
    import datetime

    effects = [6.0, -2.0, 3.0, -4.0, 1.0, -5.0, 1.0]  # Σ = 0
    rows = []
    d0 = datetime.date(2024, 1, 1)
    for i in range(28):
        d = d0 + datetime.timedelta(days=i)
        y = 100.0 + effects[i % 7]
        rows.append((i, "click", f"{d} 12:00:00", y))
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string, value double"
    ).selectExpr(
        "user_id", "event_type", "CAST(ts AS TIMESTAMP) ts", "value"
    )
    out = _run_patched(spark, npstatq.events_seasonal_decompose, df)
    assert len(out) == 28
    for r in out:
        # additive identity up to the 1e-6 output rounding
        assert abs(r["y"] - (r["trend"] + r["seasonal"] + r["residual"])) < 3e-6
    interior = [r for r in out if "2024-01-04" <= r["d"] <= "2024-01-25"]
    for r in interior:
        assert abs(r["trend"] - 100.0) < 1e-6  # MA of zero-sum pattern
    # each dow's seasonal estimate near its planted effect (edge rows
    # bias the dow means slightly)
    got_eff = {}
    for r in out:
        dow_idx = (
            datetime.date.fromisoformat(r["d"]) - d0
        ).days % 7
        got_eff.setdefault(dow_idx, r["seasonal"])
    for i, eff in enumerate(effects):
        assert abs(got_eff[i] - eff) < 1.0, (i, got_eff[i], eff)


def test_theil_sen_robust_to_outlier_vs_ols(spark):
    # a clean slope-1 series with ONE wild day: the slope median moves
    # a little, the OLS slope is dragged far more
    clean = [(f"2024-01-{d:02d}", float(d)) for d in range(1, 11)]
    spiked = clean[:-1] + [("2024-01-10", 1000.0)]
    df = _events_from_daily(spark, spiked)
    r = _run_patched(spark, npstatq.events_theil_sen_slope, df)[0]
    ts_slope = r["theil_sen_slope"]
    series = [(d - 1, v) for d, (_, v) in enumerate(spiked, start=1)]
    xs = [x for x, _ in series]
    ys = [y for _, y in series]
    n = len(xs)
    xbar, ybar = sum(xs) / n, sum(ys) / n
    ols = sum((x - xbar) * (y - ybar) for x, y in series) / sum(
        (x - xbar) ** 2 for x in xs
    )
    assert abs(ts_slope - 1.0) < 2.0  # near the clean slope
    assert ols > 50.0  # OLS dragged by the outlier
    assert abs(ts_slope - 1.0) < abs(ols - 1.0) / 10


def _events_frame(spark, rows):
    """rows: (event_type, ts_string, value)."""
    return spark.createDataFrame(
        [(i, t_, ts, v) for i, (t_, ts, v) in enumerate(rows)],
        "user_id long, event_type string, ts string, value double",
    ).selectExpr(
        "user_id", "event_type", "CAST(ts AS TIMESTAMP) ts", "value"
    )


def test_ks_hand_checked(spark):
    # click = {1,2,3,4}, view = {3,4,5,6}: pooled values 1..6,
    # ECDF gap maxes at v=2: |2/4 - 0/4| = 0.5  → d_num = 2*4 - 0*4 = 8
    rows = [("click", "2024-01-01 00:00:00", float(v)) for v in (1, 2, 3, 4)]
    rows += [("view", "2024-01-01 00:00:00", float(v)) for v in (3, 4, 5, 6)]
    r = _run_patched(spark, npstatq.events_ks_test, _events_frame(spark, rows))[0]
    assert (r["n_a"], r["n_b"]) == (4, 4)
    assert r["d_num"] == 8
    assert abs(r["d_stat"] - 0.5) < 1e-12
    # critical value at n=4/4 is 1.3581·sqrt(8/16) ≈ 0.960 → no reject
    assert not r["reject_05"]


def test_ks_identical_samples_is_zero(spark):
    rows = [(t_, "2024-01-01 00:00:00", float(v))
            for t_ in ("click", "view") for v in (1, 2, 2, 7)]
    r = _run_patched(spark, npstatq.events_ks_test, _events_frame(spark, rows))[0]
    assert r["d_num"] == 0 and r["d_stat"] == 0.0 and not r["reject_05"]


def test_ks_disjoint_samples_reject(spark):
    # fully separated samples → D = 1; with n=40/40 the 0.05 critical
    # value is 1.3581·sqrt(80/1600) ≈ 0.304 → reject
    rows = [("click", "2024-01-01 00:00:00", float(v)) for v in range(40)]
    rows += [("view", "2024-01-01 00:00:00", float(v + 100)) for v in range(40)]
    r = _run_patched(spark, npstatq.events_ks_test, _events_frame(spark, rows))[0]
    assert abs(r["d_stat"] - 1.0) < 1e-12
    assert r["reject_05"]


def _spearman_reference(xs, ys):
    def midranks(vals):
        s = sorted(range(len(vals)), key=lambda i: vals[i])
        out = [0.0] * len(vals)
        i = 0
        while i < len(vals):
            j = i
            while j < len(vals) and vals[s[j]] == vals[s[i]]:
                j += 1
            mid = (i + 1 + j) / 2.0
            for k in range(i, j):
                out[s[k]] = mid
            i = j
        return out
    rx, ry = midranks(xs), midranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(sum((a - mx) ** 2 for a in rx)) * math.sqrt(
        sum((b - my) ** 2 for b in ry)
    )
    return num / den


def test_spearman_hand_checked_with_ties(spark):
    # 6 days: click counts [1,2,2,3,5,4], purchase [2,1,3,3,4,6]
    days = ["2024-01-0%d 00:00:00" % d for d in range(1, 7)]
    clicks = [1, 2, 2, 3, 5, 4]
    purchases = [2, 1, 3, 3, 4, 6]
    rows = []
    for d, c, p in zip(days, clicks, purchases):
        rows += [("click", d, 1.0)] * c + [("purchase", d, 1.0)] * p
    r = _run_patched(
        spark, npstatq.events_spearman_daily, _events_frame(spark, rows)
    )[0]
    assert r["n_days"] == 6
    ref = _spearman_reference(clicks, purchases)
    assert abs(r["rho"] - round(ref, 9)) < 1e-9


def test_spearman_perfect_monotone(spark):
    days = ["2024-01-0%d 00:00:00" % d for d in range(1, 6)]
    rows = []
    for i, d in enumerate(days):
        rows += [("click", d, 1.0)] * (i + 1) + [("purchase", d, 1.0)] * (
            2 * i + 1
        )
    r = _run_patched(
        spark, npstatq.events_spearman_daily, _events_frame(spark, rows)
    )[0]
    assert abs(r["rho"] - 1.0) < 1e-12
    # |rho| = 1 makes the t denominator 0: the degenerate t is an
    # explicit NULL (identically in the DuckDB oracle), never Infinity
    assert r["t_stat"] is None


def test_chi2_hand_checked(spark):
    # 2 types × 2 dows: obs = [[10, 20], [20, 10]] — χ² =
    # Σ(o−e)²/e with e = 15 everywhere → 4·(25/15) = 6.666666667
    # 2024-01-01 is a Monday, 2024-01-02 a Tuesday
    rows = []
    rows += [("click", "2024-01-01 00:00:00", 1.0)] * 10
    rows += [("click", "2024-01-02 00:00:00", 1.0)] * 20
    rows += [("view", "2024-01-01 00:00:00", 1.0)] * 20
    rows += [("view", "2024-01-02 00:00:00", 1.0)] * 10
    r = _run_patched(
        spark, npstatq.events_chi2_independence, _events_frame(spark, rows)
    )[0]
    assert (r["n_rows"], r["n_types"], r["n_dows"], r["df"]) == (60, 2, 2, 1)
    assert abs(r["chi2"] - round(60 * (100 / 900), 9)) < 1e-9


def test_chi2_independent_uniform_is_zero(spark):
    rows = []
    for t_ in ("click", "view", "error"):
        for d in ("2024-01-01 00:00:00", "2024-01-02 00:00:00"):
            rows += [(t_, d, 1.0)] * 7
    r = _run_patched(
        spark, npstatq.events_chi2_independence, _events_frame(spark, rows)
    )[0]
    assert r["chi2"] == 0.0
    assert r["df"] == 2


def _orders_frame(spark, rows):
    """rows: (o_custkey, o_totalprice)."""
    return spark.createDataFrame(
        [(i, ck, "O", tp, "2024-01-01 00:00:00", "1-URGENT")
         for i, (ck, tp) in enumerate(rows)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate AS TIMESTAMP) o_orderdate", "o_orderpriority"
    )


def _cusum_reference(xs):
    """Python twin of the scaled recursion: S_t = max(0, S_{t-1} +
    (x_t - mu - mu/10)), alarm when S_t > 2*mu."""
    n, s1 = len(xs), sum(xs)
    s_scaled, out = 0, []
    for x in xs:
        s_scaled = max(0, s_scaled + 10 * n * x - 11 * s1)
        out.append((s_scaled / (10.0 * n), s_scaled > 20 * s1))
    return out


def test_cusum_planted_step_alarms(spark):
    xs = [10] * 10 + [30] * 10
    rows = []
    for i, x in enumerate(xs):
        day = "2024-01-%02d 00:00:00" % (i + 1)
        rows += [("click", day, 1.0)] * x
    got = sorted(
        _run_patched(spark, npstatq.events_cusum_daily,
                     _events_frame(spark, rows)),
        key=lambda r: r["day"],
    )
    ref = _cusum_reference(xs)
    assert len(got) == 20
    for r, (cus, alarm) in zip(got, ref):
        assert abs(r["cusum"] - round(cus, 9)) < 1e-9
        assert r["is_alarm"] == alarm
    # the step must actually fire the alarm, and never before the step
    assert not any(r["is_alarm"] for r in got[:10])
    assert any(r["is_alarm"] for r in got[10:])


def test_cusum_steady_series_never_alarms(spark):
    rows = []
    for i in range(14):
        rows += [("view", "2024-01-%02d 00:00:00" % (i + 1), 1.0)] * 5
    got = _run_patched(
        spark, npstatq.events_cusum_daily, _events_frame(spark, rows)
    )
    assert all(not r["is_alarm"] for r in got)
    assert all(r["cusum"] == 0.0 for r in got)  # x == mu ⇒ dev < 0


def _run_patched_orders(spark, fn, df):
    orig = npstatq.t
    try:
        npstatq.t = lambda s, sf, name: df  # noqa: ARG005
        return fn(spark, "unused").collect()
    finally:
        npstatq.t = orig


def test_gini_extremes(spark):
    # equal spends → G = 0
    r = _run_patched_orders(
        spark, npstatq.orders_gini_concentration,
        _orders_frame(spark, [(c, 100.0) for c in range(10)]),
    )[0]
    assert r["n_customers"] == 10 and r["gini"] == 0.0
    assert abs(r["total_spend"] - 1000.0) < 1e-9
    # one whale holds everything above epsilon → G → (n-1)/n with the
    # exact-cents floor: hand value for w = [1 cent ×9, 10^6 cents]
    rows = [(c, 0.01) for c in range(9)] + [(9, 10000.0)]
    r = _run_patched_orders(
        spark, npstatq.orders_gini_concentration, _orders_frame(spark, rows)
    )[0]
    w = [1] * 9 + [1000000]
    siw = sum((i + 1) * wi for i, wi in enumerate(w))
    n, sw = 10, sum(w)
    ref = (2 * siw - (n + 1) * sw) / (n * sw)
    assert abs(r["gini"] - round(ref, 9)) < 1e-12


def test_benford_hand_checked(spark):
    import math as _m

    # 30 orders with first digit 1, 10 with first digit 2
    rows = [(c, 1.23) for c in range(30)] + [(c, 25.00) for c in range(10)]
    got = _run_patched_orders(
        spark, npstatq.orders_benford_audit, _orders_frame(spark, rows)
    )
    by_digit = {r["digit"]: r for r in got}
    assert set(by_digit) == {1, 2}
    assert by_digit[1]["observed"] == 30 and by_digit[2]["observed"] == 10
    n = 40
    p = [_m.log10(1 + 1 / d) for d in range(1, 10)]
    o = [30, 10] + [0] * 7
    ref = sum((oi - n * pi) ** 2 / (n * pi) for oi, pi in zip(o, p))
    assert abs(got[0]["chi2"] - round(ref, 9)) < 1e-6
    assert abs(by_digit[1]["expected"] - round(n * p[0], 6)) < 1e-9
    # digits {1,2} only out of 40 draws is wildly non-Benford
    assert got[0]["reject_05"]


def test_jsd_hand_checked_vs_full_vocab_reference(spark):
    # two tiny sources with known unigram distributions: the query's
    # closed-form out-of-vocabulary remainder must reproduce the FULL
    # per-word JSD definition computed directly in Python
    import math as _m

    from rick_and_morty_data_pipeline_project_spark.queries import textq

    docs = [
        (1, "a a a b", "en", "s1", 7),
        (2, "b c", "en", "s2", 3),
        (3, "c c d", "en", "s2", 5),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    orig = textq.t
    try:
        textq.t = lambda s, sf, name: df  # noqa: ARG005
        got = {
            r["source"]: r
            for r in textq.text_js_divergence_sources(spark, "x").collect()
        }
    finally:
        textq.t = orig

    corpus = {"a": 3, "b": 2, "c": 3, "d": 1}
    n = sum(corpus.values())

    def jsd_full(src_counts):
        ns = sum(src_counts.values())
        out = 0.0
        for w, cw in corpus.items():
            p = src_counts.get(w, 0) / ns
            q = cw / n
            m = (p + q) / 2.0
            if p > 0:
                out += 0.5 * p * _m.log(p / m)
            out += 0.5 * q * _m.log(q / m)
        return out

    for src, counts in (
        ("s1", {"a": 3, "b": 1}),
        ("s2", {"b": 1, "c": 3, "d": 1}),
    ):
        r = got[src]
        ref = jsd_full(counts)
        assert abs(r["jsd_nats"] - round(ref, 6)) < 1e-6, (src, ref, r)
        cov = sum(corpus[w] for w in counts) / n
        assert abs(r["coverage"] - round(cov, 9)) < 1e-12
        assert abs(r["jsd_bits"] - round(ref / _m.log(2), 6)) < 2e-6
    # identical-to-corpus distribution ⇒ JSD → 0; disjointness raises
    # it — s2 (covers 6/9 mass) must sit below a fully disjoint bound
    assert 0.0 < got["s1"]["jsd_nats"] < _m.log(2)
    assert 0.0 < got["s2"]["jsd_nats"] < _m.log(2)
