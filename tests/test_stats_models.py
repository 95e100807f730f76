"""Property-based tests for operators/stats.py against pure-Python
brute-force models — the nonparametric-test algebra behind
agg_kruskal_wallis, events_mann_kendall_trend, and agg_runs_test,
checked on arbitrary hypothesis-generated data independent of the
fixture tables (the tests/test_mining.py discipline). Python floats
ARE IEEE doubles, so the models reproduce the engines' ppm-floored
expressions bit-for-bit when given the same integers.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _model_kruskal(pairs):
    """(group, value) pairs -> (n_total, n_groups, tie_sum, h_ppm)."""
    from collections import Counter

    vals = Counter(v for _, v in pairs)
    n = len(pairs)
    # doubled midrank per distinct value
    mr2 = {}
    cum = 0
    for v in sorted(vals):
        mr2[v] = 2 * cum + vals[v] + 1
        cum += vals[v]
    groups = {}
    for g, v in pairs:
        r2, nj = groups.get(g, (0, 0))
        groups[g] = (r2 + mr2[v], nj + 1)
    hnum = sum(math.floor(r2 * r2 / (4.0 * nj)) for r2, nj in groups.values())
    tie_sum = sum(t * t * t - t for t in vals.values())
    h_ppm = math.floor(
        1000000.0
        * (
            (12.0 * hnum / (n * (n + 1.0)) - 3.0 * (n + 1.0))
            / (1.0 - tie_sum / float(n * n * n - n))
        )
    )
    return (n, len(groups), tie_sum, h_ppm)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=4,
        max_size=40,
    ).filter(
        lambda ps: len({g for g, _ in ps}) >= 2
        and len({v for _, v in ps}) >= 2  # tie correction defined
    )
)
def test_kruskal_wallis_matches_model(spark, pairs):
    from postrack_spark.operators.stats import kruskal_wallis

    df = spark.createDataFrame(
        [(g, v) for g, v in pairs], "grp string, x long"
    )
    row = kruskal_wallis(df, "grp", "x").collect()[0]
    assert (
        row["n_total"],
        row["n_groups"],
        row["tie_sum"],
        row["h_ppm"],
    ) == _model_kruskal(pairs)


def _model_mann_kendall(series):
    """[(t, v)] ordered pairs -> (n, s, varnum18, z_ppm)."""
    from collections import Counter

    n = len(series)
    vs = [v for _, v in sorted(series)]
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += (vs[j] > vs[i]) - (vs[j] < vs[i])
    tie18 = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(vs).values()
    )
    varnum18 = n * (n - 1) * (2 * n + 5) - tie18
    if s == 0:
        z = 0
    else:
        adj = s - 1 if s > 0 else s + 1
        z = math.floor(1000000.0 * float(adj) / math.sqrt(varnum18 / 18.0))
    return (n, s, varnum18, z)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.integers(min_value=0, max_value=9), min_size=3, max_size=25)
)
def test_mann_kendall_matches_model(spark, values):
    from postrack_spark.operators.stats import mann_kendall

    series = list(enumerate(values))
    df = spark.createDataFrame(
        [("k", t, v) for t, v in series], "key string, d long, c long"
    )
    row = mann_kendall(df, "key", "d", "c").collect()[0]
    got = (row["n_days"], row["s_stat"], row["varnum18"], row["z_ppm"])
    want = _model_mann_kendall(series)
    # all-tied series: varnum18 == 0 and s == 0 -> z defined as 0
    assert got == want


def _model_runs(values):
    """ordered values -> (n, n_above, n_below, runs, z_ppm or None)."""
    n = len(values)
    med = sorted(values)[(n + 1) // 2 - 1]  # type-1 lower median
    above = [1 if v > med else 0 for v in values]
    runs = 1 + sum(1 for i in range(n - 1) if above[i] != above[i + 1])
    n1, n2 = sum(above), n - sum(above)
    num = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n)
    den = float(n) * n * (n - 1.0)
    var = num / den
    mean = 1.0 + 2.0 * n1 * n2 / n
    if var > 0:
        z = math.floor(1000000.0 * (runs - mean) / math.sqrt(var))
    else:
        z = None  # sqrt(<=0) -> NaN/inf path; skip exact compare
    return (n, n1, n2, runs, z)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.integers(min_value=0, max_value=6), min_size=3, max_size=30)
)
def test_runs_test_matches_model(spark, values):
    from postrack_spark.operators.stats import runs_test

    df = spark.createDataFrame(
        [(t, v) for t, v in enumerate(values)], "d long, c long"
    )
    row = runs_test(df, "d", "c").collect()[0]
    n, n1, n2, runs, z = _model_runs(values)
    assert (row["n_days"], row["n_above"], row["n_below"], row["runs"]) == (
        n,
        n1,
        n2,
        runs,
    )
    if z is not None:
        assert row["z_ppm"] == z
    else:
        assert row["z_ppm"] is None  # degenerate dichotomy -> NULL


def _model_mann_whitney(pairs):
    """(group, value) pairs with exactly two groups -> the operator's
    (grp_a, grp_b, n_a, n_b, u_a_x2, u_b_x2, tie_sum) row."""
    from collections import Counter

    vals = Counter(v for _, v in pairs)
    mr2 = {}
    cum = 0
    for v in sorted(vals):
        mr2[v] = 2 * cum + vals[v] + 1
        cum += vals[v]
    ga, gb = sorted({g for g, _ in pairs})
    r2 = {ga: 0, gb: 0}
    n = {ga: 0, gb: 0}
    for g, v in pairs:
        r2[g] += mr2[v]
        n[g] += 1
    return (
        ga, gb, n[ga], n[gb],
        r2[ga] - n[ga] * (n[ga] + 1),
        r2[gb] - n[gb] * (n[gb] + 1),
        sum(t * t * t - t for t in vals.values()),
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 8)),
        min_size=2,
        max_size=40,
    ).filter(lambda ps: len({g for g, _ in ps}) == 2)
)
def test_mann_whitney_matches_model(spark, pairs):
    from postrack_spark.operators.stats import mann_whitney_u

    df = spark.createDataFrame(pairs, "g string, v long")
    row = mann_whitney_u(df, "g", "v").collect()[0]
    ga, gb, na, nb, ua, ub, tie = _model_mann_whitney(pairs)
    assert (row["grp_a"], row["grp_b"]) == (ga, gb)
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert (row["u_a_x2"], row["u_b_x2"]) == (ua, ub)
    assert row["tie_sum"] == tie
    # the classic identity, doubled: U_a + U_b == n_a * n_b
    assert row["u_a_x2"] + row["u_b_x2"] == 2 * na * nb


def _model_jonckheere(pairs, order):
    """(group, value) pairs + ordered group list -> (jt_x2, e_jt_x2,
    n_total), by brute-force pair enumeration."""
    obs = [(g, v) for g, v in pairs if g in order]
    idx = {g: i for i, g in enumerate(order)}
    jt2 = 0
    for ga, va in obs:
        for gb, vb in obs:
            if idx[ga] < idx[gb]:
                jt2 += 2 if va < vb else (1 if va == vb else 0)
    sizes = {}
    for g, _ in obs:
        sizes[g] = sizes.get(g, 0) + 1
    e2 = sum(
        sizes.get(order[i], 0) * sizes.get(order[j], 0)
        for i in range(len(order))
        for j in range(i + 1, len(order))
    )
    return jt2, e2, len(obs)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 6)),
        min_size=0,
        max_size=30,
    )
)
def test_jonckheere_matches_model(spark, pairs):
    from postrack_spark.operators.stats import jonckheere_trend

    order = ["a", "b", "c"]
    df = spark.createDataFrame(
        pairs or [("z", 0)], "g string, v long")  # 'z' filtered out
    row = jonckheere_trend(df, "g", order, "v").collect()
    jt2, e2, n = _model_jonckheere(pairs, order)
    if not [p for p in pairs if p[0] in order]:
        # empty observation set: the aggregate yields NULL sums -> treat
        # the single all-null row as zero
        assert row == [] or row[0]["n_total"] in (0, None)
        return
    assert (row[0]["jt_x2"], row[0]["e_jt_x2"], row[0]["n_total"]) == (jt2, e2, n)


def _model_cliffs(pairs):
    """Brute-force pairwise Cliff's delta: delta_num_x2 =
    2*(#(a<b) - #(a>b)), denom_x2 = 2*n_a*n_b."""
    ga, gb = sorted({g for g, _ in pairs})
    av = [v for g, v in pairs if g == ga]
    bv = [v for g, v in pairs if g == gb]
    lt = sum(1 for x in av for y in bv if x < y)
    gt = sum(1 for x in av for y in bv if x > y)
    return ga, gb, len(av), len(bv), 2 * (lt - gt), 2 * len(av) * len(bv)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 8)),
        min_size=2,
        max_size=40,
    ).filter(lambda ps: len({g for g, _ in ps}) == 2)
)
def test_cliffs_delta_matches_bruteforce(spark, pairs):
    """The doubled-U identity (delta_num_x2 = u_a_x2 - u_b_x2) must
    equal literal pair counting — this is the whole claim of the
    rank-based shortcut."""
    from postrack_spark.operators.stats import cliffs_delta

    df = spark.createDataFrame(pairs, "g string, v long")
    row = cliffs_delta(df, "g", "v").collect()[0]
    ga, gb, na, nb, num, den = _model_cliffs(pairs)
    assert (row["grp_a"], row["grp_b"], row["n_a"], row["n_b"]) == (ga, gb, na, nb)
    assert (row["delta_num_x2"], row["denom_x2"]) == (num, den)
    assert abs(row["delta_num_x2"]) <= row["denom_x2"]  # |delta| <= 1


def _model_ansari(pairs):
    """Brute-force Ansari-Bradley with doubled midrank scores."""
    from collections import Counter

    vals = Counter(v for _, v in pairs)
    n_total = len(pairs)
    mr2 = {}
    cum = 0
    for v in sorted(vals):
        mr2[v] = 2 * cum + vals[v] + 1
        cum += vals[v]
    s2 = {v: min(m, 2 * (n_total + 1) - m) for v, m in mr2.items()}
    ga, gb = sorted({g for g, _ in pairs})
    ab = sum(s2[v] for g, v in pairs if g == ga)
    s2_total = sum(s2[v] for _, v in pairs)
    s4_total = sum(s2[v] ** 2 for _, v in pairs)
    na = sum(1 for g, _ in pairs if g == ga)
    nb = n_total - na
    return ga, gb, na, nb, ab, s2_total, s4_total, n_total


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 8)),
        min_size=2,
        max_size=40,
    ).filter(lambda ps: len({g for g, _ in ps}) == 2)
)
def test_ansari_bradley_matches_bruteforce(spark, pairs):
    from postrack_spark.operators.stats import ansari_bradley

    df = spark.createDataFrame(pairs, "g string, v long")
    row = ansari_bradley(df, "g", "v").collect()[0]
    ga, gb, na, nb, ab, s2t, s4t, nt = _model_ansari(pairs)
    assert (row["grp_a"], row["grp_b"], row["n_a"], row["n_b"]) == (ga, gb, na, nb)
    assert (row["ab_x2"], row["s2_total"], row["s4_total"], row["n_total"]) == (
        ab, s2t, s4t, nt)


def _model_somers(pairs):
    """Literal O(n^2) concordance count for Somers' D_yx."""
    c = sum(1 for (x1, y1) in pairs for (x2, y2) in pairs
            if x1 < x2 and y1 < y2)
    d = sum(1 for (x1, y1) in pairs for (x2, y2) in pairs
            if x1 < x2 and y1 > y2)
    n = len(pairs)
    from collections import Counter

    margins = Counter(x for x, _ in pairs)
    den = n * n - sum(m * m for m in margins.values())
    return c, d, c - d, den, n


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 5)),
        min_size=1,
        max_size=40,
    )
)
def test_somers_d_matches_bruteforce(spark, pairs):
    from postrack_spark.operators.stats import somers_d

    df = spark.createDataFrame(pairs, "x long, y long")
    row = somers_d(df, "x", "y").collect()[0]
    c, d, num, den, n = _model_somers(pairs)
    assert (row["concordant"], row["discordant"]) == (c, d)
    assert (row["d_num"], row["d_den_x2"], row["n_total"]) == (num, den, n)
    assert abs(row["d_num"]) * 2 <= row["d_den_x2"] or row["d_den_x2"] == 0


def _model_cochran_armitage(pairs):
    """Brute-force CA pieces from (dose, success) pairs."""
    n_total = len(pairs)
    r_total = sum(s for _, s in pairs)
    s1 = sum(d for d, _ in pairs)
    s2 = sum(d * d for d, _ in pairs)
    wr = sum(d * s for d, s in pairs)
    return n_total * wr - r_total * s1, r_total, n_total, s1, s2


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 1)),
        min_size=1,
        max_size=40,
    )
)
def test_cochran_armitage_matches_bruteforce(spark, pairs):
    from postrack_spark.operators.stats import cochran_armitage

    df = spark.createDataFrame(pairs, "d long, s long")
    row = cochran_armitage(df, "d", "s").collect()[0]
    t, r, n, s1, s2 = _model_cochran_armitage(pairs)
    assert (row["t_num"], row["r_total"], row["n_total"],
            row["s1"], row["s2"]) == (t, r, n, s1, s2)


def _model_ks_two_sample(pairs):
    """(group, value) pairs -> (grp_a, grp_b, n_a, n_b, d_plus, d_minus,
    d_num, v_num) by brute-force ECDF enumeration."""
    labels = sorted({g for g, _ in pairs})
    ga = labels[0] if labels else None
    gb = labels[-1] if labels else None
    a = [v for g, v in pairs if g == ga]
    b = [v for g, v in pairs if g == gb and gb != ga]
    na, nb = len(a), len(b)
    if na * nb == 0:
        return ga, gb, na, nb, None, None, None, None
    vals = sorted(set(a) | set(b))
    gaps = []
    for v in vals:
        cum_a = sum(1 for x in a if x <= v)
        cum_b = sum(1 for x in b if x <= v)
        gaps.append(cum_a * nb - cum_b * na)
    d_plus = max(gaps)
    d_minus = max(-g for g in gaps)
    return ga, gb, na, nb, d_plus, d_minus, max(d_plus, d_minus), d_plus + d_minus


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 8)),
        min_size=0,
        max_size=40,
    )
)
def test_ks_two_sample_matches_model(spark, pairs):
    from postrack_spark.operators.stats import ks_two_sample

    df = spark.createDataFrame(pairs, "g string, v long")
    row = ks_two_sample(df, "g", "v").collect()[0]
    ga, gb, na, nb, dp, dm, dn, vn = _model_ks_two_sample(pairs)
    assert (row["grp_a"], row["grp_b"]) == (ga, gb)
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert (row["d_plus_num"], row["d_minus_num"]) == (dp, dm)
    assert (row["d_num"], row["v_num"]) == (dn, vn)
    if dn is not None:
        # sup of |F_A - F_B| is bounded by 1, i.e. d_num <= n_a*n_b,
        # and Kuiper's V is bounded by 2*D
        assert 0 <= dn <= na * nb
        assert dn <= vn <= 2 * dn
