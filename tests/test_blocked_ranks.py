"""Independent pure-Python models for the blocked-rank family
(agg_friedman_test, agg_page_trend_test, events_cochran_q,
events_permutation_patterns) computed straight from the parquet with
pandas/numpy — a THIRD implementation next to the Spark query and the
DuckDB oracle, so a semantics bug shared by both engines' SQL (the
4-4-5 lesson: the gate blesses an oracle that encodes the same
mistake) cannot pass silently. Python floats are IEEE doubles, so the
ppm-floored expressions reproduce bit-for-bit given the same integers.
"""

from __future__ import annotations

import math
import os

import pandas as pd

from tests.conftest import SF_DIR

_EV_TYPES = ["click", "error", "purchase", "signup", "view"]


def _events() -> pd.DataFrame:
    df = pd.read_parquet(os.path.join(SF_DIR, "events.parquet"))
    # pandas' int64 view of ts is ns or us depending on the stored unit;
    # pin to micros explicitly before the epoch-day division
    us = df["ts"].astype("datetime64[us]").astype("int64")
    df["day"] = us // 86400000000
    return df


def _block_midranks(ev: pd.DataFrame) -> tuple[dict, int]:
    """(day, type) -> doubled midrank of the 0-filled count grid."""
    counts = ev.groupby(["day", "event_type"]).size()
    days = sorted(ev["day"].unique())
    mr2 = {}
    for d in days:
        cells = [(counts.get((d, g), 0), g) for g in _EV_TYPES]
        for c, g in cells:
            below = sum(1 for c2, _ in cells if c2 < c)
            ties = sum(1 for c2, _ in cells if c2 == c)
            mr2[(d, g)] = 2 * (below + 1) + ties - 1
    return mr2, len(days)


def test_friedman_model_matches_query(spark):
    ev = _events()
    mr2, n = _block_midranks(ev)
    k = len(_EV_TYPES)
    r2 = {g: sum(v for (d, gg), v in mr2.items() if gg == g) for g in _EV_TYPES}
    s_r2sq = sum(v * v for v in r2.values())
    a2 = sum(v * v for v in mr2.values())
    den = a2 - n * k * (k + 1) * (k + 1)
    num = s_r2sq - n * n * k * (k + 1) * (k + 1)
    expect = None if den == 0 else math.floor(1000000.0 * (k - 1) * num / den)

    from postrack_spark.queries.registry import load_all

    row = load_all()["agg_friedman_test"].fn(spark, SF_DIR).collect()[0]
    assert row["n_days"] == n
    assert row["sum_r2_sq"] == s_r2sq
    assert row["sum_mr2_sq"] == a2
    assert row["friedman_ppm"] == expect


def test_page_model_matches_query(spark):
    ev = _events()
    mr2, n = _block_midranks(ev)
    k = len(_EV_TYPES)
    r2 = {g: sum(v for (d, gg), v in mr2.items() if gg == g) for g in _EV_TYPES}
    l2 = sum(j * r2[g] for j, g in enumerate(_EV_TYPES, start=1))
    e_l2 = n * k * (k + 1) * (k + 1) // 2
    z = math.floor(
        1000000.0
        * (l2 - e_l2)
        / (2.0 * math.sqrt(n * k * k * (k + 1) * (k * k - 1) / 144.0))
    )

    from postrack_spark.queries.registry import load_all

    row = load_all()["agg_page_trend_test"].fn(spark, SF_DIR).collect()[0]
    assert (row["l2"], row["e_l2"], row["page_z_ppm"]) == (l2, e_l2, z)


def test_cochran_q_model_matches_query(spark):
    ev = _events()
    pu = ev[["user_id", "event_type"]].drop_duplicates()
    k = len(_EV_TYPES)
    rows = pu.groupby("user_id").size()
    cols = pu.groupby("event_type").size()
    n_succ = len(pu)
    s_rowsq = int((rows * rows).sum())
    s_dev = sum(int(k * cols.get(g, 0) - n_succ) ** 2 for g in _EV_TYPES)
    den = k * n_succ - s_rowsq
    expect = (
        None
        if den == 0
        else math.floor(1000000.0 * (k - 1) * s_dev / (k * den))
    )

    from postrack_spark.queries.registry import load_all

    row = load_all()["events_cochran_q"].fn(spark, SF_DIR).collect()[0]
    assert row["n_users"] == len(rows)
    assert row["n_succ"] == n_succ
    assert row["s_rowsq"] == s_rowsq
    assert row["cochran_q_ppm"] == expect


def test_permutation_patterns_model_matches_query(spark):
    ev = _events()
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    daily = ev.groupby("day")["cents"].sum().sort_index()
    pats: dict[int, int] = {}
    by_pane: dict[int, list[int]] = {}
    for day, c in daily.items():
        by_pane.setdefault(day // 30, []).append(int(c))
    for vals in by_pane.values():
        for i in range(len(vals) - 2):
            c0, c1, c2 = vals[i : i + 3]
            r0 = (c0 > c1) + (c0 > c2)
            r1 = (c1 >= c0) + (c1 > c2)
            r2 = (c2 >= c0) + (c2 >= c1)
            p = r0 * 100 + r1 * 10 + r2
            pats[p] = pats.get(p, 0) + 1

    from postrack_spark.queries.registry import load_all

    got = {
        r["pattern"]: r["n_triples"]
        for r in load_all()["events_permutation_patterns"].fn(spark, SF_DIR).collect()
    }
    assert got == pats
    # every pattern is a full permutation encoding
    assert set(got) <= {12, 21, 102, 120, 201, 210}


def test_kendalls_w_model_matches_query(spark):
    ev = _events()
    mr2, n = _block_midranks(ev)
    k = len(_EV_TYPES)
    r2 = {g: sum(v for (d, gg), v in mr2.items() if gg == g) for g in _EV_TYPES}
    s4 = sum((v - n * (k + 1)) ** 2 for v in r2.values())
    counts = ev.groupby(["day", "event_type"]).size()
    tie_sum = 0
    for d in sorted(ev["day"].unique()):
        cells = [counts.get((d, g), 0) for g in _EV_TYPES]
        from collections import Counter

        for t in Counter(cells).values():
            tie_sum += t * t * t - t
    den = n * n * k * (k * k - 1) - n * tie_sum
    expect = None if den == 0 else math.floor(1000000.0 * 3 * s4 / den)

    from postrack_spark.queries.registry import load_all

    row = load_all()["agg_kendalls_w"].fn(spark, SF_DIR).collect()[0]
    assert (row["s4"], row["tie_sum"], row["w_ppm"]) == (s4, tie_sum, expect)
    # identity: Friedman chi2 == b(k-1)W (both tie-corrected) — check the
    # untruncated rationals agree, not the independently-floored ppms
    f = load_all()["agg_friedman_test"].fn(spark, SF_DIR).collect()[0]
    if expect is not None and f["friedman_ppm"] is not None:
        w = 3.0 * s4 / den
        chi2 = (
            (k - 1)
            * (f["sum_r2_sq"] - n * n * k * (k + 1) * (k + 1))
            / (f["sum_mr2_sq"] - n * k * (k + 1) * (k + 1))
        )
        assert abs(chi2 - n * (k - 1) * w) < 1e-9 * max(1.0, abs(chi2))


def test_quade_model_matches_query(spark):
    ev = _events()
    mr2, n = _block_midranks(ev)
    k = len(_EV_TYPES)
    counts = ev.groupby(["day", "event_type"]).size()
    days = sorted(ev["day"].unique())
    rngs = {}
    for d in days:
        cells = [counts.get((d, g), 0) for g in _EV_TYPES]
        rngs[d] = max(cells) - min(cells)
    # doubled midranks of block ranges
    from collections import Counter

    rc = Counter(rngs.values())
    q2 = {}
    cum = 0
    for v in sorted(rc):
        q2[v] = 2 * cum + rc[v] + 1
        cum += rc[v]
    terms = {
        (d, g): q2[rngs[d]] * (mr2[(d, g)] - (k + 1))
        for d in days
        for g in _EV_TYPES
    }
    s4 = {g: sum(terms[(d, g)] for d in days) for g in _EV_TYPES}
    sum_s4_sq = sum(v * v for v in s4.values())
    a16 = sum(v * v for v in terms.values())
    den = n * a16 - sum_s4_sq
    expect = None if den == 0 else math.floor(1000000.0 * (n - 1) * sum_s4_sq / den)

    from postrack_spark.queries.registry import load_all

    row = load_all()["agg_quade_test"].fn(spark, SF_DIR).collect()[0]
    assert (row["sum_s4_sq"], row["a16"], row["quade_f_ppm"]) == (
        sum_s4_sq, a16, expect)
    # per-block signed deviations sum to zero, so every S4_j summing over
    # all types must cancel: sum_j S4_j == 0
    assert sum(s4.values()) == 0


def test_wilcoxon_signed_rank_model_matches_query(spark):
    ev = _events()
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    ev["s"] = us // 1000000
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    mid = (int(ev["s"].min()) + int(ev["s"].max())) // 2
    g = ev.groupby("user_id")
    c1 = g.apply(lambda x: int(x.loc[x["s"] <= mid, "cents"].sum()))
    c2 = g.apply(lambda x: int(x.loc[x["s"] > mid, "cents"].sum()))
    d = (c2 - c1)[lambda s: s != 0]
    from collections import Counter

    vals = Counter(abs(int(v)) for v in d)
    mr2 = {}
    cum = 0
    for v in sorted(vals):
        mr2[v] = 2 * cum + vals[v] + 1
        cum += vals[v]
    w_plus = sum(mr2[abs(int(v))] for v in d if v > 0)
    w_minus = sum(mr2[abs(int(v))] for v in d if v < 0)
    n = len(d)

    from postrack_spark.queries.registry import load_all

    row = load_all()["agg_wilcoxon_signed_rank"].fn(spark, SF_DIR).collect()[0]
    assert (row["n_nonzero"], row["w_plus_x2"], row["w_minus_x2"]) == (
        n, w_plus, w_minus)
    assert row["w_plus_x2"] + row["w_minus_x2"] == n * (n + 1)


def test_siegel_tukey_model_matches_query(spark):
    orders = pd.read_parquet(os.path.join(SF_DIR, "orders.parquet"))
    base = orders[orders["o_orderstatus"].isin(["F", "O"])].copy()
    base["cents"] = (base["o_totalprice"] * 100).round().astype("int64")
    base = base.sort_values(["cents", "o_orderkey"]).reset_index(drop=True)
    n = len(base)

    def st_rank(rn):  # 1-based
        d_front, d_back = rn - 1, n - rn
        if d_front == d_back:
            return n  # odd-n middle: the always-valid leftover rank
        if d_front < d_back:
            return 2 * d_front + 1 if d_front % 2 == 0 else 2 * d_front + 2
        return 2 * d_back + 2 if d_back % 2 == 0 else 2 * d_back + 1

    base["st"] = [st_rank(i + 1) for i in range(n)]
    # outside-in ranks are a permutation of 1..n
    assert sorted(base["st"]) == list(range(1, n + 1))
    w_f = int(base.loc[base["o_orderstatus"] == "F", "st"].sum())
    w_o = int(base.loc[base["o_orderstatus"] == "O", "st"].sum())

    from postrack_spark.queries.registry import load_all

    row = load_all()["agg_siegel_tukey_dispersion"].fn(spark, SF_DIR).collect()[0]
    assert (row["w_f"], row["w_o"]) == (w_f, w_o)
    assert row["w_f"] + row["w_o"] == n * (n + 1) // 2
