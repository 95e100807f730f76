"""Distributed exact nonparametric statistics — reusable operator
forms of the round-3 stats query family (Kruskal-Wallis, Mann-Kendall,
runs test). The reference (postrack.go) has no analytics surface; these
exist for the engine's statistical layer and are kept as generic
DataFrame → DataFrame operators so hypothesis model tests
(tests/test_stats_models.py) can drive them on arbitrary data,
independent of the fixture tables.

House rules (see queries/stats_queries.py): integer moments everywhere,
rank machinery from operators/ranking (zero unpartitioned windows),
per-group float contributions floored to int64 BEFORE cross-group sums,
and final statistics assembled in ONE IEEE-deterministic double
expression floored to ppm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from postrack_spark.session import pin_small

# Optimization round 8: every operator below reduces the data to a
# bounded frame (distinct-value cells, per-day counts, contingency
# tables) and then consumes that frame from several plan branches.
# Spark recomputes a shared subtree once PER CONSUMER (exchange reuse
# does not fire for these shapes — see session.pin_small), so e.g.
# agg_runs_test re-ran the events scan + daily aggregate 16 times.
# pin_small persists the bounded frame lazily: one InMemoryRelation
# for all branches, one pass over the data, identical results.


def kruskal_wallis(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Kruskal-Wallis H over integer values: 1-row DataFrame with
    (n_total, n_groups, tie_sum, h_ppm). Midranks come from a
    distributed prefix sum over the DISTINCT-value frame; see
    agg_kruskal_wallis for the full exactness argument."""
    from postrack_spark.operators.ranking import prefix_sum_by_key

    c = df.select(F.col(group_col).alias("prio"), F.col(value_col).alias("cents"))
    cells = pin_small(
        "kw_cells",
        c.groupBy("prio", "cents").agg(F.count("*").cast("long").alias("n_pc")),
    )
    vals = pin_small(
        "kw_vals", cells.groupBy("cents").agg(F.sum("n_pc").cast("long").alias("cnt"))
    )
    mid = prefix_sum_by_key(vals, ["cents"], "cnt", "cumb", inclusive=False).select(
        "cents",
        "cnt",
        (F.lit(2) * F.col("cumb") + F.col("cnt") + F.lit(1))
        .cast("long")
        .alias("mr2"),
    )
    grp = (
        cells.join(mid.select("cents", "mr2"), "cents")
        .groupBy("prio")
        .agg(
            F.sum(F.col("n_pc") * F.col("mr2")).cast("long").alias("r2"),
            F.sum("n_pc").cast("long").alias("n_j"),
        )
    )
    terms = grp.agg(
        F.sum(
            F.floor(
                F.col("r2").cast("double")
                * F.col("r2").cast("double")
                / (F.lit(4.0) * F.col("n_j").cast("double"))
            ).cast("long")
        )
        .cast("long")
        .alias("hnum"),
        F.count("*").cast("long").alias("n_groups"),
    )
    tie = vals.agg(
        F.sum(F.expr("cnt * cnt * cnt - cnt")).cast("long").alias("tie_sum"),
        F.sum("cnt").cast("long").alias("n_total"),
    )
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    h_ppm = F.floor(
        F.lit(1000000.0)
        * (
            (
                F.lit(12.0) * d("hnum") / (d("n_total") * (d("n_total") + F.lit(1.0)))
                - F.lit(3.0) * (d("n_total") + F.lit(1.0))
            )
            / (
                F.lit(1.0)
                - d("tie_sum")
                / F.expr("CAST(n_total * n_total * n_total - n_total AS DOUBLE)")
            )
        )
    ).cast("long")
    return (
        terms.crossJoin(F.broadcast(tie))  # 1-row x 1-row combine
        .select("n_total", "n_groups", "tie_sum", h_ppm.alias("h_ppm"))
    )


def mann_kendall(df: DataFrame, key_col: str, time_col: str, value_col: str) -> DataFrame:
    """Per-key Mann-Kendall trend test over an ordered integer series:
    (key, n_days, s_stat, varnum18, z_ppm) per key. The pair frame
    must be bounded per key (calendar-bounded in the query usage); the
    right side broadcasts. See events_mann_kendall_trend."""
    daily = pin_small(
        "mk_daily",
        df.select(
            F.col(key_col).alias("event_type"),
            F.col(time_col).alias("d"),
            F.col(value_col).cast("long").alias("c"),
        ),
    )
    a = daily.select("event_type", F.col("d").alias("da"), F.col("c").alias("ca"))
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("d").alias("db"),
        F.col("c").alias("cb"),
    )
    s = (
        a.join(
            F.broadcast(b),
            (F.col("et_b") == F.col("event_type")) & (F.col("db") > F.col("da")),
        )
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    nd = daily.groupBy("event_type").agg(F.count("*").cast("long").alias("n_days"))
    ties = (
        daily.groupBy("event_type", "c")
        .agg(F.count("*").cast("long").alias("t"))
        .groupBy("event_type")
        .agg(F.sum(F.expr("t * (t - 1) * (2 * t + 5)")).cast("long").alias("tie18"))
    )
    joined = nd.join(s, "event_type").join(ties, "event_type")
    varnum18 = F.expr(
        "CAST(n_days * (n_days - 1) * (2 * n_days + 5) - tie18 AS BIGINT)"
    )
    z_ppm = F.expr(
        """
        CASE WHEN s_stat = 0 THEN CAST(0 AS BIGINT)
             ELSE CAST(floor(1000000.0
                      * CAST(CASE WHEN s_stat > 0 THEN s_stat - 1
                                  ELSE s_stat + 1 END AS DOUBLE)
                      / sqrt(CAST(n_days * (n_days - 1) * (2 * n_days + 5)
                                  - tie18 AS DOUBLE) / 18.0)) AS BIGINT)
        END
        """
    )
    return joined.select(
        F.col("event_type").alias(key_col),
        "n_days",
        "s_stat",
        varnum18.alias("varnum18"),
        z_ppm.alias("z_ppm"),
    )


def runs_test(df: DataFrame, time_col: str, value_col: str) -> DataFrame:
    """Wald-Wolfowitz runs test on one ordered integer series: 1-row
    (n_days, n_above, n_below, runs, z_ppm). Median dichotomization is
    the type-1 order statistic; ties-at-median count 'below'; the run
    count is an adjacency self-join on the rank index (window-free).
    The frame must be bounded (calendar-bounded in query usage) — the
    rank/adjacency self-joins broadcast. See agg_runs_test."""
    daily = pin_small(
        "rt_daily",
        df.select(F.col(time_col).alias("d"), F.col(value_col).cast("long").alias("c")),
    )
    h = daily.select(F.col("d").alias("hd"), F.col("c").alias("hc"))
    pre = (
        daily.join(
            F.broadcast(h),
            (F.col("hc") < F.col("c"))
            | ((F.col("hc") == F.col("c")) & (F.col("hd") <= F.col("d"))),
        )
        .groupBy("d", "c")
        .agg(F.count("*").cast("long").alias("kv"))
    )
    kidx = (
        daily.join(F.broadcast(h), F.col("hd") <= F.col("d"))
        .groupBy("d", "c")
        .agg(F.count("*").cast("long").alias("k"))
    )
    tot = daily.agg(F.count("*").cast("long").alias("n"))
    med = (
        pre.crossJoin(F.broadcast(tot))
        .filter(F.col("kv") == F.expr("(n + 1) DIV 2"))
        .select(F.col("c").alias("m"))
    )
    signs = pin_small(
        "rt_signs",
        kidx.crossJoin(F.broadcast(med)).select(
            "k", F.when(F.col("c") > F.col("m"), 1).otherwise(0).alias("above")
        ),
    )
    b = signs.select((F.col("k") - 1).alias("k"), F.col("above").alias("nxt"))
    trans = signs.join(b, "k").agg(
        F.sum(F.when(F.col("above") != F.col("nxt"), 1).otherwise(0))
        .cast("long")
        .alias("flips")
    )
    m2 = signs.agg(
        F.sum("above").cast("long").alias("n1"),
        (F.count("*") - F.sum("above")).cast("long").alias("n2"),
    )
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    # zero-variance dichotomy (2·n1·n2 <= n, e.g. every value ties at the
    # median) has no normal approximation: NULL, and guard the division
    # (ANSI Spark throws on /0 even for doubles)
    z_ppm = F.when(
        F.lit(2) * F.col("n1") * F.col("n2") <= F.col("n"), F.lit(None).cast("long")
    ).otherwise(
        F.floor(
            F.lit(1000000.0)
            * (
                (F.col("flips") + F.lit(1)).cast("double")
                - (F.lit(1.0) + F.lit(2.0) * d("n1") * d("n2") / d("n"))
            )
            / F.sqrt(
                F.lit(2.0)
                * d("n1")
                * d("n2")
                * (F.lit(2.0) * d("n1") * d("n2") - d("n"))
                / (d("n") * d("n") * (d("n") - F.lit(1.0)))
            )
        ).cast("long")
    )
    return (
        tot.crossJoin(F.broadcast(m2))  # 1-row combines
        .crossJoin(F.broadcast(trans))
        .select(
            F.col("n").alias("n_days"),
            F.col("n1").alias("n_above"),
            F.col("n2").alias("n_below"),
            (F.col("flips") + F.lit(1)).cast("long").alias("runs"),
            z_ppm.alias("z_ppm"),
        )
    )


def mann_whitney_u(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Two-sample Mann-Whitney U with exact tie-corrected midranks,
    pure integers: 1-row DataFrame (grp_a, grp_b, n_a, n_b, u_a_x2,
    u_b_x2, tie_sum).

    Group a is the lexicographically smaller group label (deterministic
    across engines). Midranks are carried doubled (mr2 = 2*rank) so
    ties stay integral; therefore U statistics are doubled too:
    u_a_x2 = 2*R_a - n_a*(n_a+1) where R_a is the (possibly .5-valued)
    rank sum. Invariant: u_a_x2 + u_b_x2 == 2*n_a*n_b — asserted by the
    hypothesis model test. tie_sum = Σ(t³-t) feeds the variance
    correction downstream. Distributed shape: same as kruskal_wallis —
    one prefix sum over the DISTINCT-value frame (operators/ranking),
    partial-agg groupBys, 1-row broadcast combines; no windows, no
    collect.
    """
    from postrack_spark.operators.ranking import prefix_sum_by_key

    c = df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
    cells = pin_small(
        "mwu_cells", c.groupBy("g", "v").agg(F.count("*").cast("long").alias("n_gv"))
    )
    vals = pin_small(
        "mwu_vals", cells.groupBy("v").agg(F.sum("n_gv").cast("long").alias("cnt"))
    )
    mid = prefix_sum_by_key(vals, ["v"], "cnt", "cumb", inclusive=False).select(
        "v",
        "cnt",
        (F.lit(2) * F.col("cumb") + F.col("cnt") + F.lit(1))
        .cast("long")
        .alias("mr2"),
    )
    grp = pin_small(
        "mwu_grp",
        cells.join(mid.select("v", "mr2"), "v")
        .groupBy("g")
        .agg(
            F.sum(F.col("n_gv") * F.col("mr2")).cast("long").alias("r2"),
            F.sum("n_gv").cast("long").alias("n_g"),
        ),
    )
    labels = grp.agg(F.min("g").alias("grp_a"), F.max("g").alias("grp_b"),
                     F.count("*").cast("long").alias("n_groups"))
    joined = grp.crossJoin(F.broadcast(labels))  # grp is 2 rows
    pivoted = joined.agg(
        F.first("grp_a").alias("grp_a"),
        F.first("grp_b").alias("grp_b"),
        F.first("n_groups").alias("n_groups"),
        F.sum(F.when(F.col("g") == F.col("grp_a"), F.col("r2"))).cast("long").alias("r2_a"),
        F.sum(F.when(F.col("g") == F.col("grp_a"), F.col("n_g"))).cast("long").alias("n_a"),
        F.sum(F.when(F.col("g") == F.col("grp_b"), F.col("r2"))).cast("long").alias("r2_b"),
        F.sum(F.when(F.col("g") == F.col("grp_b"), F.col("n_g"))).cast("long").alias("n_b"),
    )
    tie = vals.agg(
        F.sum(F.expr("cnt * cnt * cnt - cnt")).cast("long").alias("tie_sum")
    )
    return pivoted.crossJoin(F.broadcast(tie)).select(
        "grp_a", "grp_b", "n_a", "n_b",
        (F.col("r2_a") - F.col("n_a") * (F.col("n_a") + 1)).cast("long").alias("u_a_x2"),
        (F.col("r2_b") - F.col("n_b") * (F.col("n_b") + 1)).cast("long").alias("u_b_x2"),
        "tie_sum",
        "n_groups",
    )


def jonckheere_trend(df: DataFrame, group_col: str, group_order: list,
                     value_col: str) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative trend statistic, exact
    integers: 1-row (jt_x2, e_jt_x2, n_total) with jt_x2 = 2*JT =
    sum over ordered group pairs i<j of the doubled Mann-Whitney U_ij,
    and e_jt_x2 = 2*E[JT] = sum(t_i*t_j) under the null. 2*U_ij =
    sum over distinct values v of n_j(v)*(2*cumlt_i(v) + n_i(v)).

    Distributed shape: one multi-column distributed prefix sum over the
    distinct-value frame gives every group's cumulative-below count in
    a single range shuffle (operators/ranking.prefix_sums_by_key — the
    two-sample-CDF pattern, k lanes); the k*(k-1)/2 pair terms unroll
    into one aggregate expression. Groups absent from ``group_order``
    are ignored (the caller names the ordered alternative)."""
    from postrack_spark.operators.ranking import prefix_sums_by_key

    k = len(group_order)
    cells = (
        df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
        .filter(F.col("g").isin(list(group_order)))
        .groupBy("g", "v")
        .agg(F.count("*").cast("long").alias("n"))
    )
    mat = pin_small(
        "jt_mat",
        cells.groupBy("v").agg(
            *[
                F.sum(F.when(F.col("g") == p, F.col("n")).otherwise(0))
                .cast("long")
                .alias(f"n{i}")
                for i, p in enumerate(group_order, start=1)
            ]
        ),
    )
    cum = prefix_sums_by_key(
        mat, ["v"], {f"c{i}": f"n{i}" for i in range(1, k + 1)},
        inclusive=False,
    )
    pair_terms = " + ".join(
        f"n{j} * (2 * c{i} + n{i})"
        for i in range(1, k + 1) for j in range(i + 1, k + 1)
    )
    jt = cum.agg(F.expr(f"CAST(sum({pair_terms}) AS BIGINT)").alias("jt_x2"))
    tot = mat.agg(
        *[F.sum(f"n{i}").cast("long").alias(f"t{i}") for i in range(1, k + 1)],
        F.expr(
            "CAST(sum(" + "+".join(f"n{i}" for i in range(1, k + 1))
            + ") AS BIGINT)"
        ).alias("n_total"),
    )
    exp_terms = " + ".join(
        f"t{i} * t{j}" for i in range(1, k + 1) for j in range(i + 1, k + 1)
    )
    return (
        jt.crossJoin(F.broadcast(tot))  # 1-row combines
        .select(
            "jt_x2",
            F.expr(f"CAST({exp_terms} AS BIGINT)").alias("e_jt_x2"),
            "n_total",
        )
    )


def misra_gries_candidates(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Mergeable Misra-Gries heavy-hitter sketch: one pass over
    ``df[key_col]`` with k counters per partition, merged to a single
    k-counter summary. Returns (key, est) candidate rows.

    Guarantees (Misra-Gries 1982; mergeability Agarwal et al. 2012,
    merge = counter-wise sum then subtract the (k+1)-th largest
    weight): for every key, est <= true_count and
    true_count - est <= N/(k+1); hence every key with
    true_count > N/(k+1) IS among the candidates. The guarantee — not
    the sketch contents, which are partitioning-dependent — is what
    callers gate on (the CMS/HLL certificate discipline).

    Distributed shape: Arrow-batched mapInPandas keeps ONE counter
    dict per partition across its batch iterator (state O(k)); the
    merge is a single-group applyInPandas over <= k * partitions tiny
    counter rows. No collect, no shuffle of the data itself.
    """
    from collections.abc import Iterator

    import pandas as pd

    def _mg_update(counters: dict, key, w: int, k: int) -> None:
        if key in counters:
            counters[key] += w
        elif len(counters) < k:
            counters[key] = w
        else:
            # decrement all by the capacity shortfall; standard batched
            # form: subtract min(w, min counter) repeatedly — do it in
            # one step via the m-th smallest logic below for weights
            dec = min(w, min(counters.values()))
            for c in list(counters):
                counters[c] -= dec
                if counters[c] == 0:
                    del counters[c]
            w -= dec
            if w > 0:
                counters[key] = w

    def per_partition(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in it:
            for key in pdf[key_col]:
                _mg_update(counters, key, 1, k)
        if counters:
            yield pd.DataFrame(
                {"key": list(counters), "est": list(counters.values())}
            )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        combined = pdf.groupby("key", sort=True)["est"].sum()
        if len(combined) > k:
            # subtract the (k+1)-th largest weight from everything
            cut = sorted(combined.values, reverse=True)[k]
            combined = combined - cut
            combined = combined[combined > 0]
        out = combined.reset_index()
        out.columns = ["key", "est"]
        return out

    key_field = df.select(F.col(key_col).alias("key")).schema[0]
    key_type = key_field.dataType.simpleString()
    parts = df.select(F.col(key_col).alias(key_col)).mapInPandas(
        per_partition, f"key {key_type}, est long"
    )
    return (
        parts.groupBy(F.lit(1).alias("_g"))
        .applyInPandas(
            lambda _key, pdf: merge(pdf), f"key {key_type}, est long"
        )
        .select("key", "est")
    )


def cliffs_delta(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Cliff's delta ordinal effect size between two groups, exact
    integers: 1-row (grp_a, grp_b, n_a, n_b, delta_num_x2,
    denom_x2). delta = (#(a<b) - #(a>b)) / (n_a*n_b) — reported as the
    doubled integer ratio delta_num_x2 / denom_x2 so ties never force
    a float: the rank-sum form U_g = R_g - n_g*(n_g+1)/2 counts pairs
    where g EXCEEDS the other group (+ ties/2), so #(a<b) - #(a>b) =
    U_b - U_a, i.e. delta_num_x2 = u_b_x2 - u_a_x2 and denom_x2 =
    2*n_a*n_b (the brute-force pair-count model test pins this sign —
    it caught the inverted first draft). Vargha-Delaney A is the
    same ratio shifted: A = (delta + 1)/2 — one statistic, two
    published names. Distributed shape: inherits mann_whitney_u's
    (one distinct-value prefix sum, no windows, no collect)."""
    u = mann_whitney_u(df, group_col, value_col)
    return u.select(
        "grp_a", "grp_b", "n_a", "n_b",
        (F.col("u_b_x2") - F.col("u_a_x2")).cast("long")
        .alias("delta_num_x2"),
        (F.lit(2) * F.col("n_a") * F.col("n_b")).cast("long")
        .alias("denom_x2"),
    )


def ansari_bradley(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Ansari-Bradley two-sample SCALE (dispersion) test with exact
    tie-corrected midrank scores, pure integers: 1-row (grp_a, grp_b,
    n_a, n_b, ab_x2, s2_total, s4_total, n_total).

    Scores rank inward from BOTH ends — an observation with combined
    midrank r among N scores min(r, N+1-r), so extreme values score
    low and central values high; a group with systematically LOW total
    score is more spread out than the other. Doubled midranks (mr2 =
    2r) keep tie scores integral: the doubled score is s2 =
    min(mr2, 2*(N+1) - mr2) and ab_x2 = 2*AB = sum of s2 over group a
    (the lexicographically smaller label — deterministic across
    engines). s2_total = sum over ALL observations of s2 and s4_total
    = sum of s2^2 feed the tie-exact null moments downstream:
    E[AB] = n_a*s2_total/(2N), Var from the score variance — both
    pure rationals of the returned integers. Distributed shape: same
    as mann_whitney_u (distinct-value prefix sum, partial-agg
    groupBys, 1-row broadcast combines)."""
    from postrack_spark.operators.ranking import prefix_sum_by_key

    c = df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
    cells = pin_small(
        "ab_cells", c.groupBy("g", "v").agg(F.count("*").cast("long").alias("n_gv"))
    )
    vals = cells.groupBy("v").agg(F.sum("n_gv").cast("long").alias("cnt"))
    mid = pin_small(
        "ab_mid",
        prefix_sum_by_key(vals, ["v"], "cnt", "cumb", inclusive=False).select(
            "v",
            "cnt",
            (F.lit(2) * F.col("cumb") + F.col("cnt") + F.lit(1))
            .cast("long")
            .alias("mr2"),
        ),
    )
    tot = mid.agg(F.sum("cnt").cast("long").alias("n_total"))
    scored = pin_small("ab_scored", mid.crossJoin(F.broadcast(tot)).select(
        "v", "cnt", "n_total",
        F.least(
            F.col("mr2"),
            F.lit(2) * (F.col("n_total") + 1) - F.col("mr2"),
        ).cast("long").alias("s2"),
    ))
    grp = (
        cells.join(scored.select("v", "s2"), "v")
        .groupBy("g")
        .agg(
            F.sum(F.col("n_gv") * F.col("s2")).cast("long").alias("gs2"),
            F.sum("n_gv").cast("long").alias("n_g"),
        )
    )
    labels = grp.agg(F.min("g").alias("grp_a"), F.max("g").alias("grp_b"))
    pivoted = grp.crossJoin(F.broadcast(labels)).agg(
        F.first("grp_a").alias("grp_a"),
        F.first("grp_b").alias("grp_b"),
        F.sum(F.when(F.col("g") == F.col("grp_a"), F.col("n_g")))
        .cast("long").alias("n_a"),
        F.sum(F.when(F.col("g") == F.col("grp_b"), F.col("n_g")))
        .cast("long").alias("n_b"),
        F.sum(F.when(F.col("g") == F.col("grp_a"), F.col("gs2")))
        .cast("long").alias("ab_x2"),
    )
    sums = scored.agg(
        F.sum(F.col("cnt") * F.col("s2")).cast("long").alias("s2_total"),
        F.sum(F.col("cnt") * F.col("s2") * F.col("s2")).cast("long")
        .alias("s4_total"),
        F.first("n_total").alias("n_total"),
    )
    return pivoted.crossJoin(F.broadcast(sums)).select(
        "grp_a", "grp_b", "n_a", "n_b", "ab_x2",
        "s2_total", "s4_total", "n_total",
    )


def somers_d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Somers' D_yx — asymmetric ordinal association of Y on ordered X,
    exact integers: 1-row (concordant, discordant, d_num, d_den_x2,
    n_total). D_yx = (C - D) / (pairs with distinct X) = d_num /
    (d_den_x2 / 2) where d_den_x2 = N^2 - sum of squared X-margin
    totals. Computed from the k*m contingency table (metadata-sized
    after one groupBy of the data): C = sum over cells n_ij *
    (count strictly-below-left), D likewise strictly-below-right —
    one broadcast self-join of the cell table, never a row-level
    pair join (the n^2 trap). Gamma's (C-D)/(C+D) reads off the same
    row."""
    cells = pin_small(
        "sd_cells",
        df.select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
        .groupBy("x", "y")
        .agg(F.count("*").cast("long").alias("n")),
    )
    a = cells.alias("a")
    b = cells.alias("b")
    conc = a.join(
        F.broadcast(b),
        (F.col("a.x") < F.col("b.x")) & (F.col("a.y") < F.col("b.y")),
    ).agg(F.sum(F.col("a.n") * F.col("b.n")).cast("long").alias("concordant"))
    disc = a.join(
        F.broadcast(b),
        (F.col("a.x") < F.col("b.x")) & (F.col("a.y") > F.col("b.y")),
    ).agg(F.sum(F.col("a.n") * F.col("b.n")).cast("long").alias("discordant"))
    margins = cells.groupBy("x").agg(F.sum("n").cast("long").alias("nx"))
    den = margins.agg(
        (F.sum("nx") * F.sum("nx") - F.sum(F.col("nx") * F.col("nx")))
        .cast("long").alias("d_den_x2"),
        F.sum("nx").cast("long").alias("n_total"),
    )
    return (
        conc.crossJoin(F.broadcast(disc))
        .crossJoin(F.broadcast(den))
        .select(
            F.coalesce("concordant", F.lit(0)).alias("concordant"),
            F.coalesce("discordant", F.lit(0)).alias("discordant"),
            (F.coalesce("concordant", F.lit(0))
             - F.coalesce("discordant", F.lit(0))).cast("long")
            .alias("d_num"),
            "d_den_x2",
            "n_total",
        )
    )


def cochran_armitage(df: DataFrame, dose_col: str,
                     success_col: str) -> DataFrame:
    """Cochran-Armitage TREND test for a 2 x k table, exact integers:
    1-row (t_num, r_total, n_total, s1, s2) with the dose VALUE as
    the score (the standard choice for equally-spaced integer doses).
    With group sizes n_i, successes r_i, scores w_i, N = sum n_i,
    R = sum r_i: t_num = N*sum(w_i r_i) - R*sum(w_i n_i), s1 =
    sum(w_i n_i), s2 = sum(w_i^2 n_i). Downstream Z^2 =
    (N-1) * t_num^2 / (R*(N-R)*(N*s2 - s1^2)) — a pure rational of
    the returned integers, so the cross-engine gate never touches a
    float. One partial-agg groupBy then a 1-row combine; no windows,
    no collect."""
    g = (
        df.select(F.col(dose_col).cast("long").alias("d"),
                  F.col(success_col).cast("long").alias("s"))
        .groupBy("d")
        .agg(F.count("*").cast("long").alias("n"),
             F.sum("s").cast("long").alias("r"))
    )
    tot = g.agg(
        F.sum("n").cast("long").alias("n_total"),
        F.sum("r").cast("long").alias("r_total"),
        F.sum(F.col("d") * F.col("n")).cast("long").alias("s1"),
        F.sum(F.col("d") * F.col("d") * F.col("n")).cast("long").alias("s2"),
        F.sum(F.col("d") * F.col("r")).cast("long").alias("wr"),
    )
    return tot.select(
        (F.col("n_total") * F.col("wr")
         - F.col("r_total") * F.col("s1")).cast("long").alias("t_num"),
        "r_total", "n_total", "s1", "s2",
    )


def ks_two_sample(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov + Kuiper statistics, exact
    integers: 1-row (grp_a, grp_b, n_a, n_b, d_plus_num, d_minus_num,
    d_num, v_num). With cumulative counts cumA/cumB at each distinct
    value, the ECDF gap F_A - F_B at that value is
    (cumA*n_b - cumB*n_a) / (n_a*n_b); the returned numerators are
    d_plus_num  = max(cumA*n_b - cumB*n_a)   (sup of F_A - F_B),
    d_minus_num = max(cumB*n_a - cumA*n_b)   (sup of F_B - F_A),
    d_num = max of the two (KS D numerator) and v_num = their sum
    (Kuiper's V numerator) — all over the common denominator n_a*n_b,
    so the gate never touches a float. Both sup terms are >= 0 because
    the gap is 0 at the largest value. Empty samples yield NULL
    numerators (the three-sided-answer rule).

    Distributed shape: the two-sample-CDF pattern —
    operators/ranking.prefix_sums_by_key carries BOTH cumulative lanes
    over one range shuffle of the DISTINCT-value frame; totals combine
    via a 1-row broadcast; no windows, no collect. Overflow headroom:
    cum*n <= n_a*n_b, so the numerators stay in int64 for samples up
    to ~3e9 rows each — beyond that coarsen the value grid first.
    Group a is the lexicographically smaller label (deterministic
    across engines), matching :func:`mann_whitney_u`.
    """
    from postrack_spark.operators.ranking import prefix_sums_by_key

    c = df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
    # One row-level pass: reduce to (g, v) cells first, then derive the
    # labels from the bounded cell frame (the old shape aggregated the
    # raw rows once for the labels and again for the cells — two scans
    # of the data for one reduction).
    gv = pin_small(
        "ks_gv",
        c.groupBy("g", "v").agg(F.count("*").cast("long").alias("n_gv")),
    )
    labels = gv.agg(F.min("g").alias("grp_a"), F.max("g").alias("grp_b"))
    cells = pin_small(
        "ks_cells",
        gv.crossJoin(F.broadcast(labels))
        .groupBy("v")
        .agg(
            F.first("grp_a").alias("grp_a"),
            F.first("grp_b").alias("grp_b"),
            F.sum(F.when(F.col("g") == F.col("grp_a"), F.col("n_gv")).otherwise(0))
            .cast("long")
            .alias("na_v"),
            F.sum(
                F.when(
                    (F.col("g") == F.col("grp_b")) & (F.col("grp_b") != F.col("grp_a")),
                    F.col("n_gv"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("nb_v"),
        ),
    )
    cum = prefix_sums_by_key(
        cells, ["v"], {"cum_a": "na_v", "cum_b": "nb_v"}, inclusive=True
    )
    tot = cells.agg(
        F.first("grp_a").alias("grp_a"),
        F.first("grp_b").alias("grp_b"),
        F.coalesce(F.sum("na_v"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.sum("nb_v"), F.lit(0)).cast("long").alias("n_b"),
    )
    gaps = cum.crossJoin(F.broadcast(tot.select("n_a", "n_b"))).select(
        (F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
        .cast("long")
        .alias("gap")
    )
    sups = gaps.agg(
        F.max("gap").cast("long").alias("d_plus_num"),
        F.max(-F.col("gap")).cast("long").alias("d_minus_num"),
    )
    return (
        tot.crossJoin(F.broadcast(sups))  # 1-row x 1-row combine
        .select(
            "grp_a",
            "grp_b",
            "n_a",
            "n_b",
            F.when(F.col("n_a") * F.col("n_b") > 0, F.col("d_plus_num"))
            .cast("long")
            .alias("d_plus_num"),
            F.when(F.col("n_a") * F.col("n_b") > 0, F.col("d_minus_num"))
            .cast("long")
            .alias("d_minus_num"),
            F.when(
                F.col("n_a") * F.col("n_b") > 0,
                F.greatest(F.col("d_plus_num"), F.col("d_minus_num")),
            )
            .cast("long")
            .alias("d_num"),
            F.when(
                F.col("n_a") * F.col("n_b") > 0,
                F.col("d_plus_num") + F.col("d_minus_num"),
            )
            .cast("long")
            .alias("v_num"),
        )
    )
