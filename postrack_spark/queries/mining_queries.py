"""Data-mining operators a warehouse grows into once the relational
surface is saturated: association rules (market-basket), skyline /
Pareto-frontier selection, and exact proportional apportionment
(largest-remainder). All outputs are exact integers or exact row
picks, fully hash-checkable cross-engine.

Scale design notes live on each query; the shared themes:
* association rules ride the SAME thresholded co-purchase relation as
  the graph family (support threshold BEFORE any join fan-out);
* the skyline exploits a bounded dimension (p_size has catalog-bounded
  cardinality) so the frontier test is two broadcast scalar-per-size
  aggregates — no self-join over the data, no window;
* apportionment does one fact-sized aggregation and then runs the
  rounding ceremony on the nation-sized frame (bounded, 25 rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postrack_spark.queries.graph_queries import _EDGES_CTE, _edges
from postrack_spark.queries.registry import query
from postrack_spark.session import load_tables


@query(
    "assoc_basket_rules",
    oracle=f"""
    WITH {_EDGES_CTE},
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM po),
    cnt AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS c FROM po GROUP BY l_partkey
    ),
    rules AS (
      SELECT pa AS ante, pb AS cons, w FROM edges
      UNION ALL
      SELECT pb AS ante, pa AS cons, w FROM edges
    )
    SELECT r.ante, r.cons, r.w AS support,
           ca.c AS cnt_ante, cb.c AS cnt_cons,
           CAST(r.w * 10000 // ca.c AS BIGINT) AS conf_pp10k,
           CAST(r.w * 10000 * n.n_orders // (ca.c * cb.c) AS BIGINT) AS lift_pp10k
    FROM rules r
    JOIN cnt ca ON ca.l_partkey = r.ante
    JOIN cnt cb ON cb.l_partkey = r.cons
    CROSS JOIN n
    ORDER BY lift_pp10k DESC, conf_pp10k DESC, ante, cons
    LIMIT 50
    """,
)
def assoc_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (support / confidence / lift)
    over the co-purchase relation — the classic a-priori output for
    pair-sized itemsets. Reuses the graph family's thresholded edge
    builder (support >= 2 applied BEFORE any rule join, so the rule
    relation is candidate-sized, not O(catalog²)); per-item basket
    counts are one map-side-combinable groupBy over the distinct
    (order, part) relation. Confidence and lift are reported in exact
    integer parts-per-10000 (floor division — identical on both
    engines for positive operands), so no float division can diverge.
    Overflow headroom: w*10000*n_orders needs w*n_orders < 9.2e14 —
    at 100 TB (n_orders ~ 1.5e9) that bounds pair support w < 6e5,
    satisfied by orders of magnitude since w counts co-occurrences of
    ONE pair. The rule table is thresholded-small, so it broadcasts
    into the per-item count relation (the catalog-sized side never
    shuffles); top-50 by lift plans as TakeOrderedAndProject.

    Physical shape (optimization round 8): per-item counts and the
    order count are computed as direct distinct aggregates over the
    2-column lineitem projection (the previous shared `po.distinct()`
    frame was never actually shared — each consumer re-ran the scan +
    distinct shuffle), and BOTH rule-endpoint lookups resolve in ONE
    probe of `cnt`: each rule explodes into two (role, part) lookup
    rows, the tiny lookup side broadcasts into a single `cnt` pass,
    and a candidate-sized groupBy pivots the roles back into
    cnt_ante/cnt_cons. This removes a full recomputation of `cnt`
    (the old second join broadcast the CATALOG-sized count relation —
    a scale smell at 100 TB, where the candidate side is the small
    one)."""
    li = load_tables(spark, sf_dir)["lineitem"].select("l_orderkey", "l_partkey")
    n_orders = li.agg(
        F.count_distinct("l_orderkey").cast("bigint").alias("n_orders")
    )
    cnt = li.groupBy("l_partkey").agg(
        F.count_distinct("l_orderkey").cast("bigint").alias("c")
    )
    edges = _edges(spark, sf_dir)
    rules = edges.select(
        F.col("pa").alias("ante"), F.col("pb").alias("cons"), "w"
    ).unionAll(edges.select(F.col("pb").alias("ante"), F.col("pa").alias("cons"), "w"))
    lookups = rules.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("a").alias("role"), F.col("ante").alias("part"),
                    F.col("ante"), F.col("cons"), F.col("w"),
                ),
                F.struct(
                    F.lit("c").alias("role"), F.col("cons").alias("part"),
                    F.col("ante"), F.col("cons"), F.col("w"),
                ),
            )
        ).alias("e")
    ).select("e.*")
    joined = (
        cnt.join(F.broadcast(lookups), cnt["l_partkey"] == lookups["part"])
        .groupBy("ante", "cons", "w")
        .agg(
            F.max(F.when(F.col("role") == "a", F.col("c"))).alias("cnt_ante"),
            F.max(F.when(F.col("role") == "c", F.col("c"))).alias("cnt_cons"),
        )
        .crossJoin(F.broadcast(n_orders))
    )
    return (
        joined.select(
            "ante",
            "cons",
            F.col("w").alias("support"),
            "cnt_ante",
            "cnt_cons",
            F.expr("CAST(w * 10000 DIV cnt_ante AS BIGINT)").alias("conf_pp10k"),
            F.expr(
                "CAST(w * 10000 * n_orders DIV (cnt_ante * cnt_cons) AS BIGINT)"
            ).alias("lift_pp10k"),
        )
        .orderBy(
            F.desc("lift_pp10k"), F.desc("conf_pp10k"), "ante", "cons"
        )
        .limit(50)
    )


@query(
    "part_skyline_pareto",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    ORDER BY p.p_partkey
    """,
)
def part_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier: parts not dominated on
    (minimize price, maximize size). The textbook formulation is a
    quadratic NOT EXISTS self-join (the oracle spells it that way);
    the distributed plan instead exploits the bounded dimension:
    p_size has catalog-bounded cardinality (1..50), so per-size
    minimum prices form a TINY frame, and the two suffix aggregates
      m_ge(s) = min price over size >= s   (strict-price dominance)
      m_gt(s) = min price over size >  s   (equal-price dominance)
    decide dominance for every row. One map-side-combinable groupBy
    over the catalog, a <=50-row self-join for the suffix mins (never
    data-sized), and a broadcast probe back — no window, no Python,
    no O(n²) pair join, and the shape is unchanged at 100 TB because
    the tiny frame scales with the DOMAIN of size, not with rows.
    Price comparisons are exact row values (no arithmetic), so ties
    and strictness agree bit-for-bit with the oracle."""
    from postrack_spark.operators.mining import skyline_min_max_bounded

    part = load_tables(spark, sf_dir)["part"].select(
        "p_partkey", "p_retailprice", "p_size"
    )
    return (
        skyline_min_max_bounded(part, "p_retailprice", "p_size")
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_partkey")
    )


@query(
    "alloc_largest_remainder",
    oracle="""
    WITH pern AS (
      SELECT c_nationkey AS nk,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey
    ),
    units AS (SELECT nk, CAST(cents // 100000 AS BIGINT) AS rev_k FROM pern),
    tot AS (SELECT CAST(sum(rev_k) AS BIGINT) AS t FROM units),
    base AS (
      SELECT nk, rev_k,
             CAST(10000 * rev_k // t AS BIGINT) AS fl,
             CAST((10000 * rev_k) % t AS BIGINT) AS rem
      FROM units CROSS JOIN tot
    ),
    d AS (SELECT CAST(10000 - sum(fl) AS BIGINT) AS deficit FROM base),
    rnk AS (
      SELECT nk, rev_k, fl, rem,
             CAST(row_number() OVER (ORDER BY rem DESC, nk) AS BIGINT) AS rn
      FROM base
    )
    SELECT n_name, rev_k,
           CAST(fl + CASE WHEN rn <= deficit THEN 1 ELSE 0 END AS BIGINT) AS alloc
    FROM rnk CROSS JOIN d
    JOIN nation ON nk = n_nationkey
    ORDER BY n_name
    """,
)
def alloc_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact proportional apportionment (Hamilton / largest-remainder):
    split a budget of 10,000 units across nations proportional to
    order revenue, floors first, then +1 to the largest remainders so
    the allocation sums to the budget EXACTLY — the rounding ceremony
    every finance/capacity allocator needs and naive round() gets
    wrong. All arithmetic is integer (revenue coarsened to
    thousand-dollar units so 10000*rev_k stays far inside int64 even
    at 100 TB totals, the agg_corr_exact headroom rule; %/DIV agree
    across engines for positive operands). Plan shape: one fact-sized
    pre-aggregation by customer, a key join to customer, re-agg to the
    25-row nation frame — every subsequent step (totals, remainder
    ranking via a tiny self-join count, deficit top-up) runs on
    bounded frames with broadcast combines, no unpartitioned window.
    The remainder rank uses (rem DESC, nationkey) — a total order, so
    the +1 winners are deterministic."""
    t = load_tables(spark, sf_dir)
    per_cust = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"))
    )
    pern = (
        per_cust.join(t["customer"].select("c_custkey", "c_nationkey"),
                      per_cust["o_custkey"] == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(F.sum("cents").cast("long").alias("cents"))
        .select(
            F.col("c_nationkey").alias("nk"),
            F.expr("CAST(cents DIV 100000 AS BIGINT)").alias("rev_k"),
        )
    )
    from postrack_spark.operators.mining import largest_remainder_allocation

    alloc = largest_remainder_allocation(pern, "nk", "rev_k", 10000)
    nation = load_tables(spark, sf_dir)["nation"].select("n_nationkey", "n_name")
    return (
        alloc.join(F.broadcast(nation), F.col("nk") == F.col("n_nationkey"))
        .select("n_name", "rev_k", "alloc")
        .orderBy("n_name")
    )


@query(
    "quality_benford_digits",
    oracle="""
    WITH d AS (
      SELECT substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
             AS digit
      FROM orders
    ),
    counts AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM counts)
    SELECT digit, n,
           CAST(n * 10000 // t AS BIGINT) AS share_pp10k,
           CAST(CASE digit WHEN '1' THEN 3010 WHEN '2' THEN 1761 WHEN '3' THEN 1249
                           WHEN '4' THEN 969 WHEN '5' THEN 792 WHEN '6' THEN 669
                           WHEN '7' THEN 580 WHEN '8' THEN 512 ELSE 458 END
                AS BIGINT) AS benford_pp10k,
           CAST(abs(n * 10000 // t
                    - CASE digit WHEN '1' THEN 3010 WHEN '2' THEN 1761 WHEN '3' THEN 1249
                                 WHEN '4' THEN 969 WHEN '5' THEN 792 WHEN '6' THEN 669
                                 WHEN '7' THEN 580 WHEN '8' THEN 512 ELSE 458 END)
                AS BIGINT) AS dev_pp10k
    FROM counts CROSS JOIN tot
    ORDER BY digit
    """,
)
def quality_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit — the forensic data-quality screen for
    fabricated or truncated monetary data: observed first-significant-
    digit distribution of order value against Benford's law, with
    per-digit deviation. The first digit comes from the DECIMAL STRING
    of integer cents (integer-to-string is exact on every engine;
    double-to-string formatting is NOT and is never used), shares are
    integer parts-per-10000 by floor division, and Benford's
    log10(1+1/d) expectations are baked as integer constants — so the
    whole audit is hash-exact. Plan: one map-side-combinable groupBy
    on a 9-value key + a broadcast total combine; nothing here changes
    shape at 100 TB."""
    orders = load_tables(spark, sf_dir)["orders"]
    benford = (
        "CASE digit WHEN '1' THEN 3010 WHEN '2' THEN 1761 WHEN '3' THEN 1249"
        " WHEN '4' THEN 969 WHEN '5' THEN 792 WHEN '6' THEN 669"
        " WHEN '7' THEN 580 WHEN '8' THEN 512 ELSE 458 END"
    )
    counts = (
        orders.select(
            F.substring(
                F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = counts.agg(F.sum("n").cast("long").alias("t"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.expr("CAST(n * 10000 DIV t AS BIGINT)").alias("share_pp10k"),
            F.expr(f"CAST({benford} AS BIGINT)").alias("benford_pp10k"),
            F.expr(f"CAST(abs(n * 10000 DIV t - {benford}) AS BIGINT)").alias(
                "dev_pp10k"
            ),
        )
        .orderBy("digit")
    )


@query(
    "agg_theil_sen_trend",
    oracle="""
    WITH daily AS (
      SELECT epoch_us(o_orderdate) // 86400000000 AS d,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100 AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT a.d AS da, b.d AS db,
             CAST(((b.y - a.y) * 1000 + 10000000000000 * (b.d - a.d)) // (b.d - a.d)
                  - 10000000000000 AS BIGINT) AS slope_milli
      FROM daily a JOIN daily b ON b.d > a.d
    ),
    ranked AS (
      SELECT slope_milli,
             row_number() OVER (ORDER BY slope_milli, da, db) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM pairs
    )
    SELECT max(n) AS n_pairs,
           CAST(sum(slope_milli * CASE WHEN (n + 1) // 2 = (n + 2) // 2
                                       THEN 2 ELSE 1 END) AS BIGINT) AS med2x_milli
    FROM ranked
    WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
    """,
)
def agg_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator — the median of all pairwise
    slopes of the daily-revenue series, the outlier-immune alternative
    to the OLS fit (events_trend_regression). Everything is integer:
    slopes are reported in milli-dollars/day via the POSITIVE-SHIFT
    floor-division trick — Spark's DIV truncates toward zero while
    DuckDB's // floors, so they disagree on NEGATIVE quotients; adding
    S=1e13 per day to the numerator makes every quotient positive
    (|slope_milli| < S by orders of magnitude at any SF: daily revenue
    at 100 TB is ~1e10 dollars -> |dy|*1000 < 1e16/dx), where the two
    semantics coincide, then S is subtracted back. The median is the
    SUM of the two middle elements (x2 for odd counts) — pure rank
    selection, no float interpolation. Scale: the pair frame is
    O(days²) — bounded by the CALENDAR span squared (2405 days -> 2.9M
    pairs at every SF), not by data volume; ranks come from
    operators/ranking.global_row_number (range shuffle, zero
    WindowExec), and the two middle rows reduce to one output row."""
    from postrack_spark.operators.ranking import global_row_number

    S = 10_000_000_000_000
    daily = (
        load_tables(spark, sf_dir)["orders"]
        .select(
            F.expr("unix_micros(o_orderdate) div 86400000000").alias("d"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.expr("CAST(sum(cents) DIV 100 AS BIGINT)").alias("y"))
    )
    a = daily.select(F.col("d").alias("da"), F.col("y").alias("ya"))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    pairs = a.join(F.broadcast(b), F.col("db") > F.col("da")).select(
        "da",
        "db",
        F.expr(
            f"CAST(((yb - ya) * 1000 + {S} * (db - da)) DIV (db - da) - {S} AS BIGINT)"
        ).alias("slope_milli"),
    )
    ranked = global_row_number(pairs, ["slope_milli", "da", "db"])
    n = pairs.agg(F.count("*").cast("long").alias("n"))
    mid = ranked.crossJoin(F.broadcast(n)).filter(
        (F.col("rn") == F.expr("(n + 1) DIV 2")) | (F.col("rn") == F.expr("(n + 2) DIV 2"))
    )
    return mid.agg(
        F.max("n").alias("n_pairs"),
        F.sum(
            F.col("slope_milli")
            * F.expr("CASE WHEN (n + 1) DIV 2 = (n + 2) DIV 2 THEN 2 ELSE 1 END")
        ).cast("long").alias("med2x_milli"),
    )


@query(
    "agg_equidepth_histogram",
    oracle="""
    WITH c AS (
      SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    b AS (
      SELECT cents, ntile(10) OVER (ORDER BY cents, o_orderkey) AS bucket FROM c
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           min(cents) AS lo_cents,
           max(cents) AS hi_cents,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH (equal-height) histogram of order value — the
    optimizer-statistics build every engine runs under ANALYZE, and the
    binning a feature pipeline uses when equi-width buckets collapse
    under skew. Bucket membership is SQL-exact ntile(10) computed by
    operators/ranking.exact_ntile — one range shuffle + broadcast
    offsets, ZERO WindowExec (a plain ntile() OVER (ORDER BY ...) is
    the single-partition scale-killer the registry-wide plan audit
    bans) — over the TOTAL order (cents, o_orderkey), so bucket edges
    are deterministic cross-engine. Per-bucket stats are integer cents:
    one map-side-combinable aggregation after the rank."""
    from postrack_spark.operators.ranking import exact_ntile

    c = load_tables(spark, sf_dir)["orders"].select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    b = exact_ntile(c, 10, [F.asc("cents"), F.asc("o_orderkey")], "bucket")
    return (
        b.groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .orderBy("bucket")
    )


@query(
    "inventory_abc_xyz_matrix",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents,
      FROM lineitem GROUP BY l_partkey
    ),
    wq AS (
      SELECT l_partkey, epoch_us(l_shipdate) // 604800000000 AS wk,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    mom AS (
      SELECT l_partkey, CAST(sum(q) AS BIGINT) AS s, CAST(sum(q * q) AS BIGINT) AS s2
      FROM wq GROUP BY l_partkey
    ),
    wsp AS (SELECT CAST(count(DISTINCT epoch_us(l_shipdate) // 604800000000) AS BIGINT) AS w
            FROM lineitem),
    cum AS (
      SELECT r.l_partkey, r.cents,
             sum(r.cents) OVER (ORDER BY r.cents DESC, r.l_partkey) AS cum_cents,
             sum(r.cents) OVER () AS total_cents
      FROM rev r
    ),
    classed AS (
      SELECT c.l_partkey, c.cents,
             CASE WHEN c.cum_cents * 5 <= c.total_cents * 4 THEN 'A'
                  WHEN c.cum_cents * 20 <= c.total_cents * 19 THEN 'B'
                  ELSE 'C' END AS abc_class,
             CASE WHEN 4 * wsp.w * m.s2 < 5 * m.s * m.s THEN 'X'
                  WHEN wsp.w * m.s2 < 2 * m.s * m.s THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM cum c JOIN mom m ON m.l_partkey = c.l_partkey CROSS JOIN wsp
    )
    SELECT abc_class, xyz_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(cents) AS BIGINT) AS cell_cents
    FROM classed GROUP BY abc_class, xyz_class
    ORDER BY abc_class, xyz_class
    """,
)
def inventory_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ planning matrix — the inventory-strategy grid: revenue
    importance (ABC, cumulative-share classes via the DISTRIBUTED
    prefix sum, as in agg_pareto_abc) crossed with demand variability
    (XYZ by coefficient of variation of the part's WEEKLY demand,
    zero-demand weeks included via the global week-span W). The CV
    thresholds (X: cv<0.5, Y: cv<1) are tested on cv² by integer
    cross-multiplication — with zero weeks, cv² = (W·Σq² − S²)/S², so
    X ⇔ 4·W·Σq² < 5·S² and Y ⇔ W·Σq² < 2·S² — no division, no sqrt,
    no float anywhere. Headroom: W·Σq² and 5·S² stay far inside int64
    while per-part total quantity < ~10^8. Two fact-sized aggregations
    (per part, per part-week) + one range shuffle for the prefix sum;
    the 9-cell matrix is the output."""
    from postrack_spark.operators.ranking import prefix_sums_by_key

    from postrack_spark.session import pin_small

    li = load_tables(spark, sf_dir)["lineitem"]
    # rev feeds the prefix sum AND the grand total; wq feeds the
    # moments AND the week span (every lineitem row lands in wq, so
    # count_distinct(wk) over wq equals the span over the raw scan) —
    # both pinned: two lineitem scans instead of four.
    rev = pin_small(
        "axz_rev",
        li.groupBy("l_partkey").agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        ),
    )
    wq = pin_small(
        "axz_wq",
        li.select(
            "l_partkey",
            F.expr("unix_micros(l_shipdate) div 604800000000").alias("wk"),
            F.col("l_quantity").cast("long").alias("q"),
        )
        .groupBy("l_partkey", "wk")
        .agg(F.sum("q").cast("long").alias("q")),
    )
    mom = wq.groupBy("l_partkey").agg(
        F.sum("q").cast("long").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("s2"),
    )
    wspan = wq.agg(F.count_distinct("wk").cast("long").alias("w"))
    cum = prefix_sums_by_key(
        rev,
        [F.desc("cents"), F.asc("l_partkey")],
        {"cum_cents": "cents"},
        inclusive=True,
    )
    total = rev.agg(F.sum("cents").cast("long").alias("total_cents"))
    classed = (
        cum.crossJoin(F.broadcast(total))
        .join(mom, "l_partkey")
        .crossJoin(F.broadcast(wspan))
        .select(
            "cents",
            F.when(F.col("cum_cents") * 5 <= F.col("total_cents") * 4, F.lit("A"))
            .when(F.col("cum_cents") * 20 <= F.col("total_cents") * 19, F.lit("B"))
            .otherwise(F.lit("C"))
            .alias("abc_class"),
            F.when(
                4 * F.col("w") * F.col("s2") < 5 * F.col("s") * F.col("s"), F.lit("X")
            )
            .when(F.col("w") * F.col("s2") < 2 * F.col("s") * F.col("s"), F.lit("Y"))
            .otherwise(F.lit("Z"))
            .alias("xyz_class"),
        )
    )
    return (
        classed.groupBy("abc_class", "xyz_class")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum("cents").cast("long").alias("cell_cents"),
        )
        .orderBy("abc_class", "xyz_class")
    )


@query(
    "quality_distribution_drift",
    oracle="""
    WITH v AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             ('0x' || substring(md5(o_orderkey::VARCHAR), 1, 8))::BIGINT % 2 AS grp
      FROM orders
    ),
    bounds AS (SELECT min(cents) AS lo, max(cents) AS hi FROM v),
    bucketed AS (
      SELECT grp,
             least(9, CAST((cents - lo) * 10 // (hi - lo + 1) AS BIGINT)) AS bucket
      FROM v CROSS JOIN bounds
    ),
    counts AS (
      SELECT bucket,
             CAST(count(*) FILTER (grp = 0) AS BIGINT) AS n_a,
             CAST(count(*) FILTER (grp = 1) AS BIGINT) AS n_b
      FROM bucketed GROUP BY bucket
    ),
    tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb FROM counts)
    SELECT bucket, n_a, n_b,
           CAST(n_a * 10000 // ta AS BIGINT) AS share_a_pp10k,
           CAST(n_b * 10000 // tb AS BIGINT) AS share_b_pp10k,
           CAST(abs(n_a * 10000 // ta - n_b * 10000 // tb) AS BIGINT) AS drift_pp10k
    FROM counts CROSS JOIN tot
    ORDER BY bucket
    """,
)
def quality_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/serve distribution-drift detector — the ML-ops check that
    catches a feature shifting between two cohorts before the model
    quietly degrades: order value bucketed into 10 equal-width bins
    over the GLOBAL range, per-cohort shares compared bin-by-bin (the
    cohorts here are a deterministic md5 half-split, standing in for
    train vs serve). Shares and the per-bin drift are integer pp10k —
    an L1-style drift profile that, unlike PSI, needs no logarithm and
    therefore hash-matches cross-engine (sum the drift column for the
    scalar alarm). Plan: one broadcast min/max combine + one
    conditional-count aggregation over the fact scan; bin count fixed,
    so nothing here changes shape at 100 TB."""
    v = load_tables(spark, sf_dir)["orders"].select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (
            F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
            .cast("long") % 2
        ).alias("grp"),
    )
    bounds = v.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    bucketed = v.crossJoin(F.broadcast(bounds)).select(
        "grp",
        F.least(
            F.lit(9), F.expr("CAST((cents - lo) * 10 DIV (hi - lo + 1) AS BIGINT)")
        ).alias("bucket"),
    )
    from postrack_spark.session import pin_small

    # the 10-row bin table feeds the totals AND the final select —
    # pinned so the two fact passes (bounds + bucketing) run once.
    counts = pin_small(
        "drift_counts",
        bucketed.groupBy("bucket").agg(
            F.count_if(F.col("grp") == 0).cast("long").alias("n_a"),
            F.count_if(F.col("grp") == 1).cast("long").alias("n_b"),
        ),
    )
    tot = counts.agg(
        F.sum("n_a").cast("long").alias("ta"), F.sum("n_b").cast("long").alias("tb")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_a",
            "n_b",
            F.expr("CAST(n_a * 10000 DIV ta AS BIGINT)").alias("share_a_pp10k"),
            F.expr("CAST(n_b * 10000 DIV tb AS BIGINT)").alias("share_b_pp10k"),
            F.expr(
                "CAST(abs(n_a * 10000 DIV ta - n_b * 10000 DIV tb) AS BIGINT)"
            ).alias("drift_pp10k"),
        )
        .orderBy("bucket")
    )


@query(
    "agg_hodges_lehmann_location",
    oracle="""
    WITH daily AS (
      SELECT epoch_us(o_orderdate) // 86400000000 AS d,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) // 100 AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT a.d AS da, b.d AS db, CAST(a.y + b.y AS BIGINT) AS m2
      FROM daily a JOIN daily b ON b.d >= a.d
    ),
    ranked AS (
      SELECT m2, row_number() OVER (ORDER BY m2, da, db) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM pairs
    )
    SELECT max(n) AS n_pairs,
           CAST(sum(m2 * CASE WHEN (n + 1) // 2 = (n + 2) // 2
                              THEN 2 ELSE 1 END) AS BIGINT) AS hl4x_dollars
    FROM ranked
    WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
    """,
)
def agg_hodges_lehmann_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann location estimator — the median of all Walsh
    averages (y_i + y_j)/2 over i <= j, the rank-based robust 'center'
    whose breakdown point beats the mean and whose efficiency beats
    the median. Same machinery as agg_theil_sen_trend: the pair frame
    is CALENDAR-bounded (days², not data-sized), pair sums stay
    integer (no /2 — the output is 4x the estimator: the summed two
    middle doubled-values, exact), and the middle ranks come from
    operators/ranking.global_row_number (range shuffle, zero
    WindowExec) with a (m2, da, db) total order. Consumers divide by 4
    when they want the float point estimate; the GATE stays integer."""
    from postrack_spark.operators.ranking import global_row_number

    daily = (
        load_tables(spark, sf_dir)["orders"]
        .select(
            F.expr("unix_micros(o_orderdate) div 86400000000").alias("d"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("d")
        .agg(F.expr("CAST(sum(cents) DIV 100 AS BIGINT)").alias("y"))
    )
    a = daily.select(F.col("d").alias("da"), F.col("y").alias("ya"))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    pairs = a.join(F.broadcast(b), F.col("db") >= F.col("da")).select(
        "da", "db", (F.col("ya") + F.col("yb")).cast("long").alias("m2")
    )
    ranked = global_row_number(pairs, ["m2", "da", "db"])
    n = pairs.agg(F.count("*").cast("long").alias("n"))
    mid = ranked.crossJoin(F.broadcast(n)).filter(
        (F.col("rn") == F.expr("(n + 1) DIV 2")) | (F.col("rn") == F.expr("(n + 2) DIV 2"))
    )
    return mid.agg(
        F.max("n").alias("n_pairs"),
        F.sum(
            F.col("m2")
            * F.expr("CASE WHEN (n + 1) DIV 2 = (n + 2) DIV 2 THEN 2 ELSE 1 END")
        ).cast("long").alias("hl4x_dollars"),
    )


@query(
    "assoc_triple_itemsets",
    oracle="""
    WITH udt AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d, event_type
      FROM events
    )
    SELECT a.event_type AS ta, b.event_type AS tb, c.event_type AS tc,
           CAST(count(*) AS BIGINT) AS support
    FROM udt a
    JOIN udt b ON b.user_id = a.user_id AND b.d = a.d
               AND b.event_type > a.event_type
    JOIN udt c ON c.user_id = a.user_id AND c.d = a.d
               AND c.event_type > b.event_type
    GROUP BY 1, 2, 3
    HAVING count(*) >= 2
    ORDER BY support DESC, ta, tb, tc
    """,
)
def assoc_triple_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets — the next Apriori level above
    assoc_basket_rules' pairs, over (user, day) behavioral baskets:
    which event-type TRIOS co-occur in one user's day (the
    session-intent signal 2-item lift can't see). Baskets are the
    distinct (user, day, type) relation folded to one sorted set per
    user-day; the C(n,3) expansion is ARRAY-LOCAL (n <= 5 types -> at
    most 10 triples per basket, two nested in-array transforms — the
    _edges generator shape one level deeper), never a data self-join;
    support thresholds at 2. The oracle spells the same triples as a
    canonical three-way relational join. Two partial-agg-friendly
    shuffles; output is bounded by C(|type vocabulary|, 3). The
    co-purchase variant of this query is deliberately NOT shipped: at
    every test SF no part triple repeats across orders (max support 1,
    probed via Apriori pruning on the thresholded pair edges), so it
    would gate nothing."""
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("d"),
        "event_type",
    )
    baskets = ev.distinct().groupBy("user_id", "d").agg(
        F.sort_array(F.collect_set("event_type")).alias("ps"))
    # C(n,3) expansion as three chained codegen'd Generate operators
    # (posexplode + two slice-explodes), not the nested interpreted
    # transform/filter lambdas (the graph _edges measurement, one level
    # deeper). ps is sorted, so index order i < j < k IS ta < tb < tc.
    # The middle posexplode index j2 is 0-based within the slice, so
    # the original index j = i + 1 + j2 and the k-suffix starts at
    # 1-based position j + 2 = i + j2 + 3.
    triples = (
        baskets.select(F.posexplode("ps").alias("i", "ta"), "ps")
        .select(
            "ta",
            F.posexplode(F.expr("slice(ps, i + 2, size(ps) - i - 1)")).alias(
                "j2", "tb"
            ),
            "ps",
            "i",
        )
        .select(
            "ta",
            "tb",
            F.explode(
                F.expr("slice(ps, i + j2 + 3, size(ps) - i - j2 - 2)")
            ).alias("tc"),
        )
    )
    return (
        triples.groupBy("ta", "tb", "tc")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= 2)
        .orderBy(F.desc("support"), "ta", "tb", "tc")
    )
