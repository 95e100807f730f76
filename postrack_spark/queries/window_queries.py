"""Window-function coverage: ranking, analytic (lag/lead), frames,
top-k per group, sessionization.

SURVEY.md §2b: absent in the reference; in this engine window-over-lsn is
also the CDC materialization primitive (see cdc_queries / cdc module).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from postrack_spark.queries.registry import query
from postrack_spark.session import load_tables


@query(
    "window_topk_orders_per_customer",
    oracle="""
    SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS price, CAST(rn AS INT) AS rn
    FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    WHERE rn <= 3
    ORDER BY c_custkey, rn
    """,
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group via row_number — the scalable top-k pattern
    (single shuffle on the partition key; no global sort)."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        t["orders"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            "rn",
        )
        .orderBy("c_custkey", "rn")
    )


@query(
    "window_rank_dense_ntile",
    oracle="""
    SELECT o_orderstatus,
           CAST(max(rnk) AS BIGINT)  AS max_rank,
           CAST(max(drnk) AS BIGINT) AS max_dense_rank,
           CAST(count(DISTINCT tile) AS BIGINT) AS n_tiles
    FROM (
      SELECT o_orderstatus,
             rank()       OVER (PARTITION BY o_orderstatus ORDER BY round(o_totalprice, 0)) AS rnk,
             dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY round(o_totalprice, 0)) AS drnk,
             ntile(4)     OVER (PARTITION BY o_orderstatus ORDER BY round(o_totalprice, 0), o_orderkey) AS tile
      FROM orders
    )
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile, summarized per partition for a stable
    comparison (tie order inside rank is value-deterministic)."""
    t = load_tables(spark, sf_dir)
    by_price = W.partitionBy("o_orderstatus").orderBy(F.round("o_totalprice", 0))
    by_price_key = W.partitionBy("o_orderstatus").orderBy(
        F.round("o_totalprice", 0), F.asc("o_orderkey")
    )
    return (
        t["orders"]
        .select(
            "o_orderstatus",
            F.rank().over(by_price).alias("rnk"),
            F.dense_rank().over(by_price).alias("drnk"),
            F.ntile(4).over(by_price_key).alias("tile"),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.max("rnk").cast("bigint").alias("max_rank"),
            F.max("drnk").cast("bigint").alias("max_dense_rank"),
            F.countDistinct("tile").alias("n_tiles"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "window_running_sum_frame",
    oracle="""
    SELECT c_custkey, o_orderkey,
           round(running_total, 2) AS running_total
    FROM (
      SELECT o_custkey AS c_custkey, o_orderkey,
             sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_total
      FROM orders
    )
    WHERE c_custkey <= 50
    ORDER BY c_custkey, o_orderkey
    """,
)
def window_running_sum_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total with an explicit ROWS frame."""
    t = load_tables(spark, sf_dir)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        t["orders"]
        .withColumn("running_total", F.sum("o_totalprice").over(w))
        .filter(F.col("o_custkey") <= 50)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            F.round("running_total", 2).alias("running_total"),
        )
        .orderBy("c_custkey", "o_orderkey")
    )


@query(
    "window_lag_lead_deltas",
    oracle="""
    SELECT c_custkey,
           count(*) AS n_gaps,
           CAST(sum(gap_days) AS BIGINT) AS total_gap_days,
           round(avg(price_delta), 4) AS avg_price_delta
    FROM (
      SELECT o_custkey AS c_custkey,
             date_diff('day',
                       lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap_days,
             o_totalprice - lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS price_delta
      FROM orders
    )
    WHERE gap_days IS NOT NULL
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
)
def window_lag_lead_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytics: inter-order gap days + price delta per customer."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t["orders"]
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap_days"),
            (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("price_delta"),
        )
        .filter(F.col("gap_days").isNotNull())
        .groupBy("c_custkey")
        .agg(
            F.count("*").alias("n_gaps"),
            F.sum("gap_days").cast("bigint").alias("total_gap_days"),
            F.round(F.avg("price_delta"), 4).alias("avg_price_delta"),
        )
        .orderBy("c_custkey")
    )


@query(
    "window_first_last_range",
    oracle="""
    SELECT o_orderstatus AS status,
           round(sum(first_price), 2) AS sum_first,
           round(sum(last_price), 2)  AS sum_last
    FROM (
      SELECT o_orderstatus,
             first_value(o_totalprice) OVER (PARTITION BY o_custkey, o_orderstatus
                                             ORDER BY o_orderdate, o_orderkey) AS first_price,
             last_value(o_totalprice) OVER (PARTITION BY o_custkey, o_orderstatus
                                            ORDER BY o_orderdate, o_orderkey
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
      FROM orders
    )
    GROUP BY o_orderstatus
    ORDER BY status
    """,
)
def window_first_last_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with full-partition frame."""
    t = load_tables(spark, sf_dir)
    w_order = W.partitionBy("o_custkey", "o_orderstatus").orderBy("o_orderdate", "o_orderkey")
    w_full = w_order.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        t["orders"]
        .select(
            F.col("o_orderstatus").alias("status"),
            F.first("o_totalprice").over(w_order).alias("first_price"),
            F.last("o_totalprice").over(w_full).alias("last_price"),
        )
        .groupBy("status")
        .agg(
            F.round(F.sum("first_price"), 2).alias("sum_first"),
            F.round(F.sum("last_price"), 2).alias("sum_last"),
        )
        .orderBy("status")
    )


@query(
    "sessionize_user_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('second', lag(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id,
           CAST(count(DISTINCT session_id) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def sessionize_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: gap>30min starts a new session (lag + running sum).

    The batch twin of streaming session_window(ts, gap) — see
    postrack_spark.streaming. Scales: one shuffle on user_id.
    """
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, W.currentRow)
    flagged = t["events"].select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts").cast("long") - F.lag("ts").over(w).cast("long") > 1800),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    return (
        flagged.withColumn("session_id", F.sum("new_session").over(w_run))
        .groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


@query(
    "window_percentile_rank_dist",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority,
             round(percent_rank() OVER w, 6) AS pr,
             round(cume_dist() OVER w, 6) AS cd,
             o_totalprice
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
    )
    SELECT o_orderpriority,
           round(avg(pr), 6) AS avg_percent_rank,
           round(avg(cd), 6) AS avg_cume_dist,
           round(max(CASE WHEN pr <= 0.5 THEN o_totalprice END), 2) AS price_at_median_rank
    FROM ranked
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def window_percentile_rank_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist (the relative-rank analytic pair) per
    priority group, folded to group-level checks (avg of percent_rank
    ≈ 0.5 by construction; price at the median rank)."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    ranked = t["orders"].select(
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        "o_totalprice",
    )
    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.round(F.avg("pr"), 6).alias("avg_percent_rank"),
            F.round(F.avg("cd"), 6).alias("avg_cume_dist"),
            F.round(
                F.max(F.when(F.col("pr") <= 0.5, F.col("o_totalprice"))), 2
            ).alias("price_at_median_rank"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "window_nth_value_steps",
    oracle="""
    SELECT o_custkey,
           CAST(count(*) OVER w AS BIGINT) AS n_orders,
           round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price,
           round(nth_value(o_totalprice, 3) OVER w, 2) AS third_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
       AND o_custkey < 200
    ORDER BY o_custkey
    """,
)
def window_nth_value_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over an unbounded frame: each customer's 2nd and 3rd
    order price in date order (NULL when fewer orders) — completes the
    analytic-function surface next to first/last/lag/lead."""
    t = load_tables(spark, sf_dir)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    w_rn = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 200)
        .select(
            "o_custkey",
            F.count("*").over(w).alias("n_orders"),
            F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
            F.round(F.nth_value("o_totalprice", 3).over(w), 2).alias("third_price"),
            F.row_number().over(w_rn).alias("__rn"),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .orderBy("o_custkey")
    )


@query(
    "window_cumulative_distinct_users",
    oracle="""
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    fs AS (
      SELECT day, user_id,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM du
    ),
    daily AS (
      SELECT day, CAST(count(*) AS BIGINT) AS n_active,
             CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
      FROM fs GROUP BY day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n_active, n_new,
           CAST(sum(n_new) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_distinct_users
    FROM daily ORDER BY day
    """,
)
def window_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the exact running-distinct
    that a naive count(distinct) over an expanding window would need
    O(n) state for. First-seen flags (row_number = 1 per user) reduce
    it to a daily sum + a tiny cumulative window over days: shuffles
    are on (day, user) dedup and per-user first-seen, both partial-agg
    friendly; the final running sum runs over one row per day."""
    from postrack_spark.session import load_tables as _lt

    t = _lt(spark, sf_dir)
    du = t["events"].select(F.to_date("ts").alias("day"), "user_id").distinct()
    fs = du.withColumn(
        "rn", F.row_number().over(W.partitionBy("user_id").orderBy("day"))
    )
    daily = fs.groupBy("day").agg(
        F.count("*").cast("bigint").alias("n_active"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("bigint").alias("n_new"),
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_active",
        "n_new",
        F.sum("n_new").over(w).cast("bigint").alias("cum_distinct_users"),
    ).orderBy("day")


@query(
    "window_activity_streaks",
    oracle="""
    WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    idx AS (
      SELECT user_id,
             date_diff('day', DATE '2024-01-01', day) AS d,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM du
    ),
    islands AS (
      SELECT user_id, d - rn AS grp, CAST(count(*) AS BIGINT) AS len
      FROM idx GROUP BY user_id, d - rn
    )
    SELECT user_id,
           CAST(sum(len) AS BIGINT) AS n_active_days,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS longest_streak
    FROM islands
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def window_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-day activity streaks per user via
    the day-index-minus-row-number trick — consecutive days share a
    constant difference, so islands fall out of one window + one
    groupBy (no self-join, no recursion). All integers. Scale: the
    window and both aggregations share the user_id partitioning."""
    from postrack_spark.session import load_tables as _lt

    t = _lt(spark, sf_dir)
    du = t["events"].select("user_id", F.to_date("ts").alias("day")).distinct()
    idx = du.select(
        "user_id",
        F.datediff("day", F.lit("2024-01-01").cast("date")).alias("d"),
        F.row_number().over(W.partitionBy("user_id").orderBy("day")).alias("rn"),
    )
    islands = (
        idx.groupBy("user_id", (F.col("d") - F.col("rn")).alias("grp"))
        .agg(F.count("*").cast("bigint").alias("len"))
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.sum("len").cast("bigint").alias("n_active_days"),
            F.count("*").cast("bigint").alias("n_streaks"),
            F.max("len").cast("bigint").alias("longest_streak"),
        )
        .orderBy("user_id")
    )


@query(
    "window_centered_moving_average",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, n,
           CAST(sum(n) OVER w AS BIGINT) AS win_sum,
           CAST(count(*) OVER w AS BIGINT) AS win_days,
           round(sum(n) OVER w * 1.0 / count(*) OVER w, 6) AS centered_ma7
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ORDER BY day
    """,
)
def window_centered_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered 7-day moving average of daily volume — the smoothing
    pass behind seasonality charts, with the edge-shrinking window made
    explicit (win_days < 7 at the boundaries, and the average divides
    by the REAL window size, not a constant). Integer sum / integer
    count, one division. The single-partition window runs over one row
    per day — an already-aggregated tiny frame (CLAUDE.md rule)."""
    from postrack_spark.session import load_tables as _lt

    t = _lt(spark, sf_dir)
    daily = (
        t["events"]
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    w = W.orderBy("day").rowsBetween(-3, 3)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        F.sum("n").over(w).cast("bigint").alias("win_sum"),
        F.count("*").over(w).cast("bigint").alias("win_days"),
        F.round(F.sum("n").over(w) / F.count("*").over(w), 6).alias("centered_ma7"),
    ).orderBy("day")


@query(
    "window_revenue_deciles",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT cents,
             CAST(ntile(10) OVER (ORDER BY cents DESC, o_custkey) AS INT) AS decile
      FROM rev
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(cents) / 100.0, 2) AS revenue,
           round(min(cents) / 100.0, 2) AS min_revenue,
           round(max(cents) / 100.0, 2) AS max_revenue
    FROM scored GROUP BY decile ORDER BY decile
    """,
)
def window_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue deciles (the classic concentration report:
    'the top decile holds X% of revenue'). The per-customer frame is
    one row per customer — data-sized at 100 TB — so the decile
    assignment uses operators/ranking.exact_ntile (range-partitioned
    distributed rank; SQL-exact ntile semantics with deterministic
    tie-breaks), NOT an unpartitioned ntile window: zero WindowExec in
    the plan (audited). Money as integer cents end to end; one range
    shuffle + two hash aggs."""
    from postrack_spark.operators.ranking import exact_ntile

    t = load_tables(spark, sf_dir)
    rev = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
        )
    )
    scored = exact_ntile(rev, 10, [F.desc("cents"), F.asc("o_custkey")], "decile")
    return (
        scored.groupBy("decile")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.round(F.sum("cents") / 100.0, 2).alias("revenue"),
            F.round(F.min("cents") / 100.0, 2).alias("min_revenue"),
            F.round(F.max("cents") / 100.0, 2).alias("max_revenue"),
        )
        .orderBy("decile")
    )


@query(
    "agg_exact_percentile_rank",
    oracle="""
    WITH v AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
      FROM orders
    ),
    r AS (
      SELECT cents, row_number() OVER (ORDER BY cents, o_orderkey) AS rn,
             count(*) OVER () AS n
      FROM v
    )
    SELECT
      CAST(max(n) AS BIGINT) AS n_orders,
      CAST(sum(CASE WHEN ((n-1)*50) % 100 = 0 AND rn = 1 + ((n-1)*50) // 100
                      THEN cents * 100
                    WHEN rn = 1 + ((n-1)*50) // 100
                      THEN cents * (100 - ((n-1)*50) % 100)
                    WHEN ((n-1)*50) % 100 > 0 AND rn = 2 + ((n-1)*50) // 100
                      THEN cents * (((n-1)*50) % 100)
               END) AS BIGINT) AS p50_cents_x100,
      CAST(sum(CASE WHEN ((n-1)*90) % 100 = 0 AND rn = 1 + ((n-1)*90) // 100
                      THEN cents * 100
                    WHEN rn = 1 + ((n-1)*90) // 100
                      THEN cents * (100 - ((n-1)*90) % 100)
                    WHEN ((n-1)*90) % 100 > 0 AND rn = 2 + ((n-1)*90) // 100
                      THEN cents * (((n-1)*90) % 100)
               END) AS BIGINT) AS p90_cents_x100,
      CAST(sum(CASE WHEN ((n-1)*99) % 100 = 0 AND rn = 1 + ((n-1)*99) // 100
                      THEN cents * 100
                    WHEN rn = 1 + ((n-1)*99) // 100
                      THEN cents * (100 - ((n-1)*99) % 100)
                    WHEN ((n-1)*99) % 100 > 0 AND rn = 2 + ((n-1)*99) // 100
                      THEN cents * (((n-1)*99) % 100)
               END) AS BIGINT) AS p99_cents_x100
    FROM r
    """,
)
def agg_exact_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global percentiles at scale: rank-based selection instead
    of a value-buffering percentile aggregate. Spark's `percentile`
    holds every (value, count) in the final reducer's buffer —
    agg_percentiles documents that limit; THIS query is the
    100 TB-correct exact path: one distributed global rank
    (operators/ranking, range shuffle, no window), the boundary ranks
    for each requested p computed from the broadcast row count, and
    continuous interpolation done in INTEGER hundredth-of-cent space
    (quantile_cont semantics, zero float divergence cross-engine).
    One O(n) conditional-sum pass selects and interpolates the <=6
    boundary rows; everything else contributes NULL."""
    from postrack_spark.operators.ranking import global_row_number

    t = load_tables(spark, sf_dir)
    v = t["orders"].select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_orderkey",
    )
    ranked = global_row_number(v, [F.asc("cents"), F.asc("o_orderkey")], "rn")
    # n = max(rn) by construction (row_number over a total order is
    # 1..n): deriving the count from the already-materialized ranked
    # frame drops the second orders scan the count aggregate ran
    # (2 parquet scans in the executed plan -> 1).
    total = ranked.groupBy().agg(F.max("rn").alias("n"))
    j = ranked.join(F.broadcast(total))

    def interp(k: int):
        pos = (F.col("n") - 1) * k  # hundredths above rank 1
        lo = 1 + F.floor(pos / 100)
        frac = pos % 100
        c = F.col("cents")
        return F.sum(
            F.when((frac == 0) & (F.col("rn") == lo), c * 100)
            .when(F.col("rn") == lo, c * (100 - frac))
            .when((frac > 0) & (F.col("rn") == lo + 1), c * frac)
        ).cast("bigint")

    return j.agg(
        F.max("n").cast("bigint").alias("n_orders"),
        interp(50).alias("p50_cents_x100"),
        interp(90).alias("p90_cents_x100"),
        interp(99).alias("p99_cents_x100"),
    )


@query(
    "agg_group_percentile_rank",
    oracle="""
    WITH v AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
      FROM orders
    ),
    r AS (
      SELECT o_orderpriority, cents,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY cents, o_orderkey) AS rn,
             count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM v
    )
    SELECT o_orderpriority,
           CAST(max(n) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN ((n-1)*50) % 100 = 0 AND rn = 1 + ((n-1)*50) // 100
                           THEN cents * 100
                         WHEN rn = 1 + ((n-1)*50) // 100
                           THEN cents * (100 - ((n-1)*50) % 100)
                         WHEN ((n-1)*50) % 100 > 0 AND rn = 2 + ((n-1)*50) // 100
                           THEN cents * (((n-1)*50) % 100)
                    END) AS BIGINT) AS p50_cents_x100,
           CAST(sum(CASE WHEN ((n-1)*95) % 100 = 0 AND rn = 1 + ((n-1)*95) // 100
                           THEN cents * 100
                         WHEN rn = 1 + ((n-1)*95) // 100
                           THEN cents * (100 - ((n-1)*95) % 100)
                         WHEN ((n-1)*95) % 100 > 0 AND rn = 2 + ((n-1)*95) // 100
                           THEN cents * (((n-1)*95) % 100)
                    END) AS BIGINT) AS p95_cents_x100
    FROM r
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_group_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact PER-GROUP percentiles without value buffering — the
    grouped companion of agg_exact_percentile_rank. Here the rank is an
    ordinary PARTITIONED window (one shuffle on the group key, state =
    one counter per task), the group sizes ride along as a partitioned
    count window, and the same integer-space interpolation picks the
    boundary rows in one grouped conditional-sum. Unlike the exact
    `percentile` aggregate (buffer = every distinct value per group,
    the limit agg_percentiles documents), per-task state here is O(1):
    this shape survives both many groups AND huge groups."""
    t = load_tables(spark, sf_dir)
    v = t["orders"].select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_orderkey",
    )
    w = W.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    wn = W.partitionBy("o_orderpriority")
    r = v.select(
        "o_orderpriority",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )

    def interp(k: int):
        pos = (F.col("n") - 1) * k
        lo = 1 + F.floor(pos / 100)
        frac = pos % 100
        c = F.col("cents")
        return F.sum(
            F.when((frac == 0) & (F.col("rn") == lo), c * 100)
            .when(F.col("rn") == lo, c * (100 - frac))
            .when((frac > 0) & (F.col("rn") == lo + 1), c * frac)
        ).cast("bigint")

    return (
        r.groupBy("o_orderpriority")
        .agg(
            F.max("n").cast("bigint").alias("n_orders"),
            interp(50).alias("p50_cents_x100"),
            interp(95).alias("p95_cents_x100"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "window_clamped_running_balance",
    oracle="""
    WITH net AS (
      SELECT l_suppkey AS supp,
             epoch_us(l_shipdate) // 86400000000 AS d,
             CAST(sum(CASE WHEN l_returnflag = 'R'
                           THEN CAST(l_quantity AS BIGINT)
                           ELSE -CAST(l_quantity AS BIGINT) END) AS BIGINT) AS x
      FROM lineitem GROUP BY 1, 2
    ),
    sums AS (
      SELECT supp, d,
             sum(x) OVER (PARTITION BY supp ORDER BY d) AS s
      FROM net
    ),
    run AS (
      SELECT supp, d, s,
             min(s) OVER (PARTITION BY supp ORDER BY d) AS m
      FROM sums
    ),
    bal AS (
      SELECT supp, d,
             CAST(s - least(0, m) AS BIGINT) AS b
      FROM run
    )
    SELECT supp,
           CAST(max_by(b, d) AS BIGINT) AS end_bal,
           CAST(max(b) AS BIGINT) AS peak_bal,
           CAST(count(*) FILTER (b = 0) AS BIGINT) AS zero_days
    FROM bal GROUP BY supp ORDER BY supp
    """,
)
def window_clamped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inventory balance that cannot go negative — a running sum with a
    floor at zero, the classic NON-LINEAR recurrence
    (b_i = max(0, b_{i-1} + x_i)) that naive thinking says needs a
    sequential scan. It distributes exactly via the prefix identity
    b_i = S_i - min(0, min_{j<=i} S_j): a plain cumulative sum plus a
    running minimum OVER that sum — two PARTITIONED windows per
    supplier, so every per-key series parallelizes and no single-task
    window appears. Day totals are pre-aggregated (one row per
    supplier-day; l_quantity is integral so the arithmetic is exact),
    day is unique within each partition, making the RANGE-default
    frame semantics identical across engines (the documented peer-row
    trap). Output folds to one row per supplier (end/peak balance,
    days pinned at the floor)."""
    net = (
        load_tables(spark, sf_dir)["lineitem"]
        .select(
            F.col("l_suppkey").alias("supp"),
            F.expr("unix_micros(l_shipdate) div 86400000000").alias("d"),
            F.when(F.col("l_returnflag") == "R", F.col("l_quantity").cast("long"))
            .otherwise(-F.col("l_quantity").cast("long"))
            .alias("xi"),
        )
        .groupBy("supp", "d")
        .agg(F.sum("xi").cast("long").alias("x"))
    )
    w = W.partitionBy("supp").orderBy("d")
    run = net.withColumn("s", F.sum("x").over(w)).withColumn(
        "m", F.min("s").over(w)
    )
    bal = run.select(
        "supp", "d", (F.col("s") - F.least(F.lit(0), F.col("m"))).cast("long").alias("b")
    )
    return (
        bal.groupBy("supp")
        .agg(
            F.max_by("b", "d").cast("long").alias("end_bal"),
            F.max("b").cast("long").alias("peak_bal"),
            F.count_if(F.col("b") == 0).cast("long").alias("zero_days"),
        )
        .orderBy("supp")
    )


# Shared by window_forward_fill_locf and streaming_forward_fill (the
# stateful streaming twin maintains the same per-user summary).
_LOCF_ORACLE = """
    WITH base AS (
      SELECT user_id,
             lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
             lpad(CAST(event_id AS VARCHAR), 12, '0') AS ok,
             CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
      FROM events
    ),
    filled AS (
      SELECT user_id, v,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ok
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv
      FROM base
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (v IS NULL) AS BIGINT) AS n_gaps,
           CAST(count(*) FILTER (fv IS NULL) AS BIGINT) AS n_leading,
           CAST(sum(CAST(floor(fv * 1000) AS BIGINT)) AS BIGINT) AS fill_milli
    FROM filled GROUP BY user_id
    ORDER BY user_id
    """


@query("window_forward_fill_locf", oracle=_LOCF_ORACLE)
def window_forward_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill / last-observation-carried-forward — the gap-repair
    operator every sensor/ticker pipeline runs, expressed as
    last_value IGNORE NULLS over a ROWS frame (the SQL:2011 null
    treatment clause; Spark spells it last(v, ignorenulls=True)).
    The 'view' rows are the deterministic gap fixture. The window is
    PARTITIONED per user with a total (epoch_us, event_id) string
    order key, so fills are deterministic under ties and the plan
    parallelizes per key; leading nulls (no prior observation) stay
    null and are counted separately. The checksum quantizes by
    floor(value*1000) BEFORE summing (exact-row doubles, association-
    free integer sum). Output folds to one row per user."""
    ev = load_tables(spark, sf_dir)["events"]
    ok = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    base = ev.select(
        "user_id",
        ok.alias("ok"),
        F.when(F.col("event_type") == "view", F.lit(None)).otherwise(F.col("value")).alias("v"),
    )
    w = W.partitionBy("user_id").orderBy("ok").rowsBetween(W.unboundedPreceding, 0)
    filled = base.withColumn("fv", F.last("v", ignorenulls=True).over(w))
    return (
        filled.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.count_if(F.col("v").isNull()).cast("long").alias("n_gaps"),
            F.count_if(F.col("fv").isNull()).cast("long").alias("n_leading"),
            F.sum(F.floor(F.col("fv") * 1000).cast("long")).cast("long").alias("fill_milli"),
        )
        .orderBy("user_id")
    )


@query(
    "agg_winsorized_trimmed_mean",
    oracle="""
    WITH v AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
      FROM orders
    ),
    ranked AS (
      SELECT cents, row_number() OVER (ORDER BY cents, o_orderkey) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM v
    ),
    sel AS (
      SELECT max(n) AS n, max(n * 5 // 100) AS t,
             CAST(sum(CASE WHEN rn = n * 5 // 100 + 1 THEN cents END) AS BIGINT) AS lo_cents,
             CAST(sum(CASE WHEN rn = n - n * 5 // 100 THEN cents END) AS BIGINT) AS hi_cents,
             CAST(sum(CASE WHEN rn > n * 5 // 100 AND rn <= n - n * 5 // 100
                           THEN cents END) AS BIGINT) AS mid_sum
      FROM ranked
    )
    SELECT n, CAST(t AS BIGINT) AS n_trimmed_each_side, lo_cents, hi_cents,
           CAST(mid_sum * 1000 // (n - 2 * t) AS BIGINT) AS trimmed_mean_milli,
           CAST((mid_sum + t * (lo_cents + hi_cents)) * 1000 // n AS BIGINT)
             AS winsor_mean_milli
    FROM sel
    """,
)
def agg_winsorized_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust means — 5% trimmed (drop each tail) and 5% winsorized
    (clamp each tail to the boundary order statistics) — the outlier-
    immune aggregates a metrics platform reports next to the raw mean.
    Exact at scale: boundary ranks are integer type-1 selections on the
    DISTRIBUTED global rank (operators/ranking, single-consumer
    conditional-sum pass — the agg_exact_percentile_rank shape, no
    WindowExec, no value-buffering percentile aggregate), and both
    means are integer milli-cents via floor division, so nothing
    floats. Winsorization is algebra on the same one aggregation row:
    mid-sum + t*(lo+hi). Headroom: mid_sum*1000 needs total cents <
    9.2e15 — coarsen units beyond that (the agg_corr_exact rule)."""
    from postrack_spark.operators.ranking import global_row_number

    v = load_tables(spark, sf_dir)["orders"].select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
    )
    ranked = global_row_number(v, [F.asc("cents"), F.asc("o_orderkey")], "rn")
    total = v.groupBy().agg(F.count("*").cast("long").alias("n"))
    j = ranked.join(F.broadcast(total))
    t = F.expr("n * 5 DIV 100")
    sel = j.agg(
        F.max("n").alias("n"),
        F.max(t).cast("long").alias("t"),
        F.sum(F.when(F.col("rn") == t + 1, F.col("cents"))).cast("long").alias("lo_cents"),
        F.sum(F.when(F.col("rn") == F.col("n") - t, F.col("cents"))).cast("long").alias("hi_cents"),
        F.sum(
            F.when((F.col("rn") > t) & (F.col("rn") <= F.col("n") - t), F.col("cents"))
        ).cast("long").alias("mid_sum"),
    )
    return sel.select(
        "n",
        F.col("t").alias("n_trimmed_each_side"),
        "lo_cents",
        "hi_cents",
        F.expr("CAST(mid_sum * 1000 DIV (n - 2 * t) AS BIGINT)").alias("trimmed_mean_milli"),
        F.expr(
            "CAST((mid_sum + t * (lo_cents + hi_cents)) * 1000 DIV n AS BIGINT)"
        ).alias("winsor_mean_milli"),
    )


@query(
    "agg_weighted_median_rank",
    oracle="""
    WITH v AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(l_quantity AS BIGINT) AS w,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    ordered AS (
      SELECT cents, w,
             sum(w) OVER (ORDER BY cents, l_orderkey, l_linenumber
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
             sum(w) OVER () AS total_w
      FROM v
    )
    SELECT CAST(min(total_w) AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN cumw * 2 >= total_w THEN cents END) AS BIGINT)
             AS weighted_median_cents
    FROM ordered
    """,
)
def agg_weighted_median_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT weighted median (lower median: smallest value whose
    cumulative weight reaches half the total) of line-item price
    weighted by quantity — all integer arithmetic.

    The hard part at 100 TB is the GLOBAL running weight sum: a naive
    ``sum(w) OVER (ORDER BY ...)`` is a single-partition window. Here
    it is a TWO-LEVEL prefix sum built on the distributed rank:
    global_row_number orders the frame (one range shuffle), rows are
    grouped into fixed-size rank blocks, per-block totals are
    prefix-summed by the same tiny non-equi broadcast join the ranking
    operator uses (block count = n / block_size, config-bounded by
    choosing block_size ~ n/P), and the intra-block running sum is an
    ordinary PARTITIONED window over <= block_size rows. cumw(row) =
    block_offset + intra-block cumsum — exact, no unpartitioned
    window anywhere (audited).

    HISTORY: pulled in round 3 because the ranked frame feeds TWO
    consumers (block totals + the cumsum join) and re-instantiated rank
    subplans could disagree (optimizer dropped the in-partition sort
    under the order-insensitive aggregate — see ranking.py docstring).
    RESTORED in round 4: global_row_number now pins its enumeration
    internally (localCheckpoint before any consumer plan exists), so
    multi-reference consumers are safe by construction; the adversarial
    replay of this exact shape runs 5x per suite run in
    tests/test_ranking.py::test_ranking_double_reference_stable."""
    from postrack_spark.operators.ranking import global_row_number

    t = load_tables(spark, sf_dir)
    v = t["lineitem"].select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.col("l_quantity").cast("bigint").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    order = [F.asc("cents"), F.asc("l_orderkey"), F.asc("l_linenumber")]
    block_size = 65536
    ranked = global_row_number(v, order, "rn").withColumn(
        "blk", F.expr(f"(rn - 1) div {block_size}")
    )
    blocks = ranked.groupBy("blk").agg(F.sum("w").alias("bw"))
    a, b = blocks.alias("a"), blocks.alias("b")
    offsets = (
        a.join(F.broadcast(b), F.col("b.blk") < F.col("a.blk"), "left")
        .groupBy(F.col("a.blk").alias("blk"))
        .agg(F.coalesce(F.sum("b.bw"), F.lit(0)).alias("blk_off"))
    )
    w_blk = W.partitionBy("blk").orderBy("rn")
    cum = (
        ranked.join(F.broadcast(offsets), "blk")
        .withColumn("cumw", F.col("blk_off") + F.sum("w").over(w_blk))
    )
    total = v.groupBy().agg(F.sum("w").cast("bigint").alias("total_w"))
    return (
        cum.join(F.broadcast(total))
        .groupBy()
        .agg(
            F.min("total_w").cast("bigint").alias("total_weight"),
            F.min(
                F.when(F.col("cumw") * 2 >= F.col("total_w"), F.col("cents"))
            ).cast("bigint").alias("weighted_median_cents"),
        )
    )


@query(
    "window_range_interval_sum",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id,
             CAST(epoch_us(ts) AS BIGINT) // 1000000 AS s,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT event_id, user_id,
           CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY s
                                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS hour_cents
    FROM ev
    ORDER BY event_id
    """,
)
def window_range_interval_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame windowing — the VALUE-distance frame the ROWS-frame
    family (window_running_sum_frame etc.) can't express: per user,
    the money sum of everything in the trailing 3600 SECONDS, frame
    bounds measured on the epoch-seconds axis. RANGE frames are the
    one window flavor where tied order keys are SAFE by construction —
    peers enter the frame together, so no tie-break column is needed
    (the inverse of the prefix_sums_by_key rule, worth pinning
    cross-engine for exactly that reason). Seconds go through
    epoch_us // 1e6 on both sides (the cast-rounding trap); cents are
    per-row quantized before the window sum (association trap).
    Scale: partitioned by user — Spark's WindowExec runs after one
    hash exchange, no global window anywhere."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].select(
        "event_id",
        "user_id",
        F.floor(F.unix_micros("ts") / F.lit(1000000)).cast("long").alias("s"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = W.partitionBy("user_id").orderBy("s").rangeBetween(-3600, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.sum("cents").over(w).cast("long").alias("hour_cents"),
    ).orderBy("event_id")
