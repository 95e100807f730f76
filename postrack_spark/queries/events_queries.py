"""Event-stream analytics over the events table (batch twins of the
streaming operators in postrack_spark.streaming): JSON extraction,
time-bucketed windows, funnels, as-of joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from postrack_spark.queries.registry import query
from postrack_spark.session import load_tables


@query(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(json_extract(props, '$.k')::INT) AS BIGINT) AS sum_k,
           CAST(max(json_extract(props, '$.k')::INT) AS INT) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (get_json_object ≡ typed projection out
    of a semi-structured payload — same shape as the CDC envelope)."""
    t = load_tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(k).cast("bigint").alias("sum_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "events_hourly_rollup",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    WHERE ts < TIMESTAMP '2024-01-03'
    GROUP BY 1, 2
    ORDER BY hour, event_type
    """,
)
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch twin of streaming
    groupBy(window(ts, '1 hour')) — see streaming module)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("ts") < F.lit("2024-01-03").cast("timestamp"))
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("hour", "event_type")
    )


@query(
    "events_funnel_view_purchase",
    oracle="""
    SELECT count(*) AS n_converting_users,
           CAST(sum(n_purchases_after) AS BIGINT) AS total_purchases_after
    FROM (
      SELECT v.user_id,
             count(DISTINCT p.event_id) AS n_purchases_after
      FROM (SELECT user_id, min(ts) AS first_view FROM events
            WHERE event_type = 'view' GROUP BY user_id) v
      JOIN events p
        ON p.user_id = v.user_id AND p.event_type = 'purchase' AND p.ts > v.first_view
      GROUP BY v.user_id
    )
    """,
)
def events_funnel_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel: users whose first view precedes >=1 purchase; join on
    user_id (single shuffle) then temporal predicate."""
    t = load_tables(spark, sf_dir)
    first_view = (
        t["events"]
        .filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    purchases = t["events"].filter(F.col("event_type") == "purchase")
    per_user = (
        purchases.join(first_view, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.countDistinct("event_id").alias("n_purchases_after"))
    )
    return per_user.agg(
        F.count("*").alias("n_converting_users"),
        F.sum("n_purchases_after").cast("bigint").alias("total_purchases_after"),
    )


@query(
    "events_asof_last_click",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type, value,
             last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_value
      FROM events
    )
    SELECT user_id,
           count(*) AS n_purchases,
           count(last_click_value) AS n_with_prior_click,
           round(coalesce(sum(last_click_value), 0), 2) AS sum_click_value
    FROM ordered
    WHERE event_type = 'purchase'
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join within one stream: for each purchase, the value of the
    user's most recent strictly-earlier click (last_value IGNORE NULLS
    over a trailing frame) — the composition-of-built-ins as-of pattern
    (no pandas merge_asof needed when both sides share the stream)."""
    t = load_tables(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    click_val = F.when(F.col("event_type") == "click", F.col("value"))
    enriched = t["events"].withColumn(
        "last_click_value", F.last(click_val, ignorenulls=True).over(w)
    )
    return (
        enriched.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.count("last_click_value").alias("n_with_prior_click"),
            F.round(F.coalesce(F.sum("last_click_value"), F.lit(0.0)), 2).alias(
                "sum_click_value"
            ),
        )
        .orderBy("user_id")
    )


@query(
    "events_top_users_by_value",
    oracle="""
    SELECT user_id,
           round(sum(value), 2) AS total_value,
           count(*) AS n_events,
           count(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    ORDER BY total_value DESC, user_id
    LIMIT 20
    """,
)
def events_top_users_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users by total event value (deterministic tiebreak)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.round(F.sum("value"), 2).alias("total_value"),
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .orderBy(F.desc("total_value"), F.asc("user_id"))
        .limit(20)
    )


@query(
    "events_ts_znorm_similarity",
    oracle="""
    WITH up AS (SELECT user_id, CAST(EXTRACT(hour FROM ts) AS INT) AS h,
                       avg(value) AS v
                FROM events GROUP BY user_id, h),
    uz AS (SELECT user_id, h,
                  (v - avg(v) OVER (PARTITION BY user_id))
                    / NULLIF(stddev_pop(v) OVER (PARTITION BY user_id), 0) AS z
           FROM up),
    gp AS (SELECT CAST(EXTRACT(hour FROM ts) AS INT) AS h, avg(value) AS v
           FROM events GROUP BY h),
    gz AS (SELECT h, (v - avg(v) OVER ()) / NULLIF(stddev_pop(v) OVER (), 0) AS z
           FROM gp)
    SELECT user_id, round(sum(uz.z * gz.z) / count(*), 4) AS similarity
    FROM uz JOIN gz ON uz.h = gz.h
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_ts_znorm_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity: each user's hour-of-day activity profile
    z-normalized and correlated against the global profile (z-normalized
    Euclidean/Pearson family). All built-ins — two tiny aggregates plus
    window functions; the 24-row global profile broadcasts."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    ev = t["events"].withColumn("h", F.hour("ts"))
    up = ev.groupBy("user_id", "h").agg(F.avg("value").alias("v"))
    w_user = Window.partitionBy("user_id")
    uz = up.select(
        "user_id",
        "h",
        (
            (F.col("v") - F.avg("v").over(w_user))
            / F.when(F.stddev_pop("v").over(w_user) != 0, F.stddev_pop("v").over(w_user))
        ).alias("z"),
    )
    gp = ev.groupBy("h").agg(F.avg("value").alias("v"))
    w_all = Window.partitionBy()
    gz = gp.select(
        F.col("h").alias("gh"),
        (
            (F.col("v") - F.avg("v").over(w_all))
            / F.when(F.stddev_pop("v").over(w_all) != 0, F.stddev_pop("v").over(w_all))
        ).alias("gz"),
    )
    return (
        uz.join(F.broadcast(gz), uz.h == gz.gh)
        .groupBy("user_id")
        .agg(F.round(F.sum(F.col("z") * F.col("gz")) / F.count("*"), 4).alias("similarity"))
        .orderBy("user_id")
    )


@query(
    "events_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort FROM events GROUP BY user_id
    ),
    activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
           date_diff('day', cohort, d) AS day_offset,
           count(*) AS n_users
    FROM activity JOIN firsts USING (user_id)
    WHERE date_diff('day', cohort, d) <= 7
    GROUP BY cohort, day_offset
    ORDER BY cohort_day, day_offset
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day; count how
    many are active again k days later (k <= 7) — the standard
    engagement matrix. Two aggregations + one equi-join on user_id; the
    firsts side is per-user (broadcastable at dimension scale)."""
    ev = load_tables(spark, sf_dir)["events"]
    firsts = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort"))
    activity = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    joined = activity.join(firsts, "user_id").withColumn(
        "day_offset", F.datediff("d", "cohort")
    )
    return (
        joined.filter(F.col("day_offset") <= 7)
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.col("day_offset").cast("bigint").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "events_asof_next_purchase_latency",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_type,
             first_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_purchase_ts
      FROM events
    ),
    lat AS (
      SELECT user_id,
             date_diff('second', ts, next_purchase_ts) AS latency_s
      FROM ordered
      WHERE event_type = 'view' AND next_purchase_ts IS NOT NULL
    )
    SELECT count(*) AS n_matched,
           CAST(min(latency_s) AS BIGINT) AS min_latency_s,
           round(quantile_cont(latency_s, 0.5), 2) AS p50_latency_s,
           round(quantile_cont(latency_s, 0.9), 2) AS p90_latency_s
    FROM lat
    """,
)
def events_asof_next_purchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for each view, the user's next purchase
    (first_value IGNORE NULLS over a strictly-following frame) and the
    view→purchase latency distribution — the mirror of
    events_asof_last_click's trailing frame. Same one-shuffle window
    pattern: both sides share the stream, no join at all."""
    t = load_tables(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    purchase_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    enriched = t["events"].withColumn(
        "next_purchase_ts", F.first(purchase_ts, ignorenulls=True).over(w)
    )
    lat = (
        enriched.filter(
            (F.col("event_type") == "view") & F.col("next_purchase_ts").isNotNull()
        )
        .select(
            (
                F.unix_timestamp("next_purchase_ts") - F.unix_timestamp("ts")
            ).alias("latency_s")
        )
    )
    return lat.agg(
        F.count("*").alias("n_matched"),
        F.min("latency_s").cast("bigint").alias("min_latency_s"),
        F.round(F.expr("percentile(latency_s, 0.5)"), 2).alias("p50_latency_s"),
        F.round(F.expr("percentile(latency_s, 0.9)"), 2).alias("p90_latency_s"),
    )


@query(
    "events_sliding_window_rollup",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts) - g.k * INTERVAL '1 hour',
                    '%Y-%m-%d %H:00') AS win_start,
           event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events, unnest(generate_series(0, 1)) g(k)
    WHERE ts < TIMESTAMP '2024-01-02'
    GROUP BY 1, 2
    ORDER BY win_start, event_type
    """,
)
def events_sliding_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation (2-hour windows every 1 hour): each
    event lands in two overlapping windows — the batch twin of
    streaming groupBy(window(ts, '2 hours', '1 hour')). The oracle
    reconstructs window membership with generate_series."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("ts") < F.lit("2024-01-02").cast("timestamp"))
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:00").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("win_start", "event_type")
    )


@query(
    "events_resample_gapfill",
    oracle="""
    WITH bounds AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
      FROM events WHERE user_id < 20 GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, g.h AS hour FROM bounds, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) g(h)
    ),
    actual AS (
      SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS c,
             round(sum(value), 2) AS v
      FROM events WHERE user_id < 20 GROUP BY 1, 2
    )
    SELECT g.user_id, strftime(g.hour, '%Y-%m-%d %H:00') AS hour,
           CAST(coalesce(a.c, 0) AS BIGINT) AS n,
           coalesce(a.v, 0.0) AS total_value,
           (a.c IS NULL) AS is_gap
    FROM grid g LEFT JOIN actual a ON a.user_id = g.user_id AND a.hour = g.hour
    ORDER BY g.user_id, hour
    """,
)
def events_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap filling: per-user dense hourly
    grid (sequence + explode between each user's first and last hour)
    left-joined to actual hourly rollups, missing hours zero-filled —
    the standard pre-model regularization for event series. The grid
    explode is per-key and bounded by the key's own span, so it scales
    with user activity, not the corpus."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].filter(F.col("user_id") < 20)
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour"),
    )
    actual = ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("c"), F.round(F.sum("value"), 2).alias("v")
    )
    return (
        grid.join(actual, ["user_id", "hour"], "left")
        .select(
            "user_id",
            F.date_format("hour", "yyyy-MM-dd HH:00").alias("hour"),
            F.coalesce("c", F.lit(0)).cast("bigint").alias("n"),
            F.coalesce("v", F.lit(0.0)).alias("total_value"),
            F.col("c").isNull().alias("is_gap"),
        )
        .orderBy("user_id", "hour")
    )


@query(
    "events_ewma_daily",
    oracle="""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v100
      FROM events WHERE user_id < 10 GROUP BY 1, 2
    ),
    idx AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY day) - 1 AS t
      FROM daily
    ),
    scaled AS (
      SELECT *, v100 * CAST(CASE WHEN t = 0 THEN 1 ELSE power(2, t - 1) END AS BIGINT) AS u
      FROM idx
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day, round(v100 / 100.0, 2) AS v,
           floor(power(0.5, t) * sum(u) OVER (PARTITION BY user_id ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100) / 10000.0 AS ewma
    FROM scaled
    ORDER BY user_id, day
    """,
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily per-user value
    (alpha = 1/2): the recursion s_t = (v_t + s_{t-1})/2 restated as a
    single windowed cumsum, s_t = 0.5^t · Σ u_i / 100 with integer
    u_i = cents(v_i)·2^{i-1} (u_0 = cents(v_0)) — no recursion, no UDF,
    one window per key, and the accumulation is exact-integer so the
    result is bit-identical across engines regardless of their window-
    sum association order."""
    t = load_tables(spark, sf_dir)
    # per-event integer cents BEFORE the sum: double summation order
    # differs across engines (and across partitionings), integer
    # summation cannot — the whole pipeline stays exact until the final
    # display division
    daily = (
        t["events"]
        .filter(F.col("user_id") < 10)
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("v100"))
    )
    w_idx = W.partitionBy("user_id").orderBy("day")
    idx = daily.withColumn("t", F.row_number().over(w_idx) - 1)
    # exact-integer accumulation: cents × powers of two stay within
    # 2^63, so the cumsum is associativity-independent (DuckDB's
    # segment-tree window sum vs Spark's sequential sum would otherwise
    # diverge by an ulp at rounding boundaries)
    scaled = idx.withColumn(
        "u",
        F.col("v100")
        * F.when(F.col("t") == 0, F.lit(1))
        .otherwise(F.pow(F.lit(2.0), F.col("t") - 1).cast("bigint")),
    )
    w_cum = (
        W.partitionBy("user_id")
        .orderBy("t")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return scaled.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(F.col("v100") / 100.0, 2).alias("v"),
        # floor, not round: halving cents yields exact .xxxx5 values
        # where decimal-string HALF_UP (Spark) and binary rounding
        # (DuckDB) systematically disagree; floor is boundary-free and
        # every upstream double op here is exact or correctly-rounded
        # identically in both engines
        (
            F.floor(F.pow(F.lit(0.5), F.col("t")) * F.sum("u").over(w_cum) * 100) / 10000.0
        ).alias("ewma"),
    ).orderBy("user_id", "day")


@query(
    "events_variant_extract",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(avg(json_extract(props, '$.k')::INT), 4) AS avg_k,
           CAST(sum(CASE WHEN json_extract(props, '$.k')::INT > 50 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_k_over_50
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured data: parse_json once
    into a binary variant, then variant_get typed extraction — the
    open-format successor to per-access get_json_object string parsing
    (one parse, many cheap accesses; the right shape for wide sparse
    JSON at scale)."""
    t = load_tables(spark, sf_dir)
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "int")
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.avg(k), 4).alias("avg_k"),
            F.sum(F.when(k > 50, 1).otherwise(0)).cast("bigint").alias("n_k_over_50"),
        )
        .orderBy("event_type")
    )


@query(
    "events_anomaly_daily_zscore",
    oracle="""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v100
      FROM events WHERE user_id < 50 GROUP BY 1, 2
    ),
    stats AS (
      SELECT user_id, count(*) AS n, sum(v100) AS s1, sum(v100 * v100) AS s2
      FROM daily GROUP BY user_id
    )
    SELECT d.user_id, strftime(d.day, '%Y-%m-%d') AS day,
           round(d.v100 / 100.0, 2) AS v,
           floor((s.n * d.v100 - s.s1)
                 / sqrt((s.n * s.s2 - s.s1 * s.s1) * s.n / (s.n - 1.0))
                 * 10000) / 10000.0 AS z
    FROM daily d JOIN stats s USING (user_id)
    WHERE s.n > 1 AND s.n * s.s2 - s.s1 * s.s1 > 0
      AND abs((s.n * d.v100 - s.s1)
              / sqrt((s.n * s.s2 - s.s1 * s.s1) * s.n / (s.n - 1.0))) >= 2
    ORDER BY user_id, day
    """,
)
def events_anomaly_daily_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly detection: per-user daily totals whose z-score (sample
    std) exceeds 2. All statistics accumulate as exact integers (cents,
    sums, sums of squares) so both engines compute the identical
    doubles only in the final identical-shaped expression — no Welford
    vs naive variance divergence, no sum-association drift; floor
    truncation avoids round-half boundaries (cf. events_ewma_daily)."""
    t = load_tables(spark, sf_dir)
    daily = (
        t["events"]
        .filter(F.col("user_id") < 50)
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("v100"))
    )
    stats = daily.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("v100").alias("s1"),
        F.sum(F.col("v100") * F.col("v100")).alias("s2"),
    )
    j = daily.join(stats, "user_id")
    znum = F.col("n") * F.col("v100") - F.col("s1")
    var_num = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    z = znum / F.sqrt(var_num * F.col("n") / (F.col("n") - F.lit(1.0)))
    return (
        j.filter((F.col("n") > 1) & (var_num > 0) & (F.abs(z) >= 2))
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.round(F.col("v100") / 100.0, 2).alias("v"),
            (F.floor(z * 10000) / 10000.0).alias("z"),
        )
        .orderBy("user_id", "day")
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    pairs AS (
      SELECT prev AS from_type, event_type AS to_type, count(*) AS n
      FROM seq WHERE prev IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 6) AS p
    FROM pairs
    ORDER BY from_type, to_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral transition matrix: per-user event-type bigrams with
    row-normalized probabilities (first-order Markov estimate) — one
    lag window per user, the normalizing window runs on the 25-cell
    aggregated matrix, never on the event stream."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        t["events"]
        .withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("from_type"), F.col("event_type").alias("to_type"))
        .agg(F.count("*").alias("n"))
    )
    w_norm = W.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_norm), 6).alias("p"),
    ).orderBy("from_type", "to_type")


@query(
    "events_rfm_segmentation",
    oracle="""
    WITH rfm AS (
      SELECT user_id,
             max(ts) AS last_ts,
             count(*) AS frequency,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS monetary100
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    scored AS (
      SELECT user_id, frequency, round(monetary100 / 100.0, 2) AS monetary,
             ntile(4) OVER (ORDER BY last_ts DESC, user_id) AS r,
             ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f,
             ntile(4) OVER (ORDER BY monetary100 DESC, user_id) AS m
      FROM rfm
    )
    SELECT r || '-' || f || '-' || m AS segment,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(frequency) AS BIGINT) AS total_purchases,
           round(sum(monetary), 2) AS total_value
    FROM scored
    GROUP BY 1
    ORDER BY segment
    """,
)
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user recency/frequency/monetary quartiles
    (ntile semantics with deterministic tie-breaks), rolled up per
    segment. Monetary sums accumulate as integer cents (exact). The
    per-user frame is one row per user — corpus-sized at 100 TB — so
    the quartiles come from operators/ranking.exact_ntile (range-
    partitioned distributed rank), NOT an unpartitioned ntile window:
    the plan has zero single-partition WindowExec nodes (asserted by
    tests/test_plans.py::test_rfm_no_unpartitioned_window)."""
    from postrack_spark.operators.ranking import exact_ntile

    t = load_tables(spark, sf_dir)
    rfm = (
        t["events"]
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").alias("frequency"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("monetary100"),
        )
    )
    scored = rfm
    scored = exact_ntile(scored, 4, [F.desc("last_ts"), F.asc("user_id")], "r")
    scored = exact_ntile(scored, 4, [F.desc("frequency"), F.asc("user_id")], "f")
    scored = exact_ntile(scored, 4, [F.desc("monetary100"), F.asc("user_id")], "m")
    scored = scored.select(
        "user_id",
        "frequency",
        F.round(F.col("monetary100") / 100.0, 2).alias("monetary"),
        "r",
        "f",
        "m",
    )
    return (
        scored.groupBy(
            F.concat_ws("-", F.col("r"), F.col("f"), F.col("m")).alias("segment")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("frequency").cast("bigint").alias("total_purchases"),
            F.round(F.sum("monetary"), 2).alias("total_value"),
        )
        .orderBy("segment")
    )


@query(
    "events_asof_nearest_click",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click,
             first_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_click
      FROM events
    ),
    nearest AS (
      SELECT user_id,
             CASE
               WHEN prev_click IS NULL AND next_click IS NULL THEN NULL
               WHEN next_click IS NULL THEN date_diff('second', prev_click, ts)
               WHEN prev_click IS NULL THEN date_diff('second', ts, next_click)
               WHEN date_diff('second', prev_click, ts)
                    <= date_diff('second', ts, next_click)
                 THEN date_diff('second', prev_click, ts)
               ELSE date_diff('second', ts, next_click)
             END AS gap_s
      FROM ordered WHERE event_type = 'purchase'
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(count(gap_s) AS BIGINT) AS n_with_click,
           CAST(min(gap_s) AS BIGINT) AS min_gap_s,
           CAST(max(gap_s) AS BIGINT) AS max_gap_s,
           round(avg(gap_s), 2) AS avg_gap_s
    FROM nearest
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (both directions, closest wins, backward on
    ties): each purchase's temporal distance to the user's nearest
    click — sensor-alignment semantics composed from the backward and
    forward as-of windows, still join-free (both frames share one
    per-user sort)."""
    t = load_tables(spark, sf_dir)
    base = W.partitionBy("user_id").orderBy("ts", "event_id")
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    prev_c = F.last(click_ts, ignorenulls=True).over(
        base.rowsBetween(W.unboundedPreceding, -1)
    )
    next_c = F.first(click_ts, ignorenulls=True).over(
        base.rowsBetween(1, W.unboundedFollowing)
    )
    back = F.col("ts").cast("long") - F.col("prev_click").cast("long")
    fwd = F.col("next_click").cast("long") - F.col("ts").cast("long")
    gap = (
        F.when(F.col("prev_click").isNull() & F.col("next_click").isNull(), None)
        .when(F.col("next_click").isNull(), back)
        .when(F.col("prev_click").isNull(), fwd)
        .when(back <= fwd, back)
        .otherwise(fwd)
    )
    nearest = (
        t["events"]
        .withColumn("prev_click", prev_c)
        .withColumn("next_click", next_c)
        .filter(F.col("event_type") == "purchase")
        .withColumn("gap_s", gap)
    )
    return (
        nearest.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.count("gap_s").cast("bigint").alias("n_with_click"),
            F.min("gap_s").cast("bigint").alias("min_gap_s"),
            F.max("gap_s").cast("bigint").alias("max_gap_s"),
            F.round(F.avg("gap_s"), 2).alias("avg_gap_s"),
        )
        .orderBy("user_id")
    )


@query(
    "events_dau_wau_stickiness",
    oracle="""
    WITH daily AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM daily),
    wau AS (
      SELECT d.day, count(DISTINCT u.user_id) AS wau
      FROM days d JOIN daily u
        ON u.day <= d.day AND u.day >= d.day - INTERVAL 6 DAY
      GROUP BY d.day
    ),
    dau AS (SELECT day, count(*) AS dau FROM daily GROUP BY day)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(dau.dau AS BIGINT) AS dau, CAST(wau.wau AS BIGINT) AS wau,
           round(dau.dau * 1.0 / wau.wau, 4) AS stickiness
    FROM days d JOIN dau USING (day) JOIN wau USING (day)
    ORDER BY day
    """,
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement metrics: daily active users, trailing-7-day active
    users, and DAU/WAU stickiness. The distinct-users-over-window
    problem is solved on the (day, user) DEDUPED table — a range join
    over ~days×7 rows — never with a distinct-over-window on the raw
    stream (unbounded state at volume)."""
    from postrack_spark.session import pin_small

    t = load_tables(spark, sf_dir)
    # the deduped (day, user) frame feeds four branches (day list, DAU,
    # WAU range join, final) — pinned so the events scan + distinct
    # runs once per action (4 scans before).
    daily = pin_small(
        "dauwau_daily",
        t["events"].select(
            F.date_trunc("day", "ts").alias("day"), "user_id"
        ).distinct(),
    )
    days = daily.select("day").distinct()
    dau = daily.groupBy("day").agg(F.count("*").alias("dau"))
    wau = (
        days.alias("d")
        .join(
            daily.alias("u"),
            (F.col("u.day") <= F.col("d.day"))
            & (F.col("u.day") >= F.date_sub(F.col("d.day"), 6)),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        days.join(dau, "day")
        .join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("dau").cast("bigint"),
            F.col("wau").cast("bigint"),
            F.round(F.col("dau") / F.col("wau"), 4).alias("stickiness"),
        )
        .orderBy("day")
    )


@query(
    "events_bot_regularity",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
               AS gap_s
      FROM events
    ),
    stats AS (
      SELECT user_id, count(gap_s) AS n, min(gap_s) AS min_gap,
             sum(gap_s) AS s1, sum(gap_s * gap_s) AS s2
      FROM gaps WHERE gap_s IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
           CAST(min_gap AS BIGINT) AS min_gap_s,
           CAST(s1 // n AS BIGINT) AS mean_gap_s,
           CAST(n * s2 - s1 * s1 AS BIGINT) AS var_numerator,
           (min_gap <= 30 AND n >= 20) AS burst_suspect
    FROM stats
    WHERE n >= 20 AND (min_gap <= 30 OR n * s2 - s1 * s1 = 0)
    ORDER BY user_id
    """,
)
def events_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/spam screening on inter-event timing (the behavioral
    data-quality filter training pipelines run before ingestion):
    per-user gap statistics — minimum gap, integer mean, and the exact
    integer variance numerator n·Σx² − (Σx)² (zero ⇔ perfectly regular
    timing, the automation signature). Users flagged on burstiness
    (gap ≤ 30 s) or perfect regularity. All arithmetic integer-exact."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        t["events"]
        .withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "user_id",
            (F.col("ts").cast("long") - F.col("prev_ts").cast("long")).alias("gap_s"),
        )
    )
    stats = gaps.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.min("gap_s").alias("min_gap"),
        F.sum("gap_s").alias("s1"),
        F.sum(F.col("gap_s") * F.col("gap_s")).alias("s2"),
    )
    var_num = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    return (
        stats.filter((F.col("n") >= 20) & ((F.col("min_gap") <= 30) | (var_num == 0)))
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n_gaps"),
            F.col("min_gap").cast("bigint").alias("min_gap_s"),
            F.floor(F.col("s1") / F.col("n")).cast("bigint").alias("mean_gap_s"),
            var_num.cast("bigint").alias("var_numerator"),
            ((F.col("min_gap") <= 30) & (F.col("n") >= 20)).alias("burst_suspect"),
        )
        .orderBy("user_id")
    )


@query(
    "events_trend_regression",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
      FROM daily GROUP BY 1
    )
    SELECT event_type, n_days,
           round((n_days * sxy - sx * sy) * 1.0 / (n_days * sxx - sx * sx), 6)
             AS slope_per_day,
           round((sy * sxx - sx * sxy) * 1.0 / (n_days * sxx - sx * sx), 6)
             AS intercept
    FROM s
    ORDER BY event_type
    """,
)
def events_trend_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily-volume trend: OLS slope/intercept of count-per-day
    against day index. The moments (n, Σx, Σy, Σxy, Σx²) stay exact
    integers through both aggregations — slope and intercept are each
    ONE integer-ratio division, so the doubles are bit-identical
    cross-engine (the fp-association trap in CLAUDE.md). Scale: two
    hash aggs, grouped by (type, day) then type; no window, no sort."""
    t = load_tables(spark, sf_dir)
    daily = (
        t["events"]
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias("x"),
        )
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    s = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    det = F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "event_type",
        "n_days",
        F.round((F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")) / det, 6)
            .alias("slope_per_day"),
        F.round((F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")) / det, 6)
            .alias("intercept"),
    ).orderBy("event_type")


@query(
    "events_type_affinity",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS u FROM events),
    singles AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_both,
           round(n_both * u * 1.0 / (sa.n * sb.n), 6) AS lift
    FROM pairs
    CROSS JOIN tot
    JOIN singles sa ON sa.event_type = type_a
    JOIN singles sb ON sb.event_type = type_b
    ORDER BY type_a, type_b
    """,
)
def events_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity between event types: lift = P(a,b) /
    (P(a)P(b)) over per-user type sets. The numerator and denominator
    are pure integer products (n_both·U and n_a·n_b) — one final
    division. Scale: the self-join runs on the DEDUPED (user, type)
    relation — O(users·types), not O(events²); singles and the user
    total are broadcast back onto the 10-row pair table."""
    from postrack_spark.session import pin_small

    t = load_tables(spark, sf_dir)
    # the deduped (user, type) relation feeds four branches (total,
    # singles, both self-join sides) — pinned: one events scan, not 5.
    ut = pin_small(
        "affinity_ut", t["events"].select("user_id", "event_type").distinct()
    )
    tot = ut.agg(F.countDistinct("user_id").cast("bigint").alias("u"))
    singles = ut.groupBy("event_type").agg(F.count("*").cast("bigint").alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("bigint").alias("n_both"))
    )
    sa = singles.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = singles.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pairs.crossJoin(F.broadcast(tot))
        .join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            F.round(F.col("n_both") * F.col("u") / (F.col("n_a") * F.col("n_b")), 6)
                .alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "events_funnel_paths",
    oracle="""
    WITH ranked AS (
      SELECT user_id, CAST(ts AS DATE) AS day, event_type,
             row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id, day,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= 3
      GROUP BY user_id, day
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM paths
    GROUP BY path
    ORDER BY n_sessions DESC, path
    """,
)
def events_funnel_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the first-3-event journey per (user, day) and how
    often each journey occurs — the sequence-mining view product teams
    build on clickstreams. Order inside a path is pinned by (ts,
    event_id), encoded as a sortable struct array (collect_list alone
    is order-nondeterministic under parallel merge — the classic Spark
    trap). Scale: one key window + two hash aggs; paths are
    fixed-length strings, no blow-up."""
    t = load_tables(spark, sf_dir)
    day = F.to_date("ts").alias("day")
    w = W.partitionBy("user_id", F.to_date("ts")).orderBy("ts", "event_id")
    ranked = (
        t["events"]
        .select("user_id", day, "event_type", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )
    paths = ranked.groupBy("user_id", "day").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
    )


@query(
    "events_attribution_clicks",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, value,
             epoch_us(ts) // 1000000 AS sec, ts, event_id
      FROM events
    ),
    k AS (
      SELECT user_id, event_type, value,
             sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY sec
                     RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING) AS n_clicks
      FROM e
    ),
    p AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             coalesce(n_clicks, 0) AS nc
      FROM k WHERE event_type = 'purchase'
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CASE WHEN nc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
           CAST(sum(CASE WHEN nc > 0 THEN cents // nc ELSE 0 END) AS BIGINT)
             AS per_click_share_cents,
           CAST(sum(CASE WHEN nc > 0 THEN cents % nc ELSE 0 END) AS BIGINT)
             AS remainder_cents
    FROM p GROUP BY user_id ORDER BY user_id
    """,
)
def events_attribution_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click attribution with EXACT money math: each purchase's value
    (integer cents) splits evenly across the user's clicks in the
    preceding hour — integer division plus an explicit remainder, so
    allocation is auditable to the cent (float splits never re-add to
    the original). The click count per purchase is one RANGE-frame
    window over epoch seconds; no join. Scale: per-user window +
    per-user aggregate, both on the same key partitioning."""
    t = load_tables(spark, sf_dir)
    e = t["events"].select(
        "user_id", "event_type", "value",
        F.col("ts").cast("long").alias("sec"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, -1)
    )
    k = e.withColumn(
        "n_clicks",
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).over(w),
    )
    p = k.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.coalesce(F.col("n_clicks"), F.lit(0)).alias("nc"),
    )
    nc_pos = F.col("nc") > 0
    return (
        p.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_purchases"),
            F.sum(F.when(nc_pos, 1).otherwise(0)).cast("bigint").alias("n_attributed"),
            F.sum(F.when(nc_pos, F.expr("cents DIV nc")).otherwise(0))
                .cast("bigint").alias("per_click_share_cents"),
            F.sum(F.when(nc_pos, F.col("cents") % F.col("nc")).otherwise(0))
                .cast("bigint").alias("remainder_cents"),
        )
        .orderBy("user_id")
    )


@query(
    "events_ordered_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t_view
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_buy
      FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t_click
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    d AS (
      SELECT p.user_id,
             (epoch_us(p.t_buy) // 1000000) - (epoch_us(v.t_view) // 1000000) AS s
      FROM p JOIN v ON v.user_id = p.user_id
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_then_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_full_funnel,
           CAST((SELECT sum(s) FROM d) AS BIGINT) AS total_funnel_seconds
    """,
)
def events_ordered_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRICT ordered funnel: first view -> first click AFTER that view
    -> first purchase AFTER that click (order enforced between stages,
    unlike the co-occurrence funnel events_funnel_view_purchase). Each
    stage is one aggregate + one conditional join on user_id — the
    min-timestamp-per-stage formulation product analytics engines
    compile funnels to. Duration reported as an exact integer seconds
    sum. Scale: per-stage frames shrink monotonically; every join is on
    the user key with the smaller (later-stage) side broadcastable."""
    from postrack_spark.session import pin_small

    t = load_tables(spark, sf_dir)
    ev = t["events"]
    # per-stage frames each have 2-3 consumers (next stage, duration
    # join, stage count) and are already assumed broadcastable by the
    # funnel design; pinning them stops each consumer re-running the
    # events scan (measured 10 scans before, 1 after).
    v = pin_small(
        "funnel_v",
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view")),
    )
    c = pin_small(
        "funnel_c",
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click")),
    )
    p = pin_small(
        "funnel_p",
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy")),
    )
    d = p.join(F.broadcast(v), "user_id").select(
        (F.col("t_buy").cast("long") - F.col("t_view").cast("long")).alias("s")
    )
    nv = v.agg(F.count("*").cast("bigint").alias("n_view"))
    nc = c.agg(F.count("*").cast("bigint").alias("n_view_then_click"))
    np_ = p.agg(F.count("*").cast("bigint").alias("n_full_funnel"))
    ns = d.agg(F.sum("s").cast("bigint").alias("total_funnel_seconds"))
    # 1-row combines — not data-path crossJoins
    return nv.crossJoin(nc).crossJoin(np_).crossJoin(ns)


@query(
    "events_cohort_ltv",
    oracle="""
    WITH fw AS (
      SELECT user_id,
             min(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7)
               AS cohort_week
      FROM events GROUP BY user_id
    ),
    wk AS (
      SELECT e.user_id, f.cohort_week,
             (date_diff('day', DATE '2024-01-01', CAST(e.ts AS DATE)) // 7)
               - f.cohort_week AS age_weeks,
             CAST(round(e.value * 100) AS BIGINT) AS cents
      FROM events e JOIN fw f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'
    ),
    cell AS (
      SELECT cohort_week, age_weeks,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_buyers,
             CAST(sum(cents) AS BIGINT) AS cents
      FROM wk GROUP BY cohort_week, age_weeks
    )
    SELECT CAST(cohort_week AS INT) AS cohort_week,
           CAST(age_weeks AS INT) AS age_weeks,
           n_buyers,
           round(cents / 100.0, 2) AS revenue,
           round(sum(cents) OVER (PARTITION BY cohort_week ORDER BY age_weeks
                                  ROWS UNBOUNDED PRECEDING) / 100.0, 2)
             AS cumulative_revenue
    FROM cell
    ORDER BY cohort_week, age_weeks
    """,
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: users cohorted by first-activity
    week, purchase revenue per (cohort, weeks-since) cell, plus the
    running LTV per cohort. Money rides integer cents through the
    windowed cumsum (the cross-engine association trap) and converts
    once at the output. Scale: first-activity is a per-user aggregate
    (broadcastable), cells are a small matrix, and the cumulative
    window runs over one row per (cohort, age)."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    week = (F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) / 7).cast("int")
    fw = ev.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    wk = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(fw), "user_id")
        .select(
            "user_id",
            "cohort_week",
            (week - F.col("cohort_week")).alias("age_weeks"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    cell = wk.groupBy("cohort_week", "age_weeks").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_buyers"),
        F.sum("cents").cast("bigint").alias("cents"),
    )
    cum = W.partitionBy("cohort_week").orderBy("age_weeks").rowsBetween(
        W.unboundedPreceding, 0
    )
    return cell.select(
        F.col("cohort_week").cast("int").alias("cohort_week"),
        F.col("age_weeks").cast("int").alias("age_weeks"),
        "n_buyers",
        F.round(F.col("cents") / 100.0, 2).alias("revenue"),
        F.round(F.sum("cents").over(cum) / 100.0, 2).alias("cumulative_revenue"),
    ).orderBy("cohort_week", "age_weeks")


@query(
    "events_wow_change",
    oracle="""
    WITH wk AS (
      SELECT event_type,
             (date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7) AS week,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, week, n,
             lag(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
      FROM wk
    )
    SELECT event_type, CAST(week AS INT) AS week, n,
           CAST(prev_n AS BIGINT) AS prev_n,
           round((n - prev_n) * 1.0 / prev_n, 6) AS wow_change
    FROM lagged
    ORDER BY event_type, week
    """,
)
def events_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week volume change per event type — the growth-metric
    staple. Integer weekly counts, one division per row against the
    lagged count (NULL on each type's first week, in both engines).
    Scale: one hash agg + a per-type lag window over one row per
    week."""
    t = load_tables(spark, sf_dir)
    week = (F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) / 7).cast("int")
    wk = t["events"].groupBy("event_type", week.alias("week")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    w = W.partitionBy("event_type").orderBy("week")
    lagged = wk.withColumn("prev_n", F.lag("n").over(w))
    return lagged.select(
        "event_type",
        F.col("week").cast("int").alias("week"),
        "n",
        F.col("prev_n").cast("bigint").alias("prev_n"),
        F.round((F.col("n") - F.col("prev_n")) / F.col("prev_n"), 6).alias("wow_change"),
    ).orderBy("event_type", "week")


@query(
    "events_cusum_changepoint",
    oracle="""
    WITH ev AS (
      SELECT event_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS t
      FROM ev
    ),
    ordered AS (
      SELECT ts,
             CAST(row_number() OVER w AS BIGINT) AS i,
             CAST(sum(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS BIGINT) AS c
      FROM ev
      WINDOW w AS (ORDER BY ts, event_id)
    ),
    stats AS (
      SELECT i, ts, CAST(abs(n * c - i * t) AS BIGINT) AS s
      FROM ordered, tot
    )
    SELECT (SELECT n FROM tot) AS n,
           (SELECT t FROM tot) AS total_cents,
           s AS max_stat, i AS at_i,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS at_ts
    FROM stats ORDER BY s DESC, i ASC LIMIT 1
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT CUSUM changepoint: the time where the event-value series
    deviates most from its global mean — argmax over i of
    |n·C_i − i·T| (the mean-centered cumulative sum scaled by n to
    stay integral; C = running cents, T = total). The drift/level-shift
    locator for metric streams, bit-exact cross-engine.

    Scale shape: ONE distributed prefix-sum pass produces BOTH the
    running sum and the position (prefix of a constant-1 column — no
    separate rank assignment, no join), then a scalar broadcast and
    TakeOrderedAndProject(1) for the argmax. Zero unpartitioned
    windows; ts stringified per the cross-engine timestamp trap."""
    from postrack_spark.operators.ranking import prefix_sums_by_key
    from postrack_spark.session import load_tables

    ev = load_tables(spark, sf_dir)["events"].select(
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.lit(1).cast("long").alias("one"),
    )
    tot = ev.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("t"),
    )
    cum = prefix_sums_by_key(
        ev,
        [F.asc("ts"), F.asc("event_id")],
        {"c": "cents", "i": "one"},
        inclusive=True,
    )
    stats = cum.crossJoin(F.broadcast(tot)).select(
        "n",
        F.col("t").alias("total_cents"),
        F.abs(F.col("n") * F.col("c") - F.col("i") * F.col("t"))
        .cast("long")
        .alias("max_stat"),
        F.col("i").cast("long").alias("at_i"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("at_ts"),
    )
    return stats.orderBy(F.desc("max_stat"), F.asc("at_i")).limit(1)


@query(
    "events_acf_lags",
    oracle="""
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day_idx,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT l.lag, a.x AS xa, b.x AS xb
      FROM (SELECT unnest(range(1, 8)) AS lag) l
      JOIN daily a ON TRUE
      JOIN daily b ON b.day_idx = a.day_idx + l.lag
    ),
    m AS (
      SELECT lag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xa) AS BIGINT) AS sa, CAST(sum(xb) AS BIGINT) AS sb,
             CAST(sum(xa * xb) AS BIGINT) AS sab,
             CAST(sum(xa * xa) AS BIGINT) AS saa,
             CAST(sum(xb * xb) AS BIGINT) AS sbb
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INT) AS lag, n,
           CAST(floor((1000000.0 * CAST(n * sab - sa * sb AS DOUBLE))
                      / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
                         * sqrt(CAST(n * sbb - sb * sb AS DOUBLE)))) AS BIGINT)
             AS acf_ppm
    FROM m ORDER BY lag
    """,
)
def events_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily event-count series at lags
    1..7 — the seasonality probe a time-series pipeline runs before
    choosing a model. Exact integer moments: days index as
    epoch-microseconds div 86400e6 (pure integer, no calendar
    functions), daily counts are BIGINTs, and each lag's Pearson terms
    (n, Σx, Σy, Σxy, Σx², Σy²) stay integer-exact; the only floating
    point is the final correctly-rounded sqrt/divide, floored to ppm —
    IEEE-deterministic cross-engine because both sides evaluate the
    identical expression shape on identical integers. Scale: the raw
    scan folds to one row per DAY map-side (O(days) shuffle); the
    lag-join and moments run on that tiny aggregated frame (the
    7-lag expansion is a broadcast over ~O(days) rows, not the fact
    table). At extreme daily volumes the integer moments approach
    int64 range before the day count does — switch the Σxy terms to
    DECIMAL(38,0) there; headroom is ample at every test SF."""
    ev = load_tables(spark, sf_dir)["events"]
    daily = (
        ev.select(F.expr("unix_micros(ts) div 86400000000").alias("day_idx"))
        .groupBy("day_idx")
        .agg(F.count("*").cast("long").alias("x"))
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("day_idx").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("day_idx").alias("db"), F.col("x").alias("xb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))  # tiny aggregated frame x 7 lags
        .join(b, F.col("db") == F.col("da") + F.col("lag"))
    )
    m = pairs.groupBy("lag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xa").cast("long").alias("sa"),
        F.sum("xb").cast("long").alias("sb"),
        F.sum(F.col("xa") * F.col("xb")).cast("long").alias("sab"),
        F.sum(F.col("xa") * F.col("xa")).cast("long").alias("saa"),
        F.sum(F.col("xb") * F.col("xb")).cast("long").alias("sbb"),
    )
    num = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")).cast("double")
    dena = (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
    denb = (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double")
    return m.select(
        "lag",
        "n",
        F.floor(F.lit(1000000.0) * num / (F.sqrt(dena) * F.sqrt(denb)))
        .cast("long")
        .alias("acf_ppm"),
    ).orderBy("lag")


@query(
    "events_time_decay_value",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(floor(value * 100) AS BIGINT) AS cents,
             epoch_us(ts) // 604800000000 AS wk
      FROM events
    ),
    mx AS (SELECT CAST(max(wk) AS BIGINT) AS max_wk FROM c)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(cents AS DOUBLE)
                    / power(2.0, CAST(least(max_wk - wk, 20) AS DOUBLE)))
                * 1048576.0 AS BIGINT) AS decayed_x2p20
    FROM c CROSS JOIN mx
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_time_decay_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay aggregate (half-life = one week): each
    event's integer-cents value is weighted by 2^-age_weeks relative to
    the corpus's newest week — the recency-weighted score a ranking or
    feature pipeline maintains. The weights are NEGATIVE POWERS OF TWO
    on integer cents, so every term and every partial sum is an exactly
    representable dyadic rational (<= 20 fractional bits, magnitudes
    well under 2^53): double summation is EXACT and association-free,
    sidestepping the cross-engine float-sum trap without giving up
    fractional weights. The age clamp at 20 weeks both bounds the
    fractional bits and floors vanishing weights. Scale: week index is
    integer epoch division (no calendar), the max-week scalar is a
    1-row broadcast, and the weighted fold is a plain hash aggregate —
    map-side partials included, O(types) shuffle. Headroom: sum*2^20
    needs ~2^53 at SF ~1000x the tested ones; switch to DECIMAL there."""
    ev = load_tables(spark, sf_dir)["events"]
    c = ev.select(
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        F.expr("unix_micros(ts) div 604800000000").alias("wk"),
    )
    mx = c.agg(F.max("wk").cast("long").alias("max_wk"))
    return (
        c.crossJoin(F.broadcast(mx))  # 1-row scalar combine
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            (
                F.sum(
                    F.col("cents").cast("double")
                    / F.pow(
                        F.lit(2.0),
                        F.least(F.col("max_wk") - F.col("wk"), F.lit(20)).cast("double"),
                    )
                )
                * F.lit(1048576.0)
            )
            .cast("long")
            .alias("decayed_x2p20"),
        )
        .orderBy("event_type")
    )


@query(
    "events_chi2_type_by_segment",
    oracle="""
    WITH o AS (
      SELECT event_type, user_id % 5 AS seg, CAST(count(*) AS BIGINT) AS obs
      FROM events GROUP BY 1, 2
    ),
    r AS (SELECT event_type, CAST(sum(obs) AS BIGINT) AS rtot FROM o GROUP BY 1),
    c AS (SELECT seg, CAST(sum(obs) AS BIGINT) AS ctot FROM o GROUP BY 1),
    t AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM o),
    cells AS (
      SELECT o.event_type, o.seg,
             CAST(floor((1000000.0
                         * ((CAST(o.obs AS DOUBLE) * CAST(t.n AS DOUBLE)
                             - CAST(r.rtot AS DOUBLE) * CAST(c.ctot AS DOUBLE))
                            * (CAST(o.obs AS DOUBLE) * CAST(t.n AS DOUBLE)
                               - CAST(r.rtot AS DOUBLE) * CAST(c.ctot AS DOUBLE))))
                        / (CAST(r.rtot AS DOUBLE) * CAST(c.ctot AS DOUBLE)
                           * CAST(t.n AS DOUBLE))) AS BIGINT) AS cell_ppm
      FROM o JOIN r USING (event_type) JOIN c USING (seg) CROSS JOIN t
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST((count(DISTINCT event_type) - 1) * (count(DISTINCT seg) - 1) AS BIGINT)
             AS dof,
           CAST(sum(cell_ppm) AS BIGINT) AS chi2_ppm
    FROM cells
    """,
)
def events_chi2_type_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and a user
    segment (contingency-table analysis — the A/B-test / drift-check
    primitive). The statistic is assembled per CELL as
    (O*N - R*C)^2 / (R*C*N) — the integer-moment form of (O-E)^2/E —
    evaluated in identically-shaped correctly-rounded double arithmetic
    and floored to ppm BEFORE the final sum, so the cross-cell sum is
    an exact integer and association order never reaches the
    comparison. Scale: the fact table folds to O(types x segments)
    cells map-side; marginals and the grand total are aggregates OF THE
    CELLS (three tiny frames, broadcast back); nothing after the first
    fold touches corpus-sized data."""
    from postrack_spark.session import pin_small

    ev = load_tables(spark, sf_dir)["events"]
    # the O(types x segments) cell table feeds four branches (both
    # margins, the total, the term scan) — pinned: one events scan.
    o = pin_small(
        "chi2_cells",
        ev.select("event_type", (F.col("user_id") % 5).alias("seg"))
        .groupBy("event_type", "seg")
        .agg(F.count("*").cast("long").alias("obs")),
    )
    r = o.groupBy("event_type").agg(F.sum("obs").cast("long").alias("rtot"))
    c = o.groupBy("seg").agg(F.sum("obs").cast("long").alias("ctot"))
    t = o.agg(F.sum("obs").cast("long").alias("n"))
    d = (
        F.col("obs").cast("double") * F.col("n").cast("double")
        - F.col("rtot").cast("double") * F.col("ctot").cast("double")
    )
    cells = (
        o.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "seg")
        .crossJoin(F.broadcast(t))  # 1-row scalar combine
        .select(
            "event_type",
            "seg",
            F.floor(
                (F.lit(1000000.0) * (d * d))
                / (
                    F.col("rtot").cast("double")
                    * F.col("ctot").cast("double")
                    * F.col("n").cast("double")
                )
            )
            .cast("long")
            .alias("cell_ppm"),
        )
    )
    return cells.agg(
        F.count("*").cast("long").alias("n_cells"),
        ((F.countDistinct("event_type") - 1) * (F.countDistinct("seg") - 1))
        .cast("long")
        .alias("dof"),
        F.sum("cell_ppm").cast("long").alias("chi2_ppm"),
    )


@query(
    "events_seasonal_naive_error",
    oracle="""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day_idx,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(abs(a.x - b.x)) AS BIGINT) AS sum_abs_err,
           CAST(floor((1000.0 * CAST(sum(abs(a.x - b.x)) AS DOUBLE))
                      / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mae_milli
    FROM daily a JOIN daily b
      ON a.event_type = b.event_type AND b.day_idx = a.day_idx - 7
    GROUP BY a.event_type
    ORDER BY a.event_type
    """,
)
def events_seasonal_naive_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's per-type
    event count with the count 7 days earlier and report the MAE — the
    baseline every forecasting pipeline must beat, and the drift alarm
    when the live MAE departs from it. Errors are integer counts
    (sum_abs_err exact); the per-day mean is one correctly-rounded
    divide floored to milli units. Scale: the fact folds to O(types x
    days) map-side; the 7-day self-join runs on that tiny aggregated
    frame, never on raw events."""
    ev = load_tables(spark, sf_dir)["events"]
    daily = (
        ev.select(
            "event_type", F.expr("unix_micros(ts) div 86400000000").alias("day_idx")
        )
        .groupBy("event_type", "day_idx")
        .agg(F.count("*").cast("long").alias("x"))
    )
    a = daily.select("event_type", "day_idx", F.col("x").alias("xa"))
    b = daily.select(
        "event_type", (F.col("day_idx") + 7).alias("day_idx"), F.col("x").alias("xb")
    )
    err = F.abs(F.col("xa") - F.col("xb"))
    return (
        a.join(b, ["event_type", "day_idx"])
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum(err).cast("long").alias("sum_abs_err"),
        )
        .select(
            "event_type",
            "n_days",
            "sum_abs_err",
            F.floor(
                (F.lit(1000.0) * F.col("sum_abs_err").cast("double"))
                / F.col("n_days").cast("double")
            )
            .cast("long")
            .alias("mae_milli"),
        )
        .orderBy("event_type")
    )


@query(
    "events_new_vs_returning_daily",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(epoch_us(ts) // 86400000000) AS first_day
      FROM events GROUP BY user_id
    ),
    daily AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day_idx
      FROM events
    )
    SELECT CAST(day_idx AS BIGINT) AS day_idx,
           CAST(count(*) FILTER (day_idx = first_day) AS BIGINT) AS new_users,
           CAST(count(*) FILTER (day_idx > first_day) AS BIGINT) AS returning_users
    FROM daily JOIN firsts USING (user_id)
    GROUP BY day_idx
    ORDER BY day_idx
    """,
)
def events_new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user accounting — the growth-accounting
    split every product dashboard leads with. First-seen day per user
    is one O(users) aggregate joined back to the deduped (user, day)
    activity relation (the dedup BEFORE the join keeps the join input
    O(active user-days), not O(events)); day indexes are integer epoch
    division, no calendar functions. Scale: two shuffles on user_id
    (agg + join co-partition under the same key) and one O(days) final
    fold."""
    ev = load_tables(spark, sf_dir)["events"]
    days = ev.select(
        "user_id", F.expr("unix_micros(ts) div 86400000000").alias("day_idx")
    ).distinct()
    firsts = days.groupBy("user_id").agg(F.min("day_idx").alias("first_day"))
    return (
        days.join(firsts, "user_id")
        .groupBy("day_idx")
        .agg(
            F.sum(F.when(F.col("day_idx") == F.col("first_day"), 1).otherwise(0))
            .cast("long")
            .alias("new_users"),
            F.sum(F.when(F.col("day_idx") > F.col("first_day"), 1).otherwise(0))
            .cast("long")
            .alias("returning_users"),
        )
        .select(F.col("day_idx").cast("long").alias("day_idx"), "new_users", "returning_users")
        .orderBy("day_idx")
    )


@query(
    "events_ab_welch_ttest",
    oracle="""
    WITH c AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS grp,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    m AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s,
             CAST(sum(cents * cents) AS BIGINT) AS ss
      FROM c GROUP BY grp
    )
    SELECT a.n AS na, b.n AS nb, a.s AS sum_a, b.s AS sum_b,
           CAST(floor((1000000.0
                       * (CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
                          - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE)))
                      / sqrt((CAST(a.n AS DOUBLE) * CAST(a.ss AS DOUBLE)
                              - CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE))
                             / (CAST(a.n AS DOUBLE) * CAST(a.n AS DOUBLE)
                                * (CAST(a.n AS DOUBLE) - 1.0))
                             + (CAST(b.n AS DOUBLE) * CAST(b.ss AS DOUBLE)
                                - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE))
                               / (CAST(b.n AS DOUBLE) * CAST(b.n AS DOUBLE)
                                  * (CAST(b.n AS DOUBLE) - 1.0)))) AS BIGINT)
             AS t_ppm
    FROM (SELECT * FROM m WHERE grp = 'a') a
    CROSS JOIN (SELECT * FROM m WHERE grp = 'b') b
    """,
)
def events_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment analysis: Welch's t-statistic for purchase value
    between the two user-parity arms — the continuous-metric companion
    to events_chi2_type_by_segment. Both arms' (n, Σx, Σx²) are exact
    integer moments from ONE pass; the t-statistic assembles them in
    an identically-shaped correctly-rounded double expression (variance
    as (nΣx²-( Σx)²)/(n²(n-1)), the integer-moment form) floored to
    ppm — IEEE-deterministic cross-engine. Scale: map-side fold to two
    rows, 1-row-by-1-row combine. Headroom: Σx² with cents ≤ 49k needs
    int64 at ~4e9 rows per arm; coarsen units past that."""
    ev = load_tables(spark, sf_dir)["events"]
    c = ev.filter(F.col("event_type") == "purchase").select(
        F.when(F.col("user_id") % 2 == 0, "a").otherwise("b").alias("grp"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    m = c.groupBy("grp").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("ss"),
    )
    a = m.filter(F.col("grp") == "a").select(
        F.col("n").alias("na"), F.col("s").alias("sum_a"), F.col("ss").alias("ssa")
    )
    b = m.filter(F.col("grp") == "b").select(
        F.col("n").alias("nb"), F.col("s").alias("sum_b"), F.col("ss").alias("ssb")
    )
    d = lambda col: F.col(col).cast("double")  # noqa: E731
    var_a = (d("na") * d("ssa") - d("sum_a") * d("sum_a")) / (
        d("na") * d("na") * (d("na") - F.lit(1.0))
    )
    var_b = (d("nb") * d("ssb") - d("sum_b") * d("sum_b")) / (
        d("nb") * d("nb") * (d("nb") - F.lit(1.0))
    )
    t_ppm = F.floor(
        (F.lit(1000000.0) * (d("sum_a") / d("na") - d("sum_b") / d("nb")))
        / F.sqrt(var_a + var_b)
    ).cast("long")
    return (
        a.crossJoin(b)  # 1-row x 1-row combine
        .select("na", "nb", "sum_a", "sum_b", t_ppm.alias("t_ppm"))
    )


@query(
    "events_max_concurrency_daily",
    oracle="""
    WITH bounds AS (
      SELECT epoch_us(ts) AS us, CAST(1 AS BIGINT) AS delta, event_id FROM events
      UNION ALL
      SELECT epoch_us(ts) + 300000000, CAST(-1 AS BIGINT), event_id FROM events
    ),
    cum AS (
      SELECT us, delta,
             sum(delta) OVER (ORDER BY us, delta, event_id) AS live
      FROM bounds
    )
    SELECT CAST(us // 86400000000 AS BIGINT) AS day_idx,
           CAST(max(live) AS BIGINT) AS max_concurrent,
           CAST(count(*) AS BIGINT) AS n_boundaries
    FROM cum
    GROUP BY day_idx
    ORDER BY day_idx
    """,
)
def events_max_concurrency_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per day — every event opens a 5-minute activity
    interval [ts, ts+5m) and the question is the maximum number
    simultaneously open (capacity planning's classic interval-stacking
    query). Each interval contributes a +1/-1 boundary pair; the live
    count is a GLOBAL running sum over boundary order, which at scale
    is exactly what operators/ranking.prefix_sums_by_key distributes
    (range shuffle + broadcast offsets — never a single-partition
    window). Tie semantics: the cumulative uses RANGE-frame peers
    (both engines' default), so all boundaries in one (us, delta)
    tie-break: the boundary order carries event_id, so the order is
    TOTAL and the ROWS-frame cumsum the distributed operator computes
    is identical to any engine's default frame (with a unique order,
    ROWS == RANGE — never rely on peer semantics across engines).
    Ends sort before starts at the same instant (delta asc), giving
    half-open-interval semantics. All integer."""
    from postrack_spark.operators.ranking import prefix_sums_by_key

    ev = load_tables(spark, sf_dir)["events"]
    us = F.expr("unix_micros(ts)")
    starts = ev.select(
        us.alias("us"), F.lit(1).cast("long").alias("delta"), "event_id"
    )
    ends = ev.select(
        (us + 300000000).alias("us"), F.lit(-1).cast("long").alias("delta"), "event_id"
    )
    bounds = starts.unionByName(ends)
    cum = prefix_sums_by_key(
        bounds,
        [F.asc("us"), F.asc("delta"), F.asc("event_id")],
        {"live": "delta"},
        inclusive=True,
    )
    return (
        cum.groupBy(F.expr("us div 86400000000").cast("long").alias("day_idx"))
        .agg(
            F.max("live").cast("long").alias("max_concurrent"),
            F.count("*").cast("long").alias("n_boundaries"),
        )
        .orderBy("day_idx")
    )


# Shared by events_ohlc_daily and streaming_ohlc_candles (the stream
# maintains the same view incrementally, so one oracle gates both).
_OHLC_ORACLE = """
    WITH keyed AS (
      SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type, value,
             lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') ||
             lpad(CAST(event_id AS VARCHAR), 12, '0') AS ok
      FROM events
    )
    SELECT day, event_type,
           arg_min(value, ok) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, ok) AS close,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS vol_milli
    FROM keyed
    GROUP BY day, event_type
    ORDER BY day, event_type
    """


@query("events_ohlc_daily", oracle=_OHLC_ORACLE)
def events_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candle resampling (open/high/low/close per day per event
    type) — the finance-style downsample every time-series store
    ships. Open/close are exact ROW PICKS via min_by/max_by on a
    zero-padded (epoch_us, event_id) string key: event_id makes the
    order TOTAL, so simultaneous events cannot flip the pick across
    engines or partitionings (the prefix-sum tie-break rule). High/low
    are plain min/max (comparisons, no arithmetic — doubles compare
    identically everywhere); volume is quantized by floor(value*1000)
    BEFORE summing (floor of a double is the same IEEE value on both
    engines, and integer sums are association-free — the documented
    double-SUM trap). One map-side-combinable aggregation over the
    fact scan; group count is days x types (calendar-bounded), so the
    shuffle is tiny at any SF."""
    ev = load_tables(spark, sf_dir)["events"]
    ok = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        ev.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "event_type",
            "value",
            ok.alias("ok"),
        )
        .groupBy("day", "event_type")
        .agg(
            F.min_by("value", "ok").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "ok").alias("close"),
            F.count("*").cast("long").alias("n"),
            F.sum(F.floor(F.col("value") * 1000).cast("long")).cast("long").alias("vol_milli"),
        )
        .orderBy("day", "event_type")
    )


@query(
    "events_ccf_views_purchases",
    oracle="""
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS day_idx,
             CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS x,
             CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    pairs AS (
      SELECT l.lag, a.x AS xa, b.y AS yb
      FROM (SELECT unnest(range(-3, 4)) AS lag) l
      JOIN daily a ON TRUE
      JOIN daily b ON b.day_idx = a.day_idx + l.lag
    ),
    m AS (
      SELECT lag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xa) AS BIGINT) AS sa, CAST(sum(yb) AS BIGINT) AS sb,
             CAST(sum(xa * yb) AS BIGINT) AS sab,
             CAST(sum(xa * xa) AS BIGINT) AS saa,
             CAST(sum(yb * yb) AS BIGINT) AS sbb
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INT) AS lag, n,
           CAST(floor((1000000.0 * CAST(n * sab - sa * sb AS DOUBLE))
                      / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
                         * sqrt(CAST(n * sbb - sb * sb AS DOUBLE)))) AS BIGINT)
             AS ccf_ppm
    FROM m ORDER BY lag
    """,
)
def events_ccf_views_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between the daily VIEW series and the
    daily PURCHASE series at lags -3..+3 — the lead/lag probe that
    answers 'do views predict purchases N days out?'. Same exact-
    integer-moments discipline as events_acf_lags (whose docstring
    carries the headroom analysis): both series fold out of ONE
    map-side conditional aggregation per day, the 7-lag expansion is a
    broadcast over the O(days) frame, and the only floating point is
    the final correctly-rounded sqrt/divide floored to ppm on
    identical integers. Negative lags (purchases leading views) come
    from the same join with the sign flipped — no second scan."""
    ev = load_tables(spark, sf_dir)["events"]
    daily = (
        ev.select(F.expr("unix_micros(ts) div 86400000000").alias("day_idx"),
                  "event_type")
        .groupBy("day_idx")
        .agg(
            F.count_if(F.col("event_type") == "view").cast("long").alias("x"),
            F.count_if(F.col("event_type") == "purchase").cast("long").alias("y"),
        )
    )
    lags = spark.range(-3, 4).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("day_idx").alias("da"), F.col("x").alias("xa"))
    b = daily.select(F.col("day_idx").alias("db"), F.col("y").alias("yb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))  # O(days) aggregated frame x 7 lags
        .join(b, F.col("db") == F.col("da") + F.col("lag"))
    )
    m = pairs.groupBy("lag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xa").cast("long").alias("sa"),
        F.sum("yb").cast("long").alias("sb"),
        F.sum(F.col("xa") * F.col("yb")).cast("long").alias("sab"),
        F.sum(F.col("xa") * F.col("xa")).cast("long").alias("saa"),
        F.sum(F.col("yb") * F.col("yb")).cast("long").alias("sbb"),
    )
    num = (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")).cast("double")
    dena = (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")).cast("double")
    denb = (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")).cast("double")
    return m.select(
        "lag",
        "n",
        F.floor(F.lit(1000000.0) * num / (F.sqrt(dena) * F.sqrt(denb)))
        .cast("long")
        .alias("ccf_ppm"),
    ).orderBy("lag")


@query(
    "scalar_timezone_daygroup",
    oracle="""
    SELECT strftime(timezone('America/New_York', ts::TIMESTAMPTZ), '%Y-%m-%d') AS ny_day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events
    GROUP BY ny_day
    ORDER BY ny_day
    """,
)
def scalar_timezone_daygroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone-aware day bucketing: daily rollup on AMERICA/NEW_YORK
    wall-clock days from UTC-stored event times — the 'local business
    day' grouping every multi-region warehouse needs, and a boundary
    case UTC-only code silently gets wrong (the NY day boundary sits
    at 04:00/05:00 UTC, so ~20% of events land on a different day than
    the UTC rollup). Spark converts with from_utc_timestamp under the
    UTC session timezone; the oracle uses DuckDB's
    timezone(tz, TIMESTAMPTZ) under its UTC session default — both
    resolve through the same IANA tzdata, which the match certifies.
    One map-side conversion + one aggregation; group count is
    calendar-bounded."""
    ev = load_tables(spark, sf_dir)["events"]
    return (
        ev.select(
            F.date_format(
                F.from_utc_timestamp("ts", "America/New_York"), "yyyy-MM-dd"
            ).alias("ny_day"),
            "user_id",
            "value",
        )
        .groupBy("ny_day")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).cast("long").alias("cents"),
        )
        .orderBy("ny_day")
    )


@query(
    "events_attribution_position_split",
    oracle="""
    WITH p AS (
      SELECT user_id, ts AS pts, event_id AS pid,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    v AS (
      SELECT user_id, ts AS vts, event_id AS vid
      FROM events WHERE event_type = 'view'
    ),
    touch AS (
      SELECT p.pid, p.cents, v.vts, v.vid
      FROM p JOIN v ON v.user_id = p.user_id
                   AND v.vts >= p.pts - INTERVAL 1 HOUR AND v.vts < p.pts
    ),
    ranked AS (
      SELECT pid, cents, vid,
             row_number() OVER (PARTITION BY pid ORDER BY vts, vid) AS r,
             count(*) OVER (PARTITION BY pid) AS n
      FROM touch
    ),
    shares AS (
      SELECT pid, cents, vid, r, n,
             CASE WHEN n <= 2 THEN 1
                  WHEN r = 1 OR r = n THEN 40 * (n - 2)
                  ELSE 20 END AS share,
             CASE WHEN n <= 2 THEN n ELSE 100 * (n - 2) END AS tot
      FROM ranked
    ),
    floors AS (
      SELECT pid, cents, vid, r, n,
             CAST(cents * share // tot AS BIGINT) AS fl,
             CAST((cents * share) % tot AS BIGINT) AS rem
      FROM shares
    ),
    topped AS (
      SELECT pid, vid, r, n, fl, rem,
             cents - sum(fl) OVER (PARTITION BY pid) AS deficit,
             row_number() OVER (PARTITION BY pid ORDER BY rem DESC, r) AS rk
      FROM floors
    ),
    alloc AS (
      SELECT CASE WHEN r = 1 THEN 'first'
                  WHEN r = n THEN 'last'
                  ELSE 'middle' END AS position,
             fl + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS credited
      FROM topped
    )
    SELECT position,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(credited) AS BIGINT) AS credited_cents
    FROM alloc GROUP BY position ORDER BY position
    """,
)
def events_attribution_position_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution with EXACT money conservation — the
    U-shaped (position-based) model: each purchase's cents split
    40%/20%-pool/40% across its 1-hour view path (first / middles /
    last; 1-2 touches split evenly), with the integer shortfall
    distributed by largest remainder INSIDE each purchase, so every
    purchase's credits sum to its cents exactly — the invariant
    naive round() violates and finance reconciliation catches.
    Integer shares make the proportions exact (first = 40*(n-2) of
    100*(n-2) parts); all windows are PARTITIONED by purchase with
    total tie-break orders, so the plan parallelizes per conversion
    and the remainder ranking is deterministic. The touch join is a
    per-user interval join (equi on user + range filter) — the as-of
    family's shape, never a cross join."""
    ev = load_tables(spark, sf_dir)["events"]
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("pts"),
        F.col("event_id").alias("pid"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vuser"),
        F.col("ts").alias("vts"),
        F.col("event_id").alias("vid"),
    )
    touch = p.join(
        v,
        (F.col("vuser") == F.col("user_id"))
        & (F.col("vts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("vts") < F.col("pts")),
    )
    wseq = W.partitionBy("pid").orderBy("vts", "vid")
    wall = W.partitionBy("pid")
    ranked = touch.select(
        "pid",
        "cents",
        "vid",
        "vts",
        F.row_number().over(wseq).alias("r"),
        F.count("*").over(wall).alias("n"),
    )
    shares = ranked.select(
        "pid",
        "cents",
        "vid",
        "r",
        "n",
        F.when(F.col("n") <= 2, F.lit(1))
        .when((F.col("r") == 1) | (F.col("r") == F.col("n")), 40 * (F.col("n") - 2))
        .otherwise(F.lit(20))
        .alias("share"),
        F.when(F.col("n") <= 2, F.col("n")).otherwise(100 * (F.col("n") - 2)).alias("tot"),
    )
    floors = shares.select(
        "pid",
        "cents",
        "vid",
        "r",
        "n",
        F.expr("CAST(cents * share DIV tot AS BIGINT)").alias("fl"),
        F.expr("CAST((cents * share) % tot AS BIGINT)").alias("rem"),
    )
    wrk = W.partitionBy("pid").orderBy(F.desc("rem"), F.asc("r"))
    topped = floors.select(
        "pid",
        "vid",
        "r",
        "n",
        "fl",
        (F.col("cents") - F.sum("fl").over(wall)).alias("deficit"),
        F.row_number().over(wrk).alias("rk"),
    )
    alloc = topped.select(
        F.when(F.col("r") == 1, F.lit("first"))
        .when(F.col("r") == F.col("n"), F.lit("last"))
        .otherwise(F.lit("middle"))
        .alias("position"),
        (F.col("fl") + F.when(F.col("rk") <= F.col("deficit"), 1).otherwise(0)).alias(
            "credited"
        ),
    )
    return (
        alloc.groupBy("position")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.sum("credited").cast("long").alias("credited_cents"),
        )
        .orderBy("position")
    )


@query(
    "events_heatmap_dow_hour",
    oracle="""
    WITH g AS (
      SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
             (epoch_us(ts) % 86400000000) // 3600000000 AS hod,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM g)
    SELECT CAST(dow AS INT) AS dow, CAST(hod AS INT) AS hod, n,
           CAST(n * 1000000 // t AS BIGINT) AS share_ppm
    FROM g CROSS JOIN tot
    ORDER BY dow, hod
    """,
)
def events_heatmap_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day activity heatmap — the seasonality
    grid behind every ops dashboard. The weekday comes from pure
    integer epoch arithmetic ((epoch_days + 4) % 7, anchored on
    1970-01-01 = Thursday) because the engines' calendar dow functions
    disagree on numbering (Spark dayofweek is 1=Sunday, DuckDB dow is
    0=Sunday) — integer arithmetic sidesteps the convention entirely.
    One map-side-combinable aggregation to the fixed 7x24 grid + a
    broadcast total for integer ppm shares."""
    ev = load_tables(spark, sf_dir)["events"]
    g = (
        ev.select(
            F.expr("CAST((unix_micros(ts) div 86400000000 + 4) % 7 AS INT)").alias("dow"),
            F.expr("CAST((unix_micros(ts) % 86400000000) div 3600000000 AS INT)").alias("hod"),
        )
        .groupBy("dow", "hod")
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = g.agg(F.sum("n").cast("long").alias("t"))
    return (
        g.crossJoin(F.broadcast(tot))
        .select("dow", "hod", "n", F.expr("CAST(n * 1000000 DIV t AS BIGINT)").alias("share_ppm"))
        .orderBy("dow", "hod")
    )


@query(
    "events_permutation_patterns",
    oracle="""
    WITH daily AS (
      SELECT CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    panes AS (
      SELECT day, day // 30 AS pane, cents FROM daily
    ),
    triples AS (
      SELECT cents AS c0,
             lead(cents, 1) OVER (PARTITION BY pane ORDER BY day) AS c1,
             lead(cents, 2) OVER (PARTITION BY pane ORDER BY day) AS c2
      FROM panes
    )
    SELECT CAST(((CASE WHEN c0 > c1 THEN 1 ELSE 0 END)
                 + (CASE WHEN c0 > c2 THEN 1 ELSE 0 END)) * 100
              + ((CASE WHEN c1 >= c0 THEN 1 ELSE 0 END)
                 + (CASE WHEN c1 > c2 THEN 1 ELSE 0 END)) * 10
              + ((CASE WHEN c2 >= c0 THEN 1 ELSE 0 END)
                 + (CASE WHEN c2 >= c1 THEN 1 ELSE 0 END)) AS INT) AS pattern,
           CAST(count(*) AS BIGINT) AS n_triples
    FROM triples
    WHERE c2 IS NOT NULL
    GROUP BY 1
    ORDER BY pattern
    """,
)
def events_permutation_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal-pattern histogram (the engine of permutation entropy,
    Bandt-Pompe 2002): classify every 3 consecutive days of revenue
    into one of the 6 rank orderings and count each. A complexity
    screen for the daily series — white noise spreads mass evenly over
    patterns, a trending series concentrates on 012/210 — feeding the
    same anomaly lane as the ACF/Ljung-Box queries but distribution-
    free.

    Determinism: ties between equal daily totals break to the EARLIER
    day (the later element of a tied pair counts as larger — the >= vs
    > asymmetry in the rank expressions), so every triple maps to
    exactly one full permutation; all logic is integer/boolean.
    Patterns are encoded as the 3-digit rank string (e.g. 201 = middle
    day lowest, first day highest... digit = rank of that position).

    Scale: the day series is grouped into 30-day PANES and triples are
    formed within a pane (lead() over a pane-PARTITIONED window, <= 30
    rows each — never a global window); pane-boundary triples are the
    only loss, documented and identical on both engines."""
    t = load_tables(spark, sf_dir)
    daily = (
        t["events"]
        .select(
            F.floor(F.unix_micros("ts") / F.lit(86400000000)).cast("long").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").cast("long").alias("cents"))
        .withColumn("pane", F.expr("day DIV 30"))
    )
    w = W.partitionBy("pane").orderBy("day")
    triples = daily.select(
        F.col("cents").alias("c0"),
        F.lead("cents", 1).over(w).alias("c1"),
        F.lead("cents", 2).over(w).alias("c2"),
    ).filter(F.col("c2").isNotNull())
    r0 = (F.col("c0") > F.col("c1")).cast("int") + (F.col("c0") > F.col("c2")).cast("int")
    r1 = (F.col("c1") >= F.col("c0")).cast("int") + (F.col("c1") > F.col("c2")).cast("int")
    r2 = (F.col("c2") >= F.col("c0")).cast("int") + (F.col("c2") >= F.col("c1")).cast("int")
    return (
        triples.select((r0 * 100 + r1 * 10 + r2).cast("int").alias("pattern"))
        .groupBy("pattern")
        .agg(F.count("*").cast("long").alias("n_triples"))
        .orderBy("pattern")
    )


@query(
    "events_longest_daily_streak",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d
      FROM events
    ),
    grp AS (
      SELECT user_id, d,
             d - row_number() OVER (PARTITION BY user_id ORDER BY d)
               AS island
      FROM days
    ),
    streaks AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS len
      FROM grp GROUP BY user_id, island
    ),
    longest AS (
      SELECT user_id, CAST(max(len) AS BIGINT) AS longest
      FROM streaks GROUP BY user_id
    )
    SELECT longest AS streak_days,
           CAST(count(*) AS BIGINT) AS n_users
    FROM longest GROUP BY longest ORDER BY streak_days
    """,
)
def events_longest_daily_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user, histogrammed —
    the engagement metric behind every retention dashboard, and the
    canonical GAPS-AND-ISLANDS shape: distinct active days minus the
    per-user row_number collapse each unbroken run to one island key,
    runs group-count, users take their max. Whole days come from
    epoch_us // 86400e6 on both engines (the cast-rounding trap); the
    window partitions BY USER (never unpartitioned — the plan-audit
    rule), so the shape is two key-local shuffles and scales with
    users, not days."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    days = (
        t["events"]
        .select(
            "user_id",
            F.floor(F.unix_micros("ts") / F.lit(86400000000))
            .cast("long")
            .alias("d"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn("island", F.col("d") - F.row_number().over(w))
    streaks = grp.groupBy("user_id", "island").agg(
        F.count("*").cast("long").alias("len")
    )
    longest = streaks.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest")
    )
    return (
        longest.groupBy(F.col("longest").alias("streak_days"))
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("streak_days")
    )
