"""operators/ranking: distributed exact rank/ntile vs the window
implementations they replace (VERDICT r2: the three global-ntile
scale-killers). Value-equality is checked repeatedly because the
operator's correctness rests on Catalyst exchange reuse giving both
internal paths identical range boundaries — a silent-break risk worth
re-testing every run."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from postrack_spark.operators.ranking import exact_ntile, global_row_number
from postrack_spark.plans import plan_features


def _frame(spark, n=5003, parts=8):
    # deterministic, collision-heavy v (ties broken by id)
    rows = [(i, (i * 37) % 97) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v long").repartition(parts)


def test_global_row_number_matches_window(spark):
    df = _frame(spark)
    order = [F.desc("v"), F.asc("id")]
    for _ in range(3):  # repeated: boundary-consistency must hold every run
        got = global_row_number(df, order, "rn")
        exp = df.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
        assert got.select("id", "rn").exceptAll(exp.select("id", "rn")).count() == 0


def test_exact_ntile_matches_window_all_remainders(spark):
    # n=5003: k in (4, 7, 10) exercises every remainder-class branch of
    # the oversized-first-buckets formula
    df = _frame(spark)
    order = [F.desc("v"), F.asc("id")]
    for k in (4, 7, 10):
        got = exact_ntile(df, k, order, "b")
        exp = df.withColumn("b", F.ntile(k).over(Window.orderBy(*order)))
        assert got.select("id", "b").exceptAll(exp.select("id", "b")).count() == 0


def test_exact_ntile_fewer_rows_than_buckets(spark):
    small = spark.createDataFrame([(i,) for i in range(3)], "id int")
    got = {
        (r.id, r.b)
        for r in exact_ntile(small, 10, [F.asc("id")], "b").collect()
    }
    assert got == {(0, 1), (1, 2), (2, 3)}


def test_ranking_plan_has_no_window(spark):
    # the whole point: zero WindowExec, one data-sized range exchange
    # (reused), tiny broadcast joins for offsets/total
    df = _frame(spark)
    feats = plan_features(global_row_number(df, [F.asc("v"), F.asc("id")], "rn"))
    assert feats["windows"] == 0
    assert feats["unpartitioned_windows"] == 0
    assert feats["python_evals"] == 0
    feats = plan_features(exact_ntile(df, 4, [F.asc("v"), F.asc("id")], "b"))
    assert feats["windows"] == 0


def test_ranking_skewed_keys(spark):
    # pareto-ish skew: range boundaries land inside hot keys; the
    # unique (v, id) composite keeps the total order and exactness
    rows = [(i, min(int(1000 / (1 + (i * 7919) % 100)), 500)) for i in range(20011)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(8)
    order = [F.asc("v"), F.asc("id")]
    got = global_row_number(df, order, "rn")
    exp = df.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
    assert got.select("id", "rn").exceptAll(exp.select("id", "rn")).count() == 0


def test_ranking_sort_imposing_consumer_stable(spark, tmp_path):
    """Adversarial regression for round-3 incident (b): a single
    ``write.partitionBy(bucket)`` consumer sorts each write task by the
    partition column, which — before the operator-internal pin — could
    displace the ranking's in-partition sort so that
    monotonically_increasing_id numbered rows in shuffle-fetch order
    (~1e-5 of boundary rows flipped; caught as inverted streaming
    sessions). With the eager pin the enumeration is frozen before the
    writer plan exists. Five write → read-back round trips over a
    tie-heavy frame must reproduce the window ntile exactly."""
    rows = [(i, (i * 37) % 5) for i in range(20011)]  # 5 values, massive ties
    df = spark.createDataFrame(rows, "id long, v long").repartition(8)
    order = [F.asc("v"), F.asc("id")]
    exp = {
        (r.id, r.b)
        for r in df.withColumn(
            "b", F.ntile(8).over(Window.orderBy(*order))
        ).collect()
    }
    for trial in range(5):
        out = str(tmp_path / f"trial{trial}")
        (
            exact_ntile(df, 8, order, "b")
            .write.partitionBy("b")
            .mode("overwrite")
            .parquet(out)
        )
        got = {
            (r.id, r.b)
            for r in spark.read.parquet(out).select("id", "b").collect()
        }
        assert got == exp, f"trial {trial}: partitionBy consumer perturbed ranks"


def test_ranking_double_reference_stable(spark):
    """Adversarial regression for round-3 incident (a): referencing the
    rank output from TWO subplans (an order-insensitive aggregate AND a
    join back) historically let the optimizer eliminate the in-partition
    sort in one re-instantiation, so the two paths disagreed on rn (the
    pulled-then-restored agg_weighted_median_rank). This replays that
    exact two-level prefix-sum shape five times and checks the running
    weight sum row-for-row against the single-partition window model."""
    rows = [(i, (i * 37) % 5, (i * 13) % 7 + 1) for i in range(20011)]
    df = spark.createDataFrame(rows, "id long, v long, w long").repartition(8)
    order = [F.asc("v"), F.asc("id")]
    wexp = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    exp = {
        (r.id, r.cumw)
        for r in df.withColumn("cumw", F.sum("w").over(wexp)).collect()
    }
    for trial in range(5):
        ranked = global_row_number(df, order, "rn").withColumn(
            "blk", F.expr("(rn - 1) div 1024")
        )
        blocks = ranked.groupBy("blk").agg(F.sum("w").alias("bw"))  # consumer 1
        a, b = blocks.alias("a"), blocks.alias("b")
        offs = (
            a.join(F.broadcast(b), F.col("b.blk") < F.col("a.blk"), "left")
            .groupBy(F.col("a.blk").alias("blk"))
            .agg(F.coalesce(F.sum("b.bw"), F.lit(0)).alias("off"))
        )
        w_blk = Window.partitionBy("blk").orderBy("rn")
        cum = ranked.join(F.broadcast(offs), "blk").withColumn(  # consumer 2
            "cumw", F.col("off") + F.sum("w").over(w_blk)
        )
        got = {(r.id, r.cumw) for r in cum.select("id", "cumw").collect()}
        assert got == exp, f"trial {trial}: double-referenced ranks diverged"


def test_prefix_sum_matches_window(spark):
    """Distributed exclusive/inclusive prefix sums must equal the
    single-partition window cumsum, across repeated runs (exchange
    reuse gives both internal paths identical range boundaries)."""
    from postrack_spark.operators.ranking import prefix_sum_by_key

    rows = [(i, (i * 37) % 101, (i * 13) % 7 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, k long, v long").repartition(8)
    order = [F.asc("k"), F.asc("id")]
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    exp = df.withColumn("ps", F.coalesce(F.sum("v").over(w), F.lit(0)))
    for _ in range(3):
        got = prefix_sum_by_key(df, order, "v", "ps", inclusive=False)
        assert got.select("id", "ps").exceptAll(exp.select("id", "ps")).count() == 0
    wi = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    expi = df.withColumn("ps", F.sum("v").over(wi))
    goti = prefix_sum_by_key(df, order, "v", "ps", inclusive=True)
    assert goti.select("id", "ps").exceptAll(expi.select("id", "ps")).count() == 0


def test_prefix_sum_plan_no_unpartitioned_window(spark):
    from postrack_spark.operators.ranking import prefix_sum_by_key

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 11).alias("v")
    )
    got = prefix_sum_by_key(df, [F.asc("id")], "v", "ps")
    feats = plan_features(got)
    assert feats["unpartitioned_windows"] == 0
    assert feats["broadcast_joins"] >= 1


def test_prefix_sums_multi_matches_window(spark):
    """Multi-column prefix sums (one range shuffle for both columns)
    must equal the window cumsums, inclusive and exclusive."""
    from postrack_spark.operators.ranking import prefix_sums_by_key

    rows = [(i, (i * 41) % 97, (i * 7) % 5, (i * 11) % 3) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, k long, u long, v long").repartition(7)
    order = [F.asc("k"), F.asc("id")]
    wi = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    exp = df.withColumn("cu", F.sum("u").over(wi)).withColumn(
        "cv", F.sum("v").over(wi)
    )
    got = prefix_sums_by_key(df, order, {"cu": "u", "cv": "v"}, inclusive=True)
    assert (
        got.select("id", "cu", "cv").exceptAll(exp.select("id", "cu", "cv")).count()
        == 0
    )
