"""Reusable mining operators backing queries/mining_queries.py:
largest-remainder apportionment and bounded-dimension skyline.
Extracted so the algebra is hypothesis-testable against brute-force
models (tests/test_mining.py) independent of the fixture tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def largest_remainder_allocation(
    weights: DataFrame, key_col: str, weight_col: str, budget: int
) -> DataFrame:
    """Hamilton / largest-remainder apportionment of an integer budget
    proportional to non-negative integer weights.

    Returns ``key_col, weight_col, alloc`` where Σ alloc == budget
    exactly and each alloc ∈ {floor(b*w/W), floor(b*w/W)+1} (the
    Hamilton quota property). All arithmetic is int64: callers must
    coarsen weights so ``budget * w`` has headroom (the agg_corr_exact
    rule). Plan shape: the input is expected to be an already-reduced
    per-key frame (bounded cardinality); totals and the remainder rank
    run as broadcast tiny self-joins — no window, no collect. The +1
    winners are the largest remainders with (remainder DESC, key) as a
    total tie-break, so the allocation is deterministic."""
    from postrack_spark.session import pin_small

    # `w` feeds the total AND the quota projection; `base` feeds the
    # deficit, the remainder-rank self-join AND the final select. Both
    # are bounded per-key frames (the operator's input contract), and
    # without a pin every consumer re-runs the caller's full upstream
    # chain (measured: sample_temperature_mixture scanned documents 8x).
    w = pin_small(
        "lra_w", weights.select(F.col(key_col).alias("k"), F.col(weight_col).alias("w"))
    )
    tot = w.agg(F.sum("w").cast("long").alias("t"))
    base = pin_small("lra_base", w.crossJoin(F.broadcast(tot)).select(
        "k",
        "w",
        F.expr(f"CAST({budget} * w DIV t AS BIGINT)").alias("fl"),
        F.expr(f"CAST(({budget} * w) % t AS BIGINT)").alias("rem"),
    ))
    deficit = base.agg((F.lit(budget) - F.sum("fl")).cast("long").alias("deficit"))
    other = base.select(F.col("k").alias("k2"), F.col("rem").alias("rem2"))
    # rank-by-count on the bounded frame: rn = 1 + #{j sorting strictly
    # before i on (rem DESC, key)} — keeps the registry-wide
    # no-unpartitioned-window invariant.
    ranked = (
        base.join(
            F.broadcast(other),
            (F.col("rem2") > F.col("rem"))
            | ((F.col("rem2") == F.col("rem")) & (F.col("k2") < F.col("k"))),
            "left",
        )
        .groupBy("k", "w", "fl", "rem")
        .agg((F.count("k2") + F.lit(1)).cast("long").alias("rn"))
    )
    return (
        ranked.crossJoin(F.broadcast(deficit))
        .select(
            F.col("k").alias(key_col),
            F.col("w").alias(weight_col),
            (
                F.col("fl")
                + F.when(F.col("rn") <= F.col("deficit"), F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("alloc"),
        )
    )


def skyline_min_max_bounded(
    df: DataFrame, minimize_col: str, maximize_col: str
) -> DataFrame:
    """2-D skyline (Pareto frontier): rows not dominated on
    (minimize ``minimize_col``, maximize ``maximize_col``), for the
    case where the MAXIMIZED dimension has bounded cardinality (a
    domain/catalog attribute, not a data-sized one).

    Dominance test via two suffix aggregates over the per-value frame
    of the bounded dimension:
        m_ge(s) = min minimize_col over maximize_col >= s
        m_gt(s) = min minimize_col over maximize_col >  s
    A row survives iff NOT (m_ge < its min-dim) AND NOT (m_gt <= its
    min-dim). One map-side-combinable groupBy + a domain-sized
    self-join + one broadcast probe — never the quadratic NOT-EXISTS
    self-join, never a window. Comparisons are exact row values, so
    tie/strictness semantics match the textbook definition."""
    from postrack_spark.session import pin_small

    # the domain-sized per-value frame feeds both suffix-join sides —
    # pinned so the input scan + groupBy runs once per action (the
    # final dominance probe scans the input once more by necessity).
    per_val = pin_small(
        "skyline_per_val",
        df.groupBy(maximize_col).agg(F.min(minimize_col).alias("__mn")),
    )
    a = per_val.select(F.col(maximize_col).alias("__s"))
    b = per_val.select(F.col(maximize_col).alias("__s2"), "__mn")
    suffix = (
        a.join(F.broadcast(b), F.col("__s2") >= F.col("__s"))
        .groupBy("__s")
        .agg(
            F.min("__mn").alias("__m_ge"),
            F.min(F.when(F.col("__s2") > F.col("__s"), F.col("__mn"))).alias("__m_gt"),
        )
    )
    dominated = (F.col("__m_ge") < F.col(minimize_col)) | F.coalesce(
        F.col("__m_gt") <= F.col(minimize_col), F.lit(False)
    )
    return (
        df.join(F.broadcast(suffix), df[maximize_col] == suffix["__s"])
        .filter(~dominated)
        .drop("__s", "__m_ge", "__m_gt")
    )
