"""Deterministic sampling and splitting for training-data pipelines.

Random sampling (`df.sample`, `sampleBy`) is seed-stable within one
Spark version but not portable across engines or re-partitionings; a
100 TB corpus pipeline needs samples and train/test splits that are a
pure function of the ROW (content-hash), so any engine — or a rerun
over re-partitioned data — reproduces the same membership. These use
md5 (engine-portable, cf. functions.text) on a key column:

  hash_sample  — keep rows whose md5(key) falls below a rate threshold:
                 a deterministic Bernoulli sample, exactly reproducible
                 by the DuckDB oracle (and by any other engine).
  hash_split   — label each row train/test by hash band; splits are
                 disjoint, exhaustive, and stable under re-partitioning.

Both are single map-side predicates/projections: no shuffle, no state,
trivially scale-linear.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_unit(key: Column) -> Column:
    """md5(key) folded to a uniform float in [0, 1): use the first 8 hex
    digits (32 bits) — identical arithmetic is expressible in ANSI SQL."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("double") / F.lit(
        float(2**32)
    )


def hash_sample(df: DataFrame, key, rate: float) -> DataFrame:
    """Deterministic Bernoulli sample: rows where hash_unit(key) < rate."""
    return df.filter(_hash_unit(F.col(key) if isinstance(key, str) else key) < rate)


def hash_split(df: DataFrame, key, test_rate: float = 0.1, split_col: str = "split") -> DataFrame:
    """Stable train/test split label from the key's hash band."""
    u = _hash_unit(F.col(key) if isinstance(key, str) else key)
    return df.withColumn(split_col, F.when(u < test_rate, F.lit("test")).otherwise(F.lit("train")))


def weighted_resample(
    df: DataFrame, key, weights: dict[str, float], weight_col: str, copies_col: str = "__copies"
) -> DataFrame:
    """Deterministic mixture resampling: each row is emitted
    floor(w) + (hash_unit(key) < frac(w)) times, where w is its group's
    weight — so a 2.5× source yields exactly 2 copies for half its rows
    (by hash) and 3 for the other half, reproducibly. Rows from groups
    absent in `weights` keep weight 1.0. Emission is an explode of a
    per-row sequence: map-side only, no shuffle, no driver loop —
    the 'epochs per data source' primitive for training mixtures."""
    w = F.lit(1.0)
    for k, v in sorted(weights.items()):
        w = F.when(F.col(weight_col) == k, F.lit(float(v))).otherwise(w)
    key_col = F.col(key) if isinstance(key, str) else key
    n = F.floor(w) + (_hash_unit(key_col) < (w - F.floor(w))).cast("long")
    return (
        df.withColumn(copies_col, n)
        .filter(F.col(copies_col) > 0)
        .withColumn("__copy", F.explode(F.sequence(F.lit(1), F.col(copies_col))))
        .drop(copies_col, "__copy")
    )
