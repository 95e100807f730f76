"""Semantic validation of the distributed linear-algebra family: the
Spark implementations must equal LOCAL numpy models of the same
computation bit-for-bit — a stronger check than the SQL oracle (which
shares the relational formulation) because numpy is an independent
third implementation of the arithmetic.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from postrack_spark.queries import load_all


def _embeddings_matrix(sf_dir: str) -> np.ndarray:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id")
    return np.stack(df["embedding"].to_numpy()).astype(np.float64)


def _quantized_gram(x: np.ndarray) -> np.ndarray:
    q = np.floor(x * 1000000.0).astype(np.int64)
    return q.T @ q


def test_gram_matches_numpy(spark, sf_dir):
    """vector_gram_matrix == the single-matmul numpy Gram (upper
    triangle), proving the partition-partial decomposition loses
    nothing: sum of per-partition X_p'X_p equals X'X exactly in int64."""
    specs = load_all()
    rows = specs["vector_gram_matrix"].fn(spark, sf_dir).collect()
    g = _quantized_gram(_embeddings_matrix(sf_dir))
    assert len(rows) == 64 * 65 // 2
    for r in rows:
        assert g[r["i"] - 1, r["j"] - 1] == r["gram"], (r["i"], r["j"])


def test_power_iteration_matches_local_recurrence(spark, sf_dir):
    """The distributed 5-round quantized power trajectory equals a
    local numpy replica of the identical recurrence — every floor,
    cast and divide lands on the same integers, so the distributed
    matvec/normalize decomposition is exact, not approximately right."""
    specs = load_all()
    got = {
        r["dim"]: r["v_micro"]
        for r in specs["vector_pca_power_iteration"].fn(spark, sf_dir).collect()
    }
    # int64 matvec (exact, like Spark's sum of longs); only the
    # normalize step casts through float64 — same as both engines
    g6 = np.floor(
        _quantized_gram(_embeddings_matrix(sf_dir)).astype(np.float64) / 1e6
    ).astype(np.int64)
    v = np.full(64, 1000000, dtype=np.int64)
    for _ in range(5):
        x = g6 @ v
        m = np.float64(np.abs(x).max())
        v = np.floor(1000000.0 * x.astype(np.float64) / m).astype(np.int64)
    want = {i + 1: int(v[i]) for i in range(64)}
    assert got == want
