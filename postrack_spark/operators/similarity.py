"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, O(|Q|·|C|·d); fine when the
query set is small and broadcast. Scale path: IVF-style coarse
quantization — assign every vector to its nearest centroid, search only
the probed bucket(s); turns the scan into a bucket-pruned join.

All math is higher-order built-ins (functions.vector) — JVM-side, no
Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from postrack_spark.functions.vector import as_double_array, cosine


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
    exclude_self: bool = False,
) -> DataFrame:
    """Exact top-k by cosine: broadcast the (small) query set against the
    corpus, rank per query. One pass over the corpus, no shuffle of the
    corpus itself — the 100 TB-safe exact search when |Q| is small."""
    joined = corpus.crossJoin(F.broadcast(queries)).withColumn(
        "sim", cosine(F.col(q_vec), F.col(c_vec))
    )
    if exclude_self:
        joined = joined.filter(F.col(q_id) != F.col(c_id))
    w = W.partitionBy(q_id).orderBy(F.desc("sim"), F.asc(c_id))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(q_id, c_id, F.round("sim", 4).alias("cos_sim"), "rn")
    )


def label_centroids(corpus: DataFrame, vec_col: str, label_col: str) -> DataFrame:
    """Element-wise mean vector per label — the IVF coarse codebook.
    posexplode -> groupBy(label, pos) -> avg -> re-assemble sorted by
    position. Two shuffles, both on small keys."""
    exploded = corpus.select(
        F.col(label_col).alias("label"), F.posexplode(as_double_array(vec_col)).alias("pos", "v")
    )
    by_pos = exploded.groupBy("label", "pos").agg(F.avg("v").alias("m"))
    return (
        by_pos.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("label", F.transform("pm", lambda s: s["m"]).alias("centroid"))
    )


def ivf_assign(
    df: DataFrame, centroids: DataFrame, id_col: str, vec_col: str, out_col: str = "bucket"
) -> DataFrame:
    """Assign each vector to its nearest centroid: broadcast codebook,
    argmax via max_by — a single aggregation, no window, no extra
    shuffle beyond the groupBy on the id.

    CONTRACT: ``id_col`` must be unique in ``df`` (it is an id). The
    input's other columns ride through the aggregate via first(),
    which is value-deterministic only because an id group's rows are
    identical copies produced by the centroid crossJoin; duplicate ids
    with differing payloads would collapse nondeterministically."""
    sims = df.crossJoin(F.broadcast(centroids)).withColumn(
        "__sim", cosine(as_double_array(vec_col), F.col("centroid"))
    )
    # deterministic tie-break: higher sim wins, then lower label.
    # The input's own columns ride through the aggregate via first()
    # — every row of an id group carries IDENTICAL df columns (the
    # crossJoin only varies the centroid side), so first() is
    # value-deterministic — instead of re-joining df on the id, which
    # re-derived (and re-scanned) the whole input subtree a second
    # time per call (2 corpus passes per assignment before, 1 after).
    carried = [c for c in df.columns if c != id_col]
    return sims.groupBy(id_col).agg(
        *[F.first(c).alias(c) for c in carried],
        F.max_by(
            "label", F.struct(F.col("__sim"), (-F.col("label")).alias("nl"))
        ).alias(out_col),
    ).select(id_col, *carried, out_col)


def kmeans_lloyd(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    init_centroids: DataFrame,
    n_iters: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Lloyd's k-means: fixed-iteration distributed refinement.

    Each iteration assigns every vector to its nearest centroid (cosine,
    broadcast codebook — one corpus pass, no corpus shuffle) and
    recomputes centroids as element-wise means (posexplode + two
    small-key aggregations, the label_centroids pattern). Centroids are
    ROUNDED to `round_to` decimals after each recompute: this pins the
    iteration trajectory across engines/summation orders (ulp-level avg
    differences would otherwise compound into diverging assignments),
    which is what makes the DuckDB oracle exact.

    `init_centroids`: (label, centroid array<double>) — pass a
    deterministic seed (e.g. vectors with the k smallest ids).
    Driver-side loop over a FIXED n_iters (no convergence collect) —
    each iteration is a fully distributed job. Returns (label, centroid)
    after n_iters.
    """
    cents = init_centroids
    for _ in range(n_iters):
        assigned = ivf_assign(corpus, cents, id_col, vec_col, out_col="__b")
        exploded = assigned.select(
            F.col("__b").alias("label"),
            F.posexplode(as_double_array(vec_col)).alias("pos", "v"),
        )
        by_pos = exploded.groupBy("label", "pos").agg(
            F.round(F.avg("v"), round_to).alias("m")
        )
        cents = (
            by_pos.groupBy("label")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("label", F.transform("pm", lambda s: s["m"]).alias("centroid"))
        )
    return cents


def sign_lsh_key(vec_col, dims: list[int]):
    """Random-hyperplane-style LSH bucket key from coordinate signs:
    bit i = (vec[dims[i]] >= 0). With axis-aligned hyperplanes the key
    is engine-portable (the oracle recomputes it in SQL) while keeping
    the LSH property — cosine-similar vectors agree on most signs.
    `dims` are 1-based (element_at), matching SQL array indexing."""
    bits = [
        F.when(F.element_at(vec_col, d) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for d in dims
    ]
    return F.concat(*bits)


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dims: list[int],
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
) -> DataFrame:
    """Approximate top-k: equi-join queries to corpus on the sign-LSH
    bucket, rank by cosine within the bucket. The crossJoin of
    brute_force_topk becomes a hash join on the bucket key — at 100 TB
    the corpus shuffles once on ~2^|dims| keys (or stays put with the
    queries broadcast) and each query scans only its bucket. Recall is
    tunable via |dims| (fewer bits = bigger buckets = higher recall)."""
    qb = queries.withColumn("__bk", sign_lsh_key(F.col(q_vec), dims))
    cb = corpus.withColumn("__bk", sign_lsh_key(F.col(c_vec), dims))
    joined = cb.join(F.broadcast(qb), "__bk").filter(F.col(q_id) != F.col(c_id))
    joined = joined.withColumn("sim", cosine(F.col(q_vec), F.col(c_vec)))
    w = W.partitionBy(q_id).orderBy(F.desc("sim"), F.asc(c_id))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(q_id, c_id, F.round("sim", 4).alias("cos_sim"), "rn")
    )
