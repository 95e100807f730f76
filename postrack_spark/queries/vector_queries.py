"""Vector similarity-search queries over the embeddings table
(array<float>, 64-d, ground-truth cluster label).

Spark math is higher-order built-ins over array<double>; the oracle
uses DuckDB's list_* functions over embedding::DOUBLE[] — both engines
sum sequentially in double over identical float32 inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postrack_spark.functions.vector import as_double_array, cosine, norm
from postrack_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    label_centroids,
)
from postrack_spark.queries.registry import query
from postrack_spark.session import fan_out, load_tables


@query(
    "vector_norm_stats",
    oracle="""
    SELECT label,
           count(*) AS n_vectors,
           round(avg(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
             AS avg_norm,
           round(avg(embedding[1]::DOUBLE), 6) AS avg_first_dim
    FROM embeddings
    GROUP BY label
    ORDER BY label
    """,
)
def vector_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster vector statistics (norms via aggregate/zip_with)."""
    t = load_tables(spark, sf_dir)
    vec = as_double_array("embedding")
    return (
        fan_out(t["embeddings"])
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg(norm(vec)), 4).alias("avg_norm"),
            F.round(F.avg(F.element_at(vec, 1)), 6).alias("avg_first_dim"),
        )
        .orderBy("label")
    )


@query(
    "vector_knn_bruteforce",
    oracle="""
    WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS c_id, embedding::DOUBLE[] AS c_vec FROM embeddings),
    sims AS (
      SELECT q_id, c_id, list_cosine_similarity(q_vec, c_vec) AS sim
      FROM q CROSS JOIN c
      WHERE q_id <> c_id
    ),
    ranked AS (
      SELECT q_id, c_id, sim,
             row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rn
      FROM sims
    )
    SELECT q_id, c_id, round(sim, 4) AS cos_sim, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= 10
    ORDER BY q_id, rn
    """,
)
def vector_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for 5 query vectors: broadcast queries ×
    one corpus pass × per-query window — the ANN correctness baseline."""
    t = load_tables(spark, sf_dir)
    emb = fan_out(t["embeddings"])
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), as_double_array("embedding").alias("q_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), as_double_array("embedding").alias("c_vec")
    )
    return brute_force_topk(queries, corpus, k=10, exclude_self=True).orderBy("q_id", "rn")


@query(
    "vector_ivf_search",
    oracle="""
    WITH dims AS (
      SELECT label, g.i AS pos, avg(embedding[g.i]::DOUBLE) AS m
      FROM embeddings CROSS JOIN generate_series(1, 64) AS g(i)
      GROUP BY label, g.i
    ),
    centroids AS (
      SELECT label, list(m ORDER BY pos) AS centroid FROM dims GROUP BY label
    ),
    q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec FROM embeddings WHERE vec_id < 5),
    assign AS (
      SELECT q_id, arg_max(label, list_cosine_similarity(q_vec, centroid)) AS bucket
      FROM q CROSS JOIN centroids
      GROUP BY q_id
    ),
    cand AS (
      SELECT a.q_id, e.vec_id AS c_id,
             list_cosine_similarity(q.q_vec, e.embedding::DOUBLE[]) AS sim
      FROM assign a
      JOIN q ON q.q_id = a.q_id
      JOIN embeddings e ON e.label = a.bucket AND e.vec_id <> a.q_id
    ),
    ranked AS (
      SELECT q_id, c_id, sim,
             row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rn
      FROM cand
    )
    SELECT q_id, c_id, round(sim, 4) AS cos_sim, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= 5
    ORDER BY q_id, rn
    """,
)
def vector_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse codebook = per-label centroids; probe the
    nearest bucket only, exact top-5 within it. The scale path — the
    corpus is partitioned by bucket, the query touches one partition."""
    t = load_tables(spark, sf_dir)
    emb = fan_out(t["embeddings"])
    centroids = label_centroids(emb, "embedding", "label")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), as_double_array("embedding").alias("q_vec")
    )
    assigned = ivf_assign(queries, centroids, "q_id", "q_vec", out_col="bucket")
    cand = (
        assigned.join(emb.alias("e"), F.col("e.label") == F.col("bucket"))
        .filter(F.col("e.vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("e.vec_id").alias("c_id"),
            cosine(F.col("q_vec"), as_double_array("e.embedding")).alias("sim"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("c_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("q_id", "c_id", F.round("sim", 4).alias("cos_sim"), "rn")
        .orderBy("q_id", "rn")
    )


@query(
    "vector_embedding_near_dup",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.label, count(*) AS n_pairs,
           round(avg(list_cosine_similarity(a.v, b.v)), 4) AS avg_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.35
    GROUP BY a.label
    ORDER BY a.label
    """,
)
def vector_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection, label-blocked
    (the embedding analogue of MinHash dedup: block, then verify).
    Threshold 0.35 sits in the upper tail of the driver data's
    intra-cluster cosine distribution (max ≈ 0.55)."""
    t = load_tables(spark, sf_dir)
    e = fan_out(t["embeddings"]).select("vec_id", "label", as_double_array("embedding").alias("v"))
    a = e.select(F.col("vec_id").alias("ida"), "label", F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("idb"), "label", F.col("v").alias("vb"))
    return (
        a.join(b, "label")
        .filter(F.col("ida") < F.col("idb"))
        .withColumn("sim", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= 0.35)
        .groupBy("label")
        .agg(F.count("*").alias("n_pairs"), F.round(F.avg("sim"), 4).alias("avg_sim"))
        .orderBy("label")
    )


def _kmeans_oracle(n_iters: int = 2, k: int = 8, dims: int = 64) -> str:
    """CTE chain: seed -> (assign -> recompute)*n -> final assign stats.
    Mirrors operators.similarity.kmeans_lloyd including the per-
    iteration centroid rounding that pins the trajectory."""
    parts = [
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"c0 AS (SELECT vec_id AS label, v AS centroid FROM e WHERE vec_id < {k})",
    ]
    for it in range(1, n_iters + 1):
        prev = f"c{it - 1}"
        parts.append(
            f"""a{it} AS (
              SELECT vec_id, label,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY list_cosine_similarity(v, centroid) DESC, label) AS rn
              FROM e CROSS JOIN {prev})"""
        )
        parts.append(f"b{it} AS (SELECT vec_id, label FROM a{it} WHERE rn = 1)")
        parts.append(
            f"""d{it} AS (
              SELECT b{it}.label, g.i AS pos, round(avg(e.v[g.i]), 6) AS m
              FROM b{it} JOIN e USING (vec_id)
              CROSS JOIN generate_series(1, {dims}) g(i)
              GROUP BY b{it}.label, g.i)"""
        )
        parts.append(
            f"c{it} AS (SELECT label, list(m ORDER BY pos) AS centroid FROM d{it} GROUP BY label)"
        )
    last = f"c{n_iters}"
    return (
        ",\n".join(parts)
        + f""",
    fin AS (
      SELECT vec_id, label, list_cosine_similarity(v, centroid) AS sim,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY list_cosine_similarity(v, centroid) DESC, label) AS rn
      FROM e CROSS JOIN {last})
    SELECT label, count(*) AS n_vectors, round(avg(sim), 4) AS avg_sim
    FROM fin WHERE rn = 1
    GROUP BY label
    ORDER BY label
    """
    )


@query("vector_kmeans_lloyd", oracle=_kmeans_oracle())
def vector_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means, 2 Lloyd iterations from 8 deterministic seed
    vectors: broadcast-codebook assignment (no corpus shuffle) + small-
    key centroid recompute per iteration, centroids rounded each pass so
    the trajectory is bit-stable across engines — the oracle replays the
    identical iterations in SQL."""
    from pyspark.sql import Window as W

    from postrack_spark.operators.similarity import kmeans_lloyd

    t = load_tables(spark, sf_dir)
    e = fan_out(t["embeddings"]).select("vec_id", as_double_array("embedding").alias("v"))
    seeds = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("label"), F.col("v").alias("centroid")
    )
    cents = kmeans_lloyd(e, "vec_id", "v", seeds, n_iters=2)
    sims = e.crossJoin(F.broadcast(cents)).withColumn("sim", cosine(F.col("v"), F.col("centroid")))
    w = W.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("label"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("label")
        .agg(F.count("*").alias("n_vectors"), F.round(F.avg("sim"), 4).alias("avg_sim"))
        .orderBy("label")
    )


@query(
    "vector_quantize_int8",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (
      SELECT vec_id, label, v,
             127.0 / list_max(list_transform(v, x -> abs(x))) AS scale
      FROM e
    ),
    q AS (
      SELECT vec_id, label, v, scale,
             list_transform(v, x -> CAST(floor(x * scale + 0.5) AS INT)) AS qv
      FROM s
    ),
    err AS (
      SELECT label,
             list_aggregate(
               list_transform(list_zip(v, qv),
                              p -> abs(p[1] - p[2] / scale)), 'sum') / len(v) AS mae
      FROM q
    )
    SELECT label, count(*) AS n_vectors, round(avg(mae), 4) AS avg_mae
    FROM err GROUP BY label ORDER BY label
    """,
)
def vector_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization (per-vector absmax scale) with
    reconstruction-error accounting — the embedding-compression
    primitive (4x storage cut for ANN at scale). floor(x*scale+0.5)
    keeps the rounding rule identical across engines; all math is
    Catalyst lambdas, no Python."""
    t = load_tables(spark, sf_dir)
    e = fan_out(t["embeddings"]).select("vec_id", "label", as_double_array("embedding").alias("v"))
    scale = 127.0 / F.array_max(F.transform("v", F.abs))
    s = e.withColumn("scale", scale)
    q = s.withColumn(
        "qv", F.transform("v", lambda x: F.floor(x * F.col("scale") + 0.5).cast("int"))
    )
    mae = (
        F.aggregate(
            F.zip_with("v", "qv", lambda x, qx: F.abs(x - qx / F.col("scale"))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.size("v")
    )
    return (
        q.select("label", mae.alias("mae"))
        .groupBy("label")
        .agg(F.count("*").alias("n_vectors"), F.round(F.avg("mae"), 4).alias("avg_mae"))
        .orderBy("label")
    )


_LSH_BITS_SQL = " || ".join(
    f"CASE WHEN embedding[{d}] >= 0 THEN '1' ELSE '0' END" for d in range(1, 9)
)


@query(
    "vector_lsh_ann",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec, {_LSH_BITS_SQL} AS bk
      FROM embeddings WHERE vec_id < 8
    ),
    c AS (
      SELECT vec_id AS c_id, embedding::DOUBLE[] AS c_vec, {_LSH_BITS_SQL} AS bk
      FROM embeddings
    ),
    sims AS (
      SELECT q_id, c_id, list_cosine_similarity(q_vec, c_vec) AS sim
      FROM q JOIN c USING (bk) WHERE q_id <> c_id
    ),
    ranked AS (
      SELECT q_id, c_id, sim,
             row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rn
      FROM sims
    )
    SELECT q_id, c_id, round(sim, 4) AS cos_sim, CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= 10
    ORDER BY q_id, rn
    """,
)
def vector_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via sign-LSH bucketing (random-hyperplane family with
    axis-aligned planes, 8 bits): queries equi-join their bucket
    instead of cross-joining the corpus — the second scale path next
    to IVF (vector_ivf_search). Exactly reproducible in SQL, so unlike
    most ANN implementations this one is value-checked by the oracle."""
    from postrack_spark.operators.similarity import lsh_bucketed_topk

    t = load_tables(spark, sf_dir)
    emb = fan_out(t["embeddings"])
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), as_double_array("embedding").alias("q_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), as_double_array("embedding").alias("c_vec")
    )
    return lsh_bucketed_topk(queries, corpus, k=10, dims=list(range(1, 9))).orderBy(
        "q_id", "rn"
    )


@query(
    "vector_semantic_clusters",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= 0.35
    ),
    bidir AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(doc, root) AS (
      SELECT src, src FROM bidir
      UNION
      SELECT b.dst, r.root FROM reach r JOIN bidir b ON b.src = r.doc
    ),
    labeled AS (SELECT doc, min(root) AS cluster FROM reach GROUP BY doc)
    SELECT cluster, count(*) AS n_vecs, CAST(max(doc) AS BIGINT) AS max_vec
    FROM labeled
    GROUP BY cluster
    ORDER BY cluster
    """,
)
def vector_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic duplicate CLUSTERS: embedding-cosine near-dup pairs
    (label-blocked, >= 0.35) closed into connected components — the
    embedding-space analogue of dedup_duplicate_clusters, composing the
    similarity and graph operators ('keep one representative per
    semantic group'). Oracle recomputes the closure recursively."""
    from postrack_spark.operators.dedup import connected_components

    t = load_tables(spark, sf_dir)
    e = fan_out(t["embeddings"]).select(
        "vec_id", "label", as_double_array("embedding").alias("v")
    )
    a = e.select(F.col("vec_id").alias("doc_a"), "label", F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("doc_b"), "label", F.col("v").alias("vb"))
    pairs = (
        a.join(b, "label")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(cosine(F.col("va"), F.col("vb")) >= 0.35)
        .select("doc_a", "doc_b")
    )
    comp = connected_components(pairs)
    return (
        comp.groupBy("cluster")
        .agg(F.count("*").alias("n_vecs"), F.max("doc").cast("bigint").alias("max_vec"))
        .orderBy("cluster")
    )


@query(
    "vector_truncated_recall",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < 5),
    full_rank AS (
      SELECT q_id, e.vec_id AS c_id,
             row_number() OVER (PARTITION BY q_id
               ORDER BY list_cosine_similarity(q_vec, e.v) DESC, e.vec_id) AS rn
      FROM q JOIN e ON e.vec_id <> q_id
    ),
    trunc_rank AS (
      SELECT q_id, e.vec_id AS c_id,
             row_number() OVER (PARTITION BY q_id
               ORDER BY list_cosine_similarity(q_vec[1:16], e.v[1:16]) DESC, e.vec_id) AS rn
      FROM q JOIN e ON e.vec_id <> q_id
    )
    SELECT f.q_id,
           CAST(count(t.c_id) AS BIGINT) AS n_kept,
           round(count(t.c_id) / 10.0, 2) AS recall_at_10
    FROM full_rank f
    LEFT JOIN trunc_rank t ON t.q_id = f.q_id AND t.c_id = f.c_id AND t.rn <= 10
    WHERE f.rn <= 10
    GROUP BY f.q_id
    ORDER BY f.q_id
    """,
)
def vector_truncated_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension truncation evaluated in place: recall
    @10 of 16-dim-prefix cosine search against the full 64-dim ranking
    — the measurement that decides whether a cheap prefix index can
    front the full-precision search at scale. Both rankings and their
    overlap are computed engine-side and oracle-checked."""
    t = load_tables(spark, sf_dir)
    e = fan_out(t["embeddings"]).select("vec_id", as_double_array("embedding").alias("v"))
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
    )

    from pyspark.sql import Window

    def ranked(vec_slice):
        joined = e.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("q_id"))
        sim = cosine(vec_slice(F.col("q_vec")), vec_slice(F.col("v")))
        w = Window.partitionBy("q_id").orderBy(F.desc(sim), F.asc("vec_id"))
        return joined.select(
            "q_id", F.col("vec_id").alias("c_id"), F.row_number().over(w).alias("rn")
        )

    full_rank = ranked(lambda c: c).filter(F.col("rn") <= 10)
    trunc_rank = (
        ranked(lambda c: F.slice(c, 1, 16))
        .filter(F.col("rn") <= 10)
        .select(F.col("q_id").alias("tq"), F.col("c_id").alias("tc"))
    )
    return (
        full_rank.join(
            trunc_rank,
            (F.col("q_id") == F.col("tq")) & (F.col("c_id") == F.col("tc")),
            "left",
        )
        .groupBy("q_id")
        .agg(
            F.count("tc").cast("bigint").alias("n_kept"),
            F.round(F.count("tc") / 10.0, 2).alias("recall_at_10"),
        )
        .orderBy("q_id")
    )


@query(
    "vector_pq_codebook_error",
    oracle="""
    WITH q AS (
      SELECT vec_id, label, (i - 1) AS d, ((i - 1) // 8) AS s,
             CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS v
      FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
    ),
    cb AS (
      SELECT label AS cl, s, d, CAST(round(avg(v)) AS BIGINT) AS c
      FROM q GROUP BY label, s, d
    ),
    dist AS (
      SELECT q.vec_id, q.label, q.s, cb.cl,
             CAST(sum((q.v - cb.c) * (q.v - cb.c)) AS BIGINT) AS dist2
      FROM q JOIN cb ON cb.s = q.s AND cb.d = q.d
      GROUP BY q.vec_id, q.label, q.s, cb.cl
    ),
    best AS (
      SELECT vec_id, label, s,
             min(struct_pack(d2 := dist2, cl := cl)) AS b
      FROM dist GROUP BY vec_id, label, s
    )
    SELECT CAST(s AS INT) AS subspace,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(b.d2) AS BIGINT) AS total_sq_error,
           CAST(sum(CASE WHEN b.cl = label THEN 1 ELSE 0 END) AS BIGINT)
             AS n_label_match
    FROM best GROUP BY s ORDER BY subspace
    """,
)
def vector_pq_codebook_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: 64-dim embeddings split into 8 subspaces of
    8 dims; each subvector encodes as its nearest per-label centroid
    (supervised codebook — deterministic, no iterative training). The
    whole pipeline runs on a fixed-point integer grid (milli-units), so
    centroid assignment and reconstruction error are exact integers and
    bit-identical cross-engine — no fp-argmin flakiness. Argmin is
    min(struct(dist2, codeword)) — an aggregate with partial/final
    split and a deterministic smallest-codeword tie-break, instead of a
    row_number window (no per-(vec, subspace) sort). Scale: the
    codebook (labels x dims rows) broadcasts; assignment is O(N·D·K)
    map-side compute + two hash aggs, the same shape IVF assignment
    uses."""
    t = load_tables(spark, sf_dir)
    q = (
        fan_out(t["embeddings"])
        .select("vec_id", "label", F.posexplode("embedding").alias("d", "e"))
        .select(
            "vec_id",
            "label",
            "d",
            F.floor(F.col("d") / 8).cast("int").alias("s"),
            F.round(F.col("e").cast("double") * 1000).cast("bigint").alias("v"),
        )
    )
    cb = q.groupBy(F.col("label").alias("cl"), "s", "d").agg(
        F.round(F.avg("v")).cast("bigint").alias("c")
    )
    diff = F.col("v") - F.col("c")
    dist = (
        q.join(F.broadcast(cb), ["s", "d"])
        .groupBy("vec_id", "label", "s", "cl")
        .agg(F.sum(diff * diff).cast("bigint").alias("dist2"))
    )
    best = dist.groupBy("vec_id", "label", "s").agg(
        F.min(F.struct(F.col("dist2").alias("d2"), F.col("cl").alias("cl"))).alias("b")
    )
    return (
        best.groupBy(F.col("s").cast("int").alias("subspace"))
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.sum("b.d2").cast("bigint").alias("total_sq_error"),
            F.sum(F.when(F.col("b.cl") == F.col("label"), 1).otherwise(0))
                .cast("bigint")
                .alias("n_label_match"),
        )
        .orderBy("subspace")
    )


@query(
    "vector_ivf_recall_probes",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < 20),
    dims AS (
      SELECT label, g.i AS pos, avg(embedding[g.i]::DOUBLE) AS m
      FROM embeddings CROSS JOIN generate_series(1, 64) AS g(i)
      GROUP BY label, g.i
    ),
    centroids AS (
      SELECT label, list(m ORDER BY pos) AS centroid FROM dims GROUP BY label
    ),
    branks AS (
      SELECT q_id, c.label AS bucket,
             row_number() OVER (
               PARTITION BY q_id
               ORDER BY list_cosine_similarity(q_vec, centroid) DESC, c.label
             ) AS brn
      FROM q CROSS JOIN centroids c
    ),
    truth AS (
      SELECT q_id, vec_id, lab FROM (
        SELECT q.q_id, e.vec_id, e.label AS lab,
               row_number() OVER (
                 PARTITION BY q.q_id
                 ORDER BY list_cosine_similarity(q.q_vec, e.v) DESC, e.vec_id
               ) AS rn
        FROM q JOIN e ON e.vec_id <> q.q_id
      ) WHERE rn <= 10
    ),
    hits AS (
      SELECT kk.k AS nprobe, count(*) AS n_hit
      FROM (VALUES (1), (2), (4)) kk(k)
      JOIN truth t ON TRUE
      JOIN branks b ON b.q_id = t.q_id AND b.bucket = t.lab AND b.brn <= kk.k
      GROUP BY kk.k
    )
    SELECT kk.k AS nprobe,
           CAST(coalesce(h.n_hit, 0) AS BIGINT) AS total_hits,
           round(coalesce(h.n_hit, 0) * 1.0 / (SELECT count(*) FROM truth), 6)
             AS recall_at_10
    FROM (VALUES (1), (2), (4)) kk(k)
    LEFT JOIN hits h ON h.nprobe = kk.k
    ORDER BY nprobe
    """,
)
def vector_ivf_recall_probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF recall-vs-probes sweep: fraction of the exact cosine top-10
    that lives inside the 1 / 2 / 4 nearest coarse buckets — the
    tuning curve that picks nprobe at scale (more probes = more
    partitions scanned = higher recall; the knob trades scan volume
    for recall exactly like LSH band geometry trades shuffle volume).
    Truth and bucket rankings tie-break deterministically; recall is an
    integer hit count over the fixed 200 truth rows, one division."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    e = fan_out(t["embeddings"]).select(
        "vec_id", "label", as_double_array("embedding").alias("v")
    )
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
    )
    centroids = label_centroids(t["embeddings"], "embedding", "label")
    branks = (
        q.join(F.broadcast(centroids))
        .withColumn("bsim", cosine(F.col("q_vec"), F.col("centroid")))
        .withColumn(
            "brn",
            F.row_number().over(
                W.partitionBy("q_id").orderBy(F.desc("bsim"), F.asc("label"))
            ),
        )
        .select("q_id", F.col("label").alias("bucket"), "brn")
    )
    truth = (
        q.join(e, e.vec_id != q.q_id)
        .withColumn("sim", cosine(F.col("q_vec"), F.col("v")))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
            ),
        )
        .filter(F.col("rn") <= 10)
        .select("q_id", F.col("label").alias("lab"))
    )
    n_truth = truth.count()
    probes = spark.createDataFrame([(1,), (2,), (4,)], "nprobe int")
    # truth x probes is a bounded 200x3 grid (not a data-path crossJoin)
    hits = (
        truth.crossJoin(F.broadcast(probes))
        .alias("t")
        .join(
            F.broadcast(branks).alias("b"),
            F.expr("t.q_id = b.q_id AND t.lab = b.bucket AND b.brn <= t.nprobe"),
        )
        .groupBy("t.nprobe")
        .agg(F.count("*").alias("n_hit"))
        .toDF("np", "n_hit")
    )
    return (
        probes.join(hits, probes.nprobe == F.col("np"), "left")
        .select(
            probes.nprobe.alias("nprobe"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("bigint").alias("total_hits"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(n_truth), 6
            ).alias("recall_at_10"),
        )
        .orderBy("nprobe")
    )


@query(
    "retrieval_rrf_fusion",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents
    ),
    dl AS (
      SELECT doc_id, CAST(len(str_split(text, ' ')) AS BIGINT) AS dl FROM documents
    ),
    corpus AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS total_len
      FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      FROM toks WHERE tok IN ('fast', 'value', 'error')
      GROUP BY doc_id, tok
    ),
    df AS (
      SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks WHERE tok IN ('fast', 'value', 'error')
      GROUP BY tok
    ),
    bm25 AS (
      SELECT tf.doc_id,
             CAST(sum(((1000000 * (2*c.n_docs - 2*df.df + 1)) // (2*df.df + 1))
               * (44 * c.total_len * tf.tf)
               // (20 * c.total_len * tf.tf + 6 * c.total_len + 18 * dl.dl * c.n_docs))
               AS BIGINT) AS bm25_micro
      FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN corpus c
      GROUP BY tf.doc_id
    ),
    lex AS (
      SELECT doc_id AS id,
             row_number() OVER (ORDER BY bm25_micro DESC, doc_id) AS r_lex
      FROM bm25
    ),
    qv AS (SELECT embedding::DOUBLE[] AS q_vec FROM embeddings WHERE vec_id = 0),
    sims AS (
      SELECT vec_id AS id, list_cosine_similarity(embedding::DOUBLE[], q_vec) AS sim
      FROM embeddings CROSS JOIN qv WHERE vec_id <> 0
    ),
    vec AS (
      SELECT id, row_number() OVER (ORDER BY sim DESC, id) AS r_vec FROM sims
    ),
    fused AS (
      SELECT coalesce(lex.id, vec.id) AS id,
             CAST(coalesce(1000000 // (60 + r_lex), 0)
                + coalesce(1000000 // (60 + r_vec), 0) AS BIGINT) AS rrf_micro,
             CAST(r_lex AS BIGINT) AS r_lex, CAST(r_vec AS BIGINT) AS r_vec
      FROM lex FULL OUTER JOIN vec USING (id)
    )
    SELECT id, rrf_micro, r_lex, r_vec
    FROM fused
    ORDER BY rrf_micro DESC, id
    LIMIT 10
    """,
)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval capstone: reciprocal-rank fusion (k=60) of the
    lexical BM25 ranking (staged-integer scoring over the fixed query
    {fast, value, error}) and the dense cosine ranking against the
    vec_id-0 embedding, joined on document id. BOTH rank lists are
    corpus-sized hit sets at 100 TB, so each is ranked with
    operators/ranking.global_row_number (range shuffle, zero
    WindowExec) rather than an unpartitioned row_number; the fusion is
    integer micro-units (1e6 // (60 + rank)), a full-outer join on id,
    and a TakeOrderedAndProject top-10. Cross-engine exact: BM25 is
    all-integer, the cosine doubles are bit-identical to DuckDB's
    list_cosine_similarity (same fold — proven by the hash-gated
    vector_knn_bruteforce), and RRF is integer floor division."""
    from postrack_spark.operators.ranking import global_row_number

    t = load_tables(spark, sf_dir)
    terms = ["fast", "value", "error"]
    docs = fan_out(t["documents"])
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok").isin(terms)
    )
    dl = docs.select("doc_id", F.size(F.split("text", " ")).cast("bigint").alias("dl"))
    corpus = docs.groupBy().agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("total_len"),
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").cast("bigint").alias("tf"))
    df = toks.groupBy("tok").agg(F.count_distinct("doc_id").cast("bigint").alias("df"))
    bm25 = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "s",
            F.expr(
                "((1000000 * (2*n_docs - 2*df + 1)) div (2*df + 1))"
                " * (44 * total_len * tf)"
                " div (20 * total_len * tf + 6 * total_len + 18 * dl * n_docs)"
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("s").cast("bigint").alias("bm25_micro"))
    )
    lex = global_row_number(
        bm25, [F.desc("bm25_micro"), F.asc("doc_id")], "r_lex"
    ).select(F.col("doc_id").alias("id"), "r_lex")

    emb = fan_out(t["embeddings"])
    qv = emb.filter(F.col("vec_id") == 0).select(
        as_double_array("embedding").alias("q_vec")
    )
    sims = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))  # 1-row query vector
        .select(
            F.col("vec_id").alias("id"),
            cosine(as_double_array("embedding"), F.col("q_vec")).alias("sim"),
        )
    )
    vec = global_row_number(sims, [F.desc("sim"), F.asc("id")], "r_vec").select(
        "id", "r_vec"
    )
    fused = (
        lex.join(vec, "id", "full_outer")
        .select(
            "id",
            (
                F.coalesce(F.expr("1000000 div (60 + r_lex)"), F.lit(0))
                + F.coalesce(F.expr("1000000 div (60 + r_vec)"), F.lit(0))
            ).cast("bigint").alias("rrf_micro"),
            F.col("r_lex").cast("bigint").alias("r_lex"),
            F.col("r_vec").cast("bigint").alias("r_vec"),
        )
    )
    return fused.orderBy(F.desc("rrf_micro"), F.asc("id")).limit(10)


_Q8 = "SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_vec FROM embeddings WHERE vec_id < 8"
_C_ALL = "SELECT vec_id AS c_id, embedding::DOUBLE[] AS c_vec FROM embeddings"


@query(
    "vector_ann_mrr_eval",
    oracle=f"""
    WITH q AS ({_Q8}),
    c AS ({_C_ALL}),
    ex0 AS (
      SELECT q_id, c_id,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY list_cosine_similarity(q_vec, c_vec) DESC, c_id) AS rn
      FROM q CROSS JOIN c WHERE q_id <> c_id
    ),
    ex AS (SELECT q_id, c_id, rn FROM ex0 WHERE rn <= 10),
    qb AS (SELECT q_id, q_vec, {_LSH_BITS_SQL.replace("embedding", "q_vec")} AS bk
           FROM q),
    cb AS (SELECT c_id, c_vec, {_LSH_BITS_SQL.replace("embedding", "c_vec")} AS bk
           FROM c),
    ann0 AS (
      SELECT q_id, c_id,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY list_cosine_similarity(q_vec, c_vec) DESC, c_id) AS arn
      FROM qb JOIN cb USING (bk) WHERE q_id <> c_id
    ),
    ann AS (SELECT q_id, c_id, arn FROM ann0 WHERE arn <= 10)
    SELECT e.q_id,
           CAST(count(a.c_id) AS BIGINT) AS hits_at_10,
           CAST(max(CASE WHEN e.rn = 1 THEN coalesce(2520 // a.arn, 0) END) AS BIGINT)
             AS rr_x2520
    FROM ex e LEFT JOIN ann a USING (q_id, c_id)
    GROUP BY e.q_id
    ORDER BY e.q_id
    """,
)
def vector_ann_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation of the sign-LSH ANN index against
    exact brute force: per query, recall@10 (hits_at_10) and the
    reciprocal rank of the TRUE nearest neighbor inside the ANN list —
    expressed in 2520ths (lcm of 1..10) so MRR stays an exact integer
    and never touches cross-engine float division. This is the
    measurement loop an embedding-dedup pipeline runs when tuning LSH
    bits vs recall (cf. dedup_lsh_recall_eval for the MinHash side).
    Scale: exact side is the broadcast-query corpus pass of
    vector_knn_bruteforce (the evaluation SAMPLE of queries is small by
    construction); ANN side probes only matching buckets; the final
    compare joins two O(|queries|*10) frames."""
    from postrack_spark.operators.similarity import lsh_bucketed_topk

    t = load_tables(spark, sf_dir)
    emb = fan_out(t["embeddings"])
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), as_double_array("embedding").alias("q_vec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), as_double_array("embedding").alias("c_vec")
    )
    exact = brute_force_topk(queries, corpus, k=10, exclude_self=True).select(
        "q_id", "c_id", "rn"
    )
    ann = lsh_bucketed_topk(queries, corpus, k=10, dims=list(range(1, 9))).select(
        "q_id", "c_id", F.col("rn").alias("arn")
    )
    joined = exact.join(ann, ["q_id", "c_id"], "left")
    return (
        joined.groupBy("q_id")
        .agg(
            F.count("arn").cast("long").alias("hits_at_10"),
            F.max(
                F.when(
                    F.col("rn") == 1,
                    F.coalesce(F.expr("2520 div arn"), F.lit(0)),
                )
            )
            .cast("long")
            .alias("rr_x2520"),
        )
        .orderBy("q_id")
    )


@query(
    "vector_gram_matrix",
    oracle="""
    SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           CAST(sum(CAST(floor(embedding[i]::DOUBLE * 1000000.0) AS BIGINT)
                    * CAST(floor(embedding[j]::DOUBLE * 1000000.0) AS BIGINT)) AS BIGINT)
             AS gram
    FROM embeddings
    CROSS JOIN generate_series(1, 64) AS gi(i)
    CROSS JOIN generate_series(1, 64) AS gj(j)
    WHERE i <= j
    GROUP BY i, j
    ORDER BY i, j
    """,
)
def vector_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix X'X over the embedding corpus — the
    communication-optimal building block for exact distributed PCA /
    covariance / linear regression: each partition reduces its rows to
    ONE d x d partial (a numpy int64 matmul over the Arrow batch), so
    shuffle volume is O(partitions * d^2) regardless of corpus size,
    and the d x d result eigendecomposes on the driver. Values are
    integerized (floor(x * 1e6), IEEE-identical in numpy float64 and
    both SQL engines) so the partial sums are EXACT integers — double
    Gram matrices would hit the cross-engine association trap. Upper
    triangle only (symmetric): 2080 output rows at d=64. The Python
    boundary is Arrow-batched mapInPandas (never row-at-a-time); the
    oracle expands the quadratic form relationally, which is fine at
    oracle SF and would be the WRONG plan at 100 TB (4096x row
    expansion vs the map-side reduction here)."""
    import numpy as np
    import pandas as pd

    t = load_tables(spark, sf_dir)
    emb = fan_out(t["embeddings"]).select("embedding")

    def gram_partials(batches):
        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            q = np.floor(x * 1000000.0).astype(np.int64)
            g = q.T @ q
            acc = g if acc is None else acc + g
        if acc is not None:
            iu, ju = np.triu_indices(acc.shape[0])
            yield pd.DataFrame(
                {"i": (iu + 1).astype("int32"), "j": (ju + 1).astype("int32"), "gram": acc[iu, ju]}
            )

    return (
        emb.mapInPandas(gram_partials, "i int, j int, gram long")
        .groupBy("i", "j")
        .agg(F.sum("gram").cast("long").alias("gram"))
        .orderBy("i", "j")
    )


def _power_iter_oracle(n_iter: int = 5) -> str:
    """Unrolled power-iteration oracle (cf. graph_pagerank_top10's
    unrolled-CTE pattern): each iteration is a matvec over the Gram
    CTE followed by L-inf normalization, with the vector re-quantized
    to integer micros every round so the fixpoint trajectory is
    bit-identical in any engine."""
    parts = [
        """gram AS (
      SELECT i, j,
             CAST(floor(CAST(sum(CAST(floor(embedding[i]::DOUBLE * 1000000.0) AS BIGINT)
                                 * CAST(floor(embedding[j]::DOUBLE * 1000000.0) AS BIGINT))
                             AS DOUBLE) / 1000000.0) AS BIGINT) AS g6
      FROM embeddings
      CROSS JOIN generate_series(1, 64) AS gi(i)
      CROSS JOIN generate_series(1, 64) AS gj(j)
      GROUP BY i, j
    ),
    v0 AS (SELECT i AS j, CAST(1000000 AS BIGINT) AS v
           FROM generate_series(1, 64) AS s(i))"""
    ]
    for t in range(1, n_iter + 1):
        parts.append(
            f"""x{t} AS (
      SELECT gram.i, CAST(sum(gram.g6 * v{t-1}.v) AS BIGINT) AS x
      FROM gram JOIN v{t-1} ON gram.j = v{t-1}.j
      GROUP BY gram.i
    ),
    m{t} AS (SELECT CAST(max(abs(x)) AS BIGINT) AS m FROM x{t}),
    v{t} AS (
      SELECT i AS j,
             CAST(floor((1000000.0 * CAST(x AS DOUBLE)) / CAST(m AS DOUBLE)) AS BIGINT) AS v
      FROM x{t} CROSS JOIN m{t}
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT CAST(j AS INT) AS dim, v AS v_micro FROM v{n_iter} ORDER BY dim
    """
    )


@query("vector_pca_power_iteration", oracle=_power_iter_oracle(5))
def vector_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-iteration protocol on the DISTRIBUTED Gram matrix
    (vector_gram_matrix machinery — one corpus pass, O(partitions *
    d^2) shuffle), then d x d matvecs on the tiny aggregated frame: 5
    fixed rounds of the quantized power map. Honesty note: the
    synthetic corpus is near-ISOTROPIC (top eigengap ~1.02 measured at
    every SF), so five rounds of ANY power method cannot isolate the
    top eigenvector here; what this query pins is the distributed
    PCA *machinery* — the one-pass Gram reduction and the engine-exact
    iteration (tests/test_linalg.py proves the Spark trajectory equals
    a local numpy replica of the same recurrence bit-for-bit; on a
    gapped spectrum the identical loop with more rounds converges).
    Exactness protocol:
    the Gram is integer micros^2 rescaled by 1e-6 (floored in double —
    identical cross-engine even where `div` vs `//` would disagree on
    negatives); each iterate is L-INFINITY normalized and floored back
    to integer micros, so every matvec input is an exact int64 and the
    whole 5-round trajectory is bit-identical in any engine — power
    iteration as exact integer recurrences, like graph_pagerank_top10.
    L-inf (not L2) normalization keeps the per-round scalar an integer
    max instead of a 64-term float sum-of-squares; on a PSD Gram the
    dominant eigenvalue is positive so no sign oscillation. Scale: the
    corpus is touched ONCE (Gram partials); iterations cost d^2 rows
    per round regardless of n. Headroom: |x| <= 64 * max|g6| * 1e6 —
    int64-safe through ~10x the largest test SF, then rescale g6."""
    import numpy as np
    import pandas as pd

    t = load_tables(spark, sf_dir)
    emb = fan_out(t["embeddings"]).select("embedding")

    def gram_partials(batches):
        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            q = np.floor(x * 1000000.0).astype(np.int64)
            g = q.T @ q
            acc = g if acc is None else acc + g
        if acc is not None:
            ii, jj = np.indices(acc.shape)
            yield pd.DataFrame(
                {
                    "i": (ii.ravel() + 1).astype("int32"),
                    "j": (jj.ravel() + 1).astype("int32"),
                    "g": acc.ravel(),
                }
            )

    gram = (
        emb.mapInPandas(gram_partials, "i int, j int, g long")
        .groupBy("i", "j")
        .agg(
            F.floor(F.sum("g").cast("double") / F.lit(1000000.0))
            .cast("long")
            .alias("g6")
        )
    )
    # After the O(corpus) reduction the problem is d x d: the RIGHT
    # plan solves it in ONE task (Arrow-batched numpy over the single
    # repartitioned partition), not five 64-row shuffle rounds — same
    # integer recurrence the oracle unrolls, measured ~2 s faster than
    # the DataFrame-loop formulation it replaces (git history).
    def iterate(batches):
        import numpy as np
        import pandas as pd

        g = np.zeros((64, 64), dtype=np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            g[pdf["i"].to_numpy() - 1, pdf["j"].to_numpy() - 1] = pdf["g6"].to_numpy()
        if not seen:
            return
        v = np.full(64, 1000000, dtype=np.int64)
        for _ in range(5):
            x = g @ v  # exact int64 matvec
            m = np.float64(np.abs(x).max())
            v = np.floor(1000000.0 * x.astype(np.float64) / m).astype(np.int64)
        yield pd.DataFrame({"dim": np.arange(1, 65, dtype="int32"), "v_micro": v})

    return (
        gram.repartition(1)
        .mapInPandas(iterate, "dim int, v_micro long")
        .orderBy("dim")
    )


@query(
    "vector_centroid_drift",
    oracle="""
    WITH q AS (
      SELECT label,
             CASE WHEN ('0x' || substring(md5(vec_id::VARCHAR), 1, 8))::BIGINT
                       % 2 = 0 THEN 'a' ELSE 'b' END AS half,
             embedding
      FROM embeddings
    ),
    sums AS (
      SELECT label, half, g.i AS dim,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(embedding[g.i]::DOUBLE * 1000000.0) AS BIGINT))
                  AS BIGINT) AS s
      FROM q CROSS JOIN generate_series(1, 64) AS g(i)
      GROUP BY label, half, g.i
    ),
    paired AS (
      SELECT a.label, a.dim, a.n AS na, b.n AS nb,
             abs(a.s * b.n - b.s * a.n) AS d_num
      FROM sums a JOIN sums b ON a.label = b.label AND a.dim = b.dim
      WHERE a.half = 'a' AND b.half = 'b'
    )
    SELECT label,
           CAST(max(na) AS BIGINT) AS na,
           CAST(max(nb) AS BIGINT) AS nb,
           CAST(sum(d_num) AS BIGINT) AS l1_num,
           CAST(max(na) * max(nb) AS BIGINT) AS denom
    FROM paired
    GROUP BY label
    ORDER BY label
    """,
)
def vector_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift detection: split each label's
    vectors into two deterministic hash-halves (the 'reference' vs
    'candidate' windows of a production drift monitor), compute both
    centroids, and report the L1 centroid distance as an EXACT integer
    rational — per dimension |Sa*nb - Sb*na| over the common
    denominator na*nb, where S are integer-micro coordinate sums. No
    division or float mean ever happens, so the oracle matches
    bit-for-bit. Scale: one corpus pass folds to O(labels x 2 x d)
    sums map-side (the per-row 64-way expansion is array-local in
    Spark via posexplode of the integerized vector); the pairing join
    runs on that tiny frame. Headroom: |S| <= n * 5.3e5 micros, so
    S*n needs int64 at ~10^6 rows per (label, half) — rescale micros
    at larger per-group cardinalities."""
    t = load_tables(spark, sf_dir)
    half = F.when(
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 2 == 0,
        F.lit("a"),
    ).otherwise(F.lit("b"))
    q = fan_out(t["embeddings"]).select(
        "label",
        half.alias("half"),
        F.posexplode(
            F.expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))")
        ).alias("pos", "qv"),
    )
    sums = q.groupBy("label", "half", (F.col("pos") + 1).alias("dim")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("qv").cast("long").alias("s"),
    )
    a = sums.filter(F.col("half") == "a").select(
        "label", "dim", F.col("n").alias("na"), F.col("s").alias("sa")
    )
    b = sums.filter(F.col("half") == "b").select(
        "label", "dim", F.col("n").alias("nb"), F.col("s").alias("sb")
    )
    paired = a.join(b, ["label", "dim"]).select(
        "label",
        "na",
        "nb",
        F.abs(F.col("sa") * F.col("nb") - F.col("sb") * F.col("na")).alias("d_num"),
    )
    return (
        paired.groupBy("label")
        .agg(
            F.max("na").cast("long").alias("na"),
            F.max("nb").cast("long").alias("nb"),
            F.sum("d_num").cast("long").alias("l1_num"),
            (F.max("na") * F.max("nb")).cast("long").alias("denom"),
        )
        .orderBy("label")
    )


def _bitpack_sql(accessor_fmt: str, lo_dim: int) -> str:
    """32 sign bits of the embedding packed into one BIGINT word:
    bit (d - lo_dim) is set iff embedding[d] > 0. Generated as a flat
    literal-power sum so the SAME algorithm emits the Spark text
    (accessor 'element_at(embedding, {i})') and the DuckDB text
    ('embedding[{i}]') — the Morton-helper discipline from the layout
    family. Sign vs zero on the raw float32 parquet value is
    arithmetic-free, so the packed words are bit-identical
    cross-engine."""
    terms = " + ".join(
        f"(CASE WHEN {accessor_fmt.format(i=d)} > 0 THEN {1 << (d - lo_dim)}"
        " ELSE 0 END)"
        for d in range(lo_dim, lo_dim + 32)
    )
    return f"CAST({terms} AS BIGINT)"


_MILLI = "list_transform(embedding, x -> CAST(floor(x::DOUBLE * 1000.0) AS BIGINT))"


def _binary_hamming_oracle() -> str:
    w0 = _bitpack_sql("embedding[{i}]", 1)
    w1 = _bitpack_sql("embedding[{i}]", 33)
    return f"""
    WITH packed AS (
      SELECT vec_id, {w0} AS w0, {w1} AS w1,
             {_MILLI}::DOUBLE[] AS mv
      FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, w0 AS qw0, w1 AS qw1, mv AS qmv
          FROM packed WHERE vec_id < 10),
    scored AS (
      SELECT q.q_id, c.vec_id AS c_id,
             CAST(bit_count(xor(q.qw0, c.w0))
                  + bit_count(xor(q.qw1, c.w1)) AS INT) AS hamming,
             CAST(list_dot_product(q.qmv, c.mv) AS BIGINT) AS dot_milli
      FROM q CROSS JOIN packed c
      WHERE c.vec_id <> q.q_id
    ),
    ranked AS (
      SELECT q_id, c_id, hamming,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY hamming, c_id) AS rn,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY dot_milli DESC, c_id) AS rn_exact
      FROM scored
    )
    SELECT q_id, CAST(rn AS INT) AS rn, c_id, hamming,
           CAST(CASE WHEN rn_exact <= 10 THEN 1 ELSE 0 END AS INT) AS in_exact10
    FROM ranked WHERE rn <= 10
    ORDER BY q_id, rn
    """


@query("vector_binary_hamming_ann", oracle=_binary_hamming_oracle())
def vector_binary_hamming_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary quantization ANN: collapse each 64-d float vector to its
    64 SIGN BITS packed into two BIGINT words, score candidates by
    Hamming distance (two xor + two bit_count per pair — the 32x-
    compressed fast path modern vector stores scan before float
    rerank), and audit each query's Hamming top-10 against the exact
    milli-quantized dot-product top-10 (in_exact10 per row = the
    recall@10 numerator). Ten query vectors broadcast against the
    corpus — the bounded-frame combine shape shared with
    vector_knn_bruteforce; ranking windows are partitioned per query.

    Exactness: sign-vs-zero on the raw float32 needs no arithmetic, so
    packed words match cross-engine bit-for-bit; Hamming is integer;
    the exact-rank audit uses the shared milli grid (QUANTIZE_MILLI —
    products <= 2.5e5, sums < 2^53, so DuckDB's double list_dot_product
    equals Spark's integer fold). At 100 TB the packed words are what
    you SCAN (16 bytes/vector instead of 256) and the float column is
    only fetched for the rerank head — the plan here has that shape:
    the corpus side projects (vec_id, w0, w1, mv) only."""
    t = load_tables(spark, sf_dir)
    from postrack_spark.queries.stats_queries import QUANTIZE_MILLI_EXPR

    w0 = _bitpack_sql("element_at(embedding, {i})", 1)
    w1 = _bitpack_sql("element_at(embedding, {i})", 33)
    milli = QUANTIZE_MILLI_EXPR
    packed = fan_out(t["embeddings"]).select(
        "vec_id",
        F.expr(w0).alias("w0"),
        F.expr(w1).alias("w1"),
        F.expr(milli).alias("mv"),
    )
    q = (
        packed.filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("w0").alias("qw0"),
            F.col("w1").alias("qw1"),
            F.col("mv").alias("qmv"),
        )
    )
    scored = (
        packed.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("c_id"),
            F.expr(
                "CAST(bit_count(qw0 ^ w0) + bit_count(qw1 ^ w1) AS INT)"
            ).alias("hamming"),
            F.expr(
                "aggregate(zip_with(qmv, mv, (x, y) -> x * y),"
                " CAST(0 AS BIGINT), (a, x) -> a + x)"
            ).alias("dot_milli"),
        )
    )
    from pyspark.sql import Window as W

    ranked = scored.select(
        "q_id",
        "c_id",
        "hamming",
        F.row_number()
        .over(W.partitionBy("q_id").orderBy("hamming", "c_id"))
        .alias("rn"),
        F.row_number()
        .over(W.partitionBy("q_id").orderBy(F.col("dot_milli").desc(), "c_id"))
        .alias("rn_exact"),
    )
    return (
        ranked.filter(F.col("rn") <= 10)
        .select(
            "q_id",
            F.col("rn").cast("int").alias("rn"),
            "c_id",
            "hamming",
            (F.col("rn_exact") <= 10).cast("int").alias("in_exact10"),
        )
        .orderBy("q_id", "rn")
    )


_JL_DIM, _JL_K = 64, 8


def _jl_signs() -> list[tuple[int, int, int]]:
    """The fixed ±1 projection matrix for the JL distortion audit:
    s(i,j) = +1 iff the first byte of md5('jl_i_j') is even. Computed
    ONCE here in Python (hashlib md5 == both engines' md5) and emitted
    as identical literals to both sides — the one-generator discipline
    from _bitpack_sql, with the derivation hoisted to query-build time
    so neither engine needs a portable string-concat-of-ints idiom."""
    import hashlib

    return [
        (i, j, 1 if hashlib.md5(f"jl_{i}_{j}".encode()).digest()[0] % 2 == 0 else -1)
        for i in range(1, _JL_DIM + 1)
        for j in range(1, _JL_K + 1)
    ]


def _jl_oracle() -> str:
    values = ", ".join(f"({i},{j},{s})" for i, j, s in _jl_signs())
    return f"""
    WITH signs(i, j, s) AS (VALUES {values}),
    dims AS (
      SELECT vec_id, g.i,
             CAST(floor(embedding[g.i]::DOUBLE * 1000.0) AS BIGINT) AS qv
      FROM embeddings CROSS JOIN generate_series(1, {_JL_DIM}) AS g(i)
    ),
    proj AS (
      SELECT d.vec_id, signs.j, CAST(sum(signs.s * d.qv) AS BIGINT) AS y
      FROM dims d JOIN signs ON signs.i = d.i
      GROUP BY d.vec_id, signs.j
    ),
    dq AS (
      SELECT a.vec_id AS pa,
             CAST(sum((a.qv - b.qv) * (a.qv - b.qv)) AS BIGINT) AS dq2
      FROM dims a JOIN dims b ON b.vec_id = a.vec_id + 1 AND b.i = a.i
      GROUP BY a.vec_id
    ),
    dy AS (
      SELECT a.vec_id AS pa,
             CAST(sum((a.y - b.y) * (a.y - b.y)) AS BIGINT) AS dy2
      FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1 AND b.j = a.j
      GROUP BY a.vec_id
    ),
    ratios AS (
      SELECT dq.pa, (10000 * dy.dy2) // ({_JL_K} * dq.dq2) AS r
      FROM dq JOIN dy ON dy.pa = dq.pa
      WHERE dq.dq2 > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(min(r) AS BIGINT) AS min_ratio_pp10k,
           CAST(max(r) AS BIGINT) AS max_ratio_pp10k,
           CAST(sum(r) // count(*) AS BIGINT) AS avg_ratio_pp10k,
           CAST(sum(CASE WHEN r BETWEEN 7500 AND 12500 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_25pct,
           CAST(sum(CASE WHEN r BETWEEN 5000 AND 20000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_2x
    FROM ratios
    """


@query("vector_jl_projection_distortion", oracle=_jl_oracle())
def vector_jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign-projection distortion audit: project
    every milli-quantized embedding from 64 to 8 dims through the
    fixed ±1 matrix (y_j = Σ_i s_ij·q_i — for sign matrices
    E‖Δy‖² = k·‖Δq‖²), then measure, over the consecutive-vec_id pair
    chain, the ratio ‖Δy‖²/(k·‖Δq‖²) in pp10k — the distortion profile
    that tells a pipeline whether an 8-d sketch is safe for coarse
    candidate pruning before exact rerank. Everything is exact int64
    (quantized dims ~5e2, projections ~4e3, squared distances ≤1e9;
    positive floor division agrees cross-engine), so the profile
    hash-gates — the JL bound itself is probabilistic over matrices,
    so what certifies is the MEASURED min/max/band profile of this
    fixed matrix, not a pass flag. Scale: the projection is one
    broadcast of the 512-entry sign matrix into the exploded dim
    relation + a (vec_id, j) partial agg; pairing joins run on the
    n×8 projected relation, never all-pairs."""
    from postrack_spark.queries.stats_queries import QUANTIZE_MILLI_EXPR

    signs = spark.createDataFrame(_jl_signs(), "i INT, j INT, s INT")
    t = load_tables(spark, sf_dir)
    dims = fan_out(t["embeddings"]).select(
        "vec_id",
        F.posexplode(F.expr(QUANTIZE_MILLI_EXPR)).alias("pos", "qv"),
    ).select("vec_id", (F.col("pos") + 1).alias("i"), "qv")
    proj = (
        dims.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("s") * F.col("qv")).cast("long").alias("y"))
    )
    da = dims.select(F.col("vec_id").alias("pa"), "i", F.col("qv").alias("qa"))
    db = dims.select(F.col("vec_id").alias("vb"), "i", F.col("qv").alias("qb"))
    dq = (
        da.join(db, (F.col("vb") == F.col("pa") + 1) & (da["i"] == db["i"]))
        .groupBy("pa")
        .agg(
            F.sum((F.col("qa") - F.col("qb")) * (F.col("qa") - F.col("qb")))
            .cast("long")
            .alias("dq2")
        )
    )
    pa = proj.select(F.col("vec_id").alias("pa"), "j", F.col("y").alias("ya"))
    pb = proj.select(F.col("vec_id").alias("vb"), "j", F.col("y").alias("yb"))
    dy = (
        pa.join(pb, (F.col("vb") == F.col("pa") + 1) & (pa["j"] == pb["j"]))
        .groupBy("pa")
        .agg(
            F.sum((F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb")))
            .cast("long")
            .alias("dy2")
        )
    )
    ratios = (
        dq.join(dy, "pa")
        .filter(F.col("dq2") > 0)
        .select(F.expr(f"(10000 * dy2) DIV ({_JL_K} * dq2)").alias("r"))
    )
    return ratios.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.min("r").cast("long").alias("min_ratio_pp10k"),
        F.max("r").cast("long").alias("max_ratio_pp10k"),
        F.expr("CAST(sum(r) DIV count(*) AS BIGINT)").alias("avg_ratio_pp10k"),
        F.sum(F.when(F.col("r").between(7500, 12500), 1).otherwise(0))
        .cast("long")
        .alias("n_within_25pct"),
        F.sum(F.when(F.col("r").between(5000, 20000), 1).otherwise(0))
        .cast("long")
        .alias("n_within_2x"),
    )
