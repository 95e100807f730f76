"""Deterministic sampling / splitting / decontamination queries — the
training-data-pipeline surface (BASELINE.json:6 north star).

Membership is a pure function of each row's key hash (operators/
sampling.py), so the DuckDB oracle reproduces the exact sample — these
are full hash-match queries, not rows-only, despite being "random"
samples. `('0x' || substr(md5(k),1,8))::BIGINT` ≡ Spark
`conv(substr(md5(k),1,8),16,10)` (verified identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from postrack_spark.operators.dedup import (
    doc_shingles,
    lsh_candidate_pairs,
)
from postrack_spark.operators.sampling import hash_sample, hash_split
from postrack_spark.queries.dedup_queries import _BANDS_SQL, _SHINGLES_CTE, _SIG_CTE
from postrack_spark.queries.registry import query
from postrack_spark.session import load_tables

# DuckDB twin of operators.sampling._hash_unit
_UNIT = "(('0x' || substring(md5({k}::VARCHAR), 1, 8))::BIGINT / 4294967296.0)"


@query(
    "sample_hash_deterministic",
    oracle=f"""
    SELECT o_orderstatus,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    WHERE {_UNIT.format(k="o_orderkey")} < 0.2
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20% Bernoulli sample of orders by content hash — engine- and
    partitioning-independent membership (the oracle reproduces the
    exact sample; df.sample could not be checked this way). Map-side
    predicate only: no shuffle, no state."""
    orders = load_tables(spark, sf_dir)["orders"]
    return (
        hash_sample(orders, "o_orderkey", 0.2)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total_price"))
        .orderBy("o_orderstatus")
    )


@query(
    "split_train_test_stats",
    oracle=f"""
    SELECT CASE WHEN {_UNIT.format(k="doc_id")} < 0.1 THEN 'test' ELSE 'train' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           count(DISTINCT lang) AS n_langs
    FROM documents
    GROUP BY 1
    ORDER BY split
    """,
)
def split_train_test_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable 90/10 train/test split of the documents table by doc_id
    hash band — disjoint, exhaustive, reproducible across engines and
    re-partitionings."""
    docs = load_tables(spark, sf_dir)["documents"]
    return (
        hash_split(docs, "doc_id", test_rate=0.1)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("split")
    )


@query(
    "dedup_cross_split_contamination",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_SIG_CTE},
    buckets AS ({_BANDS_SQL}),
    sized AS (
      SELECT b.* FROM buckets b
      JOIN (SELECT band, bh, count(*) AS bsz FROM buckets GROUP BY band, bh) s
        USING (band, bh)
      WHERE s.bsz <= 100
    ),
    cand AS (
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
      FROM sized a JOIN sized b ON a.band = b.band AND a.bh = b.bh AND a.doc < b.doc
    ),
    sizes AS (SELECT doc, count(*) AS n_tok FROM shingles GROUP BY doc),
    inter AS (
      SELECT t1.doc AS doc_a, t2.doc AS doc_b, count(*) AS inter
      FROM shingles t1 JOIN shingles t2 ON t1.tok = t2.tok AND t1.doc < t2.doc
      JOIN cand c ON c.doc_a = t1.doc AND c.doc_b = t2.doc
      GROUP BY t1.doc, t2.doc
    ),
    splits AS (
      SELECT doc_id AS doc,
             CASE WHEN {_UNIT.format(k="doc_id")} < 0.1 THEN 'test' ELSE 'train' END AS split
      FROM documents
    )
    SELECT i.doc_a, i.doc_b, sp_a.split AS split_a, sp_b.split AS split_b,
           round(inter * 1.0 / (sa.n_tok + sb.n_tok - inter), 6) AS jaccard
    FROM inter i JOIN sizes sa ON sa.doc = i.doc_a
                 JOIN sizes sb ON sb.doc = i.doc_b
                 JOIN splits sp_a ON sp_a.doc = i.doc_a
                 JOIN splits sp_b ON sp_b.doc = i.doc_b
    WHERE round(inter * 1.0 / (sa.n_tok + sb.n_tok - inter), 6) >= 0.5
      AND sp_a.split <> sp_b.split
    ORDER BY doc_a, doc_b
    """,
)
def dedup_cross_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination: near-duplicate pairs that CROSS the train/test
    boundary (evaluation-set leakage). Reuses the MinHash-LSH candidate
    machinery; the split label joins on afterwards, so candidate
    generation cost is shared with ordinary dedup, and the pair filter
    (split_a <> split_b) is the only addition."""
    from postrack_spark.functions.text import minhash_expr
    from postrack_spark.operators.dedup import jaccard_pairs_from_arrays
    from postrack_spark.session import fan_out, pin_small

    docs = fan_out(load_tables(spark, sf_dir)["documents"])
    shingles = doc_shingles(docs, "doc_id", "text", k=3)
    # the dedup_minhash_lsh fused shape: ONE aggregation computes the
    # 16 signature lanes AND the exact shingle set per doc, pinned, so
    # the shingle explode runs once instead of twice (signature build +
    # jaccard verify each re-ran it: 4 document scans before, 1 after).
    per_doc = pin_small(
        "xsplit_perdoc",
        shingles.groupBy("doc").agg(
            F.collect_set("tok").alias("toks"),
            *[F.min(minhash_expr(F.col("tok"), i)).alias(f"h{i}") for i in range(16)],
        ),
    )
    sigs = per_doc.select("doc", *[f"h{i}" for i in range(16)])
    cand = lsh_candidate_pairs(sigs, n_hashes=16, band_size=2, max_bucket_size=100)
    verified = jaccard_pairs_from_arrays(
        per_doc.select("doc", "toks"), cand, threshold=0.5
    )
    splits = hash_split(
        docs.select(F.col("doc_id").alias("doc")), "doc", test_rate=0.1
    ).select("doc", "split")
    out = (
        verified.join(
            F.broadcast(splits).withColumnRenamed("doc", "doc_a").withColumnRenamed("split", "split_a"),
            "doc_a",
        )
        .join(
            F.broadcast(splits).withColumnRenamed("doc", "doc_b").withColumnRenamed("split", "split_b"),
            "doc_b",
        )
        .filter(F.col("split_a") != F.col("split_b"))
    )
    return out.select("doc_a", "doc_b", "split_a", "split_b", "jaccard").orderBy(
        "doc_a", "doc_b"
    )


# Quality formula twin (functions.text.quality_score) for oracles.
def _quality_sql() -> str:
    from postrack_spark.queries.text_queries import _SW_LIST

    return f"""
      round(least(len(string_split(text, ' ')) / 100.0, 1.0)
            * (1 - len(list_filter(string_split(text, ' '), t -> t IN ({_SW_LIST})))
                   * 1.0 / len(string_split(text, ' ')))
            * (1 - len(list_filter(string_split(text, ' '), t -> length(t) <= 1))
                   * 1.0 / len(string_split(text, ' '))), 6)
    """


_Q = _quality_sql()


@query(
    "sample_per_source_cap",
    oracle=f"""
    WITH ranked AS (
      SELECT source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
      FROM documents
    )
    SELECT source, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM ranked WHERE rn <= 100
    GROUP BY source
    ORDER BY source
    """,
)
def sample_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group capped sampling: at most 100 docs per source, chosen by
    hash order — the 'balance sources / cap a dominant crawl' pipeline
    primitive. Hash order (not 'first N in file order') makes the kept
    set a stable pseudo-random sample, reproducible across engines and
    partitionings."""
    from pyspark.sql import Window as W

    docs = load_tables(spark, sf_dir)["documents"]
    w = W.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"), F.sum("n_chars").cast("bigint").alias("total_chars"))
        .orderBy("source")
    )


@query(
    "sample_quality_weighted",
    oracle=f"""
    SELECT source,
           count(*) AS n_kept,
           round(avg({_Q}), 4) AS avg_quality
    FROM documents
    WHERE {_UNIT.format(k="doc_id")} < {_Q}
    GROUP BY source
    ORDER BY source
    """,
)
def sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance sampling: keep a doc with probability
    equal to its quality score — deterministically, via hash_unit(key) <
    quality(text). High-quality docs survive, low-quality mostly drop,
    membership reproducible anywhere. The LLM-corpus 'soft filter'."""
    from postrack_spark.functions.text import quality_score
    from postrack_spark.operators.sampling import _hash_unit

    docs = load_tables(spark, sf_dir)["documents"]
    q = quality_score(F.col("text"))
    return (
        docs.filter(_hash_unit(F.col("doc_id")) < q)
        .select("source", q.alias("q"))
        .groupBy("source")
        # avg rounded to 4 (not 6): the kept-set is identical in both
        # engines, but their float summation orders differ in the last
        # ulp, which round(.,6) can surface.
        .agg(F.count("*").alias("n_kept"), F.round(F.avg("q"), 4).alias("avg_quality"))
        .orderBy("source")
    )


@query(
    "pack_sequences_by_source",
    oracle="""
    WITH toks AS (
      SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
      FROM documents
    ),
    ordered AS (
      SELECT source, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY source
                              ORDER BY md5(doc_id::VARCHAR), doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tok AS start_off
      FROM toks
    )
    SELECT source, CAST(floor(start_off / 2048) AS BIGINT) AS bin,
           count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens
    FROM ordered
    GROUP BY source, bin
    ORDER BY source, bin
    """,
)
def pack_sequences_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential context packing: docs are laid end-to-end in
    deterministic hash order within each source and cut into
    2048-token bins (a doc's bin = its start offset / capacity) — the
    'pack short docs into fixed training sequences' primitive. The
    window partitions by source, so packing parallelizes across
    sources at scale (no global sort)."""
    from pyspark.sql import Window as W

    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    w = (
        W.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ordered = toks.withColumn("start_off", F.sum("n_tok").over(w) - F.col("n_tok"))
    return (
        ordered.select(
            "source",
            F.floor(F.col("start_off") / 2048).cast("bigint").alias("bin"),
            "n_tok",
        )
        .groupBy("source", "bin")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").cast("bigint").alias("total_tokens"))
        .orderBy("source", "bin")
    )


@query(
    "sample_weighted_mixture",
    oracle=f"""
    WITH w AS (
      SELECT *,
             CASE lang WHEN 'en' THEN 2.5 WHEN 'de' THEN 1.5 ELSE 1.0 END AS wt
      FROM documents
    ),
    copies AS (
      SELECT lang, n_chars,
             CAST(floor(wt) AS BIGINT)
               + CASE WHEN {_UNIT.format(k="doc_id")} < wt - floor(wt)
                      THEN 1 ELSE 0 END AS n_copies
      FROM w
    )
    SELECT lang,
           CAST(sum(n_copies) AS BIGINT) AS n_rows_out,
           CAST(sum(n_copies * n_chars) AS BIGINT) AS total_chars_out
    FROM copies
    GROUP BY lang
    ORDER BY lang
    """,
)
def sample_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture resampling: en×2.5, de×1.5, others×1 —
    fractional upsampling resolved deterministically per row by key
    hash (exactly half the en docs get a 3rd copy). Map-side explode,
    no shuffle; the oracle recomputes the same copy counts."""
    from postrack_spark.operators.sampling import weighted_resample

    docs = load_tables(spark, sf_dir)["documents"]
    out = weighted_resample(docs, "doc_id", {"en": 2.5, "de": 1.5}, weight_col="lang")
    return (
        out.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_rows_out"),
            F.sum("n_chars").cast("bigint").alias("total_chars_out"),
        )
        .orderBy("lang")
    )


@query(
    "sample_stratified_exact",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM documents
    ),
    tagged AS (
      SELECT source, doc_id, n,
             CASE WHEN rn <= (n * 8) // 10 THEN 'train'
                  WHEN rn <= (n * 9) // 10 THEN 'val'
                  ELSE 'test' END AS split
      FROM ranked
    )
    SELECT source, split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM tagged
    GROUP BY source, split
    ORDER BY source, split
    """,
)
def sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified train/val/test split with EXACT per-stratum
    proportions: hash-membership splits (sample_split_train_eval) hit
    the target fractions only in expectation, which skews small or
    skewed strata; here each stratum is ranked in deterministic md5
    order (engine-portable, seedless) by a PARTITIONED window and cut
    at exact floor(n*8/10) / floor(n*9/10) boundaries — per-stratum
    counts are exactly reproducible, every stratum is represented in
    every split (n >= 3), and the order is stable across engines and
    runs. One shuffle on the stratum key; O(1) window state."""
    t = load_tables(spark, sf_dir)
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    wn = W.partitionBy("source")
    ranked = t["documents"].select(
        "source",
        "doc_id",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    tagged = ranked.withColumn(
        "split",
        F.when(F.col("rn") <= F.floor(F.col("n") * 8 / 10), "train")
        .when(F.col("rn") <= F.floor(F.col("n") * 9 / 10), "val")
        .otherwise("test"),
    )
    return (
        tagged.groupBy("source", "split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
        .orderBy("source", "split")
    )


@query(
    "sample_stratified_proportional",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn,
             count(*) OVER (PARTITION BY source) AS n_src
      FROM documents
    )
    SELECT source,
           CAST(max(n_src) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (rn <= (n_src + 3) // 4) AS BIGINT) AS n_sampled,
           CAST(sum(doc_id) FILTER (rn <= (n_src + 3) // 4) AS BIGINT) AS sampled_id_sum,
           CAST(sum(n_chars) FILTER (rn <= (n_src + 3) // 4) AS BIGINT) AS sampled_chars
    FROM ranked
    GROUP BY source
    ORDER BY source
    """,
)
def sample_stratified_proportional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact proportional stratified sampling: EXACTLY ceil(n/4) docs
    per source stratum (not Bernoulli-approximate like hash_sample),
    membership a pure function of content hash so every engine and
    re-partitioning reproduces the identical sample — the per-domain
    quota draw a training-mixture pipeline uses when fractions must be
    hit exactly. The hash-order row_number is a PARTITIONED window
    (never global); ceil is computed in integers ((n+3) div 4, no fp).
    The sampled_id_sum column value-checks the exact membership set,
    not just its size. Scale: one shuffle on the stratum key; strata
    counts ride the same window, and a skewed stratum can pre-split via
    operators/skew.py salting with per-salt quotas."""
    docs = load_tables(spark, sf_dir)["documents"]
    w = W.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    wc = W.partitionBy("source")
    ranked = docs.select(
        "source",
        "doc_id",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n_src"),
    )
    keep = F.col("rn") <= F.expr("(n_src + 3) div 4")
    return (
        ranked.groupBy("source")
        .agg(
            F.max("n_src").cast("long").alias("n_total"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_sampled"),
            F.sum(F.when(keep, F.col("doc_id"))).cast("long").alias("sampled_id_sum"),
            F.sum(F.when(keep, F.col("n_chars"))).cast("long").alias("sampled_chars"),
        )
        .orderBy("source")
    )


@query(
    "sample_importance_ess",
    oracle="""
    WITH w AS (
      SELECT source, CAST(n_chars AS BIGINT) AS wt FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(wt) AS BIGINT) AS sum_w,
           CAST(sum(wt * wt) AS BIGINT) AS sum_w2,
           CAST(floor((1000.0 * (CAST(sum(wt) AS DOUBLE) * CAST(sum(wt) AS DOUBLE)))
                      / CAST(sum(wt * wt) AS DOUBLE)) AS BIGINT) AS ess_milli
    FROM w GROUP BY source
    ORDER BY source
    """,
)
def sample_importance_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size of an importance-weighted draw per source
    — ESS = (Σw)²/Σw², the diagnostic a mixture designer checks before
    trusting weighted sampling (ESS << n means a few heavy documents
    dominate the gradient signal). Weights are integer (char counts
    standing in for quality scores), so both moments are exact BIGINTs;
    the ratio is one identically-shaped correctly-rounded double
    divide floored to milli units. One map-side-combined aggregation,
    O(sources) shuffle."""
    docs = load_tables(spark, sf_dir)["documents"]
    w = docs.select("source", F.col("n_chars").cast("long").alias("wt"))
    return (
        w.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("wt").cast("long").alias("sum_w"),
            F.sum(F.col("wt") * F.col("wt")).cast("long").alias("sum_w2"),
        )
        .select(
            "source",
            "n_docs",
            "sum_w",
            "sum_w2",
            F.floor(
                (F.lit(1000.0) * (F.col("sum_w").cast("double") * F.col("sum_w").cast("double")))
                / F.col("sum_w2").cast("double")
            )
            .cast("long")
            .alias("ess_milli"),
        )
        .orderBy("source")
    )


@query(
    "sample_priority_weighted",
    oracle="""
    WITH pri AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(('0x' || substring(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT
                  // CAST(round(o_totalprice * 100) AS BIGINT) AS BIGINT) AS priority
      FROM orders
    )
    SELECT o_orderkey, cents, priority
    FROM pri
    ORDER BY priority, o_orderkey
    LIMIT 100
    """,
)
def sample_priority_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, fully deterministic:
    priority sampling in the Duffield-Lund-Thorup shape — per row a
    60-bit uniform hash h = md5(key)[0:15 hex] and priority
    h DIV weight (weight = order value in cents), select the k=100
    SMALLEST priorities. Heavier rows divide by a larger weight, so
    they sink toward the front proportionally — a size-biased sample
    any engine reproduces bit-for-bit because membership is pure
    integer row arithmetic (the established md5-membership rule; the
    classic u^(1/w) exponential-key scheme needs transcendental floats
    whose last-ulp cross-engine behavior is exactly the trap this repo
    bans). Ties are impossible in practice (60-bit hash) and broken
    totally by (priority, key) anyway. Plan: map-side priority compute
    + TakeOrderedAndProject — no shuffle of the fact table, no window,
    O(k) driver result at any SF."""
    orders = load_tables(spark, sf_dir)["orders"]
    return (
        orders.select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            F.expr(
                "CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 15), 16, 10)"
                " AS BIGINT) DIV CAST(round(o_totalprice * 100) AS BIGINT)"
            ).cast("long").alias("priority"),
        )
        .orderBy("priority", "o_orderkey")
        .limit(100)
    )


@query(
    "sample_temperature_mixture",
    oracle="""
    WITH perlang AS (
      SELECT lang, CAST(sum(n_chars) AS BIGINT) AS chars
      FROM documents
      GROUP BY lang
    ),
    weights AS (
      SELECT lang, chars,
             CAST(floor(sqrt(chars * 100)) AS BIGINT) AS w
      FROM perlang
    ),
    tot AS (
      SELECT CAST(sum(chars) AS BIGINT) AS tc, CAST(sum(w) AS BIGINT) AS tw
      FROM weights
    ),
    base AS (
      SELECT lang, chars, w,
             CAST(10000 * chars // tc AS BIGINT) AS prop_pp10k,
             CAST(100000 * w // tw AS BIGINT) AS fl,
             CAST((100000 * w) % tw AS BIGINT) AS rem
      FROM weights CROSS JOIN tot
    ),
    d AS (SELECT CAST(100000 - sum(fl) AS BIGINT) AS deficit FROM base),
    rnk AS (
      SELECT lang, chars, prop_pp10k, fl, rem,
             CAST(row_number() OVER (ORDER BY rem DESC, lang) AS BIGINT) AS rn
      FROM base
    )
    SELECT lang, chars, prop_pp10k,
           CAST(fl + CASE WHEN rn <= deficit THEN 1 ELSE 0 END AS BIGINT)
             AS temp_alloc
    FROM rnk CROSS JOIN d
    ORDER BY lang
    """,
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened training mixture (the multilingual-LM
    sampling rule, tau = 2): each language's share of a 100,000-unit
    token budget is proportional to chars^(1/2) instead of chars, so
    head languages shrink and tail languages grow — then Hamilton
    largest-remainder apportionment (operators/mining.py) makes the
    integer allocations sum to the budget EXACTLY. sqrt is the one
    transcendental-adjacent step and it is safe: IEEE sqrt is
    correctly rounded in both engines and chars*100 stays far inside
    2^52 where doubles are integer-exact (coarsen units if a corpus
    ever exceeds that — the agg_corr_exact headroom rule). prop_pp10k
    (plain proportional share) rides along so the flattening is
    visible in the output. Plan: one hash agg over documents to the
    O(languages) frame; everything after runs on bounded frames with
    broadcast combines — no unpartitioned window, no Python."""
    from postrack_spark.session import pin_small

    docs = load_tables(spark, sf_dir)["documents"]
    # O(languages) frame with three consumers (total, proportional
    # share, apportionment input) — pinned so the documents scan + agg
    # runs once, not once per consumer (measured: 8 scans before).
    perlang = pin_small(
        "tempmix_perlang",
        docs.groupBy("lang")
        .agg(F.sum("n_chars").cast("long").alias("chars"))
        .withColumn(
            "w", F.expr("CAST(floor(sqrt(chars * 100)) AS BIGINT)")
        ),
    )
    tot = perlang.agg(F.sum("chars").cast("long").alias("tc"))
    prop = perlang.crossJoin(F.broadcast(tot)).select(
        "lang", "chars", "w",
        F.expr("CAST(10000 * chars DIV tc AS BIGINT)").alias("prop_pp10k"),
    )
    from postrack_spark.operators.mining import largest_remainder_allocation

    alloc = largest_remainder_allocation(
        perlang.select("lang", "w"), "lang", "w", 100000
    ).select(F.col("lang").alias("lang2"), F.col("alloc").alias("temp_alloc"))
    return (
        prop.join(F.broadcast(alloc), prop["lang"] == F.col("lang2"))
        .select("lang", "chars", "prop_pp10k", "temp_alloc")
        .orderBy("lang")
    )


@query(
    "sample_token_budget_mixture",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
      FROM documents
    ),
    budget AS (
      SELECT CAST(sum(tok) * 2 // 5 AS BIGINT) AS b FROM toks
    ),
    ranked AS (
      SELECT doc_id, source, tok,
             CAST(sum(tok) OVER (ORDER BY n_chars DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM toks
    ),
    taken AS (
      SELECT * FROM ranked CROSS JOIN budget WHERE cum <= b
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS docs_taken,
           CAST(sum(tok) AS BIGINT) AS tokens_taken
    FROM taken
    GROUP BY source
    ORDER BY source
    """,
)
def sample_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection — the training-mixture primitive
    where the unit of account is TOKENS, not documents: fill a global
    budget (40% of corpus tokens) greedily by a deterministic priority
    (longest-first, doc_id tie-break) and report what each source
    contributed. The running token total over the priority order comes
    from the DISTRIBUTED prefix sum (operators/ranking.prefix_sum_by_key
    — no unpartitioned window), the budget is a 1-row broadcast, and
    the tie-break column makes the order TOTAL (the running-sum rule:
    every cumsum needs a total order or shuffle order leaks in)."""
    from postrack_spark.operators.ranking import prefix_sum_by_key
    from postrack_spark.functions.text import tokens

    t = load_tables(spark, sf_dir)
    toks = t["documents"].select(
        "doc_id",
        "source",
        "n_chars",
        F.size(tokens(F.col("text"))).cast("long").alias("tok"),
    )
    budget = toks.agg(
        F.expr("CAST(sum(tok) * 2 DIV 5 AS BIGINT)").alias("b")
    )
    ranked = prefix_sum_by_key(
        toks, [F.col("n_chars").desc(), F.col("doc_id")], "tok", "cum",
        inclusive=True,
    )
    taken = ranked.crossJoin(F.broadcast(budget)).filter(F.col("cum") <= F.col("b"))
    return (
        taken.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("docs_taken"),
            F.sum("tok").cast("long").alias("tokens_taken"),
        )
        .orderBy("source")
    )
