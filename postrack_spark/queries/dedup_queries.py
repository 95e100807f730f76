"""Deduplication queries over the documents table (north-star
extension, BASELINE.json:6). The md5-based hashing (functions.text)
makes even the MinHash-LSH candidate set bit-identically reproducible
by the DuckDB oracle — full hash-match coverage, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postrack_spark.operators.dedup import (
    doc_shingles,
    doc_tokens,
    exact_duplicates,
    hamming,
    jaccard_pairs,
    lsh_candidate_pairs,
    normalized_duplicates,
    simhash_bits,
    simhash_chunk_blocks,
)
from postrack_spark.queries.registry import query
from postrack_spark.session import fan_out, load_tables, pin_small

# The MinHash pipeline references the per-doc frame from two subtrees
# (LSH banding and Jaccard verify); pinning it makes the shingle explode
# + fused aggregation compute once per action instead of twice — the
# same call a 100 TB run would make (the shingle scan is the dominant
# cost there). The module used to carry its own _pin registry predating
# session.pin_small; both were byte-identical, and two disjoint
# registries meant double bookkeeping for the same cached plans — all
# pins now route through the one session registry (which also bounds
# total resident pins and survives session restarts).
_pin = pin_small


def _minhash_perdoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fused per-doc MinHash frame every shingle-LSH query consumes:
    ONE aggregation over ONE shingle explode computes the 16 signature
    lanes AND the exact shingle set per doc, pinned under ONE shared
    name.

    Two contracts live here (optimization rounds 8-9):
    - Pin the BOUNDED per-doc reduction (|docs| rows), never the
      corpus-sized shingle explode: four sibling queries used to pin
      the raw (doc, shingle) relation, which wins at sf0.1 but at
      100 TB means materializing a corpus-scale frame to executor
      disks — slower and capacity-infeasible vs recomputing a
      codegen'd explode. Deriving the LSH candidates from h0..h15 and
      the exact verify from the toks arrays keeps one corpus pass with
      an O(docs) materialization.
    - ONE pin name for the one shared frame: per-query names
      ('clusters_shingles', 'funnel_shingles', ...) built canonically
      identical plans that aliased a single CacheManager entry anyway
      (the later persists were no-ops reading the earlier query's
      materialization) — the shared name makes the reuse explicit and
      re-invocation semantics exact (fresh lineage per call).
    """
    from postrack_spark.functions.text import minhash_expr

    t = load_tables(spark, sf_dir)
    docs = fan_out(t["documents"])
    shingles = doc_shingles(docs, "doc_id", "text", k=3)
    return _pin(
        "minhash_perdoc",
        shingles.groupBy("doc").agg(
            F.collect_set("tok").alias("toks"),
            *[F.min(minhash_expr(F.col("tok"), i)).alias(f"h{i}") for i in range(16)],
        ),
    )


@query(
    "dedup_exact_groups",
    oracle="""
    SELECT fp, representative, n_docs
    FROM (
      SELECT md5(text) AS fp, min(doc_id) AS representative, count(*) AS n_docs
      FROM documents GROUP BY md5(text)
    )
    WHERE n_docs > 1
    ORDER BY representative
    """,
)
def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups (byte-identical text)."""
    t = load_tables(spark, sf_dir)
    return (
        exact_duplicates(t["documents"], "doc_id", "text")
        .filter(F.col("n_docs") > 1)
        .orderBy("representative")
    )


@query(
    "dedup_normalized_groups",
    oracle="""
    SELECT fp, representative, n_docs
    FROM (
      SELECT md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
             min(doc_id) AS representative, count(*) AS n_docs
      FROM documents GROUP BY 1
    )
    WHERE n_docs > 1
    ORDER BY representative
    """,
)
def dedup_normalized_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words duplicate groups (order/multiplicity-insensitive)."""
    t = load_tables(spark, sf_dir)
    return (
        normalized_duplicates(t["documents"], "doc_id", "text")
        .filter(F.col("n_docs") > 1)
        .orderBy("representative")
    )


# Shared DuckDB CTEs: distinct tokens and 16-lane minhash signatures.
_TOKENS_CTE = """
    toks AS (
      SELECT doc_id AS doc, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents
    )
"""

# 3-word shingles as the MinHash unit (NOT unigrams: the corpus has a
# ~31-word vocabulary, so unigram signatures are degenerate — see
# operators.dedup.doc_shingles).
_SHINGLES_CTE = """
    words AS (SELECT doc_id AS doc, string_split(text, ' ') AS w FROM documents),
    shingles AS (
      SELECT DISTINCT doc, concat_ws(' ', w[i], w[i+1], w[i+2]) AS tok
      FROM words, unnest(generate_series(1, len(w) - 2)) AS t(i)
    )
"""

_MINHASH_LANES = ",\n".join(
    f"min(md5('{i}|' || tok)) AS h{i}" for i in range(16)
)

_SIG_CTE = f"""
    sigs AS (
      SELECT doc, {_MINHASH_LANES}
      FROM shingles GROUP BY doc
    )
"""

# 8 bands × 2 rows: P(candidate | jaccard=0.5) = 1-(1-0.25)^8 ≈ 0.90,
# vs ≈0.23 for 4 bands × 4 rows — tuned for the 0.5 verify threshold.
_BANDS_SQL = " UNION ALL ".join(
    f"SELECT doc, {b} AS band, md5(h{2*b} || h{2*b+1}) AS bh FROM sigs"
    for b in range(8)
)


@query(
    "dedup_minhash_lsh",
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
    )
    SELECT i.doc_a, i.doc_b,
           round(inter * 1.0 / (sa.n_tok + sb.n_tok - inter), 6) AS jaccard
    FROM inter i JOIN sizes sa ON sa.doc = i.doc_a
                 JOIN sizes sb ON sb.doc = i.doc_b
    WHERE round(inter * 1.0 / (sa.n_tok + sb.n_tok - inter), 6) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16)+LSH(8 bands of 2) over 3-word shingles, verified
    with exact shingle-set Jaccard >= 0.5. Candidate generation is
    O(n·bands) — the scale path replacing the O(n²) pair scan. Band
    geometry: P(candidate | J=0.5) ≈ 0.90. Shingles (not unigrams)
    keep signatures discriminative on small vocabularies — the unigram
    variant measured 11.1M candidate pairs / 320 s at sf0.1; this one
    1.5k pairs. Bucket cap 100 drops degenerate near-constant text."""
    from postrack_spark.operators.dedup import jaccard_pairs_from_arrays

    # ONE aggregation computes the 16 signature lanes AND the exact
    # shingle set per doc — the signature build and the Jaccard verify
    # previously each shuffled the full shingle relation; fusing them
    # halves the passes over the widest intermediate (the dominant cost
    # at 100 TB, where the shingle relation is corpus-sized). The
    # persisted per-doc frame is |docs| rows, not |shingles|.
    per_doc = _minhash_perdoc(spark, sf_dir)
    sigs = per_doc.select("doc", *[f"h{i}" for i in range(16)])
    cand = lsh_candidate_pairs(sigs, n_hashes=16, band_size=2, max_bucket_size=100)
    verified = jaccard_pairs_from_arrays(per_doc.select("doc", "toks"), cand, threshold=0.5)
    return verified.select("doc_a", "doc_b", "jaccard").orderBy("doc_a", "doc_b")


_SIM_BIT_SUMS = ",\n".join(
    f"sum(CASE WHEN instr('13579bdf', substr(md5(tok), {b + 1}, 1)) > 0 THEN 1 ELSE 0 END) AS s{b}"
    for b in range(16)
)
_SIM_BITS_CONCAT = " || ".join(
    f"CASE WHEN s{b} * 2 > n_tok THEN '1' ELSE '0' END" for b in range(16)
)
_HAMMING = " + ".join(
    f"CASE WHEN substr(a.simhash, {i + 1}, 1) <> substr(b.simhash, {i + 1}, 1) THEN 1 ELSE 0 END"
    for i in range(16)
)


@query(
    "dedup_simhash",
    oracle=f"""
    WITH {_TOKENS_CTE},
    sums AS (
      SELECT doc, count(*) AS n_tok, {_SIM_BIT_SUMS}
      FROM toks GROUP BY doc
    ),
    sh AS (SELECT doc, {_SIM_BITS_CONCAT} AS simhash FROM sums),
    with_src AS (
      SELECT sh.doc, sh.simhash, d.source
      FROM sh JOIN documents d ON d.doc_id = sh.doc
    )
    SELECT a.doc AS doc_a, b.doc AS doc_b,
           CAST({_HAMMING} AS INT) AS hamming_dist
    FROM with_src a JOIN with_src b
      ON a.source = b.source AND a.doc < b.doc
    WHERE ({_HAMMING}) <= 2
    ORDER BY doc_a, doc_b
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(16-bit, md5-digit-parity) near-dup pairs within the same
    source at hamming distance <= 2.

    Candidates come from pigeonhole chunk blocking (3 chunks; d<=2 bits
    can disagree on at most 2 of them, so recall is exact) — an
    equi-join on (source, chunk) buckets instead of the quadratic
    same-source pair scan, then the hamming predicate verifies. Same
    output as all-pairs; the oracle computes the quadratic form."""
    from postrack_spark.session import pin_small

    t = load_tables(spark, sf_dir)
    docs = fan_out(t["documents"])
    sh = simhash_bits(docs, "doc_id", "text", n_bits=16).join(
        docs.select(F.col("doc_id").alias("doc"), "source"), "doc"
    )
    # both candidate-join sides read blocks; unpinned, each side re-ran
    # the simhash bit aggregation over the corpus (4 document scans
    # before, 2 after). O(docs x 3 chunks), narrow.
    blocks = pin_small("simhash_blocks", simhash_chunk_blocks(sh, n_bits=16, radius=2))
    a = blocks.select(
        F.col("doc").alias("doc_a"), F.col("simhash").alias("sh_a"),
        "source", "chunk_id", "chunk_val",
    )
    b = blocks.select(
        F.col("doc").alias("doc_b"), F.col("simhash").alias("sh_b"),
        "source", "chunk_id", "chunk_val",
    )
    cand = (
        a.join(b, ["source", "chunk_id", "chunk_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
    )
    return (
        cand.withColumn("hamming_dist", hamming(F.col("sh_a"), F.col("sh_b"), 16).cast("int"))
        .filter(F.col("hamming_dist") <= 2)
        .select("doc_a", "doc_b", "hamming_dist")
        .orderBy("doc_a", "doc_b")
    )


@query(
    "dedup_ngram_jaccard_blocked",
    oracle=f"""
    WITH {_TOKENS_CTE},
    sizes AS (SELECT doc, count(*) AS n_tok FROM toks GROUP BY doc),
    blocked AS (
      SELECT d1.doc_id AS doc_a, d2.doc_id AS doc_b
      FROM documents d1 JOIN documents d2
        ON d1.source = d2.source
       AND d1.doc_id < d2.doc_id
       AND abs(d1.n_chars - d2.n_chars) <= 30
    ),
    inter AS (
      SELECT t1.doc AS doc_a, t2.doc AS doc_b, count(*) AS inter
      FROM toks t1 JOIN toks t2 ON t1.tok = t2.tok AND t1.doc < t2.doc
      JOIN blocked c ON c.doc_a = t1.doc AND c.doc_b = t2.doc
      GROUP BY t1.doc, t2.doc
    )
    SELECT i.doc_a, i.doc_b,
           round(inter * 1.0 / (sa.n_tok + sb.n_tok - inter), 6) AS jaccard
    FROM inter i JOIN sizes sa ON sa.doc = i.doc_a
                 JOIN sizes sb ON sb.doc = i.doc_b
    WHERE round(inter * 1.0 / (sa.n_tok + sb.n_tok - inter), 6) >= 0.6
    ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard >= 0.6 over length+source-blocked pairs —
    the exact-verification tier (blocking keeps the pair space linear-ish)."""
    t = load_tables(spark, sf_dir)
    docs = fan_out(t["documents"])
    blocked = (
        docs.alias("d1")
        .join(
            docs.alias("d2"),
            (F.col("d1.source") == F.col("d2.source"))
            & (F.col("d1.doc_id") < F.col("d2.doc_id"))
            & (F.abs(F.col("d1.n_chars") - F.col("d2.n_chars")) <= 30),
        )
        .select(F.col("d1.doc_id").alias("doc_a"), F.col("d2.doc_id").alias("doc_b"))
    )
    toks = doc_tokens(docs, "doc_id", "text")
    verified = jaccard_pairs(toks, pairs=blocked, threshold=0.6)
    return verified.select("doc_a", "doc_b", "jaccard").orderBy("doc_a", "doc_b")


@query(
    "dedup_duplicate_clusters",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
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
    pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i JOIN sizes sa ON sa.doc = i.doc_a
                   JOIN sizes sb ON sb.doc = i.doc_b
      WHERE round(inter * 1.0 / (sa.n_tok + sb.n_tok - inter), 6) >= 0.5
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
    SELECT cluster, count(*) AS n_docs, CAST(max(doc) AS BIGINT) AS max_doc
    FROM labeled
    GROUP BY cluster
    ORDER BY cluster
    """,
)
def dedup_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters (not just pairs): connected components of the
    MinHash-LSH >= 0.5-Jaccard pair graph via iterative min-label
    propagation — the 'keep one representative per duplicate group'
    primitive. The cluster id IS the min member doc_id (canonical
    representative). The oracle computes the same closure with a
    recursive CTE."""
    from postrack_spark.operators.dedup import (
        connected_components,
        jaccard_pairs_from_arrays,
    )

    # bounded per-doc pin, not the corpus-sized shingle explode — see
    # _minhash_perdoc (the signature build and the exact verify both
    # read the fused O(docs) frame; one shingle pass per action).
    per_doc = _minhash_perdoc(spark, sf_dir)
    sigs = per_doc.select("doc", *[f"h{i}" for i in range(16)])
    cand = lsh_candidate_pairs(sigs, n_hashes=16, band_size=2, max_bucket_size=100)
    pairs = jaccard_pairs_from_arrays(
        per_doc.select("doc", "toks"), cand, threshold=0.5
    ).select("doc_a", "doc_b")
    comp = connected_components(pairs)
    return (
        comp.groupBy("cluster")
        .agg(F.count("*").alias("n_docs"), F.max("doc").cast("bigint").alias("max_doc"))
        .orderBy("cluster")
    )


@query(
    "dedup_containment_pairs",
    oracle=f"""
    WITH {_TOKENS_CTE},
    blocked AS (
      SELECT d1.doc_id AS doc_a, d2.doc_id AS doc_b
      FROM documents d1 JOIN documents d2
        ON d1.source = d2.source AND d1.doc_id < d2.doc_id
       AND d1.n_chars <= 3 * d2.n_chars AND d2.n_chars <= 3 * d1.n_chars
    ),
    sizes AS (SELECT doc, count(*) AS n_tok FROM toks GROUP BY doc),
    inter AS (
      SELECT t1.doc AS doc_a, t2.doc AS doc_b, count(*) AS inter
      FROM toks t1 JOIN toks t2 ON t1.tok = t2.tok AND t1.doc < t2.doc
      JOIN blocked c ON c.doc_a = t1.doc AND c.doc_b = t2.doc
      GROUP BY t1.doc, t2.doc
    )
    SELECT i.doc_a, i.doc_b,
           round(inter * 1.0 / least(sa.n_tok, sb.n_tok), 6) AS containment
    FROM inter i JOIN sizes sa ON sa.doc = i.doc_a
                 JOIN sizes sb ON sb.doc = i.doc_b
    WHERE round(inter * 1.0 / least(sa.n_tok, sb.n_tok), 6) >= 0.9
    ORDER BY doc_a, doc_b
    """,
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup detection: |A∩B| / min(|A|,|B|) >= 0.9 —
    catches a document nearly CONTAINED in another (boilerplate
    prepended/appended, quote inclusion), which symmetric Jaccard
    misses when sizes differ. Candidates blocked by source AND a 3x
    size-ratio band (containment past that ratio is boilerplate, not
    duplication — and the band keeps the pair space near-linear
    instead of quadratic-per-source); token sets verified exactly."""
    t = load_tables(spark, sf_dir)
    docs = fan_out(t["documents"])
    blocked = (
        docs.alias("d1")
        .join(
            docs.alias("d2"),
            (F.col("d1.source") == F.col("d2.source"))
            & (F.col("d1.doc_id") < F.col("d2.doc_id"))
            & (F.col("d1.n_chars") <= 3 * F.col("d2.n_chars"))
            & (F.col("d2.n_chars") <= 3 * F.col("d1.n_chars")),
        )
        .select(F.col("d1.doc_id").alias("doc_a"), F.col("d2.doc_id").alias("doc_b"))
    )
    toks = doc_tokens(docs, "doc_id", "text")
    verified = jaccard_pairs(toks, pairs=blocked, threshold=0.0)
    return (
        verified.withColumn(
            "containment",
            F.round(F.col("inter") / F.least(F.col("n_a"), F.col("n_b")), 6),
        )
        .filter(F.col("containment") >= 0.9)
        .select("doc_a", "doc_b", "containment")
        .orderBy("doc_a", "doc_b")
    )


@query(
    "dedup_corpus_funnel",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
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
    pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i JOIN sizes sa ON sa.doc = i.doc_a
                   JOIN sizes sb ON sb.doc = i.doc_b
      WHERE round(inter * 1.0 / (sa.n_tok + sb.n_tok - inter), 6) >= 0.5
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
    SELECT (SELECT count(*) FROM documents) AS total_docs,
           (SELECT count(DISTINCT md5(text)) FROM documents) AS n_exact_groups,
           (SELECT count(*) FROM labeled) AS n_neardup_docs,
           (SELECT count(DISTINCT cluster) FROM labeled) AS n_neardup_clusters
    """,
)
def dedup_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-reduction funnel in one row: total docs, exact-dup
    groups, docs touched by >=0.5-Jaccard near-dup pairs, and their
    cluster count — the summary a training-data pipeline reports after
    each dedup tier. Composes exact fingerprinting, shingle MinHash+LSH
    and connected components over one shared shingle scan."""
    from postrack_spark.operators.dedup import (
        connected_components,
        jaccard_pairs_from_arrays,
    )

    t = load_tables(spark, sf_dir)
    docs = fan_out(t["documents"])
    # bounded per-doc pin, not the corpus-sized shingle explode — see
    # _minhash_perdoc.
    per_doc = _minhash_perdoc(spark, sf_dir)
    sigs = per_doc.select("doc", *[f"h{i}" for i in range(16)])
    cand = lsh_candidate_pairs(sigs, n_hashes=16, band_size=2, max_bucket_size=100)
    pairs = jaccard_pairs_from_arrays(
        per_doc.select("doc", "toks"), cand, threshold=0.5
    ).select("doc_a", "doc_b")
    comp = connected_components(pairs)
    summary = comp.agg(
        F.count("*").alias("n_neardup_docs"),
        F.countDistinct("cluster").alias("n_neardup_clusters"),
    )
    base = docs.agg(
        F.count("*").alias("total_docs"),
        F.countDistinct(F.md5("text")).alias("n_exact_groups"),
    )
    return base.crossJoin(summary).select(
        "total_docs", "n_exact_groups", "n_neardup_docs", "n_neardup_clusters"
    )


@query(
    "dedup_lsh_recall_eval",
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
    exact_pairs AS (
      SELECT t1.doc AS doc_a, t2.doc AS doc_b
      FROM shingles t1 JOIN shingles t2 ON t1.tok = t2.tok AND t1.doc < t2.doc
      GROUP BY t1.doc, t2.doc
      HAVING round(count(*) * 1.0 /
             ((SELECT n_tok FROM sizes WHERE doc = t1.doc)
              + (SELECT n_tok FROM sizes WHERE doc = t2.doc) - count(*)), 6) >= 0.5
    )
    SELECT CAST((SELECT count(*) FROM exact_pairs) AS BIGINT) AS n_true_pairs,
           CAST((SELECT count(*) FROM exact_pairs e
                 JOIN cand c ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b) AS BIGINT)
             AS n_recalled,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates
    """,
)
def dedup_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH quality evaluation: ground-truth >=0.5-Jaccard pairs from
    the exact inverted-index join vs the banded candidate set — the
    recall/candidate-efficiency measurement that justifies the banding
    geometry (16 hashes × 8 bands of 2 ⇒ P(candidate|J=0.5)≈0.90).
    Evaluation-only: the exact all-pairs join is the thing LSH exists
    to avoid at scale, run here to certify the approximation."""
    from postrack_spark.operators.dedup import jaccard_all_pairs_from_arrays

    # bounded per-doc pin, not the corpus-sized shingle explode — see
    # _minhash_perdoc. The ground-truth inverted-index join re-derives
    # its (doc, tok) rows by EXPLODING the pinned arrays (a re-slice of
    # the materialized frame, not a second corpus tokenization).
    per_doc = _minhash_perdoc(spark, sf_dir)
    sigs = per_doc.select("doc", *[f"h{i}" for i in range(16)])
    cand = lsh_candidate_pairs(sigs, n_hashes=16, band_size=2, max_bucket_size=100)
    exact = jaccard_all_pairs_from_arrays(
        per_doc.select("doc", "toks"), threshold=0.5
    ).select("doc_a", "doc_b")
    recalled = exact.join(cand, ["doc_a", "doc_b"])
    return (
        exact.agg(F.count("*").cast("bigint").alias("n_true_pairs"))
        .crossJoin(recalled.agg(F.count("*").cast("bigint").alias("n_recalled")))
        .crossJoin(cand.agg(F.count("*").cast("bigint").alias("n_candidates")))
    )


@query(
    "dedup_edit_distance_blocked",
    oracle="""
    WITH blocked AS (
      SELECT d1.doc_id AS doc_a, d2.doc_id AS doc_b,
             d1.text AS t1, d2.text AS t2
      FROM documents d1 JOIN documents d2
        ON d1.source = d2.source
       AND substr(d1.text, 1, 16) = substr(d2.text, 1, 16)
       AND d1.doc_id < d2.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(levenshtein(t1, t2) AS INT) AS edit_dist
    FROM blocked
    WHERE levenshtein(t1, t2) <= 40
    ORDER BY doc_a, doc_b
    """,
)
def dedup_edit_distance_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup tier: Levenshtein over prefix-blocked
    pairs (same source + identical 16-char prefix) — the character-
    level fuzzy match that token-set Jaccard misses (small in-word
    edits). Prefix blocking keeps the O(len²)-per-pair DP off the
    quadratic pair space; both engines' levenshtein is the standard DP,
    so values match exactly."""
    t = load_tables(spark, sf_dir)
    docs = fan_out(t["documents"]).select("doc_id", "source", "text")
    blocked = (
        docs.alias("d1")
        .join(
            docs.alias("d2"),
            (F.col("d1.source") == F.col("d2.source"))
            & (
                F.substring(F.col("d1.text"), 1, 16)
                == F.substring(F.col("d2.text"), 1, 16)
            )
            & (F.col("d1.doc_id") < F.col("d2.doc_id")),
        )
        .select(
            F.col("d1.doc_id").alias("doc_a"),
            F.col("d2.doc_id").alias("doc_b"),
            F.levenshtein(F.col("d1.text"), F.col("d2.text")).alias("edit_dist"),
        )
    )
    return blocked.filter(F.col("edit_dist") <= 40).orderBy("doc_a", "doc_b")


_QUALITY_SQL = (
    "round(least(len(string_split(text, ' ')) / 100.0, 1.0)"
    " * (1 - len(list_filter(string_split(text, ' '), t -> t IN"
    " ('the','a','of','and','to','in','is','it'))) * 1.0 / len(string_split(text, ' ')))"
    " * (1 - len(list_filter(string_split(text, ' '), t -> length(t) <= 1)) * 1.0"
    " / len(string_split(text, ' '))), 6)"
)


@query(
    "pipeline_training_mixture",
    oracle=f"""
    WITH RECURSIVE {_SHINGLES_CTE},
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
    pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i JOIN sizes sa ON sa.doc = i.doc_a
                   JOIN sizes sb ON sb.doc = i.doc_b
      WHERE round(inter * 1.0 / (sa.n_tok + sb.n_tok - inter), 6) >= 0.5
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
    labeled AS (SELECT doc, min(root) AS cluster FROM reach GROUP BY doc),
    gated AS (
      SELECT d.doc_id, d.source,
             len(string_split(d.text, ' ')) AS n_tok,
             {_QUALITY_SQL} AS q,
             (l.doc IS NOT NULL AND l.cluster <> d.doc_id) AS is_dup
      FROM documents d LEFT JOIN labeled l ON l.doc = d.doc_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count_if(q < 0.3) AS BIGINT) AS n_quality_fail,
           CAST(count_if(q >= 0.3 AND is_dup) AS BIGINT) AS n_dup_dropped,
           CAST(count_if(q >= 0.3 AND NOT is_dup) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN q >= 0.3 AND NOT is_dup
                    THEN CAST(ceil(greatest(n_tok - 8, 1) / 24.0) AS BIGINT) END)
                AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN q >= 0.3 AND NOT is_dup THEN n_tok END) AS BIGINT)
             AS n_tokens_kept
    FROM gated
    GROUP BY source
    ORDER BY source
    """,
)
def pipeline_training_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE capstone pipeline: quality gate -> near-dup representative
    selection -> chunk accounting, per source — the assembly report of
    a training-data mixture (what survives filtering, what chunking
    yields). Composes quality_score, shingle MinHash+LSH, connected
    components and the chunk-count rule over ONE shared shingle scan;
    every stage is the same operator the standalone queries certify."""
    from postrack_spark.functions.text import quality_score
    from postrack_spark.operators.dedup import (
        connected_components,
        jaccard_pairs_from_arrays,
    )

    t = load_tables(spark, sf_dir)
    docs = fan_out(t["documents"])
    # bounded per-doc pin, not the corpus-sized shingle explode — see
    # _minhash_perdoc.
    per_doc = _minhash_perdoc(spark, sf_dir)
    sigs = per_doc.select("doc", *[f"h{i}" for i in range(16)])
    cand = lsh_candidate_pairs(sigs, n_hashes=16, band_size=2, max_bucket_size=100)
    pairs = jaccard_pairs_from_arrays(
        per_doc.select("doc", "toks"), cand, threshold=0.5
    ).select("doc_a", "doc_b")
    comp = connected_components(pairs)
    gated = (
        docs.select(
            "doc_id",
            "source",
            F.size(F.split("text", " ")).alias("n_tok"),
            quality_score(F.col("text")).alias("q"),
        )
        .join(comp.withColumnRenamed("doc", "doc_id"), "doc_id", "left")
        .withColumn(
            "is_dup", F.col("cluster").isNotNull() & (F.col("cluster") != F.col("doc_id"))
        )
    )
    keep = (F.col("q") >= 0.3) & ~F.col("is_dup")
    chunks = F.ceil(F.greatest(F.col("n_tok") - 8, F.lit(1)) / 24.0).cast("bigint")
    return (
        gated.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count_if(F.col("q") < 0.3).cast("bigint").alias("n_quality_fail"),
            F.count_if((F.col("q") >= 0.3) & F.col("is_dup"))
            .cast("bigint")
            .alias("n_dup_dropped"),
            F.count_if(keep).cast("bigint").alias("n_kept"),
            F.sum(F.when(keep, chunks)).cast("bigint").alias("n_chunks"),
            F.sum(F.when(keep, F.col("n_tok"))).cast("bigint").alias("n_tokens_kept"),
        )
        .orderBy("source")
    )


@query(
    "dedup_span_duplication",
    oracle="""
    WITH words AS (SELECT doc_id AS doc, string_split(text, ' ') AS w FROM documents),
    spans AS (
      SELECT DISTINCT doc,
             md5(concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3],
                                w[i+4], w[i+5], w[i+6], w[i+7])) AS sp
      FROM words, unnest(generate_series(1, len(w) - 7)) AS t(i)
    ),
    dup AS (SELECT sp, count(*) AS nd FROM spans GROUP BY sp HAVING count(*) >= 2)
    SELECT CAST((SELECT count(*) FROM dup) AS BIGINT) AS n_dup_spans,
           CAST((SELECT coalesce(sum(nd), 0) FROM dup) AS BIGINT) AS doc_span_pairs,
           CAST((SELECT count(DISTINCT s.doc) FROM spans s JOIN dup ON dup.sp = s.sp)
                AS BIGINT) AS n_docs_affected
    """,
)
def dedup_span_duplication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication audit (the fixed-span approximation
    of suffix-array dedup from "Deduplicating Training Data Makes
    Language Models Better"): 8-token spans shared verbatim by >= 2
    distinct docs. One summary row: distinct duplicated spans, (doc,
    span) instances, docs affected. Spans are md5'd BEFORE the shuffle
    — constant-width keys instead of raw text crossing the exchange.
    Scale: explode -> hash agg on span hash; no pair joins anywhere."""
    t = load_tables(spark, sf_dir)
    k = 8
    grams = F.expr(
        f"CASE WHEN size(__w) >= {k} THEN transform(sequence(1, size(__w) - {k - 1}),"
        f" i -> md5(concat_ws(' ', {', '.join(f'__w[i+{j}-1]' for j in range(k))})))"
        " ELSE array() END"
    )
    spans = (
        fan_out(t["documents"])
        .withColumn("__w", F.split("text", " "))
        .select(
            F.col("doc_id").alias("doc"),
            F.explode(F.array_distinct(grams)).alias("sp"),
        )
    )
    dup = spans.groupBy("sp").agg(F.count("*").alias("nd")).filter(F.col("nd") >= 2)
    summary = dup.agg(
        F.count("*").cast("bigint").alias("n_dup_spans"),
        F.coalesce(F.sum("nd"), F.lit(0)).cast("bigint").alias("doc_span_pairs"),
    )
    affected = (
        spans.join(dup.select("sp"), "sp", "left_semi")
        .agg(F.countDistinct("doc").cast("bigint").alias("n_docs_affected"))
    )
    # 1-row x 1-row join — not a data-path crossJoin
    return summary.crossJoin(affected)


def _bands_sql(band_size: int) -> str:
    n_bands = 16 // band_size
    return " UNION ALL ".join(
        "SELECT doc, {b} AS band, md5({lanes}) AS bh FROM sigs".format(
            b=b,
            lanes=" || ".join(f"h{b * band_size + i}" for i in range(band_size)),
        )
        for b in range(n_bands)
    )


def _geometry_cte(name: str, band_size: int) -> str:
    return f"""
    buckets_{name} AS ({_bands_sql(band_size)}),
    sized_{name} AS (
      SELECT b.* FROM buckets_{name} b
      JOIN (SELECT band, bh, count(*) AS bsz FROM buckets_{name} GROUP BY band, bh) s
        USING (band, bh)
      WHERE s.bsz <= 100
    ),
    cand_{name} AS (
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
      FROM sized_{name} a JOIN sized_{name} b
        ON a.band = b.band AND a.bh = b.bh AND a.doc < b.doc
    ),
    ver_{name} AS (
      SELECT c.doc_a, c.doc_b
      FROM cand_{name} c
      JOIN sizes sa ON sa.doc = c.doc_a
      JOIN sizes sb ON sb.doc = c.doc_b
      JOIN (
        SELECT t1.doc AS doc_a, t2.doc AS doc_b, count(*) AS inter
        FROM shingles t1 JOIN shingles t2 ON t1.tok = t2.tok AND t1.doc < t2.doc
        GROUP BY t1.doc, t2.doc
      ) i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
      WHERE round(i.inter * 1.0 / (sa.n_tok + sb.n_tok - i.inter), 6) >= 0.5
    ),
    row_{name} AS (
      SELECT '{name}' AS geometry,
             CAST((SELECT count(*) FROM cand_{name}) AS BIGINT) AS n_candidates,
             CAST((SELECT count(*) FROM ver_{name}) AS BIGINT) AS n_verified,
             round((SELECT count(*) FROM ver_{name}) * 1.0
                   / greatest((SELECT count(*) FROM cand_{name}), 1), 6) AS precision_at_050
    )"""


@query(
    "dedup_lsh_band_geometry",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_SIG_CTE},
    sizes AS (SELECT doc, count(*) AS n_tok FROM shingles GROUP BY doc),
    {_geometry_cte("b8r2", 2)},
    {_geometry_cte("b4r4", 4)}
    SELECT * FROM row_b8r2 UNION ALL SELECT * FROM row_b4r4
    ORDER BY geometry
    """,
)
def dedup_lsh_band_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-geometry parameter sweep over the SAME 16 signature lanes:
    8 bands x 2 rows (P(candidate|J=0.5) ~ 0.90, looser) vs 4 bands x
    4 rows (~0.23, stricter) — candidate volume, survivors of the exact
    Jaccard >= 0.5 verify, and precision per geometry. This is the
    measurement that justified the main query's 8x2 choice; at 100 TB
    the knob trades shuffle volume (candidates) against recall, and the
    sweep runs on one shared signature build (the expensive pass)."""
    from postrack_spark.operators.dedup import jaccard_pairs_from_arrays

    # shared per-doc pin (was a plan-identical private 'geometry_perdoc'
    # pin that aliased the same CacheManager entry) — see _minhash_perdoc.
    per_doc = _minhash_perdoc(spark, sf_dir)
    sigs = per_doc.select("doc", *[f"h{i}" for i in range(16)])
    sets_ = per_doc.select("doc", "toks")

    def row(name: str, band_size: int) -> DataFrame:
        cand = lsh_candidate_pairs(
            sigs, n_hashes=16, band_size=band_size, max_bucket_size=100
        )
        n_cand = cand.count()
        n_ver = jaccard_pairs_from_arrays(sets_, cand, threshold=0.5).count()
        return spark.createDataFrame(
            [(name, n_cand, n_ver, round(n_ver / max(n_cand, 1), 6))],
            "geometry string, n_candidates bigint, n_verified bigint, precision_at_050 double",
        )

    return row("b8r2", 2).unionByName(row("b4r4", 4)).orderBy("geometry")


@query(
    "dedup_survivorship_golden",
    oracle="""
    WITH fp AS (
      SELECT doc_id, n_chars,
             md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
      FROM documents
    )
    SELECT fp,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(arg_max(doc_id, n_chars * 1000000000000 - doc_id) AS BIGINT)
             AS survivor_doc,
           CAST(arg_max(n_chars, n_chars * 1000000000000 - doc_id) AS BIGINT)
             AS survivor_chars,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM fp
    GROUP BY fp
    HAVING count(*) > 1
    ORDER BY fp
    """,
)
def dedup_survivorship_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship (golden-record election) — the MDM step after
    duplicate grouping: within each normalized-duplicate group, elect
    ONE record by a deterministic rule cascade (longest document wins,
    ties broken by the SMALLEST doc id) and carry its attributes
    forward. The cascade is encoded as a single int64 ordering key
    (n_chars * 1e12 - doc_id — headroom: chars < 9.2e6 at 1e12-scale
    ids), so election is one max_by aggregate with map-side partial
    merge — no window, no per-group sort, and both engines pick the
    identical survivor because the key is a total order. Same
    hash-groupBy shuffle as the dedup family; group count is O(dup
    groups)."""
    docs = load_tables(spark, sf_dir)["documents"]
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(F.split(F.col("text"), r"\s+")))))
    key = F.col("n_chars") * F.lit(1_000_000_000_000) - F.col("doc_id")
    return (
        docs.select("doc_id", "n_chars", fp.alias("fp"), key.alias("k"))
        .groupBy("fp")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.max_by("doc_id", "k").cast("long").alias("survivor_doc"),
            F.max_by("n_chars", "k").cast("long").alias("survivor_chars"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .filter(F.col("n_members") > 1)
        .orderBy("fp")
    )


@query(
    "dedup_method_agreement",
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
    lex AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i JOIN sizes sa ON sa.doc = i.doc_a
                   JOIN sizes sb ON sb.doc = i.doc_b
      WHERE round(inter * 1.0 / (sa.n_tok + sb.n_tok - inter), 6) >= 0.5
    ),
    e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    sem AS (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= 0.35
    ),
    u AS (
      SELECT doc_a, doc_b,
             max(is_lex) AS is_lex, max(is_sem) AS is_sem
      FROM (
        SELECT doc_a, doc_b, 1 AS is_lex, 0 AS is_sem FROM lex
        UNION ALL
        SELECT doc_a, doc_b, 0, 1 FROM sem
      )
      GROUP BY doc_a, doc_b
    )
    SELECT CAST(sum(is_lex) AS BIGINT) AS n_lexical,
           CAST(sum(is_sem) AS BIGINT) AS n_semantic,
           CAST(sum(is_lex * is_sem) AS BIGINT) AS n_both,
           CAST(count(*) AS BIGINT) AS n_union,
           CAST(sum(is_lex * is_sem) * 10000 // count(*) AS BIGINT) AS agreement_pp10k
    FROM u
    """,
)
def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detector-agreement audit: how much do the LEXICAL near-dup
    pipeline (MinHash-LSH candidates verified at Jaccard >= 0.5 on
    3-shingles) and the SEMANTIC one (label-blocked embedding cosine
    >= 0.35) agree on WHICH pairs are duplicates? The question every
    dedup rollout answers before choosing thresholds — reported as
    pair-set intersection/union with agreement in integer pp10k.
    Both pipelines are the registry's existing scale shapes reused
    verbatim (banded candidates + candidates-only verification;
    blocked cosine join — never all-pairs), so the audit costs one
    extra pair-set groupBy over their outputs. doc_id and vec_id share
    the entity id space by fixture construction (TESTDATA.md)."""
    from postrack_spark.functions.vector import as_double_array, cosine
    from postrack_spark.operators.dedup import jaccard_pairs_from_arrays
    from postrack_spark.session import fan_out

    t = load_tables(spark, sf_dir)
    # shared bounded per-doc pin (the banding and the verify used to
    # re-run the shingle chain once each) — see _minhash_perdoc.
    per_doc = _minhash_perdoc(spark, sf_dir)
    sigs = per_doc.select("doc", *[f"h{i}" for i in range(16)])
    cand = lsh_candidate_pairs(sigs, n_hashes=16, band_size=2, max_bucket_size=100)
    lex = jaccard_pairs_from_arrays(
        per_doc.select("doc", "toks"), cand, threshold=0.5
    ).select("doc_a", "doc_b", F.lit(1).alias("is_lex"), F.lit(0).alias("is_sem"))
    e = fan_out(t["embeddings"]).select(
        "vec_id", "label", as_double_array("embedding").alias("v")
    )
    a = e.select(F.col("vec_id").alias("doc_a"), "label", F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("doc_b"), "label", F.col("v").alias("vb"))
    sem = (
        a.join(b, "label")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(cosine(F.col("va"), F.col("vb")) >= 0.35)
        .select("doc_a", "doc_b", F.lit(0).alias("is_lex"), F.lit(1).alias("is_sem"))
    )
    u = (
        lex.unionByName(sem)
        .groupBy("doc_a", "doc_b")
        .agg(F.max("is_lex").alias("is_lex"), F.max("is_sem").alias("is_sem"))
    )
    return u.agg(
        F.sum("is_lex").cast("long").alias("n_lexical"),
        F.sum("is_sem").cast("long").alias("n_semantic"),
        F.sum(F.col("is_lex") * F.col("is_sem")).cast("long").alias("n_both"),
        F.count("*").cast("long").alias("n_union"),
        F.expr(
            "CAST(sum(is_lex * is_sem) * 10000 DIV count(*) AS BIGINT)"
        ).alias("agreement_pp10k"),
    )
