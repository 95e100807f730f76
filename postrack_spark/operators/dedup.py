"""Deduplication operators for large-scale text corpora.

Four tiers (north-star extension, BASELINE.json:6):
  exact            — hash-groupBy on the raw text (or its md5)
  normalized exact — bag-of-words fingerprint
  MinHash + LSH    — near-dup candidates at O(n·bands) instead of O(n²)
  SimHash          — bit-fingerprint + hamming radius

All hashes are md5-based (engine-portable; see functions.text) so the
DuckDB oracle reproduces candidates bit-for-bit — no Spark-private
hash functions in semantically-relevant places.

Scale design: every operator is explode -> shuffle-on-key -> aggregate;
no crossJoin anywhere. MinHash candidate generation shuffles on
(band_index, band_hash) — the LSH bucket — so 100 TB of documents
becomes many small per-bucket joins; hot buckets (degenerate docs) are
bounded by `max_bucket_size`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from postrack_spark.functions.text import (
    distinct_tokens,
    exact_fingerprint,
    minhash_expr,
    normalized_fingerprint,
)


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical docs: fingerprint -> (representative =
    min id, n_docs). Representative choice is deterministic."""
    return (
        df.select(F.col(id_col), exact_fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("representative"), F.count("*").alias("n_docs"))
    )


def normalized_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups identical up to token order/multiplicity."""
    return (
        df.select(F.col(id_col), normalized_fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("representative"), F.count("*").alias("n_docs"))
    )


def doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) distinct — the exploded form every set-based dedup
    operator starts from. One wide shuffle, reused downstream."""
    return df.select(
        F.col(id_col).alias("doc"), F.explode(distinct_tokens(F.col(text_col))).alias("tok")
    )


def doc_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(id, k-word-shingle) distinct.

    Shingles, not unigrams, are the right MinHash unit for small
    vocabularies: with V words a doc's token SET has at most V elements
    (the driver corpus has V≈31, making unigram signatures collide into
    thousands-of-docs LSH buckets — measured 11.1M candidate pairs at
    sf0.1), while the k-gram space is ~V^k so signatures are
    discriminative and buckets stay near-dup-sized (1.5k candidates)."""
    grams = F.expr(
        f"CASE WHEN size(__w) >= {k} THEN transform(sequence(1, size(__w)-{k - 1}),"
        f" i -> concat_ws(' ', {', '.join(f'__w[i+{j}-1]' for j in range(k))}))"
        " ELSE array() END"
    )
    return (
        df.withColumn("__w", F.split(F.col(text_col), " "))
        .select(
            F.col(id_col).alias("doc"),
            F.explode(F.array_distinct(grams)).alias("tok"),
        )
    )


def doc_shingle_arrays(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(doc, toks array<string>) — distinct k-shingles kept as a PER-ROW
    array instead of exploded rows. Docs with fewer than k words are
    dropped (they have no shingles — mirrors the exploded form, where
    such docs simply emit no rows).

    The array form trades shuffle for CPU: signatures become map-side
    array expressions (zero shuffle) and Jaccard skips the collect_set
    aggregation. MEASURED (sf0.1, local[32]): the array path is ~1.5×
    SLOWER than explode+groupBy, because higher-order lambdas
    (transform/array_min) evaluate interpreted per element while the
    exploded path's md5 + hash-agg min are whole-stage-codegen'd. The
    registered queries therefore use the exploded path; this variant
    exists for shuffle-bound deployments (network-limited clusters)
    where removing the |docs|×|shingles| shuffle wins back more than
    the interpreted-lambda overhead costs."""
    grams = F.expr(
        f"CASE WHEN size(__w) >= {k} THEN transform(sequence(1, size(__w)-{k - 1}),"
        f" i -> concat_ws(' ', {', '.join(f'__w[i+{j}-1]' for j in range(k))}))"
        " ELSE array() END"
    )
    return (
        df.withColumn("__w", F.split(F.col(text_col), " "))
        .select(F.col(id_col).alias("doc"), F.array_distinct(grams).alias("toks"))
        .filter(F.size("toks") > 0)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    tokens_df: DataFrame | None = None,
) -> DataFrame:
    """One row per doc with columns h0..h{n-1}: per-seed min over
    distinct tokens of md5(seed|token). Single explode + single
    groupBy — all lanes computed in one aggregation pass.

    `tokens_df` overrides the default unigram tokenization with any
    (doc, tok) set — pass :func:`doc_shingles` output for shingle
    MinHash (recommended; see doc_shingles on why)."""
    toks = tokens_df if tokens_df is not None else doc_tokens(df, id_col, text_col)
    aggs = [F.min(minhash_expr(F.col("tok"), i)).alias(f"h{i}") for i in range(n_hashes)]
    return toks.groupBy("doc").agg(*aggs)


def minhash_signatures_from_arrays(arrays_df: DataFrame, n_hashes: int = 16) -> DataFrame:
    """Signatures computed per-row from a (doc, toks array) input:
    h_i = array_min(transform(toks, t -> md5(i|t))) — pure map-side
    expressions, NO shuffle at all (the exploded form shuffles
    |docs|×|shingles| rows into a groupBy). min over the distinct array
    equals min over exploded distinct rows, so results are identical."""
    def lane(i: int):
        # single-arg lambda: a 2-arg lambda would receive (element,
        # ARRAY INDEX) from F.transform and clobber the seed
        return F.array_min(F.transform("toks", lambda t: minhash_expr(t, i)))

    return arrays_df.select("doc", *[lane(i).alias(f"h{i}") for i in range(n_hashes)])


def lsh_candidate_pairs(
    signatures: DataFrame,
    n_hashes: int = 16,
    band_size: int = 2,
    max_bucket_size: int = 5000,
) -> DataFrame:
    """MinHash-LSH banding: docs sharing any band bucket are candidates.

    Emits distinct (doc_a, doc_b) with doc_a < doc_b. Buckets larger
    than `max_bucket_size` are dropped (degenerate near-constant text —
    at 100 TB such buckets would otherwise produce quadratic pairs).
    """
    n_bands = n_hashes // band_size
    band_cols = []
    for b in range(n_bands):
        lanes = [f"h{i}" for i in range(b * band_size, (b + 1) * band_size)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat(*[F.col(c) for c in lanes])).alias("bh"))
        )
    buckets = signatures.select(
        "doc", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))

    # Single-pass pair generation: group each (band, bucket) once and
    # emit its doc pairs from the collected array (upper triangle,
    # normalized so doc_a < doc_b). This replaces a bucket-size
    # self-join + a candidate self-join, each of which recomputed the
    # whole shingle->signature chain upstream — 3 fewer scans and 2
    # fewer shuffle joins. The per-bucket pair explosion is quadratic
    # but bounded by max_bucket_size (<= cap^2/2 array-local structs).
    # Expansion is posexplode + explode(slice(...)) — codegen'd
    # Generate operators, not interpreted transform/filter lambdas
    # (the graph _edges measurement: 1.5x at sf0.1). Identical pair
    # set: {(i, j): i < j} covers each unordered element pair once and
    # least/greatest normalizes, so collect_list order is irrelevant.
    bucketed = (
        buckets.groupBy("band", "bh")
        .agg(F.collect_list("doc").alias("docs"))
        .filter((F.size("docs") >= 2) & (F.size("docs") <= max_bucket_size))
    )
    return (
        bucketed.select(F.posexplode("docs").alias("i", "a"), "docs")
        .select(
            "a",
            F.explode(F.expr("slice(docs, i + 2, size(docs) - i - 1)")).alias("b"),
        )
        .select(
            F.least("a", "b").alias("doc_a"), F.greatest("a", "b").alias("doc_b")
        )
        .distinct()
    )


def jaccard_pairs(
    tokens_df: DataFrame, pairs: DataFrame | None = None, threshold: float = 0.5
) -> DataFrame:
    """Exact token-set Jaccard.

    With candidate `pairs`: join each side's token-set array and take
    size(array_intersect) — O(candidates · avg_set_size), no blow-up on
    skewed vocabularies (an inverted-index join degenerates when a few
    tokens appear in most docs, e.g. the driver data's 31-word vocab).
    Without `pairs`: inverted-index join over all co-token pairs.

    Returns (doc_a, doc_b, inter, n_a, n_b, jaccard) rows >= threshold.
    """
    sets_ = tokens_df.groupBy("doc").agg(
        F.collect_set("tok").alias("toks"), F.count("*").alias("n_tok")
    )
    return _verify_pairs(sets_, pairs, tokens_df, threshold)


def jaccard_pairs_from_arrays(
    arrays_df: DataFrame, pairs: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard over candidate pairs from a (doc, toks array)
    input: the token sets are already per-row arrays, so the exploded
    collect_set aggregation disappears — one broadcast join + one
    pair-groupBy are the only shuffled steps."""
    sets_ = arrays_df.select("doc", "toks", F.size("toks").alias("n_tok"))
    return _verify_pairs(sets_, pairs, None, threshold)


def jaccard_all_pairs_from_arrays(arrays_df: DataFrame, threshold: float = 0.5) -> DataFrame:
    """ALL-pairs exact Jaccard (inverted-index join) from a (doc, toks
    array) input: the exploded (doc, tok) relation is re-derived by
    exploding the arrays — when `arrays_df` is a materialized per-doc
    frame that is a cheap re-slice, not a re-tokenization of the corpus
    — and set sizes come from size(toks) instead of a second count
    aggregate. Same output contract as :func:`jaccard_pairs` with
    pairs=None. Evaluation-tier only: the all-pairs co-token join is
    the thing LSH exists to avoid at scale."""
    sets_ = arrays_df.select("doc", "toks", F.size("toks").alias("n_tok"))
    toks = arrays_df.select("doc", F.explode("toks").alias("tok"))
    return _verify_pairs(sets_, None, toks, threshold)


def _verify_pairs(
    sets_: DataFrame, pairs: DataFrame | None, tokens_df: DataFrame | None, threshold: float
) -> DataFrame:
    if pairs is not None:
        # One pass over the token sets instead of two: explode each
        # candidate pair into (doc_a, doc_b, doc) membership rows,
        # broadcast-join them against sets_ (streamed once — joining
        # sets_ on each side would recompute the tokenize+collect
        # chain twice), then regroup the two matched rows per pair.
        exploded = pairs.select(
            "doc_a",
            "doc_b",
            F.explode(F.array(F.col("doc_a"), F.col("doc_b"))).alias("doc"),
        )
        side = lambda c: F.first(  # noqa: E731
            F.when(F.col("doc") == F.col("doc_a"), F.col(c)), ignorenulls=True
        )
        other = lambda c: F.first(  # noqa: E731
            F.when(F.col("doc") == F.col("doc_b"), F.col(c)), ignorenulls=True
        )
        inter = (
            sets_.join(F.broadcast(exploded), "doc")
            .groupBy("doc_a", "doc_b")
            .agg(
                F.size(F.array_intersect(side("toks"), other("toks"))).alias("inter"),
                side("n_tok").alias("n_a"),
                other("n_tok").alias("n_b"),
                F.count("*").alias("__matched"),
            )
            .filter(F.col("__matched") == 2)
            .drop("__matched")
        )
    else:
        sizes = sets_.select("doc", "n_tok")
        a = tokens_df.select(F.col("doc").alias("doc_a"), "tok")
        b = tokens_df.select(F.col("doc").alias("doc_b"), "tok")
        inter = (
            a.join(b, "tok")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("inter"))
            .join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_tok", "n_a"), "doc_a")
            .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_tok", "n_b"), "doc_b")
        )
    out = inter.withColumn(
        "jaccard",
        F.round(F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6),
    )
    return out.filter(F.col("jaccard") >= threshold)


def simhash_bits(df: DataFrame, id_col: str, text_col: str, n_bits: int = 16) -> DataFrame:
    """SimHash fingerprint as an n_bits '0'/'1' string.

    Bit b of a token = parity of hex digit b of md5(token); bit b of a
    doc = majority vote over its distinct tokens. Pure arithmetic on
    md5 hex — identically computable in the oracle.
    """
    toks = doc_tokens(df, id_col, text_col).withColumn("h", F.md5(F.col("tok")))
    bit_sums = [
        F.sum(
            F.when(F.instr(F.lit("13579bdf"), F.substring("h", b + 1, 1)) > 0, 1).otherwise(0)
        ).alias(f"s{b}")
        for b in range(n_bits)
    ]
    agg = toks.groupBy("doc").agg(F.count("*").alias("n_tok"), *bit_sums)
    bits = [
        F.when(F.col(f"s{b}") * 2 > F.col("n_tok"), F.lit("1")).otherwise(F.lit("0"))
        for b in range(n_bits)
    ]
    return agg.select("doc", F.concat(*bits).alias("simhash"))


def hamming(a, b, n_bits: int = 16):
    """Hamming distance between two equal-length bitstring columns."""
    terms = [
        F.when(F.substring(a, i + 1, 1) != F.substring(b, i + 1, 1), 1).otherwise(0)
        for i in range(n_bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def simhash_chunk_blocks(sh: DataFrame, n_bits: int = 16, radius: int = 2) -> DataFrame:
    """Pigeonhole candidate blocking for hamming-radius search: split
    the fingerprint into `radius + 1` chunks — two fingerprints within
    `radius` differing bits MUST agree on at least one chunk (the
    differing bits can touch at most `radius` chunks). Exploding each
    doc into its (chunk_id, chunk_value) keys turns the all-pairs
    hamming scan into an equi-join on small buckets: exact recall,
    O(n·chunks) candidate generation. Input needs (doc, simhash);
    output (doc, chunk_id, chunk_val)."""
    n_chunks = radius + 1
    base, extra = divmod(n_bits, n_chunks)
    bounds, start = [], 1
    for c in range(n_chunks):
        width = base + (1 if c < extra else 0)
        bounds.append((c, start, width))
        start += width
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_id"),
                F.substring("simhash", s, w).alias("chunk_val"),
            )
            for c, s, w in bounds
        ]
    )
    return sh.select("*", F.explode(chunks).alias("__ck")).select(
        *sh.columns, F.col("__ck.chunk_id").alias("chunk_id"), F.col("__ck.chunk_val").alias("chunk_val")
    )


def connected_components_star(
    edges: DataFrame, max_iter: int = 50, node_a: str = "doc_a",
    node_b: str = "doc_b", stats: dict | None = None
) -> DataFrame:
    """Connected components by ALTERNATING LARGE-STAR / SMALL-STAR —
    the O(log n)-round MapReduce algorithm (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14; also the
    strategy GraphFrames ships), the 100 TB path the fixed-round
    propagation in graph_queries.py and `connected_components` above
    honestly defer to: min-label propagation needs O(component
    diameter) rounds, so a 10^6-node path graph needs 10^6 rounds,
    while star alternation contracts every component to a star on the
    component MINIMUM in O(log n) rounds regardless of diameter.

    Per round, entirely as edge-set rewrites (each one shuffle on the
    grouping node — no driver-side data, no windows):

    * large-star: over the SYMMETRIZED adjacency, every node u links
      each strictly-LARGER neighbor v to m = min(Gamma(u) + {u}) —
      emit (v, m) for v in Gamma(u), v > u.
    * small-star: over edges canonicalized (u > v), every node u
      links its smaller neighbors and itself to m = min(N(u)) — emit
      (x, m) for x in N(u) + {u}, x != m.

    Both preserve connectivity (every rewrite stays within the
    component and never drops a node); the fixed point is one star
    per component centered at its minimum, so the final edge list IS
    the (node -> component-min) labeling. Convergence is detected by
    edge-set equality (both sets are distinct canonical (x > m)
    pairs: equal counts + empty one-sided subtract). Exhausting
    ``max_iter`` RAISES instead of returning a possibly-wrong
    labeling — the certificate rule (gate the certificate, not the
    estimate). Returns (doc, cluster) like `connected_components`.

    Round cost: two shuffles (groupBy u + the self-join) per phase on
    O(|E|) rows; the edge set never grows beyond the symmetrized
    input (large-star emits at most one edge per (u, v>u) slot,
    small-star at most one per canonical edge + one per center).
    localCheckpoint per round truncates lineage exactly like the
    propagation form; min() is order-insensitive so no determinism
    pin is needed beyond it.
    """
    sess = edges.sparkSession
    nodes = (
        edges.select(F.col(node_a).alias("doc"))
        .union(edges.select(F.col(node_b).alias("doc")))
        .distinct()
        .localCheckpoint()
    )
    e = (
        edges.select(
            F.greatest(F.col(node_a), F.col(node_b)).alias("u"),
            F.least(F.col(node_a), F.col(node_b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    prev_cnt = e.count()
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # large-star on the symmetrized adjacency
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mn = sym.groupBy("u").agg(F.min("v").alias("mv")).select(
            "u", F.least(F.col("mv"), F.col("u")).alias("m"))
        large = (
            sym.join(mn, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star on the canonical (u > v) form large-star emits
        mn2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(mn2, "u")
            .select(F.col("v").alias("x"), "m")
            .union(large.join(mn2, "u").select(F.col("u").alias("x"), "m"))
            .filter(F.col("x") != F.col("m"))
            .select(F.col("x").alias("u"), F.col("m").alias("v"))
            .distinct()
            .localCheckpoint()
        )
        cnt = small.count()
        if cnt == prev_cnt and small.subtract(e).isEmpty():
            e = small
            break
        e, prev_cnt = small, cnt
    else:
        raise RuntimeError(
            f"star CC did not converge in {max_iter} rounds - "
            "refusing to return an unconverged labeling")
    if stats is not None:
        stats["rounds"] = rounds
    stars = e.select(F.col("u").alias("doc"), F.col("v").alias("lbl"))
    return (
        nodes.join(stars, "doc", "left")
        .select("doc", F.coalesce(F.col("lbl"), F.col("doc")).alias("cluster"))
    )


def connected_components(
    edges: DataFrame, max_iter: int = 25, node_a: str = "doc_a",
    node_b: str = "doc_b", stats: dict | None = None
) -> DataFrame:
    """Duplicate CLUSTERS from near-dup PAIRS: connected components of
    the pair graph by iterative min-label propagation.

    Pipelines keep one representative per duplicate group, which needs
    the transitive closure of the pairwise matches (A~B, B~C => {A,B,C}
    even if A,C never matched). Each iteration: every node adopts the
    min label among itself and its neighbors — a broadcast-free
    aggregation over the (undirected) edge list; converges in O(cluster
    diameter) rounds, which for dedup graphs is small (near-dup clusters
    are dense). The label IS the min member id, so the final label
    doubles as the canonical representative.

    Driver-side loop with a convergence count per round — legitimate
    iteration (each round is fully distributed); `localCheckpoint`
    truncates the growing lineage so round N doesn't replay rounds
    1..N-1. Returns (doc, cluster).
    """
    sess = edges.sparkSession
    bidir = (
        edges.select(F.col(node_a).alias("src"), F.col(node_b).alias("dst"))
        .union(edges.select(F.col(node_b).alias("src"), F.col(node_a).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        bidir.select(F.col("src").alias("doc"))
        .distinct()
        .withColumn("cluster", F.col("doc"))
        .localCheckpoint()
    )
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        neighbor_min = (
            bidir.join(labels, bidir.dst == labels.doc)
            .groupBy("src")
            .agg(F.min("cluster").alias("nb_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.doc == neighbor_min.src, "left")
            .select(
                "doc",
                F.least(
                    F.col("cluster"), F.coalesce(F.col("nb_min"), F.col("cluster"))
                ).alias("cluster"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc")
            .filter(F.col("n.cluster") != F.col("o.cluster"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
    return labels
