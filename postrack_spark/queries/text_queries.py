"""Text-analysis queries over the documents table: token metrics,
quality scoring, language-ID heuristic, fingerprinting, and the
multimodal binary-payload profile (north-star extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from postrack_spark.functions.text import (
    STOPWORDS,
    distinct_token_count,
    exact_fingerprint,
    normalized_fingerprint,
    quality_score,
    stopword_count,
    token_count,
    tokens,
)
from postrack_spark.queries.registry import query
from postrack_spark.session import fan_out, load_tables

_SW_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)


@query(
    "text_token_stats",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           round(avg(len(list_distinct(string_split(text, ' '))) * 1.0
                     / len(string_split(text, ' '))), 6) AS avg_distinct_ratio,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per language: totals + vocabulary-diversity ratio."""
    t = load_tables(spark, sf_dir)
    txt = F.col("text")
    return (
        fan_out(t["documents"])
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count(txt)).cast("bigint").alias("total_tokens"),
            F.round(
                F.avg(distinct_token_count(txt) / token_count(txt)), 6
            ).alias("avg_distinct_ratio"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
        .orderBy("lang")
    )


@query(
    "text_quality_scores",
    oracle=f"""
    WITH scored AS (
      SELECT source,
             len(string_split(text, ' ')) * 1.0 AS n,
             len(list_filter(string_split(text, ' '), t -> t IN ({_SW_LIST}))) * 1.0 AS sw,
             len(list_filter(string_split(text, ' '), t -> length(t) <= 1)) * 1.0 AS sh
      FROM documents
    )
    SELECT source,
           round(avg(round(least(n / 100.0, 1.0) * (1 - sw / n) * (1 - sh / n), 6)), 6)
             AS avg_quality,
           count(*) AS n_docs
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality heuristic (length × non-stopword × non-short-token) per
    source — the LLM-pipeline 'filter low-quality docs' primitive."""
    t = load_tables(spark, sf_dir)
    return (
        fan_out(t["documents"])
        .select("source", quality_score(F.col("text")).alias("q"))
        .groupBy("source")
        .agg(F.round(F.avg("q"), 6).alias("avg_quality"), F.count("*").alias("n_docs"))
        .orderBy("source")
    )


# Marker words per language for the n-gram-free language-ID heuristic.
_MARKERS = {
    "en": ["the", "a", "of", "is"],
    "de": ["der", "die", "das", "und"],
    "es": ["el", "la", "los", "y"],
    "fr": ["le", "les", "des", "et"],
}


def _marker_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _MARKERS[lang])
    return f"len(list_filter(string_split(text, ' '), t -> t IN ({lst})))"


@query(
    "text_language_id",
    oracle=f"""
    WITH scored AS (
      SELECT lang AS true_lang,
             {_marker_sql("en")} AS s_en,
             {_marker_sql("de")} AS s_de,
             {_marker_sql("es")} AS s_es,
             {_marker_sql("fr")} AS s_fr
      FROM documents
    ),
    pred AS (
      SELECT true_lang,
             CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'unknown'
                  WHEN s_en >= greatest(s_de, s_es, s_fr) THEN 'en'
                  WHEN s_de >= greatest(s_es, s_fr) THEN 'de'
                  WHEN s_es >= s_fr THEN 'es'
                  ELSE 'fr' END AS pred_lang
      FROM scored
    )
    SELECT true_lang, pred_lang, count(*) AS n
    FROM pred
    GROUP BY true_lang, pred_lang
    ORDER BY true_lang, pred_lang
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic, reported as a confusion
    matrix against the ground-truth lang column. (On real corpora the
    marker lists would be n-gram profiles; the operator shape — score
    per language, argmax with deterministic precedence — is the same.)"""
    t = load_tables(spark, sf_dir)
    txt = F.col("text")

    def score(lang: str):
        return F.size(F.filter(tokens(txt), lambda tok: tok.isin(_MARKERS[lang])))

    scored = fan_out(t["documents"]).select(
        F.col("lang").alias("true_lang"),
        score("en").alias("s_en"),
        score("de").alias("s_de"),
        score("es").alias("s_es"),
        score("fr").alias("s_fr"),
    )
    best = F.greatest("s_en", "s_de", "s_es", "s_fr")
    pred = (
        F.when(best == 0, "unknown")
        .when(F.col("s_en") >= F.greatest("s_de", "s_es", "s_fr"), "en")
        .when(F.col("s_de") >= F.greatest("s_es", "s_fr"), "de")
        .when(F.col("s_es") >= F.col("s_fr"), "es")
        .otherwise("fr")
    )
    return (
        scored.select("true_lang", pred.alias("pred_lang"))
        .groupBy("true_lang", "pred_lang")
        .agg(F.count("*").alias("n"))
        .orderBy("true_lang", "pred_lang")
    )


@query(
    "text_doc_profile",
    oracle=f"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
           CAST(len(list_filter(string_split(text, ' '), t -> t IN ({_SW_LIST}))) AS INT)
             AS n_stopwords,
           md5(text) AS fp,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
             AS norm_fp
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id
    """,
)
def text_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document profile row: token counts + both fingerprints."""
    t = load_tables(spark, sf_dir)
    txt = F.col("text")
    return (
        fan_out(t["documents"])
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            token_count(txt).alias("n_tokens"),
            distinct_token_count(txt).alias("n_distinct"),
            stopword_count(txt).cast("int").alias("n_stopwords"),
            exact_fingerprint(txt).alias("fp"),
            normalized_fingerprint(txt).alias("norm_fp"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_fingerprint_shingles",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
      SELECT doc_id, md5(concat_ws(' ', w[i], w[i+1], w[i+2])) AS h
      FROM toks, unnest(generate_series(1, len(w) - 2)) AS t(i)
    )
    SELECT doc_id, min(h) AS fingerprint,
           count(*) AS n_shingles,
           count(DISTINCT h) AS n_distinct
    FROM sh GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_fingerprint_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: 3-word shingles hashed (md5 — identical
    hex in Spark and DuckDB), min-hash fingerprint per doc (the
    winnowing primitive). All JVM-side higher-order array functions —
    no Python in the hot path; at 100 TB this is a single scan with a
    per-row array pipeline, no shuffle until the final (tiny) output."""
    t = load_tables(spark, sf_dir)
    docs = fan_out(t["documents"]).withColumn("toks", F.split("text", " "))
    shingles = F.when(
        F.size("toks") >= 3,
        F.expr(
            "transform(sequence(1, size(toks)-2),"
            " i -> md5(concat_ws(' ', toks[i-1], toks[i], toks[i+1])))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.withColumn("sh", shingles)
        .select(
            "doc_id",
            F.array_min("sh").alias("fingerprint"),
            F.size("sh").cast("bigint").alias("n_shingles"),
            F.size(F.array_distinct("sh")).cast("bigint").alias("n_distinct"),
        )
        .orderBy("doc_id")
    )


@query(
    "multimodal_feature_extract",
    oracle="""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
      FROM documents
    ),
    bytes AS (
      SELECT doc_id, (t.i - 1) % 8 AS j,
             ('0x' || substr(h, 2*t.i - 1, 2))::INT AS v
      FROM b, unnest(generate_series(1, n)) t(i)
    ),
    f AS (SELECT doc_id, j, avg(v) / 255.0 AS fv FROM bytes GROUP BY doc_id, j)
    SELECT doc_id, CAST(count(*) AS INT) AS n_features,
           round(sqrt(sum(fv * fv)), 6) AS feature_norm
    FROM f GROUP BY doc_id ORDER BY doc_id
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas (Arrow
    batches, stubbed codec): per-asset fixed-width vectors + norm. The
    deterministic fake decode is a folded byte histogram, so the oracle
    recomputes it byte-for-byte in SQL (hex-slice of the UTF-8 payload)
    — the Python batch pipeline is hash-checked end to end, not just
    rows-only."""
    from postrack_spark.functions.vector import norm
    from postrack_spark.operators.multimodal import attach_payload, extract_features

    t = load_tables(spark, sf_dir)
    media = attach_payload(fan_out(t["documents"]), "text", "text/plain")
    feats = extract_features(media, "doc_id", n_features=8)
    return (
        feats.select(
            "doc_id",
            F.size("features").alias("n_features"),
            F.round(norm(F.col("features")), 6).alias("feature_norm"),
        )
        .orderBy("doc_id")
    )


@query(
    "multimodal_binary_profile",
    oracle="""
    SELECT source,
           count(*) AS n_payloads,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           count(DISTINCT sha256(text)) AS n_distinct_payloads
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def multimodal_binary_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing tier: treat content as opaque binary —
    byte length + content digest aggregated per source. The decode /
    feature-extract stage for real image/audio payloads lives in
    operators.multimodal (Pandas-UDF pipeline with stubbed codecs)."""
    t = load_tables(spark, sf_dir)
    payload = F.encode(F.col("text"), "UTF-8")
    return (
        fan_out(t["documents"])
        .select("source", payload.alias("payload"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_payloads"),
            F.sum(F.octet_length("payload")).cast("bigint").alias("total_bytes"),
            F.countDistinct(F.sha2("payload", 256)).alias("n_distinct_payloads"),
        )
        .orderBy("source")
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
      FROM documents
    )
    SELECT doc_id, CAST(g.i AS INT) AS frame_no,
           substr(h, 128 * g.i + 1, 128) AS frame_hex,
           CAST(length(substr(h, 128 * g.i + 1, 128)) // 2 AS BIGINT) AS frame_len
    FROM b, unnest(generate_series(0, (n + 63) // 64 - 1)) g(i)
    ORDER BY doc_id, frame_no
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads: one row per 64-byte 'frame'
    via the one-to-many mapInPandas pipeline (stubbed codec — a real
    video sampler swaps the decode call, same batch shape). The oracle
    recomputes every frame byte-for-byte as hex slices, so the
    Python-side explode is value-checked, not just row-counted."""
    from postrack_spark.operators.multimodal import attach_payload, sample_frames

    t = load_tables(spark, sf_dir)
    media = attach_payload(fan_out(t["documents"]), "text", "text/plain")
    frames = sample_frames(media, "doc_id", every=64)
    return frames.select(
        "doc_id",
        "frame_no",
        F.hex("frame").alias("frame_hex"),
        F.octet_length("frame").cast("bigint").alias("frame_len"),
    ).orderBy("doc_id", "frame_no")


@query(
    "multimodal_png_roundtrip_certify",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_roundtrip_ok,
           CAST(sum((4 + n_chars % 5) * (3 + n_chars % 7) * 3) AS BIGINT)
             AS total_rgb_bytes
    FROM documents
    """,
)
def multimodal_png_roundtrip_certify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, driver-gated: per document, build a
    deterministic RGB image (md5-of-text pixel pattern, per-doc
    dimensions derived from n_chars), encode it as PNG with the scanline
    filter chosen by doc_id % 5 — so all five filter types run — and
    Adam7 INTERLACE on odd doc_ids (round 6: both IDAT layouts), then
    decode through the production ``decode_media`` path (pure-stdlib
    operators/png.py, fake_decode=False) and certify the roundtrip is
    byte-exact. The oracle is the certification contract: n_roundtrip_ok
    must equal count(*) (one flipped pixel anywhere fails the hash gate)
    and total_rgb_bytes — summed from the DECODED payload lengths — must
    match pure SQL arithmetic over n_chars, pinning decoded geometry to
    the spec. Same pattern as quality_hll_error_certify: gate the
    certificate, not an engine-specific artifact (the compressed PNG
    bytes themselves are zlib-version-dependent).

    Scale: one mapInPandas pass, Arrow-batched; images never leave their
    executor, output is 3 integers per partition pre-aggregated by the
    hash agg. 100 TB of images = embarrassingly parallel leaf decode."""
    from collections.abc import Iterator

    import pandas as pd

    t = load_tables(spark, sf_dir)
    docs = fan_out(t["documents"]).select("doc_id", "text", "n_chars")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from postrack_spark.operators.multimodal import decode_media
        from postrack_spark.operators.png import encode_png

        for pdf in it:
            oks, nbytes = [], []
            for doc_id, text, n_chars in zip(
                pdf["doc_id"], pdf["text"], pdf["n_chars"]
            ):
                w = 4 + int(n_chars) % 5
                h = 3 + int(n_chars) % 7
                need = w * h * 3
                dig = hashlib.md5(text.encode("utf-8")).digest()
                pixels = (dig * (need // len(dig) + 1))[:need]
                payload = encode_png(pixels, w, h, filter_type=int(doc_id) % 5,
                                     interlace=int(doc_id) % 2 == 1)
                decoded = decode_media(payload, "image/png", fake_decode=False)
                oks.append(decoded == pixels)
                nbytes.append(len(decoded))
            yield pd.DataFrame({"ok": oks, "rgb_bytes": nbytes})

    per_doc = docs.mapInPandas(batches, "ok boolean, rgb_bytes long")
    return per_doc.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("ok").cast("long")).cast("bigint").alias("n_roundtrip_ok"),
        F.sum("rgb_bytes").cast("bigint").alias("total_rgb_bytes"),
    )


@query(
    "multimodal_resize",
    oracle="""
    SELECT doc_id,
           rpad(substr(hex(encode(text)), 1, 192), 192, '0') AS resized_hex,
           CAST(96 AS BIGINT) AS byte_len
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stub over binary payloads (truncate/zero-pad to 96 bytes
    through mapInPandas — a real image resize swaps the codec call,
    same Arrow batch plumbing), value-checked byte-for-byte via hex."""
    from postrack_spark.operators.multimodal import attach_payload, resize_media

    t = load_tables(spark, sf_dir)
    media = attach_payload(fan_out(t["documents"]), "text", "text/plain")
    resized = resize_media(media, "doc_id", target=96)
    return resized.select(
        "doc_id", F.hex("payload").alias("resized_hex"), "byte_len"
    ).orderBy("doc_id")


@query(
    "multimodal_jpeg_roundtrip_certify",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_blockconst_exact,
           CAST(count(*) AS BIGINT) AS n_noise_ok,
           CAST(sum(2 * (8 * (1 + n_chars % 3)) * (8 * (1 + n_chars % 2)) * 3)
                AS BIGINT) AS total_rgb_bytes
    FROM documents
    """,
)
def multimodal_jpeg_roundtrip_certify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG decode, driver-gated (operators/jpeg.py, pure
    stdlib — same pattern as multimodal_png_roundtrip_certify). Per
    document, two grayscale images with md5-derived pixels and
    per-doc dimensions, alternating 4:4:4 / 4:2:0 by doc_id parity:

    * a BLOCK-CONSTANT image (one md5 byte per 8x8 block): DC-only
      spectra are integers under unit quant tables, so the roundtrip
      must be byte-EXACT — a mathematical property, zero tolerance;
    * a NOISE image (md5 bytes cycled per pixel): full AC Huffman +
      ZRL/EOB paths; only DCT rounding remains (measured max error 1),
      certified within an absolute bound of 4.

    The oracle is the contract: both certificate counts must equal
    count(*), and total_rgb_bytes — summed from DECODED lengths — must
    match pure SQL arithmetic over n_chars, pinning decoded geometry.
    Grayscale is what makes both certificates tight: chroma planes are
    constant 128, so 4:2:0 box-subsampling is exact and the RGB<->YCbCr
    transform is the identity on gray.

    Scale: one Arrow-batched mapInPandas pass; images never leave their
    executor; output is 4 integers per partition before the hash agg."""
    from collections.abc import Iterator

    import pandas as pd

    t = load_tables(spark, sf_dir)
    docs = fan_out(t["documents"]).select("doc_id", "text", "n_chars")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from postrack_spark.operators.jpeg import decode_jpeg, encode_jpeg

        for pdf in it:
            exact_oks, noise_oks, nbytes = [], [], []
            for doc_id, text, n_chars in zip(
                pdf["doc_id"], pdf["text"], pdf["n_chars"]
            ):
                w = 8 * (1 + int(n_chars) % 3)
                h = 8 * (1 + int(n_chars) % 2)
                sub = (2, 2) if int(doc_id) % 2 else (1, 1)
                dig = hashlib.md5(text.encode("utf-8")).digest()
                nbx = w // 8
                block_rgb = bytearray()
                for y in range(h):
                    for x in range(w):
                        v = dig[((y // 8) * nbx + x // 8) % 16]
                        block_rgb += bytes([v, v, v])
                dec, dw, dh = decode_jpeg(
                    encode_jpeg(bytes(block_rgb), w, h, subsample=sub)
                )
                exact_oks.append(dec == bytes(block_rgb) and (dw, dh) == (w, h))
                noise_rgb = bytearray()
                for i in range(w * h):
                    v = dig[i % 16]
                    noise_rgb += bytes([v, v, v])
                dec2, _, _ = decode_jpeg(
                    encode_jpeg(bytes(noise_rgb), w, h, subsample=sub)
                )
                noise_oks.append(
                    len(dec2) == len(noise_rgb)
                    and max(abs(a - b) for a, b in zip(dec2, noise_rgb)) <= 4
                )
                nbytes.append(len(dec) + len(dec2))
            yield pd.DataFrame(
                {"exact_ok": exact_oks, "noise_ok": noise_oks, "rgb_bytes": nbytes}
            )

    per_doc = docs.mapInPandas(
        batches, "exact_ok boolean, noise_ok boolean, rgb_bytes long"
    )
    return per_doc.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("exact_ok").cast("long")).cast("bigint").alias("n_blockconst_exact"),
        F.sum(F.col("noise_ok").cast("long")).cast("bigint").alias("n_noise_ok"),
        F.sum("rgb_bytes").cast("bigint").alias("total_rgb_bytes"),
    )


@query(
    "udf_map_in_arrow",
    oracle="""
    SELECT lang,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens,
           CAST(sum(length(text)) AS BIGINT) AS chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the Arrow-NATIVE map (Spark 4): the UDF receives
    pyarrow RecordBatches and computes with pyarrow.compute kernels,
    skipping the pandas conversion mapInPandas pays on both sides of
    the boundary. For bytes/string-heavy leaf work (the multimodal
    codecs' natural home) this is the lowest-overhead Python lane
    Spark offers; registered so the API surface row is exercised and
    its plan shape (MapInArrow, not BatchEvalPython) is pinned. The
    token/char counts are exact integers — split(' ') semantics agree
    byte-for-byte across Python, Spark and DuckDB (empty fields
    included) — so the rollup hash-gates. Scale: one Arrow batch
    stream per partition, partial aggregation before the lang
    shuffle."""
    import pyarrow  # noqa: F401 — fail fast at build if absent

    docs = fan_out(load_tables(spark, sf_dir)["documents"]).select(
        "lang", "text")

    def fn(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            txt = batch.column(1)
            ntok = pc.list_value_length(
                pc.split_pattern(txt, " ")).cast(pa.int64())
            nchr = pc.utf8_length(txt).cast(pa.int64())
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), ntok, nchr], ["lang", "n_tok", "n_chr"])

    out = docs.mapInArrow(fn, "lang string, n_tok long, n_chr long")
    return (
        out.groupBy("lang")
        .agg(F.sum("n_tok").cast("long").alias("tokens"),
             F.sum("n_chr").cast("long").alias("chars"))
        .orderBy("lang")
    )


@query(
    "udf_apply_in_arrow",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().applyInArrow — the grouped Arrow-native UDF (Spark 4),
    completing the Arrow lane family with udf_map_in_arrow: each group
    arrives as ONE pyarrow Table (so, as with applyInPandas, a group
    must fit an executor — the scale contract is high-cardinality
    grouping keys) and aggregates with pyarrow.compute kernels, no
    pandas conversion. Money quantizes to integer cents per row before
    the int64 sum (the double-sum association trap), quantities are
    integral doubles, so the rollup hash-gates against plain SQL.
    Plans as FlatMapGroupsInArrow after a hash partition on the key —
    partial aggregation is NOT available through this lane (the whole
    group must reach one worker), which is exactly why the registered
    analytics queries use declarative aggregates instead; this query
    pins the API surface and its semantics, not a recommended shape
    for simple rollups."""
    li = fan_out(load_tables(spark, sf_dir)["lineitem"]).select(
        "l_returnflag", "l_quantity", "l_extendedprice")

    def fn(table):
        import pyarrow as pa
        import pyarrow.compute as pc

        q = pc.cast(table.column("l_quantity"), pa.int64())
        cents = pc.cast(
            pc.round(pc.multiply(table.column("l_extendedprice"), 100.0)),
            pa.int64())
        return pa.table({
            "l_returnflag": [table.column("l_returnflag")[0].as_py()],
            "n": [table.num_rows],
            "qty": [pc.sum(q).as_py()],
            "cents": [pc.sum(cents).as_py()],
        })

    return (
        li.groupBy("l_returnflag")
        .applyInArrow(fn, "l_returnflag string, n long, qty long, cents long")
        .orderBy("l_returnflag")
    )


@query(
    "multimodal_jpeg_progressive_certify",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_progressive_ok,
           CAST(sum((16 + 8 * (doc_id % 8)) * (16 + 8 * ((doc_id % 8) % 3))
                    * 3) AS BIGINT) AS total_rgb_bytes
    FROM documents
    """,
)
def multimodal_jpeg_progressive_certify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE (SOF2) JPEG decode, driver-gated and cross-decoder
    certified: eight fixture images (busy luma / constant chroma — the
    4:2:0 upsampling-policy trap; per-fixture dimensions derived from
    the fixture index) are encoded as MULTI-SCAN progressive JPEG by
    javax.imageio (ImageWriteParam.MODE_DEFAULT emits a spectral-
    selection + successive-approximation scan script; asserted SOF2)
    and ALSO decoded by the JDK — zero shared code with
    operators/jpeg.py. Each document joins its fixture (doc_id % 8,
    broadcast) and the production decoder runs DISTRIBUTED inside
    mapInPandas; the certificate per doc is decode-within-4-codes of
    the JDK's own decode of the same bytes (IDCT rounding only — any
    Huffman/band/refinement/EOB-run bug is fatal). The oracle is the
    contract: n_progressive_ok must equal count(*) and
    total_rgb_bytes — summed from DECODED lengths — must match SQL
    arithmetic over doc_id, pinning decoded geometry.

    Scale: fixture prep is O(8) driver-side; the decode — the actual
    work at 100 TB — is an Arrow-batched mapInPandas leaf, images
    never leave their executor, 3 integers per partition pre-agg."""
    from collections.abc import Iterator

    import pandas as pd

    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    fixtures = []
    for k in range(8):
        w = 16 + 8 * k
        h = 16 + 8 * (k % 3)
        rgb = bytes(
            v for y in range(h) for x in range(w)
            for v in [(x * 41 + y * 23 + (x * y + k) % 13) % 256] * 3)
        B = jvm.java.awt.image.BufferedImage
        img = B(w, h, B.TYPE_INT_RGB)
        arr = gw.new_array(jvm.int, w * h)
        for i in range(w * h):
            v = (rgb[3 * i] << 16) | (rgb[3 * i + 1] << 8) | rgb[3 * i + 2]
            arr[i] = v - (1 << 32) if v >= (1 << 31) else v
        img.setRGB(0, 0, w, h, arr, 0, w)
        writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
            "jpg").next()
        param = writer.getDefaultWriteParam()
        param.setProgressiveMode(
            jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
        baos = jvm.java.io.ByteArrayOutputStream()
        ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
        writer.setOutput(ios)
        writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
        ios.close()
        payload = bytes(baos.toByteArray())
        assert b"\xff\xc2" in payload, "JDK writer did not emit SOF2"
        jimg = jvm.javax.imageio.ImageIO.read(
            jvm.java.io.ByteArrayInputStream(payload))
        argb = jimg.getRGB(0, 0, w, h, None, 0, w)
        expected = bytearray()
        for v in argb:
            expected += bytes(((v >> 16) & 255, (v >> 8) & 255, v & 255))
        fixtures.append((k, payload, bytes(expected), w, h))
    fx = spark.createDataFrame(
        fixtures, "k long, payload binary, expected binary, w int, h int")

    t = load_tables(spark, sf_dir)
    docs = fan_out(t["documents"]).select(
        "doc_id", (F.col("doc_id") % 8).alias("k"))
    joined = docs.join(F.broadcast(fx), "k")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from postrack_spark.operators.jpeg import decode_jpeg

        cache: dict[int, tuple[bool, int]] = {}  # per-worker: distinct
        # fixtures decode once (real pipelines decode distinct assets;
        # the per-doc rows keep the join + certificate plumbing honest)

        def certify(k, payload, expected, w, h):
            if k not in cache:
                dec, dw, dh = decode_jpeg(bytes(payload))
                exp = bytes(expected)
                ok = (
                    (dw, dh) == (int(w), int(h))
                    and len(dec) == len(exp)
                    and max(abs(a - b) for a, b in zip(dec, exp)) <= 4
                )
                cache[k] = (ok, len(dec))
            return cache[k]

        for pdf in it:
            oks, nbytes = [], []
            for k, payload, expected, w, h in zip(
                pdf["k"], pdf["payload"], pdf["expected"], pdf["w"], pdf["h"]
            ):
                ok, n = certify(int(k), payload, expected, w, h)
                oks.append(ok)
                nbytes.append(n)
            yield pd.DataFrame({"ok": oks, "rgb_bytes": nbytes})

    per_doc = joined.mapInPandas(batches, "ok boolean, rgb_bytes long")
    return per_doc.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("ok").cast("long")).cast("bigint").alias("n_progressive_ok"),
        F.sum("rgb_bytes").cast("bigint").alias("total_rgb_bytes"),
    )


@query(
    "multimodal_gif_animation_certify",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(2 + doc_id % 3) AS BIGINT) AS n_frames_total,
           CAST(sum(2 + doc_id % 3) AS BIGINT) AS n_frames_exact,
           CAST(sum(5 * (2 + doc_id % 3) * (1 + doc_id % 3)) AS BIGINT)
             AS total_delay_cs,
           CAST(sum((2 + doc_id % 3) * (4 + n_chars % 5) * (3 + n_chars % 7) * 3)
                AS BIGINT) AS total_rgb_bytes
    FROM documents
    """,
)
def multimodal_gif_animation_certify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL animated-GIF decode, driver-gated (operators/gif.py, pure
    stdlib LZW + compositing). Per document, an animation with
    2 + doc_id % 3 full-canvas frames — md5-derived palette indices,
    frame f delayed f*10 cs — encoded then decoded through
    decode_gif_frames. GIF is lossless over palette indices, so every
    composited frame must be byte-EXACT (strongest certificate class),
    the frame count and the summed delays must match SQL arithmetic
    over doc_id (Σ f*10 for f<k is 10*k*(k-1)/2), and total_rgb_bytes
    pins the decoded canvas geometry to n_chars arithmetic.

    Scale: one Arrow-batched mapInPandas pass, 5 integers per partition
    into the hash agg; animations never leave their executor."""
    from collections.abc import Iterator

    import pandas as pd

    t = load_tables(spark, sf_dir)
    docs = fan_out(t["documents"]).select("doc_id", "text", "n_chars")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from postrack_spark.operators.gif import decode_gif_frames, encode_gif

        palette = [(i * 17 % 256, i * 37 % 256, i * 29 % 256) for i in range(16)]
        for pdf in it:
            counts, exacts, delays, nbytes = [], [], [], []
            for doc_id, text, n_chars in zip(
                pdf["doc_id"], pdf["text"], pdf["n_chars"]
            ):
                k = 2 + int(doc_id) % 3
                w = 4 + int(n_chars) % 5
                h = 3 + int(n_chars) % 7
                dig = hashlib.md5(text.encode("utf-8")).digest()
                frames = []
                expected = []
                for f in range(k):
                    idx = bytes(dig[(i + f) % 16] % 16 for i in range(w * h))
                    frames.append({"indices": idx, "delay_cs": f * 10})
                    expected.append(
                        b"".join(bytes(palette[i]) for i in idx)
                    )
                payload = encode_gif(frames, w, h, palette)
                decoded, dw, dh = decode_gif_frames(payload)
                counts.append(len(decoded))
                exacts.append(
                    sum(
                        1
                        for (rgb, _d), exp in zip(decoded, expected)
                        if rgb == exp
                    )
                    if (dw, dh) == (w, h)
                    else 0
                )
                delays.append(sum(d for _rgb, d in decoded))
                nbytes.append(sum(len(rgb) for rgb, _d in decoded))
            yield pd.DataFrame(
                {
                    "n_frames": counts,
                    "n_exact": exacts,
                    "delay_cs": delays,
                    "rgb_bytes": nbytes,
                }
            )

    per_doc = docs.mapInPandas(
        batches, "n_frames long, n_exact long, delay_cs long, rgb_bytes long"
    )
    return per_doc.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_frames").cast("bigint").alias("n_frames_total"),
        F.sum("n_exact").cast("bigint").alias("n_frames_exact"),
        F.sum("delay_cs").cast("bigint").alias("total_delay_cs"),
        F.sum("rgb_bytes").cast("bigint").alias("total_rgb_bytes"),
    )


@query(
    "multimodal_video_frame_sample_certify",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum((4 + doc_id % 4) // 2) AS BIGINT) AS n_frames_sampled,
           CAST(sum((4 + doc_id % 4) // 2) AS BIGINT) AS n_frames_exact,
           CAST(sum(((4 + doc_id % 4) // 2)
                    * (8 * (1 + n_chars % 3)) * (8 * (1 + n_chars % 2)) * 3)
                AS BIGINT) AS total_frame_bytes
    FROM documents
    """,
)
def multimodal_video_frame_sample_certify(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL video frame sampling, driver-gated: per document an MJPEG
    AVI with 3 + doc_id % 4 frames (operators/avi.py container, each
    frame a block-constant grayscale JPEG whose 8x8 blocks carry
    md5(text) bytes offset by frame_no — byte-exact decodable, see
    multimodal_jpeg_roundtrip_certify), pushed through the PRODUCTION
    ``sample_media_frames`` operator (every=2: container parse ->
    frame selection -> per-frame JPEG decode). Sampled frames are
    joined back to their documents (broadcast) and verified pixel-exact
    against the md5 recipe. ceil(k/2) sampled frames per doc is
    (4 + doc_id % 4) // 2 in the oracle (k = 3 + doc_id % 4).

    Scale: media built and decoded inside Arrow-batched mapInPandas
    stages; the only shuffle-free join is a broadcast of the narrow
    document columns onto the sampled frames. Payloads never hit the
    driver."""
    from collections.abc import Iterator

    import pandas as pd

    from postrack_spark.operators.multimodal import sample_media_frames

    t = load_tables(spark, sf_dir)
    docs = fan_out(t["documents"]).select("doc_id", "text", "n_chars")

    def build(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from postrack_spark.operators.avi import encode_avi
        from postrack_spark.operators.jpeg import encode_jpeg

        for pdf in it:
            ids, payloads = [], []
            for doc_id, text, n_chars in zip(
                pdf["doc_id"], pdf["text"], pdf["n_chars"]
            ):
                k = 3 + int(doc_id) % 4
                w = 8 * (1 + int(n_chars) % 3)
                h = 8 * (1 + int(n_chars) % 2)
                dig = hashlib.md5(text.encode("utf-8")).digest()
                nbx = w // 8
                jpegs = []
                for f in range(k):
                    rgb = bytearray()
                    for y in range(h):
                        for x in range(w):
                            v = dig[((y // 8) * nbx + x // 8 + f) % 16]
                            rgb += bytes([v, v, v])
                    jpegs.append(encode_jpeg(bytes(rgb), w, h))
                ids.append(int(doc_id))
                payloads.append(encode_avi(jpegs, w, h))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "media_type": ["video/x-msvideo"] * len(ids),
                }
            )

    media = docs.mapInPandas(
        build, "doc_id long, payload binary, media_type string"
    )
    frames = sample_media_frames(media, "doc_id", every=2)
    joined = frames.join(
        F.broadcast(docs.select("doc_id", "text", "n_chars")), "doc_id"
    )

    def verify(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            ids, oks, nbytes = [], [], []
            for doc_id, frame_no, frame, text, n_chars in zip(
                pdf["doc_id"], pdf["frame_no"], pdf["frame"],
                pdf["text"], pdf["n_chars"],
            ):
                w = 8 * (1 + int(n_chars) % 3)
                h = 8 * (1 + int(n_chars) % 2)
                dig = hashlib.md5(text.encode("utf-8")).digest()
                nbx = w // 8
                exp = bytearray()
                for y in range(h):
                    for x in range(w):
                        v = dig[((y // 8) * nbx + x // 8 + int(frame_no)) % 16]
                        exp += bytes([v, v, v])
                ids.append(int(doc_id))
                oks.append(bytes(frame) == bytes(exp))
                nbytes.append(len(frame))
            yield pd.DataFrame(
                {"doc_id": ids, "ok": oks, "frame_bytes": nbytes}
            )

    checked = joined.mapInPandas(verify, "doc_id long, ok boolean, frame_bytes long")
    return checked.agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_frames_sampled"),
        F.sum(F.col("ok").cast("long")).cast("bigint").alias("n_frames_exact"),
        F.sum("frame_bytes").cast("bigint").alias("total_frame_bytes"),
    )


def _bpe_oracle_sql(n_merges: int, final_select: str | None = None) -> str:
    """Unrolled DuckDB oracle for text_bpe_train_merges: n_merges rounds
    of pair-count -> argmax -> merge, each AS MATERIALIZED (the k-core
    lesson: without it DuckDB inlines 2^rounds scans)."""
    parts = [
        """
    WITH toks AS MATERIALIZED (
      SELECT lower(t.tok) AS w, count(*) AS freq
      FROM documents, unnest(string_split(text, ' ')) t(tok)
      WHERE regexp_full_match(lower(t.tok), '[a-z]+')
      GROUP BY 1
    ),
    w0 AS MATERIALIZED (
      SELECT ' ' || array_to_string(
               list_append(list_transform(generate_series(1, length(w)),
                                          i -> substr(w, i, 1)), '</w>'),
               '  ') || ' ' AS syms,
             sum(freq) AS freq
      FROM toks GROUP BY 1
    )"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(f""",
    p{k} AS MATERIALIZED (
      SELECT arr[i] AS a, arr[i + 1] AS b, sum(freq) AS cnt
      FROM (SELECT string_split(trim(syms), '  ') AS arr, freq FROM w{k - 1}),
           unnest(generate_series(1, len(arr) - 1)) g(i)
      GROUP BY 1, 2
    ),
    b{k} AS MATERIALIZED (
      SELECT a, b, cnt FROM p{k} ORDER BY cnt DESC, a, b LIMIT 1
    ),
    w{k} AS MATERIALIZED (
      SELECT replace(w.syms, ' ' || b.a || '  ' || b.b || ' ',
                     ' ' || b.a || b.b || ' ') AS syms,
             sum(w.freq) AS freq
      FROM w{k - 1} w, b{k} b GROUP BY 1
    )""")
    if final_select is None:
        final_select = " UNION ALL ".join(
            f"SELECT {k} AS merge_rank, a || ' ' || b AS pair, a || b AS merged, "
            f"CAST(cnt AS BIGINT) AS pair_count FROM b{k}"
            for k in range(1, n_merges + 1)
        ) + " ORDER BY merge_rank"
    parts.append(f"\n    {final_select}")
    return "".join(parts)


@query("text_bpe_train_merges", oracle=_bpe_oracle_sql(8))
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al. 2016, public
    algorithm): 8 merge rounds over the corpus vocabulary — count
    adjacent symbol pairs weighted by word frequency, pick the argmax
    (ties broken lexicographically), merge it everywhere, repeat. The
    centerpiece of an LLM data pipeline's tokenizer stage, next to the
    BPE-ish regex token counter in text_token_stats.

    Engine-portable merge semantics: words are kept as symbol strings
    with every symbol wrapped in its own spaces (' s1  s2  s3 '), so a
    plain left-to-right string replace of ' a  b ' with ' ab ' merges
    non-overlapping occurrences with restart-after-merge on runs —
    byte-identical in Spark and DuckDB (verified: ' a  a  a  a ' ->
    ' aa  aa ' on both), and exactly the reference algorithm's greedy
    scan. No regex lookarounds (DuckDB's RE2 has none), no UDFs.

    Scale: the corpus is touched ONCE (token count -> vocabulary);
    every merge round runs on the aggregated (word, freq) frame, which
    is orders of magnitude smaller than the corpus at any SF (Heaps'
    law), so 8 rounds = 8 small shuffles + 8 one-row broadcast joins.
    The argmax is TakeOrdered(1) — never a global sort; the chosen pair
    reaches the merge step as a broadcast crossJoin (1-row combine),
    never a driver collect."""
    _words, bests = _bpe_train(spark, sf_dir, n_merges=8)
    out = bests[0]
    for b in bests[1:]:
        out = out.unionAll(b)
    return out.orderBy("merge_rank")


def _bpe_train(spark: SparkSession, sf_dir: str, n_merges: int):
    """Shared BPE scaffold: returns (post-merge (syms, freq) vocabulary
    frame, [per-round 1-row best-pair frames with merge_rank])."""
    t = load_tables(spark, sf_dir)
    toks = (
        fan_out(t["documents"])
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .select(F.lower("tok").alias("w"))
        .filter(F.col("w").rlike("^[a-z]+$"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    # Each merge round consumes `words` TWICE (pair count + merge), so
    # the lazy lineage doubles per round — the 8-round plan re-derived
    # the corpus vocabulary 2^8 = 256 times (measured: 255/256 parquet
    # scans in the formatted plan; the docstring's "corpus touched
    # once" held only per lineage path; 33 s at sf0.001). The fix must
    # TRUNCATE the plan, not just cache execution: a persist-only pin
    # measured WORSE (234 s) because Catalyst still analyzes and the
    # CacheManager still canonicalizes the exponentially-growing
    # logical tree every round. localCheckpoint replaces the lineage
    # with the materialized rows, keeping every round's plan O(1) deep
    # — 3.3-3.7 s at ALL SFs (the vocabulary frame is Heaps-law
    # bounded, so materializing it per round is a footnote at 100 TB).
    words = (
        toks.select(
            F.expr(
                "' ' || array_join(transform(sequence(1, length(w)), "
                "i -> substring(w, i, 1)) || array('</w>'), '  ') || ' '"
            ).alias("syms"),
            "freq",
        )
        .groupBy("syms")
        .agg(F.sum("freq").alias("freq"))
        .localCheckpoint()
    )
    pair_expr = (
        "CASE WHEN size(split(trim(syms), '  ')) >= 2 THEN "
        "transform(sequence(1, size(split(trim(syms), '  ')) - 1), "
        "i -> struct(element_at(split(trim(syms), '  '), i) AS a, "
        "element_at(split(trim(syms), '  '), i + 1) AS b)) "
        "ELSE array() END"
    )
    bests = []
    for k in range(1, n_merges + 1):
        pairs = (
            words.select(F.explode(F.expr(pair_expr)).alias("p"), "freq")
            .select("p.a", "p.b", "freq")
            .groupBy("a", "b")
            .agg(F.sum("freq").alias("cnt"))
        )
        # best has two consumers too (the output row and the merge's
        # broadcast side) — the 1-row checkpoint stops the pair chain
        # re-running and keeps the next round's plan lineage-free.
        best = (
            pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .localCheckpoint()
        )
        bests.append(
            best.select(
                F.lit(k).alias("merge_rank"),
                F.concat_ws(" ", "a", "b").alias("pair"),
                F.concat("a", "b").alias("merged"),
                F.col("cnt").cast("bigint").alias("pair_count"),
            )
        )
        words = (
            words.crossJoin(
                F.broadcast(best.select(F.col("a").alias("_a"), F.col("b").alias("_b")))
            )
            .select(
                F.expr(
                    "replace(syms, ' ' || _a || '  ' || _b || ' ', "
                    "' ' || _a || _b || ' ')"
                ).alias("syms"),
                "freq",
            )
            .groupBy("syms")
            .agg(F.sum("freq").alias("freq"))
            .localCheckpoint()
        )
    return words, bests


@query(
    "text_bpe_apply_vocabulary",
    oracle=_bpe_oracle_sql(
        8,
        final_select="""
    SELECT s.sym AS symbol, CAST(sum(freq) AS BIGINT) AS token_count
    FROM w8, unnest(string_split(trim(syms), '  ')) s(sym)
    GROUP BY 1 ORDER BY token_count DESC, symbol LIMIT 20
    """,
    ),
)
def text_bpe_apply_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLY stage: segment the corpus vocabulary with the
    8 learned merges (text_bpe_train_merges) and report the 20 most
    frequent resulting subword tokens — the vocabulary head a tokenizer
    build would persist. Shares the trainer's scaffold (_bpe_train), so
    training and application are one lineage, like the BM25 batch/
    streaming pair shares one scorer.

    Scale: application is a per-word chain of 8 constant replaces on
    the aggregated vocabulary frame; the head is TakeOrdered(20), never
    a global sort."""
    words, _bests = _bpe_train(spark, sf_dir, n_merges=8)
    return (
        words.select(
            F.explode(F.split(F.trim(F.col("syms")), "  ")).alias("symbol"),
            "freq",
        )
        .groupBy("symbol")
        .agg(F.sum("freq").cast("bigint").alias("token_count"))
        .orderBy(F.desc("token_count"), F.asc("symbol"))
        .limit(20)
    )


@query(
    "text_char_bigram_entropy",
    oracle="""
    WITH pairs AS (
      SELECT doc_id, substr(text, g.i, 2) AS bg
      FROM documents, unnest(generate_series(1, greatest(length(text) - 1, 0))) g(i)
    ),
    c AS (SELECT doc_id, bg, count(*) AS c FROM pairs GROUP BY 1, 2)
    SELECT doc_id,
           round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS bigram_entropy,
           CAST(sum(c) AS BIGINT) AS n_bigrams,
           CAST(count(*) AS BIGINT) AS n_distinct_bigrams
    FROM c GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_char_bigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram Shannon entropy per document — a perplexity-
    style quality signal (low entropy = repetitive/degenerate text,
    the classic pre-training filter next to text_quality_scores).
    Identity used: -Σ (c/T)·log2(c/T) = log2(T) - Σ c·log2(c) / T, so
    one aggregation computes it without a second pass for totals."""
    t = load_tables(spark, sf_dir)
    pairs = fan_out(t["documents"]).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(text)-1, 0)),"
                " i -> substring(text, i, 2))"
            )
        ).alias("bg"),
    )
    counts = pairs.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.round(
                F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c"), 6
            ).alias("bigram_entropy"),
            F.sum("c").cast("bigint").alias("n_bigrams"),
            F.count("*").cast("bigint").alias("n_distinct_bigrams"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_corpus_token_freq",
    oracle="""
    WITH toks AS (
      SELECT unnest(str_split(text, ' ')) AS tok FROM documents
    ),
    c AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok)
    SELECT tok, n, round(n * 1.0 / sum(n) OVER (), 6) AS share,
           CAST(row_number() OVER (ORDER BY n DESC, tok) AS INT) AS rank
    FROM c
    ORDER BY rank LIMIT 20
    """,
)
def text_corpus_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level token frequency (Zipf profile): global top-20
    tokens with corpus share. The explode+groupBy is the map-side-
    combined wordcount. Web-scale vocabulary is billions of distinct
    tokens, so no unpartitioned window anywhere: the corpus total is a
    scalar aggregate broadcast back (1-row crossJoin), the top-20 is
    ``orderBy().limit(20)`` (plans as TakeOrderedAndProject), and the
    rank INSIDE the 20 survivors is a 20x20 broadcast self-comparison
    (count of strictly-better rows + 1) — deterministic because the
    (n DESC, tok ASC) order is total. Zero WindowExec in the plan."""
    from postrack_spark.session import pin_small

    t = load_tables(spark, sf_dir)
    toks = fan_out(t["documents"]).select(F.explode(F.split("text", " ")).alias("tok"))
    # the vocabulary-bounded count frame feeds the corpus total AND the
    # top-20 pick, and the 20-row top frame feeds both sides of the
    # rank self-comparison — pinned: one corpus explode, not 4.
    counts = pin_small(
        "ctf_counts", toks.groupBy("tok").agg(F.count("*").alias("n"))
    )
    total = counts.groupBy().agg(F.sum("n").alias("__total"))
    top = pin_small(
        "ctf_top",
        counts.crossJoin(F.broadcast(total))  # 1-row summary combine
        .withColumn("share", F.round(F.col("n") / F.col("__total"), 6))
        .drop("__total")
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(20),
    )
    better = (F.col("b.n") > F.col("a.n")) | (
        (F.col("b.n") == F.col("a.n")) & (F.col("b.tok") < F.col("a.tok"))
    )
    return (
        top.alias("a")
        .join(F.broadcast(top.alias("b")), better, "left")
        .groupBy(
            F.col("a.tok").alias("tok"),
            F.col("a.n").alias("n"),
            F.col("a.share").alias("share"),
        )
        .agg((F.count(F.col("b.tok")) + 1).cast("int").alias("rank"))
        .orderBy("rank")
    )


@query(
    "text_lexicon_polarity",
    oracle="""
    WITH t AS (
      SELECT doc_id, str_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(toks, x -> list_contains(['fast','small','value'], x))) AS INT) AS n_pos,
           CAST(len(list_filter(toks, x -> list_contains(['slow','big','error','dup'], x))) AS INT) AS n_neg,
           round((len(list_filter(toks, x -> list_contains(['fast','small','value'], x)))
                - len(list_filter(toks, x -> list_contains(['slow','big','error','dup'], x))))
                * 1.0 / len(toks), 6) AS polarity
    FROM t
    ORDER BY doc_id
    """,
)
def text_lexicon_polarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based polarity scoring (the distributed sentiment recipe
    of the EDBT 2016 Spark sentiment paper, PAPERS.md: tokenize, count
    lexicon hits, normalize by length) — pure higher-order built-ins,
    no Python on the hot path; swapping in a real sentiment lexicon is
    a data change, not a code change."""
    pos = F.array(*[F.lit(w) for w in ["fast", "small", "value"]])
    neg = F.array(*[F.lit(w) for w in ["slow", "big", "error", "dup"]])
    t = load_tables(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n_pos = F.size(F.filter(toks, lambda x: F.array_contains(pos, x)))
    n_neg = F.size(F.filter(toks, lambda x: F.array_contains(neg, x)))
    return (
        t["documents"]
        .select(
            "doc_id",
            n_pos.alias("n_pos"),
            n_neg.alias("n_neg"),
            F.round((n_pos - n_neg) / F.size(toks), 6).alias("polarity"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_chunk_documents",
    oracle="""
    WITH t AS (
      SELECT doc_id, str_split(text, ' ') AS toks, len(str_split(text, ' ')) AS n
      FROM documents
    ),
    chunks AS (
      SELECT doc_id, g.c AS chunk_id,
             toks[g.c * 24 + 1 : least(g.c * 24 + 32, n)] AS chunk
      FROM t, unnest(generate_series(0, CAST(ceil(greatest(n - 8, 1) / 24.0) AS BIGINT) - 1)) g(c)
    )
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           CAST(len(chunk) AS INT) AS n_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_hash
    FROM chunks
    ORDER BY doc_id, chunk_id
    """,
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data chunking: split each document into 32-token chunks
    with 8-token overlap (stride 24) — the inverse of sequence packing
    and the standard pre-tokenization step for long documents. Chunk
    boundaries via sequence + slice (JVM-side), one explode, chunk
    content value-checked by md5. Chunk count per doc is
    ceil(max(n-overlap,1)/stride), so a doc shorter than one chunk
    still yields exactly one (possibly short) chunk."""
    t = load_tables(spark, sf_dir)
    size, stride = 32, 24
    d = fan_out(t["documents"]).select(
        "doc_id", F.split("text", " ").alias("toks"), F.size(F.split("text", " ")).alias("n")
    )
    n_chunks = F.ceil(F.greatest(F.col("n") - (size - stride), F.lit(1)) / F.lit(stride))
    chunks = d.select(
        "doc_id",
        "n",
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks.cast("long") - 1)).alias("chunk_id"),
    ).select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.slice(
            F.col("toks"),
            F.col("chunk_id") * stride + 1,
            F.least(
                F.lit(size),
                F.col("n") - F.col("chunk_id") * stride,
            ),
        ).alias("chunk"),
    )
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.size("chunk").alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.col("chunk"))).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_id")


@query(
    "text_pii_redaction",
    oracle=r"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact: u' || doc_id || '@example.com phone 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(t, '555-[0-9]{4}')) AS INT) AS n_phones,
           md5(regexp_replace(regexp_replace(t, '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
               '555-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
    FROM aug
    ORDER BY doc_id
    """,
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (the standard pre-training redaction pass):
    detect + replace email/phone patterns, with the redacted text
    value-checked by md5. The corpus has no organic PII, so
    deterministic synthetic markers are appended per doc — the
    detect/redact machinery is what's under test. Patterns stay in the
    Java-regex/RE2-agreeing subset."""
    t = load_tables(spark, sf_dir)
    aug = F.concat(
        F.col("text"),
        F.lit(" contact: u"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com phone 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    email, phone = r"[a-z0-9]+@[a-z]+\.[a-z]+", r"555-[0-9]{4}"
    d = t["documents"].select("doc_id", aug.alias("t"))
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(email), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(phone), 0)).alias("n_phones"),
        F.md5(
            F.regexp_replace(F.regexp_replace("t", email, "<EMAIL>"), phone, "<PHONE>")
        ).alias("redacted_md5"),
    ).orderBy("doc_id")


@query(
    "text_bigram_lm_scores",
    oracle="""
    WITH toks AS (
      SELECT doc_id, str_split(text, ' ') AS w FROM documents
    ),
    bigrams AS (
      SELECT doc_id, w[g.i] AS w1, w[g.i + 1] AS w2
      FROM toks, unnest(generate_series(1, len(w) - 1)) g(i)
    ),
    lm AS (
      SELECT w1, w2, count(*) AS c2, sum(count(*)) OVER (PARTITION BY w1) AS c1
      FROM bigrams GROUP BY w1, w2
    ),
    scored AS (
      SELECT b.doc_id,
             CAST(round((log2(lm.c2) - log2(lm.c1)) * 1000000) AS BIGINT) AS micro
      FROM bigrams b JOIN lm ON lm.w1 = b.w1 AND lm.w2 = b.w2
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           floor(sum(micro) * 1.0 / count(*) / 100.0) / 10000.0 AS avg_log2p
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality scoring against a corpus bigram LM
    (the CCNet-recipe filter): per-doc average log2 P(w_i | w_{i-1})
    where the LM is estimated from the corpus itself. Per-bigram log
    scores are integerized to micro-units before summation so the
    aggregate is association-independent across engines (the same
    exact-integer discipline as events_ewma_daily), and the final
    average is floor-truncated. The LM table is vocabulary-sized —
    broadcast-joined, never shuffling the corpus."""
    t = load_tables(spark, sf_dir)
    toks = fan_out(t["documents"]).select("doc_id", F.split("text", " ").alias("w"))
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS w1, w[i] AS w2))")
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    lm = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
        .withColumn("c1", F.sum("c2").over(Window.partitionBy("w1")))
    )
    scored = bigrams.join(F.broadcast(lm), ["w1", "w2"]).select(
        "doc_id",
        F.round((F.log2("c2") - F.log2("c1")) * 1000000).cast("bigint").alias("micro"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            (F.floor(F.sum("micro") * 1.0 / F.count("*") / 100.0) / 10000.0).alias(
                "avg_log2p"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "text_grouped_pandas_profile",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS ids_md5
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def text_grouped_pandas_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map surface (groupBy().applyInPandas): per-source stats
    computed inside an Arrow-batched pandas function — the batch twin
    of the streaming applyInPandasWithState operators. The md5 of the
    sorted id list value-checks the Python path byte-for-byte. Use
    this shape only when per-group logic genuinely needs pandas; the
    aggregations here COULD be built-ins — the point is certifying the
    grouped Python path against the same oracle discipline."""
    import hashlib

    import pandas as pd

    def profile(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(int(x) for x in pdf["doc_id"])
        joined = ",".join(str(i) for i in ids)
        return pd.DataFrame(
            {
                "source": [pdf["source"].iloc[0]],
                "n_docs": [len(pdf)],
                "total_chars": [int(pdf["n_chars"].sum())],
                "ids_md5": [hashlib.md5(joined.encode()).hexdigest()],
            }
        )

    t = load_tables(spark, sf_dir)
    schema = "source string, n_docs bigint, total_chars bigint, ids_md5 string"
    return (
        fan_out(t["documents"])
        .select("source", "doc_id", "n_chars")
        .groupBy("source")
        .applyInPandas(profile, schema)
        .orderBy("source")
    )


@query(
    "text_length_histogram",
    oracle="""
    SELECT CAST(CASE WHEN n_chars < 0 THEN 0
                     WHEN n_chars >= 600 THEN 13
                     ELSE CAST(floor(n_chars / 50.0) AS INT) + 1 END AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY 1
    ORDER BY bucket
    """,
)
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length profiling: width_bucket histogram of document
    sizes (12 × 50-char buckets over [0, 600), under/overflow in
    buckets 0 and 13) — the distribution check run before picking
    chunking/packing parameters. The oracle mirrors width_bucket with
    explicit floor arithmetic."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .groupBy(
            F.width_bucket(F.col("n_chars"), F.lit(0), F.lit(600), F.lit(12))
            .cast("int")
            .alias("bucket")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
        .orderBy("bucket")
    )


@query(
    "text_repetition_filter",
    oracle="""
    WITH words AS (SELECT doc_id AS doc, string_split(text, ' ') AS w FROM documents),
    tri AS (
      SELECT doc, concat_ws(' ', w[i], w[i+1], w[i+2]) AS g
      FROM words, unnest(generate_series(1, len(w) - 2)) AS t(i)
    ),
    cnt AS (SELECT doc, g, count(*) AS c FROM tri GROUP BY doc, g),
    per AS (
      SELECT doc, CAST(sum(c) AS BIGINT) AS n_tri,
             CAST(count(*) AS BIGINT) AS d_tri,
             CAST(max(c) AS BIGINT) AS m_tri
      FROM cnt GROUP BY doc
    )
    SELECT doc AS doc_id, n_tri, m_tri,
           round(m_tri * 1.0 / n_tri, 6) AS top_frac,
           round(1 - d_tri * 1.0 / n_tri, 6) AS dup_frac,
           CAST(CASE WHEN m_tri * 1.0 / n_tri <= 0.1
                      AND 1 - d_tri * 1.0 / n_tri <= 0.2
                     THEN 1 ELSE 0 END AS INT) AS keep
    FROM per
    ORDER BY doc_id
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition screening: per doc, the fraction of
    trigrams taken by the single most frequent trigram (top_frac) and
    the duplicate-trigram fraction (dup_frac) — the two strongest
    boilerplate/spam signals in the Gopher quality rules. `keep` is the
    filter verdict. Counts stay integers until one final division, so
    the ratios are bit-identical cross-engine. Scale: explode ->
    two-level hash agg, partial-agg compacted before each exchange."""
    t = load_tables(spark, sf_dir)
    grams = F.expr(
        "CASE WHEN size(__w) >= 3 THEN transform(sequence(1, size(__w) - 2),"
        " i -> concat_ws(' ', __w[i-1], __w[i], __w[i+1]))"
        " ELSE array() END"
    )
    tri = (
        fan_out(t["documents"])
        .withColumn("__w", F.split("text", " "))
        .select(F.col("doc_id").alias("doc"), F.explode(grams).alias("g"))
    )
    per = (
        tri.groupBy("doc", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc")
        .agg(
            F.sum("c").cast("bigint").alias("n_tri"),
            F.count("*").cast("bigint").alias("d_tri"),
            F.max("c").cast("bigint").alias("m_tri"),
        )
    )
    top = F.col("m_tri") / F.col("n_tri")
    dup = F.lit(1) - F.col("d_tri") / F.col("n_tri")
    return per.select(
        F.col("doc").alias("doc_id"),
        "n_tri",
        "m_tri",
        F.round(top, 6).alias("top_frac"),
        F.round(dup, 6).alias("dup_frac"),
        F.when((top <= 0.1) & (dup <= 0.2), 1).otherwise(0).cast("int").alias("keep"),
    ).orderBy("doc_id")


@query(
    "multimodal_audio_energy",
    oracle="""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
      FROM documents
    ),
    bytes AS (
      SELECT doc_id, ((t.i - 1) // 16) AS win,
             ('0x' || substr(h, 2*t.i - 1, 2))::BIGINT AS v
      FROM b, unnest(generate_series(1, n)) t(i)
    ),
    w AS (SELECT doc_id, win, sum(v * v) AS e FROM bytes GROUP BY doc_id, win)
    SELECT doc_id, CAST(count(*) AS INT) AS n_windows,
           CAST(sum(e) AS BIGINT) AS total_energy,
           CAST(max(e) AS BIGINT) AS peak_energy
    FROM w GROUP BY doc_id ORDER BY doc_id
    """,
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-shaped multimodal pass: decoded bytes as u8 samples,
    16-sample windowed energy (sum of squares) per asset via
    mapInPandas — exact integers end to end, so the Arrow-batched
    Python path is hash-checked against the oracle's hex-slice
    recomputation (like the image/video stubs, the real codec slots
    into decode_media without changing the Spark plumbing)."""
    from postrack_spark.operators.multimodal import attach_payload, audio_window_energy

    t = load_tables(spark, sf_dir)
    media = attach_payload(fan_out(t["documents"]), "text", "text/plain")
    return audio_window_energy(media, "doc_id", window=16).orderBy("doc_id")


@query(
    "text_ngram_novelty",
    oracle="""
    WITH words AS (SELECT doc_id AS doc, string_split(text, ' ') AS w FROM documents),
    tri AS (
      SELECT DISTINCT doc, concat_ws(' ', w[i], w[i+1], w[i+2]) AS g
      FROM words, unnest(generate_series(1, len(w) - 2)) AS t(i)
    ),
    first_seen AS (SELECT g, min(doc) AS first_doc FROM tri GROUP BY g),
    per_doc AS (
      SELECT t.doc,
             CAST(count(*) AS BIGINT) AS n_tri,
             CAST(sum(CASE WHEN f.first_doc = t.doc THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel
      FROM tri t JOIN first_seen f ON f.g = t.g
      GROUP BY t.doc
    ),
    deciles AS (
      SELECT CAST(ntile(10) OVER (ORDER BY doc) AS INT) AS decile, n_tri, n_novel
      FROM per_doc
    )
    SELECT decile,
           CAST(sum(n_tri) AS BIGINT) AS n_trigrams,
           CAST(sum(n_novel) AS BIGINT) AS n_novel,
           round(sum(n_novel) * 1.0 / sum(n_tri), 6) AS novelty_rate
    FROM deciles
    GROUP BY decile
    ORDER BY decile
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty curve: processing docs in id order, what fraction
    of each decile's distinct trigrams was never seen in any earlier
    doc — the saturation diagnostic for data collection (novelty decay
    means new data stops adding information). first-seen attribution is
    a min-per-trigram aggregate joined back (no ordered scan state);
    integer counts, one division per decile row. Scale: two hash aggs
    on trigram / doc keys; deciles via operators/ranking.exact_ntile
    (range-partitioned distributed rank — the per-doc frame is
    corpus-sized at 100 TB, so no unpartitioned ntile window; zero
    WindowExec in the plan, asserted by tests/test_plans.py)."""
    t = load_tables(spark, sf_dir)
    grams = F.expr(
        "CASE WHEN size(__w) >= 3 THEN transform(sequence(1, size(__w) - 2),"
        " i -> concat_ws(' ', __w[i-1], __w[i], __w[i+1]))"
        " ELSE array() END"
    )
    tri = (
        fan_out(t["documents"])
        .withColumn("__w", F.split("text", " "))
        .select(F.col("doc_id").alias("doc"), F.explode(F.array_distinct(grams)).alias("g"))
    )
    first_seen = tri.groupBy("g").agg(F.min("doc").alias("first_doc"))
    per_doc = (
        tri.join(first_seen, "g")
        .groupBy("doc")
        .agg(
            F.count("*").cast("bigint").alias("n_tri"),
            F.sum(F.when(F.col("first_doc") == F.col("doc"), 1).otherwise(0))
                .cast("bigint").alias("n_novel"),
        )
    )
    from postrack_spark.operators.ranking import exact_ntile

    deciles = exact_ntile(per_doc, 10, [F.asc("doc")], "decile")
    return (
        deciles.groupBy("decile")
        .agg(
            F.sum("n_tri").cast("bigint").alias("n_trigrams"),
            F.sum("n_novel").cast("bigint").alias("n_novel"),
            F.round(F.sum("n_novel") / F.sum("n_tri"), 6).alias("novelty_rate"),
        )
        .orderBy("decile")
    )


@query(
    "text_tfidf_keywords",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, tok
    ),
    df AS (
      SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY tok
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok, tf.tf, df.df,
             (tf.tf * 1000000 * n.n_docs) // df.df AS score_micro
      FROM tf JOIN df USING (tok) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, tok, tf, df, score_micro,
             CAST(row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score_micro DESC, tok) AS INT) AS rank
      FROM scored
    )
    SELECT doc_id, tok, tf, df, score_micro, rank
    FROM ranked WHERE rank <= 3
    ORDER BY doc_id, rank
    """,
)
def text_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction by TF-IDF: top-3 tokens per doc
    scored tf * N / df, computed ENTIRELY in integer micro-units
    (score_micro = tf * 1e6 * N // df) — no ln(), so the score is
    bit-exact cross-engine (libm log differs in the last ulp between
    engines; a ratio ranking is order-equivalent to log-idf ranking for
    fixed tf... and exactly reproducible). Scale: two hash aggs (tf per
    (doc, tok), df per tok), one vocab-keyed shuffle join, a 1-row N
    broadcast, and a per-doc top-3 window (partitioned — bounded
    state). Integer headroom: tf * 1e6 * N needs ~60 bits at 1e10 docs
    with tf <= 1e3; rescale the micro factor at larger corpora."""
    t = load_tables(spark, sf_dir)
    toks = fan_out(t["documents"]).select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").cast("bigint").alias("tf"))
    # df as a per-token window count OVER tf (tf has exactly one row
    # per (doc, tok), so count(*) per tok = distinct docs): one corpus
    # explode + one extra token-keyed exchange instead of a SECOND
    # full explode pass + a vocab join (3 document scans before, 2
    # after — the remaining two are the tf explode and the 1-row N).
    w_tok = Window.partitionBy("tok")
    n = t["documents"].groupBy().agg(F.count("*").cast("bigint").alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count("*").over(w_tok).cast("bigint"))
        .crossJoin(F.broadcast(n))  # 1-row corpus size
        .withColumn(
            "score_micro",
            F.expr("(tf * 1000000 * n_docs) div df"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_micro"), F.asc("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "tok", "tf", "df", "score_micro", "rank")
        .orderBy("doc_id", "rank")
    )


@query(
    "text_bm25_retrieval",
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
    scored AS (
      SELECT tf.doc_id, tf.tok,
             -- idf_micro = 1e6 * (2N - 2df + 1) // (2df + 1)
             -- tf-part   = 44*L*tf // (20*L*tf + 6*L + 18*dl*N)  (k1=1.2, b=0.75)
             ((1000000 * (2*c.n_docs - 2*df.df + 1)) // (2*df.df + 1))
               * (44 * c.total_len * tf.tf)
               // (20 * c.total_len * tf.tf + 6 * c.total_len + 18 * dl.dl * c.n_docs)
               AS term_score_micro
      FROM tf JOIN df USING (tok) JOIN dl USING (doc_id) CROSS JOIN corpus c
    ),
    agg AS (
      SELECT doc_id, CAST(sum(term_score_micro) AS BIGINT) AS bm25_micro,
             CAST(count(*) AS BIGINT) AS n_terms_hit
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, bm25_micro, n_terms_hit
    FROM agg
    ORDER BY bm25_micro DESC, doc_id
    LIMIT 10
    """,
)
def text_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval (k1=1.2, b=0.75) for the fixed query
    {fast, value, error}: top-10 documents by summed per-term score.
    All arithmetic is STAGED INTEGER math — idf as the rational
    (N - df + .5)/(df + .5) in micro-units, the tf saturation as
    44*L*tf / (20*L*tf + 6*L + 18*dl*N) with L = total corpus tokens —
    so every engine computes the identical bigint (floor divisions are
    exact; no libm). Scale: the tf/df aggs PRE-FILTER to the query
    terms (predicate inside the scan stage), the per-doc length table
    joins on doc_id, corpus stats broadcast as one row, and the top-10
    is orderBy().limit() = TakeOrderedAndProject. Headroom: the
    numerator needs ~63 bits when L*tf ~ 1e14; shrink the micro factor
    for larger corpora."""
    from postrack_spark.session import pin_small

    t = load_tables(spark, sf_dir)
    terms = ["fast", "value", "error"]
    docs = fan_out(t["documents"])
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok").isin(terms)
    )
    dl = pin_small(
        "bm25r_dl",
        docs.select(
            "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("dl")
        ),
    )
    corpus = dl.groupBy().agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
    )
    # tf is bounded by the 3-term query vocabulary; df derives from it
    # (one row per (doc, tok) means count(*) per tok = distinct docs),
    # and dl feeds both the score join and the corpus stats — pinned:
    # 2 document scans instead of 4.
    tf = pin_small(
        "bm25r_tf",
        toks.groupBy("doc_id", "tok").agg(F.count("*").cast("bigint").alias("tf")),
    )
    df = tf.groupBy("tok").agg(F.count("*").cast("bigint").alias("df"))
    scored = (
        tf.join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "term_score_micro",
            F.expr(
                "((1000000 * (2*n_docs - 2*df + 1)) div (2*df + 1))"
                " * (44 * total_len * tf)"
                " div (20 * total_len * tf + 6 * total_len + 18 * dl * n_docs)"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("term_score_micro").cast("bigint").alias("bm25_micro"),
            F.count("*").cast("bigint").alias("n_terms_hit"),
        )
        .orderBy(F.desc("bm25_micro"), F.asc("doc_id"))
        .limit(10)
    )


@query(
    "quality_auc_exact",
    oracle="""
    WITH per_doc AS (
      SELECT length(text) AS score,
             CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS pos
      FROM documents
    ),
    by_score AS (
      SELECT score, CAST(sum(pos) AS BIGINT) AS pos_s,
             CAST(count(*) - sum(pos) AS BIGINT) AS neg_s
      FROM per_doc GROUP BY score
    ),
    cum AS (
      SELECT *, CAST(COALESCE(SUM(neg_s) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS neg_below
      FROM by_score
    ),
    tot AS (
      SELECT CAST(sum(pos_s) AS BIGINT) AS n_pos,
             CAST(sum(neg_s) AS BIGINT) AS n_neg,
             CAST(sum(pos_s * (2 * neg_below + neg_s)) AS BIGINT) AS auc_num2
      FROM cum
    )
    SELECT n_pos, n_neg, auc_num2,
           CAST(2 * n_pos * n_neg AS BIGINT) AS auc_den2,
           CAST((1000000 * auc_num2) // (2 * n_pos * n_neg) AS BIGINT) AS auc_ppm
    FROM tot
    """,
)
def quality_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC-AUC of a classifier score against binary labels — the
    Mann-Whitney U formulation with the standard tie correction
    (AUC = Σ_s pos_s·(neg_below_s + ½·neg_s) / (P·N)), computed as an
    exact integer rational (numerator/denominator doubled to stay
    integral; auc_ppm = floor(1e6·AUC) for a readable scalar). Score =
    doc length, labels = deterministic doc_id rule — the machinery is
    what matters: evaluating quality-classifier checkpoints over a
    full corpus.

    Scale shape: one hash aggregation to per-score (pos, neg) counts
    (frame bounded by DISTINCT SCORES, but a continuous score makes
    that corpus-sized, so no global window is allowed) — then the
    distributed prefix sum (operators/ranking.prefix_sum_by_key: range
    shuffle, per-partition windows only, config-bounded broadcast
    offsets) for the cumulative-negatives term, and a scalar agg. All
    integer arithmetic end to end; at extreme corpus sizes the
    num/den products need decimal(38) headroom (documented, not hit at
    driver SFs)."""
    from postrack_spark.operators.ranking import prefix_sum_by_key

    docs = load_tables(spark, sf_dir)["documents"]
    per = docs.select(
        F.length("text").cast("long").alias("score"),
        (F.col("doc_id") % 3 == 0).cast("long").alias("pos"),
    )
    by_score = per.groupBy("score").agg(
        F.sum("pos").cast("long").alias("pos_s"),
        (F.count("*") - F.sum("pos")).cast("long").alias("neg_s"),
    )
    cum = prefix_sum_by_key(
        by_score, [F.asc("score")], "neg_s", "neg_below", inclusive=False
    )
    tot = cum.agg(
        F.sum("pos_s").cast("long").alias("n_pos"),
        F.sum("neg_s").cast("long").alias("n_neg"),
        F.sum(F.col("pos_s") * (2 * F.col("neg_below") + F.col("neg_s")))
        .cast("long")
        .alias("auc_num2"),
    )
    return tot.select(
        "n_pos",
        "n_neg",
        "auc_num2",
        (2 * F.col("n_pos") * F.col("n_neg")).cast("long").alias("auc_den2"),
        F.expr("1000000 * auc_num2 DIV (2 * n_pos * n_neg)")
        .cast("long")
        .alias("auc_ppm"),
    )


@query(
    "quality_calibration_bins",
    oracle="""
    WITH per_doc AS (
      SELECT (length(text) % 1000) * 1000 AS pred_ppm,
             CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS pos
      FROM documents
    )
    SELECT CAST(pred_ppm // 100000 AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(pos) AS BIGINT) AS n_pos,
           CAST(sum(pred_ppm) // count(*) AS BIGINT) AS mean_pred_ppm,
           CAST((sum(pos) * 1000000) // count(*) AS BIGINT) AS obs_ppm
    FROM per_doc
    GROUP BY 1
    ORDER BY bin
    """,
)
def quality_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier CALIBRATION (reliability diagram): bucket predicted
    probabilities into 10 equal-width bins and compare mean predicted
    vs observed positive rate per bin — the companion diagnostic to
    quality_auc_exact (AUC measures ranking; calibration measures
    probability quality). Predictions/labels are deterministic
    stand-ins; the machinery is per-bin integer-exact rates (ppm via
    integer floor division — no fp cross-engine drift). One map-side
    projection + one hash aggregation over 10 groups; embarrassingly
    scalable."""
    docs = load_tables(spark, sf_dir)["documents"]
    per = docs.select(
        ((F.length("text") % 1000) * 1000).cast("long").alias("pred_ppm"),
        (F.col("doc_id") % 3 == 0).cast("long").alias("pos"),
    )
    return (
        per.groupBy(F.expr("pred_ppm DIV 100000").cast("long").alias("bin"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("pos").cast("long").alias("n_pos"),
            F.expr("sum(pred_ppm) DIV count(*)").cast("long").alias("mean_pred_ppm"),
            F.expr("(sum(pos) * 1000000) DIV count(*)").cast("long").alias("obs_ppm"),
        )
        .orderBy("bin")
    )


@query(
    "text_source_gini",
    oracle="""
    WITH r AS (
      SELECT source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS i
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(2 * sum(i * n_chars) - (count(*) + 1) * sum(n_chars) AS BIGINT)
             AS gini_num,
           CAST(count(*) * sum(n_chars) AS BIGINT) AS gini_den
    FROM r
    GROUP BY source
    ORDER BY source
    """,
)
def text_source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED Gini: per-source inequality of document sizes — the
    curation diagnostic for 'is one crawl source dominated by a few
    huge documents?'. Within-group ranks ride a PARTITIONED window
    (one shuffle on source; each window task sees one source), then
    the same integer-exact Gini identity as agg_gini_exact per group."""
    docs = load_tables(spark, sf_dir)["documents"]
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    r = docs.select(
        "source", F.col("n_chars").cast("long").alias("n_chars"), "doc_id"
    ).withColumn("i", F.row_number().over(w).cast("long"))
    agg = r.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(F.col("i") * F.col("n_chars")).cast("long").alias("iwx"),
    )
    n, sx = F.col("n_docs"), F.col("total_chars")
    return agg.select(
        "source", "n_docs", "total_chars",
        (2 * F.col("iwx") - (n + 1) * sx).cast("long").alias("gini_num"),
        (n * sx).cast("long").alias("gini_den"),
    ).orderBy("source")


_BM25_TERMS = {
    "q1": ["spark", "join", "window"],
    "q2": ["hash", "agg", "scan"],
    "q3": ["stream", "batch", "merge"],
}
_BM25_ALL = sorted({t for ts in _BM25_TERMS.values() for t in ts})
_BM25_QT_VALUES = ", ".join(
    f"('{q}', '{t}')" for q, ts in sorted(_BM25_TERMS.items()) for t in ts
)
_BM25_IN = ", ".join(f"'{t}'" for t in _BM25_ALL)


_BM25_ORACLE = f"""
    WITH docs0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(w)) AS BIGINT) AS total_tokens
      FROM docs0
    ),
    toks AS (SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM docs0),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, CAST(max(dl) AS BIGINT) AS dl
      FROM toks WHERE term IN ({_BM25_IN})
      GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS dfreq FROM tf GROUP BY term),
    qt AS (SELECT * FROM (VALUES {_BM25_QT_VALUES}) v(query_id, term)),
    contrib AS (
      SELECT qt.query_id, tf.doc_id,
             CAST(floor((1000000.0
                         * ln((CAST(s.n_docs - d.dfreq AS DOUBLE) + 0.5)
                              / (CAST(d.dfreq AS DOUBLE) + 0.5) + 1.0))
                        * ((CAST(tf.tf AS DOUBLE) * 2.2)
                           / (CAST(tf.tf AS DOUBLE)
                              + 1.2 * (0.25 + 0.75 * (CAST(tf.dl AS DOUBLE)
                                   / (CAST(s.total_tokens AS DOUBLE)
                                      / CAST(s.n_docs AS DOUBLE)))))))
                  AS BIGINT) AS c
      FROM tf JOIN qt USING (term) JOIN dfreq d USING (term) CROSS JOIN stats s
    ),
    scores AS (
      SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_micro
      FROM contrib GROUP BY query_id, doc_id
    ),
    ranked AS (
      SELECT query_id, doc_id, score_micro,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_micro DESC, doc_id) AS rn
      FROM scores
    )
    SELECT query_id, CAST(rn AS INT) AS rn, doc_id, score_micro
    FROM ranked WHERE rn <= 5
    ORDER BY query_id, rn
    """


@query("text_bm25_search", oracle=_BM25_ORACLE)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (k1=1.2, b=0.75): three fixed multi-term
    queries ranked against the corpus — the sparse-retrieval side of a
    RAG / decontamination pipeline next to the dense ANN family. Scale
    shape: tokens are filtered to the query vocabulary BEFORE the
    (doc, term) shuffle, so the tf relation is O(matching tokens) not
    O(corpus tokens); document frequencies and the query-term list are
    tiny broadcasts; corpus stats (N, avgdl) are a 1-row broadcast
    combine; top-5 per query is a window PARTITIONED by query. Each
    (query, doc, term) contribution is floored to integer micros
    before summation, so per-(query,doc) scores are exact integers —
    association order never reaches the comparison (ln() itself is
    assumed libm-identical cross-engine; a last-ulp disagreement would
    have to land within 1e-10 of a micro boundary to surface)."""
    docs = load_tables(spark, sf_dir)["documents"]
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("dl"),
        F.explode(F.split(F.col("text"), " ")).alias("term"),
    ).filter(F.col("term").isin(_BM25_ALL))
    from postrack_spark.session import pin_small

    # tf is O(query-vocabulary matches) — bounded by the fixed term
    # list — and feeds both the document-frequency aggregate and the
    # scorer; pinned so the corpus scan + explode runs once.
    tf = pin_small(
        "bm25_tf",
        toks.groupBy("doc_id", "term").agg(
            F.count("*").cast("long").alias("tf"), F.max("dl").cast("long").alias("dl")
        ),
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("dfreq"))
    stats = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("total_tokens"),
    )
    return bm25_topk(spark, tf, dfreq, stats)


def bm25_topk(spark, tf, dfreq, stats, k: int = 5) -> DataFrame:
    """Score the fixed _BM25_TERMS queries against a (tf, dfreq, stats)
    index triple and return top-k per query — shared by the batch query
    above and the streaming index twin (streaming_bm25_index), which
    feeds the SAME scorer from an incrementally maintained view."""
    qt = spark.createDataFrame(
        [(q, t) for q, ts in sorted(_BM25_TERMS.items()) for t in ts],
        "query_id string, term string",
    )
    idf = F.log(
        ((F.col("n_docs") - F.col("dfreq")).cast("double") + F.lit(0.5))
        / (F.col("dfreq").cast("double") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfn = (F.col("tf").cast("double") * F.lit(2.2)) / (
        F.col("tf").cast("double")
        + F.lit(1.2)
        * (
            F.lit(0.25)
            + F.lit(0.75)
            * (
                F.col("dl").cast("double")
                / (F.col("total_tokens").cast("double") / F.col("n_docs").cast("double"))
            )
        )
    )
    contrib = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))  # 1-row scalar combine
        .select(
            "query_id",
            "doc_id",
            F.floor(F.lit(1000000.0) * idf * tfn).cast("long").alias("c"),
        )
    )
    scores = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("c").cast("long").alias("score_micro")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_micro"), F.asc("doc_id"))
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "rn", "doc_id", "score_micro")
        .orderBy("query_id", "rn")
    )


@query(
    "text_inverted_index",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    tf AS (
      SELECT token, doc_id, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE token <> '' GROUP BY token, doc_id
    ),
    ranked AS (
      SELECT token, doc_id, tf,
             row_number() OVER (PARTITION BY token
                                ORDER BY tf DESC, doc_id) AS rn
      FROM tf
    ),
    stats AS (
      SELECT token, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(tf) AS BIGINT) AS tf_total
      FROM tf GROUP BY token
    )
    SELECT s.token, s.df, s.tf_total,
           string_agg(r.doc_id::VARCHAR, ',' ORDER BY r.rn) AS top_docs
    FROM stats s JOIN ranked r ON r.token = s.token AND r.rn <= 3
    WHERE s.df >= 5
    GROUP BY s.token, s.df, s.tf_total
    ORDER BY s.token
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction — the posting-list build behind
    every lexical retrieval system (and the precursor the BM25 pair
    consumes): token -> document frequency, total term frequency, and
    the head of the posting list (top-3 docs by tf) rendered in rank
    order. Shape is the classic two-level reduce: explode tokens ->
    groupBy (token, doc) for tf (map-side combinable — the corpus-
    sized shuffle), then token-level stats and a PARTITIONED rank
    window to cap the posting head BEFORE the string aggregation
    (never listagg an unbounded posting list — the agg_listagg rule).
    The df >= 5 head filter bounds the output to frequent vocabulary.
    Rank order is total (tf desc, doc_id), so the rendered string is
    deterministic cross-engine."""
    from pyspark.sql import Window as W

    docs = load_tables(spark, sf_dir)["documents"]
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    stats = tf.groupBy("token").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("tf_total"),
    )
    w = W.partitionBy("token").orderBy(F.desc("tf"), F.asc("doc_id"))
    head = (
        tf.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .groupBy("token")
        .agg(
            F.expr(
                "listagg(CAST(doc_id AS STRING), ',') WITHIN GROUP (ORDER BY rn)"
            ).alias("top_docs")
        )
    )
    return (
        stats.filter(F.col("df") >= 5)
        .join(head, "token")
        .select("token", "df", "tf_total", "top_docs")
        .orderBy("token")
    )


@query(
    "scalar_collation_grouping",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    cased AS (
      SELECT CASE WHEN doc_id % 2 = 1
                  THEN upper(substring(t, 1, 1)) || substring(t, 2)
                  ELSE t END AS t
      FROM tok WHERE t <> ''
    )
    SELECT lower(t) AS token, CAST(count(*) AS BIGINT) AS n
    FROM cased
    GROUP BY lower(t)
    HAVING count(*) >= 50
    ORDER BY token
    """,
)
def scalar_collation_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collated string semantics (new in Spark 4): grouping under the
    UTF8_LCASE collation — the engine-native way to make comparisons,
    GROUP BY, and joins case-insensitive WITHOUT rewriting every key
    through lower() (at 100 TB, collation lives in the hash function;
    a lower() wrapper materializes a second copy of every key). The
    fixture mixes case deterministically (first letter uppercased on odd doc_ids), the
    plan groups on collate(t, 'UTF8_LCASE') so case-folding happens
    inside the aggregate's key comparison, and the output canonicalizes
    through lower() only for rendering (a collated group's surfaced
    representative is first-seen, hence not stable — the documented
    reason the SELECT never exposes the raw representative). The
    oracle spells the same query with lower() grouping, which is the
    semantic definition of UTF8_LCASE for ASCII keys."""
    docs = load_tables(spark, sf_dir)["documents"]
    cased = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
        .filter(F.col("t") != "")
        .select(
            F.when(
                F.col("doc_id") % 2 == 1,
                F.concat(F.upper(F.substring("t", 1, 1)), F.expr("substring(t, 2)")),
            )
            .otherwise(F.col("t"))
            .alias("t")
        )
    )
    return (
        cased.groupBy(F.expr("collate(t, 'UTF8_LCASE')").alias("k"))
        .agg(F.count("*").cast("long").alias("n"))
        .filter(F.col("n") >= 50)
        .select(F.lower(F.col("k").cast("string")).alias("token"), "n")
        .orderBy("token")
    )


@query(
    "text_cooccurrence_lift",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT doc_id AS doc, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    filtered AS (SELECT doc, tok FROM toks WHERE tok <> ''),
    dfreq AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS df FROM filtered GROUP BY tok
    ),
    vocab AS (
      SELECT tok, df FROM (
        SELECT tok, df, row_number() OVER (ORDER BY df DESC, tok) AS rn FROM dfreq
      ) WHERE rn <= 50
    ),
    vt AS (
      SELECT f.doc, f.tok FROM filtered f JOIN vocab v ON v.tok = f.tok
    ),
    n AS (SELECT CAST(count(DISTINCT doc) AS BIGINT) AS n_docs FROM filtered),
    pairs AS (
      SELECT a.tok AS ta, b.tok AS tb, CAST(count(*) AS BIGINT) AS n_both
      FROM vt a JOIN vt b ON a.doc = b.doc AND a.tok < b.tok
      GROUP BY a.tok, b.tok
    )
    SELECT p.ta, p.tb, p.n_both, va.df AS df_a, vb.df AS df_b,
           CAST(p.n_both * n.n_docs * 10000 // (va.df * vb.df) AS BIGINT) AS lift_pp10k
    FROM pairs p
    JOIN vocab va ON va.tok = p.ta
    JOIN vocab vb ON vb.tok = p.tb
    CROSS JOIN n
    ORDER BY lift_pp10k DESC, ta, tb
    LIMIT 20
    """,
)
def text_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token co-occurrence lift (the integer-exact stand-in for PMI,
    whose log is banned by the float-portability rule): which token
    pairs appear in the same document far more than independence
    predicts — collocation mining for vocabulary/phrase induction.
    Blocking makes it scale: pairs are enumerated only among the
    TOP-50-df vocabulary (deterministic (df DESC, token) cutoff), via
    per-doc set expansion of the filtered relation (fan-out bounded by
    50, the co-purchase edge pattern — never a corpus-wide token
    self-join). Lift is n_both*N*10000 DIV (df_a*df_b): headroom needs
    n_both*N*1e4 < 9.2e18, i.e. fine while n_both*N < 9e14 — at
    web scale, cap the vocabulary or coarsen to pp1000. Top-20 plans
    as TakeOrderedAndProject."""
    from postrack_spark.session import pin_small

    docs = load_tables(spark, sf_dir)["documents"]
    # The multi-consumer frame is the BOUNDED per-doc token-set
    # reduction (|docs| rows — the dedup minhash_perdoc shape), not the
    # corpus-sized (doc, tok) explode this query used to pin (an
    # O(input) materialization that violates pin_small's contract at
    # 100 TB). Three branches read it: df counts and the vocab-filtered
    # pair expansion re-EXPLODE the pinned arrays (a re-slice of the
    # materialized frame, not a second corpus tokenization), and the
    # corpus size is a row count over docs with a non-empty set.
    per_doc_toks = pin_small(
        "cooc_perdoc",
        docs.select(
            F.col("doc_id").alias("doc"),
            F.array_remove(F.array_distinct(tokens(F.col("text"))), "").alias("ts_all"),
        ),
    )
    toks = per_doc_toks.select("doc", F.explode("ts_all").alias("tok"))
    dfreq = toks.groupBy("tok").agg(F.count("*").cast("long").alias("df"))
    vocab = pin_small(
        "cooc_vocab", dfreq.orderBy(F.desc("df"), F.asc("tok")).limit(50)
    )
    vt = toks.join(F.broadcast(vocab.select("tok")), "tok")
    n = (
        per_doc_toks.filter(F.size("ts_all") > 0)
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    per_doc = vt.groupBy("doc").agg(F.collect_set("tok").alias("ts"))
    # pair expansion via codegen'd posexplode + slice-explode, not
    # interpreted transform/filter lambdas (the graph _edges
    # measurement); least/greatest normalizes collect_set's order.
    pairs = (
        per_doc.select(F.posexplode("ts").alias("i", "a"), "ts")
        .select(
            "a", F.explode(F.expr("slice(ts, i + 2, size(ts) - i - 1)")).alias("b")
        )
        .select(F.least("a", "b").alias("ta"), F.greatest("a", "b").alias("tb"))
        .groupBy("ta", "tb")
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    va = vocab.select(F.col("tok").alias("ta"), F.col("df").alias("df_a"))
    vb = vocab.select(F.col("tok").alias("tb"), F.col("df").alias("df_b"))
    return (
        pairs.join(F.broadcast(va), "ta")
        .join(F.broadcast(vb), "tb")
        .crossJoin(F.broadcast(n))
        .select(
            "ta",
            "tb",
            "n_both",
            "df_a",
            "df_b",
            F.expr("CAST(n_both * n_docs * 10000 DIV (df_a * df_b) AS BIGINT)").alias(
                "lift_pp10k"
            ),
        )
        .orderBy(F.desc("lift_pp10k"), "ta", "tb")
        .limit(20)
    )


_RAKE_STOPS = "'the','a','of','and','to','in','is','it'"


@query(
    "text_rake_keyphrases",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS tok,
             unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
      FROM documents
    ),
    marked AS (
      SELECT doc_id, pos, tok,
             CASE WHEN tok IN ({_RAKE_STOPS}) OR tok = '' THEN 1 ELSE 0 END AS stop
      FROM tok
    ),
    grouped AS (
      SELECT doc_id, pos, tok, stop,
             sum(stop) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM marked
    ),
    members AS (
      SELECT doc_id, grp, pos, tok,
             CAST(count(*) OVER (PARTITION BY doc_id, grp) AS BIGINT) AS plen
      FROM grouped WHERE stop = 0
    ),
    words AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS freq, CAST(sum(plen) AS BIGINT) AS deg,
             CAST(100 * sum(plen) // count(*) AS BIGINT) AS score_pp100
      FROM members GROUP BY tok
    ),
    phrases AS (
      SELECT m.doc_id, m.grp,
             string_agg(m.tok, ' ' ORDER BY m.pos) AS phrase,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(w.score_pp100) AS BIGINT) AS score_pp100
      FROM members m JOIN words w ON w.tok = m.tok
      GROUP BY m.doc_id, m.grp
    )
    SELECT phrase, CAST(max(n_words) AS BIGINT) AS n_words,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(max(score_pp100) AS BIGINT) AS score_pp100
    FROM phrases
    GROUP BY phrase
    ORDER BY score_pp100 DESC, phrase
    LIMIT 15
    """,
)
def text_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al.) — candidate phrases are
    maximal stopword-free token runs; each word scores degree/frequency
    (degree = summed length of the phrases it appears in) and a phrase
    scores the sum of its members — the classic unsupervised keyword
    extractor. Everything integer: per-word scores floored to pp100
    BEFORE the phrase sum (fixing an evaluation order the float
    formulation leaves unspecified), so both engines rank identically.
    Shape: posexplode -> per-doc PARTITIONED running stopword count
    segments the phrases (gaps-and-islands, no unpartitioned window),
    word stats are one hash aggregate over phrase members, phrase
    scores a broadcast join of that (vocabulary-sized) word table, and
    top-15 plans as TakeOrderedAndProject."""
    from postrack_spark.functions.text import STOPWORDS

    docs = load_tables(spark, sf_dir)["documents"]
    tok = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok")
    )
    marked = tok.select(
        "doc_id",
        "pos",
        "tok",
        F.when(F.col("tok").isin(STOPWORDS) | (F.col("tok") == ""), 1)
        .otherwise(0)
        .alias("stop"),
    )
    from pyspark.sql import Window as W

    wseq = (
        W.partitionBy("doc_id").orderBy("pos").rowsBetween(W.unboundedPreceding, 0)
    )
    grouped = marked.withColumn("grp", F.sum("stop").over(wseq))
    members = grouped.filter(F.col("stop") == 0).withColumn(
        "plen", F.count("*").over(W.partitionBy("doc_id", "grp")).cast("long")
    )
    words = members.groupBy("tok").agg(
        F.count("*").cast("long").alias("freq"),
        F.sum("plen").cast("long").alias("deg"),
        F.expr("CAST(100 * sum(plen) DIV count(*) AS BIGINT)").alias("score_pp100"),
    )
    phrases = (
        members.join(F.broadcast(words.select("tok", "score_pp100")), "tok")
        .groupBy("doc_id", "grp")
        .agg(
            F.expr("listagg(tok, ' ') WITHIN GROUP (ORDER BY pos)").alias("phrase"),
            F.count("*").cast("long").alias("n_words"),
            F.sum("score_pp100").cast("long").alias("score_pp100"),
        )
    )
    return (
        phrases.groupBy("phrase")
        .agg(
            F.max("n_words").cast("long").alias("n_words"),
            F.count("*").cast("long").alias("n_occurrences"),
            F.max("score_pp100").cast("long").alias("score_pp100"),
        )
        .orderBy(F.desc("score_pp100"), "phrase")
        .limit(15)
    )


@query(
    "text_langid_prf_metrics",
    oracle=f"""
    WITH scored AS (
      SELECT lang AS true_lang,
             {_marker_sql("en")} AS s_en,
             {_marker_sql("de")} AS s_de,
             {_marker_sql("es")} AS s_es,
             {_marker_sql("fr")} AS s_fr
      FROM documents
    ),
    pred AS (
      SELECT true_lang,
             CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'unknown'
                  WHEN s_en >= greatest(s_de, s_es, s_fr) THEN 'en'
                  WHEN s_de >= greatest(s_es, s_fr) THEN 'de'
                  WHEN s_es >= s_fr THEN 'es'
                  ELSE 'fr' END AS pred_lang
      FROM scored
    ),
    langs AS (SELECT DISTINCT true_lang AS lang FROM pred),
    m AS (
      SELECT l.lang,
             CAST((SELECT count(*) FROM pred p
                   WHERE p.true_lang = l.lang AND p.pred_lang = l.lang) AS BIGINT)
               AS tp,
             CAST((SELECT count(*) FROM pred p
                   WHERE p.true_lang <> l.lang AND p.pred_lang = l.lang) AS BIGINT)
               AS fp,
             CAST((SELECT count(*) FROM pred p
                   WHERE p.true_lang = l.lang AND p.pred_lang <> l.lang) AS BIGINT)
               AS fn
      FROM langs l
    )
    SELECT lang, tp, fp, fn,
           CAST(CASE WHEN tp + fp = 0 THEN 0
                     ELSE tp * 10000 // (tp + fp) END AS BIGINT) AS precision_pp10k,
           CAST(CASE WHEN tp + fn = 0 THEN 0
                     ELSE tp * 10000 // (tp + fn) END AS BIGINT) AS recall_pp10k,
           CAST(CASE WHEN (CASE WHEN tp + fp = 0 THEN 0
                                ELSE tp * 10000 // (tp + fp) END)
                        + (CASE WHEN tp + fn = 0 THEN 0
                                ELSE tp * 10000 // (tp + fn) END) = 0 THEN 0
                     ELSE 2 * (CASE WHEN tp + fp = 0 THEN 0
                                    ELSE tp * 10000 // (tp + fp) END)
                            * (CASE WHEN tp + fn = 0 THEN 0
                                    ELSE tp * 10000 // (tp + fn) END)
                          // ((CASE WHEN tp + fp = 0 THEN 0
                                    ELSE tp * 10000 // (tp + fp) END)
                              + (CASE WHEN tp + fn = 0 THEN 0
                                      ELSE tp * 10000 // (tp + fn) END))
                END AS BIGINT) AS f1_pp10k
    FROM m
    """,
)
def text_langid_prf_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language precision/recall/F1 for the marker language-ID
    classifier — the scalar quality summary of text_language_id's
    confusion matrix (TP/FP/FN per true language; 'unknown' and 'zh'
    predictions count as misses, never as a scored class). All three
    metrics are integer pp10k with the F1 harmonic mean computed on
    the FLOORED precision/recall (a defined statistic — the floored-
    contribution rule; float F1 would never hash cross-engine), with
    explicit zero-denominator guards. Plan: one scoring pass over the
    corpus, a languages-sized broadcast matrix, constant-size output."""
    t = load_tables(spark, sf_dir)
    txt = F.col("text")

    def score(lang: str):
        return F.size(F.filter(tokens(txt), lambda tok: tok.isin(_MARKERS[lang])))

    scored = fan_out(t["documents"]).select(
        F.col("lang").alias("true_lang"),
        score("en").alias("s_en"),
        score("de").alias("s_de"),
        score("es").alias("s_es"),
        score("fr").alias("s_fr"),
    )
    best = F.greatest("s_en", "s_de", "s_es", "s_fr")
    pred = (
        F.when(best == 0, "unknown")
        .when(F.col("s_en") >= F.greatest("s_de", "s_es", "s_fr"), "en")
        .when(F.col("s_de") >= F.greatest("s_es", "s_fr"), "de")
        .when(F.col("s_es") >= F.col("s_fr"), "es")
        .otherwise("fr")
    )
    p = scored.select("true_lang", pred.alias("pred_lang"))
    langs = p.select(F.col("true_lang").alias("lang")).distinct()
    m = (
        p.crossJoin(F.broadcast(langs))
        .groupBy("lang")
        .agg(
            F.sum(
                F.when(
                    (F.col("true_lang") == F.col("lang"))
                    & (F.col("pred_lang") == F.col("lang")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("tp"),
            F.sum(
                F.when(
                    (F.col("true_lang") != F.col("lang"))
                    & (F.col("pred_lang") == F.col("lang")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("fp"),
            F.sum(
                F.when(
                    (F.col("true_lang") == F.col("lang"))
                    & (F.col("pred_lang") != F.col("lang")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("fn"),
        )
    )
    prec = F.expr(
        "CASE WHEN tp + fp = 0 THEN 0 ELSE tp * 10000 DIV (tp + fp) END"
    )
    rec = F.expr("CASE WHEN tp + fn = 0 THEN 0 ELSE tp * 10000 DIV (tp + fn) END")
    return m.select(
        "lang",
        "tp",
        "fp",
        "fn",
        prec.cast("long").alias("precision_pp10k"),
        rec.cast("long").alias("recall_pp10k"),
        F.when(prec + rec == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(
                "CAST(2 * (CASE WHEN tp + fp = 0 THEN 0"
                " ELSE tp * 10000 DIV (tp + fp) END)"
                " * (CASE WHEN tp + fn = 0 THEN 0"
                " ELSE tp * 10000 DIV (tp + fn) END)"
                " DIV ((CASE WHEN tp + fp = 0 THEN 0"
                " ELSE tp * 10000 DIV (tp + fp) END)"
                " + (CASE WHEN tp + fn = 0 THEN 0"
                " ELSE tp * 10000 DIV (tp + fn) END)) AS BIGINT)"
            )
        )
        .alias("f1_pp10k"),
    )


@query(
    "quality_cohens_kappa_langid",
    oracle=f"""
    WITH scored AS (
      SELECT lang AS true_lang,
             {_marker_sql("en")} AS s_en, {_marker_sql("de")} AS s_de,
             {_marker_sql("es")} AS s_es, {_marker_sql("fr")} AS s_fr
      FROM documents
    ),
    pred AS (
      SELECT true_lang,
             CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'unknown'
                  WHEN s_en >= greatest(s_de, s_es, s_fr) THEN 'en'
                  WHEN s_de >= greatest(s_es, s_fr) THEN 'de'
                  WHEN s_es >= s_fr THEN 'es'
                  ELSE 'fr' END AS pred_lang
      FROM scored
    ),
    counts AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN true_lang = pred_lang THEN 1 ELSE 0 END)
                  AS BIGINT) AS agree
      FROM pred
    ),
    margins AS (
      SELECT CAST(sum(r.cnt * c.cnt) AS BIGINT) AS chance_x
      FROM (SELECT true_lang AS k, count(*) AS cnt FROM pred GROUP BY 1) r
      JOIN (SELECT pred_lang AS k, count(*) AS cnt FROM pred GROUP BY 1) c
        USING (k)
    )
    SELECT n, agree, chance_x,
           CAST(n * agree - chance_x AS DOUBLE)
             / CAST(n * n - chance_x AS DOUBLE) AS kappa
    FROM counts CROSS JOIN margins
    """,
)
def quality_cohens_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the marker-word language-ID heuristic and
    the ground-truth lang column — chance-corrected agreement, the
    standard complement to the PRF metrics (text_langid_prf_metrics)
    when class priors are skewed. kappa = (N·agree − Σ r_i·c_i) /
    (N² − Σ r_i·c_i): every term is an exact integer; the final ratio
    is ONE double division of identical integers on both engines
    (IEEE-deterministic), so no floor/shift gymnastics are needed even
    though kappa can be negative. Margins join on label so classes
    absent from one marginal contribute zero chance mass."""
    t = load_tables(spark, sf_dir)
    txt = F.col("text")

    def score(lang: str):
        return F.size(F.filter(tokens(txt), lambda tok: tok.isin(_MARKERS[lang])))

    scored = fan_out(t["documents"]).select(
        F.col("lang").alias("true_lang"),
        score("en").alias("s_en"),
        score("de").alias("s_de"),
        score("es").alias("s_es"),
        score("fr").alias("s_fr"),
    )
    best = F.greatest("s_en", "s_de", "s_es", "s_fr")
    pred_col = (
        F.when(best == 0, "unknown")
        .when(F.col("s_en") >= F.greatest("s_de", "s_es", "s_fr"), "en")
        .when(F.col("s_de") >= F.greatest("s_es", "s_fr"), "de")
        .when(F.col("s_es") >= F.col("s_fr"), "es")
        .otherwise("fr")
    )
    pred = scored.select("true_lang", pred_col.alias("pred_lang")).localCheckpoint(
        eager=True
    )
    counts = pred.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("true_lang") == F.col("pred_lang"), 1).otherwise(0))
        .cast("long")
        .alias("agree"),
    )
    rows = pred.groupBy(F.col("true_lang").alias("k")).agg(
        F.count("*").cast("long").alias("rcnt")
    )
    cols = pred.groupBy(F.col("pred_lang").alias("k")).agg(
        F.count("*").cast("long").alias("ccnt")
    )
    margins = (
        rows.join(cols, "k")
        .agg(F.sum(F.col("rcnt") * F.col("ccnt")).cast("long").alias("chance_x"))
    )
    return counts.crossJoin(F.broadcast(margins)).select(
        "n",
        "agree",
        "chance_x",
        (
            (F.col("n") * F.col("agree") - F.col("chance_x")).cast("double")
            / (F.col("n") * F.col("n") - F.col("chance_x")).cast("double")
        ).alias("kappa"),
    )


@query(
    "multimodal_bmp_roundtrip_certify",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_roundtrip_ok,
           CAST(sum((3 + n_chars % 6) * (2 + n_chars % 5) * 3) AS BIGINT)
             AS total_rgb_bytes
    FROM documents
    """,
)
def multimodal_bmp_roundtrip_certify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BMP decode, driver-gated (pure-stdlib operators/bmp.py —
    the multimodal_png_roundtrip_certify pattern): per document, build
    a deterministic RGB image (md5-of-text pixels, per-doc dimensions
    from n_chars — widths 3-8 exercise every 4-byte row-padding
    residue), encode as 24-bit BI_RGB, decode through the production
    ``decode_media`` path and certify byte-exactness. The codec itself
    is independently certified against javax.imageio both directions
    (tests/test_codecs_imageio.py); this query certifies the
    DISTRIBUTED plumbing: n_roundtrip_ok must equal count(*) and
    total_rgb_bytes — summed from DECODED payload lengths — must match
    pure SQL arithmetic over n_chars. One Arrow-batched mapInPandas
    pass; images never leave their executor."""
    from collections.abc import Iterator

    import pandas as pd

    t = load_tables(spark, sf_dir)
    docs = fan_out(t["documents"]).select("doc_id", "text", "n_chars")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from postrack_spark.operators.bmp import encode_bmp
        from postrack_spark.operators.multimodal import decode_media

        for pdf in it:
            oks, nbytes = [], []
            for text, n_chars in zip(pdf["text"], pdf["n_chars"]):
                w = 3 + int(n_chars) % 6
                h = 2 + int(n_chars) % 5
                need = w * h * 3
                dig = hashlib.md5(text.encode("utf-8")).digest()
                pixels = (dig * (need // len(dig) + 1))[:need]
                decoded = decode_media(
                    encode_bmp(pixels, w, h), "image/bmp", fake_decode=False
                )
                oks.append(decoded == pixels)
                nbytes.append(len(decoded))
            yield pd.DataFrame({"ok": oks, "rgb_bytes": nbytes})

    per_doc = docs.mapInPandas(batches, "ok boolean, rgb_bytes long")
    return per_doc.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("ok").cast("long")).cast("bigint").alias("n_roundtrip_ok"),
        F.sum("rgb_bytes").cast("bigint").alias("total_rgb_bytes"),
    )


@query(
    "multimodal_tiff_roundtrip_certify",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_roundtrip_ok,
           CAST(sum((5 + n_chars % 4) * (4 + n_chars % 3) * 3) AS BIGINT)
             AS total_rgb_bytes
    FROM documents
    """,
)
def multimodal_tiff_roundtrip_certify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-TIFF decode, driver-gated (pure-stdlib
    operators/tiff.py — the BMP/PNG certify pattern): md5-pixel images
    with per-doc dimensions, encoded as little-endian single-strip RGB
    TIFF, decoded through the production ``decode_media`` path,
    byte-exactness certified. The codec is independently certified
    against javax.imageio's TIFF plugin both directions (which also
    pins the big-endian 'MM' decode path); this query certifies the
    distributed plumbing. One Arrow-batched mapInPandas pass."""
    from collections.abc import Iterator

    import pandas as pd

    t = load_tables(spark, sf_dir)
    docs = fan_out(t["documents"]).select("doc_id", "text", "n_chars")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from postrack_spark.operators.multimodal import decode_media
        from postrack_spark.operators.tiff import encode_tiff

        for pdf in it:
            oks, nbytes = [], []
            for text, n_chars in zip(pdf["text"], pdf["n_chars"]):
                w = 5 + int(n_chars) % 4
                h = 4 + int(n_chars) % 3
                need = w * h * 3
                dig = hashlib.md5(text.encode("utf-8")).digest()
                pixels = (dig * (need // len(dig) + 1))[:need]
                decoded = decode_media(
                    encode_tiff(pixels, w, h), "image/tiff", fake_decode=False
                )
                oks.append(decoded == pixels)
                nbytes.append(len(decoded))
            yield pd.DataFrame({"ok": oks, "rgb_bytes": nbytes})

    per_doc = docs.mapInPandas(batches, "ok boolean, rgb_bytes long")
    return per_doc.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("ok").cast("long")).cast("bigint").alias("n_roundtrip_ok"),
        F.sum("rgb_bytes").cast("bigint").alias("total_rgb_bytes"),
    )


@query(
    "multimodal_wbmp_roundtrip_certify",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_roundtrip_ok,
           CAST(sum((3 + n_chars % 8) * (2 + n_chars % 4) * 3) AS BIGINT)
             AS total_rgb_bytes
    FROM documents
    """,
)
def multimodal_wbmp_roundtrip_certify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL WBMP decode, driver-gated (pure-stdlib operators/wbmp.py —
    the BMP/TIFF certify pattern): per document, build a deterministic
    1-bit image from md5-of-text BITS (the only bit-packed codec on
    the shelf — widths 3-10 exercise every bits-per-row padding
    residue mod 8), encode as type-0 WBMP, decode through the
    production ``decode_media`` path and certify byte-exactness. The
    codec is independently certified against javax.imageio's WBMP
    plugin both directions (tests/test_codecs_imageio.py); this query
    certifies the distributed plumbing. One Arrow-batched mapInPandas
    pass; images never leave their executor."""
    from collections.abc import Iterator

    import pandas as pd

    t = load_tables(spark, sf_dir)
    docs = fan_out(t["documents"]).select("doc_id", "text", "n_chars")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from postrack_spark.operators.multimodal import decode_media
        from postrack_spark.operators.wbmp import encode_wbmp

        for pdf in it:
            oks, nbytes = [], []
            for text, n_chars in zip(pdf["text"], pdf["n_chars"]):
                w = 3 + int(n_chars) % 8
                h = 2 + int(n_chars) % 4
                dig = hashlib.md5(text.encode("utf-8")).digest()
                bits = [(dig[(i // 8) % len(dig)] >> (7 - i % 8)) & 1
                        for i in range(w * h)]
                pixels = bytes(v for b in bits for v in (255 * b,) * 3)
                decoded = decode_media(
                    encode_wbmp(pixels, w, h), "image/vnd.wap.wbmp",
                    fake_decode=False,
                )
                oks.append(decoded == pixels)
                nbytes.append(len(decoded))
            yield pd.DataFrame({"ok": oks, "rgb_bytes": nbytes})

    per_doc = docs.mapInPandas(batches, "ok boolean, rgb_bytes long")
    return per_doc.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("ok").cast("long")).cast("bigint").alias("n_roundtrip_ok"),
        F.sum("rgb_bytes").cast("bigint").alias("total_rgb_bytes"),
    )


@query(
    "text_phrase_search_positional",
    oracle="""
    WITH pos AS (
      SELECT d.doc_id, t.tok, CAST(t.p AS BIGINT) AS p
      FROM documents d,
           LATERAL (SELECT unnest(str_split(d.text, ' ')) AS tok,
                           generate_subscripts(str_split(d.text, ' '), 1) AS p) t
      WHERE t.tok IN ('batch', 'stream', 'scan', 'join')
    ),
    phrase AS (
      SELECT a.doc_id, a.tok AS w1, b.tok AS w2,
             CAST(count(*) AS BIGINT) AS n_matches
      FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
      WHERE (a.tok = 'batch' AND b.tok = 'batch')
         OR (a.tok = 'scan' AND b.tok = 'join')
         OR (a.tok = 'stream' AND b.tok = 'scan')
      GROUP BY a.doc_id, a.tok, b.tok
    )
    SELECT w1, w2,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_matches) AS BIGINT) AS n_occurrences
    FROM phrase
    GROUP BY w1, w2
    ORDER BY w1, w2
    """,
)
def text_phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PHRASE search through a positional inverted index — the IR
    capability text_inverted_index (bag-of-words postings) cannot
    answer: find exact two-word phrases by joining each query term's
    (doc, position) postings on position adjacency (p2 = p1 + 1), the
    way Lucene executes quoted queries. The posting relation is
    VOCABULARY-PREFILTERED to the query terms before the self-join
    (the BM25 rule: never shuffle the full (doc, term, pos) relation
    for a 4-term query), so the join input is O(query-term
    occurrences) and equi-keyed on (doc, position). posexplode
    supplies positions on the Spark side; DuckDB's
    generate_subscripts mirrors it 1-based."""
    from postrack_spark.session import fan_out

    t = load_tables(spark, sf_dir)
    terms = ["batch", "stream", "scan", "join"]
    pos = (
        fan_out(t["documents"])
        .select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("p0", "tok"),
        )
        .filter(F.col("tok").isin(terms))
        .select("doc_id", "tok", (F.col("p0") + 1).cast("long").alias("p"))
    )
    a = pos.select("doc_id", F.col("tok").alias("w1"), F.col("p").alias("p1"))
    b = pos.select("doc_id", F.col("tok").alias("w2"), F.col("p").alias("p2"))
    pairs = [("batch", "batch"), ("scan", "join"), ("stream", "scan")]
    cond = None
    for w1, w2 in pairs:
        c = (F.col("w1") == w1) & (F.col("w2") == w2)
        cond = c if cond is None else (cond | c)
    phrase = (
        a.join(b, ["doc_id"])
        .filter((F.col("p2") == F.col("p1") + 1) & cond)
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").cast("long").alias("n_matches"))
    )
    return (
        phrase.groupBy("w1", "w2")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_matches").cast("long").alias("n_occurrences"),
        )
        .orderBy("w1", "w2")
    )


@query(
    "text_udtf_term_counts",
    oracle="""
    WITH toks AS (
      SELECT d.doc_id, lower(t.tok) AS term
      FROM documents d,
           LATERAL (SELECT unnest(str_split(d.text, ' ')) AS tok) t
      WHERE length(t.tok) >= 4
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS total,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM toks
    GROUP BY term
    ORDER BY total DESC, term
    LIMIT 20
    """,
)
def text_udtf_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 4's user-defined TABLE function —
    one input row fans out to many output rows through LATERAL), the
    one Python API lane the registry didn't exercise: per document the
    UDTF emits (term, within-doc count) rows for >=4-char lowercased
    whitespace terms, then plain SQL aggregates the corpus top-20. The
    UDTF is Arrow-optimized (useArrow) — it plans as
    ArrowEvalPythonUDTF, satisfying the registry-wide no-row-Python
    invariant the same way mapInPandas does — and the oracle recomputes
    everything with engine-native string splitting, so tokenizer
    drift between the Python and SQL lanes fails the hash. The view
    name is uuid-randomized per call."""
    import uuid as _uuid

    from pyspark.sql.functions import udtf

    @udtf(returnType="term string, cnt bigint", useArrow=True)
    class TermCounts:
        def eval(self, text: str):
            if not text:
                return
            counts: dict[str, int] = {}
            for tok in text.split(" "):
                if len(tok) >= 4:
                    t = tok.lower()
                    counts[t] = counts.get(t, 0) + 1
            for t, c in counts.items():
                yield t, c

    fn = f"term_counts_{_uuid.uuid4().hex[:12]}"
    view = f"docs_udtf_{_uuid.uuid4().hex[:12]}"
    spark.udtf.register(fn, TermCounts)
    fan_out(load_tables(spark, sf_dir)["documents"]).select(
        "doc_id", "text").createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT t.term,
               CAST(sum(t.cnt) AS BIGINT) AS total,
               CAST(count(DISTINCT d.doc_id) AS BIGINT) AS n_docs
        FROM {view} d, LATERAL {fn}(d.text) t
        GROUP BY t.term
        ORDER BY total DESC, term
        LIMIT 20
        """
    ).select("term", "total", "n_docs")
