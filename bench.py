#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes fully via the noop sink (no driver collect skew).
Timing is the PER-QUERY MEDIAN of three full passes (round 3): single
runs moved +-25% on machine noise between rounds (BENCH_r01 vs r02's
sample_hash_deterministic), drowning real regressions; three
round-robin passes (full set each pass, so repetitions of one query
are spread across the wall-clock of the whole bench) give a median
that is stable under transient load while still costing <1 minute.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from postrack_spark.queries import load_all
from postrack_spark.session import get_spark

HEADLINE = [
    # batch relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "join_inner_orders_per_nation",
    "window_topk_orders_per_customer",
    "sessionize_user_events",
    "scalar_higher_order_arrays",
    "agg_salted_hot_keys",
    # CDC materialization (the reference's domain)
    "cdc_latest_per_key_materialize",
    # LLM-pipeline operator families
    "dedup_minhash_lsh",
    "vector_knn_bruteforce",
    "text_language_id",
    "sample_hash_deterministic",
    # round-2 additions: IVM, graph, repetition screening. BASELINE.md
    # records the round-1-comparable subtotal (the first 15) separately
    # from the full total so cross-round numbers stay comparable.
    "cdc_incremental_agg",
    "graph_triangle_count",
    "text_repetition_filter",
    # round-3 additions: distributed exact ranking family
    "window_revenue_deciles",
    "agg_exact_percentile_rank",
    # round-3 session-3 additions: distributed linear algebra (one-pass
    # Gram partials + power iteration), prefix-sum ABC, BM25 retrieval
    "vector_pca_power_iteration",
    "agg_pareto_abc",
    "text_bm25_search",
    # round-3 session-4 additions: mining family (thresholded-relation
    # association rules) and single-pass OHLC resampling
    "assoc_basket_rules",
    "events_ohlc_daily",
    # round-4 additions: space-filling-curve layout certification (the
    # Hilbert chain is 12 unrolled CASE levels — the heaviest of the
    # layout family) and the temperature-flattened training mixture
    "layout_hilbert_vs_zorder_seams",
    "sample_temperature_mixture",
]
R1_COMPARABLE = 15  # first N entries = round-1 headline set


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("postrack-bench")
    specs = load_all()
    names = [n for n in HEADLINE if n in specs]

    # Warm-up pass: run every headline query once at the smallest SF so
    # whole-stage-codegen compilation (janino) and JIT happen outside
    # the timed region — the timed sf0.1 runs then measure data
    # processing, not per-plan compile (~1-2 s/query on this machine,
    # i.e. it would dominate and hide real regressions). Generated code
    # does not embed file paths, so the sf0.001 plans hit the same
    # codegen cache entries as the sf0.1 runs.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in names:
        specs[name].fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
    # One run at the timed SF so its parquet footers are cached too.
    specs[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    passes: list[dict[str, float]] = []
    for _ in range(3):
        one: dict[str, float] = {}
        for name in names:
            start = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            one[name] = time.perf_counter() - start
        passes.append(one)
    timings = {
        name: round(sorted(p[name] for p in passes)[1], 3) for name in names
    }
    best = {name: round(min(p[name] for p in passes), 3) for name in names}

    total = round(sum(timings.values()), 3)
    r1_names = [n for n in HEADLINE[:R1_COMPARABLE] if n in timings]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "r1_comparable_subtotal": round(sum(timings[n] for n in r1_names), 3),
                "timing": "median_of_3_round_robin_passes",
                # supplementary: best-of-3, the fair analog of a lucky
                # single-pass number from earlier rounds
                "queries_best": best,
                "r1_comparable_subtotal_best": round(sum(best[n] for n in r1_names), 3),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # Scaling observability (additions only — every earlier
                # key is unchanged): the driver benches at several core
                # counts; echoing the session's actual master string and
                # scheduler parallelism makes "honored but
                # overhead-bound" distinguishable from "ignored" in the
                # bench line itself.
                "cpus_env": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                "cpus_effective": spark.sparkContext.defaultParallelism,
                "master": spark.sparkContext.master,
                "shuffle_partitions": int(spark.conf.get("spark.sql.shuffle.partitions")),
                "pgoutput_decode_events_per_sec_1thread": _decode_rate(),
            }
        )
    )
    spark.stop()


def _decode_rate(n: int = 100_000) -> int:
    """Single-thread pgoutput decode throughput (events/s) — the
    counterpart of the reference's one-goroutine handler loop
    (postrack.go:343-412). In the Spark DataSource this decoder runs
    per-partition in parallel Python workers, so aggregate capture
    throughput scales with partitions; the single-thread number is the
    honest per-lane comparison."""
    from datetime import datetime, timezone

    from postrack_spark.sources.pgoutput import (
        decode_xlogdata_stream,
        encode_begin,
        encode_commit,
        encode_insert,
        encode_relation,
        wrap_xlogdata,
    )

    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    frames = [wrap_xlogdata(encode_relation(1, "public", "orders", list("abcdef")), 0)]
    lsn = 1
    for i in range(n):
        if i % 100 == 0:
            frames.append(wrap_xlogdata(encode_begin(lsn, ts, i), lsn))
            lsn += 1
        frames.append(
            wrap_xlogdata(
                encode_insert(1, [str(i), "x" * 10, "3.14", "2024-01-01", "P", str(i * 2)]),
                lsn,
            )
        )
        lsn += 1
        if i % 100 == 99:
            frames.append(wrap_xlogdata(encode_commit(lsn, lsn, ts), lsn))
            lsn += 1
    start = time.perf_counter()
    rows = decode_xlogdata_stream(frames)
    assert len(rows) == n
    return int(n / (time.perf_counter() - start))


if __name__ == "__main__":
    main()
