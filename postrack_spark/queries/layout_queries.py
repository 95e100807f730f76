"""Data-layout queries: Z-order clustering quality, hash-gated.

The skipping story a lakehouse layout optimizer sells is measurable
without writing a single file: range-bucket the rows by a layout key,
then measure how wide each bucket's min/max extent is on EVERY query
dimension — that extent IS the parquet footer a scan would prune with.
A single-key sort gives one tight dimension and leaves the other as
wide as the domain; the Morton code gives tight rectangles in both.

The whole computation is integer-exact (fixed 12-bit scaling, shift/
and/add interleave, floor division on non-negative operands), so the
identical bit plan generates for both engines (the dialect helpers
below; the write path they certify is sources/layout.py's
zorder_value / zorder_repartition, cross-pinned by
tests/test_layout.py) and the result hash-gates against DuckDB at
every SF. No Python rows, no window functions; the lane assignment is
a single-scan inline() row-explosion on the Spark side (a UNION ALL
of lane SELECTs re-planned the upstream subtree per lane — measured
12 parquet scans before the fix, 4 after: the bounds pass plus the
main pass), so the queries stay scan-dominated at 100 TB exactly like
the rewrite they certify. Plan audits in tests/test_plans.py pin the
scan count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postrack_spark.queries.registry import query
from postrack_spark.session import load_tables

_BITS = 12
_BUCKET_BITS = 6  # 64 buckets per layout


def _sh(e: str, n: int, dialect: str) -> str:
    return f"shiftright({e}, {n})" if dialect == "spark" else f"({e} >> {n})"


def scaled_expr(col: str, min_col: str, max_col: str, bits: int,
                dialect: str) -> str:
    """``col`` min-max scaled onto [0, 2**bits) as an integer — the
    SQL text twin of sources/layout.py's write-path quantization
    (tests/test_layout.py cross-pins the two). Floor division on
    non-negative operands only: Spark's truncating DIV and DuckDB's
    flooring // agree there (the Theil-Sen trap)."""
    top = (1 << bits) - 1
    span = f"(CAST({max_col} AS BIGINT) - CAST({min_col} AS BIGINT))"
    off = f"(CAST({col} AS BIGINT) - CAST({min_col} AS BIGINT))"
    div = "DIV" if dialect == "spark" else "//"
    return f"(({off} * {top}) {div} GREATEST({span}, 1))"


def interleave_expr(x: str, y: str, bits: int, dialect: str) -> str:
    """Morton interleave of two `bits`-bit non-negative ints — the SQL
    text twin of sources/layout.py's `zorder_value` Column plan
    (cross-pinned by tests). Disjoint bit positions, so the parts
    combine with + (portable; avoids a per-engine bitwise-OR
    spelling)."""
    parts = []
    for i in range(bits):
        if dialect == "spark":
            xbit = f"(shiftright({x}, {i}) & 1)"
            ybit = f"(shiftright({y}, {i}) & 1)"
            parts.append(f"shiftleft({xbit}, {2 * i})")
            parts.append(f"shiftleft({ybit}, {2 * i + 1})")
        else:
            parts.append(f"((({x} >> {i}) & 1) << {2 * i})")
            parts.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(parts) + ")"


def hilbert_ctes(x: str, y: str, src: str, carry: list[str],
                 bits: int) -> str:
    """CTE chain computing the Hilbert index of (`x`, `y`) from
    relation `src`, one level per bit (the public xy2d algorithm:
    quadrant digit from the top bits, then reflect+swap the frame —
    Wikipedia's rot(), unrolled because the state mutates per level).
    Only +, *, &, CASE and integer comparisons, so the SAME text runs
    in Spark and DuckDB. The final CTE ``hfin`` carries ``hd`` (the
    Hilbert index in [0, 4**bits)) plus the `carry` columns."""
    n = 1 << bits
    keep = ", ".join(carry)
    out = [
        f"h0 AS (SELECT {keep}, CAST({x} AS BIGINT) AS hx, "
        f"CAST({y} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM {src})"
    ]
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        quad = (
            f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
            f"WHEN {rx} = 0 THEN 1 WHEN {ry} = 1 THEN 2 ELSE 3 END)"
        )
        new_x = (
            f"(CASE WHEN {ry} = 1 THEN hx "
            f"WHEN {rx} = 1 THEN {n - 1} - hy ELSE hy END)"
        )
        new_y = (
            f"(CASE WHEN {ry} = 1 THEN hy "
            f"WHEN {rx} = 1 THEN {n - 1} - hx ELSE hx END)"
        )
        out.append(
            f"h{i + 1} AS (SELECT {keep}, {new_x} AS hx, {new_y} AS hy, "
            f"hd + {s * s} * {quad} AS hd FROM h{i})"
        )
    out.append(f"hfin AS (SELECT {keep}, hd FROM h{bits})")
    return ",\n    ".join(out)


def _coded_ctes(dialect: str, orders: str) -> str:
    """CTE prefix shared by every layout query: orders -> (custkey,
    epoch-day) -> 12-bit scaled (zx, zy) -> Morton code z."""
    day = (
        "datediff(o_orderdate, DATE '1992-01-01')"
        if dialect == "spark"
        else "datediff('day', DATE '1992-01-01', o_orderdate)"
    )
    zx = scaled_expr("x", "min_x", "max_x", _BITS, dialect)
    zy = scaled_expr("y", "min_y", "max_y", _BITS, dialect)
    z = interleave_expr("zx", "zy", _BITS, dialect)
    return f"""
    WITH raw AS (
      SELECT CAST(o_custkey AS BIGINT) AS x, CAST({day} AS BIGINT) AS y
      FROM {orders}
    ), b AS (
      SELECT min(x) AS min_x, max(x) AS max_x,
             min(y) AS min_y, max(y) AS max_y
      FROM raw
    ), scaled AS (
      SELECT {zx} AS zx, {zy} AS zy FROM raw CROSS JOIN b
    ), coded AS (
      SELECT zx, zy, {z} AS z FROM scaled
    )"""


def _lanes_cte(lanes: dict, src: str, dialect: str,
               label: str = "layout") -> str:
    """`assigned AS (...)`: one (label, bucket, zx, zy) row per lane.

    Dialect split for PLAN shape, not semantics: a UNION ALL of
    SELECTs from the same CTE re-plans the whole upstream subtree per
    lane in Spark (measured: 12 parquet scans for 3 lanes — a 12x
    scan bill at 100 TB), so the Spark text emits a single-scan
    LATERAL VIEW inline(array(struct...)) row-explosion instead.
    DuckDB keeps the plain UNION ALL (it materializes the CTE; oracle
    wall time is irrelevant). Both produce the identical row multiset,
    which the hash gate checks."""
    if dialect == "duck":
        body = "\n      UNION ALL\n".join(
            f"      SELECT '{name}' AS {label}, {expr} AS bucket, zx, zy"
            f" FROM {src}"
            for name, expr in lanes.items()
        )
        return f"assigned AS (\n{body}\n    )"
    structs = ", ".join(
        f"named_struct('{label}', '{name}', 'bucket', CAST({expr} AS BIGINT))"
        for name, expr in lanes.items()
    )
    return (
        f"assigned AS (\n      SELECT l.{label}, l.bucket, zx, zy\n"
        f"      FROM {src} LATERAL VIEW inline(array({structs})) l"
        f" AS {label}, bucket\n    )"
    )


def _zone_map_ctes(dialect: str, orders: str) -> str:
    """Shared CTE chain: scale -> Morton code -> three layout lanes ->
    per-bucket zone map (min/max of both dims — the parquet footer)."""
    lanes = {
        "zorder": _sh("z", 2 * _BITS - _BUCKET_BITS, dialect),
        "custkey_sort": _sh("zx", _BITS - _BUCKET_BITS, dialect),
        "date_sort": _sh("zy", _BITS - _BUCKET_BITS, dialect),
    }
    return f"""{_coded_ctes(dialect, orders)}, {_lanes_cte(lanes, "coded", dialect)}, zone_map AS (
      SELECT layout, bucket,
             min(zx) AS lo_x, max(zx) AS hi_x,
             min(zy) AS lo_y, max(zy) AS hi_y
      FROM assigned
      GROUP BY layout, bucket
    )"""


def _zorder_layout_sql(dialect: str, orders: str) -> str:
    """Average per-bucket footer extent of each dimension, per layout."""
    div = "DIV" if dialect == "spark" else "//"
    domain = 1 << _BITS
    return f"""{_zone_map_ctes(dialect, orders)}
    SELECT layout,
           count(*) AS n_buckets,
           CAST((10000 * sum(hi_x - lo_x + 1)) {div} (count(*) * {domain}) AS BIGINT)
             AS custkey_extent_pp10k,
           CAST((10000 * sum(hi_y - lo_y + 1)) {div} (count(*) * {domain}) AS BIGINT)
             AS date_extent_pp10k
    FROM zone_map
    GROUP BY layout
    ORDER BY layout
    """


def _workload_sql(dialect: str, orders: str) -> str:
    """Bucket-reads for a fixed 4x4 rectangle workload, per layout."""
    q = 1 << (_BITS - 2)  # domain quarter
    rects = ", ".join(
        f"({i * 4 + j}, {i * q}, {(i + 1) * q - 1}, {j * q}, {(j + 1) * q - 1})"
        for i in range(4)
        for j in range(4)
    )
    div = "DIV" if dialect == "spark" else "//"
    return f"""{_zone_map_ctes(dialect, orders)}
    , workload(qid, qx_lo, qx_hi, qy_lo, qy_hi) AS (
      VALUES {rects}
    ), reads AS (
      SELECT layout, qid, count(*) AS buckets_read
      FROM zone_map CROSS JOIN workload
      WHERE lo_x <= qx_hi AND hi_x >= qx_lo
        AND lo_y <= qy_hi AND hi_y >= qy_lo
      GROUP BY layout, qid
    )
    SELECT layout,
           CAST(sum(buckets_read) AS BIGINT) AS total_bucket_reads,
           min(buckets_read) AS best_query_reads,
           max(buckets_read) AS worst_query_reads,
           CAST((100 * sum(buckets_read)) {div} (16 * {1 << _BUCKET_BITS}) AS BIGINT)
             AS avg_read_pp100
    FROM reads
    GROUP BY layout
    ORDER BY layout
    """


@query("layout_zorder_extent_skipping", oracle=_zorder_layout_sql("duck", "orders"))
def layout_zorder_extent_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Certify Z-order clustering quality on orders(o_custkey,
    o_orderdate): bucket rows 64 ways under three layouts — Morton
    code, custkey sort, date sort — and report the average per-bucket
    min/max extent of each dimension in pp10k of the 4096-level
    domain. Z-order must be the only layout tight in BOTH dimensions;
    the single-key sorts each leave the other dimension near 10000
    (the whole domain), which is exactly the file-skipping difference
    a multi-dimensional predicate sees at 100 TB."""
    load_tables(spark, sf_dir)["orders"].createOrReplaceTempView(
        "layout_orders_v"
    )
    return spark.sql(_zorder_layout_sql("spark", "layout_orders_v"))


@query("layout_zone_map_workload_sim", oracle=_workload_sql("duck", "orders"))
def layout_zone_map_workload_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simulate the scan planner: a fixed 4x4 grid of 16 rectangle
    predicates (custkey quarter x date quarter) probed against each
    layout's per-bucket zone map (min/max of both dims — exactly what
    a parquet footer stores). A bucket is READ when its box intersects
    the query rectangle; total_bucket_reads is the files-touched bill
    for the workload. Z-order reads ~a quarter of what either
    single-key sort reads, because only it bounds both dimensions.
    The probe is a constant 16-row broadcast combine — no data-path
    crossJoin."""
    load_tables(spark, sf_dir)["orders"].createOrReplaceTempView(
        "layout_orders_v"
    )
    return spark.sql(_workload_sql("spark", "layout_orders_v"))


_N_VALUE_BUCKETS = 96  # deliberately NOT a power of 4: unaligned ranges
_VALUE_WIDTH = -(-(1 << (2 * _BITS)) // _N_VALUE_BUCKETS)


def _seam_sql(dialect: str, orders: str) -> str:
    """Z-order vs Hilbert under UNALIGNED range buckets."""
    div = "DIV" if dialect == "spark" else "//"
    domain = 1 << _BITS
    lanes = {
        "zorder": f"(z {div} {_VALUE_WIDTH})",
        "hilbert": f"(hd {div} {_VALUE_WIDTH})",
    }
    return f"""{_coded_ctes(dialect, orders)},
    {hilbert_ctes("zx", "zy", "coded", ["zx", "zy", "z"], _BITS)},
    {_lanes_cte(lanes, "hfin", dialect, label="curve")}, ext AS (
      SELECT curve, bucket,
             max(zx) - min(zx) + 1 AS ext_x,
             max(zy) - min(zy) + 1 AS ext_y
      FROM assigned
      GROUP BY curve, bucket
    )
    SELECT curve,
           count(*) AS n_buckets,
           CAST((10000 * sum(ext_x)) {div} (count(*) * {domain}) AS BIGINT)
             AS avg_custkey_extent_pp10k,
           CAST((10000 * sum(ext_y)) {div} (count(*) * {domain}) AS BIGINT)
             AS avg_date_extent_pp10k,
           CAST((10000 * max(ext_x)) {div} {domain} AS BIGINT)
             AS worst_custkey_extent_pp10k,
           CAST((10000 * max(ext_y)) {div} {domain} AS BIGINT)
             AS worst_date_extent_pp10k
    FROM ext
    GROUP BY curve
    ORDER BY curve
    """


@query("layout_hilbert_vs_zorder_seams", oracle=_seam_sql("duck", "orders"))
def layout_hilbert_vs_zorder_seams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Why layout optimizers moved from Z-order to Hilbert: bucket the
    SAME rows by equal-width ranges of each curve's index — 96 buckets,
    deliberately not a power of 4, so bucket boundaries do NOT align
    with quadrant boundaries (exactly what equal-frequency
    repartitionByRange produces on real data). The Z-curve jumps at
    quadrant seams while the Hilbert curve is continuous (adjacent
    indexes are adjacent cells), so Hilbert ranges stay compact,
    BALANCED blobs. Measured at sf0.01: Hilbert averages 1274/1274
    pp10k per dim with worst footers 1835/1853; Z-order trades the
    dims off (1579/1190 average) and its worst bucket is 2397 — a 31%
    wider worst-case footer on the dimension that matters for the
    straggling file, while Hilbert's worst stays within ~45% of its
    own average. The Hilbert index is the public xy2d algorithm
    unrolled one CTE level per bit (reflect+swap frame transforms;
    only +, *, &, CASE — identical text both engines, model-pinned in
    tests/test_layout.py). Same scan shape as the other layout
    queries: integer-exact, no Python, no windows."""
    load_tables(spark, sf_dir)["orders"].createOrReplaceTempView(
        "layout_orders_v"
    )
    return spark.sql(_seam_sql("spark", "layout_orders_v"))


@query(
    "streaming_zone_map_manifest",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           count(*) AS n_rows,
           min(user_id) AS lo_user,
           max(user_id) AS hi_user,
           CAST(min(floor(value * 1000)) AS BIGINT) AS lo_value_milli,
           CAST(max(floor(value * 1000)) AS BIGINT) AS hi_value_milli
    FROM events
    GROUP BY day
    ORDER BY day
    """,
)
def streaming_zone_map_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING zone-map (manifest statistics) maintenance — what a
    lakehouse keeps per ingestion partition so scans can skip files.
    Per event day the view holds the min/max footer of every prunable
    column (user_id, value) plus the row count; all three are
    mergeable monoids, so the manifest folds through
    foreach_batch_merge_fold: O(batch) scan work + O(days) merge per
    micro-batch, never re-reading history, view size calendar-bounded
    regardless of stream length. Gated by the plain batch GROUP BY
    oracle — admission splits cannot matter (commutativity), which the
    multi-batch run exercises. This is the maintained input that
    layout_zone_map_workload_sim's planner probe reads at scan time."""
    from pyspark.sql import functions as F

    from postrack_spark.streaming import foreach_batch_merge_fold
    from postrack_spark.streaming.runner import envelope_stream
    from postrack_spark.streaming.sinks import read_view

    ev = (
        load_tables(spark, sf_dir)["events"]
        .select("ts", "user_id", "value")
        .repartition(8)
    )
    stream = envelope_stream(
        spark, ev, name="zmap", options={"maxFilesPerTrigger": "2"}
    )
    rows = stream.select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.lit(1).cast("long").alias("n_rows"),
        F.col("user_id").alias("lo_user"),
        F.col("user_id").alias("hi_user"),
        F.floor(F.col("value") * 1000).cast("long").alias("lo_value_milli"),
        F.floor(F.col("value") * 1000).cast("long").alias("hi_value_milli"),
    )

    def reagg(df: DataFrame) -> DataFrame:
        return df.groupBy("day").agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.min("lo_user").alias("lo_user"),
            F.max("hi_user").alias("hi_user"),
            F.min("lo_value_milli").alias("lo_value_milli"),
            F.max("hi_value_milli").alias("hi_value_milli"),
        )

    target, q = foreach_batch_merge_fold(rows, ["day"], reagg)
    q.awaitTermination()
    return (
        read_view(spark, target)
        .select(
            "day", "n_rows", "lo_user", "hi_user",
            "lo_value_milli", "hi_value_milli",
        )
        .orderBy("day")
    )


@query(
    "layout_delta_stats_skipping",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           true AS files_pruned_some
    FROM orders
    WHERE o_custkey BETWEEN 40 AND 60
    """,
)
def layout_delta_stats_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data skipping at the TABLE-FORMAT layer — the lakehouse sibling
    of the zone-map family: orders land in a Delta table
    range-partitioned on o_custkey (files get tight disjoint custkey
    extents; every add action carries Delta's per-file stats JSON
    harvested from parquet footers), and a custkey-range read plans
    ONLY the files whose [min,max] intersect the predicate. The
    aggregate over the pruned read must equal the full filtered
    aggregate (pruning removes provably-disjoint files only), and the
    certificate column gates that pruning actually FIRED
    (files_read < files_total) — the 'gate the certificate' pattern:
    the oracle can't know file counts, but it can demand the boolean.

    Scale: stats ride in O(files) log metadata; skipping cost is a
    driver-side min/max check per file — at 100 TB this is the
    difference between scanning a table and scanning a slice, same as
    the layout family's extent argument."""
    import tempfile

    from postrack_spark.streaming.delta_log import (
        pruned_read_delta,
        write_delta,
    )

    t = load_tables(spark, sf_dir)
    table = tempfile.mkdtemp(prefix="delta_skip_q_")
    write_delta(
        t["orders"]
        .select("o_orderkey", "o_custkey",
                F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"))
        .repartitionByRange(8, "o_custkey"),
        table,
    )
    pruned, files_read, files_total = pruned_read_delta(
        spark, table, "o_custkey", 40, 60)
    return (
        pruned.filter(F.col("o_custkey").between(40, 60))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .withColumn("files_pruned_some", F.lit(files_read < files_total))
    )


@query(
    "layout_bucketed_join_no_shuffle",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           true AS join_planned_shuffle_free
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def layout_bucketed_join_no_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join — the layout family's answer to
    the BIG-x-BIG join that broadcast can't save: orders and lineitem
    are written as 16-bucket tables hash-bucketed on the order key
    (one file per bucket), and the merge-hinted join then plans as a
    SortMergeJoin with ZERO shuffle exchanges — bucket i of orders
    zips with bucket i of lineitem straight off disk. At 100 TB this
    is the difference between re-shuffling both fact tables on every
    join and paying the layout cost ONCE at ingest (the canonical
    warehouse trick bucketing exists for); the only exchange left in
    the whole plan is the final small groupBy on priority.

    The certificate column is audited from the join's physical plan
    (SortMergeJoin present, no Exchange anywhere under it, both scans
    bucketed) — the 'gate the certificate' pattern; the oracle can
    only demand the boolean plus the join's arithmetic, which is
    layout-independent. In-partition Sorts remain planned: Spark only
    trusts bucket sortBy metadata under the legacy outputOrdering
    flag, and a per-bucket sort of pre-sorted runs is a linear merge —
    documented, not hidden. Bucket tables are session-scoped catalog
    entries over temp-dir paths, unique per invocation."""
    import tempfile as _tf
    import uuid as _uuid

    t = load_tables(spark, sf_dir)
    d = _tf.mkdtemp(prefix="bucket_join_q_")
    sfx = _uuid.uuid4().hex[:8]
    (
        t["orders"]
        .select("o_orderkey", "o_orderpriority")
        .repartition(16, "o_orderkey")
        .write.bucketBy(16, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{d}/orders")
        .saveAsTable(f"bkt_orders_{sfx}")
    )
    (
        t["lineitem"]
        .select(
            "l_orderkey",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        )
        .repartition(16, "l_orderkey")
        .write.bucketBy(16, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{d}/lineitem")
        .saveAsTable(f"bkt_lineitem_{sfx}")
    )
    o = spark.table(f"bkt_orders_{sfx}")
    li = spark.table(f"bkt_lineitem_{sfx}")
    j = o.hint("merge").join(li, o.o_orderkey == li.l_orderkey)
    jplan = j._jdf.queryExecution().executedPlan().toString()
    shuffle_free = (
        "SortMergeJoin" in jplan
        and "Exchange" not in jplan
        and jplan.count("Bucketed: true") == 2
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .orderBy("o_orderpriority")
        .withColumn("join_planned_shuffle_free", F.lit(shuffle_free))
    )


from datetime import date as _date  # noqa: E402

_D95_LO = (_date(1995, 1, 1) - _date(1970, 1, 1)).days
_D95_HI = (_date(1995, 12, 31) - _date(1970, 1, 1)).days


@query(
    "layout_iceberg_sort_order",
    oracle=f"""
    WITH base AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
               AS ship_day,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    )
    SELECT CAST(ship_day % 12 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(cents) AS BIGINT) AS cents,
           true AS pruned,
           true AS order_declared
    FROM base
    WHERE ship_day BETWEEN {_D95_LO} AND {_D95_HI}
    GROUP BY 1 ORDER BY 1
    """,
)
def layout_iceberg_sort_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg SORT ORDERS (spec 'Sort Orders'): the creating append
    declares a write order on ship_day — rows range-partition across
    files and sort within each (sortWithinPartitions; NO global
    shuffle) — the order is table metadata (sort-orders /
    default-sort-order-id) that a later PLAIN append inherits and
    applies, and every data file's manifest entry records which order
    produced it (sort_order_id, field-id 140). The payoff the lane
    certifies: sorted files carry tight, mostly disjoint footer
    bounds, so a one-year stats_filter range read prunes files from
    O(files) manifest metadata (``pruned`` gates files_scanned <
    files_total) — at 100 TB the difference between scanning a year
    and scanning the decade. ``order_declared`` gates the metadata
    shape: default order 1, and every live data file claims a sorted
    layout."""
    import tempfile as _tf

    from postrack_spark.session import load_tables
    from postrack_spark.streaming.iceberg import (
        _current_metadata,
        append_iceberg,
        inspect_iceberg,
        read_iceberg,
    )

    base = load_tables(spark, sf_dir)["lineitem"].select(
        F.datediff(F.col("l_shipdate").cast("date"),
                   F.lit("1970-01-01").cast("date")).cast("long")
         .alias("ship_day"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
        (F.col("l_orderkey") % 2).alias("h"),
    )
    table = _tf.mkdtemp(prefix="ice_sort_q_")
    append_iceberg(
        base.filter("h = 0").drop("h").repartitionByRange(8, "ship_day"),
        table, sort_by=["ship_day"])
    # plain append: INHERITS the default write order
    append_iceberg(
        base.filter("h = 1").drop("h").repartitionByRange(4, "ship_day"),
        table)
    meta = _current_metadata(table)
    files = inspect_iceberg(spark, table, "files")
    order_declared = (
        meta["default-sort-order-id"] == 1
        and files.filter("sort_order_id <> 1").count() == 0)
    stats: dict = {}
    got = read_iceberg(spark, table,
                       stats_filter={"ship_day": (_D95_LO, _D95_HI)},
                       scan_stats=stats)
    pruned = 0 < stats["files_scanned"] < stats["files_total"]
    return (
        got
        .filter(F.col("ship_day").between(_D95_LO, _D95_HI))
        .groupBy((F.col("ship_day") % 12).cast("long").alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .select("bucket", "n_items", "cents",
                F.lit(pruned).alias("pruned"),
                F.lit(order_declared).alias("order_declared"))
        .orderBy("bucket")
    )
