"""Deterministic synthetic change streams derived from the driver
tables (FIXTURES.md §B) — exercise the reference's event semantics
(postrack.go:368-411) without a live Postgres.

Generation rules are simple arithmetic on o_orderkey so the DuckDB
oracle can re-derive the same stream in pure SQL (see
queries/cdc_queries.py) — the Spark side goes through the full
map-envelope machinery, the oracle computes the flat equivalent, and
the comparison validates the envelope round-trip.

B.1 orders_changes script (keyed by o_orderkey % 10):
  every order      -> INSERT  at lsn = key*10+1, after = full image
  key%10 in {1,2,3}-> UPDATE  at lsn = key*10+5, status->'F',
                      price *= 2; before = full old image (REPLICA
                      IDENTITY FULL flavor, postrack.go:385-398)
  key%10 == 4      -> UPDATE  at lsn = key*10+5, price += 10;
                      before = EMPTY map (default replica identity,
                      postrack.go:388-392)
  key%10 == 5      -> DELETE  at lsn = key*10+7, before = old image,
                      after = null (postrack.go:399-406)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postrack_spark.cdc.envelope import (
    CHANGE_SCHEMA,
    empty_map,
    null_map,
    str_map,
)
from postrack_spark.session import fan_out, load_tables

_ORDER_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def orders_changes(
    spark: SparkSession, sf_dir: str, columns: list[str] | None = None
) -> DataFrame:
    """B.1: the scripted INSERT/UPDATE/DELETE stream over orders.

    Single-scan generation: each order row emits its 1-3 events as an
    array of structs exploded in place — one parquet scan instead of
    the previous 4-branch union that re-scanned the table once per
    event kind (at 100 TB the source scan dominates, so branch count
    is the multiplier that matters).

    `columns` is the capture-side column list — the fixture's
    ``WithSelector`` (postrack.go:45-49): with a publication column
    list the SERVER publishes only those columns, so the stream's
    images are narrow from birth. Passing it here means the envelope
    maps are never built wider than the subscription, exactly like the
    reference; ``cdc.prune_images`` remains the post-source twin for
    shared-capture deployments. The key column is always included
    (Postgres requires the replica identity in the column list)."""
    # fan_out: envelope map construction is the CPU-heavy map stage and
    # the local single-row-group scan would otherwise run it on 1 core.
    orders = fan_out(load_tables(spark, sf_dir)["orders"])
    key = F.col("o_orderkey")
    mod = key % 10
    img_cols = _ORDER_COLS
    if columns is not None:
        img_cols = [c for c in _ORDER_COLS if c in set(columns) | {"o_orderkey"}]

    def ev(cond, lsn, op: str, kind: int):
        return F.when(
            cond,
            F.struct(
                lsn.cast("long").alias("lsn"),
                F.lit(op).alias("op"),
                F.lit(kind).alias("kind"),
            ),
        )

    # The exploded struct carries only (lsn, op, kind); the heavy map
    # images are built AFTER the explode from the still-present order
    # columns. Consumers that only need (op, lsn) — e.g. the truncate
    # watermark pass inside apply_changes — filter before the map
    # projection, so their pass never constructs a single map.
    events = F.array_compact(
        F.array(
            ev(F.lit(True), key * 10 + 1, "INSERT", 0),
            ev(mod.isin(1, 2, 3), key * 10 + 5, "UPDATE", 1),
            ev(mod == 4, key * 10 + 5, "UPDATE", 2),
            ev(mod == 5, key * 10 + 7, "DELETE", 3),
        )
    )
    upd_full_after = str_map(
        img_cols,
        {
            "o_orderstatus": F.lit("F"),
            "o_totalprice": F.round(F.col("o_totalprice") * 2, 2),
        },
    )
    upd_defid_after = str_map(
        img_cols, {"o_totalprice": F.round(F.col("o_totalprice") + 10, 2)}
    )
    kind = F.col("e.kind")
    out = orders.select(
        "*",
        key.cast("long").alias("txid"),
        F.col("o_orderdate").cast("timestamp").alias("commit_ts"),
        F.explode(events).alias("e"),
    ).select(
        F.col("e.lsn").alias("lsn"),
        "txid",
        "commit_ts",
        F.lit("public").alias("schema"),
        F.lit("orders").alias("table"),
        F.col("e.op").alias("op"),
        F.when(kind == 0, str_map(img_cols))
        .when(kind == 1, upd_full_after)
        .when(kind == 2, upd_defid_after)
        .otherwise(null_map())
        .alias("after"),
        F.when(kind.isin(1, 3), str_map(img_cols))
        .when(kind == 2, empty_map())
        .otherwise(null_map())
        .alias("before"),
    )
    got = [(f.name, f.dataType) for f in out.schema.fields]
    want = [(f.name, f.dataType) for f in CHANGE_SCHEMA.fields]
    assert got == want, got
    return out


def lineitem_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B.2: INSERT-only volume stream of lineitem rows.

    (l_orderkey, l_linenumber) is NOT unique in the driver data, so the
    lsn is l_orderkey*1000 + a deterministic per-order row_number —
    partitioned by orderkey, so the window scales (no global sort).
    """
    from pyspark.sql import Window as W

    # No fan_out here: the per-order row_number window shuffles BEFORE
    # the heavy str_map projection, so map construction is already
    # parallel; a repartition would only add a second full shuffle.
    li = load_tables(spark, sf_dir)["lineitem"]
    cols = [f.name for f in li.schema.fields]
    w = W.partitionBy("l_orderkey").orderBy(*cols)
    li = li.withColumn("__seq", F.row_number().over(w))
    return li.select(
        (F.col("l_orderkey") * 1000 + F.col("__seq")).cast("long").alias("lsn"),
        F.col("l_orderkey").cast("long").alias("txid"),
        F.col("l_shipdate").cast("timestamp").alias("commit_ts"),
        F.lit("public").alias("schema"),
        F.lit("lineitem").alias("table"),
        F.lit("INSERT").alias("op"),
        str_map(cols).alias("after"),
        null_map().alias("before"),
    )


def mixed_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B.3: orders stream + a TRUNCATE for table 'orders' at the mean
    orderkey's lsn — tests multi-op demux and TRUNCATE semantics with
    the correct table name (fixes reference bug q2: postrack.go:407-410
    looks up tables[RelationNum] with the relation *count* as key, so
    the name is almost always "")."""
    oc = orders_changes(spark, sf_dir)
    orders = load_tables(spark, sf_dir)["orders"]
    trunc = orders.agg(
        F.floor(F.avg("o_orderkey") * 10).cast("long").alias("lsn")
    ).select(
        "lsn",
        F.lit(None).cast("long").alias("txid"),
        F.lit(None).cast("timestamp").alias("commit_ts"),
        F.lit("public").alias("schema"),
        F.lit("orders").alias("table"),
        F.lit("TRUNCATE").alias("op"),
        null_map().alias("after"),
        null_map().alias("before"),
    )
    return oc.unionByName(trunc)


_LI_DELTA_COLS = ["l_orderkey", "l_linenumber", "l_quantity"]


def lineitem_delta_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B.4: scripted post-snapshot deltas over lineitem, for join-view
    IVM (the lineitem side of an orders ⋈ lineitem maintained view).

    Rules (mod = l_orderkey % 10; all three ops, REPLICA IDENTITY FULL
    flavor so before images are complete):

      mod==6, l_linenumber==1 -> UPDATE: l_quantity += 3
      mod==7, l_linenumber==1 -> DELETE
      mod==8, l_linenumber==1 -> INSERT a new line (l_linenumber=99,
                                 l_quantity=1)

    (l_orderkey, l_linenumber) is NOT unique in the driver data; events
    are generated PER BASE ROW, so duplicates each emit their own event
    — signed-multiset delta algebra (cdc/ivm.py) is exact under that,
    and the DuckDB oracle's row-level WHERE clauses match it. Images
    carry only the three columns the join view consumes (capture-side
    column list ≡ WithSelector). lsn is metadata-only here (duplicate
    base rows share one), documented rather than disambiguated — the
    delta algebra never orders by it.
    """
    li = fan_out(load_tables(spark, sf_dir)["lineitem"])
    key = F.col("l_orderkey").cast("long")
    mod = key % 10
    first = F.col("l_linenumber") == 1

    def ev(cond, lsn, op: str, kind: int):
        return F.when(
            cond,
            F.struct(
                lsn.cast("long").alias("lsn"),
                F.lit(op).alias("op"),
                F.lit(kind).alias("kind"),
            ),
        )

    events = F.array_compact(
        F.array(
            ev(first & (mod == 6), key * 1000 + 4, "UPDATE", 1),
            ev(first & (mod == 7), key * 1000 + 6, "DELETE", 2),
            ev(first & (mod == 8), key * 1000 + 2, "INSERT", 3),
        )
    )
    upd_after = str_map(_LI_DELTA_COLS, {"l_quantity": F.col("l_quantity") + 3})
    ins_after = str_map(
        _LI_DELTA_COLS,
        {"l_linenumber": F.lit(99), "l_quantity": F.lit(1)},
    )
    kind = F.col("e.kind")
    out = li.select(
        *_LI_DELTA_COLS,
        key.alias("txid"),
        F.col("l_shipdate").cast("timestamp").alias("commit_ts"),
        F.explode(events).alias("e"),
    ).select(
        F.col("e.lsn").alias("lsn"),
        "txid",
        "commit_ts",
        F.lit("public").alias("schema"),
        F.lit("lineitem").alias("table"),
        F.col("e.op").alias("op"),
        F.when(kind == 1, upd_after)
        .when(kind == 3, ins_after)
        .otherwise(null_map())
        .alias("after"),
        F.when(kind.isin(1, 2), str_map(_LI_DELTA_COLS))
        .otherwise(null_map())
        .alias("before"),
    )
    got = [(f.name, f.dataType) for f in out.schema.fields]
    want = [(f.name, f.dataType) for f in CHANGE_SCHEMA.fields]
    assert got == want, got
    return out


# B.6: phased stream for version-diff reconstruction. Unlike B.1's
# per-key clustering (all of a key's events within 10 LSNs), real WAL
# interleaves keys: here each PHASE is a contiguous LSN band, so an
# LSN cut between bands lands mid-flight for every key at once —
# exactly the shape that makes two time-travel states differ in all
# four ways (added / removed / changed / unchanged).
PHASE = 100_000_000  # > any o_orderkey at every SF; lsn fits int64


def orders_phased_changes(
    spark: SparkSession, sf_dir: str, columns: list[str] | None = None
) -> DataFrame:
    """B.6: phased change script over orders (keyed by o_orderkey % 10):

      phase 1 (lsn =   PHASE+key): INSERT       key%10 not in {8,9}
      phase 2 (lsn = 2*PHASE+key): UPDATE       key%10 in {1,2}
                                   status->'F', price*2
      phase 3 (lsn = 3*PHASE+key): UPDATE       key%10 in {2,3}
                                   status->'P', price+10
      phase 4 (lsn = 4*PHASE+key): INSERT       key%10 in {8,9} (late)
      phase 5 (lsn = 5*PHASE+key): DELETE       key%10 == 5

    A cut at 3*PHASE (end of phase 2) vs the head therefore sees:
    added = {8,9}, changed = {2,3}, removed = {5}, unchanged = rest.
    Same single-scan exploded-array generation as B.1."""
    orders = fan_out(load_tables(spark, sf_dir)["orders"])
    key = F.col("o_orderkey")
    mod = key % 10
    img_cols = _ORDER_COLS
    if columns is not None:
        img_cols = [c for c in _ORDER_COLS if c in set(columns) | {"o_orderkey"}]

    def ev(cond, phase: int, op: str, kind: int):
        return F.when(
            cond,
            F.struct(
                (F.lit(phase) * PHASE + key).cast("long").alias("lsn"),
                F.lit(op).alias("op"),
                F.lit(kind).alias("kind"),
            ),
        )

    events = F.array_compact(
        F.array(
            ev(~mod.isin(8, 9), 1, "INSERT", 0),
            ev(mod.isin(1, 2), 2, "UPDATE", 1),
            ev(mod.isin(2, 3), 3, "UPDATE", 2),
            ev(mod.isin(8, 9), 4, "INSERT", 0),
            ev(mod == 5, 5, "DELETE", 3),
        )
    )
    upd2_after = str_map(
        img_cols,
        {
            "o_orderstatus": F.lit("F"),
            "o_totalprice": F.round(F.col("o_totalprice") * 2, 2),
        },
    )
    # phase 3 applies ON TOP of phase 2 for key%10 == 2
    p3_price = F.when(
        mod == 2, F.round(F.col("o_totalprice") * 2, 2) + 10
    ).otherwise(F.round(F.col("o_totalprice") + 10, 2))
    upd3_after = str_map(
        img_cols,
        {"o_orderstatus": F.lit("P"), "o_totalprice": F.round(p3_price, 2)},
    )
    kind = F.col("e.kind")
    out = orders.select(
        "*",
        key.cast("long").alias("txid"),
        F.col("o_orderdate").cast("timestamp").alias("commit_ts"),
        F.explode(events).alias("e"),
    ).select(
        F.col("e.lsn").alias("lsn"),
        "txid",
        "commit_ts",
        F.lit("public").alias("schema"),
        F.lit("orders").alias("table"),
        F.col("e.op").alias("op"),
        F.when(kind == 0, str_map(img_cols))
        .when(kind == 1, upd2_after)
        .when(kind == 2, upd3_after)
        .otherwise(null_map())
        .alias("after"),
        F.when(kind.isin(1, 2, 3), str_map(img_cols))
        .otherwise(null_map())
        .alias("before"),
    )
    got = [(f.name, f.dataType) for f in out.schema.fields]
    want = [(f.name, f.dataType) for f in CHANGE_SCHEMA.fields]
    assert got == want, got
    return out
