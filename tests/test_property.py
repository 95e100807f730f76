"""Property-based tests (SURVEY.md §5.2 item 5, hypothesis).

1. Random change sequences -> sequential model dict must equal
   `apply_changes` (the engine's parallel latest-per-key + truncate +
   delete-drop replay). This pins the WAL-replay semantics of
   postrack's consumer contract (events delivered in LSN order,
   postrack.go:366-367) under Spark's out-of-order parallel execution.
2. Random filter predicates over lineitem -> Spark row count must
   equal DuckDB's on the same parquet (mini oracle for the
   filter/projection surface).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from postrack_spark.cdc.envelope import CHANGE_SCHEMA
from postrack_spark.cdc.materialize import apply_changes

KEYS = list(range(6))
OPS = ["INSERT", "UPDATE", "DELETE", "TRUNCATE"]

change_step = st.tuples(
    st.sampled_from(OPS),
    st.sampled_from(KEYS),
    st.integers(min_value=0, max_value=99),
)


def _model_replay(seq):
    """Sequential reference semantics: latest image per key wins,
    DELETE removes the key, TRUNCATE clears the table."""
    state: dict[str, str] = {}
    for op, key, val in seq:
        k = str(key)
        if op in ("INSERT", "UPDATE"):
            state[k] = str(val)
        elif op == "DELETE":
            state.pop(k, None)
        else:  # TRUNCATE
            state.clear()
    return state


def _envelope_rows(seq):
    rows = []
    for i, (op, key, val) in enumerate(seq):
        k, v = str(key), str(val)
        after = {"k": k, "v": v} if op in ("INSERT", "UPDATE") else None
        before = {"k": k, "v": v} if op == "DELETE" else None
        rows.append((i + 1, None, None, "public", "t", op, after, before))
    return rows


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seq=st.lists(change_step, min_size=0, max_size=40))
def test_apply_changes_matches_sequential_model(spark, seq):
    changes = spark.createDataFrame(_envelope_rows(seq), CHANGE_SCHEMA)
    key_expr = F.coalesce(F.col("after")["k"], F.col("before")["k"])
    got = {
        r["__key"]: r["after"]["v"]
        for r in apply_changes(changes, key_expr).collect()
    }
    assert got == _model_replay(seq)


NUM_COLS = {
    "l_quantity": (1.0, 50.0),
    "l_discount": (0.0, 0.1),
    "l_linenumber": (1.0, 7.0),
    "l_extendedprice": (900.0, 105000.0),
}

comparison = st.tuples(
    st.sampled_from(sorted(NUM_COLS)),
    st.sampled_from(["<", "<=", ">", ">=", "="]),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)


def _pred_sql(comps, conj):
    parts = []
    for col, op, frac in comps:
        lo, hi = NUM_COLS[col]
        parts.append(f"({col} {op} {lo + frac * (hi - lo):.4f})")
    return f" {conj} ".join(parts)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    comps=st.lists(comparison, min_size=1, max_size=3),
    conj=st.sampled_from(["AND", "OR"]),
)
def test_random_filters_match_duckdb(spark, duck, sf_dir, comps, conj):
    from postrack_spark.session import load_tables

    pred = _pred_sql(comps, conj)
    got = load_tables(spark, sf_dir)["lineitem"].filter(F.expr(pred)).count()
    want = duck.execute(f"SELECT count(*) FROM lineitem WHERE {pred}").fetchone()[0]
    assert got == want, pred


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_hash_sample_invariant_under_repartition(spark, sf_dir):
    """Deterministic sampling must be a pure row function: membership
    identical no matter how the data is partitioned (the property that
    makes samples reproducible on any cluster layout)."""
    from postrack_spark.operators.sampling import hash_sample
    from postrack_spark.session import load_tables

    orders = load_tables(spark, sf_dir)["orders"]
    base = sorted(
        r["o_orderkey"] for r in hash_sample(orders, "o_orderkey", 0.2).collect()
    )
    for n in (1, 7):
        re = sorted(
            r["o_orderkey"]
            for r in hash_sample(orders.repartition(n), "o_orderkey", 0.2).collect()
        )
        assert re == base


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=15, deadline=None)
def test_connected_components_matches_union_find(spark, edges):
    """Min-label propagation over random graphs == classic union-find."""
    from postrack_spark.operators.dedup import connected_components

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for a, b in edges:
        union(a, b)
    want = {}
    for node in parent:
        root = find(node)
        want.setdefault(root, set()).add(node)
    model = {min(group): group for group in want.values()}

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got_rows = connected_components(df).collect()
    got: dict[int, set] = {}
    for r in got_rows:
        got.setdefault(r["cluster"], set()).add(r["doc"])
    assert got == model


@given(
    st.integers(min_value=0, max_value=127),
    st.integers(min_value=0, max_value=127),
    st.integers(min_value=0, max_value=127),
    st.integers(min_value=0, max_value=127),
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_zorder_value_matches_python_morton(spark, a1, b1, a2, b2):
    """zorder_value must equal the reference Morton interleave, and
    preserve its locality contract (equal inputs -> equal codes)."""
    from postrack_spark.sources.layout import zorder_value

    def morton(a, b, bits=7):
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    df = spark.createDataFrame([(a1, b1), (a2, b2)], "a long, b long")
    got = [
        r["z"]
        for r in df.select(zorder_value(F.col("a"), F.col("b"), bits=7).alias("z")).collect()
    ]
    assert got == [morton(a1, b1), morton(a2, b2)]


toast_step = st.tuples(
    st.sampled_from(["INSERT", "UPDATE"]),
    st.sampled_from([0, 1, 2]),          # key
    st.integers(min_value=0, max_value=9),  # value for column 'a'
    st.booleans(),                        # whether 'big' is UNCHANGED
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(toast_step, min_size=1, max_size=12))
def test_resolve_unchanged_matches_sequential_model(spark, seq):
    """resolve_unchanged must equal the sequential consumer that merges
    each event into per-key state keeping the previous value for
    UNCHANGED columns — the reference's documented consumer obligation
    for TOAST ('u') columns, executed here in parallel."""
    from postrack_spark.cdc.materialize import resolve_unchanged
    from postrack_spark.sources.pgoutput import UNCHANGED

    # INSERTs always carry a real 'big'; an UPDATE may mark it UNCHANGED
    model: dict[str, dict] = {}
    rows = []
    for i, (op, key, val, toast) in enumerate(seq):
        k = str(key)
        big = UNCHANGED if (op == "UPDATE" and toast) else f"big-{i}"
        after = {"k": k, "a": str(val), "big": big}
        rows.append((i + 1, None, None, "public", "t", op, after, None))
        st_row = dict(after)
        if big is UNCHANGED and k in model:
            st_row["big"] = model[k]["big"]
        model[k] = st_row
    df = spark.createDataFrame(rows, CHANGE_SCHEMA)
    out = {
        r["__key"]: r["after"]
        for r in resolve_unchanged(
            df, F.element_at("after", "k").cast("long")
        ).collect()
    }
    assert {int(k): v for k, v in model.items()} == out


# 5. Random frames + random bucket counts -> operators/ranking must
#    equal the SQL window semantics it replaces (round 3: the
#    no-single-partition-window path). A pure-Python ntile model checks
#    the formula; the Spark window is the engine cross-check.


def _model_ntile(n: int, k: int) -> list[int]:
    """SQL ntile: first n%k buckets get ceil(n/k) rows."""
    q, r = divmod(n, k)
    out = []
    for b in range(1, k + 1):
        out.extend([b] * (q + 1 if b <= r else q))
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(st.integers(min_value=-50, max_value=50),
                  min_size=1, max_size=120),
    k=st.integers(min_value=1, max_value=12),
)
def test_exact_ntile_matches_sql_semantics(spark, vals, k):
    from postrack_spark.operators.ranking import exact_ntile, global_row_number

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(4)
    order = [F.asc("v"), F.asc("id")]  # unique tie-break -> total order
    got = {
        r["id"]: (r["rn"], r["b"])
        for r in exact_ntile(
            global_row_number(df, order, "rn"), k, order, "b"
        ).collect()
    }
    ordered = sorted(rows, key=lambda t: (t[1], t[0]))
    model = _model_ntile(len(vals), k)
    for pos, (rid, _v) in enumerate(ordered):
        assert got[rid] == (pos + 1, model[pos])


# 6. Random at-least-once delivery schedules -> the versioned sink must
#    produce exactly-once effects (round 3). The model applies each
#    batch once in order; the sink sees arbitrary re-deliveries (crash
#    replays of earlier batch ids) interleaved with progress.


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    batches=st.lists(
        st.lists(st.tuples(st.sampled_from("abcd"), st.integers(-5, 5)),
                 min_size=1, max_size=4),
        min_size=1, max_size=5,
    ),
    replays=st.lists(st.integers(0, 4), max_size=6),
)
def test_versioned_sink_exactly_once_under_replay(spark, batches, replays):
    import tempfile

    from postrack_spark.streaming.sinks import _versioned_batch, read_view

    target = tempfile.mkdtemp(prefix="prop_sink_")

    def merge(base, batch_df):
        part = batch_df.groupBy("k").agg(F.sum("x").cast("bigint").alias("x"))
        if base is None:
            return part
        return base.unionByName(part).groupBy("k").agg(
            F.sum("x").cast("bigint").alias("x")
        )

    apply = _versioned_batch(target, "lineage-1", merge)

    def df_of(batch):
        return spark.createDataFrame(batch, "k string, x int")

    # delivery schedule: each batch in order, with random re-deliveries
    # of any ALREADY-DELIVERED batch id injected before/afterwards
    delivered = 0
    for bid, batch in enumerate(batches):
        for r in replays:
            if r < delivered:
                apply(df_of(batches[r]), r)  # crash replay: must no-op
        apply(df_of(batch), bid)
        delivered = bid + 1
        for r in replays:
            if r < delivered:
                apply(df_of(batches[r]), r)

    model: dict[str, int] = {}
    for batch in batches:  # exactly-once model
        for k, x in batch:
            model[k] = model.get(k, 0) + x
    got = {r["k"]: r["x"] for r in read_view(spark, target).collect()}
    assert got == model


# 3. Delta-join IVM algebra: for random valid (snapshot, final) multiset
#    pairs on both sides, the incrementally-maintained join aggregate
#    must equal the direct aggregate of the final states.

row_a = st.tuples(st.integers(0, 3), st.integers(1, 5))  # (key, measure)
row_b = st.tuples(st.integers(0, 3), st.integers(1, 4))


def _signed_diff(old: list, new: list) -> list:
    """Multiset difference as signed rows: new - old."""
    from collections import Counter

    delta = Counter(new)
    delta.subtract(Counter(old))
    return [(sign, k, m) for (k, m), c in delta.items()
            for sign in ([1] * c if c > 0 else [-1] * (-c))]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    a0=st.lists(row_a, max_size=6), a1=st.lists(row_a, max_size=6),
    b0=st.lists(row_b, max_size=6), b1=st.lists(row_b, max_size=6),
)
def test_incremental_join_agg_model(spark, a0, a1, b0, b1):
    from collections import defaultdict

    from postrack_spark.cdc.ivm import incremental_join_agg

    schema_a = "sign int, ak long, am long"
    schema_b = "sign int, bk long, bm long"
    mk = lambda rows, schema: spark.createDataFrame(  # noqa: E731
        [(1, k, m) for k, m in rows] or [], schema
    )
    da_rows = _signed_diff(a0, a1)
    db_rows = _signed_diff(b0, b1)
    da = spark.createDataFrame(da_rows or [], schema_a)
    db = spark.createDataFrame(db_rows or [], schema_b)

    got = {
        r["k"]: (r["n_rows"], r["m"])
        for r in incremental_join_agg(
            mk(a0, schema_a), da, mk(b0, schema_b), db,
            on=[("ak", "bk")],
            dims={"k": F.col("ak")},
            measures={"m": F.col("am") * F.col("bm")},
        ).collect()
    }

    expect: dict = defaultdict(lambda: [0, 0])
    for ak, am in a1:
        for bk, bm in b1:
            if ak == bk:
                expect[ak][0] += 1
                expect[ak][1] += am * bm
    want = {k: tuple(v) for k, v in expect.items() if v[0] > 0}
    assert got == want


# 4. Distributed inversion count == brute force, over random
#    permutations (the block/bucket decomposition must neither drop nor
#    double-count any pair class).


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(perm=st.permutations(list(range(1, 41))))
def test_count_inversions_model(spark, perm):
    from postrack_spark.operators.ranking import count_inversions

    rows = [(i + 1, perm[i]) for i in range(len(perm))]
    brute = sum(
        1
        for a in range(len(perm))
        for b in range(a + 1, len(perm))
        if perm[a] > perm[b]
    )
    out = count_inversions(
        spark.createDataFrame(rows, "rx long, ry long"),
        n_parts=5, n_buckets=7,
    ).collect()[0]
    assert out["inversions"] == brute
    assert out["n"] == len(perm)


# 5. Multiplicity IVM (non-distributive aggregates): for ANY well-formed
#    change sequence, COUNT DISTINCT / MIN / MAX read from the
#    maintained per-(value) multiplicity view must equal the sequential
#    final state — deletes must resurface runner-up extrema exactly.

mm_step = st.tuples(
    st.sampled_from(["INSERT", "UPDATE", "DELETE"]),
    st.integers(0, 5),
    st.integers(0, 9),
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seq=st.lists(mm_step, max_size=30))
def test_multiplicity_ivm_distinct_minmax(spark, seq):
    from postrack_spark.cdc.ivm import incremental_agg

    live: dict[int, int] = {}
    rows = []
    for i, (op, k, v) in enumerate(seq):
        ks, vs = str(k), str(v)
        if op == "INSERT":
            if k in live:
                continue
            live[k] = v
            rows.append((i + 1, None, None, "public", "t", "INSERT", {"k": ks, "v": vs}, None))
        elif op == "UPDATE":
            if k not in live:
                continue
            prev = str(live[k])
            live[k] = v
            rows.append(
                (i + 1, None, None, "public", "t", "UPDATE",
                 {"k": ks, "v": vs}, {"k": ks, "v": prev})
            )
        else:
            if k not in live:
                continue
            prev = str(live.pop(k))
            rows.append(
                (i + 1, None, None, "public", "t", "DELETE", None, {"k": ks, "v": prev})
            )
    if not rows:
        return
    ch = spark.createDataFrame(rows, CHANGE_SCHEMA)
    mult = incremental_agg(
        ch, dims={"v": F.element_at(F.col("img"), "v").cast("int")}, measures={}
    )
    got = mult.groupBy().agg(
        F.sum("n_rows").alias("n"),
        F.countDistinct("v").alias("nd"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    ).collect()[0]
    vals = list(live.values())
    if not vals:
        assert got["n"] is None or got["n"] == 0
        assert got["nd"] == 0
    else:
        assert got["n"] == len(vals)
        assert got["nd"] == len(set(vals))
        assert got["mn"] == min(vals)
        assert got["mx"] == max(vals)
