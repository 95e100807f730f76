"""Arbitrary stateful streaming — the Spark form of 'keep your own
state in the callback' (the reference's only state is its relation
cache, postrack.go:341-342; users needing per-key state build it inside
HandleFunc). Here: applyInPandasWithState with explicit state schema,
update-mode emission, and watermark-bounded state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum) maintained in explicit group
    state; emits the updated totals each micro-batch. State is two
    numbers per key — bounded regardless of stream length."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, float(total)))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_topk_events(events: DataFrame, k: int = 3) -> DataFrame:
    """Streaming top-k per event_type: the k highest-value events seen
    so far, held in explicit group state. State is EXACTLY k
    (value, event_id) pairs per key — bounded forever, unlike a naive
    'aggregate then rank' whose state grows with the key space.
    Deterministic tiebreak: higher value first, then lower event_id."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        if state.exists:
            vals, ids, n = state.get
            top = list(zip(list(vals), list(ids)))
        else:
            top, n = [], 0
        for pdf in pdfs:
            n += len(pdf)
            top.extend(zip(pdf["value"].astype(float), pdf["event_id"].astype(int)))
            top.sort(key=lambda p: (-p[0], p[1]))
            del top[k:]
        state.update(
            ([float(v) for v, _ in top], [int(i) for _, i in top], n)
        )
        yield pd.DataFrame(
            {
                "event_type": [etype],
                "topk_sum": [round(sum(v for v, _ in top), 2)],
                "topk_ids": [[i for _, i in top]],
                "n_seen": [n],
            }
        )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=(
            "event_type string, topk_sum double, topk_ids array<bigint>, n_seen bigint"
        ),
        stateStructType="vals array<double>, ids array<bigint>, n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ensure_protobuf(spark=None) -> bool:
    """Make ``google.protobuf`` importable, vendoring pbstub if needed.

    transformWithStateInPandas needs google.protobuf at runtime (the
    state-server protocol is protobuf-encoded). When the real package
    is absent, activate the pure-stdlib subset vendored at
    ``postrack_spark/vendor/pbstub`` (see its module docstring for
    scope): insert it into this process's ``sys.path`` and into
    ``PYTHONPATH`` so Spark's Python WORKERS — where
    stateful_processor_api_client actually runs — can import it too.
    Passing the active session also patches ``sc.environment``, which
    Spark snapshots into every subsequently-created python function's
    env (the worker daemon is keyed on its env, so a fresh daemon picks
    the path up mid-session). A real protobuf installation always wins:
    the vendor path is only added after ``import google.protobuf``
    fails."""
    import os
    import sys

    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        pass
    vendor = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          "vendor", "pbstub")
    if vendor not in sys.path:
        sys.path.insert(0, vendor)
    if vendor not in os.environ.get("PYTHONPATH", ""):
        os.environ["PYTHONPATH"] = (
            vendor + os.pathsep + os.environ.get("PYTHONPATH", "")
        ).rstrip(os.pathsep)
    if spark is not None:
        env = spark.sparkContext.environment
        if vendor not in env.get("PYTHONPATH", ""):
            env["PYTHONPATH"] = (
                vendor + os.pathsep + env.get("PYTHONPATH", "")
            ).rstrip(os.pathsep)
    try:
        from google.protobuf import descriptor  # noqa: F401,F811

        return True
    except ImportError:  # pragma: no cover - shim always importable
        return False


def tws_available(spark=None) -> bool:
    """True when transformWithStateInPandas can run here (real protobuf
    or the vendored pbstub shim — see ensure_protobuf)."""
    return ensure_protobuf(spark)


class rocksdb_state:
    """Context manager scoping the RocksDB state-store provider around a
    transformWithState query run. TWS keeps each state variable in its
    own column family, which the default HDFSBackedStateStoreProvider
    rejects; RocksDB (bundled with Spark — rocksdbjni jar) supports
    them. Streaming confs are captured at query START, so setting the
    provider for the duration of a synchronous availableNow run and
    restoring afterwards leaves concurrent tests' default untouched."""

    _KEY = "spark.sql.streaming.stateStore.providerClass"
    _ROCKS = ("org.apache.spark.sql.execution.streaming"
              ".state.RocksDBStateStoreProvider")

    def __init__(self, spark):
        self.spark = spark
        self._saved = None

    def __enter__(self):
        self._saved = self.spark.conf.get(self._KEY, None)
        self.spark.conf.set(self._KEY, self._ROCKS)
        return self

    def __exit__(self, *exc):
        if self._saved is None:
            self.spark.conf.unset(self._KEY)
        else:
            self.spark.conf.set(self._KEY, self._saved)
        return False


def latest_state_tws(changes: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """CDC latest-per-key as a transformWithStateInPandas processor
    (Spark 4 arbitrary-state API) over a TYPED change stream with
    columns (o_orderkey, lsn, op, status, price).

    Each key's state is one small value (lsn, op, status, price) — the
    current row image. Unlike the foreachBatch compact-then-merge sink
    (sinks.py), state lives in the state store with optional TTL:
    `ttl_ms` bounds state for key spaces that churn (a key silent for
    the TTL is forgotten — appropriate when downstream consumes the
    update stream, not a full snapshot). Emits the post-batch image per
    key in update mode; DELETE images carry op='DELETE' so the caller
    can drop or propagate tombstones.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [
            StructField("lsn", LongType()),
            StructField("op", StringType()),
            StructField("status", StringType()),
            StructField("price", DoubleType()),
        ]
    )

    class LatestProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("latest", state_schema, ttlDurationMs=ttl_ms)

        def handleInputRows(self, key, rows, timerValues):
            best = self._state.get() if self._state.exists() else None
            for pdf in rows:
                for row in pdf.itertuples(index=False):
                    if best is None or int(row.lsn) > int(best[0]):
                        price = None if pd.isna(row.price) else float(row.price)
                        status = None if pd.isna(row.status) else str(row.status)
                        best = (int(row.lsn), str(row.op), status, price)
            self._state.update(best)
            (okey,) = key
            yield pd.DataFrame(
                {
                    "o_orderkey": [int(okey)],
                    "lsn": [best[0]],
                    "op": [best[1]],
                    "status": [best[2]],
                    "price": [best[3]],
                }
            )

        def close(self) -> None:
            pass

    return changes.groupBy("o_orderkey").transformWithStateInPandas(
        statefulProcessor=LatestProcessor(),
        outputStructType="o_orderkey bigint, lsn bigint, op string, status string, price double",
        outputMode="update",
        timeMode="none",
    )


def streaming_throttle_per_key(
    events: DataFrame,
    key_col: str = "user_id",
    seq_col: str = "lsn",
    bucket_us: int = 5_000_000,
) -> DataFrame:
    """Stateful per-key THROTTLE (rate limiter): emit only the first
    event per key per `bucket_us` epoch bucket, immediately on
    arrival — the admission-control operator in front of an expensive
    downstream (re-embedding, re-scoring) that must not fire per
    burst. State is ONE long per key (last emitted bucket) — bounded
    forever, never a buffer of events. Order-sensitive by design
    (first ARRIVAL wins), so it requires ordered admission per key —
    the capture contract's WAL order; the harness replays with
    sequence-ordered files. `seq_col` is the total order (ties broken
    inside it by construction)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        last = state.get[0] if state.exists else -1
        out_ids, out_buckets = [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(seq_col)
            for eid, b in zip(pdf["event_id"], pdf["bucket"]):
                if b > last:
                    last = int(b)
                    out_ids.append(int(eid))
                    out_buckets.append(int(b))
        state.update((int(last),))
        yield pd.DataFrame(
            {
                key_col: [uid] * len(out_ids),
                "event_id": out_ids,
                "bucket": out_buckets,
            }
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} bigint, event_id bigint, bucket bigint",
        stateStructType="last_bucket bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def forward_fill_locf(rows: DataFrame) -> DataFrame:
    """Streaming forward fill (LOCF) per user with O(1) state: the last
    observed value plus four running counters — state never grows with
    the stream, unlike buffering rows for a batch window. Requires
    time-ordered admission across micro-batches (the capture-contract
    delivery order; rows within a batch are sorted here), because a
    fill reaches backward to the previous batch's last observation.
    Input columns: user_id, ok (total order key string), v (nullable
    double). Emits the per-user running summary each batch (update
    mode); counters are monotone, so the final summary is the row with
    the largest n_rows."""
    import math

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            has, last, n_rows, n_gaps, n_leading, fill = state.get
        else:
            has, last, n_rows, n_gaps, n_leading, fill = False, 0.0, 0, 0, 0, 0
        pdf = pd.concat(list(pdfs))
        pdf = pdf.sort_values("ok")
        for v in pdf["v"]:
            n_rows += 1
            if pd.isna(v):
                n_gaps += 1
                if has:
                    fill += math.floor(last * 1000)
                else:
                    n_leading += 1
            else:
                last = float(v)
                has = True
                fill += math.floor(last * 1000)
        state.update((bool(has), float(last), int(n_rows), int(n_gaps),
                      int(n_leading), int(fill)))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_rows": [n_rows],
                "n_gaps": [n_gaps],
                "n_leading": [n_leading],
                "fill_milli": [fill],
            }
        )

    return rows.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id bigint, n_rows bigint, n_gaps bigint, "
            "n_leading bigint, fill_milli bigint"
        ),
        stateStructType=(
            "has boolean, last double, n_rows bigint, n_gaps bigint, "
            "n_leading bigint, fill bigint"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def session_expiry_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization with EVENT-TIME TIMEOUT expiry: closed
    sessions emit from the data path (a row arriving > gap after the
    open session's end closes it), and each key's trailing open
    session emits when the WATERMARK passes its end + gap — the
    GroupStateTimeout.EventTimeTimeout contract, which NoTimeout
    operators (running totals, top-k) never exercise. State is one
    open session (start, end, count) per key — O(1) forever. Emission
    of the trailing session therefore depends on how far the final
    watermark advanced: sessions ending within (gap + delay) of
    end-of-input legitimately stay buffered, exactly like the
    unmatched side of the outer stream-stream join. Requires
    withWatermark on the input and per-key time-ordered arrival
    (ordered admission; in-batch rows are sorted here)."""
    gap_us = gap_minutes * 60 * 1_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed = []
        if state.hasTimedOut:
            s, e, n = state.get
            closed.append((s, e, n))
            state.remove()
        else:
            cur = state.get if state.exists else None
            pdf = pd.concat(list(pdfs)).sort_values("us")
            for us in pdf["us"]:
                us = int(us)
                if cur is None:
                    cur = (us, us, 1)
                elif us - cur[1] > gap_us:
                    closed.append(cur)
                    cur = (us, us, 1)
                else:
                    cur = (cur[0], us, cur[2] + 1)
            state.update((int(cur[0]), int(cur[1]), int(cur[2])))
            # fire when the watermark passes session end + gap
            state.setTimeoutTimestamp((int(cur[1]) + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "start_us": [c[0] for c in closed],
                    "end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, start_us bigint, end_us bigint, n_events bigint",
        stateStructType="s bigint, e bigint, n bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def tws_topk_profile(events: DataFrame, k: int = 3) -> DataFrame:
    """Per-event-type profile via transformWithStateInPandas using ALL
    THREE state variable kinds — exercising the protocol legs the
    ValueState-only latest_state_tws never touches (ListStateGet
    paging, ListStatePut, MapState getValue/updateValue/containsKey and
    the Keys iterator with requireNextFetch):

    * ListState "topv": the top-k cents values seen (top-k of a union
      is top-k of top-k ∪ batch — a monoid, so batch order is
      irrelevant);
    * MapState "bcnt": per user-bucket (user_id % 16) event counts;
    * ValueState "tot": total event count.

    Emits (event_type, topk_cents, n_buckets, n_total) per batch in
    update mode; n_total is monotone, so the final image per key is the
    max_by(n_total) row. Input columns: (event_type, cents, bucket).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TopKProfile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._top = handle.getListState("topv", "cents bigint")
            self._buckets = handle.getMapState("bcnt", "b bigint", "n bigint")
            self._tot = handle.getValueState("tot", "n bigint")

        def handleInputRows(self, key, rows, timerValues):
            batch_vals: list[int] = []
            bucket_add: dict[int, int] = {}
            n_new = 0
            for pdf in rows:
                for row in pdf.itertuples(index=False):
                    batch_vals.append(int(row.cents))
                    b = int(row.bucket)
                    bucket_add[b] = bucket_add.get(b, 0) + 1
                    n_new += 1
            current = [t[0] for t in self._top.get()] if self._top.exists() else []
            merged = sorted(current + batch_vals, reverse=True)[:k]
            self._top.put([(v,) for v in merged])
            for b, add in bucket_add.items():
                if self._buckets.containsKey((b,)):
                    (old,) = self._buckets.getValue((b,))
                else:
                    old = 0
                self._buckets.updateValue((b,), (old + add,))
            total = (self._tot.get()[0] if self._tot.exists() else 0) + n_new
            self._tot.update((total,))
            n_buckets = sum(1 for _ in self._buckets.keys())
            (etype,) = key
            yield pd.DataFrame(
                {
                    "event_type": [str(etype)],
                    "topk_cents": [int(sum(merged))],
                    "n_buckets": [int(n_buckets)],
                    "n_total": [int(total)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=TopKProfile(),
        outputStructType=(
            "event_type string, topk_cents bigint, n_buckets bigint, n_total bigint"
        ),
        outputMode="update",
        timeMode="none",
    )


def session_expiry_tws(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap sessionization via transformWithStateInPandas with
    EVENT-TIME TIMERS — the timer protocol legs (RegisterTimer /
    DeleteTimer / ExpiredTimerInfo / the handleExpiredTimer callback
    under timeMode='eventTime') that the ValueState/ListState/MapState
    processors above never exercise, over the same pbstub protobuf
    runtime. Semantics mirror session_expiry_sessions exactly (the
    applyInPandasWithState twin): closed sessions emit from the data
    path; the trailing open session emits when the watermark passes
    end + gap, here via a registered timer per key. Extending a
    session DELETES the stale timer and registers the new expiry, so
    at most one timer per key is live (O(1) timer state — the same
    bound as the value state). Requires withWatermark on the input and
    ordered admission. Input columns: (user_id, us, ts)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = gap_minutes * 60 * 1_000_000

    class SessionTimers(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._open = handle.getValueState("open", "s bigint, e bigint, n bigint")

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            cur = self._open.get() if self._open.exists() else None
            old_due = None if cur is None else (int(cur[1]) + gap_us) // 1000
            closed = []
            pdf = pd.concat(list(rows)).sort_values("us")
            for us in pdf["us"]:
                us = int(us)
                if cur is None:
                    cur = (us, us, 1)
                elif us - cur[1] > gap_us:
                    closed.append(cur)
                    cur = (us, us, 1)
                else:
                    cur = (cur[0], us, cur[2] + 1)
            self._open.update((int(cur[0]), int(cur[1]), int(cur[2])))
            due = (int(cur[1]) + gap_us) // 1000
            if old_due is not None and old_due != due:
                self._handle.deleteTimer(old_due)
            self._handle.registerTimer(due)
            if closed:
                yield pd.DataFrame(
                    {
                        "user_id": [user_id] * len(closed),
                        "start_us": [c[0] for c in closed],
                        "end_us": [c[1] for c in closed],
                        "n_events": [c[2] for c in closed],
                    }
                )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            (user_id,) = key
            if not self._open.exists():
                return
            s, e, n = self._open.get()
            # a stale timer (session extended within this same batch's
            # input) must not evict the still-open session
            if expiredTimerInfo.getExpiryTimeInMs() < (int(e) + gap_us) // 1000:
                return
            self._open.clear()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "start_us": [int(s)],
                    "end_us": [int(e)],
                    "n_events": [int(n)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionTimers(),
        outputStructType=(
            "user_id bigint, start_us bigint, end_us bigint, n_events bigint"
        ),
        outputMode="append",
        timeMode="eventTime",
    )
