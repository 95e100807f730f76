#!/usr/bin/env python
"""Registry-wide duplicate-scan audit (optimization rounds 8-9).

For every registered query: build the DataFrame, take
``explain("formatted")``, and count DISTINCT ``Scan parquet`` operator
ids per table — discounting any scan that sits beneath an
``InMemoryRelation`` (a pinned/cached subtree materializes once per
action regardless of how many consumers re-render it; the same cache
entry can render under several consumers, but it keeps one operator id
per cached plan object, so distinct-id counting already dedupes it).

A table re-scanned >= FLAG_AT times from one query means the driver
would read the same parquet bytes that many times per action — the
duplicate-subtree class optimization round 8 removed with
session.pin_small. Queries listed by this audit are either still
fixable or inherently multi-pass (each pass computes something
different over the same table); the round ledger records which.

Usage: python scripts/scan_audit.py [sf_dir] > plans/r09/scan_audit.txt
Plan shape is SF-independent; default sf0.01 keeps eager construction
(ranking localCheckpoints, pins) cheap.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
import traceback

FLAG_AT = 3

_TREE_NODE = re.compile(r"^(?P<prefix>[\s:+-]*?)(?:\+- |:- )?\*?\s*(?:\()?")
_ID_NAME = re.compile(r"\((\d+)\)\s+([A-Za-z][A-Za-z0-9_ ]*?)\s*(?:\(|$)")
_DETAIL_HEAD = re.compile(r"^\((\d+)\) Scan parquet")
_LOCATION = re.compile(r"Location:.*\[[^\]]*/([^/\]]+)\.parquet\]?")


def scan_counts(plan: str) -> dict[str, int]:
    """Distinct non-cached Scan-parquet operator ids per table."""
    lines = plan.splitlines()
    # --- tree section: find scans and whether an ancestor is an IMR ---
    try:
        start = next(i for i, ln in enumerate(lines) if "Physical Plan" in ln) + 1
    except StopIteration:
        return {}
    stack: list[tuple[int, str]] = []  # (depth, node name)
    scans: dict[str, bool] = {}  # id -> under_imr
    for ln in lines[start:]:
        if not ln.strip():
            break
        m = re.search(r"(?:\+- |:- )", ln)
        depth = m.start() if m else 0
        im = _ID_NAME.search(ln)
        if not im:
            continue
        op_id, name = im.group(1), im.group(2).strip()
        while stack and stack[-1][0] >= depth:
            stack.pop()
        under_imr = any(n.startswith("InMemoryRelation") for _, n in stack)
        stack.append((depth, name))
        if name.startswith("Scan parquet"):
            # distinct ids dedupe a cache entry rendered twice
            scans[op_id] = scans.get(op_id, True) and under_imr
    # --- details section: map scan id -> table name ---
    table_of: dict[str, str] = {}
    cur: str | None = None
    for ln in lines:
        dm = _DETAIL_HEAD.match(ln)
        if dm:
            cur = dm.group(1)
            continue
        if cur is not None:
            lm = _LOCATION.search(ln)
            if lm:
                table_of[cur] = lm.group(1)
                cur = None
    out: dict[str, int] = {}
    for op_id, under in scans.items():
        if under:
            continue
        tbl = table_of.get(op_id, f"id{op_id}")
        out[tbl] = out.get(tbl, 0) + 1
    return out


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from postrack_spark.queries.registry import load_all
    from postrack_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("scan-audit", cpus=8)
    flagged = 0
    for name, spec in load_all().items():
        try:
            df = spec.fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            counts = scan_counts(buf.getvalue())
        except Exception:
            print(f"{name}\tERROR\t{traceback.format_exc(limit=1).splitlines()[-1]}")
            continue
        hot = {t: c for t, c in counts.items() if c >= FLAG_AT}
        if hot:
            flagged += 1
            desc = " ".join(f"{t}={c}" for t, c in sorted(hot.items()))
            print(f"{name}\tFLAG\t{desc}", flush=True)
    print(f"# flagged: {flagged}")


if __name__ == "__main__":
    main()
