"""Extract testable features from a DataFrame's physical plan.

Usage: ``plan_features(df)`` -> counts of joins by strategy, exchanges,
pushed filters, codegen spans, Python-eval operators;
``assert_plan(df, broadcast_joins=2, python_udfs=0)`` in tests.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_string(df: DataFrame, mode: str = "formatted") -> str:
    """The text of df.explain(mode) (Spark prints it; we capture it)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def plan_features(df: DataFrame) -> dict:
    """Parse the formatted physical plan into a feature dict.

    Keys:
      broadcast_joins / sortmerge_joins / shuffledhash_joins / bnl_joins
      exchanges            — shuffle boundaries (each is a full
                             network pass over its input at scale)
      codegen_spans        — WholeStageCodegen regions (wider = more of
                             the query stays in generated JVM code)
      python_evals         — BatchEvalPython/ArrowEvalPython/MapInPandas
                             /FlatMapGroupsInPandas operators (the
                             Python-boundary slow path)
      arrow_python_evals   — the Arrow-batched subset of the above
      pushed_filters       — list of PushedFilters: [...] strings from
                             parquet scans
      scan_columns         — ReadSchema column lists per scan (column
                             pruning visible here)
      aqe                  — AdaptiveSparkPlan present
    """
    text = explain_string(df, "formatted")
    simple = explain_string(df, "simple")

    def op(name: str) -> int:
        # formatted mode lists each operator once as "(N) <Name>"
        return len(re.findall(rf"^\(\d+\) {name}\b", text, re.MULTILINE))

    feats = {
        "broadcast_joins": op("BroadcastHashJoin"),
        "sortmerge_joins": op("SortMergeJoin"),
        "shuffledhash_joins": op("ShuffledHashJoin"),
        "bnl_joins": op("BroadcastNestedLoopJoin"),
        "exchanges": op("Exchange"),  # shuffle exchanges; broadcasts separate
        "broadcast_exchanges": op("BroadcastExchange"),
        # simple mode tags codegen stages "*(n) Operator"
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", simple))),
        "python_evals": sum(
            op(n)
            for n in (
                "BatchEvalPython",
                "ArrowEvalPython",
                "MapInPandas",
                "FlatMapGroupsInPandas",
            )
        ),
        "arrow_python_evals": sum(
            op(n) for n in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
        ),
        "row_python_evals": op("BatchEvalPython"),
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", text),
        "scan_columns": re.findall(r"ReadSchema: struct<([^>]*)>", text),
        "aqe": "AdaptiveSparkPlan" in text,
        "windows": op("Window"),
        "unpartitioned_windows": _unpartitioned_windows(text),
    }
    return feats


def _unpartitioned_windows(formatted: str) -> int:
    """Count Window operators with an EMPTY partition spec — the
    single-task scale-killer (`WindowExec: No Partition Defined`).

    The formatted Arguments line carries up to three top-level bracket
    groups: [exprs], then partitionSpec and/or orderSpec, each omitted
    when empty. Order-spec groups always contain sort directions
    (``ASC``/``DESC``); partition specs never do, which disambiguates
    the two-group case (partitioned-unordered vs ordered-unpartitioned).
    Groups are counted with a depth scanner because window expressions
    may themselves contain brackets (lambdas, array indexing)."""
    n = 0
    for block in re.findall(r"^\(\d+\) Window\b.*?(?=^\(\d+\)|\Z)", formatted,
                            re.MULTILINE | re.DOTALL):
        m = re.search(r"^Arguments: (.*)$", block, re.MULTILINE)
        if not m:
            continue
        depth, groups, spans, start = 0, 0, [], 0
        for i, ch in enumerate(m.group(1)):
            if ch == "[":
                if depth == 0:
                    groups += 1
                    start = i
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    spans.append(m.group(1)[start : i + 1])
        if groups == 1:  # neither partition nor order spec
            n += 1
        elif groups == 2 and re.search(r"\b(ASC|DESC)\b", spans[1]):
            n += 1  # second group is an order spec -> no partition spec
    return n


def assert_plan(df: DataFrame, **expect) -> dict:
    """Assert numeric plan features: exact (`broadcast_joins=2`),
    minimum (`min_broadcast_joins=1`), maximum (`max_exchanges=3`,
    e.g. python_udfs budget). Returns the feature dict for chaining."""
    feats = plan_features(df)
    problems = []
    for key, want in expect.items():
        if key.startswith("min_"):
            name, ok = key[4:], feats.get(key[4:], 0) >= want
        elif key.startswith("max_"):
            name, ok = key[4:], feats.get(key[4:], 0) <= want
        else:
            name, ok = key, feats.get(key, 0) == want
        if not ok:
            problems.append(f"{key}={want} but plan has {name}={feats.get(name)}")
    if problems:
        raise AssertionError(
            "; ".join(problems) + "\n--- formatted plan ---\n" + explain_string(df)
        )
    return feats
