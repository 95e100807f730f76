"""BPE trainer semantics anchored OUTSIDE the Spark/DuckDB pair.

Two layers (the stats-family discipline — review the oracle's
semantics separately from gate-greenness):

1. A hypothesis property: the padded-double-space string-replace merge
   (what both engines execute) is equivalent to the reference
   restart-after-merge greedy list scan for arbitrary symbol sequences.
2. An end-to-end check: a from-scratch pure-Python Sennrich trainer on
   the real sf0.001 documents corpus must produce the exact merge
   table the DuckDB oracle produces — so the oracle (and therefore the
   hash gate) is pinned to the published algorithm, not merely to
   whatever the SQL happens to compute.
"""

from __future__ import annotations

import re
from collections import Counter

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from postrack_spark.queries.text_queries import _bpe_oracle_sql


def ref_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Reference greedy merge: left-to-right, restart after each merge."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def padded_replace_merge(syms: list[str], a: str, b: str) -> list[str]:
    """The engine-side semantics: wrap every symbol in its own spaces,
    one plain replace, unwrap."""
    s = " " + "  ".join(syms) + " "
    s = s.replace(f" {a}  {b} ", f" {a}{b} ")
    return s.strip().split("  ")


SYMBOLS = st.sampled_from(["a", "b", "ab", "c", "</w>"])


@settings(max_examples=300, deadline=None)
@given(st.lists(SYMBOLS, min_size=1, max_size=12), SYMBOLS, SYMBOLS)
def test_padded_replace_equals_reference_merge(syms, a, b):
    assert padded_replace_merge(syms, a, b) == ref_merge(syms, a, b)


def ref_bpe_train(word_freqs: dict[str, int], n_merges: int):
    """From-scratch Sennrich learn_bpe: overlapping pair counts,
    lexicographic tie-break, greedy merge."""
    vocab = {
        tuple(list(w) + ["</w>"]): f for w, f in word_freqs.items()
    }
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, cnt))
        new_vocab: dict = {}
        for syms, f in vocab.items():
            merged = tuple(ref_merge(list(syms), a, b))
            new_vocab[merged] = new_vocab.get(merged, 0) + f
        vocab = new_vocab
    return merges


def test_oracle_matches_reference_trainer_on_real_corpus(sf_dir):
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        oracle_rows = con.execute(_bpe_oracle_sql(8)).fetchall()

        toks: Counter = Counter()
        for (text,) in con.execute("SELECT text FROM documents").fetchall():
            for tok in text.split(" "):
                lt = tok.lower()
                if re.fullmatch("[a-z]+", lt):
                    toks[lt] += 1
        ref = ref_bpe_train(dict(toks), 8)
    finally:
        con.close()

    assert len(oracle_rows) == 8
    for (rank, pair, merged, cnt), (a, b, ref_cnt) in zip(oracle_rows, ref):
        assert pair == f"{a} {b}", (rank, pair, (a, b))
        assert merged == a + b
        assert cnt == ref_cnt
