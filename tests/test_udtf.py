"""Python UDTF surface (SURVEY.md §2b UDF/UDAF/UDTF row): Spark 4's
@udtf — one input row to many output rows with a declared schema,
usable from SQL via lateral join. Kept OUT of queries(): UDTFs are
row-at-a-time Python (the slow path); the engine's production operators
express one-to-many with explode/posexplode (JVM) instead. This test
pins that the surface itself works for user extensions."""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="word: string, pos: int, length: int")
class WordIndexer:
    def eval(self, text: str):
        for i, w in enumerate((text or "").split(" ")):
            if w:
                yield w, i, len(w)


def test_udtf_lateral_expansion(spark):
    spark.udtf.register("word_indexer", WordIndexer)
    rows = spark.sql(
        """
        SELECT t.id, w.word, w.pos, w.length
        FROM VALUES (1, 'the quick fox'), (2, 'ab') AS t(id, text),
        LATERAL word_indexer(t.text) AS w
        ORDER BY t.id, w.pos
        """
    ).collect()
    assert [(r.id, r.word, r.pos, r.length) for r in rows] == [
        (1, "the", 0, 3),
        (1, "quick", 1, 5),
        (1, "fox", 2, 3),
        (2, "ab", 0, 2),
    ]
