"""The six TPC-H shapes the core set still missed (Q2, Q11, Q12, Q16,
Q20, Q21), adapted to the driver tables.

The driver data has no ``partsupp`` and no ``l_commitdate`` /
``l_receiptdate`` / ``l_shipmode`` columns, so each query keeps the
canonical *operator shape* while substituting available columns:

- Q2  — correlated min-subquery per part -> derived partsupp
  (min unit price per (part, supplier) from lineitem) + per-part min
  via a window over the region-restricted candidates.
- Q11 — group-agg with HAVING against a *global scalar subquery*
  (fraction of nation-wide total value).
- Q12 — conditional aggregation (CASE inside SUM) over a join with an
  interval lateness predicate (l_shipdate > o_orderdate + 60 days
  replaces the receipt/commit comparison).
- Q16 — count(DISTINCT supplier) per part attribute group with a
  NOT IN anti-join exclusion (negative-balance suppliers replace the
  '%Complaints%' comment filter).
- Q20 — nested IN-subqueries: suppliers shipping promo-named parts
  above a scalar-subquery threshold (0.5x the mean shipped quantity
  replaces the availqty comparison).
- Q21 — the hardest correlation: EXISTS(other supplier in order) AND
  NOT EXISTS(other *late* supplier in order), decorrelated Spark-side
  into per-order distinct-supplier aggregates.

The reference (postrack.go, 413 LoC CDC client) has no relational
operators at all (SURVEY.md §2b); these exist for the full-engine
north star. Scale notes: every scalar subquery is a 1-row broadcast
cross join; per-part/per-order correlations become window functions or
pre-aggregated broadcast joins — the decorrelated plans Catalyst would
produce, written explicitly so the physical plan is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from postrack_spark.queries.registry import query
from postrack_spark.session import load_tables


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min(l_extendedprice / l_quantity) AS ps_supplycost
        FROM lineitem GROUP BY 1, 2
    ),
    cand AS (
        SELECT p_partkey, p_name, s_name, n_name, s_acctbal, ps_supplycost
        FROM part
        JOIN ps       ON p_partkey = ps_partkey
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE p_size IN (5, 15, 25, 35, 45) AND p_type = 'LARGE' AND r_name = 'EUROPE'
    )
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_name
    FROM cand
    WHERE ps_supplycost = (SELECT min(c2.ps_supplycost) FROM cand c2
                           WHERE c2.p_partkey = cand.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted: partsupp derived from lineitem): correlated
    per-part MIN subquery -> min() window over the candidate set, which
    avoids a second scan + self-join of the derived partsupp."""
    t = load_tables(spark, sf_dir)
    ps = (
        t["lineitem"]
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"))
    )
    part = t["part"].filter(
        F.col("p_size").isin(5, 15, 25, 35, 45) & (F.col("p_type") == "LARGE")
    )
    region = t["region"].filter(F.col("r_name") == "EUROPE")
    supp = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "n_name", "s_acctbal", "ps_supplycost")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
    )


@query(
    "q11_important_value",
    oracle="""
    WITH nation_value AS (
        SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY l_partkey
    )
    SELECT l_partkey, round(value, 2) AS value
    FROM nation_value
    WHERE value > (SELECT 0.002 * sum(value) FROM nation_value)
    ORDER BY value DESC, l_partkey
    """,
)
def q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted: value = nation-restricted revenue per part):
    HAVING against a global scalar subquery -> 1-row broadcast cross
    join of the grand total; the grouped base is computed once and
    reused for both sides (Spark reuses the shuffle via plan reuse)."""
    t = load_tables(spark, sf_dir)
    nat = t["nation"].filter(F.col("n_name") == "NATION_7")
    supp = (
        t["supplier"]
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    base = (
        t["lineitem"]
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_rev()).alias("value"))
    )
    total = base.agg((F.sum("value") * F.lit(0.002)).alias("threshold"))
    return (
        base.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", F.round("value", 2).alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@query(
    "q12_late_shipment_priority",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (adapted: lateness = shipped >60 days after order,
    groups = l_returnflag since l_shipmode doesn't exist): join with an
    interval predicate + CASE-conditional aggregation."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"]
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted: excluded suppliers = negative balance, no
    comment column): NOT IN -> broadcast left-anti join, then
    count(DISTINCT) per part-attribute group."""
    t = load_tables(spark, sf_dir)
    part = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q20_promo_part_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l_suppkey, sum(l_quantity) AS qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
    )
    SELECT s_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_13')
      AND s_suppkey IN (SELECT l_suppkey FROM shipped
                        WHERE qty > (SELECT 0.5 * avg(qty) FROM shipped))
    ORDER BY s_name
    """,
)
def q20_promo_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted: threshold = 0.5x mean shipped qty instead of
    availqty): nested IN-subqueries -> agg + scalar-threshold filter +
    left-semi join."""
    t = load_tables(spark, sf_dir)
    red = t["part"].filter(F.col("p_name").startswith("red")).select("p_partkey")
    shipped = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    thresh = shipped.agg((F.avg("qty") * F.lit(0.5)).alias("threshold"))
    qualifying = (
        shipped.crossJoin(F.broadcast(thresh))
        .filter(F.col("qty") > F.col("threshold"))
        .select("l_suppkey")
    )
    nat = t["nation"].filter(F.col("n_name").isin("NATION_3", "NATION_13"))
    return (
        t["supplier"]
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(qualifying), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders     ON o_orderkey = l1.l_orderkey
    JOIN nation     ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
      AND n_name IN ('NATION_2', 'NATION_12', 'NATION_22')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted: late = shipped >90 days after order date):
    EXISTS + NOT EXISTS with <> correlation, decorrelated into
    per-order aggregates — n_suppliers > 1 (someone else supplied) and
    n_late_suppliers == 1 (l1's supplier was the only late one). One
    lineitem scan feeds both the aggregate and the candidate rows."""
    t = load_tables(spark, sf_dir)
    li = (
        t["lineitem"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .withColumn(
            "late",
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        )
        .select("l_orderkey", "l_suppkey", "late")
    )
    per_order = li.groupBy(F.col("l_orderkey").alias("agg_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    nat = t["nation"].filter(F.col("n_name").isin("NATION_2", "NATION_12", "NATION_22"))
    supp = (
        t["supplier"]
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        li.filter(F.col("late"))
        .join(
            per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)),
            F.col("l_orderkey") == F.col("agg_orderkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
