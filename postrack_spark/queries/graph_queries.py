"""Graph analytics over the co-purchase graph (parts linked by
appearing in the same order) — the relational-engine expression of
graph workloads a training-data pipeline meets (link analysis,
community structure). Everything is exact integers: edge weights,
degrees, triangle counts — fully hash-checkable cross-engine.

Scale design: the raw pair graph is O(Σ per-order lines²) — bounded by
per-order fan-out (TPC-H ~7), never all-pairs over parts. A support
threshold (co-occurrence weight >= 2) is applied BEFORE any
graph-shaped join: chance co-occurrence dilutes as the catalog grows,
so the thresholded graph stays small (measured: 3.6k edges at sf0.01,
3.9k at sf0.1 while the raw pair count grows 10x) and the triangle
join runs broadcast on the thresholded edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from postrack_spark.queries.registry import query
from postrack_spark.session import load_tables

_EDGES_CTE = """
    po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM po a JOIN po b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    edges AS (
      SELECT pa, pb, CAST(count(*) AS BIGINT) AS w
      FROM pairs GROUP BY pa, pb
      HAVING count(*) >= 2
    )
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchase edges WITHOUT a self-join: collect each order's
    distinct part set (bounded by per-order fan-out, ~7), expand its
    C(n,2) pairs inside the array, then count pair multiplicity across
    orders. One groupBy(order) + one groupBy(pair) — the self-join
    formulation sort-merge-joined the full lineitem against itself
    (two 600k-row sorts at sf0.1, measured ~4s); this shape is 2
    partial-agg-friendly shuffles and the pair expansion is array-local
    (the same pattern as the LSH bucket pair generator). Co-occurrence
    is per distinct (order, part) — duplicate lines of the same part
    don't inflate weights.

    Pair expansion is posexplode + explode(slice(...)) — two codegen'd
    Generate operators — not a nested transform/filter lambda chain:
    higher-order-function lambdas evaluate INTERPRETED per element
    (guide §4's boundary cost inside the JVM), and the codegen shape
    measured 1.5x faster at sf0.1 (0.98 s vs 1.51 s edge build) and
    ~10% faster at 10x replication (1.55 vs 1.69 s warm). Identical
    pair multiset: for any array order, {(i, j): i < j} covers each
    unordered element pair exactly once and least/greatest normalizes
    the orientation, so collect_set's nondeterministic order never
    reaches the output."""
    from postrack_spark.session import pin_small

    li = load_tables(spark, sf_dir)["lineitem"].select("l_orderkey", "l_partkey")
    per_order = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    pairs = (
        per_order.select(F.posexplode("ps").alias("i", "a"), "ps")
        .select("a", F.explode(F.expr("slice(ps, i + 2, size(ps) - i - 1)")).alias("b"))
        .select(F.least("a", "b").alias("pa"), F.greatest("a", "b").alias("pb"))
    )
    # The thresholded edge list is small by construction (module
    # docstring) and every graph/mining consumer references it from
    # several branches — pinned here so the lineitem scan + two
    # aggregations run once per query, not once per branch.
    return pin_small(
        "copurchase_edges",
        pairs.groupBy("pa", "pb")
        .agg(F.count("*").cast("bigint").alias("w"))
        .filter(F.col("w") >= 2),
    )


def _bidir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected symmetrization of the thresholded edge list (both
    orientations of every edge), pinned under ONE shared name.

    Five queries (pagerank, personalized pagerank, jaccard link
    prediction, assortativity, resource allocation) used to pin this
    same frame under five different names; the plans are canonically
    identical, so the CacheManager aliased them to one entry anyway —
    the later pins were persist no-ops that silently read the earlier
    query's materialization while their own registry entries aged out
    independently (measurement-flattering within a sweep, and eviction
    semantics were non-obvious). One helper + one name makes the reuse
    explicit and the re-pin semantics exact: a re-invocation unpersists
    the previous entry and registers fresh lineage, the same
    no-cross-run-reuse guarantee `_edges` gives via 'copurchase_edges'.
    Bounded: 2x the support-thresholded edge list (module docstring)."""
    from postrack_spark.session import pin_small

    e = _edges(spark, sf_dir).select("pa", "pb")
    return pin_small(
        "copurchase_bidir",
        e.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionAll(
            e.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
        ),
    )


def _bidir_deg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node degree of the undirected graph — (src, deg), pinned
    once for the same reason as :func:`_bidir` (pagerank and
    personalized pagerank consume it per iteration)."""
    from postrack_spark.session import pin_small

    return pin_small(
        "copurchase_bidir_deg",
        _bidir(spark, sf_dir)
        .groupBy("src")
        .agg(F.count("*").cast("bigint").alias("deg")),
    )


@query(
    "graph_degree_histogram",
    oracle=f"""
    WITH {_EDGES_CTE},
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS degree
      FROM (SELECT pa AS node FROM edges UNION ALL SELECT pb FROM edges)
      GROUP BY node
    )
    SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY degree
    ORDER BY degree
    """,
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the support-thresholded co-purchase
    graph. Two hash aggs over the edge list; the undirected degree is
    counted by unioning both endpoint columns (no self-join)."""
    e = _edges(spark, sf_dir)
    deg = (
        e.select(F.col("pa").alias("node"))
        .unionAll(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("degree"))
    )
    return (
        deg.groupBy("degree")
        .agg(F.count("*").cast("bigint").alias("n_nodes"))
        .orderBy("degree")
    )


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH {_EDGES_CTE},
    e AS (SELECT pa, pb FROM edges)
    SELECT CAST((SELECT count(DISTINCT x) FROM
                 (SELECT pa AS x FROM e UNION ALL SELECT pb FROM e)) AS BIGINT)
             AS n_nodes,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT count(*)
                 FROM e e1 JOIN e e2 ON e2.pa = e1.pb
                           JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb)
                AS BIGINT) AS n_triangles
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count on the thresholded co-purchase graph — the
    canonical distributed-graph benchmark, as three broadcast hash
    joins. Edges keep pa < pb, so the join pattern (a,b)x(b,c)x(a,c)
    enumerates each triangle exactly once (a < b < c). The edge list is
    support-thresholded first (see module docstring), which is what
    keeps Σdeg² — the join's blow-up term — bounded at scale."""
    e = _edges(spark, sf_dir).select("pa", "pb")
    nodes = (
        e.select(F.col("pa").alias("x"))
        .unionAll(e.select(F.col("pb").alias("x")))
        .agg(F.countDistinct("x").cast("bigint").alias("n_nodes"))
    )
    n_edges = e.agg(F.count("*").cast("bigint").alias("n_edges"))
    e1 = e.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    e2 = e.select(F.col("pa").alias("b"), F.col("pb").alias("c"))
    e3 = e.select(F.col("pa").alias("a"), F.col("pb").alias("c"))
    tris = (
        e1.join(F.broadcast(e2), "b")
        .join(F.broadcast(e3), ["a", "c"], "left_semi")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    # three 1-row aggregates — not data-path crossJoins
    return nodes.crossJoin(n_edges).crossJoin(tris)


def _pagerank_oracle(iters: int = 5) -> str:
    head = f"""
    WITH {_EDGES_CTE},
    bidir AS (
      SELECT pa AS src, pb AS dst FROM edges
      UNION ALL SELECT pb, pa FROM edges
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM bidir GROUP BY src),
    pr0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg)
    """
    steps = []
    for i in range(1, iters + 1):
        steps.append(f"""
    pr{i} AS (
      SELECT d.src AS node,
             CAST(150000 + (850 * c.s) // 1000 AS BIGINT) AS r
      FROM deg d JOIN (
        SELECT b.dst AS dst, sum(p.r // dg.deg) AS s
        FROM pr{i - 1} p
        JOIN bidir b ON b.src = p.node
        JOIN deg dg ON dg.src = p.node
        GROUP BY b.dst
      ) c ON c.dst = d.src
    )""")
    return (
        head.rstrip()
        + ","
        + ",".join(steps)
        + f"""
    SELECT node, r AS rank_micros FROM pr{iters}
    ORDER BY rank_micros DESC, node LIMIT 10
    """
    )


@query("graph_pagerank_top10", oracle=_pagerank_oracle(5))
def graph_pagerank_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 iterations, damping 0.85) on the thresholded
    co-purchase graph, entirely in FIXED-POINT integer arithmetic
    (micro-rank units, integer division at every step) — so this
    iterative algorithm is hash-exact against the oracle, which unrolls
    the same five steps as chained CTEs. Float PageRank can never be
    oracle-gated (per-iteration sum association differs); integerizing
    the recurrence makes convergence deterministic cross-engine.

    Scale design: ranks live keyed by node and join edges on src — on a
    cluster both sides pre-partition by node so each iteration is one
    co-partitioned join + one aggregation (the vertex-centric Pregel
    shape); localCheckpoint truncates lineage so iteration N does not
    replay 1..N-1. The support threshold bounds the edge list (module
    docstring)."""
    # shared pins (not .cache(): a bare cache() is never unpersisted and
    # silently reuses results across invocations; not per-query names:
    # canonically identical plans alias one CacheManager entry anyway —
    # see _bidir).
    bidir = _bidir(spark, sf_dir)
    deg = _bidir_deg(spark, sf_dir)
    ranks = deg.select(F.col("src").alias("node"), F.lit(1000000).cast("bigint").alias("r"))
    for _ in range(5):
        contrib = (
            ranks.join(deg, ranks.node == deg.src)
            .join(bidir.select(F.col("src").alias("node"), "dst"), "node")
            .select("dst", F.expr("r DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            deg.join(contrib, deg.src == contrib.dst)
            .select(
                F.col("src").alias("node"),
                (F.lit(150000) + F.expr("(850 * s) DIV 1000")).cast("bigint").alias("r"),
            )
            .localCheckpoint()
        )
    return (
        ranks.select("node", F.col("r").alias("rank_micros"))
        .orderBy(F.col("rank_micros").desc(), "node")
        .limit(10)
    )


_REACH_SQL = """
    WITH RECURSIVE
    po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM po a JOIN po b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    edges AS (SELECT pa, pb FROM pairs GROUP BY pa, pb HAVING count(*) >= 2),
    bidir AS (SELECT pa AS src, pb AS dst FROM edges
              UNION ALL SELECT pb, pa FROM edges),
    deg AS (SELECT src, count(*) AS d FROM bidir GROUP BY src),
    start AS (SELECT src FROM deg ORDER BY d DESC, src LIMIT 1),
    reach(node, depth) AS (
      SELECT src, 0 FROM start
      UNION ALL
      SELECT b.dst, r.depth + 1
      FROM reach r JOIN bidir b ON b.src = r.node
      WHERE r.depth < 3
    )
    SELECT CAST((SELECT src FROM start) AS BIGINT) AS start_node,
           CAST(count(DISTINCT node) AS BIGINT) AS n_reachable_3hops
    FROM reach
"""


@query("sql_recursive_reachability", oracle=_REACH_SQL)
def sql_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE transitive closure (Spark 4's WITH RECURSIVE):
    nodes reachable within 3 hops of the highest-degree node of the
    thresholded co-purchase graph. The SQL text runs VERBATIM on both
    engines — the query IS its own oracle, pinning that Spark's
    recursive-CTE semantics (UNION ALL step, bounded by the depth
    predicate) agree with DuckDB's. Path explosion is bounded by the
    depth guard and the support-thresholded edge list; the final
    count(DISTINCT) collapses duplicate paths."""
    load_tables(spark, sf_dir)  # registers temp views
    return spark.sql(_REACH_SQL)


def _kcore_oracle(k: int = 3, rounds: int = 8) -> str:
    """Unrolled peeling oracle: round r's node set keeps nodes whose
    degree in the round-(r-1) induced subgraph is >= k. Fixed round
    count on both sides => identical output even before fixpoint; the
    Spark test asserts the trajectory has converged at every test SF."""
    # AS MATERIALIZED: without it DuckDB inlines each CTE per reference
    # and the self-referencing chain expands 2^rounds copies of the
    # lineitem scan (observed as 'Too many open files')
    parts = [_EDGES_CTE.strip().rstrip(), "e0 AS MATERIALIZED (SELECT pa, pb FROM edges)"]
    for r in range(1, rounds + 1):
        parts.append(
            f"""d{r} AS MATERIALIZED (
      SELECT node, count(*) AS c FROM
        (SELECT pa AS node FROM e{r-1} UNION ALL SELECT pb FROM e{r-1})
      GROUP BY node
    ),
    n{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE c >= {k}),
    e{r} AS MATERIALIZED (
      SELECT e.pa, e.pb FROM e{r-1} e
      JOIN n{r} a ON e.pa = a.node JOIN n{r} b ON e.pb = b.node
    )"""
        )
    rows = []
    for r in range(rounds + 1):
        rows.append(
            f"""SELECT {r} AS round,
           CAST((SELECT count(DISTINCT x) FROM
                 (SELECT pa AS x FROM e{r} UNION ALL SELECT pb FROM e{r})) AS BIGINT)
             AS n_nodes,
           CAST((SELECT count(*) FROM e{r}) AS BIGINT) AS n_edges"""
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + "\n    SELECT CAST(round AS INT) AS round, n_nodes, n_edges FROM ("
        + " UNION ALL ".join(rows)
        + ") ORDER BY round"
    )


@query("graph_kcore_decomposition", oracle=_kcore_oracle(3, 8))
def graph_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the co-purchase graph by iterative peeling: each round
    drops nodes whose degree in the current induced subgraph is below
    3, reporting the (n_nodes, n_edges) trajectory per round — the
    community-density screen (dense cores = strongly co-occurring
    product groups) and the classic iterative-fixpoint workload next to
    PageRank and connected components. Exact integers throughout; a
    FIXED 8 peeling rounds on both engines keeps the oracle aligned by
    construction (the trajectory is the k-core UPPER-BOUND sequence —
    at sf0.001 it is a fixpoint from round 0, at sf0.1 it empties by
    round 2, at sf0.01 it is still contracting ~1%/round at round 8;
    running to fixpoint is the same loop with a convergence check, cf.
    dedup's connected components). Scale:
    peeling runs entirely on the support-thresholded edge list (3.9k
    edges at sf0.1, measured to grow sub-linearly — module docstring);
    each round is two hash aggs + two joins on that small frame,
    localCheckpointed so the plan stays linear in rounds rather than
    doubling. At 100 TB the thresholded edge list still fits executor
    memory by the support argument; if it ever didn't, the same loop
    runs shuffled with the node list broadcast."""
    e = _edges(spark, sf_dir).select("pa", "pb").localCheckpoint(eager=True)
    trajectory = []

    def counts(edges: DataFrame, r: int) -> DataFrame:
        nodes = edges.select(F.col("pa").alias("x")).unionAll(
            edges.select(F.col("pb").alias("x"))
        )
        return (
            nodes.agg(F.countDistinct("x").cast("long").alias("n_nodes"))
            .crossJoin(edges.agg(F.count("*").cast("long").alias("n_edges")))
            .select(F.lit(r).cast("int").alias("round"), "n_nodes", "n_edges")
        )

    trajectory.append(counts(e, 0))
    for r in range(1, 9):
        deg = (
            e.select(F.col("pa").alias("node"))
            .unionAll(e.select(F.col("pb").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("c"))
        )
        keep = deg.filter(F.col("c") >= 3).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "pa"), "pa")
            .join(keep.withColumnRenamed("node", "pb"), "pb")
            .select("pa", "pb")
            .localCheckpoint(eager=True)
        )
        trajectory.append(counts(e, r))
    out = trajectory[0]
    for t in trajectory[1:]:
        out = out.unionAll(t)
    return out.orderBy("round")


@query(
    "graph_jaccard_link_prediction",
    oracle=f"""
    WITH {_EDGES_CTE},
    und AS (
      SELECT pa AS a, pb AS b FROM edges
      UNION ALL
      SELECT pb AS a, pa AS b FROM edges
    ),
    deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY a),
    wedge AS (
      SELECT e1.b AS x, e2.b AS y, CAST(count(*) AS BIGINT) AS common
      FROM und e1 JOIN und e2 ON e1.a = e2.a AND e1.b < e2.b
      GROUP BY e1.b, e2.b
    ),
    cand AS (
      SELECT w.x, w.y, w.common FROM wedge w
      WHERE NOT EXISTS (
        SELECT 1 FROM edges e WHERE e.pa = w.x AND e.pb = w.y
      )
    )
    SELECT c.x, c.y, c.common, dx.d AS deg_x, dy.d AS deg_y,
           CAST(c.common * 10000 // (dx.d + dy.d - c.common) AS BIGINT) AS jac_pp10k
    FROM cand c
    JOIN deg dx ON dx.node = c.x
    JOIN deg dy ON dy.node = c.y
    ORDER BY jac_pp10k DESC, x, y
    LIMIT 20
    """,
)
def graph_jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighbor-set Jaccard: score NON-adjacent part
    pairs by |N(x) ∩ N(y)| / |N(x) ∪ N(y)| and return the 20 most
    likely missing co-purchase edges. The intersection count comes
    from WEDGE enumeration (join the undirected adjacency with itself
    on the shared middle node) — the same bounded fan-out shape as the
    triangle counter, never a set-similarity cross join; the union
    size is inclusion-exclusion over broadcast degree counts. Existing
    edges drop out via an anti-join on the thresholded edge list
    (small by the support-threshold argument in the module docstring,
    so it broadcasts). Scores are exact integer parts-per-10000 —
    floor division agrees across engines for positive operands — and
    the top-20 plans as TakeOrderedAndProject with a total tie-break
    (score, x, y)."""
    edges = _edges(spark, sf_dir)
    # shared pins — one name across the graph family, see _bidir.
    und = _bidir(spark, sf_dir).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    deg = _bidir_deg(spark, sf_dir).select(
        F.col("src").alias("a"), F.col("deg").cast("long").alias("d")
    )
    e1 = und.select(F.col("a").alias("m"), F.col("b").alias("x"))
    e2 = und.select(F.col("a").alias("m2"), F.col("b").alias("y"))
    wedge = (
        e1.join(e2, (F.col("m") == F.col("m2")) & (F.col("x") < F.col("y")))
        .groupBy("x", "y")
        .agg(F.count("*").cast("long").alias("common"))
    )
    cand = wedge.join(
        F.broadcast(edges.select(F.col("pa").alias("x"), F.col("pb").alias("y"))),
        ["x", "y"],
        "left_anti",
    )
    dx = deg.select(F.col("a").alias("x"), F.col("d").alias("deg_x"))
    dy = deg.select(F.col("a").alias("y"), F.col("d").alias("deg_y"))
    return (
        cand.join(F.broadcast(dx), "x")
        .join(F.broadcast(dy), "y")
        .select(
            "x",
            "y",
            "common",
            "deg_x",
            "deg_y",
            F.expr(
                "CAST(common * 10000 DIV (deg_x + deg_y - common) AS BIGINT)"
            ).alias("jac_pp10k"),
        )
        .orderBy(F.desc("jac_pp10k"), "x", "y")
        .limit(20)
    )


@query(
    "graph_degree_assortativity",
    oracle=f"""
    WITH {_EDGES_CTE},
    und AS (
      SELECT pa AS a, pb AS b FROM edges
      UNION ALL
      SELECT pb AS a, pa AS b FROM edges
    ),
    deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY a),
    de AS (
      SELECT da.d AS x, db.d AS y
      FROM und u JOIN deg da ON da.node = u.a JOIN deg db ON db.node = u.b
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM de
    )
    SELECT n,
           CAST(floor((1000000.0 * CAST(n * sxy - sx * sy AS DOUBLE))
                      / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                         * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) AS BIGINT)
             AS assortativity_ppm
    FROM m
    """,
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman's r): the Pearson correlation of
    endpoint degrees over the edge list — do hubs link to hubs
    (assortative, social-network-like) or to leaves (disassortative,
    catalog-like)? Exact integer moments over the DIRECTED
    symmetrization of the thresholded co-purchase graph (each
    undirected edge contributes both orientations, the standard
    estimator), degrees from one hash aggregate and broadcast back —
    the bounded-graph argument in the module docstring makes every
    join broadcastable. The only floating point is the final
    correctly-rounded sqrt/divide floored to ppm on identical
    integers (the events_acf_lags rule)."""
    # shared pins — one name across the graph family, see _bidir.
    und = _bidir(spark, sf_dir).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    deg = _bidir_deg(spark, sf_dir).select(
        F.col("src").alias("a"), F.col("deg").cast("long").alias("d")
    )
    da = deg.select(F.col("a").alias("ja"), F.col("d").alias("x"))
    db = deg.select(F.col("a").alias("jb"), F.col("d").alias("y"))
    de = (
        und.join(F.broadcast(da), F.col("a") == F.col("ja"))
        .join(F.broadcast(db), F.col("b") == F.col("jb"))
        .select("x", "y")
    )
    m = de.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        "n",
        F.floor(F.lit(1000000.0) * num / (F.sqrt(dx) * F.sqrt(dy)))
        .cast("long")
        .alias("assortativity_ppm"),
    )


@query(
    "graph_clustering_coefficient",
    oracle=f"""
    WITH {_EDGES_CTE},
    e1 AS (SELECT pa AS a, pb AS b FROM edges),
    tris AS (
      SELECT CAST(count(*) AS BIGINT) AS n_triangles
      FROM e1 x
      JOIN (SELECT pa AS b, pb AS c FROM edges) y ON x.b = y.b
      WHERE EXISTS (SELECT 1 FROM edges z WHERE z.pa = x.a AND z.pb = y.c)
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d
      FROM (SELECT pa AS node FROM edges UNION ALL SELECT pb FROM edges)
      GROUP BY node
    ),
    wedges AS (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_wedges FROM deg)
    SELECT t.n_triangles, w.n_wedges,
           CAST(3 * t.n_triangles * 10000 // w.n_wedges AS BIGINT) AS global_cc_pp10k
    FROM tris t CROSS JOIN wedges w
    """,
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient (transitivity): 3x triangles over
    wedges — 'when two products share a co-purchase partner, how often
    are they co-purchased themselves?'. Triangles reuse the
    graph_triangle_count broadcast-join enumeration (a<b<c, each
    triangle once); the wedge count needs no join at all — it is
    Σ d(d-1)/2 over one degree aggregate. Reported in integer pp10k
    (floor division); the same support-threshold argument keeps every
    join broadcastable at any SF."""
    # the redundant .cache() here leaked across invocations (never
    # unpersisted); _edges is already pinned inside the helper.
    e = _edges(spark, sf_dir).select("pa", "pb")
    e1 = e.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    e2 = e.select(F.col("pa").alias("b"), F.col("pb").alias("c"))
    e3 = e.select(F.col("pa").alias("a"), F.col("pb").alias("c"))
    tris = (
        e1.join(F.broadcast(e2), "b")
        .join(F.broadcast(e3), ["a", "c"], "left_semi")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    deg = (
        e.select(F.col("pa").alias("node"))
        .unionAll(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) DIV 2")).cast("long").alias("n_wedges")
    )
    return (
        tris.crossJoin(wedges)  # two 1-row aggregates
        .select(
            "n_triangles",
            "n_wedges",
            F.expr("CAST(3 * n_triangles * 10000 DIV n_wedges AS BIGINT)").alias(
                "global_cc_pp10k"
            ),
        )
    )


@query(
    "graph_triangle_participation",
    oracle=f"""
    WITH {_EDGES_CTE},
    e AS (SELECT pa, pb FROM edges),
    tris AS (
      SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
      FROM e e1 JOIN e e2 ON e2.pa = e1.pb
                JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    ),
    part AS (
      SELECT a AS node FROM tris
      UNION ALL SELECT b FROM tris
      UNION ALL SELECT c FROM tris
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
    FROM part GROUP BY node
    ORDER BY n_triangles DESC, node LIMIT 10
    """,
)
def graph_triangle_participation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation: which parts sit in the most
    co-purchase triangles — the local-clustering hot list that
    graph_triangle_count aggregates away and
    graph_clustering_coefficient averages away (a node in many
    triangles is a 'bundle anchor'; the ranking feeds
    recommendation/assortment work). Same support-thresholded
    broadcast triangle join as the count query (a < b < c enumerates
    each triangle once), then each triangle credits its three corners
    via a 3-way union and the head is a TakeOrderedAndProject. The
    threshold bounds Σdeg² exactly as the count query documents."""
    # the redundant .cache() here leaked across invocations (never
    # unpersisted); _edges is already pinned inside the helper.
    e = _edges(spark, sf_dir).select("pa", "pb")
    e1 = e.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    e2 = e.select(F.col("pa").alias("b"), F.col("pb").alias("c"))
    e3 = e.select(F.col("pa").alias("a"), F.col("pb").alias("c"))
    tris = (
        e1.join(F.broadcast(e2), "b")
        .join(F.broadcast(e3), ["a", "c"], "left_semi")
        .select("a", "b", "c")
    )
    part = (
        tris.select(F.col("a").alias("node"))
        .unionAll(tris.select(F.col("b").alias("node")))
        .unionAll(tris.select(F.col("c").alias("node")))
    )
    return (
        part.groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
        .orderBy(F.col("n_triangles").desc(), "node")
        .limit(10)
    )


def _lpa_oracle(rounds: int) -> str:
    """Unrolled synchronous label-propagation oracle: r_k is the label
    assignment after round k (argmax neighbor-label count, ties to the
    SMALLEST label — fully deterministic). AS MATERIALIZED per round,
    or DuckDB inlines 2^rounds scans (the k-core/HITS lesson)."""
    parts = [f"""WITH {_EDGES_CTE},
    nbr AS MATERIALIZED (
      SELECT pa AS v, pb AS u FROM edges
      UNION ALL
      SELECT pb AS v, pa AS u FROM edges
    ),
    r0 AS MATERIALIZED (
      SELECT DISTINCT v, v AS lbl FROM nbr
    )"""]
    for k in range(1, rounds + 1):
        parts.append(f""",
    r{k} AS MATERIALIZED (
      SELECT v, lbl FROM (
        SELECT n.v, l.lbl, count(*) AS c,
               row_number() OVER (PARTITION BY n.v
                                  ORDER BY count(*) DESC, l.lbl) AS rn
        FROM nbr n JOIN r{k - 1} l ON n.u = l.v
        GROUP BY n.v, l.lbl
      ) WHERE rn = 1
    )""")
    parts.append(f"""
    SELECT CAST(comm_size AS BIGINT) AS comm_size,
           CAST(count(*) AS BIGINT) AS n_communities
    FROM (
      SELECT lbl, count(*) AS comm_size FROM r{rounds} GROUP BY lbl
    )
    GROUP BY comm_size
    ORDER BY comm_size""")
    return "".join(parts)


@query("graph_label_propagation", oracle=_lpa_oracle(3))
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation over the
    co-purchase graph, made DETERMINISTIC (plain LPA is famously
    order-dependent): every node updates simultaneously to the most
    frequent neighbor label, ties broken to the SMALLEST label, for a
    FIXED 3 rounds on both engines — the k-core fixed-rounds
    discipline. Output is the community-size histogram (size ->
    how many communities), exact integers.

    Scale: each round is one groupBy(v,lbl) + one argmax per node on
    the support-thresholded edge list (sub-linear growth, module
    docstring), localCheckpointed per round so the plan stays linear in
    rounds. The argmax is max_by over a (count, -label) struct — no
    windows, no collect."""
    e = _edges(spark, sf_dir).select("pa", "pb").localCheckpoint(eager=True)
    nbr = e.select(F.col("pa").alias("v"), F.col("pb").alias("u")).unionAll(
        e.select(F.col("pb").alias("v"), F.col("pa").alias("u"))
    ).localCheckpoint(eager=True)
    labels = nbr.select("v").distinct().select("v", F.col("v").alias("lbl"))
    for _ in range(3):
        labels = (
            nbr.join(labels.withColumnRenamed("v", "u"), "u")
            .groupBy("v", "lbl")
            .agg(F.count("*").cast("long").alias("c"))
            .groupBy("v")
            .agg(
                F.max_by(
                    "lbl", F.struct(F.col("c"), (-F.col("lbl")).alias("neg"))
                ).alias("lbl")
            )
            .localCheckpoint(eager=True)
        )
    return (
        labels.groupBy("lbl")
        .agg(F.count("*").cast("long").alias("comm_size"))
        .groupBy("comm_size")
        .agg(F.count("*").cast("long").alias("n_communities"))
        .orderBy("comm_size")
    )


@query(
    "graph_resource_allocation_index",
    oracle=f"""
    WITH {_EDGES_CTE},
    und AS (
      SELECT pa AS a, pb AS b FROM edges
      UNION ALL
      SELECT pb AS a, pa AS b FROM edges
    ),
    deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY a),
    wedge AS (
      SELECT e1.b AS x, e2.b AS y,
             CAST(count(*) AS BIGINT) AS common,
             CAST(sum(1000000 // dm.d) AS BIGINT) AS ra_micro
      FROM und e1
      JOIN und e2 ON e1.a = e2.a AND e1.b < e2.b
      JOIN deg dm ON dm.node = e1.a
      GROUP BY e1.b, e2.b
    ),
    cand AS (
      SELECT w.x, w.y, w.common, w.ra_micro FROM wedge w
      WHERE NOT EXISTS (
        SELECT 1 FROM edges e WHERE e.pa = w.x AND e.pb = w.y
      )
    )
    SELECT x, y, common, ra_micro
    FROM cand
    ORDER BY ra_micro DESC, x, y
    LIMIT 20
    """,
)
def graph_resource_allocation_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-allocation link prediction (Zhou-Lu-Zhang) — the
    degree-weighted refinement of graph_jaccard_link_prediction: a
    common neighbor z contributes 1/deg(z), so hub middles count less
    than exclusive ones. Same wedge-enumeration shape (adjacency
    self-joined on the middle node — bounded fan-out, never all-pairs)
    with the middle's degree joined in BEFORE the wedge groupBy; the
    per-wedge weight is QUANTIZED to integer micro-units
    (1000000 DIV deg — positive floor division agrees cross-engine),
    so the sum stays hash-exact while ranking differs from true RA
    only below ppm. Existing edges anti-join out against the broadcast
    thresholded edge list; top-20 plans as TakeOrderedAndProject under
    the total tie-break (score, x, y)."""
    edges = _edges(spark, sf_dir)
    # shared pins — one name across the graph family, see _bidir.
    und = _bidir(spark, sf_dir).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    deg = _bidir_deg(spark, sf_dir).select(
        F.col("src").alias("a"), F.col("deg").cast("long").alias("d")
    )
    e1 = und.select(F.col("a").alias("m"), F.col("b").alias("x"))
    e2 = und.select(F.col("a").alias("m2"), F.col("b").alias("y"))
    dm = deg.select(F.col("a").alias("m3"), F.col("d").alias("dm"))
    wedge = (
        e1.join(e2, (F.col("m") == F.col("m2")) & (F.col("x") < F.col("y")))
        .join(F.broadcast(dm), F.col("m") == F.col("m3"))
        .groupBy("x", "y")
        .agg(
            F.count("*").cast("long").alias("common"),
            F.sum(F.expr("1000000 DIV dm")).cast("long").alias("ra_micro"),
        )
    )
    cand = wedge.join(
        F.broadcast(edges.select(F.col("pa").alias("x"), F.col("pb").alias("y"))),
        ["x", "y"],
        "left_anti",
    )
    return (
        cand.select("x", "y", "common", "ra_micro")
        .orderBy(F.desc("ra_micro"), "x", "y")
        .limit(20)
    )


def _bfs_oracle(rounds: int) -> str:
    """Unrolled multi-source BFS oracle: dist_k holds min-hop
    assignments after k expansion rounds. AS MATERIALIZED per round
    (the LPA/k-core lesson — inlining doubles scans per level)."""
    parts = [f"""WITH {_EDGES_CTE},
    nbr AS MATERIALIZED (
      SELECT pa AS v, pb AS u FROM edges
      UNION ALL
      SELECT pb AS v, pa AS u FROM edges
    ),
    dist0 AS MATERIALIZED (
      SELECT v, 0 AS hop FROM (SELECT DISTINCT v FROM nbr)
      ORDER BY v LIMIT 5
    )"""]
    for k in range(1, rounds + 1):
        parts.append(f""",
    dist{k} AS MATERIALIZED (
      SELECT v, hop FROM dist{k - 1}
      UNION ALL
      SELECT t.v, {k} AS hop FROM (
        SELECT DISTINCT n.v
        FROM nbr n JOIN dist{k - 1} f ON n.u = f.v AND f.hop = {k - 1}
      ) t
      WHERE NOT EXISTS (SELECT 1 FROM dist{k - 1} p WHERE p.v = t.v)
    )""")
    parts.append(f"""
    SELECT CAST(hop AS INT) AS hop,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(v) AS BIGINT) AS sum_node_ids
    FROM dist{rounds}
    GROUP BY hop ORDER BY hop""")
    return "".join(parts)


@query("graph_bfs_hops", oracle=_bfs_oracle(4))
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source breadth-first search over the co-purchase graph —
    the reachability primitive under 'distance from the catalog's
    anchor products': the 5 smallest node ids seed hop 0, and 4 FIXED
    synchronous expansion rounds (the label-propagation discipline)
    assign every reached node its minimum hop. Per round: one join of
    the frontier against the adjacency + one distinct + one anti-join
    against already-visited — all hash shuffles on node id, no
    windows; rounds localCheckpoint so the plan stays linear in depth.
    Output is the hop histogram with a sum-of-ids witness per level
    (hash-pins WHICH nodes landed at each hop, not just how many).
    Scale: frontier joins are bounded by the thresholded edge list
    (module docstring); fixing the depth bounds plan size, exactly the
    iterative-algorithm rule the k-core/HITS/LPA family follows."""
    e = _edges(spark, sf_dir).select("pa", "pb").localCheckpoint(eager=True)
    nbr = e.select(F.col("pa").alias("v"), F.col("pb").alias("u")).unionAll(
        e.select(F.col("pb").alias("v"), F.col("pa").alias("u"))
    ).localCheckpoint(eager=True)
    dist = (
        nbr.select("v").distinct().orderBy("v").limit(5)
        .select("v", F.lit(0).alias("hop"))
        .localCheckpoint(eager=True)
    )
    for k in range(1, 5):
        frontier = dist.filter(F.col("hop") == k - 1).select(
            F.col("v").alias("u"))
        reached = nbr.join(frontier, "u").select("v").distinct()
        fresh = reached.join(dist.select("v"), "v", "left_anti").select(
            "v", F.lit(k).alias("hop"))
        dist = dist.unionAll(fresh).localCheckpoint(eager=True)
    return (
        dist.groupBy("hop")
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.sum("v").cast("long").alias("sum_node_ids"),
        )
        .orderBy("hop")
    )


_CC_ROUNDS = 14


def _cc_oracle(rounds: int) -> str:
    """Unrolled min-label connected components; the final SELECT also
    recomputes the last round to pin the CONVERGED certificate."""
    parts = [f"""WITH {_EDGES_CTE},
    nbr AS MATERIALIZED (
      SELECT pa AS v, pb AS u FROM edges
      UNION ALL
      SELECT pb AS v, pa AS u FROM edges
    ),
    c0 AS MATERIALIZED (SELECT DISTINCT v, v AS lbl FROM nbr)"""]
    for k in range(1, rounds + 1):
        parts.append(f""",
    c{k} AS MATERIALIZED (
      SELECT p.v, least(p.lbl, min(l.lbl)) AS lbl
      FROM c{k - 1} p JOIN nbr n ON n.v = p.v JOIN c{k - 1} l ON l.v = n.u
      GROUP BY p.v, p.lbl
    )""")
    parts.append(f""",
    conv AS (
      SELECT CAST(count(*) AS BIGINT) AS n_changed
      FROM c{rounds - 1} a JOIN c{rounds} b ON a.v = b.v AND a.lbl <> b.lbl
    )
    SELECT CAST(comp_size AS BIGINT) AS comp_size,
           CAST(count(*) AS BIGINT) AS n_components,
           (SELECT n_changed = 0 FROM conv) AS converged
    FROM (SELECT lbl, count(*) AS comp_size FROM c{rounds} GROUP BY lbl)
    GROUP BY comp_size
    ORDER BY comp_size""")
    return "".join(parts)


@query("graph_connected_components", oracle=_cc_oracle(_CC_ROUNDS))
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by synchronous MIN-label propagation over
    the co-purchase graph — the clustering primitive under every dedup
    pipeline (streaming_dedup_clusters maintains the same thing
    incrementally; this is the batch baseline). Fixed 14 rounds (the
    measured worst convergence across test SFs is 11) with the
    convergence CERTIFICATE gated: the output carries
    converged = (last round changed nothing), so data needing deeper
    propagation fails the hash gate instead of shipping a wrong
    histogram. Per round: one groupBy(v) min over the neighbor join,
    localCheckpointed so the plan stays linear in rounds. The 100 TB
    form is graph_cc_star below (operators/dedup.
    connected_components_star — large-star/small-star, O(log n)
    rounds independent of diameter); this fixed-round sync propagation
    stays as the oracle-matchable baseline, and the certificate is
    what makes its truncation honest. Output is the component-size
    histogram."""
    e = _edges(spark, sf_dir).select("pa", "pb").localCheckpoint(eager=True)
    nbr = e.select(F.col("pa").alias("v"), F.col("pb").alias("u")).unionAll(
        e.select(F.col("pb").alias("v"), F.col("pa").alias("u"))
    ).localCheckpoint(eager=True)
    lbl = nbr.select("v").distinct().select("v", F.col("v").alias("lbl"))
    prev = None
    for _ in range(_CC_ROUNDS):
        prev = lbl
        nlbl = (
            nbr.join(lbl.select(F.col("v").alias("u"), F.col("lbl").alias("ul")),
                     "u")
            .groupBy("v")
            .agg(F.min("ul").alias("mn"))
        )
        lbl = (
            prev.join(nlbl, "v")
            .select("v", F.least(F.col("lbl"), F.col("mn")).alias("lbl"))
            .localCheckpoint(eager=True)
        )
    n_changed = (
        prev.select("v", F.col("lbl").alias("a"))
        .join(lbl.select("v", F.col("lbl").alias("b")), "v")
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    return (
        lbl.groupBy("lbl")
        .agg(F.count("*").cast("long").alias("comp_size"))
        .groupBy("comp_size")
        .agg(F.count("*").cast("long").alias("n_components"))
        .select("comp_size", "n_components",
                F.lit(n_changed == 0).alias("converged"))
        .orderBy("comp_size")
    )


@query("graph_cc_star", oracle=_cc_oracle(_CC_ROUNDS))
def graph_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by ALTERNATING LARGE-STAR/SMALL-STAR
    (operators/dedup.connected_components_star; Kiveris et al.
    SoCC'14) over the same co-purchase graph — the O(log n)-round
    100 TB form graph_connected_components defers to: round count is
    independent of component diameter, where min-label propagation
    needs O(diameter) rounds (a path component of 10^6 nodes = 10^6
    rounds vs ~20). Oracle SHARED with the propagation query — the
    two algorithms must produce the identical component-size
    histogram (and the star form RAISES if unconverged, so
    converged=true is by construction; the oracle's certificate is
    the propagation form's n_changed=0). Per round: two shuffles on
    the grouping node over an edge set that never exceeds the
    symmetrized input — no windows, no driver-side data."""
    from postrack_spark.operators.dedup import connected_components_star

    e = _edges(spark, sf_dir).select("pa", "pb")
    labels = connected_components_star(e, node_a="pa", node_b="pb")
    return (
        labels.groupBy("cluster")
        .agg(F.count("*").cast("long").alias("comp_size"))
        .groupBy("comp_size")
        .agg(F.count("*").cast("long").alias("n_components"))
        .select("comp_size", "n_components", F.lit(True).alias("converged"))
        .orderBy("comp_size")
    )


_PPR_ORACLE = """
    WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM po a JOIN po b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    edges AS (SELECT pa, pb FROM pairs GROUP BY pa, pb HAVING count(*) >= 2),
    bidir AS (SELECT pa AS src, pb AS dst FROM edges
              UNION ALL SELECT pb, pa FROM edges),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM bidir GROUP BY src),
    start AS (SELECT src AS s FROM deg ORDER BY d DESC, src LIMIT 1),
    r0 AS (
      SELECT src AS node, d,
             CAST(CASE WHEN src = (SELECT s FROM start)
                       THEN 1000000 ELSE 0 END AS BIGINT) AS r
      FROM deg
    ),
    c1 AS (
      SELECT b.dst AS node, CAST(sum(r.r // r.d) AS BIGINT) AS s
      FROM r0 r JOIN bidir b ON b.src = r.node GROUP BY b.dst
    ),
    r1 AS (
      SELECT r0.node, r0.d,
             CAST(CASE WHEN r0.node = (SELECT s FROM start)
                       THEN 150000 ELSE 0 END
                  + (850 * coalesce(c1.s, 0)) // 1000 AS BIGINT) AS r
      FROM r0 LEFT JOIN c1 ON c1.node = r0.node
    ),
    c2 AS (
      SELECT b.dst AS node, CAST(sum(r.r // r.d) AS BIGINT) AS s
      FROM r1 r JOIN bidir b ON b.src = r.node GROUP BY b.dst
    ),
    r2 AS (
      SELECT r1.node, r1.d,
             CAST(CASE WHEN r1.node = (SELECT s FROM start)
                       THEN 150000 ELSE 0 END
                  + (850 * coalesce(c2.s, 0)) // 1000 AS BIGINT) AS r
      FROM r1 LEFT JOIN c2 ON c2.node = r1.node
    ),
    c3 AS (
      SELECT b.dst AS node, CAST(sum(r.r // r.d) AS BIGINT) AS s
      FROM r2 r JOIN bidir b ON b.src = r.node GROUP BY b.dst
    ),
    r3 AS (
      SELECT r2.node, r2.d,
             CAST(CASE WHEN r2.node = (SELECT s FROM start)
                       THEN 150000 ELSE 0 END
                  + (850 * coalesce(c3.s, 0)) // 1000 AS BIGINT) AS r
      FROM r2 LEFT JOIN c3 ON c3.node = r2.node
    ),
    c4 AS (
      SELECT b.dst AS node, CAST(sum(r.r // r.d) AS BIGINT) AS s
      FROM r3 r JOIN bidir b ON b.src = r.node GROUP BY b.dst
    ),
    r4 AS (
      SELECT r3.node,
             CAST(CASE WHEN r3.node = (SELECT s FROM start)
                       THEN 150000 ELSE 0 END
                  + (850 * coalesce(c4.s, 0)) // 1000 AS BIGINT) AS r
      FROM r3 LEFT JOIN c4 ON c4.node = r3.node
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(r AS BIGINT) AS ppr_micros
    FROM r4 WHERE r > 0
    ORDER BY ppr_micros DESC, node LIMIT 10
"""


@query("graph_personalized_pagerank", oracle=_PPR_ORACLE)
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSONALIZED PageRank from the hub (highest-degree node, src
    tie-break) of the co-purchase graph: all restart mass returns to
    the source, so the ranking answers "which parts sit closest to
    THIS part's neighborhood" — the recommendation/similarity variant
    of the global walk (graph_pagerank_top10). Same fixed-point
    discipline: micro-rank integers, integer division per step, 4
    unrolled iterations — the oracle runs the identical recurrence as
    chained CTEs, so an iterative personalized walk is hash-exact
    cross-engine. Mass leaks at rank-0 fringe nodes by design
    (positive ranks only emitted). Plan: per-iteration one
    co-partitioned join + one aggregation; lineage truncated per step
    (localCheckpoint) so iteration N never replays 1..N-1."""
    # shared pins — one name across the graph family, see _bidir.
    bidir = _bidir(spark, sf_dir)
    deg = _bidir_deg(spark, sf_dir).select("src", F.col("deg").alias("d"))
    start = deg.orderBy(F.desc("d"), "src").limit(1).select(
        F.col("src").alias("s_node"))
    ranks = (
        deg.crossJoin(F.broadcast(start))
        .select(
            F.col("src").alias("node"),
            "d",
            F.when(F.col("src") == F.col("s_node"), F.lit(1000000))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("r"),
            "s_node",
        )
    )
    for _ in range(4):
        contrib = (
            ranks.join(bidir.select(F.col("src").alias("node"), "dst"),
                       "node")
            .select("dst", F.expr("r DIV d").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            ranks.join(contrib, ranks.node == contrib.dst, "left")
            .select(
                "node",
                "d",
                (
                    F.when(F.col("node") == F.col("s_node"), F.lit(150000))
                    .otherwise(F.lit(0))
                    + F.expr("(850 * coalesce(s, 0)) DIV 1000")
                )
                .cast("bigint")
                .alias("r"),
                "s_node",
            )
            .localCheckpoint()
        )
    return (
        ranks.filter(F.col("r") > 0)
        .select("node", F.col("r").alias("ppr_micros"))
        .orderBy(F.col("ppr_micros").desc(), "node")
        .limit(10)
    )
