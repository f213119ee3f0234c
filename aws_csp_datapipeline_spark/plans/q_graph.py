"""Graph queries over the supplier co-supply network.

Edge list: suppliers that supplied the same order (market-basket
projection of ``lineitem`` — see ``operators/graph.
co_occurrence_edges``). Triangle count and degree histogram are pure
SQL (oracled); PageRank is iterative (rows-only, pinned by a
numpy-power-iteration pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_csp_datapipeline_spark.catalog import load_table
from aws_csp_datapipeline_spark.operators import graph as G
from aws_csp_datapipeline_spark.plans.registry import register

_EDGES_CTE = """
    WITH e AS (
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    )
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-supply edge list as a persisted corpus ARTIFACT
    (``operators/graph.build_edge_artifact`` via the fingerprint-keyed
    cache): the lineitem self-join + distinct — ~95% of gr7's 1,238 s
    at sf100 when every lane re-ran it — is paid once per corpus;
    every gr lane after that reads a two-long-column parquet,
    src-clustered for the lanes' node-keyed joins. The cache key folds
    in lineitem's file sizes/mtimes, so a regenerated corpus rebuilds
    instead of serving a stale graph."""
    from aws_csp_datapipeline_spark.functions.artifact_cache import (
        get_or_build,
    )

    def build(staging: str) -> None:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey"
        )
        G.build_edge_artifact(li, "l_orderkey", "l_suppkey", staging)

    adir = get_or_build(
        "cosupply_edges",
        sf_dir,
        ["lineitem"],
        {"group": "l_orderkey", "node": "l_suppkey", "v": 1},
        build,
    )
    return G.load_edges(spark, adir)


@register(
    "gr1_triangle_count",
    _EDGES_CTE
    + """
    SELECT COUNT(*) AS n_triangles
    FROM e e1
    JOIN e e2 ON e2.src = e1.dst
    JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
    """,
)
def gr1_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the co-supply graph: supplier triples that have
    pairwise shared orders. Wedge join + closure join over the
    canonical src<dst edge list."""
    return G.triangle_count(_edges(spark, sf_dir))


@register(
    "gr2_degree_hist",
    _EDGES_CTE
    + """
    , ends AS (
      SELECT src AS node FROM e UNION ALL SELECT dst FROM e
    ), deg AS (
      SELECT node, COUNT(*) AS degree FROM ends GROUP BY node
    )
    SELECT degree, COUNT(*) AS n_nodes FROM deg GROUP BY degree
    """,
)
def gr2_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-supply graph (how many partners
    each supplier has, histogrammed)."""
    return G.degree_histogram(_edges(spark, sf_dir))


def _pagerank_oracle(iters: int = 12, d: float = 0.85) -> str:
    """Fixed-iteration PageRank as chained (non-recursive) CTEs —
    r1..r{iters} each one join+aggregate over the previous ranks,
    mirroring ``operators.graph.pagerank`` exactly (uniform init,
    (1-d)/n teleport, undirected edges walked both ways). Rounding to
    6 decimals is safe: the closest unrounded rank to a rounding
    midpoint is ~5e-10 away at sf0.1 (measured), ~1e-12 from grid
    points at sf0.01 — orders beyond cross-engine sum-order drift."""
    parts = [
        """
    WITH e AS (
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ),
    bi AS (SELECT src, dst FROM e
           UNION ALL SELECT dst AS src, src AS dst FROM e),
    deg AS (SELECT src, COUNT(*) AS out_deg FROM bi GROUP BY src),
    adj AS (SELECT bi.src, bi.dst, deg.out_deg FROM bi JOIN deg USING (src)),
    nodes AS (SELECT DISTINCT src AS node FROM bi),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""",
    r{i} AS (
      SELECT adj.dst AS node,
             (1.0 - {d}) / (SELECT n FROM nn)
               + {d} * SUM(r{i - 1}.pr / adj.out_deg) AS pr
      FROM adj JOIN r{i - 1} ON adj.src = r{i - 1}.node
      GROUP BY adj.dst
    )"""
        )
    parts.append(
        f"""
    SELECT node, ROUND(pr, 6) AS pr
    FROM r{iters}
    ORDER BY ROUND(pr, 6) DESC, node LIMIT 20"""
    )
    return "".join(parts)


@register("gr3_pagerank_top", _pagerank_oracle())
def gr3_pagerank_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 suppliers by PageRank in the co-supply graph. Iterative
    (12 join+aggregate rounds, ``localCheckpoint`` keeping lineage
    flat); the fixed iteration count makes it SQL-expressible after
    all — the oracle unrolls the 12 rounds as chained CTEs — and the
    algorithm is additionally pinned against numpy power iteration in
    ``tests/test_graph.py``."""
    pr = G.pagerank(_edges(spark, sf_dir), damping=0.85, iterations=12)
    return (
        pr.select("node", F.round("pr", 6).alias("pr"))
        .orderBy(F.col("pr").desc(), "node")
        .limit(20)
    )


@register(
    "gr4_hierarchy_closure",
    """
    WITH RECURSIVE e AS (
      SELECT c_custkey AS node, c_custkey // 10 AS parent
      FROM customer WHERE c_custkey > 0
    ), closure AS (
      SELECT node, parent AS anc, 1 AS depth FROM e
      UNION ALL
      SELECT c.node, e.parent, c.depth + 1 FROM closure c JOIN e ON c.anc = e.node
    )
    SELECT CAST(depth AS BIGINT) AS depth, COUNT(*) AS n_pairs,
           CAST(SUM(anc) AS BIGINT) AS anc_sum
    FROM closure GROUP BY depth
    """,
)
def gr4_hierarchy_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of a key-derived hierarchy (node →
    floor(node/10)): the recursive-CTE workload (org charts, BOM
    explosion) Spark lacks natively, run as a driver-controlled BFS —
    each round one equi-join of the frontier against the edge list,
    frontier localCheckpointed so lineage stays flat. Rounds =
    hierarchy DEPTH (4 here, ~O(log) for fan-out trees), not row
    count; the frontier shrinks as chains reach the root. Summarized
    per depth; the DuckDB oracle is the actual WITH RECURSIVE."""
    c = load_table(spark, sf_dir, "customer")
    e = (
        c.filter(F.col("c_custkey") > 0)
        .select(
            F.col("c_custkey").cast("long").alias("node"),
            F.floor(F.col("c_custkey") / 10).cast("long").alias("parent"),
        )
    )
    e = e.localCheckpoint(eager=True)
    frontier = e.select(
        "node", F.col("parent").alias("anc"), F.lit(1).cast("long").alias("depth")
    ).localCheckpoint(eager=True)
    levels = [frontier]
    while True:
        nxt = (
            frontier.join(e.select(F.col("node").alias("anc"),
                                   F.col("parent").alias("next_anc")), "anc")
            .select(
                "node",
                F.col("next_anc").alias("anc"),
                (F.col("depth") + 1).alias("depth"),
            )
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        levels.append(nxt)
        frontier = nxt
    closure = levels[0]
    for lv in levels[1:]:
        closure = closure.unionByName(lv)
    return closure.groupBy("depth").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("anc").cast("long").alias("anc_sum"),
    )


def _kcore_oracle(k: int = 3, rounds: int = 4) -> str:
    """Iterative k-core peeling unrolled to a fixed depth: each round
    recomputes degrees within the surviving node set and drops nodes
    below ``k``. Peeling is idempotent once converged, so the unroll
    is exact whenever the fixpoint is reached within ``rounds`` (the
    test graphs converge in one round — min degree ≥ k everywhere; a
    deeper-peeling testdata generation would mismatch LOUDLY rather
    than silently). Deeper adversarial peelings are pinned by the
    pure-Python reference in tests/test_graph.py."""
    parts = [
        """
    WITH e AS (
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ),
    bi AS (SELECT src, dst FROM e
           UNION ALL SELECT dst AS src, src AS dst FROM e),
    n0 AS (SELECT DISTINCT src AS node FROM bi)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
    d{i} AS (SELECT bi.src AS node, COUNT(*) AS deg
             FROM bi
             JOIN n{i - 1} x ON bi.src = x.node
             JOIN n{i - 1} y ON bi.dst = y.node
             GROUP BY bi.src),
    n{i} AS (SELECT node FROM d{i} WHERE deg >= {k})"""
        )
    parts.append(
        f"""
    SELECT node, deg AS degree
    FROM (SELECT bi.src AS node, COUNT(*) AS deg
          FROM bi
          JOIN n{rounds} x ON bi.src = x.node
          JOIN n{rounds} y ON bi.dst = y.node
          GROUP BY bi.src) t
    WHERE deg >= {k}"""
    )
    return "".join(parts)


@register("gr5_kcore", _kcore_oracle())
def gr5_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the co-supply graph: the maximal subgraph where every
    supplier retains ≥3 partners — the density filter that separates
    a connected hub from hangers-on before community detection.
    Driver-controlled fixpoint peeling (shrinking drop set) on the
    Spark side; the oracle unrolls the idempotent peel to a fixed
    depth (see ``_kcore_oracle``), and deeper peelings are pinned
    against a pure-Python reference in tests/test_graph.py."""
    core = G.kcore(_edges(spark, sf_dir), k=3)
    return core.select("node", "degree")


@register(
    "gr6_neighbor_jaccard",
    _EDGES_CTE
    + """
    , sym AS (
      SELECT src, dst FROM e UNION SELECT dst, src FROM e
    ),
    deg AS (SELECT src AS v, COUNT(*) AS d FROM sym GROUP BY 1),
    cn AS (
      SELECT a.src AS node_a, b.src AS node_b,
             CAST(COUNT(*) AS BIGINT) AS common
      FROM sym a JOIN sym b ON a.dst = b.dst AND a.src < b.src
      GROUP BY 1, 2
    )
    SELECT node_a, node_b, common,
           ROUND(CAST(common AS DOUBLE) / (da.d + db.d - common), 4)
             AS jaccard
    FROM cn
    JOIN deg da ON cn.node_a = da.v
    JOIN deg db ON cn.node_b = db.v
    ORDER BY jaccard DESC, node_a, node_b
    LIMIT 20
    """,
)
def gr6_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural node similarity: Jaccard of neighbor sets over the
    supplier co-occurrence graph — the link-prediction / role-
    equivalence primitive (two suppliers that serve the same orders
    are interchangeable). Common neighbors come from ONE self-join on
    the shared-neighbor column (never materializing neighbor sets as
    arrays), so the cost is Σ deg(n)² over neighbors — the standard
    2-hop bound — and degree tables broadcast back onto the
    constant-size pair aggregate."""
    edges = _edges(spark, sf_dir)
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    deg = sym.groupBy(F.col("src").alias("v")).agg(F.count(F.lit(1)).alias("d"))
    a = sym.select(F.col("src").alias("node_a"), F.col("dst").alias("n"))
    b = sym.select(F.col("src").alias("node_b"), F.col("dst").alias("n"))
    cn = (
        a.join(b, "n")
        .filter(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    da = deg.select(F.col("v").alias("node_a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("node_b"), F.col("d").alias("db"))
    return (
        cn.join(F.broadcast(da), "node_a")
        .join(F.broadcast(db), "node_b")
        .select(
            "node_a",
            "node_b",
            "common",
            F.round(
                F.col("common").cast("double")
                / (F.col("da") + F.col("db") - F.col("common")),
                4,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("node_a"), F.asc("node_b"))
        .limit(20)
    )


def _lpa_oracle(iterations: int = 3) -> str:
    """gr7's SQL twin, generated: synchronous LPA unrolls into one
    chained CTE per round (join neighbors' labels -> per-(node,label)
    count -> per-node top-1 with the count-desc/label-asc tie rule),
    exactly the operator's update."""
    sql = _EDGES_CTE + """
    , und AS (
      SELECT src AS u, dst AS v FROM e
      UNION ALL
      SELECT dst AS u, src AS v FROM e
    ),
    l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM und)
"""
    for i in range(1, iterations + 1):
        sql += f"""
    , c{i} AS (
      SELECT und.u AS node, l.lbl, COUNT(*) AS c
      FROM und JOIN l{i-1} l ON l.node = und.v
      GROUP BY und.u, l.lbl
    ),
    l{i} AS (
      SELECT node, lbl FROM c{i}
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY node ORDER BY c DESC, lbl ASC) = 1
    )
"""
    sql += f"""
    SELECT CAST(lbl AS BIGINT) AS community,
           CAST(COUNT(*) AS BIGINT) AS n_members
    FROM l{iterations}
    GROUP BY lbl
    ORDER BY n_members DESC, community
    LIMIT 20
"""
    return sql


@register("gr7_label_propagation", _lpa_oracle())
def gr7_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the co-supply graph: 3 rounds of
    synchronous label propagation (`operators/graph.
    label_propagation` — deterministic count-desc/label-asc tie rule,
    so the chained-CTE oracle reproduces it exactly), reported as the
    top-20 community sizes. The near-linear community detector a
    feed-governance pipeline runs where connected components (d6's
    union-find) is too coarse: LPA splits a weakly-bridged graph into
    its dense cores instead of one giant component."""
    labels = G.label_propagation(_edges(spark, sf_dir), iterations=3)
    return (
        labels.groupBy(F.col("label").cast("bigint").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .orderBy(F.desc("n_members"), F.asc("community"))
        .limit(20)
    )


@register(
    "gr8_triangle_estimate",
    _EDGES_CTE
    + """
    , s AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               list_reduce(
                 [strpos('0123456789abcdef', m[i]) - 1
                  FOR i IN range(1, 9)],
                 (a, b) -> a * 16 + b) % 1000 AS coin
        FROM (SELECT src, dst, md5(src || '_' || dst) AS m FROM e)
      ) WHERE coin < 100
    ),
    tri AS (
      SELECT COUNT(*) AS n
      FROM s e1
      JOIN s e2 ON e2.src = e1.dst
      JOIN s e3 ON e3.src = e1.src AND e3.dst = e2.dst
    )
    SELECT CAST(n AS BIGINT) AS n_sampled_triangles,
           CAST(n * 1000 AS BIGINT) AS est_triangles
    FROM tri
    """,
)
def gr8_triangle_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doulion triangle estimate over the co-supply graph — the DENSE-
    regime companion to gr1 (round-11 finding: at sf100 the co-supply
    graph is ~91%-complete per 1000-supplier replica block and holds
    ~10¹¹ triangles, so EXACT enumeration is work-bound on any engine
    — it must write a row per closed wedge). Edge sampling at p=0.1
    with a deterministic md5 coin keeps the lane oracle-pairable (the
    same sampled graph exists on both engines) and shrinks wedge
    volume ~1000×; the count scales by exactly 1/p³ = 1000 in integer
    arithmetic. gr1 stays the exact form and the estimator's
    small-scale sanity anchor (tests/test_graph.py pins estimate ==
    exact at p=1 and the integer 1/p³ scale-up; the registry oracle
    pins the full sampled-count arithmetic at sf0.01)."""
    return G.triangle_count_estimate(_edges(spark, sf_dir), p_mille=100)


def _gr9_oracle(k: int = 24, bands: int = 8, r: int = 3) -> str:
    """Restates ``operators/graph.neighbor_jaccard_estimate`` in the
    portable family end-to-end: the 31-bit md5 base hash per
    neighbor, the identical (a_j·x + b_j) mod 2^31 permutation
    constants (``dedup._perm_constants`` as literals), the same
    bands×r banding keys, the same DISTINCT candidate join, and the
    same matching-slot estimate. est_jaccard = matches/k is
    non-negative, so no -0.0 fold is needed."""
    from aws_csp_datapipeline_spark.functions.dedup import _perm_constants

    consts = _perm_constants(k)
    mins = ",\n             ".join(
        f"MIN((h * {a} + {b}) % 2147483648) AS mh{j}"
        for j, (a, b) in enumerate(consts)
    )
    band_selects = "\n      UNION ALL\n      ".join(
        f"SELECT node, {b} AS band, "
        + " || '_' || ".join(
            f"CAST(mh{b * r + i} AS VARCHAR)" for i in range(r)
        )
        + " AS key FROM sig"
        for b in range(bands)
    )
    matches = " + ".join(
        f"(CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END)"
        for j in range(k)
    )
    return f"""
    WITH e AS (
      SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    ),
    sym AS (
      SELECT src AS node, dst AS nbr FROM e
      UNION ALL SELECT dst, src FROM e
    ),
    hx AS (
      SELECT node,
             [list_reduce([strpos('0123456789abcdef', m[i]) - 1
                           FOR i IN range(1, 9)],
                          (a, b) -> a * 16 + b) % 2147483648
              FOR m IN [md5(CAST(nbr AS VARCHAR))]][1] AS h
      FROM sym
    ),
    sig AS (
      SELECT node,
             {mins}
      FROM hx GROUP BY node
    ),
    banded AS (
      {band_selects}
    ),
    cand AS (
      SELECT a.node AS node_a, b.node AS node_b
      FROM banded a JOIN banded b USING (band, key)
      WHERE a.node < b.node
      GROUP BY 1, 2
    ),
    est AS (
      SELECT node_a, node_b,
             ({matches}) / {k}.0 AS ej
      FROM cand
      JOIN sig sa ON cand.node_a = sa.node
      JOIN sig sb ON cand.node_b = sb.node
    )
    SELECT node_a, node_b, ROUND(ej, 4) AS est_jaccard
    FROM est ORDER BY est_jaccard DESC, node_a, node_b LIMIT 20
    """


@register("gr9_neighbor_jaccard_estimate", _gr9_oracle())
def gr9_neighbor_jaccard_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Neighbor-set Jaccard ESTIMATE via MinHash-LSH over adjacency —
    the dense-regime lane for gr6 exactly as gr8 (Doulion) is for
    gr1. gr6's exact 2-hop join is work-bound on near-complete graphs
    (Σ deg(n)² ≈ 8·10¹¹ rows at sf100, gr1's regime); this lane is
    one linear signature pass (each neighbor hashed once; k=24
    permutations as integer multiply-adds; one groupBy(node) with 24
    map-side-combined MINs) plus a banded bucket join bounded by
    bucket populations — d3's LSH architecture applied to the graph.
    The 8×3 banding catches J ≥ 0.8 pairs with P ≥ 98.7%; the
    estimate's σ is √(J(1-J)/24) ≈ 0.08 at J = 0.5. Portable hash
    family end-to-end (md5-derived base + engine-neutral integer
    permutations), so the oracle reproduces candidates AND estimates
    exactly; the xxhash64 family in
    ``operators/graph.neighbor_minhash_signatures`` stays the
    cheaper in-engine default. Estimator-vs-exact accuracy is pinned
    in tests/test_graph.py on a known graph."""
    est = G.neighbor_jaccard_estimate(
        _edges(spark, sf_dir), k=24, bands=8, rows_per_band=3, hash="portable"
    )
    return (
        est.select(
            "node_a", "node_b", F.round("est_jaccard", 4).alias("est_jaccard")
        )
        .orderBy(F.desc("est_jaccard"), F.asc("node_a"), F.asc("node_b"))
        .limit(20)
    )
