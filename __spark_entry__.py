"""Driver contract for the spark-graft builder (PySpark target).

Graph kernels from SURVEY.md §2 registered over graphs derived
in-query from the driver's testdata tables (FIXTURES.md §3), each with
a DuckDB-runnable oracle. Natural int64 keys are used as vertex ids
here (dense-id assignment is exercised in tests/ and jobs/, but for
oracle comparability the queries operate on the raw keys; supplier
keys are offset by 1_000_000 to keep the two vertex namespaces
disjoint).

Float-valued results are rounded to 9 decimals on BOTH sides so the
driver's value-hash comparison is insensitive to summation order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SUPP_OFFSET = 1_000_000


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def _part_supp_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """edges = distinct (l_partkey -> offset + l_suppkey)."""
    li = _lineitem(spark, sf_dir)
    return li.select(
        F.col("l_partkey").alias("src"),
        (F.lit(SUPP_OFFSET) + F.col("l_suppkey")).alias("dst"),
    ).distinct()


def _cust_supp_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """edges = distinct (o_custkey -> offset + l_suppkey) via orders ⋈ lineitem."""
    li = _lineitem(spark, sf_dir)
    o = _orders(spark, sf_dir)
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(SUPP_OFFSET) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )


def _copart_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-occurrence graph: parts appearing in the same order,
    oriented src < dst, deduped (triangle-rich)."""
    li = _lineitem(spark, sf_dir).select("l_orderkey", "l_partkey")
    a = li.withColumnRenamed("l_partkey", "src")
    b = li.withColumnRenamed("l_partkey", "dst")
    return (
        a.join(b, "l_orderkey")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def _graph(edges: DataFrame):
    from linkgraph.build import build_graph_from_edges

    return build_graph_from_edges(edges)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_degree_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out/in-degree table of the part→supplier graph (engine degree
    derivation, SURVEY §2.1/S2)."""
    g = _graph(_part_supp_edges(spark, sf_dir))
    return g.degrees.select("id", "out_deg", "in_deg")


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the symmetrized co-part graph (SURVEY §2.6)."""
    from linkgraph.kernels import triangle_count

    g = _graph(_copart_edges(spark, sf_dir))
    res = triangle_count(g)
    return spark.createDataFrame([(res.count,)], "n_triangles long")


def q_cc_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components (hash-min, symmetrized) of the
    customer→supplier graph; returns per-component sizes keyed by the
    min-id label (SURVEY §2.4/A1)."""
    from linkgraph.kernels import connected_components

    g = _graph(_cust_supp_edges(spark, sf_dir))
    res = connected_components(g)
    return (
        res.df.groupBy("comp")
        .agg(F.count("*").alias("csize"))
        .select("comp", "csize")
    )


def q_pagerank_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 3 power-iteration rounds with dangling-mass
    redistribution on the customer→supplier graph (SURVEY §2.4/A3a);
    ranks rounded to 9 decimals for order-insensitive comparison."""
    from linkgraph.kernels import pagerank

    g = _graph(_cust_supp_edges(spark, sf_dir))
    res = pagerank(g, tol=0.0, max_iter=3)
    return res.df.select("id", F.round("rank", 9).alias("rank"))


def q_pagerank_weighted_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 3 weighted-PageRank rounds (kernels/pagerank_w.py) on
    the customer→supplier graph with (order, lineitem) pair
    multiplicity as the edge weight — rank flows proportionally to
    link multiplicity, the host-graph ranking semantics. Integer
    weights make p = w/wsum an exact division; ranks ROUND(9)."""
    from linkgraph.kernels import pagerank_weighted

    li = _lineitem(spark, sf_dir)
    o = _orders(spark, sf_dir)
    wdf = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.lit(SUPP_OFFSET) + F.col("l_suppkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    g = _graph(wdf.select("src", "dst"))
    res = pagerank_weighted(g, wdf, tol=0.0, max_iter=3)
    return res.df.select("id", F.round("rank", 9).alias("rank"))


def q_ppr_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 3 personalized-PageRank rounds (seed-restricted
    teleport; dangling mass returns to the seeds) from the 4 smallest
    customer vertices of the customer→supplier graph — beyond-
    reference link-analysis coverage (SURVEY §2.9)."""
    from linkgraph.kernels import ppr

    g = _graph(_cust_supp_edges(spark, sf_dir))
    seeds = [
        int(r["src"])
        for r in g.edges.select("src").distinct().orderBy("src").limit(4).collect()
    ]
    res = ppr(g, seeds, tol=0.0, max_iter=3)
    return res.df.select("id", F.round("rank", 9).alias("rank"))


def q_ppr_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACL FOCS'06 local community detection (kernels/pprsweep.py):
    3 PPR rounds from ppr_k's seeds, then the min-conductance sweep
    cut over the ROUND(9) degree-normalized order on the symmetrized
    graph. Output = the best prefix community (id, sweep_pos) with
    the constant (best_k, phi ROUND 9) columns; cut/vol are exact
    int64 once the order is fixed, so only phi carries float."""
    from linkgraph.kernels import ppr_sweep

    g = _graph(_cust_supp_edges(spark, sf_dir))
    seeds = [
        int(r["src"])
        for r in g.edges.select("src").distinct().orderBy("src").limit(4).collect()
    ]
    res = ppr_sweep(g, seeds, tol=0.0, max_iter=3, max_sweep=128)
    return res.df.select(
        "id", "sweep_pos", "best_k", F.round("phi", 9).alias("phi")
    )


def q_spam_mass_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank + VLDB'06 spam mass (kernels/spammass.py): exactly 3
    rounds each of the uniform-teleport PageRank and the seed-PPR
    (trusted core = the 4 smallest customer vertices, same seeds as
    ppr_k), then the mass estimate spam = p - t*|S|/n and rel =
    spam/p (p floored by the uniform teleport, ANSI-safe). All four
    doubles ROUND(9); the |S|/n scale is an IEEE double division on
    both engines."""
    from linkgraph.kernels import spam_mass

    g = _graph(_cust_supp_edges(spark, sf_dir))
    seeds = [
        int(r["src"])
        for r in g.edges.select("src").distinct().orderBy("src").limit(4).collect()
    ]
    res = spam_mass(g, seeds, tol=0.0, max_iter=3)
    return res.df.select(
        "id",
        F.round("rank", 9).alias("rank"),
        F.round("trust", 9).alias("trust"),
        F.round("spam_mass", 9).alias("spam_mass"),
        F.round("rel_mass", 9).alias("rel_mass"),
    )


def q_hits_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 3 two-phase HITS rounds (Kleinberg hubs/authorities,
    L2-normalized, hub gather reads the round's normalized auth) on
    the customer→supplier graph — beyond-reference link-analysis
    coverage (SURVEY §2.9); scores rounded to 9 decimals."""
    from linkgraph.kernels import hits

    g = _graph(_cust_supp_edges(spark, sf_dir))
    res = hits(g, tol=0.0, max_iter=3)
    return res.df.select(
        "id", F.round("hub", 9).alias("hub"), F.round("auth", 9).alias("auth")
    )


def q_eigen_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 3 eigenvector-centrality rounds (power iteration
    x' = Aᵀx, L2-normalized each round — Bonacich 1972) on the
    customer→supplier graph — beyond-reference link-analysis coverage
    (SURVEY §2.9); scores rounded to 9 decimals."""
    from linkgraph.kernels import eigenvector_centrality

    g = _graph(_cust_supp_edges(spark, sf_dir))
    res = eigenvector_centrality(g, tol=0.0, max_iter=3)
    return res.df.select("id", F.round("score", 9).alias("score"))


def q_katz_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 3 Katz rounds (x' = beta + alpha*Aᵀx from x0 = beta;
    attenuated-path centrality, NO degree normalization — Katz 1953)
    on the customer→supplier graph — beyond-reference link-analysis
    coverage (SURVEY §2.9); scores rounded to 9 decimals."""
    from linkgraph.kernels import katz

    g = _graph(_cust_supp_edges(spark, sf_dir))
    res = katz(g, alpha=0.1, beta=1.0, tol=0.0, max_iter=3)
    return res.df.select("id", F.round("katz", 9).alias("katz"))


def q_salsa_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 3 two-phase SALSA rounds (Lempel-Moran TOIT'01:
    degree-normalized gathers, L1-normalized — the random-walk cousin
    of HITS) on the customer→supplier graph — beyond-reference
    link-analysis coverage (SURVEY §2.9); scores rounded to 9
    decimals."""
    from linkgraph.kernels import salsa

    g = _graph(_cust_supp_edges(spark, sf_dir))
    res = salsa(g, tol=0.0, max_iter=3)
    return res.df.select(
        "id", F.round("hub", 9).alias("hub"), F.round("auth", 9).alias("auth")
    )


def q_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS levels + min-parent tree from the smallest vertex of the
    symmetrized customer→supplier graph (SURVEY §2.4/A2, reference
    src/algos.rs:124-167; parent = F.min('src') per SURVEY §2.5(5))."""
    from linkgraph.build import symmetrize
    from linkgraph.kernels import bfs

    edges = symmetrize(_cust_supp_edges(spark, sf_dir))
    g = _graph(edges)
    root = int(g.edges.agg(F.min("src")).first()[0])
    res = bfs(g, root, max_iter=15)
    return res.df.select("id", "level", "parent")


def _part_succession_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed part-succession graph: part at linenumber k -> part at
    k+1 within the same order, restricted to l_quantity <= 15 lines.
    The restriction keeps the graph at web-bow-tie density (one giant
    SCC + tendrils) instead of a single all-covering SCC."""
    li = (
        _lineitem(spark, sf_dir)
        .where(F.col("l_quantity") <= 15)
        .select("l_orderkey", "l_linenumber", "l_partkey")
    )
    b = li.select(
        F.col("l_orderkey").alias("o2"),
        F.col("l_linenumber").alias("ln2"),
        F.col("l_partkey").alias("p2"),
    )
    return (
        li.join(
            b,
            (li["l_orderkey"] == b["o2"])
            & (b["ln2"] == li["l_linenumber"] + 1),
        )
        .where(F.col("l_partkey") != F.col("p2"))
        .select(F.col("l_partkey").alias("src"), F.col("p2").alias("dst"))
        .distinct()
    )


def q_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components (trim + Orzan forward-max
    coloring + color-constrained backward sweep, kernels/scc.py) of
    the directed part-succession graph — the bow-tie decomposition of
    a link graph (SURVEY §2.9). Labels normalized to min member id."""
    from linkgraph.kernels import scc

    g = _graph(_part_succession_edges(spark, sf_dir))
    res = scc(g)
    return res.df.select("id", "scc")


def q_bowtie_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broder bow-tie decomposition (kernels/bowtie.py) of the part-
    succession graph: per-vertex CORE / IN / OUT / OTHER, core = the
    largest SCC (tie-break size DESC, label ASC), IN/OUT = backward/
    forward reachability sweeps from the whole core at once."""
    from linkgraph.kernels import bowtie

    g = _graph(_part_succession_edges(spark, sf_dir))
    res = bowtie(g)
    return res.df.select("id", "cls")



def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle counts + Watts-Strogatz local clustering
    coefficient (kernels/clustering.py) over the symmetrized co-part
    graph — the per-vertex refinement of `triangle_count`; coeff
    rounded to 9 decimals for order-insensitive comparison."""
    from linkgraph.kernels import local_clustering

    g = _graph(_copart_edges(spark, sf_dir))
    res = local_clustering(g)
    return res.df.select("id", "tri", F.round("coeff", 9).alias("coeff"))



def q_link_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbors + Adamic-Adar link prediction
    (kernels/linkpred.py) over the symmetrized part-succession graph:
    every non-adjacent pair with >= 1 shared neighbor, center-degree
    skew cap 64 (non-binding at sf0.01, max deg 11 — exercised in the
    plan, mirrored in the oracle); aa rounded to 9 decimals."""
    from linkgraph.kernels import link_prediction

    g = _graph(_part_succession_edges(spark, sf_dir))
    res = link_prediction(g, max_center_deg=64, min_cn=1)
    return res.df.select("u", "w", "cn", F.round("aa", 9).alias("aa"))


def q_butterflies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Butterfly (bipartite 4-cycle) count (kernels/butterflies.py,
    Sanei-Mehri KDD'18) over the part→supplier bipartite graph.
    center='auto' resolves to the part side (Σ C(deg,2): 661k vs
    13.4M at sf0.01 — part degrees are bounded by the order mix while
    supplier degrees grow with sf, so the choice is stable and the
    oracle pins the left-center plan). All counts exact int64 —
    hash-exact, no rounding."""
    from linkgraph.kernels import butterfly_count

    return butterfly_count(_part_supp_edges(spark, sf_dir), center="auto").df


def q_densest_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bahmani parallel-peeling densest subgraph (kernels/densest.py,
    eps=0.1) over the symmetrized part-succession graph: per-vertex
    peel round (disjoint tags; the argmax-density round's survivors are
    the 2(1+eps)-approx densest core — best round pinned by pytest,
    peel trajectory pinned here). 8 rounds measured at sf0.01; the
    oracle unrolls 10 (post-fixpoint rounds are empty no-ops)."""
    from linkgraph.kernels import densest_subgraph

    g = _graph(_part_succession_edges(spark, sf_dir))
    res = densest_subgraph(g, epsilon=0.1)
    return res.df.select("id", "peel")



def q_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row web-graph characterization (kernels/graphstats.py) of
    the directed part-succession graph: reciprocity, Newman degree
    assortativity, degree moments — all doubles derive from exact
    int64 aggregates via single fixed-order expressions, so no
    rounding is needed on either side."""
    from linkgraph.kernels import graph_stats

    g = _graph(_part_succession_edges(spark, sf_dir))
    return graph_stats(g).df


def q_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-binned in/out-degree histogram of the part-succession
    graph (kernels/graphstats.degree_distribution) — exact integer
    binning via length(bin(deg)) - 1 on BOTH engines (no float log2),
    degree-0 vertices in bin -1. All-int64 output, hash-exact."""
    from linkgraph.kernels import degree_distribution

    g = _graph(_part_succession_edges(spark, sf_dir))
    return degree_distribution(g)


def q_power_law_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill MLE tail exponent of the part-succession graph's degree
    distributions (kernels/graphstats.power_law_alpha, dmin=4) — the
    Broder WWW'00 power-law row. tail_n is exact; alpha is the one
    float (SUM of per-distinct-degree ln terms), ROUND(9) both
    sides."""
    from linkgraph.kernels import power_law_alpha

    g = _graph(_part_succession_edges(spark, sf_dir))
    return power_law_alpha(g, dmin=4)


def q_attr_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical assortativity (kernels/graphstats.attribute_
    assortativity, Newman PRE'03 mixing patterns) on the cust→supp
    graph labeled by NATION (c_nationkey / s_nationkey): r =
    (m·diag − ΣA·B)/(m² − ΣA·B) — every aggregate exact int64 over
    the 25² label space, r ONE fixed-order division, hash-exact."""
    from linkgraph.kernels import attribute_assortativity

    g = _graph(_cust_supp_edges(spark, sf_dir))
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("id"), F.col("c_nationkey").alias("label")
    )
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        (F.lit(SUPP_OFFSET) + F.col("s_suppkey")).alias("id"),
        F.col("s_nationkey").alias("label"),
    )
    return attribute_assortativity(g, cust.unionByName(supp))


def q_four_cliques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-clique count on the co-part graph (kernels/triangles.
    kclique_count, kClist WWW'18 orientation scheme): one row
    (k, n_cliques), 242,155 K4s at sf0.01 — K3 cross-validates
    against triangle_count exactly. All int64."""
    from linkgraph.kernels import kclique_count

    g = _graph(_copart_edges(spark, sf_dir))
    res = kclique_count(g, k=4)
    return spark.createDataFrame([(4, res.count)], "k long, n_cliques long")


def q_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient curve phi(k) of the symmetrized
    part-succession graph (kernels/graphstats.rich_club; Colizza et
    al. Nature Physics 2006): density among vertices of degree > k
    per occupied degree class. rich_n / rich_e exact int64 suffix
    sums; phi ONE fixed-order double division (try_divide -> NULL
    below 2 members) — hash-exact with no rounding."""
    from linkgraph.kernels import rich_club

    g = _graph(_part_succession_edges(spark, sf_dir))
    return rich_club(g)


def q_knn_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average-nearest-neighbor-degree curve k_nn(k) of the
    symmetrized part-succession graph (kernels/graphstats.knn_curve;
    Pastor-Satorras et al. PRL 2001) — the degree-correlation plot
    whose slope sign graph_stats' scalar assortativity summarizes.
    deg / n_vertices / sum_nbr_deg are exact int64; knn is ONE
    fixed-order double division of exact integers, hash-exact with
    no rounding."""
    from linkgraph.kernels import knn_curve

    g = _graph(_part_succession_edges(spark, sf_dir))
    return knn_curve(g)


def q_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-truss of the co-part graph (kernels/truss.py): canonical
    (u < w) surviving edges with their in-truss triangle support.
    Peeling fixpoint measured at 8 rounds at sf0.01; the oracle unrolls
    10 (post-fixpoint rounds are no-ops)."""
    from linkgraph.kernels import ktruss

    g = _graph(_copart_edges(spark, sf_dir))
    res = ktruss(g, k=10)
    return res.df.select("u", "w", "support")


def q_edge_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-edge neighborhood Jaccard / embeddedness of the co-part
    graph (kernels/nodesim.py): cn = triangle support of the edge,
    jaccard = cn/(deg_u+deg_v-cn) — exact int64 aggregates through one
    fixed-order double expression, hash-identical with NO rounding
    (the graph_stats approach)."""
    from linkgraph.kernels import edge_jaccard

    g = _graph(_copart_edges(spark, sf_dir))
    return edge_jaccard(g).df


def q_msf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borůvka minimum spanning forest (kernels/msf.py) of the co-part
    graph weighted by line-pair co-occurrence count — the
    single-linkage backbone of the co-occurrence similarity graph.
    The MSF is unique under the strict (w, u, v) order, so the oracle
    (unrolled Borůvka rounds with a recursive-CTE contraction closure)
    must agree edge-for-edge; weights are int64 end-to-end, no float
    tolerance. Measured fixpoint at sf0.01 is 2 rounds; the oracle
    unrolls 4 (post-fixpoint rounds are no-ops)."""
    from linkgraph.kernels import minimum_spanning_forest

    li = _lineitem(spark, sf_dir).select("l_orderkey", "l_partkey")
    a = li.withColumnRenamed("l_partkey", "src")
    b = li.withColumnRenamed("l_partkey", "dst")
    wdf = (
        a.join(b, "l_orderkey")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    g = _graph(wdf.select("src", "dst"))
    res = minimum_spanning_forest(g, weights=wdf)
    return res.df.select("u", "v", "w")


def q_maximal_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal matching of the co-part graph (kernels/matching.py):
    parallel greedy with deterministic edge priorities — the fixpoint
    equals sequential greedy in ascending (h, u, v) key order. The
    co-part edges are already canonical (src < dst) so the kernel's
    canonicalization is a no-op. Measured fixpoint at sf0.01 is 9
    rounds; the oracle unrolls 12 (post-fixpoint rounds are no-ops)."""
    from linkgraph.kernels import maximal_matching

    g = _graph(_copart_edges(spark, sf_dir))
    res = maximal_matching(g)
    return res.df.select("u", "v")



def q_ego_net(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-2 ego network (kernels/egonet.py, direction=both) of the
    part-succession graph's 4 smallest vertices: ball membership with
    min hop distances (multi-seed bounded frontier BFS)."""
    from linkgraph.kernels import ego_net

    g = _graph(_part_succession_edges(spark, sf_dir))
    verts = g.edges.select(F.least("src", "dst").alias("id")).union(
        g.edges.select(F.greatest("src", "dst").alias("id"))
    )
    seeds = [int(r["id"]) for r in verts.distinct().orderBy("id").limit(4).collect()]
    res = ego_net(g, seeds, radius=2, direction="both")
    return res.vertices.select("id", "dist")


def q_msbfs_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS (4 lanes in ONE frontier loop, composite
    (dst, source) combine key) + sampled harmonic centrality rollup
    over the symmetrized customer→supplier graph. Sources = the 4
    smallest vertex ids; max_iter=15 matches the oracle's bounded
    recursive expansion. (kernels/msbfs.py; MS-BFS per Then et al.
    VLDB'15, harmonic estimator per Boldi & Vigna 2014.)"""
    from linkgraph.build import symmetrize
    from linkgraph.kernels import harmonic_centrality

    edges = symmetrize(_cust_supp_edges(spark, sf_dir))
    g = _graph(edges)
    sources = [int(r["id"]) for r in g.vertices.orderBy("id").limit(4).collect()]
    return harmonic_centrality(g, sources, max_iter=15)


def q_closeness_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled closeness centrality (kernels/msbfs.closeness_centrality)
    over the symmetrized cust→supp graph — msbfs_harmonic's sweep with
    the reciprocal-mean-distance rollup. sum_dist/reached are exact
    int64; closeness is ONE int64/int64 double division, hash-exact
    with no rounding (the edge_jaccard contract)."""
    from linkgraph.build import symmetrize
    from linkgraph.kernels import closeness_centrality

    edges = symmetrize(_cust_supp_edges(spark, sf_dir))
    g = _graph(edges)
    sources = [int(r["id"]) for r in g.vertices.orderBy("id").limit(4).collect()]
    return closeness_centrality(g, sources, max_iter=15)


def q_graph_radii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ligra's Radii app: per-sample-source eccentricity + reach size
    over the symmetrized cust→supp graph (same 4-lane msbfs sweep as
    msbfs_harmonic, different rollup; max(ecc) lower-bounds the
    diameter)."""
    from linkgraph.build import symmetrize
    from linkgraph.kernels import radii

    edges = symmetrize(_cust_supp_edges(spark, sf_dir))
    g = _graph(edges)
    sources = [int(r["id"]) for r in g.vertices.orderBy("id").limit(4).collect()]
    return radii(g, sources, max_iter=15)


def q_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled-source Brandes betweenness centrality (4 lanes, same
    source sample as msbfs_harmonic) on the symmetrized cust→supp
    graph (kernels/betweenness.py). The oracle unrolls the forward
    σ-accumulating BFS and the backward dependency sweep level by
    level — empty trailing levels are no-ops, so the unroll bound only
    needs to be ≥ the real depth (15, matching max_iter)."""
    from linkgraph.build import symmetrize
    from linkgraph.kernels import betweenness

    edges = symmetrize(_cust_supp_edges(spark, sf_dir))
    g = _graph(edges)
    sources = [int(r["id"]) for r in g.vertices.orderBy("id").limit(4).collect()]
    return betweenness(g, sources, max_iter=15).df


def q_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted SSSP (frontier Bellman-Ford, kernels/sssp.py) from the
    smallest vertex of the symmetrized cust→supp graph; edge weight =
    (order, lineitem) pair multiplicity as a double, same in both
    directions — integer-valued, so distances are float-exact vs the
    oracle. Oracle unrolls full Bellman-Ford rounds; rounds beyond the
    fixpoint are idempotent."""
    from linkgraph.build import symmetrize
    from linkgraph.kernels import sssp

    li = _lineitem(spark, sf_dir)
    o = _orders(spark, sf_dir)
    cw = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.lit(SUPP_OFFSET) + F.col("l_suppkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    weights = cw.union(cw.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w"))
    edges = symmetrize(_cust_supp_edges(spark, sf_dir))
    g = _graph(edges)
    root = int(g.edges.agg(F.min("src")).first()[0])
    return sssp(g, root, weights=weights, max_iter=30).df


def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-core of the symmetrized customer→supplier graph: iterative
    peeling until fixpoint, output (id, deg) = members + their in-core
    degree (kernels/kcore.py; Matula & Beck 1983). The oracle unrolls
    4 peel rounds — measured fixpoint at sf0.01 is 2, and extra rounds
    are idempotent."""
    from linkgraph.build import symmetrize
    from linkgraph.kernels import kcore

    edges = symmetrize(_cust_supp_edges(spark, sf_dir))
    g = _graph(edges)
    return kcore(g, k=20).df


def q_coreness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full k-core decomposition of the symmetrized part-succession
    graph: (id, core) for every endpoint via level-synchronous bucket
    peeling (kernels/coreness.py; Batagelj & Zaveršnik 2003 / Julienne
    KCore). Measured at sf0.01: 21 rounds to fixpoint, degeneracy 3,
    cores {1: 513, 2: 1264, 3: 7}. The oracle unrolls 24 rounds with
    the level derived per round by scalar subquery — rounds past the
    fixpoint are no-ops (the cust→supp graph was rejected for this
    row: 60 rounds / degeneracy 51 makes the unrolled oracle heavy)."""
    from linkgraph.build import symmetrize
    from linkgraph.kernels import coreness

    edges = symmetrize(_part_succession_edges(spark, sf_dir))
    g = _graph(edges)
    return coreness(g).df


def q_mis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal independent set of the symmetrized cust→supp graph:
    parallel greedy with deterministic hash priorities — the fixpoint
    equals sequential greedy in ascending key order (kernels/mis.py).
    The oracle unrolls 6 rounds (measured fixpoint at sf0.01 is 2;
    extra rounds are no-ops)."""
    from linkgraph.build import symmetrize
    from linkgraph.kernels import mis

    edges = symmetrize(_cust_supp_edges(spark, sf_dir))
    g = _graph(edges)
    return mis(g).df


def q_anf_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANF / effective-diameter sketches (Palmer et al. KDD'02,
    kernels/anf.py) on the symmetrized cust→supp graph: 8 FM registers
    per vertex, 8 fixed propagation rounds (fixpoint is earlier; extra
    rounds are no-ops on the monotone bit-or state). Output is the full
    integer sketch state + the FM R-statistic sum — float-free, so the
    oracle comparison is bit-exact."""
    from linkgraph.build import symmetrize
    from linkgraph.kernels import anf
    from linkgraph.kernels.anf import _r_col

    edges = symmetrize(_cust_supp_edges(spark, sf_dir))
    g = _graph(edges)
    res = anf(g, registers=8, max_iter=8)
    mcols = [f"m{k}" for k in range(8)]
    r_sum = sum(_r_col(F.col(c)) for c in mcols)
    return res.df.select("id", *mcols, r_sum.cast("long").alias("r_sum"))


def q_coloring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterated-MIS (Luby) greedy coloring of the symmetrized cust→supp
    graph: layer c = priority-greedy MIS of the residual
    (kernels/coloring.py). The oracle replays the layers with a nested
    unroll — 4 layers × 5 MIS rounds (measured: 2 layers, ≤2 effective
    rounds each at sf0.01); extra layers/rounds are no-ops."""
    from linkgraph.build import symmetrize
    from linkgraph.kernels import coloring

    edges = symmetrize(_cust_supp_edges(spark, sf_dir))
    g = _graph(edges)
    return coloring(g).df


def q_host_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level rollup of a page graph (linkgraph/build.py
    host_rollup): page urls are synthesized deterministically from the
    vertex id (host = id % 50), the Spark side extracts the host with
    the JVM parse_url and aggregates (src_host, dst_host) link weights,
    dropping same-host links; the oracle constructs the same host
    strings directly. Exercises the real parse_url + two-join + groupBy
    rollup path end-to-end."""
    from linkgraph.build import host_rollup

    g = _graph(_cust_supp_edges(spark, sf_dir))
    g.vertices = g.vertices.withColumn(
        "url",
        F.concat(
            F.lit("http://host"),
            (F.col("id") % 50).cast("string"),
            F.lit(".example.com/page/"),
            F.col("id").cast("string"),
        ),
    )
    return host_rollup(g)


def q_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level PageRank — the end-to-end composition a web ranking
    pipeline actually runs: host_rollup (REAL parse_url + two-join +
    groupBy path, same synthetic urls as host_graph) builds the
    weighted host graph, then pagerank_weighted ranks hosts with rank
    flowing proportionally to inter-host link multiplicity. Host ids
    re-derived from the host string via regexp (both engines); 3
    unrolled rounds, ROUND(9)."""
    from linkgraph.build import host_rollup
    from linkgraph.kernels import pagerank_weighted

    g = _graph(_cust_supp_edges(spark, sf_dir))
    g.vertices = g.vertices.withColumn(
        "url",
        F.concat(
            F.lit("http://host"),
            (F.col("id") % 50).cast("string"),
            F.lit(".example.com/page/"),
            F.col("id").cast("string"),
        ),
    )
    rolled = host_rollup(g)
    wdf = rolled.select(
        F.regexp_extract("src_host", r"host(\d+)", 1).cast("long").alias("src"),
        F.regexp_extract("dst_host", r"host(\d+)", 1).cast("long").alias("dst"),
        F.col("weight").alias("w"),
    )
    hg = _graph(wdf.select("src", "dst"))
    res = pagerank_weighted(hg, wdf, tol=0.0, max_iter=3)
    return res.df.select(
        F.col("id").alias("host_id"), F.round("rank", 9).alias("rank")
    )


def q_host_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-graph community detection — the host_pagerank composition
    with louvain_weighted instead of ranking: host_rollup builds the
    multiplicity-weighted host graph (same synthetic urls / regexp id
    re-derivation), then one weighted Louvain phase under the parity
    schedule, 3 fixed rounds, 1 level. Weighted gains are exact
    int64, so the row is hash-exact with no rounding."""
    from linkgraph.build import host_rollup
    from linkgraph.kernels import louvain_weighted

    g = _graph(_cust_supp_edges(spark, sf_dir))
    g.vertices = g.vertices.withColumn(
        "url",
        F.concat(
            F.lit("http://host"),
            (F.col("id") % 50).cast("string"),
            F.lit(".example.com/page/"),
            F.col("id").cast("string"),
        ),
    )
    rolled = host_rollup(g)
    wdf = rolled.select(
        F.regexp_extract("src_host", r"host(\d+)", 1).cast("long").alias("src"),
        F.regexp_extract("dst_host", r"host(\d+)", 1).cast("long").alias("dst"),
        F.col("weight"),
    )
    res = louvain_weighted(
        wdf, max_iter=3, schedule="parity", max_levels=1
    )
    return res.df.select(F.col("id").alias("host_id"), "comm")


def q_labelprop_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 3 synchronous label-propagation rounds on the
    customer→supplier graph (SURVEY §2.6: adopt the most frequent
    in-neighbor label, ties -> smallest)."""
    from linkgraph.kernels import label_propagation

    g = _graph(_cust_supp_edges(spark, sf_dir))
    res = label_propagation(g, max_iter=3)
    return res.df.select("id", "label")


def q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic DeepWalk corpus (kernels/walks.py, SURVEY §2.9):
    2 walks per vertex, 4 steps, seed 7 on the directed
    part-succession graph — successors picked by the portable
    Lehmer-mix argmin, so the corpus is bit-reproducible and the
    oracle replays it exactly (all-int64 rows, no rounding)."""
    from linkgraph.kernels import random_walks

    g = _graph(_part_succession_edges(spark, sf_dir))
    res = random_walks(g, length=4, walks_per_vertex=2, seed=7)
    return res.df.select("start", "walk", "step", "vertex")


def q_node2vec_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic node2vec biased walks (kernels/node2vec.py,
    Grover & Leskovec KDD'16): 2 walks per vertex, 3 steps, integer
    alpha weights 1:4:2 (return : distance-1 : forward), seed 7 on
    the directed part-succession graph. The exact cumulative-weight
    modular draw makes the corpus bit-reproducible; the oracle
    unrolls the identical cumsum + modulo per step (all-int64)."""
    from linkgraph.kernels import node2vec_walks

    g = _graph(_part_succession_edges(spark, sf_dir))
    res = node2vec_walks(
        g, length=3, walks_per_vertex=2,
        alpha_return=1, alpha_common=4, alpha_forward=2, seed=7,
    )
    return res.df.select("start", "walk", "step", "vertex")


def q_rw_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-walk graph sampling (kernels/sampling.rw_sample,
    Leskovec & Faloutsos KDD'06) on the part-succession graph: walks
    from seeds ≡ 0 mod 101, the sample = induced subgraph of touched
    vertices (two semi-joins). All-int64 edge rows — hash-exact; the
    oracle replays the walk unroll + the induced-edge filter."""
    from linkgraph.kernels import rw_sample

    g = _graph(_part_succession_edges(spark, sf_dir))
    seeds = g.vertices.where(F.col("id") % 101 == 0).select("id")
    _, edges = rw_sample(g, seeds, length=4, walks_per_seed=2, seed=7)
    return edges


def q_neighbor_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic GraphSAGE 2-hop fanout sampling
    (kernels/sampling.py, SURVEY §2.9): seeds = part-succession
    vertices ≡ 0 (mod 97), fanouts [3, 2], seed 7 — hash-ranked
    without-replacement edge blocks (all-int64 rows, no rounding)."""
    from linkgraph.kernels import neighbor_sample

    g = _graph(_part_succession_edges(spark, sf_dir))
    seeds = g.vertices.where(F.col("id") % 97 == 0)
    res = neighbor_sample(g, seeds, fanouts=[3, 2], seed=7)
    return res.df.select("layer", "src", "dst")


def q_negative_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform-corruption negative edges
    (kernels/sampling.py:negative_sample, SURVEY §2.9): k=3 negatives
    per positive src on the part-succession graph, seed 7 —
    hash-drawn non-neighbors, the link-prediction/embedding training
    counterpart to `random_walks` (all-int64 rows, no rounding)."""
    from linkgraph.kernels import negative_sample

    g = _graph(_part_succession_edges(spark, sf_dir))
    res = negative_sample(g, k=3, seed=7)
    return res.df.select("src", "slot", "dst")


def q_degree_relabel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-descending dense relabeling of the part-succession
    graph (build.relabel_by_degree, SURVEY §2.9) — the WebGraph
    locality transform; new_id is a pure function of the degree table
    (global (deg DESC, id) order), so ROW_NUMBER reproduces it
    (all-int64 rows, no rounding)."""
    from linkgraph.build import relabel_by_degree

    g = _graph(_part_succession_edges(spark, sf_dir))
    return relabel_by_degree(g, order="total").select("id", "new_id", "deg")


def q_pseudo_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-sweep pseudo-diameter (kernels/pseudodiam.py, Magnien
    et al. JEA'09) on the symmetrized part-succession graph: BFS from
    the min vertex id, re-BFS from the farthest vertex (ties to the
    smallest id). One (sweep, source, farthest, ecc) row per sweep —
    all int64, hash-exact."""
    from linkgraph.kernels import pseudo_diameter

    g = _graph(_part_succession_edges(spark, sf_dir))
    return pseudo_diameter(g, sweeps=2).df


def q_adjacency_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebGraph gap-encoding cost, raw vs degree-relabeled layout
    (build.adjacency_gap_stats — Boldi & Vigna §3): two rows; the
    relabeled layout costs measurably fewer total gap bits (24,061 →
    22,035 at sf0.01), quantifying what relabel_by_degree buys. Bit
    lengths via the exact bin() trick — all int64, hash-exact."""
    from linkgraph.build import (
        adjacency_gap_stats,
        relabel_by_degree,
        relabel_edges,
    )

    g = _graph(_part_succession_edges(spark, sf_dir))
    raw = adjacency_gap_stats(g.edges, "raw")
    mapping = relabel_by_degree(g)
    rel = adjacency_gap_stats(relabel_edges(g, mapping), "degree_relabeled")
    out = raw.unionByName(rel)
    out = out.localCheckpoint(eager=True)
    mapping.unpersist()
    return out


def q_condensation_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCC condensation DAG of the part-succession graph layered by
    longest path (kernels/condense.py, SURVEY §2.9): per component
    (scc, level, size) — the web-hierarchy depth view (all-int64
    rows, no rounding)."""
    from linkgraph.kernels import condensation

    g = _graph(_part_succession_edges(spark, sf_dir))
    res = condensation(g)
    return res.df.select("scc", "level", "size")


def q_modularity_lp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed Leicht-Newman modularity of the 3-round labelprop
    partition of the customer→supplier graph (kernels/modularity.py,
    SURVEY §2.9) — exact-int64 score path, bit-identical to the
    oracle with no rounding."""
    from linkgraph.kernels import label_propagation, modularity

    g = _graph(_cust_supp_edges(spark, sf_dir))
    labels = label_propagation(g, max_iter=3).df
    return modularity(g, labels.select("id", "label"))


def q_conductance_lp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community conductance of the same 3-round labelprop
    partition modularity_lp scores (kernels/modularity.conductance):
    cut and volume are exact int64 aggregates, phi = cut / min(vol,
    2m - vol) is one division of int64-valued doubles — bit-identical
    to the oracle with no rounding; single-community partitions give
    NULL (try_divide / DuckDB x/0)."""
    from linkgraph.kernels import conductance, label_propagation

    g = _graph(_cust_supp_edges(spark, sf_dir))
    labels = label_propagation(g, max_iter=3).df
    return conductance(g, labels.select("id", "label"))


def q_pagerank_delta_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank-delta, faithful to the reference INCLUDING quirk 1
    (src/algos.rs:203: the additive first-round activity test leaves
    the post-round-0 frontier empty for any n > ~7), so with
    max_iterations=3 the returned ranks are exactly the round-0 values
    rank(v) = 0.85 * Σ_{u→v} (1/n)/out_deg(u) + 0.15 — which is what
    the oracle expresses; the multi-round machinery is additionally
    pinned against a NumPy transcription in tests/oracles.py."""
    from linkgraph.kernels import pagerank_delta

    g = _graph(_cust_supp_edges(spark, sf_dir))
    res = pagerank_delta(g, max_iterations=3)
    return res.df.select("id", F.round("rank", 9).alias("rank"))


def q_pagerank_delta_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-ROUND PageRank-delta driver pin (VERDICT r3 item 3): on a
    3-vertex fixture graph — region keys {0,1,2}, edges (0→1),(0→2),
    (1→2) — quirk 1 (src/algos.rs:203: active iff |delta| > rank+0.01)
    KEEPS vertex 0 active after round 0 (1/n = 1/3 > 2·0.15 + 0.01),
    so the loop body (sparse-frontier scatter + quirk-2 apply,
    pagerank_delta.py:157-190) executes a real round before the
    sum-of-delta error (−0.1558 < 1e-7) terminates it. The oracle
    unrolls both rounds in SQL — this gives the loop body a driver
    CORRECTNESS row, where pagerank_delta_k only pins round 0 (its
    frontier dies at n > ~7)."""
    from linkgraph.kernels import pagerank_delta

    r = spark.read.parquet(f"{sf_dir}/region.parquet").select("r_regionkey")
    a = r.select(F.col("r_regionkey").alias("src")).where(F.col("src") <= 1)
    b = r.select(F.col("r_regionkey").alias("dst")).where(F.col("dst") <= 2)
    edges = a.crossJoin(b).where(F.col("src") < F.col("dst"))
    g = _graph(edges)
    res = pagerank_delta(g, max_iterations=3)
    return res.df.select("id", F.round("rank", 9).alias("rank"))


def q_event_sessions_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type transition graph: consecutive (event_type →
    event_type) edges per user ordered by (ts, event_id), with counts
    (FIXTURES.md §3)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.lag("event_type").over(w).alias("src_type"),
        F.col("event_type").alias("dst_type"),
    ).where(F.col("src_type").isNotNull())
    return trans.groupBy("src_type", "dst_type").agg(F.count("*").alias("cnt"))


def q_event_sessions_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization (linkgraph/streaming.py): watermarked
    session_window aggregation run as a REAL Structured Streaming
    query (file source, availableNow drain, memory sink) over the
    events table; one row per (user, 30-min-gap session). The oracle
    is the gaps-and-islands batch equivalent — session end = last
    event + gap, new session iff the gap to the previous event is >=
    30 minutes (session_window's half-open [start, end) semantics)."""
    from linkgraph.streaming import sessionize_events

    # file-source streams need a DIRECTORY; the testdata tables are
    # single files, so stream the parent dir with a glob filter
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    name = "q_event_sessions_stream_sink"
    q = (
        sessionize_events(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # epoch-microsecond longs: exact integers on both engines (Spark
    # pandas conversion yields ns-unit timestamps, DuckDB us-unit —
    # same values, different dtype; longs sidestep the unit mismatch)
    return spark.table(name).select(
        "user_id",
        F.unix_micros("session_start").alias("session_start_us"),
        F.unix_micros("session_end").alias("session_end_us"),
        "n_events",
        F.round("total_value", 6).alias("total_value"),
    )


def q_doc_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (linkgraph/streaming.dedup_stream): a
    REAL Structured Streaming query (file source, availableNow drain,
    memory sink) that first-arrival-dedups the documents table on
    md5(text) within a watermark horizon (dropDuplicatesWithin-
    Watermark; event time = doc_id seconds, horizon 365 days covers
    the whole drain). Projecting ONLY the content hash makes the
    result representative-independent: kept hashes == the distinct
    hash set, which is exactly the batch oracle."""
    from linkgraph.streaming import dedup_stream

    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    # +1e9 s keeps every synthetic event time strictly above the
    # initial epoch-0 watermark (a ts AT the watermark is "late" and
    # silently dropped — measured: doc_id 0 vanished without this)
    tagged = stream.select(
        F.md5("text").alias("content_md5"),
        F.timestamp_seconds(F.col("doc_id") + F.lit(1_000_000_000)).alias("ts"),
    )
    name = "q_doc_dedup_stream_sink"
    q = (
        dedup_stream(tagged, ["content_md5"], "ts", "365 days")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select("content_md5")


def q_trending_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming trending items (linkgraph/streaming.trending_counts):
    a REAL Structured Streaming query (file source, availableNow
    drain, memory sink) counting events per (1-day tumbling window,
    item) over the events table — item = the props.k id, the
    covisitation extraction — then the batch rank-at-read top-5 per
    window (the production counts-in-stream / rank-at-read shape).
    Output is all-int64 (epoch-us window starts): hash-exact; the
    oracle mirrors the epoch-aligned window via integer division."""
    from linkgraph.streaming import trending_counts

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    tagged = stream.select(
        "ts",
        F.regexp_extract("props", r'"k": ([0-9]+)', 1).cast("long").alias("item"),
    )
    name = "q_trending_stream_sink"
    q = (
        trending_counts(tagged, window="1 day", watermark="1 hour")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(F.desc("cnt"), F.asc("item"))
    return (
        spark.table(name)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 5)
        .select(
            F.unix_micros("window_start").alias("window_start_us"),
            "item",
            "cnt",
            "rnk",
        )
    )


def q_enriched_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment (linkgraph/streaming.enrich_events):
    a REAL streaming query joins the event stream against the STATIC
    customer→nation dimension (broadcast, zero streaming state) and
    counts events per (nation, event_type) — user_id % 1500 maps
    users onto custkeys so the join hits. availableNow drain, memory
    sink; all-int64/string output, batch-join oracle."""
    from linkgraph.streaming import enrich_events

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("cust"), F.col("c_nationkey").alias("nation")
    )
    tagged = stream.select(
        (F.col("user_id") % 1500 + 1).alias("cust"), "event_type"
    )
    name = "q_enriched_event_counts_sink"
    q = (
        enrich_events(tagged, cust, "cust", how="inner")
        .groupBy("nation", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        "nation", "event_type", F.col("cnt").cast("long").alias("cnt")
    )


# ---------------------------------------------------------------------------
# training-data pipeline queries (documents / embeddings)
# ---------------------------------------------------------------------------


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.pipeline import exact_dup_groups

    return exact_dup_groups(_documents(spark, sf_dir))


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.pipeline import minhash_signatures

    return minhash_signatures(_documents(spark, sf_dir), num_hashes=8, k=3)


def q_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.pipeline import lsh_candidate_pairs

    return lsh_candidate_pairs(_documents(spark, sf_dir), num_hashes=8, band_rows=2, k=3)


def q_minhash_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash dedup decision stage (pipeline/dedup.minhash_jaccard_
    pairs): LSH candidates + the Broder'97 estimated Jaccard =
    equal-signature-component fraction. With num_hashes=8 the
    estimate is an exact multiple of 1/8, so both engines agree
    bit-for-bit. threshold 0.5: a band match already forces est >=
    2/8, so any threshold <= 0.25 is vacuous on band_rows=2
    candidates — 0.5 makes the cut do real work."""
    from linkgraph.pipeline import minhash_jaccard_pairs

    return minhash_jaccard_pairs(
        _documents(spark, sf_dir), num_hashes=8, band_rows=2, k=3, threshold=0.5
    )


def q_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with both the whitespace tokenizer and the
    BPE-ish pre-tokenizer regex (pipeline/textstats.bpe_token_stats)
    — the LM-budgeting chars/token view. The pattern deliberately
    avoids lookahead and unicode classes so Java regex (Spark) and
    RE2 (DuckDB) tokenize identically."""
    from linkgraph.pipeline import bpe_token_stats

    return bpe_token_stats(_documents(spark, sf_dir))


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.pipeline import simhash

    return simhash(_documents(spark, sf_dir), bits=16)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as FF

    from linkgraph.pipeline import ngram_jaccard_pairs

    docs = _documents(spark, sf_dir).where(FF.col("doc_id") < 100)
    # max_df exercises the stop-shingle guard (the 100-TB quadratic-join
    # mitigation); the oracle applies the identical document-frequency
    # cutoff, so the comparison stays exact.
    return ngram_jaccard_pairs(docs, k=3, threshold=0.5, max_df=95)


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.pipeline import token_stats

    return token_stats(_documents(spark, sf_dir))


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document (pipeline/textstats.tfidf_topk,
    smooth idf). Ranking is on the ROUND(9) score with term tiebreak,
    so rank assignment is engine-reproducible."""
    from linkgraph.pipeline import tfidf_topk

    return tfidf_topk(_documents(spark, sf_dir), k=5)


def q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 corpus vocabulary by corpus frequency
    (pipeline/textstats.vocab_stats). All int64 — hash-exact."""
    from linkgraph.pipeline import vocab_stats

    return vocab_stats(_documents(spark, sf_dir), k=100)


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full inverted index over the documents table
    (pipeline/retrieval.inverted_index): per-term serialized posting
    list "doc:tf doc:tf ..." ordered by doc_id — integers and strings
    only, hash-exact."""
    from linkgraph.pipeline import inverted_index

    return inverted_index(_documents(spark, sf_dir))


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for the query "spark join window"
    (pipeline/retrieval.bm25_topk, Lucene idf variant, k1=1.2
    b=0.75). Per-(doc,term) weights quantized once to int64
    micro-units; per-doc totals exact int64 SUMs; rank keys pure
    integers — engine-reproducible with no tolerance."""
    from linkgraph.pipeline import bm25_topk

    return bm25_topk(_documents(spark, sf_dir), "spark join window", k=10)


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance sampling (pipeline/sampling.
    weighted_sample, the DCLM-style resampling move): per-doc keep
    probability = clamp(n_chars/400, 0, 1), membership by the seeded
    md5-prefix id hash — EXACT membership oracle (same hash idiom as
    stratified_sample; the threshold is one double product both
    engines)."""
    from linkgraph.pipeline import weighted_sample

    docs = _documents(spark, sf_dir).select(
        "doc_id",
        "lang",
        "n_chars",
        (F.col("n_chars") / F.lit(400.0)).alias("w"),
    )
    return weighted_sample(docs, "w", seed=7).select(
        "doc_id", "lang", "n_chars"
    )


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 session paths (pipeline/funnel.session_paths): most
    common event-type sequences per 360-min-gap session, paths
    truncated at 5 steps ('>' joined, (ts, event_id) order) — the
    path-mining view of the event log; multi-step paths appear from
    rank 6. Strings + int64 with a deterministic (count DESC, path)
    rank — hash-exact."""
    from linkgraph.pipeline import session_paths

    return session_paths(
        spark.read.parquet(f"{sf_dir}/events.parquet"),
        gap_minutes=360, max_len=5, k=50,
    )


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transitions over per-user event streams
    (pipeline/funnel.event_transitions): (from, to, cnt, prob) with
    the (ts, event_id) successor order. cnt exact int64; prob ONE
    fixed-order division — hash-exact, no rounding."""
    from linkgraph.pipeline import event_transitions

    return event_transitions(spark.read.parquet(f"{sf_dir}/events.parquet"))


def q_zorder_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout keys over orders (pipeline/layout.py):
    interleave the low 16 bits of (o_custkey, o_orderkey) — the
    OPTIMIZE ZORDER clustering key as one codegen projection, pure
    bit arithmetic, all int64 hash-exact."""
    from linkgraph.pipeline import zorder_key

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    return zorder_key(orders, ["o_custkey", "o_orderkey"], bits=16)


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order conversion funnel (pipeline/funnel.funnel_counts)
    signup→view→click→purchase over the deterministically thinned
    event log (event_id % 7 == 0 — the full log is saturated: every
    user completes everything). First-touch semantics: step k = the
    earliest step-k event strictly after the user's step-k-1
    completion. 134→86→50→22 users at sf0.01 — all int64."""
    from linkgraph.pipeline import funnel_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("event_id") % 7 == 0
    )
    return funnel_counts(ev, ["signup", "view", "click", "purchase"])


def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily retention cohorts (pipeline/funnel.retention_cohorts)
    over the thinned event log: cohort = first active absolute day
    (epoch-us integer `div` — exact on both engines), offset = days
    since; 225 (cohort, offset) cells with real decay at sf0.01 —
    all int64, hash-exact."""
    from linkgraph.pipeline import retention_cohorts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("event_id") % 7 == 0
    )
    return retention_cohorts(ev, period_days=1)


def q_covisitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session co-visitation item graph (pipeline/covisit.py, the
    Amazon item-to-item CF count table) over the events table: item =
    the numeric props.k field (regexp both engines), 120-min gap
    sessions (the gaps-and-islands rule shared with the streaming
    sessionizer), min_count 2 — 302 pairs at sf0.01. cnt/marginals
    exact int64; score = ONE fixed-order cnt/(sqrt·sqrt) division,
    ROUND(9)."""
    from linkgraph.pipeline import covisitation

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id",
        "ts",
        F.regexp_extract("props", r'"k": ([0-9]+)', 1)
        .cast("long")
        .alias("item"),
    )
    return covisitation(ev, gap_minutes=120, min_count=2)


def q_resolve_redirects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain resolution (kernels/redirects.py, pointer
    doubling): a deterministic functional map over the distinct
    o_orderkey space — r = key % 16: r%8 in 1..6 -> key-1 (descending
    chains to the r%8==0 terminals), r==7 -> key+8 and r==15 ->
    key-8 (2-cycles where both partners exist, terminals where not).
    Output (src, target, chain_len, is_cycle), NULLs on loop rows —
    all int64/bool, hash-exact. The oracle walks the same map with a
    recursive CTE capped at 40 hops (measured max acyclic chain 6)."""
    from linkgraph.kernels import resolve_redirects

    keys = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.col("o_orderkey").alias("i"))
        .distinct()
    )
    r = F.col("i") % 16
    rmap = keys.where(r % 8 != 0).select(
        F.col("i").alias("src"),
        F.when(r == 7, F.col("i") + 8)
        .when(r == 15, F.col("i") - 8)
        .otherwise(F.col("i") - 1)
        .alias("dst"),
    )
    return resolve_redirects(rmap)


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (pipeline/dedup.simhash_near_pairs,
    Manku et al. WWW'07): Hamming ≤ 2 over 16-bit fingerprints via
    the pigeonhole band trick (3 bands — any in-radius pair agrees on
    one band exactly), bucket joins + exact popcount verification.
    All int64 — hash-exact; 18,643 pairs at sf0.01."""
    from linkgraph.pipeline import simhash_near_pairs

    return simhash_near_pairs(
        _documents(spark, sf_dir).select("doc_id", "text"),
        bits=16, max_hamming=2,
    )


def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style normalized dedup (pipeline/dedup.normalized_dup_
    groups): documents unioned with deterministic messy variants of
    every 10th doc (uppercased, punctuation-wrapped, extra spaces,
    doc_id + 1,000,000) so normalization performs REAL merges — 50
    groups of 2 at sf0.01, keep_id = the original id. Hash groups are
    md5 over the normalized text; all output int64/string."""
    from linkgraph.pipeline import normalized_dup_groups

    docs = _documents(spark, sf_dir).select("doc_id", "text")
    messy = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit("  "), F.upper("text"), F.lit(" !! ")).alias("text"),
    )
    return normalized_dup_groups(docs.unionByName(messy))


def q_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 PMI collocations at window 2 / min_count 5
    (pipeline/textstats.pmi_topk, Church & Hanks). pmi is the exact
    left-to-right sum of LNs of int64-exact doubles, ROUND(9) BEFORE
    ranking; ties on (a, b)."""
    from linkgraph.pipeline import pmi_topk

    return pmi_topk(_documents(spark, sf_dir), window=2, min_count=5, k=100)


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained unigram-LM surprisal per doc
    (pipeline/textstats.unigram_logprob, CCNet-style quality signal).
    Per-term bits quantized to int64 micro-bits, so doc totals are
    exact int64 sums and mean_bits is one correctly-rounded division —
    engine-identical with no tolerance."""
    from linkgraph.pipeline import unigram_logprob

    return unigram_logprob(_documents(spark, sf_dir))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.pipeline import lang_id

    return lang_id(_documents(spark, sf_dir))


def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.pipeline import winnow_fingerprints

    return winnow_fingerprints(_documents(spark, sf_dir), k=5, window=4)


def q_url_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (pipeline/urlnorm.canonicalize_urls):
    messy urls synthesized deterministically from o_orderkey (mixed-
    case scheme/host, default and non-default ports, tracking params,
    fragments, empty paths, one invalid form), then the frontier
    normalization rules. The oracle synthesizes the identical strings
    and mirrors every rule in RE2/SQL."""
    from linkgraph.pipeline import canonicalize_urls

    k = F.col("o_orderkey")
    h = (k % 50).cast("string")
    ks = k.cast("string")
    url = (
        F.when(k % 6 == 0, F.concat(F.lit("HTTP://Host"), h, F.lit(".Example.COM:80/page/"), ks, F.lit("?utm_source=x&id="), ks, F.lit("#frag")))
        .when(k % 6 == 1, F.concat(F.lit("https://host"), h, F.lit(".example.com:443/page/"), ks))
        .when(k % 6 == 2, F.concat(F.lit("http://host"), h, F.lit(".example.com/page/"), ks, F.lit("?utm_campaign=c&utm_medium=m")))
        .when(k % 6 == 3, F.concat(F.lit("https://HOST"), h, F.lit(".example.com:8443/p/"), ks, F.lit("?a=1&fbclid=zz&b=2")))
        .when(k % 6 == 4, F.concat(F.lit("http://host"), h, F.lit(".example.com")))
        .otherwise(F.concat(F.lit("page "), ks, F.lit(" has no scheme")))
    )
    urls = _orders(spark, sf_dir).select(url.alias("url"))
    return canonicalize_urls(urls)


def q_group_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group cap sampling (pipeline/sampling.group_capped_sample):
    at most 60 docs per lang, representatives ranked by the seeded
    md5-prefix id hash (ties by id) — the per-domain/host cap op,
    exactly reproducible by the oracle's ROW_NUMBER."""
    from linkgraph.pipeline import group_capped_sample

    return group_capped_sample(
        _documents(spark, sf_dir), "lang", 60, seed=7
    ).select("doc_id", "lang")


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM sequence packing (pipeline/packing.pack_sequences): docs in
    doc_id order, exclusive token prefix sums, seq = floor(c/budget).
    The Spark side runs the two-phase distributed prefix sum (range
    partition + P-row offsets + Arrow cumsum); the oracle is one SQL
    window — equality IS the parallelism-independence proof."""
    from linkgraph.pipeline import pack_sequences

    return pack_sequences(_documents(spark, sf_dir), budget=512)


def q_copy_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document passage-copy pairs via shared winnowing
    fingerprints (pipeline/fingerprint.copy_candidates — the MOSS
    composition over doc_fingerprints). min_shared=2 drops single-
    collision noise; max_df=64 is the boilerplate guard, mirrored in
    the oracle so the comparison stays exact."""
    from linkgraph.pipeline import copy_candidates

    return copy_candidates(
        _documents(spark, sf_dir), k=5, window=4, min_shared=2, max_df=64
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.pipeline import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_topk(emb, k=5, max_queries=10)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN (LSH-bucketed). The hyperplanes are seeded and
    deterministic, so the full approximate pipeline (signatures →
    bucket join → re-rank) is reproduced exactly in the SQL oracle
    (_ann_lsh_sql); recall vs cosine_topk is additionally pinned in
    pytest."""
    from linkgraph.pipeline import lsh_ann_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return lsh_ann_topk(emb, k=5, max_queries=10)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN (IVF-Flat, pipeline/simsearch.ivf_ann_topk):
    deterministic k-means inverted lists (k=8, 3 rounds — the same
    index the kmeans_embed row pins), nprobe=3 nearest lists per
    query, exact cosine re-rank inside them. Index + probe ranking
    are deterministic, so the SQL oracle re-derives the identical
    candidate set; recall vs cosine_topk is additionally pinned in
    pytest."""
    from linkgraph.pipeline import ivf_ann_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return ivf_ann_topk(emb, k=5, max_queries=10, n_clusters=8, nprobe=3, rounds=3)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (LSH-bucketed candidates, exact
    cosine re-check). The synthetic embeddings are iid random — max
    pair cosine at sf0.01 is ~0.51 — so the driver query pins
    threshold=0.35 to yield a non-trivial result; production web-scale
    corpora use ~0.9. The seeded hyperplanes make the approximate
    candidate set exactly reproducible in the SQL oracle."""
    from linkgraph.pipeline import embedding_near_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_near_dup_pairs(emb, threshold=0.35)


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus sampling
    (pipeline/sampling.py): downsample dominant English to 25%, keep
    low-resource languages in full (fr 100%, others 60%) — the
    corpus-balancing op. Membership = seeded md5-prefix hash
    threshold, so the oracle reproduces the EXACT kept set, not just
    the rate."""
    from linkgraph.pipeline import stratified_sample

    docs = _documents(spark, sf_dir)
    return stratified_sample(
        docs, {"en": 0.25, "fr": 1.0}, default_rate=0.6, seed=7
    ).select("doc_id", "lang")


def q_kmeans_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd k-means over the embeddings table
    (pipeline/embedcluster.py; k=8, 3 rounds, smallest-8-ids init) —
    the SemDeDup/IVF curation primitive. Output is integers only
    (vec_id, cluster); engines can disagree on a distance only at
    ~1e-13 relative, far below any real argmin gap."""
    from linkgraph.pipeline import kmeans

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return kmeans(emb, k=8, rounds=3).assignments


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup (pipeline/embedcluster.semantic_dedup,
    Abbas et al. 2023): the SAME deterministic k-means index as
    kmeans_embed/ann_ivf_topk partitions the corpus; within each
    cluster items are ranked by (centroid_sim ASC, vec_id) — the paper
    keeps the example farthest from the centroid — and an item is
    removed when a better-ranked cluster-mate has cosine >= threshold.
    All cosines are 9-decimal-rounded on both engines, so the oracle
    re-derives the identical keep set. threshold=0.3 so the iid
    synthetic embeddings actually produce removals (204 of 500)."""
    from linkgraph.pipeline import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return semantic_dedup(emb, threshold=0.3, n_clusters=8, rounds=3)


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/quality signals per document
    (pipeline/textstats.gopher_quality, Rae et al. 2021 word-level
    subset): dup-word fraction, top-bigram character coverage, symbol
    ratio, mean word length, and the composite keep flag. The keep
    flag is evaluated on the 9-decimal-ROUNDED metrics on both
    engines, so it is reproducible bit-for-bit; the sf0.01 corpus
    spans 27-72 words, so the 50-word Gopher minimum splits it and
    the flag is non-trivial."""
    from linkgraph.pipeline import gopher_quality

    return gopher_quality(_documents(spark, sf_dir))


def q_c4_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cleanliness signals (pipeline/textstats.c4_quality,
    Raffel et al. JMLR'20 §2.2 document-level subset): terminal
    punctuation, sentence count, lorem-ipsum / curly-brace /
    javascript screens, composite keep. The synthetic corpus has no
    punctuation, so documents are unioned-in-place with deterministic
    suffixes keyed on doc_id % 6 — one clean-pass class and one class
    per failing rule — making every rule fire and the flag
    non-trivial (~84 of 500 keeps at sf0.01). All signals are
    integer/boolean logic: hash-exact, NO floats."""
    from linkgraph.pipeline import c4_quality

    docs = _documents(spark, sf_dir).select("doc_id", "text")
    suffix = (
        F.when(F.col("doc_id") % 6 == 0,
               F.lit(". More text here. And a third sentence."))
        .when(F.col("doc_id") % 6 == 1,
              F.lit(". Lorem ipsum dolor sit amet. Three sentences here."))
        .when(F.col("doc_id") % 6 == 2,
              F.lit(". Brace { ahead. Three sentences total."))
        .when(F.col("doc_id") % 6 == 3,
              F.lit(". Enable javascript to continue. Third sentence."))
        .when(F.col("doc_id") % 6 == 4, F.lit(""))
        .otherwise(F.lit("?"))
    )
    return c4_quality(docs.select("doc_id", F.concat("text", suffix).alias("text")))


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG document chunking (pipeline/chunking.chunk_documents):
    32-token windows with 8-token overlap (stride 24) — sf0.01 docs
    span 27-72 words so per-doc chunk counts vary 1-3 and overlap is
    real. Chunk boundaries and text are a pure integer/string function
    of the text: hash-exact."""
    from linkgraph.pipeline import chunk_documents

    return chunk_documents(
        _documents(spark, sf_dir).select("doc_id", "text"), window=32, overlap=8
    )


def q_cms_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch point estimates vs exact counts
    (pipeline/sketches.py, Cormode & Muthukrishnan JAlg'05): depth 4 ×
    width 16 over the 31-word sf0.01 vocabulary, so bucket collisions
    are real (16 of 31 terms overestimated) while the CMS guarantee
    est ≥ true holds on every row. All int64 — hash-exact."""
    from linkgraph.pipeline import cms_estimate, count_min_sketch

    docs = _documents(spark, sf_dir).select("doc_id", "text")
    sk = count_min_sketch(docs, depth=4, width=16, seed=7)
    true = (
        docs.where(F.length(F.trim("text")) > 0)
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
    )
    est = cms_estimate(sk, true.select("term"), depth=4, width=16, seed=7)
    return true.join(est, "term").select("term", "true_cnt", "cms_est")


def q_hll_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog-style distinct sketch (pipeline/sketches.py,
    Flajolet et al. AofA'07) over word trigrams (16,245 true distinct
    at sf0.01; single words collapse to the 31-word vocab): 256
    registers, scaled-integer harmonic mean Z = Σ 2^52 >> reg, so the
    estimate is ONE float expression over exact int64s (ROUND 9)."""
    from linkgraph.pipeline import hll_distinct, word_trigrams

    docs = _documents(spark, sf_dir).select("doc_id", "text")
    _, est = hll_distinct(word_trigrams(docs), b=8, seed=7)
    return est


def q_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter build + probe (pipeline/bloom.py, Bloom CACM'70):
    filter over md5(text) of docs 0-399 (m=2048 bits as 32-bit words,
    k=3, seed 7), probed with every document hash plus 100 synthetic
    absent keys. Members are ALWAYS flagged (no false negatives);
    the measured false positives (22 of 200 non-members at sf0.01)
    are part of the hash-exact row. BIT_OR-mergeable words."""
    from linkgraph.pipeline import bloom_build, bloom_probe

    docs = _documents(spark, sf_dir).select("doc_id", F.md5("text").alias("key"))
    bloom = bloom_build(docs.where("doc_id < 400"), "key", m_bits=2048, k=3, seed=7)
    probes = docs.select("key").unionByName(
        spark.range(100).select(F.concat(F.lit("absent"), "id").alias("key"))
    )
    return bloom_probe(bloom, probes, "key", m_bits=2048, k=3, seed=7)


def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantized covariance sums (pipeline/embedpca.py): the
    distributed pass of PCA — per dim pair (d1 ≤ d2) the int64 sums
    (n, Σq1, Σq2, Σq1·q2) over floor(v·1e6)-quantized coordinates.
    mapInPandas partial Gram per partition (dim² rows each) + one
    hash groupBy onto 2,080 keys; all int64 — hash-exact."""
    from linkgraph.pipeline import embedding_covariance

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_covariance(emb, dim=64)


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge learning (pipeline/bpe.py, Sennrich et
    al. ACL'16): the first 6 merges over the corpus word-frequency
    table — greedy left-to-right merging via the double-separator
    string encoding ('~a~~b~' patterns cannot false-match across
    symbol boundaries and replace() preserves the encoding), ties by
    (left, right). Merge 6 composes merge 1 (m+er) so the hierarchy
    is exercised. Strings + int64 — hash-exact."""
    from linkgraph.pipeline import bpe_learn

    return bpe_learn(_documents(spark, sf_dir), n_merges=6).merges


def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE apply (pipeline/bpe.bpe_encode): per-doc token counts
    under the corpus's own first-6 learned merges — merge chain runs
    once per DISTINCT word (vocab-scale), broadcast-joined back to
    occurrences, one groupBy per doc. All int64 — hash-exact; the
    oracle re-learns the merges in SQL and applies the same chain."""
    from linkgraph.pipeline import bpe_encode, bpe_learn

    docs = _documents(spark, sf_dir).select("doc_id", "text")
    merges = [
        (r["left"], r["right"])
        for r in bpe_learn(docs, n_merges=6).merges.orderBy("step").collect()
    ]
    return bpe_encode(docs, merges)


def q_mask_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MLM masking (pipeline/masking.mask_tokens,
    Devlin et al. §3.1 mask-only subset): ~15% of token positions per
    doc selected by the shared seeded md5-prefix membership hash —
    exact, layout-independent, rerun-reproducible. masked_text +
    "pos:token" labels + counts; strings/int64 hash-exact."""
    from linkgraph.pipeline import mask_tokens

    return mask_tokens(
        _documents(spark, sf_dir).select("doc_id", "text"), rate=0.15, seed=7
    )


def q_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram pair counts (pipeline/masking.skipgram_pairs,
    Mikolov et al. NIPS'13): window 2, min_count 2 over the corpus —
    the word2vec training-data table (941 distinct pairs before the
    cut at sf0.01). Strings + int64 — hash-exact."""
    from linkgraph.pipeline import skipgram_pairs

    return skipgram_pairs(
        _documents(spark, sf_dir).select("text"), window=2, min_count=2
    )


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Gopher repetition family (pipeline/textstats.repetition_
    signals, Rae et al. 2021 Table A1, word-level): per (doc, n) the
    top-n-gram coverage and the duplicate-n-gram UNION coverage
    (gaps-and-islands interval merge — not the overlap-double-counting
    Σcount·n). Exact int64 ratios, ROUND(9)."""
    from linkgraph.pipeline import repetition_signals

    return repetition_signals(_documents(spark, sf_dir), ns=(2, 3, 4, 5))


def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes (pipeline/embedcluster.pq_codes,
    Jégou et al. TPAMI'11): 4 subspaces × 16 dims, k=8 codebooks from
    the deterministic per-slice Lloyd runs (2 rounds). 2,000
    all-int64 rows — hash-exact; the oracle re-derives each
    subspace's codebook via the sliced unrolled k-means chain."""
    from linkgraph.pipeline import pq_codes

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return pq_codes(emb, n_subspaces=4, k=8, rounds=2)


def q_hll_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped HLL (pipeline/sketches.hll_distinct_by): approximate
    distinct word-trigram count PER LANGUAGE — the production
    distinct-per-group shape (registers keyed (lang, bucket), empty
    buckets folded arithmetically). Same exact-int64 + one-float
    contract as hll_trigrams; 5 rows."""
    from linkgraph.pipeline import hll_distinct_by

    docs = _documents(spark, sf_dir)
    w = F.split(F.trim("text"), r"\s+")
    tri = F.expr(
        "transform(sequence(0, size(w) - 3), i ->"
        " concat(w[i], ' ', w[i + 1], ' ', w[i + 2]))"
    )
    grouped = (
        docs.select("lang", w.alias("w"))
        .where(F.size("w") >= 3)
        .select("lang", F.explode(tri).alias("term"))
    )
    return hll_distinct_by(grouped, "lang", b=8, seed=7)


def q_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced downsampling
    (pipeline/embedcluster.cluster_balanced_sample): the SAME
    deterministic k-means index as kmeans_embed partitions the
    embeddings, then 20 items per cluster are kept by the seeded
    md5-prefix id hash shared with stratified_sample — topic-coverage-
    preserving corpus shrinking with an exactly-reproducible kept
    set."""
    from linkgraph.pipeline import cluster_balanced_sample

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cluster_balanced_sample(emb, per_cluster=20, n_clusters=8, rounds=3, seed=7)


def q_feature_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SGC-style feature propagation (pipeline/embedprop.py, Wu et
    al. ICML'19): 2 rounds of in-neighbor+self mean over a
    deterministic ring+skip graph on the vec_ids (i -> i+1 mod n and
    i -> 7i+3 mod n) — hyperlink-context pooling for page embeddings.
    The operator is FIXED-POINT (int64 1e-9 units, exact sums, floor-
    division means), so the unrolled SQL oracle reproduces every
    value bit-for-bit; LONG-format output (vec_id, dim, x)."""
    from pyspark.sql import functions as FF

    from linkgraph.pipeline import feature_propagation

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    ids = emb.select("vec_id")
    edges = ids.select(
        FF.col("vec_id").alias("src"), ((FF.col("vec_id") + 1) % n).alias("dst")
    ).union(
        ids.select(
            FF.col("vec_id").alias("src"),
            ((7 * FF.col("vec_id") + 3) % n).alias("dst"),
        )
    )
    return feature_propagation(edges, emb, rounds=2)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (pipeline/decontam.decontaminate):
    every 25th document stands in for an eval suite; each corpus doc
    is flagged with the count of distinct word 4-grams it shares with
    that set (GPT-3/PaLM-style n-gram contamination screening — they
    use 13-grams on real text; the synthetic corpus draws from a tiny
    vocabulary, and n=4 is where cross-doc hits appear beyond the
    benchmark's trivial self-matches: 47 contaminated / 453 clean at
    sf0.01, vs 21/479 at n>=5)."""
    from pyspark.sql import functions as FF

    from linkgraph.pipeline import decontaminate

    docs = _documents(spark, sf_dir)
    benchmark = docs.where(FF.col("doc_id") % 25 == 0)
    return decontaminate(docs, benchmark, n=4)


def _pii_augmented_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic corpus carries no PII, so the pii row plants it
    deterministically from doc_id (the feature_prop pattern for
    missing input features): 2 of 3 docs get an ' contact
    user<id>@example.com from <ipv4> call 555-xxx-xxxx' suffix whose
    phone separator alternates '-'/'.' by parity, and every 5th id a
    second email — counts, flag, and masked text all vary and every
    pattern branch fires."""
    from pyspark.sql import functions as FF

    docs = _documents(spark, sf_dir)
    d = FF.col("doc_id")

    def s(e):
        return e.cast("string")

    sep = FF.when(d % 2 == 0, FF.lit("-")).otherwise(FF.lit("."))
    suffix = FF.concat(
        FF.lit(" contact user"), s(d), FF.lit("@example.com"),
        FF.when(
            d % 5 == 1,
            FF.concat(FF.lit(" cc admin"), s(d), FF.lit("@test.org")),
        ).otherwise(FF.lit("")),
        FF.lit(" from "),
        s(d % 256), FF.lit("."), s((d * 7) % 256), FF.lit("."),
        s((d * 13) % 256), FF.lit("."), s(d % 100 + 1),
        FF.lit(" call 555"), sep,
        FF.lpad(s(d % 1000), 3, "0"), sep,
        FF.lpad(s((d * 31) % 10000), 4, "0"),
    )
    return docs.select(
        "doc_id",
        FF.when(d % 3 == 0, FF.col("text"))
        .otherwise(FF.concat(FF.col("text"), suffix))
        .alias("text"),
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (pipeline/pii.pii_redact): Dolma-/ROOTS-style
    email → IPv4 → phone masking with typed placeholders, counts
    taken sequentially so an email's digits never double-count as a
    phone. Pure codegen projection — the hash compares the full
    redacted text of all 500 docs plus the per-type counts."""
    from linkgraph.pipeline import pii_redact

    return pii_redact(_pii_augmented_docs(spark, sf_dir))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters = the engine's CC kernel over the exact
    n-gram-Jaccard pair graph (same sub-corpus + stop-shingle guard as
    q_ngram_jaccard). Oracle: recursive transitive closure in DuckDB —
    cluster = MIN reachable doc_id, exactly the hash-min CC fixpoint."""
    from pyspark.sql import functions as FF

    from linkgraph.pipeline import dedup_clusters

    docs = _documents(spark, sf_dir).where(FF.col("doc_id") < 100)
    return dedup_clusters(docs, k=3, threshold=0.5, max_df=95)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: converged PageRank over the sf0.001 customer→supplier
    graph; top-100 (id, rank)."""
    from linkgraph.kernels import pagerank

    g = _graph(_cust_supp_edges(spark, "/root/testdata/sf0.001"))
    res = pagerank(g, tol=1e-6, max_iter=100)
    return res.df.orderBy(F.desc("rank"), F.asc("id")).limit(100)


def q_louvain_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Louvain local-move phase (kernels/louvain.louvain_moves):
    3 fixed synchronous rounds of exact-integer modularity-ascent
    moves on the symmetrized cust→supp graph under the parity batch
    schedule (round r moves ids with id % 2 == r % 2) — the unrolled
    oracle replays the move arithmetic; the default coloring schedule
    and its convergence are pinned by pytest replay instead. All
    int64 — hash-exact, no rounding."""
    from linkgraph.kernels import louvain_moves

    g = _graph(_cust_supp_edges(spark, sf_dir))
    res = louvain_moves(g, max_iter=3, schedule="parity")
    return res.df.select("id", "comm")


def q_louvain_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multilevel Louvain (kernels/louvain.louvain): phase 1 on
    the symmetrized cust→supp graph, community contraction (weights
    summed, intra weight → self-loops), phase 2 on the community
    graph — parity schedule, 3 fixed rounds per level, 2 levels, the
    assignment composed down to original ids. The oracle unrolls both
    phases and the contraction; all int64, hash-exact."""
    from linkgraph.kernels import louvain

    g = _graph(_cust_supp_edges(spark, sf_dir))
    res = louvain(g, max_iter=3, schedule="parity", max_levels=2)
    return res.df.select("id", "comm")


def _part_succession_edges_q(
    spark: SparkSession, sf_dir: str, qmax: int
) -> DataFrame:
    """_part_succession_edges with a parameterized quantity cutoff —
    two cutoffs give two deterministic crawl 'snapshots' of the same
    underlying link structure for the diff rows."""
    li = (
        _lineitem(spark, sf_dir)
        .where(F.col("l_quantity") <= qmax)
        .select("l_orderkey", "l_linenumber", "l_partkey")
    )
    b = li.select(
        F.col("l_orderkey").alias("o2"),
        F.col("l_linenumber").alias("ln2"),
        F.col("l_partkey").alias("p2"),
    )
    return (
        li.join(
            b,
            (li["l_orderkey"] == b["o2"])
            & (b["ln2"] == li["l_linenumber"] + 1),
        )
        .where(F.col("l_partkey") != F.col("p2"))
        .select(F.col("l_partkey").alias("src"), F.col("p2").alias("dst"))
        .distinct()
    )


def q_edge_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot edge diff (build.edge_diff): the re-crawl monitoring
    view — old = part-succession at l_quantity <= 15, new = the same
    graph at <= 17, so both added AND removed edges are real (the
    looser cutoff adds lines, which inserts new successions and also
    reroutes existing ones). Two anti-joins; all strings/int64."""
    from linkgraph.build import edge_diff

    old = _part_succession_edges_q(spark, sf_dir, 15)
    new = _part_succession_edges_q(spark, sf_dir, 17)
    return edge_diff(old, new)


def q_degree_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex degree churn between the same two snapshots
    (build.degree_delta) — all int64, changed vertices only."""
    from linkgraph.build import degree_delta

    old = _part_succession_edges_q(spark, sf_dir, 15)
    new = _part_succession_edges_q(spark, sf_dir, 17)
    return degree_delta(old, new)


def q_trussness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full truss decomposition of the part-succession graph
    (kernels/truss.trussness): (u, w, truss) for every symmetrized
    canonical edge via level-synchronous edge peeling — the edge
    analog of the coreness row. Measured at sf0.01: 2 rounds to
    fixpoint, max truss 3 (trusses {2: 2614, 3: 15}). The oracle
    unrolls 8 rounds with the level derived per round by scalar
    subquery; rounds past the fixpoint are no-ops."""
    from linkgraph.kernels import trussness

    g = _graph(_part_succession_edges(spark, sf_dir))
    return trussness(g).df


def q_landmark_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark distance-oracle sketch + triangle-inequality pair
    estimates (kernels/msbfs.landmark_distances / estimate_distances;
    ALT landmarks, Goldberg & Harrelson SODA'05) over the DIRECTED
    part-succession graph: 4 smallest vertices as landmarks (one
    forward + one reverse msbfs sweep), query pairs = (id % 97 == 0) ×
    (id % 101 == 0), answer = min-over-landmarks relay bound with the
    smaller landmark winning ties. All int64 — hash-exact."""
    from linkgraph.kernels import estimate_distances, landmark_distances

    g = _graph(_part_succession_edges(spark, sf_dir))
    landmarks = [
        int(r["id"]) for r in g.vertices.orderBy("id").limit(4).collect()
    ]
    idx = landmark_distances(g, landmarks, max_iter=30)
    srcs = g.vertices.where(F.col("id") % 97 == 0).select(
        F.col("id").alias("src")
    )
    dsts = g.vertices.where(F.col("id") % 101 == 0).select(
        F.col("id").alias("dst")
    )
    return estimate_distances(idx, srcs.crossJoin(dsts))


def q_fold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test fold assignment
    (pipeline/sampling.fold_split): 80/10/10 by the seeded md5-prefix
    id hash against exact int64 boundaries — membership is engine-
    and layout-independent, so the oracle reproduces every row."""
    from linkgraph.pipeline import fold_split

    return fold_split(
        _documents(spark, sf_dir),
        {"train": 0.8, "val": 0.1, "test": 0.1},
        seed=7,
    ).select("doc_id", "fold")


def q_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level corpus filtering (pipeline/urlnorm.url_filter,
    RefinedWeb §3.1-style): urls synthesized deterministically from
    o_orderkey across two domain families with an adult-ish keyword
    path segment on some; blocklist = one whole domain + one specific
    host (suffix matching blocks subdomains of both), one 'casino'
    keyword at max_kw_hits=0. Returns the audit annotation (host,
    blocked_domain, kw_hits, keep) — strings/int64/bool, hash-exact."""
    from linkgraph.pipeline import url_filter

    k = F.col("o_orderkey")
    h = (k % 50).cast("string")
    ks = k.cast("string")
    url = (
        F.when(k % 6 == 0, F.concat(F.lit("http://ads.host"), h, F.lit(".example.com/p/"), ks))
        .when(k % 6 == 1, F.concat(F.lit("https://host"), h, F.lit(".site.org/p/"), ks))
        .when(k % 6 == 2, F.concat(F.lit("http://host"), h, F.lit(".example.com/casino/"), ks))
        .when(k % 6 == 3, F.concat(F.lit("https://host"), h, F.lit(".site.org/free-casino/"), ks))
        .when(k % 6 == 4, F.concat(F.lit("http://host"), h, F.lit(".blocked.net/x/"), ks))
        .otherwise(F.concat(F.lit("no scheme here "), ks))
    )
    urls = _orders(spark, sf_dir).select(url.alias("url"))
    return url_filter(
        urls,
        blocked_domains=["blocked.net", "host3.example.com"],
        blocked_keywords=["casino"],
        max_kw_hits=0,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "degree_counts": q_degree_counts,
        "triangle_count": q_triangle_count,
        "cc_components": q_cc_components,
        "pagerank_k": q_pagerank_k,
        "hits_k": q_hits_k,
        "eigen_k": q_eigen_k,
        "katz_k": q_katz_k,
        "spam_mass_k": q_spam_mass_k,
        "salsa_k": q_salsa_k,
        "modularity_lp": q_modularity_lp,
        "conductance_lp": q_conductance_lp,
        "degree_dist": q_degree_dist,
        "power_law_alpha": q_power_law_alpha,
        "knn_curve": q_knn_curve,
        "rich_club": q_rich_club,
        "attr_assortativity": q_attr_assortativity,
        "four_cliques": q_four_cliques,
        "random_walks": q_random_walks,
        "node2vec_walks": q_node2vec_walks,
        "neighbor_sample": q_neighbor_sample,
        "rw_sample": q_rw_sample,
        "negative_sample": q_negative_sample,
        "degree_relabel": q_degree_relabel,
        "adjacency_gaps": q_adjacency_gaps,
        "pseudo_diameter": q_pseudo_diameter,
        "condensation_levels": q_condensation_levels,
        "ppr_k": q_ppr_k,
        "ppr_sweep": q_ppr_sweep,
        "closeness_k": q_closeness_k,
        "scc": q_scc,
        "bowtie_classes": q_bowtie_classes,
        "clustering_coeff": q_clustering_coeff,
        "link_pred": q_link_pred,
        "butterflies": q_butterflies,
        "densest_core": q_densest_core,
        "graph_stats": q_graph_stats,
        "ktruss_10": q_ktruss,
        "maximal_matching": q_maximal_matching,
        "msf_boruvka": q_msf,
        "edge_jaccard": q_edge_jaccard,
        "ego_net_2": q_ego_net,
        "bfs_levels": q_bfs_levels,
        "msbfs_harmonic": q_msbfs_harmonic,
        "graph_radii": q_graph_radii,
        "betweenness": q_betweenness,
        "sssp_weighted": q_sssp_weighted,
        "kcore": q_kcore,
        "coreness": q_coreness,
        "trussness": q_trussness,
        "louvain_k": q_louvain_k,
        "louvain_ml": q_louvain_ml,
        "host_communities": q_host_communities,
        "edge_diff": q_edge_diff,
        "degree_delta": q_degree_delta,
        "landmark_est": q_landmark_est,
        "fold_split": q_fold_split,
        "url_filter": q_url_filter,
        "mis": q_mis,
        "coloring": q_coloring,
        "anf_sketch": q_anf_sketch,
        "host_graph": q_host_graph,
        "host_pagerank": q_host_pagerank,
        "labelprop_k": q_labelprop_k,
        "pagerank_delta_k": q_pagerank_delta_k,
        "pagerank_delta_multi": q_pagerank_delta_multi,
        "event_sessions_graph": q_event_sessions_graph,
        "event_sessions_stream": q_event_sessions_stream,
        "doc_dedup_stream": q_doc_dedup_stream,
        "trending_stream": q_trending_stream,
        "enriched_event_counts": q_enriched_event_counts,
        "dedup_exact": q_dedup_exact,
        "minhash_signatures": q_minhash_signatures,
        "lsh_pairs": q_lsh_pairs,
        "minhash_jaccard": q_minhash_jaccard,
        "bpe_token_stats": q_bpe_token_stats,
        "simhash": q_simhash,
        "simhash_pairs": q_simhash_pairs,
        "ngram_jaccard": q_ngram_jaccard,
        "token_stats": q_token_stats,
        "tfidf_topk": q_tfidf_topk,
        "vocab_stats": q_vocab_stats,
        "inverted_index": q_inverted_index,
        "bm25_topk": q_bm25_topk,
        "pmi_topk": q_pmi_topk,
        "dedup_normalized": q_dedup_normalized,
        "resolve_redirects": q_resolve_redirects,
        "covisitation": q_covisitation,
        "funnel_steps": q_funnel,
        "event_transitions": q_event_transitions,
        "session_paths": q_session_paths,
        "zorder_orders": q_zorder_orders,
        "retention_cohorts": q_retention,
        "weighted_sample": q_weighted_sample,
        "unigram_logprob": q_unigram_logprob,
        "lang_id": q_lang_id,
        "doc_fingerprints": q_doc_fingerprints,
        "copy_candidates": q_copy_candidates,
        "pack_sequences": q_pack_sequences,
        "url_canon": q_url_canon,
        "group_capped_sample": q_group_capped_sample,
        "ann_topk": q_ann_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "dedup_clusters": q_dedup_clusters,
        "kmeans_embed": q_kmeans_embed,
        "pq_codes": q_pq_codes,
        "semantic_dedup": q_semantic_dedup,
        "stratified_sample": q_stratified_sample,
        "gopher_quality": q_gopher_quality,
        "repetition_signals": q_repetition_signals,
        "bpe_merges": q_bpe_merges,
        "bpe_token_counts": q_bpe_token_counts,
        "mask_tokens": q_mask_tokens,
        "skipgram_pairs": q_skipgram_pairs,
        "c4_quality": q_c4_quality,
        "chunk_documents": q_chunk_documents,
        "cms_top_words": q_cms_top_words,
        "hll_trigrams": q_hll_trigrams,
        "hll_by_lang": q_hll_by_lang,
        "embedding_covariance": q_embedding_covariance,
        "bloom_probe": q_bloom_probe,
        "cluster_sample": q_cluster_sample,
        "feature_prop": q_feature_prop,
        "decontaminate": q_decontaminate,
        "pii_redact": q_pii_redact,
        "pagerank_weighted_k": q_pagerank_weighted_k,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles (ANSI SQL over the same parquet views)
# ---------------------------------------------------------------------------

_PART_SUPP_E = f"""
  SELECT DISTINCT l_partkey AS src, {SUPP_OFFSET} + l_suppkey AS dst
  FROM lineitem
"""

_CUST_SUPP_E = f"""
  SELECT DISTINCT o_custkey AS src, {SUPP_OFFSET} + l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
"""

_COPART_E = """
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""


def _pagerank_k_sql(k: int = 3) -> str:
    """Unrolled k-iteration PageRank with dangling redistribution —
    plain ANSI SQL (no recursive aggregation needed)."""
    sql = f"""
WITH e AS ({_CUST_SUPP_E}),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
od AS (
  SELECT v.id, COALESCE(d.c, 0) AS out_deg
  FROM v LEFT JOIN (SELECT src, COUNT(*) AS c FROM e GROUP BY src) d
    ON v.id = d.src
),
r0 AS (SELECT id, out_deg, 1.0 / (SELECT n FROM nn) AS rank FROM od)
"""
    prev = "r0"
    for i in range(1, k + 1):
        sql += f""",
g{i} AS (
  SELECT e.dst AS id, SUM(r.rank / r.out_deg) AS gathered
  FROM e JOIN {prev} r ON e.src = r.id
  GROUP BY e.dst
),
d{i} AS (SELECT COALESCE(SUM(rank), 0.0) AS dm FROM {prev} WHERE out_deg = 0),
r{i} AS (
  SELECT r.id, r.out_deg,
         0.15 / (SELECT n FROM nn)
         + 0.85 * (COALESCE(g.gathered, 0.0) + (SELECT dm FROM d{i}) / (SELECT n FROM nn)) AS rank
  FROM {prev} r LEFT JOIN g{i} g ON r.id = g.id
)"""
        prev = f"r{i}"
    sql += f"\nSELECT id, ROUND(rank, 9) AS rank FROM {prev}"
    return sql


_PART_SUCC_E = """
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM (SELECT l_orderkey, l_linenumber, l_partkey
        FROM lineitem WHERE l_quantity <= 15) a
  JOIN (SELECT l_orderkey, l_linenumber, l_partkey
        FROM lineitem WHERE l_quantity <= 15) b
    ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
  WHERE a.l_partkey <> b.l_partkey
"""


def _random_walks_sql(length: int = 4, w: int = 2, seed: int = 7) -> str:
    """Unrolled deterministic walks on the part-succession graph: per
    step a ROW_NUMBER argmin over the SAME Lehmer mix as
    kernels/walks.py (constants imported — change both or neither)."""
    from linkgraph.kernels.walks import (
        MIX_MASK,
        MIX_MULT,
        MIX_PRIME,
        MIX_STEP,
        MIX_START,
        MIX_WALK,
    )

    seed = int(seed) % MIX_PRIME
    sql = f"""
WITH e AS MATERIALIZED ({_PART_SUCC_E}),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
p0 AS (SELECT id AS start, r AS walk, id AS vertex
       FROM v CROSS JOIN range({w}) t(r))
"""
    for t in range(1, length + 1):
        h = (
            f"(((((p.start % {MIX_MASK}) * {MIX_START} + p.walk * {MIX_WALK}"
            f" + {t} * {MIX_STEP} + (e.dst % {MIX_MASK}) + {seed})"
            f" % {MIX_PRIME}) * {MIX_MULT}) % {MIX_PRIME})"
        )
        sql += f""",
p{t} AS MATERIALIZED (
  SELECT start, walk, vertex FROM (
    SELECT p.start, p.walk, e.dst AS vertex,
           ROW_NUMBER() OVER (
             PARTITION BY p.start, p.walk ORDER BY {h}, e.dst
           ) AS rn
    FROM p{t - 1} p JOIN e ON p.vertex = e.src
  ) WHERE rn = 1
)"""
    parts = [
        f"SELECT start, walk, CAST({t} AS BIGINT) AS step, vertex FROM p{t}"
        for t in range(0, length + 1)
    ]
    sql += "\n" + "\nUNION ALL\n".join(parts)
    return sql


def _node2vec_sql(
    length: int = 3,
    w: int = 2,
    alphas: tuple[int, int, int] = (1, 4, 2),
    seed: int = 7,
) -> str:
    """Unrolled node2vec biased walks on the part-succession graph:
    per step the SAME integer weight classes (return / distance-1 /
    forward, the distance-1 test an EXISTS against the edge set) and
    the SAME cumulative-sum modular draw as kernels/node2vec.py, with
    the Lehmer-mix constants imported (change both or neither)."""
    from linkgraph.kernels.walks import (
        MIX_MASK,
        MIX_MULT,
        MIX_PRIME,
        MIX_STEP,
        MIX_START,
        MIX_WALK,
    )

    a0, a1, a2 = alphas
    seed = int(seed) % MIX_PRIME
    sql = f"""
WITH e AS MATERIALIZED ({_PART_SUCC_E}),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
p0 AS (SELECT id AS start, r AS walk, id AS prev, id AS vertex
       FROM v CROSS JOIN range({w}) t(r))
"""
    for t in range(1, length + 1):
        r = (
            f"(((((start % {MIX_MASK}) * {MIX_START} + walk * {MIX_WALK}"
            f" + {t} * {MIX_STEP} + 0 + {seed})"
            f" % {MIX_PRIME}) * {MIX_MULT}) % {MIX_PRIME})"
        )
        sql += f""",
p{t} AS MATERIALIZED (
  SELECT start, walk, vertex AS prev, dst AS vertex
  FROM (
    SELECT c.start, c.walk, c.vertex, c.dst, c.w,
           SUM(c.w) OVER (PARTITION BY c.start, c.walk ORDER BY c.dst) AS cum,
           ({r}) % (SUM(c.w) OVER (PARTITION BY c.start, c.walk)) AS r
    FROM (
      SELECT p.start, p.walk, p.prev, p.vertex, e.dst,
             CASE WHEN e.dst = p.prev THEN {a0}
                  WHEN EXISTS (SELECT 1 FROM e pe
                               WHERE pe.src = p.prev AND pe.dst = e.dst)
                    THEN {a1}
                  ELSE {a2} END AS w
      FROM p{t - 1} p JOIN e ON p.vertex = e.src
    ) c
  )
  WHERE cum - w <= r AND r < cum
)"""
    parts = [
        f"SELECT start, walk, CAST({t} AS BIGINT) AS step, vertex FROM p{t}"
        for t in range(0, length + 1)
    ]
    sql += "\n" + "\nUNION ALL\n".join(parts)
    return sql


def _rw_sample_sql(length: int = 4, w: int = 2, seed: int = 7, mod: int = 101) -> str:
    """Replays rw_sample: the _random_walks_sql unroll restricted to
    the seed set, then the induced-subgraph semi-joins."""
    from linkgraph.kernels.walks import (
        MIX_MASK,
        MIX_MULT,
        MIX_PRIME,
        MIX_STEP,
        MIX_START,
        MIX_WALK,
    )

    seed = int(seed) % MIX_PRIME
    sql = f"""
WITH e AS MATERIALIZED ({_PART_SUCC_E}),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
p0 AS (SELECT id AS start, r AS walk, id AS vertex
       FROM v CROSS JOIN range({w}) t(r) WHERE id % {mod} = 0)
"""
    for t in range(1, length + 1):
        h = (
            f"(((((p.start % {MIX_MASK}) * {MIX_START} + p.walk * {MIX_WALK}"
            f" + {t} * {MIX_STEP} + (e.dst % {MIX_MASK}) + {seed})"
            f" % {MIX_PRIME}) * {MIX_MULT}) % {MIX_PRIME})"
        )
        sql += f""",
p{t} AS MATERIALIZED (
  SELECT start, walk, vertex FROM (
    SELECT p.start, p.walk, e.dst AS vertex,
           ROW_NUMBER() OVER (
             PARTITION BY p.start, p.walk ORDER BY {h}, e.dst
           ) AS rn
    FROM p{t - 1} p JOIN e ON p.vertex = e.src
  ) WHERE rn = 1
)"""
    touched = "\n  UNION\n  ".join(
        f"SELECT vertex AS id FROM p{t}" for t in range(0, length + 1)
    )
    sql += f""",
touched AS MATERIALIZED (
  {touched}
)
SELECT e.src, e.dst
FROM e
WHERE e.src IN (SELECT id FROM touched)
  AND e.dst IN (SELECT id FROM touched)
"""
    return sql


def _neighbor_sample_sql(fanouts: list[int] | None = None, seed: int = 7) -> str:
    """Unrolled GraphSAGE layers on the part-succession graph: per
    layer a ROW_NUMBER rank filter over the SAME Lehmer mix as
    kernels/sampling.py (constants imported; walk lane = 0, step =
    layer — mirrors sampling.py's mix_expr call)."""
    from linkgraph.kernels.walks import (
        MIX_MASK,
        MIX_MULT,
        MIX_PRIME,
        MIX_STEP,
        MIX_START,
    )

    fanouts = fanouts or [3, 2]
    seed = int(seed) % MIX_PRIME
    sql = f"""
WITH e AS MATERIALIZED ({_PART_SUCC_E}),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
f0 AS (SELECT id FROM v WHERE id % 97 = 0)
"""
    for layer, fanout in enumerate(fanouts, start=1):
        h = (
            f"(((((e.src % {MIX_MASK}) * {MIX_START} + {layer} * {MIX_STEP}"
            f" + (e.dst % {MIX_MASK}) + {seed})"
            f" % {MIX_PRIME}) * {MIX_MULT}) % {MIX_PRIME})"
        )
        sql += f""",
b{layer} AS MATERIALIZED (
  SELECT CAST({layer} AS BIGINT) AS layer, src, dst FROM (
    SELECT e.src, e.dst,
           ROW_NUMBER() OVER (PARTITION BY e.src ORDER BY {h}, e.dst) AS rn
    FROM f{layer - 1} f JOIN e ON f.id = e.src
  ) WHERE rn <= {fanout}
),
f{layer} AS (SELECT DISTINCT dst AS id FROM b{layer})"""
    parts = [
        f"SELECT layer, src, dst FROM b{i}" for i in range(1, len(fanouts) + 1)
    ]
    sql += "\n" + "\nUNION ALL\n".join(parts)
    return sql


# Degree relabeling oracle: new_id is defined as the global
# (deg DESC, id ASC) rank — the distributed two-phase assignment in
# build.relabel_by_degree is a pure function of the degree table, so
# ROW_NUMBER reproduces it bit-for-bit (all int64).
_DEGREE_RELABEL_SQL = f"""
WITH e AS MATERIALIZED ({_PART_SUCC_E}),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
outd AS (SELECT src AS id, COUNT(*) AS c FROM e GROUP BY src),
ind AS (SELECT dst AS id, COUNT(*) AS c FROM e GROUP BY dst),
deg AS (
  SELECT v.id, COALESCE(outd.c, 0) + COALESCE(ind.c, 0) AS deg
  FROM v LEFT JOIN outd ON outd.id = v.id LEFT JOIN ind ON ind.id = v.id
)
SELECT id,
       CAST(ROW_NUMBER() OVER (ORDER BY deg DESC, id) - 1 AS BIGINT) AS new_id,
       deg
FROM deg
"""




# Pseudo-diameter oracle: two bounded recursive BFS expansions on the
# symmetrized part-succession graph; the bound (40) must exceed the
# measured eccentricities at sf0.01 (rows are compared, so a clipped
# BFS would show up as a farthest/ecc mismatch). f-CTEs pick the
# farthest vertex by (d DESC, id) exactly as the kernel does.
_PSEUDO_DIAM_SQL = f"""
WITH RECURSIVE e0 AS MATERIALIZED ({_PART_SUCC_E}),
sym AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0
  )
),
b1(id, d) AS (
  SELECT (SELECT MIN(src) FROM sym), 0
  UNION
  SELECT s.dst, b.d + 1 FROM b1 b JOIN sym s ON b.id = s.src WHERE b.d < 40
),
l1 AS MATERIALIZED (SELECT id, MIN(d) AS d FROM b1 GROUP BY id),
f1 AS MATERIALIZED (SELECT id, d FROM l1 ORDER BY d DESC, id LIMIT 1),
b2(id, d) AS (
  SELECT (SELECT id FROM f1), 0
  UNION
  SELECT s.dst, b.d + 1 FROM b2 b JOIN sym s ON b.id = s.src WHERE b.d < 40
),
l2 AS MATERIALIZED (SELECT id, MIN(d) AS d FROM b2 GROUP BY id),
f2 AS MATERIALIZED (SELECT id, d FROM l2 ORDER BY d DESC, id LIMIT 1)
SELECT CAST(0 AS BIGINT) AS sweep,
       CAST((SELECT MIN(src) FROM sym) AS BIGINT) AS source,
       CAST((SELECT id FROM f1) AS BIGINT) AS farthest,
       CAST((SELECT d FROM f1) AS BIGINT) AS ecc
UNION ALL
SELECT CAST(1 AS BIGINT), CAST((SELECT id FROM f1) AS BIGINT),
       CAST((SELECT id FROM f2) AS BIGINT), CAST((SELECT d FROM f2) AS BIGINT)
"""


_ADJ_GAPS_SQL = f"""
WITH e AS MATERIALIZED ({_PART_SUCC_E}),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
outd AS (SELECT src AS id, COUNT(*) AS c FROM e GROUP BY src),
ind AS (SELECT dst AS id, COUNT(*) AS c FROM e GROUP BY dst),
map AS MATERIALIZED (
  SELECT id,
         CAST(ROW_NUMBER() OVER (ORDER BY deg DESC, id) - 1 AS BIGINT) AS new_id
  FROM (
    SELECT v.id, COALESCE(outd.c, 0) + COALESCE(ind.c, 0) AS deg
    FROM v LEFT JOIN outd ON outd.id = v.id LEFT JOIN ind ON ind.id = v.id
  )
),
re AS MATERIALIZED (
  SELECT m1.new_id AS src, m2.new_id AS dst
  FROM e JOIN map m1 ON e.src = m1.id JOIN map m2 ON e.dst = m2.id
),
rawl AS (SELECT src, list(dst ORDER BY dst) AS nbrs FROM e GROUP BY src),
rell AS (SELECT src, list(dst ORDER BY dst) AS nbrs FROM re GROUP BY src),
rawb AS (
  SELECT len(nbrs) AS n,
         list_sum(list_transform(generate_series(1, len(nbrs)), i ->
           length(bin(CASE WHEN i = 1 THEN nbrs[1] + 1
                           ELSE nbrs[i] - nbrs[i - 1] END)))) AS bits
  FROM rawl
),
relb AS (
  SELECT len(nbrs) AS n,
         list_sum(list_transform(generate_series(1, len(nbrs)), i ->
           length(bin(CASE WHEN i = 1 THEN nbrs[1] + 1
                           ELSE nbrs[i] - nbrs[i - 1] END)))) AS bits
  FROM rell
)
SELECT 'raw' AS layout, CAST(COUNT(*) AS BIGINT) AS n_lists,
       CAST(SUM(n) AS BIGINT) AS n_edges,
       CAST(SUM(bits) AS BIGINT) AS total_gap_bits
FROM rawb
UNION ALL
SELECT 'degree_relabeled', CAST(COUNT(*) AS BIGINT), CAST(SUM(n) AS BIGINT),
       CAST(SUM(bits) AS BIGINT)
FROM relb
"""


def _negative_sample_sql(k: int = 3, seed: int = 7, overgen: int = 4) -> str:
    """Replays kernels/sampling.py:negative_sample on the
    part-succession graph: cand(src, j) = draw % (max_id + 1) over j in
    [0, k*overgen); drop holes / self-loops / positives / per-src dupes
    (keep min j); first k survivors by (j, cand) win, slot 0-based.
    Mix constants imported from kernels/walks.py — change both or
    neither."""
    from linkgraph.kernels.walks import (
        MIX_MASK,
        MIX_MULT,
        MIX_PRIME,
        MIX_START,
        MIX_WALK,
    )

    seed = int(seed) % MIX_PRIME
    # full-src mix (r5): low 20 bits direct, high bits through one
    # Lehmer round — byte-mirror of kernels/sampling.py:draw_expr
    s1 = (
        f"(((((s.id >> 20) % {MIX_PRIME}) * {MIX_MULT}) % {MIX_PRIME}"
        f" + s.id % {MIX_MASK}) % {MIX_PRIME})"
    )
    h = (
        f"((({s1} * {MIX_START} + t.j * {MIX_WALK} + {seed})"
        f" % {MIX_PRIME}) * {MIX_MULT}) % {MIX_PRIME}"
    )
    return f"""
WITH e AS MATERIALIZED ({_PART_SUCC_E}),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
nid AS (SELECT MAX(id) + 1 AS n FROM v),
cand AS (
  SELECT s.id AS src, t.j, ({h}) % nid.n AS cand
  FROM (SELECT DISTINCT src AS id FROM e) s
  CROSS JOIN range({k * overgen}) t(j)
  CROSS JOIN nid
),
alive AS (
  SELECT c.src, c.j, c.cand FROM cand c
  JOIN v ON v.id = c.cand
  WHERE c.cand <> c.src
    AND NOT EXISTS (
      SELECT 1 FROM e WHERE e.src = c.src AND e.dst = c.cand
    )
),
firstj AS (
  SELECT src, cand, MIN(j) AS j FROM alive GROUP BY src, cand
)
SELECT src, CAST(rn - 1 AS BIGINT) AS slot, cand AS dst FROM (
  SELECT src, cand,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY j, cand) AS rn
  FROM firstj
) WHERE rn <= {k}
"""


# Condensation oracle: the _SCC_SQL closure labels, condensed edge
# set, then longest-path levels by a recursive walk seeded at the
# source components (UNION = set semantics keeps it a fixpoint; MAX(d)
# per component = longest path, finite because the condensation is a
# DAG). Sizes ride the comps CTE.
_CONDENSE_SQL = f"""
WITH RECURSIVE e AS MATERIALIZED ({_PART_SUCC_E}),
reach(src, dst) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
),
verts AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
mutual AS (
  SELECT a.src AS v, a.dst AS u
  FROM reach a JOIN reach b ON a.src = b.dst AND a.dst = b.src
),
lab AS MATERIALIZED (
  SELECT verts.id, LEAST(verts.id, COALESCE(MIN(mutual.u), verts.id)) AS scc
  FROM verts LEFT JOIN mutual ON mutual.v = verts.id
  GROUP BY verts.id
),
cond AS MATERIALIZED (
  SELECT DISTINCT ls.scc AS csrc, ld.scc AS cdst
  FROM e JOIN lab ls ON e.src = ls.id JOIN lab ld ON e.dst = ld.id
  WHERE ls.scc <> ld.scc
),
comps AS MATERIALIZED (SELECT scc, COUNT(*) AS size FROM lab GROUP BY scc),
walk(c, d) AS (
  SELECT scc, 0 FROM comps WHERE scc NOT IN (SELECT cdst FROM cond)
  UNION
  SELECT cond.cdst, w.d + 1 FROM walk w JOIN cond ON w.c = cond.csrc
)
SELECT comps.scc, CAST(MAX(w.d) AS BIGINT) AS level,
       CAST(comps.size AS BIGINT) AS size
FROM comps JOIN walk w ON comps.scc = w.c
GROUP BY comps.scc, comps.size
"""


# SCC oracle: transitive closure by recursive CTE (UNION = set
# semantics keeps it a fixpoint), then scc(v) = min over {v} ∪ {u
# mutually reachable with v} — the min-member label kernels/scc.py
# normalizes to. Tractable because the qty<=15 part-succession graph
# is bow-tie sparse (closure ~1M pairs at sf0.01, measured 0.9s).
_SCC_SQL = """
WITH RECURSIVE e AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM (SELECT l_orderkey, l_linenumber, l_partkey
        FROM lineitem WHERE l_quantity <= 15) a
  JOIN (SELECT l_orderkey, l_linenumber, l_partkey
        FROM lineitem WHERE l_quantity <= 15) b
    ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
  WHERE a.l_partkey <> b.l_partkey
),
reach(src, dst) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
),
verts AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
mutual AS (
  SELECT a.src AS v, a.dst AS u
  FROM reach a JOIN reach b ON a.src = b.dst AND a.dst = b.src
)
SELECT verts.id, LEAST(verts.id, COALESCE(MIN(mutual.u), verts.id)) AS scc
FROM verts LEFT JOIN mutual ON mutual.v = verts.id
GROUP BY verts.id
"""


# Bow-tie oracle: same closure as _SCC_SQL, then core = largest SCC
# (size DESC, label ASC), IN = reaches core, OUT = reached from core,
# CASE order mirrors kernels/bowtie.py (CORE, IN, OUT, OTHER).
_BOWTIE_SQL = """
WITH RECURSIVE e AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM (SELECT l_orderkey, l_linenumber, l_partkey
        FROM lineitem WHERE l_quantity <= 15) a
  JOIN (SELECT l_orderkey, l_linenumber, l_partkey
        FROM lineitem WHERE l_quantity <= 15) b
    ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
  WHERE a.l_partkey <> b.l_partkey
),
reach(src, dst) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
),
verts AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
mutual AS (
  SELECT a.src AS v, a.dst AS u
  FROM reach a JOIN reach b ON a.src = b.dst AND a.dst = b.src
),
sccm AS MATERIALIZED (
  SELECT verts.id, LEAST(verts.id, COALESCE(MIN(mutual.u), verts.id)) AS scc
  FROM verts LEFT JOIN mutual ON mutual.v = verts.id
  GROUP BY verts.id
),
core_pick AS (
  SELECT scc FROM (SELECT scc, COUNT(*) AS n FROM sccm GROUP BY scc)
  ORDER BY n DESC, scc ASC LIMIT 1
),
core AS (SELECT id FROM sccm WHERE scc = (SELECT scc FROM core_pick)),
fwd AS (SELECT DISTINCT r.dst AS id FROM reach r JOIN core c ON r.src = c.id),
bwd AS (SELECT DISTINCT r.src AS id FROM reach r JOIN core c ON r.dst = c.id)
SELECT s.id,
       CASE WHEN s.scc = (SELECT scc FROM core_pick) THEN 'CORE'
            WHEN b.id IS NOT NULL THEN 'IN'
            WHEN f.id IS NOT NULL THEN 'OUT'
            ELSE 'OTHER' END AS cls
FROM sccm s
LEFT JOIN fwd f ON s.id = f.id
LEFT JOIN bwd b ON s.id = b.id
"""



# Per-vertex clustering oracle: T(v) = ordered neighbor pairs of v
# that close (3-way self-join grouped by the wedge center), then the
# same 2T/(d(d-1)) expression as kernels/clustering.py, rounded at 9.
_CLUSTERING_SQL = f"""
WITH e0 AS ({_COPART_E}),
sym AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
deg AS (SELECT src AS id, COUNT(*) AS d FROM sym GROUP BY src),
tri AS (
  SELECT e1.src AS id, COUNT(*) AS t
  FROM sym e1
  JOIN sym e2 ON e1.src = e2.src AND e1.dst < e2.dst
  JOIN sym e3 ON e3.src = e1.dst AND e3.dst = e2.dst
  GROUP BY e1.src
)
SELECT deg.id,
       COALESCE(tri.t, CAST(0 AS BIGINT)) AS tri,
       CASE WHEN deg.d >= 2
            THEN ROUND(2.0 * COALESCE(tri.t, 0) / (deg.d * (deg.d - 1)), 9)
            ELSE 0.0 END AS coeff
FROM deg LEFT JOIN tri ON deg.id = tri.id
"""



# Link-prediction oracle: wedge self-join on the center (cap 64
# mirrored), CN = COUNT, AA = SUM(1/ln(center deg)), anti-join vs the
# symmetric edge set — mirrors kernels/linkpred.py, ROUND(9).
_LINK_PRED_SQL = """
WITH e0 AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM (SELECT l_orderkey, l_linenumber, l_partkey
        FROM lineitem WHERE l_quantity <= 15) a
  JOIN (SELECT l_orderkey, l_linenumber, l_partkey
        FROM lineitem WHERE l_quantity <= 15) b
    ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
  WHERE a.l_partkey <> b.l_partkey
),
sym AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
deg AS (SELECT src AS v, COUNT(*) AS vdeg FROM sym GROUP BY src),
centers AS (
  SELECT s.src AS v, s.dst AS nbr, d.vdeg
  FROM sym s JOIN deg d ON s.src = d.v
  WHERE d.vdeg <= 64
),
pairs AS (
  SELECT e1.nbr AS u, e2.nbr AS w,
         COUNT(*) AS cn,
         SUM(1.0 / LN(e1.vdeg)) AS aa
  FROM centers e1 JOIN centers e2 ON e1.v = e2.v AND e1.nbr < e2.nbr
  GROUP BY e1.nbr, e2.nbr
)
SELECT p.u, p.w, p.cn, ROUND(p.aa, 9) AS aa
FROM pairs p
WHERE NOT EXISTS (SELECT 1 FROM sym s WHERE s.src = p.u AND s.dst = p.w)
  AND p.cn >= 1
"""

# Butterfly count over the part→supplier bipartite graph, wedges
# pivoting on the part (left) side — the side center='auto' resolves
# to (see q_butterflies). DuckDB SUM(BIGINT) yields HUGEINT, so every
# aggregate is cast back to BIGINT for the dtype-strict compare.
_BUTTERFLIES_SQL = f"""
WITH e AS MATERIALIZED ({_PART_SUPP_E}),
cod AS (
  SELECT a.dst AS u, b.dst AS w, COUNT(*) AS c
  FROM e a JOIN e b ON a.src = b.src AND a.dst < b.dst
  GROUP BY a.dst, b.dst
)
SELECT
  (SELECT COUNT(DISTINCT src) FROM e) AS n_left,
  (SELECT COUNT(DISTINCT dst) FROM e) AS n_right,
  (SELECT COUNT(*) FROM e) AS m,
  CAST(COALESCE((SELECT SUM(c) FROM cod), 0) AS BIGINT) AS wedges,
  CAST(COALESCE((SELECT SUM(c * (c - 1) // 2) FROM cod), 0) AS BIGINT)
    AS butterflies
"""



def _densest_sql(rounds: int = 10) -> str:
    """Unrolled Bahmani peeling on the symmetrized part-succession
    graph (eps = 0.1, threshold 1.1*m2/n — the kernel's exact
    expression): per round, degrees of the alive set (deg-0 via LEFT
    JOIN, as in the kernel), removal at deg <= threshold, edges/alive
    shrink by NOT IN. `rounds` must be >= the measured fixpoint (8 at
    sf0.01); extra rounds are empty no-ops (DuckDB float x/0 -> NULL,
    so the empty-round threshold never errors). MATERIALIZED per the
    betweenness oracle lesson."""
    sql = """WITH e0x AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM (SELECT l_orderkey, l_linenumber, l_partkey
        FROM lineitem WHERE l_quantity <= 15) a
  JOIN (SELECT l_orderkey, l_linenumber, l_partkey
        FROM lineitem WHERE l_quantity <= 15) b
    ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
  WHERE a.l_partkey <> b.l_partkey
),
e1s AS MATERIALIZED (SELECT src, dst FROM e0x UNION SELECT dst AS src, src AS dst FROM e0x),
a1 AS MATERIALIZED (SELECT DISTINCT src AS id FROM e1s)"""
    prev_e, prev_a = "e1s", "a1"
    peels = []
    for r in range(1, rounds + 1):
        sql += f""",
d{r} AS MATERIALIZED (
  SELECT a.id, COALESCE(g.c, CAST(0 AS BIGINT)) AS deg
  FROM {prev_a} a LEFT JOIN (SELECT src, COUNT(*) AS c FROM {prev_e} GROUP BY src) g
    ON a.id = g.src
),
s{r} AS (SELECT COUNT(*) AS n, SUM(deg) AS m2 FROM d{r}),
p{r} AS MATERIALIZED (
  SELECT id FROM d{r} WHERE deg <= (SELECT 1.1 * m2 / n FROM s{r})
),
a{r + 1} AS MATERIALIZED (
  SELECT id FROM {prev_a} WHERE id NOT IN (SELECT id FROM p{r})
),
e{r + 1} AS MATERIALIZED (
  SELECT src, dst FROM {prev_e}
  WHERE src NOT IN (SELECT id FROM p{r}) AND dst NOT IN (SELECT id FROM p{r})
)"""
        peels.append(f"SELECT id, CAST({r} AS BIGINT) AS peel FROM p{r}")
        prev_e, prev_a = f"e{r + 1}", f"a{r + 1}"
    return sql + "\n" + "\nUNION ALL\n".join(peels)



# Whole-graph stats oracle — same exact-integer aggregates and the
# identical final expressions as kernels/graphstats.py (Newman r over
# symmetric rows); divisions are DOUBLE on both sides.
_GRAPH_STATS_SQL = """
WITH e0 AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM (SELECT l_orderkey, l_linenumber, l_partkey
        FROM lineitem WHERE l_quantity <= 15) a
  JOIN (SELECT l_orderkey, l_linenumber, l_partkey
        FROM lineitem WHERE l_quantity <= 15) b
    ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
  WHERE a.l_partkey <> b.l_partkey
),
sym AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
deg AS (SELECT src AS v, COUNT(*) AS deg FROM sym GROUP BY src),
joined AS (
  SELECT d1.deg AS j, d2.deg AS k
  FROM sym s JOIN deg d1 ON s.src = d1.v JOIN deg d2 ON s.dst = d2.v
),
base AS (
  SELECT COUNT(*) AS bigm,
         CAST(SUM(j * k) AS BIGINT) AS sjk,
         CAST(SUM(j) AS BIGINT) AS sj,
         CAST(SUM(j * j) AS BIGINT) AS sjj,
         MAX(j) AS max_deg
  FROM joined
),
nm AS (SELECT COUNT(*) AS n FROM deg),
mm AS (SELECT COUNT(*) AS m FROM e0),
rr AS (
  SELECT COUNT(*) AS recip_edges
  FROM e0 a JOIN e0 b ON a.src = b.dst AND a.dst = b.src
)
SELECT n, m, recip_edges,
       CAST(recip_edges AS DOUBLE) / m AS reciprocity,
       max_deg,
       CAST(bigm AS DOUBLE) / n AS avg_deg,
       CAST(bigm * sjk - sj * sj AS DOUBLE)
         / (bigm * sjj - sj * sj) AS assortativity
FROM base, nm, mm, rr
"""



def _ktruss_sql(k: int = 10, rounds: int = 10) -> str:
    """Unrolled k-truss peeling on the canonical co-part edge list:
    per round, triangles via the wedge-center 3-way self-join (each
    triangle credits its closing edge once per opposite center — the
    support table), then edges below k-2 drop. `rounds` must be >= the
    measured fixpoint (8 at sf0.01 for k=10); extra rounds are no-ops.
    The final row set re-reads the LAST round's support, which at the
    fixpoint is the in-truss support (kernels/truss.py returns exactly
    that). MATERIALIZED per the betweenness oracle lesson."""
    sql = f"""WITH ec0 AS MATERIALIZED (SELECT src AS u, dst AS w FROM ({_COPART_E}))"""
    prev = "ec0"
    for r in range(1, rounds + 1):
        sql += f""",
sy{r} AS MATERIALIZED (SELECT u AS src, w AS dst FROM {prev} UNION ALL SELECT w, u FROM {prev}),
tr{r} AS (
  SELECT a.dst AS v, b.dst AS w
  FROM sy{r} a JOIN sy{r} b ON a.src = b.src AND a.dst < b.dst
  JOIN sy{r} c ON c.src = a.dst AND c.dst = b.dst
),
su{r} AS MATERIALIZED (SELECT v AS u, w, COUNT(*) AS support FROM tr{r} GROUP BY v, w),
ec{r} AS MATERIALIZED (
  SELECT e.u, e.w FROM {prev} e LEFT JOIN su{r} s ON e.u = s.u AND e.w = s.w
  WHERE COALESCE(s.support, 0) >= {k - 2}
)"""
        prev = f"ec{r}"
    return sql + f"""
SELECT e.u, e.w, COALESCE(s.support, CAST(0 AS BIGINT)) AS support
FROM ec{rounds - 1} e LEFT JOIN su{rounds} s ON e.u = s.u AND e.w = s.w
WHERE COALESCE(s.support, 0) >= {k - 2}
"""


_WEIGHTED_SAMPLE_SQL = """
SELECT doc_id, lang, n_chars FROM documents
WHERE ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
      < LEAST(GREATEST(CAST(n_chars AS DOUBLE) / 400.0, 0.0), 1.0)
        * 4294967296.0
"""


_STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang FROM documents
WHERE ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT <
  CASE lang
    WHEN 'en' THEN {int(0.25 * (1 << 32))}
    WHEN 'fr' THEN {int(1.0 * (1 << 32))}
    ELSE {int(0.6 * (1 << 32))}
  END
"""


def _kmeans_ctes(k: int = 8, rounds: int = 3, dim: int = 64) -> str:
    """Shared WITH-body for the unrolled Lloyd k-means over the
    embeddings table (pipeline/embedcluster.py): init = smallest-k
    vec_ids, assignment = argmin list_distance with cluster-id
    tie-break (Spark folds sum((x-c)^2) — same ordering; engines
    differ at ~1e-13, far below real argmin gaps), update = AVG per
    (cluster, dim) via a generate_series lateral + list(m ORDER BY d);
    empty clusters keep their previous centroid (NOT IN union).
    Exposes a{rounds} (assignments) and c{rounds-1} (the centroids the
    final assignment used — also what the kernel returns)."""
    sql = f"""
WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
c0 AS MATERIALIZED (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster, vec
  FROM (SELECT vec_id, vec FROM e ORDER BY vec_id LIMIT {k})
)"""
    for r in range(1, rounds + 1):
        p = r - 1
        sql += f""",
a{r} AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cluster,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_distance(e.vec, c.vec), c.cluster) AS rn
    FROM e CROSS JOIN c{p} c
  ) WHERE rn = 1
)"""
        if r < rounds:
            sql += f""",
cm{r} AS MATERIALIZED (
  SELECT a.cluster, g.i AS d, AVG(e.vec[g.i]) AS m
  FROM a{r} a JOIN e ON e.vec_id = a.vec_id, generate_series(1, {dim}) g(i)
  GROUP BY a.cluster, g.i
),
c{r} AS MATERIALIZED (
  SELECT cluster, list(m ORDER BY d) AS vec FROM cm{r} GROUP BY cluster
  UNION ALL
  SELECT c.cluster, c.vec FROM c{p} c
  WHERE c.cluster NOT IN (SELECT cluster FROM cm{r})
)"""
    return sql


def _kmeans_sql(k: int = 8, rounds: int = 3, dim: int = 64) -> str:
    """kmeans_embed oracle — the shared CTE chain's final assignment."""
    return _kmeans_ctes(k, rounds, dim) + f"\nSELECT vec_id, cluster FROM a{rounds}\n"


def _pq_kmeans_ctes(prefix: str, slice_from: int, sub_dim: int,
                    k: int = 8, rounds: int = 2) -> str:
    """_kmeans_ctes over ONE PQ slice: same init/assignment/update
    chain, vectors sliced with list semantics (1-based inclusive)."""
    sql = f"""
{prefix}e AS MATERIALIZED (
  SELECT vec_id,
         CAST(embedding AS DOUBLE[])[{slice_from}:{slice_from + sub_dim - 1}] AS vec
  FROM embeddings),
{prefix}c0 AS MATERIALIZED (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cluster, vec
  FROM (SELECT vec_id, vec FROM {prefix}e ORDER BY vec_id LIMIT {k})
)"""
    for r in range(1, rounds + 1):
        p = r - 1
        sql += f""",
{prefix}a{r} AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cluster,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_distance(e.vec, c.vec), c.cluster) AS rn
    FROM {prefix}e e CROSS JOIN {prefix}c{p} c
  ) WHERE rn = 1
)"""
        if r < rounds:
            sql += f""",
{prefix}cm{r} AS MATERIALIZED (
  SELECT a.cluster, g.i AS d, AVG(e.vec[g.i]) AS m
  FROM {prefix}a{r} a JOIN {prefix}e e ON e.vec_id = a.vec_id,
       generate_series(1, {sub_dim}) g(i)
  GROUP BY a.cluster, g.i
),
{prefix}c{r} AS MATERIALIZED (
  SELECT cluster, list(m ORDER BY d) AS vec FROM {prefix}cm{r} GROUP BY cluster
  UNION ALL
  SELECT c.cluster, c.vec FROM {prefix}c{p} c
  WHERE c.cluster NOT IN (SELECT cluster FROM {prefix}cm{r})
)"""
    return sql


def _pq_codes_sql(n_subspaces: int = 4, dim: int = 64,
                  k: int = 8, rounds: int = 2) -> str:
    """Mirrors pipeline/embedcluster.pq_codes: one sliced k-means
    chain per subspace, final assignments unioned with the sub tag."""
    sub_dim = dim // n_subspaces
    parts = [
        _pq_kmeans_ctes(f"s{i}_", i * sub_dim + 1, sub_dim, k, rounds)
        for i in range(n_subspaces)
    ]
    body = "WITH " + ",".join(p.lstrip("\n") for p in parts)
    sels = [
        f"SELECT vec_id, CAST({i} AS BIGINT) AS sub, CAST(cluster AS BIGINT) AS code"
        f" FROM s{i}_a{rounds}"
        for i in range(n_subspaces)
    ]
    return body + "\n" + "\nUNION ALL\n".join(sels)


def _cluster_sample_sql(
    per_cluster: int = 20, n_clusters: int = 8, rounds: int = 3, seed: int = 7
) -> str:
    """Mirrors pipeline/embedcluster.cluster_balanced_sample: the
    shared unrolled k-means CTE chain gives assignments; per-cluster
    rank by the seeded md5-prefix hash (ties by vec_id) — the same
    hash contract as _STRATIFIED_SAMPLE_SQL."""
    return (
        _kmeans_ctes(n_clusters, rounds)
        + f"""
SELECT vec_id, cluster FROM (
  SELECT vec_id, cluster,
         ROW_NUMBER() OVER (
           PARTITION BY cluster
           ORDER BY ('0x' || substr(md5('{seed}:' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT,
                    vec_id) AS rn
  FROM a{rounds}
) WHERE rn <= {per_cluster}
"""
    )


def _feature_prop_sql(rounds: int = 2, dim: int = 64) -> str:
    """Mirrors q_feature_prop: ring+skip edges + self-loops, long
    format state, and the kernel's FIXED-POINT contract — inputs
    quantized once to int64 1e-9 units (floor, rounding-mode-free),
    each round an exact int64 SUM + one floor-division mean, so the
    values are bit-identical across engines by construction."""
    sql = f"""
WITH nn AS (SELECT COUNT(*) AS n FROM embeddings),
e AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT vec_id AS src, (vec_id + 1) % (SELECT n FROM nn) AS dst FROM embeddings
    UNION ALL
    SELECT vec_id, (7 * vec_id + 3) % (SELECT n FROM nn) FROM embeddings
    UNION ALL
    SELECT vec_id, vec_id FROM embeddings
  )
),
s0 AS MATERIALIZED (
  SELECT e2.vec_id AS id, CAST(g.i - 1 AS BIGINT) AS dim,
         CAST(FLOOR(e2.vec[g.i] * 1000000000) AS BIGINT) AS q
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings) e2,
       generate_series(1, {dim}) g(i)
)"""
    for r in range(1, rounds + 1):
        sql += f""",
s{r} AS MATERIALIZED (
  SELECT e.dst AS id, s.dim,
         CAST(FLOOR(CAST(SUM(s.q) AS DOUBLE) / COUNT(*)) AS BIGINT) AS q
  FROM e JOIN s{r - 1} s ON s.id = e.src
  GROUP BY e.dst, s.dim
)"""
    return (
        sql
        + f"\nSELECT id AS vec_id, dim, CAST(q AS DOUBLE) / 1000000000 AS x FROM s{rounds}\n"
    )


def _ivf_ann_sql(
    k: int = 5,
    max_queries: int = 10,
    n_clusters: int = 8,
    nprobe: int = 3,
    rounds: int = 3,
    dim: int = 64,
) -> str:
    """Reproduces ivf_ann_topk exactly: the SAME unrolled k-means CTE
    chain as kmeans_embed builds the inverted lists (a{rounds}) and the
    final centroids (c{rounds-1}); each query's probe list = nprobe
    nearest centroids by (list_distance, cluster) — the kernel's
    (squared-L2, cluster) struct sort, monotone-identical; candidates =
    corpus rows assigned to a probed list; exact cosine re-rank."""
    return (
        _kmeans_ctes(n_clusters, rounds, dim)
        + f""",
probes AS MATERIALIZED (
  SELECT query_id, cluster FROM (
    SELECT e.vec_id AS query_id, c.cluster,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY list_distance(e.vec, c.vec), c.cluster) AS rn
    FROM e CROSS JOIN c{rounds - 1} c
    WHERE e.vec_id < {max_queries}
  ) WHERE rn <= {nprobe}
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(eq.vec, en.vec), 9) AS sim
  FROM probes p
  JOIN a{rounds} a ON a.cluster = p.cluster AND a.vec_id <> p.query_id
  JOIN e eq ON eq.vec_id = p.query_id
  JOIN e en ON en.vec_id = a.vec_id
),
r AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, sim, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= {k}
"""
    )


def _semantic_dedup_sql(
    threshold: float = 0.3,
    n_clusters: int = 8,
    rounds: int = 3,
    dim: int = 64,
) -> str:
    """Reproduces semantic_dedup exactly: the shared unrolled k-means
    CTE chain gives assignments (a{rounds}) and the final centroids
    (c{rounds-1}); centroid_sim and the pair cosines are 9-decimal-
    rounded on both engines (same sequential fold), the rank window
    and the >=-threshold earlier-ranked test mirror the kernel."""
    r = rounds
    return (
        _kmeans_ctes(n_clusters, rounds, dim)
        + f""",
sd_scored AS MATERIALIZED (
  SELECT a.vec_id, a.cluster,
         ROUND(list_cosine_similarity(e.vec, c.vec), 9) AS centroid_sim
  FROM a{r} a
  JOIN e ON e.vec_id = a.vec_id
  JOIN c{r - 1} c ON c.cluster = a.cluster
),
sd_ranked AS MATERIALIZED (
  SELECT vec_id, cluster, centroid_sim,
         ROW_NUMBER() OVER (PARTITION BY cluster
           ORDER BY centroid_sim ASC, vec_id ASC) AS rn
  FROM sd_scored
),
sd_dups AS (
  SELECT DISTINCT x.vec_id
  FROM sd_ranked x
  JOIN sd_ranked y ON y.cluster = x.cluster AND y.rn < x.rn
  JOIN e ex ON ex.vec_id = x.vec_id
  JOIN e ey ON ey.vec_id = y.vec_id
  WHERE ROUND(list_cosine_similarity(ex.vec, ey.vec), 9) >= {threshold}
)
SELECT r.vec_id, r.cluster, r.centroid_sim, (d.vec_id IS NULL) AS keep
FROM sd_ranked r LEFT JOIN sd_dups d ON d.vec_id = r.vec_id
"""
    )


_EDGE_JACCARD_SQL = f"""
WITH ec AS MATERIALIZED (SELECT src AS u, dst AS w FROM ({_COPART_E})),
sy AS MATERIALIZED (SELECT u AS src, w AS dst FROM ec UNION ALL SELECT w, u FROM ec),
tr AS (
  SELECT a.dst AS v, b.dst AS w
  FROM sy a JOIN sy b ON a.src = b.src AND a.dst < b.dst
  JOIN sy c ON c.src = a.dst AND c.dst = b.dst
),
su AS MATERIALIZED (SELECT v AS u, w, COUNT(*) AS cn FROM tr GROUP BY v, w),
deg AS MATERIALIZED (SELECT src AS vtx, COUNT(*) AS deg FROM sy GROUP BY src)
SELECT e.u, e.w AS v,
       COALESCE(s.cn, CAST(0 AS BIGINT)) AS cn,
       du.deg AS deg_u, dw.deg AS deg_v,
       CAST(COALESCE(s.cn, 0) AS DOUBLE)
         / CAST(du.deg + dw.deg - COALESCE(s.cn, 0) AS DOUBLE) AS jaccard
FROM ec e
LEFT JOIN su s ON e.u = s.u AND e.w = s.w
JOIN deg du ON e.u = du.vtx
JOIN deg dw ON e.w = dw.vtx
"""


def _msf_sql(rounds: int = 4) -> str:
    """Unrolled Borůvka MSF on the co-part graph with line-pair
    co-occurrence weights (kernels/msf.py). Per round: per-component
    min incident edge by the strict (w, u, v) order (ROW_NUMBER), the
    distinct selected edges join the forest, and contraction labels
    come from a recursive-CTE closure over the selection graph (the
    kernel pointer-jumps instead — labels differ, the forest cannot:
    the MSF is unique under a strict order). Rounds past the measured
    fixpoint (2 at sf0.01) are no-ops. The sg DISTINCT is load-bearing
    (sibling UNIONs get ALL-semantics under WITH RECURSIVE in
    DuckDB 1.0 — the msbfs oracle lesson); MATERIALIZED per the sssp
    oracle lesson."""
    sql = """
WITH RECURSIVE wec AS MATERIALIZED (
  SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS w
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
),
le0 AS MATERIALIZED (SELECT w, u, v, u AS cu, v AS cv FROM wec)"""
    for r in range(1, rounds + 1):
        p = r - 1
        sql += f""",
me{r} AS MATERIALIZED (
  SELECT c, w, u, v, oc FROM (
    SELECT c, w, u, v, oc,
           ROW_NUMBER() OVER (PARTITION BY c ORDER BY w, u, v) AS rn
    FROM (SELECT cu AS c, w, u, v, cv AS oc FROM le{p}
          UNION ALL SELECT cv, w, u, v, cu FROM le{p})
  ) WHERE rn = 1
),
sel{r} AS MATERIALIZED (SELECT DISTINCT w, u, v FROM me{r}),
sg{r} AS MATERIALIZED (
  SELECT DISTINCT c1, c2 FROM (
    SELECT c AS c1, oc AS c2 FROM me{r} UNION ALL SELECT oc, c FROM me{r})
),
reach{r} AS (
  SELECT c1 AS c, c1 AS rc FROM sg{r}
  UNION
  SELECT t.c, s.c2 FROM reach{r} t JOIN sg{r} s ON t.rc = s.c1
),
root{r} AS MATERIALIZED (SELECT c, MIN(rc) AS root FROM reach{r} GROUP BY c),
le{r} AS MATERIALIZED (
  SELECT e.w, e.u, e.v,
         COALESCE(a.root, e.cu) AS cu, COALESCE(b.root, e.cv) AS cv
  FROM le{p} e
  LEFT JOIN root{r} a ON e.cu = a.c
  LEFT JOIN root{r} b ON e.cv = b.c
  WHERE COALESCE(a.root, e.cu) <> COALESCE(b.root, e.cv)
)"""
    sql += (
        "\nSELECT u, v, w FROM ("
        + " UNION ALL ".join(f"SELECT u, v, w FROM sel{r}" for r in range(1, rounds + 1))
        + ")\n"
    )
    return sql


def _matching_sql(rounds: int = 12) -> str:
    """Unrolled parallel-greedy maximal matching on the canonical
    co-part edges with the kernel's deterministic edge priority
    h(u,v) = ((u%M)*2654435761%M + (v%M)*2246822519%M) % M,
    M = 1e9+7, tie-broken by (u, v) (kernels/matching.py). Per round:
    an edge matches iff it is the (h,u,v)-smallest live edge at BOTH
    endpoints (ROW_NUMBER window per endpoint); matched vertices'
    edges leave the live set. Rounds past the measured fixpoint
    (9 at sf0.01) are no-ops. MATERIALIZED per the sssp oracle lesson
    (DuckDB 1.0 inlines CTEs by reference)."""
    h = (
        "((u % 1000000007) * 2654435761 % 1000000007"
        " + (v % 1000000007) * 2246822519 % 1000000007) % 1000000007"
    )
    sql = f"""
WITH ec0 AS MATERIALIZED (
  SELECT {h} AS h, u, v
  FROM (SELECT src AS u, dst AS v FROM ({_COPART_E}))
)"""
    for r in range(1, rounds + 1):
        p = r - 1
        sql += f""",
mn{r} AS MATERIALIZED (
  SELECT vid, h, u, v FROM (
    SELECT vid, h, u, v,
           ROW_NUMBER() OVER (PARTITION BY vid ORDER BY h, u, v) AS rn
    FROM (SELECT u AS vid, h, u, v FROM ec{p}
          UNION ALL SELECT v, h, u, v FROM ec{p})
  ) WHERE rn = 1
),
m{r} AS MATERIALIZED (
  SELECT e.u, e.v FROM ec{p} e
  JOIN mn{r} a ON a.vid = e.u AND a.h = e.h AND a.u = e.u AND a.v = e.v
  JOIN mn{r} b ON b.vid = e.v AND b.h = e.h AND b.u = e.u AND b.v = e.v
),
mv{r} AS MATERIALIZED (SELECT u AS id FROM m{r} UNION SELECT v FROM m{r}),
ec{r} AS MATERIALIZED (
  SELECT h, u, v FROM ec{p}
  WHERE u NOT IN (SELECT id FROM mv{r})
    AND v NOT IN (SELECT id FROM mv{r})
)"""
    sql += (
        "\nSELECT u, v FROM ("
        + " UNION ALL ".join(f"SELECT u, v FROM m{r}" for r in range(1, rounds + 1))
        + ")\n"
    )
    return sql


# Ego-net oracle: 2 unrolled symmetric hops from MIN(vertex id) with
# NOT IN visitedness — mirrors kernels/egonet.py direction=both.
_EGO_NET_SQL = """
WITH e0 AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM (SELECT l_orderkey, l_linenumber, l_partkey
        FROM lineitem WHERE l_quantity <= 15) a
  JOIN (SELECT l_orderkey, l_linenumber, l_partkey
        FROM lineitem WHERE l_quantity <= 15) b
    ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
  WHERE a.l_partkey <> b.l_partkey
),
sym AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
h0 AS (
  SELECT id FROM (SELECT src AS id FROM e0 UNION SELECT dst FROM e0)
  ORDER BY id LIMIT 4
),
h1 AS (
  SELECT DISTINCT s.dst AS id FROM sym s JOIN h0 ON s.src = h0.id
  WHERE s.dst NOT IN (SELECT id FROM h0)
),
h2 AS (
  SELECT DISTINCT s.dst AS id FROM sym s JOIN h1 ON s.src = h1.id
  WHERE s.dst NOT IN (SELECT id FROM h0)
    AND s.dst NOT IN (SELECT id FROM h1)
)
SELECT id, CAST(0 AS BIGINT) AS dist FROM h0
UNION ALL SELECT id, CAST(1 AS BIGINT) FROM h1
UNION ALL SELECT id, CAST(2 AS BIGINT) FROM h2
"""


def _pagerank_weighted_k_sql(k: int = 3) -> str:
    """Unrolled k-round weighted PageRank (kernels/pagerank_w.py):
    p = w/wsum row-normalized once (exact int64 division), gather =
    SUM(rank * p), dangling = vertices with no weighted out-edge."""
    sql = f"""
WITH we AS (
  SELECT o_custkey AS src, {SUPP_OFFSET} + l_suppkey AS dst, COUNT(*) AS w
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY o_custkey, l_suppkey
),
v AS (SELECT src AS id FROM we UNION SELECT dst AS id FROM we),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
ws AS (SELECT src, SUM(w) AS wsum FROM we GROUP BY src),
pe AS (
  SELECT we.src, we.dst, CAST(we.w AS DOUBLE) / CAST(ws.wsum AS DOUBLE) AS p
  FROM we JOIN ws ON we.src = ws.src
),
od AS (
  SELECT v.id, (ws.src IS NOT NULL) AS has_out
  FROM v LEFT JOIN ws ON v.id = ws.src
),
r0 AS (SELECT id, has_out, 1.0 / (SELECT n FROM nn) AS rank FROM od)
"""
    prev = "r0"
    for i in range(1, k + 1):
        sql += f""",
g{i} AS (
  SELECT pe.dst AS id, SUM(r.rank * pe.p) AS gathered
  FROM pe JOIN {prev} r ON pe.src = r.id
  GROUP BY pe.dst
),
d{i} AS (SELECT COALESCE(SUM(rank), 0.0) AS dm FROM {prev} WHERE NOT has_out),
r{i} AS (
  SELECT r.id, r.has_out,
         0.15 / (SELECT n FROM nn)
         + 0.85 * (COALESCE(g.gathered, 0.0)
                   + (SELECT dm FROM d{i}) / (SELECT n FROM nn)) AS rank
  FROM {prev} r LEFT JOIN g{i} g ON r.id = g.id
)"""
        prev = f"r{i}"
    return sql + f"\nSELECT id, ROUND(rank, 9) AS rank FROM {prev}\n"


def _host_pagerank_sql(k: int = 3) -> str:
    """Host-level PageRank oracle: the host edge weights are the same
    direct id%50 construction as _HOST_GRAPH_SQL, then the
    pagerank_weighted unroll verbatim."""
    sql = f"""
WITH e AS MATERIALIZED ({_CUST_SUPP_E}),
we AS (
  SELECT src % 50 AS src, dst % 50 AS dst, COUNT(*) AS w
  FROM e WHERE src % 50 <> dst % 50
  GROUP BY 1, 2
),
v AS (SELECT src AS id FROM we UNION SELECT dst AS id FROM we),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
ws AS (SELECT src, SUM(w) AS wsum FROM we GROUP BY src),
pe AS (
  SELECT we.src, we.dst, CAST(we.w AS DOUBLE) / CAST(ws.wsum AS DOUBLE) AS p
  FROM we JOIN ws ON we.src = ws.src
),
od AS (
  SELECT v.id, (ws.src IS NOT NULL) AS has_out
  FROM v LEFT JOIN ws ON v.id = ws.src
),
r0 AS (SELECT id, has_out, 1.0 / (SELECT n FROM nn) AS rank FROM od)
"""
    prev = "r0"
    for i in range(1, k + 1):
        sql += f""",
g{i} AS (
  SELECT pe.dst AS id, SUM(r.rank * pe.p) AS gathered
  FROM pe JOIN {prev} r ON pe.src = r.id
  GROUP BY pe.dst
),
d{i} AS (SELECT COALESCE(SUM(rank), 0.0) AS dm FROM {prev} WHERE NOT has_out),
r{i} AS (
  SELECT r.id, r.has_out,
         0.15 / (SELECT n FROM nn)
         + 0.85 * (COALESCE(g.gathered, 0.0)
                   + (SELECT dm FROM d{i}) / (SELECT n FROM nn)) AS rank
  FROM {prev} r LEFT JOIN g{i} g ON r.id = g.id
)"""
        prev = f"r{i}"
    return sql + f"\nSELECT id AS host_id, ROUND(rank, 9) AS rank FROM {prev}\n"


def _ppr_k_sql(k: int = 3, n_seeds: int = 4) -> str:
    """Unrolled k-round personalized PageRank — pagerank_k's oracle
    with the uniform teleport replaced by a seed-indicator base column
    (dangling mass multiplies base, i.e. returns to the seeds)."""
    sql = f"""
WITH e AS MATERIALIZED ({_CUST_SUPP_E}),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
seeds AS (SELECT DISTINCT src AS id FROM e ORDER BY id LIMIT {n_seeds}),
od AS MATERIALIZED (
  SELECT v.id, COALESCE(d.c, 0) AS out_deg,
         CASE WHEN s.id IS NOT NULL THEN 1.0 / {n_seeds} ELSE 0.0 END AS base
  FROM v
  LEFT JOIN (SELECT src, COUNT(*) AS c FROM e GROUP BY src) d ON v.id = d.src
  LEFT JOIN seeds s ON v.id = s.id
),
r0 AS (SELECT id, out_deg, base, base AS rank FROM od)
"""
    prev = "r0"
    for i in range(1, k + 1):
        sql += f""",
g{i} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(r.rank / r.out_deg) AS gathered
  FROM e JOIN {prev} r ON e.src = r.id
  GROUP BY e.dst
),
d{i} AS (SELECT COALESCE(SUM(rank), 0.0) AS dm FROM {prev} WHERE out_deg = 0),
r{i} AS MATERIALIZED (
  SELECT r.id, r.out_deg, r.base,
         0.15 * r.base
         + 0.85 * (COALESCE(g.gathered, 0.0) + (SELECT dm FROM d{i}) * r.base) AS rank
  FROM {prev} r LEFT JOIN g{i} g ON r.id = g.id
)"""
        prev = f"r{i}"
    sql += f"\nSELECT id, ROUND(rank, 9) AS rank FROM {prev}"
    return sql


def _ppr_sweep_sql(k: int = 3, n_seeds: int = 4, max_sweep: int = 128) -> str:
    """Unrolled PPR chain (same recurrence as _ppr_k_sql) + the ACL
    sweep: ROUND(9) degree-normalized order, difference-array cut
    prefix sums, min-conductance prefix. cut/vol/positions are exact
    integers; phi is one fixed-order double division ROUND(9)ed."""
    sql = f"""
WITH e AS MATERIALIZED ({_CUST_SUPP_E}),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
seeds AS (SELECT DISTINCT src AS id FROM e ORDER BY id LIMIT {n_seeds}),
od AS MATERIALIZED (
  SELECT v.id, COALESCE(d.c, 0) AS out_deg,
         CASE WHEN s.id IS NOT NULL THEN 1.0 / {n_seeds} ELSE 0.0 END AS base
  FROM v
  LEFT JOIN (SELECT src, COUNT(*) AS c FROM e GROUP BY src) d ON v.id = d.src
  LEFT JOIN seeds s ON v.id = s.id
),
r0 AS (SELECT id, out_deg, base, base AS rank FROM od)
"""
    prev = "r0"
    for i in range(1, k + 1):
        sql += f""",
g{i} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(r.rank / r.out_deg) AS gathered
  FROM e JOIN {prev} r ON e.src = r.id
  GROUP BY e.dst
),
d{i} AS (SELECT COALESCE(SUM(rank), 0.0) AS dm FROM {prev} WHERE out_deg = 0),
r{i} AS MATERIALIZED (
  SELECT r.id, r.out_deg, r.base,
         0.15 * r.base
         + 0.85 * (COALESCE(g.gathered, 0.0) + (SELECT dm FROM d{i}) * r.base) AS rank
  FROM {prev} r LEFT JOIN g{i} g ON r.id = g.id
)"""
        prev = f"r{i}"
    sql += f""",
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM e WHERE src <> dst
),
deg AS (
  SELECT id, COUNT(*) AS deg
  FROM (SELECT u AS id FROM und UNION ALL SELECT v AS id FROM und)
  GROUP BY id
),
ranked AS MATERIALIZED (
  SELECT id, deg,
         ROW_NUMBER() OVER (ORDER BY ROUND(rank / deg, 9) DESC, id ASC) AS pos
  FROM {prev} JOIN deg USING (id)
  WHERE rank > 0
  QUALIFY pos <= {max_sweep}
),
tagged AS (
  SELECT a.pos AS pu, b.pos AS pv
  FROM und
  LEFT JOIN ranked a ON und.u = a.id
  LEFT JOIN ranked b ON und.v = b.id
  WHERE a.pos IS NOT NULL OR b.pos IS NOT NULL
),
deltas AS (
  SELECT LEAST(pu, pv) AS kk, CAST(1 AS BIGINT) AS d FROM tagged
  WHERE pu IS NOT NULL AND pv IS NOT NULL
  UNION ALL
  SELECT GREATEST(pu, pv), CAST(-1 AS BIGINT) FROM tagged
  WHERE pu IS NOT NULL AND pv IS NOT NULL
  UNION ALL
  SELECT COALESCE(pu, pv), CAST(1 AS BIGINT) FROM tagged
  WHERE pu IS NULL OR pv IS NULL
),
cutd AS (SELECT kk, SUM(d) AS delta FROM deltas GROUP BY kk),
twom AS (SELECT 2 * COUNT(*) AS tm FROM und),
sweep AS MATERIALIZED (
  SELECT r.id, r.pos,
         SUM(r.deg) OVER (ORDER BY r.pos) AS vol,
         SUM(COALESCE(c.delta, 0)) OVER (ORDER BY r.pos) AS cut
  FROM ranked r LEFT JOIN cutd c ON r.pos = c.kk
),
phis AS (
  SELECT pos,
         CAST(cut AS DOUBLE)
         / NULLIF(CAST(LEAST(vol, (SELECT tm FROM twom) - vol) AS DOUBLE), 0.0)
           AS phi
  FROM sweep
),
best AS (
  SELECT pos AS best_k, phi FROM phis
  WHERE phi IS NOT NULL ORDER BY phi ASC, pos ASC LIMIT 1
)
SELECT s.id, CAST(s.pos AS BIGINT) AS sweep_pos,
       CAST(b.best_k AS BIGINT) AS best_k, ROUND(b.phi, 9) AS phi
FROM sweep s, best b WHERE s.pos <= b.best_k
"""
    return sql


def _spam_mass_sql(k: int = 3, n_seeds: int = 4) -> str:
    """Unrolled TrustRank + spam mass — the pagerank_k chain (uniform
    teleport, dangling / n) and the ppr_k chain (seed base column,
    dangling * base) side by side, joined into the VLDB'06 estimate;
    the |S|/n scale is the same IEEE double division Spark's literal
    carries."""
    sql = f"""
WITH e AS MATERIALIZED ({_CUST_SUPP_E}),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
seeds AS (SELECT DISTINCT src AS id FROM e ORDER BY id LIMIT {n_seeds}),
od AS MATERIALIZED (
  SELECT v.id, COALESCE(d.c, 0) AS out_deg,
         CASE WHEN s.id IS NOT NULL THEN 1.0 / {n_seeds} ELSE 0.0 END AS base
  FROM v
  LEFT JOIN (SELECT src, COUNT(*) AS c FROM e GROUP BY src) d ON v.id = d.src
  LEFT JOIN seeds s ON v.id = s.id
),
p0 AS (SELECT id, out_deg, 1.0 / (SELECT n FROM nn) AS rank FROM od),
t0 AS (SELECT id, out_deg, base, base AS rank FROM od)
"""
    prev = "p0"
    for i in range(1, k + 1):
        sql += f""",
pg{i} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(r.rank / r.out_deg) AS gathered
  FROM e JOIN {prev} r ON e.src = r.id
  GROUP BY e.dst
),
pd{i} AS (SELECT COALESCE(SUM(rank), 0.0) AS dm FROM {prev} WHERE out_deg = 0),
p{i} AS MATERIALIZED (
  SELECT r.id, r.out_deg,
         0.15 / (SELECT n FROM nn)
         + 0.85 * (COALESCE(g.gathered, 0.0) + (SELECT dm FROM pd{i}) / (SELECT n FROM nn)) AS rank
  FROM {prev} r LEFT JOIN pg{i} g ON r.id = g.id
)"""
        prev = f"p{i}"
    prev = "t0"
    for i in range(1, k + 1):
        sql += f""",
tg{i} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(r.rank / r.out_deg) AS gathered
  FROM e JOIN {prev} r ON e.src = r.id
  GROUP BY e.dst
),
td{i} AS (SELECT COALESCE(SUM(rank), 0.0) AS dm FROM {prev} WHERE out_deg = 0),
t{i} AS MATERIALIZED (
  SELECT r.id, r.out_deg, r.base,
         0.15 * r.base
         + 0.85 * (COALESCE(g.gathered, 0.0) + (SELECT dm FROM td{i}) * r.base) AS rank
  FROM {prev} r LEFT JOIN tg{i} g ON r.id = g.id
)"""
        prev = f"t{i}"
    sql += f"""
SELECT p.id, ROUND(p.rank, 9) AS rank, ROUND(t.rank, 9) AS trust,
       ROUND(p.rank - t.rank * ({n_seeds} / (SELECT n FROM nn)), 9) AS spam_mass,
       ROUND((p.rank - t.rank * ({n_seeds} / (SELECT n FROM nn))) / p.rank, 9) AS rel_mass
FROM p{k} p JOIN t{k} t ON p.id = t.id
"""
    return sql


def _hits_k_sql(k: int = 3) -> str:
    """Unrolled k-round two-phase HITS — per round an auth gather +
    L2 norm, then a hub gather over the NORMALIZED auth + L2 norm.
    MATERIALIZED per memory-playbook (DuckDB 1.0 inlines CTEs by
    reference; scalar norm subqueries are fine)."""
    sql = f"""
WITH e AS MATERIALIZED ({_CUST_SUPP_E}),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
s0 AS (SELECT id, 1.0 AS hub, 1.0 AS auth FROM v)
"""
    prev = "s0"
    for i in range(1, k + 1):
        sql += f""",
ar{i} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(s.hub) AS raw
  FROM e JOIN {prev} s ON e.src = s.id GROUP BY e.dst
),
an{i} AS (SELECT COALESCE(SQRT(SUM(raw * raw)), 0.0) AS nv FROM ar{i}),
sa{i} AS MATERIALIZED (
  SELECT s.id, s.hub,
         CASE WHEN (SELECT nv FROM an{i}) > 0
              THEN COALESCE(ar.raw, 0.0) / (SELECT nv FROM an{i})
              ELSE 0.0 END AS auth
  FROM {prev} s LEFT JOIN ar{i} ar ON s.id = ar.id
),
hr{i} AS MATERIALIZED (
  SELECT e.src AS id, SUM(s.auth) AS raw
  FROM e JOIN sa{i} s ON e.dst = s.id GROUP BY e.src
),
hn{i} AS (SELECT COALESCE(SQRT(SUM(raw * raw)), 0.0) AS nv FROM hr{i}),
s{i} AS MATERIALIZED (
  SELECT s.id,
         CASE WHEN (SELECT nv FROM hn{i}) > 0
              THEN COALESCE(hr.raw, 0.0) / (SELECT nv FROM hn{i})
              ELSE 0.0 END AS hub,
         s.auth
  FROM sa{i} s LEFT JOIN hr{i} hr ON s.id = hr.id
)"""
        prev = f"s{i}"
    sql += f"\nSELECT id, ROUND(hub, 9) AS hub, ROUND(auth, 9) AS auth FROM {prev}"
    return sql


def _eigen_k_sql(k: int = 3) -> str:
    """Unrolled k-round eigenvector-centrality power iteration — per
    round one in-edge gather SUM + L2 norm (scalar subquery), exactly
    the kernel's single-phase form of the HITS update. MATERIALIZED
    per memory-playbook (DuckDB 1.0 inlines CTEs by reference)."""
    sql = f"""
WITH e AS MATERIALIZED ({_CUST_SUPP_E}),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
s0 AS (SELECT id, 1.0 AS score FROM v)
"""
    prev = "s0"
    for i in range(1, k + 1):
        sql += f""",
g{i} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(s.score) AS raw
  FROM e JOIN {prev} s ON e.src = s.id GROUP BY e.dst
),
n{i} AS (SELECT COALESCE(SQRT(SUM(raw * raw)), 0.0) AS nv FROM g{i}),
s{i} AS MATERIALIZED (
  SELECT s.id,
         CASE WHEN (SELECT nv FROM n{i}) > 0
              THEN COALESCE(g.raw, 0.0) / (SELECT nv FROM n{i})
              ELSE 0.0 END AS score
  FROM {prev} s LEFT JOIN g{i} g ON s.id = g.id
)"""
        prev = f"s{i}"
    sql += f"\nSELECT id, ROUND(score, 9) AS score FROM {prev}"
    return sql


def _katz_k_sql(k: int = 3, alpha: float = 0.1, beta: float = 1.0) -> str:
    """Unrolled k-round Katz recurrence — per round one in-edge gather
    SUM + the fixed-order beta + alpha*COALESCE(raw, 0) projection,
    exactly the kernel's expression. MATERIALIZED per memory-playbook
    (DuckDB 1.0 inlines CTEs by reference)."""
    sql = f"""
WITH e AS MATERIALIZED ({_CUST_SUPP_E}),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
s0 AS (SELECT id, {beta} AS katz FROM v)
"""
    prev = "s0"
    for i in range(1, k + 1):
        sql += f""",
g{i} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(s.katz) AS raw
  FROM e JOIN {prev} s ON e.src = s.id GROUP BY e.dst
),
s{i} AS MATERIALIZED (
  SELECT s.id, {beta} + {alpha} * COALESCE(g.raw, 0.0) AS katz
  FROM {prev} s LEFT JOIN g{i} g ON s.id = g.id
)"""
        prev = f"s{i}"
    sql += f"\nSELECT id, ROUND(katz, 9) AS katz FROM {prev}"
    return sql


def _salsa_k_sql(k: int = 3) -> str:
    """Unrolled k-round two-phase SALSA — per round a degree-weighted
    auth gather + L1 norm, then a degree-weighted hub gather over the
    NORMALIZED auth + L1 norm. MATERIALIZED per memory-playbook
    (DuckDB 1.0 inlines CTEs by reference)."""
    sql = f"""
WITH e AS MATERIALIZED ({_CUST_SUPP_E}),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
od AS MATERIALIZED (SELECT src AS id, COUNT(*) AS d FROM e GROUP BY src),
idg AS MATERIALIZED (SELECT dst AS id, COUNT(*) AS d FROM e GROUP BY dst),
s0 AS (SELECT id, 1.0 AS hub, 1.0 AS auth FROM v)
"""
    prev = "s0"
    for i in range(1, k + 1):
        sql += f""",
ar{i} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(s.hub / od.d) AS raw
  FROM e JOIN {prev} s ON e.src = s.id JOIN od ON e.src = od.id
  GROUP BY e.dst
),
an{i} AS (SELECT COALESCE(SUM(raw), 0.0) AS nv FROM ar{i}),
sa{i} AS MATERIALIZED (
  SELECT s.id, s.hub,
         CASE WHEN (SELECT nv FROM an{i}) > 0
              THEN COALESCE(ar.raw, 0.0) / (SELECT nv FROM an{i})
              ELSE 0.0 END AS auth
  FROM {prev} s LEFT JOIN ar{i} ar ON s.id = ar.id
),
hr{i} AS MATERIALIZED (
  SELECT e.src AS id, SUM(s.auth / idg.d) AS raw
  FROM e JOIN sa{i} s ON e.dst = s.id JOIN idg ON e.dst = idg.id
  GROUP BY e.src
),
hn{i} AS (SELECT COALESCE(SUM(raw), 0.0) AS nv FROM hr{i}),
s{i} AS MATERIALIZED (
  SELECT s.id,
         CASE WHEN (SELECT nv FROM hn{i}) > 0
              THEN COALESCE(hr.raw, 0.0) / (SELECT nv FROM hn{i})
              ELSE 0.0 END AS hub,
         s.auth
  FROM sa{i} s LEFT JOIN hr{i} hr ON s.id = hr.id
)"""
        prev = f"s{i}"
    sql += f"\nSELECT id, ROUND(hub, 9) AS hub, ROUND(auth, 9) AS auth FROM {prev}"
    return sql


_SYM_CUST_SUPP = f"""
e0 AS ({_CUST_SUPP_E}),
sym AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0)
"""


def _bfs_sql(max_level: int = 15) -> str:
    """BFS from MIN(src) on the symmetrized cust→supp graph: levels via
    bounded recursive expansion (level < max_level matches the Spark
    call's max_iter), parent = MIN(src) over level-1 in-neighbors —
    the deterministic form of the reference's CAS race
    (src/algos.rs:136-140, SURVEY §2.5(5))."""
    return f"""
WITH RECURSIVE {_SYM_CUST_SUPP},
walk(id, level) AS (
  SELECT (SELECT MIN(src) FROM sym), 0
  UNION
  SELECT s.dst, w.level + 1
  FROM walk w JOIN sym s ON w.id = s.src
  WHERE w.level < {max_level}
),
lvl AS (SELECT id, MIN(level) AS level FROM walk GROUP BY id)
SELECT l.id,
       CAST(l.level AS BIGINT) AS level,
       CAST(CASE WHEN l.level = 0 THEN l.id
            ELSE (SELECT MIN(s.src) FROM sym s JOIN lvl l2 ON s.src = l2.id
                  WHERE s.dst = l.id AND l2.level = l.level - 1)
       END AS BIGINT) AS parent
FROM lvl l
"""


def _sssp_sql(rounds: int = 12) -> str:
    """Unrolled classic Bellman-Ford from MIN(src) on the symmetrized
    weighted cust→supp graph (w = (order, lineitem) pair multiplicity):
    d_r(v) = MIN(d_{r-1}(v), MIN over in-edges d_{r-1}(u) + w). Rounds
    past the fixpoint are no-ops; `rounds` must be ≥ the measured
    fixpoint round count at sf0.01 (kernel iterations + margin). All
    CTEs MATERIALIZED (DuckDB 1.0 inlines per reference)."""
    sql = f"""
WITH cw AS MATERIALIZED (
  SELECT o_custkey AS src, {SUPP_OFFSET} + l_suppkey AS dst,
         CAST(COUNT(*) AS DOUBLE) AS w
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY 1, 2
),
symw AS MATERIALIZED (
  SELECT src, dst, w FROM cw
  UNION ALL SELECT dst AS src, src AS dst, w FROM cw
),
d0 AS MATERIALIZED (
  SELECT (SELECT MIN(src) FROM symw) AS id, CAST(0 AS DOUBLE) AS dist
)"""
    for r in range(1, rounds + 1):
        sql += f""",
d{r} AS MATERIALIZED (
  SELECT id, MIN(dv) AS dist FROM (
    SELECT id, dist AS dv FROM d{r - 1}
    UNION ALL
    SELECT e.dst AS id, d.dist + e.w AS dv
    FROM symw e JOIN d{r - 1} d ON e.src = d.id
  ) GROUP BY id
)"""
    sql += f"\nSELECT id, dist FROM d{rounds}\n"
    return sql


def _kcore_sql(k: int = 20, rounds: int = 4) -> str:
    """Unrolled iterative peeling on the symmetrized cust→supp graph:
    each round drops vertices whose remaining degree < k, plus every
    edge touching them. `rounds` must be ≥ the measured fixpoint round
    count (2 at sf0.01; extra rounds are no-ops). Final (id, deg) =
    surviving vertices with their in-core degree."""
    sql = f"WITH {_SYM_CUST_SUPP}"
    prev = "sym"
    for i in range(1, rounds + 1):
        sql += f""",
d{i} AS (SELECT src, COUNT(*) AS c FROM {prev} GROUP BY src),
r{i} AS (SELECT src FROM d{i} WHERE c < {k}),
e{i} AS (
  SELECT src, dst FROM {prev}
  WHERE src NOT IN (SELECT src FROM r{i})
    AND dst NOT IN (SELECT src FROM r{i})
)"""
        prev = f"e{i}"
    sql += f"""
SELECT src AS id, COUNT(*) AS deg FROM {prev} GROUP BY src
"""
    return sql


def _coreness_sql(rounds: int = 24) -> str:
    """Unrolled level-synchronous bucket peeling on the symmetrized
    part-succession graph (kernels/coreness.py). Each round recomputes
    residual degrees, advances the level to max(previous, residual
    min degree) via scalar subqueries (DATA-derived, no literals to
    drift), peels everything at or below the level with that core
    number, and drops the touched edges. Rounds past the fixpoint see
    an empty vertex pool: MIN(c) is NULL -> COALESCE keeps the level,
    nothing peels — no-ops, per the kcore/mis oracle convention.
    MATERIALIZED throughout (the sssp oracle lesson: DuckDB 1.0
    inlines CTEs by reference and the plan explodes)."""
    sql = f"""WITH e0 AS MATERIALIZED ({_PART_SUCC_E}),
sym AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
u0 AS MATERIALIZED (SELECT src AS id FROM sym UNION SELECT dst AS id FROM sym),
le0 AS MATERIALIZED (SELECT src, dst FROM sym),
k0 AS (SELECT CAST(0 AS BIGINT) AS k)"""
    for i in range(1, rounds + 1):
        p = i - 1
        sql += f""",
d{i} AS MATERIALIZED (
  SELECT u.id, COALESCE(c.c, 0) AS c
  FROM u{p} u
  LEFT JOIN (SELECT src, COUNT(*) AS c FROM le{p} GROUP BY src) c
    ON u.id = c.src
),
k{i} AS MATERIALIZED (
  SELECT GREATEST((SELECT k FROM k{p}),
                  COALESCE((SELECT MIN(c) FROM d{i}), 0)) AS k
),
r{i} AS MATERIALIZED (
  SELECT id FROM d{i} WHERE c <= (SELECT k FROM k{i})
),
o{i} AS MATERIALIZED (
  SELECT id, (SELECT k FROM k{i}) AS core FROM r{i}
),
u{i} AS MATERIALIZED (
  SELECT id FROM d{i} WHERE c > (SELECT k FROM k{i})
),
le{i} AS MATERIALIZED (
  SELECT src, dst FROM le{p}
  WHERE src NOT IN (SELECT id FROM r{i})
    AND dst NOT IN (SELECT id FROM r{i})
)"""
    union = "\nUNION ALL\n".join(f"SELECT id, core FROM o{i}" for i in range(1, rounds + 1))
    sql += f"\n{union}\n"
    return sql


_HOST_GRAPH_SQL = f"""
WITH e AS ({_CUST_SUPP_E}),
h AS (
  SELECT 'host' || CAST(src % 50 AS VARCHAR) || '.example.com' AS src_host,
         'host' || CAST(dst % 50 AS VARCHAR) || '.example.com' AS dst_host
  FROM e
)
SELECT src_host, dst_host, COUNT(*) AS weight
FROM h WHERE src_host <> dst_host
GROUP BY src_host, dst_host
"""


def _mis_sql(rounds: int = 6) -> str:
    """Unrolled parallel-greedy MIS on the symmetrized cust→supp graph
    with the kernel's deterministic priority key
    key(v) = ((v*2654435761) % 1000000007) * 2^31 + v (kernels/mis.py).
    Per round: roots = undecided vertices whose every undecided
    neighbor has a larger key; roots enter the set, roots+neighbors
    leave the undecided pool and the live edge set. Rounds past the
    fixpoint are no-ops. MATERIALIZED per the sssp oracle lesson
    (DuckDB 1.0 inlines CTEs by reference)."""
    key = "(({v} * 2654435761) % 1000000007) * 2147483648 + {v}"
    sql = f"""
WITH {_SYM_CUST_SUPP},
u0 AS MATERIALIZED (SELECT src AS id FROM sym UNION SELECT dst AS id FROM sym),
le0 AS MATERIALIZED (SELECT src, dst FROM sym)"""
    for i in range(1, rounds + 1):
        p = i - 1
        sql += f""",
mk{i} AS MATERIALIZED (
  SELECT src, MIN({key.format(v='dst')}) AS nk FROM le{p} GROUP BY src
),
r{i} AS MATERIALIZED (
  SELECT u.id FROM u{p} u LEFT JOIN mk{i} m ON u.id = m.src
  WHERE m.nk IS NULL OR m.nk > {key.format(v='u.id')}
),
rm{i} AS MATERIALIZED (
  SELECT id FROM r{i}
  UNION
  SELECT e.dst AS id FROM le{p} e JOIN r{i} r ON e.src = r.id
),
u{i} AS MATERIALIZED (
  SELECT id FROM u{p} WHERE id NOT IN (SELECT id FROM rm{i})
),
le{i} AS MATERIALIZED (
  SELECT src, dst FROM le{p}
  WHERE src NOT IN (SELECT id FROM rm{i})
    AND dst NOT IN (SELECT id FROM rm{i})
)"""
    sql += (
        "\nSELECT id FROM ("
        + " UNION ALL ".join(f"SELECT id FROM r{i}" for i in range(1, rounds + 1))
        + ")\n"
    )
    return sql


def _coloring_sql(layers: int = 4, rounds: int = 5) -> str:
    """Unrolled iterated-MIS (Luby) coloring on the symmetrized
    cust→supp graph (kernels/coloring.py): each layer runs `rounds`
    unrolled greedy-MIS rounds (the _mis_sql recurrence) on the
    uncolored residual, then the whole layer is peeled off with color =
    layer index. Layers/rounds past the fixpoint are no-ops."""
    key = "(({v} * 2654435761) % 1000000007) * 2147483648 + {v}"
    sql = f"""
WITH {_SYM_CUST_SUPP},
cu0 AS MATERIALIZED (SELECT src AS id FROM sym UNION SELECT dst AS id FROM sym),
ce0 AS MATERIALIZED (SELECT src, dst FROM sym)"""
    for l in range(layers):
        sql += f""",
u{l}_0 AS MATERIALIZED (SELECT id FROM cu{l}),
e{l}_0 AS MATERIALIZED (SELECT src, dst FROM ce{l})"""
        for i in range(1, rounds + 1):
            p = i - 1
            sql += f""",
mk{l}_{i} AS MATERIALIZED (
  SELECT src, MIN({key.format(v='dst')}) AS nk FROM e{l}_{p} GROUP BY src
),
r{l}_{i} AS MATERIALIZED (
  SELECT u.id FROM u{l}_{p} u LEFT JOIN mk{l}_{i} m ON u.id = m.src
  WHERE m.nk IS NULL OR m.nk > {key.format(v='u.id')}
),
rm{l}_{i} AS MATERIALIZED (
  SELECT id FROM r{l}_{i}
  UNION
  SELECT e.dst AS id FROM e{l}_{p} e JOIN r{l}_{i} r ON e.src = r.id
),
u{l}_{i} AS MATERIALIZED (
  SELECT id FROM u{l}_{p} WHERE id NOT IN (SELECT id FROM rm{l}_{i})
),
e{l}_{i} AS MATERIALIZED (
  SELECT src, dst FROM e{l}_{p}
  WHERE src NOT IN (SELECT id FROM rm{l}_{i})
    AND dst NOT IN (SELECT id FROM rm{l}_{i})
)"""
        roots_union = " UNION ALL ".join(
            f"SELECT id FROM r{l}_{i}" for i in range(1, rounds + 1)
        )
        sql += f""",
lay{l} AS MATERIALIZED ({roots_union}),
cu{l + 1} AS MATERIALIZED (
  SELECT id FROM cu{l} WHERE id NOT IN (SELECT id FROM lay{l})
),
ce{l + 1} AS MATERIALIZED (
  SELECT src, dst FROM ce{l}
  WHERE src NOT IN (SELECT id FROM lay{l})
    AND dst NOT IN (SELECT id FROM lay{l})
)"""
    sql += (
        "\nSELECT id, CAST(color AS INTEGER) AS color FROM ("
        + " UNION ALL ".join(
            f"SELECT id, {l} AS color FROM lay{l}" for l in range(layers)
        )
        + ")\n"
    )
    return sql


def _anf_sketch_sql(rounds: int = 8, registers: int = 8) -> str:
    """Unrolled FM-sketch propagation (kernels/anf.py) on the
    symmetrized cust→supp graph — pure int64 bit algebra (hash, lowest
    set bit, bit_or combine, bit_count R-statistic), so the comparison
    with Spark is bit-exact. Rounds past the sketch fixpoint are no-ops
    (bit-or is monotone)."""
    from linkgraph.kernels.anf import ANF_A, ANF_B, ANF_GUARD, ANF_MASK

    def h(k: int) -> str:
        return f"(((id * {ANF_A[k]} + {ANF_B[k]}) & {ANF_MASK}) | {ANF_GUARD})"

    ks = range(registers)
    seed_cols = ",\n         ".join(f"{h(k)} & -{h(k)} AS m{k}" for k in ks)
    sql = f"""
WITH {_SYM_CUST_SUPP},
v AS (SELECT src AS id FROM sym UNION SELECT dst AS id FROM sym),
s0 AS MATERIALIZED (
  SELECT id,
         {seed_cols}
  FROM v
)"""
    for r in range(1, rounds + 1):
        p = r - 1
        gs = ", ".join(f"bit_or(t.m{k}) AS g{k}" for k in ks)
        merged = ",\n         ".join(
            f"s.m{k} | COALESCE(g.g{k}, 0) AS m{k}" for k in ks
        )
        sql += f""",
g{r} AS MATERIALIZED (
  SELECT e.src AS id, {gs}
  FROM sym e JOIN s{p} t ON e.dst = t.id
  GROUP BY e.src
),
s{r} AS MATERIALIZED (
  SELECT s.id,
         {merged}
  FROM s{p} s LEFT JOIN g{r} g ON s.id = g.id
)"""
    r_sum = " + ".join(
        f"bit_count(((~m{k}) & (m{k} + 1)) - 1)" for k in ks
    )
    sql += f"""
SELECT id, {', '.join(f'm{k}' for k in ks)},
       CAST({r_sum} AS BIGINT) AS r_sum
FROM s{rounds}
"""
    return sql


def _msbfs_harmonic_sql(max_level: int = 15) -> str:
    """Multi-source BFS from the 4 smallest vertices of the symmetrized
    cust→supp graph via ONE bounded recursive expansion carrying the
    source lane as a column; harmonic = Σ 1/dist over reaching lanes
    (dist > 0), rounded to 9 decimals to match the Spark side."""
    return f"""
WITH RECURSIVE {_SYM_CUST_SUPP},
v AS (SELECT src AS id FROM sym UNION SELECT dst AS id FROM sym),
-- DISTINCT is load-bearing: under WITH RECURSIVE, DuckDB 1.0 evaluates
-- sibling CTE UNIONs with ALL semantics, so v carries duplicates here
srcs AS (SELECT DISTINCT id FROM v ORDER BY id LIMIT 4),
walk(id, source, dist) AS (
  SELECT id, id, 0 FROM srcs
  UNION
  SELECT s.dst, w.source, w.dist + 1
  FROM walk w JOIN sym s ON w.id = s.src
  WHERE w.dist < {max_level}
),
d AS (SELECT id, source, MIN(dist) AS dist FROM walk GROUP BY id, source)
SELECT id,
       ROUND(SUM(CAST(1.0 AS DOUBLE) / dist), 9) AS harmonic,
       COUNT(*) AS reached
FROM d
WHERE dist > 0
GROUP BY id
"""


def _closeness_sql(max_level: int = 15) -> str:
    """msbfs_harmonic's bounded recursive sweep with the closeness
    rollup; SUM(dist) cast from DuckDB's HUGEINT to BIGINT before the
    single fixed-order division."""
    return f"""
WITH RECURSIVE {_SYM_CUST_SUPP},
v AS (SELECT src AS id FROM sym UNION SELECT dst AS id FROM sym),
srcs AS (SELECT DISTINCT id FROM v ORDER BY id LIMIT 4),
walk(id, source, dist) AS (
  SELECT id, id, 0 FROM srcs
  UNION
  SELECT s.dst, w.source, w.dist + 1
  FROM walk w JOIN sym s ON w.id = s.src
  WHERE w.dist < {max_level}
),
d AS (SELECT id, source, MIN(dist) AS dist FROM walk GROUP BY id, source),
agg AS (
  SELECT id, CAST(SUM(dist) AS BIGINT) AS sum_dist, COUNT(*) AS reached
  FROM d WHERE dist > 0 GROUP BY id
)
SELECT id, sum_dist, reached,
       CAST(reached AS DOUBLE) / CAST(sum_dist AS DOUBLE) AS closeness
FROM agg
"""


def _betweenness_sql(max_level: int = 15) -> str:
    """Brandes BC fully unrolled (no recursion, so the DuckDB RECURSIVE
    UNION quirk is moot): forward levels bf0..bfL accumulate σ per
    (vertex, lane) with a NOT EXISTS per-lane visited check; backward
    bdL..bd0 accumulate δ(v) = Σ_succ (σv/σw)(1+δw) over same-lane
    level-(l+1) successors. bc = Σ δ over lanes, endpoints excluded.
    Levels beyond the real depth are empty CTEs — harmless no-ops.

    Every generated CTE is AS MATERIALIZED: DuckDB 1.0 inlines CTEs
    per reference, and the bf/bvis chain references each level
    multiple times — uninlined, the plan (and the parquet-scan fan-in
    of the sym fragment) grows exponentially with depth and dies with
    'Too many open files'. Materialization evaluates each level
    once."""
    L = max_level
    sql = f"""
WITH {_SYM_CUST_SUPP},
symm AS MATERIALIZED (SELECT src, dst FROM sym),
v AS (SELECT src AS id FROM symm UNION SELECT dst AS id FROM symm),
srcs AS (SELECT DISTINCT id FROM v ORDER BY id LIMIT 4),
bf0 AS MATERIALIZED (SELECT id, id AS source, CAST(1 AS DOUBLE) AS sigma FROM srcs),
bvis0 AS MATERIALIZED (SELECT id, source, sigma FROM bf0)"""
    for l in range(1, L + 1):
        sql += f""",
bf{l} AS MATERIALIZED (
  SELECT e.dst AS id, f.source, SUM(f.sigma) AS sigma
  FROM symm e JOIN bf{l - 1} f ON e.src = f.id
  WHERE NOT EXISTS (
    SELECT 1 FROM bvis{l - 1} vz WHERE vz.id = e.dst AND vz.source = f.source
  )
  GROUP BY e.dst, f.source
),
bvis{l} AS MATERIALIZED (
  SELECT id, source, sigma FROM bvis{l - 1}
  UNION ALL SELECT id, source, sigma FROM bf{l}
)"""
    sql += f""",
bd{L} AS MATERIALIZED (SELECT id, source, sigma, CAST(0 AS DOUBLE) AS delta FROM bf{L})"""
    for l in range(L - 1, -1, -1):
        sql += f""",
bd{l} AS MATERIALIZED (
  SELECT low.id, low.source, low.sigma,
         COALESCE(c.val, CAST(0 AS DOUBLE)) AS delta
  FROM bf{l} low
  LEFT JOIN (
    SELECT e.src AS id, up.source AS source,
           SUM((low2.sigma / up.sigma) * (CAST(1 AS DOUBLE) + up.delta)) AS val
    FROM symm e
    JOIN bf{l} low2 ON e.src = low2.id
    JOIN bd{l + 1} up ON e.dst = up.id AND up.source = low2.source
    GROUP BY e.src, up.source
  ) c ON c.id = low.id AND c.source = low.source
)"""
    union = "\n  UNION ALL ".join(
        f"SELECT id, source, delta FROM bd{l}" for l in range(0, L + 1)
    )
    sql += f""",
alld AS (
  {union}
)
SELECT id, ROUND(SUM(delta), 9) AS bc
FROM alld
WHERE id <> source
GROUP BY id
"""
    return sql


def _graph_radii_sql(max_level: int = 15) -> str:
    """Same bounded multi-source walk as _msbfs_harmonic_sql, rolled up
    per source: eccentricity = MAX(min-dist), reached counts (vertex,
    lane) pairs including the source itself at dist 0."""
    return f"""
WITH RECURSIVE {_SYM_CUST_SUPP},
v AS (SELECT src AS id FROM sym UNION SELECT dst AS id FROM sym),
-- DISTINCT is load-bearing: under WITH RECURSIVE, DuckDB 1.0 evaluates
-- sibling CTE UNIONs with ALL semantics, so v carries duplicates here
srcs AS (SELECT DISTINCT id FROM v ORDER BY id LIMIT 4),
walk(id, source, dist) AS (
  SELECT id, id, 0 FROM srcs
  UNION
  SELECT s.dst, w.source, w.dist + 1
  FROM walk w JOIN sym s ON w.id = s.src
  WHERE w.dist < {max_level}
),
d AS (SELECT id, source, MIN(dist) AS dist FROM walk GROUP BY id, source)
SELECT source,
       CAST(MAX(dist) AS BIGINT) AS ecc,
       COUNT(*) AS reached
FROM d
GROUP BY source
"""


def _labelprop_chain(k: int) -> tuple[str, str]:
    """The unrolled k-round labelprop CTE chain (each vertex adopts
    the most frequent in-neighbor label, ties -> smallest; SURVEY
    §2.6). Returns (with_body, final_cte_name) — shared by the
    labelprop_k and modularity_lp oracles."""
    sql = f"""
WITH e AS ({_CUST_SUPP_E}),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
l0 AS (SELECT id, id AS label FROM v)
"""
    prev = "l0"
    for i in range(1, k + 1):
        sql += f""",
c{i} AS (
  SELECT e.dst, l.label, COUNT(*) AS cnt
  FROM e JOIN {prev} l ON e.src = l.id
  GROUP BY e.dst, l.label
),
w{i} AS (
  SELECT dst, label FROM (
    SELECT dst, label,
           ROW_NUMBER() OVER (PARTITION BY dst ORDER BY cnt DESC, label ASC) AS rn
    FROM c{i}
  ) WHERE rn = 1
),
l{i} AS (
  SELECT l.id, COALESCE(w.label, l.label) AS label
  FROM {prev} l LEFT JOIN w{i} w ON l.id = w.dst
)"""
        prev = f"l{i}"
    return sql, prev


def _labelprop_k_sql(k: int = 3) -> str:
    body, last = _labelprop_chain(k)
    return f"{body}\nSELECT id, label FROM {last}"


def _modularity_sql(k: int = 3) -> str:
    """Directed Leicht-Newman modularity of the k-round labelprop
    partition (kernels/modularity.py): q derived from exact integer
    aggregates through the SAME fixed-order expression as Spark
    ((num AS DOUBLE / m) / m) — bit-identical, no rounding."""
    body, last = _labelprop_chain(k)
    return f"""{body},
el AS (
  SELECT ls.label AS slabel, ld.label AS dlabel
  FROM e JOIN {last} ls ON e.src = ls.id JOIN {last} ld ON e.dst = ld.id
),
ot AS (
  SELECT slabel AS label, COUNT(*) AS out_tot,
         SUM(CASE WHEN slabel = dlabel THEN 1 ELSE 0 END) AS intra
  FROM el GROUP BY slabel
),
it AS (SELECT dlabel AS label, COUNT(*) AS in_tot FROM el GROUP BY dlabel),
st AS (
  SELECT COALESCE(ot.intra, 0) AS intra,
         COALESCE(ot.out_tot, 0) AS out_tot,
         COALESCE(it.in_tot, 0) AS in_tot
  FROM ot FULL OUTER JOIN it ON ot.label = it.label
)
SELECT
  CAST(CAST(SUM(out_tot) * SUM(intra) - SUM(out_tot * in_tot) AS DOUBLE)
       / CAST(SUM(out_tot) AS BIGINT) / CAST(SUM(out_tot) AS BIGINT)
       AS DOUBLE) AS q,
  COUNT(*) AS communities,
  CAST(SUM(intra) AS BIGINT) AS intra_edges,
  CAST(SUM(out_tot) AS BIGINT) AS m
FROM st
"""


_DEGREE_DIST_SQL = f"""
WITH e AS MATERIALIZED ({_PART_SUCC_E}),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
outd AS (SELECT src AS id, COUNT(*) AS deg FROM e GROUP BY src),
ind  AS (SELECT dst AS id, COUNT(*) AS deg FROM e GROUP BY dst),
ofull AS (SELECT COALESCE(o.deg, 0) AS deg FROM v LEFT JOIN outd o ON v.id = o.id),
ifull AS (SELECT COALESCE(i.deg, 0) AS deg FROM v LEFT JOIN ind i ON v.id = i.id),
h AS (
  SELECT 'out' AS direction,
         CASE WHEN deg > 0 THEN length(bin(deg)) - 1 ELSE -1 END AS bin,
         COUNT(*) AS cnt
  FROM ofull GROUP BY 1, 2
  UNION ALL
  SELECT 'in' AS direction,
         CASE WHEN deg > 0 THEN length(bin(deg)) - 1 ELSE -1 END AS bin,
         COUNT(*) AS cnt
  FROM ifull GROUP BY 1, 2
)
SELECT direction, CAST(bin AS BIGINT) AS bin,
       CAST(CASE WHEN bin >= 0 THEN 1 << bin ELSE 0 END AS BIGINT) AS lo,
       CAST(CASE WHEN bin >= 0 THEN (1 << (bin + 1)) - 1 ELSE 0 END AS BIGINT) AS hi,
       CAST(cnt AS BIGINT) AS cnt
FROM h
"""


def _power_law_sql(dmin: int = 4) -> str:
    """Hill tail-exponent oracle — same per-distinct-degree compression
    and the same 1 + tail_n / SUM(c * ln(deg/dmin)) expression as the
    kernel; empty/degenerate tails give NULL (SUM over empty / x/0)."""
    parts = []
    for direction, key in (("out", "src"), ("in", "dst")):
        parts.append(f"""
SELECT '{direction}' AS direction, CAST({dmin} AS BIGINT) AS dmin,
       CAST(COALESCE(SUM(c), 0) AS BIGINT) AS tail_n,
       ROUND(1.0 + CAST(SUM(c) AS DOUBLE)
                   / SUM(CAST(c AS DOUBLE) * LN(CAST(deg AS DOUBLE) / {float(dmin)})), 9)
         AS alpha
FROM (
  SELECT deg, COUNT(*) AS c FROM (
    SELECT {key} AS id, COUNT(*) AS deg FROM e GROUP BY {key}
  ) WHERE deg >= {dmin} GROUP BY deg
)""")
    return (
        f"WITH e AS MATERIALIZED ({_PART_SUCC_E})\n"
        + "\nUNION ALL\n".join(parts)
    )


_RICH_CLUB_SQL = f"""
WITH e0 AS MATERIALIZED ({_PART_SUCC_E}),
sym AS MATERIALIZED (
  SELECT src, dst FROM e0 WHERE src <> dst
  UNION
  SELECT dst AS src, src AS dst FROM e0 WHERE src <> dst
),
deg AS MATERIALIZED (SELECT src AS v, COUNT(*) AS deg FROM sym GROUP BY src),
tagged AS (
  SELECT LEAST(du.deg, dv.deg) AS t
  FROM sym s JOIN deg du ON s.src = du.v JOIN deg dv ON s.dst = dv.v
  WHERE s.src < s.dst
),
th AS (SELECT t AS key, COUNT(*) AS e_at FROM tagged GROUP BY t),
dh AS (SELECT deg AS key, COUNT(*) AS n_at FROM deg GROUP BY deg),
merged AS (
  SELECT COALESCE(dh.key, th.key) AS key,
         COALESCE(n_at, 0) AS n_at, COALESCE(e_at, 0) AS e_at
  FROM dh FULL JOIN th ON dh.key = th.key
),
cum AS (
  SELECT key, n_at, e_at,
         SUM(n_at) OVER (ORDER BY key DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_at AS rich_n,
         SUM(e_at) OVER (ORDER BY key DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - e_at AS rich_e
  FROM merged
)
SELECT CAST(key AS BIGINT) AS k,
       CAST(rich_n AS BIGINT) AS rich_n,
       CAST(rich_e AS BIGINT) AS rich_e,
       CAST(CAST(2 * rich_e AS DOUBLE)
            / NULLIF(CAST(rich_n * (rich_n - 1) AS DOUBLE), 0.0) AS DOUBLE)
         AS phi
FROM cum WHERE n_at > 0
"""


_FOUR_CLIQUES_SQL = f"""
WITH e0 AS ({_COPART_E}),
sym AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
deg AS (SELECT src AS vtx, COUNT(*) AS d FROM sym GROUP BY src),
o AS MATERIALIZED (
  SELECT s.src, s.dst FROM sym s
  JOIN deg d1 ON s.src = d1.vtx
  JOIN deg d2 ON s.dst = d2.vtx
  WHERE d1.d < d2.d OR (d1.d = d2.d AND s.src < s.dst)
),
tri AS MATERIALIZED (
  SELECT e1.src AS v1, e1.dst AS v2, e2.dst AS v3
  FROM o e1
  JOIN o e2 ON e1.src = e2.src AND e1.dst <> e2.dst
  JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst
)
SELECT CAST(4 AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS n_cliques
FROM tri
JOIN o q1 ON q1.src = tri.v1
JOIN o q2 ON q2.src = tri.v2 AND q2.dst = q1.dst
JOIN o q3 ON q3.src = tri.v3 AND q3.dst = q1.dst
"""


_ATTR_ASSORT_SQL = f"""
WITH e AS MATERIALIZED (
  SELECT DISTINCT o_custkey AS src, {SUPP_OFFSET} + l_suppkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
lab AS (
  SELECT c_custkey AS id, c_nationkey AS lab FROM customer
  UNION ALL
  SELECT {SUPP_OFFSET} + s_suppkey AS id, s_nationkey AS lab FROM supplier
),
mix AS MATERIALIZED (
  SELECT ls.lab AS li, ld.lab AS lj, COUNT(*) AS cnt
  FROM e JOIN lab ls ON e.src = ls.id JOIN lab ld ON e.dst = ld.id
  GROUP BY 1, 2
),
rm AS (SELECT li, SUM(cnt) AS a FROM mix GROUP BY li),
cm AS (SELECT lj, SUM(cnt) AS b FROM mix GROUP BY lj),
sx AS (SELECT COALESCE(SUM(a * b), 0) AS s FROM rm JOIN cm ON rm.li = cm.lj),
ag AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS m,
         CAST(SUM(CASE WHEN li = lj THEN cnt ELSE 0 END) AS BIGINT) AS diag
  FROM mix
)
SELECT ag.m, ag.diag, CAST(sx.s AS BIGINT) AS cross,
       CAST(CAST(ag.m * ag.diag - sx.s AS DOUBLE)
            / NULLIF(CAST(ag.m * ag.m - sx.s AS DOUBLE), 0.0) AS DOUBLE) AS r
FROM ag CROSS JOIN sx
"""


_KNN_CURVE_SQL = f"""
WITH e0 AS MATERIALIZED ({_PART_SUCC_E}),
sym AS MATERIALIZED (
  SELECT src, dst FROM e0 WHERE src <> dst
  UNION
  SELECT dst AS src, src AS dst FROM e0 WHERE src <> dst
),
deg AS MATERIALIZED (SELECT src AS v, COUNT(*) AS deg FROM sym GROUP BY src),
nbr AS (
  SELECT s.src, SUM(d.deg) AS s
  FROM sym s JOIN deg d ON s.dst = d.v
  GROUP BY s.src
),
pv AS (
  SELECT n.src, n.s, d.deg
  FROM nbr n JOIN deg d ON n.src = d.v
),
cls AS (
  SELECT deg, COUNT(*) AS n_vertices, SUM(s) AS sum_nbr_deg
  FROM pv GROUP BY deg
)
SELECT CAST(deg AS BIGINT) AS deg,
       CAST(n_vertices AS BIGINT) AS n_vertices,
       CAST(sum_nbr_deg AS BIGINT) AS sum_nbr_deg,
       CAST(CAST(sum_nbr_deg AS DOUBLE)
            / CAST(deg * n_vertices AS DOUBLE) AS DOUBLE) AS knn
FROM cls
"""


def _conductance_sql(k: int = 3) -> str:
    """Per-community conductance of the k-round labelprop partition
    (kernels/modularity.conductance): identical integer aggregates to
    the modularity oracle, phi = the SAME single fixed-order division
    (DuckDB x/0 -> NULL mirrors Spark's try_divide)."""
    body, last = _labelprop_chain(k)
    return f"""{body},
el AS (
  SELECT ls.label AS slabel, ld.label AS dlabel
  FROM e JOIN {last} ls ON e.src = ls.id JOIN {last} ld ON e.dst = ld.id
),
ot AS (
  SELECT slabel AS label, COUNT(*) AS out_tot,
         SUM(CASE WHEN slabel = dlabel THEN 1 ELSE 0 END) AS intra
  FROM el GROUP BY slabel
),
it AS (SELECT dlabel AS label, COUNT(*) AS in_tot FROM el GROUP BY dlabel),
st AS (
  SELECT COALESCE(ot.label, it.label) AS label,
         COALESCE(ot.intra, 0) AS intra,
         COALESCE(ot.out_tot, 0) AS out_tot,
         COALESCE(it.in_tot, 0) AS in_tot
  FROM ot FULL OUTER JOIN it ON ot.label = it.label
),
tot AS (SELECT 2 * SUM(out_tot) AS vol_all FROM st)
SELECT label,
  CAST(out_tot + in_tot - 2 * intra AS BIGINT) AS cut,
  CAST(out_tot + in_tot AS BIGINT) AS vol,
  CAST(out_tot + in_tot - 2 * intra AS DOUBLE)
    / CAST(LEAST(out_tot + in_tot,
                 (SELECT vol_all FROM tot) - (out_tot + in_tot)) AS DOUBLE)
    AS conductance
FROM st
"""


# PageRank-delta with the reference's quirk 1 (src/algos.rs:203): the
# post-round-0 frontier is empty for n > ~7, so converged ranks ARE the
# round-0 values (see q_pagerank_delta_k docstring).
_PAGERANK_DELTA_SQL = f"""
WITH e AS ({_CUST_SUPP_E}),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
od AS (
  SELECT v.id, COALESCE(d.c, 0) AS out_deg
  FROM v LEFT JOIN (SELECT src, COUNT(*) AS c FROM e GROUP BY src) d
    ON v.id = d.src
),
g AS (
  SELECT e.dst AS id, SUM((1.0 / (SELECT n FROM nn)) / od.out_deg) AS gathered
  FROM e JOIN od ON e.src = od.id
  WHERE od.out_deg > 0
  GROUP BY e.dst
)
SELECT od.id,
       ROUND(0.85 * COALESCE(g.gathered, 0.0) + 0.15, 9) AS rank
FROM od LEFT JOIN g ON od.id = g.id
"""


# Multi-round PageRank-delta on the 3-vertex region fixture (see
# q_pagerank_delta_multi): round 0 (full-frontier FirstRound apply,
# quirk-1 activity) and round 1 (scatter restricted to the ACTIVE
# frontier, quirk-2 keep-test apply) unrolled in plain SQL. After
# round 1 the kernel's error term sum(delta) is −0.1558…, below the
# 1e-7 tolerance, so two rounds IS the full trajectory for any
# max_iterations ≥ 2 on this fixture (verified against the NumPy
# transcription of /root/reference/src/algos.rs:169-295).
_PAGERANK_DELTA_MULTI_SQL = """
WITH e AS (
  SELECT a.r_regionkey AS src, b.r_regionkey AS dst
  FROM region a JOIN region b ON a.r_regionkey < b.r_regionkey
  WHERE a.r_regionkey <= 1 AND b.r_regionkey <= 2
),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM v),
od AS (
  SELECT v.id, COALESCE(d.c, 0) AS out_deg
  FROM v LEFT JOIN (SELECT src, COUNT(*) AS c FROM e GROUP BY src) d
    ON v.id = d.src
),
g0 AS (
  SELECT e.dst AS id, SUM((1.0 / (SELECT n FROM nn)) / od.out_deg) AS gathered
  FROM e JOIN od ON e.src = od.id
  WHERE od.out_deg > 0
  GROUP BY e.dst
),
r0 AS (
  SELECT od.id, od.out_deg,
         0.85 * COALESCE(g0.gathered, 0.0) + 0.15 AS rank,
         0.85 * COALESCE(g0.gathered, 0.0) + 0.15 - 1.0 / (SELECT n FROM nn) AS delta,
         ABS(0.85 * COALESCE(g0.gathered, 0.0) + 0.15 - 1.0 / (SELECT n FROM nn))
           > (0.85 * COALESCE(g0.gathered, 0.0) + 0.15) + 0.01 AS active
  FROM od LEFT JOIN g0 ON od.id = g0.id
),
g1 AS (
  SELECT e.dst AS id, SUM(r.delta / r.out_deg) AS gathered
  FROM e JOIN r0 r ON e.src = r.id
  WHERE r.active AND r.out_deg > 0
  GROUP BY e.dst
),
r1 AS (
  SELECT r.id,
         CASE WHEN ABS(r.rank) > r.rank * 0.01
              THEN r.rank + 0.85 * COALESCE(g.gathered, 0.0)
              ELSE r.rank END AS rank
  FROM r0 r LEFT JOIN g1 g ON r.id = g.id
)
SELECT CAST(id AS BIGINT) AS id, ROUND(rank, 9) AS rank FROM r1
"""


def _ann_lsh_sql(k: int = 5, max_queries: int = 10, n_planes: int = 8, n_tables: int = 4, dim: int = 64) -> str:
    """Reproduces lsh_ann_topk exactly: the seeded hyperplanes
    (simsearch._hyperplanes, NumPy default_rng(42)) are emitted as
    DOUBLE[] literals; signature = sign-bit integer per table, candidates
    = bucket collisions in any table, exact cosine re-rank."""
    from linkgraph.pipeline.simsearch import _hyperplanes

    planes = _hyperplanes(dim, n_planes, n_tables, seed=42)
    rows = []
    for t in range(n_tables):
        for p in range(n_planes):
            arr = ", ".join(repr(float(x)) for x in planes[t, p])
            rows.append(f"({t}, {p}, [{arr}]::DOUBLE[])")
    values = ",\n  ".join(rows)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
planes(t, p, pvec) AS (VALUES
  {values}
),
dots AS (
  SELECT e.vec_id, pl.t, pl.p, list_dot_product(e.vec, pl.pvec) AS dot
  FROM e CROSS JOIN planes pl
),
sigs AS (
  SELECT vec_id, t,
         SUM(CASE WHEN dot > 0 THEN (1 << p) ELSE 0 END) AS sig
  FROM dots GROUP BY vec_id, t
),
q AS (SELECT vec_id AS query_id, t, sig FROM sigs WHERE vec_id < {max_queries}),
cand AS (
  SELECT DISTINCT q.query_id, s.vec_id AS neighbor_id
  FROM q JOIN sigs s ON q.t = s.t AND q.sig = s.sig
  WHERE s.vec_id <> q.query_id
),
scored AS (
  SELECT c.query_id, c.neighbor_id,
         ROUND(list_cosine_similarity(eq.vec, en.vec), 9) AS sim
  FROM cand c
  JOIN e eq ON eq.vec_id = c.query_id
  JOIN e en ON en.vec_id = c.neighbor_id
),
r AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rnk
  FROM scored
)
SELECT query_id, neighbor_id, sim, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= {k}
"""


def _near_dup_sql(threshold: float = 0.35, n_planes: int = 8, n_tables: int = 4, dim: int = 64) -> str:
    """Reproduces embedding_near_dup_pairs exactly: same seeded
    hyperplanes as DOUBLE[] literals, candidate pairs = signature
    collisions in any table (vec_a < vec_b), exact rounded-cosine
    filter at `threshold`."""
    from linkgraph.pipeline.simsearch import _hyperplanes

    planes = _hyperplanes(dim, n_planes, n_tables, seed=42)
    rows = []
    for t in range(n_tables):
        for p in range(n_planes):
            arr = ", ".join(repr(float(x)) for x in planes[t, p])
            rows.append(f"({t}, {p}, [{arr}]::DOUBLE[])")
    values = ",\n  ".join(rows)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
planes(t, p, pvec) AS (VALUES
  {values}
),
dots AS (
  SELECT e.vec_id, pl.t, pl.p, list_dot_product(e.vec, pl.pvec) AS dot
  FROM e CROSS JOIN planes pl
),
sigs AS (
  SELECT vec_id, t,
         SUM(CASE WHEN dot > 0 THEN (1 << p) ELSE 0 END) AS sig
  FROM dots GROUP BY vec_id, t
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM sigs a JOIN sigs b ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id
),
scored AS (
  SELECT c.vec_a, c.vec_b,
         ROUND(list_cosine_similarity(ea.vec, eb.vec), 9) AS sim
  FROM cand c
  JOIN e ea ON ea.vec_id = c.vec_a
  JOIN e eb ON eb.vec_id = c.vec_b
)
SELECT vec_a, vec_b, sim FROM scored WHERE sim >= {threshold}
"""


def _dedup_clusters_sql() -> str:
    """Transitive closure over the q_ngram_jaccard pair graph: cluster
    = MIN doc_id reachable along near-dup edges (undirected), i.e. the
    hash-min CC fixpoint; pair-free docs are their own cluster."""
    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_NGRAM_JACCARD_SQL})
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(node, r) AS (
  SELECT CAST(doc_id AS BIGINT), CAST(doc_id AS BIGINT)
  FROM documents WHERE doc_id < 100
  UNION
  SELECT e.b, w.r FROM reach w JOIN edges e ON e.a = w.node
)
SELECT node AS doc_id, CAST(MIN(r) AS BIGINT) AS cluster
FROM reach GROUP BY node
"""


_H32 = "('0x' || substr(md5({col}), 1, 8))::BIGINT"

_SHINGLES = """
  SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 3) AS shingle
  FROM documents, UNNEST(range(1, length(text) - 1)) AS t(i)
  WHERE length(text) >= 3
"""


def _minhash_sql() -> str:
    from linkgraph.pipeline.dedup import MINHASH_P, minhash_params

    values = ", ".join(f"({i}, {a}, {b})" for i, a, b in minhash_params(8))
    return f"""
WITH params(hash_idx, a, b) AS (VALUES {values}),
sh AS ({_SHINGLES}),
h AS (SELECT doc_id, {_H32.format(col='shingle')} AS h FROM sh)
SELECT doc_id, hash_idx, MIN((a * h + b) % {MINHASH_P}) AS min_hash
FROM h CROSS JOIN params
GROUP BY doc_id, hash_idx
"""


def _lsh_pairs_sql() -> str:
    return f"""
WITH sig AS ({_minhash_sql()}),
bands AS (
  SELECT doc_id, CAST(hash_idx // 2 AS INTEGER) AS band_id,
         STRING_AGG(hash_idx || '=' || min_hash, ':' ORDER BY hash_idx || '=' || min_hash) AS band_sig
  FROM sig GROUP BY doc_id, CAST(hash_idx // 2 AS INTEGER)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band_id = b.band_id AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
"""


def _minhash_jaccard_sql(threshold: float = 0.25) -> str:
    """Mirrors pipeline/dedup.minhash_jaccard_pairs: the lsh_pairs
    banding CTEs produce candidates, then the estimate joins the
    signatures back per (pair, hash_idx) and averages equality."""
    return f"""
WITH sig AS ({_minhash_sql()}),
bands AS (
  SELECT doc_id, CAST(hash_idx // 2 AS INTEGER) AS band_id,
         STRING_AGG(hash_idx || '=' || min_hash, ':' ORDER BY hash_idx || '=' || min_hash) AS band_sig
  FROM sig GROUP BY doc_id, CAST(hash_idx // 2 AS INTEGER)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       ROUND(AVG(CASE WHEN sa.min_hash = sb.min_hash THEN 1.0 ELSE 0.0 END), 9)
         AS jaccard_est
FROM cand c
JOIN sig sa ON sa.doc_id = c.doc_a
JOIN sig sb ON sb.doc_id = c.doc_b AND sb.hash_idx = sa.hash_idx
GROUP BY c.doc_a, c.doc_b
HAVING ROUND(AVG(CASE WHEN sa.min_hash = sb.min_hash THEN 1.0 ELSE 0.0 END), 9)
       >= {threshold}
"""


def _bpe_token_stats_sql() -> str:
    from linkgraph.pipeline.textstats import BPE_ISH_PATTERN

    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE array_length(regexp_split_to_array(trim(text), '\\s+')) END
              AS BIGINT) AS n_tokens_ws,
         CAST(array_length(regexp_extract_all(text, '{BPE_ISH_PATTERN}'))
              AS BIGINT) AS n_tokens_bpe,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents
)
SELECT doc_id, n_tokens_ws, n_tokens_bpe,
       ROUND(CASE WHEN n_tokens_bpe > 0
                  THEN CAST(n_chars AS DOUBLE) / n_tokens_bpe
                  ELSE 0.0 END, 9) AS chars_per_token
FROM base
"""


_SIMHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
th AS (SELECT doc_id, {_H32.format(col='tok')} AS h FROM toks WHERE tok <> ''),
pb AS (
  SELECT doc_id, CAST(b AS INTEGER) AS b, SUM(((h >> CAST(b AS INTEGER)) & 1) * 2 - 1) AS s
  FROM th, UNNEST(range(0, 16)) AS t(b)
  GROUP BY doc_id, CAST(b AS INTEGER)
)
SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
FROM pb GROUP BY doc_id
"""

_SIMHASH_PAIRS_SQL = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
th AS (SELECT doc_id, {_H32.format(col='tok')} AS h FROM toks WHERE tok <> ''),
pb AS (
  SELECT doc_id, CAST(b AS INTEGER) AS b,
         SUM(((h >> CAST(b AS INTEGER)) & 1) * 2 - 1) AS s
  FROM th, UNNEST(range(0, 16)) AS t(b)
  GROUP BY doc_id, CAST(b AS INTEGER)
),
sh AS MATERIALIZED (
  SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b)
                          ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
  FROM pb GROUP BY doc_id
),
bands AS MATERIALIZED (
  SELECT doc_id, simhash, band,
         CASE band WHEN 0 THEN (simhash >> 0) & 63
                   WHEN 1 THEN (simhash >> 6) & 31
                   ELSE (simhash >> 11) & 31 END AS key
  FROM sh, UNNEST(range(0, 3)) AS t(band)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS ha, b.simhash AS hb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 2
"""


_NGRAM_JACCARD_SQL = f"""
WITH sh0 AS (
  SELECT * FROM ({_SHINGLES}) WHERE doc_id < 100
),
sh AS (
  -- stop-shingle guard mirror: drop shingles with document frequency
  -- > 95 from index AND sizes (= ngram_jaccard_pairs(max_df=95))
  SELECT sh0.doc_id, sh0.shingle FROM sh0
  JOIN (SELECT shingle, COUNT(*) AS df FROM sh0 GROUP BY shingle) d
    ON sh0.shingle = d.shingle
  WHERE d.df <= 95
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter), 9) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(inter AS DOUBLE) / (sa.n_sh + sb.n_sh - inter) >= 0.5
"""


# Winnowing fingerprints (k=5-token grams, window=4): mirrors
# linkgraph/pipeline/fingerprint.py exactly — same tokenization (trim +
# split on \s+, NO empty-filter: an all-whitespace doc yields [''] with
# len 1 < k on both engines), same h32 gram hash, same full-window rule
# (GREATEST(n_grams - window, 0) keeps pos 0 alone when the doc has
# fewer grams than one window = min over all its hashes).
_DOC_FINGERPRINTS_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
),
grams AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
         array_to_string(toks[CAST(t.i + 1 AS BIGINT):CAST(t.i + 5 AS BIGINT)], ' ') AS gram
  FROM toks, UNNEST(range(0, len(toks) - 5 + 1)) AS t(i)
  WHERE len(toks) >= 5
),
h AS (SELECT doc_id, pos, {_H32.format(col='gram')} AS h FROM grams),
w AS (
  SELECT doc_id, pos,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
  FROM h
)
SELECT DISTINCT doc_id, fp AS fingerprint
FROM w WHERE pos <= GREATEST(n_grams - 4, 0)
"""


_COPY_CANDIDATES_SQL = f"""
WITH fps AS MATERIALIZED (SELECT * FROM ({_DOC_FINGERPRINTS_SQL}) t),
keep AS (SELECT fingerprint FROM fps GROUP BY fingerprint HAVING COUNT(*) <= 64),
kf AS MATERIALIZED (
  SELECT f.doc_id, f.fingerprint FROM fps f JOIN keep USING (fingerprint)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared_fps
FROM kf a JOIN kf b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""


_PACK_SEQUENCES_SQL = """
WITH t AS (
  SELECT doc_id,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE array_length(regexp_split_to_array(trim(text), '\\s+'))
              END AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS cum
  FROM t
)
SELECT doc_id, n_tokens, cum // 512 AS seq_id, cum % 512 AS seq_off FROM c
"""


_URL_CANON_SQL = """
WITH u AS (
  SELECT CASE o_orderkey % 6
    WHEN 0 THEN 'HTTP://Host' || (o_orderkey % 50) || '.Example.COM:80/page/'
                || o_orderkey || '?utm_source=x&id=' || o_orderkey || '#frag'
    WHEN 1 THEN 'https://host' || (o_orderkey % 50) || '.example.com:443/page/'
                || o_orderkey
    WHEN 2 THEN 'http://host' || (o_orderkey % 50) || '.example.com/page/'
                || o_orderkey || '?utm_campaign=c&utm_medium=m'
    WHEN 3 THEN 'https://HOST' || (o_orderkey % 50) || '.example.com:8443/p/'
                || o_orderkey || '?a=1&fbclid=zz&b=2'
    WHEN 4 THEN 'http://host' || (o_orderkey % 50) || '.example.com'
    ELSE 'page ' || o_orderkey || ' has no scheme'
  END AS url
  FROM orders
),
c AS (SELECT url, regexp_replace(url, '#.*$', '') AS no_frag FROM u),
p AS (
  SELECT url,
    lower(regexp_extract(no_frag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
    lower(regexp_extract(no_frag, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)) AS hostport0,
    regexp_replace(no_frag, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*', '') AS rest
  FROM c
),
q AS (
  SELECT url, scheme,
    CASE WHEN scheme = 'http' THEN regexp_replace(hostport0, ':80$', '')
         WHEN scheme = 'https' THEN regexp_replace(hostport0, ':443$', '')
         ELSE hostport0 END AS hostport,
    CASE WHEN regexp_extract(rest, '^([^?]*)', 1) = '' THEN '/'
         ELSE regexp_extract(rest, '^([^?]*)', 1) END AS path,
    regexp_extract(rest, '\\?(.*)$', 1) AS query
  FROM p
),
r AS (
  SELECT url, scheme, hostport, path,
    array_to_string(
      list_filter(string_split(query, '&'),
        x -> x <> '' AND NOT regexp_matches(x,
          '^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)(=.*)?$')),
      '&') AS kept
  FROM q
)
SELECT url,
  CASE WHEN scheme <> ''
       THEN scheme || '://' || hostport || path
            || CASE WHEN kept <> '' THEN '?' || kept ELSE '' END
       ELSE url END AS canonical,
  CASE WHEN scheme <> '' THEN regexp_replace(hostport, ':[0-9]+$', '')
       ELSE '' END AS host,
  scheme <> '' AS is_valid
FROM r
"""


_GROUP_CAPPED_SQL = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT ASC,
                    doc_id ASC
         ) AS rk
  FROM documents
) t WHERE rk <= 60
"""


def _occ(needle: str) -> str:
    target = f" {needle} "
    return (
        f"CAST((length(' ' || text || ' ') - "
        f"length(replace(' ' || text || ' ', '{target}', ''))) / {len(target)} AS BIGINT)"
    )


# Top-5 TF-IDF terms per doc — mirrors pipeline/textstats.tfidf_topk:
# whitespace tokenization, smooth idf ln((1+n)/(1+df))+1 from int64
# (n, df), ROUND(9) BEFORE the rank window, term tiebreak. ROW_NUMBER
# is BIGINT in DuckDB and cast to long on the Spark side.
_TFIDF_TOPK_SQL = r"""
WITH tok AS (
  SELECT doc_id, t.term
  FROM documents, UNNEST(string_split_regex(trim(text), '\s+')) AS t(term)
  WHERE t.term <> ''
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         ROUND(tf.tf * (LN((1.0 + n.n) / (1.0 + dfq.df)) + 1.0), 9) AS tfidf
  FROM tf JOIN dfq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, rank, tfidf FROM (
  SELECT doc_id, term, tf, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term)
           AS rank
  FROM scored
) WHERE rank <= 5
"""


# Top-100 vocabulary — mirrors pipeline/textstats.vocab_stats: same
# whitespace tokenization, (cf DESC, term) order, all counts cast to
# BIGINT for the dtype-strict compare (DuckDB SUM -> HUGEINT).
_VOCAB_STATS_SQL = r"""
WITH tok AS (
  SELECT doc_id, t.term
  FROM documents, UNNEST(string_split_regex(trim(text), '\s+')) AS t(term)
  WHERE t.term <> ''
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
v AS (
  SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS cf
  FROM tf GROUP BY term
)
SELECT term, df, cf, rank FROM (
  SELECT term, df, cf,
         ROW_NUMBER() OVER (ORDER BY cf DESC, term) AS rank
  FROM v
) WHERE rank <= 100
"""

# Unigram-LM surprisal — mirrors pipeline/textstats.unigram_logprob:
# bits(t) = (LN(T)-LN(cf))/LN(2) quantized once per term to int64
# micro-bits (ROUND half-up, positive domain), doc totals as exact
# integer SUMs, mean = one fixed-order double division. LN(T) takes a
# DOUBLE-cast argument to match Spark's log(lit(float(T))).
_UNIGRAM_LOGPROB_SQL = r"""
WITH tok AS (
  SELECT doc_id, t.term
  FROM documents, UNNEST(string_split_regex(trim(text), '\s+')) AS t(term)
  WHERE t.term <> ''
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
v AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY term),
tot AS (SELECT CAST(SUM(cf) AS BIGINT) AS t FROM v),
b AS (
  SELECT term,
         CAST(ROUND((LN(CAST(tot.t AS DOUBLE)) - LN(cf)) / LN(2.0)
                    * 1000000.0, 0) AS BIGINT) AS bits_e6
  FROM v CROSS JOIN tot
),
agg AS (
  SELECT tf.doc_id,
         CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
         CAST(SUM(tf.tf * b.bits_e6) AS BIGINT) AS total_bits_e6
  FROM tf JOIN b USING (term)
  GROUP BY tf.doc_id
)
SELECT doc_id, n_tokens, total_bits_e6,
       total_bits_e6 / (1000000.0 * n_tokens) AS mean_bits
FROM agg
"""


def _funnel_sql(steps: list[str]) -> str:
    """Funnel oracle — the same first-touch join chain: step k's
    completion = MIN(us) of step-k events strictly after the step-k-1
    completion, over the same thinned log."""
    sql = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_type
  FROM events WHERE event_id % 7 = 0
),
s1 AS (
  SELECT user_id, MIN(us) AS t FROM ev
  WHERE event_type = '{0}' GROUP BY user_id
)""".format(steps[0])
    for k, step in enumerate(steps[1:], start=2):
        sql += f""",
s{k} AS (
  SELECT e.user_id, MIN(e.us) AS t
  FROM ev e JOIN s{k - 1} p ON e.user_id = p.user_id AND e.us > p.t
  WHERE e.event_type = '{step}' GROUP BY e.user_id
)"""
    selects = [
        f"SELECT CAST({k} AS BIGINT) AS step, '{step}' AS event_type,"
        f" (SELECT CAST(COUNT(*) AS BIGINT) FROM s{k}) AS users"
        for k, step in enumerate(steps, start=1)
    ]
    return sql + "\n" + "\nUNION ALL\n".join(selects)


_RETENTION_SQL = """
WITH act AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS period
  FROM events WHERE event_id % 7 = 0
),
first AS (SELECT user_id, MIN(period) AS cohort FROM act GROUP BY user_id)
SELECT CAST(f.cohort AS BIGINT) AS cohort,
       CAST(a.period - f.cohort AS BIGINT) AS "offset",
       CAST(COUNT(*) AS BIGINT) AS users
FROM act a JOIN first f ON a.user_id = f.user_id
GROUP BY 1, 2
"""


def _covisitation_sql(gap_minutes: int = 120, min_count: int = 2) -> str:
    """Co-visitation oracle — same epoch-us gaps-and-islands
    sessionization (LAG + running SUM ordered (us, item)), same
    distinct/self-join/marginal aggregates, same fixed-order
    cnt / (sqrt(ma)·sqrt(mb)) ROUND(9) score."""
    gap_us = gap_minutes * 60 * 1_000_000
    return rf"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS item
  FROM events
),
lagd AS (
  SELECT user_id, item, us,
         CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, item)
                   >= {gap_us} THEN 1 ELSE 0 END AS ns
  FROM ev
),
sess AS (
  SELECT user_id, item,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY us, item
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM lagd
),
items AS (SELECT DISTINCT user_id, session_id, item FROM sess),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS cnt
  FROM items a
  JOIN items b ON a.user_id = b.user_id AND a.session_id = b.session_id
              AND a.item < b.item
  GROUP BY 1, 2
),
marg AS (SELECT item, COUNT(*) AS m FROM items GROUP BY item)
SELECT p.item_a, p.item_b, CAST(p.cnt AS BIGINT) AS cnt,
       ROUND(p.cnt / (SQRT(CAST(ma.m AS DOUBLE)) * SQRT(CAST(mb.m AS DOUBLE))), 9)
         AS score
FROM pairs p
JOIN marg ma ON p.item_a = ma.item
JOIN marg mb ON p.item_b = mb.item
WHERE p.cnt >= {min_count}
"""


_RESOLVE_REDIRECTS_SQL = """
WITH RECURSIVE keys AS (SELECT DISTINCT o_orderkey AS i FROM orders),
r AS (
  SELECT i AS src,
         CASE WHEN i % 16 = 7 THEN i + 8
              WHEN i % 16 = 15 THEN i - 8
              ELSE i - 1 END AS dst
  FROM keys WHERE (i % 16) % 8 <> 0
),
walk AS (
  SELECT src AS origin, dst AS cur, CAST(1 AS BIGINT) AS d FROM r
  UNION ALL
  SELECT w.origin, r.dst, w.d + 1
  FROM walk w JOIN r ON w.cur = r.src
  WHERE w.d < 40
),
term AS (
  SELECT origin, cur, d FROM walk
  WHERE cur NOT IN (SELECT src FROM r)
)
SELECT r.src,
       t.cur AS target,
       t.d AS chain_len,
       t.origin IS NULL AS is_cycle
FROM r LEFT JOIN term t ON r.src = t.origin
"""


def _dedup_normalized_sql() -> str:
    """Normalized-dedup oracle — the SAME NORM_* patterns imported
    from pipeline/dedup (no drift), applied in the same order
    (lower -> digits -> punct -> whitespace -> trim), over the same
    messy-variant union; DuckDB regexp_replace needs the 'g' flag
    (Spark replaces all matches by default)."""
    from linkgraph.pipeline.dedup import NORM_DIGITS, NORM_PUNCT, NORM_WS

    return rf"""
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, '  ' || upper(text) || ' !! ' AS text
  FROM documents WHERE doc_id % 10 = 0
),
norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(regexp_replace(
             lower(text), '{NORM_DIGITS}', '0', 'g'),
             '{NORM_PUNCT}', '', 'g'),
             '{NORM_WS}', ' ', 'g')) AS n
  FROM d
)
SELECT md5(n) AS norm_hash,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS keep_id
FROM norm GROUP BY md5(n)
"""


# Full inverted index — mirrors pipeline/retrieval.inverted_index:
# same whitespace tokenization, postings serialized "doc:tf ..." in
# doc_id order (Spark array_sort on (doc_id, tf) structs == ORDER BY
# doc_id: doc_id is unique per term).
_INVERTED_INDEX_SQL = r"""
WITH tok AS (
  SELECT doc_id, t.term
  FROM documents, UNNEST(string_split_regex(trim(text), '\s+')) AS t(term)
  WHERE t.term <> ''
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS cf,
       string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
                  ' ' ORDER BY doc_id) AS postings
FROM tf GROUP BY term
"""


def _bm25_sql(query: str, k: int, k1: float = 1.2, b: float = 0.75) -> str:
    """BM25 oracle — mirrors pipeline/retrieval.bm25_topk term for
    term: same Lucene idf, same fixed-order weight expression, same
    int64 micro-unit quantization (ROUND half-away-from-zero on the
    positive domain both engines), integer rank keys."""
    terms = ", ".join(f"'{t}'" for t in query.strip().split())
    return rf"""
WITH tok AS (
  SELECT doc_id, t.term
  FROM documents, UNNEST(string_split_regex(trim(text), '\s+')) AS t(term)
  WHERE t.term <> ''
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM dl
),
qtf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM tok WHERE term IN ({terms}) GROUP BY doc_id, term
),
dfq AS (SELECT term, COUNT(*) AS df FROM qtf GROUP BY term),
wtd AS (
  SELECT q.doc_id,
         CAST(ROUND(
           (LN(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
            * ((q.tf * {k1 + 1.0!r}) /
               (q.tf + {k1!r} * ({1.0 - b!r} + ({b!r} * d.dl) / s.avgdl))))
           * 1000000.0, 0) AS BIGINT) AS w_e6
  FROM qtf q JOIN dfq f USING (term) JOIN dl d USING (doc_id)
  CROSS JOIN stats s
),
tot AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS matched,
         CAST(SUM(w_e6) AS BIGINT) AS total_e6
  FROM wtd GROUP BY doc_id
)
SELECT doc_id, matched, total_e6 / 1000000.0 AS score, rank FROM (
  SELECT doc_id, matched, total_e6,
         ROW_NUMBER() OVER (ORDER BY total_e6 DESC, doc_id) AS rank
  FROM tot
) WHERE rank <= {k}
"""


def _pmi_topk_sql(window: int = 2, min_count: int = 5, k: int = 100) -> str:
    """PMI oracle — same window pair generation (1-based positions,
    distance 1..window, least/greatest canonical, identical-token
    pairs kept), same slot marginals, and the same fixed-order
    ln4 + lnN + lnC - ln sa - ln sb sum, ROUND(9) before ranking."""
    return rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
),
pos AS (
  SELECT doc_id, i.i AS pos, t[i.i] AS term
  FROM toks, UNNEST(generate_series(1, len(t))) AS i(i)
  WHERE t[i.i] <> ''
),
pr AS (
  SELECT LEAST(x.term, y.term) AS a, GREATEST(x.term, y.term) AS b
  FROM pos x JOIN pos y
    ON x.doc_id = y.doc_id AND y.pos > x.pos AND y.pos <= x.pos + {window}
),
c AS (SELECT a, b, COUNT(*) AS c FROM pr GROUP BY a, b),
n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM c),
slots AS (
  SELECT t, CAST(SUM(c) AS BIGINT) AS s FROM (
    SELECT a AS t, c FROM c UNION ALL SELECT b AS t, c FROM c
  ) GROUP BY t
),
scored AS (
  SELECT c.a, c.b, CAST(c.c AS BIGINT) AS pair_count,
         ROUND(LN(4.0) + LN(CAST(n.n AS DOUBLE)) + LN(CAST(c.c AS DOUBLE))
               - LN(CAST(sa.s AS DOUBLE)) - LN(CAST(sb.s AS DOUBLE)), 9)
           AS pmi
  FROM c
  JOIN slots sa ON c.a = sa.t
  JOIN slots sb ON c.b = sb.t
  CROSS JOIN n
  WHERE c.c >= {min_count}
)
SELECT a, b, pair_count, pmi, rank FROM (
  SELECT a, b, pair_count, pmi,
         ROW_NUMBER() OVER (ORDER BY pmi DESC, a, b) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def _token_stats_sql() -> str:
    from linkgraph.pipeline.textstats import PUNCT, STOPWORDS

    sw = " + ".join(_occ(s) for s in STOPWORDS)
    punct_class = "[" + PUNCT + "]"
    return f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE array_length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '{punct_class}', '', 'g')) AS punct_cnt,
         {sw} AS stopword_cnt
  FROM documents
)
SELECT doc_id, n_tokens, n_chars,
       ROUND(CASE WHEN n_tokens > 0
                  THEN CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens
                  ELSE 0.0 END, 9) AS avg_token_len,
       punct_cnt, stopword_cnt,
       ROUND(
         0.5 * LEAST(CASE WHEN n_tokens > 0
                          THEN CAST(stopword_cnt AS DOUBLE) / n_tokens
                          ELSE 0.0 END * 5, 1.0)
         + 0.3 * (CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 1.0 ELSE 0.0 END)
         + 0.2 * (CASE WHEN n_chars > 0 AND CAST(punct_cnt AS DOUBLE) / n_chars < 0.1
                       THEN 1.0 ELSE 0.0 END), 9) AS quality_score
FROM base
"""


def _lang_id_sql() -> str:
    from linkgraph.pipeline.textstats import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    score_cols = ",\n         ".join(
        f"{' + '.join(_occ(m) for m in LANG_MARKERS[lang])} AS s_{lang}"
        for lang in langs
    )
    greatest = "GREATEST(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    case = " ".join(
        f"WHEN s_{lang} = {greatest} THEN '{lang}'" for lang in langs
    )
    return f"""
WITH scores AS (
  SELECT doc_id,
         {score_cols}
  FROM documents
)
SELECT doc_id, CASE {case} END AS pred_lang FROM scores
"""


def _gopher_quality_sql(
    min_words: int = 50,
    max_words: int = 100_000,
    min_mwl: float = 3.0,
    max_mwl: float = 10.0,
    max_dup: float = 0.90,
    max_top_bigram: float = 0.20,
    max_symbol: float = 0.10,
) -> str:
    """Mirrors pipeline/textstats.gopher_quality: per-doc word stats
    as pure expressions, the top-bigram mode via an unnest +
    group-by (the lateral twin of the kernel's explode + two hash
    aggs), and the keep flag evaluated on the ROUNDED metrics."""
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         regexp_split_to_array(trim(text), '\\s+') AS w,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE array_length(regexp_split_to_array(trim(text), '\\s+')) END
              AS BIGINT) AS n_words,
         CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT) AS n_word_chars,
         CAST(length(text) - length(replace(text, '#', ''))
              + (length(text) - length(replace(text, '...', ''))) / 3
              AS BIGINT) AS symbol_cnt
  FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, n_words - 1),
                               i -> w[i] || ' ' || w[i + 1])) AS bigram
  FROM base WHERE n_words >= 2
),
cnt AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram),
top AS (SELECT doc_id, MAX(c * length(bigram)) AS top_chars FROM cnt GROUP BY doc_id),
m AS (
  SELECT b.doc_id, b.n_words,
         ROUND(CASE WHEN b.n_words > 0
                    THEN CAST(b.n_word_chars AS DOUBLE) / b.n_words
                    ELSE 0.0 END, 9) AS mean_word_len,
         ROUND(CASE WHEN b.n_words > 0
                    THEN 1.0 - CAST(array_length(list_distinct(b.w)) AS DOUBLE) / b.n_words
                    ELSE 0.0 END, 9) AS dup_word_frac,
         ROUND(COALESCE(CAST(t.top_chars AS DOUBLE) / b.n_chars, 0.0), 9)
           AS top_bigram_char_frac,
         ROUND(CASE WHEN b.n_words > 0
                    THEN CAST(b.symbol_cnt AS DOUBLE) / b.n_words
                    ELSE 0.0 END, 9) AS symbol_word_ratio
  FROM base b LEFT JOIN top t USING (doc_id)
)
SELECT *,
       (n_words >= {min_words} AND n_words <= {max_words}
        AND mean_word_len >= {min_mwl} AND mean_word_len <= {max_mwl}
        AND dup_word_frac <= {max_dup}
        AND top_bigram_char_frac <= {max_top_bigram}
        AND symbol_word_ratio <= {max_symbol}) AS keep
FROM m
"""


def _c4_quality_sql(min_words: int = 5, min_sentences: int = 3) -> str:
    """Mirrors pipeline/textstats.c4_quality over the same messy-
    suffix union (doc_id % 6 classes); the javascript pattern is
    imported from the kernel module so the two cannot drift. Pure
    integer/boolean logic — no floats, no rounding."""
    from linkgraph.pipeline.textstats import C4_JS_PATTERN

    return f"""
WITH d AS (
  SELECT doc_id,
         text || CASE doc_id % 6
           WHEN 0 THEN '. More text here. And a third sentence.'
           WHEN 1 THEN '. Lorem ipsum dolor sit amet. Three sentences here.'
           WHEN 2 THEN '. Brace {{ ahead. Three sentences total.'
           WHEN 3 THEN '. Enable javascript to continue. Third sentence.'
           WHEN 4 THEN ''
           ELSE '?' END AS text
  FROM documents
),
sig AS (
  SELECT doc_id,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE array_length(regexp_split_to_array(trim(text), '\\s+')) END
              AS BIGINT) AS n_words,
         CAST(length(text) - length(translate(text, '.!?', '')) AS BIGINT)
           AS n_sentences,
         right(rtrim(text), 1) IN ('.', '!', '?', '"') AS ends_terminal,
         contains(lower(text), 'lorem ipsum') AS has_lorem,
         contains(text, '{{') AS has_brace,
         regexp_matches(lower(text), '{C4_JS_PATTERN}') AS has_javascript
  FROM d
)
SELECT *,
       (ends_terminal AND n_words >= {min_words}
        AND n_sentences >= {min_sentences}
        AND NOT has_lorem AND NOT has_brace AND NOT has_javascript) AS keep
FROM sig
"""


def _chunk_documents_sql(window: int = 32, overlap: int = 8) -> str:
    """Mirrors pipeline/chunking.chunk_documents: same token split,
    same exact-integer chunk count, same 1-based window slicing via a
    lateral generate_series."""
    stride = window - overlap
    return f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE array_length(regexp_split_to_array(trim(text), '\\s+')) END
              AS BIGINT) AS n
  FROM documents
),
c AS (
  SELECT doc_id, w, n,
         CASE WHEN n <= 0 THEN 0 WHEN n <= {window} THEN 1
              ELSE (n - {window} + {stride - 1}) // {stride} + 1 END AS n_chunks
  FROM t
),
x AS (
  SELECT doc_id, w, n, unnest(generate_series(0, n_chunks - 1)) AS k
  FROM c WHERE n_chunks > 0
)
SELECT doc_id,
       CAST(k AS BIGINT) AS chunk_id,
       CAST(k * {stride} AS BIGINT) AS start_token,
       CAST(least({window}, n - k * {stride}) AS BIGINT) AS n_tokens,
       array_to_string(w[k * {stride} + 1 : k * {stride} + {window}], ' ')
         AS chunk_text
FROM x
"""


def _cms_top_words_sql(depth: int = 4, width: int = 16, seed: int = 7) -> str:
    """Mirrors pipeline/sketches.count_min_sketch + cms_estimate: the
    same seeded md5-prefix bucket hash, the same depth-row min."""
    return f"""
WITH toks AS MATERIALIZED (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents WHERE length(trim(text)) > 0
),
cnts AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS true_cnt FROM toks GROUP BY term),
grid AS MATERIALIZED (
  SELECT d, ('0x' || substr(md5({seed} || ':' || d || ':' || term), 1, 8))::BIGINT
           % {width} AS bucket,
         COUNT(*) AS cnt
  FROM toks CROSS JOIN range({depth}) t(d)
  GROUP BY 1, 2
),
probe AS (
  SELECT c.term, c.true_cnt, d,
         ('0x' || substr(md5({seed} || ':' || d || ':' || c.term), 1, 8))::BIGINT
           % {width} AS bucket
  FROM cnts c CROSS JOIN range({depth}) t(d)
)
SELECT p.term, p.true_cnt,
       CAST(MIN(COALESCE(g.cnt, 0)) AS BIGINT) AS cms_est
FROM probe p LEFT JOIN grid g ON p.d = g.d AND p.bucket = g.bucket
GROUP BY p.term, p.true_cnt
"""


def _hll_trigrams_sql(b: int = 8, seed: int = 7) -> str:
    """Mirrors pipeline/sketches.hll_distinct over word trigrams: the
    same 60-bit md5 prefix, exact bit split, bin()-length rho, scaled
    integer Z, and the SAME fixed-order float estimate expression
    (alpha computed by the identical Python expression)."""
    m = 1 << b
    S = 60 - b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = (f"CAST({alpha!r} AS DOUBLE) * {m} * {m} * "
           f"{float(1 << S)!r} / z_scaled")
    return f"""
WITH t AS (
  SELECT regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
  WHERE length(trim(text)) > 0
),
tri AS MATERIALIZED (
  SELECT w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS term
  FROM t, unnest(generate_series(1, len(w) - 2)) s(i)
  WHERE len(w) >= 3
),
hashed AS (
  SELECT ('0x' || substr(md5({seed} || ':' || term), 1, 15))::BIGINT AS h
  FROM tri
),
rho AS (
  SELECT h & {m - 1} AS bucket,
         CASE WHEN (h >> {b}) > 0
              THEN {S} - (length(bin(h >> {b})) - 1)
              ELSE {S + 1} END AS rho
  FROM hashed
),
got AS (SELECT bucket, MAX(rho) AS reg FROM rho GROUP BY bucket),
regs AS (
  SELECT gs.bucket, COALESCE(got.reg, 0) AS reg
  FROM range({m}) gs(bucket) LEFT JOIN got ON got.bucket = gs.bucket
),
agg AS (
  SELECT CAST({m} AS BIGINT) AS m,
         CAST(SUM(CAST({1 << S} AS BIGINT) >> CAST(reg AS INT)) AS BIGINT)
           AS z_scaled,
         CAST(SUM(CASE WHEN reg = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS zero_buckets
  FROM regs
)
SELECT m, z_scaled, zero_buckets,
       ROUND(CASE WHEN ({raw}) <= {2.5 * m!r} AND zero_buckets > 0
                  THEN {float(m)!r} * ln({float(m)!r} / zero_buckets)
                  ELSE ({raw}) END, 9) AS estimate
FROM agg
"""


# Trending-stream oracle: Spark's tumbling F.window is epoch-aligned,
# so window_start_us = (epoch_us // day_us) * day_us — exact integer
# division; rank-at-read mirrored with the same (cnt DESC, item) order.
_TRENDING_SQL = """
WITH ev AS (
  SELECT epoch_us(ts) AS us,
         CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS item
  FROM events
),
c AS (
  SELECT (us // 86400000000) * 86400000000 AS window_start_us, item,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ev GROUP BY 1, 2
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY window_start_us ORDER BY cnt DESC, item
  ) AS rnk FROM c
)
SELECT window_start_us, item, cnt, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 5
"""


def _embedding_covariance_sql(dim: int = 64, quant: int = 1_000_000) -> str:
    """Mirrors pipeline/embedpca.embedding_covariance: same float→
    double element cast, same floor(v·quant) int64 quantization
    (rounding-mode-free), same upper-triangle pair sums."""
    return f"""
WITH e AS MATERIALIZED (
  SELECT vec_id, g.i - 1 AS d,
         CAST(floor(CAST(embedding[g.i] AS DOUBLE) * {quant}) AS BIGINT) AS q
  FROM embeddings, generate_series(1, {dim}) g(i)
)
SELECT CAST(a.d AS BIGINT) AS d1, CAST(b.d AS BIGINT) AS d2,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(a.q) AS BIGINT) AS s1,
       CAST(SUM(b.q) AS BIGINT) AS s2,
       CAST(SUM(a.q * b.q) AS BIGINT) AS s12
FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.d <= b.d
GROUP BY 1, 2
"""


def _bloom_probe_sql(m_bits: int = 2048, k: int = 3, seed: int = 7) -> str:
    """Mirrors pipeline/bloom.py: same seeded md5-prefix positions,
    same 32-bit-word BIT_OR build, same min-over-k AND probe."""
    return f"""
WITH members AS MATERIALIZED (
  SELECT md5(text) AS v FROM documents WHERE doc_id < 400
),
pos AS (
  SELECT ('0x' || substr(md5('{seed}:' || j || ':' || v), 1, 8))::BIGINT
           % {m_bits} AS p
  FROM members CROSS JOIN range({k}) t(j)
),
bloom AS MATERIALIZED (
  SELECT p // 32 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS bits
  FROM pos GROUP BY 1
),
probes AS (
  SELECT DISTINCT v FROM (
    SELECT md5(text) AS v FROM documents
    UNION ALL
    SELECT 'absent' || i AS v FROM range(100) r(i)
  )
),
pp AS (
  SELECT v, ('0x' || substr(md5('{seed}:' || j || ':' || v), 1, 8))::BIGINT
              % {m_bits} AS p
  FROM probes CROSS JOIN range({k}) t(j)
),
hits AS (
  SELECT pp.v,
         ((COALESCE(b.bits, 0) >> CAST(pp.p % 32 AS INT)) & 1) AS hit
  FROM pp LEFT JOIN bloom b ON pp.p // 32 = b.word
)
SELECT v AS value, MIN(hit) = 1 AS maybe_member FROM hits GROUP BY v
"""


def _session_paths_sql(gap_minutes: int = 360, max_len: int = 5, k: int = 50) -> str:
    """Mirrors pipeline/funnel.session_paths: same gaps-and-islands
    sessionization (epoch-us, (us, event_id) order), same truncated
    '>'-joined path, same (count DESC, path) rank."""
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events
),
tagged AS (
  SELECT *, CASE WHEN us - LAG(us) OVER w >= {gap_us} OR
                      LAG(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
sess AS (
  SELECT user_id, us, event_id, event_type,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM tagged
),
paths AS (
  SELECT array_to_string(
           (list(event_type ORDER BY us, event_id))[1:{max_len}], '>') AS path
  FROM sess GROUP BY user_id, session_id
),
c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions FROM paths GROUP BY path),
r AS (
  SELECT path, n_sessions,
         ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path) AS rank
  FROM c
)
SELECT path, n_sessions, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= {k}
"""


_EVENT_TRANSITIONS_SQL = """
WITH pairs AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS to_type
  FROM events
),
c AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM pairs WHERE to_type IS NOT NULL
  GROUP BY 1, 2
),
m AS (SELECT from_type, SUM(cnt) AS total FROM c GROUP BY 1)
SELECT c.from_type, c.to_type, c.cnt,
       CAST(CAST(c.cnt AS DOUBLE) / CAST(m.total AS DOUBLE) AS DOUBLE) AS prob
FROM c JOIN m ON c.from_type = m.from_type
"""


def _zorder_orders_sql(bits: int = 16) -> str:
    """Mirrors pipeline/layout.zorder_expr for (o_custkey, o_orderkey)
    — the same loop-generated sum of shifted bits, so the two cannot
    drift structurally."""
    cols = ["o_custkey", "o_orderkey"]
    n = len(cols)
    terms = []
    for c_idx, c in enumerate(cols):
        for i in range(bits):
            terms.append(
                f"(((CAST({c} AS BIGINT) >> {i}) & CAST(1 AS BIGINT)) << {i * n + c_idx})"
            )
    expr = " + ".join(terms)
    return f"""
SELECT o_orderkey, o_custkey, {expr} AS zkey FROM orders
"""


def _repetition_signals_sql(ns: tuple[int, ...] = (2, 3, 4, 5)) -> str:
    """Mirrors pipeline/textstats.repetition_signals per n: same gram
    slicing, same dup-gram interval union via the cummax window."""
    parts = []
    body = """
WITH base AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE array_length(regexp_split_to_array(trim(text), '\\s+')) END
              AS BIGINT) AS n_words
  FROM documents
)"""
    for n in ns:
        body += f""",
g{n} AS MATERIALIZED (
  SELECT doc_id, n_words, i,
         array_to_string(w[i + 1 : i + {n}], ' ') AS g
  FROM (
    SELECT doc_id, n_words, w,
           unnest(generate_series(0, CAST(n_words - {n} AS INT))) AS i
    FROM base WHERE n_words >= {n}
  )
),
c{n} AS MATERIALIZED (
  SELECT doc_id, g, COUNT(*) AS c FROM g{n} GROUP BY 1, 2
),
t{n} AS (SELECT doc_id, MAX(c) AS top_c FROM c{n} GROUP BY 1),
d{n} AS (
  SELECT g.doc_id, g.n_words, g.i
  FROM g{n} g JOIN c{n} c ON g.doc_id = c.doc_id AND g.g = c.g
  WHERE c.c >= 2
),
cov{n} AS (
  SELECT doc_id, SUM(add) AS cov FROM (
    SELECT doc_id,
           CASE WHEN prev_end IS NULL THEN {n}
                ELSE GREATEST(LEAST(i + {n} - prev_end, {n}), 0) END AS add
    FROM (
      SELECT doc_id, i,
             MAX(i + {n}) OVER (
               PARTITION BY doc_id ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS prev_end
      FROM d{n}
    )
  ) GROUP BY doc_id
)"""
        parts.append(f"""
SELECT b.doc_id, CAST({n} AS BIGINT) AS n,
       ROUND(CASE WHEN b.n_words >= {n}
             THEN CAST(COALESCE(t{n}.top_c, 0) * {n} AS DOUBLE) / b.n_words
             ELSE 0.0 END, 9) AS top_ngram_frac,
       ROUND(CASE WHEN b.n_words >= {n}
             THEN CAST(COALESCE(cov{n}.cov, 0) AS DOUBLE) / b.n_words
             ELSE 0.0 END, 9) AS dup_ngram_frac
FROM base b
LEFT JOIN t{n} ON b.doc_id = t{n}.doc_id
LEFT JOIN cov{n} ON b.doc_id = cov{n}.doc_id""")
    return body + "\nUNION ALL\n".join(parts)


def _bpe_merges_sql(n_merges: int = 6) -> str:
    """Unrolled BPE rounds mirroring pipeline/bpe.py: same
    double-separator encoding, same pair counting, same
    (cnt DESC, a, b) argmax, same left-to-right replace() merge
    (verified identical greedy semantics on the overlap case)."""
    sql = """
WITH w0 AS MATERIALIZED (
  SELECT '~' || rtrim(regexp_replace(word, '(.)', '\\1~~', 'g'), '~') || '~' AS ws,
         CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
        FROM documents WHERE length(trim(text)) > 0)
  GROUP BY 1
)"""
    for r in range(1, n_merges + 1):
        sql += f""",
e{r} AS (
  SELECT s, freq, unnest(generate_series(1, len(s) - 1)) AS i
  FROM (SELECT regexp_split_to_array(trim(ws, '~'), '~~') AS s, freq
        FROM w{r - 1} WHERE len(regexp_split_to_array(trim(ws, '~'), '~~')) >= 2)
),
p{r} AS (SELECT s[i] AS a, s[i + 1] AS b, SUM(freq) AS cnt FROM e{r} GROUP BY 1, 2),
m{r} AS MATERIALIZED (
  SELECT a, b, CAST(cnt AS BIGINT) AS cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1
),
w{r} AS MATERIALIZED (
  SELECT replace(ws,
                 '~' || (SELECT a FROM m{r}) || '~~' || (SELECT b FROM m{r}) || '~',
                 '~' || (SELECT a FROM m{r}) || (SELECT b FROM m{r}) || '~') AS ws,
         freq
  FROM w{r - 1}
)"""
    parts = [
        f"SELECT CAST({r} AS BIGINT) AS step, a AS left, b AS right, cnt AS pair_count FROM m{r}"
        for r in range(1, n_merges + 1)
    ]
    return sql + "\n" + "\nUNION ALL\n".join(parts)


def _bpe_token_counts_sql(n_merges: int = 6) -> str:
    """Re-learns the first n merges (the _bpe_merges_sql chain, with
    the word carried through rounds) and applies them: per-word
    subtoken counts from the final symbol strings, summed per doc."""
    sql = """
WITH dw AS MATERIALIZED (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
  FROM documents WHERE length(trim(text)) > 0
),
w0 AS MATERIALIZED (
  SELECT word,
         '~' || rtrim(regexp_replace(word, '(.)', '\\1~~', 'g'), '~') || '~' AS ws,
         CAST(COUNT(*) AS BIGINT) AS freq
  FROM dw GROUP BY 1
)"""
    for r in range(1, n_merges + 1):
        sql += f""",
e{r} AS (
  SELECT s, freq, unnest(generate_series(1, len(s) - 1)) AS i
  FROM (SELECT regexp_split_to_array(trim(ws, '~'), '~~') AS s, freq
        FROM w{r - 1} WHERE len(regexp_split_to_array(trim(ws, '~'), '~~')) >= 2)
),
p{r} AS (SELECT s[i] AS a, s[i + 1] AS b, SUM(freq) AS cnt FROM e{r} GROUP BY 1, 2),
m{r} AS MATERIALIZED (
  SELECT a, b FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1
),
w{r} AS MATERIALIZED (
  SELECT word,
         replace(ws,
                 '~' || (SELECT a FROM m{r}) || '~~' || (SELECT b FROM m{r}) || '~',
                 '~' || (SELECT a FROM m{r}) || (SELECT b FROM m{r}) || '~') AS ws,
         freq
  FROM w{r - 1}
)"""
    sql += f""",
sym AS MATERIALIZED (
  SELECT word,
         CAST(len(regexp_split_to_array(trim(ws, '~'), '~~')) AS BIGINT) AS n_sub
  FROM w{n_merges}
)
SELECT dw.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(sym.n_sub) AS BIGINT) AS n_tokens
FROM dw JOIN sym ON dw.word = sym.word
GROUP BY dw.doc_id
"""
    return sql


_ENRICHED_EVENTS_SQL = """
SELECT c.c_nationkey AS nation, e.event_type,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM events e JOIN customer c ON e.user_id % 1500 + 1 = c.c_custkey
GROUP BY 1, 2
"""


def _hll_by_lang_sql(b: int = 8, seed: int = 7) -> str:
    """Mirrors pipeline/sketches.hll_distinct_by over per-lang word
    trigrams: same hash/bit split/rho, per-group register fold with
    empty buckets folded arithmetically, same fixed-order estimate."""
    m = 1 << b
    S = 60 - b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = (f"CAST({alpha!r} AS DOUBLE) * {m} * {m} * "
           f"{float(1 << S)!r} / z_scaled")
    return f"""
WITH t AS (
  SELECT lang, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
  WHERE length(trim(text)) > 0
),
tri AS MATERIALIZED (
  SELECT lang, w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS term
  FROM t, unnest(generate_series(1, len(w) - 2)) s(i)
  WHERE len(w) >= 3
),
hashed AS (
  SELECT lang, ('0x' || substr(md5({seed} || ':' || term), 1, 15))::BIGINT AS h
  FROM tri
),
rho AS (
  SELECT lang, h & {m - 1} AS bucket,
         CASE WHEN (h >> {b}) > 0
              THEN {S} - (length(bin(h >> {b})) - 1)
              ELSE {S + 1} END AS rho
  FROM hashed
),
got AS (SELECT lang, bucket, MAX(rho) AS reg FROM rho GROUP BY 1, 2),
agg AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS occupied,
         CAST(SUM(CAST({1 << S} AS BIGINT) >> CAST(reg AS INT)) AS BIGINT)
           AS z_occ
  FROM got GROUP BY lang
),
fin AS (
  SELECT lang, CAST({m} AS BIGINT) AS m,
         CAST(z_occ + ({m} - occupied) * CAST({1 << S} AS BIGINT) AS BIGINT)
           AS z_scaled,
         CAST({m} - occupied AS BIGINT) AS zero_buckets
  FROM agg
)
SELECT lang, m, z_scaled, zero_buckets,
       ROUND(CASE WHEN ({raw}) <= {2.5 * m!r} AND zero_buckets > 0
                  THEN {float(m)!r} * ln({float(m)!r} / zero_buckets)
                  ELSE ({raw}) END, 9) AS estimate
FROM fin
"""


def _mask_tokens_sql(rate: float = 0.15, seed: int = 7) -> str:
    """Mirrors pipeline/masking.mask_tokens — DuckDB's lambda index
    is 1-based where Spark's is 0-based, so the hash key uses i-1."""
    thr = int(rate * (1 << 32))
    h = (f"('0x' || substr(md5('{seed}:' || CAST(doc_id AS VARCHAR) || ':' ||"
         f" CAST(i - 1 AS VARCHAR)), 1, 8))::BIGINT")
    return f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS w
  FROM documents
)
SELECT doc_id,
       COALESCE(array_to_string(list_transform(w, (t, i) ->
         CASE WHEN {h} < {thr} THEN '[MASK]' ELSE t END), ' '), '')
         AS masked_text,
       -- DuckDB array_to_string([]) is NULL where Spark's is ''
       COALESCE(array_to_string(list_filter(list_transform(w, (t, i) ->
         CASE WHEN {h} < {thr}
              THEN CAST(i - 1 AS VARCHAR) || ':' || t END),
         x -> x IS NOT NULL), ' '), '') AS labels,
       CAST(len(w) AS BIGINT) AS n_tokens,
       CAST(len(list_filter(list_transform(w, (t, i) -> {h} < {thr}),
                            x -> x)) AS BIGINT) AS n_masked
FROM base
"""


def _skipgram_pairs_sql(window: int = 2, min_count: int = 2) -> str:
    """Mirrors pipeline/masking.skipgram_pairs (DuckDB 1-based lambda
    index ↦ Spark's 0-based handled by symmetric offsets)."""
    return f"""
WITH base AS (
  SELECT regexp_split_to_array(trim(text), '\\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
pos AS (
  SELECT w, unnest(generate_series(1, len(w))) AS i FROM base
),
pairs AS (
  SELECT w[i] AS center, w[j] AS context
  FROM pos, unnest(generate_series(GREATEST(i - {window}, 1),
                                   LEAST(i + {window}, len(w)))) t(j)
  WHERE j <> i
)
SELECT center, context, CAST(COUNT(*) AS BIGINT) AS cnt
FROM pairs GROUP BY 1, 2
HAVING COUNT(*) >= {min_count}
"""


_ANN_TOPK_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
q AS (SELECT vec_id AS query_id, vec AS qvec FROM e WHERE vec_id < 10),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(q.qvec, e.vec), 9) AS sim
  FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
),
r AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rnk
  FROM s
)
SELECT query_id, neighbor_id, sim, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 5
"""


def _decontaminate_sql(n: int = 8, bench_mod: int = 25) -> str:
    """Mirrors pipeline/decontam.decontaminate over the driver's
    every-`bench_mod`-th-doc benchmark: DISTINCT word n-grams per doc
    (1-based inclusive list_slice == Spark's slice(w, i, n)), the
    benchmark gram set distinct-collapsed, per-doc shared-gram counts,
    and a LEFT JOIN so clean docs report 0/false."""
    return f"""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, array_length(w) - {n - 1}),
                               i -> array_to_string(w[i : i + {n - 1}], ' '))) AS ngram
  FROM tok WHERE array_length(w) >= {n}
),
bench AS (SELECT DISTINCT ngram FROM grams WHERE doc_id % {bench_mod} = 0),
hits AS (
  SELECT g.doc_id, COUNT(*) AS n_shared
  FROM grams g JOIN bench USING (ngram)
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared_ngrams,
       COALESCE(h.n_shared, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
"""


def _pii_redact_sql() -> str:
    """Mirrors pipeline/pii.pii_redact over the driver's
    deterministic PII augmentation: the same lookahead-free ASCII
    patterns (imported, zero drift — Java regex == RE2 by the
    repo-wide portability rule), counted and masked in the same
    email → ip → phone sequence via chained CTEs; DuckDB
    regexp_replace needs the explicit 'g' flag to match Spark's
    replace-all semantics."""
    from linkgraph.pipeline.pii import PII_PATTERNS

    sql = """
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text ELSE
           text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
             || CASE WHEN doc_id % 5 = 1
                     THEN ' cc admin' || CAST(doc_id AS VARCHAR) || '@test.org'
                     ELSE '' END
             || ' from ' || CAST(doc_id % 256 AS VARCHAR)
             || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
             || '.' || CAST((doc_id * 13) % 256 AS VARCHAR)
             || '.' || CAST(doc_id % 100 + 1 AS VARCHAR)
             || ' call 555' || sep
             || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || sep
             || lpad(CAST((doc_id * 31) % 10000 AS VARCHAR), 4, '0')
         END AS t
  FROM (SELECT doc_id, text,
               CASE WHEN doc_id % 2 = 0 THEN '-' ELSE '.' END AS sep
        FROM documents)
)"""
    prev = "aug"
    for i, (name, pattern, placeholder) in enumerate(PII_PATTERNS, 1):
        sql += f""",
s{i} AS (
  SELECT doc_id, {"" if i == 1 else f"{', '.join(f'n_{n}s' for n, _, _ in PII_PATTERNS[: i - 1])}, "}
         CAST(len(regexp_extract_all(t, '{pattern}')) AS BIGINT) AS n_{name}s,
         regexp_replace(t, '{pattern}', '{placeholder}', 'g') AS t
  FROM {prev}
)"""
        prev = f"s{i}"
    count_cols = ", ".join(f"n_{name}s" for name, _, _ in PII_PATTERNS)
    total = " + ".join(f"n_{name}s" for name, _, _ in PII_PATTERNS)
    sql += f"""
SELECT doc_id, {count_cols}, ({total}) > 0 AS has_pii, t AS redacted
FROM {prev}
"""
    return sql


def _louvain_level_ctes(lv: str, edges: str, init_state: str, rounds: int) -> str:
    """CTE chain for one parity-scheduled Louvain move phase over the
    weighted symmetric frame `edges` (src, dst, w — self-loop rows
    allowed: their weight counts in k/tot, never as a candidate),
    starting from `init_state` (id, comm). Emits s{lv}_{rounds} as the
    final assignment. Mirrors kernels/louvain._move_phase round-for-
    round: exact integer score M2·kvc − k·(tot − [own]·k), the
    (score DESC, comm ASC) ROW_NUMBER winner, and the strictly-
    better-than-staying gate. All BIGINT — engine-identical."""
    sql = f""",
deg{lv} AS MATERIALIZED (SELECT src AS id, SUM(w) AS k FROM {edges} GROUP BY src),
mm{lv} AS (SELECT SUM(w) AS m2 FROM {edges}),
s_{lv}_0 AS MATERIALIZED (SELECT id, comm FROM {init_state})"""
    for r in range(rounds):
        p, q = f"_{lv}_{r}", f"_{lv}_{r + 1}"
        sql += f""",
tot{q} AS MATERIALIZED (
  SELECT s.comm, SUM(d.k) AS tot FROM s{p} s JOIN deg{lv} d USING (id) GROUP BY s.comm
),
cand{q} AS MATERIALIZED (
  SELECT src, ncomm, MAX(kvc) AS kvc FROM (
    SELECT e.src, s.comm AS ncomm, SUM(e.w) AS kvc
    FROM {edges} e JOIN s{p} s ON e.dst = s.id
    WHERE e.src <> e.dst GROUP BY e.src, s.comm
    UNION ALL
    SELECT id AS src, comm AS ncomm, CAST(0 AS BIGINT) FROM s{p}
  ) GROUP BY src, ncomm
),
sc{q} AS MATERIALIZED (
  SELECT c.src, c.ncomm, s.comm,
         (SELECT m2 FROM mm{lv}) * c.kvc
           - d.k * (t.tot - CASE WHEN c.ncomm = s.comm THEN d.k ELSE 0 END) AS score
  FROM cand{q} c
  JOIN tot{q} t ON c.ncomm = t.comm
  JOIN s{p} s ON c.src = s.id
  JOIN deg{lv} d ON c.src = d.id
  WHERE c.src % 2 = {r % 2}
),
win{q} AS MATERIALIZED (
  SELECT b.src, b.bc, b.bs, t.ss FROM (
    SELECT src, ncomm AS bc, score AS bs,
           ROW_NUMBER() OVER (PARTITION BY src ORDER BY score DESC, ncomm ASC) AS rn
    FROM sc{q}
  ) b JOIN (
    SELECT src, MAX(CASE WHEN ncomm = comm THEN score END) AS ss FROM sc{q} GROUP BY src
  ) t ON b.src = t.src
  WHERE b.rn = 1
),
s{q} AS MATERIALIZED (
  SELECT s.id,
         CASE WHEN w.src IS NOT NULL AND w.bs > w.ss THEN w.bc ELSE s.comm END AS comm
  FROM s{p} s LEFT JOIN win{q} w ON s.id = w.src
)"""
    return sql


def _louvain_sql(rounds: int = 3) -> str:
    """Unrolled one-phase parity Louvain on the symmetrized cust→supp
    graph (kernels/louvain.louvain_moves' driver pin)."""
    sql = f"""WITH {_SYM_CUST_SUPP},
e_w AS MATERIALIZED (SELECT src, dst, CAST(1 AS BIGINT) AS w FROM sym),
v0 AS (SELECT src AS id, src AS comm FROM (SELECT DISTINCT src FROM sym))"""
    sql += _louvain_level_ctes("a", "e_w", "v0", rounds)
    return sql + f"\nSELECT id, comm FROM s_a_{rounds}\n"


def _louvain_ml_sql(rounds: int = 3) -> str:
    """Unrolled TWO-LEVEL multilevel Louvain (kernels/louvain.louvain,
    parity schedule, fixed rounds per level): phase 1 on the unit-
    weight graph, contraction (inter-community weights summed,
    intra-community weight becoming the super-vertex self-loop row —
    the symmetric frame does this by plain GROUP BY), phase 2 on the
    community graph, final assignment composed down to original ids."""
    sql = f"""WITH {_SYM_CUST_SUPP},
e_w AS MATERIALIZED (SELECT src, dst, CAST(1 AS BIGINT) AS w FROM sym),
v0 AS (SELECT src AS id, src AS comm FROM (SELECT DISTINCT src FROM sym))"""
    sql += _louvain_level_ctes("a", "e_w", "v0", rounds)
    sql += f""",
e2 AS MATERIALIZED (
  SELECT sa.comm AS src, sb.comm AS dst, SUM(e.w) AS w
  FROM e_w e
  JOIN s_a_{rounds} sa ON e.src = sa.id
  JOIN s_a_{rounds} sb ON e.dst = sb.id
  GROUP BY sa.comm, sb.comm
),
v2 AS (SELECT DISTINCT comm AS id, comm FROM s_a_{rounds})"""
    sql += _louvain_level_ctes("b", "e2", "v2", rounds)
    return sql + f"""
SELECT a.id, b.comm
FROM s_a_{rounds} a JOIN s_b_{rounds} b ON a.comm = b.id
"""


def _part_succ_e_q(qmax: int) -> str:
    """_PART_SUCC_E with a parameterized quantity cutoff."""
    return f"""
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM (SELECT l_orderkey, l_linenumber, l_partkey
        FROM lineitem WHERE l_quantity <= {qmax}) a
  JOIN (SELECT l_orderkey, l_linenumber, l_partkey
        FROM lineitem WHERE l_quantity <= {qmax}) b
    ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
  WHERE a.l_partkey <> b.l_partkey
"""


_EDGE_DIFF_SQL = f"""
WITH o AS MATERIALIZED ({_part_succ_e_q(15)}),
n AS MATERIALIZED ({_part_succ_e_q(17)})
SELECT src, dst, 'added' AS change FROM n
WHERE NOT EXISTS (SELECT 1 FROM o WHERE o.src = n.src AND o.dst = n.dst)
UNION ALL
SELECT src, dst, 'removed' AS change FROM o
WHERE NOT EXISTS (SELECT 1 FROM n WHERE n.src = o.src AND n.dst = o.dst)
"""


_DEGREE_DELTA_SQL = f"""
WITH o AS MATERIALIZED ({_part_succ_e_q(15)}),
n AS MATERIALIZED ({_part_succ_e_q(17)}),
vo AS (
  SELECT COALESCE(od.id, idg.id) AS id,
         COALESCE(od.c, 0) AS out_old, COALESCE(idg.c, 0) AS in_old
  FROM (SELECT src AS id, COUNT(*) AS c FROM o GROUP BY src) od
  FULL JOIN (SELECT dst AS id, COUNT(*) AS c FROM o GROUP BY dst) idg
    ON od.id = idg.id
),
vn AS (
  SELECT COALESCE(od.id, idg.id) AS id,
         COALESCE(od.c, 0) AS out_new, COALESCE(idg.c, 0) AS in_new
  FROM (SELECT src AS id, COUNT(*) AS c FROM n GROUP BY src) od
  FULL JOIN (SELECT dst AS id, COUNT(*) AS c FROM n GROUP BY dst) idg
    ON od.id = idg.id
)
SELECT id, out_old, out_new, in_old, in_new,
       out_new - out_old AS d_out, in_new - in_old AS d_in
FROM (
  SELECT COALESCE(vo.id, vn.id) AS id,
         COALESCE(vo.out_old, 0) AS out_old,
         COALESCE(vn.out_new, 0) AS out_new,
         COALESCE(vo.in_old, 0) AS in_old,
         COALESCE(vn.in_new, 0) AS in_new
  FROM vo FULL JOIN vn ON vo.id = vn.id
) t
WHERE out_new - out_old <> 0 OR in_new - in_old <> 0
"""


def _host_communities_sql(rounds: int = 3) -> str:
    """Host-graph weighted Louvain oracle: host edge weights by the
    same direct id%50 construction as the host_pagerank oracle, then
    one weighted parity-scheduled move phase via the shared per-level
    CTE generator (the kernel's symmetric frame sums directed pair
    weights; host_rollup drops self-loops)."""
    sql = f"""WITH e AS MATERIALIZED ({_CUST_SUPP_E}),
we AS (
  SELECT src % 50 AS src, dst % 50 AS dst, COUNT(*) AS w
  FROM e WHERE src % 50 <> dst % 50
  GROUP BY 1, 2
),
cn AS (
  SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v, SUM(w) AS w
  FROM we GROUP BY 1, 2
),
e_hw AS MATERIALIZED (
  SELECT u AS src, v AS dst, w FROM cn
  UNION ALL SELECT v, u, w FROM cn
),
vh0 AS (SELECT DISTINCT src AS id, src AS comm FROM e_hw)"""
    sql += _louvain_level_ctes("h", "e_hw", "vh0", rounds)
    return sql + f"\nSELECT id AS host_id, comm FROM s_h_{rounds}\n"


def _trussness_sql(rounds: int = 8) -> str:
    """Unrolled level-synchronous edge peeling on the canonical
    symmetrized part-succession edge list (kernels/truss.trussness).
    Each round recomputes residual support via the wedge-center 3-way
    self-join (the ktruss oracle's triangle SQL), advances the level
    to max(previous, min support + 2) by scalar subquery (DATA-
    derived, no literals to drift), peels everything at or below
    level-2 with that truss number, and keeps the rest. Rounds past
    the fixpoint are no-ops (empty MIN -> COALESCE keeps the level).
    MATERIALIZED throughout per the sssp/betweenness oracle lesson."""
    sql = f"""WITH e0 AS MATERIALIZED ({_PART_SUCC_E}),
sym0 AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
ec0 AS MATERIALIZED (SELECT src AS u, dst AS w FROM sym0 WHERE src < dst),
lv0 AS (SELECT CAST(2 AS BIGINT) AS lv)"""
    for r in range(1, rounds + 1):
        p = r - 1
        sql += f""",
sy{r} AS MATERIALIZED (SELECT u AS src, w AS dst FROM ec{p} UNION ALL SELECT w, u FROM ec{p}),
tr{r} AS (
  SELECT a.dst AS v, b.dst AS w
  FROM sy{r} a JOIN sy{r} b ON a.src = b.src AND a.dst < b.dst
  JOIN sy{r} c ON c.src = a.dst AND c.dst = b.dst
),
su{r} AS MATERIALIZED (SELECT v AS u, w, COUNT(*) AS support FROM tr{r} GROUP BY v, w),
fu{r} AS MATERIALIZED (
  SELECT e.u, e.w, COALESCE(s.support, CAST(0 AS BIGINT)) AS support
  FROM ec{p} e LEFT JOIN su{r} s ON e.u = s.u AND e.w = s.w
),
lv{r} AS MATERIALIZED (
  SELECT GREATEST((SELECT lv FROM lv{p}),
                  COALESCE((SELECT MIN(support) + 2 FROM fu{r}), CAST(0 AS BIGINT))) AS lv
),
pe{r} AS MATERIALIZED (
  SELECT u, w, CAST((SELECT lv FROM lv{r}) AS BIGINT) AS truss
  FROM fu{r} WHERE support <= (SELECT lv FROM lv{r}) - 2
),
ec{r} AS MATERIALIZED (
  SELECT u, w FROM fu{r} WHERE support > (SELECT lv FROM lv{r}) - 2
)"""
    union = "\nUNION ALL\n".join(
        f"SELECT u, w, truss FROM pe{r}" for r in range(1, rounds + 1)
    )
    return sql + f"\n{union}\n"


def _landmark_sql(max_level: int = 30) -> str:
    """Forward + reverse bounded recursive sweeps from the 4 smallest
    vertices of the DIRECTED part-succession graph (the landmark
    index), then the min-over-landmarks relay bound per query pair
    with ROW_NUMBER picking the (bound, landmark) minimum — mirrors
    estimate_distances' struct-min tie-break exactly. All BIGINT."""
    return f"""
WITH RECURSIVE e0 AS MATERIALIZED ({_PART_SUCC_E}),
v AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e0 UNION SELECT dst AS id FROM e0)),
lm AS (SELECT id FROM v ORDER BY id LIMIT 4),
fwd(id, landmark, dist) AS (
  SELECT id, id, 0 FROM lm
  UNION
  SELECT e.dst, f.landmark, f.dist + 1
  FROM fwd f JOIN e0 e ON f.id = e.src
  WHERE f.dist < {max_level}
),
dfrom AS (SELECT id, landmark, CAST(MIN(dist) AS BIGINT) AS d_from FROM fwd GROUP BY id, landmark),
rev(id, landmark, dist) AS (
  SELECT id, id, 0 FROM lm
  UNION
  SELECT e.src, f.landmark, f.dist + 1
  FROM rev f JOIN e0 e ON f.id = e.dst
  WHERE f.dist < {max_level}
),
dto AS (SELECT id, landmark, CAST(MIN(dist) AS BIGINT) AS d_to FROM rev GROUP BY id, landmark),
pairs AS (
  SELECT s.id AS src, d.id AS dst
  FROM (SELECT id FROM v WHERE id % 97 = 0) s
  CROSS JOIN (SELECT id FROM v WHERE id % 101 = 0) d
),
cand AS (
  SELECT p.src, p.dst, t.d_to + f.d_from AS bound, t.landmark
  FROM pairs p
  JOIN dto t ON p.src = t.id
  JOIN dfrom f ON f.landmark = t.landmark AND p.dst = f.id
)
SELECT src, dst, bound AS ub, landmark AS via FROM (
  SELECT src, dst, bound, landmark,
         ROW_NUMBER() OVER (PARTITION BY src, dst ORDER BY bound, landmark) AS rn
  FROM cand
) t WHERE rn = 1
"""


def _fold_split_sql(seed: int = 7) -> str:
    """Exact-membership fold assignment: boundaries computed by the
    SAME Python expressions as pipeline/sampling.fold_split (cumsum of
    fractions scaled to 2^32) so literal drift is impossible."""
    folds = {"train": 0.8, "val": 0.1, "test": 0.1}
    names = list(folds)
    bounds = []
    cum = 0.0
    for name in names[:-1]:
        cum += folds[name]
        bounds.append(int(cum * (1 << 32)))
    whens = "\n".join(
        f"    WHEN h < {b} THEN '{name}'" for name, b in zip(names[:-1], bounds)
    )
    return f"""
SELECT doc_id, CASE
{whens}
    ELSE '{names[-1]}' END AS fold
FROM (
  SELECT doc_id,
         ('0x' || substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM documents
)
"""


_URL_FILTER_SQL = """
WITH u AS (
  SELECT CASE o_orderkey % 6
    WHEN 0 THEN 'http://ads.host' || (o_orderkey % 50) || '.example.com/p/' || o_orderkey
    WHEN 1 THEN 'https://host' || (o_orderkey % 50) || '.site.org/p/' || o_orderkey
    WHEN 2 THEN 'http://host' || (o_orderkey % 50) || '.example.com/casino/' || o_orderkey
    WHEN 3 THEN 'https://host' || (o_orderkey % 50) || '.site.org/free-casino/' || o_orderkey
    WHEN 4 THEN 'http://host' || (o_orderkey % 50) || '.blocked.net/x/' || o_orderkey
    ELSE 'no scheme here ' || o_orderkey
  END AS url
  FROM orders
),
bl AS (SELECT * FROM (VALUES ('blocked.net'), ('host3.example.com')) t(domain)),
hh AS (
  SELECT url,
    regexp_replace(
      lower(regexp_extract(regexp_replace(url, '#.*$', ''),
                           '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)),
      ':[0-9]+$', '') AS host,
    CAST((length(lower(url)) - length(replace(lower(url), 'casino', ''))) / 6 AS BIGINT) AS kw_hits
  FROM u
),
sfx AS (
  SELECT url, array_to_string(labels[CAST(g.i AS INTEGER):], '.') AS suffix
  FROM (SELECT url, string_split(host, '.') AS labels FROM hh) s,
       UNNEST(range(1, length(s.labels) + 1)) AS g(i)
),
hit AS (
  SELECT s.url, MIN(b.domain) AS blocked_domain
  FROM sfx s JOIN bl b ON s.suffix = b.domain
  GROUP BY s.url
)
SELECT h.url, h.host, t.blocked_domain, h.kw_hits,
       (t.blocked_domain IS NULL AND h.kw_hits <= 0) AS keep
FROM hh h LEFT JOIN hit t ON h.url = t.url
"""


def oracle_sql() -> dict[str, str]:
    return {
        "dedup_exact": """
SELECT md5(text) AS text_hash, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
FROM documents GROUP BY md5(text)
""",
        "minhash_signatures": _minhash_sql(),
        "lsh_pairs": _lsh_pairs_sql(),
        "minhash_jaccard": _minhash_jaccard_sql(threshold=0.5),
        "bpe_token_stats": _bpe_token_stats_sql(),
        "simhash": _SIMHASH_SQL,
        "simhash_pairs": _SIMHASH_PAIRS_SQL,
        "ngram_jaccard": _NGRAM_JACCARD_SQL,
        "token_stats": _token_stats_sql(),
        "tfidf_topk": _TFIDF_TOPK_SQL,
        "vocab_stats": _VOCAB_STATS_SQL,
        "inverted_index": _INVERTED_INDEX_SQL,
        "bm25_topk": _bm25_sql("spark join window", k=10),
        "pmi_topk": _pmi_topk_sql(window=2, min_count=5, k=100),
        "dedup_normalized": _dedup_normalized_sql(),
        "resolve_redirects": _RESOLVE_REDIRECTS_SQL,
        "covisitation": _covisitation_sql(gap_minutes=120, min_count=2),
        "funnel_steps": _funnel_sql(["signup", "view", "click", "purchase"]),
        "retention_cohorts": _RETENTION_SQL,
        "event_transitions": _EVENT_TRANSITIONS_SQL,
        "session_paths": _session_paths_sql(),
        "zorder_orders": _zorder_orders_sql(),
        "weighted_sample": _WEIGHTED_SAMPLE_SQL,
        "unigram_logprob": _UNIGRAM_LOGPROB_SQL,
        "lang_id": _lang_id_sql(),
        "doc_fingerprints": _DOC_FINGERPRINTS_SQL,
        "copy_candidates": _COPY_CANDIDATES_SQL,
        "pack_sequences": _PACK_SEQUENCES_SQL,
        "url_canon": _URL_CANON_SQL,
        "group_capped_sample": _GROUP_CAPPED_SQL,
        "ann_topk": _ANN_TOPK_SQL,
        "ann_lsh_topk": _ann_lsh_sql(),
        "ann_ivf_topk": _ivf_ann_sql(k=5, max_queries=10, n_clusters=8, nprobe=3, rounds=3),
        "semantic_dedup": _semantic_dedup_sql(threshold=0.3, n_clusters=8, rounds=3),
        "embedding_near_dup": _near_dup_sql(),
        "dedup_clusters": _dedup_clusters_sql(),
        "bfs_levels": _bfs_sql(),
        "msbfs_harmonic": _msbfs_harmonic_sql(),
        "graph_radii": _graph_radii_sql(),
        "betweenness": _betweenness_sql(15),
        "sssp_weighted": _sssp_sql(rounds=12),
        "kcore": _kcore_sql(20, rounds=4),
        "coreness": _coreness_sql(rounds=24),
        "trussness": _trussness_sql(rounds=8),
        "louvain_k": _louvain_sql(rounds=3),
        "louvain_ml": _louvain_ml_sql(rounds=3),
        "host_communities": _host_communities_sql(rounds=3),
        "edge_diff": _EDGE_DIFF_SQL,
        "degree_delta": _DEGREE_DELTA_SQL,
        "landmark_est": _landmark_sql(max_level=30),
        "fold_split": _fold_split_sql(seed=7),
        "url_filter": _URL_FILTER_SQL,
        "mis": _mis_sql(rounds=6),
        "coloring": _coloring_sql(layers=4, rounds=5),
        "anf_sketch": _anf_sketch_sql(rounds=8, registers=8),
        "host_graph": _HOST_GRAPH_SQL,
        "host_pagerank": _host_pagerank_sql(3),
        "labelprop_k": _labelprop_k_sql(3),
        "pagerank_delta_k": _PAGERANK_DELTA_SQL,
        "pagerank_delta_multi": _PAGERANK_DELTA_MULTI_SQL,
        "degree_counts": f"""
WITH e AS ({_PART_SUPP_E}),
v AS (SELECT src AS id FROM e UNION SELECT dst AS id FROM e)
SELECT v.id,
       COALESCE(o.c, 0) AS out_deg,
       COALESCE(i.c, 0) AS in_deg
FROM v
LEFT JOIN (SELECT src, COUNT(*) AS c FROM e GROUP BY src) o ON v.id = o.src
LEFT JOIN (SELECT dst, COUNT(*) AS c FROM e GROUP BY dst) i ON v.id = i.dst
""",
        "triangle_count": f"""
WITH e0 AS ({_COPART_E}),
sym AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
deg AS (SELECT src AS vtx, COUNT(*) AS d FROM sym GROUP BY src),
o AS (
  SELECT s.src, s.dst FROM sym s
  JOIN deg d1 ON s.src = d1.vtx
  JOIN deg d2 ON s.dst = d2.vtx
  WHERE d1.d < d2.d OR (d1.d = d2.d AND s.src < s.dst)
)
SELECT COUNT(*) AS n_triangles
FROM o e1
JOIN o e2 ON e1.src = e2.src AND e1.dst <> e2.dst
JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst
""",
        "cc_components": f"""
WITH RECURSIVE e0 AS ({_CUST_SUPP_E}),
sym AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
v AS (SELECT src AS id FROM sym UNION SELECT dst AS id FROM sym),
reach(id, anc) AS (
  SELECT id, id FROM v
  UNION
  SELECT s.dst AS id, r.anc
  FROM reach r JOIN sym s ON r.id = s.src
)
SELECT comp, COUNT(*) AS csize FROM (
  SELECT id, MIN(anc) AS comp FROM reach GROUP BY id
) GROUP BY comp
""",
        "pagerank_k": _pagerank_k_sql(3),
        "hits_k": _hits_k_sql(3),
        "eigen_k": _eigen_k_sql(3),
        "katz_k": _katz_k_sql(3, alpha=0.1, beta=1.0),
        "spam_mass_k": _spam_mass_sql(3, n_seeds=4),
        "salsa_k": _salsa_k_sql(3),
        "modularity_lp": _modularity_sql(3),
        "conductance_lp": _conductance_sql(3),
        "degree_dist": _DEGREE_DIST_SQL,
        "power_law_alpha": _power_law_sql(4),
        "knn_curve": _KNN_CURVE_SQL,
        "rich_club": _RICH_CLUB_SQL,
        "attr_assortativity": _ATTR_ASSORT_SQL,
        "four_cliques": _FOUR_CLIQUES_SQL,
        "random_walks": _random_walks_sql(4, 2, 7),
        "node2vec_walks": _node2vec_sql(3, 2, (1, 4, 2), 7),
        "neighbor_sample": _neighbor_sample_sql([3, 2], 7),
        "rw_sample": _rw_sample_sql(4, 2, 7, 101),
        "negative_sample": _negative_sample_sql(3, 7),
        "degree_relabel": _DEGREE_RELABEL_SQL,
        "adjacency_gaps": _ADJ_GAPS_SQL,
        "pseudo_diameter": _PSEUDO_DIAM_SQL,
        "condensation_levels": _CONDENSE_SQL,
        "ppr_k": _ppr_k_sql(3),
        "ppr_sweep": _ppr_sweep_sql(3, 4, 128),
        "closeness_k": _closeness_sql(15),
        "scc": _SCC_SQL,
        "bowtie_classes": _BOWTIE_SQL,
        "clustering_coeff": _CLUSTERING_SQL,
        "link_pred": _LINK_PRED_SQL,
        "butterflies": _BUTTERFLIES_SQL,
        "densest_core": _densest_sql(10),
        "graph_stats": _GRAPH_STATS_SQL,
        "ktruss_10": _ktruss_sql(10, 10),
        "maximal_matching": _matching_sql(rounds=12),
        "msf_boruvka": _msf_sql(rounds=4),
        "edge_jaccard": _EDGE_JACCARD_SQL,
        "kmeans_embed": _kmeans_sql(k=8, rounds=3, dim=64),
        "pq_codes": _pq_codes_sql(),
        "stratified_sample": _STRATIFIED_SAMPLE_SQL,
        "gopher_quality": _gopher_quality_sql(),
        "repetition_signals": _repetition_signals_sql(),
        "bpe_merges": _bpe_merges_sql(),
        "bpe_token_counts": _bpe_token_counts_sql(),
        "mask_tokens": _mask_tokens_sql(),
        "skipgram_pairs": _skipgram_pairs_sql(),
        "c4_quality": _c4_quality_sql(),
        "chunk_documents": _chunk_documents_sql(),
        "cms_top_words": _cms_top_words_sql(),
        "hll_trigrams": _hll_trigrams_sql(),
        "hll_by_lang": _hll_by_lang_sql(),
        "trending_stream": _TRENDING_SQL,
        "enriched_event_counts": _ENRICHED_EVENTS_SQL,
        "embedding_covariance": _embedding_covariance_sql(),
        "bloom_probe": _bloom_probe_sql(),
        "cluster_sample": _cluster_sample_sql(per_cluster=20, n_clusters=8, rounds=3, seed=7),
        "feature_prop": _feature_prop_sql(rounds=2, dim=64),
        "decontaminate": _decontaminate_sql(n=4, bench_mod=25),
        "pii_redact": _pii_redact_sql(),
        "pagerank_weighted_k": _pagerank_weighted_k_sql(3),
        "ego_net_2": _EGO_NET_SQL,
        "event_sessions_graph": """
WITH t AS (
  SELECT user_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src_type,
         event_type AS dst_type
  FROM events
)
SELECT src_type, dst_type, COUNT(*) AS cnt
FROM t WHERE src_type IS NOT NULL
GROUP BY src_type, dst_type
""",
        # gaps-and-islands twin of Spark's session_window: new session
        # iff gap to previous event >= 30 min (half-open [start, end)),
        # session end = last event + gap
        "event_sessions_stream": """
WITH t AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM t
)
SELECT user_id,
       epoch_us(MIN(ts)) AS session_start_us,
       epoch_us(MAX(ts) + INTERVAL 30 MINUTE) AS session_end_us,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 6) AS total_value
FROM s
GROUP BY user_id, sid
""",
        # streaming first-arrival dedup projected to the content hash
        # == the distinct hash set (representative-independent)
        "doc_dedup_stream": "SELECT DISTINCT md5(text) AS content_md5 FROM documents",
    }
