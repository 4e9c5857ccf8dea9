"""Whole-graph summary statistics for directed link graphs — the
standard web-graph characterization row (Broder WWW'00 / Newman 2002
PRL "Assortative mixing in networks"):

  n, m            — vertices touched by edges / distinct directed edges
  recip_edges     — directed edges whose reverse also exists
  reciprocity     — recip_edges / m (link-back rate of the web graph)
  max_deg, avg_deg— undirected distinct-neighbor degree extremes
  assortativity   — Newman's degree-assortativity r over the
                    symmetrized graph (hubs linking hubs → r > 0;
                    web graphs are typically disassortative, r < 0)

The reference engine at /root/reference/src has no whole-graph stats
app; this extends its algorithm family on the same edge table.

Numerical design: every aggregate is an exact int64 SUM/COUNT (degree
products of int degrees), and the two doubles are single fixed-order
expressions over those integers — so Spark and the DuckDB oracle are
bit-identical with no tolerance. Divisions are try_divide: a 0-variance
(regular) graph has no defined assortativity → NULL, matching DuckDB's
x/0 → NULL (ANSI-mode `/` would throw DIVIDE_BY_ZERO instead). With symmetric edge rows Σj = Σk and
Σj² = Σk², Newman's r collapses to

    r = (M·Σjk − (Σj)²) / (M·Σj² − (Σj)²)

over the M symmetrized rows (each undirected edge contributes both
directions, the convention in Newman's estimator).

Scale notes: two degree joins on the symmetric edge set + one global
agg (partial+final, map-side combined); reciprocity is one self-join
on the directed edge key. No Python, no driver loops; the int64
products M·Σjk need ~2·log2(m·deg²) bits — switch the final products
to DOUBLE beyond ~1e9 edges × 1e4 degrees (documented, not hit at any
tested scale).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.build import Graph, symmetrize


@dataclass
class GraphStatsResult:
    df: DataFrame  # one row: n, m, recip_edges, reciprocity, max_deg, avg_deg, assortativity
    wall_seconds: float


def graph_stats(graph: Graph) -> GraphStatsResult:
    t0 = time.time()
    e = graph.edges.where(F.col("src") != F.col("dst")).distinct()
    sym = symmetrize(e)
    deg = sym.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    joined = sym.join(
        deg.select(F.col("v").alias("src"), F.col("deg").alias("j")), "src"
    ).join(deg.select(F.col("v").alias("dst"), F.col("deg").alias("k")), "dst")

    base = joined.agg(
        F.count(F.lit(1)).alias("bigm"),
        F.sum(F.col("j") * F.col("k")).alias("sjk"),
        F.sum("j").alias("sj"),
        F.sum(F.col("j") * F.col("j")).alias("sjj"),
        F.max("j").alias("max_deg"),
    )
    nrow = deg.agg(F.count(F.lit(1)).alias("n"))
    mrow = e.agg(F.count(F.lit(1)).alias("m"))
    rrow = e.join(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        ["src", "dst"],
    ).agg(F.count(F.lit(1)).alias("recip_edges"))

    out = (
        base.crossJoin(F.broadcast(nrow))
        .crossJoin(F.broadcast(mrow))
        .crossJoin(F.broadcast(rrow))
        .select(
            "n",
            "m",
            "recip_edges",
            F.try_divide(F.col("recip_edges"), F.col("m")).alias("reciprocity"),
            "max_deg",
            F.try_divide(F.col("bigm"), F.col("n")).alias("avg_deg"),
            F.try_divide(
                F.col("bigm") * F.col("sjk") - F.col("sj") * F.col("sj"),
                F.col("bigm") * F.col("sjj") - F.col("sj") * F.col("sj"),
            ).alias("assortativity"),
        )
    )
    return GraphStatsResult(df=out, wall_seconds=time.time() - t0)


def degree_distribution(graph: Graph) -> DataFrame:
    """Log2-binned in-/out-degree histogram — THE most-reported
    web-graph plot (Broder WWW'00 fig. 2 reports both as power laws).

    Output: (direction, bin, lo, hi, cnt) where bin = floor(log2 deg)
    for deg >= 1 with [lo, hi] = [2^bin, 2^(bin+1) - 1], and the
    degree-0 vertices land in bin -1 with lo = hi = 0. The bin index
    is EXACT integer logic — length(bin(deg)) - 1, no float log2, so
    a power-of-two degree can never misbin and engines cannot drift.

    Scale shape: two degree aggregations on the edge table (the same
    partial+final count every kernel's degree table uses), a left
    anti/join against the vertex skeleton for the 0-bin, then a
    groupBy on ~64 bin keys. All int64, hash-exact.
    """
    out: DataFrame | None = None
    for direction, key in (("out", "src"), ("in", "dst")):
        deg = graph.edges.groupBy(F.col(key).alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        full = graph.vertices.select("id").join(deg, "id", "left").select(
            F.coalesce("deg", F.lit(0).cast("long")).alias("deg")
        )
        binned = full.select(
            F.when(F.col("deg") > 0, F.length(F.bin(F.col("deg"))) - 1)
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("bin")
        )
        hist = (
            binned.groupBy("bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                F.lit(direction).alias("direction"),
                "bin",
                F.expr(
                    "CAST(CASE WHEN bin >= 0 THEN shiftleft(CAST(1 AS BIGINT), "
                    "CAST(bin AS INT)) ELSE 0 END AS BIGINT)"
                ).alias("lo"),
                F.expr(
                    "CAST(CASE WHEN bin >= 0 THEN shiftleft(CAST(1 AS BIGINT), "
                    "CAST(bin AS INT) + 1) - 1 ELSE 0 END AS BIGINT)"
                ).alias("hi"),
                "cnt",
            )
        )
        out = hist if out is None else out.unionByName(hist)
    return out


def power_law_alpha(graph: Graph, dmin: int = 4) -> DataFrame:
    """Hill maximum-likelihood estimate of the degree-distribution
    tail exponent (Hill 1975; the discrete-tail recipe of Clauset,
    Shalizi & Newman SIAM Rev. 2009, eq. 3.1's continuous
    approximation):

        alpha = 1 + tail_n / SUM_{deg >= dmin} ln(deg / dmin)

    per direction — Broder WWW'00 reports alpha ~= 2.1 (in) and
    ~= 2.72 (out) for the web. Output: (direction, dmin, tail_n,
    alpha) with alpha ROUND(9) (the one float: a SUM of per-degree
    ln terms; tail_n and the per-distinct-degree counts are exact).
    Degenerate tails (all tail degrees == dmin, or an empty tail)
    give NULL via try_divide instead of throwing.

    Scale shape: the degree table collapses to DISTINCT degree values
    (<= ~64 * n^(1/2)-ish rows in practice) before any float math, so
    the ln-sum aggregates a tiny table; everything before it is the
    standard partial+final degree count.
    """
    if dmin < 1:
        raise ValueError("power_law_alpha needs dmin >= 1")
    out: DataFrame | None = None
    for direction, key in (("out", "src"), ("in", "dst")):
        deg = graph.edges.groupBy(F.col(key).alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        per_deg = (
            deg.where(F.col("deg") >= dmin)
            .groupBy("deg")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        row = per_deg.agg(
            F.sum("c").alias("tail_n"),
            F.sum(
                F.col("c").cast("double")
                * F.log(F.col("deg").cast("double") / F.lit(float(dmin)))
            ).alias("lnsum"),
        ).select(
            F.lit(direction).alias("direction"),
            F.lit(dmin).cast("long").alias("dmin"),
            F.coalesce("tail_n", F.lit(0).cast("long")).alias("tail_n"),
            F.round(
                F.lit(1.0)
                + F.try_divide(F.col("tail_n").cast("double"), F.col("lnsum")),
                9,
            ).alias("alpha"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def knn_curve(graph: Graph) -> DataFrame:
    """Average-nearest-neighbor-degree curve k_nn(k) (Pastor-Satorras,
    Vazquez & Vespignani PRL 2001) over the symmetrized graph — the
    degree-correlation PLOT whose slope sign `graph_stats`'s scalar
    assortativity summarizes (web graphs: decreasing k_nn(k) =
    disassortative, hubs attach to leaves).

    Output: one row per occupied degree class,
      (deg, n_vertices, sum_nbr_deg, knn)
    with knn(k) = Sigma_{v: deg(v)=k} S(v) / (k * n_k), where
    S(v) = Sigma_{u in N(v)} deg(u). Identical to the textbook
    mean-over-vertices of S(v)/k because deg is constant within the
    class — but THIS form keeps every aggregate an exact int64 SUM and
    knn ONE fixed-order double division: hash-exact across engines
    with no rounding (the graph_stats contract).

    Scale shape: one degree agg, one m-row join tagging each edge's
    dst degree, one src-keyed SUM, one join back to deg, then a
    groupBy on the ~distinct-degree keys (tiny). All partial+final,
    map-side combined; no windows, no driver loops."""
    e = graph.edges.where(F.col("src") != F.col("dst")).distinct()
    sym = symmetrize(e)
    deg = sym.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    nbr_sum = (
        sym.join(
            deg.select(F.col("v").alias("dst"), F.col("deg").alias("nd")),
            "dst",
        )
        .groupBy("src")
        .agg(F.sum("nd").alias("s"))
    )
    per_vertex = nbr_sum.join(
        deg.select(F.col("v").alias("src"), "deg"), "src"
    )
    return (
        per_vertex.groupBy("deg")
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.sum("s").cast("long").alias("sum_nbr_deg"),
        )
        .select(
            F.col("deg").cast("long").alias("deg"),
            F.col("n_vertices").cast("long").alias("n_vertices"),
            "sum_nbr_deg",
            (
                F.col("sum_nbr_deg")
                / (F.col("deg") * F.col("n_vertices")).cast("double")
            ).alias("knn"),
        )
    )


def rich_club(graph: Graph) -> DataFrame:
    """Rich-club coefficient curve phi(k) (Colizza, Flammini, Serrano
    & Vespignani, Nature Physics 2006) over the symmetrized simple
    graph: for every occupied degree threshold k,

      (k, rich_n, rich_e, phi)

    with rich_n = #vertices of degree > k, rich_e = #undirected edges
    among them, and phi(k) = 2*rich_e / (rich_n*(rich_n - 1)) — the
    density of the subgraph induced by the hubs (a rising phi(k) =
    hubs form a club; web/internet graphs famously do). phi is ONE
    fixed-order double division over exact int64 aggregates
    (try_divide: rich_n < 2 yields NULL) — hash-exact, no rounding.

    Scale shape: one m-row join tags each canonical (u < v) edge with
    min(deg_u, deg_v); both histograms (edge thresholds, degrees) are
    distinct-degree-scale, their suffix sums one window over that tiny
    frame — the heavy work is the same two joins every stats kernel
    pays, no windows over m rows."""
    from pyspark.sql import Window

    e = graph.edges.where(F.col("src") != F.col("dst")).distinct()
    sym = symmetrize(e)
    canon = sym.where(F.col("src") < F.col("dst"))
    deg = sym.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    tagged = (
        canon.join(deg.select(F.col("v").alias("src"), F.col("deg").alias("du")), "src")
        .join(deg.select(F.col("v").alias("dst"), F.col("deg").alias("dv")), "dst")
        .select(F.least("du", "dv").alias("t"))
    )
    th_hist = tagged.groupBy(F.col("t").alias("key")).agg(
        F.count(F.lit(1)).alias("e_at")
    )
    deg_hist = deg.groupBy(F.col("deg").alias("key")).agg(
        F.count(F.lit(1)).alias("n_at")
    )
    merged = (
        deg_hist.join(th_hist, "key", "full")
        .select(
            "key",
            F.coalesce("n_at", F.lit(0)).alias("n_at"),
            F.coalesce("e_at", F.lit(0)).alias("e_at"),
        )
    )
    w = Window.orderBy(F.desc("key")).rowsBetween(Window.unboundedPreceding, 0)
    cum = merged.select(
        "key", "n_at", "e_at",
        (F.sum("n_at").over(w) - F.col("n_at")).alias("rich_n"),
        (F.sum("e_at").over(w) - F.col("e_at")).alias("rich_e"),
    )
    # report rows for occupied DEGREE classes only (n_at > 0)
    return cum.where(F.col("n_at") > 0).select(
        F.col("key").cast("long").alias("k"),
        F.col("rich_n").cast("long").alias("rich_n"),
        F.col("rich_e").cast("long").alias("rich_e"),
        F.try_divide(
            (2 * F.col("rich_e")).cast("double"),
            (F.col("rich_n") * (F.col("rich_n") - 1)).cast("double"),
        ).alias("phi"),
    )


def attribute_assortativity(
    graph: Graph,
    labels: DataFrame,
    label_col: str = "label",
) -> DataFrame:
    """Categorical (discrete) assortativity coefficient (Newman, PRE
    67:026126 2003 "Mixing patterns in networks") over directed edges:
    do links stay within a category (language, nation, host TLD)?

      one row: (m, diag, cross, r)

    with the mixing matrix E[l_i][l_j] = edge counts, diag = Σ_i E_ii,
    A_i/B_j the row/column marginals, and

      r = (m·diag − Σ_i A_i·B_i) / (m² − Σ_i A_i·B_i)

    — Newman's (tr e − Σ a·b)/(1 − Σ a·b) cleared of denominators so
    every aggregate stays EXACT int64 (marginal products summed over
    the tiny label² space); r is ONE fixed-order double division —
    hash-exact, no rounding. r = 1 pure homophily, 0 random mixing,
    < 0 disassortative; NULL (try_divide) when one label owns every
    endpoint (m² == Σ A·B).

    Scale shape: two vertex-keyed label-tagging joins (broadcast when
    the label table fits) + one groupBy onto the label² key space —
    the modularity/community_stats discipline.

    labels: (id long, <label_col>) — vertices absent from `labels`
    are dropped with their edges (documented; pass a complete table
    for the full-graph coefficient)."""
    lab = labels.select(F.col("id"), F.col(label_col).alias("_lab"))
    tagged = (
        graph.edges.join(
            lab.select(F.col("id").alias("src"), F.col("_lab").alias("li")), "src"
        )
        .join(lab.select(F.col("id").alias("dst"), F.col("_lab").alias("lj")), "dst")
    )
    mix = tagged.groupBy("li", "lj").agg(F.count(F.lit(1)).alias("cnt"))
    row_m = mix.groupBy("li").agg(F.sum("cnt").alias("a"))
    col_m = mix.groupBy("lj").agg(F.sum("cnt").alias("b"))
    s = (
        row_m.join(col_m, row_m["li"] == col_m["lj"])
        .agg(F.sum(F.col("a") * F.col("b")).alias("s"))
    )
    agg = mix.agg(
        F.sum("cnt").cast("long").alias("m"),
        F.sum(F.when(F.col("li") == F.col("lj"), F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("diag"),
    )
    return agg.crossJoin(s.select(F.coalesce("s", F.lit(0)).cast("long").alias("cross"))).select(
        "m",
        "diag",
        "cross",
        F.try_divide(
            (F.col("m") * F.col("diag") - F.col("cross")).cast("double"),
            (F.col("m") * F.col("m") - F.col("cross")).cast("double"),
        ).alias("r"),
    )
