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
