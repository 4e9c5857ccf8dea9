"""Neighborhood-overlap link prediction: for every NON-adjacent vertex
pair (u, w) with at least `min_cn` common neighbors, the two classic
scores (Liben-Nowell & Kleinberg CIKM'03):

  cn — common-neighbor count |N(u) ∩ N(w)|
  aa — Adamic-Adar  Σ_{v ∈ N(u)∩N(w)} 1 / ln(deg(v))

over the symmetrized, self-loop-free graph. This is the "which pages
should link but don't" / related-item-discovery primitive for web
graphs (the reference engine at /root/reference/src has no link
prediction; this extends its algorithm family on the same edge table).

Plan shape: one wedge self-join on the center vertex (v→a ⋈ v→b,
a < b so each pair materializes once), a partial+final groupBy on the
pair key, and one anti-join against the edge set to drop already-
adjacent pairs — all JVM-side, no Python.

Scale notes: wedge volume is Σ_v deg(v)² — quadratic at hub centers,
the same degeneracy as LSH mega-buckets (pipeline/dedup.py). The
`max_center_deg` guard bounds it: wedges through super-hub centers are
dropped (documented standard practice for CN/AA at scale — a hub
center contributes ~0 Adamic-Adar weight anyway, 1/ln(deg) → 0, while
costing deg² rows). Common-neighbor centers always have deg ≥ 2, so
ln(deg) ≥ ln 2 > 0 — the AA division is always safe.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.build import Graph, symmetrize
from linkgraph.checkpoint import sever


@dataclass
class LinkPredResult:
    df: DataFrame  # (u long, w long, cn long, aa double), u < w
    wall_seconds: float


def link_prediction(
    graph: Graph,
    max_center_deg: int | None = None,
    min_cn: int = 1,
) -> LinkPredResult:
    """Common-neighbor + Adamic-Adar scores for all non-adjacent pairs
    with ≥ min_cn shared neighbors. `max_center_deg` drops wedges whose
    center exceeds the degree cap (skew guard, see module doc)."""
    t0 = time.time()
    sym = symmetrize(graph.edges).where(F.col("src") != F.col("dst"))
    deg = sym.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("vdeg")
    )
    centers = sym.select(F.col("src").alias("v"), F.col("dst").alias("nbr")).join(
        deg, "v"
    )
    if max_center_deg is not None:
        centers = centers.where(F.col("vdeg") <= max_center_deg)

    e1 = centers.select("v", F.col("nbr").alias("u"), "vdeg")
    e2 = centers.select("v", F.col("nbr").alias("w"))
    wedges = e1.join(e2, "v").where(F.col("u") < F.col("w"))
    pairs = wedges.groupBy("u", "w").agg(
        F.count(F.lit(1)).alias("cn"),
        F.sum(F.lit(1.0) / F.log(F.col("vdeg"))).alias("aa"),
    )
    out = (
        pairs.join(
            sym.select(F.col("src").alias("u"), F.col("dst").alias("w")),
            ["u", "w"],
            "left_anti",
        )
        .where(F.col("cn") >= min_cn)
        .select("u", "w", "cn", "aa")
    )
    return LinkPredResult(df=sever(out), wall_seconds=time.time() - t0)
