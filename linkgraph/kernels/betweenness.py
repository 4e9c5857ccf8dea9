"""Betweenness centrality — Brandes' algorithm (Brandes 2001), the BC
app of the Ligra suite (the reference engine at /root/reference/src
stops at PageRank/CC/BFS/labelprop/triangles; BC extends the same
frontier machinery).

Sampled-source BC (Bader et al. 2007): exact per-source dependencies
for a deterministic source sample S, summed over S — with S = all
vertices this is exact BC; smaller S is the standard estimator.

Forward phase = multi-source BFS that also accumulates σ (the number
of shortest paths): each round is ONE edge_map with the composite
(dst, source) combine key, aggs = SUM(σ) over frontier in-neighbors,
and the per-lane visited check as the anti-join cond() — the σ
accumulation IS the message combine, no extra pass. Per-level states
are retained (severed) so the backward phase replays levels without
re-filtering a big union.

Backward phase sweeps levels deepest-first: δ(v) = Σ over successors w
(edge v→w, dist(w) = dist(v)+1, same lane) of (σ(v)/σ(w))·(1+δ(w)).
Each level is one join+agg: edges join the level-l state on src and
the level-(l+1) (state + δ) on (dst, source). Levels are small slices
of the vertex set, so both join sides shrink with the level — the edge
relation is never scanned whole per round, only its frontier-incident
part survives the src join.

Call with a SYMMETRIZED graph for the textbook undirected BC;
on a directed graph the result is directed-path BC.

Scale: jobs = 2 × eccentricity bound, independent of |S| (lanes ride
the combine key). State per level is O(Σ_lane |level set|) rows.
σ/δ are doubles (σ overflows int64 on dense graphs well before it
loses double precision that matters to ranking).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph.build import Graph
from linkgraph.checkpoint import release, sever
from linkgraph.frontier import edge_map


@dataclass
class BCResult:
    df: DataFrame  # (id long, bc double) — reached non-source vertices
    iterations: int  # forward levels executed
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def betweenness(
    graph: Graph,
    sources: list[int],
    max_iter: int = 10_000,
) -> BCResult:
    spark = graph.edges.sparkSession
    t0 = time.time()
    src_list = sorted(set(int(s) for s in sources))
    if not src_list:
        return BCResult(
            spark.createDataFrame([], "id long, bc double"), 0, time.time() - t0
        )

    # ---- forward: levels[l] = (id, source, sigma) reached at dist l
    seed = sever(
        spark.createDataFrame(
            [(s, s, 1.0) for s in src_list], "id long, source long, sigma double"
        )
    )
    levels: list[DataFrame] = [seed]
    visited = seed.select("id", "source")
    fcount = len(src_list)
    metrics: list[dict] = []
    iterations = 0
    for level in range(1, max_iter + 1):
        if fcount == 0:
            break
        it_t0 = time.time()
        est_volume = int(fcount * (graph.m / max(graph.n, 1)))
        info: dict = {}
        nxt = edge_map(
            graph,
            levels[-1],
            aggs=[F.sum("sigma").alias("sigma")],
            volume=est_volume,
            exclude_dst=visited,
            info=info,
            group_extra=["source"],
        ).select(F.col("dst").alias("id"), "source", "sigma")
        obs = Observation(f"bc_fwd_{level}")
        cur = sever(nxt.observe(obs, F.count(F.lit(1)).alias("added")))
        fcount = int(obs.get["added"] or 0)
        if fcount == 0:
            release(cur)
            break
        levels.append(cur)
        visited = visited.union(cur.select("id", "source"))
        iterations = level
        metrics.append(
            {
                "phase": "forward",
                "iteration": level,
                "frontier_size": fcount,
                "mode": info.get("mode"),
                "wall_s": time.time() - it_t0,
            }
        )

    # ---- backward: deepest level has delta 0; sweep up
    edges = graph.edges
    delta_states: list[DataFrame] = []
    upper = sever(levels[-1].withColumn("delta", F.lit(0.0)))
    delta_states.append(upper)
    for l in range(len(levels) - 2, -1, -1):
        it_t0 = time.time()
        low = levels[l]
        contrib = (
            edges.join(
                low.select(
                    F.col("id").alias("src"),
                    "source",
                    F.col("sigma").alias("sigma_v"),
                ),
                "src",
            )
            .join(
                upper.select(
                    F.col("id").alias("dst"),
                    "source",
                    F.col("sigma").alias("sigma_w"),
                    F.col("delta").alias("delta_w"),
                ),
                ["dst", "source"],
            )
            .groupBy(F.col("src").alias("id"), "source")
            .agg(
                F.sum(
                    (F.col("sigma_v") / F.col("sigma_w"))
                    * (F.lit(1.0) + F.col("delta_w"))
                ).alias("d")
            )
        )
        cur = sever(
            low.join(contrib, ["id", "source"], "left").select(
                "id",
                "source",
                "sigma",
                F.coalesce(F.col("d"), F.lit(0.0)).alias("delta"),
            )
        )
        delta_states.append(cur)
        upper = cur
        metrics.append(
            {"phase": "backward", "level": l, "wall_s": time.time() - it_t0}
        )

    bc = reduce(
        lambda a, b: a.union(b),
        [d.select("id", "source", "delta") for d in delta_states],
    )
    out = sever(
        bc.where(F.col("id") != F.col("source"))
        .groupBy("id")
        .agg(F.round(F.sum("delta"), 9).alias("bc"))
    )
    for d in delta_states:
        release(d)
    for s in levels:
        release(s)
    return BCResult(
        df=out,
        iterations=iterations,
        wall_seconds=time.time() - t0,
        metrics=metrics,
    )
