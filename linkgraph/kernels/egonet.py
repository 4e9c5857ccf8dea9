"""Ego network extraction: the radius-k neighborhood of one or more
seed vertices plus the subgraph it induces — the standard "zoom into
this page/site" primitive (and the GraphFrames-style API gap left by
whole-graph kernels: every other kernel answers a global question,
this one materializes a local workspace a user can iterate on).

Semantics: `vertices` = every vertex within `radius` hops of a seed
along the chosen direction ("out" = follow links, "in" = follow
backlinks, "both" = symmetrized), tagged with its hop distance (seeds
are 0; min distance on multi-seed). `edges` = ALL original directed
edges whose endpoints both fall inside the ball (the induced subgraph
keeps direction regardless of walk direction).

Plan shape: a bounded frontier BFS (≤ radius edge_map rounds, delta
frontiers, anti-join visitedness — bfs.py's loop without the parent
tree; "both" walks forward and transpose in the same round), then one
double semi-join for the induced edges. Scale: O(radius) rounds, work
proportional to the ball size, not the graph; the induced-edge join
is two hash joins against the (typically small) ball. The reference
engine at /root/reference/src has no subgraph extraction; this
extends its API on the same edge table.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph.build import Graph
from linkgraph.checkpoint import release, sever
from linkgraph.frontier import edge_map
from linkgraph.session import conf_override


@dataclass
class EgoNetResult:
    vertices: DataFrame  # (id long, dist long)
    edges: DataFrame  # (src long, dst long) — induced, original direction
    wall_seconds: float


def ego_net(
    graph: Graph,
    seeds: list[int],
    radius: int = 2,
    direction: str = "both",
) -> EgoNetResult:
    if direction not in ("out", "in", "both"):
        raise ValueError(f"direction must be out|in|both, got {direction!r}")
    if radius < 0:
        raise ValueError("radius must be >= 0")
    spark = graph.edges.sparkSession
    t0 = time.time()
    avg_deg = graph.m / max(graph.n, 1)

    visited = sever(
        spark.createDataFrame(
            [(int(s), 0) for s in set(seeds)], "id long, dist long"
        )
    )
    frontier = visited.select("id")
    fcount = visited.count()
    with conf_override(spark, {"spark.sql.adaptive.enabled": "false"}):
        for hop in range(1, radius + 1):
            if fcount == 0:
                break
            parts = []
            if direction in ("out", "both"):
                parts.append(
                    edge_map(
                        graph,
                        frontier,
                        aggs=[F.count("*").alias("_m")],
                        volume=int(fcount * avg_deg),
                        exclude_dst=visited.select("id"),
                    ).select(F.col("dst").alias("id"))
                )
            if direction in ("in", "both"):
                parts.append(
                    edge_map(
                        graph,
                        frontier,
                        aggs=[F.count("*").alias("_m")],
                        reverse=True,
                        volume=int(fcount * avg_deg),
                        exclude_dst=visited.select("id"),
                    ).select(F.col("dst").alias("id"))
                )
            nxt_ids = parts[0] if len(parts) == 1 else parts[0].union(parts[1])
            obs = Observation(f"ego_hop_{hop}")
            nxt = sever(
                nxt_ids.distinct()
                .withColumn("dist", F.lit(hop).cast("long"))
                .observe(obs, F.count(F.lit(1)).alias("n"))
            )
            fcount = int(obs.get["n"] or 0)
            if fcount == 0:
                release(nxt)
                break
            new_visited = sever(visited.unionByName(nxt))
            release(visited)
            visited = new_visited
            frontier = nxt.select("id")

    ball = visited.select("id")
    induced = sever(
        graph.edges.join(
            ball.withColumnRenamed("id", "src").hint("shuffle_hash"), "src"
        )
        .join(ball.withColumnRenamed("id", "dst").hint("shuffle_hash"), "dst")
        .select("src", "dst")
    )
    return EgoNetResult(
        vertices=visited,
        edges=induced,
        wall_seconds=time.time() - t0,
    )
