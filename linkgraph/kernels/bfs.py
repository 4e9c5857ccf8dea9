"""BFS — frontier traversal producing levels + a parent tree.

Reference: /root/reference/src/algos.rs:124-167. The reference's
parent assignment is a CAS race (first writer wins, algos.rs:136-140);
we use F.min('src') — deterministic, still a valid BFS tree (SURVEY
§2.5(5)). Level sets are deterministic in both and are what parity
tests compare.

The unvisitedness check (parents[t] == usize::MAX, algos.rs:142-144)
becomes a left-anti join against the visited set — NULL-free by
construction, no sentinel values (SURVEY §1.2).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.build import Graph
from linkgraph.checkpoint import release, sever


@dataclass
class BFSResult:
    df: DataFrame  # (id long, level long, parent long) — reached vertices only
    iterations: int
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def bfs(graph: Graph, root: int, max_iter: int = 10_000) -> BFSResult:
    spark = graph.edges.sparkSession
    t0 = time.time()
    # parents[root] = root (algos.rs:158)
    visited = sever(
        spark.createDataFrame([(root, 0, root)], "id long, level long, parent long")
    )
    frontier = visited.select("id")
    iterations = 0
    metrics: list[dict] = []
    for level in range(1, max_iter + 1):
        fcount = frontier.count()
        if fcount == 0:
            break
        src_side = frontier.select(F.col("id").alias("src"))
        est_volume = fcount * (graph.m / max(graph.n, 1))
        if est_volume <= graph.threshold:
            src_side = F.broadcast(src_side)
        nxt = (
            graph.edges.join(src_side, "src")
            .join(visited.select(F.col("id").alias("dst")), "dst", "left_anti")
            .groupBy("dst")
            .agg(F.min("src").alias("parent"))
            .select(
                F.col("dst").alias("id"),
                F.lit(level).cast("long").alias("level"),
                "parent",
            )
        )
        prev = visited
        visited = sever(visited.union(nxt))
        release(prev)
        frontier = visited.where(F.col("level") == level).select("id")
        iterations = level
        metrics.append({"iteration": level, "frontier_size": fcount})
    return BFSResult(
        df=visited,
        iterations=iterations,
        wall_seconds=time.time() - t0,
        metrics=metrics,
    )
