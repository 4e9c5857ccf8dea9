"""Pseudo-diameter by double sweep (Magnien, Latapy & Habib JEA'09;
the standard BFS lower bound — igraph/NetworKit ship the same move):
BFS from a start vertex, hop to the farthest vertex found (max level,
ties to the smallest id), BFS again; the final eccentricity is a lower
bound on the true diameter that is exact on trees and near-exact on
real web graphs. Complements the estimators already here: anf_sketch
gives the FM-sketch effective diameter, graph_radii samples
eccentricities; this is the deterministic two-BFS bound.

Composition over the existing BFS kernel — delta frontiers, anti-join
visitedness, |E|/20 push/pull dispatch all inherited; per sweep the
only driver-side state is ONE row (the farthest vertex). Scale shape
is exactly two (or `sweeps`) BFS runs.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.build import Graph, build_graph_from_edges, symmetrize
from linkgraph.kernels.bfs import bfs


@dataclass
class PseudoDiameterResult:
    df: DataFrame  # (sweep, source, farthest, ecc) — one row per sweep
    pseudo_diameter: int  # max ecc over sweeps (the reported bound)
    sweeps: int
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def pseudo_diameter(
    graph: Graph,
    start: int | None = None,
    sweeps: int = 2,
    symmetric: bool = True,
    max_iter: int = 10_000,
    validate_start: bool = True,
) -> PseudoDiameterResult:
    """Double-sweep pseudo-diameter.

    start: first BFS source; default = the smallest vertex id (a
      deterministic choice both engines reproduce). The classic
      refinement (start from a max-degree vertex) changes only the
      constant, not the bound's guarantee.
    sweeps: number of BFS sweeps (2 = the textbook double sweep; more
      sweeps monotonically tighten the bound, each hop restarting from
      the previous sweep's farthest vertex).
    symmetric: treat edges as undirected (symmetrize once, build a
      working graph) — the usual diameter convention; False measures
      directed eccentricities.

    Eccentricities are over the REACHED set (on a disconnected graph
    this is the start vertex's component — the giant one when start
    is chosen inside it).
    """
    if sweeps < 1:
        raise ValueError("sweeps must be >= 1")
    spark = graph.edges.sparkSession
    t0 = time.time()
    work = (
        build_graph_from_edges(
            symmetrize(graph.edges),
            vertices=graph.vertices.select("id"),
            assume_deduped=True,
        )
        if symmetric
        else graph
    )
    try:
        if start is None:
            min_id = work.vertices.agg(F.min("id")).collect()[0][0]
            if min_id is None:
                raise ValueError(
                    "pseudo_diameter: graph has no vertices"
                )
            start = int(min_id)
        elif validate_start and work.vertices.where(
            F.col("id") == F.lit(int(start))
        ).limit(1).count() == 0:
            # r6 (ADVICE): one extra Spark job per call, only when an
            # explicit start is given; hot callers that already know
            # the start is a vertex pass validate_start=False (a BFS
            # from a non-vertex would silently report ecc 0, so the
            # guard stays ON by default).
            raise ValueError(
                f"pseudo_diameter: start id {start} is not a vertex"
            )
        rows: list[tuple[int, int, int, int]] = []
        metrics: list[dict] = []
        cur = start
        best = 0
        for s in range(sweeps):
            res = bfs(work, cur, max_iter=max_iter)
            far = (
                res.df.orderBy(F.desc("level"), F.asc("id"))
                .select("id", "level")
                .limit(1)
                .collect()[0]
            )
            rows.append((s, cur, int(far["id"]), int(far["level"])))
            metrics.append(
                {
                    "sweep": s,
                    "source": cur,
                    "farthest": int(far["id"]),
                    "ecc": int(far["level"]),
                    "bfs_iterations": res.iterations,
                }
            )
            best = max(best, int(far["level"]))
            cur = int(far["id"])
    finally:
        if symmetric:
            work.unpersist()
    out = spark.createDataFrame(
        rows, "sweep long, source long, farthest long, ecc long"
    )
    return PseudoDiameterResult(out, best, sweeps, time.time() - t0, metrics)
