"""Connected components via hash-min label propagation.

Semantics pinned to the reference (/root/reference/src/algos.rs:48-122):
labels init to vertex id (algos.rs:88), each round every frontier
vertex pushes its label along out-edges, targets keep the minimum
(write_min CAS at algos.rs:93-107 -> F.min aggregation), and a vertex
enters the next frontier iff its label decreased this round. The loop
starts from a FULL frontier (algos.rs:113) and stops when the frontier
empties.

Directionality (SURVEY §2.5(4)): propagation is along out-edges only,
so on asymmetric inputs this computes min-over-ancestors, not weak CC.
`symmetrize=True` (default) unions the reversed edges first so the
result is true connected components; tests pin both behaviors.

Spark shape per round: the frontier rows already carry their NEW label
(they are exactly the rows that changed), so the message source is the
frontier DataFrame itself — no extra state join on the push side.

Direction dispatch (ligra.rs:58-88): rounds go through
frontier.edge_map, which applies the |E|/20 rule — a full/large
frontier takes the dense-pull form (SMJ over the src-bucketed edge
cache, no broadcast build), a small frontier the sparse-push form
(broadcast join). On the symmetrized input the in-edge set equals the
out-edge set, so the pull direction scans the SAME cached table — no
transpose exchange (frontier.py module docstring). The chosen mode is
recorded per-iteration in metrics ('mode': 'dense-pull'|'sparse-push').
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.build import Graph, build_graph_from_edges, symmetrize
from linkgraph.checkpoint import CheckpointManager, release, sever
from linkgraph.frontier import edge_map
from linkgraph.session import conf_override


@dataclass
class CCResult:
    df: DataFrame  # (id long, comp long)
    iterations: int
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def connected_components(
    graph: Graph,
    symmetrize_edges: bool = True,
    max_iter: int = 1000,
    ckpt: CheckpointManager | None = None,
) -> CCResult:
    if symmetrize_edges:
        graph = build_graph_from_edges(
            symmetrize(graph.edges), vertices=graph.vertices
        )
    t0 = time.time()

    state = None
    start_iter = 0
    frontier = None
    if ckpt is not None:
        last = ckpt.last_complete()
        if last is not None:
            loaded_state, loaded_frontier, rec = ckpt.load(
                graph.edges.sparkSession, last, with_frontier=True
            )
            state = sever(loaded_state)
            frontier = sever(loaded_frontier) if loaded_frontier is not None else None
            start_iter = last + 1
            if rec.get("frontier_size_next") == 0:
                return CCResult(state.select("id", "comp"), last + 1, 0.0, [rec])
    if state is None:
        # ids[v] = v (algos.rs:88); round 0 frontier = full (algos.rs:113)
        state = sever(graph.vertices.select("id", F.col("id").alias("comp")))
        frontier = state  # full frontier carries its labels

    iterations = start_iter
    prev_ckpt = state
    metrics: list[dict] = []
    # AQE off in the loop (same rationale as pagerank.py)
    with conf_override(graph.edges.sparkSession, {"spark.sql.adaptive.enabled": "false"}):
      for it in range(start_iter, max_iter):
        it_t0 = time.time()
        fcount = frontier.count()
        if fcount == 0:
            break
        # edge_map dispatch: push (broadcast) from a small frontier,
        # pull (dense SMJ) when |frontier| * avg_degree > m/20
        # (ligra.rs:82-87; estimate instead of the exact volume join —
        # the frontier carries changed labels, count*avg is free)
        est_volume = int(fcount * (graph.m / max(graph.n, 1)))
        info: dict = {}
        msgs = edge_map(
            graph,
            frontier.select("id", "comp"),
            aggs=[F.min("comp").alias("new_comp")],
            volume=est_volume,
            info=info,
        )
        new_state = (
            state.join(msgs, state["id"] == msgs["dst"], "left")
            .select(
                state["id"],
                F.least(
                    state["comp"], F.coalesce(F.col("new_comp"), state["comp"])
                ).alias("comp"),
                state["comp"].alias("_old"),
            )
        )
        new_state = sever(new_state)
        release(prev_ckpt)
        prev_ckpt = new_state
        frontier = new_state.where(F.col("comp") < F.col("_old")).select("id", "comp")
        state = new_state.drop("_old")
        iterations = it + 1
        rec = {
            "iteration": it,
            "frontier_size": fcount,
            "mode": info.get("mode"),
            "volume": info.get("volume"),
            "wall_s": time.time() - it_t0,
        }
        metrics.append(rec)
        if ckpt is not None:
            ckpt.save(it, state, frontier=frontier, metrics={**rec, "frontier_size_next": frontier.count()})
    return CCResult(
        df=state.select("id", "comp"),
        iterations=iterations,
        wall_seconds=time.time() - t0,
        metrics=metrics,
    )
