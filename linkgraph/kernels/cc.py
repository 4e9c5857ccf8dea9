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

Frontier representation (D9, node_set.rs:123-158): the frontier is a
BITMAP — a `changed` boolean column carried ON the state DataFrame and
materialized with it in the same localCheckpoint pass (the Spark
analogue of Ligra's dense `bool[n]` colocated with the per-vertex
state). The sparse view needed by edge_map is `state.where(changed)`,
a filter over the checkpointed state — never a separately materialized
or counted DataFrame. Checkpoints store only the state (the bitmap
rides along); resume re-derives the frontier by filtering.

Driver round-trips: ONE Spark job per round. The next frontier size is
an `Observation` aggregate riding the localCheckpoint materialization
job (the same pattern as pagerank.py:212-229) — no frontier.count()
loop-condition job, no recount at checkpoint save.

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

from pyspark.sql import DataFrame, Observation
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
    sym_graph = None
    if symmetrize_edges:
        graph = build_graph_from_edges(
            symmetrize(graph.edges), vertices=graph.vertices
        )
        sym_graph = graph  # internal cache; released before returning
    t0 = time.time()
    try:
        return _cc_loop(graph, max_iter, ckpt, t0)
    finally:
        if sym_graph is not None:
            # release the internal symmetrized edge/degree caches (the
            # vertices DF belongs to the caller's graph — leave it).
            # Results are severed (localCheckpoint), so this is safe.
            sym_graph.edges.unpersist()
            sym_graph.degrees.unpersist()


def _cc_loop(
    graph: Graph,
    max_iter: int,
    ckpt: CheckpointManager | None,
    t0: float,
) -> CCResult:

    state = None
    start_iter = 0
    fcount = 0
    if ckpt is not None:
        last = ckpt.last_complete()
        if last is not None:
            loaded_state, _, rec = ckpt.load(graph.edges.sparkSession, last)
            if "changed" not in loaded_state.columns:
                # pre-bitmap checkpoint layout (state without the
                # bitmap column): resume with a full frontier — a
                # superset frontier is safe for hash-min (monotone;
                # extra messages can't change the fixpoint), it only
                # re-does one round's worth of work.
                loaded_state = loaded_state.select(
                    "id", "comp", F.lit(True).alias("changed")
                )
                rec = {**rec, "frontier_size_next": graph.n}
            state = sever(loaded_state)  # (id, comp, changed) — bitmap rides along
            start_iter = last + 1
            fcount = int(rec.get("frontier_size_next") or 0)
            if fcount == 0:
                return CCResult(state.select("id", "comp"), last + 1, 0.0, [rec])
    if state is None:
        # ids[v] = v (algos.rs:88); round 0 frontier = full (algos.rs:113)
        # — encoded as changed=true on every row of the bitmap state, so
        # the full frontier costs no materialization of its own.
        state = sever(
            graph.vertices.select(
                "id", F.col("id").alias("comp"), F.lit(True).alias("changed")
            )
        )
        fcount = graph.n

    iterations = start_iter
    prev_ckpt = state
    metrics: list[dict] = []
    # AQE off in the loop (same rationale as pagerank.py)
    with conf_override(graph.edges.sparkSession, {"spark.sql.adaptive.enabled": "false"}):
      for it in range(start_iter, max_iter):
        it_t0 = time.time()
        if fcount == 0:
            break
        # frontier = the bitmap filter view over the checkpointed state
        frontier = state.where(F.col("changed")).select("id", "comp")
        # edge_map dispatch: push (broadcast) from a small frontier,
        # pull (dense SMJ) when |frontier| * avg_degree > m/20
        # (ligra.rs:82-87; estimate instead of the exact volume join —
        # fcount came free off last round's Observation, count*avg is
        # driver arithmetic)
        est_volume = int(fcount * (graph.m / max(graph.n, 1)))
        info: dict = {}
        msgs = edge_map(
            graph,
            frontier,
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
                (
                    F.coalesce(F.col("new_comp"), state["comp"]) < state["comp"]
                ).alias("changed"),
            )
        )
        # ONE job per round: the next frontier size rides the
        # checkpoint materialization as an Observation (pagerank
        # pattern) — no separate count job, no recount at save.
        obs = Observation("cc_iter")
        new_state = sever(
            new_state.observe(
                obs, F.sum(F.col("changed").cast("long")).alias("changed")
            )
        )
        next_count = int(obs.get["changed"] or 0)
        release(prev_ckpt)
        prev_ckpt = new_state
        rec = {
            "iteration": it,
            "frontier_size": fcount,
            "frontier_rep": "bitmap",
            "mode": info.get("mode"),
            "volume": info.get("volume"),
            "frontier_size_next": next_count,
            "wall_s": time.time() - it_t0,
        }
        state = new_state
        fcount = next_count
        iterations = it + 1
        metrics.append(rec)
        if ckpt is not None:
            ckpt.save(it, state, metrics=rec)
    return CCResult(
        df=state.select("id", "comp"),
        iterations=iterations,
        wall_seconds=time.time() - t0,
        metrics=metrics,
    )
