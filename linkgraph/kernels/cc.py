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
materialized with it in the same lineage-severing pass (the Spark
analogue of Ligra's dense `bool[n]` colocated with the per-vertex
state). The sparse view needed by edge_map is `state.where(changed)`,
a filter over the checkpointed state — never a separately materialized
or counted DataFrame. Checkpoints store only the state (the bitmap
rides along); resume re-derives the frontier by filtering.

EXECUTION (r6, guide §1/§2 — same rewrite as pagerank.py): while the
|E|/20 dispatch stays in the DENSE regime, rounds are CHAINED through
``localCheckpoint(eager=False)`` — each round's plan truncates to a
LogicalRDD leaf, the whole chain executes as ONE stage cascade, and
per-round changed-counts come back from a single union-aggregate
collect per chain. Convergence detection stays EXACT: the collect
yields every round's changed-count, the state at the first
zero-change round is returned, speculative rounds past it are
unpersisted. Sparse-push rounds (broadcast frontier) run one per
collect — the broadcast is a blocking point anyway — preserving the
dispatch test-pinned mode record. Dense rounds are exchange-free on
both joins (scatter co-partitioned with the src-bucketed edge cache,
apply co-partitioned gather output), leaving ONE message exchange per
round (plans/r06/cc_round_after.txt).

The symmetrized internal graph is built SLIM (r6): union+reversed
edges go through one repartition(src) + in-partition dropDuplicates
(hash(src) satisfies the (src,dst) dedup clustering — one exchange,
not distinct's agg exchange + repartition exchange), and the degree
table is NOT built — the loop's only degree use is the avg-degree
volume estimate, which needs m and n alone.

Direction dispatch (ligra.rs:58-88): rounds go through
frontier.edge_map, which applies the |E|/20 rule — a full/large
frontier takes the dense-pull form, a small frontier the sparse-push
form (broadcast join). On the symmetrized input the in-edge set equals
the out-edge set, so the pull direction scans the SAME cached table —
no transpose exchange (frontier.py module docstring). The chosen mode
is recorded per-iteration in metrics ('mode': 'dense-pull'|'sparse-push').
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.build import Graph
from linkgraph.checkpoint import CheckpointManager, release, sever
from linkgraph.frontier import edge_map
from linkgraph.session import conf_override


@dataclass
class CCResult:
    df: DataFrame  # (id long, comp long)
    iterations: int
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def _chain_target() -> int:
    return max(1, int(os.environ.get("LINKGRAPH_CC_CHAIN", "4")))


def connected_components(
    graph: Graph,
    symmetrize_edges: bool = True,
    max_iter: int = 1000,
    ckpt: CheckpointManager | None = None,
) -> CCResult:
    sym_edges = None
    t0 = time.time()
    if symmetrize_edges:
        # partition the symmetrized cache to the DATA (~64k rows per
        # partition, the pagerank.py r6 rule — per-task dispatch
        # dominates a defaultParallelism-wide tiny-task stage), never
        # wider than the source cache
        import math

        rows_per_part = int(
            os.environ.get("LINKGRAPH_PR_EDGE_ROWS_PER_PART", str(64 * 1024))
        )
        p = min(
            graph.edges.rdd.getNumPartitions(),
            max(4, math.ceil(2 * graph.m / max(rows_per_part, 1))),
        )
        rev = graph.edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
        # ONE exchange: hash(src) clusters every (src,dst) duplicate
        # pair, so the dedup aggregate runs in-partition and the cache
        # keeps the src-bucketed layout the round joins need.
        sym_edges = (
            graph.edges.unionAll(rev)
            .repartition(p, "src")
            .dropDuplicates()
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        m_sym = sym_edges.count()
        # slim internal handle: the loop never reads degrees (volume is
        # estimated from m/n), so reuse the caller's degree table
        # rather than building a symmetrized one.
        graph = Graph(
            vertices=graph.vertices,
            edges=sym_edges,
            degrees=graph.degrees,
            n=graph.n,
            m=m_sym,
        )
    try:
        return _cc_loop(graph, max_iter, ckpt, t0)
    finally:
        if sym_edges is not None:
            # release the internal symmetrized edge cache (results are
            # severed, so this is safe).
            sym_edges.unpersist()


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
    # align the state with the loop width in round 1's plan — a wider
    # init partitioning would win the round-1 join alignment and
    # re-exchange the message gather back up to it every round
    # (pagerank.py r6 rationale); skipped when already aligned
    p_loop = graph.edges.rdd.getNumPartitions()
    if state.rdd.getNumPartitions() != p_loop:
        state = state.repartition(p_loop, "id")

    iterations = start_iter
    metrics: list[dict] = []
    avg_deg = graph.m / max(graph.n, 1)
    # below this edge count a full dense scan of the cached edge table
    # is cheaper than the sparse path's per-round frontier broadcast,
    # and dense rounds have no blocking broadcast so whole chains
    # pipeline into one job (scc.py _dense_chain_edges rationale)
    force_dense = graph.m <= int(
        os.environ.get("LINKGRAPH_DENSE_CHAIN_EDGES", str(2_000_000))
    )
    # durable checkpoints save once per executed round — chain only
    # when no CheckpointManager is attached.
    chain_cap = 1 if ckpt is not None else _chain_target()
    # AQE off in the loop (same rationale as pagerank.py); shuffle
    # partitions pinned to the edge cache so the message exchange lands
    # co-partitioned with the state (pagerank.py loop_conf comment).
    loop_conf = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.shuffle.partitions": str(graph.edges.rdd.getNumPartitions()),
    }
    with conf_override(graph.edges.sparkSession, loop_conf):
      it = start_iter
      state_raw = state
      while it < max_iter and fcount > 0:
        blk_t0 = time.time()
        # edge_map dispatch for the WHOLE chain: push (broadcast) from a
        # small frontier, pull (dense) when |frontier| * avg_degree >
        # m/20 (ligra.rs:82-87; fcount came free off the last chain's
        # collect). Dense chains speculate that the frontier stays
        # dense; a mis-moded tail round costs one edge-cache scan, and
        # the chain resets to the exact rule at every collect.
        est_volume = int(fcount * avg_deg)
        dense = force_dense or est_volume > graph.threshold
        c = min(chain_cap, max_iter - it) if dense else 1
        states: list[DataFrame] = []
        modes: list[dict] = []
        cur = state
        for _j in range(c):
            frontier = cur.where(F.col("changed")).select("id", "comp")
            if dense:
                # SHUFFLE_HASH build on the frontier side: the edge
                # cache streams in place (both sides co-partitioned by
                # src in steady state — zero-exchange scatter).
                frontier = frontier.hint("shuffle_hash")
            info: dict = {}
            msgs = edge_map(
                graph,
                frontier,
                aggs=[F.min("comp").alias("new_comp")],
                volume=est_volume,
                dense=dense,
                info=info,
            )
            modes.append(info)
            nxt = (
                cur.join(
                    msgs.hint("shuffle_hash"), cur["id"] == msgs["dst"], "left"
                )
                .select(
                    cur["id"],
                    F.least(
                        cur["comp"], F.coalesce(F.col("new_comp"), cur["comp"])
                    ).alias("comp"),
                    (
                        F.coalesce(F.col("new_comp"), cur["comp"]) < cur["comp"]
                    ).alias("changed"),
                )
                .localCheckpoint(eager=False)
            )
            states.append(nxt)
            cur = nxt
        # ONE collect per chain: every round's changed-count (the next
        # frontier sizes), driving exact termination + the next chain's
        # dispatch.
        cnt_df = None
        for j in range(c):
            d = (
                states[j]
                .groupBy()
                .agg(F.sum(F.col("changed").cast("long")).alias("chg"))
                .select(F.lit(j).alias("j"), "chg")
            )
            cnt_df = d if cnt_df is None else cnt_df.unionAll(d)
        counts = {r["j"]: int(r["chg"] or 0) for r in cnt_df.collect()}
        # first zero-change round ends the loop (that round executed —
        # reference semantics: the frontier emptied after it).
        stop = next((j for j in range(c) if counts[j] == 0), None)
        last = stop if stop is not None else c - 1
        blk_wall = time.time() - blk_t0
        for j in range(last + 1):
            fnext = counts[j]
            rec = {
                "iteration": it + j,
                "frontier_size": fcount,
                "frontier_rep": "bitmap",
                "mode": modes[j].get("mode"),
                # per-round volume from the rolling frontier size (the
                # chain DISPATCHED on the chain-start estimate, but the
                # record reflects each round's actual input frontier)
                "volume": int(fcount * avg_deg),
                "frontier_size_next": fnext,
                "wall_s": blk_wall / (last + 1),
                "block_wall_s": blk_wall,
                "rounds_in_block": last + 1,
            }
            metrics.append(rec)
            fcount = fnext
        for j, sdf in enumerate(states):
            if j != last:
                release(sdf)
        release(state_raw)
        state_raw = states[last]
        state = states[last]
        it += last + 1
        iterations = it
        if ckpt is not None:
            ckpt.save(it - 1, state, metrics=metrics[-1])
    return CCResult(
        df=state.select("id", "comp"),
        iterations=iterations,
        wall_seconds=time.time() - t0,
        metrics=metrics,
    )
