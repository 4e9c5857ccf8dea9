"""Louvain community detection — modularity-ascent local moves plus
multilevel coarsening (Blondel, Guillaume, Lambiotte & Lefebvre 2008;
the parallel-synchronous move variant per Staudt & Meyerhenke's PLM,
TPDS'16). labelprop spreads labels by frequency; this kernel moves
each vertex to the neighboring community with the LARGEST modularity
gain, i.e. it optimizes the objective kernels/modularity.py measures.

`louvain_moves` is one local-move phase (what gains virtually all the
modularity); `louvain` is the full algorithm — move phase, contract
each community to a super-vertex (inter-community edge weights
summed, intra-community weight becoming the super-vertex self-loop),
repeat on the community graph until a level moves nothing.

Update rule, synchronous rounds over the symmetric weighted edge
frame (k_v = weighted degree INCLUDING the self-loop row's full
weight; M2 = Σ_rows w = 2m):

    candidate communities of v = {comm(u) : u ~ v, u != v} ∪ {comm(v)}
    score(v→c) = M2·k_{v,c} − k_v·(Σ_tot(c) − [comm(v)=c]·k_v)
    best = argmax score, ties → smaller community id
    new comm(v) = best iff score(best) > score(v→comm(v)), else stay
    (the sequential-Louvain strictly-positive-gain gate: equal-gain
    churn never moves anything)

which is the standard ΔQ(v→c) = k_{v,c}/m − k_v·Σ_tot(c∖v)/(2m²)
scaled by the positive constant 2m² — the argmax is identical, and
every term is EXACT int64 arithmetic (weights are edge
multiplicities), so the winner is engine- and partition-layout-
independent with no float tolerance anywhere (the repo-wide
determinism contract). Overflow bound: M2·k_{v,c} ≤ 2m·k_max needs
2m·k_max < 2^63 — safe to m ~ 10^12 edges with 10^6-degree hubs.
k_{v,c} sums edges from v to OTHER members of c (self-loop rows are
excluded from candidates but counted in k_v and Σ_tot — the textbook
treatment).

SCHEDULING (the part sequential Louvain gets for free): fully-
synchronous moves can oscillate — MEASURED on the bipartite sf0.01
cust→supp graph: schedule="all" moves ALL 1600 vertices EVERY round
forever (both sides swap in lockstep, the known parallel-Louvain
pathology), and schedule="parity" (vertices with id % 2 == r % 2
eligible on round r) still churns 550-770 of 1600 indefinitely —
parity is not a proper coloring, so adjacent same-parity vertices
keep invalidating each other's gains. The default
schedule="coloring" is the color-class batching of Lu, Halappanavar
& Kalyanaraman (Parallel Computing 2015): a proper coloring from the
MIS-layered coloring kernel partitions vertices into independent
sets; round r moves only color class r % n_colors, so no two
ADJACENT vertices ever move together and every accepted gain is
evaluated against its neighbors' settled communities. MEASURED:
cust→supp converges (a dense quasi-random bipartite graph correctly
collapses toward the no-structure answer), and a planted 4-block
partition graph is recovered exactly (4/4 pure blocks, Q = 0.674,
28 rounds, 9 colors — pinned in pytest). Not a termination PROOF
(color classes still interact through Σ_tot), so each phase runs at
most max_iter rounds, reports per-round move counts, and stops when
a full quiet color cycle (n_colors consecutive zero-move rounds)
certifies the fixpoint. The driver row pins schedule="parity" at a
FIXED round count — the unrolled oracle checks the exact integer
move arithmetic; the coloring composition and the multilevel
contraction are pinned by the pytest replay instead (their oracle
would otherwise embed the whole coloring oracle as a prefix).

Spark shape per round: ONE m-row join (edges ⋈ state on dst — the
labelprop scatter) + a (src, comm)-keyed partial+final SUM, two
small joins against the community-total and per-vertex tables, and a
max_by hash aggregate for the winner (no Window). The move count
rides the severing job's Observation — one job per round. The
contraction between levels is two aggregated label-tagging joins +
one (cs, cd)-keyed SUM — the community graph shrinks geometrically,
so upper levels are nearly free. Per the sever() narrow-diamond rule
(checkpoint.py), at every join at most one input path from the
checkpointed state is un-aggregated — `vstate` and the contraction
tag map are identity aggregates for exactly that reason.

`louvain_moves` has the uniform CheckpointManager lifecycle: (id,
comm) durable per round; resume continues from the last complete
round; a converged record short-circuits. The multilevel driver is
checkpointed per-phase through the same manager when one is given
(ckpt/<level>/ subdirectories).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph.build import Graph, symmetrize
from linkgraph.checkpoint import CheckpointManager, release, sever
from linkgraph.session import conf_override


@dataclass
class LouvainResult:
    df: DataFrame  # (id long, comm long)
    iterations: int
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)
    levels: int = 1
    n_communities: int | None = None


def _unit_sym(graph: Graph) -> DataFrame:
    """Level-0 weighted symmetric frame: unit weights, no self-loops."""
    return sever(
        symmetrize(graph.edges)
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst", F.lit(1).cast("long").alias("w"))
    )


def _move_phase(
    sym: DataFrame,
    vertices: DataFrame,
    max_iter: int,
    schedule: str,
    ckpt: CheckpointManager | None = None,
) -> LouvainResult:
    """One local-move phase over a symmetric weighted edge frame
    (src, dst, w) — self-loop rows allowed (their weight counts in
    k_v and Σ_tot, never as a move candidate). `vertices` is the
    (id)-schema universe; isolated ids keep their own community."""
    t0 = time.time()
    spark = sym.sparkSession
    colors = None
    if schedule == "coloring":
        from linkgraph.build import build_graph_from_edges
        from linkgraph.kernels.coloring import coloring

        # the coloring kernel wants an undirected self-loop-free graph;
        # gs derives its own vertex set so unpersisting it cannot touch
        # the caller's frames
        gs = build_graph_from_edges(
            sym.where(F.col("src") != F.col("dst")).select("src", "dst"),
            assume_deduped=True,
        )
        cres = coloring(gs)
        colors = sever(cres.df.select(F.col("id").alias("src"), "color"))
        gs.unpersist()
        if int(cres.colors_used) == 0:
            # no off-diagonal edges: every vertex already sits alone in
            # its own community, and `it % n_colors` below would divide
            # by zero. Return the identity state as a converged phase
            # (a self-loop-only contracted graph in _multilevel lands
            # here and triggers the caller's moves==0 break).
            release(colors)
            state = sever(vertices.select("id", F.col("id").alias("comm")))
            return LouvainResult(
                df=state,
                iterations=0,
                wall_seconds=time.time() - t0,
                metrics=[{"iteration": -1, "moves": 0, "converged": True,
                          "wall_s": 0.0}],
            )
        n_colors = max(1, int(cres.colors_used))
    else:
        n_colors = 2 if schedule == "parity" else 1
    # weighted degree: self-loop rows carry their full 2x contribution
    k = sym.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("k"))
    m2 = int(sym.agg(F.sum("w")).first()[0] or 0)  # Σ k_v = 2m

    state = None
    start_iter = 0
    if ckpt is not None:
        last = ckpt.last_complete()
        if last is not None:
            loaded, _, rec = ckpt.load(spark, last)
            state = sever(loaded)
            start_iter = last + 1
            if rec.get("converged"):
                if colors is not None:
                    release(colors)
                return LouvainResult(state, last + 1, 0.0, [rec])
    if state is None:
        state = sever(vertices.select("id", F.col("id").alias("comm")))

    prev_ckpt = state
    iterations = start_iter
    metrics: list[dict] = []
    with conf_override(spark, {"spark.sql.adaptive.enabled": "false"}):
        for it in range(start_iter, max_iter):
            it_t0 = time.time()
            # HARD-WON RULE (measured, see the sever() docstring and
            # tests/test_plans.py::test_sever_loop_stays_flat): at
            # every join, at most ONE input path from the checkpointed
            # state may be un-aggregated, else the localCheckpoint
            # compounds ~2.6× per round (0.4 s → 280 s by round 24 on
            # a 64-vertex graph). Here the single un-aggregated path
            # is `rest`'s anti-join probe; every other branch passes a
            # groupBy. The shared hash repartition is a plan choice
            # (one Exchange feeding all branches), not the fix.
            state_sh = state.repartition("id")
            tot = (
                state_sh.join(k, "id")
                .groupBy("comm")
                .agg(F.sum("k").alias("tot"))
                .select(F.col("comm").alias("ncomm"), "tot")
            )
            kvc = (
                sym.where(F.col("src") != F.col("dst"))
                .join(
                    state_sh.select(
                        F.col("id").alias("dst"), F.col("comm").alias("ncomm")
                    ),
                    "dst",
                )
                .groupBy("src", "ncomm")
                .agg(F.sum("w").alias("kvc"))
            )
            own = state_sh.select(
                F.col("id").alias("src"),
                F.col("comm").alias("ncomm"),
                F.lit(0).cast("long").alias("kvc"),
            )
            cand = (
                kvc.unionByName(own)
                .groupBy("src", "ncomm")
                .agg(F.max("kvc").alias("kvc"))
            )
            # only this round's batch is eligible to move — pruned
            # BEFORE any scoring work happens
            if schedule == "coloring":
                cand = cand.join(
                    F.broadcast(
                        colors.where(F.col("color") == F.lit(it % n_colors))
                        .select("src")
                    ),
                    "src",
                    "semi",
                )
            elif schedule == "parity":
                cand = cand.where(F.col("src") % 2 == F.lit(it % 2))
            # aggregated per-vertex (comm, k) view: the identity
            # groupBy is load-bearing — see the sever() narrow-diamond
            # rule; without it this is a second un-aggregated state
            # path meeting cand/tot in one join tree and the
            # localCheckpoint compounds geometrically
            vstate = (
                state_sh.join(k, "id")
                .groupBy(F.col("id").alias("src"))
                .agg(F.max("comm").alias("comm"), F.max("k").alias("k"))
            )
            scored = (
                cand.join(tot, "ncomm")
                .join(vstate, "src")
                .select(
                    "src",
                    "ncomm",
                    "comm",
                    (
                        F.lit(m2) * F.col("kvc")
                        - F.col("k")
                        * (
                            F.col("tot")
                            - F.when(
                                F.col("ncomm") == F.col("comm"), F.col("k")
                            ).otherwise(F.lit(0).cast("long"))
                        )
                    ).alias("score"),
                )
            )
            winners = (
                scored.groupBy("src")
                .agg(
                    F.max(
                        F.struct(
                            F.col("score"),
                            F.negate(F.col("ncomm")).alias("nc"),
                        )
                    ).alias("m"),
                    F.max(
                        F.when(
                            F.col("ncomm") == F.col("comm"), F.col("score")
                        )
                    ).alias("stay"),
                    F.max("comm").alias("_old"),  # constant per src
                )
                .select(
                    F.col("src").alias("id"),
                    F.when(
                        F.col("m.score") > F.col("stay"),
                        F.negate(F.col("m.nc")),
                    ).otherwise(F.col("_old")).alias("comm"),
                    "_old",
                )
            )
            # apply WITHOUT a narrow state reference (the sever()
            # narrow-diamond rule): decided rows ∪ everyone else via an
            # anti-join against the decided ids — the fallback covers
            # ineligible batches AND eligible vertices with no incident
            # edges, both of which keep their community
            rest = state_sh.join(
                winners.select("id"), "id", "left_anti"
            ).select("id", "comm", F.col("comm").alias("_old"))
            nxt = winners.unionByName(rest)
            obs = Observation("louvain_iter")
            new_state = sever(
                nxt.observe(
                    obs,
                    F.sum(
                        (F.col("comm") != F.col("_old")).cast("long")
                    ).alias("moves"),
                ).select("id", "comm")
            )
            moves = int(obs.get["moves"] or 0)
            release(prev_ckpt)
            prev_ckpt = new_state
            state = new_state
            iterations = it + 1
            # each batch is visited once per n_colors rounds, so the
            # fixpoint certificate is one quiet FULL color cycle
            tail = [m["moves"] for m in metrics[-(n_colors - 1):]] if n_colors > 1 else []
            converged = moves == 0 and len(tail) == n_colors - 1 and all(
                m == 0 for m in tail
            )
            rec = {
                "iteration": it,
                "moves": moves,
                "converged": converged,
                "wall_s": time.time() - it_t0,
            }
            metrics.append(rec)
            if ckpt is not None:
                ckpt.save(it, state, metrics=rec)
            if converged:
                break
    if colors is not None:
        release(colors)
    return LouvainResult(
        df=state,
        iterations=iterations,
        wall_seconds=time.time() - t0,
        metrics=metrics,
    )


def louvain_moves(
    graph: Graph,
    max_iter: int = 60,
    schedule: str = "coloring",
    ckpt: CheckpointManager | None = None,
) -> LouvainResult:
    """One local-move phase on the (unit-weight, symmetrized) graph."""
    if schedule not in ("coloring", "parity", "all"):
        raise ValueError(
            f"schedule must be 'coloring', 'parity' or 'all', got {schedule!r}"
        )
    sym = _unit_sym(graph)
    res = _move_phase(sym, graph.vertices, max_iter, schedule, ckpt=ckpt)
    release(sym)
    return res


def louvain(
    graph: Graph,
    max_levels: int = 10,
    max_iter: int = 60,
    schedule: str = "coloring",
    ckpt: CheckpointManager | None = None,
) -> LouvainResult:
    """Full multilevel Louvain: local moves, contract communities to
    super-vertices (inter-community weights summed; intra-community
    weight becomes the super-vertex self-loop), repeat on the
    community graph until a level moves nothing or max_levels.

    Returns the composed assignment over the ORIGINAL vertex ids;
    community labels are the top level's super-vertex ids (stable
    across runs — every stage is deterministic). metrics carries one
    entry per level with that phase's rounds/moves and the community
    count after contraction. With a CheckpointManager, each level's
    move phase checkpoints under <root>/level=<L>/ and a finished
    level's phase is not re-run on resume.
    """
    if schedule not in ("coloring", "parity", "all"):
        raise ValueError(
            f"schedule must be 'coloring', 'parity' or 'all', got {schedule!r}"
        )
    return _multilevel(
        _unit_sym(graph),
        graph.vertices.select("id"),
        max_levels,
        max_iter,
        schedule,
        ckpt,
    )


def louvain_weighted(
    edges: DataFrame,
    weight_col: str = "weight",
    max_levels: int = 10,
    max_iter: int = 60,
    schedule: str = "coloring",
    ckpt: CheckpointManager | None = None,
) -> LouvainResult:
    """Full multilevel Louvain over a WEIGHTED edge list (src, dst,
    <weight_col> long) — e.g. host_rollup's multiplicity-weighted host
    graph, where an edge's weight is how many hrefs connect the two
    hosts and modularity should weigh it accordingly.

    Directed weights are combined per unordered pair (w_uv + w_vu =
    the undirected weight, emitted in both directions); self-loop
    weights are DOUBLED into the single (v, v) row so their degree
    contribution follows the frame convention (k_v includes the row's
    full weight — the textbook 2w self-loop treatment). All weights
    must be integers: the exact-int64 gain arithmetic is the
    determinism contract. The weighted move math itself is
    driver-checked — the `louvain_ml` row's second level runs these
    exact expressions over a contracted weighted graph with
    self-loops; this wrapper is additionally pytest-pinned
    (unit-weight degeneration == louvain, heavy-bridge closed form,
    weighted parity replay).
    """
    if schedule not in ("coloring", "parity", "all"):
        raise ValueError(
            f"schedule must be 'coloring', 'parity' or 'all', got {schedule!r}"
        )
    e = edges.select(
        F.col("src").cast("long"),
        F.col("dst").cast("long"),
        F.col(weight_col).cast("long").alias("w"),
    )
    canon = (
        e.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            "w",
        )
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
    )
    und = canon.where(F.col("u") != F.col("v"))
    sym0 = sever(
        und.select(F.col("u").alias("src"), F.col("v").alias("dst"), "w")
        .unionByName(
            und.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w")
        )
        .unionByName(
            canon.where(F.col("u") == F.col("v")).select(
                F.col("u").alias("src"),
                F.col("v").alias("dst"),
                (F.col("w") * 2).alias("w"),
            )
        )
    )
    verts = (
        sym0.select(F.col("src").alias("id"))
        .union(sym0.select(F.col("dst").alias("id")))
        .distinct()
    )
    return _multilevel(sym0, verts, max_levels, max_iter, schedule, ckpt)


def _multilevel(
    sym: DataFrame,
    verts: DataFrame,
    max_levels: int,
    max_iter: int,
    schedule: str,
    ckpt: CheckpointManager | None,
) -> LouvainResult:
    t0 = time.time()
    mapping: DataFrame | None = None  # (id, comm) over original ids
    metrics: list[dict] = []
    iterations = 0
    n_comms = None
    for level in range(max_levels):
        lv_ckpt = None
        if ckpt is not None:
            lv_ckpt = CheckpointManager(
                f"{ckpt.root.rstrip('/')}/level={level}", ckpt.job
            )
        phase = _move_phase(sym, verts, max_iter, schedule, ckpt=lv_ckpt)
        iterations += phase.iterations
        total_moves = sum(m.get("moves", 0) for m in phase.metrics)
        if total_moves == 0 and level > 0:
            release(phase.df)
            break
        # compose the assignment down to original ids (level 0's
        # phase.df IS the mapping — do not release it below)
        phase_is_mapping = mapping is None
        if phase_is_mapping:
            mapping = phase.df
        else:
            new_map = sever(
                mapping.join(
                    phase.df.select(
                        F.col("id").alias("comm"),
                        F.col("comm").alias("_new"),
                    ),
                    "comm",
                ).select("id", F.col("_new").alias("comm"))
            )
            release(mapping)
            mapping = new_map
        # contract: aggregated tag map (identity groupBy — the sever()
        # narrow-diamond rule) used for BOTH endpoint taggings
        tag = phase.df.groupBy("id").agg(F.max("comm").alias("comm"))
        contracted = sever(
            sym.join(
                tag.select(F.col("id").alias("src"), F.col("comm").alias("cs")),
                "src",
            )
            .join(
                tag.select(F.col("id").alias("dst"), F.col("comm").alias("cd")),
                "dst",
            )
            .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
            .agg(F.sum("w").alias("w"))
        )
        release(sym)
        sym = contracted
        verts = mapping.select(F.col("comm").alias("id")).distinct()
        n_comms = verts.count()
        metrics.append(
            {
                "level": level,
                "rounds": phase.iterations,
                "moves": total_moves,
                "communities": n_comms,
                "converged": bool(
                    phase.metrics and phase.metrics[-1].get("converged")
                ),
            }
        )
        if not phase_is_mapping:
            release(phase.df)
        if total_moves == 0:
            break
    release(sym)
    if mapping is None:
        mapping = sever(verts.select("id", F.col("id").alias("comm")))
    return LouvainResult(
        df=mapping,
        iterations=iterations,
        wall_seconds=time.time() - t0,
        metrics=metrics,
        levels=len(metrics),
        n_communities=n_comms,
    )
