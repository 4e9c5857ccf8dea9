"""PageRank — power iteration with dangling-mass redistribution.

This is the north-rule metric kernel (BASELINE.json:2,6): standard
PageRank, NOT the reference's PR-delta variant (that one is
reproduced faithfully in pagerank_delta.py for parity). Semantics:

    rank'(v) = (1-d)/n + d * ( Σ_{u→v} rank(u)/out_deg(u)
                               + dangling_mass/n )
    dangling_mass = Σ_{out_deg(u)=0} rank(u)

iterated from rank = 1/n until max_v |rank'(v) - rank(v)| < tol.

Spark shape per iteration (SURVEY §2.3): one equi-join
edges ⋈ state on src, one partial+final SUM aggregation on dst
(this IS the two-stage skew-safe gather — Spark's map-side partial
hash-agg bounds any hub dst to ≤ #partitions rows into the final
agg; an additional explicit salting stage is available via `salt`
for clusters whose partial-agg memory is the bottleneck, SURVEY
§4.4), one left join back onto the vertex skeleton, and a single
driver-side scalar agg that returns BOTH the convergence diff and
the next iteration's dangling mass in one pass. Lineage is severed
every round (localCheckpoint) — SURVEY hard-part #1.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph.build import Graph
from linkgraph.checkpoint import CheckpointManager, release, sever
from linkgraph.session import conf_override


@dataclass
class PageRankResult:
    df: DataFrame  # (id long, rank double)
    iterations: int
    converged: bool
    edges_processed: int  # iterations * m — numerator of the metric
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)

    @property
    def edges_per_second(self) -> float:
        return self.edges_processed / self.wall_seconds if self.wall_seconds else 0.0


def pagerank(
    graph: Graph,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 200,
    salt: int | None = None,
    ckpt: CheckpointManager | None = None,
    ckpt_every: int = 5,
    adaptive: bool = False,
    check_every: int = 1,
    init_ranks: DataFrame | None = None,
) -> PageRankResult:
    """check_every=K chains K power-iteration rounds into ONE Spark job:
    the dangling mass enters each chained round as an IN-PLAN broadcast
    scalar aggregate (a one-row agg of the round's input state) instead
    of a driver-collected literal, so no driver round-trip happens
    inside a block; convergence is checked (and lineage severed) only
    at block boundaries. Ranks after N executed iterations are
    IDENTICAL to check_every=1 (same recurrence, pinned by pytest
    parity at atol 1e-15); convergence may be detected up to K-1
    iterations late.

    MEASURED trade-off (sf0.1 graph, 16 fixed iters, local[32], warm):
    K=1 9.9 s, K=2 9.1 s, K=4 31.8 s, K=8 234 s. K=2 buys ~8% by
    halving Observation collects; K>2 LOSES exponentially because
    Catalyst logical plans are TREES, not DAGs — inside a block each
    round's output is referenced by three consumers (next scatter,
    next apply, next dm agg), so every reference clones the whole
    subtree through analysis/optimization/codegen: ~3^K driver-side
    plan work that no executor-side persist can amortize (persisting
    intermediates was measured to not help — the cost is planning, not
    recompute). Default stays 1; 2 is the only other sensible value,
    on clusters where the per-job driver barrier is the bottleneck."""
    n = graph.n
    edges = graph.edges

    start_iter = 0
    state = None
    if ckpt is not None:
        last = ckpt.last_complete()
        if last is not None:
            loaded, _, rec = ckpt.load(edges.sparkSession, last)
            state = sever(loaded)
            start_iter = last + 1
            if rec.get("converged"):
                df = state.select("id", "rank")
                return PageRankResult(df, last + 1, True, 0, 0.0, [rec])
    if state is None:
        # state skeleton: (id, out_deg, rank); out_deg joined in once so
        # the hot loop never touches the degrees table again.
        #
        # init_ranks (id, rank) warm-starts the iteration — the
        # incremental-crawl companion to build.update_graph: surviving
        # urls keep their ids, so a previous run's converged scores are
        # directly joinable and power iteration converges from them in
        # a handful of rounds instead of from uniform (the fixpoint is
        # unique for damping < 1, so warm == cold at convergence —
        # pinned by pytest). Vertices absent from init_ranks (novel
        # pages) start at 1/n; the vector is NOT renormalized — power
        # iteration's dangling handling restores ||r||1 = 1 within the
        # first rounds and renormalizing would perturb the surviving
        # scores' relative values for no faster convergence.
        if init_ranks is not None:
            state = sever(
                graph.degrees.join(
                    init_ranks.select("id", F.col("rank").alias("_ir")),
                    "id",
                    "left",
                ).select(
                    "id",
                    "out_deg",
                    F.coalesce("_ir", F.lit(1.0 / n)).alias("rank"),
                )
            )
        else:
            state = sever(
                graph.degrees.select(
                    "id", "out_deg", (F.lit(1.0) / n).alias("rank")
                )
            )

    t0 = time.time()
    check_every = max(1, check_every)
    # dangling mass of the CURRENT state; refreshed by the per-iteration
    # stats pass so the loop does exactly one collect per round. With
    # chained blocks (check_every > 1) the mass is computed in-plan
    # instead — no driver-side scalar is ever needed.
    dm = 0.0
    if check_every == 1:
        dm = state.where(F.col("out_deg") == 0).agg(F.sum("rank")).first()[0] or 0.0

    iterations = 0
    converged = False
    prev_ckpt = state  # the severed DF whose blocks we free next round
    metrics: list[dict] = []
    # AQE off inside the loop: fixed plan shapes, and AQE's per-stage
    # re-planning costs ~0.3-0.7s driver latency per iteration
    # (measured 25-35% of iteration wall on rMAT-20). Skew in the
    # gather is already handled by partial+final aggregation.
    # Shuffled-hash join instead of sort-merge: the edge cache is
    # already laid out by src, but SMJ re-sorts the n-row state side
    # on BOTH per-iteration joins (scatter on src, apply on id) —
    # 2 × n log(n/P) of pure overhead per round. SHJ builds a small
    # per-partition hash table on the state/gathered side (n/P rows)
    # and streams the edges — no sorts at all.
    loop_conf = {"spark.sql.join.preferSortMergeJoin": "false"}
    if not adaptive:
        loop_conf["spark.sql.adaptive.enabled"] = "false"
    def one_round(cur: DataFrame, dm_df: DataFrame) -> DataFrame:
        # SHUFFLE_HASH hint: checkpointed state is a LogicalRDD with
        # unknown stats, so the planner's size check would fall back to
        # SMJ; the hint forces the hash build on the n-row side (n/P
        # rows per task — trivially in-memory) and streams the cached
        # edge partitions with no sort.
        contribs = edges.join(
            cur.where(F.col("out_deg") > 0)
            .select(
                F.col("id").alias("src"),
                (F.col("rank") / F.col("out_deg")).alias("w"),
            )
            .hint("shuffle_hash"),
            "src",
        )
        if salt:
            gathered = (
                contribs.groupBy("dst", F.pmod(F.col("src"), F.lit(salt)).alias("_s"))
                .agg(F.sum("w").alias("pw"))
                .groupBy("dst")
                .agg(F.sum("pw").alias("gathered"))
            )
        else:
            gathered = contribs.groupBy("dst").agg(F.sum("w").alias("gathered"))
        return (
            cur.join(gathered.hint("shuffle_hash"), cur["id"] == gathered["dst"], "left")
            .crossJoin(F.broadcast(dm_df))
            .select(
                cur["id"],
                cur["out_deg"],
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("gathered"), F.lit(0.0)) + F.col("dm_val") / n)
                ).alias("rank"),
                cur["rank"].alias("_old"),
            )
        )

    with conf_override(edges.sparkSession, loop_conf):
      it = start_iter
      while it < max_iter:
        it_t0 = time.time()
        k = min(check_every, max_iter - it)
        cur = state
        for _j in range(k):
            if check_every == 1:
                # The per-iteration dangling mass enters as a BROADCAST
                # ONE-ROW COLUMN, not as F.lit(dm/n): a changing literal
                # makes every iteration's plan (and generated code)
                # unique, defeating the Janino code cache and forcing
                # fresh JIT per round. Keeping the plan byte-identical
                # across iterations costs one 1-row broadcast. (This
                # removes recompilation overhead; the 2-4x sporadic CPU
                # inflation on identical stages in BENCH/BASELINE.md
                # survived it — host-level interference, see the bench
                # methodology.)
                dm_df = edges.sparkSession.createDataFrame(
                    [(float(dm),)], "dm_val double"
                )
            else:
                # In-plan dangling mass: one-row aggregate of the
                # round's input state, broadcast into the apply join —
                # the chained rounds need no driver scalar at all.
                dm_df = cur.where(F.col("out_deg") == 0).agg(
                    F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm_val")
                )
            nxt = one_round(cur, dm_df)
            cur = nxt.drop("_old")
        new_state = nxt
        # Lineage MUST be cut every round: `state` feeds both the
        # scatter join and the apply join, so the logical plan DOUBLES
        # per iteration — persist() caches execution but Catalyst still
        # re-analyzes the exponentially growing tree (measured: 0.9s ->
        # 72s/iter by round 7 without this). localCheckpoint is the
        # plan-truncation API; its cost is one n-row pass, small next
        # to the m-row scatter shuffle at scale (SURVEY hard-part #1).
        #
        # Convergence diff + next dangling mass ride along as observed
        # metrics on the SAME job that materializes the checkpoint —
        # zero extra passes, zero extra job-scheduling round-trips per
        # iteration (the reference's atomic global, as an Observation).
        # fixed name: the observation name is part of the plan; keep
        # every iteration's plan (and thus codegen source) identical
        obs = Observation("pr_iter")
        new_state = sever(
            new_state.observe(
                obs,
                F.max(F.abs(F.col("rank") - F.col("_old"))).alias("diff"),
                F.sum(
                    F.when(F.col("out_deg") == 0, F.col("rank")).otherwise(F.lit(0.0))
                ).alias("dm"),
            )
        )
        got = obs.get
        diff, dm_next = got["diff"], got["dm"]
        dm = dm_next or 0.0
        release(prev_ckpt)  # free last round's checkpoint blocks NOW
        prev_ckpt = new_state
        state = new_state.drop("_old")
        it += k
        iterations = it
        converged = diff < tol
        rec = {
            "iteration": it - 1,
            "iterations_in_block": k,
            "diff": diff,
            "dangling_mass": dm,
            "edges_processed": graph.m * k,
            "wall_s": time.time() - it_t0,
            "converged": converged,
        }
        metrics.append(rec)
        if ckpt is not None and (
            converged or (it % ckpt_every) < k and it >= ckpt_every
        ):
            # partition_counts opted in: pagerank saves every
            # ckpt_every=5 rounds, so the extra per-save job is cheap
            # relative to the sidecar detail it buys
            ckpt.save(it - 1, state, metrics=rec, partition_counts=True)
        if converged:
            break

    wall = time.time() - t0
    return PageRankResult(
        df=state.select("id", "rank"),
        iterations=iterations,
        converged=converged,
        edges_processed=(iterations - start_iter) * graph.m,
        wall_seconds=wall,
        metrics=metrics,
    )
