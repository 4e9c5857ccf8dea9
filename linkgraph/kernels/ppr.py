"""Personalized PageRank — power iteration with a source-restricted
teleport vector (random walk with restart).

The reference ships global PageRank only (/root/reference/src/
algos.rs:169); PPR is beyond-reference link-analysis coverage — the
standard seeded-relevance ranking for web graphs. Semantics, for a
seed set S with base(v) = 1/|S| on S else 0:

    rank'(v) = (1-d)·base(v) + d·( Σ_{u→v} rank(u)/out_deg(u)
                                   + dangling_mass·base(v) )

from rank = base, until max_v |Δrank| < tol. Dangling mass teleports
back to the SEEDS (not uniformly) — the conventional RWR form; with
S = V this degenerates to exactly pagerank.py's recurrence.

Spark shape per round — the same skeleton as pagerank.py (one m-row
SHUFFLE_HASH scatter join, one partial+final SUM gather, one apply
join back onto the skeleton) with one difference: the teleport is a
per-vertex `base` COLUMN carried on the state (joined in once at
init), not a scalar literal, so the loop plan stays byte-identical
across iterations (Janino cache) with no per-round driver scalar —
the dangling mass rides the convergence Observation exactly as in
pagerank.py.
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
class PPRResult:
    df: DataFrame  # (id long, rank double)
    iterations: int
    converged: bool
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def ppr(
    graph: Graph,
    sources: list[int],
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    ckpt: CheckpointManager | None = None,
    ckpt_every: int = 5,
) -> PPRResult:
    if not sources:
        raise ValueError("ppr needs a non-empty seed set")
    edges = graph.edges
    spark = edges.sparkSession
    base_val = 1.0 / len(sources)

    start_iter = 0
    state = None
    if ckpt is not None:
        last = ckpt.last_complete()
        if last is not None:
            loaded, _, rec = ckpt.load(spark, last)
            state = sever(loaded)
            start_iter = last + 1
            if rec.get("converged"):
                return PPRResult(
                    state.select("id", "rank"), last + 1, True, 0.0, [rec]
                )
    if state is None:
        # seed indicator joined in ONCE; the loop never touches it again
        seeds = F.broadcast(
            spark.createDataFrame([(int(s),) for s in sources], "id long")
            .distinct()
            .withColumn("base", F.lit(base_val))
        )
        state = sever(
            graph.degrees.join(seeds, "id", "left")
            .select(
                "id",
                "out_deg",
                F.coalesce(F.col("base"), F.lit(0.0)).alias("base"),
                F.coalesce(F.col("base"), F.lit(0.0)).alias("rank"),
            )
        )

    t0 = time.time()
    # dangling mass of the CURRENT state; refreshed by the round's
    # Observation so the loop does exactly one collect per round
    dm = (
        state.where(F.col("out_deg") == 0).agg(F.sum("rank")).first()[0] or 0.0
    )

    iterations = start_iter
    converged = False
    prev_ckpt = state
    metrics: list[dict] = []
    loop_conf = {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.enabled": "false",
    }
    with conf_override(spark, loop_conf):
        for rnd in range(start_iter, max_iter):
            it_t0 = time.time()
            # dangling mass as a broadcast 1-row column (byte-identical
            # plans across rounds, same rationale as pagerank.py)
            dm_df = spark.createDataFrame([(float(dm),)], "dm_val double")
            contribs = edges.join(
                state.where(F.col("out_deg") > 0)
                .select(
                    F.col("id").alias("src"),
                    (F.col("rank") / F.col("out_deg")).alias("w"),
                )
                .hint("shuffle_hash"),
                "src",
            )
            gathered = contribs.groupBy("dst").agg(F.sum("w").alias("gathered"))
            nxt = (
                state.join(
                    gathered.hint("shuffle_hash"),
                    state["id"] == gathered["dst"],
                    "left",
                )
                .crossJoin(F.broadcast(dm_df))
                .select(
                    state["id"],
                    state["out_deg"],
                    state["base"],
                    (
                        F.lit(1.0 - damping) * F.col("base")
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("gathered"), F.lit(0.0))
                            + F.col("dm_val") * F.col("base")
                        )
                    ).alias("rank"),
                    state["rank"].alias("_old"),
                )
            )
            obs = Observation("ppr_iter")
            new_state = sever(
                nxt.observe(
                    obs,
                    F.max(F.abs(F.col("rank") - F.col("_old"))).alias("diff"),
                    F.sum(
                        F.when(F.col("out_deg") == 0, F.col("rank")).otherwise(
                            F.lit(0.0)
                        )
                    ).alias("dm"),
                ).drop("_old")
            )
            got = obs.get
            diff = float(got["diff"] or 0.0)
            dm = float(got["dm"] or 0.0)
            release(prev_ckpt)
            prev_ckpt = new_state
            state = new_state
            iterations = rnd + 1
            converged = diff < tol
            rec = {
                "iteration": rnd,
                "diff": diff,
                "dangling_mass": dm,
                "wall_s": time.time() - it_t0,
                "converged": converged,
            }
            metrics.append(rec)
            if ckpt is not None and (converged or (rnd + 1) % ckpt_every == 0):
                ckpt.save(rnd, state, metrics=rec)
            if converged:
                break

    return PPRResult(
        df=state.select("id", "rank"),
        iterations=iterations,
        converged=converged,
        wall_seconds=time.time() - t0,
        metrics=metrics,
    )
