"""HITS — Kleinberg's hubs & authorities (JACM'99) power iteration.

The classic web-link-analysis companion to PageRank (the reference
ships PageRank only — /root/reference/src/algos.rs:169 — HITS is part
of this engine's beyond-reference link-analysis coverage for the same
directed web graph). Semantics per round, from hub = auth = 1:

    auth'(v) = Σ_{u→v} hub(u)      then auth' /= ||auth'||₂
    hub'(u)  = Σ_{u→v} auth'(v)    then hub'  /= ||hub'||₂

(the standard two-phase update: the hub gather reads the round's
ALREADY-normalized authorities). Vertices with no in-edges get
auth 0; no out-edges, hub 0.

Spark shape per round (same skeleton as pagerank.py): two m-row
SHUFFLE_HASH-hinted joins against the src-laid-out edge cache — one
forward (combine on dst) and one over the free transpose (combine on
src) — each a partial+final SUM (the two-stage skew-safe gather), and
two IN-PLAN one-row L2-norm aggregates broadcast into the
normalization, so no driver-side scalar is ever collected mid-round.
The convergence diff (max |Δhub| + max |Δauth|) rides the round's
lineage-severing job as an Observation — one job per round, zero
extra passes. ANSI-safe: norms guard the division behind a
``nv > 0`` CASE (an edgeless graph converges to all-zeros instead of
throwing).
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
class HITSResult:
    df: DataFrame  # (id long, hub double, auth double)
    iterations: int
    converged: bool
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def _normalized(raw: DataFrame, base: DataFrame, key: str, out: str) -> DataFrame:
    """L2-normalize `raw`'s sums and left-join them onto `base` by id.

    raw  : (key, raw double) per-target gather sums
    base : state rows keyed by `id` (all vertices)
    The norm is an in-plan one-row aggregate broadcast into the
    projection — Spark runs it as a subquery stage, no driver scalar.
    """
    norm = raw.agg(
        F.coalesce(F.sqrt(F.sum(F.col("raw") * F.col("raw"))), F.lit(0.0)).alias("nv")
    )
    score = (
        F.when(
            F.col("nv") > 0,
            F.coalesce(F.col("raw"), F.lit(0.0)) / F.col("nv"),
        )
        .otherwise(F.lit(0.0))
        .alias(out)
    )
    keep = [base[c] for c in base.columns if c != out]
    return (
        base.join(raw.hint("shuffle_hash"), base["id"] == raw[key], "left")
        .crossJoin(F.broadcast(norm))
        .select(*keep, score)
    )


def hits(
    graph: Graph,
    tol: float = 1e-6,
    max_iter: int = 50,
    ckpt: CheckpointManager | None = None,
    ckpt_every: int = 5,
) -> HITSResult:
    """Runs until max(|Δhub|) + max(|Δauth|) < tol or max_iter rounds.

    With a CheckpointManager the (id, hub, auth) state is durable
    every `ckpt_every` rounds and on convergence; resume continues
    from the last complete round (same lifecycle as pagerank)."""
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
                return HITSResult(state, last + 1, True, 0.0, [rec])
    if state is None:
        state = sever(
            graph.vertices.select(
                "id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth")
            )
        )

    t0 = time.time()
    iterations = start_iter
    converged = False
    prev_ckpt = state
    metrics: list[dict] = []
    # Same loop conf as pagerank: fixed plan shapes (AQE's per-stage
    # re-plan costs driver latency each round), and shuffled-hash over
    # sort-merge — the edge cache is src-laid-out; SMJ would re-sort
    # the n-row state side on every join.
    loop_conf = {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.enabled": "false",
    }
    with conf_override(edges.sparkSession, loop_conf):
        for rnd in range(start_iter, max_iter):
            it_t0 = time.time()
            olds = state.select(
                "id",
                F.col("hub").alias("_oldhub"),
                F.col("auth").alias("_oldauth"),
            )
            # forward gather: auth sums keyed by dst
            a_raw = (
                edges.join(
                    state.select(F.col("id").alias("src"), "hub").hint(
                        "shuffle_hash"
                    ),
                    "src",
                )
                .groupBy("dst")
                .agg(F.sum("hub").alias("raw"))
            )
            s1 = _normalized(a_raw, olds, "dst", "auth")
            # transpose gather: hub sums keyed by src, reading the
            # round's already-normalized auth (two-phase update)
            h_raw = (
                edges.join(
                    s1.select(F.col("id").alias("dst"), "auth").hint(
                        "shuffle_hash"
                    ),
                    "dst",
                )
                .groupBy("src")
                .agg(F.sum("auth").alias("raw"))
            )
            s2 = _normalized(h_raw, s1, "src", "hub")
            obs = Observation("hits_iter")
            new_state = sever(
                s2.observe(
                    obs,
                    (
                        F.max(F.abs(F.col("hub") - F.col("_oldhub")))
                        + F.max(F.abs(F.col("auth") - F.col("_oldauth")))
                    ).alias("diff"),
                ).select("id", "hub", "auth")
            )
            diff = float(obs.get["diff"] or 0.0)
            release(prev_ckpt)
            prev_ckpt = new_state
            state = new_state
            iterations = rnd + 1
            converged = diff < tol
            rec = {
                "iteration": rnd,
                "diff": diff,
                "wall_s": time.time() - it_t0,
                "converged": converged,
            }
            metrics.append(rec)
            if ckpt is not None and (
                converged or (rnd + 1) % ckpt_every == 0
            ):
                ckpt.save(rnd, state, metrics=rec)
            if converged:
                break

    return HITSResult(
        df=state.select("id", "hub", "auth"),
        iterations=iterations,
        converged=converged,
        wall_seconds=time.time() - t0,
        metrics=metrics,
    )
