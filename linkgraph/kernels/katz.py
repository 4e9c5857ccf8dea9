"""Katz centrality (Katz 1953; Newman "Networks" §7.2) — the classic
attenuated-path centrality that predates and complements PageRank:

    x'(v) = beta + alpha * Σ_{u→v} x(u)        from x0 = beta

so after t rounds x(v) = beta * Σ_{l<=t} alpha^l * (#paths of length l
ending at v), and the fixpoint is beta * (I - alpha*Aᵀ)⁻¹ 1. Unlike
PageRank there is no degree normalization: a prolific linker passes
its full (attenuated) weight along EVERY out-edge, which is the right
model when an edge is an endorsement whose value doesn't dilute (the
reference ships PageRank only — /root/reference/src/algos.rs:169 —
Katz is beyond-reference link-analysis coverage like hits/salsa).

Convergence requires alpha < 1/lambda_max(A). The kernel cannot know
the spectral radius, so the contract is the textbook one: the caller
picks alpha (default 0.05, safe for sparse web-ish graphs); if the
iteration diverges the diff Observation grows monotonically and the
max_iter cap stops the loop with converged=False — loud, not wrong.

Spark shape per round — pagerank.py's audited skeleton minus the
teleport/dangling scalars (Katz has neither): ONE m-row SHUFFLE_HASH
join (src-laid-out edge cache ⋈ state on src), ONE partial+final SUM
on dst (two-stage skew-safe gather), one left join back onto the
vertex skeleton, and the convergence diff riding the severing job's
Observation. Plans are byte-identical across rounds (alpha/beta are
literals), so Janino compiles once. Uniform CheckpointManager
lifecycle: (id, katz) durable every ckpt_every rounds and on
convergence; resume continues from the last complete round.
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
class KatzResult:
    df: DataFrame  # (id long, katz double)
    iterations: int
    converged: bool
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def katz(
    graph: Graph,
    alpha: float = 0.05,
    beta: float = 1.0,
    tol: float = 1e-6,
    max_iter: int = 100,
    ckpt: CheckpointManager | None = None,
    ckpt_every: int = 5,
) -> KatzResult:
    """Runs x' = beta + alpha * Aᵀ x until max|Δx| < tol or max_iter."""
    if alpha <= 0 or beta <= 0:
        raise ValueError("katz needs alpha > 0 and beta > 0")
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
                return KatzResult(state, last + 1, True, 0.0, [rec])
    if state is None:
        state = sever(
            graph.vertices.select("id", F.lit(float(beta)).alias("katz"))
        )

    t0 = time.time()
    iterations = start_iter
    converged = False
    prev_ckpt = state
    metrics: list[dict] = []
    loop_conf = {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.enabled": "false",
    }
    with conf_override(edges.sparkSession, loop_conf):
        for rnd in range(start_iter, max_iter):
            it_t0 = time.time()
            gathered = (
                edges.join(
                    state.select(F.col("id").alias("src"), "katz").hint(
                        "shuffle_hash"
                    ),
                    "src",
                )
                .groupBy("dst")
                .agg(F.sum("katz").alias("gathered"))
            )
            nxt = (
                state.select("id", F.col("katz").alias("_old"))
                .join(
                    gathered.hint("shuffle_hash"),
                    F.col("id") == F.col("dst"),
                    "left",
                )
                .select(
                    "id",
                    (
                        F.lit(float(beta))
                        + F.lit(float(alpha))
                        * F.coalesce("gathered", F.lit(0.0))
                    ).alias("katz"),
                    "_old",
                )
            )
            obs = Observation("katz_iter")
            new_state = sever(
                nxt.observe(
                    obs,
                    F.max(F.abs(F.col("katz") - F.col("_old"))).alias("diff"),
                ).select("id", "katz")
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
            if ckpt is not None and (converged or (rnd + 1) % ckpt_every == 0):
                ckpt.save(rnd, state, metrics=rec)
            if converged:
                break

    return KatzResult(
        df=state.select("id", "katz"),
        iterations=iterations,
        converged=converged,
        wall_seconds=time.time() - t0,
        metrics=metrics,
    )
