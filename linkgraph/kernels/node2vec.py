"""Deterministic node2vec biased walks (Grover & Leskovec KDD'16) —
the second-order companion to kernels/walks.py. Where random_walks
picks each successor by hash-argmin (uniform / DeepWalk), node2vec
biases the choice by where the walk CAME from: from edge (prev →
cur), candidate dst gets the unnormalized weight

    alpha_return   if dst == prev            (node2vec's 1/p)
    alpha_common   if edge (prev, dst) exists (distance 1: triangle)
    alpha_forward  otherwise                  (node2vec's 1/q)

Weights are INTEGERS so the draw is exact modular arithmetic, not
floats: per (walk, step) one hash draw r = mix(start, walk, step,
seed) % Σw picks the candidate whose cumulative-weight interval
contains r (candidates ordered by dst ASC). Deterministic and
engine-portable by construction — the oracle replays the identical
cumsum + modulo in SQL, and re-running a 100 TB corpus job
reproduces the corpus bit-for-bit.

Initialization sets prev = start, which makes step 1 uniform
automatically: every out-neighbor of the start IS at distance 1 from
prev, so all candidates share alpha_common.

Spark shape per step: one |active|-row join shuffled on the current
vertex (the scatter every kernel uses), one (prev, dst)-keyed
LEFT JOIN against the edge table for the distance-1 test, and ONE
window over (start, walk) ordered by dst for the cumulative draw.
The window partition is bounded by deg(cur) — on hub-heavy graphs
pass max_neighbors to pre-prune candidates to the hash-smallest N
(the neighbor_sample move: the sample, not the degree, then bounds
the partition). Each step's positions are lineage-severed; the
corpus is the union of severed per-step deltas (walks.py pattern).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from linkgraph.build import Graph
from linkgraph.checkpoint import sever
from linkgraph.kernels.walks import MIX_PRIME, mix_expr
from linkgraph.session import conf_override


@dataclass
class Node2VecResult:
    df: DataFrame  # (start long, walk long, step long, vertex long)
    steps: int
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def _step(pos, edges, pe, t, seed, alphas, max_neighbors):
    """One biased step: scatter join, distance-1 join, cumulative
    draw. Exposed for the plan-shape test (the loop uses it
    verbatim)."""
    alpha_return, alpha_common, alpha_forward = alphas
    w_spec = Window.partitionBy("start", "walk").orderBy("dst")
    w_all = Window.partitionBy("start", "walk")
    cand = pos.join(
        edges.hint("shuffle_hash"), pos["vertex"] == edges["src"]
    ).select("start", "walk", "prev", "vertex", "dst")
    if max_neighbors is not None:
        rank = F.row_number().over(
            Window.partitionBy("start", "walk").orderBy(
                mix_expr(
                    F.col("start"), F.col("walk"), F.lit(t).cast("long"),
                    F.col("dst"), seed,
                ),
                "dst",
            )
        )
        cand = cand.withColumn("nrk", rank).where(
            F.col("nrk") <= max_neighbors
        ).drop("nrk")
    cand = cand.join(
        pe.hint("shuffle_hash"),
        (cand["prev"] == pe["p_src"]) & (cand["dst"] == pe["p_dst"]),
        "left",
    ).select(
        "start", "walk", "prev", "vertex", "dst",
        F.when(F.col("dst") == F.col("prev"), F.lit(alpha_return))
        .when(F.col("d1").isNotNull(), F.lit(alpha_common))
        .otherwise(F.lit(alpha_forward))
        .cast("long")
        .alias("w"),
    )
    # one draw per walk-step: r in [0, Σw), candidate whose
    # cumulative interval [cum - w, cum) contains r wins
    r = mix_expr(
        F.col("start"), F.col("walk"), F.lit(t).cast("long"), F.lit(0), seed
    ) % F.sum("w").over(w_all)
    return (
        cand.withColumn("cum", F.sum("w").over(w_spec))
        .withColumn("r", r)
        .where((F.col("cum") - F.col("w") <= F.col("r")) & (F.col("r") < F.col("cum")))
        .select("start", "walk", F.col("vertex").alias("prev"),
                F.col("dst").alias("vertex"))
    )


def node2vec_walks(
    graph: Graph,
    length: int = 10,
    walks_per_vertex: int = 1,
    alpha_return: int = 1,
    alpha_common: int = 4,
    alpha_forward: int = 2,
    seed: int = 0,
    starts: DataFrame | None = None,
    max_neighbors: int | None = None,
) -> Node2VecResult:
    """Generate the biased-walk corpus; rows are (start, walk, step,
    vertex) with step 0 = the start vertex, walks ending at sinks.

    alpha_return/alpha_common/alpha_forward: positive INTEGER
      unnormalized weights for the d=0 / d=1 / d=2 candidate classes
      (node2vec's 1/p : 1 : 1/q scaled to a common denominator; all
      equal = uniform walks). Kept ≤ 2^20 so cumulative sums stay
      exact int64 at any web-scale degree.
    max_neighbors: optional candidate cap (hash-smallest N out-
      neighbors per walk-step) bounding the draw window on hub
      vertices; None = exact node2vec.
    """
    if length < 0 or walks_per_vertex < 1:
        raise ValueError("length must be >= 0 and walks_per_vertex >= 1")
    alphas = (alpha_return, alpha_common, alpha_forward)
    if any((not isinstance(a, int)) or a < 1 or a > 1 << 20 for a in alphas):
        raise ValueError("alpha weights must be integers in [1, 2^20]")
    if max_neighbors is not None and max_neighbors < 1:
        raise ValueError("max_neighbors must be >= 1")
    seed = int(seed) % MIX_PRIME
    t0 = time.time()
    edges = graph.edges
    # (prev, dst) edge-existence side for the distance-1 test
    pe = edges.select(
        F.col("src").alias("p_src"), F.col("dst").alias("p_dst"), F.lit(1).alias("d1")
    )
    base = (starts if starts is not None else graph.vertices).select(
        F.col("id").alias("start")
    )
    pos = sever(
        base.select(
            "start",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.lit(walks_per_vertex - 1).cast("long"))
            ).alias("walk"),
            F.col("start").alias("prev"),
            F.col("start").alias("vertex"),
        )
    )
    deltas = [pos.select("start", "walk", F.lit(0).cast("long").alias("step"), "vertex")]
    metrics: list[dict] = []
    steps = 0
    loop_conf = {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.enabled": "false",
    }
    with conf_override(edges.sparkSession, loop_conf):
        for t in range(1, length + 1):
            it_t0 = time.time()
            picked = _step(
                pos, edges, pe, t, seed,
                (alpha_return, alpha_common, alpha_forward), max_neighbors,
            )
            obs = Observation(f"n2v_step_{t}")
            # per-step severed positions stay pinned — the corpus
            # union reads them (walks.py NOTE applies verbatim)
            pos = sever(picked.observe(obs, F.count(F.lit(1)).alias("active")))
            active = int(obs.get["active"] or 0)
            steps = t
            metrics.append({"step": t, "active": active, "wall_s": time.time() - it_t0})
            if active == 0:
                break
            deltas.append(
                pos.select(
                    "start", "walk", F.lit(t).cast("long").alias("step"), "vertex"
                )
            )
    corpus = deltas[0]
    for d in deltas[1:]:
        corpus = corpus.unionByName(d)
    return Node2VecResult(
        df=corpus,
        steps=steps,
        wall_seconds=time.time() - t0,
        metrics=metrics,
    )
