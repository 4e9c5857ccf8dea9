"""Deterministic random-walk corpus generation (DeepWalk, Perozzi et
al. KDD'14 / node2vec p=q=1, Grover & Leskovec KDD'16) — the
training-data op that turns a link graph into skip-gram input for
graph-embedding models.

Each walk (start, walk_id) advances from vertex v at step t to the
out-neighbor d minimizing ``(mix(start, walk_id, t, d, seed), d)``
over (v, d) ∈ E — a deterministic hash-selected successor instead of
an RNG draw. Determinism is load-bearing twice over: re-running a
100 TB corpus job reproduces the corpus bit-for-bit (resume/backfill
safety), and the cross-engine oracle can replay the exact walks. The
hash is uniform enough per (walk, step) that corpus statistics match
RNG walks in expectation; distinct (start, walk_id, t) triples draw
independently-mixed orderings, and `seed` reshuffles the whole corpus.

The mix must evaluate IDENTICALLY in Spark and DuckDB under int64
with ANSI overflow checking, so it is two Lehmer rounds kept under
2^63 by construction::

    x = (start % 2^20)·2097169 + walk·131071 + step·8191
        + (dst % 2^20) + seed                       -- < 2^42
    h = ((x % 2147483647) · 2654435761) % 2147483647  -- < 2^62.3

(vertex ids only feed the hash through their low 20 bits; collisions
merely make the ``, d`` tie-break decide, still deterministic).

Spark shape per step: one |active|-row join shuffled on the current
vertex (the same key every kernel gathers on) + one
``min_by(dst, struct(h, dst))`` hash aggregation per (start, walk) —
no window sort, map-side partial combine bounds hub fan-out. Dead-end
walks leave the frontier via the inner join (their shorter prefix is
already in the corpus). Each step's positions are lineage-severed;
the corpus is a union of the per-step severed deltas, so the final
plan stays shallow at any length. At 100 TB: O(n·walks_per_vertex)
rows per step, length ≤ ~80 steps — the msbfs lane-scaling shape.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph.build import Graph
from linkgraph.checkpoint import sever
from linkgraph.session import conf_override

# Lehmer-style mix constants — mirrored verbatim in the driver oracle
# SQL (__spark_entry__._random_walks_sql); change both or neither.
MIX_MASK = 1048576  # 2^20: id bits that feed the hash
MIX_START = 2097169
MIX_WALK = 131071
MIX_STEP = 8191
MIX_PRIME = 2147483647  # 2^31 - 1
MIX_MULT = 2654435761  # Knuth's 2^32 / phi


def mix_expr(start: Column, walk: Column, step: Column, dst: Column, seed: int) -> Column:
    """The portable next-step hash (see module docstring)."""
    x = (
        (start % MIX_MASK) * MIX_START
        + walk * MIX_WALK
        + step * MIX_STEP
        + (dst % MIX_MASK)
        + F.lit(int(seed)).cast("long")
    )
    return ((x % MIX_PRIME) * MIX_MULT) % MIX_PRIME


@dataclass
class WalksResult:
    df: DataFrame  # (start long, walk long, step long, vertex long)
    steps: int
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def random_walks(
    graph: Graph,
    length: int = 10,
    walks_per_vertex: int = 1,
    seed: int = 0,
    starts: DataFrame | None = None,
) -> WalksResult:
    """Generate the walk corpus; rows are (start, walk, step, vertex)
    with step 0 = the start vertex and walks ending early at sinks.

    starts: optional (id long) start set — default every vertex.
    """
    if length < 0 or walks_per_vertex < 1:
        raise ValueError("length must be >= 0 and walks_per_vertex >= 1")
    # normalize once so the hash only ever sees a non-negative seed
    # (Spark/DuckDB % take the dividend's sign; Python's is floored)
    seed = int(seed) % MIX_PRIME
    t0 = time.time()
    edges = graph.edges
    base = (starts if starts is not None else graph.vertices).select(
        F.col("id").alias("start")
    )
    pos = sever(
        base.select(
            "start",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.lit(walks_per_vertex - 1).cast("long"))
            ).alias("walk"),
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
            cand = pos.join(
                edges.hint("shuffle_hash"), pos["vertex"] == edges["src"]
            ).select(
                "start",
                "walk",
                F.col("dst"),
                mix_expr(
                    F.col("start"), F.col("walk"), F.lit(t).cast("long"), F.col("dst"), seed
                ).alias("h"),
            )
            nxt = cand.groupBy("start", "walk").agg(
                F.min_by("dst", F.struct(F.col("h"), F.col("dst"))).alias("vertex")
            )
            # active-count rides the severing job as an Observation —
            # one job per step (labelprop pattern)
            obs = Observation(f"walk_step_{t}")
            # NOTE: every step's severed positions stay pinned — the
            # corpus union reads them and localCheckpoint truncates
            # lineage, so releasing any would lose corpus rows. The
            # pinned total IS the corpus, O(Σ active) rows.
            pos = sever(nxt.observe(obs, F.count(F.lit(1)).alias("active")))
            active = int(obs.get["active"] or 0)
            steps = t
            metrics.append(
                {"step": t, "active": active, "wall_s": time.time() - it_t0}
            )
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
    return WalksResult(
        df=corpus,
        steps=steps,
        wall_seconds=time.time() - t0,
        metrics=metrics,
    )
