"""Coreness: the full k-core decomposition — per-vertex core numbers,
the degeneracy ordering view of a web graph (Batagelj & Zaveršnik
2003; the bucketed parallel form is Julienne's KCore, Dhulipala,
Blelloch & Shun SPAA'17). The fixed-k `kcore` kernel answers "who is
in the k-core?"; this one answers it for EVERY k at once:
core(v) = the largest k such that v belongs to the k-core. The
reference engine at /root/reference/src has no core decomposition;
this extends its algorithm family over the same edge table.

Algorithm: level-synchronous bucket peeling. A level variable k starts
at 0; each round
  1. recompute residual degrees of the remaining vertices;
  2. advance the level: k = max(k, min residual degree) — if no vertex
     sits at or below the current level, the level jumps straight to
     the residual minimum (every remaining vertex is then in the
     min-degree-core, so the jump is exact, not an approximation);
  3. peel ALL vertices with residual degree <= k in one batch; each
     gets core number exactly k (it survived peeling of every level
     < k, so it is in the k-core; its residual degree <= k bars it
     from the (k+1)-core);
until no vertices remain. Batching is safe because removing a
degree-<=k vertex only lowers other degrees — cascades stay at the
same level (step 2's max() keeps k pinned while any cascade runs).
The round count is the graph's peeling complexity (number of distinct
(level, cascade-step) pairs), small for power-law web graphs.

Consistency contract with the fixed-k kernel (pinned by pytest):
    kcore(g, k).df ids  ==  {v : coreness(g).core(v) >= k}.

The vertex universe is the edge-endpoint set (degree-0 vertices of a
wider universe trivially have core 0 and are not enumerated). Call
with a SYMMETRIZED graph, as for kcore.

Scale shape: three materializations per round, each one job —
  * the degree table (remaining ⟕ groupBy('src') count over the
    residual edges — the groupBy itself plans exchange-free because
    cur descends from the src-hash-partitioned persisted edge table
    through partition-preserving broadcast anti-joins; the left join
    against `remaining` then exchanges O(remaining) id rows, the
    unavoidable cost of detecting degree-0 vertices, shrinking with
    the pool every round — unlike fixed-k kcore, which peels them
    implicitly and stays join-free; min-degree and remaining-count
    ride the materializing job's Observation);
  * the peeled delta (a filter VIEW over the persisted degree table,
    severed because it outlives the round as 1/rounds of the answer);
  * the residual edge set (two broadcast anti-joins on the delta —
    peeled sets shrink after the long-tail first rounds, so no edge
    shuffle ever recurs; `first_round_shuffle=True` plans round 1's
    filter as a shuffle anti-join when even the id-only projection
    overflows the broadcast threshold).
No driver-side collect beyond the two Observation scalars per round.

With a CheckpointManager, each round persists its PEELED delta
(id, core — O(peeled) rows, the bfs.py delta layout); resume unions
the deltas, re-derives remaining/residual edges by one anti-join pass,
and restores the level from the record. A converged record
short-circuits without touching the edge table.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph.build import Graph
from linkgraph.checkpoint import CheckpointManager, release, sever


@dataclass
class CorenessResult:
    df: DataFrame  # (id long, core long): every endpoint's core number
    iterations: int
    degeneracy: int  # max core number = degeneracy of the graph
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def coreness(
    graph: Graph,
    max_iter: int = 10_000,
    first_round_shuffle: bool = False,
    ckpt: CheckpointManager | None = None,
) -> CorenessResult:
    t0 = time.time()
    spark = graph.edges.sparkSession
    cur = graph.edges
    remaining = (
        cur.select(F.col("src").alias("id"))
        .union(cur.select(F.col("dst").alias("id")))
        .distinct()
    )
    assigned: list[DataFrame] = []
    old_state: list[DataFrame] = []  # prior round's degr/edges to release
    level = 0
    iterations = 0
    metrics: list[dict] = []
    start_rnd = 1
    if ckpt is not None:
        done = ckpt.complete_iters()
        if done:
            last = done[-1]
            parts = []
            rec_last: dict = {}
            for it_k in done:
                st, _, rec = ckpt.load(spark, it_k)
                parts.append(st.select("id", "core"))
                if it_k == last:
                    rec_last = rec
            prior = parts[0]
            for p in parts[1:]:
                prior = prior.union(p)
            prior = sever(prior)
            assigned.append(prior)
            iterations = last
            level = int(rec_last.get("level", 0))
            metrics.append(rec_last)
            if rec_last.get("converged"):
                start_rnd = max_iter + 1  # skip the loop entirely
            else:
                peeled = F.broadcast(prior.select("id"))
                cur = sever(
                    graph.edges.join(
                        peeled.withColumnRenamed("id", "src"), "src", "left_anti"
                    )
                    .join(peeled.withColumnRenamed("id", "dst"), "dst", "left_anti")
                    .select("src", "dst")
                )
                remaining = remaining.join(peeled, "id", "left_anti")
                old_state.append(cur)
                start_rnd = last + 1
    for rnd in range(start_rnd, max_iter + 1):
        counts = cur.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        dobs = Observation(f"coreness_deg_{rnd}")
        degr = sever(
            remaining.join(counts, "id", "left")
            .select("id", F.coalesce(F.col("deg"), F.lit(0)).alias("deg"))
            .observe(
                dobs,
                F.count(F.lit(1)).alias("n_remaining"),
                F.min("deg").alias("min_deg"),
            )
        )
        n_remaining = int(dobs.get["n_remaining"] or 0)
        if n_remaining == 0:
            # empty input (or a resume that peeled everything without a
            # converged flag): nothing left to assign
            iterations = rnd
            metrics.append(
                {"iteration": rnd, "level": level, "peeled": 0,
                 "remaining": 0, "converged": True,
                 "wall_s": time.time() - t0}
            )
            if ckpt is not None:
                ckpt.save(
                    rnd,
                    degr.select("id", F.lit(level).cast("long").alias("core")),
                    metrics=metrics[-1],
                )
            release(degr)
            break
        level = max(level, int(dobs.get["min_deg"]))
        pobs = Observation(f"coreness_peel_{rnd}")
        delta = sever(
            degr.where(F.col("deg") <= level)
            .select("id", F.lit(level).cast("long").alias("core"))
            .observe(pobs, F.count(F.lit(1)).alias("peeled"))
        )
        n_peeled = int(pobs.get["peeled"] or 0)
        iterations = rnd
        rec = {
            "iteration": rnd,
            "level": level,
            "peeled": n_peeled,
            "remaining": n_remaining - n_peeled,
            "converged": n_remaining - n_peeled == 0,
            "wall_s": time.time() - t0,
        }
        if ckpt is not None:
            ckpt.save(rnd, delta, metrics=rec)
        metrics.append(rec)
        assigned.append(delta)
        if n_remaining - n_peeled == 0:
            release(degr)
            for d in old_state:
                release(d)
            old_state = []
            break
        rm = delta.select("id")
        if not (first_round_shuffle and rnd == 1):
            rm = F.broadcast(rm)
        nxt = sever(
            cur.join(rm.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(rm.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .select("src", "dst")
        )
        # remaining is a filter VIEW over the just-persisted degr — one
        # lineage hop, reset every round, never re-shuffled
        remaining = degr.where(F.col("deg") > level).select("id")
        for d in old_state:
            release(d)
        old_state = [degr, nxt]
        cur = nxt
    out = assigned[0] if assigned else spark.createDataFrame(
        [], "id long, core long"
    )
    for p in assigned[1:]:
        out = out.union(p)
    out = sever(out)
    for p in assigned:
        release(p)
    for d in old_state:
        release(d)
    return CorenessResult(
        df=out,
        iterations=iterations,
        degeneracy=level,
        wall_seconds=time.time() - t0,
        metrics=metrics,
    )
