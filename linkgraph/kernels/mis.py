"""Maximal independent set — the last classic app of the Ligra suite
(Shun & Blelloch PPoPP'13 §Applications, MIS.C) not yet in the kernel
set. The reference engine at /root/reference/src has no MIS; this
extends its algorithm family over the same edge table, like kcore.

Algorithm: parallel greedy MIS with DETERMINISTIC pseudo-random
priorities (Blelloch, Fineman & Shun SPAA'12 show the greedy/priority
formulation converges in O(log n) rounds w.h.p. under random
priorities). Each round
  * a vertex is a ROOT if no UNDECIDED neighbor has a smaller priority
    key — roots join the MIS;
  * roots' neighbors leave the set (status OUT);
until no vertex is undecided. The fixpoint equals the SEQUENTIAL
greedy MIS taken in ascending-key order, which is what the pytest and
DuckDB oracles replay.

Priority key: Knuth multiplicative hash, tie-broken by id —
    key(v) = ((v * 2654435761) % 1000000007) * 2^31 + v
a pure int64 expression (exact for v < 2^31, far above any vertex id
here) identical in Spark and ANSI SQL, so the oracle can reproduce it
literally. Raw-id priority would be deterministic too but degenerates
to O(n) rounds on id-ordered paths; the hash restores the O(log n)
round bound without sacrificing cross-engine exactness.

Call with a SYMMETRIZED graph (independence is an undirected notion).

Scale shape (the kcore peeling pattern, kernels/kcore.py):
  * per-round min-key gather is `cur.groupBy('src').agg(F.min(key(dst)))`
    — cur descends from the Graph's src-hash-partitioned persisted
    edge table through broadcast anti-joins that PRESERVE the
    partitioning, so the groupBy plans with no exchange;
  * roots/removed are materialized once per round (localCheckpoint,
    counts ride Observations — no extra count jobs);
  * edge/undecided filtering is broadcast anti-joins on the removed
    set, which shrinks geometrically after round 1. Round 1 may remove
    a LARGE fraction; `first_round_shuffle=True` plans round 1's
    filters as shuffle anti-joins for graphs where even the id-only
    projection overflows the broadcast threshold.
Three materializations per round (removed, undecided, edges), each
O(|live subgraph|) and geometrically shrinking — at 100 TB the round-1
pass dominates and is a linear scan + one partial-agg, no n² anywhere.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph.build import Graph
from linkgraph.checkpoint import release, sever

#: Knuth multiplicative-hash priority, exact in int64 for id < 2^31.
MIS_HASH_MULT = 2654435761
MIS_HASH_MOD = 1_000_000_007
MIS_TIE_SHIFT = 2_147_483_648  # 2^31


def priority_key(col: Column) -> Column:
    """key(v) = hash-priority * 2^31 + v — total order, random-ish."""
    return (
        (col * F.lit(MIS_HASH_MULT)) % F.lit(MIS_HASH_MOD)
    ) * F.lit(MIS_TIE_SHIFT) + col


@dataclass
class MISResult:
    df: DataFrame  # (id long): the maximal independent set members
    iterations: int
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def mis(
    graph: Graph,
    max_iter: int = 10_000,
    first_round_shuffle: bool = False,
) -> MISResult:
    t0 = time.time()
    und = graph.vertices.select("id")
    cur = graph.edges
    live: list[DataFrame] = []  # severed per-round state awaiting release
    mis_parts: list[DataFrame] = []  # severed root sets (the answer)
    iterations = 0
    metrics: list[dict] = []
    for rnd in range(1, max_iter + 1):
        # min priority key over UNDECIDED neighbors (cur is already the
        # undecided-only subgraph) — exchange-free on the src cache
        mk = cur.groupBy("src").agg(F.min(priority_key(F.col("dst"))).alias("nk"))
        roots = (
            und.join(mk, und["id"] == mk["src"], "left")
            .where(F.col("nk").isNull() | (F.col("nk") > priority_key(F.col("id"))))
            .select("id")
        )
        # removed = roots ∪ neighbors(roots); the two are disjoint
        # (adjacent roots are impossible: the larger-key one sees the
        # smaller in its min), so a plain distinct union suffices.
        rsrc = roots.withColumnRenamed("id", "src")
        if not first_round_shuffle or rnd > 1:
            rsrc = F.broadcast(rsrc)
        nbrs = cur.join(rsrc, "src").select("dst")
        obs = Observation(f"mis_round_{rnd}")
        removed = sever(
            roots.withColumn("is_root", F.lit(True))
            .union(nbrs.select(F.col("dst").alias("id")).withColumn("is_root", F.lit(False)))
            .groupBy("id")
            .agg(F.max("is_root").alias("is_root"))
            .observe(
                obs,
                F.count(F.lit(1)).alias("removed"),
                F.sum(F.col("is_root").cast("long")).alias("roots"),
            )
        )
        n_removed = int(obs.get["removed"] or 0)
        n_roots = int(obs.get["roots"] or 0)
        iterations = rnd
        metrics.append(
            {
                "iteration": rnd,
                "roots": n_roots,
                "removed": n_removed,
                "wall_s": time.time() - t0,
            }
        )
        if n_removed == 0:  # nonempty und always yields a root ⇒ und is empty
            release(removed)
            break
        mis_parts.append(sever(removed.where("is_root").select("id")))
        rm = removed.select("id")
        if not (first_round_shuffle and rnd == 1):
            rm = F.broadcast(rm)
        # sever per round: byte-stable per-round plans + bounded lineage
        und = sever(und.join(rm, "id", "left_anti"))
        cur = sever(
            cur.join(rm.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(rm.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .select("src", "dst")
        )
        release(removed)
        live.append(und)
        live.append(cur)
        while len(live) > 2:
            release(live.pop(0))
    out = mis_parts[0] if mis_parts else und.limit(0)
    for p in mis_parts[1:]:
        out = out.union(p)
    out = sever(out)
    for p in mis_parts:
        release(p)
    for df in live:
        release(df)
    return MISResult(
        df=out,
        iterations=iterations,
        wall_seconds=time.time() - t0,
        metrics=metrics,
    )
