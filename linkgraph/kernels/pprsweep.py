"""Local community detection: personalized-PageRank sweep cut
(Andersen, Chung, Lang, "Local Graph Partitioning using PageRank
Vectors", FOCS'06 — the PPR half is kernels/ppr.py; this adds the
sweep that turns seeded scores into a low-conductance community).

The reference ships no community machinery beyond labelprop
(/root/reference/src/algos.rs); this is beyond-reference coverage —
the standard "grow a community around these seed pages" primitive for
web graphs, and the natural composition of two kernels this engine
already has (ppr + the conductance score from modularity.py).

Semantics. Run PPR from the seed set, then on the SYMMETRIZED,
self-loop-free graph:

  1. rank candidates by degree-normalized score p(v)/deg(v)
     descending (ties by id), keeping the top `max_sweep`;
  2. for every prefix S_k of that order compute conductance
     phi(S_k) = cut(S_k) / min(vol(S_k), 2m - vol(S_k));
  3. return the prefix with minimum phi (ties -> smallest k).

ACL's theorem says some prefix of this order is a provably good cut
when one exists near the seeds; the sweep is how PPR scores become an
actual community.

Spark shape (100 TB posture). The PPR loop is the audited pagerank
skeleton (one m-row SHUFFLE_HASH join + one partial+final SUM per
round). The sweep itself: candidate selection is a TakeOrdered
(orderBy + limit — no global sort materialization), the cut counts
come from ONE m-row pass that left-joins the two endpoint ranks
(broadcast — the ranked set is <= max_sweep rows) and folds each edge
into +-1 difference-array deltas, and the per-prefix cut/vol prefix
sums run as a window over <= max_sweep rows — bounded driver-scale
data, the same contract as the k*dim k-means centroid state. No
per-prefix recomputation: all T prefixes are scored from one pass
over the edges.

Determinism contract: the sweep ORDER uses ROUND(p/deg, 9) so the
~1e-15 cross-engine float noise in PPR scores cannot reorder
near-ties (ids break exact ties); every downstream quantity (cut,
vol) is exact int64 from that order, and phi is one fixed-order
division, ROUND(9)ed only at the query edge.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.build import Graph, symmetrize
from linkgraph.checkpoint import CheckpointManager, release, sever
from linkgraph.kernels.ppr import ppr


@dataclass
class SweepResult:
    df: DataFrame  # (id long, sweep_pos long, best_k long, phi double)
    best_k: int
    phi: float | None
    ppr_iterations: int
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def ppr_sweep(
    graph: Graph,
    sources: list[int],
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    max_sweep: int = 1024,
    ckpt: CheckpointManager | None = None,
    ckpt_every: int = 5,
) -> SweepResult:
    """ACL sweep cut around `sources`. Returns the minimum-conductance
    prefix community: one row per member (id, sweep_pos) plus the
    constant (best_k, phi) columns.

    Checkpointing rides the inner PPR (the only iterative state); the
    sweep is a single bounded pass and recomputes from the scores.
    """
    if max_sweep < 1:
        raise ValueError("max_sweep must be >= 1")
    t0 = time.time()
    spark = graph.edges.sparkSession

    res = ppr(graph, sources, damping=damping, tol=tol, max_iter=max_iter,
              ckpt=ckpt, ckpt_every=ckpt_every)
    scores = sever(res.df)  # (id, rank)

    # Undirected view: canonical u<v pairs, self-loops dropped.
    und = sever(
        graph.edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
    deg = symmetrize(
        und.select(F.col("u").alias("src"), F.col("v").alias("dst"))
    ).groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))

    # Candidate order: top max_sweep by ROUND(p/deg, 9) desc, id asc.
    # Isolated / zero-degree vertices never change cut or vol; skip.
    ranked = sever(
        scores.join(deg, "id")
        .where(F.col("rank") > 0)
        .select(
            "id",
            "deg",
            F.round(F.col("rank") / F.col("deg"), 9).alias("key"),
        )
        .orderBy(F.col("key").desc(), F.col("id").asc())
        .limit(max_sweep)
        .select(
            "id",
            "deg",
            F.row_number()
            .over(Window.orderBy(F.col("key").desc(), F.col("id").asc()))
            .alias("pos"),
        )
    )
    t_rows = ranked.count()
    if t_rows == 0:
        release(scores), release(und), release(ranked)
        empty = spark.createDataFrame(
            [], "id long, sweep_pos long, best_k long, phi double"
        )
        return SweepResult(empty, 0, None, res.iterations,
                           time.time() - t0, res.metrics)

    # One m-row pass -> difference-array deltas for cut(k).
    ra = ranked.select(F.col("id").alias("u"), F.col("pos").alias("pu"))
    rb = ranked.select(F.col("id").alias("v"), F.col("pos").alias("pv"))
    tagged = (
        und.join(F.broadcast(ra), "u", "left")
        .join(F.broadcast(rb), "v", "left")
        .where(F.col("pu").isNotNull() | F.col("pv").isNotNull())
    )
    # both ranked: edge crosses the cut for k in [min, max-1]
    # one ranked:  edge crosses the cut for k in [pos, T]
    deltas = tagged.select(
        F.explode(
            F.when(
                F.col("pu").isNotNull() & F.col("pv").isNotNull(),
                F.array(
                    F.struct(
                        F.least("pu", "pv").alias("k"),
                        F.lit(1).cast("long").alias("d"),
                    ),
                    F.struct(
                        F.greatest("pu", "pv").alias("k"),
                        F.lit(-1).cast("long").alias("d"),
                    ),
                ),
            ).otherwise(
                F.array(
                    F.struct(
                        F.coalesce("pu", "pv").alias("k"),
                        F.lit(1).cast("long").alias("d"),
                    )
                )
            )
        ).alias("kd")
    ).select(F.col("kd.k").alias("k"), F.col("kd.d").alias("d"))
    cut_delta = deltas.groupBy("k").agg(F.sum("d").alias("delta"))

    # 2m = total volume of the symmetrized graph (twice the
    # undirected edge count) — one scalar, exact int64.
    twom = 2 * und.count()

    wk = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    sweep = (
        ranked.join(
            cut_delta.select(F.col("k").alias("pos"), "delta"), "pos", "left"
        )
        .select(
            "id",
            "pos",
            "deg",
            F.coalesce("delta", F.lit(0).cast("long")).alias("delta"),
        )
        .select(
            "id",
            "pos",
            F.sum("deg").over(wk).alias("vol"),
            F.sum("delta").over(wk).alias("cut"),
        )
        .select(
            "id",
            "pos",
            "cut",
            "vol",
            F.try_divide(
                F.col("cut").cast("double"),
                F.least(F.col("vol"), F.lit(twom) - F.col("vol")).cast(
                    "double"
                ),
            ).alias("phi"),
        )
    )
    sweep = sever(sweep)
    best = (
        sweep.where(F.col("phi").isNotNull())
        .orderBy(F.col("phi").asc(), F.col("pos").asc())
        .limit(1)
        .select(F.col("pos").alias("best_k"), F.col("phi").alias("best_phi"))
    )
    brow = best.first()
    if brow is None:  # every prefix had min-side volume 0 (cannot happen
        best_k, best_phi = t_rows, None  # with deg>0 candidates; guard anyway)
    else:
        best_k, best_phi = int(brow["best_k"]), float(brow["best_phi"])

    out = (
        sweep.where(F.col("pos") <= best_k)
        .select(
            "id",
            F.col("pos").cast("long").alias("sweep_pos"),
            F.lit(best_k).cast("long").alias("best_k"),
            F.lit(best_phi).cast("double").alias("phi"),
        )
    )
    # NOTE: `sweep` stays pinned — `out` reads its localCheckpoint
    # blocks; the caller owns the result's lifetime.
    release(scores), release(und), release(ranked)
    metrics = list(res.metrics)
    metrics.append(
        {
            "sweep_candidates": int(t_rows),
            "best_k": best_k,
            "phi": best_phi,
            "twom": int(twom),
        }
    )
    return SweepResult(
        df=out,
        best_k=best_k,
        phi=best_phi,
        ppr_iterations=res.iterations,
        wall_seconds=time.time() - t0,
        metrics=metrics,
    )
