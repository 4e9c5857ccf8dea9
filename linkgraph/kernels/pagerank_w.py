"""Weighted PageRank — power iteration where a vertex distributes its
rank over out-edges PROPORTIONALLY TO EDGE WEIGHT instead of uniformly
(the standard weighted extension, e.g. Xing & Ghorbani 2004; on a host
graph the natural weight is the href multiplicity between hosts, so a
host that links another ten times passes ten times the rank of a
single stray link). The unweighted kernel is pagerank.py; this one
shares its loop discipline (sever per round, Observation-borne diff +
dangling mass, SHUFFLE_HASH hints, AQE off) but gathers rank * p(u,v)
where

    p(u, v) = w(u, v) / Σ_x w(u, x)        (row-normalized once,
                                            BEFORE the loop)
    rank'(v) = (1-d)/n + d * ( Σ_{u→v} rank(u) * p(u,v)
                               + dangling_mass / n )
    dangling_mass = Σ_{wsum(u)=0} rank(u)

Weights must be positive; edges without a weight row drop out of the
walk (inner join), and a vertex whose out-edges all lack weights is
dangling — the contract is "the weight table IS the walk structure".
Integer weights are recommended: p is then a single exact-int64
division, identical across engines, and ranks match the oracle at
ROUND(9) like the unweighted kernel's.

Scale shape per iteration — identical to pagerank.py's audited plan:
one m-row SHUFFLE_HASH join (normalized edges ⋈ state on src), one
partial+final SUM on dst (two-stage skew-safe gather), one left join
back onto the skeleton, diff + dangling mass riding the checkpoint
job's Observation. The normalization itself is one groupBy + one join,
paid once.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph.build import Graph
from linkgraph.checkpoint import release, sever
from linkgraph.session import conf_override


@dataclass
class WeightedPageRankResult:
    df: DataFrame  # (id long, rank double)
    iterations: int
    converged: bool
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def pagerank_weighted(
    graph: Graph,
    weights: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 200,
) -> WeightedPageRankResult:
    """weights: (src, dst, w) with w > 0 covering the walkable edges."""
    t0 = time.time()
    n = graph.n
    spark = graph.edges.sparkSession
    wsum = weights.groupBy("src").agg(F.sum("w").alias("wsum"))
    pe = sever(
        weights.join(wsum, "src").select(
            "src",
            "dst",
            (F.col("w").cast("double") / F.col("wsum").cast("double")).alias("p"),
        )
    )
    # skeleton: (id, has_out, rank); has_out joined in once.
    state = sever(
        graph.vertices.select("id")
        .join(wsum.select(F.col("src").alias("id")).withColumn("has_out", F.lit(True)),
              "id", "left")
        .select(
            "id",
            F.coalesce("has_out", F.lit(False)).alias("has_out"),
            (F.lit(1.0) / n).alias("rank"),
        )
    )
    dm = state.where(~F.col("has_out")).agg(F.sum("rank")).first()[0] or 0.0

    loop_conf = {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.enabled": "false",
    }
    iterations = 0
    converged = False
    prev = state
    metrics: list[dict] = []
    with conf_override(spark, loop_conf):
        for it in range(1, max_iter + 1):
            dm_df = spark.createDataFrame([(float(dm),)], "dm_val double")
            contribs = pe.join(
                state.where(F.col("has_out"))
                .select(F.col("id").alias("src"), "rank")
                .hint("shuffle_hash"),
                "src",
            ).select("dst", (F.col("rank") * F.col("p")).alias("c"))
            gathered = contribs.groupBy("dst").agg(F.sum("c").alias("gathered"))
            nxt = (
                state.join(
                    gathered.hint("shuffle_hash"),
                    state["id"] == gathered["dst"],
                    "left",
                )
                .crossJoin(F.broadcast(dm_df))
                .select(
                    state["id"],
                    state["has_out"],
                    (
                        F.lit((1.0 - damping) / n)
                        + F.lit(damping)
                        * (F.coalesce("gathered", F.lit(0.0)) + F.col("dm_val") / n)
                    ).alias("rank"),
                    state["rank"].alias("_old"),
                )
            )
            obs = Observation("prw_iter")
            nxt = sever(
                nxt.observe(
                    obs,
                    F.max(F.abs(F.col("rank") - F.col("_old"))).alias("diff"),
                    F.sum(
                        F.when(~F.col("has_out"), F.col("rank")).otherwise(F.lit(0.0))
                    ).alias("dm"),
                )
            )
            got = obs.get
            diff = got["diff"]
            dm = got["dm"] or 0.0
            release(prev)
            prev = nxt
            state = nxt.drop("_old")
            iterations = it
            converged = diff is not None and diff < tol
            metrics.append(
                {"iteration": it, "diff": diff, "dangling_mass": dm,
                 "wall_s": time.time() - t0}
            )
            if converged:
                break
    release(pe)
    return WeightedPageRankResult(
        df=state.select("id", "rank"),
        iterations=iterations,
        converged=converged,
        wall_seconds=time.time() - t0,
        metrics=metrics,
    )
