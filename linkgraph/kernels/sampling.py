"""Deterministic k-hop neighbor sampling (GraphSAGE, Hamilton et al.
NeurIPS'17) — the minibatch-construction op for training GNNs over a
link graph: from a seed set, layer l keeps at most fanout[l]
out-neighbors per frontier vertex, and the next frontier is the
distinct sampled targets.

Sampling is hash-deterministic, not RNG: layer l keeps the fanout[l]
neighbors minimizing ``(mix(src, layer, dst, seed), dst)`` — the same
portable two-round Lehmer mix as kernels/walks.py (constants shared),
so a 100 TB minibatch corpus is bit-reproducible across re-runs and
engines, and per-(src, layer) the kept set is an unbiased
hash-ordered draw. `seed` reshuffles every draw.

Spark shape per layer: one |frontier|-row join shuffled on the vertex
key, then a ``row_number() OVER (PARTITION BY src ORDER BY h, dst)``
rank filter. The window sorts per-src neighbor lists — parallel
across srcs, worst case one hub's full adjacency in one task's sort
(spills, doesn't OOM); callers with 10⁸-degree hubs should pre-cap
with an edge-side filter the way linkpred's `max_center_deg` does.
Layer blocks are lineage-severed and unioned (pinned — truncated
lineage), so the result plan stays shallow at any depth. The next
frontier is `distinct` over O(|frontier|·fanout) sampled rows — the
sample, not the graph, bounds every layer's size.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph.build import Graph
from linkgraph.checkpoint import sever
from linkgraph.kernels.walks import mix_expr, MIX_PRIME
from linkgraph.session import conf_override


@dataclass
class SampleResult:
    df: DataFrame  # (layer long, src long, dst long) sampled edge blocks
    layers: int
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def neighbor_sample(
    graph: Graph,
    seeds: DataFrame | list[int],
    fanouts: list[int],
    seed: int = 0,
) -> SampleResult:
    """Sampled edge blocks (layer, src, dst), layer = 1..len(fanouts).

    seeds: (id long) DataFrame or a list of vertex ids. A vertex with
    out-degree ≤ fanout keeps ALL its out-edges (standard GraphSAGE
    without-replacement semantics)."""
    if not fanouts or any(f < 1 for f in fanouts):
        raise ValueError("fanouts must be a non-empty list of ints >= 1")
    seed = int(seed) % MIX_PRIME
    t0 = time.time()
    spark = graph.edges.sparkSession
    if isinstance(seeds, DataFrame):
        frontier = seeds.select(F.col("id").cast("long").alias("id")).distinct()
    else:
        frontier = spark.createDataFrame(
            [(int(s),) for s in seeds], "id long"
        ).distinct()
    frontier = sever(frontier)
    edges = graph.edges
    blocks: list[DataFrame] = []
    metrics: list[dict] = []
    loop_conf = {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.enabled": "false",
    }
    from pyspark.sql import Window

    with conf_override(spark, loop_conf):
        for layer, fanout in enumerate(fanouts, start=1):
            it_t0 = time.time()
            cand = frontier.join(
                edges.hint("shuffle_hash"), frontier["id"] == edges["src"]
            ).select(
                "src",
                "dst",
                mix_expr(
                    F.col("src"), F.lit(0).cast("long"),
                    F.lit(layer).cast("long"), F.col("dst"), seed,
                ).alias("h"),
            )
            w = Window.partitionBy("src").orderBy("h", "dst")
            kept = (
                cand.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= fanout)
                .select(
                    F.lit(layer).cast("long").alias("layer"), "src", "dst"
                )
            )
            obs = Observation(f"sample_layer_{layer}")
            block = sever(
                kept.observe(obs, F.count(F.lit(1)).alias("sampled"))
            )
            sampled = int(obs.get["sampled"] or 0)
            blocks.append(block)
            metrics.append(
                {
                    "layer": layer,
                    "fanout": fanout,
                    "sampled": sampled,
                    "wall_s": time.time() - it_t0,
                }
            )
            if sampled == 0:
                break
            frontier = block.select(F.col("dst").alias("id")).distinct()
    out = blocks[0]
    for b in blocks[1:]:
        out = out.unionByName(b)
    return SampleResult(
        df=out,
        layers=len(blocks),
        wall_seconds=time.time() - t0,
        metrics=metrics,
    )
