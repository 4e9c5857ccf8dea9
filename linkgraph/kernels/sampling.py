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

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph.build import Graph
from linkgraph.checkpoint import sever
from linkgraph.kernels.walks import (
    MIX_MASK,
    MIX_MULT,
    MIX_PRIME,
    MIX_START,
    MIX_WALK,
    mix_expr,
)
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


@dataclass
class NegSampleResult:
    df: DataFrame  # (src long, slot long, dst long) negative pairs
    k: int
    wall_seconds: float
    metrics: dict = field(default_factory=dict)


def draw_expr(src: Column, j: Column, seed: int) -> Column:
    """Portable candidate draw — the same two-round Lehmer shape as
    walks.mix_expr but producing the candidate itself: the hash IS the
    sample, mapped into the id space by the caller's `% (max_id + 1)`.

    The FULL src feeds the draw: low 20 bits directly, the remaining
    high bits through one Lehmer round (MIX_MULT is coprime to
    MIX_PRIME, so the high-bit round is injective mod the prime) —
    two srcs share a candidate sequence only if they agree in the low
    20 bits AND mod-prime on the high bits, i.e. every 2^51 ids, not
    every 2^20 as the pre-r5 low-bits-only draw did. All intermediates
    stay < 2^63: (hi % P)*MULT < 2^62.3, s1*MIX_START < 2^52.
    Mirrored verbatim in the driver oracle SQL
    (__spark_entry__._negative_sample_sql); change both or neither."""
    hi = F.shiftright(src, 20)
    s1 = (((hi % MIX_PRIME) * MIX_MULT) % MIX_PRIME + src % MIX_MASK) % MIX_PRIME
    x = s1 * MIX_START + j * MIX_WALK + F.lit(int(seed)).cast("long")
    return ((x % MIX_PRIME) * MIX_MULT) % MIX_PRIME


def negative_sample(
    graph: Graph,
    k: int = 5,
    seed: int = 0,
    overgen: int = 4,
    srcs: DataFrame | None = None,
) -> NegSampleResult:
    """Uniform-corruption negative edges for link-prediction /
    embedding training (TransE-style corruption, Bordes et al.
    NeurIPS'13; word2vec's negative sampling uses the same move with a
    deg^0.75 proposal — uniform here so the draw stays a pure int64
    modulo, engine-portable and bit-reproducible).

    For every source vertex (default: out_degree >= 1, the positive
    srcs a trainer corrupts) draw up to `k` distinct vertices that are
    NOT out-neighbors and not the source itself. Candidates are
    hash-uniform over the live id range: cand(src, j) =
    draw(src, j, seed) % (max_id + 1) for j in [0, k*overgen), then
    non-vertices (id-space holes), self-loops, accidental positives,
    and per-src duplicate candidates are dropped and the first k
    survivors by draw index j win. Uniformity over *vertices* holds
    because existing ids get equal mass from the modulo (bias
    O((max_id+1)/2^31), negligible); survivors can fall short of k
    only when a src's adjacency covers most of the graph.

    Spark shape: candidate generation is one codegen projection
    (explode of a k*overgen sequence — no shuffle, no RNG state); one
    semi-join on the candidate key against vertices (broadcast-able
    when the vertex table is small, shuffle-hash otherwise); one
    anti-join on (src, cand) against edges — the same src-keyed
    shuffle every kernel gathers on; then a per-src dedup + rank over
    <= k*overgen rows (bounded window, no hub skew: the sample size,
    not the degree, bounds the partition). O(n*k*overgen) rows
    end-to-end — the 100 TB cost is one pass over a corpus-sized
    projection plus two keyed joins.

    Returns (src, slot, dst) with slot = 0..k-1 in draw order — all
    int64, hash-exact against the oracle.
    """
    if k < 1 or overgen < 1:
        raise ValueError("k and overgen must be >= 1")
    seed = int(seed) % MIX_PRIME
    t0 = time.time()
    if srcs is None:
        srcs = graph.degrees.where(F.col("out_deg") >= 1).select("id")
    else:
        srcs = srcs.select(F.col("id").cast("long").alias("id")).distinct()
    max_id = graph.vertices.agg(F.max("id").alias("m")).collect()[0]["m"]
    if max_id is None:
        raise ValueError("graph has no vertices")
    n_ids = int(max_id) + 1
    from pyspark.sql import Window

    cand = srcs.select(
        F.col("id").alias("src"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(k * overgen - 1).cast("long"))
        ).alias("j"),
    ).select(
        "src",
        "j",
        (draw_expr(F.col("src"), F.col("j"), seed) % F.lit(n_ids).cast("long")).alias(
            "cand"
        ),
    )
    cand = cand.where(F.col("cand") != F.col("src"))
    # keep only candidates that are real vertices (id-space holes die)
    cand = cand.join(
        graph.vertices.select(F.col("id").alias("cand")).hint("shuffle_hash"),
        "cand",
        "semi",
    )
    # drop accidental positives — anti-join on the engine's edge key
    edges = graph.edges.select(
        F.col("src"), F.col("dst").alias("cand")
    )
    cand = cand.join(edges.hint("shuffle_hash"), ["src", "cand"], "anti")
    # per-src duplicate candidates collapse to their first draw, then
    # the first k survivors by draw order win (bounded window)
    dedup = cand.groupBy("src", "cand").agg(F.min("j").alias("j"))
    w = Window.partitionBy("src").orderBy("j", "cand")
    obs = Observation("neg_sample")
    out = (
        dedup.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "src",
            (F.col("rn") - 1).cast("long").alias("slot"),
            F.col("cand").alias("dst"),
        )
        .observe(obs, F.count(F.lit(1)).alias("pairs"))
    )
    out = sever(out)
    pairs = int(obs.get["pairs"] or 0)
    return NegSampleResult(
        df=out,
        k=k,
        wall_seconds=time.time() - t0,
        metrics={"pairs": pairs, "max_id": int(max_id), "overgen": overgen},
    )


def rw_sample(
    graph,
    seeds: "DataFrame",
    length: int = 10,
    walks_per_seed: int = 4,
    seed: int = 0,
):
    """Random-walk graph sampling (Leskovec & Faloutsos KDD'06 —
    RW sampling preserves degree/clustering distributions far better
    than uniform vertex/edge sampling): the sampled vertex set is
    every vertex touched by deterministic walks from the seed set,
    the sampled graph is its induced subgraph.

    Returns (vertices, edges): vertices = (id long) distinct touched
    ids; edges = the induced subgraph via two semi-joins (the ego_net
    move — work scales with the sample, not the graph). Composes the
    kernels/walks.py deterministic walker, so the sample is
    bit-reproducible and oracle-replayable; walk length/multiplicity
    trade coverage for locality exactly as in the paper.
    """
    from linkgraph.kernels.walks import random_walks

    res = random_walks(
        graph,
        length=length,
        walks_per_vertex=walks_per_seed,
        seed=seed,
        starts=seeds,
    )
    verts = res.df.select(F.col("vertex").alias("id")).distinct()
    edges = (
        graph.edges.join(
            verts.select(F.col("id").alias("src")), "src", "left_semi"
        ).join(verts.select(F.col("id").alias("dst")), "dst", "left_semi")
        .select("src", "dst")
    )
    return verts, edges
