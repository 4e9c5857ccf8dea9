"""Triangle counting via degree-ordered edge-intersection join
(BASELINE.json:6; semantics pinned in SURVEY §2.6 — no reference
implementation exists).

Algorithm: symmetrize + drop self-loops; rank vertices by
(degree, id); orient every undirected edge from the lower-ranked to
the higher-ranked endpoint (the oriented graph is a DAG where each
vertex keeps only ~sqrt(m) out-edges even at hub vertices — this is
the classic skew-killer for triangle counting, cf. HERO SIGMOD'24 in
PAPERS.md); every triangle u<v<w (rank order) is then counted exactly
once as the wedge (u→v, u→w) closed by the oriented edge (v→w):

    wedges  = oriented e1 ⋈ e2 on shared source u
    count   = wedges ⋈ oriented on (v, w)   -- |rows|

All three steps are shuffle joins + one global count — no Python in
the hot path. Oracle: DuckDB 3-way self-join SQL (exact).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.build import Graph, symmetrize


@dataclass
class TriangleResult:
    count: int
    wall_seconds: float


def _bcast_rows_cap() -> int:
    """Row cap under which the degree table / oriented edge set are
    broadcast instead of shuffled (≈16 B/row → 64 MB at the default).
    Scale-adaptive: bench graphs sit far below it, a 100 TB graph far
    above — the shuffle plans below stay the fallback there."""
    return int(os.environ.get("LINKGRAPH_TRI_BCAST_ROWS", str(4_000_000)))


def oriented_edges(edges: DataFrame, n_hint: int | None = None) -> DataFrame:
    """Symmetrized, self-loop-free, degree-ordered oriented edge set
    (src, dst, ddeg): edge kept iff (deg(src), src) < (deg(dst), dst).
    The dst degree rides along so wedge generation can re-use the same
    total order without another join. When the vertex count is known
    to be broadcast-sized, both degree joins broadcast the n-row
    degree table so the symmetrized stream is never re-exchanged
    (guide §3.1); otherwise they shuffle as before."""
    sym = symmetrize(edges).where(F.col("src") != F.col("dst"))
    deg = sym.groupBy(F.col("src").alias("v")).agg(F.count("*").alias("deg"))
    sdeg = deg.select(F.col("v").alias("src"), F.col("deg").alias("sdeg"))
    ddeg = deg.select(F.col("v").alias("dst"), F.col("deg").alias("ddeg"))
    if n_hint is not None and n_hint <= _bcast_rows_cap():
        sdeg, ddeg = F.broadcast(sdeg), F.broadcast(ddeg)
    with_deg = sym.join(sdeg, "src").join(ddeg, "dst")
    return with_deg.where(
        (F.col("sdeg") < F.col("ddeg"))
        | ((F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst")))
    ).select("src", "dst", "ddeg")


def triangle_count(graph: Graph) -> TriangleResult:
    t0 = time.time()
    spark = graph.edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # cache the orientation hash-partitioned by src: the wedge
    # self-join then reads both sides co-partitioned — zero exchange
    # in front of the Σ outdeg² row blowup (guide §2.4).
    o = oriented_edges(graph.edges, n_hint=graph.n).repartition(p, "src").persist()
    try:
        # wedge (u→v, u→w) kept only with rank(v) < rank(w) in the SAME
        # (deg, id) order used for orientation, so the closing edge —
        # if it exists — is exactly the oriented edge (v, w).
        e1 = o.select(F.col("src").alias("u"), F.col("dst").alias("v"), F.col("ddeg").alias("vdeg"))
        e2 = o.select(F.col("src").alias("u"), F.col("dst").alias("w"), F.col("ddeg").alias("wdeg"))
        # Measured plan choices on the wedge stream (the Σ outdeg²
        # row blowup that dominates this kernel — BENCH/BASELINE.md r5
        # triangles entry; r6 adds the broadcast closing):
        #  * SHUFFLE_HASH on the oriented side of both joins (the same
        #    choice pagerank.py makes): the default sort-merge plan
        #    SORTS the wedge stream before the closing probe — 17 GB
        #    spill per rep at rMAT-18 bench scale;
        #  * broadcast closing (r6, small graphs): when the oriented
        #    edge set fits the broadcast cap, the wedge stream probes a
        #    broadcast hash of it IN the generation stage — no (v,w)
        #    combine hash-map, no exchange touches the wedge stream at
        #    all. sf0.1 copart graph: 6.6-9.7 s → 5.2-6.4 s per rep,
        #    identical counts;
        #  * map-side combine BEFORE the closing exchange (fallback at
        #    scale): wedges reduce to (v, w, count) inside the
        #    generation stage, so the exchange carries distinct
        #    closing-pair counts, not raw wedges. rMAT-18 @ 8 cores:
        #    120.9 s (SMJ) -> 108.5 s (SHJ) -> ~76 s (SHJ + combine)
        #    per rep, identical counts.
        wedges = e1.join(e2.hint("shuffle_hash"), "u").where(
            (F.col("vdeg") < F.col("wdeg"))
            | ((F.col("vdeg") == F.col("wdeg")) & (F.col("v") < F.col("w")))
        )
        closing = o.select(F.col("src").alias("v"), F.col("dst").alias("w"))
        if graph.m <= _bcast_rows_cap():
            count = int(wedges.join(F.broadcast(closing), ["v", "w"]).count())
        else:
            wcnt = wedges.groupBy("v", "w").agg(F.count(F.lit(1)).alias("wc"))
            closed = wcnt.join(closing.hint("shuffle_hash"), ["v", "w"])
            count = int(closed.agg(F.sum("wc")).collect()[0][0] or 0)
    finally:
        o.unpersist()
    return TriangleResult(count=count, wall_seconds=time.time() - t0)


def kclique_count(graph: Graph, k: int = 4) -> TriangleResult:
    """k-clique counting on the degree-ordered orientation (the
    kClist scheme, Danisch/Balalau/Sozio WWW'18; k=3 degenerates to
    triangle_count's plan): every k-clique appears EXACTLY once as an
    ordered tuple v1 < v2 < ... < vk in the (deg, id) total order,
    built by extending (k−1)-tuples with a common out-neighbor —
    level ℓ adds ℓ−1 equi-joins against the oriented adjacency, all
    keyed on (member, candidate). The orientation is the skew-killer:
    out-degrees are bounded by O(√m) on any graph (arboricity), so no
    hub explosion; total work is the standard c(G)^{k-2}·m bound.
    """
    if not 3 <= k <= 6:
        raise ValueError("k must be in [3, 6]")
    t0 = time.time()
    o = oriented_edges(graph.edges, n_hint=graph.n).select("src", "dst").persist()
    try:
        cliq = o.select(F.col("src").alias("v1"), F.col("dst").alias("v2"))
        for level in range(3, k + 1):
            ext = cliq.join(
                o.select(F.col("src").alias("v1"), F.col("dst").alias("x")), "v1"
            )
            for i in range(2, level):
                ext = ext.join(
                    o.select(F.col("src").alias(f"v{i}"), F.col("dst").alias("x")),
                    [f"v{i}", "x"],
                )
            cliq = ext.withColumnRenamed("x", f"v{level}")
        count = cliq.count()
    finally:
        o.unpersist()
    return TriangleResult(count=count, wall_seconds=time.time() - t0)
