"""k-truss decomposition: the maximal subgraph in which every edge is
supported by at least k−2 triangles (Cohen 2008, "Trusses: cohesive
subgraphs for social network analysis"; the edge-strength analogue of
k-core). On web graphs the truss isolates tightly-interlinked cores —
link farms, navigational templates, genuine communities — more
sharply than k-core because support counts mutual reinforcement, not
raw degree. The reference engine at /root/reference/src has no truss
app; this extends its algorithm family on the same edge table.

Algorithm (peeling, Matula-Beck style at edge granularity): per round
  1. enumerate the CURRENT subgraph's triangles once via the
     degree-ordered orientation (triangles.py's skew-killer — per-
     vertex wedge work bounded ~sqrt(m) at hubs, each triangle
     materialized exactly once);
  2. credit each triangle's three edges (canonical u<w keys via
     least/greatest) — explode + partial+final groupBy = the support
     table;
  3. drop edges with support < k−2 (left join + coalesce 0 so
     triangle-free edges drop too); the removal count rides an
     Observation on the severed next state — one job per round.
Fixpoint: a round that removes nothing; its freshly-computed support
is exactly the in-truss support, so the result (u, w, support) is
free. Rounds are bounded by the peel depth (≤ max initial support /
(k−2) in the worst case; single digits on real graphs — 8 on the
sf0.01 co-part graph at k=10).

Scale notes: loop state is the canonical edge list (u < w, one row
per undirected edge); each round is joins + aggregates with the
orientation bounding the wedge blowup, and the support explode is 3
rows per triangle. No Python in the hot path, no driver-side loops
over data.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph.build import Graph, symmetrize
from linkgraph.checkpoint import release, sever


@dataclass
class TrussResult:
    df: DataFrame  # (u long, w long, support long): k-truss edges
    iterations: int
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def _support(edges_cn: DataFrame) -> DataFrame:
    """Per-edge triangle support over the canonical (u < w) edge list:
    orientation → wedges → closed triangles → 3 canonical credits."""
    sym = edges_cn.select(
        F.col("u").alias("src"), F.col("w").alias("dst")
    ).unionAll(
        edges_cn.select(F.col("w").alias("src"), F.col("u").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("v")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    with_deg = sym.join(
        deg.select(F.col("v").alias("src"), F.col("deg").alias("sdeg")), "src"
    ).join(deg.select(F.col("v").alias("dst"), F.col("deg").alias("ddeg")), "dst")
    o = with_deg.where(
        (F.col("sdeg") < F.col("ddeg"))
        | ((F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst")))
    ).select("src", "dst", "ddeg")

    e1 = o.select(
        F.col("src").alias("a"), F.col("dst").alias("b"),
        F.col("ddeg").alias("bdeg"),
    )
    e2 = o.select(
        F.col("src").alias("a"), F.col("dst").alias("c"),
        F.col("ddeg").alias("cdeg"),
    )
    wedges = e1.join(e2, "a").where(
        (F.col("bdeg") < F.col("cdeg"))
        | ((F.col("bdeg") == F.col("cdeg")) & (F.col("b") < F.col("c")))
    )
    tri = wedges.join(
        o.select(F.col("src").alias("b"), F.col("dst").alias("c")), ["b", "c"]
    ).select("a", "b", "c")
    credits = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("a", "b").alias("u"), F.greatest("a", "b").alias("w")
                ),
                F.struct(
                    F.least("a", "c").alias("u"), F.greatest("a", "c").alias("w")
                ),
                F.struct(
                    F.least("b", "c").alias("u"), F.greatest("b", "c").alias("w")
                ),
            )
        ).alias("e")
    ).select("e.u", "e.w")
    return credits.groupBy("u", "w").agg(F.count(F.lit(1)).alias("support"))


def ktruss(graph: Graph, k: int, max_iter: int = 10_000) -> TrussResult:
    if max_iter < 1:
        raise ValueError("ktruss needs max_iter >= 1")
    t0 = time.time()
    sym0 = symmetrize(graph.edges).where(F.col("src") != F.col("dst"))
    cur = sever(
        sym0.where(F.col("src") < F.col("dst")).select(
            F.col("src").alias("u"), F.col("dst").alias("w")
        )
    )
    iterations = 0
    metrics: list[dict] = []
    while iterations < max_iter:
        iterations += 1
        sup = _support(cur)
        scored = cur.select("u", "w").join(sup, ["u", "w"], "left").select(
            "u",
            "w",
            F.coalesce(F.col("support"), F.lit(0).cast("long")).alias("support"),
        )
        obs = Observation(f"truss_round_{iterations}")
        nxt = sever(
            scored.where(F.col("support") >= k - 2).observe(
                obs, F.count(F.lit(1)).alias("kept")
            )
        )
        kept = int(obs.get["kept"] or 0)
        # cur's count is known from the previous round's `kept` (or the
        # initial materialization) — but reading it again costs a job;
        # infer removals from the monotone kept counts instead
        metrics.append(
            {"iteration": iterations, "kept": kept, "wall_s": time.time() - t0}
        )
        prev = cur
        if len(metrics) >= 2 and metrics[-2]["kept"] == kept:
            release(prev)
            cur = nxt
            break
        release(prev)
        cur = nxt
        if kept == 0:
            break
    out = cur.select("u", "w", "support") if iterations else cur
    return TrussResult(
        df=out,
        iterations=iterations,
        wall_seconds=time.time() - t0,
        metrics=metrics,
    )
