"""Butterfly (bipartite 4-cycle) counting — the bipartite motif
primitive (Sanei-Mehri, Sariyuce & Tirthapura KDD'18; parallelized as
ParButterfly, Shun et al. ALENEX'20). Butterflies are to bipartite
graphs what triangles are to unipartite ones: the density/cohesion
signal for customer-supplier, url-host, doc-term, and other two-mode
web structures. (The reference engine at /root/reference/src ships
triangle counting only; this extends its motif family to the
bipartite edge tables this package already builds.)

Count identity: for any two same-side vertices u < w with
c = |N(u) ∩ N(w)| common neighbors on the other side, the pair closes
C(c, 2) butterflies, so

    butterflies = Σ_{u<w} C(codeg(u, w), 2)

and codeg comes from ONE wedge self-join keyed on the center side —
exactly the triangles/linkpred shape. Side choice matters: wedge
volume is Σ_v C(deg(v), 2) over the CENTER side, so `center="auto"`
computes both sums (two tiny aggs) and joins through the cheaper one;
the count is side-invariant (each butterfly has two vertices on each
side and is found once per same-side pair, C(2,2)=1 pair per side —
the identity counts it identically from either side).

Scale notes: the wedge join is Σ C(deg, 2) on the chosen side —
quadratic at hubs, the same degeneracy class as linkpred's wedges and
the LSH mega-buckets, bounded the same way: `max_center_deg` drops
wedges through super-hub centers (documented cap, mirrored by any
oracle). Everything is int64 end-to-end: C(c,2) = c*(c-1)/2 is an
exact integer expression, so results are hash-exact across engines
with no float tolerance.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import sever


@dataclass
class ButterflyResult:
    df: DataFrame  # one row: (n_left, n_right, m, wedges, butterflies) all long
    pairs: DataFrame  # (u, w, codeg) for codeg >= 2 — the co-citation table
    center: str  # the side the wedge join actually used
    wall_seconds: float


def _choose2(col):
    """C(col, 2) as exact int64: col*(col-1) is always even, so a
    shiftright IS the /2 — integer all the way (Spark's `/` is double
    division, which loses exactness past 2^52; a 100 TB hub can have
    deg > 6e7 and C(deg,2) > 2^52). Overflows past c ~ 3e9 like any
    int64 pair count."""
    c = col.cast("long")
    return F.shiftright(c * (c - F.lit(1)), 1)


def butterfly_count(
    edges: DataFrame,
    center: str = "auto",
    max_center_deg: int | None = None,
) -> ButterflyResult:
    """Count butterflies in the bipartite graph edges(src, dst), where
    src ids and dst ids live in disjoint vertex spaces (left/right —
    the package's offset-id convention, e.g. customer→supplier).

    center: which side the wedges pivot on — "left" (src), "right"
    (dst), or "auto" (the side with the smaller wedge volume
    Σ C(deg,2); two scalar aggs, then one join).
    max_center_deg: skew guard — drop wedges whose center vertex
    exceeds this degree (see module doc)."""
    if center not in ("auto", "left", "right"):
        raise ValueError(f"center must be auto|left|right, got {center!r}")
    t0 = time.time()
    e = edges.select("src", "dst").distinct()
    e = sever(e)  # reused by degree aggs + both join sides

    deg_l = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    deg_r = e.groupBy("dst").agg(F.count(F.lit(1)).alias("deg"))
    stats = e.agg(
        F.count(F.lit(1)).alias("m"),
        F.countDistinct("src").alias("n_left"),
        F.countDistinct("dst").alias("n_right"),
    ).first()

    if center == "auto":
        wl = deg_l.agg(F.sum(_choose2(F.col("deg")))).first()[0] or 0
        wr = deg_r.agg(F.sum(_choose2(F.col("deg")))).first()[0] or 0
        center = "left" if wl <= wr else "right"

    if center == "left":
        ctr, leaf, deg = "src", "dst", deg_l
    else:
        ctr, leaf, deg = "dst", "src", deg_r

    wedge_src = e.select(F.col(ctr).alias("v"), F.col(leaf).alias("leaf"))
    if max_center_deg is not None:
        ok = deg.where(F.col("deg") <= max_center_deg).select(
            F.col(ctr).alias("v")
        )
        wedge_src = wedge_src.join(ok, "v")
    a = wedge_src.select("v", F.col("leaf").alias("u"))
    b = wedge_src.select("v", F.col("leaf").alias("w"))
    codeg = (
        a.join(b, "v")
        .where(F.col("u") < F.col("w"))
        .groupBy("u", "w")
        .agg(F.count(F.lit(1)).alias("codeg"))
    )
    codeg = sever(codeg)
    totals = codeg.agg(
        F.coalesce(F.sum("codeg"), F.lit(0)).cast("long").alias("wedges"),
        F.coalesce(F.sum(_choose2(F.col("codeg"))), F.lit(0))
        .cast("long")
        .alias("butterflies"),
    ).first()

    spark = edges.sparkSession
    summary = spark.createDataFrame(
        [
            (
                int(stats["n_left"]),
                int(stats["n_right"]),
                int(stats["m"]),
                int(totals["wedges"]),
                int(totals["butterflies"]),
            )
        ],
        "n_left long, n_right long, m long, wedges long, butterflies long",
    )
    pairs = codeg.where(F.col("codeg") >= 2)
    return ButterflyResult(
        df=summary,
        pairs=pairs,
        center=center,
        wall_seconds=time.time() - t0,
    )
