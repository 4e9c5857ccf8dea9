"""Directed modularity (Leicht & Newman, PRL 2008) for a vertex
partition — the standard quality score for the communities the engine
already produces (labelprop, cc, scc labels all qualify).

    Q = Σ_c e_c / m  −  Σ_c (out_c · in_c) / m²

where e_c is the number of edges with BOTH endpoints in community c,
out_c / in_c are the total out-/in-degrees of c's members, and m is
the edge count. Q = 0 for the all-in-one partition, → 1 for perfectly
modular structure (the reference ships no community scoring —
/root/reference/src/algos.rs — this closes the labelprop loop:
propagate, then measure).

Spark shape: two m-row joins tag each edge with its endpoint labels
(shuffles on vertex id — the same key every kernel gathers on), then
three hash aggregations (per-src-label, per-dst-label, intra count)
and one full-outer label join, all map-side-combined. No windows, no
driver-side loops; the result is a ONE-ROW DataFrame.

Exactness: with exact=True (default) the score is derived from int64
aggregates through a single fixed-order expression
``(CAST(m·Σe_c − Σ out_c·in_c AS DOUBLE) / m) / m`` — bit-identical
across engines, no rounding. The int64 products overflow (loudly,
under ANSI) once m ≳ 3·10⁹; exact=False switches the per-community
products to doubles (order-dependent in the last ~2 ulps), which is
the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.build import Graph


def community_stats(graph: Graph, labels: DataFrame) -> DataFrame:
    """Per-community (label, intra long, out_tot long, in_tot long).

    labels: (id long, label long) covering every edge endpoint.
    Communities with no incident edges are absent (they contribute 0
    to every modularity term).
    """
    el = (
        graph.edges.join(
            labels.select(F.col("id").alias("src"), F.col("label").alias("slabel")),
            "src",
        )
        .join(
            labels.select(F.col("id").alias("dst"), F.col("label").alias("dlabel")),
            "dst",
        )
    )
    out_tot = el.groupBy(F.col("slabel").alias("label")).agg(
        F.count("*").alias("out_tot"),
        F.sum((F.col("slabel") == F.col("dlabel")).cast("long")).alias("intra"),
    )
    in_tot = el.groupBy(F.col("dlabel").alias("label")).agg(
        F.count("*").alias("in_tot")
    )
    return (
        out_tot.join(in_tot, "label", "full_outer")
        .select(
            "label",
            F.coalesce("intra", F.lit(0).cast("long")).alias("intra"),
            F.coalesce("out_tot", F.lit(0).cast("long")).alias("out_tot"),
            F.coalesce("in_tot", F.lit(0).cast("long")).alias("in_tot"),
        )
    )


def modularity(graph: Graph, labels: DataFrame, exact: bool = True) -> DataFrame:
    """One-row (q double, communities long, intra_edges long, m long).

    exact=True derives q from int64 sums (bit-exact, valid to
    m ≈ 3·10⁹ — ANSI overflow is loud beyond); exact=False uses
    per-community double products (the web-scale path).
    """
    stats = community_stats(graph, labels)
    m = F.sum(F.col("out_tot")).alias("_m")  # Σ out_tot = m
    if exact:
        agg = stats.agg(
            F.sum("intra").alias("_intra"),
            F.sum(F.col("out_tot") * F.col("in_tot")).alias("_null_sum"),
            m,
            F.count("*").alias("_comms"),
        )
        q = (
            (
                (F.col("_m") * F.col("_intra") - F.col("_null_sum")).cast("double")
                / F.col("_m")
            )
            / F.col("_m")
        )
    else:
        agg = stats.agg(
            F.sum("intra").alias("_intra"),
            F.sum(
                F.col("out_tot").cast("double") * F.col("in_tot").cast("double")
            ).alias("_null_sum"),
            m,
            F.count("*").alias("_comms"),
        )
        q = (
            F.col("_intra").cast("double") / F.col("_m")
            - (F.col("_null_sum") / F.col("_m")) / F.col("_m")
        )
    return agg.select(
        F.when(F.col("_m") > 0, q).otherwise(F.lit(0.0)).alias("q"),
        F.col("_comms").alias("communities"),
        F.col("_intra").alias("intra_edges"),
        F.col("_m").alias("m"),
    )


def conductance(graph: Graph, labels: DataFrame) -> DataFrame:
    """Per-community conductance (Kannan-Vempala-Vetta 2004) — the cut
    quality score that complements modularity: how leaky is each
    community's boundary relative to the smaller side's volume?

        phi(S) = cut(S) / min(vol(S), vol(V) - vol(S))

    over the directed edge multiset viewed as volume contributions
    (vol(v) = in_deg + out_deg, so vol(V) = 2m; cut(S) = directed
    edges crossing S's boundary in either direction). Low phi = a
    well-separated community; the all-in-one partition has no outside
    volume and yields NULL (try_divide), never a throw.

    Output: (label, cut long, vol long, conductance double) — cut and
    vol are exact int64 aggregates, phi is ONE division of two
    int64-valued doubles, bit-identical across engines with no
    rounding (the graphstats/modularity exactness discipline).

    Spark shape: reuses community_stats (two m-row label-tagging
    joins + map-side-combined hash aggs); vol(V) enters as an in-plan
    one-row broadcast aggregate — no driver scalar, no windows.
    """
    stats = community_stats(graph, labels)
    tot = stats.agg((F.sum("out_tot") * 2).alias("_vol_all"))
    vol = F.col("out_tot") + F.col("in_tot")
    cut = vol - 2 * F.col("intra")
    return (
        stats.crossJoin(F.broadcast(tot))
        .select(
            "label",
            cut.alias("cut"),
            vol.alias("vol"),
            F.try_divide(
                cut.cast("double"),
                F.least(vol, F.col("_vol_all") - vol).cast("double"),
            ).alias("conductance"),
        )
    )
