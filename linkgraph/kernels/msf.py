"""Minimum spanning forest — Borůvka's algorithm, the canonical
parallel MSF (Borůvka 1926; the textbook log-round parallel formulation
e.g. JaJa §5.2, and the MST app of the GBBS suite). The reference
engine at /root/reference/src has no MSF; this extends its algorithm
family over the same edge table, like kcore/mis/matching. On a
similarity-weighted link graph the MSF is the single-linkage
clustering backbone (cut it at a threshold to get clusters).

Determinism: edges are totally ordered by (w, u, v) with canonical
u < v endpoints. Under a STRICT total order the MSF is unique (the
standard matroid argument — Kruskal, Prim and Borůvka all return the
same edge set), so the pytest oracle replays Kruskal with union-find
and the DuckDB oracle runs unrolled Borůvka rounds; all three must
agree edge-for-edge. Integer weights stay int64 end-to-end — the
driver row is hash-exact with no float tolerance.

Round structure (components halve per round ⇒ ≤ log2(n) rounds):
  1. per-component minimum incident edge: ONE hash agg
     (min of a (w,u,v,other-comp) struct) over the 2m-row incidence
     view — algebraic min, partial+final combine, hub-skew-safe;
  2. the distinct selected edges join the forest (each is an original
     (u, v, w) row — contraction never rewrites the answer);
  3. contraction: selected edges form a pseudo-forest on component ids
     (out-degree 1; only 2-cycles possible, the classic
     mutual-minimum pair under a strict order). Break each 2-cycle
     toward the smaller id, then POINTER-JUMP (p := p∘p) to fixpoint —
     O(log depth) self-joins on the C-row parent table, each with its
     changed-count riding an Observation;
  4. relabel: vertices and live-edge endpoints map through the root
     table (component-keyed hash joins; the root table shrinks
     geometrically, broadcast after the first rounds), internal edges
     (same root both sides) drop.
The live edge set and the component count both shrink geometrically;
at 100 TB the first round dominates: one linear scan + one partial
agg + two component-keyed joins. No n² anywhere, no driver-side
collections beyond per-round Observation scalars.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph.build import Graph
from linkgraph.checkpoint import release, sever


@dataclass
class MSFResult:
    df: DataFrame  # (u long, v long, w long) with u < v: the forest edges
    labels: DataFrame  # (id long, comp long): final component labels
    iterations: int
    total_weight: int
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def _edge_struct() -> Column:
    """The strict total order (w, u, v) + the gather payload oc."""
    return F.struct(
        F.col("w").alias("w"),
        F.col("u").alias("u"),
        F.col("v").alias("v"),
        F.col("oc").alias("oc"),
    )


def minimum_spanning_forest(
    graph: Graph,
    weights: DataFrame | None = None,
    max_iter: int = 64,
    broadcast_roots_after: int = 1,
) -> MSFResult:
    """Borůvka MSF over the graph's undirected edge set.

    weights: optional (src, dst, w) table joined onto the edges (any
    orientation; the canonical pair takes the MIN weight seen). Without
    it every edge weighs 1 and the result is a deterministic spanning
    forest. Integer weights recommended — they keep the result
    hash-exact across engines.
    """
    t0 = time.time()
    spark = graph.edges.sparkSession
    edges = graph.edges.where(F.col("src") != F.col("dst"))
    if weights is not None:
        edges = edges.join(weights, ["src", "dst"])
    else:
        edges = edges.withColumn("w", F.lit(1).cast("long"))
    # canonical undirected edges, min weight per pair
    canon = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            F.col("w"),
        )
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
    )
    live = sever(
        canon.select(
            "w", "u", "v", F.col("u").alias("cu"), F.col("v").alias("cv")
        )
    )
    labels = sever(graph.vertices.select("id", F.col("id").alias("comp")))
    forest_parts: list[DataFrame] = []
    iterations = 0
    total_weight = 0
    metrics: list[dict] = []
    for rnd in range(1, max_iter + 1):
        # 1. per-component min incident edge (both orientations)
        inc = live.select(
            F.col("cu").alias("c"), "w", "u", "v", F.col("cv").alias("oc")
        ).union(
            live.select(
                F.col("cv").alias("c"), "w", "u", "v", F.col("cu").alias("oc")
            )
        )
        me = inc.groupBy("c").agg(F.min(_edge_struct()).alias("me"))
        # 2. selected forest edges (distinct — a pair of components may
        #    pick the same edge from both sides)
        sobs = Observation(f"msf_sel_{rnd}")
        sel = sever(
            me.select(
                F.col("me.w").alias("w"),
                F.col("me.u").alias("u"),
                F.col("me.v").alias("v"),
            )
            .distinct()
            .observe(
                sobs,
                F.count(F.lit(1)).alias("picked"),
                F.sum("w").alias("wsum"),
            )
        )
        n_picked = int(sobs.get["picked"] or 0)
        iterations = rnd
        if n_picked == 0:  # no live edges left anywhere
            release(sel)
            metrics.append(
                {"iteration": rnd, "picked": 0, "live_edges": 0,
                 "wall_s": time.time() - t0}
            )
            break
        forest_parts.append(sel)
        total_weight += int(sobs.get["wsum"] or 0)
        # 3. contraction: parent pointers c -> other endpoint's comp,
        #    2-cycles broken toward the smaller id, then pointer-jump
        p = me.select(F.col("c"), F.col("me.oc").alias("pc"))
        gp = p.select(F.col("c").alias("pc"), F.col("pc").alias("gpc"))
        p = sever(
            p.join(gp, "pc").select(
                "c",
                F.when(
                    (F.col("gpc") == F.col("c")) & (F.col("c") < F.col("pc")),
                    F.col("c"),
                ).otherwise(F.col("pc")).alias("pc"),
            )
        )
        jumps = 0
        while True:
            jumps += 1
            jobs_ = Observation(f"msf_jump_{rnd}_{jumps}")
            nxt = sever(
                p.join(
                    p.select(F.col("c").alias("pc"), F.col("pc").alias("gpc")),
                    "pc",
                )
                .select(
                    "c",
                    F.col("gpc").alias("pc"),
                    (F.col("gpc") != F.col("pc")).cast("long").alias("chg"),
                )
                .observe(jobs_, F.sum("chg").alias("changed"))
                .select("c", "pc")
            )
            changed = int(jobs_.get["changed"] or 0)
            release(p)
            p = nxt
            if changed == 0:
                break
        roots = p.select(F.col("c"), F.col("pc").alias("root"))
        if rnd > broadcast_roots_after:
            roots = F.broadcast(roots)
        # 4. relabel vertices and live edges through the root table
        labels_new = sever(
            labels.join(roots, labels["comp"] == roots["c"], "left")
            .select("id", F.coalesce("root", "comp").alias("comp"))
        )
        eobs = Observation(f"msf_live_{rnd}")
        ru = roots.select(F.col("c").alias("cu"), F.col("root").alias("rcu"))
        rv = roots.select(F.col("c").alias("cv"), F.col("root").alias("rcv"))
        live_new = sever(
            live.join(ru, "cu", "left")
            .join(rv, "cv", "left")
            .select(
                "w", "u", "v",
                F.coalesce("rcu", "cu").alias("cu"),
                F.coalesce("rcv", "cv").alias("cv"),
            )
            .where(F.col("cu") != F.col("cv"))
            .observe(eobs, F.count(F.lit(1)).alias("live"))
        )
        n_live = int(eobs.get["live"] or 0)
        release(p)
        for df in (labels, live):
            release(df)
        labels, live = labels_new, live_new
        metrics.append(
            {"iteration": rnd, "picked": n_picked, "live_edges": n_live,
             "pointer_jumps": jumps, "wall_s": time.time() - t0}
        )
        if n_live == 0:
            break
    if forest_parts:
        out = forest_parts[0].select("u", "v", "w")
        for part in forest_parts[1:]:
            out = out.union(part.select("u", "v", "w"))
    else:
        out = spark.createDataFrame([], "u long, v long, w long")
    out = sever(out)
    for part in forest_parts:
        release(part)
    release(live)
    return MSFResult(
        df=out,
        labels=labels,
        iterations=iterations,
        total_weight=total_weight,
        wall_seconds=time.time() - t0,
        metrics=metrics,
    )
