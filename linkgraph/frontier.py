"""The Ligra trio as Spark DataFrame primitives (SURVEY §2.2 D1-D9).

Reference: edgeMap/vertexMap/vertexFilter at
/root/reference/src/ligra.rs:58-306. The atomic-CAS write-combining
and slot-compaction machinery (ligra.rs:90-242) is deliberately NOT
ported — `groupBy(dst).agg(...)` is Spark's native partial+final
aggregation and subsumes all of it (SURVEY §4.3).

Frontier representation (node_set.rs:3-9 dual sparse/dense):
  * sparse  = a small DataFrame of frontier rows (id + message payload)
              -> broadcast hash join against the edge table (push);
  * dense   = a large frontier relation (typically the full state
              filtered by an activity predicate) -> shuffle/SMJ join
              against the bucketed edge table (pull): every cached edge
              partition is scanned and matched in place, no broadcast
              build, no frontier compaction — the Spark analogue of
              Ligra's dense traversal that walks all of E reading
              source state directly (ligra.rs:203-242).
The switch is the reference's direction-optimizing rule
(ligra.rs:82-87, threshold |E|/20 at graph.rs:31-33): push when the
frontier's degree volume <= m/20, pull otherwise. Catalyst/AQE would
broadcast small sides anyway below the size threshold; we keep the
explicit rule so the decision is deterministic, observable in metrics
(`info['mode']`), and pinned to reference behavior.

Note for symmetric (symmetrized) graphs: the in-edge set equals the
out-edge set, so a dense *pull* along in-edges is expressible as the
same join over the src-bucketed edge cache — no extra exchange for the
transpose. CC exploits this (kernels/cc.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkgraph.build import Graph


def frontier_volume(graph: Graph, frontier: DataFrame, reverse: bool = False) -> int:
    """Σ degree over frontier members — the statistic the reference
    dispatcher computes at ligra.rs:80. Sums out-degrees for the push
    direction, in-degrees when walking the transpose (reverse=True) —
    the in-edge walk's work is proportional to in_deg, so sizing the
    broadcast decision off out_deg would misfire on skewed graphs.
    Exact (one small join+agg); callers on a hot loop may instead
    estimate count * avg_degree."""
    deg = "in_deg" if reverse else "out_deg"
    row = (
        frontier.select("id")
        .join(graph.degrees, "id")
        .agg(F.sum(deg))
        .first()
    )
    return int(row[0] or 0)


def edge_map(
    graph: Graph,
    frontier: DataFrame,
    aggs: list[Column],
    msg: dict[str, Column] | None = None,
    volume: int | None = None,
    reverse: bool = False,
    dense: bool | None = None,
    exclude_dst: DataFrame | None = None,
    info: dict | None = None,
    group_extra: list[str] | None = None,
) -> DataFrame:
    """Ligra edgeMap (D1): for each edge (s,t) with s ∈ frontier, emit
    message columns, then combine per target.

    frontier : DataFrame keyed by `id` carrying the per-source payload
               columns referenced by `msg`/`aggs`.
    msg      : extra columns computed on the joined (edge × source-state)
               rows before aggregation (e.g. contrib = delta/out_deg).
    aggs     : aggregate expressions applied per `dst` — the Spark
               replacement for the reference's atomic write-combining
               (CAS min -> F.min, fetch_add -> F.sum; SURVEY §2.3).
    volume   : precomputed frontier degree volume; computed exactly
               if None.
    reverse  : walk in-edges instead (free transpose, SURVEY §1.4).
    dense    : force dense (pull/SMJ) or sparse (push/broadcast) form;
               None = the reference's |E|/20 dispatch (ligra.rs:82-87).
    exclude_dst : optional relation of `id`s whose targets must not
               receive messages this round — Ligra's `cond()` check
               (ligra.rs:150,218: skip targets failing cond), expressed
               as a left-anti join BEFORE aggregation so excluded
               targets do no aggregation work. With `group_extra`, any
               of those columns present on exclude_dst join too, so the
               cond() is per (target, extra-key) — e.g. per-source
               visitedness in multi-source traversals.
    info     : optional dict; receives {'mode', 'volume'} so kernels
               can record which path ran (per-iteration metrics).
    group_extra : extra frontier payload columns to include in the
               combine key, generalizing the per-target combine to
               per (target, extra...) — the multi-source traversal
               form (each logical traversal lane combines
               independently). The reference's single-lane edgeMap is
               group_extra=None; lanes multiply message volume, not
               the edge relation, so the |E|/20 dispatch input is the
               Σ-degree volume over frontier ROWS (id × lane).

    Returns a DataFrame grouped by `dst` with the aggregate columns —
    the "next frontier candidates + merged messages" in one relation.
    """
    edges = graph.edges_reversed() if reverse else graph.edges
    if volume is None:
        volume = frontier_volume(graph, frontier, reverse)
    if dense is None:
        dense = volume > graph.threshold
    src_side = frontier.withColumnRenamed("id", "src")
    if not dense:
        src_side = F.broadcast(src_side)  # push: sparse frontier
    if info is not None:
        info["mode"] = "dense-pull" if dense else "sparse-push"
        info["volume"] = volume
    joined = edges.join(src_side, "src")
    extra = list(group_extra or [])
    if exclude_dst is not None:
        anti_keys = ["dst"] + [c for c in extra if c in exclude_dst.columns]
        joined = joined.join(
            exclude_dst.withColumnRenamed("id", "dst").select(*anti_keys),
            anti_keys,
            "left_anti",
        )
    if msg:
        joined = joined.withColumns(msg)
    return joined.groupBy("dst", *extra).agg(*aggs)


def node_map(state: DataFrame, updates: dict[str, Column]) -> DataFrame:
    """Ligra vertexMap (D6): per-vertex update, no subset produced."""
    return state.withColumns(updates)


def node_filter(state: DataFrame, predicate: Column) -> DataFrame:
    """Ligra vertexFilter (D5), sparse output: subset rows passing the
    predicate. Dense form is `state.withColumn('active', predicate)` —
    callers choose (SURVEY §4.2)."""
    return state.where(predicate)


def single_frontier(graph: Graph, vertex: int) -> DataFrame:
    """NodeSubset::single (node_set.rs:24-158 constructors)."""
    return graph.vertices.sparkSession.createDataFrame([(vertex,)], "id long")


def full_frontier(graph: Graph) -> DataFrame:
    """NodeSubset::full."""
    return graph.vertices.select("id")
