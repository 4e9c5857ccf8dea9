"""Community label propagation (synchronous).

No reference implementation exists — semantics pinned in SURVEY §2.6:
init label[v] = v; each round every vertex adopts the most frequent
label among its IN-neighbors (ties -> smallest label); vertices with
no in-neighbors keep their label; synchronous rounds; stop when no
label changes or max_iter reached. Verified against a NumPy oracle
(tests/oracles.py).

Spark shape per round: join labels onto edges by src, count labels per
(dst, label) (map-side partial agg bounds hub dsts), then pick the
winner with a single `min_by(label, struct(-cnt, label))` aggregate —
the (cnt desc, label asc) ordering expressed as one hash aggregation,
no per-partition window sort. (SURVEY §2.6 row 1 prescribed a
row_number window; min_by gives the identical winner with one less
sort per round — the plan has no Window node.)

Driver round-trips: ONE Spark job per round — the changed-count rides
the localCheckpoint materialization as an Observation (the pagerank
pattern, pagerank.py:212-229) instead of a separate count job.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from linkgraph.build import Graph
from linkgraph.checkpoint import CheckpointManager, release, sever
from linkgraph.session import conf_override


@dataclass
class LabelPropResult:
    df: DataFrame  # (id long, label long)
    iterations: int
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def label_propagation(
    graph: Graph,
    max_iter: int = 20,
    ckpt: CheckpointManager | None = None,
) -> LabelPropResult:
    t0 = time.time()
    labels = None
    start_iter = 0
    if ckpt is not None:
        last = ckpt.last_complete()
        if last is not None:
            loaded, _, rec = ckpt.load(graph.edges.sparkSession, last)
            labels = sever(loaded)
            start_iter = last + 1
            if rec.get("changed") == 0:
                return LabelPropResult(labels, last + 1, 0.0, [rec])
    if labels is None:
        labels = sever(graph.vertices.select("id", F.col("id").alias("label")))
    prev_ckpt = labels
    iterations = start_iter
    metrics: list[dict] = []
    # AQE off in the loop (same rationale as pagerank.py)
    with conf_override(graph.edges.sparkSession, {"spark.sql.adaptive.enabled": "false"}):
      for it in range(start_iter, max_iter):
        it_t0 = time.time()
        counts = (
            graph.edges.join(
                labels.select(F.col("id").alias("src"), "label"), "src"
            )
            .groupBy("dst", "label")
            .agg(F.count("*").alias("cnt"))
        )
        # winner per dst = label with (cnt desc, label asc): one
        # min_by hash aggregation, no window sort
        winners = counts.groupBy("dst").agg(
            F.min_by(
                "label", F.struct(F.negate(F.col("cnt")), F.col("label"))
            ).alias("new_label")
        ).select(F.col("dst").alias("id"), "new_label")
        new_labels = (
            labels.join(winners, "id", "left")
            .select(
                "id",
                F.coalesce("new_label", "label").alias("label"),
                F.col("label").alias("_old"),
            )
        )
        # changed-count rides the checkpoint job as an Observation —
        # one driver round-trip per round
        obs = Observation("lp_iter")
        new_labels = sever(
            new_labels.observe(
                obs,
                F.sum(
                    (F.col("label") != F.col("_old")).cast("long")
                ).alias("changed"),
            )
        )
        changed = int(obs.get["changed"] or 0)
        release(prev_ckpt)
        prev_ckpt = new_labels
        labels = new_labels.drop("_old")
        iterations = it + 1
        rec = {"iteration": it, "changed": changed, "wall_s": time.time() - it_t0}
        metrics.append(rec)
        if ckpt is not None:
            ckpt.save(it, labels, metrics=rec)
        if changed == 0:
            break
    return LabelPropResult(
        df=labels,
        iterations=iterations,
        wall_seconds=time.time() - t0,
        metrics=metrics,
    )
