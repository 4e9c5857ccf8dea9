"""Measure durable-checkpoint overhead for BFS on rMAT-20.

VERDICT r3 item 5's acceptance: with delta-aware durable checkpoints
(bfs.py writes per-level deltas under iter=<k>/ instead of rewriting
the full visited set every level), a ckpt-on run should land within
~15% of ckpt-off on a graph big enough that the r3 behavior was
measurably pathological (rMAT-26: a 24.7M-row rewrite for a 338-row
frontier).

Usage: python tools/bench_bfs_ckpt.py [--scale 20] [--ef 12]
Prints one JSON line: {"ckpt_off_s": ..., "ckpt_on_s": ..., "overhead": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=20)
    ap.add_argument("--ef", type=int, default=12)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--partitions", type=int, default=64)
    args = ap.parse_args()

    from linkgraph.build import build_graph_from_edges, symmetrize
    from linkgraph.checkpoint import CheckpointManager
    from linkgraph.datagen import rmat_edges_distributed
    from linkgraph.kernels import bfs
    from linkgraph.session import get_spark

    spark = get_spark(
        app_name="bfs-ckpt-bench",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.partitions,
        extra_conf={"spark.driver.memory": "48g"},
    )

    edges_path = os.path.join(REPO, "bench_data", f"rmat{args.scale}_edges")
    if not os.path.exists(os.path.join(edges_path, "_SUCCESS")):
        edges = rmat_edges_distributed(spark, scale=args.scale, edge_factor=args.ef)
        (
            edges.distinct()
            .repartition(args.partitions, "src")
            .sortWithinPartitions("src", "dst")
            .write.mode("overwrite")
            .parquet(edges_path)
        )
    # symmetrized so BFS reaches the bulk of the graph (few levels,
    # large frontiers — the regime where the r3 full-visited rewrite
    # was most expensive per level)
    g = build_graph_from_edges(
        symmetrize(spark.read.parquet(edges_path)),
        n=1 << args.scale,
        assume_deduped=True,
        num_partitions=args.partitions,
    )
    g.edges.count()  # warm cache
    root = 0

    # warm-up leg (JIT + first-touch), excluded
    bfs(g, root)

    t0 = time.time()
    off = bfs(g, root)
    off_s = time.time() - t0

    ckdir = tempfile.mkdtemp(prefix="bfs_ck_")
    try:
        t0 = time.time()
        on = bfs(g, root, ckpt=CheckpointManager(ckdir, "bfs"))
        on_s = time.time() - t0
        ck_bytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fns in os.walk(ckdir)
            for f in fns
        )
    finally:
        shutil.rmtree(ckdir, ignore_errors=True)

    reached_off = off.df.count()
    assert reached_off == on.df.count()
    print(
        json.dumps(
            {
                "scale": args.scale,
                "m_sym": g.m,
                "reached": reached_off,
                "levels": off.iterations,
                "ckpt_off_s": round(off_s, 2),
                "ckpt_on_s": round(on_s, 2),
                "overhead": round(on_s / off_s - 1, 3),
                "ckpt_bytes": ck_bytes,
                "frontier_sizes": [m["frontier_size"] for m in off.metrics],
            }
        )
    )


if __name__ == "__main__":
    main()
