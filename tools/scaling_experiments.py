"""Experiment harness for per-iteration overhead: run the PageRank loop
on the rMAT-20 graph under different configs at two core counts and
print per-variant wall times. Informs session defaults; not part of
the public API."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import json, sys, time
cpus = int(sys.argv[1]); variant = sys.argv[2]
extra = {}
if variant == "noaqe":
    extra["spark.sql.adaptive.enabled"] = "false"
elif variant == "smj":
    extra["spark.sql.adaptive.enabled"] = "false"
    extra["spark.sql.autoBroadcastJoinThreshold"] = "-1"
elif variant == "noaqe_nock":
    extra["spark.sql.adaptive.enabled"] = "false"
from linkgraph.session import get_spark
spark = get_spark(app_name=f"exp-{variant}-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus, extra_conf=extra)
from linkgraph.build import build_graph_from_edges
from linkgraph.kernels import pagerank
g = build_graph_from_edges(spark.read.parquet(sys.argv[3]))
g.edges.count()
t0 = time.time()
res = pagerank(g, tol=0.0, max_iter=8)
wall = time.time() - t0
print(json.dumps({"variant": variant, "cpus": cpus, "wall_s": round(wall, 2),
                  "per_iter": round(wall / 8, 2)}))
"""


def main() -> None:
    edges = os.path.join(REPO, "bench_data", "rmat20_edges")
    results = []
    for variant in ["base", "noaqe", "smj"]:
        for cpus in [8, 32]:
            out = subprocess.run(
                [sys.executable, "-c", WORKER, str(cpus), variant, edges],
                capture_output=True, text=True, cwd=REPO, check=True,
            )
            rec = json.loads(out.stdout.strip().splitlines()[-1])
            results.append(rec)
            print(rec, flush=True)
    for v in ["base", "noaqe", "smj"]:
        lo = next(r for r in results if r["variant"] == v and r["cpus"] == 8)
        hi = next(r for r in results if r["variant"] == v and r["cpus"] == 32)
        print(f"{v}: eff={(lo['wall_s']/hi['wall_s'])/4:.3f}")


if __name__ == "__main__":
    main()
