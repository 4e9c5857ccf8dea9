"""Scaling-efficiency evidence (BASELINE.json:2,14): the north rule's
two-cluster-size criterion (N vs 4N executors, efficiency >= 0.8)
cannot use a real cluster in this sandbox; per the driver instruction
it is evidenced by running the SAME PageRank job on the SAME input at
local[8] and local[32] and reporting throughput at both plus
efficiency = (t_8 / t_32) / 4.

Each parallelism level runs in its own subprocess (a JVM cannot change
its core count mid-flight), repeated `--repeats` times, best wall time
kept. Results are appended to BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

WORKER = """
import json, os, sys, time
sf_dir = sys.argv[1]; cpus = int(sys.argv[2])
from linkgraph.session import get_spark
spark = get_spark(app_name=f"scaling-{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus)
from bench import build_cust_supp_graph
from linkgraph.kernels import pagerank
g = build_cust_supp_graph(spark, sf_dir)
g.edges.count()  # warm the cache before timing
t0 = time.time()
res = pagerank(g, tol=1e-6, max_iter=200)
wall = time.time() - t0
print(json.dumps({"cpus": cpus, "wall_s": wall, "n": g.n, "m": g.m,
                  "iterations": res.iterations,
                  "edges_per_sec": res.edges_processed / wall,
                  "converged": res.converged}))
"""


def run_level(sf_dir: str, cpus: int, repeats: int) -> dict:
    best = None
    for _ in range(repeats):
        out = subprocess.run(
            [sys.executable, "-c", WORKER, sf_dir, str(cpus)],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            check=True,
        )
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        if best is None or rec["wall_s"] < best["wall_s"]:
            best = rec
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    lo = run_level(args.sf_dir, args.low, args.repeats)
    hi = run_level(args.sf_dir, args.high, args.repeats)
    factor = args.high / args.low
    efficiency = (lo["wall_s"] / hi["wall_s"]) / factor
    result = {
        "sf_dir": args.sf_dir,
        "low": lo,
        "high": hi,
        "core_factor": factor,
        "scaling_efficiency": round(efficiency, 3),
        "criterion": ">= 0.8",
        "meets_criterion": efficiency >= 0.8,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(result))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as f:
        f.write(
            f"\n## Scaling run {result['ts']} ({args.sf_dir})\n\n"
            f"| cores | wall s | edges/sec | iterations | n | m |\n|---|---|---|---|---|---|\n"
            f"| {lo['cpus']} | {lo['wall_s']:.2f} | {lo['edges_per_sec']:.0f} | {lo['iterations']} | {lo['n']} | {lo['m']} |\n"
            f"| {hi['cpus']} | {hi['wall_s']:.2f} | {hi['edges_per_sec']:.0f} | {hi['iterations']} | {hi['n']} | {hi['m']} |\n\n"
            f"efficiency = (t_{lo['cpus']} / t_{hi['cpus']}) / {factor:.0f} = "
            f"**{efficiency:.3f}** (criterion ≥ 0.8: {'MET' if efficiency >= 0.8 else 'NOT MET'})\n"
        )


if __name__ == "__main__":
    main()
