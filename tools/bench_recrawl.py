"""Measured incremental-recrawl evidence (VERDICT r4 item 8): the
operation a 10^12-page pipeline actually runs daily is "merge today's
crawl delta, re-rank" — NOT "rebuild the world". This script measures
both paths end-to-end on the same synthetic corpus and pins that they
reach the SAME final ranks (allclose 1e-6 per url, the north rule's
equality bar):

  cold path  : full rebuild of the merged snapshot
               (extract ALL pages -> dense ids -> edges) + PageRank
               from the uniform init to 1e-6;
  warm path  : build.update_graph on the DELTA only (extraction cost
               scales with the delta, surviving urls keep their ids)
               + pagerank(init_ranks=yesterday's converged ranks).

Appends the comparison table to BENCH/BASELINE.md.

Usage: python tools/bench_recrawl.py [n_pages] [delta_frac] [cpus]
       (defaults 200000, 0.05, 16)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    delta_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from linkgraph.build import build_graph_from_pages, update_graph
    from linkgraph.datagen import PagesSpec, generate_pages
    from linkgraph.kernels import pagerank
    from linkgraph.session import get_spark

    spark = get_spark(
        app_name="bench-recrawl",
        master=f"local[{cpus}]",
        shuffle_partitions=max(8, cpus),
        extra_conf={"spark.driver.memory": "24g"},
    )

    n_delta = int(n_pages * delta_frac)
    print(f"corpus {n_pages} pages, recrawl delta {n_delta} pages", file=sys.stderr)
    snap1 = generate_pages(PagesSpec(n_pages=n_pages, seed=3))
    # re-crawl of the first delta_frac of urls with different link
    # structure (urls are position-derived, so a smaller n_pages at a
    # different seed IS a re-crawl of existing urls)
    delta = generate_pages(PagesSpec(n_pages=n_delta, seed=11))
    pages1 = spark.createDataFrame(snap1).persist()
    pages_delta = spark.createDataFrame(delta).persist()
    merged = spark.createDataFrame(
        pd.concat(
            [delta, snap1[~snap1["url"].isin(set(delta["url"]))]]
        ).reset_index(drop=True)
    ).persist()
    pages1.count(), pages_delta.count(), merged.count()  # materialize inputs

    # yesterday's state (cost reported, not part of the comparison)
    t0 = time.time()
    g1 = build_graph_from_pages(pages1)
    build_v1_s = time.time() - t0
    t0 = time.time()
    pr1 = pagerank(g1, tol=1e-6, max_iter=200)
    pr_v1_s = time.time() - t0
    print(
        f"v1: build {build_v1_s:.1f}s, pagerank {pr_v1_s:.1f}s "
        f"({pr1.iterations} iters, n={g1.n} m={g1.m})",
        file=sys.stderr,
    )

    # cold path: full rebuild + cold pagerank
    t0 = time.time()
    gf = build_graph_from_pages(merged)
    build_full_s = time.time() - t0
    t0 = time.time()
    prf = pagerank(gf, tol=1e-6, max_iter=200)
    pr_cold_s = time.time() - t0

    # warm path: delta merge + warm-start pagerank
    t0 = time.time()
    g2 = update_graph(g1, pages_delta)
    update_s = time.time() - t0
    t0 = time.time()
    pr2 = pagerank(g2, tol=1e-6, max_iter=200, init_ranks=pr1.df)
    pr_warm_s = time.time() - t0

    # equality pin at the url level (id spaces differ by construction)
    a = (
        pr2.df.join(g2.vertices.select("id", "url"), "id")
        .select("url", F.col("rank").alias("rank_warm"))
    )
    b = (
        prf.df.join(gf.vertices.select("id", "url"), "id")
        .select("url", F.col("rank").alias("rank_cold"))
    )
    joined = a.join(b, "url", "full").select("url", "rank_warm", "rank_cold").toPandas()
    assert not joined["rank_warm"].isna().any(), "url missing from warm path"
    assert not joined["rank_cold"].isna().any(), "url missing from cold path"
    max_abs = float(np.abs(joined["rank_warm"] - joined["rank_cold"]).max())
    allclose = bool(
        np.allclose(joined["rank_warm"], joined["rank_cold"], atol=1e-6)
    )

    cold_total = build_full_s + pr_cold_s
    warm_total = update_s + pr_warm_s
    result = {
        "n_pages": n_pages,
        "n_delta": n_delta,
        "cpus": cpus,
        "graph": {"n": gf.n, "m": gf.m},
        "cold": {
            "build_s": round(build_full_s, 1),
            "pagerank_s": round(pr_cold_s, 1),
            "iterations": prf.iterations,
            "total_s": round(cold_total, 1),
        },
        "warm": {
            "update_s": round(update_s, 1),
            "pagerank_s": round(pr_warm_s, 1),
            "iterations": pr2.iterations,
            "total_s": round(warm_total, 1),
        },
        "speedup": round(cold_total / warm_total, 2),
        "ranks_allclose_1e-6": allclose,
        "max_abs_rank_diff": max_abs,
        "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    print(json.dumps(result))
    assert allclose, f"rank divergence {max_abs}"

    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## Incremental recrawl run {result['ts']} "
            f"({n_pages} pages, {n_delta}-page delta ({delta_frac:.0%}), "
            f"local[{cpus}]; final graph n={gf.n} m={gf.m})\n\n"
            f"| path | build/merge s | pagerank s | iters | total s |\n"
            f"|---|---|---|---|---|\n"
            f"| cold (full rebuild + uniform-init PR) | {build_full_s:.1f} "
            f"| {pr_cold_s:.1f} | {prf.iterations} | {cold_total:.1f} |\n"
            f"| warm (update_graph delta + init_ranks PR) | {update_s:.1f} "
            f"| {pr_warm_s:.1f} | {pr2.iterations} | {warm_total:.1f} |\n\n"
            f"speedup = {cold_total:.1f} / {warm_total:.1f} = "
            f"**{result['speedup']}x**; per-url ranks allclose 1e-6: "
            f"**{allclose}** (max |diff| = {max_abs:.2e}). The daily 10^12-page "
            f"operation is the warm row: extraction touches only the delta, "
            f"surviving urls keep their ids (checkpoints stay joinable), and "
            f"the warm-started power iteration re-converges in "
            f"{pr2.iterations} rounds vs {prf.iterations} cold.\n"
        )
    print("appended to BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
