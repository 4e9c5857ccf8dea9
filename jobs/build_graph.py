"""spark-submit entry: the build pipeline (the reference's `parse`
command, /root/reference/src/graph.rs:302-320, reimagined):
pages parquet -> extraction UDF -> dense ids -> edge/vertex/degree
tables written hash-distributed by src.

Usage:
  spark-submit --py-files dist/linkgraph.zip jobs/build_graph.py \\
      --pages /path/pages_parquet --output /path/graph [--buckets 64]
  spark-submit ... jobs/build_graph.py --synth 10000 --output /path/graph

Both --pages and --output accept ``table:<identifier>`` to read from /
write to catalog tables (Iceberg in production; see linkgraph/io.py) —
the output lands as <identifier>_edges/_vertices/_degrees.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description="linkgraph build pipeline")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="parquet dir with pages(url, warc_ts, html, text, lang)")
    src.add_argument("--synth", type=int, help="generate N synthetic pages instead")
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--update",
        help="incremental mode: existing graph (dir or table:<id>) to "
        "merge the --pages/--synth snapshot into — re-crawled pages "
        "replace their out-edges, surviving urls keep their ids",
    )
    ap.add_argument("--buckets", type=int, default=None)
    ap.add_argument(
        "--anchors",
        help="also write the anchor-text corpus (src_url, dst_url, "
        "anchor) to this parquet dir / table:<id>",
    )
    ap.add_argument(
        "--host-graph",
        help="also write the host-level rollup (src_host, dst_host, "
        "weight) to this parquet dir / table:<id>",
    )
    ap.add_argument(
        "--diff",
        help="also write the edge-level diff vs this existing graph "
        "(dir or table:<id>) — (src, dst, change added|removed) over "
        "dense ids, plus a changed-edge summary in the output JSON",
    )
    args = ap.parse_args(argv)

    from linkgraph.build import (
        build_graph_from_pages,
        host_rollup,
        read_graph,
        update_graph,
        write_graph,
    )
    from linkgraph.session import get_spark

    spark = get_spark(app_name="linkgraph-build")
    phases = {}
    t0 = time.time()
    if args.synth:
        from linkgraph.datagen import PagesSpec, generate_pages

        pages = spark.createDataFrame(generate_pages(PagesSpec(n_pages=args.synth)))
    else:
        from linkgraph.io import read_pages

        pages = read_pages(spark, args.pages)
    phases["load"] = time.time() - t0

    t1 = time.time()
    if args.update:
        base = read_graph(spark, args.update)
        g = update_graph(base, pages, num_partitions=args.buckets)
    else:
        g = build_graph_from_pages(pages, num_partitions=args.buckets)
    phases["extract_build"] = time.time() - t1

    t2 = time.time()
    write_graph(g, args.output, buckets=args.buckets)
    phases["write"] = time.time() - t2

    if args.anchors:
        from linkgraph.extract import anchor_texts
        from linkgraph.io import write_table

        t4 = time.time()
        write_table(anchor_texts(pages), args.anchors)
        phases["anchors"] = time.time() - t4

    if args.host_graph:
        from linkgraph.io import write_table

        t3 = time.time()
        write_table(host_rollup(g), args.host_graph)
        phases["host_graph"] = time.time() - t3

    summary_extra = {}
    if args.diff:
        from linkgraph.build import edge_diff
        from linkgraph.io import write_table

        from pyspark.sql import functions as F

        t5 = time.time()
        base_g = read_graph(spark, args.diff)
        # compare at the URL level (dense ids are snapshot-local):
        # map both edge tables through their own vertex urls
        def _url_edges(gr):
            v = gr.vertices.select("id", "url")
            return (
                gr.edges.join(v.withColumnsRenamed({"id": "src", "url": "su"}), "src")
                .join(v.withColumnsRenamed({"id": "dst", "url": "du"}), "dst")
                .select(F.col("su").alias("src"), F.col("du").alias("dst"))
            )

        if "url" in g.vertices.columns and "url" in base_g.vertices.columns:
            d = edge_diff(_url_edges(base_g), _url_edges(g))
        else:
            d = edge_diff(base_g.edges, g.edges)
        write_table(d, f"{args.output.rstrip('/')}/diff" if not args.output.startswith("table:") else args.output + "_diff")
        counts = {r["change"]: r["c"] for r in d.groupBy("change").agg(F.count(F.lit(1)).alias("c")).collect()}
        summary_extra["diff"] = {
            "added": int(counts.get("added", 0)),
            "removed": int(counts.get("removed", 0)),
        }
        phases["diff"] = time.time() - t5

    print(json.dumps({"n": g.n, "m": g.m, "output": args.output,
                      **summary_extra,
                      "phases": {k: round(v, 3) for k, v in phases.items()}}))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
