"""Structured Streaming jobs over page/document/event streams.

    spark-submit --py-files dist/linkgraph.zip jobs/run_stream.py
      --op edges    --pages <parquet dir>  --sink <dir> --ckpt <dir>
      --op dedup    --docs <parquet dir>   --sink <dir> --ckpt <dir>
                    [--horizon '1 hour'] [--glob documents.parquet]
      --op sessions --events <parquet dir> --sink <dir> --ckpt <dir>

Each op wires the corresponding linkgraph.streaming transform to a
file source and a parquet sink and drains with availableNow (swap the
source/sink for kafka/iceberg in deployment; `--continuous` keeps the
query running instead). `--glob` filters files inside the source dir
(the testdata layout keeps several tables in one directory).

edges    — pages stream -> Arrow-extracted href-edge append log
dedup    — first-arrival content-hash dedup within --horizon
           (dropDuplicatesWithinWatermark; event time = doc_id
           seconds above an epoch offset)
sessions — watermarked 30-min session windows per user

Packaged-for-spark-submit per BASELINE.json:6.
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import functions as F

from linkgraph.session import get_spark
from linkgraph.streaming import (
    enrich_events,
    trending_counts,
    dedup_stream,
    page_stream_to_edges,
    read_page_stream,
    sessionize_events,
)

_TS_BASE = 1_000_000_000  # keep synthetic event times above the epoch-0 watermark


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--op", required=True, choices=["edges", "dedup", "sessions", "trending", "enrich"])
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="pages parquet dir (url, warc_ts, html, text, lang)")
    src.add_argument("--docs", help="documents parquet dir (doc_id, text, ...)")
    src.add_argument("--events", help="events parquet dir (event_id, ts, user_id, ...)")
    ap.add_argument("--sink", required=True, help="output parquet dir")
    ap.add_argument("--ckpt", required=True, help="streaming checkpoint dir")
    ap.add_argument("--glob", help="pathGlobFilter inside the source dir")
    ap.add_argument("--horizon", default="1 hour", help="dedup watermark horizon")
    ap.add_argument("--continuous", action="store_true",
                    help="keep running instead of draining availableNow")
    args = ap.parse_args(argv)
    spark = get_spark(app_name=f"linkgraph-stream-{args.op}")
    t0 = time.time()

    if args.op == "edges":
        if not args.pages:
            ap.error("--op edges needs --pages")
        out = page_stream_to_edges(read_page_stream(spark, args.pages))
    elif args.op == "dedup":
        if not args.docs:
            ap.error("--op dedup needs --docs")
        reader = spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        if args.glob:
            reader = reader.option("pathGlobFilter", args.glob)
        docs = reader.parquet(args.docs)
        out = dedup_stream(
            docs.select(
                "doc_id",
                F.md5("text").alias("content_md5"),
                F.timestamp_seconds(F.col("doc_id") + F.lit(_TS_BASE)).alias("ts"),
            ),
            ["content_md5"],
            "ts",
            args.horizon,
        )
    elif args.op == "enrich":
        if not args.events:
            ap.error("--op enrich needs --events")
        reader = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        if args.glob:
            reader = reader.option("pathGlobFilter", args.glob)
        # demo dim: user_id % 4 tiers
        dim = spark.createDataFrame(
            [(i, f"tier{i}") for i in range(4)], "tier long, tier_name string"
        )
        out = enrich_events(
            reader.parquet(args.events).withColumn(
                "tier", F.col("user_id") % 4
            ),
            dim, "tier", how="inner",
        )
    elif args.op == "trending":
        if not args.events:
            ap.error("--op trending needs --events")
        reader = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        if args.glob:
            reader = reader.option("pathGlobFilter", args.glob)
        out = trending_counts(
            reader.parquet(args.events)
            .select("ts", F.regexp_extract("props", r'"k": ([0-9]+)', 1)
                    .cast("long").alias("item")),
            window="1 day", watermark="1 hour",
        )
    else:
        if not args.events:
            ap.error("--op sessions needs --events")
        reader = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        if args.glob:
            reader = reader.option("pathGlobFilter", args.glob)
        out = sessionize_events(reader.parquet(args.events))

    writer = (
        out.writeStream.format("parquet")
        .option("path", args.sink)
        .option("checkpointLocation", args.ckpt)
        .outputMode("append")
    )
    if not args.continuous:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if args.continuous:
        q.awaitTermination()
    else:
        q.awaitTermination(600)
    rows = spark.read.parquet(args.sink).count()
    print({"op": args.op, "sink_rows": rows, "wall_s": round(time.time() - t0, 3)})
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
