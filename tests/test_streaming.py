"""Structured Streaming paths vs their batch twins: the availableNow
drain of each streaming query must equal the equivalent batch
computation exactly (same extractor, same aggregation semantics)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from linkgraph.datagen import PagesSpec, generate_pages
from linkgraph.extract import extract_pages
from linkgraph.streaming import (
    PAGES_SCHEMA,
    page_stream_to_edges,
    read_page_stream,
    running_out_degrees,
    sessionize_events,
    stream_pages_to_edges,
)


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    """Two parquet files of deterministic synthetic pages — two
    micro-batches worth of 'arriving' crawl data."""
    root = tmp_path_factory.mktemp("pages_stream")
    pdf = generate_pages(PagesSpec(n_pages=120))
    a = spark.createDataFrame(pdf.iloc[:60], schema=PAGES_SCHEMA)
    b = spark.createDataFrame(pdf.iloc[60:], schema=PAGES_SCHEMA)
    a.coalesce(1).write.mode("overwrite").parquet(str(root / "batch_a"))
    b.coalesce(1).write.mode("append").parquet(str(root / "batch_a"))
    yield str(root / "batch_a")


def test_stream_edges_equal_batch_extract(spark, pages_dir, tmp_path):
    """Draining the page stream writes exactly the edge rows the batch
    extractor derives (same Arrow UDF, byte-identical text path)."""
    sink = str(tmp_path / "edges")
    ckpt = str(tmp_path / "ckpt")
    q = stream_pages_to_edges(spark, pages_dir, sink, ckpt)
    q.awaitTermination(120)

    got = {
        (r["src_url"], r["dst_url"])
        for r in spark.read.parquet(sink).collect()
    }
    batch = extract_pages(spark.read.parquet(pages_dir))
    want = {
        (r["url"], r["dst_url"])
        for r in batch.select(
            "url", F.explode("hrefs").alias("dst_url")
        ).collect()
    }
    assert got == want
    assert len(got) > 0


def test_running_out_degrees_equal_batch_group_count(spark, pages_dir):
    """The stateful running-degree operator's final state equals the
    batch out-degree groupBy over the same edges."""
    stream = page_stream_to_edges(read_page_stream(spark, pages_dir))
    q = (
        running_out_degrees(stream)
        .writeStream.format("memory")
        .queryName("deg_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode may emit a row per microbatch; the LAST emit per key
    # is the running total — with availableNow over one directory all
    # data lands in one batch, but take max defensively (monotone)
    got = {
        r["src_url"]: r["out_deg"]
        for r in spark.sql(
            "SELECT src_url, MAX(out_deg) AS out_deg FROM deg_stream "
            "GROUP BY src_url"
        ).collect()
    }
    batch = extract_pages(spark.read.parquet(pages_dir))
    want = {
        r["src_url"]: r["out_deg"]
        for r in batch.select(
            F.col("url").alias("src_url"), F.explode("hrefs")
        )
        .groupBy("src_url")
        .agg(F.count("*").alias("out_deg"))
        .collect()
    }
    assert got == want


def test_sessionize_events_equals_batch_session_window(spark, tmp_path):
    """Watermarked streaming sessionization equals the batch
    session_window aggregation on a bounded input (every session
    finalizes once the stream drains)."""
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:10:00",  # same session (gap 30m)
                    "2024-01-01 01:30:00",  # new session
                    "2024-01-01 00:05:00",  # user 2
                ]
            ),
            "user_id": [1, 1, 1, 2],
            "value": [1.0, 2.0, 4.0, 8.0],
        }
    )
    src = str(tmp_path / "events")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "ts timestamp, user_id long, value double"
    ).parquet(src)
    q = (
        sessionize_events(stream)
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in spark.sql("SELECT * FROM sess_stream").collect()
    }
    want = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in sessionize_events(spark.read.parquet(src)).collect()
    }
    assert got == want
    assert len(got) == 3  # two sessions for user 1, one for user 2


def test_dedup_stream_drops_cross_batch_duplicates(spark, tmp_path):
    """First-arrival dedup across MULTIPLE microbatches: duplicates in
    a later file are dropped while within the horizon; the kept hash
    set equals the batch distinct set; unique rows all survive."""
    from linkgraph.streaming import dedup_stream

    src = str(tmp_path / "docs_stream")
    base = 1_000_000_000  # keep every ts above the initial epoch-0 watermark
    a = spark.createDataFrame(
        [(i, f"text-{i % 4}") for i in range(8)], "doc_id long, text string"
    )
    b = spark.createDataFrame(  # all duplicates of batch a's contents
        [(100 + i, f"text-{i % 4}") for i in range(8)], "doc_id long, text string"
    )
    a.coalesce(1).write.mode("overwrite").parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)  # force one file per microbatch
        .parquet(src)
        .select(
            F.md5("text").alias("content_md5"),
            F.timestamp_seconds(F.col("doc_id") + F.lit(base)).alias("ts"),
        )
    )
    name = "dedup_stream_test_sink"
    q = (
        dedup_stream(stream, ["content_md5"], "ts", "1 hour")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = spark.table(name).toPandas()
    want = {
        r["h"]
        for r in spark.read.parquet(src)
        .select(F.md5("text").alias("h"))
        .distinct()
        .collect()
    }
    # exactly one representative per distinct content hash
    assert sorted(kept["content_md5"]) == sorted(want)
    assert len(kept) == 4


def test_trending_counts_equals_batch_tumbling(spark, tmp_path):
    """Streaming tumbling-window counts equal the batch epoch-aligned
    window aggregation, including across microbatches
    (maxFilesPerTrigger=1, complete mode re-emits updated counts)."""
    from linkgraph.streaming import trending_counts

    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:10:00",
                    "2024-01-01 00:50:00",
                    "2024-01-01 01:10:00",
                    "2024-01-01 00:20:00",
                    "2024-01-01 02:05:00",
                ]
            ),
            "item": [7, 7, 7, 9, 9],
        }
    )
    src = str(tmp_path / "tr_events")
    # two files -> two microbatches under maxFilesPerTrigger=1
    spark.createDataFrame(pdf.iloc[:3]).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(pdf.iloc[3:]).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("ts timestamp, item long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        trending_counts(stream, window="1 hour", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("trending_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["item"]): r["cnt"]
        for r in spark.table("trending_stream_test").collect()
    }
    batch = (
        spark.createDataFrame(pdf)
        .groupBy(F.window("ts", "1 hour"), "item")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("window.start").alias("ws"), "item", "cnt")
    )
    want = {(r["ws"], r["item"]): r["cnt"] for r in batch.collect()}
    assert got == want
    # epoch-aligned: window starts sit on exact hour boundaries
    assert all(ws.minute == 0 and ws.second == 0 for ws, _ in got)


def test_enrich_events_stream_static_equals_batch(spark, tmp_path):
    """Stream-static join == the batch join, across microbatches;
    left vs inner semantics on missing dim keys; guard raises."""
    import pytest as _pytest

    from linkgraph.streaming import enrich_events

    ev = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01"] * 4),
            "item": [1, 2, 3, 2],
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    src = str(tmp_path / "enrich_events")
    spark.createDataFrame(ev.iloc[:2]).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(ev.iloc[2:]).coalesce(1).write.mode("append").parquet(src)
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "item long, name string")
    stream = (
        spark.readStream.schema("ts timestamp, item long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    for how, want_rows in (("inner", 3), ("left", 4)):
        qn = f"enrich_test_{how}"
        q = (
            enrich_events(stream, dim, "item", how=how)
            .writeStream.format("memory")
            .queryName(qn)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {(r["item"], r["v"], r["name"]) for r in spark.table(qn).collect()}
        batch = spark.createDataFrame(ev).join(dim, "item", how)
        want = {(r["item"], r["v"], r["name"]) for r in batch.collect()}
        assert got == want and len(got) == want_rows
    with _pytest.raises(ValueError):
        enrich_events(stream, dim, "item", how="full")


def _dedup_writer(spark, src, sink, ckpt, available_now=True):
    """dedup_stream wired to a parquet sink + real checkpointLocation
    (the restart tests reuse sink+ckpt across query generations)."""
    from linkgraph.streaming import dedup_stream

    base = 1_000_000_000  # keep every ts above the initial epoch-0 watermark
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)  # one file per microbatch
        .parquet(src)
        .select(
            F.md5("text").alias("content_md5"),
            F.timestamp_seconds(F.col("doc_id") + F.lit(base)).alias("ts"),
        )
    )
    w = (
        dedup_stream(stream, ["content_md5"], "ts", "1 hour")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def test_dedup_stream_restart_from_checkpoint(spark, tmp_path):
    """Kill-and-restart recovery (VERDICT r4 item 5): drain batch A,
    stop the query, append batch B whose rows duplicate A's contents,
    restart from the SAME checkpointLocation. B's duplicates must
    still be dropped — that happens ONLY if the dedup state store
    recovered from the checkpoint — and the final sink must equal an
    uninterrupted run over A+B."""
    src = str(tmp_path / "src")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    a = spark.createDataFrame(
        [(i, f"text-{i % 4}") for i in range(8)], "doc_id long, text string"
    )
    a.coalesce(1).write.mode("overwrite").parquet(src)

    q = _dedup_writer(spark, src, sink, ckpt)
    q.awaitTermination(120)
    assert len(spark.read.parquet(sink).collect()) == 4

    # batch B: 4 duplicates of A's contents + 2 genuinely new ones
    b = spark.createDataFrame(
        [(100 + i, f"text-{i % 4}") for i in range(4)]
        + [(200, "fresh-a"), (201, "fresh-b")],
        "doc_id long, text string",
    )
    b.coalesce(1).write.mode("append").parquet(src)

    q = _dedup_writer(spark, src, sink, ckpt)  # restart, same ckpt
    q.awaitTermination(120)
    got = sorted(
        r["content_md5"] for r in spark.read.parquet(sink).collect()
    )
    # exactly one row per distinct content across BOTH generations:
    # A's 4 + B's 2 new; B's duplicates died against recovered state
    assert len(got) == 6

    # uninterrupted control run over the identical source state
    sink2, ckpt2 = str(tmp_path / "sink2"), str(tmp_path / "ckpt2")
    q = _dedup_writer(spark, src, sink2, ckpt2)
    q.awaitTermination(120)
    want = sorted(
        r["content_md5"] for r in spark.read.parquet(sink2).collect()
    )
    assert got == want


def test_dedup_stream_kill_midstream_recovers(spark, tmp_path):
    """Harder variant: kill a RUNNING continuous query mid-stream
    (after >=1 microbatch of 8 queued single-row files), then restart
    from its checkpoint with an availableNow drain. The parquet sink's
    manifest log + recovered state must make the final output exactly
    equal the uninterrupted run — wherever the kill landed."""
    import time as _t

    src = str(tmp_path / "src")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    # 8 single-row files: contents cycle over 4 values -> 4 survivors
    for i in range(8):
        spark.createDataFrame(
            [(i, f"text-{i % 4}")], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(src)

    q = _dedup_writer(spark, src, sink, ckpt, available_now=False)
    deadline = _t.time() + 120
    while _t.time() < deadline:
        if q.lastProgress and q.lastProgress.get("numInputRows", 0) >= 0 \
                and q.recentProgress:
            break
        _t.sleep(0.2)
    q.stop()  # kill wherever processing stands
    q.awaitTermination(60)

    q = _dedup_writer(spark, src, sink, ckpt)  # resume + drain the rest
    q.awaitTermination(120)
    got = sorted(
        r["content_md5"] for r in spark.read.parquet(sink).collect()
    )

    sink2, ckpt2 = str(tmp_path / "sink2"), str(tmp_path / "ckpt2")
    q = _dedup_writer(spark, src, sink2, ckpt2)
    q.awaitTermination(120)
    want = sorted(
        r["content_md5"] for r in spark.read.parquet(sink2).collect()
    )
    assert len(want) == 4
    assert got == want
