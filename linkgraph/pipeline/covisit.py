"""Session co-visitation graph — the item-to-item collaborative-
filtering count table (Linden/Smith/York, IEEE Internet Computing'03)
built from a raw event log: items touched by the same user within the
same session become weighted edges, scored by Salton cosine
c_ab / (sqrt(c_a)·sqrt(c_b)). The natural events→graph bridge: the
output is an edge table every graph kernel in this engine accepts.

Sessionization is the gaps-and-islands rule shared with
streaming.sessionize_events (new session iff the gap to the previous
event is >= `gap_minutes`, session_window's half-open convention),
computed on int64 epoch-micros so both engines agree exactly.

Scale shape: two per-user windows (bounded state per user key), one
distinct, one per-session self-equi-join bounded by
`max_session_items` (the Σ k² power-session guard — the same
rationale as the LSH mega-bucket and link-prediction hub caps), then
pair/item hash aggs (map-side combined). Score is ONE fixed-order
expression over exact int64 counts, ROUND(9) — engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def covisitation(
    events: DataFrame,
    gap_minutes: int = 30,
    min_count: int = 2,
    max_session_items: int | None = None,
) -> DataFrame:
    """events: (user_id, ts timestamp, item) — any item type with a
    total order (ints or strings). Returns (item_a, item_b, cnt,
    score) with item_a < item_b, cnt >= min_count."""
    if gap_minutes < 1:
        raise ValueError(f"gap_minutes must be >= 1, got {gap_minutes}")
    if max_session_items is not None and max_session_items < 2:
        raise ValueError(
            f"max_session_items must be >= 2, got {max_session_items}"
        )
    from pyspark.sql import Window

    gap_us = gap_minutes * 60 * 1_000_000
    # cast accepts TIMESTAMP_NTZ parquet columns (identity under the
    # engine's pinned UTC session timezone — session.py)
    ev = events.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "item",
    )
    w = Window.partitionBy("user_id").orderBy("us", "item")
    new_s = (
        (F.col("us") - F.lag("us").over(w)) >= F.lit(gap_us)
    ).cast("long")
    sess = ev.select(
        "user_id",
        "item",
        F.sum(F.coalesce(new_s, F.lit(0)))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    items = sess.select("user_id", "session_id", "item").distinct()
    if max_session_items is not None:
        small = (
            items.groupBy("user_id", "session_id")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") <= max_session_items)
            .select("user_id", "session_id")
        )
        items = items.join(small, ["user_id", "session_id"], "left_semi")
    a = items.select("user_id", "session_id", F.col("item").alias("item_a"))
    b = items.select("user_id", "session_id", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, ["user_id", "session_id"])
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    marg = items.groupBy("item").agg(F.count(F.lit(1)).alias("m"))
    score = F.round(
        F.col("cnt")
        / (F.sqrt(F.col("ma").cast("double")) * F.sqrt(F.col("mb").cast("double"))),
        9,
    )
    return (
        pairs.where(F.col("cnt") >= min_count)
        .join(
            F.broadcast(marg.select(F.col("item").alias("item_a"), F.col("m").alias("ma"))),
            "item_a",
        )
        .join(
            F.broadcast(marg.select(F.col("item").alias("item_b"), F.col("m").alias("mb"))),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            F.col("cnt").cast("long").alias("cnt"),
            score.alias("score"),
        )
    )
