"""Event-log product analytics: conversion funnels and retention
cohorts — the two bread-and-butter OLAP queries an events table
implies (the batch twins of streaming.sessionize_events' world).

Both operate on int64 epoch-micros (unix_micros over a cast that
accepts TIMESTAMP_NTZ under the engine's pinned UTC session timezone)
and emit ONLY int64 columns — hash-exact across engines with no
tolerance.

Scale shape: funnel is `len(steps)` user-keyed equi-join + min-agg
rounds (steps is small and fixed — the plan is a short static chain,
no iteration state); retention is one scan + two hash aggs, both
map-side combined. No windows, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _micros(events: DataFrame) -> DataFrame:
    return events.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_type",
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    horizon_minutes: int | None = None,
) -> DataFrame:
    """Strict-order conversion funnel: a user completes step k at the
    EARLIEST event of type steps[k] strictly after their step-k-1
    completion (classic first-touch semantics); `horizon_minutes`
    optionally bounds the whole funnel from the step-1 completion.

    Output: (step, event_type, users) — step 1..len(steps), users =
    how many users reached that step."""
    if not steps:
        raise ValueError("steps must be non-empty")
    if horizon_minutes is not None and horizon_minutes < 1:
        raise ValueError(
            f"horizon_minutes must be >= 1, got {horizon_minutes}"
        )
    from linkgraph.checkpoint import sever

    ev = _micros(events)
    spark = events.sparkSession
    cur = sever(
        ev.where(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("us").alias("t"))
        .select("user_id", "t", F.col("t").alias("t0"))
    )
    counts = [(1, steps[0], cur.count())]
    for k, step in enumerate(steps[1:], start=2):
        nxt = ev.where(F.col("event_type") == step).join(cur, "user_id")
        nxt = nxt.where(F.col("us") > F.col("t"))
        if horizon_minutes is not None:
            nxt = nxt.where(
                F.col("us") <= F.col("t0") + F.lit(horizon_minutes * 60_000_000)
            )
        cur = sever(
            nxt.groupBy("user_id", "t0")
            .agg(F.min("us").alias("t"))
            .select("user_id", "t", "t0")
        )
        counts.append((k, step, cur.count()))
    return spark.createDataFrame(
        counts, "step long, event_type string, users long"
    )


def retention_cohorts(events: DataFrame, period_days: int = 7) -> DataFrame:
    """Cohort retention matrix: cohort = a user's first active period
    (absolute floor(epoch_us / period) index), offset = periods since
    the cohort period. Output: (cohort, offset, users) — all int64.

    One scan → distinct (user, period) → min-period per user →
    (cohort, offset) count. The standard triangle: offset 0 rows equal
    cohort sizes."""
    if period_days < 1:
        raise ValueError(f"period_days must be >= 1, got {period_days}")
    period_us = period_days * 86_400 * 1_000_000
    # integer division (div), not floor(x / y): float division can
    # round across the boundary at scale; div is exact on both engines
    active = (
        _micros(events)
        .select("user_id", F.expr(f"us div {period_us}").alias("period"))
        .distinct()
    )
    first = active.groupBy("user_id").agg(F.min("period").alias("cohort"))
    return (
        active.join(first, "user_id")
        .groupBy(
            "cohort", (F.col("period") - F.col("cohort")).alias("offset")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("users"))
        .select(
            F.col("cohort").cast("long").alias("cohort"),
            F.col("offset").cast("long").alias("offset"),
            "users",
        )
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition table over per-user event
    streams: (from_type, to_type, cnt, prob) with prob = cnt /
    Σ_to cnt — the click-path model behind next-action prediction and
    funnel-leak diagnosis. Successor = the user's next event in
    (ts, event_id) order (the id tie-break makes simultaneous events
    deterministic, the funnel_counts discipline).

    Scale shape: ONE per-user LEAD window (partition size = events per
    user — the covisit/funnel bound) + one hash groupBy on the tiny
    (from, to) key space + a broadcast join for the from-marginal;
    prob is ONE fixed-order double division of exact int64 counts —
    hash-exact, no rounding."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    marg = pairs.groupBy("from_type").agg(F.sum("cnt").alias("total"))
    return pairs.join(F.broadcast(marg), "from_type").select(
        "from_type",
        "to_type",
        "cnt",
        (F.col("cnt").cast("double") / F.col("total").cast("double")).alias("prob"),
    )


def session_paths(
    events: DataFrame,
    gap_minutes: int = 30,
    max_len: int = 8,
    k: int = 50,
) -> DataFrame:
    """Top-k session paths — the most common event-type sequences per
    session (the path-mining view funnel_counts aggregates away):

      (path, n_sessions, rank)

    Sessions by the covisit gaps-and-islands rule (epoch-us gap on a
    per-user window); the path is the session's first `max_len` event
    types in (ts, event_id) order joined with '>' (the truncation
    bound keeps the path string — and the groupBy key — bounded on
    pathological sessions). Strings + int64 with a deterministic
    (count DESC, path) rank — hash-exact.

    Scale shape: one per-user window pass (sessionize + order), one
    per-session collect_list (bounded by max_len after slice), one
    hash groupBy on the path key, one top-k rank over ≤ distinct-path
    rows."""
    if gap_minutes < 1 or max_len < 1 or k < 1:
        raise ValueError("gap_minutes, max_len and k must be >= 1")
    from pyspark.sql import Window

    gap_us = gap_minutes * 60 * 1_000_000
    ev = events.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    new_s = (
        F.coalesce(
            (F.col("us") - F.lag("us").over(w)) >= F.lit(gap_us), F.lit(True)
        )
    ).cast("long")
    sess = ev.select(
        "user_id", "us", "event_id", "event_type",
        F.sum(new_s).over(w).alias("session_id"),
    )
    paths = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.expr(
                f"array_join(slice(transform(array_sort(collect_list("
                f"struct(us, event_id, event_type))), s -> s.event_type),"
                f" 1, {max_len}), '>')"
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    )
    ranked = (
        paths.orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(k)
        .select(
            "path",
            "n_sessions",
            F.row_number()
            .over(Window.orderBy(F.desc("n_sessions"), F.asc("path")))
            .cast("long")
            .alias("rank"),
        )
    )
    return ranked
