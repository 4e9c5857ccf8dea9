"""Redirect-chain resolution over a functional crawl graph — the
canonical-URL step of a web crawler: every crawled URL that answered
with a redirect maps to exactly one target; resolution follows chains
to their terminal (non-redirecting) URL and flags redirect loops.

The map (src -> dst, src unique) is a FUNCTIONAL graph, so resolution
is pointer doubling (the classic parallel list-ranking / shortcutting
primitive — Wyllie '79; the same technique as msf.py's contraction
pointer jumping): each round every unresolved row jumps through the
CURRENT state, doubling the distance covered, so any acyclic chain of
length L resolves in ceil(log2 L) + 1 rounds. Rows still pointing at a
redirecting URL after ceil(log2 n) + 1 rounds are provably on a cycle
(an acyclic chain cannot be longer than n) and are flagged instead of
resolved.

The reference engine at /root/reference/src has no redirect app; this
extends its algorithm family with the crawl-side op its edge tables
imply.

Output: (src, target, chain_len, is_cycle) — target/chain_len NULL on
cycle rows. All int64/bool — hash-exact across engines.

Scale shape: per round ONE self-equi-join of the state on the pointer
column + a severed materialization; O(log n) rounds total; no driver
state beyond the round counter and one count per round read off the
severed frame. At 100 TB the state is |redirects| rows wide and the
join is hash-partitioned on int64 keys — no skew beyond popular
redirect TARGETS, which pointer doubling erases after the first jump
(everything downstream of a hub points past it).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import sever


def resolve_redirects(
    redirects: DataFrame, max_rounds: int | None = None
) -> DataFrame:
    """Resolve every src in a functional redirect map to its terminal
    target. `redirects` must be (src, dst) with one row per src and
    src != dst (self-redirects are already loops; feed them as such
    and they come back is_cycle=true via the 1-cycle join).

    max_rounds defaults to ceil(log2 n) + 1 — the provable bound for
    acyclic chains; survivors are cycle members."""
    n = redirects.count()
    if n == 0:
        return redirects.sparkSession.createDataFrame(
            [], "src long, target long, chain_len long, is_cycle boolean"
        )
    rounds = (
        max_rounds
        if max_rounds is not None
        else max(1, int(math.ceil(math.log2(max(n, 2)))) + 1)
    )
    # state: src resolved up to ptr, d hops covered
    state = sever(
        redirects.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("ptr"),
            F.lit(1).cast("long").alias("d"),
        )
    )
    for _ in range(rounds):
        hop = state.select(
            F.col("src").alias("ptr"),
            F.col("ptr").alias("ptr2"),
            F.col("d").alias("d2"),
        )
        nxt = sever(
            state.join(hop, "ptr", "left").select(
                "src",
                F.coalesce("ptr2", "ptr").alias("ptr"),
                (F.col("d") + F.coalesce("d2", F.lit(0))).alias("d"),
            )
        )
        # unresolved count (pointer still names a redirecting URL),
        # read off the severed frame — zero means every chain ended
        active = nxt.join(
            redirects.select(F.col("src").alias("ptr")), "ptr", "left_semi"
        ).count()
        state = nxt
        if active == 0:
            break
    # survivors whose pointer is still a redirecting URL are on a cycle
    keys = redirects.select(F.col("src").alias("ptr")).distinct()
    flagged = state.join(keys.withColumn("_cyc", F.lit(True)), "ptr", "left")
    return flagged.select(
        "src",
        F.when(F.col("_cyc").isNull(), F.col("ptr")).alias("target"),
        F.when(F.col("_cyc").isNull(), F.col("d")).alias("chain_len"),
        F.coalesce("_cyc", F.lit(False)).alias("is_cycle"),
    )
