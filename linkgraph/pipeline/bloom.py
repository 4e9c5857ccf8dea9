"""Bloom filter build/probe (Bloom CACM'70) — the membership /
join-pruning primitive at 100 TB (engines push Bloom filters into
scans to skip row groups; a crawl pipeline uses them to pre-filter
"have I seen this URL/content-hash" before the expensive join).

Deterministic and engine-exact by construction: k bit positions per
key from the shared seeded md5-prefix hash, the bit array stored as
32-BIT words inside int64 rows (bit 63 is untouchable portably —
DuckDB raises on 1 << 63, measured), merged with BIT_OR. Build is ONE
hash groupBy onto m/32 keys with map-side combine (P·m/32 shuffle
rows at any corpus size); filters from different corpus shards merge
by another BIT_OR — the sketches.py mergeability contract.

Guarantees: NO false negatives ever (pinned in pytest); false
positives at the standard (1 − e^{−kn/m})^k rate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD_BITS = 32


def _positions(value: Column, k: int, m_bits: int, seed: int) -> Column:
    """Array of k bit positions for a value: h32("seed:j:" || v) % m."""
    return F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(
                        F.encode(
                            F.concat(
                                F.lit(f"{int(seed)}:{j}:"), value.cast("string")
                            ),
                            "utf-8",
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % m_bits
            for j in range(k)
        ]
    )


def bloom_build(
    df: DataFrame,
    col: str,
    m_bits: int = 4096,
    k: int = 3,
    seed: int = 0,
) -> DataFrame:
    """Build the filter: (word long, bits long) rows, word = bit
    position DIV 32, bits = BIT_OR of 1 << (position % 32). Words
    with no set bits are absent (probe treats absent as zero)."""
    if m_bits < _WORD_BITS or m_bits % _WORD_BITS != 0:
        raise ValueError("m_bits must be a positive multiple of 32")
    if not 1 <= k <= 16:
        raise ValueError("k must be in [1, 16]")
    pos = F.explode(_positions(F.col(col), k, m_bits, seed)).alias("p")
    return (
        df.select(pos)
        .select(
            F.expr(f"CAST(p DIV {_WORD_BITS} AS BIGINT)").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(p % {_WORD_BITS} AS INT))"
            ).alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    )


def bloom_probe(
    bloom: DataFrame,
    probes: DataFrame,
    col: str,
    m_bits: int = 4096,
    k: int = 3,
    seed: int = 0,
) -> DataFrame:
    """Probe: (value, maybe_member boolean) — true iff ALL k bits are
    set. The filter is ≤ m/32 rows and broadcasts; per probe the k
    positions explode, join their words, and a MIN over the bit tests
    implements the AND — one broadcast join, no shuffle of the probe
    side beyond the final per-value agg."""
    pos = F.posexplode(_positions(F.col("value"), k, m_bits, seed)).alias("j", "p")
    probed = (
        probes.select(F.col(col).alias("value"))
        .distinct()
        .select("value", pos)
        .select(
            "value",
            F.expr(f"CAST(p DIV {_WORD_BITS} AS BIGINT)").alias("word"),
            (F.col("p") % _WORD_BITS).cast("int").alias("bit"),
        )
        .join(F.broadcast(bloom), "word", "left")
        .select(
            "value",
            F.expr(
                "shiftright(coalesce(bits, CAST(0 AS BIGINT)), bit) & CAST(1 AS BIGINT)"
            ).alias("hit"),
        )
    )
    return probed.groupBy("value").agg(
        (F.min("hit") == 1).alias("maybe_member")
    )
