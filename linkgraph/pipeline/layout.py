"""Data-layout keys: Z-order (Morton) interleaving — the multi-column
clustering trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`: sorting or
range-partitioning by the interleaved key co-locates rows that are
close in EVERY keyed dimension, so min/max row-group pruning works for
predicates on any of them (not just the leading sort column).

The key is pure bit arithmetic on the low `bits` of each column —
int64-exact, engine-portable, ORDER-preserving per dimension within
the masked range. Callers who need full-range keys should pre-rank
columns into [0, 2^bits); the raw low-bit form here is the layout
primitive (and what the oracle can replay bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_expr(cols: list[str], bits: int) -> Column:
    """The interleaved key as a single int64 expression:
    bit i of column c lands at position i*len(cols) + c. With
    len(cols)·bits ≤ 62 the result stays non-negative int64."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs at least 2 columns")
    if bits < 1 or n * bits > 62:
        raise ValueError("need 1 <= bits and len(cols)*bits <= 62")
    terms = []
    for c_idx, c in enumerate(cols):
        for i in range(bits):
            terms.append(
                f"(shiftleft(shiftright(CAST({c} AS BIGINT), {i}) & CAST(1 AS BIGINT), "
                f"{i * n + c_idx}))"
            )
    return F.expr(" + ".join(terms))


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    out_col: str = "zkey",
) -> DataFrame:
    """Append the Z-order key column (one codegen projection, zero
    shuffle). Layout usage at scale:
    ``df.repartitionByRange(P, "zkey").sortWithinPartitions("zkey")
    .write...`` — every keyed column then prunes on parquet min/max.
    Columns must be non-negative; only the low `bits` participate
    (mask documented in zorder_expr)."""
    return df.withColumn(out_col, zorder_expr(cols, bits))
