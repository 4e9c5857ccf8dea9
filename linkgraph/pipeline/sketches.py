"""Streaming-summable sketches over the corpus, built exact-integer so
the oracles reproduce them bit-for-bit:

* Count-Min (Cormode & Muthukrishnan JAlg'05): depth×width int64
  counter grid over tokens; point estimates = min over rows — never
  under the true count, overestimates bounded by n/width per row.
* HyperLogLog-style distinct sketch (Flajolet et al. AofA'07): 2^b
  max-of-rho registers. The register table is pure int64 algebra; the
  harmonic mean is computed on the SCALED-integer form
  Z = Σ 2^(S − reg) (shiftright — exact, order-independent), so the
  estimate is ONE float expression over exact int64s (the modularity
  exact=True move) and survives ROUND(9) on any engine.

Both sketches are mergeable across partitions/batches by construction
(SUM for CMS, MAX for HLL registers) — the property that makes them
the 100 TB cardinality/frequency primitives; Spark's built-ins
(approx_count_distinct) use engine-private hashing and can't be
oracle-checked, which is why these are hand-rolled on the shared
seeded md5-prefix hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# S: rho window bits for the 60-bit md5 prefix minus b bucket bits
# must satisfy S + b <= 60; S also scales Z (Σ ≤ m·2^(S-1) < 2^63)
_HLL_HASH_HEX = 15  # 60-bit prefix


def _h(key: Column, hex_digits: int) -> Column:
    """Seeded md5-prefix integer hash — the engine-portable idiom
    shared with pipeline/sampling.py (DuckDB twin:
    ('0x' || substr(md5(k), 1, n))::BIGINT)."""
    return F.conv(
        F.substring(F.md5(F.encode(key, "utf-8")), 1, hex_digits), 16, 10
    ).cast("long")


def _tokens(docs: DataFrame) -> DataFrame:
    w = F.split(F.trim(F.col("text")), r"\s+")
    return (
        docs.where(F.length(F.trim(F.col("text"))) > 0)
        .select(F.explode(w).alias("term"))
    )


def count_min_sketch(
    docs: DataFrame,
    depth: int = 4,
    width: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """Build the CMS counter grid over whitespace tokens:
    (d, bucket, cnt) with bucket_d(t) = h32("seed:d:" || t) % width.

    Scale shape: explode(tokens) × depth, then ONE hash groupBy onto
    ≤ depth·width keys — map-side combine collapses the shuffle to
    P·depth·width rows regardless of corpus size; the sketch itself
    is driver-scale and mergeable by SUM."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    key = F.concat(
        F.lit(f"{int(seed)}:"), F.col("d").cast("string"), F.lit(":"), F.col("term")
    )
    return (
        _tokens(docs)
        .select("term", d)
        .select("d", (_h(key, 8) % width).alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("d").cast("long").alias("d"),
            F.col("bucket").cast("long").alias("bucket"),
            F.col("cnt").cast("long").alias("cnt"),
        )
    )


def cms_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    depth: int = 4,
    width: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """Point-query the CMS: (term, cms_est) with est = min over the
    depth rows — ≥ the true count always (the CMS guarantee). terms:
    a (term string) frame; the sketch side is ≤ depth·width rows so
    the join broadcasts."""
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    key = F.concat(
        F.lit(f"{int(seed)}:"), F.col("d").cast("string"), F.lit(":"), F.col("term")
    )
    probes = terms.select("term", d).select(
        "term", "d", (_h(key, 8) % width).alias("bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_est"))
    )


def hll_distinct(
    values: DataFrame,
    col: str = "term",
    b: int = 8,
    seed: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Distinct-count sketch: returns (registers, estimate).

    registers: (bucket long, reg long) — reg = max over values hashed
      to the bucket of rho(w), the 1-based position of the first set
      bit from the top of the (60−b)-bit hash remainder; empty
      buckets carry reg = 0. Pure int64 algebra (the bin()-length
      trick shared with degree_distribution) — mergeable by MAX.
    estimate: ONE row (m, z_scaled, zero_buckets, estimate) where
      z_scaled = Σ_buckets 2^S >> reg (S = 60 − b; exact int64,
      order-independent) and
      estimate = alpha_m · m² · 2^S / z_scaled — with the standard
      linear-counting fallback m·ln(m/V) when E ≤ 2.5m and V > 0
      (Flajolet et al. §4). One float expression over exact ints,
      ROUND(9).

    Scale shape: one hash groupBy onto 2^b keys with map-side
    combine; everything after is driver-scale."""
    if not 4 <= b <= 16:
        raise ValueError("b must be in [4, 16]")
    m = 1 << b
    S = 60 - b
    spark = values.sparkSession
    key = F.concat(F.lit(f"{int(seed)}:"), F.col(col).cast("string"))
    h = _h(key, _HLL_HASH_HEX)
    # bucket/remainder split in EXACT bit arithmetic (double division
    # would lose bits: h < 2^60 > 2^53 mantissa)
    w = F.shiftright(h, b)
    # rho = S - (position of highest set bit) = S - (length(bin(w))-1)
    # for w > 0; w == 0 -> rho = S + 1 (all S remainder bits zero)
    rho = F.when(
        F.col("w") > 0, F.lit(S) - (F.length(F.expr("bin(w)")) - 1)
    ).otherwise(F.lit(S + 1))
    got = (
        values.select(h.bitwiseAND(m - 1).alias("bucket"), w.alias("w"))
        .select("bucket", rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
    )
    all_buckets = spark.range(m).select(F.col("id").alias("bucket"))
    registers = (
        all_buckets.join(F.broadcast(got), "bucket", "left")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.coalesce(F.col("reg"), F.lit(0)).cast("long").alias("reg"),
        )
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = registers.agg(
        F.lit(m).cast("long").alias("m"),
        F.sum(F.expr(f"shiftright(CAST({1 << S} AS BIGINT), CAST(reg AS INT))"))
        .cast("long")
        .alias("z_scaled"),
        F.sum(F.when(F.col("reg") == 0, 1).otherwise(0)).cast("long")
        .alias("zero_buckets"),
    ).select(
        "m",
        "z_scaled",
        "zero_buckets",
        F.round(
            F.when(
                (
                    F.lit(alpha) * m * m * float(1 << S) / F.col("z_scaled")
                    <= 2.5 * m
                )
                & (F.col("zero_buckets") > 0),
                F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zero_buckets")),
            ).otherwise(
                F.lit(alpha) * m * m * float(1 << S) / F.col("z_scaled")
            ),
            9,
        ).alias("estimate"),
    )
    return registers, est


def word_trigrams(docs: DataFrame) -> DataFrame:
    """(term string) frame of word 3-grams — the cardinality carrier
    for hll_distinct on a small-vocabulary corpus (single words
    collapse to the vocab size; trigrams span the n-gram space)."""
    w = F.split(F.trim(F.col("text")), r"\s+")
    tri = F.expr(
        "transform(sequence(0, size(w) - 3), i ->"
        " concat(w[i], ' ', w[i + 1], ' ', w[i + 2]))"
    )
    return (
        docs.select(w.alias("w"))
        .where(F.size("w") >= 3)
        .select(F.explode(tri).alias("term"))
    )


def hll_distinct_by(
    values: DataFrame,
    group_col: str,
    col: str = "term",
    b: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Grouped HLL: approximate distinct count PER GROUP (distinct
    visitors per page, distinct n-grams per language) — the
    production shape of the sketch. Same hash / bit split / rho /
    scaled-integer harmonic mean as hll_distinct, with registers
    keyed (group, bucket): ONE hash groupBy onto |groups|·2^b keys
    (map-side combine), then one per-group agg folds the m registers
    — empty buckets enter the fold as (m − occupied) · 2^S without
    materializing them. Same mergeability (MAX per (group, bucket))
    and the same exact-int64-then-one-float-expression contract."""
    if not 4 <= b <= 16:
        raise ValueError("b must be in [4, 16]")
    m = 1 << b
    S = 60 - b
    key = F.concat(F.lit(f"{int(seed)}:"), F.col(col).cast("string"))
    h = _h(key, _HLL_HASH_HEX)
    w = F.shiftright(h, b)
    rho = F.when(
        F.col("w") > 0, F.lit(S) - (F.length(F.expr("bin(w)")) - 1)
    ).otherwise(F.lit(S + 1))
    regs = (
        values.select(
            F.col(group_col).alias("grp"), h.bitwiseAND(m - 1).alias("bucket"),
            w.alias("w"),
        )
        .select("grp", "bucket", rho.alias("rho"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("reg"))
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = regs.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("occupied"),
        F.sum(F.expr(f"shiftright(CAST({1 << S} AS BIGINT), CAST(reg AS INT))"))
        .cast("long")
        .alias("z_occ"),
    )
    # empty buckets: reg = 0 -> each contributes 2^S to Z and one
    # zero-bucket; fold them in arithmetically
    z = (F.col("z_occ") + (F.lit(m) - F.col("occupied")) * F.lit(1 << S)).cast(
        "long"
    )
    zero = (F.lit(m) - F.col("occupied")).cast("long")
    return agg.select(
        F.col("grp").alias(group_col),
        F.lit(m).cast("long").alias("m"),
        z.alias("z_scaled"),
        zero.alias("zero_buckets"),
        F.round(
            F.when(
                (
                    F.lit(alpha) * m * m * float(1 << S) / z
                    <= 2.5 * m
                )
                & (zero > 0),
                F.lit(float(m)) * F.log(F.lit(float(m)) / zero),
            ).otherwise(F.lit(alpha) * m * m * float(1 << S) / z),
            9,
        ).alias("estimate"),
    )
