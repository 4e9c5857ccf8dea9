"""Deterministic corpus sampling — the reproducibility primitive every
training-data pipeline needs: the same (seed, rate) must select the
same documents on every run, on any cluster layout, in any engine.
(Spark's df.sample() is partition-layout-dependent and can't be
reproduced by an external oracle; this is the standard hash-threshold
alternative, e.g. the `hash(id) % N < k` idiom of web-corpus
pipelines.)

Selection rule: a document is kept iff
    h32(seed || ':' || doc_id) < rate * 2^32
where h32 is the md5-prefix hash shared with pipeline/dedup.py — a
pure string/arith expression identical in Spark and ANSI SQL, so the
oracle reproduces the exact membership, not just the rate. The rate
is honored in expectation (md5 is uniform); membership is exact and
stable under repartitioning, inserts, and engine changes.

`stratified_sample` applies a per-stratum rate (e.g. per language:
keep 100% of low-resource languages, 5% of English) — the standard
corpus-balancing op — with one expression per stratum folded into a
CASE; unlisted strata default to `default_rate`.

Scale shape: a single whole-stage-codegen filter over the scan — no
shuffle, no state, trivially 100 TB-safe; the filter pushes nothing to
parquet (md5 of a derived string) but evaluates in the same scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_SPACE = 1 << 32


def _keep(id_col: Column, rate: float, seed: int) -> Column:
    """h32(seed:id) < rate * 2^32 — deterministic membership."""
    key = F.concat(F.lit(f"{seed}:"), id_col.cast("string"))
    h = F.conv(F.substring(F.md5(F.encode(key, "utf-8")), 1, 8), 16, 10).cast(
        "long"
    )
    return h < int(rate * HASH_SPACE)


def hash_sample(
    docs: DataFrame,
    rate: float,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep ~rate of rows, deterministically by id hash."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return docs.where(_keep(F.col(id_col), rate, seed))


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    default_rate: float = 0.0,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic sampling (corpus balancing): rows in
    stratum s are kept at rates[s] (default_rate otherwise), selected
    by the same seeded id hash so membership is engine-reproducible."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    threshold = F.lit(int(default_rate * HASH_SPACE))
    for s, r in sorted(rates.items()):
        threshold = F.when(
            F.col(stratum_col) == F.lit(s), F.lit(int(r * HASH_SPACE))
        ).otherwise(threshold)
    key = F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    h = F.conv(F.substring(F.md5(F.encode(key, "utf-8")), 1, 8), 16, 10).cast(
        "long"
    )
    return docs.where(h < threshold)


def group_capped_sample(
    docs: DataFrame,
    group_col: str,
    per_group: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most `per_group` rows per `group_col` value — the
    per-domain/per-host cap every crawl-derived corpus applies so one
    mega-site cannot dominate training data (the classic CC-pipeline
    host cap; same shape as cluster_balanced_sample's second stage but
    keyed on an EXISTING column, no kmeans index).

    Selection within a group ranks by the seeded md5-prefix id hash
    shared with hash_sample (ties by id) — deterministic, layout- and
    engine-independent: the kept set is exactly reproducible by a SQL
    ROW_NUMBER. Different seeds keep different representatives;
    membership is stable under repartitioning.

    Scale shape: ONE rank window keyed on the group column — the
    shuffle is on `group_col`, the per-group work is a bounded sort.
    A pathologically hot group is one partition's sort, not a join
    blowup; groups are typically hosts (millions of them), so the
    shuffle is well-spread.
    """
    if per_group < 1:
        raise ValueError(f"per_group must be >= 1, got {per_group}")
    from pyspark.sql import Window

    key = F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    h = F.conv(F.substring(F.md5(F.encode(key, "utf-8")), 1, 8), 16, 10).cast(
        "long"
    )
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= per_group)
        .drop("_rk")
    )


def fold_split(
    docs: DataFrame,
    folds: dict[str, float],
    seed: int = 0,
    id_col: str = "doc_id",
    fold_col: str = "fold",
) -> DataFrame:
    """Deterministic train/val/test (or any k-way) fold assignment —
    the split every training-data pipeline needs to be REPRODUCIBLE:
    re-running the pipeline, adding documents, or changing partition
    layout must never move an existing document between folds (a val
    document leaking into train on a re-shard is a silent eval bug).

    Each document's fold is decided by where its seeded md5-prefix id
    hash (shared with hash_sample) lands among cumulative fraction
    boundaries over the [0, 2^32) hash space: fold i covers
    [cum_i * 2^32, cum_{i+1} * 2^32). Fractions must sum to 1 (within
    1e-9); boundaries are exact int64 literals so the assignment is
    engine-reproducible bit-for-bit. Folds are disjoint and exhaustive
    BY CONSTRUCTION — one row in, one (row, fold) out.

    Iteration order of `folds` fixes boundary order (Python dicts
    preserve insertion order); the same dict always yields the same
    split. Scale shape: one codegen projection — no shuffle, no state,
    trivially 100 TB-safe.
    """
    if not folds:
        raise ValueError("folds must be non-empty")
    total = sum(folds.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fold fractions must sum to 1, got {total}")
    for name, frac in folds.items():
        if frac <= 0.0:
            raise ValueError(f"fold {name!r} must have positive fraction")
    key = F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    h = F.conv(F.substring(F.md5(F.encode(key, "utf-8")), 1, 8), 16, 10).cast(
        "long"
    )
    names = list(folds)
    # exact int64 boundaries; the last fold absorbs the rounding tail
    # so the cover of [0, 2^32) is exhaustive regardless of float error.
    bounds: list[int] = []
    cum = 0.0
    for name in names[:-1]:
        cum += folds[name]
        bounds.append(int(cum * HASH_SPACE))
    # ascending CASE chain: the first (smallest) matching boundary wins
    expr = F.lit(names[-1])
    for name, b in reversed(list(zip(names[:-1], bounds))):
        expr = F.when(h < F.lit(b), F.lit(name)).otherwise(expr)
    return docs.withColumn(fold_col, expr)


def weighted_sample(
    docs: DataFrame,
    weight_col: str,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Importance sampling: each row is kept with ITS OWN probability
    — `weight_col` clamped to [0, 1] — selected by the same seeded
    md5-prefix id hash as hash_sample (the DCLM-style quality-weighted
    corpus resampling move: keep probability proportional to a quality
    score). Membership is exact, engine-reproducible, and stable under
    repartitioning; E[kept] = Σ clamp(w). Same one-codegen-filter
    100 TB profile as hash_sample.

    Cross-engine note: the comparison is int64 h < w·2^32 with w·2^32
    ONE double product — both sides exactly agree (h ≤ 2^32 is
    double-exact; the product is a single correctly-rounded op)."""
    key = F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    h = F.conv(F.substring(F.md5(F.encode(key, "utf-8")), 1, 8), 16, 10).cast(
        "long"
    )
    p = F.least(
        F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)), F.lit(1.0)
    )
    return docs.where(h < p * F.lit(float(HASH_SPACE)))
