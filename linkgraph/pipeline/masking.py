"""Deterministic MLM masking (Devlin et al. NAACL'19 §3.1, the
mask-only subset): select ~rate of token positions per document and
replace them with a mask sentinel, emitting the (position, token)
labels the training objective predicts.

Selection is the engine's shared seeded md5-prefix membership idiom
(pipeline/sampling.py): position i of doc d masks iff
h32("seed:d:i") < rate·2^32 — EXACT membership, reproducible across
engines, partition layouts, and reruns (the property an RNG-based
masker lacks: re-generating a 100 TB training shard yields the same
examples bit-for-bit, so shards are resumable and auditable). The
BERT 80/10/10 mask/random/keep split is deliberately out of scope —
the random-replacement arm draws from a vocabulary distribution,
which belongs to the (stubbed-media-style) training loader, not the
corpus op; the mask-position selection IS the reproducibility-
critical part.

One whole-stage-codegen projection (split + two transform lambdas) —
no shuffle, no Python, trivially partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MASK = "[MASK]"
HASH_SPACE = 1 << 32


def mask_tokens(
    docs: DataFrame,
    rate: float = 0.15,
    seed: int = 0,
) -> DataFrame:
    """(doc_id, masked_text, labels, n_tokens, n_masked) — labels is
    the space-joined "pos:token" list for masked positions (ascending
    pos), masked_text the text with those tokens replaced by [MASK].
    Empty docs pass through with zero counts."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    thr = int(rate * HASH_SPACE)
    seed = int(seed)
    h = (
        f"conv(substr(md5(concat('{seed}:', CAST(doc_id AS STRING), ':',"
        f" CAST(i AS STRING))), 1, 8), 16, 10)"
    )
    base = docs.select(
        "doc_id",
        F.when(
            F.length(F.trim(F.col("text"))) == 0, F.array().cast("array<string>")
        )
        .otherwise(F.split(F.trim(F.col("text")), r"\s+"))
        .alias("w"),
    )
    masked = F.expr(
        f"array_join(transform(w, (t, i) -> "
        f"CASE WHEN {h} < {thr} THEN '{MASK}' ELSE t END), ' ')"
    )
    labels = F.expr(
        f"array_join(filter(transform(w, (t, i) -> "
        f"CASE WHEN {h} < {thr} THEN concat(CAST(i AS STRING), ':', t) END),"
        f" x -> x IS NOT NULL), ' ')"
    )
    n_masked = F.expr(
        f"size(filter(transform(w, (t, i) -> {h} < {thr}), x -> x))"
    )
    return base.select(
        "doc_id",
        masked.alias("masked_text"),
        labels.alias("labels"),
        F.size("w").cast("long").alias("n_tokens"),
        n_masked.cast("long").alias("n_masked"),
    )


def skipgram_pairs(
    docs: DataFrame,
    window: int = 2,
    min_count: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Skip-gram (center, context) pair counts (Mikolov et al.
    NIPS'13) — the word2vec training-data op, and (fed a walk corpus
    re-joined to text form) the DeepWalk/node2vec embedding-data op:

      (center, context, cnt) for all 1 ≤ |i − j| ≤ window, i ≠ j.

    Pair generation is ONE codegen projection (a nested flatten/
    transform over token positions — no join, no shuffle); the count
    is one hash groupBy with map-side combine over the vocab² key
    space. Deterministic strings + int64 — hash-exact. The fixed
    window (vs word2vec's RNG-shrunk window) is the deterministic
    variant, documented."""
    if window < 1 or min_count < 1:
        raise ValueError("window and min_count must be >= 1")
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    pairs = F.expr(
        f"flatten(transform(w, (t, i) -> "
        f"transform(filter(sequence(greatest(i - {window}, 0),"
        f" least(i + {window}, size(w) - 1)), j -> j != i),"
        f" j -> struct(t AS center, w[j] AS context))))"
    )
    return (
        docs.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(w.alias("w"))
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.center").alias("center"), F.col("p.context").alias("context"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )
