"""Distributed BPE merge learning (Sennrich, Haddow & Birch ACL'16 —
the tokenizer-training op; GPT-2's vocabulary is this algorithm over a
pre-tokenized corpus). Learns the top-k merges over word-frequency
state that stays DISTRIBUTED (at 100 TB the distinct-word table is
billions of rows; only the per-round argmax — one row — ever reaches
the driver, the pagerank-scalar pattern).

Determinism contract: greedy left-to-right merging, ties on the pair
count broken by (left, right) lexicographic order — replayable by the
oracle and by a sequential Python implementation.

The cross-engine trick is the symbol-string encoding

    R(symbols) = '~' + '~~'.join(symbols) + '~'

Every symbol occurrence is delimited by single '~' on each side, so
the pair (a, b) appears EXACTLY as the substring '~a~~b~' — it cannot
false-match across symbol boundaries ('~xa~~b~' does not contain
'~a~~b~') — and a plain left-to-right non-overlapping replace() with
'~ab~' both implements BPE's greedy merge order AND preserves the
encoding ('~a~~a~~a~~a~' → '~aa~~aa~', the overlapping-pair case that
a single-separator encoding gets wrong — pinned in pytest). replace()
has identical semantics in Spark and DuckDB, so rounds are
bit-identical by construction. Symbols must not contain '~'
(guarded).

Scale shape per round: one split+explode projection over the word
table, one partial+final SUM onto the pair space, one TakeOrdered(1),
one replace() projection — two narrow passes and a driver scalar;
state severed per round.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import sever

SEP = "~"


@dataclass
class BPEResult:
    merges: DataFrame  # (step, left, right, pair_count)
    vocab: DataFrame  # (ws string, freq long) — final symbol strings
    rounds: int
    wall_seconds: float
    metrics: list[dict] = field(default_factory=list)


def bpe_learn(
    docs: DataFrame,
    n_merges: int = 8,
) -> BPEResult:
    """Learn `n_merges` BPE merges over whitespace-tokenized words
    weighted by corpus frequency. Returns the merge table
    (step, left, right, pair_count) — the artifact a tokenizer
    consumes — and the final symbolized vocab."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    t0 = time.time()
    words = (
        docs.where(F.length(F.trim(F.col("text"))) > 0)
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    guard = words.where(F.col("word").contains(SEP)).limit(1).count()
    if guard:
        raise ValueError("words must not contain the separator '~'")
    # init: each character is a symbol
    state = sever(
        words.select(
            F.concat(
                F.lit(SEP),
                F.expr(
                    "trim(TRAILING '~' FROM regexp_replace(word, '(.)', '$1~~'))"
                ),
                F.lit(SEP),
            ).alias("ws"),
            "freq",
        )
    )
    merges: list[tuple[int, str, str, int]] = []
    metrics: list[dict] = []
    rounds = 0
    for step in range(1, n_merges + 1):
        it_t0 = time.time()
        pairs = (
            state.select(
                F.split(F.expr("trim(BOTH '~' FROM ws)"), "~~").alias("s"), "freq"
            )
            .where(F.size("s") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(s) - 2), i ->"
                        " struct(s[i] AS a, s[i + 1] AS b))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((step, a, b, cnt))
        state = sever(
            state.select(
                F.replace(
                    F.col("ws"),
                    F.lit(f"{SEP}{a}{SEP}{SEP}{b}{SEP}"),
                    F.lit(f"{SEP}{a}{b}{SEP}"),
                ).alias("ws"),
                "freq",
            )
        )
        rounds = step
        metrics.append(
            {"step": step, "pair": (a, b), "count": cnt, "wall_s": time.time() - it_t0}
        )
    spark = docs.sparkSession
    mdf = spark.createDataFrame(
        merges, "step long, left string, right string, pair_count long"
    )
    return BPEResult(mdf, state, rounds, time.time() - t0, metrics)


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Apply learned merges: per-document BPE token counts
    (doc_id, n_words, n_tokens). The merge chain runs ONCE per
    DISTINCT word (vocab-scale work — at 100 TB you merge a
    billion-row vocab, not a trillion word occurrences), then a
    broadcast join maps occurrences back and one groupBy sums per
    doc. The chain itself is the same encoding/replace() machinery
    as bpe_learn — one codegen projection of 2·len(merges) nested
    literal replaces, deterministic by construction."""
    for a, b in merges:
        if SEP in a or SEP in b:
            raise ValueError("merge symbols must not contain '~'")
    words = (
        docs.where(F.length(F.trim(F.col("text"))) > 0)
        .select(
            "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
        )
    )
    vocab = words.select("word").distinct()
    ws = F.concat(
        F.lit(SEP),
        F.expr("trim(TRAILING '~' FROM regexp_replace(word, '(.)', '$1~~'))"),
        F.lit(SEP),
    )
    for a, b in merges:
        ws = F.replace(
            ws, F.lit(f"{SEP}{a}{SEP}{SEP}{b}{SEP}"), F.lit(f"{SEP}{a}{b}{SEP}")
        )
    sym = vocab.select("word", ws.alias("ws")).select(
        "word",
        F.size(F.split(F.expr("trim(BOTH '~' FROM ws)"), "~~")).cast("long").alias(
            "n_sub"
        ),
    )
    return (
        words.join(F.broadcast(sym), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_tokens"),
        )
    )
