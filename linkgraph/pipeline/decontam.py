"""Benchmark decontamination: flag corpus documents that share word
n-grams with an evaluation/benchmark set (the GPT-3/PaLM-style
training-data hygiene pass — those pipelines use 13-grams; the knob is
`n`).

Not in the reference (a batch graph engine); mandated by the build
brief's training-data-pipeline mandate, alongside the dedup family in
`dedup.py`.

Scale shape (100 TB): benchmark suites are tiny (MBs) next to the
corpus, so the benchmark n-gram set is DISTINCT-collapsed and
broadcast — the corpus-side n-gram stream joins it with a broadcast
hash join (no shuffle on the gram key), and the only exchange is the
per-document hit count, keyed on doc_id with map-side combine. The
corpus is scanned exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_ngrams(docs: DataFrame, n: int, id_col: str = "doc_id") -> DataFrame:
    """(id_col, ngram) — DISTINCT word n-grams per document.
    Tokenization is the module-wide whitespace split (textstats.py);
    gram construction is 1-based slice + concat_ws so the DuckDB twin
    (list_slice is 1-based inclusive) reproduces it byte-for-byte."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    grams = F.expr(
        f"transform(sequence(1, size(w) - {n - 1}), i -> concat_ws(' ', slice(w, i, {n})))"
    )
    return (
        docs.select(F.col(id_col), toks.alias("w"))
        .where(F.size("w") >= n)
        .select(id_col, F.explode(grams).alias("ngram"))
        .distinct()
    )


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 8) -> DataFrame:
    """(doc_id, n_shared_ngrams, contaminated) for EVERY corpus doc:
    n_shared_ngrams = count of the doc's distinct word n-grams that
    also occur anywhere in `benchmark` (a DataFrame with a `text`
    column); contaminated = that count > 0.

    The benchmark gram set is distinct + broadcast (eval suites are
    small by construction); a corpus doc with fewer than n words has
    no n-grams and is trivially clean.
    """
    bench_grams = (
        word_ngrams(
            benchmark.select(F.monotonically_increasing_id().alias("bid"), "text"),
            n,
            id_col="bid",
        )
        .select("ngram")
        .distinct()
    )
    hits = (
        word_ngrams(docs, n)
        .join(F.broadcast(bench_grams), "ngram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    return docs.select("doc_id").join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_shared"), F.lit(0)).cast("long").alias("n_shared_ngrams"),
        (F.coalesce(F.col("n_shared"), F.lit(0)) > 0).alias("contaminated"),
    )
