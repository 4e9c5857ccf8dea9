"""Document fingerprinting via winnowing (Schleimer, Wilkerson, Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03).

Every k-gram of whitespace tokens is hashed (portable 32-bit md5-prefix
hash, same h32 as dedup.py so DuckDB oracles reproduce values
bit-for-bit); a window of `window` consecutive k-gram hashes slides over
the document and the minimum of each full window is kept. The distinct
kept hashes are the document's fingerprints — the guarantee is that any
token run of length >= window + k - 1 shared by two documents yields at
least one shared fingerprint.

Scale shape (100 TB posture): tokens -> k-grams -> hash is pure column
expressions; the window-minimum runs PARTITION BY doc_id, so each
document's gram stream is a single task's work (documents are bounded
size — no giant-partition risk) and there is exactly one shuffle, on
doc_id. No cross-document join anywhere; output volume is ~G/window
fingerprints per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.pipeline.dedup import h32


def winnow_fingerprints(docs: DataFrame, k: int = 5, window: int = 4) -> DataFrame:
    """Distinct winnowing fingerprints per document.

    Returns (doc_id, fingerprint long). Documents with fewer than k
    tokens produce no rows; documents with fewer than k+window-1 tokens
    (i.e. fewer grams than one full window) produce exactly one
    fingerprint — the minimum over all their gram hashes.
    """
    toks = F.split(F.trim(F.col("text")), r"\s+")
    grams = (
        docs.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= k)
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(toks) - {k}),"
                    f" i -> concat_ws(' ', slice(toks, i + 1, {k})))"
                )
            ).alias("pos", "gram"),
        )
        .select("doc_id", "pos", h32(F.col("gram")).alias("h"))
    )
    over_doc = Window.partitionBy("doc_id")
    frame = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    return (
        grams.withColumn("fp", F.min("h").over(frame))
        .withColumn("n_grams", F.count("*").over(over_doc))
        # keep only FULL windows; when the doc has fewer grams than one
        # window, pos 0's frame covers every gram so the single kept row
        # is min over all hashes (greatest(...,0) keeps exactly pos 0)
        .where(F.col("pos") <= F.greatest(F.col("n_grams") - window, F.lit(0)))
        .select("doc_id", F.col("fp").alias("fingerprint"))
        .distinct()
    )


def copy_candidates(
    docs: DataFrame,
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    max_df: int | None = 64,
) -> DataFrame:
    """Cross-document passage-copy detection — the MOSS use-case of
    winnowing (SIGMOD'03 §4): documents sharing winnowed fingerprints
    share literal token runs of length >= window + k - 1, so the pair
    count of shared fingerprints localizes COPIED PASSAGES, which
    shingle-set Jaccard (dedup.ngram_jaccard_pairs) dilutes away on
    long documents.

    Returns (doc_a, doc_b, shared_fps long) with doc_a < doc_b and
    shared_fps >= min_shared.

    Scale shape: inverted-index self-join keyed on the fingerprint —
    never n². The quadratic degeneracy is a fingerprint shared by many
    documents (boilerplate: Σ df² pairs), the same failure mode as
    dedup's hot shingles; `max_df` drops fingerprints appearing in
    more than that many documents BEFORE the join (df is one hash agg;
    a boilerplate passage is not evidence of copying anyway). The pair
    count aggregates map-side on (doc_a, doc_b).
    """
    fps = winnow_fingerprints(docs, k=k, window=window)
    if max_df is not None:
        keep = (
            fps.groupBy("fingerprint")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_df)
            .select("fingerprint")
        )
        fps = fps.join(keep, "fingerprint")
    a = fps.select(F.col("doc_id").alias("doc_a"), "fingerprint")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fingerprint")
    return (
        a.join(b, "fingerprint")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )
