"""Document chunking for retrieval / context windows: fixed-size
token windows with overlap — the RAG ingestion twin of
pipeline/packing.py (packing concatenates docs INTO a budget; chunking
splits docs BY a budget). Pure whole-stage-codegen array expressions,
no Python, no shuffle — the oracle replays the same slicing in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    window: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split each document into whitespace-token windows of `window`
    tokens advancing by stride = window - overlap (LangChain-style
    fixed-window chunking; overlap keeps retrieval context across
    boundaries).

      (doc_id, chunk_id, start_token, n_tokens, chunk_text)

    Chunk k covers tokens [k*stride, k*stride + window). A document
    with n <= window tokens yields exactly one chunk; otherwise
    ceil((n - window) / stride) + 1 chunks, so the last chunk always
    reaches the final token and no chunk is a strict subset of its
    predecessor. Empty documents yield no chunks. Deterministic pure
    function of the text — integer/string output, engine-exact.

    Scale shape: ONE codegen projection (split + transform + slice)
    followed by posexplode — per-row work bounded by doc length, no
    shuffle, no join; trivially partition-parallel at 100 TB.
    """
    if window <= 0:
        raise ValueError("window must be positive")
    if not 0 <= overlap < window:
        raise ValueError("overlap must satisfy 0 <= overlap < window")
    stride = window - overlap
    w = F.split(F.trim(F.col("text")), r"\s+")
    n = F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0)).otherwise(
        F.size(w)
    )
    toks = docs.select("doc_id", w.alias("w"), n.cast("long").alias("n"))
    # exact integer chunk count: DIV, never double division
    n_chunks = F.expr(
        f"CASE WHEN n <= 0 THEN 0 WHEN n <= {window} THEN 1 "
        f"ELSE (n - {window} + {stride - 1}) DIV {stride} + 1 END"
    )
    chunks = F.expr(
        f"transform(sequence(0, int(n_chunks) - 1), k -> struct("
        f"  k * {stride} AS start_token,"
        f"  least({window}, n - k * {stride}) AS n_tokens,"
        f"  array_join(slice(w, k * {stride} + 1, {window}), ' ') AS chunk_text))"
    )
    base = toks.select(
        "doc_id", "w", "n", n_chunks.cast("long").alias("n_chunks")
    ).where(F.col("n_chunks") > 0)
    return base.select(
        "doc_id", F.posexplode(chunks).alias("chunk_id", "c")
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("c.start_token").cast("long").alias("start_token"),
        F.col("c.n_tokens").cast("long").alias("n_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )
