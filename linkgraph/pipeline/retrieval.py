"""Corpus retrieval operators: inverted index construction and BM25
keyword search — the query-the-corpus side of a web-text engine (the
reference at /root/reference/src ships no IR apps; this extends the
pipeline family over the same documents table).

Tokenization is the shared whitespace tokenizer of
textstats (token_stats/tfidf_topk/vocab_stats/unigram_logprob), so
index statistics and quality statistics agree term-for-term.

Determinism contract (the unigram_logprob lesson): any per-document
float SUM is partial-sum-order-dependent under hash aggregation, so
BM25 quantizes each (doc, term) weight ONCE to int64 micro-units
(ROUND HALF_UP, positive domain) and per-doc totals are exact
order-independent int64 SUMs; ranking keys are pure integers. The
inverted index is integers and strings only. Both ops are therefore
engine-reproducible bit-for-bit with no tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.pipeline.textstats import _ws_terms


def inverted_index(docs: DataFrame, max_df: int | None = None) -> DataFrame:
    """Serialized posting lists: one row per term,
    (term, df, cf, postings) with postings = "doc:tf doc:tf ..."
    ordered by doc_id ascending — the classic IR index artifact
    (Zobel & Moffat CSUR'06) over the documents table.

    `max_df` drops stopword-grade terms BEFORE list assembly — at
    100 TB a stop word's posting list is corpus-sized (the giant-
    posting-list problem); bounding df is the standard stop-listing /
    posting-pruning move, and it mirrors the LSH mega-bucket and
    link-prediction hub caps. None keeps the full vocabulary.

    Plan shape: explode -> (doc, term) hash agg (map-side combine) ->
    term-keyed agg with collect_list + array_sort — ONE shuffle keyed
    on term; list size is bounded by df (<= max_df when set). All
    output columns int64/string — hash-exact across engines."""
    tf = _ws_terms(docs).groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    vocab = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
        F.array_sort(F.collect_list(F.struct("doc_id", "tf"))).alias("plist"),
    )
    if max_df is not None:
        if max_df < 1:
            raise ValueError(f"max_df must be >= 1, got {max_df}")
        vocab = vocab.where(F.col("df") <= max_df)
    return vocab.select(
        "term",
        F.col("df").cast("long").alias("df"),
        F.col("cf").cast("long").alias("cf"),
        F.array_join(
            F.transform(
                "plist",
                lambda x: F.concat_ws(
                    ":", x["doc_id"].cast("string"), x["tf"].cast("string")
                ),
            ),
            " ",
        ).alias("postings"),
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 keyword search (Robertson & Zaragoza FnTIR'09, the Lucene
    idf variant): top-k documents for a whitespace query, scored

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
        idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))

    Output: (doc_id, matched, score, rank), rank 1..k. Per-(doc,term)
    weights are quantized once to int64 micro-units (ROUND HALF_UP —
    idf is positive by construction, so no negative-rounding branch)
    and the per-doc total is an exact int64 SUM; ranking is by
    (total DESC, doc_id ASC) — pure integers, engine-reproducible.
    score = total/1e6 is one final division.

    Plan shape: terms filtered to the query vocabulary AT the explode
    (a |q|-literal IN — Catalyst pushes it into the scan-side filter),
    so the shuffled tf relation carries only matching rows; dl/avgdl
    and df ride tiny broadcast joins (vocabulary-of-query-sized and
    one-row); final top-k is orderBy().limit() = TakeOrdered (per-
    partition top-k + k-row driver merge, no global sort)."""
    terms = [t for t in query.strip().split() if t]
    if not terms:
        raise ValueError("query must contain at least one term")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    tok = _ws_terms(docs)
    # document lengths over ALL terms (BM25's dl), one scalar avgdl row
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    qtf = (
        tok.where(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    weighted = (
        qtf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round((idf * tf_part) * F.lit(1e6), 0).cast("long").alias("w_e6"),
        )
    )
    totals = weighted.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("matched"),
        F.sum("w_e6").alias("total_e6"),
    )
    top = totals.orderBy(F.desc("total_e6"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("total_e6"), F.asc("doc_id"))
    return top.select(
        "doc_id",
        F.col("matched").cast("long").alias("matched"),
        (F.col("total_e6") / F.lit(1e6)).alias("score"),
        F.row_number().over(w).cast("long").alias("rank"),
    )
