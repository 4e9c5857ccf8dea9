"""Text analysis over documents(doc_id, text, lang, ...): token
counting, quality scoring, and a language-ID heuristic — all built-in
string expressions (no Python), each reproducible in ANSI SQL for the
DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# fixed marker lists shared with the SQL oracles
STOPWORDS = ("the", "a", "and", "of", "to")
PUNCT = ".,!?;:"

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and"),
    "de": ("der", "und"),
    "fr": ("le", "et"),
    "es": ("el", "y"),
    "zh": ("de", "shi"),
}


def _count_occurrences(text_col, needle: str):
    """Occurrences of ' needle ' in ' '||text||' ' via length arithmetic
    (portable: identical semantics in Spark and DuckDB replace())."""
    padded = F.concat(F.lit(" "), text_col, F.lit(" "))
    target = f" {needle} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(target), F.lit(""))))
        / len(target)
    ).cast("long")


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len, punct_cnt,
    stopword_cnt, quality_score). quality_score is a deterministic
    [0,1]-ish blend: stopword ratio + length band + punctuation
    sanity — the classic cheap web-text quality heuristics."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0)).otherwise(
        F.size(toks)
    )
    n_chars = F.length("text")
    punct_cnt = F.length("text") - F.length(
        F.regexp_replace("text", f"[{PUNCT}]", "")
    )
    stopword_cnt = None
    for sw in STOPWORDS:
        c = _count_occurrences(F.col("text"), sw)
        stopword_cnt = c if stopword_cnt is None else stopword_cnt + c
    # long, not int: downstream oracles (DuckDB length() -> BIGINT)
    # compare dtype-for-dtype through Arrow, and int32 vs int64 is the
    # exact class of value-identical hash mismatch that bit simhash.
    df = docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars"),
        punct_cnt.cast("long").alias("punct_cnt"),
        stopword_cnt.cast("long").alias("stopword_cnt"),
    )
    avg_tok = F.when(
        F.col("n_tokens") > 0,
        (F.col("n_chars") - F.col("n_tokens") + 1) / F.col("n_tokens"),
    ).otherwise(F.lit(0.0))
    sw_ratio = F.when(
        F.col("n_tokens") > 0, F.col("stopword_cnt") / F.col("n_tokens")
    ).otherwise(F.lit(0.0))
    len_band = F.when((F.col("n_chars") >= 100) & (F.col("n_chars") <= 2000), 1.0).otherwise(0.0)
    punct_ok = F.when(
        F.col("n_chars") > 0,
        F.when(F.col("punct_cnt") / F.col("n_chars") < 0.1, 1.0).otherwise(0.0),
    ).otherwise(F.lit(0.0))
    return df.select(
        "doc_id",
        "n_tokens",
        "n_chars",
        F.round(avg_tok, 9).alias("avg_token_len"),
        "punct_cnt",
        "stopword_cnt",
        F.round(
            0.5 * F.least(sw_ratio * 5, F.lit(1.0)) + 0.3 * len_band + 0.2 * punct_ok, 9
        ).alias("quality_score"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang): deterministic marker-word scorer; argmax
    with ties broken by language code order. A stand-in for a real
    n-gram model — the operator shape (scored columns + greatest +
    chained when) is the point."""
    scores = {
        lang: sum(
            (_count_occurrences(F.col("text"), m) for m in markers),
            F.lit(0).cast("long"),
        )
        for lang, markers in LANG_MARKERS.items()
    }
    df = docs.select(
        "doc_id", *[v.alias(f"s_{k}") for k, v in scores.items()]
    )
    langs = sorted(LANG_MARKERS)  # tie-break: alphabetical language code
    best = F.greatest(*[F.col(f"s_{k}") for k in langs])
    pred = None
    for k in langs:
        cond = F.col(f"s_{k}") == best
        pred = F.when(cond, F.lit(k)) if pred is None else pred.when(cond, F.lit(k))
    return df.select("doc_id", pred.alias("pred_lang"))
