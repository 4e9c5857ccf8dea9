"""PII redaction over documents(doc_id, text, ...) — the standard
web-corpus scrubbing stage (C4 washes PII-bearing lines; Dolma
(Soldaini et al. 2024 §2.3) and BigScience ROOTS mask emails / IP
addresses / phone numbers with typed placeholders, which is the
contract here).

The reference engine has no document pipeline (it is a link-graph
kernel suite, /root/reference/src/algos.rs); this is beyond-reference
coverage for the training-data path, sibling to textstats/decontam.

Patterns are lookahead-free ASCII so Java regex (Spark), RE2
(DuckDB), and Python `re` agree match-for-match (the repo-wide
portability rule, see BPE_ISH_PATTERN in textstats.py). Masking is
sequential — each pattern is counted and replaced on the text with
all earlier patterns already masked, so an email's digits can never
double-count as a phone — and placeholders contain no maskable
characters, making the whole op idempotent.

100 TB shape: one whole-stage-codegen projection per row (chained
JVM-side regexp_replace/regexp_count), zero shuffles, zero Python in
the hot path; filters on the output booleans push down to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, placeholder) — applied strictly in this order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ip",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
        "<PHONE>",
    ),
)


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, has_pii, redacted).

    Counts are per-pattern non-overlapping match counts (long) taken
    at that pattern's point in the masking sequence; `redacted` is the
    text with every match replaced by its typed placeholder; `has_pii`
    flags any match. Deterministic pure-column expressions only.
    """
    cur = F.col(text_col)
    counts = []
    for name, pattern, placeholder in PII_PATTERNS:
        counts.append(
            F.regexp_count(cur, F.lit(pattern)).cast("long").alias(f"n_{name}s")
        )
        cur = F.regexp_replace(cur, pattern, placeholder)
    out = docs.select("doc_id", *counts, cur.alias("redacted"))
    has = None
    for name, _, _ in PII_PATTERNS:
        col = F.col(f"n_{name}s")
        has = col if has is None else has + col
    return out.select(
        "doc_id",
        *[f"n_{name}s" for name, _, _ in PII_PATTERNS],
        (has > 0).alias("has_pii"),
        "redacted",
    )
