"""URL canonicalization — the crawl-frontier normalization stage every
web pipeline runs before URL-level dedup (the reference engine has no
URL handling beyond string keys, /root/reference/src/graph.rs; this is
beyond-reference coverage, sibling to the host_rollup path).

Rules (the conservative, always-safe subset used by crawl frontiers):
  * strip the fragment (`#...` never reaches the server);
  * lowercase the scheme and the host (case-insensitive per RFC 3986);
  * drop the scheme's default port (:80 for http, :443 for https);
  * drop tracking query parameters (utm_*, fbclid, gclid, msclkid)
    while preserving the order of the survivors — parameter REORDERING
    is deliberately not done (order can be semantic);
  * normalize an empty path to "/".

Strings without a `scheme://` prefix pass through unchanged with
is_valid = false (a crawl frontier quarantines those, it does not
guess).

Everything is ONE JVM projection of regexp/string expressions — zero
shuffles, zero Python, trivially 100 TB-safe (the higher-order array
filter keeps the projection out of whole-stage codegen, but it stays
JVM-side; plan-pinned) — and every pattern is lookahead-free ASCII so
Java regex
(Spark), RE2 (DuckDB), and Python `re` agree match-for-match (the
repo-wide portability rule, see textstats.BPE_ISH_PATTERN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# params dropped from the query string (anchored, lookahead-free)
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)(=.*)?$"
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)"
_AUTHORITY_PREFIX_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*"


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """One row per input row: (<url_col>, canonical, host, is_valid).

    `canonical` is the normalized url (or the input verbatim when
    is_valid = false); `host` is the lowercased hostname without the
    port ('' when invalid). Deterministic pure-column expressions.
    """
    u = F.col(url_col)
    no_frag = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(no_frag, _HOSTPORT_RE, 1))
    hostport = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    rest = F.regexp_replace(no_frag, _AUTHORITY_PREFIX_RE, "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.array_join(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        ),
        "&",
    )
    canonical = F.concat(
        scheme,
        F.lit("://"),
        hostport,
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )
    is_valid = scheme != ""
    return df.select(
        url_col,
        F.when(is_valid, canonical).otherwise(u).alias("canonical"),
        F.when(
            is_valid, F.regexp_replace(hostport, r":[0-9]+$", "")
        ).otherwise(F.lit("")).alias("host"),
        is_valid.alias("is_valid"),
    )


def url_filter(
    df: DataFrame,
    blocked_domains: DataFrame | list[str],
    blocked_keywords: list[str] | None = None,
    max_kw_hits: int = 0,
    url_col: str = "url",
) -> DataFrame:
    """URL-level corpus filtering (RefinedWeb §3.1 / C4-style): drop
    documents whose url is on a domain blocklist or whose url contains
    too many blocked keywords — the cheap pre-fetch screen that runs
    before any content-based quality op.

    Domain rule: the host (lowercased, port-stripped, via the same
    extraction as canonicalize_urls) is blocked iff the host itself OR
    ANY of its dot-suffixes equals a blocklist entry — i.e.
    `ads.example.com` is blocked by `example.com`. Suffixes are
    enumerated per host (≤ label-count rows, hosts have a handful of
    labels) and matched by an EQUI-join against the blocklist, which a
    100 TB run broadcasts (real blocklists are MBs): no regex scan of
    the list, no cartesian. Matching a suffix — not substring — means
    `notexample.com` is NOT blocked by `example.com`.

    Keyword rule: `kw_hits` counts total occurrences of the blocked
    keywords in the lowercased url via exact substring arithmetic
    ((len(u) - len(replace(u, kw))) / len(kw)) — no regex, so Spark,
    DuckDB, and Python agree byte-for-byte. A row is kept iff its host
    is not blocked AND kw_hits <= max_kw_hits.

    Returns (<url_col>, host, blocked_domain string|NULL, kw_hits
    long, keep boolean) — annotation, not deletion, so callers can
    audit before filtering (`.where("keep")` to apply).
    """
    for kw in blocked_keywords or []:
        if not kw:
            raise ValueError(
                "blocked_keywords must be non-empty strings; an empty "
                "keyword would divide the occurrence count by len(kw)=0"
            )
    spark = df.sparkSession
    if isinstance(blocked_domains, list):
        blocked_domains = spark.createDataFrame(
            [(d.lower(),) for d in blocked_domains], "domain string"
        )
    bl = blocked_domains.select(F.lower(F.col("domain")).alias("domain")).distinct()

    u = F.col(url_col)
    no_frag = F.regexp_replace(u, r"#.*$", "")
    hostport = F.lower(F.regexp_extract(no_frag, _HOSTPORT_RE, 1))
    host = F.regexp_replace(hostport, r":[0-9]+$", "")

    lowered = F.lower(u)
    kw_hits = F.lit(0).cast("long")
    for kw in blocked_keywords or []:
        k = kw.lower()
        kw_hits = kw_hits + (
            (F.length(lowered) - F.length(F.replace(lowered, F.lit(k))))
            / F.lit(len(k))
        ).cast("long")

    base = df.select(url_col, host.alias("host"), kw_hits.alias("kw_hits"))
    # all dot-suffixes of the host: labels[i:] joined by '.' — bounded
    # by the label count, generated in one codegen projection.
    labels = F.split(F.col("host"), r"\.")
    suffixes = base.select(
        url_col,
        F.explode(
            F.transform(
                labels,
                lambda _, i: F.array_join(F.slice(labels, i + 1, F.size(labels)), "."),
            )
        ).alias("suffix"),
    )
    hit = (
        suffixes.join(
            F.broadcast(bl), suffixes["suffix"] == bl["domain"], "inner"
        )
        .groupBy(url_col)
        .agg(F.min("domain").alias("blocked_domain"))
    )
    out = base.join(hit, url_col, "left")
    return out.select(
        url_col,
        "host",
        "blocked_domain",
        "kw_hits",
        (
            F.col("blocked_domain").isNull()
            & (F.col("kw_hits") <= F.lit(int(max_kw_hits)))
        ).alias("keep"),
    )
