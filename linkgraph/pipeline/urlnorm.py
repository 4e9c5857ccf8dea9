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
