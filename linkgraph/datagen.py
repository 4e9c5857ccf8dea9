"""Deterministic synthesizer for Common-Crawl-style `pages` tables
and pure-edge graph fixtures (FIXTURES.md §1-2).

Everything is seed-fixed and reproducible: the same (seed, n_pages)
always produces byte-identical html/text. The `text` column is the
golden extraction target — it is built from the SAME template parts
as the html, so the extractor (linkgraph.extract) must reproduce it
byte-identically (BASELINE.json:15 invariant).

Extraction spec (pinned here, implemented in extract.py):
  * text  = text content of the <h1> element and every <p> element,
            in document order, joined by "\\n".
  * hrefs = every <a href=...> value, resolved against the page url
            (urljoin), fragment stripped, self-links dropped,
            de-duplicated preserving first-seen order.

Link structure is Zipf-skewed (hub pages receive a large share of
in-links) so the skew-salting path is exercised; a fixed fraction of
pages have zero anchors (dangling vertices for PageRank mass tests).
"""

from __future__ import annotations

import datetime as _dt
import random
from dataclasses import dataclass
from urllib.parse import urljoin

import numpy as np
import pandas as pd

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu graph vertex edge rank"
).split()

_LANGS = ("en", "de", "fr")

_BASE_TS = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)


def page_url(site: int, page: int) -> str:
    return f"https://site{site}.example/p/{page}"


@dataclass(frozen=True)
class PagesSpec:
    n_pages: int = 200
    n_sites: int = 8
    seed: int = 42
    zipf_alpha: float = 1.1
    max_anchors: int = 8
    dangling_frac: float = 0.08  # pages with zero anchors


def _zipf_targets(rng: random.Random, n_pages: int, k: int, alpha: float) -> list[int]:
    """k target page indices, Zipf-distributed so low indices are hubs."""
    out = []
    for _ in range(k):
        # inverse-CDF-ish draw bounded to [0, n_pages)
        while True:
            x = int(rng.paretovariate(alpha))
            if x <= n_pages:
                out.append(x - 1)
                break
    return out


def generate_pages(spec: PagesSpec = PagesSpec()) -> pd.DataFrame:
    """Deterministic pandas `pages` frame:
    (url string, warc_ts timestamp, html binary, text string, lang string).
    """
    rng = random.Random(spec.seed)
    rows = []
    urls = [page_url(i % spec.n_sites, i // spec.n_sites) for i in range(spec.n_pages)]
    for i, url in enumerate(urls):
        site = i % spec.n_sites
        title = " ".join(rng.choice(_WORDS) for _ in range(3)).title()
        paras = [
            " ".join(rng.choice(_WORDS) for _ in range(rng.randint(6, 18)))
            for _ in range(rng.randint(1, 4))
        ]
        # anchors: Zipf-skewed targets + url-form variety
        if rng.random() < spec.dangling_frac:
            anchor_specs = []
        else:
            k = rng.randint(1, spec.max_anchors)
            targets = _zipf_targets(rng, spec.n_pages, k, spec.zipf_alpha)
            anchor_specs = []
            for t in targets:
                t_site, t_page = t % spec.n_sites, t // spec.n_sites
                form = rng.randint(0, 3)
                if form == 0:  # absolute
                    href = page_url(t_site, t_page)
                elif form == 1 and t_site == site:  # relative, same site only
                    href = f"/p/{t_page}"
                elif form == 2:  # absolute + fragment
                    href = page_url(t_site, t_page) + "#sec1"
                else:
                    href = page_url(t_site, t_page)
                anchor_specs.append((href, rng.choice(_WORDS)))
            # inject a duplicate href to exercise dedup
            if len(anchor_specs) >= 2 and rng.random() < 0.3:
                anchor_specs.append(anchor_specs[0])

        text = "\n".join([title] + paras)
        anchors_html = "".join(
            f'<a href="{href}">{atext}</a> ' for href, atext in anchor_specs
        )
        html = (
            f"<html><head><title>{title}</title></head><body>"
            f"<h1>{title}</h1>"
            + "".join(f"<p>{p}</p>" for p in paras)
            + f"<nav>{anchors_html}</nav>"
            "</body></html>"
        )
        rows.append(
            {
                "url": url,
                "warc_ts": _BASE_TS + _dt.timedelta(seconds=i),
                "html": html.encode("utf-8"),
                "text": text,
                "lang": _LANGS[i % len(_LANGS)],
            }
        )
    return pd.DataFrame(rows)


def expected_edges(pages: pd.DataFrame) -> set[tuple[str, str]]:
    """Pure-Python golden edge set per the extraction spec (for tests).

    Independent re-implementation (regex-free HTML is generated, so a
    simple split suffices) used only to validate extract.py.
    """
    edges: set[tuple[str, str]] = set()
    for _, row in pages.iterrows():
        html = row["html"].decode("utf-8")
        src = row["url"]
        for chunk in html.split('<a href="')[1:]:
            href = chunk.split('"', 1)[0]
            dst = urljoin(src, href).split("#", 1)[0]
            if dst != src:
                edges.add((src, dst))
    return edges


# ---------------------------------------------------------------------------
# Pure-edge fixtures (FIXTURES.md §2)
# ---------------------------------------------------------------------------


def rmat_edges(
    scale: int = 10,
    edge_factor: int = 8,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
) -> pd.DataFrame:
    """R-MAT(a,b,c,d) generator: 2**scale vertices, ~edge_factor*n edges,
    self-loops removed, deduped. Family named in BASELINE.json:6.
    """
    n = 1 << scale
    m = edge_factor * n
    rng = np.random.default_rng(seed)
    src = np.zeros(m, dtype=np.int64)
    dst = np.zeros(m, dtype=np.int64)
    for bit in range(scale):
        r = rng.random(m)
        # quadrant probabilities a, b, c, d
        go_right = (r >= a) & (r < a + b) | (r >= a + b + c)
        go_down = r >= a + b
        src |= go_down.astype(np.int64) << bit
        dst |= go_right.astype(np.int64) << bit
    df = pd.DataFrame({"src": src, "dst": dst})
    df = df[df.src != df.dst].drop_duplicates().reset_index(drop=True)
    return df


def rmat_edges_distributed(
    spark,
    scale: int,
    edge_factor: int = 12,
    seed: int = 42,
    rows_per_chunk: int = 8_000_000,
):
    """Distributed rMAT generator: each executor chunk draws its own
    slice with seed = seed + chunk_id (a union of independent rMAT
    samples keeps the rMAT degree distribution). This is how the big
    scaling-evidence graphs are produced — generation itself scales
    with the cluster, no driver-side array ever materializes.

    Returns a DataFrame (src long, dst long), self-loops removed, NOT
    deduped (build_graph_from_edges dedups).
    """
    import pandas as pd  # noqa: F811 — re-import for executor pickling

    n_chunks = max(1, (edge_factor << scale) // rows_per_chunk)
    a, b, c = 0.57, 0.19, 0.19

    def gen(iterator):
        import numpy as np

        for pdf in iterator:
            for chunk_id in pdf["id"]:
                rng = np.random.default_rng(seed + int(chunk_id))
                m = rows_per_chunk
                src = np.zeros(m, dtype=np.int64)
                dst = np.zeros(m, dtype=np.int64)
                for bit in range(scale):
                    r = rng.random(m)
                    go_right = (r >= a) & (r < a + b) | (r >= a + b + c)
                    go_down = r >= a + b
                    src |= go_down.astype(np.int64) << bit
                    dst |= go_right.astype(np.int64) << bit
                keep = src != dst
                yield pd.DataFrame({"src": src[keep], "dst": dst[keep]})

    return (
        spark.range(n_chunks)
        .repartition(min(n_chunks, spark.sparkContext.defaultParallelism))
        .mapInPandas(gen, schema="src long, dst long")
    )


def parse_adjacency_graph(text: str) -> pd.DataFrame:
    """Parse Ligra/PBBS AdjacencyGraph text into an edge frame.

    Format (reference parser at /root/reference/src/graph.rs:145-196):
    header token ``AdjacencyGraph``, node count n, rel count m, then n
    offsets and m targets, whitespace-separated. Kept only as a fixture
    loader for `test-graph.input` parity (SURVEY §2.1/S1).
    """
    tokens = text.split()
    if tokens[0] != "AdjacencyGraph":
        raise ValueError(f"bad header: {tokens[0]!r}")
    n, m = int(tokens[1]), int(tokens[2])
    offsets = [int(t) for t in tokens[3 : 3 + n]]
    targets = [int(t) for t in tokens[3 + n : 3 + n + m]]
    if len(offsets) != n or len(targets) != m:
        raise ValueError("truncated AdjacencyGraph input")
    src, dst = [], []
    for v in range(n):
        start = offsets[v]
        end = offsets[v + 1] if v + 1 < n else m
        for t in targets[start:end]:
            src.append(v)
            dst.append(t)
    return pd.DataFrame({"src": np.int64(src or []), "dst": np.int64(dst or [])})


def path_graph_edges() -> pd.DataFrame:
    """0→1→2→3 path from the reference's operator test
    (/root/reference/src/ligra.rs:350-370)."""
    return pd.DataFrame({"src": np.int64([0, 1, 2]), "dst": np.int64([1, 2, 3])})


def asymmetric_pin_edges() -> pd.DataFrame:
    """Digraph where directed hash-min != undirected CC (SURVEY §2.5(4)):
    edges {1→0, 2→1}, plus isolated vertex 3 (caller supplies n=4)."""
    return pd.DataFrame({"src": np.int64([1, 2]), "dst": np.int64([0, 1])})
