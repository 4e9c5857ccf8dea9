"""Extraction stage tests: byte-identical text (BASELINE.json:15
invariant) and golden href edges."""

from __future__ import annotations

from linkgraph.datagen import PagesSpec, expected_edges, generate_pages
from linkgraph.extract import edges_from_pages, extract_one, extract_pages


def test_extract_one_matches_golden_text():
    pages = generate_pages(PagesSpec(n_pages=50))
    for _, row in pages.iterrows():
        text, hrefs = extract_one(row["url"], row["html"])
        assert text == row["text"], f"text mismatch for {row['url']}"
        assert text.encode("utf-8") == row["text"].encode("utf-8")  # byte identity


def test_extract_pages_byte_identical(spark):
    pages_pdf = generate_pages(PagesSpec(n_pages=80))
    pages = spark.createDataFrame(pages_pdf)
    out = extract_pages(pages).toPandas().set_index("url")
    golden = pages_pdf.set_index("url")
    assert len(out) == len(golden)
    for url in golden.index:
        assert out.loc[url, "text"] == golden.loc[url, "text"]


def test_edges_match_golden(spark):
    pages_pdf = generate_pages(PagesSpec(n_pages=80))
    pages = spark.createDataFrame(pages_pdf)
    got = {
        (r["src_url"], r["dst_url"])
        for r in edges_from_pages(pages).collect()
    }
    assert got == expected_edges(pages_pdf)


def test_hrefs_normalized_dedup():
    # relative resolution, fragment strip, self-drop, order-preserving dedup
    url = "https://site0.example/p/3"
    html = (
        b'<html><body><h1>T</h1><p>x</p><nav>'
        b'<a href="/p/7">a</a> '
        b'<a href="https://site1.example/p/2#frag">b</a> '
        b'<a href="/p/7">dup</a> '
        b'<a href="https://site0.example/p/3">self</a> '
        b"</nav></body></html>"
    )
    text, hrefs = extract_one(url, html)
    assert hrefs == [
        "https://site0.example/p/7",
        "https://site1.example/p/2",
    ]
    assert text == "T\nx"


def test_extract_anchors_one_golden():
    """Anchor-text pairs: resolution/fragment/self rules mirror
    extract_one; duplicates kept; nested/unclosed <a> handled by the
    HTML5 implicit-close rule; entities decoded."""
    from linkgraph.extract import extract_anchors_one

    url = "https://site0.example/p/3"
    html = (
        "<html><body>"
        '<a href="/p/1">first link</a>'
        '<a href="https://site1.example/p/2#frag"> spaced &amp; entity </a>'
        '<a href="/p/1">first link again</a>'
        '<a href="/p/3">self</a>'
        '<a href="/p/4">outer <b>bold inner</b> tail</a>'
        '<a href="/p/5">unclosed one<a href="/p/6">next</a>'
        "<a>no href</a>"
        "</body></html>"
    ).encode()
    got = extract_anchors_one(url, html)
    assert got == [
        ("https://site0.example/p/1", "first link"),
        ("https://site1.example/p/2", "spaced & entity"),
        ("https://site0.example/p/1", "first link again"),
        ("https://site0.example/p/4", "outer bold inner tail"),
        ("https://site0.example/p/5", "unclosed one"),
        ("https://site0.example/p/6", "next"),
    ]
    # dangling open <a> at EOF still flushes
    assert extract_anchors_one(url, b'<a href="/p/9">tail text') == [
        ("https://site0.example/p/9", "tail text")
    ]


def test_anchor_texts_matches_driver_replay(spark):
    """The Arrow UDF path == the pure-function replay on the synthetic
    corpus, row-multiset-exactly (duplicates preserved)."""
    from collections import Counter

    from linkgraph.extract import anchor_texts, extract_anchors_one

    pages_pdf = generate_pages(PagesSpec(n_pages=80))
    got = Counter(
        (r["src_url"], r["dst_url"], r["anchor"])
        for r in anchor_texts(spark.createDataFrame(pages_pdf)).collect()
    )
    want = Counter()
    for _, row in pages_pdf.iterrows():
        for dst, anchor in extract_anchors_one(row["url"], row["html"]):
            want[(row["url"], dst, anchor)] += 1
    assert got == want
    assert sum(want.values()) > 0  # the corpus actually has anchors
