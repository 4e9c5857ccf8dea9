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
