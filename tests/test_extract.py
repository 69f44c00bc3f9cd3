"""Extractor + synthetic corpus round-trip: byte-identical text per url,
closed-form edge set recovered exactly (FIXTURES.md §1, §4)."""

import numpy as np
import pyarrow as pa

from raylink.extract import ExtractPages, explode_links, extract_html
from raylink.synth import (
    expected_edges,
    golden_text,
    make_pages_batch,
    page_html,
    synth_documents,
    targets_of,
    url_of,
)


def test_extract_basic_traps():
    html = (
        "<!DOCTYPE html><html><head><title>NO</title></head>"
        "<body><script>var a = \"<a href='x'>no\";</script>"
        "<h1>T&amp;itle</h1><!-- <a href=\"c\">no</a> -->"
        "<p>a &lt; b</p><ul><li><a href=\"http://x/1\">l&#105;nk</a></li></ul></body></html>"
    )
    text, links = extract_html(html)
    assert text == "T&itle\na < b\nlink"
    assert links == ["http://x/1"]


def test_extract_whitespace_only_nodes_dropped():
    text, links = extract_html("<body>\n  <p>hi</p>\n  <p>yo</p>\n</body>")
    assert text == "hi\nyo"
    assert links == []


def test_roundtrip_golden_text_and_targets():
    docs = synth_documents(99, seed=7)
    n = 99
    texts = docs.column("text").to_pylist()
    for i in [0, 1, 2, 3, 7, 50, 95, 96, 97, 98]:
        t, links = extract_html(page_html(i, texts[i], n))
        assert t == golden_text(i, texts[i], n), f"text mismatch doc {i}"
        assert [int(u.rsplit("/", 1)[1]) for u in links] == targets_of(i, n)


def test_isolated_tail_has_no_links():
    n = 100  # m = 99 -> doc 99 isolated
    assert targets_of(99, 100) == []
    t, links = extract_html(page_html(99, "tail doc", 100))
    assert t == "Document 99\ntail doc"
    assert links == []


def test_batch_stage_and_explode():
    n = 120
    docs = synth_documents(n, seed=3)
    pages = make_pages_batch(docs, n)
    out = ExtractPages()(pages.select(["url", "html", "lang"]))
    assert out.column("text").to_pylist() == pages.column("text").to_pylist()
    edges_urls = explode_links(out)
    # map urls back to ids and compare against closed form
    src = [int(u.rsplit("/", 1)[1]) for u in edges_urls.column("src_url").to_pylist()]
    dst = [int(u.rsplit("/", 1)[1]) for u in edges_urls.column("dst_url").to_pylist()]
    got = np.array(sorted(set(zip(src, dst))), dtype=np.int64)
    exp = expected_edges(n)
    assert np.array_equal(got, exp)
    # hubs exist: in-degree of vertex 0,1,2 elevated
    dstc = np.bincount(exp[:, 1], minlength=n)
    assert dstc[:3].min() > dstc[3:].mean() * 2


def test_urls_deterministic():
    assert url_of(5) == "https://site5.example/d/5"
    assert url_of(97 + 4) == "https://site4.example/d/101"


def test_extract_titles_malformed():
    """extract_titles: first-title semantics; empty/no-title/invalid-utf8
    inputs degrade to '' (or the lossy-decoded title) without raising."""
    import pyarrow as pa

    from raylink.extract import extract_titles

    b = pa.table(
        {
            "url": pa.array(["a", "b", "c", "d"]),
            "html": pa.array(
                [
                    b"\xff\xfe<title>x</title>",
                    b"",
                    b"<title>unclosed",
                    b"<html><title>T</title><title>U</title>",
                ],
                pa.binary(),
            ),
        }
    )
    assert extract_titles(b).column("title").to_pylist() == ["x", "", "", "T"]


def test_extract_titles_case_and_attributes():
    """Real-crawl tag shapes (VERDICT r4 item 3): uppercase <TITLE>, mixed
    case, attributed <title lang=..>, and multiline inner text all extract;
    the all-lowercase plain tag (the oracle's shape) is unchanged."""
    import pyarrow as pa

    from raylink.extract import extract_titles

    b = pa.table(
        {
            "url": pa.array(["a", "b", "c", "d", "e"]),
            "html": pa.array(
                [
                    b"<html><TITLE>Upper</TITLE></html>",
                    b"<Title>Mixed</Title>",
                    b'<title lang="en" data-x=1>Attr</title>',
                    b"<title>line1\nline2</title>",
                    b"<html><head><title>plain</title></head>",
                ],
                pa.binary(),
            ),
        }
    )
    assert extract_titles(b).column("title").to_pylist() == [
        "Upper", "Mixed", "Attr", "line1\nline2", "plain",
    ]
