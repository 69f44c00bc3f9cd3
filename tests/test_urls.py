"""URL canonicalization (ops/urls.py): rule-by-rule cases, idempotence,
and parity with the DuckDB RE2 mirror on the planted corpus shapes."""

import duckdb
import pyarrow as pa

from raylink.ops.urls import canonicalize_batch, canonicalize_urls

CASES = {
    "HTTPS://SITE5.EXAMPLE:443/d/./5#frag": "https://site5.example/d/5",
    "https://site7.example/d/x/../7": "https://site7.example/d/7",
    "http://A.Example:80/p": "http://a.example/p",
    "http://a.example:8080/p": "http://a.example:8080/p",  # non-default kept
    "https://a.example:443/": "https://a.example/",
    "http://a.example:443/p": "http://a.example:443/p",  # wrong-scheme port kept
    "https://a.example/d//9?q=1#x": "https://a.example/d/9?q=1",
    "https://a.example/a/b/../../c": "https://a.example/c",  # two passes
    "https://a.example/d/.": "https://a.example/d/",
    "https://a.example/d/x/..": "https://a.example/d/",
    "https://a.example/d/5": "https://a.example/d/5",
    "no-scheme#f": "no-scheme",  # no authority: fragment strip only
    "": "",
}


def test_rules():
    got = canonicalize_urls(pa.array(list(CASES))).to_pylist()
    assert got == list(CASES.values())


def test_idempotent():
    once = canonicalize_urls(pa.array(list(CASES)))
    assert canonicalize_urls(once).to_pylist() == once.to_pylist()


def test_nulls_and_batch():
    t = pa.table({"url": pa.array(["https://A.B/x#f", None])})
    out = canonicalize_batch(t)
    assert out.column("url_canon").to_pylist() == ["https://a.b/x", ""]


def test_sql_mirror_parity():
    """The DuckDB side of url_canon_sql (same RE2 pipeline) agrees on every
    rule case — the cross-engine property the oracle relies on."""
    sql = r"""
SELECT head || rest FROM (
  SELECT regexp_replace(regexp_replace(
           lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)),
           '^(https://[^/:]*):443$', '\1'), '^(http://[^/:]*):80$', '\1') AS head,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', ''),
             '/\./', '/', 'g'), '/\./', '/', 'g'), '/\.$', '/'),
             '/[^/?#]+/\.\./', '/', 'g'), '/[^/?#]+/\.\./', '/', 'g'),
             '/[^/?#]+/\.\.$', '/'), '//+', '/', 'g') AS rest
  FROM (SELECT regexp_replace(?, '#.*$', '', 'g') AS u))"""
    con = duckdb.connect()
    for raw, want in CASES.items():
        if "://" not in raw:
            continue  # SQL mirror is only used on scheme-ful planted urls
        assert con.execute(sql, [raw]).fetchone()[0] == want, raw


def test_robots_rfc9309_semantics():
    """The generic parser/matcher on RFC 9309's own edge cases: longest
    match wins, equal-length tie -> Allow, empty Disallow matches nothing,
    multi-agent runs share rules, later groups for the same agent
    concatenate, unknown fields close an agent run, case-insensitivity."""
    from raylink.ops.robots import parse_robots, robots_allowed

    txt = """
# comment
User-Agent: FooBot
User-agent: BarBot
Disallow: /private/
Allow: /private/public*

User-agent: foobot
Allow: /private/
Sitemap: https://x.example/map.xml

User-agent: *
Disallow:
"""
    g = parse_robots(txt)
    # multi-agent run: both share the first group's rules
    assert ("/private/" in [p for _a, p in g["barbot"]][0])
    # concatenation: foobot has rules from BOTH its groups
    assert len(g["foobot"]) == 3
    # longest match: /private/publicX allowed for barbot (Allow longer)
    assert robots_allowed(g, "BarBot", "/private/public1")
    assert not robots_allowed(g, "BarBot", "/private/secret")
    # foobot's extra Allow: /private/ tie with Disallow: /private/ -> Allow
    assert robots_allowed(g, "FooBot", "/private/secret")
    # * group: empty Disallow matches nothing -> everything allowed
    assert robots_allowed(g, "OtherBot", "/anything")
    # unknown agent with no * group present at all -> allowed
    assert robots_allowed({}, "x", "/a")
    # $ anchor
    g2 = parse_robots("User-agent: *\nDisallow: /*.pdf$\n")
    assert not robots_allowed(g2, "x", "/a/b.pdf")
    assert robots_allowed(g2, "x", "/a/b.pdfx")


def test_sitemap_parser_and_expansion():
    """Generic sitemap machinery: namespaced XML, CDATA locs, lastmod,
    recursive index expansion with cycle and depth guards."""
    from raylink.ops.sitemap import parse_sitemap, sitemap_urls

    kind, entries = parse_sitemap(
        '<?xml version="1.0"?>'
        '<ns:urlset xmlns:ns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<ns:url><ns:loc> <![CDATA[https://a.example/x]]> </ns:loc>"
        "<ns:lastmod>2026-02-03</ns:lastmod></ns:url>"
        "<ns:url><ns:loc>https://a.example/y</ns:loc></ns:url>"
        "</ns:urlset>"
    )
    assert kind == "urlset"
    assert entries == [("https://a.example/x", "2026-02-03"),
                       ("https://a.example/y", "")]

    files = {
        "root": "<sitemapindex><sitemap><loc>a</loc></sitemap>"
                "<sitemap><loc>root</loc></sitemap></sitemapindex>",
        "a": "<urlset><url><loc>u1</loc></url></urlset>",
    }
    assert sitemap_urls(files.__getitem__, "root") == [("u1", "")]

    deep = {f"l{i}": f"<sitemapindex><sitemap><loc>l{i+1}</loc></sitemap>"
            "</sitemapindex>" for i in range(10)}
    deep["l4"] = "<urlset><url><loc>deep</loc></url></urlset>"
    assert sitemap_urls(deep.__getitem__, "l0", max_depth=3) == []
    assert sitemap_urls(deep.__getitem__, "l0", max_depth=6) == [("deep", "")]


def test_robots_filter_defaults(ray_session):
    """Review findings: an explicit empty robots_by_host means nothing
    fetched yet (allow-all, NOT the synthetic fixture), and a host absent
    from the rule dict is allow-all instead of a KeyError."""
    import ray.data as rd

    from raylink.ops.robots import robots_filter, synth_robots

    pages = rd.from_arrow(pa.table({
        "url": pa.array(["https://site5.example/d/12",
                         "https://site6.example/d/26"]),
    }))
    got = robots_filter(pages, robots_by_host={}).to_pandas()
    assert got["allowed"].all()

    got = robots_filter(
        pages, robots_by_host={6: synth_robots(6)}
    ).to_pandas().sort_values("host")
    assert got[got["host"] == 5]["allowed"].iloc[0]  # no rules -> allowed
    # host 6 carries the raylinkbot override group (6 % 3 == 0): ids not
    # starting with '1' are allowed
    assert got[got["host"] == 6]["allowed"].iloc[0]
