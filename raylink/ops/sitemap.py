"""Sitemap parsing (sitemaps.org XML) — crawl discovery.

The discovery-side sibling of ops/robots.py: a crawler seeds and audits its
frontier from per-host sitemaps. Implemented as the REAL generic algorithm:

- ``parse_sitemap(xml)``: tolerant regex-level parse (namespaced or not,
  CDATA-wrapped or bare ``<loc>``) -> ('index', entries) for
  ``<sitemapindex>`` or ('urlset', entries) for ``<urlset>``, each entry
  (loc, lastmod-or-'').
- ``sitemap_urls(fetch, root)``: recursive index expansion with cycle and
  depth guards -> flat [(url, lastmod)].

The coverage stage ships the parsed per-host url sets as a ``ray.put``
broadcast (sitemaps are metadata — tiny next to the crawl) and judges
pages per batch. ``synth_sitemaps(h, n)`` generates the deterministic
fixture corpus (a 2-part sitemapindex per host — the recursion is
exercised on every host) the SQL oracle mirrors in closed form; the ENGINE
path parses the actual XML.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_LOC_RE = re.compile(
    r"<(?:\w+:)?loc\s*>\s*(?:<!\[CDATA\[)?(.*?)(?:\]\]>)?\s*</(?:\w+:)?loc\s*>",
    re.S,
)
_BLOCK_RE = re.compile(
    r"<(?:\w+:)?(url|sitemap)\s*>(.*?)</(?:\w+:)?\1\s*>", re.S
)
_LASTMOD_RE = re.compile(
    r"<(?:\w+:)?lastmod\s*>\s*(.*?)\s*</(?:\w+:)?lastmod\s*>", re.S
)


def parse_sitemap(xml: str) -> tuple[str, list[tuple[str, str]]]:
    """-> ('index' | 'urlset', [(loc, lastmod)]). Kind is decided by the
    root element; entries outside <url>/<sitemap> blocks are ignored."""
    kind = "index" if re.search(r"<(?:\w+:)?sitemapindex[\s>]", xml) else "urlset"
    entries: list[tuple[str, str]] = []
    for m in _BLOCK_RE.finditer(xml):
        body = m.group(2)
        loc = _LOC_RE.search(body)
        if not loc:
            continue
        lm = _LASTMOD_RE.search(body)
        entries.append((loc.group(1).strip(), lm.group(1).strip() if lm else ""))
    return kind, entries


def sitemap_urls(fetch, root: str, max_depth: int = 3) -> list[tuple[str, str]]:
    """Expand ``root`` (a sitemap or sitemapindex path) recursively via
    ``fetch(path) -> xml``; cycle-safe, depth-capped. -> [(url, lastmod)]."""
    out: list[tuple[str, str]] = []
    seen: set[str] = set()

    def walk(path: str, depth: int) -> None:
        if path in seen or depth > max_depth:
            return
        seen.add(path)
        kind, entries = parse_sitemap(fetch(path))
        if kind == "index":
            for loc, _lm in entries:
                walk(loc, depth + 1)
        else:
            out.extend(entries)

    walk(root, 0)
    return out


def synth_sitemaps(h: int, n_docs: int) -> dict[str, str]:
    """Deterministic fixture: host h's sitemap is a 2-part sitemapindex;
    part 0 lists the host's even-position docs, part 1 the odd ones —
    EXCEPT docs with doc_id % 4 == 2, which the site 'forgot' to list
    (the coverage-audit signal the oracle mirrors). Namespaced XML with
    lastmod entries, part 1 CDATA-wrapped to exercise the parser."""
    vids = [i for i in range(h, n_docs, 97)]
    parts: list[list[int]] = [[], []]
    for pos, i in enumerate(vids):
        if i % 4 == 2:
            continue
        parts[pos % 2].append(i)
    host = f"https://site{h}.example"
    files = {
        f"{host}/sitemap.xml": (
            '<?xml version="1.0"?>\n'
            '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            + "".join(
                f"  <sitemap><loc>{host}/sitemap-{p}.xml</loc></sitemap>\n"
                for p in (0, 1)
            )
            + "</sitemapindex>\n"
        )
    }
    for p in (0, 1):
        wrap = (lambda u: f"<![CDATA[{u}]]>") if p == 1 else (lambda u: u)
        files[f"{host}/sitemap-{p}.xml"] = (
            '<?xml version="1.0"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            + "".join(
                f"  <url><loc>{wrap(f'{host}/d/{i}')}</loc>"
                f"<lastmod>2026-01-{(i % 28) + 1:02d}</lastmod></url>\n"
                for i in parts[p]
            )
            + "</urlset>\n"
        )
    return files


def sitemap_coverage(pages_ds, n_docs: int):
    """pages (url) -> (vid, host, in_sitemap): every host's sitemapindex
    expanded once (driver-side — metadata, not data), the url set packed as
    one sorted int64 array per host and ``ray.put``-broadcast; pages judged
    per batch with searchsorted."""
    import ray

    sets = {}
    for h in range(97):
        files = synth_sitemaps(h, n_docs)
        urls = sitemap_urls(files.__getitem__,
                            f"https://site{h}.example/sitemap.xml")
        ids = np.sort(np.array(
            [int(u.rsplit("/", 1)[1]) for u, _lm in urls], dtype=np.int64
        ))
        sets[h] = ids
    ref = ray.put(sets)

    def judge(batch: pa.Table) -> pa.Table:
        s = ray.get(ref)
        vids, hosts, inmap = [], [], []
        for u in batch.column("url").to_pylist():
            hostpart, _, path = u.partition(".example")
            h = int(hostpart.rsplit("site", 1)[1])
            i = int(path.rsplit("/", 1)[1])
            ids = s[h]
            j = np.searchsorted(ids, i)
            vids.append(i)
            hosts.append(h)
            inmap.append(bool(j < len(ids) and ids[j] == i))
        return pa.table(
            {
                "vid": pa.array(np.asarray(vids, dtype=np.int64)),
                "host": pa.array(np.asarray(hosts, dtype=np.int64)),
                "in_sitemap": pa.array(inmap, type=pa.bool_()),
            }
        )

    return pages_ds.map_batches(judge, batch_format="pyarrow")
