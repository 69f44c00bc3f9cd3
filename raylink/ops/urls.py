"""URL canonicalization — the crawl-frontier dedup key.

A crawler sees the same page under many spellings (case-variant scheme/host,
explicit default ports, dot segments, duplicate slashes, fragments); the
canonical form is the identity every dedup / keep-latest / frontier stage
keys on. ``canonicalize_urls`` is fully Arrow-vectorized (RE2 kernels with
backreference replacement — no per-row Python), and every rewrite is
mirrored token-for-token in DuckDB (also RE2), so the query oracle is exact.

Rules (the conservative subset every public canonicalizer agrees on — no
query-param reordering, which can change semantics):
  1. strip the fragment (``#...``);
  2. lowercase scheme and authority (host[:port]);
  3. drop explicit default ports (``:443`` for https, ``:80`` for http);
  4. resolve single-level dot segments in the path (``/./``, ``/x/../``),
     two passes (documented bound: nested ``../../`` needs more passes);
  5. collapse duplicate slashes in the path.

Contract: path rewrites (4, 5) are applied to everything after the
authority; they assume dot segments / duplicate slashes appear only in the
path — true after standard %-encoding of query data (and of the planted
test corpus). URLs with no ``scheme://`` prefix only get the fragment
stripped (without an authority the path can't be located safely).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_HEAD = r"^(?P<head>[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)(?P<rest>.*)$"


def canonicalize_urls(urls) -> pa.Array:
    """String array of raw urls -> canonical urls (same length/order)."""
    u = urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls
    u = pc.fill_null(u, "")
    # 1. fragment
    u = pc.replace_substring_regex(u, pattern="#.*$", replacement="")
    # 2-3. lowercase authority, strip default ports
    parts = pc.extract_regex(u, pattern=_HEAD)
    has = pc.is_valid(parts)
    head = pc.utf8_lower(pc.struct_field(parts, "head"))
    head = pc.replace_substring_regex(
        head, pattern=r"^(https://[^/:]*):443$", replacement=r"\1"
    )
    head = pc.replace_substring_regex(
        head, pattern=r"^(http://[^/:]*):80$", replacement=r"\1"
    )
    rest = pc.struct_field(parts, "rest")
    # 4. dot segments (two passes each; see module contract)
    for _ in range(2):
        rest = pc.replace_substring_regex(rest, pattern=r"/\./", replacement="/")
    rest = pc.replace_substring_regex(rest, pattern=r"/\.$", replacement="/")
    for _ in range(2):
        rest = pc.replace_substring_regex(
            rest, pattern=r"/[^/?#]+/\.\./", replacement="/"
        )
    rest = pc.replace_substring_regex(
        rest, pattern=r"/[^/?#]+/\.\.$", replacement="/"
    )
    # 5. duplicate slashes
    rest = pc.replace_substring_regex(rest, pattern="//+", replacement="/")
    joined = pc.binary_join_element_wise(head, rest, "")
    return pc.if_else(has, joined, u)


def canonicalize_batch(batch: pa.Table, col: str = "url",
                       out: str = "url_canon") -> pa.Table:
    """map_batches fn: append the canonical form of ``col`` as ``out``."""
    return batch.append_column(out, canonicalize_urls(batch.column(col)))
