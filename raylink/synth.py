"""Deterministic synthetic web-page corpus (no external data).

BASELINE.json input_hint requires the engine's primary input to be a Parquet
table of Common-Crawl-style pages ``(url, warc_ts, html, text, lang)``. This
module *derives* such a corpus as a pure function of the driver-provided
``documents`` table (or of a seed, for bench-scale corpora), embedding a
link graph whose edge set has a closed form — so the whole
extract -> edge-table -> algorithm pipeline is checkable against ANSI SQL.

LINK SPEC v1 (all arithmetic closed-form; mirrored verbatim in oracle SQL):
  n = number of docs (ids contiguous 0..n-1), m = n - (n % 3)
  for i < m : out-links t_j = (i + 3*j*j) % m  for j = 1..(i % 5 + 1)
              plus a hub link to (i % 3) when i % 7 == 3
  for i >= m: no out-links (isolated vertices)
Properties: 3 connected components (residue classes mod 3, since every
offset is a multiple of 3 and m % 3 == 0) + (n % 3) isolated vertices;
three high-in-degree hub vertices {0,1,2} (~m/21 in-edges each) for skew
handling; vertices with no out-edges pin the reference PageRank's
no-dangling-mass semantics (sample-hama/.../PageRank.java:123-133).

Golden text contract (byte-identical, FIXTURES.md §1):
  text(i) = "Document {i}\n" + clean(text) [+ "\n" + "link"*k joined by "\n"]
  where clean = replace \r and \n by spaces, k = number of anchors.
"""

from __future__ import annotations

import html as _htmlmod

import numpy as np
import pyarrow as pa

HUB_MOD = 7
HUB_RESIDUE = 3
MAX_OUT = 5


def url_of(i: int) -> str:
    return f"https://site{i % 97}.example/d/{i}"


def urls_of(vids) -> "pa.Array":
    """Vectorized ``url_of`` over an int64 column (Arrow string-join kernel,
    no per-row python) — byte-identical to ``url_of`` per id."""
    import pyarrow.compute as pc

    v = pa.array(np.asarray(vids, dtype=np.int64)) if not isinstance(
        vids, (pa.Array, pa.ChunkedArray)
    ) else vids
    site = pc.cast(pc.subtract(v, pc.multiply(pc.divide(v, 97), 97)), pa.string())
    return pc.binary_join_element_wise(
        "https://site", site, ".example/d/", pc.cast(v, pa.string()), "",
    )


def _clean(t: str) -> str:
    return t.replace("\r", " ").replace("\n", " ")


def targets_of(i: int, n: int) -> list[int]:
    """Anchor targets of page i, in page order (may contain duplicates)."""
    m = n - (n % 3)
    if i >= m:
        return []
    k = i % MAX_OUT + 1
    ts = [(i + 3 * j * j) % m for j in range(1, k + 1)]
    if i % HUB_MOD == HUB_RESIDUE:
        ts.append(i % 3)
    return ts


def golden_text(i: int, doc_text: str, n: int) -> str:
    k = len(targets_of(i, n))
    base = f"Document {i}\n{_clean(doc_text)}"
    if k:
        base += "\n" + "\n".join(["link"] * k)
    return base


def page_html(i: int, doc_text: str, n: int) -> str:
    """Deterministic HTML with parser traps: head/style skipped, script with
    a decoy anchor and a '<' comparison, an HTML comment decoy anchor, an
    entity-encoded anchor label, escaped body text."""
    body = _htmlmod.escape(_clean(doc_text), quote=False)
    anchors = "".join(
        f'<li><a href="{url_of(t)}">l&#105;nk</a></li>' for t in targets_of(i, n)
    )
    ul = f"<ul>{anchors}</ul>" if anchors else ""
    return (
        "<!DOCTYPE html><html><head><meta charset=\"utf-8\">"
        f"<title>Skip {i}</title><style>p{{color:red}}</style></head>"
        "<body><script>if (1 < 2) { var x = \"<a href='https://decoy.example/x'>no\"; }</script>"
        f"<h1>Document {i}</h1>"
        "<!-- <a href=\"https://decoy2.example\">no</a> -->"
        f"<p>{body}</p>{ul}</body></html>"
    )


def make_pages_batch(batch: pa.Table, n_docs: int) -> pa.Table:
    """map_batches fn: documents batch (doc_id,text,lang) -> pages batch."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    texts = batch.column("text").to_pylist()
    langs = (
        batch.column("lang")
        if "lang" in batch.column_names
        else pa.array(["en"] * len(ids))
    )
    urls = [url_of(int(i)) for i in ids]
    htmls = [page_html(int(i), t or "", n_docs).encode("utf-8") for i, t in zip(ids, texts)]
    golden = [golden_text(int(i), t or "", n_docs) for i, t in zip(ids, texts)]
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + ids.astype("timedelta64[s]").astype("timedelta64[us]")
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(golden, type=pa.string()),
            "lang": langs,
            "doc_id": batch.column("doc_id"),
        }
    )


def pages_dataset(sf_dir: str, include_golden: bool = True):
    """documents.parquet -> streaming pages Dataset (url, warc_ts, html,
    text[golden], lang, doc_id)."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    n = docs.count()
    ds = docs.map_batches(
        lambda b: make_pages_batch(b, n), batch_format="pyarrow", batch_size=2048
    )
    if not include_golden:
        ds = ds.drop_columns(["text"])
    return ds, n


def expected_edges(n: int) -> np.ndarray:
    """Closed-form distinct directed edge set (src,dst) for tests/oracles."""
    rows = []
    for i in range(n):
        for t in targets_of(i, n):
            rows.append((i, t))
    if not rows:
        return np.empty((0, 2), dtype=np.int64)
    arr = np.array(sorted(set(rows)), dtype=np.int64)
    return arr


# ---------------------------------------------------------------- bench corpus

_VOCAB = (
    "key agg row scan slow fast table value part hash merge batch window spark "
    "order data column join small line customer query the a filter group sort "
    "index page crawl link graph rank node edge shard block stream spill"
).split()


def synth_documents(n: int, seed: int = 42) -> pa.Table:
    """Seeded documents-shaped table for bench-scale corpora (no external
    data): doc_id, text, lang, source, n_chars."""
    rng = np.random.default_rng(seed)
    lens = rng.integers(20, 120, size=n)
    vocab = np.array(_VOCAB)
    texts = []
    for i in range(n):
        words = vocab[rng.integers(0, len(vocab), size=lens[i])]
        texts.append(" ".join(words.tolist()))
    langs = np.array(["en", "de", "zh", "fr", "es"])[rng.integers(0, 5, size=n)]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs.tolist(), type=pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n)], type=pa.string()),
            "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
        }
    )


def synth_edge_arrays(n: int, avg_deg: int = 16, seed: int = 42):
    """Vectorized deterministic edge generator for shuffle-scale benchmarks:
    for vertex i, out-edges dst_j = (i*A + j*B + (i % 7)) % n, j = 0..deg_i-1
    with deg_i = avg_deg - 2 + (i % 5). Pure closed form (no RNG state), so
    any scale regenerates identically; ~E = n * avg_deg."""
    A = np.int64(2654435761 % n if n else 1)
    B = np.int64(40503)
    ids = np.arange(n, dtype=np.int64)
    deg = (avg_deg - 2 + (ids % 5)).astype(np.int64)
    src = np.repeat(ids, deg)
    j = np.arange(len(src), dtype=np.int64) - np.repeat(np.cumsum(deg) - deg, deg)
    dst = (src * A + j * B + (src % 7)) % np.int64(n)
    keep = src != dst
    return src[keep], dst[keep]
