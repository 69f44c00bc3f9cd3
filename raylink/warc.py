"""WARC/1.0 container read/write (ISO 28500 / Common-Crawl layout).

BASELINE.json's north star starts from Common-Crawl-style web pages; Common
Crawl publishes those as WARC files — a concatenation of gzip members, one
member per record, each record a block of CRLF-separated named headers
followed by a ``Content-Length``-delimited payload (for ``response`` records:
a full HTTP/1.1 response, status line + headers + html body). The reference
engine never touches WARC (it reads pre-built adjacency text,
hama/.../LongTextAdjacencyListReader.java:88-106); this module is the
crawl-side on-ramp the north star requires.

Pieces:

- ``warc_record_bytes(url, ts_us, html)`` — one deterministic ``response``
  record. gzip members are written with ``mtime=0`` so the container bytes
  are a pure function of the page row (resumability: rewriting a shard
  yields identical bytes).
- ``write_warc(pages_ds, out_dir)`` — Dataset sink: each input block becomes
  one ``.warc.gz`` (warcinfo record + one response record per page), written
  in parallel by ``map_batches``; returns the manifest (path, n_records).
  File names derive from the block's first url + row count, not a global
  counter, so there is no driver-side sequencing and a re-run overwrites
  the same names (idempotent / resumable).
- ``WarcParser`` — the stateful actor-pool ``map_batches`` stage decoding
  WARC bytes back into the pages schema ``(url, warc_ts, html)``. Non-
  ``response`` records (warcinfo, request, metadata) are skipped; truncated
  trailing records are dropped with a per-file count in ``n_skipped``.
- ``read_warc(paths)`` — ``ray.data.read_binary_files`` -> ``WarcParser``.

Partitioning assumption (document per the brief): the WARC *file* is the
unit of parallelism. gzip members are only discoverable by sequential scan,
so a file cannot be split without an external index; Common Crawl keeps
files ~1 GiB for exactly this reason and every public WARC processor
(e.g. the cc-pyspark pattern) shards by file. At 10^12 documents that is
~10^6 files — ample parallelism for any cluster width.
"""

from __future__ import annotations

import gzip
import io
import os

import numpy as np
import pyarrow as pa

WARC_VERSION = b"WARC/1.0"
_CRLF = b"\r\n"
_EPOCH = np.datetime64("1970-01-01T00:00:00", "us")


def _warc_date(ts_us: int) -> bytes:
    """Microseconds-since-epoch -> WARC-Date bytes. Whole seconds use the
    WARC/1.0 second form; sub-second timestamps use the WARC/1.1 fractional
    form (both are parsed back)."""
    dt = (_EPOCH + np.timedelta64(int(ts_us), "us")).item()  # datetime.datetime
    if dt.microsecond:
        return dt.strftime("%Y-%m-%dT%H:%M:%S.%fZ").encode()
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ").encode()


def _parse_warc_date(raw: str) -> int:
    """WARC-Date string -> microseconds since epoch (ns-safe integer math)."""
    raw = raw.strip()
    if raw.endswith("Z"):
        raw = raw[:-1]
    ts = np.datetime64(raw, "us")
    if np.isnat(ts):  # np.datetime64("", "us") is NaT, not an error —
        raise ValueError("empty/unparseable WARC-Date")  # would floor to 0
    return int((ts - _EPOCH) // np.timedelta64(1, "us"))


def warc_record_bytes(url: str, ts_us: int, html: bytes, compress: bool = True) -> bytes:
    """One deterministic WARC ``response`` record (its own gzip member)."""
    http = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: text/html; charset=utf-8" + _CRLF
        + b"Content-Length: " + str(len(html)).encode() + _CRLF
        + _CRLF
        + html
    )
    rec = (
        WARC_VERSION + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Date: " + _warc_date(ts_us) + _CRLF
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + b"Content-Length: " + str(len(http)).encode() + _CRLF
        + _CRLF
        + http
        + _CRLF + _CRLF
    )
    return gzip.compress(rec, mtime=0) if compress else rec


def warcinfo_bytes(filename: str, compress: bool = True) -> bytes:
    """Leading ``warcinfo`` record (real WARC files carry one; the parser
    must skip it)."""
    body = b"software: raylink\r\nformat: WARC File Format 1.0\r\n"
    rec = (
        WARC_VERSION + _CRLF
        + b"WARC-Type: warcinfo" + _CRLF
        + b"WARC-Filename: " + filename.encode() + _CRLF
        + b"WARC-Date: " + _warc_date(0) + _CRLF
        + b"Content-Type: application/warc-fields" + _CRLF
        + b"Content-Length: " + str(len(body)).encode() + _CRLF
        + _CRLF
        + body
        + _CRLF + _CRLF
    )
    return gzip.compress(rec, mtime=0) if compress else rec


# ------------------------------------------------------------------- writer


def _fnv64(data: bytes) -> int:
    h = np.uint64(0xCBF29CE484222325)
    with np.errstate(over="ignore"):  # mod-2^64 wrap is the point
        for b in data:
            h = (h ^ np.uint64(b)) * np.uint64(0x100000001B3)
    return int(h)


class _WarcWriteBatch:
    """map_batches fn: pages block -> one .warc.gz file + manifest row."""

    def __init__(self, out_dir: str, compress: bool = True) -> None:
        self.out_dir = out_dir
        self.compress = compress
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        ts = batch.column("warc_ts").cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").astype(np.int64)
        htmls = batch.column("html").to_pylist()
        if not urls:
            return pa.table({"path": pa.array([], type=pa.string()),
                             "n_records": pa.array([], type=pa.int64())})
        ext = ".warc.gz" if self.compress else ".warc"
        # content-derived name: FNV fold over EVERY url (first-url-only
        # collided when the same url led two different blocks — the
        # second os.replace silently clobbered the first); identical
        # blocks still map to one name, so rewrites stay idempotent
        h = 0xCBF29CE484222325
        for u in urls:
            h = ((h ^ _fnv64(u.encode())) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        name = f"crawl-{h:016x}-{len(urls)}{ext}"
        path = os.path.join(self.out_dir, name)
        buf = io.BytesIO()
        buf.write(warcinfo_bytes(name, self.compress))
        for u, t, h in zip(urls, ts, htmls):
            buf.write(warc_record_bytes(u, int(t), bytes(h or b""), self.compress))
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf.getvalue())
        os.replace(tmp, path)  # atomic: readers never see partial files
        return pa.table({"path": pa.array([path]),
                         "n_records": pa.array([len(urls)], type=pa.int64())})


def write_warc(pages_ds, out_dir: str, compress: bool = True,
               batch_size: int = 1024):
    """pages Dataset (url, warc_ts, html) -> one WARC file per block.

    Returns the materialized manifest Dataset (path, n_records) — small
    (one row per file), safe to materialize. At crawl scale pick
    ``batch_size`` so html_bytes * batch_size ~ the Common-Crawl 1 GiB
    file target."""
    return pages_ds.map_batches(
        _WarcWriteBatch(out_dir, compress),
        batch_format="pyarrow",
        batch_size=batch_size,
    ).materialize()


# ------------------------------------------------------------------- parser


def _gunzip_salvage(data: bytes) -> bytes:
    """Decompress a (possibly truncated/garbage-tailed) multi-member gzip
    stream, salvaging every byte that decodes. Streamed in bounded chunks —
    each input byte is touched once (a Common-Crawl file has ~10^5 members;
    restarting the decompressor on a copy of the remaining buffer per
    member would be quadratic). A truncated final member yields its partial
    plaintext; the record loop then drops the partial record."""
    import zlib

    out: list[bytes] = []
    d = zlib.decompressobj(31)
    view = memoryview(data)
    chunk_sz = 1 << 20
    try:
        for pos in range(0, len(view), chunk_sz):
            buf = view[pos : pos + chunk_sz]
            out.append(d.decompress(buf))
            # member boundary inside the chunk: chain to the next member
            while d.eof and d.unused_data:
                rest = d.unused_data
                d = zlib.decompressobj(31)
                out.append(d.decompress(rest))
    except zlib.error:  # garbage/truncated tail: keep what decoded
        pass
    return b"".join(out)


def parse_warc_stream(data: bytes) -> tuple[list[tuple[str, int, bytes]], int]:
    """Decode one WARC file's bytes -> ([(url, ts_us, html)], n_skipped).

    Accepts gzip (any member layout — per-record members or one stream) and
    plain WARC. Non-``response`` records are skipped and counted; a
    truncated trailing record is dropped and counted."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_salvage(data)
    out: list[tuple[str, int, bytes]] = []
    skipped = 0
    i, n = 0, len(data)
    while i < n:
        # tolerate inter-record padding
        while i < n and data[i : i + 1] in (b"\r", b"\n"):
            i += 1
        if i >= n:
            break
        hdr_end = data.find(b"\r\n\r\n", i)
        if hdr_end < 0 or not data.startswith(b"WARC/", i):
            skipped += 1
            break
        headers: dict[str, str] = {}
        for line in data[i:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "utf-8", "replace"
            )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            skipped += 1
            break
        if clen < 0:  # a negative length would move the cursor BACKWARD
            skipped += 1  # (hostile/corrupt record -> infinite loop)
            break
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end > n:  # truncated trailing record
            skipped += 1
            break
        if headers.get("warc-type") == "response":
            block = data[body_start:body_end]
            # response payload is a full HTTP message; body follows its head
            if block[:5] == b"HTTP/":
                he = block.find(b"\r\n\r\n")
                html = block[he + 4 :] if he >= 0 else b""
            else:  # resource-style raw block
                html = block
            try:
                ts_us = _parse_warc_date(headers.get("warc-date", ""))
                out.append((headers["warc-target-uri"], ts_us, html))
            except (KeyError, ValueError):
                skipped += 1
        i = body_end
    return out, skipped


class WarcParser:
    """Actor-pool ``map_batches`` stage: binary-file rows -> pages rows.

    Input columns:  bytes:binary [, path:string]
    Output columns: url:string, warc_ts:timestamp[us], html:binary,
                    n_skipped:int64 (malformed/non-response records in the
                    source file of this row, attached to every row it yields)
    """

    def __init__(self) -> None:
        # once per actor; the parser itself is allocation-light, but real
        # deployments hook codec/detector state here (reference analog:
        # per-peer reader setup, GraphJobRunner.java:105-182)
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        ts: list[int] = []
        htmls: list[bytes] = []
        skipped: list[int] = []
        for blob in batch.column("bytes"):
            recs, n_skip = parse_warc_stream(blob.as_py())
            for u, t, h in recs:
                urls.append(u)
                ts.append(t)
                htmls.append(h)
                skipped.append(n_skip)
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array(
                    np.array(ts, dtype="datetime64[us]"), type=pa.timestamp("us")
                ),
                "html": pa.array(htmls, type=pa.binary()),
                "n_skipped": pa.array(skipped, type=pa.int64()),
            }
        )


def read_warc(paths: str | list[str], concurrency=(1, 8),
              use_actors: bool = True):
    """WARC files -> pages Dataset (url, warc_ts, html, n_skipped).

    One file = one unit of parallelism (see module docstring).
    ``use_actors=True`` (default) runs the parser as an autoscaling actor
    pool — right for crawl-scale jobs (minutes per ~1 GiB file; per-actor
    setup amortizes, and real deployments hook detector/codec state in
    ``WarcParser.__init__``). For SHORT jobs the pool's ramp-up dominates
    (it starts at the tuple minimum); ``use_actors=False`` schedules plain
    tasks — full cluster width immediately, one parser construction per
    batch (free: the parser holds no state in this repo)."""
    import ray.data as rd

    files = rd.read_binary_files(paths)
    if use_actors:
        return files.map_batches(
            WarcParser,
            batch_format="pyarrow",
            batch_size=1,  # a WARC file is ~1 GiB at crawl scale: one per task
            concurrency=concurrency,
        )
    return files.map_batches(
        lambda b: WarcParser()(b), batch_format="pyarrow", batch_size=1
    )
