"""WebDataset-style tar-shard IO — the de-facto container for large-scale
multimodal training data (a dataset = many POSIX tar shards; a sample = all
members sharing a basename key, member extensions naming the field).
Stdlib ``tarfile`` only: shards are REAL tar files `tar tf` and any
WebDataset loader open.

- ``write_webdataset(ds, out_dir, columns=...)``: one ``.tar`` per input
  block (content-derived idempotent names + atomic rename — the resumable
  shard layout, mirroring raylink.warc). Each row's binary/string columns
  become ``<key>.<ext>`` members, consecutive per sample (the WebDataset
  contract that lets readers stream without an index).
- ``read_webdataset(paths)``: ``read_binary_files`` -> per-shard parse
  (one file = one unit of parallelism), members grouped by basename key ->
  one row per sample, one binary column per extension + ``__shard__``.
  Tolerates a truncated final member (salvage: complete samples kept,
  partial tail counted in ``n_skipped``).

At 100 TB: shard size is set by the WRITER's ``batch_size`` (pick
payload x batch_size ~ 0.5-1 GiB, the standard WebDataset shard target);
the reader's parallelism is the shard count, and a sample never spans
shards, so decode stages (DecodeMedia / FrameSampler actor pools) stream
shard-by-shard with no cross-file state.
"""

from __future__ import annotations

import io
import os
import tarfile

import numpy as np
import pyarrow as pa

from raylink.warc import _fnv64


class _WdsWriteBatch:
    """map_batches fn: sample block -> one .tar shard + manifest row."""

    def __init__(self, out_dir: str, key_col: str, columns: dict[str, str]):
        self.out_dir = out_dir
        self.key_col = key_col
        self.columns = columns  # column name -> member extension
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = [str(k) for k in batch.column(self.key_col).to_pylist()]
        if not keys:
            return pa.table({"path": pa.array([], type=pa.string()),
                             "n_samples": pa.array([], type=pa.int64())})
        cols = {
            c: batch.column(c).to_pylist() for c in self.columns
        }
        h = 0xCBF29CE484222325
        for k in keys:
            h = ((h ^ _fnv64(k.encode())) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        name = f"shard-{h:016x}-{len(keys)}.tar"
        path = os.path.join(self.out_dir, name)
        tmp = path + ".tmp"
        # stream straight to the tmp file: buffering the whole shard in a
        # BytesIO + getvalue() copy held ~2x the 0.5-1 GiB shard target in
        # memory per write task (review finding)
        with open(tmp, "wb") as f, tarfile.open(fileobj=f, mode="w") as tf:
            for i, k in enumerate(keys):
                for c, ext in self.columns.items():
                    v = cols[c][i]
                    data = (v.encode("utf-8") if isinstance(v, str)
                            else bytes(v or b""))
                    info = tarfile.TarInfo(name=f"{k}.{ext}")
                    info.size = len(data)
                    info.mtime = 0  # deterministic bytes -> idempotent shard
                    tf.addfile(info, io.BytesIO(data))
        os.replace(tmp, path)  # atomic: readers never see partial shards
        return pa.table({"path": pa.array([path]),
                         "n_samples": pa.array([len(keys)], type=pa.int64())})


def write_webdataset(ds, out_dir: str, columns: dict[str, str],
                     key_col: str = "key", batch_size: int = 1024):
    """Dataset -> WebDataset tar shards; returns the (small) manifest
    Dataset (path, n_samples). ``columns`` maps column -> member extension,
    e.g. ``{"media": "bmp", "meta": "json"}``."""
    return ds.map_batches(
        _WdsWriteBatch(out_dir, key_col, columns),
        batch_format="pyarrow", batch_size=batch_size,
    ).materialize()


_TRUNC_HEADER = object()  # sentinel: cut/corrupt header, member key unknown


def _parse_tar_fast(data: bytes):
    """Raw 512-byte-block tar walk -> ([(name, payload_memoryview)],
    trunc, ok). Much faster than stdlib tarfile (no per-member object
    machinery; payloads are zero-copy views into the shard buffer).
    ``trunc`` is None (clean end), a member NAME (that member's payload was
    cut — its header was intact), or ``_TRUNC_HEADER`` (cut/corrupt
    header, key unknowable). Returns ok=False on any extension member
    (pax / GNU long-name / sparse) so the caller falls back to the full
    tarfile parser — correctness never depends on this path's coverage."""
    view = memoryview(data)
    out: list[tuple[str, memoryview]] = []
    pos, n = 0, len(data)
    while pos + 512 <= n:
        hdr = view[pos: pos + 512]
        if hdr[0] == 0:
            if any(hdr):  # zero-led garbage is NOT an end-of-archive block
                return out, _TRUNC_HEADER, True
            if not out and pos == 0:
                # all-zero shard (preallocated-never-written): stdlib
                # tarfile.open raises ReadError -> counted, not clean-empty
                return [], _TRUNC_HEADER, True
            return out, None, True  # end-of-archive zero block
        # checksum: octal at 148:156, computed with the field spaced out
        try:
            want = int(bytes(hdr[148:156]).split(b"\0")[0].strip() or b"0", 8)
            size = int(bytes(hdr[124:136]).split(b"\0")[0].strip() or b"0", 8)
        except ValueError:
            # non-octal numeric field: either corruption or a VALID header
            # this walk does not speak (GNU base-256 size for >= 8 GiB
            # members) — the tarfile fallback decides, so coverage gaps
            # here can never silently drop members
            return [], None, False
        if sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:]) != want:
            # corrupt OR a valid signed-checksum tar: tarfile decides
            return [], None, False
        typeflag = hdr[156]
        if typeflag in (ord("L"), ord("K"), ord("x"), ord("g"), ord("S")):
            return [], None, False  # extension member: use the tarfile path
        name = bytes(hdr[:100]).split(b"\0")[0].decode("utf-8", "replace")
        end = pos + 512 + size
        if end > n:
            return out, name, True  # truncated payload, header intact
        if typeflag in (0, ord("0")):
            out.append((name, view[pos + 512: end]))
        pos += 512 + ((size + 511) & ~511)
        if pos > n:
            # payload complete but its zero-padding cut: stdlib tarfile
            # raises here (seek past EOF), key context lost -> same drop
            return out, _TRUNC_HEADER, True
    # no full header block left: stdlib tarfile treats a partial TRAILING
    # block as clean EOF but an absent/partial FIRST block as an error
    # (tarfile.open raises) — mirrored exactly; the equivalence property
    # test is the contract
    if not out and pos == 0:
        return [], _TRUNC_HEADER, True
    return out, None, True


def _key_of(name: str) -> tuple[str, str]:
    """WebDataset key convention: the key is the member path up to the
    FIRST dot of the basename (directories stay part of the key, so
    'a/x.bin' and 'b/x.bin' are different samples); the extension is
    everything after that first dot ('seg.png' style dotted extensions
    stay whole)."""
    d, _, base = name.rpartition("/")
    stem, dot, ext = base.partition(".")
    key = f"{d}/{stem}" if d else stem
    return (key, ext) if dot else (key, "")


def parse_webdataset_shard(data: bytes) -> tuple[list[tuple[str, dict]], int]:
    """One shard's bytes -> ([(key, {ext: bytes})], n_skipped).

    Samples = maximal runs of members sharing a basename key (the
    WebDataset adjacency contract). A corrupt / truncated tail drops only
    what cannot be proven complete; samples before it survive. Fast
    raw-block parse with zero-copy payload slices; full tarfile fallback
    for shards carrying extension members (pax/long-name/sparse).
    ``.tar.gz`` shards decompress through the WARC layer's salvaging
    multi-member gunzip first (truncated gzip tails keep what decodes)."""
    if data[:2] == b"\x1f\x8b":
        from raylink.warc import _gunzip_salvage

        data = _gunzip_salvage(data)
    members, trunc, ok = _parse_tar_fast(data)
    if not ok:
        return _parse_webdataset_tarfile(data)
    samples: list[tuple[str, dict]] = []
    cur_key: str | None = None
    cur: dict = {}
    for name, payload in members:
        key, ext = _key_of(name)
        if key != cur_key:
            if cur_key is not None:
                samples.append((cur_key, cur))
            cur_key, cur = key, {}
        cur[ext] = bytes(payload)
    skipped = 0 if trunc is None else 1
    if cur_key is not None:
        if trunc is None:
            samples.append((cur_key, cur))  # clean end: last sample complete
        elif trunc is not _TRUNC_HEADER and _key_of(trunc)[0] != cur_key:
            # the truncated member's (intact) header shows a NEW key, so
            # cur was provably closed — keep it (same rule as the tarfile
            # path); otherwise completeness is unknowable -> drop
            samples.append((cur_key, cur))
    return samples, skipped


def _parse_webdataset_tarfile(data: bytes) -> tuple[list[tuple[str, dict]], int]:
    """The stdlib-tarfile parser (full member-type coverage)."""
    samples: list[tuple[str, dict]] = []
    skipped = 0
    cur_key: str | None = None
    cur: dict = {}
    try:
        tf = tarfile.open(fileobj=io.BytesIO(data))
    except (tarfile.TarError, EOFError, OSError):
        return [], 1  # not a tar at all
    with tf:
        while True:
            try:
                info = tf.next()
            except (tarfile.TarError, EOFError, OSError):
                # truncated HEADER: whether cur had further members is
                # unknowable -> drop it (complete-samples-only guarantee)
                skipped += 1
                cur_key = None
                break
            if info is None:
                break
            if not info.isfile():
                continue
            base = os.path.basename(info.name)
            key, dot, ext = base.rpartition(".")
            if not dot:
                key, ext = base, ""
            try:
                payload = tf.extractfile(info).read()
                if len(payload) != info.size:
                    raise EOFError("short member payload")
            except (tarfile.TarError, EOFError, OSError):
                # truncated PAYLOAD: this member's key closed cur, so cur
                # is provably complete — keep it; the partial one is lost
                skipped += 1
                if key != cur_key and cur_key is not None:
                    samples.append((cur_key, cur))
                cur_key = None
                break
            if key != cur_key:
                if cur_key is not None:
                    samples.append((cur_key, cur))
                cur_key, cur = key, {}
            cur[ext] = payload
    if cur_key is not None:
        samples.append((cur_key, cur))
    return samples, skipped


class WdsParser:
    """map_batches fn over read_binary_files rows (one shard per row)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys, shards, exts_all, payloads, skips = [], [], [], [], []
        for path, data in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            samples, skipped = parse_webdataset_shard(bytes(data))
            if not samples and skipped:
                # fully-corrupt shard: one sentinel row carries the count
                samples = [("", {})]
            for i, (k, fields) in enumerate(samples):
                keys.append(k)
                shards.append(path)
                exts_all.append(list(fields.keys()))
                payloads.append(list(fields.values()))
                # shard skip count rides on its first row (sum(n_skipped)
                # over the Dataset == total partial samples dropped)
                skips.append(skipped if i == 0 else 0)
        # flat layout: one row per sample; per-sample field lists (a sample
        # may carry any subset of extensions — schema-free like WebDataset)
        return pa.table(
            {
                "key": pa.array(keys, type=pa.string()),
                "__shard__": pa.array(shards, type=pa.string()),
                "exts": pa.array(exts_all, type=pa.list_(pa.string())),
                "payloads": pa.array(payloads, type=pa.list_(pa.binary())),
                "n_skipped": pa.array(
                    np.asarray(skips, dtype=np.int64), type=pa.int64()
                ),
            }
        )  # explicit types everywhere: an empty shard batch must carry the
        #    same schema as a full one (Ray unions blocks across files)


def read_webdataset(paths, use_actors: bool = False, concurrency=(1, 8)):
    """WebDataset tar shards -> Dataset (key, __shard__, exts, payloads).

    One shard = one unit of parallelism (same rationale as read_warc).
    Use ``select_field`` to project one extension to a flat binary column
    for a decode stage."""
    import ray.data as rd

    files = rd.read_binary_files(paths, include_paths=True)
    if use_actors:
        return files.map_batches(WdsParser, batch_format="pyarrow",
                                 batch_size=1, concurrency=concurrency)
    return files.map_batches(lambda b: WdsParser()(b),
                             batch_format="pyarrow", batch_size=1)


def select_field(wds_ds, ext: str, out_col: str = "media"):
    """Project one member extension -> (key, <out_col>: binary); samples
    lacking the extension are dropped (count them upstream if needed)."""

    def pick(batch: pa.Table) -> pa.Table:
        keys = batch.column("key").to_pylist()
        exts = batch.column("exts").to_pylist()
        pays = batch.column("payloads").to_pylist()
        ok_k, ok_p = [], []
        for k, es, ps in zip(keys, exts, pays):
            try:
                i = es.index(ext)
            except ValueError:
                continue
            ok_k.append(k)
            ok_p.append(ps[i])
        return pa.table(
            {"key": pa.array(ok_k, type=pa.string()),
             out_col: pa.array(ok_p, type=pa.binary())}
        )

    return wds_ds.map_batches(pick, batch_format="pyarrow")
