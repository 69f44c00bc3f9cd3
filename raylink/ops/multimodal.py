"""Multimodal column plumbing: opaque ``binary`` media + typed metadata.

The image/audio codec libraries are not available in this environment, so the
DECODE kernel is stubbed (clearly marked); everything Ray-side — schema,
actor-pool stage shape, batch sizing for wide binary rows, deterministic
feature layout — is real and tested.

Format of the synthetic media blob (deterministic, seeded):
  b"RLNKIMG1" | width:uint16 LE | height:uint16 LE | payload bytes
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MAGIC = b"RLNKIMG1"

try:  # real decoder would go here; not present in this environment
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def synth_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table (media_id, media:binary, mime, w, h)."""
    rng = np.random.default_rng(seed)
    blobs, ws, hs = [], [], []
    for i in range(n):
        w, h = int(rng.integers(4, 64)), int(rng.integers(4, 64))
        payload = rng.integers(0, 256, size=w * h, dtype=np.uint8).tobytes()
        blobs.append(MAGIC + struct.pack("<HH", w, h) + payload)
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "media": pa.array(blobs, type=pa.binary()),
            "mime": pa.array(["image/x-rlnk"] * n),
            "width": pa.array(ws, type=pa.int32()),
            "height": pa.array(hs, type=pa.int32()),
        }
    )


class DecodeMedia:
    """Actor-pool map_batches stage: parse header + extract features.

    Real image decode is STUBBED: for non-RLNK mime types this raises
    NotImplementedError unless PIL is importable. The fake decoder is
    deterministic so the plumbing (schema, actor signature, output layout,
    small-batch sizing for wide binary rows) is fully testable.

    Output: media_id, width, height, n_bytes, features: list<float64>[8]
    (byte-value histogram, L1-normalized; float64 so the SQL oracle's exact
    rational c/total matches after rounding).
    """

    N_BINS = 8

    def __init__(self) -> None:
        self.bins = np.linspace(0, 256, self.N_BINS + 1)

    def _decode(self, blob: bytes) -> tuple[int, int, np.ndarray]:
        if blob[:8] == MAGIC:
            w, h = struct.unpack("<HH", blob[8:12])
            return w, h, np.frombuffer(blob[12:], dtype=np.uint8)
        if _HAVE_PIL:  # pragma: no cover - not available in this environment
            raise NotImplementedError("real codec path not wired yet")
        raise NotImplementedError(
            "real image decode requires an image library not present in this "
            "environment; only RLNKIMG1 synthetic blobs are supported"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id")
        ws, hs, nb, feats = [], [], [], []
        for blob in batch.column("media").to_pylist():
            w, h, px = self._decode(bytes(blob))
            hist, _ = np.histogram(px, bins=self.bins)
            total = hist.sum() or 1
            ws.append(w)
            hs.append(h)
            nb.append(len(px))
            feats.append(hist / total)
        return pa.table(
            {
                "media_id": ids,
                "width": pa.array(ws, type=pa.int32()),
                "height": pa.array(hs, type=pa.int32()),
                "n_bytes": pa.array(nb, type=pa.int64()),
                "features": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float64())
                ),
            }
        )


def media_from_documents(docs_ds):
    """Wrap each document's ASCII text bytes as an RLNKIMG1 blob (w = byte
    length, h = 1): a deterministic, real-table-derived media corpus whose
    decoded features are SQL-expressible — the oracle recomputes the byte
    histogram with ord(substr(text, i, 1)). The PRNG ``synth_media`` remains
    for plumbing tests with arbitrary payloads."""
    import struct as _struct

    def wrap(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        blobs, ws = [], []
        for t in batch.column("text").to_pylist():
            bs = (t or "").encode("utf-8")
            w = min(len(bs), 0xFFFF)
            blobs.append(MAGIC + _struct.pack("<HH", w, 1) + bs)
            ws.append(w)
        return pa.table(
            {
                "media_id": ids,
                "media": pa.array(blobs, type=pa.binary()),
                "mime": pa.array(["image/x-rlnk"] * len(blobs)),
                "width": pa.array(ws, type=pa.int32()),
                "height": pa.array(np.ones(len(blobs), dtype=np.int32)),
            }
        )

    return docs_ds.map_batches(wrap, batch_format="pyarrow")


def media_features(media_ds, batch_size: int = 64, concurrency: int = 4):
    """Decode/feature pipeline. Small batch_size on purpose: wide binary rows
    (KB-MB each) x batch_size x concurrency must fit the worker heap."""
    return media_ds.map_batches(
        DecodeMedia,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )
