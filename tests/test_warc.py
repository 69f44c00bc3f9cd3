"""WARC container read/write (raylink.warc): deterministic serialization,
multi-member gzip parse, malformed-input salvage, and the Ray end-to-end
write_warc -> read_warc roundtrip on the synthetic page corpus."""

import glob
import os

import numpy as np
import pyarrow as pa
import pytest

from raylink.warc import (
    WarcParser,
    parse_warc_stream,
    warc_record_bytes,
    warcinfo_bytes,
)

TS0 = 1704067200_000000  # 2024-01-01T00:00:00Z in us


def test_record_roundtrip_and_determinism():
    rec = warc_record_bytes("https://x.example/a", TS0, b"<p>hi</p>")
    assert rec == warc_record_bytes("https://x.example/a", TS0, b"<p>hi</p>")
    recs, skipped = parse_warc_stream(warcinfo_bytes("f.warc.gz") + rec)
    assert skipped == 0
    assert recs == [("https://x.example/a", TS0, b"<p>hi</p>")]


def test_fractional_seconds_survive():
    ts = TS0 + 123456
    recs, _ = parse_warc_stream(warc_record_bytes("u", ts, b"b"))
    assert recs == [("u", ts, b"b")]


def test_plain_uncompressed():
    data = warcinfo_bytes("f", compress=False) + warc_record_bytes(
        "u", TS0, b"<b>x</b>", compress=False
    )
    recs, skipped = parse_warc_stream(data)
    assert recs == [("u", TS0, b"<b>x</b>")] and skipped == 0


def test_truncated_tail_salvaged():
    good = warc_record_bytes("https://x/1", TS0, b"<p>one</p>")
    data = good + warc_record_bytes("https://x/2", TS0 + 1, b"<p>two</p>")
    recs, _ = parse_warc_stream(data[:-25])
    assert [r[0] for r in recs] == ["https://x/1"]


def test_garbage_and_empty():
    assert parse_warc_stream(b"") == ([], 0)
    recs, skipped = parse_warc_stream(b"this is not a warc")
    assert recs == [] and skipped >= 1


def test_non_response_records_skipped():
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: u\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 4\r\n\r\nGET \r\n\r\n"
    )
    data = req + warc_record_bytes("https://x/1", TS0, b"<i>y</i>", compress=False)
    recs, _ = parse_warc_stream(data)
    assert recs == [("https://x/1", TS0, b"<i>y</i>")]


def test_parser_stage_counts_skips():
    good = warc_record_bytes("https://x/1", TS0, b"<p>one</p>")
    blob = good + b"\x1f\x8btrailing garbage member"
    batch = pa.table({"bytes": pa.array([blob], type=pa.binary())})
    out = WarcParser()(batch)
    assert out.column("url").to_pylist() == ["https://x/1"]
    assert out.column("warc_ts").type == pa.timestamp("us")


@pytest.mark.usefixtures("ray_session")
def test_write_read_warc_end_to_end(tmp_path):
    """pages -> write_warc (parallel, one file per block) -> read_warc ->
    rows identical to the input (url, warc_ts, html)."""
    from raylink.synth import pages_dataset
    from raylink.warc import read_warc, write_warc

    pages, n = pages_dataset("/root/testdata/sf0.001", include_golden=False)
    src = pages.select_columns(["url", "warc_ts", "html"]).materialize()
    out = str(tmp_path / "warc")
    manifest = write_warc(src, out, batch_size=128)
    mrows = manifest.take_all()
    assert sum(r["n_records"] for r in mrows) == n
    assert len(glob.glob(os.path.join(out, "*.warc.gz"))) == len(mrows)

    back = read_warc(out).drop_columns(["n_skipped"]).materialize()
    assert back.count() == n
    a = src.to_pandas().sort_values("url").reset_index(drop=True)
    b = back.to_pandas().sort_values("url").reset_index(drop=True)
    assert a["url"].tolist() == b["url"].tolist()
    assert (a["warc_ts"].to_numpy() == b["warc_ts"].to_numpy()).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(a["html"], b["html"]))

    # idempotent rewrite: same content -> same file names, same bytes
    files0 = {p: open(p, "rb").read() for p in glob.glob(os.path.join(out, "*"))}
    write_warc(src, out, batch_size=128)
    for p, body in files0.items():
        assert open(p, "rb").read() == body
