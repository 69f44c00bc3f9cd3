"""WebDataset tar-shard IO: round-trip, salvage, and the real-format
contract (shards are genuine POSIX tars)."""

import subprocess
import tarfile

import numpy as np
import pyarrow as pa
import pytest


def test_wds_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from raylink.webdataset import (
        read_webdataset, select_field, write_webdataset,
    )

    n = 50
    tbl = pa.table(
        {
            "key": pa.array([f"doc{i:04d}" for i in range(n)]),
            "media": pa.array(
                [bytes([i % 256]) * (i + 1) for i in range(n)], pa.binary()
            ),
            "meta": pa.array([f'{{"i": {i}}}' for i in range(n)]),
        }
    )
    out = tmp_path / "shards"
    manifest = write_webdataset(
        rd.from_arrow(tbl).repartition(4), str(out),
        columns={"media": "bin", "meta": "json"}, batch_size=16,
    ).to_pandas()
    assert manifest["n_samples"].sum() == n
    assert len(manifest) >= 4  # one shard per block

    # the shards are REAL tars: system tar lists them
    one = manifest["path"].iloc[0]
    listing = subprocess.run(["tar", "tf", one], capture_output=True,
                             text=True, check=True).stdout.split()
    assert all(m.endswith((".bin", ".json")) for m in listing)

    got = read_webdataset(str(out)).to_pandas()
    assert int(got["n_skipped"].sum()) == 0
    assert sorted(got["key"]) == sorted(tbl.column("key").to_pylist())
    row = got[got["key"] == "doc0007"].iloc[0]
    fields = dict(zip(row["exts"], row["payloads"]))
    assert bytes(fields["bin"]) == bytes([7]) * 8
    assert bytes(fields["json"]) == b'{"i": 7}'

    media = select_field(read_webdataset(str(out)), "bin").to_pandas()
    assert len(media) == n
    assert bytes(media[media["key"] == "doc0003"]["media"].iloc[0]) == bytes([3]) * 4


def test_wds_truncated_tail_salvage(tmp_path):
    """A shard cut mid-member keeps every complete sample before the cut
    and counts the loss; a fully-garbage shard yields a counted sentinel."""
    from raylink.webdataset import parse_webdataset_shard

    import io

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for k in ("a", "b", "c"):
            data = (k * 600).encode()
            info = tarfile.TarInfo(name=f"{k}.txt")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    whole = buf.getvalue()
    samples, skipped = parse_webdataset_shard(whole)
    assert [k for k, _ in samples] == ["a", "b", "c"] and skipped == 0

    # cut inside c's payload: a+b survive, one loss counted
    cut = whole[: whole.index(b"c.txt") + 700]
    samples, skipped = parse_webdataset_shard(cut)
    assert [k for k, _ in samples] == ["a", "b"]
    assert skipped == 1

    samples, skipped = parse_webdataset_shard(b"\x00garbage" * 100)
    assert samples == [] and skipped == 1


def test_wds_idempotent_shard_names(ray_session, tmp_path):
    """Identical blocks -> identical shard file names (atomic rewrite, the
    resumable-output contract shared with write_warc)."""
    import ray.data as rd

    from raylink.webdataset import write_webdataset

    tbl = pa.table(
        {"key": pa.array(["x", "y"]),
         "media": pa.array([b"1", b"2"], pa.binary())}
    )
    d = tmp_path / "w"
    m1 = write_webdataset(rd.from_arrow(tbl), str(d),
                          columns={"media": "bin"}).to_pandas()
    m2 = write_webdataset(rd.from_arrow(tbl), str(d),
                          columns={"media": "bin"}).to_pandas()
    assert sorted(m1["path"]) == sorted(m2["path"])
    import os

    assert len(os.listdir(d)) == len(m1)


def test_wds_fast_parser_equals_tarfile_parser():
    """Property: the raw-block fast parser and the stdlib-tarfile fallback
    produce identical (samples, skipped) on random shards and at every
    truncation class (clean, mid-payload, mid-header, padding cut)."""
    import io

    from raylink.webdataset import (
        _parse_tar_fast, _parse_webdataset_tarfile, parse_webdataset_shard,
    )

    rng = np.random.default_rng(77)
    for trial in range(20):
        buf = io.BytesIO()
        n_samples = int(rng.integers(1, 8))
        with tarfile.open(fileobj=buf, mode="w",
                          format=tarfile.USTAR_FORMAT) as tf:
            for s in range(n_samples):
                for ext in ("bin", "json")[: int(rng.integers(1, 3))]:
                    data = bytes(rng.integers(0, 256,
                                              int(rng.integers(0, 1500)),
                                              dtype=np.uint8))
                    info = tarfile.TarInfo(name=f"k{trial}_{s}.{ext}")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
        whole = buf.getvalue()
        cuts = [len(whole)] + [int(rng.integers(1, len(whole)))
                               for _ in range(6)]
        for cut in cuts:
            data = whole[:cut]
            assert _parse_tar_fast(data)[2], "fast path must handle ustar"
            fast = parse_webdataset_shard(data)
            slow = _parse_webdataset_tarfile(data)
            assert fast == slow, (trial, cut)


def test_wds_pax_shard_falls_back(tmp_path):
    """A PAX shard (extension members) is parsed via the tarfile fallback
    path — same samples out."""
    import io

    from raylink.webdataset import _parse_tar_fast, parse_webdataset_shard

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.PAX_FORMAT,
                      pax_headers={"comment": "x"}) as tf:
        data = b"payload"
        info = tarfile.TarInfo(name="k1.bin")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    blob = buf.getvalue()
    assert not _parse_tar_fast(blob)[2]  # extension members present
    samples, skipped = parse_webdataset_shard(blob)
    assert samples == [("k1", {"bin": b"payload"})] and skipped == 0


def test_wds_gzip_shard():
    """.tar.gz shards decompress through the salvaging gunzip, then parse
    identically; a truncated gzip tail keeps the samples that decode."""
    import gzip
    import io

    from raylink.webdataset import parse_webdataset_shard

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for k in ("a", "b"):
            data = (k * 700).encode()
            info = tarfile.TarInfo(name=f"{k}.txt")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    gz = gzip.compress(buf.getvalue())
    samples, skipped = parse_webdataset_shard(gz)
    assert [k for k, _ in samples] == ["a", "b"] and skipped == 0
    assert bytes(samples[0][1]["txt"]) == b"a" * 700

    cut = parse_webdataset_shard(gz[: len(gz) // 2])
    assert [k for k, _ in cut[0]] in ([], ["a"])  # whatever decoded


def test_wds_key_convention_first_dot_and_dirs():
    """WebDataset key rules (review findings): extension = everything after
    the FIRST dot of the basename (dotted extensions stay whole) and
    directories stay part of the key (a/x vs b/x are different samples);
    an all-zero shard is counted as lost, not a clean empty archive."""
    import io

    from raylink.webdataset import _key_of, parse_webdataset_shard

    assert _key_of("k.seg.png") == ("k", "seg.png")
    assert _key_of("a/x.bin") == ("a/x", "bin")
    assert _key_of("b/x.bin") == ("b/x", "bin")
    assert _key_of("plain") == ("plain", "")

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in (("k.jpg", b"1"), ("k.seg.png", b"2"),
                           ("a/x.bin", b"3"), ("b/x.bin", b"4")):
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    samples, skipped = parse_webdataset_shard(buf.getvalue())
    assert skipped == 0
    assert samples == [
        ("k", {"jpg": b"1", "seg.png": b"2"}),
        ("a/x", {"bin": b"3"}),
        ("b/x", {"bin": b"4"}),
    ]

    assert parse_webdataset_shard(b"\0" * 2048) == ([], 1)
