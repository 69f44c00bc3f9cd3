"""Resumable partitioned parquet sink.

The north rule's output contract: partitioned layout (one directory per key
range), atomic-ish completion marking, and a manifest so a failed run can
skip finished partitions instead of rewriting everything. ``write_partitioned``
hash-partitions rows by a key column into ``num_parts`` subdirectories; each
completed partition is recorded in ``_manifest.json``; re-running the same
write skips completed partitions (verified in tests). A re-run whose
``num_parts``/``key``/``partitioner`` differ from the manifest's raises —
rows of a "completed" partition under a DIFFERENT partitioning would be
silently dropped otherwise.

All IO goes through ``raylink.storage`` (pyarrow.fs): ``out_dir`` may be a
local path, a URI (``s3://...``), or paired with an explicit ``filesystem=``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink import storage
from raylink.util import PARTITIONERS


def _manifest_path(out_dir: str) -> str:
    return storage.join(out_dir, "_manifest.json")


def read_manifest(out_dir: str, filesystem=None) -> dict:
    man = storage.read_json(_manifest_path(out_dir), filesystem)
    return man if man is not None else {"completed": []}


def write_partitioned(
    ds,
    out_dir: str,
    key: str,
    num_parts: int = 16,
    partitioner: str = "hash",
    filesystem=None,
) -> dict:
    """Write ``ds`` as ``{out_dir}/part={p}/*.parquet`` partitioned by
    ``hash(key) % num_parts``; returns the manifest. Partitions already
    listed as completed in the manifest are skipped (resumable output);
    only rows of UNFINISHED partitions enter the shuffle, so resume cost
    is proportional to remaining work."""
    man = read_manifest(out_dir, filesystem)
    done = set(man.get("completed", []))
    if done:
        # a manifest written under different parameters must not be
        # "resumed": its completed set means something else entirely
        for nm, val in (("num_parts", num_parts), ("key", key),
                        ("partitioner", partitioner)):
            if man.get(nm) is not None and man[nm] != val:
                raise ValueError(
                    f"write_partitioned: {out_dir!r} was written with "
                    f"{nm}={man[nm]!r}, not {val!r} — resuming would "
                    "silently drop rows; use a fresh out_dir"
                )
    todo = [p for p in range(num_parts) if p not in done]
    if not todo:
        return man
    partfn = PARTITIONERS[partitioner]
    done_sorted = np.array(sorted(done), dtype=np.int64)

    def add_part(batch: pa.Table) -> pa.Table:
        v = batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        p = partfn(v, num_parts)
        t = batch.append_column("_part", pa.array(p))
        if len(done_sorted):  # resume: completed partitions skip the shuffle
            from raylink.util import isin_sorted

            t = t.filter(pa.array(~isin_sorted(done_sorted, p.astype(np.int64))))
        return t

    tagged = ds.map_batches(add_part, batch_format="pyarrow")

    def write_group(group: pa.Table) -> pa.Table:
        p = int(group.column("_part")[0].as_py())
        storage.write_table_atomic(
            group.drop_columns(["_part"]),
            storage.join(out_dir, f"part={p}", "data.parquet"),
            filesystem,
        )
        return pa.table({"part": pa.array([p], type=pa.int32()),
                         "rows": pa.array([group.num_rows], type=pa.int64()),
                         "skipped": pa.array([False])})

    storage.makedirs(out_dir, filesystem)
    report = tagged.groupby("_part").map_groups(
        write_group, batch_format="pyarrow"
    ).to_pandas()
    newly = (
        [int(r.part) for r in report.itertuples() if not r.skipped]
        if len(report) and "part" in report.columns
        else []
    )
    man = {
        "completed": sorted(done | set(newly)),
        "num_parts": num_parts,
        "key": key,
        "partitioner": partitioner,
    }
    storage.write_json_atomic(man, _manifest_path(out_dir), filesystem)
    return man


def read_partitioned(out_dir: str, filesystem=None):
    """Read back only the completed partitions; a manifest with no
    completed partitions yet reads as an empty (schema-less) dataset
    rather than crashing."""
    import ray.data as rd

    man = read_manifest(out_dir, filesystem)
    paths = [
        storage.join(out_dir, f"part={p}", "data.parquet")
        for p in man.get("completed", [])
    ]
    if not paths:
        return rd.from_arrow(pa.table({}))
    paths, fs = storage.for_ray(paths, filesystem)
    return rd.read_parquet(paths, filesystem=fs)
