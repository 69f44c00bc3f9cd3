"""Resumable partitioned parquet sink.

The north rule's output contract: partitioned layout (one directory per key
range), atomic-ish completion marking, and a manifest so a failed run can
skip finished partitions instead of rewriting everything. ``write_partitioned``
hash-partitions rows by a key column into ``num_parts`` subdirectories; each
completed partition is recorded in ``_manifest.json``; re-running the same
write skips completed partitions (verified in tests).

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
    listed as completed in the manifest are skipped (resumable output)."""
    man = read_manifest(out_dir, filesystem)
    done = set(man.get("completed", []))
    todo = [p for p in range(num_parts) if p not in done]
    if not todo:
        return man
    partfn = PARTITIONERS[partitioner]

    def add_part(batch: pa.Table) -> pa.Table:
        v = batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("_part", pa.array(partfn(v, num_parts)))

    tagged = ds.map_batches(add_part, batch_format="pyarrow")

    def write_group(group: pa.Table) -> pa.Table:
        p = int(group.column("_part")[0].as_py())
        if p in done:
            return pa.table({"part": pa.array([p], type=pa.int32()),
                             "rows": pa.array([0], type=pa.int64()),
                             "skipped": pa.array([True])})
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
    newly = [int(r.part) for r in report.itertuples() if not r.skipped]
    man = {
        "completed": sorted(done | set(newly)),
        "num_parts": num_parts,
        "key": key,
        "partitioner": partitioner,
    }
    storage.write_json_atomic(man, _manifest_path(out_dir), filesystem)
    return man


def read_partitioned(out_dir: str, filesystem=None):
    """Read back only the completed partitions."""
    import ray.data as rd

    man = read_manifest(out_dir, filesystem)
    paths = [
        storage.join(out_dir, f"part={p}", "data.parquet")
        for p in man.get("completed", [])
    ]
    paths, fs = storage.for_ray(paths, filesystem)
    return rd.read_parquet(paths, filesystem=fs)
