"""Resumable partitioned parquet sink.

The north rule's output contract: partitioned layout (one directory per key
range), atomic-ish completion marking, and a manifest so a failed run can
skip finished partitions instead of rewriting everything. ``write_partitioned``
hash-partitions rows by a key column into ``num_parts`` subdirectories; each
completed partition is recorded in ``_manifest.json``; re-running the same
write skips completed partitions (verified in tests).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from raylink.util import PARTITIONERS


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.json")


def read_manifest(out_dir: str) -> dict:
    try:
        with open(_manifest_path(out_dir)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return {"completed": []}


def write_partitioned(
    ds,
    out_dir: str,
    key: str,
    num_parts: int = 16,
    partitioner: str = "hash",
) -> dict:
    """Write ``ds`` as ``{out_dir}/part={p}/*.parquet`` partitioned by
    ``hash(key) % num_parts``; returns the manifest. Partitions already
    listed as completed in the manifest are skipped (resumable output)."""
    man = read_manifest(out_dir)
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
        import pyarrow.parquet as pq
        import uuid as _uuid

        p = int(group.column("_part")[0].as_py())
        if p in done:
            return pa.table({"part": pa.array([p], type=pa.int32()),
                             "rows": pa.array([0], type=pa.int64()),
                             "skipped": pa.array([True])})
        pdir = os.path.join(out_dir, f"part={p}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, f".data-{_uuid.uuid4().hex[:8]}.tmp")
        pq.write_table(group.drop_columns(["_part"]), tmp)
        os.replace(tmp, os.path.join(pdir, "data.parquet"))
        return pa.table({"part": pa.array([p], type=pa.int32()),
                         "rows": pa.array([group.num_rows], type=pa.int64()),
                         "skipped": pa.array([False])})

    os.makedirs(out_dir, exist_ok=True)
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
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, _manifest_path(out_dir))
    return man


def read_partitioned(out_dir: str):
    """Read back only the completed partitions."""
    import ray.data as rd

    man = read_manifest(out_dir)
    paths = [
        os.path.join(out_dir, f"part={p}", "data.parquet")
        for p in man.get("completed", [])
    ]
    return rd.read_parquet(paths)
