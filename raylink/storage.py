"""pyarrow.fs-backed storage layer for shards, checkpoints and sinks.

Every byte of engine state (CSR shard .npz, per-superstep state/metrics/
message parquet, boundary files, manifests, partitioned sink output) goes
through this module instead of bare POSIX calls, so a graph dir or checkpoint
root may be:

- a plain local path (``/tmp/raylink/...``) — the single-node fast path;
- any ``pyarrow.fs``-resolvable URI (``file:///...``, ``s3://bucket/...``) —
  the multi-node path: on a fixed-size cluster every worker resolves the URI
  independently, so state written by a task on node A in round t is readable
  by a task on node B in round t+1 (the reference runs on HDFS for exactly
  this reason: Docker/Hama/Goffish_Hama_Bin/goffish:15 job filesystem);
- an explicit ``pyarrow.fs.FileSystem`` object (e.g. a ``SubTreeFileSystem``)
  passed as ``filesystem=`` — pyarrow filesystems pickle, so they travel into
  Ray tasks inside closures / dataclass fields.

Atomicity: writes go to a ``.tmp-*`` sibling then ``fs.move`` when the
filesystem supports rename (local); object stores fall back to a direct
write, whose single PUT is already atomic.
"""

from __future__ import annotations

import io
import json
import posixpath
import uuid
from urllib.parse import urlparse

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from pyarrow import fs as pafs

_LOCAL = pafs.LocalFileSystem()
_URI_FS_CACHE: dict[str, pafs.FileSystem] = {}  # per-process "scheme://netloc" -> fs


def resolve(path: str, filesystem=None) -> tuple:
    """(path-or-URI, optional fs) -> (FileSystem, fs-native path)."""
    if filesystem is not None:
        return filesystem, path
    if "://" in path:
        u = urlparse(path)
        root = f"{u.scheme}://{u.netloc}"
        fs = _URI_FS_CACHE.get(root)
        if fs is None:
            fs, _ = pafs.FileSystem.from_uri(path)
            _URI_FS_CACHE[root] = fs
        # fs-native path: file:// drops the scheme; bucket stores keep netloc
        p = u.path if u.scheme == "file" else f"{u.netloc}{u.path}"
        return fs, p
    return _LOCAL, path


def for_ray(paths, filesystem=None) -> tuple:
    """Normalize (paths, fs) for ray.data read/write APIs: URIs are resolved
    once here and passed as (fs-native paths, FileSystem) so every Ray task
    gets a concrete filesystem object instead of re-parsing URI strings."""
    single = isinstance(paths, str)
    plist = [paths] if single else list(paths)
    if filesystem is None and plist and "://" in plist[0]:
        filesystem, _ = resolve(plist[0])
        plist = [resolve(p)[1] for p in plist]
    return (plist[0] if single else plist), filesystem


def join(*parts: str) -> str:
    """Path join that is URI-safe (always '/', no drive handling)."""
    return posixpath.join(*parts)


def makedirs(path: str, filesystem=None) -> None:
    fs, p = resolve(path, filesystem)
    fs.create_dir(p, recursive=True)


def exists(path: str, filesystem=None) -> bool:
    fs, p = resolve(path, filesystem)
    return fs.get_file_info(p).type != pafs.FileType.NotFound


def listdir(path: str, filesystem=None) -> list[str]:
    """Base names of files directly under ``path`` (sorted)."""
    fs, p = resolve(path, filesystem)
    infos = fs.get_file_info(pafs.FileSelector(p, recursive=False))
    return sorted(
        posixpath.basename(i.path) for i in infos if i.type == pafs.FileType.File
    )


def list_subdirs(path: str, filesystem=None) -> list[str]:
    """Base names of directories directly under ``path`` (sorted); empty if
    the path does not exist."""
    fs, p = resolve(path, filesystem)
    try:
        infos = fs.get_file_info(pafs.FileSelector(p, recursive=False))
    except FileNotFoundError:
        return []
    return sorted(
        posixpath.basename(i.path)
        for i in infos
        if i.type == pafs.FileType.Directory
    )


def delete_dir(path: str, filesystem=None) -> None:
    fs, p = resolve(path, filesystem)
    try:
        fs.delete_dir(p)
    except FileNotFoundError:
        pass


def write_bytes_atomic(data: bytes, path: str, filesystem=None) -> None:
    fs, p = resolve(path, filesystem)
    parent = posixpath.dirname(p)
    if parent:
        fs.create_dir(parent, recursive=True)
    tmp = f"{p}.tmp-{uuid.uuid4().hex[:8]}"
    with fs.open_output_stream(tmp) as f:
        f.write(data)
    try:
        fs.move(tmp, p)
    except (NotImplementedError, pa.ArrowNotImplementedError):
        # capability-based fallback ONLY: the store has no rename (object
        # stores), where a single-PUT direct write is itself atomic. A
        # FAILING rename on a rename-capable filesystem (permissions, IO
        # error) must surface, not silently drop atomicity.
        with fs.open_output_stream(p) as f:
            f.write(data)
        fs.delete_file(tmp)


def read_bytes(path: str, filesystem=None) -> bytes:
    fs, p = resolve(path, filesystem)
    with fs.open_input_file(p) as f:
        return f.read()


def write_json_atomic(obj, path: str, filesystem=None) -> None:
    write_bytes_atomic(json.dumps(obj).encode(), path, filesystem)


def read_json(path: str, filesystem=None):
    """Parsed JSON, or None if missing/corrupt (manifest probing)."""
    try:
        return json.loads(read_bytes(path, filesystem))
    except (FileNotFoundError, OSError, json.JSONDecodeError):
        return None


def write_table_atomic(table: pa.Table, path: str, filesystem=None) -> None:
    sink = io.BytesIO()
    pq.write_table(table, sink)
    write_bytes_atomic(sink.getvalue(), path, filesystem)


def read_table(path: str, filesystem=None) -> pa.Table:
    return pq.read_table(io.BytesIO(read_bytes(path, filesystem)))


def read_table_dir(path: str, filesystem=None) -> pa.Table:
    """Concat of every ``*.parquet`` file directly under ``path``."""
    names = [n for n in listdir(path, filesystem) if n.endswith(".parquet")]
    tables = [read_table(join(path, n), filesystem) for n in names]
    return pa.concat_tables(tables)


def save_npz_atomic(path: str, arrays: dict, filesystem=None) -> None:
    sink = io.BytesIO()
    np.savez(sink, **arrays)
    write_bytes_atomic(sink.getvalue(), path, filesystem)


def load_npz(path: str, filesystem=None) -> dict:
    with np.load(io.BytesIO(read_bytes(path, filesystem))) as z:
        return {k: z[k] for k in z.files}
