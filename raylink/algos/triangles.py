"""Triangle counting — 2-round wedge-join dataflow.

The reference counts triangles subgraph-centrically with 2 message rounds of
byte-packed candidate pairs (sample-hama/.../TriangleCount.java:74-392),
de-duplicating via vertex-id ordering (:104,131). The Ray-Data-native
re-expression is the classic node-iterator++ dataflow with one upgrade the
reference lacks (SURVEY.md §4 "skew: none"): edges are oriented by
(degree, vid) rank instead of bare vid, which bounds per-vertex oriented
out-degree ~O(sqrt(E)) and keeps the wedge stage from exploding on
high-degree hub vertices.

  1. canonical distinct undirected edges (min,max) + degree table;
  2. orient each edge low-rank -> high-rank (broadcast degree lookup);
  3. wedges: per oriented-adjacency group, all rank-ordered neighbour pairs,
     pre-counted per group;
  4. close: wedge candidates ∪ oriented edges grouped on a packed (u,v)
     key; a wedge contributes iff the closing edge exists.

Count is orientation-invariant, so it equals the reference's vid-ordered
count exactly. Assumes vids < 2**31 for key packing (true for crawl-local
ids; swap to two-column join otherwise).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _canon(batch: pa.Table) -> pa.Table:
    s = batch.column("src").to_numpy(zero_copy_only=False)
    d = batch.column("dst").to_numpy(zero_copy_only=False)
    keep = s != d  # drop self-loops (reference: snapToMetisInput.py:52-53)
    a = np.minimum(s[keep], d[keep]).astype(np.int64)
    b = np.maximum(s[keep], d[keep]).astype(np.int64)
    key = (a << np.int64(32)) | b
    return pa.table({"key": pa.array(np.unique(key))})


def _unpack(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return keys >> np.int64(32), keys & np.int64(0xFFFFFFFF)


def triangle_count(edges_ds, wedge_cap: int | None = None):
    """Global triangle count of the undirected simple graph. Returns int."""
    import ray
    import ray.data as rd

    edges = edges_ds.map_batches(_canon, batch_format="pyarrow")
    # distinct canonical edges (hash-partitioned exact dedup on the packed key)
    distinct = edges.groupby("key").count().select_columns(["key"]).materialize()

    # degree table -> driver -> broadcast (small relative to E; at crawl scale
    # replace with a hash join of a degree Dataset — documented fallback)
    def endpoints(batch: pa.Table) -> pa.Table:
        a, b = _unpack(batch.column("key").to_numpy(zero_copy_only=False))
        v, c = np.unique(np.concatenate([a, b]), return_counts=True)
        return pa.table({"vid": pa.array(v), "c": pa.array(c)})

    deg_pdf = (
        distinct.map_batches(endpoints, batch_format="pyarrow")
        .groupby("vid")
        .sum("c")
        .to_pandas()
    )
    vid_arr = deg_pdf["vid"].to_numpy(dtype=np.int64)
    deg_arr = deg_pdf["sum(c)"].to_numpy(dtype=np.int64)
    order = np.argsort(vid_arr)
    ref = ray.put((vid_arr[order], deg_arr[order]))

    def orient(batch: pa.Table) -> pa.Table:
        vids, degs = ray.get(ref)
        a, b = _unpack(batch.column("key").to_numpy(zero_copy_only=False))
        da = degs[np.searchsorted(vids, a)]
        db = degs[np.searchsorted(vids, b)]
        # rank(v) = (deg, vid); orient low rank -> high rank
        a_first = (da < db) | ((da == db) & (a < b))
        lo = np.where(a_first, a, b)
        hi = np.where(a_first, b, a)
        return pa.table({"src": pa.array(lo), "dst": pa.array(hi)})

    oriented = distinct.map_batches(orient, batch_format="pyarrow")

    def wedges(group: pa.Table) -> pa.Table:
        vids, degs = ray.get(ref)
        nbr = np.unique(group.column("dst").to_numpy(zero_copy_only=False))
        if len(nbr) < 2:
            return pa.table({"key": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64()),
                             "is_edge": pa.array([], type=pa.int64())})
        d = degs[np.searchsorted(vids, nbr)]
        rank_order = np.lexsort((nbr, d))
        nbr = nbr[rank_order]
        ii, jj = np.triu_indices(len(nbr), k=1)
        key = (nbr[ii] << np.int64(32)) | nbr[jj]
        key, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "key": pa.array(key),
                "cnt": pa.array(cnt.astype(np.int64)),
                "is_edge": pa.array(np.zeros(len(key), dtype=np.int64)),
            }
        )

    cands = oriented.groupby("src").map_groups(wedges, batch_format="pyarrow")

    def edge_rows(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        key = (s << np.int64(32)) | d
        n = len(key)
        return pa.table(
            {
                "key": pa.array(key),
                "cnt": pa.array(np.zeros(n, dtype=np.int64)),
                "is_edge": pa.array(np.ones(n, dtype=np.int64)),
            }
        )

    both = cands.union(oriented.map_batches(edge_rows, batch_format="pyarrow"))

    def close(group: pa.Table) -> pa.Table:
        cnt = group.column("cnt").to_numpy(zero_copy_only=False)
        is_edge = group.column("is_edge").to_numpy(zero_copy_only=False)
        t = int(cnt.sum()) if is_edge.any() else 0
        return pa.table({"t": pa.array([t], type=pa.int64())})

    total = both.groupby("key").map_groups(close, batch_format="pyarrow").sum("t")
    return int(total or 0)
