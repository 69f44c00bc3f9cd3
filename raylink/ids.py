"""Vertex-id assignment at crawl scale: dense remap + collision-safe urls.

Two id regimes coexist in the engine:

- **embedded integer ids** (the synthetic corpus, pre-partitioned readers):
  vids are already small dense ints — every packed-pair-key operator
  (``distinct_edges``, ``triangle_count``, dedup pair generation,
  ``pair_attach``) applies directly.
- **hash-assigned ids** (``hash_ids_from_urls`` — the production path for a
  real crawl): ``hash64_str`` yields 63-bit ids. Packed ``(a<<32)|b`` keys
  would silently alias, so those operators now *guard* (``assert_packable``)
  and this module provides the cure:

``dense_id_remap(edges)`` — distributed zip-with-index over the distinct vid
table: bucket vids by ``splitmix64(vid) % B``, count per bucket (the driver
holds only the O(B) bucket histogram), prefix-sum bucket offsets, then rank
each vid inside its sorted bucket — ``dense = offset[bucket] + rank``. The
result is a deterministic bijection onto ``[0, N)``; edges are remapped with
the thresholded ``attach_lookup`` (broadcast while the map is small, hash
join when it is dataset-sized). The inverse map (vid, dense) is returned as
a Dataset so it can be persisted next to the graph and used to translate
results back.

``collision_safe_ids(urls)`` — the >10^9-url regime where 64-bit digests
themselves start colliding (``hash64_str`` documents ~5*10^4 expected
colliding pairs at 10^12 urls): assigns ``vid = hash64_str(url)`` and then
runs a distributed collision-resolution fixpoint — distinct (vid, url) pairs
are coarse-bucketed by ``splitmix64(vid)`` so all claimants of a vid
co-locate; within a bucket the url-sorted first claimant keeps the vid and
the rest are deterministically rehashed (attempt counter mixed into the
digest) — repeated until a global duplicate count reaches zero. Output is a
(url, vid) mapping that is injective over distinct urls. Compose with
``dense_id_remap`` when packed-key operators follow.

Reference analog: the reference assumes well-formed long ids in its input
formats (LongTextAdjacencyListReader.java:97-98) and never hashes urls —
id assignment at crawl scale is a from-scratch requirement here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.util import assert_packable, hash64_str, splitmix64


def _bucket_of(vids: np.ndarray, num_buckets: int) -> np.ndarray:
    return (splitmix64(vids.astype(np.uint64)) % np.uint64(num_buckets)).astype(
        np.int64
    )


def dense_id_remap(
    edges_ds,
    num_buckets: int = 256,
    broadcast_threshold: int | None = None,
    carry_cols: dict | None = None,
    require_packable: bool = True,
):
    """Remap arbitrary int64 vids onto dense ids ``[0, N)``.

    Returns ``(remapped_edges_ds, mapping_ds)`` where ``mapping_ds`` is the
    inverse map ``(vid, dense)`` (persist it next to the graph to translate
    results back to original ids) and ``remapped_edges_ds`` has the same
    columns as the input with ``src``/``dst`` replaced by dense ids.

    ``carry_cols``: explicit name->pyarrow-type dict of extra edge columns
    to carry through the remap joins (e.g. ``{"weight": pa.float64()}``).
    ``require_packable``: assert the dense ids fit the (a<<32)|b packing
    contract (the usual reason to remap); disable for >2^32-vertex corpora
    that only need dense ids — packed-key consumers re-guard themselves.

    Shape: nothing dataset-sized touches the driver — the driver holds the
    O(num_buckets) bucket histogram only; the remap joins go through the
    thresholded ``attach_lookup`` (broadcast below the threshold,
    distributed hash join above it). Determinism: dense ids are assigned by
    (bucket id asc, vid asc within bucket), a pure function of the vid set.
    """
    from raylink.join import BROADCAST_THRESHOLD, attach_lookup

    if broadcast_threshold is None:
        broadcast_threshold = BROADCAST_THRESHOLD
    carry = dict(carry_cols or {})
    B = num_buckets

    def stack(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        v = np.unique(np.concatenate([s, d]))
        return pa.table({"vid": pa.array(v), "bkt": pa.array(_bucket_of(v, B))})

    # distinct vids, co-located per hash bucket (one shuffle of the vid set)
    vids = (
        edges_ds.map_batches(stack, batch_format="pyarrow")
        .groupby(["bkt", "vid"])
        .count()
        .select_columns(["bkt", "vid"])
        .materialize()
    )

    # O(B) bucket histogram -> exclusive prefix offsets (driver-side, tiny)
    hist = vids.groupby("bkt").count().to_pandas()
    counts = np.zeros(B, dtype=np.int64)
    counts[hist["bkt"].to_numpy(np.int64)] = hist["count()"].to_numpy(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    n_vertices = int(counts.sum())

    def rank(group: pa.Table) -> pa.Table:
        v = group.column("vid").to_numpy(zero_copy_only=False)
        b = int(group.column("bkt")[0].as_py())
        order = np.argsort(v)  # vids are distinct within the bucket
        dense = np.empty(len(v), dtype=np.int64)
        dense[order] = offsets[b] + np.arange(len(v), dtype=np.int64)
        return pa.table({"vid": pa.array(v), "dense": pa.array(dense)})

    mapping = vids.groupby("bkt").map_groups(rank, batch_format="pyarrow")
    # two references of `mapping` below (src attach + dst attach) would
    # otherwise re-execute the ranking per consumer
    mapping = mapping.materialize()

    def src_side(batch: pa.Table) -> pa.Table:
        cols = {"vid": batch.column("src"), "dst": batch.column("dst")}
        for nm in carry:
            cols[nm] = batch.column(nm)
        return pa.table(cols)

    left1 = {"dst": pa.int64(), **carry}
    a1 = attach_lookup(
        edges_ds.map_batches(src_side, batch_format="pyarrow"),
        mapping, on="vid", left_cols=left1, value_cols={"dense": pa.int64()},
        n_lookup_rows=n_vertices, broadcast_threshold=broadcast_threshold,
    )

    def flip(batch: pa.Table) -> pa.Table:
        cols = {"vid": batch.column("dst"), "src": batch.column("dense")}
        for nm in carry:
            cols[nm] = batch.column(nm)
        return pa.table(cols)

    left2 = {"src": pa.int64(), **carry}
    a2 = attach_lookup(
        a1.map_batches(flip, batch_format="pyarrow"),
        mapping, on="vid", left_cols=left2, value_cols={"dense": pa.int64()},
        n_lookup_rows=n_vertices, broadcast_threshold=broadcast_threshold,
    )

    def finish(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dense").to_numpy(zero_copy_only=False)
        if require_packable:
            # the common caller intent (feeding packed-key ops); pass
            # require_packable=False for >2^32-vertex corpora that only
            # need dense CSR ids — the packed-key consumers re-guard
            assert_packable(s, "dense_id_remap output src")
            assert_packable(d, "dense_id_remap output dst")
        cols = {"src": batch.column("src"), "dst": batch.column("dense")}
        for nm in carry:
            cols[nm] = batch.column(nm)
        return pa.table(cols)

    return a2.map_batches(finish, batch_format="pyarrow"), mapping


def collision_safe_ids(
    urls_ds,
    url_col: str = "url",
    num_buckets: int = 64,
    max_rounds: int = 8,
    _hashfn=None,
):
    """(url) Dataset -> (url, vid) mapping with vids injective over distinct
    urls, resolving 64-bit digest collisions distributedly.

    ``_hashfn`` exists for tests only (inject a deliberately colliding hash
    to exercise the resolution fixpoint); production uses ``hash64_str``.

    Each round is one coarse-bucket shuffle of the distinct mapping; the
    driver sees a single scalar (remaining duplicate count) per round.
    Expected rounds at any realistic scale: 1 (collisions are ~5*10^4 PAIRS
    at 10^12 urls — rehashing them re-colliding is ~2^-63 per pair).
    """
    hashfn = _hashfn or (lambda urls: hash64_str(urls))

    def assign(batch: pa.Table) -> pa.Table:
        u = batch.column(url_col)
        return pa.table({"url": u, "vid": pa.array(hashfn(u))})

    # distinct urls with initial vids (string groupby — the explicit price
    # of the safe path; the cheap path is plain hash_ids_from_urls)
    mapping = (
        urls_ds.map_batches(assign, batch_format="pyarrow")
        .groupby(["url", "vid"])  # vid is a function of url: distinct pairs
        .count()
        .select_columns(["url", "vid"])
    )

    def with_bucket(batch: pa.Table) -> pa.Table:
        v = batch.column("vid").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array(_bucket_of(v, num_buckets)),
                "url": batch.column("url"),
                "vid": batch.column("vid"),
            }
        )

    for attempt in range(max_rounds):
        def resolve(group: pa.Table, _attempt=attempt) -> pa.Table:
            v = group.column("vid").to_numpy(zero_copy_only=False)
            u = group.column("url")
            out_v = v.copy()
            dup_idx = []
            sv = np.argsort(v, kind="stable")
            vs = v[sv]
            # runs of equal vids = collision groups (rare); python work is
            # O(#colliding rows), everything else stays vectorized
            run_starts = np.flatnonzero(
                np.concatenate([[True], vs[1:] != vs[:-1]])
            )
            run_ends = np.concatenate([run_starts[1:], [len(vs)]])
            for s0, e0 in zip(run_starts, run_ends):
                if e0 - s0 < 2:
                    continue
                idxs = sv[s0:e0]
                # url-sorted first claimant keeps the vid — deterministic
                # regardless of block arrival order
                keep_order = sorted(idxs, key=lambda i: u[int(i)].as_py())
                dup_idx.extend(int(i) for i in keep_order[1:])
            dup = np.zeros(len(v), dtype=np.int8)
            if dup_idx:
                di = np.asarray(dup_idx, dtype=np.int64)
                # deterministic rehash: mix url digest with the attempt
                salts = [f"{u[int(i)].as_py()}\x00retry{_attempt}" for i in di]
                out_v[di] = hash64_str(salts)
                dup[di] = 1
            return pa.table({"url": u, "vid": pa.array(out_v),
                             "ndup": pa.array(dup)})

        resolved = (
            mapping.map_batches(with_bucket, batch_format="pyarrow")
            .groupby("bkt")
            .map_groups(resolve, batch_format="pyarrow")
            .materialize()
        )
        n_dup = resolved.sum("ndup") or 0
        mapping = resolved.select_columns(["url", "vid"])
        if n_dup == 0:
            return mapping
    raise RuntimeError(
        f"collision_safe_ids: unresolved vid collisions after {max_rounds} "
        "rounds (pathological hash function?)"
    )
