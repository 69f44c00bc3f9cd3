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
  2. orient each edge low-rank -> high-rank (degree attach: broadcast below
     a vertex-count threshold, distributed pair_attach join above it);
  3. wedges: hash-bucket by apex vertex (B coarse groups, NOT one group per
     vertex — per-key map_groups would spawn millions of tiny tasks at crawl
     scale), vectorized rank-ordered neighbour-pair generation per bucket;
  4. close: wedge candidates ∪ oriented edges hash-bucketed on the packed
     (u,v) key; per-bucket sorted-search membership test and count.

Count is orientation-invariant, so it equals the reference's vid-ordered
count exactly. Requires vids < 2**32 for key packing (guarded —
``assert_packable`` raises on e.g. 63-bit ``hash_ids_from_urls`` ids; run
``raylink.ids.dense_id_remap`` first for such corpora).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.util import unpack_hi, assert_packable, splitmix64


def _canon(batch: pa.Table) -> pa.Table:
    s = batch.column("src").to_numpy(zero_copy_only=False)
    d = batch.column("dst").to_numpy(zero_copy_only=False)
    keep = s != d  # drop self-loops (reference: snapToMetisInput.py:52-53)
    a = np.minimum(s[keep], d[keep]).astype(np.int64)
    b = np.maximum(s[keep], d[keep]).astype(np.int64)
    assert_packable(a, "triangle_count vid")
    assert_packable(b, "triangle_count vid")
    key = (a << np.int64(32)) | b
    return pa.table({"key": pa.array(np.unique(key))})


def _unpack(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return unpack_hi(keys), keys & np.int64(0xFFFFFFFF)


def _distinct_and_degrees(edges_ds):
    """Canonical distinct undirected edges (packed (min,max) key Dataset)
    plus the undirected distinct-neighbour degree table (vid, deg); both
    materialized (each is consumed by more than one downstream stage)."""
    from raylink.join import bucketed_distinct, bucketed_sum

    edges = edges_ds.map_batches(_canon, batch_format="pyarrow")
    # distinct canonical edges: coarse-bucket exact dedup on the packed key
    # (a per-key groupby("key").count() pays sort-aggregate machinery per
    # distinct edge — the bucketed_distinct rationale)
    distinct = bucketed_distinct(edges, "key", num_buckets=64).materialize()

    def endpoints(batch: pa.Table) -> pa.Table:
        a, b = _unpack(batch.column("key").to_numpy(zero_copy_only=False))
        v, c = np.unique(np.concatenate([a, b]), return_counts=True)
        return pa.table({"vid": pa.array(v), "c": pa.array(c.astype(np.int64))})

    deg_ds = bucketed_sum(
        distinct.map_batches(endpoints, batch_format="pyarrow"),
        "vid", "c", out_val="deg",
    ).materialize()
    return distinct, deg_ds


def _oriented_edges(
    edges_ds,
    num_buckets: int,
    broadcast_threshold: int | None,
    force: str | None,
):
    """Shared head of the triangle dataflow: canonical distinct edges ->
    degree table -> (degree, vid)-rank-oriented edges bucketed by apex.
    Returns ``(oriented, deg_ds)``; both materialized Datasets.

    The degree attach for orientation is thresholded: below
    ``broadcast_threshold`` distinct vertices the degree table is broadcast
    (``ray.put`` once, searchsorted per batch); above it the degrees are
    joined onto both edge endpoints with the distributed ``pair_attach``
    (two bucket shuffles, nothing on the driver) — at a 10^12-vertex crawl
    the broadcast would be a driver OOM. ``force`` pins a path for testing
    ('broadcast' | 'shuffle'); both produce identical orientations."""
    import ray

    from raylink.join import BROADCAST_THRESHOLD, pair_attach

    if broadcast_threshold is None:
        broadcast_threshold = BROADCAST_THRESHOLD

    distinct, deg_ds = _distinct_and_degrees(edges_ds)
    n_verts = deg_ds.count()
    use_broadcast = force == "broadcast" or (
        force is None and n_verts <= broadcast_threshold
    )

    def orient_arrays(a, b, da, db):
        """(degree, vid)-rank orientation; returns (lo, hi, deg(hi))."""
        a_first = (da < db) | ((da == db) & (a < b))
        lo = np.where(a_first, a, b)
        hi = np.where(a_first, b, a)
        dhi = np.where(a_first, db, da)
        bucket = (splitmix64(lo.astype(np.uint64)) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return pa.table(
            {"src": pa.array(lo), "dst": pa.array(hi), "ddst": pa.array(dhi),
             "bucket": pa.array(bucket)}
        )

    if use_broadcast:
        deg_pdf = deg_ds.to_pandas()
        vid_arr = deg_pdf["vid"].to_numpy(dtype=np.int64)
        deg_arr = deg_pdf["deg"].to_numpy(dtype=np.int64)
        order = np.argsort(vid_arr)
        ref = ray.put((vid_arr[order], deg_arr[order]))

        def orient(batch: pa.Table) -> pa.Table:
            vids, degs = ray.get(ref)
            a, b = _unpack(batch.column("key").to_numpy(zero_copy_only=False))
            da = degs[np.searchsorted(vids, a)]
            db = degs[np.searchsorted(vids, b)]
            return orient_arrays(a, b, da, db)

        oriented = distinct.map_batches(orient, batch_format="pyarrow").materialize()
    else:
        paired = pair_attach(
            distinct, deg_ds, {"deg": pa.int64()}, id_col="vid",
            num_buckets=num_buckets,
        )

        def orient(batch: pa.Table) -> pa.Table:
            a, b = _unpack(batch.column("key").to_numpy(zero_copy_only=False))
            da = batch.column("deg_a").to_numpy(zero_copy_only=False)
            db = batch.column("deg_b").to_numpy(zero_copy_only=False)
            return orient_arrays(a, b, da, db)

        oriented = paired.map_batches(orient, batch_format="pyarrow").materialize()
    return oriented, deg_ds


def triangle_count(
    edges_ds,
    num_buckets: int = 32,
    broadcast_threshold: int | None = None,
    force: str | None = None,
) -> int:
    """Global triangle count of the undirected simple graph (see
    ``_oriented_edges`` for the shared orientation head and its
    broadcast-vs-shuffle degree attach)."""
    oriented, _ = _oriented_edges(
        edges_ds, num_buckets, broadcast_threshold, force
    )

    def wedges(group: pa.Table) -> pa.Table:
        """All rank-ordered neighbour pairs, per apex, vectorized over the
        bucket's adjacency (python loop only over apexes in this bucket);
        neighbour rank uses the carried deg(dst) — no lookup."""
        src = group.column("src").to_numpy(zero_copy_only=False)
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        ddst = group.column("ddst").to_numpy(zero_copy_only=False)
        order_ = np.argsort(src, kind="stable")
        src, dst, ddst = src[order_], dst[order_], ddst[order_]
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        ends = np.r_[starts[1:], len(src)]
        keys, cnts = [], []
        for st, en in zip(starts, ends):
            if en - st < 2:
                continue
            nbr = dst[st:en]
            d = ddst[st:en]
            nbr = nbr[np.lexsort((nbr, d))]  # rank order
            ii, jj = np.triu_indices(len(nbr), k=1)
            k = (nbr[ii] << np.int64(32)) | nbr[jj]
            k, c = np.unique(k, return_counts=True)
            keys.append(k)
            cnts.append(c.astype(np.int64))
        if not keys:
            return pa.table(
                {"key": pa.array([], type=pa.int64()),
                 "cnt": pa.array([], type=pa.int64())}
            )
        key = np.concatenate(keys)
        cnt = np.concatenate(cnts)
        kb = (splitmix64(key.astype(np.uint64)) % np.uint64(num_buckets)).astype(
            np.int32
        )
        # pre-sum per key within the bucket before the close shuffle
        t = pa.table({"key": pa.array(key), "cnt": pa.array(cnt), "kb": pa.array(kb)})
        return t

    cands = oriented.groupby("bucket").map_groups(wedges, batch_format="pyarrow")

    def edge_rows(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        key = (s << np.int64(32)) | d
        kb = (splitmix64(key.astype(np.uint64)) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return pa.table(
            {
                "key": pa.array(key),
                "cnt": pa.array(np.full(len(key), -1, dtype=np.int64)),  # marker
                "kb": pa.array(kb),
            }
        )

    both = cands.union(oriented.map_batches(edge_rows, batch_format="pyarrow"))

    def close(group: pa.Table) -> pa.Table:
        """Per key-bucket: sum wedge counts whose closing edge exists."""
        key = group.column("key").to_numpy(zero_copy_only=False)
        cnt = group.column("cnt").to_numpy(zero_copy_only=False)
        is_edge = cnt < 0
        edge_keys = np.unique(key[is_edge])
        wk, wc = key[~is_edge], cnt[~is_edge]
        pos = np.searchsorted(edge_keys, wk)
        hit = (pos < len(edge_keys)) & (
            edge_keys[np.minimum(pos, max(len(edge_keys) - 1, 0))] == wk
        ) if len(edge_keys) else np.zeros(len(wk), dtype=bool)
        return pa.table({"t": pa.array([int(wc[hit].sum())], type=pa.int64())})

    total = both.groupby("kb").map_groups(close, batch_format="pyarrow").sum("t")
    return int(total or 0)


def local_clustering(
    edges_ds,
    verts_ds=None,
    num_buckets: int = 32,
    broadcast_threshold: int | None = None,
    force: str | None = None,
):
    """Per-vertex triangle counts and local clustering coefficient ->
    Dataset (vid, deg, tri, coeff r6); ``coeff = 2*tri / (deg*(deg-1))``,
    0.0 below degree 2. ``deg`` is the undirected distinct-neighbour
    degree. ``verts_ds`` (a Dataset with a ``vid`` column) adds
    zero-degree rows for isolated vertices.

    Same dataflow as ``triangle_count`` with the apex carried through the
    wedge rows instead of pre-summed away: a closed wedge (apex; u, v)
    credits all three vertices. The close stage reduces to per-vertex
    partial counts INSIDE each key bucket, so the final exchange is one
    vertex-sized groupby-sum; degree rows ride the same groupby (union +
    sum — no join stage). Wedge volume matches triangle_count's bound
    (~O(E^1.5) worst case via (degree, vid)-rank orientation); hub pairs
    shared by many apexes are not merged pre-shuffle here, the price of
    per-vertex attribution.
    """
    oriented, deg_ds = _oriented_edges(
        edges_ds, num_buckets, broadcast_threshold, force
    )

    def wedges(group: pa.Table) -> pa.Table:
        src = group.column("src").to_numpy(zero_copy_only=False)
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        ddst = group.column("ddst").to_numpy(zero_copy_only=False)
        order_ = np.argsort(src, kind="stable")
        src, dst, ddst = src[order_], dst[order_], ddst[order_]
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        ends = np.r_[starts[1:], len(src)]
        keys, apexes = [], []
        for st, en in zip(starts, ends):
            if en - st < 2:
                continue
            nbr = dst[st:en]
            d = ddst[st:en]
            nbr = nbr[np.lexsort((nbr, d))]  # rank order
            ii, jj = np.triu_indices(len(nbr), k=1)
            keys.append((nbr[ii] << np.int64(32)) | nbr[jj])
            apexes.append(np.full(len(ii), src[st], dtype=np.int64))
        if not keys:
            return pa.table(
                {"key": pa.array([], type=pa.int64()),
                 "apex": pa.array([], type=pa.int64()),
                 "kb": pa.array([], type=pa.int32())}
            )
        key = np.concatenate(keys)
        apex = np.concatenate(apexes)
        kb = (splitmix64(key.astype(np.uint64)) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return pa.table(
            {"key": pa.array(key), "apex": pa.array(apex), "kb": pa.array(kb)}
        )

    cands = oriented.groupby("bucket").map_groups(wedges, batch_format="pyarrow")

    def edge_rows(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        key = (s << np.int64(32)) | d
        kb = (splitmix64(key.astype(np.uint64)) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return pa.table(
            {
                "key": pa.array(key),
                "apex": pa.array(np.full(len(key), -1, dtype=np.int64)),  # marker
                "kb": pa.array(kb),
            }
        )

    both = cands.union(oriented.map_batches(edge_rows, batch_format="pyarrow"))

    def close(group: pa.Table) -> pa.Table:
        """Per key-bucket: each wedge whose closing edge exists credits its
        three vertices; reduce to per-vertex partials before the exchange."""
        key = group.column("key").to_numpy(zero_copy_only=False)
        apex = group.column("apex").to_numpy(zero_copy_only=False)
        is_edge = apex < 0
        edge_keys = np.unique(key[is_edge])
        wk, wa = key[~is_edge], apex[~is_edge]
        if len(edge_keys) and len(wk):
            pos = np.searchsorted(edge_keys, wk)
            hit = (pos < len(edge_keys)) & (
                edge_keys[np.minimum(pos, len(edge_keys) - 1)] == wk
            )
        else:
            hit = np.zeros(len(wk), dtype=bool)
        hk = wk[hit]
        members = np.concatenate([wa[hit], unpack_hi(hk),
                                  hk & np.int64(0xFFFFFFFF)])
        v, c = np.unique(members, return_counts=True)
        return pa.table(
            {"vid": pa.array(v.astype(np.int64)),
             "deg": pa.array(np.zeros(len(v), dtype=np.int64)),
             "tri": pa.array(c.astype(np.int64))}
        )

    tri_rows = both.groupby("kb").map_groups(close, batch_format="pyarrow")
    deg_rows = deg_ds.map_batches(
        lambda b: pa.table(
            {"vid": b.column("vid"), "deg": b.column("deg"),
             "tri": pa.array(np.zeros(b.num_rows, dtype=np.int64))}
        ),
        batch_format="pyarrow",
    )
    parts = [tri_rows, deg_rows]
    if verts_ds is not None:
        parts.append(
            verts_ds.map_batches(
                lambda b: pa.table(
                    {"vid": b.column("vid").cast(pa.int64()),
                     "deg": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
                     "tri": pa.array(np.zeros(b.num_rows, dtype=np.int64))}
                ),
                batch_format="pyarrow",
            )
        )
    summed = parts[0].union(*parts[1:]).groupby("vid").sum(["deg", "tri"])

    def finish(batch: pa.Table) -> pa.Table:
        from raylink.util import round_half_away

        deg = batch.column("sum(deg)").to_numpy(zero_copy_only=False)
        tri = batch.column("sum(tri)").to_numpy(zero_copy_only=False)
        coeff = np.zeros(len(deg), dtype=np.float64)
        m = deg >= 2
        coeff[m] = round_half_away(2.0 * tri[m] / (deg[m] * (deg[m] - 1)), 6)
        return pa.table(
            {
                "vid": batch.column("vid"),
                "deg": pa.array(deg.astype(np.int64)),
                "tri": pa.array(tri.astype(np.int64)),
                "coeff": pa.array(coeff),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")


def degree_assortativity(edges_ds, num_buckets: int = 32) -> pa.Table:
    """Pearson degree-degree correlation over the undirected simple graph
    -> one-row Table (assortativity r6, n_edges). Both edge orientations
    enter the sum (the standard undirected convention), so Sx = Sy and
    Sxx = Syy and

        r = (n*Sxy - Sx^2) / (n*Sxx - Sx^2),   n = 2 * |edges|

    with every S an exact int64 partial (degree products fit int64 up to
    deg ~ 3e9 per-edge and ~1e18 total — beyond any real crawl's sum at
    per-block granularity; the final reduction is Python arbitrary
    precision). Degenerate (constant-degree) graphs report 0.0.

    Shape: distinct edges + degree table (shared ``_distinct_and_degrees``
    head), degrees joined onto both endpoints by the distributed
    ``pair_attach`` (no broadcast — works at any vertex count), one
    4-scalar per-batch partial, one driver-side division."""
    from raylink.join import pair_attach
    from raylink.util import round_half_away

    distinct, deg_ds = _distinct_and_degrees(edges_ds)
    paired = pair_attach(
        distinct, deg_ds, {"deg": pa.int64()}, id_col="vid",
        num_buckets=num_buckets,
    )

    def partial(batch: pa.Table) -> pa.Table:
        da = batch.column("deg_a").to_numpy(zero_copy_only=False).astype(np.int64)
        db = batch.column("deg_b").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([2 * len(da)], type=pa.int64()),
                "sx": pa.array([int((da + db).sum())], type=pa.int64()),
                "sxy": pa.array([2 * int((da * db).sum())], type=pa.int64()),
                "sxx": pa.array([int((da * da + db * db).sum())], type=pa.int64()),
            }
        )

    sums = paired.map_batches(partial, batch_format="pyarrow").sum(
        ["n", "sx", "sxy", "sxx"]
    )
    n, sx = int(sums["sum(n)"] or 0), int(sums["sum(sx)"] or 0)
    sxy, sxx = int(sums["sum(sxy)"] or 0), int(sums["sum(sxx)"] or 0)
    den = n * sxx - sx * sx
    r = 0.0 if den == 0 else float(
        round_half_away(np.float64(n * sxy - sx * sx) / np.float64(den), 6)
    )
    return pa.table(
        {
            "assortativity": pa.array([r], type=pa.float64()),
            "n_edges": pa.array([n // 2], type=pa.int64()),
        }
    )


def edge_support(
    edges_ds,
    num_buckets: int = 32,
    broadcast_threshold: int | None = None,
    force: str | None = None,
):
    """Per-edge triangle support (the k-truss primitive) -> Dataset
    (src, dst, support) over the canonical undirected distinct edges
    (src < dst), support = number of triangles containing the edge
    (0-support edges included).

    Same wedge dataflow as ``local_clustering``; a closed wedge
    (apex; u, v) credits all THREE of its edges — the closing edge (u, v)
    and the two wings (apex, u), (apex, v) — re-canonicalized to vid order
    before the per-bucket partial reduce, so the final exchange is one
    edge-sized groupby-sum that the 0-support edge rows ride along."""
    oriented, _ = _oriented_edges(
        edges_ds, num_buckets, broadcast_threshold, force
    )

    def wedges(group: pa.Table) -> pa.Table:
        src = group.column("src").to_numpy(zero_copy_only=False)
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        ddst = group.column("ddst").to_numpy(zero_copy_only=False)
        order_ = np.argsort(src, kind="stable")
        src, dst, ddst = src[order_], dst[order_], ddst[order_]
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        ends = np.r_[starts[1:], len(src)]
        keys, apexes = [], []
        for st, en in zip(starts, ends):
            if en - st < 2:
                continue
            nbr = dst[st:en]
            d = ddst[st:en]
            nbr = nbr[np.lexsort((nbr, d))]
            ii, jj = np.triu_indices(len(nbr), k=1)
            keys.append((nbr[ii] << np.int64(32)) | nbr[jj])
            apexes.append(np.full(len(ii), src[st], dtype=np.int64))
        if not keys:
            return pa.table(
                {"key": pa.array([], type=pa.int64()),
                 "apex": pa.array([], type=pa.int64()),
                 "kb": pa.array([], type=pa.int32())}
            )
        key = np.concatenate(keys)
        apex = np.concatenate(apexes)
        kb = (splitmix64(key.astype(np.uint64)) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return pa.table(
            {"key": pa.array(key), "apex": pa.array(apex), "kb": pa.array(kb)}
        )

    cands = oriented.groupby("bucket").map_groups(wedges, batch_format="pyarrow")

    def edge_rows(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        key = (s << np.int64(32)) | d
        kb = (splitmix64(key.astype(np.uint64)) % np.uint64(num_buckets)).astype(
            np.int32
        )
        return pa.table(
            {
                "key": pa.array(key),
                "apex": pa.array(np.full(len(key), -1, dtype=np.int64)),
                "kb": pa.array(kb),
            }
        )

    both = cands.union(oriented.map_batches(edge_rows, batch_format="pyarrow"))

    def close(group: pa.Table) -> pa.Table:
        """Per key-bucket: closed wedges credit their three edges; edges
        present in this bucket also emit 0-support base rows (every
        canonical edge lands in exactly one key bucket, so the union below
        is complete and duplicate-free)."""
        key = group.column("key").to_numpy(zero_copy_only=False)
        apex = group.column("apex").to_numpy(zero_copy_only=False)
        is_edge = apex < 0
        edge_keys = np.unique(key[is_edge])
        wk, wa = key[~is_edge], apex[~is_edge]
        if len(edge_keys) and len(wk):
            pos = np.searchsorted(edge_keys, wk)
            hit = (pos < len(edge_keys)) & (
                edge_keys[np.minimum(pos, len(edge_keys) - 1)] == wk
            )
        else:
            hit = np.zeros(len(wk), dtype=bool)
        hk, ha = wk[hit], wa[hit]
        # wedge/edge keys are packed in (degree, vid)-RANK order; the
        # output edge identity is vid-canonical — re-order every credit
        u, v = unpack_hi(hk), hk & np.int64(0xFFFFFFFF)
        ea = np.concatenate([np.minimum(u, v), np.minimum(ha, u),
                             np.minimum(ha, v)])
        eb = np.concatenate([np.maximum(u, v), np.maximum(ha, u),
                             np.maximum(ha, v)])
        ek, ec = np.unique((ea << np.int64(32)) | eb, return_counts=True)
        # base rows keep 0-support edges in the output
        bu, bv = unpack_hi(edge_keys), edge_keys & np.int64(0xFFFFFFFF)
        bk = (np.minimum(bu, bv) << np.int64(32)) | np.maximum(bu, bv)
        allk = np.concatenate([ek, bk])
        allc = np.concatenate([ec.astype(np.int64),
                               np.zeros(len(bk), dtype=np.int64)])
        return pa.table({"ekey": pa.array(allk), "sup": pa.array(allc)})

    summed = both.groupby("kb").map_groups(close, batch_format="pyarrow") \
        .groupby("ekey").sum("sup")

    def unpack(batch: pa.Table) -> pa.Table:
        k = batch.column("ekey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(unpack_hi(k)),
                "dst": pa.array(k & np.int64(0xFFFFFFFF)),
                "support": pa.array(
                    batch.column("sum(sup)").to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
            }
        )

    return summed.map_batches(unpack, batch_format="pyarrow")


def ktruss(edges_ds, k: int, num_buckets: int = 32, max_rounds: int = 64):
    """k-truss subgraph: iteratively delete edges in fewer than ``k-2``
    triangles until none drop -> Dataset (src, dst, support) of surviving
    canonical edges with their support in the FINAL subgraph.

    Each round is one ``edge_support`` dataflow over the surviving edge
    set; the driver sees only the per-round edge count (convergence check).
    Rounds are data-dependent (classic truss peeling); ``max_rounds``
    bounds pathological chains. Requires k >= 3."""
    if k < 3:
        raise ValueError("ktruss requires k >= 3")
    thresh = k - 2

    def canon_pairs(batch: pa.Table) -> pa.Table:
        a, b = _unpack(batch.column("key").to_numpy(zero_copy_only=False))
        return pa.table({"src": pa.array(a), "dst": pa.array(b)})

    edges, _ = _distinct_and_degrees(edges_ds)
    edges = edges.map_batches(canon_pairs, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    for _ in range(max_rounds):
        sup = edge_support(edges, num_buckets=num_buckets)

        def keep(batch: pa.Table) -> pa.Table:
            s = batch.column("support").to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(s >= thresh))

        kept = sup.map_batches(keep, batch_format="pyarrow").materialize()
        n_kept = kept.count()
        if n_kept == n_edges:
            return kept
        n_edges = n_kept
        edges = kept.select_columns(["src", "dst"]).materialize()
        if n_edges == 0:
            return kept
    return kept


def _common_neighbor_counts(distinct, num_buckets: int = 64):
    """Common-neighbour counts k_uw for every canonical vertex pair {u < w}
    with k_uw >= 1 over the undirected simple graph, from the canonical
    distinct edge keys: adjacency rows bucketed by the wedge MIDDLE vertex
    -> per-group vectorized rank-ordered neighbour-pair generation with
    per-group pre-combine -> one COARSE-bucketed pair combine (splitmix64
    of the packed key, vectorized np.unique+bincount per bucket — a per-key
    ``groupby("key").sum()`` pays Ray's sort-based aggregate machinery per
    distinct key: measured 14.9 s vs 0.9 s on the same 173k pair rows).
    -> Dataset (key, sum(c)). Wedge volume is O(sum deg^2) — the same skew
    surface as any common-neighbour operator; hubs should be degree-capped
    upstream at crawl scale (documented, like the reference's preprocessing
    snapToMetisInput.py). Shared by ``four_cycle_count`` and
    ``link_prediction``."""
    import pyarrow as pa

    from raylink.util import splitmix64

    B = np.uint64(num_buckets)

    def adj_rows(batch: pa.Table) -> pa.Table:
        a, b = _unpack(batch.column("key").to_numpy(zero_copy_only=False))
        v = np.concatenate([a, b])
        n = np.concatenate([b, a])
        return pa.table(
            {
                "bkt": pa.array((splitmix64(v.astype(np.uint64)) % B).astype(np.int32)),
                "v": pa.array(v),
                "n": pa.array(n),
            }
        )

    def wedge_pairs(group: pa.Table) -> pa.Table:
        v = group.column("v").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        # neighbours sorted per middle vertex -> generated pairs are (u < w)
        order = np.lexsort((n, v))
        v, n = v[order], n[order]
        _, starts, counts = np.unique(v, return_index=True, return_counts=True)
        total = int((counts * (counts - 1) // 2).sum())
        if total == 0:
            return pa.table({"kb": pa.array([], type=pa.int32()),
                             "key": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        # vectorized per-segment upper-triangle pair indices
        keys = np.empty(total, dtype=np.int64)
        pos = 0
        for s0, c in zip(starts, counts):  # per-vertex; hubs dominate anyway
            if c < 2:
                continue
            seg = n[s0 : s0 + c]
            iu, iw = np.triu_indices(c, k=1)
            m = len(iu)
            keys[pos : pos + m] = (seg[iu] << np.int64(32)) | seg[iw]
            pos += m
        uk, cnt = np.unique(keys, return_counts=True)
        return pa.table(
            {
                "kb": pa.array(
                    (splitmix64(uk.astype(np.uint64)) % B).astype(np.int32)
                ),
                "key": pa.array(uk),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    def combine_pairs(group: pa.Table) -> pa.Table:
        k = group.column("key").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, c)
        return pa.table({"key": pa.array(uk), "sum(c)": pa.array(s)})

    return (
        distinct.map_batches(adj_rows, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(wedge_pairs, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(combine_pairs, batch_format="pyarrow")
    )


def four_cycle_count(edges_ds, num_buckets: int = 64) -> int:
    """Exact 4-cycle count of the undirected simple graph via the diagonal
    identity: C4 = (1/2) * sum over canonical vertex pairs {u < w} of
    C(k_uw, 2), where k_uw = # common neighbours — each quadrilateral is
    counted once per diagonal (exactly two). Dataflow:
    ``_common_neighbor_counts`` (one packed-pair groupby) -> integer partial
    C(k,2) sums -> driver holds ONE scalar."""
    import pyarrow as pa

    distinct, _ = _distinct_and_degrees(edges_ds)
    pair_counts = _common_neighbor_counts(distinct, num_buckets)

    def c4_partial(batch: pa.Table) -> pa.Table:
        c = batch.column("sum(c)").to_numpy(zero_copy_only=False)
        return pa.table({"p": pa.array([int((c * (c - 1) // 2).sum())])})

    total2 = pair_counts.map_batches(c4_partial, batch_format="pyarrow").sum("p")
    return int(total2) // 2


def link_prediction(edges_ds, k: int = 50, num_buckets: int = 64):
    """Common-neighbour link prediction: the k NON-adjacent vertex pairs
    {u < w} with the most common neighbours in the undirected simple graph
    -> Dataset (src, dst, common) ordered by (common DESC, src, dst) — the
    classic integer-exact link-prediction score (Adamic-Adar's 1/log(deg)
    weighting is deliberately avoided: libm logs are not bit-portable
    across engines, counts are).

    Dataflow: ``_common_neighbor_counts`` (wedge generation, one packed-pair
    groupby) -> distributed anti-join against the canonical edge-key set
    (NOT EXISTS, ``raylink.join.anti_join`` — pairs that ARE edges score
    triangles, not predictions) -> per-block local top-k partials coalesced
    into one final top-k block (a global ``ds.sort`` pays full
    range-partition machinery for k rows of output). The driver never holds
    more than the k result rows; the wedge-volume skew note on
    ``_common_neighbor_counts`` applies."""
    import pyarrow as pa

    from raylink.join import anti_join

    distinct, _ = _distinct_and_degrees(edges_ds)
    pair_counts = _common_neighbor_counts(distinct, num_buckets)
    nonedges = anti_join(
        pair_counts,
        distinct,
        on="key",
        left_cols={"sum(c)": pa.int64()},
        num_buckets=num_buckets,
    )

    def unpack_topk(batch: pa.Table) -> pa.Table:
        u, w = _unpack(batch.column("key").to_numpy(zero_copy_only=False))
        c = batch.column("sum(c)").to_numpy(zero_copy_only=False)
        # (common DESC, src, dst) — ties are unique by (src, dst), so the
        # two-level partial/final top-k is deterministic
        order = np.lexsort((w, u, -c))[:k]
        return pa.table(
            {
                "src": pa.array(u[order]),
                "dst": pa.array(w[order]),
                "common": pa.array(c[order]),
            }
        )

    def final_topk(batch: pa.Table) -> pa.Table:
        u = batch.column("src").to_numpy(zero_copy_only=False)
        w = batch.column("dst").to_numpy(zero_copy_only=False)
        c = batch.column("common").to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u, -c))[:k]
        return pa.table(
            {
                "src": pa.array(u[order]),
                "dst": pa.array(w[order]),
                "common": pa.array(c[order]),
            }
        )

    return (
        nonedges.map_batches(unpack_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final_topk, batch_format="pyarrow", batch_size=None)
    )


RA_SCALE = 10**6


def _ra_pair_scores(distinct, num_buckets: int = 64):
    """Resource-Allocation pair scores in int64 fixed point: for every
    canonical pair {u < w} with at least one common neighbour,
    score = sum over common neighbours z of RA_SCALE // deg(z). The wedge
    dataflow is ``_common_neighbor_counts`` with one twist: adjacency rows
    bucket by the wedge MIDDLE z, so deg(z) is just z's row count inside
    its group — the weight needs no degree join. Pure integer arithmetic
    (the link_prediction docstring's log-portability rationale: Adamic-Adar
    needs 1/ln(deg), RA's 1/deg is exactly representable). -> Dataset
    (key, sum(c)); same wedge-volume skew surface, same hub-cap note."""
    import pyarrow as pa

    from raylink.util import splitmix64

    B = np.uint64(num_buckets)

    def adj_rows(batch: pa.Table) -> pa.Table:
        a, b = _unpack(batch.column("key").to_numpy(zero_copy_only=False))
        v = np.concatenate([a, b])
        n = np.concatenate([b, a])
        return pa.table(
            {
                "bkt": pa.array((splitmix64(v.astype(np.uint64)) % B).astype(np.int32)),
                "v": pa.array(v),
                "n": pa.array(n),
            }
        )

    def wedge_scores(group: pa.Table) -> pa.Table:
        v = group.column("v").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((n, v))
        v, n = v[order], n[order]
        _, starts, counts = np.unique(v, return_index=True, return_counts=True)
        total = int((counts * (counts - 1) // 2).sum())
        if total == 0:
            return pa.table({"kb": pa.array([], type=pa.int32()),
                             "key": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        wv = (np.int64(RA_SCALE) // counts).astype(np.int64)  # deg(z) = row count
        keys = np.empty(total, dtype=np.int64)
        wts = np.empty(total, dtype=np.int64)
        pos = 0
        for s0, c, w in zip(starts, counts, wv):
            if c < 2:
                continue
            seg = n[s0 : s0 + c]
            iu, iw = np.triu_indices(c, k=1)
            m = len(iu)
            keys[pos : pos + m] = (seg[iu] << np.int64(32)) | seg[iw]
            wts[pos : pos + m] = w
            pos += m
        uk, inv = np.unique(keys, return_inverse=True)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, wts)
        return pa.table(
            {
                "kb": pa.array(
                    (splitmix64(uk.astype(np.uint64)) % B).astype(np.int32)
                ),
                "key": pa.array(uk),
                "c": pa.array(s),
            }
        )

    def combine_pairs(group: pa.Table) -> pa.Table:
        k = group.column("key").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, c)
        return pa.table({"key": pa.array(uk), "sum(c)": pa.array(s)})

    return (
        distinct.map_batches(adj_rows, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(wedge_scores, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(combine_pairs, batch_format="pyarrow")
    )


def resource_allocation(edges_ds, k: int = 50, num_buckets: int = 64):
    """Resource-Allocation link prediction (Zhou, Lü, Zhang 2009, public):
    the k NON-adjacent canonical pairs {u < w} with the largest
    sum over common neighbours z of 1/deg(z), in int64 fixed point
    (RA_SCALE // deg — bit-portable where Adamic-Adar's 1/ln(deg) is not).
    -> Dataset (src, dst, score) ordered by (score DESC, src, dst).

    Dataflow mirrors ``link_prediction``: weighted wedge generation
    (``_ra_pair_scores``) -> distributed anti-join against the canonical
    edge keys -> per-block local top-k coalesced into one final top-k
    block; the driver never holds more than the k result rows."""
    import pyarrow as pa

    from raylink.join import anti_join

    distinct, _ = _distinct_and_degrees(edges_ds)
    scores = _ra_pair_scores(distinct, num_buckets)
    nonedges = anti_join(
        scores,
        distinct,
        on="key",
        left_cols={"sum(c)": pa.int64()},
        num_buckets=num_buckets,
    )

    def topk(batch: pa.Table) -> pa.Table:
        if "key" in batch.column_names:
            u, w = _unpack(batch.column("key").to_numpy(zero_copy_only=False))
            c = batch.column("sum(c)").to_numpy(zero_copy_only=False)
        else:
            u = batch.column("src").to_numpy(zero_copy_only=False)
            w = batch.column("dst").to_numpy(zero_copy_only=False)
            c = batch.column("score").to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u, -c))[:k]
        return pa.table(
            {
                "src": pa.array(u[order]),
                "dst": pa.array(w[order]),
                "score": pa.array(c[order]),
            }
        )

    return (
        nonedges.map_batches(topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(topk, batch_format="pyarrow", batch_size=None)
    )


def four_clique_count(
    edges_ds,
    num_buckets: int = 32,
    broadcast_threshold: int | None = None,
    force: str | None = None,
) -> int:
    """Exact K4 (4-clique) count of the undirected simple graph — the
    graphlet-family sibling of ``triangle_count`` / ``four_cycle_count``.

    Identity: for an edge e, every pair of CONNECTED common neighbours
    (c, d) of e forms a K4 with it; each K4 contributes exactly one such
    pair per each of its 6 edges, so K4 = (sum over e of connected
    common-neighbour pairs) / 6. Dataflow: the edge_support wedge close
    is re-used to enumerate TRIANGLE rows (a < b < c); each triangle
    credits its three edges with its third vertex; a per-edge group forms
    candidate pairs of thirds (volume = sum over edges of C(support, 2) —
    the same quadratic-in-support skew surface as every common-neighbour
    operator, bounded in practice by the degree-oriented support); one
    more coarse-bucket membership pass counts candidates that are edges.
    Driver holds one scalar.
    """
    oriented, _ = _oriented_edges(
        edges_ds, num_buckets, broadcast_threshold, force
    )
    distinct, _ = _distinct_and_degrees(edges_ds)
    B = np.uint64(num_buckets)

    def wedges(group: pa.Table) -> pa.Table:
        src = group.column("src").to_numpy(zero_copy_only=False)
        dst = group.column("dst").to_numpy(zero_copy_only=False)
        ddst = group.column("ddst").to_numpy(zero_copy_only=False)
        order_ = np.argsort(src, kind="stable")
        src, dst, ddst = src[order_], dst[order_], ddst[order_]
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        ends = np.r_[starts[1:], len(src)]
        keys, apexes = [], []
        for st, en in zip(starts, ends):
            if en - st < 2:
                continue
            nbr = dst[st:en]
            d = ddst[st:en]
            nbr = nbr[np.lexsort((nbr, d))]
            ii, jj = np.triu_indices(len(nbr), k=1)
            keys.append((nbr[ii] << np.int64(32)) | nbr[jj])
            apexes.append(np.full(len(ii), src[st], dtype=np.int64))
        if not keys:
            return pa.table(
                {"key": pa.array([], type=pa.int64()),
                 "apex": pa.array([], type=pa.int64()),
                 "kb": pa.array([], type=pa.int32())}
            )
        key = np.concatenate(keys)
        apex = np.concatenate(apexes)
        kb = (splitmix64(key.astype(np.uint64)) % B).astype(np.int32)
        return pa.table(
            {"key": pa.array(key), "apex": pa.array(apex), "kb": pa.array(kb)}
        )

    def edge_rows(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        key = (s << np.int64(32)) | d
        kb = (splitmix64(key.astype(np.uint64)) % B).astype(np.int32)
        return pa.table(
            {
                "key": pa.array(key),
                "apex": pa.array(np.full(len(key), -1, dtype=np.int64)),
                "kb": pa.array(kb),
            }
        )

    both = oriented.groupby("bucket").map_groups(
        wedges, batch_format="pyarrow"
    ).union(oriented.map_batches(edge_rows, batch_format="pyarrow"))

    def tri_rows(group: pa.Table) -> pa.Table:
        """Closed wedges -> (edge_key, third) credits, 3 per triangle,
        vid-canonical, pre-deduped (distinct triangles by construction)."""
        key = group.column("key").to_numpy(zero_copy_only=False)
        apex = group.column("apex").to_numpy(zero_copy_only=False)
        is_edge = apex < 0
        edge_keys = np.unique(key[is_edge])
        wk, wa = key[~is_edge], apex[~is_edge]
        if len(edge_keys) and len(wk):
            pos = np.searchsorted(edge_keys, wk)
            hit = (pos < len(edge_keys)) & (
                edge_keys[np.minimum(pos, len(edge_keys) - 1)] == wk
            )
        else:
            hit = np.zeros(len(wk), dtype=bool)
        hk, ha = wk[hit], wa[hit]
        u, v = unpack_hi(hk), hk & np.int64(0xFFFFFFFF)
        # triangle (u, v, ha) -> vid-sorted (a < b < c)
        tri = np.sort(np.stack([u, v, ha], axis=1), axis=1)
        a, b_, c = tri[:, 0], tri[:, 1], tri[:, 2]
        ek = np.concatenate([
            (a << np.int64(32)) | b_,
            (a << np.int64(32)) | c,
            (b_ << np.int64(32)) | c,
        ])
        third = np.concatenate([c, b_, a])
        eb = (splitmix64(ek.astype(np.uint64)) % B).astype(np.int32)
        return pa.table(
            {"ek": pa.array(ek), "third": pa.array(third), "eb": pa.array(eb)}
        )

    credits = both.groupby("kb").map_groups(tri_rows, batch_format="pyarrow")

    def cand_pairs(group: pa.Table) -> pa.Table:
        """Per edge: pairs of thirds -> candidate packed keys with
        per-group pre-combined counts."""
        ek = group.column("ek").to_numpy(zero_copy_only=False)
        third = group.column("third").to_numpy(zero_copy_only=False)
        order_ = np.lexsort((third, ek))
        ek, third = ek[order_], third[order_]
        starts = np.flatnonzero(np.r_[True, ek[1:] != ek[:-1]])
        ends = np.r_[starts[1:], len(ek)]
        keys = []
        for st, en in zip(starts, ends):
            if en - st < 2:
                continue
            t = third[st:en]  # sorted ascending, distinct per edge
            ii, jj = np.triu_indices(len(t), k=1)
            keys.append((t[ii] << np.int64(32)) | t[jj])
        if not keys:
            return pa.table(
                {"key": pa.array([], type=pa.int64()),
                 "cnt": pa.array([], type=pa.int64()),
                 "kb": pa.array([], type=pa.int32())}
            )
        key, cnt = np.unique(np.concatenate(keys), return_counts=True)
        kb = (splitmix64(key.astype(np.uint64)) % B).astype(np.int32)
        return pa.table(
            {"key": pa.array(key), "cnt": pa.array(cnt.astype(np.int64)),
             "kb": pa.array(kb)}
        )

    cands = credits.groupby("eb").map_groups(cand_pairs, batch_format="pyarrow")

    def edge_markers(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy(zero_copy_only=False)
        kb = (splitmix64(key.astype(np.uint64)) % B).astype(np.int32)
        return pa.table(
            {"key": pa.array(key),
             "cnt": pa.array(np.full(len(key), -1, dtype=np.int64)),
             "kb": pa.array(kb)}
        )

    final = cands.union(distinct.map_batches(edge_markers, batch_format="pyarrow"))

    def close(group: pa.Table) -> pa.Table:
        key = group.column("key").to_numpy(zero_copy_only=False)
        cnt = group.column("cnt").to_numpy(zero_copy_only=False)
        is_edge = cnt < 0
        edge_keys = np.unique(key[is_edge])
        ck, cc = key[~is_edge], cnt[~is_edge]
        if len(edge_keys) and len(ck):
            pos = np.searchsorted(edge_keys, ck)
            hit = (pos < len(edge_keys)) & (
                edge_keys[np.minimum(pos, len(edge_keys) - 1)] == ck
            )
        else:
            hit = np.zeros(len(ck), dtype=bool)
        return pa.table({"t": pa.array([int(cc[hit].sum())], type=pa.int64())})

    total = final.groupby("kb").map_groups(close, batch_format="pyarrow").sum("t")
    return int(total or 0) // 6


def link_prediction_eval(edges_ds, k: int = 100, holdout_mod: int = 5,
                         num_buckets: int = 64):
    """Held-out evaluation of common-neighbour link prediction — the
    model-validation step of a link-prediction pipeline: canonical simple
    edges split deterministically (splitmix64(packed key) % holdout_mod:
    residue 0 = TEST, rest = TRAIN), predictions = ``link_prediction``
    top-k on the TRAIN graph, scored by membership in the held-out TEST
    edges. -> one-row Table (k, n_preds, n_test, hits, precision r8);
    n_preds can fall short of k on sparse graphs.

    Scale shape: everything up to the k result rows is the
    link_prediction dataflow; the hit count is one ``anti_join`` of the
    k-row prediction set against the test keys (distributed — the test
    set is dataset-sized, never collected); the driver folds 4 scalars."""
    import pyarrow as pa

    from raylink.join import anti_join
    from raylink.util import splitmix64

    distinct, _ = _distinct_and_degrees(edges_ds)

    def split(want_test: bool):
        def fn(batch: pa.Table) -> pa.Table:
            key = batch.column("key").to_numpy(zero_copy_only=False)
            m = (splitmix64(key.astype(np.uint64)) % np.uint64(holdout_mod)
                 == 0) == want_test
            return pa.table({"key": pa.array(key[m])})

        return fn

    train_keys = distinct.map_batches(split(False), batch_format="pyarrow")
    test_keys = distinct.map_batches(split(True), batch_format="pyarrow").materialize()

    def unpack_edges(batch: pa.Table) -> pa.Table:
        a, b = _unpack(batch.column("key").to_numpy(zero_copy_only=False))
        return pa.table({"src": pa.array(a), "dst": pa.array(b)})

    preds = link_prediction(
        train_keys.map_batches(unpack_edges, batch_format="pyarrow"),
        k=k, num_buckets=num_buckets,
    ).materialize()
    n_preds = preds.count()

    def pred_keys(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        return pa.table({"key": pa.array((s << np.int64(32)) | d)})

    misses = anti_join(
        preds.map_batches(pred_keys, batch_format="pyarrow"),
        test_keys, on="key", left_cols={}, num_buckets=num_buckets,
    ).count()
    hits = n_preds - misses
    n_test = test_keys.count()
    from raylink.util import round_half_away

    precision = (
        float(round_half_away(np.array([hits / n_preds]), 8)[0])
        if n_preds else 0.0
    )
    return pa.table(
        {
            "k": pa.array([k], type=pa.int64()),
            "n_preds": pa.array([n_preds], type=pa.int64()),
            "n_test": pa.array([n_test], type=pa.int64()),
            "hits": pa.array([hits], type=pa.int64()),
            "precision": pa.array([precision], type=pa.float64()),
        }
    )


def recommend_topk(edges_ds, k: int = 3, num_buckets: int = 64):
    """Per-vertex link recommendations — the "people/pages you may know"
    recsys shape: each vertex's top-k NON-adjacent candidates by
    common-neighbour count (common DESC, cand ASC), 1-based rank.
    -> Dataset (vid, cand, common, rk).

    Dataflow: the shared wedge-count relation -> distributed anti-join
    against the canonical edge keys -> each surviving pair feeds BOTH
    endpoints' candidate lists -> ``group_topk`` per vid (per-batch top-k
    pre-reduction bounds the shuffle at k rows per vid per block). Same
    wedge-volume skew surface as every common-neighbour operator."""
    import pyarrow as pa

    from raylink.join import anti_join
    from raylink.ops.select import group_topk

    distinct, _ = _distinct_and_degrees(edges_ds)
    pair_counts = _common_neighbor_counts(distinct, num_buckets)
    nonedges = anti_join(
        pair_counts, distinct, on="key",
        left_cols={"sum(c)": pa.int64()}, num_buckets=num_buckets,
    )

    def expand(batch: pa.Table) -> pa.Table:
        u, w = _unpack(batch.column("key").to_numpy(zero_copy_only=False))
        c = batch.column("sum(c)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": pa.array(np.concatenate([u, w])),
                "cand": pa.array(np.concatenate([w, u])),
                "common": pa.array(np.concatenate([c, c])),
            }
        )

    return group_topk(
        nonedges.map_batches(expand, batch_format="pyarrow"),
        key_col="vid", score_col="common", k=k, id_col="cand",
        num_buckets=num_buckets,
    )


JAC_SCALE = 10**9


def neighbor_jaccard(edges_ds, k: int = 50, num_buckets: int = 64):
    """Jaccard link prediction: the k NON-adjacent canonical pairs {u < w}
    with the largest neighbourhood Jaccard |N(u) & N(w)| / |N(u) | N(w)|,
    in int64 fixed point (score = (JAC_SCALE * common) // (deg_u + deg_w
    - common) — integer floor division is bit-portable where a float ratio
    is not). -> Dataset (src, dst, common, score) ordered by
    (score DESC, src, dst).

    Dataflow: ``_common_neighbor_counts`` (wedge generation, one packed-pair
    groupby) -> distributed anti-join against the canonical edge keys ->
    ``pair_attach`` of the undirected degree table onto the surviving pair
    keys (two coarse-bucket shuffles — no broadcast of a dataset-sized
    degree side) -> per-block local top-k coalesced into one final top-k
    block. The driver never holds more than the k result rows; the
    wedge-volume skew note on ``_common_neighbor_counts`` applies."""
    import pyarrow as pa

    from raylink.join import anti_join, pair_attach

    distinct, deg_ds = _distinct_and_degrees(edges_ds)
    pair_counts = _common_neighbor_counts(distinct, num_buckets)
    nonedges = anti_join(
        pair_counts,
        distinct,
        on="key",
        left_cols={"sum(c)": pa.int64()},
        num_buckets=num_buckets,
    )
    attached = pair_attach(
        nonedges,
        deg_ds,
        value_fields={"deg": pa.int64()},
        carry_fields={"sum(c)": pa.int64()},
        num_buckets=num_buckets,
        id_col="vid",
    )

    def topk(batch: pa.Table) -> pa.Table:
        if "key" in batch.column_names:
            u, w = _unpack(batch.column("key").to_numpy(zero_copy_only=False))
            c = batch.column("sum(c)").to_numpy(zero_copy_only=False)
            da = batch.column("deg_a").to_numpy(zero_copy_only=False)
            db = batch.column("deg_b").to_numpy(zero_copy_only=False)
            s = (np.int64(JAC_SCALE) * c) // (da + db - c)
        else:
            u = batch.column("src").to_numpy(zero_copy_only=False)
            w = batch.column("dst").to_numpy(zero_copy_only=False)
            c = batch.column("common").to_numpy(zero_copy_only=False)
            s = batch.column("score").to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u, -s))[:k]
        return pa.table(
            {
                "src": pa.array(u[order]),
                "dst": pa.array(w[order]),
                "common": pa.array(c[order]),
                "score": pa.array(s[order]),
            }
        )

    return (
        attached.map_batches(topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(topk, batch_format="pyarrow", batch_size=None)
    )


def two_hop_sizes(edges_ds, num_buckets: int = 64):
    """Exact 2-hop neighbourhood size |{u : 1 <= dist(v,u) <= 2}| per
    edge-incident vertex of the undirected simple graph -> Dataset
    (vid, two_hop). The exact counterpart of ``hyperanf``'s round-2 ball
    estimate — the local-density / influence-radius feature.

    Dataflow: canonical distinct edges -> adjacency rows bucketed by the
    wedge MIDDLE vertex -> per-group ORDERED neighbour-pair generation
    (both directions of each unordered wedge) unioned with the direct
    edges -> one coarse-bucket exact distinct on the packed (v<<32)|u key
    -> per-vertex count via one more coarse-bucket sum. Wedge volume is
    O(sum deg^2) — the documented common-neighbour skew surface; degree-cap
    hubs upstream at crawl scale."""
    import pyarrow as pa

    from raylink.join import bucketed_distinct, bucketed_sum
    from raylink.util import splitmix64

    B = np.uint64(num_buckets)
    distinct, _ = _distinct_and_degrees(edges_ds)

    def adj_rows(batch: pa.Table) -> pa.Table:
        a, b = _unpack(batch.column("key").to_numpy(zero_copy_only=False))
        v = np.concatenate([a, b])
        n = np.concatenate([b, a])
        return pa.table(
            {"bkt": pa.array((splitmix64(v.astype(np.uint64)) % B).astype(np.int32)),
             "v": pa.array(v), "n": pa.array(n)}
        )

    def hop_keys(group: pa.Table) -> pa.Table:
        v = group.column("v").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((n, v))
        v, n = v[order], n[order]
        _, starts, counts = np.unique(v, return_index=True, return_counts=True)
        total = int((counts * (counts - 1)).sum())  # ordered wedge pairs
        keys = np.empty(total + 2 * len(v), dtype=np.int64)
        pos = 0
        for s0, c in zip(starts, counts):  # per-middle; hubs dominate anyway
            if c < 2:
                continue
            seg = n[s0 : s0 + c]
            iu, iw = np.triu_indices(c, k=1)
            m = len(iu)
            keys[pos : pos + m] = (seg[iu] << np.int64(32)) | seg[iw]
            keys[pos + m : pos + 2 * m] = (seg[iw] << np.int64(32)) | seg[iu]
            pos += 2 * m
        # direct neighbours (already localized here: every edge of v is in
        # v's middle bucket as an adjacency row)
        keys[pos : pos + len(v)] = (v << np.int64(32)) | n
        pos += len(v)
        keys[pos : pos + len(v)] = (n << np.int64(32)) | v
        pos += len(v)
        uk = np.unique(keys[:pos])  # pre-dedup before the distinct shuffle
        return pa.table({"key": pa.array(uk)})

    pairs = (
        distinct.map_batches(adj_rows, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(hop_keys, batch_format="pyarrow")
    )
    dedup = bucketed_distinct(pairs, "key", num_buckets=num_buckets)

    def per_vertex(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {"vid": pa.array(unpack_hi(k)),
             "c": pa.array(np.ones(len(k), dtype=np.int64))}
        )

    counts = bucketed_sum(
        dedup.map_batches(per_vertex, batch_format="pyarrow"),
        "vid", "c", out_val="two_hop", num_buckets=num_buckets,
    )
    return counts


def cocitation_pairs(edges_ds, k: int = 50, num_buckets: int = 64,
                     mode: str = "cocitation"):
    """Co-citation / bibliographic-coupling pair ranking over the DIRECTED
    simple graph (Small 1973 / Kessler 1963 — the classic citation-graph
    similarity signals):

      cocitation   pairs {a < b} by |{m : m->a and m->b}| — cited together
      bibcoupling  pairs {a < b} by |{m : a->m and b->m}| — cite the same

    -> Dataset (src, dst, common, rank 1..k) ordered by (common DESC, src,
    dst). Dataflow mirrors ``_common_neighbor_counts`` with the wedge
    middle pinned to the citing page (cocitation) or the cited page
    (bibcoupling): distinct directed edges -> per-middle canonical pair
    generation with per-group pre-combine -> one coarse-bucket pair sum ->
    per-block local top-k coalesced to one block. Wedge volume is
    O(sum outdeg^2) / O(sum indeg^2) — degree-cap hubs upstream at crawl
    scale (the documented common-neighbour skew surface)."""
    import pyarrow as pa

    from raylink.join import bucketed_sum
    from raylink.pipelines import distinct_edges
    from raylink.util import splitmix64

    B = np.uint64(num_buckets)
    mid_col, nbr_col = (
        ("src", "dst") if mode == "cocitation" else ("dst", "src")
    )

    de = distinct_edges(edges_ds)

    def adj_rows(batch: pa.Table) -> pa.Table:
        v = batch.column(mid_col).to_numpy(zero_copy_only=False)
        n = batch.column(nbr_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {"bkt": pa.array(
                (splitmix64(v.astype(np.uint64)) % B).astype(np.int32)
             ),
             "v": pa.array(v), "n": pa.array(n)}
        )

    def wedge_pairs(group: pa.Table) -> pa.Table:
        v = group.column("v").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((n, v))
        v, n = v[order], n[order]
        _, starts, counts = np.unique(v, return_index=True,
                                      return_counts=True)
        total = int((counts * (counts - 1) // 2).sum())
        if total == 0:
            return pa.table({"key": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        keys = np.empty(total, dtype=np.int64)
        pos = 0
        for s0, c in zip(starts, counts):  # per-middle; hubs dominate
            if c < 2:
                continue
            seg = n[s0 : s0 + c]
            iu, iw = np.triu_indices(c, k=1)
            m = len(iu)
            keys[pos : pos + m] = (seg[iu] << np.int64(32)) | seg[iw]
            pos += m
        uk, cnt = np.unique(keys, return_counts=True)
        return pa.table({"key": pa.array(uk),
                         "c": pa.array(cnt.astype(np.int64))})

    counts = bucketed_sum(
        de.map_batches(adj_rows, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(wedge_pairs, batch_format="pyarrow"),
        "key", "c", out_val="common", num_buckets=num_buckets,
    )

    def topk(batch: pa.Table) -> pa.Table:
        if "key" in batch.column_names:  # first (per-block) pass
            a, b = _unpack(batch.column("key").to_numpy(zero_copy_only=False))
        else:  # final coalesced pass re-ranks the block winners
            a = batch.column("src").to_numpy(zero_copy_only=False)
            b = batch.column("dst").to_numpy(zero_copy_only=False)
        c = batch.column("common").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a, -c))[:k]
        return pa.table(
            {"src": pa.array(a[order]), "dst": pa.array(b[order]),
             "common": pa.array(c[order])}
        )

    def number(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "rank", pa.array(np.arange(1, len(batch) + 1, dtype=np.int64))
        )

    return (
        counts.map_batches(topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(topk, batch_format="pyarrow", batch_size=None)
        .map_batches(number, batch_format="pyarrow", batch_size=None)
    )


def directed_triangles(edges_ds, num_buckets: int = 64):
    """Directed 3-cycle count — cycles i->j->k->i over the DIRECTED simple
    graph, each counted exactly once at its minimum vertex (i < j, i < k;
    a directed 3-cycle has one orientation and three rotations, so pinning
    the start to the minimum vertex is a bijection onto cycles). The
    feedback-loop motif of the web graph (Milo et al., Science 2002) —
    the directed complement of the undirected ``triangle_count``, which the
    reference counts on the symmetrized graph only
    (sample-hama/.../TriangleCount.java:104,131).

    -> one-row Dataset (cycles). Dataflow mirrors ``edge_support``'s
    candidate/membership shape on the directed edge set:

      1. distinct directed edges, self-loops dropped;
      2. per-MIDDLE wedge generation: every edge (s,d) posts an in-row to
         middle d and an out-row to middle s; middles hash-bucketed (B
         coarse groups); per middle j the wedges are {(i,j,k): i in-nbr,
         i < j, k out-nbr, k > i} -> candidate key pack(k,i) = the close
         edge the cycle still needs;
      3. close: candidates ∪ packed directed-edge keys bucketed on the
         key; per-bucket sorted-search membership -> partial counts ->
         one global sum.

    Wedge volume is O(sum_j indeg_j * outdeg_j) cut by the i < j rank
    filter; in-degree hubs are cheap as middles (few in-nbrs BELOW a small
    hub id) but out-degree hubs multiply — degree-cap upstream at crawl
    scale (same skew surface as ``cocitation_pairs``). vids < 2**32
    (``assert_packable`` raises; ``ids.dense_id_remap`` is the cure)."""
    from raylink.pipelines import distinct_edges

    B = np.uint64(num_buckets)

    def mid_rows(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        mid = np.concatenate([d, s])
        nbr = np.concatenate([s, d])
        io = np.concatenate(
            [np.zeros(len(s), np.int8), np.ones(len(d), np.int8)]
        )
        return pa.table(
            {
                "bkt": pa.array(
                    (splitmix64(mid.astype(np.uint64)) % B).astype(np.int32)
                ),
                "mid": pa.array(mid),
                "nbr": pa.array(nbr),
                "io": pa.array(io),
            }
        )

    def wedge_keys(group: pa.Table) -> pa.Table:
        mid = group.column("mid").to_numpy(zero_copy_only=False)
        nbr = group.column("nbr").to_numpy(zero_copy_only=False)
        io = group.column("io").to_numpy(zero_copy_only=False)
        order = np.lexsort((io, mid))
        mid, nbr, io = mid[order], nbr[order], io[order]
        starts = np.flatnonzero(np.r_[True, mid[1:] != mid[:-1]])
        ends = np.r_[starts[1:], len(mid)]
        out = []
        for st, en in zip(starts, ends):
            j = mid[st]
            seg_io = io[st:en]
            ins = nbr[st:en][seg_io == 0]
            ins = ins[ins < j]
            if len(ins) == 0:
                continue
            outs = np.sort(nbr[st:en][seg_io == 1])
            if len(outs) == 0:
                continue
            # per in-nbr i: close keys pack(k, i) for out-nbrs k > i
            lo = np.searchsorted(outs, ins, side="right")
            cnt = len(outs) - lo
            keep = cnt > 0
            if not keep.any():
                continue
            ins, lo, cnt = ins[keep], lo[keep], cnt[keep]
            i_rep = np.repeat(ins, cnt)
            # gather outs[lo_r : ] per i via a flat running index
            base = np.repeat(lo - np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt)
            k_flat = outs[base + np.arange(len(i_rep))]
            out.append((k_flat << np.int64(32)) | i_rep)
        if not out:
            return pa.table(
                {"key": pa.array([], type=pa.int64()),
                 "tag": pa.array([], type=pa.int8())}
            )
        key = np.concatenate(out)
        return pa.table(
            {"key": pa.array(key),
             "tag": pa.array(np.zeros(len(key), np.int8))}
        )

    de = distinct_edges(edges_ds).materialize()
    cands = (
        de.map_batches(mid_rows, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(wedge_keys, batch_format="pyarrow")
    )

    def edge_rows(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        key = (s[keep] << np.int64(32)) | d[keep]
        return pa.table(
            {"key": pa.array(key),
             "tag": pa.array(np.ones(len(key), np.int8))}
        )

    both = cands.union(de.map_batches(edge_rows, batch_format="pyarrow"))

    def rebucket(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "kb",
            pa.array((splitmix64(k.astype(np.uint64)) % B).astype(np.int32)),
        )

    def close(group: pa.Table) -> pa.Table:
        key = group.column("key").to_numpy(zero_copy_only=False)
        tag = group.column("tag").to_numpy(zero_copy_only=False)
        ek = np.unique(key[tag == 1])
        wk = key[tag == 0]
        if len(ek) and len(wk):
            pos = np.searchsorted(ek, wk)
            n = int(((pos < len(ek)) & (ek[np.minimum(pos, len(ek) - 1)] == wk)).sum())
        else:
            n = 0
        return pa.table({"c": pa.array([n], type=pa.int64())})

    partials = (
        both.map_batches(rebucket, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(close, batch_format="pyarrow")
    )
    total = int(partials.sum("c") or 0)
    return pa.table({"cycles": pa.array([total], type=pa.int64())})


def directed_assortativity(edges_ds, num_buckets: int = 32) -> pa.Table:
    """Directed (out->in) degree assortativity (Foster et al., PNAS 2010):
    the Pearson correlation of source OUT-degree vs target IN-degree over
    the distinct directed simple edges -> one-row Table
    (assortativity r6, n_edges). Does hub-pointing correlate with
    hub-being-pointed-at — the directed question ``degree_assortativity``
    symmetrizes away.

        r = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))

    Every S is an exact int64 partial reduced in Python arbitrary
    precision; the final expression is evaluated in the same IEEE order as
    the SQL mirror (int -> float64 casts, one multiply, one sqrt, one
    divide, ROUND half-away 6). Degenerate factors report 0.0.

    Shape: distinct directed edges -> out-/in-degree tables (coarse-bucket
    sums) -> two thresholded ``attach_lookup`` joins (broadcast below the
    vertex threshold, hash_join above — nothing driver-side at crawl
    scale) -> one 6-scalar per-batch partial."""
    from raylink.join import attach_lookup, bucketed_sum
    from raylink.pipelines import distinct_edges
    from raylink.util import round_half_away

    def noloop(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        return pa.table({"src": pa.array(s[keep]), "dst": pa.array(d[keep])})

    de = distinct_edges(edges_ds).map_batches(
        noloop, batch_format="pyarrow"
    ).materialize()

    def one_rows(col):
        def f(batch: pa.Table) -> pa.Table:
            v = batch.column(col).to_numpy(zero_copy_only=False)
            return pa.table(
                {"v": pa.array(v),
                 "c": pa.array(np.ones(len(v), np.int64))}
            )

        return f

    od = bucketed_sum(
        de.map_batches(one_rows("src"), batch_format="pyarrow"),
        key="v", val="c", out_val="od", num_buckets=num_buckets,
    ).map_batches(
        lambda b: pa.table({"src": b.column("v"), "od": b.column("od")}),
        batch_format="pyarrow",
    ).materialize()
    idg = bucketed_sum(
        de.map_batches(one_rows("dst"), batch_format="pyarrow"),
        key="v", val="c", out_val="idg", num_buckets=num_buckets,
    ).map_batches(
        lambda b: pa.table({"dst": b.column("v"), "idg": b.column("idg")}),
        batch_format="pyarrow",
    ).materialize()

    e1 = attach_lookup(
        de, od, on="src", left_cols={"dst": pa.int64()},
        value_cols={"od": pa.int64()}, n_lookup_rows=od.count(),
        num_buckets=num_buckets,
    )
    e2 = attach_lookup(
        e1, idg, on="dst", left_cols={"od": pa.int64()},
        value_cols={"idg": pa.int64()}, n_lookup_rows=idg.count(),
        num_buckets=num_buckets,
    )

    def partial(batch: pa.Table) -> pa.Table:
        from raylink.util import pearson_partials

        p = pearson_partials(
            batch.column("od").to_numpy(zero_copy_only=False),
            batch.column("idg").to_numpy(zero_copy_only=False),
        )
        return pa.table({k: pa.array([v], type=pa.int64()) for k, v in p.items()})

    sums = e2.map_batches(partial, batch_format="pyarrow").sum(
        ["n", "sx", "sy", "sxy", "sxx", "syy"]
    )
    n = int(sums["sum(n)"] or 0)
    sx, sy = int(sums["sum(sx)"] or 0), int(sums["sum(sy)"] or 0)
    sxy = int(sums["sum(sxy)"] or 0)
    sxx, syy = int(sums["sum(sxx)"] or 0), int(sums["sum(syy)"] or 0)
    f1, f2 = n * sxx - sx * sx, n * syy - sy * sy
    if f1 == 0 or f2 == 0:
        r = 0.0
    else:
        den = np.sqrt(np.float64(f1) * np.float64(f2))
        r = float(round_half_away(np.float64(n * sxy - sx * sy) / den, 6))
    return pa.table(
        {
            "assortativity": pa.array([r], type=pa.float64()),
            "n_edges": pa.array([n], type=pa.int64()),
        }
    )
