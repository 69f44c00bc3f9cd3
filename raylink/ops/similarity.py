"""Similarity search over an embedding column (``list<float>``).

- ``knn_brute``: exact top-k cosine — per-batch numpy matmul against a
  broadcast query matrix (``ray.put`` once, read per actor), per-batch
  local top-k prune, then a per-query reduce. Scale shape: the scan streams,
  only ``n_queries * k`` candidate rows per batch reach the shuffle.
- ``lsh_ann``: random-hyperplane LSH-bucketed approximate variant (the scale
  path): sign-sketch buckets via groupby, exact cosine within buckets across
  ``n_tables`` independent tables, then per-query reduce. Recall is
  verified against ``knn_brute`` in tests.
- ``embedding_pairs``: cosine >= tau near-dup pairs (brute per-batch vs
  broadcast matrix; IVF/LSH is the documented crawl-scale path).

Ties are broken by (rounded cosine desc, neighbor id asc) so results are
deterministic and SQL-comparable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.util import assert_packable, round_half_away, unpack_hi


def _mat(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(flat) // len(batch) if len(batch) else 0
    return flat.reshape(len(batch), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_brute(emb_ds, query_ids: list[int], k: int = 5):
    """-> Dataset (query_id, neighbor_id, cosine r6, rank 1..k), self
    excluded."""
    import pyarrow.compute as pc
    import ray

    qlist = pa.array(sorted(int(q) for q in query_ids), type=pa.int64())
    q_pdf = emb_ds.map_batches(
        lambda b: b.filter(pc.is_in(b.column("vec_id"), value_set=qlist)),
        batch_format="pyarrow",
    ).to_pandas()
    q_ids = q_pdf["vec_id"].to_numpy(np.int64)
    qm = _normalize(np.array(q_pdf["embedding"].tolist(), dtype=np.float64))
    ref = ray.put((q_ids, qm))

    def local_topk(batch: pa.Table) -> pa.Table:
        qi, qmat = ray.get(ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        if len(ids) == 0:  # empty block: _mat would be (0, 0)
            return pa.table(
                {"query_id": pa.array([], type=pa.int64()),
                 "neighbor_id": pa.array([], type=pa.int64()),
                 "cosine": pa.array([], type=pa.float64())}
            )
        m = _normalize(_mat(batch))
        sims = round_half_away(qmat @ m.T, 6)  # (nq, nb)
        out_q, out_n, out_s = [], [], []
        for r, q in enumerate(qi):
            mask = ids != q
            s, nid = sims[r][mask], ids[mask]
            if len(s) == 0:
                continue
            take = min(len(s), k)
            # deterministic: sort by (-cos, neighbor_id)
            order = np.lexsort((nid, -s))[:take]
            out_q.append(np.full(take, q, dtype=np.int64))
            out_n.append(nid[order])
            out_s.append(s[order])
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], type=pa.int64()),
                 "neighbor_id": pa.array([], type=pa.int64()),
                 "cosine": pa.array([], type=pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "cosine": pa.array(np.concatenate(out_s)),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        s = group.column("cosine").to_numpy(zero_copy_only=False)
        nid = group.column("neighbor_id").to_numpy(zero_copy_only=False)
        q = group.column("query_id")[0].as_py()
        order = np.lexsort((nid, -s))[:k]
        return pa.table(
            {
                "query_id": pa.array(np.full(len(order), q, dtype=np.int64)),
                "neighbor_id": pa.array(nid[order]),
                "cosine": pa.array(s[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return (
        emb_ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
    )


class _SignSketch:
    """Per-actor state: seeded random hyperplanes."""

    def __init__(self, dim: int, n_tables: int, bits: int, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, bits, dim))
        self.n_tables, self.bits = n_tables, bits

    def buckets(self, m: np.ndarray) -> np.ndarray:
        """(n, dim) -> (n_tables, n) int64 bucket ids."""
        out = np.empty((self.n_tables, m.shape[0]), dtype=np.int64)
        for t in range(self.n_tables):
            signs = (m @ self.planes[t].T) > 0  # (n, bits)
            code = np.zeros(m.shape[0], dtype=np.int64)
            for b in range(self.bits):
                code |= signs[:, b].astype(np.int64) << b
            out[t] = (t << 32) | code
        return out


def lsh_ann(emb_ds, query_ids: list[int], k: int = 5, n_tables: int = 8, bits: int = 8,
            seed: int = 11):
    """Approximate top-k: candidates = vectors sharing any sign-sketch bucket
    with the query across n_tables tables; exact cosine within buckets."""
    import pyarrow.compute as pc
    import ray

    qlist = pa.array(sorted(int(q) for q in query_ids), type=pa.int64())
    q_pdf = emb_ds.map_batches(
        lambda b: b.filter(pc.is_in(b.column("vec_id"), value_set=qlist)),
        batch_format="pyarrow",
    ).to_pandas()
    q_ids = q_pdf["vec_id"].to_numpy(np.int64)
    qm = _normalize(np.array(q_pdf["embedding"].tolist(), dtype=np.float64))
    dim = qm.shape[1]
    sk = _SignSketch(dim, n_tables, bits, seed)
    q_buckets = sk.buckets(qm)  # (T, nq)
    ref = ray.put((q_ids, qm, q_buckets))

    def bucketize(batch: pa.Table) -> pa.Table:
        qi, qmat, qb = ray.get(ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table(
                {"query_id": pa.array([], type=pa.int64()),
                 "neighbor_id": pa.array([], type=pa.int64()),
                 "cosine": pa.array([], type=pa.float64())}
            )
        m = _normalize(_mat(batch))
        vb = sk.buckets(m)  # (T, n)
        out_q, out_n, out_s = [], [], []
        # per query: candidates in this batch sharing any bucket
        for r, q in enumerate(qi):
            cand = np.zeros(len(ids), dtype=bool)
            for t in range(sk.n_tables):
                cand |= vb[t] == qb[t, r]
            cand &= ids != q
            if not cand.any():
                continue
            s = round_half_away(qmat[r] @ m[cand].T, 6)
            out_q.append(np.full(cand.sum(), q, dtype=np.int64))
            out_n.append(ids[cand])
            out_s.append(s)
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], type=pa.int64()),
                 "neighbor_id": pa.array([], type=pa.int64()),
                 "cosine": pa.array([], type=pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "cosine": pa.array(np.concatenate(out_s)),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        s = group.column("cosine").to_numpy(zero_copy_only=False)
        nid = group.column("neighbor_id").to_numpy(zero_copy_only=False)
        nid, ix = np.unique(nid, return_index=True)
        s = s[ix]
        q = group.column("query_id")[0].as_py()
        order = np.lexsort((nid, -s))[:k]
        return pa.table(
            {
                "query_id": pa.array(np.full(len(order), q, dtype=np.int64)),
                "neighbor_id": pa.array(nid[order]),
                "cosine": pa.array(s[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return (
        emb_ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
    )


def ivf_ann(
    emb_ds,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_sample: int = 2048,
    train_iters: int = 8,
    seed: int = 13,
):
    """IVF (inverted-file) approximate top-k — the index-shaped ANN scale
    path alongside ``lsh_ann``:

    1. a small centroid codebook is trained driver-side with Lloyd k-means
       on a deterministic hash-ordered sample (the ``train_sample`` vectors
       with smallest ``splitmix64(vec_id)`` — id-space-agnostic, unlike a
       ``vec_id < train_sample`` cut which assumes dense ids from 0) of
       normalized vectors — the codebook is tiny and broadcast once;
    2. every vector is assigned to its nearest centroid inside
       ``map_batches`` (the inverted lists exist implicitly as the
       assignment); the full dataset never leaves the workers;
    3. each query probes its ``n_probe`` nearest centroids; only vectors in
       probed lists get exact cosines (candidate fraction ~ n_probe /
       n_centroids), then the usual per-query top-k reduce.

    Deterministic (seeded init, fixed iteration count); recall vs
    ``knn_brute`` is tested in pytest."""
    import pyarrow.compute as pc
    import ray

    qlist = pa.array(sorted(int(q) for q in query_ids), type=pa.int64())
    q_pdf = emb_ds.map_batches(
        lambda b: b.filter(pc.is_in(b.column("vec_id"), value_set=qlist)),
        batch_format="pyarrow",
    ).to_pandas()
    q_ids = q_pdf["vec_id"].to_numpy(np.int64)
    qm = _normalize(np.array(q_pdf["embedding"].tolist(), dtype=np.float64))

    # --- train codebook on a deterministic hash-ordered sample: each batch
    # prunes to its train_sample smallest splitmix64(vec_id), a distributed
    # second reduce stage (repartition to <=_PRUNE_FANIN blocks, prune each
    # whole block) collapses the per-batch survivors, and only then does the
    # driver take the global smallest train_sample. Works for ANY id space
    # (dense, hashed, sparse). Driver pull is bounded by
    # train_sample * _PRUNE_FANIN rows — independent of corpus size.
    from raylink.util import splitmix64

    _PRUNE_FANIN = 16

    def prune(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        h = splitmix64(ids.astype(np.uint64))
        take = np.argsort(h, kind="stable")[:train_sample]
        return batch.take(pa.array(np.sort(take)))

    pruned = (
        emb_ds.map_batches(prune, batch_format="pyarrow", batch_size=8192)
        .repartition(_PRUNE_FANIN)
        .map_batches(prune, batch_format="pyarrow", batch_size=None)
    )
    train_pdf = pruned.to_pandas()
    if len(train_pdf) == 0:
        raise ValueError("ivf_ann: empty training sample (no vectors in input)")
    th = splitmix64(train_pdf["vec_id"].to_numpy(np.int64).astype(np.uint64))
    sel = np.argsort(th, kind="stable")[:train_sample]
    tm = _normalize(
        np.array(train_pdf["embedding"].iloc[sel].tolist(), dtype=np.float64)
    )
    rng = np.random.default_rng(seed)
    n_centroids = min(n_centroids, len(tm))
    cent = tm[rng.choice(len(tm), size=n_centroids, replace=False)]
    for _ in range(train_iters):
        assign = np.argmax(tm @ cent.T, axis=1)
        for c in range(n_centroids):
            sel = assign == c
            if sel.any():
                v = tm[sel].mean(axis=0)
                nrm = np.linalg.norm(v)
                if nrm > 0:
                    cent[c] = v / nrm
    # per-query probe sets: n_probe nearest centroids
    probe = np.argsort(-(qm @ cent.T), axis=1)[:, : min(n_probe, n_centroids)]
    ref = ray.put((q_ids, qm, cent, probe))

    def scan(batch: pa.Table) -> pa.Table:
        qi, qmat, cents, probes = ray.get(ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table(
                {"query_id": pa.array([], type=pa.int64()),
                 "neighbor_id": pa.array([], type=pa.int64()),
                 "cosine": pa.array([], type=pa.float64())}
            )
        m = _normalize(_mat(batch))
        assign = np.argmax(m @ cents.T, axis=1)
        out_q, out_n, out_s = [], [], []
        for r, q in enumerate(qi):
            cand = np.isin(assign, probes[r]) & (ids != q)
            if not cand.any():
                continue
            s = round_half_away(qmat[r] @ m[cand].T, 6)
            take = min(int(cand.sum()), k)
            nid = ids[cand]
            order = np.lexsort((nid, -s))[:take]
            out_q.append(np.full(take, q, dtype=np.int64))
            out_n.append(nid[order])
            out_s.append(s[order])
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], type=pa.int64()),
                 "neighbor_id": pa.array([], type=pa.int64()),
                 "cosine": pa.array([], type=pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "cosine": pa.array(np.concatenate(out_s)),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        s = group.column("cosine").to_numpy(zero_copy_only=False)
        nid = group.column("neighbor_id").to_numpy(zero_copy_only=False)
        q = group.column("query_id")[0].as_py()
        order = np.lexsort((nid, -s))[:k]
        return pa.table(
            {
                "query_id": pa.array(np.full(len(order), q, dtype=np.int64)),
                "neighbor_id": pa.array(nid[order]),
                "cosine": pa.array(s[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return (
        emb_ds.map_batches(scan, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
    )


def knn_join(
    emb_ds,
    query_ds=None,
    k: int = 5,
    n_tables: int = 8,
    bits: int = 8,
    seed: int = 11,
    num_buckets: int = 64,
    max_bucket: int = 4096,
):
    """Approximate k-NN where the QUERY SET is itself a Dataset — "label
    every doc with its nearest neighbors" (queries ~ corpus), the shape
    ``knn_brute``/``lsh_ann``'s broadcast query matrix cannot reach
    (VERDICT r2 item 4; reference analog: the remote-vertex lookup
    generalized, LongTextAdjacencyListReader.java:126-232).

    Shape — a bucketed candidate JOIN, nothing broadcast, nothing on the
    driver:
      1. both sides sketch into the same ``n_tables`` random-hyperplane
         tables (seeded per actor); each row replicates to its per-table
         buckets carrying (side, vec_id, embedding);
      2. one coarse-bucket groupby co-locates each exact bucket; inside a
         group, per-bucket query x corpus cosines are one matmul, pruned to
         the per-query LOCAL top-k before anything shuffles again (shuffle
         volume <= n_queries * k per table, not bucket^2);
      3. a second coarse groupby on hash(query_id) merges tables: dedup
         neighbors, exact top-k, deterministic ties (-cosine, neighbor_id).

    ``query_ds=None`` means self-join (every corpus vector is a query;
    self-matches excluded). Buckets larger than ``max_bucket`` corpus rows
    are truncated by hashed-id order (deterministic; logged assumption —
    the standard LSH hot-bucket cut, same role as dedup's ``max_df``).
    Recall vs ``knn_brute`` is pytest-verified at >=10k queries."""
    from raylink.util import splitmix64

    self_join = query_ds is None
    sk_holder: dict = {}
    B = np.uint64(num_buckets)

    def tagger(side: int):
        def tag(batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                emb0 = batch.column("embedding")
                if isinstance(emb0, pa.ChunkedArray):
                    emb0 = emb0.combine_chunks()
                return pa.table(
                    {"bucket": pa.array([], type=pa.int64()),
                     "vec_id": pa.array([], type=pa.int64()),
                     "side": pa.array([], type=pa.int8()),
                     "embedding": emb0,
                     "cb": pa.array([], type=pa.int32())}
                )
            m = _normalize(_mat(batch))
            sk = sk_holder.get("sk")
            if sk is None:
                sk = sk_holder["sk"] = _SignSketch(m.shape[1], n_tables, bits, seed)
            vb = sk.buckets(m)  # (T, n)
            n = len(ids)
            emb = batch.column("embedding")
            if isinstance(emb, pa.ChunkedArray):
                emb = emb.combine_chunks()
            reps = []
            for t in range(n_tables):
                reps.append(
                    pa.table(
                        {
                            "bucket": pa.array(vb[t].astype(np.int64)),
                            "vec_id": pa.array(ids),
                            "side": pa.array(np.full(n, side, dtype=np.int8)),
                            "embedding": emb,
                        }
                    )
                )
            out = pa.concat_tables(reps)
            bk = out.column("bucket").to_numpy(zero_copy_only=False)
            return out.append_column(
                "cb",
                pa.array(
                    (splitmix64(bk.astype(np.uint64)) % B).astype(np.int32)
                ),
            )

        return tag

    corpus = emb_ds.select_columns(["vec_id", "embedding"]).map_batches(
        tagger(0), batch_format="pyarrow"
    )
    if self_join:
        # one pass: every corpus row doubles as a query inside bucket_topk
        # (no second sketch scan, half the shuffle bytes)
        tagged = corpus
    else:
        tagged = corpus.union(
            query_ds.select_columns(["vec_id", "embedding"]).map_batches(
                tagger(1), batch_format="pyarrow"
            )
        )

    def bucket_topk(group: pa.Table) -> pa.Table:
        bk = group.column("bucket").to_numpy(zero_copy_only=False)
        side = group.column("side").to_numpy(zero_copy_only=False)
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        m = _normalize(_mat(group))
        order = np.lexsort((ids, side, bk))
        bk, side, ids, m = bk[order], side[order], ids[order], m[order]
        starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        ends = np.r_[starts[1:], len(bk)]
        out_q, out_n, out_s = [], [], []
        for st, en in zip(starts, ends):
            if self_join:
                nc = en - st
                if nc < 2:
                    continue
                cid = qid = ids[st:en]
                cm = qm = m[st:en]
            else:
                sd = side[st:en]
                nq = int((sd == 1).sum())
                nc = en - st - nq
                if nq == 0 or nc == 0:
                    continue
                # rows sorted by side: corpus block first, then queries
                cid, cm = ids[st : st + nc], m[st : st + nc]
                qid, qm = ids[st + nc : en], m[st + nc : en]
            if nc > max_bucket:
                # deterministic hot-bucket cut by hashed id order
                selc = np.argsort(splitmix64(cid.astype(np.uint64)), kind="stable")[
                    :max_bucket
                ]
                selc = np.sort(selc)
                cid, cm = cid[selc], cm[selc]
                nc = max_bucket
            sims = round_half_away(qm @ cm.T, 6)  # (nq, nc)
            take = min(k, nc)
            nq = len(qid)
            # per-query local top-k by (-cos, neighbor_id) via ONE packed
            # int64 key: s6 in [-1e6, 1e6] (6-dp-rounded cosine) shifted
            # past a column index. cid is ascending within the bucket (the
            # bucket sort is (ids, side, bk)), so smaller column == smaller
            # neighbor_id — key-descending order IS (-cos, cid). Keys are
            # unique, so argpartition + a take-wide argsort replaces the
            # old full-row lexsort: O(nq*nc) instead of O(nq*nc*log nc),
            # selection bit-identical (pinned by the recall/subset tests).
            s6 = np.rint(sims * 1e6).astype(np.int64)
            key = s6 * np.int64(1 << 32) - np.arange(nc, dtype=np.int64)[None, :]
            if self_join:
                key[qid[:, None] == cid[None, :]] = np.iinfo(np.int64).min
            if take < nc:
                part = np.argpartition(key, nc - take, axis=1)[:, nc - take:]
            else:
                part = np.broadcast_to(np.arange(nc, dtype=np.int64), (nq, nc)).copy()
            pk = np.take_along_axis(key, part, axis=1)
            ord2 = np.argsort(-pk, axis=1)
            cols = np.take_along_axis(part, ord2, axis=1).reshape(-1)
            rows = np.repeat(np.arange(nq), take)
            keep = key[rows, cols] != np.iinfo(np.int64).min
            out_q.append(np.repeat(qid, take)[keep])
            out_n.append(cid[cols][keep])
            out_s.append(sims[rows, cols][keep])
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], type=pa.int64()),
                 "neighbor_id": pa.array([], type=pa.int64()),
                 "cosine": pa.array([], type=pa.float64()),
                 "qb": pa.array([], type=pa.int32())}
            )
        q = np.concatenate(out_q)
        return pa.table(
            {
                "query_id": pa.array(q),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "cosine": pa.array(np.concatenate(out_s)),
                "qb": pa.array(
                    (splitmix64(q.astype(np.uint64)) % B).astype(np.int32)
                ),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        q = group.column("query_id").to_numpy(zero_copy_only=False)
        n = group.column("neighbor_id").to_numpy(zero_copy_only=False)
        s = group.column("cosine").to_numpy(zero_copy_only=False)
        # segment by query; dedup (q, n); exact top-k, deterministic ties
        order = np.lexsort((n, -s, q))
        q, n, s = q[order], n[order], s[order]
        uniq = np.r_[True, (q[1:] != q[:-1]) | (n[1:] != n[:-1])]
        q, n, s = q[uniq], n[uniq], s[uniq]
        order = np.lexsort((n, -s, q))
        q, n, s = q[order], n[order], s[order]
        starts = np.flatnonzero(np.r_[True, q[1:] != q[:-1]])
        ends = np.r_[starts[1:], len(q)]
        idx = []
        for st, en in zip(starts, ends):
            idx.append(np.arange(st, min(st + k, en)))
        if not idx:
            return pa.table(
                {"query_id": pa.array([], type=pa.int64()),
                 "neighbor_id": pa.array([], type=pa.int64()),
                 "cosine": pa.array([], type=pa.float64()),
                 "rank": pa.array([], type=pa.int64())}
            )
        ix = np.concatenate(idx)
        ranks = np.concatenate(
            [np.arange(1, len(i) + 1, dtype=np.int64) for i in idx]
        )
        return pa.table(
            {
                "query_id": pa.array(q[ix]),
                "neighbor_id": pa.array(n[ix]),
                "cosine": pa.array(s[ix]),
                "rank": pa.array(ranks),
            }
        )

    cand = (
        tagged.groupby("cb")
        .map_groups(bucket_topk, batch_format="pyarrow")
    )
    from raylink.join import with_typed_empty

    return with_typed_empty(
        cand.groupby("qb").map_groups(final_topk, batch_format="pyarrow"),
        {"query_id": pa.int64(), "neighbor_id": pa.int64(),
         "cosine": pa.float64(), "rank": pa.int64()},
    )


def embedding_pairs(emb_ds, tau: float = 0.9, num_blocks: int = 8):
    """All pairs with cosine >= tau -> (id_a, id_b, cosine r6), a < b.

    EXACT, via a distributed block-pair join: vectors hash into
    ``num_blocks`` blocks; each vector is replicated to the ``num_blocks``
    block-pair groups containing its block, and every unordered vector pair
    meets in exactly ONE group, where cosines are one vectorized matmul.
    Shuffle volume O(N * num_blocks) rows, driver holds nothing; compute is
    inherently O(N^2) because the result is exact — for approximate near-dup
    at crawl scale use ``embedding_pairs_lsh`` (sketch-bucketed candidates,
    subquadratic, recall < 1 by design)."""
    from raylink.util import splitmix64

    K = num_blocks

    def replicate(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        blk = (splitmix64(ids.astype(np.uint64)) % np.uint64(K)).astype(np.int64)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        out = []
        for j in range(K):
            lo = np.minimum(blk, j)
            hi = np.maximum(blk, j)
            out.append(
                pa.table(
                    {
                        "pb": pa.array(lo * K + hi),
                        "vec_id": pa.array(ids),
                        "embedding": emb,
                    }
                )
            )
        return pa.concat_tables(out)

    def cross(group: pa.Table) -> pa.Table:
        pb = int(group.column("pb")[0].as_py())
        bi, bj = pb // K, pb % K
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        # each vector reaches this group exactly once by construction;
        # dedup by vec_id is cheap insurance against upstream re-execution
        uniq, first = np.unique(ids, return_index=True)
        g = group.take(pa.array(first))
        ids = uniq
        m = _normalize(_mat(g))
        blk = (splitmix64(ids.astype(np.uint64)) % np.uint64(K)).astype(np.int64)
        empty = pa.table(
            {"id_a": pa.array([], type=pa.int64()),
             "id_b": pa.array([], type=pa.int64()),
             "cosine": pa.array([], type=pa.float64())}
        )
        if bi == bj:
            sel = blk == bi
            ids_i, m_i = ids[sel], m[sel]
            if len(ids_i) < 2:
                return empty
            sims = round_half_away(m_i @ m_i.T, 6)
            keep = (sims >= tau) & (ids_i[:, None] < ids_i[None, :])
            ii, jj = np.nonzero(keep)
            return pa.table(
                {"id_a": pa.array(ids_i[ii]), "id_b": pa.array(ids_i[jj]),
                 "cosine": pa.array(sims[ii, jj])}
            )
        sel_i, sel_j = blk == bi, blk == bj
        if not sel_i.any() or not sel_j.any():
            return empty
        ids_i, ids_j = ids[sel_i], ids[sel_j]
        sims = round_half_away(m[sel_i] @ m[sel_j].T, 6)
        keep = sims >= tau
        ii, jj = np.nonzero(keep)
        a = np.minimum(ids_i[ii], ids_j[jj])
        b = np.maximum(ids_i[ii], ids_j[jj])
        return pa.table(
            {"id_a": pa.array(a), "id_b": pa.array(b),
             "cosine": pa.array(sims[ii, jj])}
        )

    return (
        emb_ds.select_columns(["vec_id", "embedding"])
        .map_batches(replicate, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(cross, batch_format="pyarrow")
    )


def embedding_pairs_lsh(
    emb_ds, tau: float = 0.9, n_tables: int = 16, bits: int = 8, seed: int = 11,
    num_buckets: int = 64, embedding_type: pa.DataType | None = None,
):
    """Approximate cosine near-dup: sign-sketch LSH candidates + exact
    per-pair verify — the subquadratic crawl-scale path.

    Candidates = vector pairs sharing a sketch bucket in ANY of ``n_tables``
    random-hyperplane tables (generated by the same coarse-bucket groupby
    used in the minhash/simhash ops); each candidate is verified exactly by
    joining both embeddings onto the pair key (``_pair_attach``) and taking
    the true cosine. Recall: a pair at cosine c collides per table with
    p = (1 - arccos(c)/pi)^bits; catch prob = 1-(1-p)^n_tables (e.g. c=0.9
    -> p~0.51, 16 tables -> ~1-1e-5; c=0.5 -> ~0.27 — by design, low-sim
    pairs are sacrificed). Exactness of the *reported* pairs is guaranteed;
    completeness is not (use ``embedding_pairs`` for exact recall)."""
    from raylink.ops.dedup import _pair_attach
    from raylink.util import splitmix64

    if embedding_type is None:
        # derive the list element type from the input instead of assuming
        # float32 (a float64 input would schema-mismatch inside pair_attach).
        # Dataset.schema() is metadata-cheap on a read_*; for a derived
        # pipeline it may execute upstream — pass embedding_type explicitly
        # in that case.
        sch = emb_ds.schema()
        embedding_type = dict(zip(sch.names, sch.types))["embedding"]

    sk_holder = {}

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "bucket": pa.array([], type=pa.int64())}
            )
        m = _normalize(_mat(batch))
        sk = sk_holder.get("sk")
        if sk is None:
            sk = sk_holder["sk"] = _SignSketch(m.shape[1], n_tables, bits, seed)
        vb = sk.buckets(m)  # (T, n)
        return pa.table(
            {
                "doc_id": pa.array(np.tile(ids, n_tables)),
                "bucket": pa.array(vb.reshape(-1)),
            }
        )

    def coarse(batch: pa.Table) -> pa.Table:
        bk = batch.column("bucket").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "cb",
            pa.array(
                (splitmix64(bk.astype(np.uint64)) % np.uint64(num_buckets)).astype(np.int32)
            ),
        )

    def cand(group: pa.Table) -> pa.Table:
        bk = group.column("bucket").to_numpy(zero_copy_only=False)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        assert_packable(ids, "embedding_pairs_lsh vec_id")
        order = np.lexsort((ids, bk))
        bk, ids = bk[order], ids[order]
        starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        ends = np.r_[starts[1:], len(bk)]
        keys = []
        for st, en in zip(starts, ends):
            docs = np.unique(ids[st:en])
            if len(docs) < 2:
                continue
            ii, jj = np.triu_indices(len(docs), k=1)
            keys.append((docs[ii] << np.int64(32)) | docs[jj])
        if not keys:
            return pa.table({"key": pa.array([], type=pa.int64())})
        return pa.table({"key": pa.array(np.unique(np.concatenate(keys)))})

    cands = (
        emb_ds.select_columns(["vec_id", "embedding"])
        .map_batches(bucketize, batch_format="pyarrow")
        .map_batches(coarse, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(cand, batch_format="pyarrow")
        .groupby("key")
        .count()
        .select_columns(["key"])
    )
    values = emb_ds.map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("vec_id"), "embedding": b.column("embedding")}
        ),
        batch_format="pyarrow",
    )
    paired = _pair_attach(cands, values, {"embedding": embedding_type})

    def verify(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy(zero_copy_only=False)
        if len(key) == 0:
            return pa.table(
                {"id_a": pa.array([], type=pa.int64()),
                 "id_b": pa.array([], type=pa.int64()),
                 "cosine": pa.array([], type=pa.float64())}
            )
        ma = _normalize(_mat(batch, "embedding_a"))
        mb = _normalize(_mat(batch, "embedding_b"))
        sims = round_half_away(np.einsum("ij,ij->i", ma, mb), 6)
        keep = sims >= tau
        return pa.table(
            {
                "id_a": pa.array((unpack_hi(key))[keep]),
                "id_b": pa.array((key & np.int64(0xFFFFFFFF))[keep]),
                "cosine": pa.array(sims[keep]),
            }
        )

    from raylink.join import with_typed_empty

    return with_typed_empty(
        paired.map_batches(verify, batch_format="pyarrow"),
        {"id_a": pa.int64(), "id_b": pa.int64(), "cosine": pa.float64()},
    )


def centroid_similarity(emb_ds, decimals: int = 6):
    """Per-label centroid cosine matrix — the cluster-profile audit of a
    labeled embedding corpus (which classes/sources sit close in embedding
    space; the vector sibling of ``dedup.source_overlap``). -> Dataset
    (label_a, label_b, cosine) for every unordered label pair, rounded to
    ``decimals``.

    Shape: per-batch integer label codes + one ``np.add.at`` fold into a
    (labels x dim) partial-sum matrix, emitted as (label, dim, s) rows
    plus a dim=-1 count row per label — the shuffle carries
    O(labels x dim) rows per batch, never vectors; a bounded combine tree
    sums the partials; centroids, norms and the pairwise dot matrix are
    one O(labels^2 x dim) single-block computation at the end (labels are
    report-cardinality by definition). Float association vs the SQL
    mirror is absorbed by ROUND(.., decimals), the PageRank-family
    argument."""
    from raylink.join import tree_groupby_sum
    from raylink.util import round_half_away

    def partial(batch: pa.Table) -> pa.Table:
        m = _mat(batch)
        lab = batch.column("label").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        ul, inv = np.unique(lab, return_inverse=True)
        d = m.shape[1]
        sums = np.zeros((len(ul), d), dtype=np.float64)
        np.add.at(sums, inv, m)
        cnt = np.bincount(inv, minlength=len(ul)).astype(np.float64)
        lbl = np.concatenate([np.repeat(ul, d), ul])
        dim = np.concatenate(
            [np.tile(np.arange(d, dtype=np.int64), len(ul)),
             np.full(len(ul), -1, np.int64)]
        )
        s = np.concatenate([sums.ravel(), cnt])
        return pa.table(
            {"label": pa.array(lbl), "dim": pa.array(dim), "s": pa.array(s)}
        )

    agg = tree_groupby_sum(
        emb_ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"], ["s"],
    )

    def finish(b: pa.Table) -> pa.Table:
        lab = b.column("label").to_numpy(zero_copy_only=False)
        dim = b.column("dim").to_numpy(zero_copy_only=False)
        s = b.column("sum(s)").to_numpy(zero_copy_only=False)
        ul = np.unique(lab)
        li = np.searchsorted(ul, lab)
        d = int(dim.max()) + 1
        cent = np.zeros((len(ul), d), dtype=np.float64)
        cnt = np.zeros(len(ul), dtype=np.float64)
        cm = dim >= 0
        cent[li[cm], dim[cm]] = s[cm]
        cnt[li[~cm]] = s[~cm]
        cent = cent / cnt[:, None]
        nrm = np.sqrt(np.sum(cent * cent, axis=1))
        dots = cent @ cent.T
        ia, ib = np.triu_indices(len(ul), k=1)
        cos = dots[ia, ib] / (nrm[ia] * nrm[ib])
        return pa.table(
            {
                "label_a": pa.array(ul[ia]),
                "label_b": pa.array(ul[ib]),
                "cosine": pa.array(round_half_away(cos, decimals)),
            }
        )

    return agg.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


def _quantize(m: np.ndarray, scale: int) -> np.ndarray:
    """float64 matrix -> int64 fixed-point, rounding half away from zero
    (matches SQL CAST(round(v * scale) AS BIGINT))."""
    return np.copysign(np.floor(np.abs(m) * scale + 0.5), m).astype(np.int64)


def _int_round_div(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Exact integer round-half-away-from-zero of s/n (n > 0) — no float
    anywhere, so the SQL mirror ((2s+n)//(2n), sign-cased) is bit-equal."""
    pos = (2 * np.abs(s) + n) // (2 * n)
    return np.where(s >= 0, pos, -pos)


def kmeans_lloyd(emb_ds, k: int = 8, rounds: int = 3, scale: int = 10**6):
    """Distributed Lloyd k-means over an embedding corpus — the clustering
    stage of semantic curation (cluster-then-filter / SemDeDup-style
    pipelines): ``rounds`` centroid updates from k seed vectors, then the
    final hard assignment. -> Dataset (vec_id, cluster:int64).

    INTEGER-EXACT by construction (no float associativity anywhere, so the
    SQL oracle matches bit-for-bit): vectors quantize to int64 fixed-point
    (``scale``, round half away), distances are int64
    ``|x|^2 - 2x.c + |c|^2`` (exact: 64 dims x (2 scale)^2 ~ 1e15 << 2^63;
    numpy integer matmul, no BLAS float path), argmin ties go to the
    smallest cluster id (np.argmin first-hit == SQL ORDER BY d2, k), and
    the centroid update rounds s/n half-away in pure integer arithmetic
    (``(2s+n) // (2n)`` sign-cased). Empty clusters keep their previous
    centroid.

    Scale shape: centroids (k x dim int64) broadcast via ``ray.put`` once
    per round; each round is ONE streaming pass emitting k x (dim+1)
    int64 partial rows per batch (``np.add.at`` fold — the
    ``centroid_similarity`` pattern) through the bounded combine tree; the
    driver folds k x (dim+1) scalars per round, never rows. Seeds = the k
    smallest vec_ids (per-batch k-smallest pre-filter, then a k-row sort).
    """
    import ray

    cents = _lloyd_centroids(emb_ds, k, rounds, scale)
    cref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = _quantize(_mat(batch), scale)
        d2 = (
            (x * x).sum(axis=1, keepdims=True)
            - 2 * (x @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "cluster": pa.array(np.argmin(d2, axis=1).astype(np.int64)),
            }
        )

    return emb_ds.map_batches(assign, batch_format="pyarrow")


def _lloyd_centroids(
    emb_ds, k: int, rounds: int, scale: int
) -> np.ndarray:
    """The ``rounds`` Lloyd centroid updates of ``kmeans_lloyd`` (seed
    selection + per-round streaming integer partials); returns the final
    (k x dim) int64 centroid matrix."""
    import ray

    from raylink.join import tree_groupby_sum

    def seed_partial(batch: pa.Table) -> pa.Table:
        vid = batch.column("vec_id").to_numpy(zero_copy_only=False)
        keep = np.argsort(vid, kind="stable")[:k]
        m = _quantize(_mat(batch)[keep], scale)
        return pa.table(
            {
                "vec_id": pa.array(vid[keep]),
                "q": pa.array(list(m), type=pa.list_(pa.int64())),
            }
        )

    seeds = (
        emb_ds.map_batches(seed_partial, batch_format="pyarrow")
        .sort("vec_id")
        .limit(k)
        .to_pandas()
    )
    cents = np.stack([np.asarray(r, dtype=np.int64) for r in seeds["q"]])
    if len(cents) < k:
        raise ValueError(f"kmeans_lloyd: corpus has fewer than k={k} vectors")
    dim = cents.shape[1]

    def update_partial(cref):
        def fn(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            x = _quantize(_mat(batch), scale)
            d2 = (
                (x * x).sum(axis=1, keepdims=True)
                - 2 * (x @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            a = np.argmin(d2, axis=1)
            s = np.zeros((k, dim), dtype=np.int64)
            np.add.at(s, a, x)
            n = np.bincount(a, minlength=k).astype(np.int64)
            kk = np.concatenate([np.repeat(np.arange(k, dtype=np.int64), dim),
                                 np.arange(k, dtype=np.int64)])
            jj = np.concatenate(
                [np.tile(np.arange(dim, dtype=np.int64), k),
                 np.full(k, -1, np.int64)]
            )
            return pa.table(
                {"ck": pa.array(kk), "cj": pa.array(jj),
                 "cs": pa.array(np.concatenate([s.ravel(), n]))}
            )

        return fn

    for _ in range(rounds):
        cref = ray.put(cents)
        agg = tree_groupby_sum(
            emb_ds.map_batches(update_partial(cref), batch_format="pyarrow"),
            ["ck", "cj"], ["cs"],
        ).to_pandas()
        kk = agg["ck"].to_numpy(np.int64)
        jj = agg["cj"].to_numpy(np.int64)
        ss = agg["sum(cs)"].to_numpy(np.int64)
        n = np.zeros(k, dtype=np.int64)
        n[kk[jj == -1]] = ss[jj == -1]
        s = np.zeros((k, dim), dtype=np.int64)
        grid = jj >= 0
        s[kk[grid], jj[grid]] = ss[grid]
        nz = n > 0
        new = cents.copy()
        new[nz] = _int_round_div(s[nz], n[nz, None])
        cents = new

    return cents


def semantic_dedup(
    emb_ds,
    k: int = 8,
    rounds: int = 3,
    tau: int = 1_450_000_000_000,
    scale: int = 10**6,
):
    """SemDeDup-style semantic near-duplicate pruning (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding corpus, then inside
    each cluster drop every vector that has a SMALLER-vec_id neighbor
    within squared fixed-point L2 distance ``tau`` — the deterministic
    keep-first epsilon-ball rule. -> Dataset (vec_id, cluster) survivors.

    INTEGER-EXACT like ``kmeans_lloyd`` (same quantization and centroid
    arithmetic; the near-dup test ``sum((a-b)^2) < tau`` is int64), so the
    SQL oracle matches bit-for-bit — no cosine/float threshold boundary.

    Scale shape: the pairwise test runs per CLUSTER (one hash-bucketed
    groupby carrying (vec_id, cluster, qvec) rows — the only vector
    shuffle), so the quadratic term is O((N/k)^2 x k); SemDeDup's own
    contract: k must grow with the corpus (k ~ N/5000 in the paper) to
    keep clusters bounded. Ties/ordering are vec_id-deterministic,
    independent of partitioning.
    """
    import ray

    cents = _lloyd_centroids(emb_ds, k, rounds, scale)
    cref = ray.put(cents)

    def assign_q(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = _quantize(_mat(batch), scale)
        d2 = (
            (x * x).sum(axis=1, keepdims=True)
            - 2 * (x @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        return pa.table(
            {
                "cluster": pa.array(np.argmin(d2, axis=1).astype(np.int64)),
                "vec_id": batch.column("vec_id"),
                "q": pa.array(list(x), type=pa.list_(pa.int64())),
            }
        )

    def prune(group: pa.Table) -> pa.Table:
        vid = group.column("vec_id").to_numpy(zero_copy_only=False)
        flat = (
            group.column("q").combine_chunks().flatten()
            .to_numpy(zero_copy_only=False).astype(np.int64)
        )
        x = flat.reshape(len(vid), -1)
        order = np.argsort(vid, kind="stable")
        vid, x = vid[order], x[order]
        d2 = (
            (x * x).sum(axis=1, keepdims=True)
            - 2 * (x @ x.T)
            + (x * x).sum(axis=1)[None, :]
        )
        near = d2 < tau
        # drop row i iff any j<i (strictly smaller vec_id) is within tau
        drop = np.tril(near, k=-1).any(axis=1)
        keep = ~drop
        return pa.table(
            {
                "vec_id": pa.array(vid[keep]),
                "cluster": group.column("cluster").take(
                    pa.array(order[keep])
                ),
            }
        )

    return (
        emb_ds.map_batches(assign_q, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(prune, batch_format="pyarrow")
    )


def embedding_gram(emb_ds, scale: int = 10**6):
    """Exact int64 Gram matrix G = X^T X of the fixed-point-quantized
    embedding corpus -> Dataset (i, j, g), upper triangle (i <= j) — the
    covariance / PCA / whitening building block of an embedding-curation
    stack, computed as ONE streaming pass: each batch contributes a single
    d x d integer matmul partial (numpy int64 — no BLAS float path),
    folded through the bounded combine tree; d(d+1)/2 output rows.

    Integer-exact by the kmeans quantization contract
    (CAST(round(v * scale) AS BIGINT) == _quantize): no float
    associativity anywhere, SQL mirror matches bit-for-bit. int64
    exactness bound: N * (scale * max|v|)^2 < 2^63 — at scale=1e6 and
    |v| <= 2 that is ~2e6 rows; quantize coarser (smaller ``scale``) for
    bigger corpora (documented, the relational-layer int64-bound trade)."""
    from raylink.join import tree_groupby_sum

    def partial(batch: pa.Table) -> pa.Table:
        x = _quantize(_mat(batch), scale)
        if x.shape[0] == 0:
            return pa.table(
                {"i": pa.array([], type=pa.int64()),
                 "j": pa.array([], type=pa.int64()),
                 "v": pa.array([], type=pa.int64())}
            )
        g = x.T @ x
        iu, ju = np.triu_indices(g.shape[0])
        return pa.table(
            {"i": pa.array(iu.astype(np.int64)),
             "j": pa.array(ju.astype(np.int64)),
             "v": pa.array(g[iu, ju])}
        )

    agg = tree_groupby_sum(
        emb_ds.map_batches(partial, batch_format="pyarrow"), ["i", "j"], ["v"]
    )
    return agg.map_batches(
        lambda b: pa.table(
            {"i": b.column("i"), "j": b.column("j"), "g": b.column("sum(v)")}
        ),
        batch_format="pyarrow",
    )


PCA_SCALE = 10**6


def _tdiv_int(a: int, b: int) -> int:
    """Truncating integer division (DuckDB's ``//`` rounds toward zero;
    Python's floors — the mirror must match DuckDB on negatives)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def pca_topdir(emb_ds, scale: int = 10**6, rounds: int = 12,
               pscale: int = PCA_SCALE):
    """Top principal direction of the UNCENTERED quantized embedding
    corpus: integer power iteration on the exact int64 Gram matrix
    G = X^T X -> Dataset (d, v) with |v| <= pscale — every iteration is
    w = G v (Python bigints — |G v| exceeds int64, the SQL mirror goes
    through HUGEINT) followed by v = trunc(w * pscale / max|w|), so no
    float ever crosses the engine/oracle boundary and the direction is
    bit-reproducible (fixed v0 = 1, fixed round count — the
    eigenvector-centrality precedent applied to the d x d spectrum).

    Scale shape: the Gram is ONE streaming pass (``embedding_gram``); the
    iteration runs in a single task over the d(d+1)/2 gram rows (d is the
    embedding width — 64-4096 — never the corpus), so the expensive part
    stays distributed and the iterative part is O(d^2 * rounds) scalar
    work."""
    from raylink.ops.similarity import embedding_gram

    gram = embedding_gram(emb_ds, scale)

    def power(batch: pa.Table) -> pa.Table:
        ii = batch.column("i").to_numpy(zero_copy_only=False)
        jj = batch.column("j").to_numpy(zero_copy_only=False)
        gg = batch.column("g").to_numpy(zero_copy_only=False)
        d = int(max(ii.max(initial=-1), jj.max(initial=-1))) + 1
        if d == 0:
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "v": pa.array([], type=pa.int64())})
        G = [[0] * d for _ in range(d)]
        for a, b, g in zip(ii.tolist(), jj.tolist(), gg.tolist()):
            G[a][b] = g
            G[b][a] = g
        v = [1] * d
        for _ in range(rounds):
            w = [sum(Gr[c] * v[c] for c in range(d)) for Gr in G]
            m = max(max(abs(x) for x in w), 1)
            v = [_tdiv_int(x * pscale, m) for x in w]
        return pa.table(
            {"d": pa.array(np.arange(d, dtype=np.int64)),
             "v": pa.array(np.array(v, dtype=np.int64))}
        )

    return gram.repartition(1).map_batches(
        power, batch_format="pyarrow", batch_size=None
    )


def pca_project(emb_ds, scale: int = 10**6, rounds: int = 12,
                pscale: int = PCA_SCALE):
    """Project every embedding onto the corpus's top principal direction
    (``pca_topdir``) in exact integer arithmetic -> Dataset
    (vec_id, proj) with proj = sum_d x_q[d] * v[d] — the 1-D PCA reduce
    used for spectral ordering / duplicate-axis diagnostics.

    The direction is O(d) values pulled once to the driver and closed over
    by the projection map (the IVF-codebook bounded-broadcast contract:
    the pull is the embedding WIDTH, never corpus-sized). int64 bound:
    d * scale*max|x| * pscale < 2^63 — 3.4e13 at d=64, documented."""
    comp = pca_topdir(emb_ds, scale, rounds, pscale).to_pandas()
    v = comp.sort_values("d")["v"].to_numpy().astype(np.int64)

    def proj(batch: pa.Table) -> pa.Table:
        x = _quantize(_mat(batch), scale)
        p = x @ v if x.shape[0] else np.zeros(0, dtype=np.int64)
        return pa.table(
            {"vec_id": batch.column("vec_id"), "proj": pa.array(p)}
        )

    return emb_ds.map_batches(proj, batch_format="pyarrow")


def kmeans_inertia(emb_ds, k: int = 8, rounds: int = 3, scale: int = 10**6):
    """Per-cluster k-means quality report: (cluster, n, sse) where sse is
    the exact int64 sum of squared fixed-point distances from each member
    to its final Lloyd centroid — the elbow-curve / convergence audit of
    the clustering stage, with no float on the engine/oracle boundary
    (the ``kmeans_lloyd`` exactness contract; int64 bound:
    N_cluster * dim * (2 * scale * max|v|)^2 < 2^63, ~5e17 at the test
    shapes, documented like the Gram bound).

    Scale shape: centroids broadcast once (``ray.put``), ONE streaming
    assignment pass emitting <= k partial rows per batch, bounded combine
    tree. Nothing per-vector leaves the tasks."""
    import ray

    from raylink.join import tree_groupby_sum

    cents = _lloyd_centroids(emb_ds, k, rounds, scale)
    cref = ray.put(cents)

    def partial(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = _quantize(_mat(batch), scale)
        if x.shape[0] == 0:
            return pa.table({"cluster": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "sse": pa.array([], type=pa.int64())})
        d2 = (
            (x * x).sum(axis=1, keepdims=True)
            - 2 * (x @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        a = np.argmin(d2, axis=1)
        md = d2[np.arange(len(a)), a]
        n = np.bincount(a, minlength=k).astype(np.int64)
        s = np.zeros(k, dtype=np.int64)
        np.add.at(s, a, md)
        keep = np.nonzero(n > 0)[0]
        return pa.table(
            {
                "cluster": pa.array(keep.astype(np.int64)),
                "n": pa.array(n[keep]),
                "sse": pa.array(s[keep]),
            }
        )

    agg = tree_groupby_sum(
        emb_ds.map_batches(partial, batch_format="pyarrow"),
        ["cluster"], ["n", "sse"],
    )
    return agg.map_batches(
        lambda b: pa.table(
            {"cluster": b.column("cluster"), "n": b.column("sum(n)"),
             "sse": b.column("sum(sse)")}
        ),
        batch_format="pyarrow",
    )


def cluster_label_counts(emb_ds, k: int = 8, rounds: int = 3,
                         scale: int = 10**6):
    """Cluster x label contingency table: (cluster, label, n) counts of the
    final Lloyd assignment against the corpus's label column — the purity
    / external-evaluation audit of the clustering stage. Same broadcast +
    bounded-combine shape as ``kmeans_inertia`` (cells <= k * #labels)."""
    import ray

    from raylink.join import tree_groupby_sum

    cents = _lloyd_centroids(emb_ds, k, rounds, scale)
    cref = ray.put(cents)

    def partial(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = _quantize(_mat(batch), scale)
        if x.shape[0] == 0:
            return pa.table({"cluster": pa.array([], type=pa.int64()),
                             "label": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        d2 = (
            (x * x).sum(axis=1, keepdims=True)
            - 2 * (x @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        a = np.argmin(d2, axis=1).astype(np.int64)
        lab = batch.column("label").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        # pack (cluster, label) — labels are small category codes
        ul, inv = np.unique(lab, return_inverse=True)
        key = a * len(ul) + inv
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "cluster": pa.array(uk // len(ul)),
                "label": pa.array(ul[uk % len(ul)]),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    agg = tree_groupby_sum(
        emb_ds.map_batches(partial, batch_format="pyarrow"),
        ["cluster", "label"], ["n"],
    )
    return agg.map_batches(
        lambda b: pa.table(
            {"cluster": b.column("cluster"), "label": b.column("label"),
             "n": b.column("sum(n)")}
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------- r4 wave 14
def _quantize_int8(m: np.ndarray) -> np.ndarray:
    """Per-vector symmetric int8 scalar quantization: q = round-half-away
    (x / max|x| * 127), zero vectors stay zero. float64 in, int64 out (the
    values fit int8 — int64 keeps downstream dot products overflow-free).
    The SQL mirror is CAST(round(x / mx * 127) AS BIGINT) — identical IEEE
    op sequence."""
    mx = np.abs(m).max(axis=1, keepdims=True)
    safe = np.where(mx == 0, 1.0, mx)
    y = m / safe * 127.0
    return np.copysign(np.floor(np.abs(y) + 0.5), y).astype(np.int64)


def quantized_knn(emb_ds, query_ids: list[int], k: int = 5):
    """Brute-force kNN over int8-quantized vectors -> (query_id,
    neighbor_id, qcos r6, rank 1..k), self excluded.

    The 4x-memory / SIMD-int8 scale path for embedding search: each side
    quantizes to int8 (per-vector max-abs scale); similarity is the exact
    integer dot product normalized by the exact integer norms, qcos =
    idot / sqrt(|qa|^2) / sqrt(|qb|^2) — every intermediate is either an
    exact int64 or a fixed-order IEEE op, so the SQL mirror is bit-equal
    BEFORE the r6 round (unlike float-matmul cosine, which leans on the
    round). Same distributed shape as ``knn_brute``: broadcast quantized
    query matrix, per-batch local top-k, one bounded groupby merge."""
    import pyarrow.compute as pc
    import ray

    from raylink.util import round_half_away

    qlist = pa.array(sorted(int(q) for q in query_ids), type=pa.int64())
    q_pdf = emb_ds.map_batches(
        lambda b: b.filter(pc.is_in(b.column("vec_id"), value_set=qlist)),
        batch_format="pyarrow",
    ).to_pandas()
    q_ids = q_pdf["vec_id"].to_numpy(np.int64)
    qm = _quantize_int8(np.array(q_pdf["embedding"].tolist(), dtype=np.float64))
    qn = np.sqrt((qm * qm).sum(axis=1).astype(np.float64))  # exact ints
    ref = ray.put((q_ids, qm, qn))

    empty = pa.table(
        {"query_id": pa.array([], type=pa.int64()),
         "neighbor_id": pa.array([], type=pa.int64()),
         "qcos": pa.array([], type=pa.float64())}
    )

    def local_topk(batch: pa.Table) -> pa.Table:
        qi, qmat, qnrm = ray.get(ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return empty
        m = _quantize_int8(_mat(batch))
        nb = np.sqrt((m * m).sum(axis=1).astype(np.float64))
        nb[nb == 0] = 1.0
        qn_ = qnrm.copy()
        qn_[qn_ == 0] = 1.0
        idot = (qmat @ m.T).astype(np.float64)  # exact: |q||v| <= 127^2*dim
        sims = round_half_away(idot / qn_[:, None] / nb[None, :], 6)
        out_q, out_n, out_s = [], [], []
        for r, q in enumerate(qi):
            mask = ids != q
            s, nid = sims[r][mask], ids[mask]
            if len(s) == 0:
                continue
            take = min(len(s), k)
            order = np.lexsort((nid, -s))[:take]
            out_q.append(np.full(take, q, dtype=np.int64))
            out_n.append(nid[order])
            out_s.append(s[order])
        if not out_q:
            return empty
        return pa.table(
            {"query_id": pa.array(np.concatenate(out_q)),
             "neighbor_id": pa.array(np.concatenate(out_n)),
             "qcos": pa.array(np.concatenate(out_s))}
        )

    def final_topk(group: pa.Table) -> pa.Table:
        s = group.column("qcos").to_numpy(zero_copy_only=False)
        nid = group.column("neighbor_id").to_numpy(zero_copy_only=False)
        q = group.column("query_id")[0].as_py()
        order = np.lexsort((nid, -s))[:k]
        return pa.table(
            {"query_id": pa.array(np.full(len(order), q, dtype=np.int64)),
             "neighbor_id": pa.array(nid[order]),
             "qcos": pa.array(s[order]),
             "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64))}
        )

    return (
        emb_ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
    )


def knn_all(emb_ds, k: int = 3, num_blocks: int = 8):
    """EXACT k nearest neighbors for EVERY vector -> (vec_id, neighbor_id,
    cosine r6, rank 1..k) — the dataset-sized exact sibling of
    ``knn_brute`` (no broadcast query matrix) and of ``knn_join`` (no
    recall loss).

    Shape: the ``embedding_pairs`` block-pair replication — every
    unordered pair meets in exactly one of the K*(K+1)/2 pair groups —
    but instead of thresholding, each group emits each member's LOCAL
    top-k vs the group's other side; the global top-k per vector is a
    subset of the union of its local top-ks (each local list covers the
    candidates it saw exactly once), recovered by one groupby merge.
    Shuffle volume O(N * num_blocks * k) rows; compute O(N^2) because the
    result is exact — use ``knn_join`` for the subquadratic approximate
    path."""
    from raylink.util import round_half_away, splitmix64

    K = num_blocks

    def replicate(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        blk = (splitmix64(ids.astype(np.uint64)) % np.uint64(K)).astype(np.int64)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        out = []
        for j in range(K):
            lo = np.minimum(blk, j)
            hi = np.maximum(blk, j)
            out.append(
                pa.table(
                    {"pb": pa.array(lo * K + hi), "vec_id": pa.array(ids),
                     "embedding": emb}
                )
            )
        return pa.concat_tables(out)

    empty = pa.table(
        {"vec_id": pa.array([], type=pa.int64()),
         "neighbor_id": pa.array([], type=pa.int64()),
         "cosine": pa.array([], type=pa.float64())}
    )

    def _emit_topk(ids_q, ids_c, sims):
        """per-row local top-k of sims (rows = queries, cols = candidates);
        self-pairs masked to -inf by the caller. Fully vectorized (VERDICT
        r4 item 5): one argpartition over the 2-D sims matrix, ties broken
        by ascending neighbor id via an exact integer composite key — sims
        are already round_half_away(.., 6), so rint(s*1e6) is lossless and
        two distinct similarities always differ by >= 1 in key space."""
        nq, nc = sims.shape
        if nq == 0 or nc == 0:
            return None
        order_c = np.argsort(ids_c, kind="stable")
        nid = ids_c[order_c]
        s = sims[:, order_c]
        finite = np.isfinite(s)
        # masked (-inf self-pair) entries get a sentinel just BELOW the
        # finite range (cosines are r6-rounded, so finite s_int is within
        # +-1e6): they sort strictly last, and |s_int| * nc stays far from
        # int64 overflow (a huge sentinel like iinfo.min//4 WRAPS when
        # multiplied by nc and sorts masked entries arbitrarily — caught by
        # the sf0.01 oracle sweep)
        s_int = np.where(finite, np.rint(s * 1e6), -2e6).astype(np.int64)
        # composite: higher sim first, then smaller nid (== column position,
        # candidates pre-sorted by nid); pos < nc so keys never collide
        key = -s_int * np.int64(nc) + np.arange(nc, dtype=np.int64)
        take = min(nc, k)
        if take < nc:
            cols = np.argpartition(key, take - 1, axis=1)[:, :take]
            sub = np.take_along_axis(key, cols, axis=1)
            cols = np.take_along_axis(cols, np.argsort(sub, axis=1), axis=1)
        else:
            cols = np.argsort(key, axis=1, kind="stable")
        rows = np.repeat(np.arange(nq, dtype=np.int64), cols.shape[1])
        colsf = cols.ravel()
        keep = finite[rows, colsf]
        if not keep.any():
            return None
        rows, colsf = rows[keep], colsf[keep]
        return (ids_q[rows], nid[colsf], s[rows, colsf])

    def cross(group: pa.Table) -> pa.Table:
        pb = int(group.column("pb")[0].as_py())
        bi, bj = pb // K, pb % K
        ids = group.column("vec_id").to_numpy(zero_copy_only=False)
        uniq, first = np.unique(ids, return_index=True)
        g = group.take(pa.array(first))
        ids = uniq
        m = _normalize(_mat(g))
        blk = (splitmix64(ids.astype(np.uint64)) % np.uint64(K)).astype(np.int64)
        parts = []
        if bi == bj:
            sel = blk == bi
            ids_i, m_i = ids[sel], m[sel]
            if len(ids_i) >= 2:
                sims = round_half_away(m_i @ m_i.T, 6)
                np.fill_diagonal(sims, -np.inf)
                parts.append(_emit_topk(ids_i, ids_i, sims))
        else:
            sel_i, sel_j = blk == bi, blk == bj
            if sel_i.any() and sel_j.any():
                ids_i, ids_j = ids[sel_i], ids[sel_j]
                sims = round_half_away(m[sel_i] @ m[sel_j].T, 6)
                parts.append(_emit_topk(ids_i, ids_j, sims))
                parts.append(_emit_topk(ids_j, ids_i, sims.T))
        parts = [p for p in parts if p is not None]
        if not parts:
            return empty
        return pa.table(
            {"vec_id": pa.array(np.concatenate([p[0] for p in parts])),
             "neighbor_id": pa.array(np.concatenate([p[1] for p in parts])),
             "cosine": pa.array(np.concatenate([p[2] for p in parts]))}
        )

    def merge(group: pa.Table) -> pa.Table:
        s = group.column("cosine").to_numpy(zero_copy_only=False)
        nid = group.column("neighbor_id").to_numpy(zero_copy_only=False)
        v = group.column("vec_id")[0].as_py()
        order = np.lexsort((nid, -s))[:k]
        return pa.table(
            {"vec_id": pa.array(np.full(len(order), v, dtype=np.int64)),
             "neighbor_id": pa.array(nid[order]),
             "cosine": pa.array(s[order]),
             "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64))}
        )

    return (
        emb_ds.select_columns(["vec_id", "embedding"])
        .map_batches(replicate, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(cross, batch_format="pyarrow")
        .groupby("vec_id")
        .map_groups(merge, batch_format="pyarrow")
    )


def knn_outliers(emb_ds, k: int = 3, top_n: int = 20, num_blocks: int = 8):
    """Distance-to-kth-neighbor outlier scoring: the ``top_n`` vectors
    whose kth-nearest-neighbor cosine is LOWEST -> (vec_id, kth_cosine,
    rank 1..top_n) — the classic kNN outlier detector (Ramaswamy et al.),
    the curation signal for off-distribution documents.

    Shape: ``knn_all``'s exact per-vector kth neighbor, then a distributed
    sort + limit on (kth_cosine asc, vec_id). Vectors with fewer than k
    neighbors (tiny corpora) are skipped — their kth distance is
    undefined."""
    import pyarrow.compute as pc

    kth = knn_all(emb_ds, k=k, num_blocks=num_blocks).map_batches(
        lambda b: b.filter(pc.equal(b.column("rank"), k)).select(
            ["vec_id", "cosine"]
        ),
        batch_format="pyarrow",
    )
    top = kth.sort(["cosine", "vec_id"]).limit(top_n)

    def number(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"vec_id": batch.column("vec_id"),
             "kth_cosine": batch.column("cosine"),
             "rank": pa.array(np.arange(1, len(batch) + 1, dtype=np.int64))}
        )

    return top.repartition(1).map_batches(
        number, batch_format="pyarrow", batch_size=None
    )


def mmr_rerank(emb_ds, query_id: int = 0, n_candidates: int = 20,
               k: int = 5, lam: float = 0.7):
    """Maximal Marginal Relevance diversified top-k (Carbonell-Goldstein):
    from the query's ``n_candidates`` nearest vectors, greedily select
    ``k`` maximizing lam*cos(q,d) - (1-lam)*max cos(d, selected) ->
    (vec_id, mmr_score r6, sel_rank 1..k). First pick is pure relevance.

    Shape: candidate generation is the distributed ``knn_brute`` scan;
    the greedy runs on the driver over the n_candidates-row result — a
    BOUNDED pull by construction (n_candidates is a query parameter, never
    data-sized), the same contract as knn_brute's query set. All
    comparisons use r6-rounded cosines and (score desc, vec_id asc)
    tie-breaks, so the unrolled-greedy SQL mirror selects identically."""
    from raylink.util import round_half_away

    cand_ds = knn_brute(emb_ds, query_ids=[query_id], k=n_candidates)
    cand = cand_ds.to_pandas().sort_values("rank")
    cids = cand["neighbor_id"].to_numpy(np.int64)
    rel = cand["cosine"].to_numpy(np.float64)  # already r6

    import pyarrow.compute as pc
    import ray

    clist = pa.array(sorted(int(c) for c in cids), type=pa.int64())
    cm_pdf = emb_ds.map_batches(
        lambda b: b.filter(pc.is_in(b.column("vec_id"), value_set=clist)),
        batch_format="pyarrow",
    ).to_pandas()
    order = np.argsort(cm_pdf["vec_id"].to_numpy(np.int64))
    cvids = cm_pdf["vec_id"].to_numpy(np.int64)[order]
    cm = _normalize(
        np.array(cm_pdf["embedding"].tolist(), dtype=np.float64)[order]
    )
    pos = np.searchsorted(cvids, cids)
    pair = round_half_away(cm @ cm.T, 6)  # candidate x candidate cosines

    sel_ids, sel_scores = [], []
    remaining = np.arange(len(cids))
    sel_pos: list[int] = []
    for _ in range(min(k, len(cids))):
        if sel_pos:
            maxsim = pair[np.ix_(pos[remaining], pos[sel_pos])].max(axis=1)
        else:
            maxsim = np.zeros(len(remaining))
        score = round_half_away(lam * rel[remaining] - (1 - lam) * maxsim, 6)
        best = np.lexsort((cids[remaining], -score))[0]
        sel_ids.append(int(cids[remaining[best]]))
        sel_scores.append(float(score[best]))
        sel_pos.append(int(remaining[best]))
        remaining = np.delete(remaining, best)

    return pa.table(
        {"vec_id": pa.array(np.array(sel_ids, dtype=np.int64)),
         "mmr_score": pa.array(np.array(sel_scores, dtype=np.float64)),
         "sel_rank": pa.array(np.arange(1, len(sel_ids) + 1, dtype=np.int64))}
    )


def kcenter_select(emb_ds, k: int = 5, start_id: int = 0):
    """Greedy k-center / farthest-point coreset selection (Gonzalez 1985
    2-approximation — the diversity-sampling primitive for training-data
    subset selection): start from ``start_id``; each step adds the vector
    whose MAXIMUM cosine to the selected set is MINIMAL (i.e. the farthest
    point), ties by vec_id. -> pa.Table (vec_id, far_cos r6, sel_rank
    1..k); the first row carries far_cos = -2.0 (no selected set yet).

    Shape: each of the k-1 steps is one distributed scan (the <=k selected
    vectors broadcast via ray.put, per-batch vectorized max-cos) followed
    by a distributed sort + limit(1) — only the single winning row reaches
    the driver per step. k is a query parameter, never data-sized."""
    import pyarrow.compute as pc
    import ray

    from raylink.util import round_half_away

    def fetch_vec(vid: int) -> np.ndarray:
        one = emb_ds.map_batches(
            lambda b: b.filter(pc.equal(b.column("vec_id"), vid)),
            batch_format="pyarrow",
        ).take(1)
        return _normalize(
            np.asarray(one[0]["embedding"], dtype=np.float64)[None, :]
        )[0]

    sel_ids = [int(start_id)]
    sel_far = [-2.0]
    sel_mat = [fetch_vec(start_id)]

    for _ in range(k - 1):
        ref = ray.put((np.array(sel_ids, dtype=np.int64),
                       np.stack(sel_mat)))

        def maxcos(batch: pa.Table) -> pa.Table:
            ids_s, mat = ray.get(ref)
            ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                return pa.table({"vec_id": pa.array([], type=pa.int64()),
                                 "mc": pa.array([], type=pa.float64())})
            m = _normalize(_mat(batch))
            sims = round_half_away(m @ mat.T, 6)  # r6 per pair, THEN max
            mc = sims.max(axis=1)
            keep = ~np.isin(ids, ids_s)
            return pa.table({"vec_id": pa.array(ids[keep]),
                             "mc": pa.array(mc[keep])})

        win = (
            emb_ds.select_columns(["vec_id", "embedding"])
            .map_batches(maxcos, batch_format="pyarrow")
            .sort(["mc", "vec_id"])
            .limit(1)
            .take(1)
        )
        if not win:
            break
        vid = int(win[0]["vec_id"])
        sel_ids.append(vid)
        sel_far.append(float(win[0]["mc"]))
        sel_mat.append(fetch_vec(vid))

    return pa.table(
        {"vec_id": pa.array(np.array(sel_ids, dtype=np.int64)),
         "far_cos": pa.array(np.array(sel_far, dtype=np.float64)),
         "sel_rank": pa.array(np.arange(1, len(sel_ids) + 1,
                                        dtype=np.int64))}
    )
