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

from raylink.util import round_half_away


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
    import ray

    qset = set(int(q) for q in query_ids)
    q_pdf = emb_ds.map_batches(
        lambda b: b.filter(
            pa.array([int(v) in qset for v in b.column("vec_id").to_pylist()])
        ),
        batch_format="pyarrow",
    ).to_pandas()
    q_ids = q_pdf["vec_id"].to_numpy(np.int64)
    qm = _normalize(np.array(q_pdf["embedding"].tolist(), dtype=np.float64))
    ref = ray.put((q_ids, qm))

    def local_topk(batch: pa.Table) -> pa.Table:
        qi, qmat = ray.get(ref)
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
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
    import ray

    qset = set(int(q) for q in query_ids)
    q_pdf = emb_ds.map_batches(
        lambda b: b.filter(
            pa.array([int(v) in qset for v in b.column("vec_id").to_pylist()])
        ),
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


def embedding_pairs(emb_ds, tau: float = 0.9):
    """All pairs with cosine >= tau -> (id_a, id_b, cosine r6), a < b."""
    import ray

    full = emb_ds.select_columns(["vec_id", "embedding"]).to_pandas()
    ids = full["vec_id"].to_numpy(np.int64)
    m = _normalize(np.array(full["embedding"].tolist(), dtype=np.float64))
    order = np.argsort(ids)
    ref = ray.put((ids[order], m[order]))

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_m = ray.get(ref)
        bids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        bm = _normalize(_mat(batch))
        sims = round_half_away(bm @ all_m.T, 6)
        keep = (sims >= tau) & (bids[:, None] < all_ids[None, :])
        ii, jj = np.nonzero(keep)
        return pa.table(
            {
                "id_a": pa.array(bids[ii]),
                "id_b": pa.array(all_ids[jj]),
                "cosine": pa.array(sims[ii, jj]),
            }
        )

    return emb_ds.map_batches(pairs, batch_format="pyarrow")
