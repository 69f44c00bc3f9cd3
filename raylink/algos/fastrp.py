"""FastRP graph embeddings (Chen, Sui, Ding, Skiena — CIKM 2019, public).

Node embeddings as weighted powers of the transition matrix applied to a
very sparse random projection:

    x_0 = R                 (n x d sparse sign projection, Achlioptas-style)
    x_k = P x_{k-1}         (P = push along out-edges, divided by outdeg —
                             i.e. x_k(v) = sum_{u -> v} x_{k-1}(u)/outdeg(u))
    emb = sum_k w_k x_k     (k = 1..iters; the raw projection is excluded)

Linear end-to-end, so the whole embedding runs as ONE BSP job with the
d-column message pattern of MultiSeedPPR (pagerank.MultiSeedPPR): every
shuffle carries d pre-combined columns per destination, d dimensions cost
one job. The projection is DETERMINISTIC — R(v, j) from
splitmix64(v*d + j) % 6 (0 -> +1, 1 -> -1, else 0; the Achlioptas 1/6,
1/6, 2/3 sparse distribution with the sqrt(3) scale absorbed into the
weights) — so there is no RNG state, replay/resume are exact, and the SQL
oracle mirrors the projection bit-for-bit. Float association differs
between engine and SQL by summation order only (absorbed by ROUND(.., 8),
the PageRank-family argument; messages sort before accumulation).

Reference analog: none (the reference has no embedding ops); this is the
embedding-table complement of walks.walk_corpus (which exports a skip-gram
training corpus — FastRP produces the vectors directly).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.graph import LinkGraph, build_graph
from raylink.superstep import Algorithm, run_bsp, sort_msgs
from raylink.superstep_tasks import run_bsp_tasks
from raylink.util import route_parts, splitmix64

DEFAULT_WEIGHTS = (0.25, 0.5, 1.0)  # deeper structure weighted up


def projection(vids: np.ndarray, dims: int) -> np.ndarray:
    """Deterministic sparse sign projection R[v, j] in {+1, -1, 0} from
    splitmix64(v*dims + j) % 6 (0 -> +1, 1 -> -1, else 0)."""
    key = vids[:, None].astype(np.uint64) * np.uint64(dims) + np.arange(
        dims, dtype=np.uint64
    )[None, :]
    u = splitmix64(key.ravel()) % np.uint64(6)
    r = np.zeros(len(vids) * dims, dtype=np.float64)
    r[u == 0] = 1.0
    r[u == 1] = -1.0
    return r.reshape(len(vids), dims)


class FastRP(Algorithm):
    """ctx: dims, iters, weights (len == iters), num_parts, partitioner."""

    name = "fastrp"

    def __init__(self, dims: int) -> None:
        self.d = dims
        self.msg_fields = [(f"x{i}", pa.float64()) for i in range(dims)]

    def _mat(self, cols, n: int) -> np.ndarray:
        m = np.empty((n, self.d), dtype=np.float64)
        for i in range(self.d):
            m[:, i] = np.asarray(cols[f"x{i}"], dtype=np.float64)
        return m

    def init(self, shard: dict, ctx: dict) -> dict:
        r = projection(shard["vids"], self.d)
        state = {f"x{i}": r[:, i].copy() for i in range(self.d)}
        state.update(
            {f"e{i}": np.zeros(len(shard["vids"])) for i in range(self.d)}
        )
        return state

    def step(self, s: int, shard: dict, state: dict, msgs: pa.Table, ctx: dict):
        vids, indptr, indices = shard["vids"], shard["indptr"], shard["indices"]
        n = len(vids)
        w = ctx["weights"]
        cur = self._mat(state, n)
        emb = self._mat(
            {f"x{i}": state[f"e{i}"] for i in range(self.d)}, n
        )
        if s > 0:
            msgs = sort_msgs(msgs, ["dst"] + [f"x{i}" for i in range(self.d)])
            cur = np.zeros((n, self.d), dtype=np.float64)
            if msgs.num_rows:
                pos = np.searchsorted(
                    vids, msgs.column("dst").to_numpy(zero_copy_only=False)
                )
                np.add.at(
                    cur, pos, self._mat(
                        {f"x{i}": msgs.column(f"x{i}").to_numpy(
                            zero_copy_only=False)
                         for i in range(self.d)},
                        msgs.num_rows,
                    ),
                )
            emb = emb + w[s - 1] * cur
        out = None
        if s < ctx["iters"]:
            deg = np.diff(indptr)
            has_out = deg > 0
            if np.any(has_out):
                contrib = np.repeat(
                    np.where(
                        has_out[:, None],
                        cur / np.maximum(deg, 1)[:, None],
                        0.0,
                    ),
                    deg, axis=0,
                )
                dsts, inv = np.unique(indices, return_inverse=True)
                sums = np.zeros((len(dsts), self.d), dtype=np.float64)
                np.add.at(sums, inv, contrib)
                out = self.make_msgs(
                    route_parts(shard, ctx, dsts), dsts,
                    **{f"x{i}": sums[:, i] for i in range(self.d)},
                )
        new = {f"x{i}": cur[:, i].copy() for i in range(self.d)}
        new.update({f"e{i}": emb[:, i].copy() for i in range(self.d)})
        return new, out, n, 0.0

    def halted(self, agg: dict, s: int, ctx: dict) -> bool:
        return s >= ctx["iters"]


def fastrp(
    edges_ds=None,
    g: LinkGraph | None = None,
    vertices_ds=None,
    dims: int = 8,
    iters: int = 3,
    weights=DEFAULT_WEIGHTS,
    num_parts: int = 8,
    partitioner: str = "hash",
    ckpt_dir: str | None = None,
    engine: str = "tasks",
):
    """Run FastRP; returns (BSPResult, Dataset (vid, dim, emb)) — one row
    per (vertex, dimension), ``emb`` rounded to 8 decimals (the
    cross-engine float-association absorption shared with the
    PageRank-family oracles)."""
    from raylink.util import round_half_away

    weights = tuple(float(x) for x in weights)
    if len(weights) != iters:
        raise ValueError(f"fastrp: need {iters} weights, got {len(weights)}")
    if g is None:
        g = build_graph(edges_ds, vertices_ds, num_parts=num_parts,
                        partitioner=partitioner, directed=True)
    ctx = {
        "dims": int(dims),
        "iters": int(iters),
        "weights": weights,
        "num_parts": g.num_parts,
        "partitioner": g.partitioner,
    }
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(g, FastRP(int(dims)), ctx, max_supersteps=iters + 1,
               ckpt_dir=ckpt_dir)

    def rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        vid = b.column("vid").to_numpy(zero_copy_only=False)
        e = np.empty((n, dims), dtype=np.float64)
        for i in range(dims):
            e[:, i] = b.column(f"e{i}").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": pa.array(np.repeat(vid, dims)),
                "dim": pa.array(
                    np.tile(np.arange(dims, dtype=np.int64), n)
                ),
                "emb": pa.array(round_half_away(e.ravel(), 8)),
            }
        )

    return res, res.state_dataset().map_batches(rows, batch_format="pyarrow")
