"""Eigenvector centrality via distributed power iteration.

The reference library stops at PageRank-family scores (sample-hama/.../
PageRank.java); eigenvector centrality (Bonacich 1972, public) is the
teleport-free sibling a link-analysis stack wants next to PageRank / Katz /
HITS: per iteration

    x(v) = sum_{u -> v} x(u)    then L1-normalize x

i.e. the power iteration for the dominant left eigenvector of the adjacency
matrix. Vertices with no incoming paths from the graph's recurrent core decay
to 0 — the standard (and intended) behavior of the undamped fixpoint.

Execution reuses the HITS normalization pattern (algos/hits.py): every
superstep pushes the just-computed UNNORMALIZED scores along out-edges
(pre-summed per destination) together with one L1-partial broadcast row per
partition; receivers divide the accumulated in-sum by the summed partials one
superstep later, so no superstep materializes a global vector anywhere and
one iteration costs ONE superstep. Two trailing supersteps (partial-only
push, then normalize-only) make the RETURNED vector exactly L1-normalized.

Determinism: messages are sorted by (kind, dst, val) before reduction, so
results are bit-identical across runs, resumes and parallelism levels; the
SQL oracle differs only by float summation order (absorbed by ROUND(.., 8),
same argument as pagerank_sql / hits).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.graph import LinkGraph, build_graph
from raylink.superstep import Algorithm, run_bsp, sort_msgs
from raylink.superstep_tasks import run_bsp_tasks
from raylink.util import route_parts

_CONTRIB = 0
_NORM = 1


class EigenvectorPower(Algorithm):
    """ctx: iters (K), n_vertices, num_parts, partitioner.

    Supersteps 0..K+1: s=0 pushes x0 = 1/N; s in 1..K-1 computes
    x_s = (A^T x_{s-1}) / ||x_{s-1}||_1 and pushes it; s=K computes x_K the
    same way and pushes ONLY its L1 partial; s=K+1 divides by ||x_K||_1 so
    the final state is exactly unit-L1."""

    name = "eigenvector"
    msg_fields = [("val", pa.float64()), ("kind", pa.int8())]

    def init(self, shard: dict, ctx: dict) -> dict:
        n_local = len(shard["vids"])
        return {"x": np.full(n_local, 1.0 / ctx["n_vertices"], dtype=np.float64)}

    def _partials(self, ctx: dict, x: np.ndarray) -> pa.Table:
        pp = np.arange(ctx["num_parts"], dtype=np.int32)
        return self.make_msgs(
            pp, np.zeros(len(pp), np.int64),
            val=np.full(len(pp), float(np.sum(x))),
            kind=np.full(len(pp), _NORM, np.int8),
        )

    def _emit(self, shard: dict, ctx: dict, x: np.ndarray) -> pa.Table:
        indptr, indices = shard["indptr"], shard["indices"]
        deg = np.diff(indptr)
        tables = []
        if len(indices):
            contrib = np.repeat(x, deg)
            dsts, inv = np.unique(indices, return_inverse=True)
            sums = np.zeros(len(dsts), dtype=np.float64)
            np.add.at(sums, inv, contrib)
            tables.append(
                self.make_msgs(
                    route_parts(shard, ctx, dsts), dsts,
                    val=sums, kind=np.zeros(len(dsts), np.int8),
                )
            )
        tables.append(self._partials(ctx, x))
        return pa.concat_tables(tables)

    def step(self, s: int, shard: dict, state: dict, msgs: pa.Table, ctx: dict):
        vids = shard["vids"]
        n_local = len(vids)
        K = int(ctx["iters"])
        x = np.asarray(state["x"], dtype=np.float64)

        if s == 0:
            return {"x": x}, self._emit(shard, ctx, x), n_local, 1.0

        msgs = sort_msgs(msgs, ["kind", "dst", "val"])
        kind = msgs.column("kind").to_numpy(zero_copy_only=False)
        vals = msgs.column("val").to_numpy(zero_copy_only=False)
        dsts = msgs.column("dst").to_numpy(zero_copy_only=False)
        norm = float(np.sum(vals[kind == _NORM])) if np.any(kind == _NORM) else 0.0

        if s == K + 1:  # final normalize-only superstep
            x = x / norm if norm > 0.0 else np.zeros_like(x)
            return {"x": x}, None, 0, 0.0

        insum = np.zeros(n_local, dtype=np.float64)
        cm = kind == _CONTRIB
        if np.any(cm):
            pos = np.searchsorted(vids, dsts[cm])
            np.add.at(insum, pos, vals[cm])
        new_x = insum / norm if norm > 0.0 else np.zeros_like(insum)
        delta = float(np.max(np.abs(new_x - x))) if n_local else 0.0
        x = new_x
        out = self._partials(ctx, x) if s == K else self._emit(shard, ctx, x)
        return {"x": x}, out, n_local, delta

    def halted(self, agg: dict, s: int, ctx: dict) -> bool:
        return s >= int(ctx["iters"]) + 1


def eigenvector_centrality(
    edges_ds=None,
    g: LinkGraph | None = None,
    vertices_ds=None,
    iters: int = 8,
    num_parts: int = 16,
    partitioner: str = "hash",
    max_supersteps: int = 500,
    ckpt_dir: str | None = None,
    resume: bool = True,
    ckpt_every: int = 1,
    engine: str = "dataset",
):
    """Run ``iters`` power iterations; returns (BSPResult, Dataset of
    (vid, x)) with x exactly L1-normalized (all-zero when the graph has no
    edges feeding the recurrent core)."""
    if g is None:
        g = build_graph(
            edges_ds, vertices_ds, num_parts=num_parts,
            partitioner=partitioner, directed=True,
        )
    ctx = {
        "iters": int(iters),
        "ckpt_every": ckpt_every,
        "partitioner": g.partitioner,
        "num_parts": g.num_parts,
    }
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(
        g, EigenvectorPower(), ctx, max_supersteps=max_supersteps,
        ckpt_dir=ckpt_dir, resume=resume,
    )
    return res, res.state_dataset().select_columns(["vid", "x"])
