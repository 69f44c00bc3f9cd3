"""SubgraphRank — block PageRank with a subgraph-local warm start.

Mirrors sample-hama/.../SubgraphRank.java:16-192: converge PageRank *locally*
inside each subgraph first (local N = |SG|, loose epsilon, :90-142), scale by
|SG|/|G| (:54-61), then continue with the ordinary global iterations
(:144-186). Reaches the same fixpoint as plain PageRank (same global update
operator) in fewer global supersteps; NOT bit-compatible with plain PageRank
mid-stream (documented in SURVEY.md §2.4 — keep separate).
"""

from __future__ import annotations

import numpy as np

from raylink.algos.pagerank import PageRank
from raylink.graph import LinkGraph, build_graph
from raylink.superstep import run_bsp
from raylink.superstep_tasks import run_bsp_tasks


class SubgraphRank(PageRank):
    name = "subgraphrank"

    def init(self, shard: dict, ctx: dict) -> dict:
        vids, indptr, indices = shard["vids"], shard["indptr"], shard["indices"]
        n_local = len(vids)
        N = ctx["n_vertices"]
        alpha = ctx.get("alpha", 0.85)
        # partition-local (within-subgraph) edge view
        pos = np.searchsorted(vids, indices)
        owned = (pos < n_local) & (vids[np.minimum(pos, n_local - 1)] == indices)
        lsrc = np.repeat(np.arange(n_local), np.diff(indptr))[owned]
        ldst = pos[owned]
        local_outdeg = np.bincount(lsrc, minlength=n_local).astype(np.float64)
        # per-vertex subgraph size |SG|
        sg_sizes = np.bincount(
            np.searchsorted(np.unique(shard["sgid"]), shard["sgid"])
        ).astype(np.float64)
        sg_of = np.searchsorted(np.unique(shard["sgid"]), shard["sgid"])
        nsg = sg_sizes[sg_of]
        rank = 1.0 / nsg
        # local power iteration to loose convergence (reference eps 0.05)
        for _ in range(ctx.get("local_iters", 20)):
            contrib = np.zeros(n_local)
            w = np.divide(rank, local_outdeg, out=np.zeros(n_local), where=local_outdeg > 0)
            np.add.at(contrib, ldst, w[lsrc])
            new = alpha * contrib + (1 - alpha) / nsg
            delta = np.abs(new - rank).max() if n_local else 0.0
            rank = new
            if delta <= ctx.get("local_eps", 0.05) / max(nsg.max(), 1):
                break
        # scale by |SG|/|G| (SubgraphRank.java:54-61)
        return {"rank": rank * nsg / N}


def subgraph_rank(
    edges_ds=None,
    g: LinkGraph | None = None,
    vertices_ds=None,
    num_parts: int = 16,
    partitioner: str = "hash",
    alpha: float = 0.85,
    eps: float = 1e-6,
    max_supersteps: int = 500,
    ckpt_dir: str | None = None,
    resume: bool = True,
    ckpt_every: int = 1,
    engine: str = "dataset",
):
    """Returns (BSPResult, ranks Dataset (vid, rank))."""
    if g is None:
        g = build_graph(
            edges_ds, vertices_ds, num_parts=num_parts, partitioner=partitioner,
            directed=True,
        )
    ctx = {
        "alpha": alpha, "eps": eps, "iters": None, "ckpt_every": ckpt_every,
        "partitioner": g.partitioner, "num_parts": g.num_parts,
    }
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(g, SubgraphRank(), ctx, max_supersteps=max_supersteps,
               ckpt_dir=ckpt_dir, resume=resume)
    ranks = res.state_dataset().select_columns(["vid", "rank"])
    return res, ranks
