"""Single-source shortest path (hop distance).

The reference runs a full Dijkstra/A* inside each subgraph per superstep from
the roots that improved, then exchanges boundary improvements
(sample-hama/.../SingleSourceShortestPath.java:407-537, packAndSendMessages
:350-376), halting when no update happens anywhere. Same structure here:

- per superstep, each partition runs a level-synchronous vectorized BFS over
  its local CSR from the vertices whose distance improved (init: the source);
- relaxations of remote destinations become min-combined messages
  ``(dst_part, dst, dist)``;
- halt when no messages are in flight (default halt rule).

Edge weight is fixed 1 (reference default when no edge value,
SingleSourceShortestPath.java:476-478); distances are int64 hops,
unreachable = 2**62 (mapped to -1 in ``sssp``'s result).
Run on the undirected closure (directed also supported via the graph).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.graph import LinkGraph, build_graph
from raylink.superstep import Algorithm, run_bsp
from raylink.superstep_tasks import run_bsp_tasks
from raylink.util import PARTITIONERS

INF = np.int64(2**62)


class SSSP(Algorithm):
    name = "sssp"
    msg_fields = [("dist", pa.int64())]

    def init(self, shard: dict, ctx: dict) -> dict:
        dist = np.full(len(shard["vids"]), INF, dtype=np.int64)
        pos = np.searchsorted(shard["vids"], ctx["source"])
        if pos < len(shard["vids"]) and shard["vids"][pos] == ctx["source"]:
            dist[pos] = 0
        return {"dist": dist}

    def step(self, s: int, shard: dict, state: dict, msgs: pa.Table, ctx: dict):
        vids, indptr, indices = shard["vids"], shard["indptr"], shard["indices"]
        dist = np.asarray(state["dist"], dtype=np.int64).copy()
        improved = np.zeros(len(vids), dtype=bool)
        if s == 0:
            improved = dist == 0
        elif msgs.num_rows:
            d = msgs.column("dst").to_numpy(zero_copy_only=False)
            cand = msgs.column("dist").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(vids, d)
            before = dist[pos].copy()
            np.minimum.at(dist, pos, cand)
            improved[pos[dist[pos] < before]] = True
        # local level-synchronous BFS from improved roots; collect remote
        # relaxations (the reference's in-subgraph Dijkstra, vectorized)
        remote_dst: list[np.ndarray] = []
        remote_dist: list[np.ndarray] = []
        frontier = np.flatnonzero(improved)
        deg = np.diff(indptr)
        while len(frontier):
            starts, degs = indptr[frontier], deg[frontier]
            idx = np.repeat(starts, degs) + (
                np.arange(degs.sum()) - np.repeat(np.cumsum(degs) - degs, degs)
            )
            nbr = indices[idx]
            nd = np.repeat(dist[frontier], degs) + 1
            pos = np.searchsorted(vids, nbr)
            owned = (pos < len(vids)) & (vids[np.minimum(pos, len(vids) - 1)] == nbr)
            if np.any(~owned):
                remote_dst.append(nbr[~owned])
                remote_dist.append(nd[~owned])
            lp, ld = pos[owned], nd[owned]
            before = dist[lp].copy()
            np.minimum.at(dist, lp, ld)
            upd = np.unique(lp[dist[lp] < before])
            frontier = upd
        out = None
        n_active = 0
        if remote_dst:
            rd_ = np.concatenate(remote_dst)
            rv = np.concatenate(remote_dist)
            dsts, inv = np.unique(rd_, return_inverse=True)
            mins = np.full(len(dsts), INF, dtype=np.int64)
            np.minimum.at(mins, inv, rv)
            partfn = PARTITIONERS[ctx["partitioner"]]
            out = self.make_msgs(partfn(dsts, ctx["num_parts"]), dsts, dist=mins)
            n_active = len(dsts)
        return {"dist": dist}, out, n_active, 0.0


def sssp(
    edges_ds=None,
    g: LinkGraph | None = None,
    vertices_ds=None,
    source: int = 0,
    num_parts: int = 16,
    partitioner: str = "hash",
    directed: bool = False,
    max_supersteps: int = 500,
    ckpt_dir: str | None = None,
    resume: bool = True,
    ckpt_every: int = 1,
    engine: str = "dataset",
):
    """Returns (BSPResult, Dataset (vid, dist)) with dist=-1 if unreachable."""
    if g is None:
        g = build_graph(
            edges_ds, vertices_ds, num_parts=num_parts, partitioner=partitioner,
            directed=directed,
        )
    ctx = {"source": int(source), "partitioner": g.partitioner, "num_parts": g.num_parts, "ckpt_every": ckpt_every}
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(
        g, SSSP(), ctx, max_supersteps=max_supersteps, ckpt_dir=ckpt_dir, resume=resume
    )

    def finish(batch: pa.Table) -> pa.Table:
        d = batch.column("dist").to_numpy(zero_copy_only=False).copy()
        d[d >= INF] = -1
        return pa.table({"vid": batch.column("vid"), "dist": pa.array(d)})

    dists = res.state_dataset().map_batches(finish, batch_format="pyarrow")
    return res, dists
