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
from raylink.util import route_parts

INF = np.int64(2**62)


class SSSP(Algorithm):
    name = "sssp"
    msg_fields = [("dist", pa.int64())]

    def init(self, shard: dict, ctx: dict) -> dict:
        if ctx.get("weighted"):
            dist = np.full(len(shard["vids"]), np.inf, dtype=np.float64)
        else:
            dist = np.full(len(shard["vids"]), INF, dtype=np.int64)
        pos = np.searchsorted(shard["vids"], ctx["source"])
        if pos < len(shard["vids"]) and shard["vids"][pos] == ctx["source"]:
            dist[pos] = 0
        return {"dist": dist}

    def step(self, s: int, shard: dict, state: dict, msgs: pa.Table, ctx: dict):
        if ctx.get("weighted"):
            return self._step_weighted(s, shard, state, msgs, ctx)
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
            if degs.sum() == 0:  # frontier of isolated/sink-only vertices
                break
            idx = np.repeat(starts, degs) + (
                np.arange(degs.sum()) - np.repeat(np.cumsum(degs) - degs, degs)
            )
            nbr = indices[idx]
            nd = np.repeat(dist[frontier], degs) + 1
            from raylink.graph import edge_localization

            edge_pos, edge_owned = edge_localization(shard)
            pos, owned = edge_pos[idx], edge_owned[idx]
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
            out = self.make_msgs(route_parts(shard, ctx, dsts), dsts, dist=mins)
            n_active = len(dsts)
        return {"dist": dist}, out, n_active, 0.0

    def _step_weighted(self, s: int, shard: dict, state: dict, msgs: pa.Table, ctx: dict):
        """Per-partition weighted Dijkstra from improved roots — the
        reference's in-subgraph aStar with edge-value weights
        (SingleSourceShortestPath.java:407-537,476-478).

        The owned/remote resolution of every CSR edge target is localized
        ONCE per shard (cached on the shard dict, which is itself cached per
        worker) — the Dijkstra inner loop then does plain array indexing
        instead of a searchsorted per relaxed edge."""
        import heapq

        vids, indptr, indices = shard["vids"], shard["indptr"], shard["indices"]
        weights = shard.get("weights")
        if weights is None:
            weights = np.ones(len(indices), dtype=np.float64)
        from raylink.graph import edge_localization

        edge_pos, edge_owned = edge_localization(shard)
        dist = np.asarray(state["dist"], dtype=np.float64).copy()
        roots: list[int] = []
        if s == 0:
            roots = list(np.flatnonzero(dist == 0.0))
        elif msgs.num_rows:
            d = msgs.column("dst").to_numpy(zero_copy_only=False)
            cand = msgs.column("dist").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(vids, d)
            for i in range(len(pos)):
                if cand[i] < dist[pos[i]]:
                    dist[pos[i]] = cand[i]
                    roots.append(int(pos[i]))
        remote: dict[int, float] = {}
        heap = [(float(dist[r]), int(r)) for r in set(roots)]
        heapq.heapify(heap)
        while heap:
            du, u = heapq.heappop(heap)
            if du > dist[u]:
                continue
            for e in range(indptr[u], indptr[u + 1]):
                nd = du + float(weights[e])
                if edge_owned[e]:
                    pos = edge_pos[e]
                    if nd < dist[pos]:
                        dist[pos] = nd
                        heapq.heappush(heap, (nd, int(pos)))
                else:
                    v_g = int(indices[e])
                    if nd < remote.get(v_g, np.inf):
                        remote[v_g] = nd
        out = None
        if remote:
            dsts = np.array(sorted(remote), dtype=np.int64)
            mins = np.array([remote[int(x)] for x in dsts], dtype=np.float64)
            out = self.make_msgs(route_parts(shard, ctx, dsts), dsts, dist=mins)
        return {"dist": dist}, out, len(remote), 0.0


class WeightedSSSP(SSSP):
    name = "sssp_weighted"
    msg_fields = [("dist", pa.float64())]


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
    weighted: bool = False,
):
    """Returns (BSPResult, Dataset (vid, dist)); dist=-1 if unreachable.
    ``weighted=True`` uses the edge ``weight`` column (default 1.0 per edge,
    reference SingleSourceShortestPath.java:476-478) and float distances."""
    if g is None:
        g = build_graph(
            edges_ds, vertices_ds, num_parts=num_parts, partitioner=partitioner,
            directed=directed, weighted=weighted,
        )
    ctx = {"source": int(source), "partitioner": g.partitioner,
           "num_parts": g.num_parts, "ckpt_every": ckpt_every,
           "weighted": bool(weighted)}
    algo = WeightedSSSP() if weighted else SSSP()
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(
        g, algo, ctx, max_supersteps=max_supersteps, ckpt_dir=ckpt_dir, resume=resume
    )

    if weighted:

        def finish(batch: pa.Table) -> pa.Table:
            d = batch.column("dist").to_numpy(zero_copy_only=False).copy()
            d[~np.isfinite(d)] = -1.0
            return pa.table({"vid": batch.column("vid"), "dist": pa.array(d)})

    else:

        def finish(batch: pa.Table) -> pa.Table:
            d = batch.column("dist").to_numpy(zero_copy_only=False).copy()
            d[d >= INF] = -1
            return pa.table({"vid": batch.column("vid"), "dist": pa.array(d)})

    dists = res.state_dataset().map_batches(finish, batch_format="pyarrow")
    return res, dists
