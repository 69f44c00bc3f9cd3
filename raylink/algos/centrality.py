"""Seed-sampled harmonic centrality — k BFS trees in ONE BSP job.

Exact closeness/harmonic centrality needs all-pairs distances (O(V) BFS
trees — not a 10^12-vertex operation); the standard scale path (public
literature: Eppstein-Wang style sampling) estimates centrality from k
sampled sources. This runs the k BFS trees TOGETHER in one superstep job:
per-vertex state is k distance columns, messages carry (seed, dist), and
the in-shard level-synchronous fast-forward from ``algos.sssp`` (the
reference's in-subgraph Dijkstra idea, SingleSourceShortestPath.java) is
applied per seed, so supersteps scale with the META-graph diameter, not the
graph diameter.

harmonic(v) = sum over seeds s (in seed order): 1/d(s,v), skipping
unreachable and d=0 (the seed itself). The float sum is accumulated in
fixed seed order — the SQL oracle writes the identical left-associated
IEEE expression, so the comparison is exact."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.graph import LinkGraph, edge_localization
from raylink.superstep import Algorithm, run_bsp
from raylink.util import route_parts

INF = np.int64(2**62)


class MultiSourceBFS(Algorithm):
    name = "msbfs"
    msg_fields = [("seed", pa.int64()), ("dist", pa.int64())]

    def init(self, shard: dict, ctx: dict) -> dict:
        vids = shard["vids"]
        state = {}
        for j, seed in enumerate(ctx["seeds"]):
            d = np.full(len(vids), INF, dtype=np.int64)
            pos = np.searchsorted(vids, seed)
            if pos < len(vids) and vids[pos] == seed:
                d[pos] = 0
            state[f"d{j}"] = d
        return state

    def step(self, s: int, shard: dict, state: dict, msgs: pa.Table, ctx: dict):
        vids, indptr, indices = shard["vids"], shard["indptr"], shard["indices"]
        k = len(ctx["seeds"])
        deg = np.diff(indptr)
        edge_pos, edge_owned = edge_localization(shard)
        if msgs.num_rows:
            md = msgs.column("dst").to_numpy(zero_copy_only=False)
            ms = msgs.column("seed").to_numpy(zero_copy_only=False)
            mv = msgs.column("dist").to_numpy(zero_copy_only=False)
        out_dst: list[np.ndarray] = []
        out_seed: list[np.ndarray] = []
        out_dist: list[np.ndarray] = []
        n_active = 0
        new_state = {}
        for j in range(k):
            dist = np.asarray(state[f"d{j}"], dtype=np.int64).copy()
            improved = np.zeros(len(vids), dtype=bool)
            if s == 0:
                improved = dist == 0
            elif msgs.num_rows:
                sel = ms == j
                if sel.any():
                    pos = np.searchsorted(vids, md[sel])
                    before = dist[pos].copy()
                    np.minimum.at(dist, pos, mv[sel])
                    improved[pos[dist[pos] < before]] = True
            frontier = np.flatnonzero(improved)
            while len(frontier):
                starts, degs = indptr[frontier], deg[frontier]
                total = int(degs.sum())
                if total == 0:
                    break
                idx = np.repeat(starts, degs) + (
                    np.arange(total) - np.repeat(np.cumsum(degs) - degs, degs)
                )
                nd = np.repeat(dist[frontier], degs) + 1
                pos, owned = edge_pos[idx], edge_owned[idx]
                if np.any(~owned):
                    out_dst.append(indices[idx][~owned])
                    out_seed.append(np.full(int((~owned).sum()), j, np.int64))
                    out_dist.append(nd[~owned])
                lp, ld = pos[owned], nd[owned]
                before = dist[lp].copy()
                np.minimum.at(dist, lp, ld)
                frontier = np.unique(lp[dist[lp] < before])
            new_state[f"d{j}"] = dist
        out = None
        if out_dst:
            dd = np.concatenate(out_dst)
            ss_ = np.concatenate(out_seed)
            vv = np.concatenate(out_dist)
            # min-combine per (dst, seed): k <= 64 so dst*64+seed packs
            key = dd * np.int64(64) + ss_
            keys, inv = np.unique(key, return_inverse=True)
            mins = np.full(len(keys), INF, dtype=np.int64)
            np.minimum.at(mins, inv, vv)
            dsts = keys // np.int64(64)
            seeds = keys % np.int64(64)
            out = self.make_msgs(
                route_parts(shard, ctx, dsts), dsts, seed=seeds, dist=mins
            )
            n_active = len(keys)
        return new_state, out, n_active, 0.0


def harmonic_centrality(
    g: LinkGraph,
    seeds: list[int],
    ckpt_dir: str | None = None,
    resume: bool = True,
    max_supersteps: int = 200,
    engine: str = "dataset",
):
    """Harmonic centrality from ``seeds`` (directed: distance FROM each
    seed). Returns (BSPResult, Dataset (vid, d0..d{k-1}, harmonic))."""
    from raylink.superstep_tasks import run_bsp_tasks
    assert len(seeds) <= 64, "seed-index packing uses 6 bits"
    ctx = {
        "partitioner": g.partitioner,
        "num_parts": g.num_parts,
        "seeds": [int(x) for x in seeds],
        "ckpt_every": 1,
    }
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(
        g, MultiSourceBFS(), ctx, max_supersteps=max_supersteps,
        ckpt_dir=ckpt_dir, resume=resume,
    )
    k = len(seeds)

    def finish(batch: pa.Table) -> pa.Table:
        cols = {"vid": batch.column("vid")}
        h = np.zeros(batch.num_rows, dtype=np.float64)
        for j in range(k):
            d = batch.column(f"d{j}").to_numpy(zero_copy_only=False)
            reach = d < INF
            cols[f"d{j}"] = pa.array(np.where(reach, d, np.int64(-1)))
            # fixed seed order; SQL mirrors the same left-associated sum
            h = h + np.where(reach & (d > 0), 1.0 / np.maximum(d, 1), 0.0)
        cols["harmonic"] = pa.array(h)
        return pa.table(cols)

    return res, res.state_dataset().map_batches(finish, batch_format="pyarrow")
