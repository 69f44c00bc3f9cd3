"""Graph KMeans — GPS-style balanced clustering by multi-source BFS growth.

Mirrors sample-hama/.../KMeans.java:68-614: pick k seed vertices, grow
clusters by (breadth-first) proximity (:351-389), count cross-cluster edges,
and re-seed / iterate until the crossing count is acceptable or the
iteration budget is spent (:574-590). Differences from the reference,
documented: seeds are drawn deterministically (k smallest splitmix64(vid ^
iteration-salt) — the reference uses java.util.Random; determinism is a
north-rule requirement here), and the control loop lives in the driver
instead of 1-byte broadcast control messages (:183,423-426).

Cluster growth is one BSP job per iteration: state (dist, cluster), nearest
seed wins with (dist, cluster) lexicographic tie-break — the same
deterministic frontier machinery as the spanning forest. Crossing counts use
a broadcast label lookup over the edge table (meta-sized at test scale;
hash-join fallback documented for crawl scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.graph import LinkGraph, build_graph, vertex_table
from raylink.superstep import Algorithm, run_bsp
from raylink.superstep_tasks import run_bsp_tasks
from raylink.util import route_parts, splitmix64

INF = np.int64(2**62)


class KMeansCluster(Algorithm):
    name = "kmeans_cluster"
    msg_fields = [("dist", pa.int64()), ("cluster", pa.int64())]

    def init(self, shard: dict, ctx: dict) -> dict:
        vids = shard["vids"]
        dist = np.full(len(vids), INF, dtype=np.int64)
        cluster = np.full(len(vids), -1, dtype=np.int64)
        seeds = np.asarray(ctx["seeds"], dtype=np.int64)
        pos = np.searchsorted(vids, seeds)
        ok = (pos < len(vids)) & (vids[np.minimum(pos, len(vids) - 1)] == seeds)
        dist[pos[ok]] = 0
        cluster[pos[ok]] = seeds[ok]
        return {"dist": dist, "cluster": cluster}

    def step(self, s: int, shard: dict, state: dict, msgs: pa.Table, ctx: dict):
        vids, indptr, indices = shard["vids"], shard["indptr"], shard["indices"]
        dist = np.asarray(state["dist"], dtype=np.int64).copy()
        cluster = np.asarray(state["cluster"], dtype=np.int64).copy()
        improved = np.zeros(len(vids), dtype=bool)

        def better(nd, nc, pz):
            return nd < dist[pz] or (
                nd == dist[pz] and (cluster[pz] < 0 or nc < cluster[pz])
            )

        if s == 0:
            improved = dist == 0
        elif msgs.num_rows:
            d = msgs.column("dst").to_numpy(zero_copy_only=False)
            nd = msgs.column("dist").to_numpy(zero_copy_only=False)
            nc = msgs.column("cluster").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(vids, d)
            for i in np.lexsort((nc, nd)):
                if better(nd[i], nc[i], pos[i]):
                    dist[pos[i]] = nd[i]
                    cluster[pos[i]] = nc[i]
                    improved[pos[i]] = True
        remote: dict[int, tuple] = {}
        frontier = np.flatnonzero(improved)
        deg = np.diff(indptr)
        while len(frontier):
            starts, degs = indptr[frontier], deg[frontier]
            if degs.sum() == 0:
                break
            idx = np.repeat(starts, degs) + (
                np.arange(degs.sum()) - np.repeat(np.cumsum(degs) - degs, degs)
            )
            nbr = indices[idx]
            nd = np.repeat(dist[frontier], degs) + 1
            nc = np.repeat(cluster[frontier], degs)
            order = np.lexsort((nc, nd, nbr))
            nbr, nd, nc = nbr[order], nd[order], nc[order]
            first = np.r_[True, nbr[1:] != nbr[:-1]]
            nbr, nd, nc = nbr[first], nd[first], nc[first]
            pos = np.searchsorted(vids, nbr)
            owned = (pos < len(vids)) & (vids[np.minimum(pos, len(vids) - 1)] == nbr)
            nxt = []
            for i in np.flatnonzero(owned):
                if better(nd[i], nc[i], pos[i]):
                    dist[pos[i]] = nd[i]
                    cluster[pos[i]] = nc[i]
                    nxt.append(pos[i])
            for i in np.flatnonzero(~owned):
                key = int(nbr[i])
                cand = (int(nd[i]), int(nc[i]))
                if key not in remote or cand < remote[key]:
                    remote[key] = cand
            frontier = np.unique(np.asarray(nxt, dtype=np.int64))
        out = None
        if remote:
            dsts = np.array(sorted(remote), dtype=np.int64)
            nds = np.array([remote[int(x)][0] for x in dsts], dtype=np.int64)
            ncs = np.array([remote[int(x)][1] for x in dsts], dtype=np.int64)
            out = self.make_msgs(
                route_parts(shard, ctx, dsts), dsts, dist=nds, cluster=ncs
            )
        return {"dist": dist, "cluster": cluster}, out, len(remote), 0.0


def _pick_seeds(g: LinkGraph, k: int, salt: int) -> np.ndarray:
    """Deterministic seeds: k vertices minimizing splitmix64(vid ^ salt),
    computed with a per-batch partial top-k then a driver-side merge."""
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column("vid").to_numpy(zero_copy_only=False)
        h = splitmix64(v.astype(np.uint64) ^ np.uint64(salt))
        order = np.argsort(h)[:k]
        return pa.table({"vid": pa.array(v[order]), "h": pa.array(h[order])})

    pdf = (
        vertex_table(g)
        .select_columns(["vid"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    order = np.argsort(pdf["h"].to_numpy())[:k]
    return np.sort(pdf["vid"].to_numpy(np.int64)[order])


def crossing_count(
    edges_ds,
    labels_ds,
    n_vertices: int,
    broadcast_threshold: int | None = None,
    force: str | None = None,
) -> int:
    """Edges whose endpoints carry different cluster labels.

    Thresholded like every lookup in the engine: label table broadcast below
    ``broadcast_threshold`` vertices (one streaming pass over the edges),
    else two distributed hash joins (src label, then dst label) with nothing
    on the driver. ``force`` pins a path for testing; both produce the same
    count."""
    from raylink.join import BROADCAST_THRESHOLD, hash_join

    if broadcast_threshold is None:
        broadcast_threshold = BROADCAST_THRESHOLD
    use_broadcast = force == "broadcast" or (
        force is None and n_vertices <= broadcast_threshold
    )
    if use_broadcast:
        import ray

        labels_pdf = labels_ds.select_columns(["vid", "cluster"]).to_pandas()
        vv = labels_pdf["vid"].to_numpy(np.int64)
        cc = labels_pdf["cluster"].to_numpy(np.int64)
        order = np.argsort(vv)
        ref = ray.put((vv[order], cc[order]))

        def count(batch: pa.Table) -> pa.Table:
            v, c = ray.get(ref)
            s = batch.column("src").to_numpy(zero_copy_only=False)
            d = batch.column("dst").to_numpy(zero_copy_only=False)
            cs = c[np.searchsorted(v, s)]
            cd = c[np.searchsorted(v, d)]
            return pa.table(
                {"x": pa.array([int(np.sum(cs != cd))], type=pa.int64())}
            )

        return int(edges_ds.map_batches(count, batch_format="pyarrow").sum("x") or 0)

    src_lab = labels_ds.map_batches(
        lambda b: pa.table({"src": b.column("vid"), "cs": b.column("cluster")}),
        batch_format="pyarrow",
    )
    dst_lab = labels_ds.map_batches(
        lambda b: pa.table({"dst": b.column("vid"), "cd": b.column("cluster")}),
        batch_format="pyarrow",
    )
    j1 = hash_join(
        edges_ds, src_lab, on="src",
        left_cols={"dst": pa.int64()}, right_cols={"cs": pa.int64()},
    )
    j2 = hash_join(
        j1, dst_lab, on="dst",
        left_cols={"src": pa.int64(), "cs": pa.int64()},
        right_cols={"cd": pa.int64()},
    )

    def count(batch: pa.Table) -> pa.Table:
        cs = batch.column("cs").to_numpy(zero_copy_only=False)
        cd = batch.column("cd").to_numpy(zero_copy_only=False)
        return pa.table({"x": pa.array([int(np.sum(cs != cd))], type=pa.int64())})

    return int(j2.map_batches(count, batch_format="pyarrow").sum("x") or 0)


def graph_kmeans(
    edges_ds,
    g: LinkGraph | None = None,
    vertices_ds=None,
    k: int = 4,
    max_iterations: int = 3,
    max_edge_crossing: int | None = None,
    num_parts: int = 16,
    partitioner: str = "hash",
    engine: str = "tasks",
    ckpt_root: str | None = None,
    seed: int = 42,
):
    """Returns (labels Dataset (vid, cluster, dist), history list of
    {iteration, seeds, crossings}); keeps the iteration with the fewest
    cross-cluster edges (reference stop rule, KMeans.java:574-590)."""
    if g is None:
        g = build_graph(
            edges_ds, vertices_ds, num_parts=num_parts, partitioner=partitioner,
            directed=False,
        )
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    best = None
    history = []
    for it in range(max_iterations):
        seeds = _pick_seeds(g, k, salt=seed + 7919 * it)
        ctx = {
            "seeds": seeds, "partitioner": g.partitioner, "num_parts": g.num_parts,
        }
        ck = None if ckpt_root is None else f"{ckpt_root}/iter{it}"
        res = _run(g, KMeansCluster(), ctx, ckpt_dir=ck, resume=ck is not None)
        labels = res.state_dataset().select_columns(["vid", "cluster", "dist"])
        crossings = crossing_count(edges_ds, labels, g.n_vertices)
        history.append(
            {"iteration": it, "seeds": seeds.tolist(), "crossings": crossings}
        )
        if best is None or crossings < best[1]:
            best = (labels, crossings)
        if max_edge_crossing is not None and crossings <= max_edge_crossing:
            break
    return best[0], history
