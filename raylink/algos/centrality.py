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


def _det_segment_sum(dst_pos, seed, val, shape):
    """Deterministic float accumulation into ``acc[pos, seed]``: terms are
    lexsorted by (seed, pos, val) first, so the summation order is a pure
    function of the multiset of terms — identical across runs, resumes and
    partitionings (message arrival order is not)."""
    acc = np.zeros(shape, dtype=np.float64)
    if len(dst_pos):
        order = np.lexsort((val, dst_pos, seed))
        np.add.at(acc, (dst_pos[order], seed[order]), val[order])
    return acc


class BetweennessSampled(Algorithm):
    """Brandes betweenness from k sampled seeds, both phases in ONE BSP job
    (public algorithm: Brandes 2001 + the standard source-sampling
    estimator). Runs on the DUAL graph (``e_dirmask`` — scc_edges): the
    forward sigma-BFS pushes along original edges, the backward dependency
    accumulation pushes along reversed edges to shortest-path predecessors.

    Phase machine (driver-side, like algos.scc): FWD rounds are BFS levels;
    when the BFS quiesces the driver records Lmax = #levels and flips to
    BWD, where a vertex at depth d sends its (1+delta)/sigma term at round
    bwd_start + (Lmax - d) — successors (d+1) always send exactly one round
    earlier, so every dependency has arrived. Receivers accept a term only
    if sender_dist == own_dist + 1 for that seed (shortest-path DAG edge).
    Resume replays the manifest history through the same transition rule.

    sigma (shortest-path counts) are float64 — exact up to 2^53 paths, the
    standard Brandes trade. All float accumulations go through
    ``_det_segment_sum`` (lexsorted terms), so results are bit-identical
    across partitionings; cross-engine float association still differs,
    which is why the query output is rounded (and the SQL-free pytest
    oracle compares allclose)."""

    name = "betweenness"
    msg_fields = [("seed", pa.int64()), ("dist", pa.int64()),
                  ("val", pa.float64())]

    def init(self, shard: dict, ctx: dict) -> dict:
        vids = shard["vids"]
        k = len(ctx["seeds"])
        state = {}
        for j, seed in enumerate(ctx["seeds"]):
            d = np.full(len(vids), INF, dtype=np.int64)
            pos = np.searchsorted(vids, seed)
            if pos < len(vids) and vids[pos] == seed:
                d[pos] = 0
            state[f"d{j}"] = d
            state[f"sg{j}"] = (d == 0).astype(np.float64)
            state[f"ac{j}"] = np.zeros(len(vids), dtype=np.float64)
            state[f"dl{j}"] = np.zeros(len(vids), dtype=np.float64)
        return state

    @staticmethod
    def _masks(shard):
        m = shard["e_dirmask"].astype(np.int64)
        return (m & 1) == 1, (m & 2) == 2

    def _send(self, shard, ctx, sel_v, seed_j, dist_arr, val_arr, use_fwd):
        """Emit (dst, seed, sender_dist, val) along fwd or bwd CSR edges of
        the selected vertices; val/dist are per-vertex arrays."""
        indptr, indices = shard["indptr"], shard["indices"]
        fwd_e, bwd_e = self._masks(shard)
        deg = np.diff(indptr)
        sel = np.repeat(sel_v, deg) & (fwd_e if use_fwd else bwd_e)
        dst = indices[sel]
        if not len(dst):
            return None
        return (
            dst,
            np.full(len(dst), seed_j, dtype=np.int64),
            np.repeat(dist_arr, deg)[sel],
            np.repeat(val_arr, deg)[sel],
        )

    def step(self, s: int, shard: dict, state: dict, msgs: pa.Table, ctx: dict):
        vids = shard["vids"]
        k = len(ctx["seeds"])
        nv = len(vids)
        phase = ctx["phase"]
        out_parts: list = []
        if msgs.num_rows:
            md = msgs.column("dst").to_numpy(zero_copy_only=False)
            mseed = msgs.column("seed").to_numpy(zero_copy_only=False)
            mdist = msgs.column("dist").to_numpy(zero_copy_only=False)
            mval = msgs.column("val").to_numpy(zero_copy_only=False)
            mpos = np.searchsorted(vids, md)
        n_active = 0

        if phase == "fwd":
            level = s - ctx["phase_start"]  # vertices set this round get dist=level... (level r sets dist r)
            for j in range(k):
                dist = np.asarray(state[f"d{j}"], dtype=np.int64)
                sigma = np.asarray(state[f"sg{j}"], dtype=np.float64)
                newly = np.zeros(nv, dtype=bool)
                if s == ctx["phase_start"]:
                    newly = dist == 0
                elif msgs.num_rows:
                    sel = (mseed == j) & (dist[mpos] == INF)
                    if sel.any():
                        contrib = _det_segment_sum(
                            mpos[sel], np.zeros(int(sel.sum()), np.int64),
                            mval[sel], (nv, 1),
                        )[:, 0]
                        hit = contrib > 0
                        dist = np.where(hit, np.int64(level), dist)
                        sigma = np.where(hit, contrib, sigma)
                        newly = hit
                state[f"d{j}"] = dist
                state[f"sg{j}"] = sigma
                if newly.any():
                    n_active += int(newly.sum())
                    p = self._send(shard, ctx, newly, j, dist, sigma, True)
                    if p is not None:
                        out_parts.append(p)
            # the backward phase is still owed: never report global-idle
            # during fwd, or the engine halts at the BFS fixpoint before
            # halted() can flip the phase (same device as algos.scc, where
            # the unassigned count plays this role)
            n_active += 1
        else:  # bwd dependency accumulation
            jlev = s - ctx["bwd_start"]
            target = ctx["lmax"] - jlev  # depth sending THIS round
            for j in range(k):
                dist = np.asarray(state[f"d{j}"], dtype=np.int64)
                sigma = np.asarray(state[f"sg{j}"], dtype=np.float64)
                accum = np.asarray(state[f"ac{j}"], dtype=np.float64).copy()
                if msgs.num_rows:
                    # accept only shortest-path DAG edges: sender one level
                    # deeper than the receiver (for this seed)
                    sel = (mseed == j) & (dist[mpos] == mdist - 1)
                    if sel.any():
                        accum += _det_segment_sum(
                            mpos[sel], np.zeros(int(sel.sum()), np.int64),
                            mval[sel], (nv, 1),
                        )[:, 0]
                state[f"ac{j}"] = accum
                ready = (dist == target) & (dist != INF)
                if target >= 0 and ready.any():
                    delta = np.where(ready, sigma * accum, 0.0)
                    dl = np.asarray(state[f"dl{j}"], dtype=np.float64).copy()
                    dl[ready] = delta[ready]
                    state[f"dl{j}"] = dl
                    if target > 0:  # seeds (dist 0) have no predecessors to pay
                        safe = np.where(sigma > 0, sigma, 1.0)
                        term = np.where(ready, (1.0 + delta) / safe, 0.0)
                        p = self._send(shard, ctx, ready, j, dist, term, False)
                        if p is not None:
                            out_parts.append(p)
                n_active += int((dist < target).sum()) if target > 0 else 0

        out = None
        if out_parts:
            dst = np.concatenate([p[0] for p in out_parts])
            seed = np.concatenate([p[1] for p in out_parts])
            sdist = np.concatenate([p[2] for p in out_parts])
            val = np.concatenate([p[3] for p in out_parts])
            # pre-combine per (dst, seed, sender_dist): float sums lexsorted
            key = dst * np.int64(64) + seed
            order = np.lexsort((val, sdist, key))
            key, sdist, val = key[order], sdist[order], val[order]
            kk = key * np.int64(1 << 20) + sdist  # dist < 2^20 by construction
            uk, inv = np.unique(kk, return_inverse=True)
            sums = np.zeros(len(uk), dtype=np.float64)
            np.add.at(sums, inv, val)
            udst = (uk >> np.int64(20)) // np.int64(64)
            useed = (uk >> np.int64(20)) % np.int64(64)
            udist = uk % np.int64(1 << 20)
            out = self.make_msgs(
                route_parts(shard, ctx, udst), udst, seed=useed,
                dist=udist, val=sums,
            )
        return state, out, n_active, 0.0

    @staticmethod
    def _transition(ctx: dict, agg: dict, s: int) -> bool:
        """Apply the phase machine for round ``s``'s metrics; returns True
        when the whole job is done. Shared by halted() and resume replay."""
        if ctx["phase"] == "fwd" and agg["msgs_out"] == 0:
            ctx["phase"] = "bwd"
            ctx["bwd_start"] = s + 1
            # rounds phase_start..s ran levels 0..(s-phase_start); the last
            # round set nothing (msgs_out==0 means no frontier grew), so the
            # deepest occupied level is s - phase_start - 1... except the
            # seed-only graph case; a too-large lmax only idles rounds.
            ctx["lmax"] = max(s - ctx["phase_start"] - 1, 0)
            return False
        if ctx["phase"] == "bwd":
            return s >= ctx["bwd_start"] + ctx["lmax"]
        return False

    def halted(self, agg: dict, s: int, ctx: dict) -> bool:
        return self._transition(ctx, agg, s)

    @classmethod
    def replay_phase(cls, ctx: dict, history: list[dict]) -> None:
        for h in history:
            cls._transition(ctx, h, int(h["superstep"]))


def betweenness_sampled(
    g: LinkGraph,
    seeds: list[int],
    ckpt_dir: str | None = None,
    resume: bool = True,
    max_supersteps: int = 400,
    engine: str = "dataset",
):
    """Sampled betweenness centrality from ``seeds`` over a DUAL graph
    (build with ``algos.scc.scc_edges`` + ``edge_cols=['dirmask']``).
    Returns (BSPResult, Dataset (vid, bc))."""
    from raylink.superstep import Checkpoint
    from raylink.superstep_tasks import run_bsp_tasks

    assert len(seeds) <= 64, "seed-index packing uses 6 bits"
    ctx = {
        "partitioner": g.partitioner,
        "num_parts": g.num_parts,
        "seeds": [int(x) for x in seeds],
        "phase": "fwd",
        "phase_start": 0,
        "ckpt_every": 1,
    }
    algo = BetweennessSampled()
    if resume and ckpt_dir is not None:
        man = Checkpoint(ckpt_dir, g.filesystem).read_manifest()
        if man is not None and man.get("algo") == algo.name:
            BetweennessSampled.replay_phase(ctx, man.get("history", []))
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(
        g, algo, ctx, max_supersteps=max_supersteps, ckpt_dir=ckpt_dir,
        resume=resume,
    )
    k = len(seeds)
    seed_arr = np.array(seeds, dtype=np.int64)

    def finish(batch: pa.Table) -> pa.Table:
        vid = batch.column("vid").to_numpy(zero_copy_only=False)
        bc = np.zeros(batch.num_rows, dtype=np.float64)
        for j in range(k):
            dl = batch.column(f"dl{j}").to_numpy(zero_copy_only=False)
            bc = bc + np.where(vid == seed_arr[j], 0.0, dl)
        return pa.table({"vid": batch.column("vid"), "bc": pa.array(bc)})

    return res, res.state_dataset().map_batches(finish, batch_format="pyarrow")


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


def closeness_of_seeds(g: LinkGraph, seeds: list[int], ckpt_dir: str | None = None,
                       resume: bool = True, engine: str = "dataset"):
    """Closeness centrality OF each seed vertex: C(u) = (r - 1) / sum of
    d(u, v) over the r vertices u reaches (0.0 for isolated seeds) —
    computed as per-seed integer aggregates over the same MultiSourceBFS
    state ``harmonic_centrality`` builds (pass the SAME ckpt_dir to resume
    its checkpoints with zero extra supersteps). One map_batches partial
    pass + a k-row combine tree; one IEEE division per seed.
    -> Dataset (seed, n_reached, dist_sum, closeness)."""
    from raylink.join import tree_groupby_sum

    _, out = harmonic_centrality(
        g, seeds, ckpt_dir=ckpt_dir, resume=resume, engine=engine
    )
    k = len(seeds)

    def partial(batch: pa.Table) -> pa.Table:
        ss = np.zeros(k, np.int64)
        rr = np.zeros(k, np.int64)
        for j in range(k):
            d = batch.column(f"d{j}").to_numpy(zero_copy_only=False)
            reach = d >= 0
            ss[j] = int(d[reach].sum())
            rr[j] = int(reach.sum())
        return pa.table(
            {
                "seed": pa.array(np.asarray(seeds, np.int64)),
                "s": pa.array(ss),
                "r": pa.array(rr),
            }
        )

    agg = tree_groupby_sum(
        out.map_batches(partial, batch_format="pyarrow"), ["seed"], ["s", "r"]
    )

    def finish(b: pa.Table) -> pa.Table:
        s = b.column("sum(s)").to_numpy(zero_copy_only=False)
        r = b.column("sum(r)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "seed": b.column("seed"),
                "n_reached": pa.array(r),
                "dist_sum": pa.array(s),
                "closeness": pa.array(
                    np.where(s > 0, (r - 1) / np.maximum(s, 1), 0.0)
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def effective_diameter_of_seeds(g: LinkGraph, seeds: list[int],
                                q_num: int = 9, q_den: int = 10,
                                ckpt_dir: str | None = None,
                                resume: bool = True,
                                engine: str = "dataset"):
    """Seed-sampled effective diameter (Leskovec's 90th-percentile
    distance, here exact over the seed sample instead of HLL-approximate):
    the smallest hop distance d such that at least q_num/q_den of all
    reachable (seed, v) pairs lie within d. All-integer, so the SQL mirror
    is bit-exact: threshold = (q_num * n_pairs + (q_den - 1)) // q_den
    (ceiling division). -> one-row Dataset (eff_diameter, n_pairs,
    n_within).

    Reuses the SAME MultiSourceBFS checkpoints as harmonic/closeness (pass
    their ckpt_dir: zero extra supersteps); the distance histogram is a
    per-batch bincount + a bounded combine tree (cardinality <= the BFS
    depth cap) — one scalar row reaches the driver."""
    from raylink.join import tree_groupby_sum

    _, out = harmonic_centrality(
        g, seeds, ckpt_dir=ckpt_dir, resume=resume, engine=engine
    )
    k = len(seeds)

    def partial(batch: pa.Table) -> pa.Table:
        ds, cs = [], []
        for j in range(k):
            d = batch.column(f"d{j}").to_numpy(zero_copy_only=False)
            d = d[d >= 0]
            u, c = np.unique(d, return_counts=True)
            ds.append(u)
            cs.append(c.astype(np.int64))
        dd = np.concatenate(ds) if ds else np.array([], np.int64)
        cc = np.concatenate(cs) if cs else np.array([], np.int64)
        u, inv = np.unique(dd, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, cc)
        return pa.table({"d": pa.array(u), "c": pa.array(s)})

    hist = tree_groupby_sum(
        out.map_batches(partial, batch_format="pyarrow"), ["d"], ["c"]
    )

    def finish(batch: pa.Table) -> pa.Table:
        d = batch.column("d").to_numpy(zero_copy_only=False)
        c = batch.column("sum(c)").to_numpy(zero_copy_only=False)
        order = np.argsort(d)
        d, c = d[order], c[order]
        total = int(c.sum())
        thresh = (q_num * total + (q_den - 1)) // q_den
        cum = np.cumsum(c)
        i = int(np.searchsorted(cum, thresh))
        return pa.table(
            {"eff_diameter": pa.array([int(d[i])], type=pa.int64()),
             "n_pairs": pa.array([total], type=pa.int64()),
             "n_within": pa.array([int(cum[i])], type=pa.int64())}
        )

    return hist.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )
