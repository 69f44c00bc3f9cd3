"""Deterministic distributed maximal matching — synchronous mutual-best
handshake (Israeli-Itai style) with splitmix64 edge priorities, one BSP job.

The edge-side member of the symmetry-breaking family (``algos.mis`` breaks
vertex independence, ``algos.coloring`` orders vertices, this pairs them):
the reference has no matching sample — it is builder-brief breadth from the
same BSP literature. Edge priority = splitmix64(splitmix64(a) XOR
splitmix64(b)) — symmetric in the endpoints, ties broken by the partner
vid, so every per-vertex "best incident edge" is unique and the run is
fully deterministic (mirrored in SQL via the shared ``_sm64`` kernel,
unrolled rounds like the MIS/coloring oracles).

One matching ROUND = two supersteps, so engine rounds and SQL rounds stay
in lockstep (all death notices apply before anyone re-proposes):

  even superstep 2r   apply death notices; every unmatched vertex with an
                      alive incident edge proposes to its best partner
                      (min (priority, partner-vid) over alive edges);
  odd superstep 2r+1  a pair that proposed to EACH OTHER matches
                      (match_round = r); the newly matched announce their
                      death to their remaining alive neighbours.

The globally-min-priority alive edge is always mutual-best, so every round
matches at least one edge; with hash priorities the expected round count is
O(log E). Death notices total <= 2E rows over the whole run; proposals are
<= V rows per round. Alive-edge tracking is a per-shard sorted array of
dead GLOBAL vids (aux sidecar state) — per round one vectorized
searchsorted over the shard's CSR slots, no per-message slot surgery.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.graph import LinkGraph, build_graph
from raylink.superstep import Algorithm, run_bsp, sort_msgs
from raylink.superstep_tasks import run_bsp_tasks
from raylink.util import isin_sorted, route_parts, splitmix64


def _edge_pri(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Symmetric deterministic edge priority (collision ties are broken by
    the partner vid at each endpoint, consistently on both sides)."""
    return splitmix64(
        splitmix64(a.astype(np.uint64)) ^ splitmix64(b.astype(np.uint64))
    )


class MaximalMatching(Algorithm):
    name = "matching"
    # superstep parity disambiguates message type: even supersteps consume
    # death notices, odd supersteps consume proposals — no kind column
    msg_fields = [("other", pa.int64())]

    def init(self, shard: dict, ctx: dict) -> dict:
        n = len(shard["vids"])
        return {
            "mate": np.full(n, -1, dtype=np.int64),
            "match_round": np.full(n, -1, dtype=np.int64),
            "proposed_to": np.full(n, -1, dtype=np.int64),
            # sorted global vids known dead (matched); aux-sidecar length
            "dead_vids": np.array([], dtype=np.int64),
        }

    def step(self, s: int, shard: dict, state: dict, msgs: pa.Table, ctx: dict):
        vids, indptr, indices = shard["vids"], shard["indptr"], shard["indices"]
        n = len(vids)
        mate = np.asarray(state["mate"], dtype=np.int64).copy()
        match_round = np.asarray(state["match_round"], dtype=np.int64).copy()
        proposed_to = np.asarray(state["proposed_to"], dtype=np.int64).copy()
        dead_vids = np.asarray(state["dead_vids"], dtype=np.int64)
        out = None
        n_active = 0
        if s % 2 == 0:
            # ---- propose: fold death notices in, then best alive partner
            if msgs.num_rows:
                o = msgs.column("other").to_numpy(zero_copy_only=False)
                dead_vids = np.union1d(dead_vids, o)
            deg = np.diff(indptr)
            nbr = indices.astype(np.int64, copy=False)
            seg = np.repeat(np.arange(n, dtype=np.int64), deg)
            src = vids[seg]
            alive = (
                (mate[seg] == -1)
                & ~isin_sorted(dead_vids, nbr)
                & (nbr != src)
            )
            seg_a, nbr_a, src_a = seg[alive], nbr[alive], src[alive]
            proposed_to[:] = -1
            if len(seg_a):
                pri = _edge_pri(src_a, nbr_a)
                order = np.lexsort((nbr_a, pri, seg_a))
                sa = seg_a[order]
                first = np.r_[True, sa[1:] != sa[:-1]]
                owners = sa[first]
                best = nbr_a[order][first]
                proposed_to[owners] = best
                out = self.make_msgs(
                    route_parts(shard, ctx, best), best, other=vids[owners]
                )
                n_active = len(owners)
        else:
            # ---- match: mutual proposals pair up, the matched announce
            if msgs.num_rows:
                msgs = sort_msgs(msgs, ["dst", "other"])
                d = msgs.column("dst").to_numpy(zero_copy_only=False)
                o = msgs.column("other").to_numpy(zero_copy_only=False)
                posv = np.searchsorted(vids, d)
                # a message (dst=v, other=u) IS u's proposal to v; the
                # handshake closes iff v's standing proposal points back
                # at u — one vectorized check per message row
                hit = (mate[posv] == -1) & (proposed_to[posv] == o)
                new = np.unique(posv[hit])
                if len(new):
                    mate[new] = proposed_to[new]
                    match_round[new] = s // 2
                    dead_vids = np.union1d(dead_vids, vids[new])
                    # death notices to remaining alive neighbours
                    deg = np.diff(indptr)
                    newm = np.zeros(n, dtype=bool)
                    newm[new] = True
                    selm = np.repeat(newm, deg)
                    dst = indices[selm].astype(np.int64, copy=False)
                    srcv = np.repeat(vids, deg)[selm]
                    keep = (
                        (dst != srcv)
                        & (dst != np.repeat(mate, deg)[selm])
                        & ~isin_sorted(dead_vids, dst)
                    )
                    dst, srcv = dst[keep], srcv[keep]
                    if len(dst):
                        order2 = np.lexsort((dst, srcv))
                        dst, srcv = dst[order2], srcv[order2]
                        uniq = np.r_[
                            True,
                            (srcv[1:] != srcv[:-1]) | (dst[1:] != dst[:-1]),
                        ]
                        dst, srcv = dst[uniq], srcv[uniq]
                        out = self.make_msgs(
                            route_parts(shard, ctx, dst), dst, other=srcv
                        )
            # standing = proposals NOT consummated this superstep — counting
            # matched proposers here would spuriously fail a run whose true
            # round count equals the budget
            n_active = int(((proposed_to >= 0) & (mate == -1)).sum())
        state = {
            "mate": mate, "match_round": match_round,
            "proposed_to": proposed_to, "dead_vids": dead_vids,
        }
        return state, out, n_active, 0.0


def maximal_matching(
    edges_ds=None,
    g: LinkGraph | None = None,
    vertices_ds=None,
    num_parts: int = 16,
    partitioner: str = "hash",
    max_rounds: int = 32,
    ckpt_dir: str | None = None,
    resume: bool = True,
    ckpt_every: int = 1,
    engine: str = "tasks",
):
    """Maximal matching of the undirected simple graph. Returns
    (BSPResult, Dataset (vid, mate, match_round)) over ALL graph vertices;
    unmatched vertices carry mate = -1, match_round = -1 (maximality: every
    unmatched vertex's neighbours are all matched). Raises if ``max_rounds``
    matching rounds (2x supersteps) leave proposals standing — keep the SQL
    oracle's unroll in lockstep."""
    if g is None:
        g = build_graph(
            edges_ds, vertices_ds, num_parts=num_parts,
            partitioner=partitioner, directed=False,
        )
    ctx = {"partitioner": g.partitioner, "num_parts": g.num_parts,
           "ckpt_every": ckpt_every}
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    # 2 supersteps per round + ONE drain step: the final round's death
    # notices resolve losers' standing proposals only on the next even step
    res = _run(
        g, MaximalMatching(), ctx, max_supersteps=2 * max_rounds + 1,
        ckpt_dir=ckpt_dir, resume=resume,
    )
    if res.history and res.history[-1]["n_active"] > 0:
        raise RuntimeError(
            f"maximal_matching: {res.history[-1]['n_active']} proposals "
            f"standing after {max_rounds} rounds — raise max_rounds"
        )
    out = res.state_dataset().select_columns(["vid", "mate", "match_round"])
    return res, out


def coarsen_graph(edges_ds, matching_ds, num_buckets: int = 64):
    """Heavy-edge-matching graph coarsening (the multilevel-partitioning /
    multigrid primitive, METIS-style): contract every matched pair to its
    MIN-vid representative, drop collapsed self-loops, and sum parallel
    edges into coarse weights -> Dataset (csrc, cdst, weight), csrc < cdst.

    Dataflow: canonical distinct undirected edge keys -> ``pair_attach``
    of each endpoint's representative (two coarse-bucket shuffles, no
    broadcast of the dataset-sized rep table) -> re-canonicalize on coarse
    ids -> one coarse-bucket sum. Every stage is the packed-key machinery;
    nothing driver-side. The coarse graph is ~half the vertices per level —
    iterate for a multilevel hierarchy."""
    import pyarrow as pa

    from raylink.join import bucketed_distinct, bucketed_sum, pair_attach
    from raylink.util import assert_packable, unpack_hi

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        a = np.minimum(s[keep], d[keep]).astype(np.int64)
        b = np.maximum(s[keep], d[keep]).astype(np.int64)
        assert_packable(a, "coarsen vid")
        assert_packable(b, "coarsen vid")
        return pa.table({"key": pa.array(np.unique((a << np.int64(32)) | b))})

    distinct = bucketed_distinct(
        edges_ds.map_batches(canon, batch_format="pyarrow"), "key",
        num_buckets=num_buckets,
    )

    def rep_rows(batch: pa.Table) -> pa.Table:
        v = batch.column("vid").to_numpy(zero_copy_only=False)
        m = batch.column("mate").to_numpy(zero_copy_only=False)
        r = np.where(m >= 0, np.minimum(v, m), v).astype(np.int64)
        return pa.table({"vid": pa.array(v), "r": pa.array(r)})

    rep = matching_ds.map_batches(rep_rows, batch_format="pyarrow")
    att = pair_attach(
        distinct, rep, value_fields={"r": pa.int64()},
        num_buckets=num_buckets, id_col="vid",
    )

    def coarse_keys(batch: pa.Table) -> pa.Table:
        ra = batch.column("r_a").to_numpy(zero_copy_only=False)
        rb = batch.column("r_b").to_numpy(zero_copy_only=False)
        keep = ra != rb  # contracted (matched) edges vanish
        lo = np.minimum(ra[keep], rb[keep])
        hi = np.maximum(ra[keep], rb[keep])
        return pa.table(
            {"ck": pa.array((lo << np.int64(32)) | hi),
             "c": pa.array(np.ones(keep.sum(), dtype=np.int64))}
        )

    summed = bucketed_sum(
        att.map_batches(coarse_keys, batch_format="pyarrow"),
        "ck", "c", out_val="weight", num_buckets=num_buckets,
    )

    def unpack(batch: pa.Table) -> pa.Table:
        k = batch.column("ck").to_numpy(zero_copy_only=False)
        return pa.table(
            {"csrc": pa.array(unpack_hi(k)),
             "cdst": pa.array(k & np.int64(0xFFFFFFFF)),
             "weight": batch.column("weight")}
        )

    return summed.map_batches(unpack, batch_format="pyarrow")
