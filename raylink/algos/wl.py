"""Weisfeiler-Lehman color refinement — structural vertex fingerprints.

The 1-WL / color-refinement algorithm (Weisfeiler & Lehman 1968; the
standard graph-isomorphism test and the expressiveness bound of
message-passing GNNs, Xu et al. ICLR 2019): colors start as degree
classes and each round refine to
``color'(v) = H(color(v), multiset{color(u) : u ~ v})`` — after R rounds
two vertices share a color iff their radius-R neighborhood structures are
indistinguishable. The web use: structural page roles (hub/leaf/template
shapes) as features, and fast graph-fingerprint comparisons between crawl
snapshots.

Engine shape: BSP rounds over the undirected graph. Like community LPA
(the other full-push multiset algorithm), every vertex sends its color
every round, but the shuffle carries per-(dst, color) PRE-SUMMED counts —
a hub receives at most (#distinct neighbor colors x P) rows, not degree
rows. The receiver folds the sorted (color, count) pair list through the
position-parallel FNV-1a range kernel (``util.fnv1a_ranges`` — no
per-vertex python), then mixes in its own color via splitmix64. Colors
are 64-bit hashes internally; the OUTPUT is the canonical class label
``min vid sharing the color`` (one coarse-bucket groupby), which is what
the SQL oracle mirrors — the oracle partitions by the exact
(own label, sorted neighbor-label list) signature, no hash mirroring, so
the comparison would catch an FNV collision (probability ~2^-64 per pair
of classes, documented as the exactness caveat).

Determinism: splitmix64 is a bijection, so the round-0 degree classes are
exact; pair lists are sorted (color asc) before folding; equal multisets
give equal pair lists give equal hashes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.graph import LinkGraph, build_graph
from raylink.superstep import Algorithm, run_bsp
from raylink.superstep_tasks import run_bsp_tasks
from raylink.util import FNV_OFFSET, fnv1a_ranges, route_parts, splitmix64


class WLRefine(Algorithm):
    name = "wl_refine"
    msg_fields = [("color", pa.int64()), ("cnt", pa.int64())]

    def init(self, shard: dict, ctx: dict) -> dict:
        deg = np.diff(shard["indptr"]).astype(np.uint64)
        return {"color": splitmix64(deg).view(np.int64).copy()}

    @staticmethod
    def _group_sum(dst: np.ndarray, col: np.ndarray, cnt: np.ndarray):
        order = np.lexsort((col, dst))
        d, c, n = dst[order], col[order], cnt[order]
        new = np.concatenate(([True], (d[1:] != d[:-1]) | (c[1:] != c[:-1])))
        starts = np.flatnonzero(new)
        return d[starts], c[starts], np.add.reduceat(n, starts)

    def step(self, s: int, shard: dict, state: dict, msgs: pa.Table, ctx: dict):
        vids, indptr, indices = shard["vids"], shard["indptr"], shard["indices"]
        n = len(vids)
        color = np.asarray(state["color"], dtype=np.int64)
        if s > 0:
            # neighbor multiset as sorted (color, count) pairs per vertex
            h_nb = np.full(n, FNV_OFFSET, dtype=np.uint64)  # empty multiset
            if msgs.num_rows:
                d = msgs.column("dst").to_numpy(zero_copy_only=False)
                cv = msgs.column("color").to_numpy(zero_copy_only=False)
                nv = msgs.column("cnt").to_numpy(zero_copy_only=False)
                du, cu, nu = self._group_sum(d, cv, nv)
                # rows are sorted by (dst, color); fold each vertex's run
                pos = np.searchsorted(vids, du)
                row_start = np.flatnonzero(
                    np.concatenate(([True], pos[1:] != pos[:-1]))
                )
                rows_per = np.diff(np.append(row_start, len(pos)))
                pairs = np.empty(2 * len(cu), dtype=np.int64)
                pairs[0::2] = cu
                pairs[1::2] = nu
                data = pairs.view(np.uint8)
                h = fnv1a_ranges(
                    data, row_start * 16, rows_per * 16
                )
                h_nb[pos[row_start]] = h
            color = (
                splitmix64(h_nb ^ splitmix64(color.view(np.uint64)))
                .view(np.int64)
                .copy()
            )
        state = {"color": color}
        # full push: every vertex's color to every neighbor, pre-summed
        deg = np.diff(indptr)
        out = None
        if len(indices):
            du, cu, nu = self._group_sum(
                indices, np.repeat(color, deg), np.ones(len(indices), np.int64)
            )
            out = self.make_msgs(
                route_parts(shard, ctx, du), du, color=cu, cnt=nu
            )
        return state, out, n, 0.0

    def halted(self, agg: dict, s: int, ctx: dict) -> bool:
        return s >= ctx["rounds"]


def wl_classes(
    edges_ds=None,
    g: LinkGraph | None = None,
    vertices_ds=None,
    num_parts: int = 16,
    partitioner: str = "hash",
    rounds: int = 3,
    ckpt_dir: str | None = None,
    resume: bool = True,
    ckpt_every: int = 1,
    engine: str = "dataset",
    num_buckets: int = 32,
):
    """R rounds of WL refinement; returns (BSPResult, Dataset
    (vid, wl_class)) with ``wl_class`` = the smallest vid sharing the
    vertex's final color (canonical class labels — partitioning-invariant
    and SQL-checkable). One coarse-bucket groupby relabels: a color's
    rows all land in one group, so the min is exact."""
    from raylink.util import splitmix64 as _sm

    if g is None:
        g = build_graph(
            edges_ds, vertices_ds, num_parts=num_parts,
            partitioner=partitioner, directed=False,
        )
    ctx = {"partitioner": g.partitioner, "num_parts": g.num_parts,
           "ckpt_every": ckpt_every, "rounds": rounds}
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(
        g, WLRefine(), ctx, max_supersteps=rounds + 1,
        ckpt_dir=ckpt_dir, resume=resume,
    )
    B = np.uint64(num_buckets)

    def bucket(b: pa.Table) -> pa.Table:
        c = b.column("color").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cb": pa.array((_sm(c.view(np.uint64)) % B).astype(np.int32)),
                "vid": b.column("vid"),
                "color": b.column("color"),
            }
        )

    def relabel(group: pa.Table) -> pa.Table:
        v = group.column("vid").to_numpy(zero_copy_only=False)
        c = group.column("color").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, c))
        cs, vs = c[order], v[order]
        starts = np.flatnonzero(np.concatenate(([True], cs[1:] != cs[:-1])))
        gidx = np.repeat(
            np.arange(len(starts)), np.diff(np.append(starts, len(cs)))
        )
        lab = vs[starts][gidx]  # min vid per color (vid is sort tiebreak)
        out = pa.table({"vid": pa.array(vs), "wl_class": pa.array(lab)})
        return out

    labels = (
        res.state_dataset()
        .select_columns(["vid", "color"])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(relabel, batch_format="pyarrow")
    )
    return res, labels
