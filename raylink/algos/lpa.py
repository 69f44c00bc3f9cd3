"""Synchronous min-label propagation (LPA).

The reference's ConnectedComponents IS min-label propagation at subgraph
granularity (sample-hama/.../ConnectedComponents.java:90-116): value <-
min(own, neighbours, incoming), send on change, halt when stable. This is
the same kernel at vertex granularity (SURVEY.md §2.4 "Label propagation");
``raylink.algos.cc`` reuses it over the meta-graph of subgraphs.

Fixpoint: label(v) = min vid of v's (weakly) connected component — run it on
an undirected LinkGraph (``directed=False``). Min-reduction is order
independent, so no sort is needed for determinism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.graph import LinkGraph, build_graph
from raylink.superstep import Algorithm, run_bsp
from raylink.superstep_tasks import run_bsp_tasks
from raylink.util import route_parts

_I64MAX = np.int64(2**62)


class MinLabelLPA(Algorithm):
    name = "lpa"
    msg_fields = [("label", pa.int64())]

    def init(self, shard: dict, ctx: dict) -> dict:
        init_from = ctx.get("init_labels", "vid")
        if init_from == "vid":
            labels = shard["vids"].astype(np.int64, copy=True)
        else:  # per-vertex array already in shard (e.g. precomputed)
            labels = shard[init_from].astype(np.int64, copy=True)
        return {"label": labels}

    def step(self, s: int, shard: dict, state: dict, msgs: pa.Table, ctx: dict):
        vids, indptr, indices = shard["vids"], shard["indptr"], shard["indices"]
        label = np.asarray(state["label"], dtype=np.int64)
        if s == 0:
            changed = np.ones(len(vids), dtype=bool)
        else:
            new = label.copy()
            if msgs.num_rows:
                d = msgs.column("dst").to_numpy(zero_copy_only=False)
                lv = msgs.column("label").to_numpy(zero_copy_only=False)
                pos = np.searchsorted(vids, d)
                np.minimum.at(new, pos, lv)
            changed = new < label
            label = new
        state = {"label": label}
        out = None
        if np.any(changed):
            deg = np.diff(indptr)
            sel = np.repeat(changed, deg)
            dst = indices[sel]
            lab = np.repeat(label, deg)[sel]
            if len(dst):
                # min-combine per destination before the shuffle
                dsts, inv = np.unique(dst, return_inverse=True)
                mins = np.full(len(dsts), _I64MAX, dtype=np.int64)
                np.minimum.at(mins, inv, lab)
                out = self.make_msgs(route_parts(shard, ctx, dsts), dsts, label=mins)
        return state, out, int(changed.sum()), 0.0


class CommunityLPA(Algorithm):
    """Synchronous MAX-FREQUENCY label propagation (community detection,
    Raghavan et al. 2007's LPA in its deterministic synchronous form):
    label(v, t) = the most frequent label among v's neighbors at t-1, ties
    broken by the SMALLEST label; vertices with no neighbors keep their
    label. Deterministic — no RNG, no visit order — so the whole run is
    exactly SQL-mirrorable round for round (oracles_sql.communities_sql).

    Unlike min-label LPA there is no delta propagation: the argmax needs
    every neighbor's label each round, so every vertex pushes every round
    (sync LPA's inherent cost, rounds x E messages). The shuffle is still
    combined: senders emit (dst, label, cnt) rows pre-summed per
    destination-label pair, receivers re-sum counts — hub vertices receive
    at most (#distinct neighbor labels x P) rows, not degree rows.
    Halts when no label changed (next round provably recomputes the same
    labels) or at the round budget — sync LPA can 2-cycle on bipartite
    structures, which the budget bounds (documented, like the papers)."""

    name = "community_lpa"
    msg_fields = [("label", pa.int64()), ("cnt", pa.int64())]

    def init(self, shard: dict, ctx: dict) -> dict:
        return {"label": shard["vids"].astype(np.int64, copy=True)}

    @staticmethod
    def _group_sum(dst: np.ndarray, lab: np.ndarray, cnt: np.ndarray):
        """Sum cnt per (dst, label) pair — lexsort + reduceat, no 2-D
        np.unique. Returns (dst', lab', cnt') with (dst', lab') unique."""
        order = np.lexsort((lab, dst))
        d, l, c = dst[order], lab[order], cnt[order]
        new = np.concatenate(([True], (d[1:] != d[:-1]) | (l[1:] != l[:-1])))
        starts = np.flatnonzero(new)
        return d[starts], l[starts], np.add.reduceat(c, starts)

    def step(self, s: int, shard: dict, state: dict, msgs: pa.Table, ctx: dict):
        vids, indptr, indices = shard["vids"], shard["indptr"], shard["indices"]
        n = len(vids)
        label = np.asarray(state["label"], dtype=np.int64)
        changed_n = n  # round 0: everything counts as active
        if s > 0:
            changed_n = 0
            if msgs.num_rows:
                d = msgs.column("dst").to_numpy(zero_copy_only=False)
                lv = msgs.column("label").to_numpy(zero_copy_only=False)
                cv = msgs.column("cnt").to_numpy(zero_copy_only=False)
                du, lu, cu = self._group_sum(d, lv, cv)
                pos = np.searchsorted(vids, du)
                # per vertex: max count, tie -> smallest label
                order = np.lexsort((lu, -cu, pos))
                p2 = pos[order]
                firsts = np.flatnonzero(
                    np.concatenate(([True], p2[1:] != p2[:-1]))
                )
                new = label.copy()
                new[p2[firsts]] = lu[order][firsts]
                changed_n = int((new != label).sum())
                label = new
        state = {"label": label}
        # full push every round: per-(dst, label) combined counts
        deg = np.diff(indptr)
        dst = indices
        lab = np.repeat(label, deg)
        out = None
        if len(dst):
            du, lu, cu = self._group_sum(dst, lab, np.ones(len(dst), np.int64))
            out = self.make_msgs(
                route_parts(shard, ctx, du), du, label=lu, cnt=cu
            )
        return state, out, changed_n, 0.0

    def halted(self, agg: dict, s: int, ctx: dict) -> bool:
        # fixpoint: unchanged labels reproduce themselves next round;
        # msgs_out is never 0 (full push), so override the default
        return s > 0 and agg["n_active"] == 0


def community_lpa(
    edges_ds=None,
    g: LinkGraph | None = None,
    vertices_ds=None,
    num_parts: int = 16,
    partitioner: str = "hash",
    rounds: int = 5,
    ckpt_dir: str | None = None,
    resume: bool = True,
    ckpt_every: int = 1,
    engine: str = "dataset",
):
    """Max-frequency LPA communities after at most ``rounds`` rounds (or
    to fixpoint). Returns (BSPResult, Dataset (vid, label))."""
    if g is None:
        g = build_graph(
            edges_ds, vertices_ds, num_parts=num_parts,
            partitioner=partitioner, directed=False,
        )
    ctx = {"partitioner": g.partitioner, "num_parts": g.num_parts,
           "ckpt_every": ckpt_every}
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(
        g, CommunityLPA(), ctx, max_supersteps=rounds + 1,
        ckpt_dir=ckpt_dir, resume=resume,
    )
    labels = res.state_dataset().select_columns(["vid", "label"])
    return res, labels


def label_propagation(
    edges_ds=None,
    g: LinkGraph | None = None,
    vertices_ds=None,
    num_parts: int = 16,
    partitioner: str = "hash",
    max_supersteps: int = 500,
    ckpt_dir: str | None = None,
    resume: bool = True,
    ckpt_every: int = 1,
    engine: str = "dataset",
):
    """Vertex-level min-label LPA on the undirected closure.
    Returns (BSPResult, labels Dataset (vid, label))."""
    if g is None:
        g = build_graph(
            edges_ds, vertices_ds, num_parts=num_parts, partitioner=partitioner,
            directed=False,
        )
    ctx = {"partitioner": g.partitioner, "num_parts": g.num_parts, "ckpt_every": ckpt_every}
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(
        g, MinLabelLPA(), ctx, max_supersteps=max_supersteps, ckpt_dir=ckpt_dir,
        resume=resume,
    )
    labels = res.state_dataset().select_columns(["vid", "label"])
    return res, labels
