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
