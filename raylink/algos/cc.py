"""Connected components — subgraph-centric, like the reference.

sample-hama/.../ConnectedComponents.java:45-120 runs min-label propagation
over the META-GRAPH of subgraphs (one node per within-partition WCC), which
converges in O(meta-diameter) supersteps instead of O(graph-diameter) — the
reference's core "think like a subgraph" win (README.md:3).

Pipeline:
  1. build undirected LinkGraph  (per-partition union-find -> subgraphs)
  2. ``meta_edges``                (remote-sgid resolution as one hash join)
  3. MinLabelLPA over the meta-graph, vertex id == subgraph's min vid
     (globally unique; the final label is therefore the component's min vid,
     partitioning-invariant and SQL-checkable)
  4. join the (sg -> component) map back onto the vertex table via the
     thresholded ``attach_lookup``: broadcast while the meta-graph is small
     (the usual case), automatic switch to the distributed hash join when a
     fragmented crawl produces a dataset-sized subgraph count
     (``g.n_subgraphs`` is known from the manifest, so the choice is free).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.algos.lpa import MinLabelLPA
from raylink.graph import LinkGraph, build_graph, meta_edges, vertex_table
from raylink.superstep import run_bsp
from raylink.superstep_tasks import run_bsp_tasks


def connected_components(
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
    broadcast_threshold: int | None = None,
):
    """Returns (BSPResult of the meta-graph LPA, Dataset (vid, component))
    where component = min vid of the vertex's weakly connected component."""
    from raylink.join import BROADCAST_THRESHOLD, attach_lookup

    if broadcast_threshold is None:
        broadcast_threshold = BROADCAST_THRESHOLD
    if g is None:
        g = build_graph(
            edges_ds, vertices_ds, num_parts=num_parts, partitioner=partitioner,
            directed=False,
        )
    me = meta_edges(g).map_batches(
        lambda b: pa.table({"src": b.column("src_sg"), "dst": b.column("dst_sg")}),
        batch_format="pyarrow",
    )
    # meta vertex universe: every subgraph (isolated ones have no meta edge)
    sg_verts = (
        vertex_table(g)
        .map_batches(
            lambda b: pa.table({"vid": np.unique(b.column("sg_minvid").to_numpy(zero_copy_only=False))}),
            batch_format="pyarrow",
        )
    )
    g_meta = build_graph(
        me,
        sg_verts,
        num_parts=min(g.num_parts, 8),
        partitioner="hash",
        directed=True,  # meta edge set is already symmetric
    )
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(
        g_meta,
        MinLabelLPA(),
        {"partitioner": g_meta.partitioner, "num_parts": g_meta.num_parts, "ckpt_every": ckpt_every},
        max_supersteps=max_supersteps,
        ckpt_dir=ckpt_dir,
        resume=resume,
    )
    labels_ds = res.state_dataset().map_batches(
        lambda b: pa.table({"sg_minvid": b.column("vid"), "component": b.column("label")}),
        batch_format="pyarrow",
    )
    verts = vertex_table(g).map_batches(
        lambda b: pa.table({"sg_minvid": b.column("sg_minvid"), "vid": b.column("vid")}),
        batch_format="pyarrow",
    )
    joined = attach_lookup(
        verts, labels_ds, on="sg_minvid",
        left_cols={"vid": pa.int64()}, value_cols={"component": pa.int64()},
        n_lookup_rows=g.n_subgraphs, broadcast_threshold=broadcast_threshold,
    )
    comps = joined.map_batches(
        lambda b: pa.table({"vid": b.column("vid"), "component": b.column("component")}),
        batch_format="pyarrow",
    )
    return res, comps
