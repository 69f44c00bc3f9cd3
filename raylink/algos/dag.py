"""DAG layering (longest-path depth) and SCC-condensation layers.

``longest_path_layers`` assigns every vertex of a DAG its longest-path
depth — layer(v) = max #edges over all paths ending at v (sources are 0) —
as ONE BSP max-propagation job: every vertex starts at 0 and pushes
``layer + 1`` to its out-neighbors (combined per destination with max); a
vertex that grows re-pushes; the job halts when no message raises anyone.
Supersteps = DAG depth. All-integer, so bit-exact across engines and
partitionings. A cycle would never quiesce — the ``max_supersteps`` cap
turns that into a loud RuntimeError instead of a wrong answer.

``condensation_layers`` composes it with SCC: label every vertex with its
strongly connected component, contract the edge set to the distinct
cross-component (condensation) edges — acyclic by construction — and layer
that DAG. The layer of a page is the bow-tie depth of its SCC: 0 = the
IN-side frontier, max = the deepest OUT tendril; the classic crawl-graph
stratification (Broder et al. 2000, public).

Reference analog: none (the reference has no DAG ops); the meta-graph
contraction mirrors the engine's own meta-LinkGraph pattern
(graph.py meta_edges / queries.q_meta_diameter).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.superstep import Algorithm, run_bsp
from raylink.superstep_tasks import run_bsp_tasks
from raylink.util import route_parts


class LayerProp(Algorithm):
    """Max-propagation longest-path layering over a directed graph.
    State: ``layer`` int64 per owned vid. ctx: num_parts, partitioner."""

    name = "dag_layers"
    msg_fields = [("val", pa.int64())]

    def init(self, shard: dict, ctx: dict) -> dict:
        return {"layer": np.zeros(len(shard["vids"]), dtype=np.int64)}

    def _push(self, shard: dict, ctx: dict, layer: np.ndarray, grew: np.ndarray):
        """Push layer+1 along out-edges of grown vertices, pre-maxed per
        destination (sendToNeighbors combine)."""
        indptr, indices = shard["indptr"], shard["indices"]
        starts = indptr[:-1][grew]
        cnts = (indptr[1:] - indptr[:-1])[grew]
        total = int(cnts.sum())
        if total == 0:
            return None
        ofs = np.repeat(np.cumsum(cnts) - cnts, cnts)
        idx = np.repeat(starts, cnts) + np.arange(total, dtype=np.int64) - ofs
        dst = indices[idx]
        cand = np.repeat(layer[grew] + 1, cnts)
        order = np.lexsort((cand, dst))
        dst, cand = dst[order], cand[order]
        last = np.concatenate([dst[1:] != dst[:-1], [True]])  # max per dst
        dst, cand = dst[last], cand[last]
        return self.make_msgs(route_parts(shard, ctx, dst), dst, val=cand)

    def step(self, s, shard, state, msgs, ctx):
        vids = shard["vids"]
        layer = np.array(state["layer"], np.int64)  # copy: state is read-only
        if s == 0:
            out = self._push(shard, ctx, layer,
                             np.ones(len(vids), dtype=bool))
            return {"layer": layer}, out, len(vids), 1.0
        if msgs.num_rows == 0:
            return {"layer": layer}, None, 0, 0.0
        dst = msgs.column("dst").to_numpy(zero_copy_only=False)
        val = msgs.column("val").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(vids, dst)
        best = np.zeros(len(vids), dtype=np.int64)
        np.maximum.at(best, pos, val)
        grew = best > layer
        n_grew = int(grew.sum())
        if n_grew == 0:
            return {"layer": layer}, None, 0, 0.0
        layer[grew] = best[grew]
        out = self._push(shard, ctx, layer, grew)
        return {"layer": layer}, out, n_grew, float(n_grew)


def longest_path_layers(
    edges_ds=None,
    vertices_ds=None,
    g=None,
    num_parts: int = 8,
    partitioner: str = "hash",
    max_supersteps: int = 200,
    ckpt_dir: str | None = None,
    engine: str = "tasks",
):
    """Layer a DAG; returns (BSPResult, Dataset (vid, layer)). Raises on
    cycles (the job cannot quiesce within ``max_supersteps``)."""
    from raylink.graph import build_graph

    if g is None:
        g = build_graph(edges_ds, vertices_ds, num_parts=num_parts,
                        partitioner=partitioner, directed=True)
    ctx = {"num_parts": g.num_parts, "partitioner": g.partitioner}
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(g, LayerProp(), ctx, max_supersteps=max_supersteps,
               ckpt_dir=ckpt_dir)
    if res.history and res.history[-1]["msgs_out"] > 0:
        raise RuntimeError(
            f"longest_path_layers: no quiescence in {max_supersteps} "
            "supersteps — the input graph has a cycle (or raise the cap)"
        )
    return res, res.state_dataset().select_columns(["vid", "layer"])


def condensation_edges(edges_ds, comps_ds, n_vertices: int):
    """Distinct edges of the SCC condensation DAG: every directed page
    edge mapped to (scc(src), scc(dst)), cross-component only, exact-dedup
    via the packed-key groupby. ``comps_ds`` is (vid, scc) from
    ``algos.scc.scc``; ``n_vertices`` sizes the thresholded label attach
    (broadcast below the vertex threshold, hash_join above). The
    acyclic skeleton the bow-tie/layering queries run on."""
    from raylink.join import attach_lookup
    from raylink.pipelines import distinct_edges

    lab = comps_ds.map_batches(
        lambda b: pa.table({"key": b.column("vid"), "lab": b.column("scc")}),
        batch_format="pyarrow",
    )
    e = edges_ds.map_batches(
        lambda b: pa.table({"key": b.column("src"), "dst": b.column("dst")}),
        batch_format="pyarrow",
    )
    e = attach_lookup(
        e, lab, on="key", left_cols={"dst": pa.int64()},
        value_cols={"lab": pa.int64()}, n_lookup_rows=n_vertices,
    ).map_batches(
        lambda b: pa.table({"key": b.column("dst"), "ls": b.column("lab")}),
        batch_format="pyarrow",
    )
    e = attach_lookup(
        e, lab, on="key", left_cols={"ls": pa.int64()},
        value_cols={"lab": pa.int64()}, n_lookup_rows=n_vertices,
    )

    def cross(b: pa.Table) -> pa.Table:
        ls = b.column("ls").to_numpy(zero_copy_only=False)
        ld = b.column("lab").to_numpy(zero_copy_only=False)
        keep = ls != ld
        return pa.table({"src": pa.array(ls[keep]), "dst": pa.array(ld[keep])})

    return distinct_edges(e.map_batches(cross, batch_format="pyarrow"))


def condensation_layers(
    edges_ds,
    comps_ds,
    n_vertices: int,
    num_parts: int = 8,
    max_supersteps: int = 200,
    ckpt_dir: str | None = None,
    engine: str = "tasks",
):
    """Bow-tie depth of every vertex's SCC. ``comps_ds`` is (vid, scc)
    from ``algos.scc.scc``; ``n_vertices`` sizes the label attach.
    Returns a Dataset (vid, scc, layer) — layer of the vertex's component
    in the condensation DAG (isolated components sit at their longest
    incoming chain, 0 when none)."""
    from raylink.join import attach_lookup, bucketed_distinct

    cond = condensation_edges(edges_ds, comps_ds, n_vertices)
    comp_ids = bucketed_distinct(
        comps_ds.map_batches(
            lambda b: pa.table({"vid": b.column("scc")}),
            batch_format="pyarrow",
        ),
        "vid",
    )
    _, layers = longest_path_layers(
        cond, comp_ids, num_parts=num_parts,
        max_supersteps=max_supersteps, ckpt_dir=ckpt_dir, engine=engine,
    )
    lay = layers.map_batches(
        lambda b: pa.table({"key": b.column("vid"), "layer": b.column("layer")}),
        batch_format="pyarrow",
    )
    out = comps_ds.map_batches(
        lambda b: pa.table({"key": b.column("scc"), "vid": b.column("vid")}),
        batch_format="pyarrow",
    )
    out = attach_lookup(
        out, lay, on="key", left_cols={"vid": pa.int64()},
        value_cols={"layer": pa.int64()}, n_lookup_rows=n_vertices,
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "vid": b.column("vid"),
                "scc": b.column("key"),
                "layer": b.column("layer"),
            }
        ),
        batch_format="pyarrow",
    )
