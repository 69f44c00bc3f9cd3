"""Single-pass core decomposition — Montresor-style estimate refinement.

Faithful to the reference's distributed k-core family
(sample-hama/.../KCore.java:35-146, KCoreFast.java:35-145, KCoreSort.java):

- each vertex keeps its own core estimate, initialised to its degree
  (KCore.java init), and a per-neighbour estimate table initialised to
  "unknown = +inf" (the KCoreFast Integer.MAX_VALUE trick, KCoreFast.java:55);
- per superstep it applies incoming neighbour updates, then recomputes its
  estimate as the largest k with >= k neighbours whose (capped) estimate is
  >= k — computed with the histogram trick (KCoreFast.processVertex
  :77-91, vectorized here with bincount);
- on decrease it notifies all neighbours (messages carry (src, core) so the
  receiver can index its per-neighbour table); halt when nothing decreases.

Per-neighbour state is an edge-aligned array persisted via the superstep
drivers' aux-state sidecar (same checkpoint/resume guarantees). Message
volume: round 0 sends one update per edge; later rounds only the decreasing
frontier. Converges to exact coreness (monotone decreasing estimates bounded
below by the true core number).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.graph import LinkGraph, build_graph
from raylink.superstep import Algorithm, run_bsp
from raylink.superstep_tasks import run_bsp_tasks
from raylink.util import route_parts

_BIG = np.int64(2**31)


def _edge_keys(shard: dict) -> np.ndarray:
    """Sorted (local_src << 32 | dst) key per CSR edge (CSR is (src,dst)
    sorted, so this array is globally sorted)."""
    n = len(shard["vids"])
    lsrc = np.repeat(np.arange(n, dtype=np.int64), np.diff(shard["indptr"]))
    return (lsrc << np.int64(32)) | shard["indices"]


def _recompute(est_slice: np.ndarray, cap: int) -> int:
    """Largest k with >= k entries >= k, entries capped at `cap`
    (KCoreFast histogram trick, vectorized)."""
    d = len(est_slice)
    if d == 0:
        return 0
    capped = np.minimum(est_slice, cap).astype(np.int64)
    capped = np.minimum(capped, d)
    hist = np.bincount(np.maximum(capped, 0), minlength=d + 1)
    cum = 0
    for k in range(d, 0, -1):
        cum += hist[k]
        if cum >= k:
            return k
    return 0


class KCoreMontresor(Algorithm):
    name = "coreness_montresor"
    msg_fields = [("src", pa.int64()), ("core", pa.int64())]

    def init(self, shard: dict, ctx: dict) -> dict:
        deg = np.diff(shard["indptr"]).astype(np.int64)
        est = np.full(len(shard["indices"]), _BIG, dtype=np.int64)
        return {"core": deg, "est": est}

    def step(self, s: int, shard: dict, state: dict, msgs: pa.Table, ctx: dict):
        vids, indptr, indices = shard["vids"], shard["indptr"], shard["indices"]
        core = np.asarray(state["core"], dtype=np.int64).copy()
        est = np.asarray(state["est"], dtype=np.int64).copy()
        dirty = np.zeros(len(vids), dtype=bool)
        if s == 0:
            changed = np.ones(len(vids), dtype=bool)  # broadcast initial cores
        else:
            changed = np.zeros(len(vids), dtype=bool)
            if msgs.num_rows:
                d = msgs.column("dst").to_numpy(zero_copy_only=False)
                src = msgs.column("src").to_numpy(zero_copy_only=False)
                c = msgs.column("core").to_numpy(zero_copy_only=False)
                ld = np.searchsorted(vids, d)
                keys = _edge_keys(shard)
                pos = np.searchsorted(keys, (ld << np.int64(32)) | src)
                # estimates only decrease -> order-independent (min)
                np.minimum.at(est, pos, c)
                dirty[ld] = True
            # recompute dirty vertices
            for v in np.flatnonzero(dirty):
                sl = est[indptr[v] : indptr[v + 1]]
                new = _recompute(sl, int(core[v]))
                if new < core[v]:
                    core[v] = new
                    changed[v] = True
        out = None
        if np.any(changed):
            deg = np.diff(indptr)
            sel = np.repeat(changed, deg)
            dst = indices[sel]
            srcv = np.repeat(vids, deg)[sel]
            corev = np.repeat(core, deg)[sel]
            if len(dst):
                out = self.make_msgs(
                    route_parts(shard, ctx, dst), dst, src=srcv, core=corev
                )
        return {"core": core, "est": est}, out, int(changed.sum()), 0.0


def coreness_montresor(
    edges_ds=None,
    g: LinkGraph | None = None,
    vertices_ds=None,
    num_parts: int = 16,
    partitioner: str = "hash",
    max_supersteps: int = 500,
    ckpt_dir: str | None = None,
    resume: bool = True,
    engine: str = "tasks",
):
    """Returns (BSPResult, Dataset (vid, core)) — exact core numbers in one
    BSP job (vs one peeling job per k in ``coreness``)."""
    if g is None:
        g = build_graph(
            edges_ds, vertices_ds, num_parts=num_parts, partitioner=partitioner,
            directed=False,
        )
    ctx = {"partitioner": g.partitioner, "num_parts": g.num_parts}
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(g, KCoreMontresor(), ctx, max_supersteps=max_supersteps,
               ckpt_dir=ckpt_dir, resume=resume)
    cores = res.state_dataset().select_columns(["vid", "core"])
    return res, cores
