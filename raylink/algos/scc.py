"""Strongly connected components — forward-backward coloring, one BSP job.

The reference ships only weakly-connected components
(sample-hama/.../ConnectedComponents.java); SCC is the directed-graph
analytics gap. This is the distributed FB-coloring algorithm (Orzan-style
peeling; the standard Pregel formulation — public literature), expressed on
the existing superstep engine:

  peel:
    FWD  max-color propagation over the UNASSIGNED subgraph to fixpoint
         (color(v) = max unassigned vid with a directed path to v through
         unassigned vertices);
    BWD  every root r (color == vid) starts a reverse-BFS capture inside its
         color region; captured vertices get scc = r.  For each region only
         the root's SCC is captured per peel, and r is provably the MAX vid
         of that SCC (all members reach each other, so the max member's vid
         dominates every member's color, and r is a member).
  repeat until no unassigned vertices remain.

Both directions live in ONE LinkGraph: each undeduplicated input edge (u,v)
contributes CSR rows (u,v,bit0) and (v,u,bit1), mask-summed per (src,dst)
pair before the build, persisted as the typed edge value ``e_dirmask``
(graph.py edge_cols) — so a superstep masks the CSR instead of juggling two
graphs with different shard caches.

Phase state lives on the DRIVER: ``Algorithm.halted`` (called between
rounds with the global metrics) flips ctx["phase"] / ctx["phase_start"],
and the next round's runners are pickled with the updated ctx. Resume
replays the recorded manifest history through the same transition rule
(``replay_phase``) to recover the phase deterministically — checkpoints
stay pure per-vertex state.

Scale notes: message volume per peel is bounded by E (each vertex sends
once per change; max-combine per destination before the shuffle); the
known FB-coloring pathology is an id-descending chain (O(V) peels of one
vertex each) — real link graphs peel in a handful of rounds because the
giant SCC captures in peel one. n_active reports the unassigned count, so
progress is visible per round in the manifest metrics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.graph import LinkGraph, build_graph
from raylink.superstep import Algorithm, run_bsp
from raylink.util import unpack_hi, route_parts

_NEG = np.int64(-(2**62))


def scc_edges(edges_ds):
    """Distinct directed edges -> (src, dst, dirmask) rows for the dual
    graph: bit0 = original direction, bit1 = reversed. One packed-key
    groupby-sum (same 32-bit packing contract as ``distinct_edges``, guard
    included); both-direction pairs fold to mask 3."""
    from raylink.pipelines import distinct_edges
    from raylink.util import assert_packable

    de = distinct_edges(edges_ds)

    def both(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        assert_packable(s, "scc_edges src")
        assert_packable(d, "scc_edges dst")
        key = np.concatenate([(s << np.int64(32)) | d, (d << np.int64(32)) | s])
        mask = np.concatenate(
            [np.ones(len(s), np.int64), np.full(len(s), 2, np.int64)]
        )
        return pa.table({"key": pa.array(key), "dirmask": pa.array(mask)})

    def unpack(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(unpack_hi(k)),
                "dst": pa.array(k & np.int64(0xFFFFFFFF)),
                "dirmask": pa.array(
                    batch.column("sum(dirmask)")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.float64)
                ),
            }
        )

    return (
        de.map_batches(both, batch_format="pyarrow")
        .groupby("key")
        .sum("dirmask")
        .map_batches(unpack, batch_format="pyarrow")
    )


class SCCColoring(Algorithm):
    name = "scc"
    msg_fields = [("val", pa.int64())]

    def init(self, shard: dict, ctx: dict) -> dict:
        vids = shard["vids"]
        return {
            "scc": np.full(len(vids), -1, dtype=np.int64),
            "color": vids.astype(np.int64, copy=True),
        }

    @staticmethod
    def _dir_masks(shard: dict) -> tuple[np.ndarray, np.ndarray]:
        m = shard["e_dirmask"].astype(np.int64)
        return (m & 1) == 1, (m & 2) == 2

    def step(self, s: int, shard: dict, state: dict, msgs: pa.Table, ctx: dict):
        vids, indptr, indices = shard["vids"], shard["indptr"], shard["indices"]
        fwd_e, bwd_e = self._dir_masks(shard)
        scc = np.asarray(state["scc"], dtype=np.int64)
        color = np.asarray(state["color"], dtype=np.int64)
        unassigned = scc < 0
        phase, start = ctx["phase"], s == ctx["phase_start"]
        deg = np.diff(indptr)
        out = None

        if phase == "fwd":
            if start:
                color = np.where(unassigned, vids, color)
                changed = unassigned.copy()
            else:
                changed = np.zeros(len(vids), dtype=bool)
                if msgs.num_rows:
                    d = msgs.column("dst").to_numpy(zero_copy_only=False)
                    v = msgs.column("val").to_numpy(zero_copy_only=False)
                    pos = np.searchsorted(vids, d)
                    newc = color.copy()
                    np.maximum.at(newc, pos, v)
                    newc = np.where(unassigned, newc, color)
                    changed = newc > color
                    color = newc
            if changed.any():
                sel = np.repeat(changed, deg) & fwd_e
                dst = indices[sel]
                if len(dst):
                    cval = np.repeat(color, deg)[sel]
                    dsts, inv = np.unique(dst, return_inverse=True)
                    mx = np.full(len(dsts), _NEG, dtype=np.int64)
                    np.maximum.at(mx, inv, cval)
                    out = self.make_msgs(
                        route_parts(shard, ctx, dsts), dsts, val=mx
                    )
        else:  # bwd capture
            captured = np.zeros(len(vids), dtype=bool)
            if start:
                captured = unassigned & (color == vids)
            elif msgs.num_rows:
                d = msgs.column("dst").to_numpy(zero_copy_only=False)
                v = msgs.column("val").to_numpy(zero_copy_only=False)
                pos = np.searchsorted(vids, d)
                ok = unassigned[pos] & (color[pos] == v)
                captured[np.unique(pos[ok])] = True
            if captured.any():
                scc = scc.copy()
                scc[captured] = color[captured]
                unassigned = scc < 0
                sel = np.repeat(captured, deg) & bwd_e
                dst = indices[sel]
                if len(dst):
                    cval = np.repeat(color, deg)[sel]
                    order = np.lexsort((cval, dst))
                    dst, cval = dst[order], cval[order]
                    keep = np.ones(len(dst), dtype=bool)
                    keep[1:] = (dst[1:] != dst[:-1]) | (cval[1:] != cval[:-1])
                    dst, cval = dst[keep], cval[keep]
                    out = self.make_msgs(
                        route_parts(shard, ctx, dst), dst, val=cval
                    )

        return (
            {"scc": scc, "color": color},
            out,
            int(unassigned.sum()),
            0.0,
        )

    # ---- driver-side phase machine (pure function of the metrics stream)
    @staticmethod
    def _transition(phase: str, agg: dict, s: int) -> tuple[str, int] | None:
        """Next (phase, phase_start) after round ``s``'s metrics, or None if
        the phase continues / the job is done."""
        if agg["msgs_out"] == 0 and agg["n_active"] > 0:
            return ("bwd" if phase == "fwd" else "fwd", s + 1)
        return None

    def halted(self, agg: dict, s: int, ctx: dict) -> bool:
        if agg["msgs_out"] == 0 and agg["n_active"] == 0:
            return True
        nxt = self._transition(ctx["phase"], agg, s)
        if nxt is not None:
            ctx["phase"], ctx["phase_start"] = nxt
        return False

    @classmethod
    def replay_phase(cls, history: list[dict]) -> tuple[str, int]:
        """Reconstruct (phase, phase_start) from a manifest's per-round
        history — resume recovers driver phase state deterministically."""
        phase, start = "fwd", 0
        for h in history:
            nxt = cls._transition(phase, h, int(h["superstep"]))
            if nxt is not None:
                phase, start = nxt
        return phase, start


def scc(
    edges_ds=None,
    g: LinkGraph | None = None,
    vertices_ds=None,
    num_parts: int = 16,
    partitioner: str = "hash",
    max_supersteps: int = 500,
    ckpt_dir: str | None = None,
    resume: bool = True,
    graph_dir: str | None = None,
    engine: str = "dataset",
):
    """Strongly connected components of a directed edge Dataset.

    Returns (BSPResult, Dataset (vid, scc)) with scc = MAX vid of the
    vertex's strongly connected component. Pass either ``edges_ds``
    (+ optional ``vertices_ds`` for isolated vertices) or a prebuilt dual
    graph ``g`` (must carry ``e_dirmask``). ``engine="tasks"`` uses the
    raw-task exchange fast path — FB-coloring runs many cheap rounds, so
    the fixed per-round Dataset overhead dominates on the default engine
    (both engines evaluate ``halted`` per round, so phase flips and the
    resume replay behave identically)."""
    from raylink import storage
    from raylink.superstep import Checkpoint
    from raylink.superstep_tasks import run_bsp_tasks

    if g is None:
        g = build_graph(
            scc_edges(edges_ds),
            vertices_ds,
            num_parts=num_parts,
            partitioner=partitioner,
            directed=True,  # both directions are explicit rows
            edge_cols=["dirmask"],
            graph_dir=graph_dir,
        )
    ctx = {
        "partitioner": g.partitioner,
        "num_parts": g.num_parts,
        "phase": "fwd",
        "phase_start": 0,
        "ckpt_every": 1,  # phase flips are evaluated at round granularity
    }
    algo = SCCColoring()
    if resume and ckpt_dir is not None:
        man = Checkpoint(ckpt_dir, g.filesystem).read_manifest()
        if man is not None and man.get("algo") == algo.name:
            ctx["phase"], ctx["phase_start"] = SCCColoring.replay_phase(
                man.get("history", [])
            )
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(
        g, algo, ctx, max_supersteps=max_supersteps, ckpt_dir=ckpt_dir,
        resume=resume,
    )
    comps = res.state_dataset().select_columns(["vid", "scc"])
    return res, comps
