"""Deterministic distributed greedy graph coloring — Jones-Plassmann with
splitmix64 vertex priorities, one BSP job on the task engine.

The reference has no coloring sample (like MIS, it is a canonical BSP
symmetry-breaking primitive of the literature the reference's samples come
from — Jones & Plassmann 1993); this is a builder-brief graph operator,
the scheduling/register-allocation sibling of ``algos.mis``. Priorities
are splitmix64(vid XOR seed) — a BIJECTION on uint64, so the priority
order is total and the result fully deterministic (mirrored bit-for-bit in
SQL via the shared ``_sm64`` kernel, unrolled rounds like the MIS oracle).

Protocol (min-splitmix-priority first): a vertex colors itself the
superstep after ALL its higher-priority (smaller splitmix) neighbours have
announced their colors, taking color = mex{announced colors} (mex =
smallest non-negative integer not in the set), then announces to its
LOWER-priority neighbours only. Because the priority order is total, a
vertex's lower-priority neighbours are never colored before it, so the
mex ranges over exactly its earlier neighbours — the classic sequential
greedy (first-fit) coloring in priority order. Each vertex sends ONCE, so
total message volume is exactly E rows for the whole run, and the
superstep count is the depth of the decreasing-priority DAG —
O(log n / log log n) expected on bounded-degree graphs.

Used colors per vertex are tracked in a fixed 4x64-bit register block
(mask columns m0..m3): colors are bounded by max-degree+1 but first-fit
colors in practice track the clique-ish local density; a received color
>= 256 raises rather than silently truncating (raise ``MASK_WORDS``).

Why BSP, not Dataset dataflow: each round's work is a handful of
numpy kernels per shard; the task engine's fixed per-round cost is
milliseconds, while a Dataset-op formulation of the same round (winner
min-reduce, mex groupby, two semi-join prunes...) costs ~15 fixed
executions/round — the documented many-cheap-rounds profile (see
BASELINE.md scc: 5.9 s tasks vs 22.9 s dataset at sf0.01).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.algos.mis import _pri  # the shared symmetry-breaking priority
from raylink.graph import LinkGraph, build_graph
from raylink.superstep import Algorithm, run_bsp, sort_msgs
from raylink.superstep_tasks import run_bsp_tasks
from raylink.util import route_parts

MASK_WORDS = 4  # 256 trackable colors


class JPColoring(Algorithm):
    name = "jp_coloring"
    msg_fields = [("color", pa.int64())]

    def __init__(self, seed: int = 0) -> None:
        self.seed = np.uint64(seed)

    def init(self, shard: dict, ctx: dict) -> dict:
        vids, indptr, indices = shard["vids"], shard["indptr"], shard["indices"]
        n = len(vids)
        # distinct non-self neighbours with smaller priority, per vertex
        deg = np.diff(indptr)
        seg = np.repeat(np.arange(n, dtype=np.int64), deg)
        nbr = indices.astype(np.int64, copy=False)
        order = np.lexsort((nbr, seg))
        s2, n2 = seg[order], nbr[order]
        keep = np.r_[np.ones(min(len(s2), 1), dtype=bool),
                     (s2[1:] != s2[:-1]) | (n2[1:] != n2[:-1])]
        s2, n2 = s2[keep], n2[keep]
        notself = n2 != vids[s2]
        s2, n2 = s2[notself], n2[notself]
        higher = _pri(n2, self.seed) < _pri(vids[s2], self.seed)
        state = {
            "color": np.full(n, -1, dtype=np.int64),
            "jp_round": np.full(n, -1, dtype=np.int64),
            "seen": np.zeros(n, dtype=np.int64),
            "n_higher": np.bincount(
                s2[higher], minlength=n
            ).astype(np.int64),
        }
        for w in range(MASK_WORDS):
            state[f"m{w}"] = np.zeros(n, dtype=np.uint64)
        return state

    def step(self, s: int, shard: dict, state: dict, msgs: pa.Table, ctx: dict):
        from raylink.ops.sketch import _bitlen_u64

        vids, indptr, indices = shard["vids"], shard["indptr"], shard["indices"]
        n = len(vids)
        color = np.asarray(state["color"], dtype=np.int64).copy()
        jp_round = np.asarray(state["jp_round"], dtype=np.int64).copy()
        seen = np.asarray(state["seen"], dtype=np.int64).copy()
        n_higher = np.asarray(state["n_higher"], dtype=np.int64)
        masks = [
            np.asarray(state[f"m{w}"], dtype=np.uint64).copy()
            for w in range(MASK_WORDS)
        ]
        if s > 0 and msgs.num_rows:
            # one row per (announcing higher-pri neighbour, dst): count
            # them toward seen and set their color bits
            msgs = sort_msgs(msgs, ["dst", "color"])
            d = msgs.column("dst").to_numpy(zero_copy_only=False)
            c = msgs.column("color").to_numpy(zero_copy_only=False)
            if c.max(initial=0) >= 64 * MASK_WORDS:
                raise RuntimeError(
                    f"jp_coloring: received color {int(c.max())} >= "
                    f"{64 * MASK_WORDS} — raise MASK_WORDS"
                )
            pos = np.searchsorted(vids, d)
            seen += np.bincount(pos, minlength=n)
            widx = (c >> 6).astype(np.int64)
            bit = np.uint64(1) << (c.astype(np.uint64) & np.uint64(63))
            for w in range(MASK_WORDS):
                mw = widx == w
                if mw.any():
                    np.bitwise_or.at(masks[w], pos[mw], bit[mw])
        ready = (color == -1) & (seen == n_higher)
        newly = np.flatnonzero(ready)
        out = None
        if len(newly):
            # mex = first zero bit of the used-color mask
            m = np.stack([mk[newly] for mk in masks], axis=1)
            inv = ~m
            nz = inv != np.uint64(0)
            if not nz.any(axis=1).all():
                raise RuntimeError(
                    "jp_coloring: a vertex's neighbours use all "
                    f"{64 * MASK_WORDS} trackable colors — raise MASK_WORDS"
                )
            widx = np.argmax(nz, axis=1)
            w = inv[np.arange(len(newly)), widx]
            low = w & (np.uint64(0) - w)
            mex = widx * 64 + (_bitlen_u64(low) - 1)
            color[newly] = mex
            jp_round[newly] = s
            # announce ONCE, to lower-priority distinct non-self neighbours
            deg = np.diff(indptr)
            selm = np.repeat(ready, deg)
            dst = indices[selm].astype(np.int64, copy=False)
            src = np.repeat(vids, deg)[selm]
            col = np.repeat(color, deg)[selm]
            keep = (dst != src) & (_pri(dst, self.seed) > _pri(src, self.seed))
            dst, src, col = dst[keep], src[keep], col[keep]
            if len(dst):
                order = np.lexsort((dst, src))
                dst, src, col = dst[order], src[order], col[order]
                uniq = np.r_[True, (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])]
                dst, col = dst[uniq], col[uniq]
                out = self.make_msgs(
                    route_parts(shard, ctx, dst), dst, color=col
                )
        state = {
            "color": color, "jp_round": jp_round, "seen": seen,
            "n_higher": n_higher,
        }
        for w in range(MASK_WORDS):
            state[f"m{w}"] = masks[w]
        return state, out, int((color == -1).sum()), 0.0


def jp_coloring(
    edges_ds=None,
    g: LinkGraph | None = None,
    vertices_ds=None,
    seed: int = 0,
    num_parts: int = 16,
    partitioner: str = "hash",
    max_rounds: int = 32,
    ckpt_dir: str | None = None,
    resume: bool = True,
    ckpt_every: int = 1,
    engine: str = "tasks",
):
    """Greedy (first-fit, splitmix64-priority-order) proper coloring of the
    undirected simple graph. Returns (BSPResult, Dataset (vid, color,
    jp_round)); isolated vertices get color 0 in round 0. Raises if
    ``max_rounds`` supersteps leave uncolored vertices (deterministic —
    a rerun hits the same count; raise ``max_rounds`` and keep the SQL
    oracle's unroll in lockstep)."""
    if g is None:
        g = build_graph(
            edges_ds, vertices_ds, num_parts=num_parts,
            partitioner=partitioner, directed=False,
        )
    ctx = {"partitioner": g.partitioner, "num_parts": g.num_parts,
           "ckpt_every": ckpt_every}
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(
        g, JPColoring(seed=seed), ctx, max_supersteps=max_rounds,
        ckpt_dir=ckpt_dir, resume=resume,
    )
    if res.history and res.history[-1]["n_active"] > 0:
        raise RuntimeError(
            f"jp_coloring: {res.history[-1]['n_active']} vertices uncolored "
            f"after {max_rounds} supersteps — raise max_rounds"
        )
    out = res.state_dataset().select_columns(["vid", "color", "jp_round"])
    return res, out
