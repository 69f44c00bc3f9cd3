"""HyperANF — approximate neighborhood function / effective diameter.

The classic web-graph-scale distance measurement (Boldi, Rosa, Vigna,
"HyperANF: Approximate Neighborhood Function" WWW 2011, building on ANF,
Palmer et al. KDD 2002): every vertex carries a HyperLogLog counter of the
vertices within distance t; one BSP round replaces each counter with the
elementwise MAX of its own and its in-neighbors' counters, so after t
rounds vertex v's counter estimates |{u : dist(u→v) <= t}| (the in-ball —
summing in-balls over v equals summing out-balls over u, so the GLOBAL
neighborhood function N(t) = #pairs within distance t is identical to the
push-out formulation). Exact N(t) needs O(V^2) BFS; this is m=2^p integers
per vertex, merged with MAX — the sketch makes the web-scale measurement
feasible, which is why it sits beside HLL/CMS/Bloom in ops/sketch.py.

Reference analog: none (the reference has no sketches; its diameter probe,
mirrored by queries.q_meta_diameter, is exact seed-sampled BFS). The item
hash is the mirrored ``splitmix64(vid)`` kernel and registers follow
``ops.sketch.hll_ranks``, so per-vertex registers are DETERMINISTIC and the
whole run is register-exactly SQL-mirrorable (oracles_sql.hyperanf_sql:
unrolled sparse max-merge rounds).

Engine shape: per-vertex state = m uint8 ranks packed little-endian into
m/8 int64 state columns (pack/unpack is a numpy view — no copies; layout is
only ever read back on the same-endianness cluster, and the SQL oracle
works in the sparse (reg, rank) domain so nothing semantic depends on it).
Messages carry the packed registers of CHANGED vertices only (delta
propagation, like LPA), max-combined per destination BEFORE the shuffle via
sort + ``np.maximum.reduceat`` (vectorized; ``ufunc.at`` is a scalar loop).
Convergence: a vertex is active only while some register grew, so the job
halts by itself at the (in-)eccentricity bound even without ``rounds``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.graph import LinkGraph, build_graph
from raylink.ops.sketch import RANK_CAP, hll_ranks
from raylink.superstep import Algorithm, run_bsp
from raylink.superstep_tasks import run_bsp_tasks
from raylink.util import route_parts, round_half_away, splitmix64


class HyperANF(Algorithm):
    name = "hyperanf"

    def __init__(self, p: int = 6) -> None:
        if p < 3:
            raise ValueError("hyperanf needs p >= 3 (m divisible by 8)")
        self.p = p
        self.m = 1 << p
        self.nw = self.m // 8  # packed int64 words per vertex
        self.msg_fields = [(f"r{i}", pa.int64()) for i in range(self.nw)]

    # ---------------------------------------------------- pack / unpack
    def _pack(self, regs: np.ndarray) -> dict:
        packed = np.ascontiguousarray(regs).view(np.int64)
        return {f"r{i}": packed[:, i].copy() for i in range(self.nw)}

    def _unpack(self, cols, n: int) -> np.ndarray:
        packed = np.empty((n, self.nw), dtype=np.int64)
        for i in range(self.nw):
            packed[:, i] = np.asarray(cols[f"r{i}"], dtype=np.int64)
        return packed.view(np.uint8)

    def _unpack_msgs(self, msgs: pa.Table) -> np.ndarray:
        packed = np.empty((msgs.num_rows, self.nw), dtype=np.int64)
        for i in range(self.nw):
            packed[:, i] = msgs.column(f"r{i}").to_numpy(zero_copy_only=False)
        return packed.view(np.uint8)

    @staticmethod
    def _segmax(rows: np.ndarray, regs: np.ndarray, dsts: np.ndarray):
        """(row targets, (k,m) registers) -> (unique sorted targets,
        per-target elementwise max). Sort + reduceat: vectorized across
        the register axis, no python/ufunc.at scalar loop."""
        order = np.argsort(dsts, kind="stable")
        ds = dsts[order]
        starts = np.flatnonzero(np.concatenate(([True], ds[1:] != ds[:-1])))
        uniq = ds[starts]
        acc = np.maximum.reduceat(regs[rows[order]], starts, axis=0)
        return uniq, acc

    # ----------------------------------------------------------- BSP API
    def init(self, shard: dict, ctx: dict) -> dict:
        vids = shard["vids"]
        n = len(vids)
        regs = np.zeros((n, self.m), dtype=np.uint8)
        reg, rank = hll_ranks(splitmix64(vids.astype(np.uint64)), self.p)
        regs[np.arange(n), reg] = rank.astype(np.uint8)
        return self._pack(regs)

    def step(self, s: int, shard: dict, state: dict, msgs: pa.Table, ctx: dict):
        vids, indptr, indices = shard["vids"], shard["indptr"], shard["indices"]
        n = len(vids)
        regs = self._unpack(state, n)
        if s == 0:
            changed = np.ones(n, dtype=bool)
        else:
            changed = np.zeros(n, dtype=bool)
            if msgs.num_rows:
                d = msgs.column("dst").to_numpy(zero_copy_only=False)
                mregs = self._unpack_msgs(msgs)
                upos, acc = self._segmax(
                    np.arange(len(d), dtype=np.int64), mregs, d
                )
                pos = np.searchsorted(vids, upos)
                grew = acc > regs[pos]
                rows = np.flatnonzero(grew.any(axis=1))
                if len(rows):
                    # _unpack allocated fresh arrays, so in-place is safe
                    regs[pos[rows]] = np.maximum(regs[pos[rows]], acc[rows])
                    changed[pos[rows]] = True
        state = self._pack(regs)
        out = None
        if changed.any():
            deg = np.diff(indptr)
            sel = np.repeat(changed, deg)
            dst = indices[sel]
            if len(dst):
                src_rows = np.repeat(
                    np.arange(n, dtype=np.int64), deg
                )[sel]
                dsts, acc = self._segmax(src_rows, regs, dst)
                payload = {
                    f"r{i}": np.ascontiguousarray(acc).view(np.int64)[:, i]
                    for i in range(self.nw)
                }
                out = self.make_msgs(
                    route_parts(shard, ctx, dsts), dsts, **payload
                )
        return state, out, int(changed.sum()), 0.0

    def extra_metrics(self, state: dict, shard: dict, ctx: dict) -> dict:
        """Per-partition neighborhood-function partial: the sum of this
        partition's per-vertex ball estimates after the round. SUM-merged
        across partitions into the manifest history, so the full N(t)
        curve survives checkpoint GC at the cost of one float per round."""
        n = len(shard["vids"])
        _, _, est = _estimate_cols(self._unpack(state, n), self.p)
        return {"nf_sum": float(est.sum())}


def _estimate_cols(regs: np.ndarray, p: int):
    """(n, m) uint8 ranks -> (sum_t int64, n_zero int64, est float64
    rounded 6). Integer register sum (2^(RANK_CAP - min(rank, CAP)) terms),
    the standard HLL estimate with linear counting below 2.5m — the SAME
    expressions as ops.sketch.hll_estimate_from_registers, vectorized per
    vertex, and mirrored token-for-token in oracles_sql.hyperanf_sql."""
    m = 1 << p
    capped = np.minimum(regs.astype(np.int64), RANK_CAP)
    sum_t = (np.int64(1) << (RANK_CAP - capped)).sum(axis=1)
    n_zero = (regs == 0).sum(axis=1).astype(np.int64)
    raw = 0.7213 / (1.0 + 1.079 / m) * m * m * float(1 << RANK_CAP) / sum_t
    lin = np.zeros(len(regs))
    nzpos = n_zero > 0
    lin[nzpos] = m * np.log(m / n_zero[nzpos])
    est = np.where((raw <= 2.5 * m) & nzpos, lin, raw)
    return sum_t, n_zero, round_half_away(est, 6)


def ball_estimates(res, p: int = 6):
    """Per-vertex in-ball estimates from a finished HyperANF run's final
    state: Dataset (vid, sum_t, n_zero, est) — est ~ #vertices that reach
    vid within the rounds run. Pure map over the checkpointed state."""
    algo = HyperANF(p)

    def unpack(b: pa.Table) -> pa.Table:
        n = b.num_rows
        regs = algo._unpack(
            {f"r{i}": b.column(f"r{i}").to_numpy(zero_copy_only=False)
             for i in range(algo.nw)},
            n,
        )
        sum_t, n_zero, est = _estimate_cols(regs, p)
        return pa.table(
            {
                "vid": b.column("vid"),
                "sum_t": pa.array(sum_t),
                "n_zero": pa.array(n_zero),
                "est": pa.array(est),
            }
        )

    return res.state_dataset().map_batches(unpack, batch_format="pyarrow")


def hyperanf(
    edges_ds=None,
    g: LinkGraph | None = None,
    vertices_ds=None,
    num_parts: int = 16,
    partitioner: str = "hash",
    p: int = 6,
    rounds: int = 8,
    ckpt_dir: str | None = None,
    resume: bool = True,
    ckpt_every: int = 1,
    engine: str = "dataset",
):
    """Run HyperANF for ``rounds`` merge rounds (or to self-halt, whichever
    first). Returns (BSPResult, Dataset (vid, sum_t, n_zero, est))."""
    if g is None:
        g = build_graph(
            edges_ds, vertices_ds, num_parts=num_parts,
            partitioner=partitioner, directed=True,
        )
    ctx = {
        "partitioner": g.partitioner,
        "num_parts": g.num_parts,
        "ckpt_every": ckpt_every,
    }
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(
        g, HyperANF(p), ctx, max_supersteps=rounds + 1,
        ckpt_dir=ckpt_dir, resume=resume,
    )
    return res, ball_estimates(res, p)


def neighborhood_function(res, alpha: float = 0.9) -> tuple[list, float]:
    """The global ANF curve N(t) = sum over vertices of the round-t ball
    estimate, read from the run's manifest history (each round's
    ``nf_sum`` extra metric is the per-partition estimate sum, SUM-merged
    by the engine — the curve survives checkpoint GC without retaining
    old state rounds), plus the effective diameter: the smallest t with
    N(t) >= alpha * N(t_last), linearly interpolated between rounds as in
    the ANF papers. Partition-sum order fixes the float association; the
    curve is an estimate, not an oracle surface — the register-exact
    per-vertex view is ``ball_estimates``."""
    curve = [h["nf_sum"] for h in res.history]
    target = alpha * curve[-1]
    eff = float(len(curve) - 1)
    for t, v in enumerate(curve):
        if v >= target:
            if t == 0 or curve[t] == curve[t - 1]:
                eff = float(t)
            else:  # interpolate within the round that crossed
                eff = (t - 1) + (target - curve[t - 1]) / (
                    curve[t] - curve[t - 1]
                )
            break
    return curve, eff
