"""SALSA (Stochastic Approach for Link-Structure Analysis) hubs/authorities.

Lempel & Moran 2000 (public): the degree-normalized sibling of HITS — per
iteration

    auth(v) = sum_{u -> v} hub(u) / outdeg(u)   then L1-normalize auth
    hub(u)  = sum_{u -> v} auth(v) / indeg(v)   then L1-normalize hub

i.e. random-walk transition probabilities instead of raw adjacency, which
makes SALSA far less susceptible to the tightly-knit-community effect that
skews HITS on link-farmed web graphs. Reference analog: none (the reference
stops at PageRank-family scores); this is the other classic link-analysis
fixpoint a crawl pipeline wants next to HITS.

Runs on the same flag-tagged UNION graph as HITS (``hits.union_flag_edges``
-> ``build_graph(edge_cols=["flag"])``): auth contributions travel along
flag&1 edges, hub contributions along flag&2 edges, both plain BSP pushes.
Degrees come from per-partition flag-bit counts over the union CSR — equal
to the distinct directed edge degrees by construction.

Normalization is distributed and DEFERRED exactly like HITS: each phase
broadcasts the L1 of the raw SENDER vector as P tiny rows; receivers divide
both the received sums and the held previous-phase raw vector by it one
superstep later, so every stored vector is exactly L1-normalized one step
after it is produced (dangling mass is dropped, matching the SQL mirror).

Determinism: messages are sorted by (kind, dst, val) before reduction and
partials reduce in fixed partition order — bit-identical across runs and
parallelism levels; the SQL oracle differs only by float summation order
(absorbed by ROUND(.., 8), same argument as hits_sql).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.algos.hits import FWD, REV, union_flag_edges
from raylink.graph import LinkGraph, build_graph
from raylink.superstep import Algorithm, run_bsp, sort_msgs
from raylink.superstep_tasks import run_bsp_tasks
from raylink.util import route_parts


class SALSA(Algorithm):
    """ctx: iters (K), n_vertices, num_parts, partitioner."""

    name = "salsa"
    msg_fields = [("val", pa.float64()), ("kind", pa.int8())]

    def init(self, shard: dict, ctx: dict) -> dict:
        n_local = len(shard["vids"])
        return {
            "auth": np.zeros(n_local, dtype=np.float64),
            "hub": np.full(n_local, 1.0 / ctx["n_vertices"], dtype=np.float64),
        }

    @staticmethod
    def _degrees(shard: dict, bit: int) -> np.ndarray:
        """Per-owned-vid count of union edges carrying ``bit`` (= outdeg
        for FWD, indeg for REV, over the distinct directed edge set)."""
        indptr = shard["indptr"]
        mask = (shard["e_flag"].astype(np.int64) & bit) > 0
        cs = np.concatenate([[0], np.cumsum(mask.astype(np.int64))])
        return cs[indptr[1:]] - cs[indptr[:-1]]

    def _emit(self, shard: dict, ctx: dict, values: np.ndarray, bit: int):
        """Push values/deg along union edges carrying ``bit``, pre-summed
        per destination, plus one L1-partial broadcast row per partition
        (the L1 of the raw RESULT = sum of sender values with deg > 0)."""
        indptr, indices = shard["indptr"], shard["indices"]
        deg = np.diff(indptr)
        vdeg = self._degrees(shard, bit)
        safe = np.where(vdeg > 0, vdeg, 1).astype(np.float64)
        contrib_v = values / safe
        mask = (shard["e_flag"].astype(np.int64) & bit) > 0
        contrib = np.repeat(contrib_v, deg)[mask]
        dst_v = indices[mask]
        tables = []
        if len(dst_v):
            dsts, inv = np.unique(dst_v, return_inverse=True)
            sums = np.zeros(len(dsts), dtype=np.float64)
            np.add.at(sums, inv, contrib)
            tables.append(
                self.make_msgs(
                    route_parts(shard, ctx, dsts), dsts,
                    val=sums, kind=np.zeros(len(dsts), np.int8),
                )
            )
        pp = np.arange(ctx["num_parts"], dtype=np.int32)
        tables.append(
            self.make_msgs(
                pp, np.zeros(len(pp), np.int64),
                val=np.full(len(pp), float(np.sum(values))),
                kind=np.ones(len(pp), np.int8),
            )
        )
        return pa.concat_tables(tables)

    def step(self, s: int, shard: dict, state: dict, msgs: pa.Table, ctx: dict):
        vids = shard["vids"]
        n_local = len(vids)
        end = 2 * ctx["iters"] + 1
        auth = np.asarray(state["auth"], dtype=np.float64)
        hub = np.asarray(state["hub"], dtype=np.float64)

        if s == 0:
            out = self._emit(shard, ctx, hub, FWD)
            return {"auth": auth, "hub": hub}, out, n_local, 1.0

        msgs = sort_msgs(msgs, ["kind", "dst", "val"])
        kind = msgs.column("kind").to_numpy(zero_copy_only=False)
        vals = msgs.column("val").to_numpy(zero_copy_only=False)
        dsts = msgs.column("dst").to_numpy(zero_copy_only=False)
        norm = float(np.sum(vals[kind == 1])) if np.any(kind == 1) else 1.0
        if norm == 0.0:  # edgeless graph: nothing propagates
            norm = 1.0
        insum = np.zeros(n_local, dtype=np.float64)
        cm = kind == 0
        if np.any(cm):
            pos = np.searchsorted(vids, dsts[cm])
            np.add.at(insum, pos, vals[cm])
        raw = insum / norm

        if s % 2 == 1:  # auth phase: normalize last hub_raw, compute auth_raw
            hub = hub / norm
            if s == end:  # final normalize-only superstep
                return {"auth": auth, "hub": hub}, None, 0, 0.0
            delta = float(np.max(np.abs(raw - auth))) if n_local else 0.0
            auth = raw
            out = self._emit(shard, ctx, auth, REV)
        else:  # hub phase: normalize last auth_raw, compute hub_raw
            auth = auth / norm
            delta = float(np.max(np.abs(raw - hub))) if n_local else 0.0
            hub = raw
            out = self._emit(shard, ctx, hub, FWD)
        return {"auth": auth, "hub": hub}, out, n_local, delta

    def halted(self, agg: dict, s: int, ctx: dict) -> bool:
        return s >= 2 * ctx["iters"] + 1


def salsa(
    edges_ds=None,
    g: LinkGraph | None = None,
    vertices_ds=None,
    iters: int = 8,
    num_parts: int = 16,
    partitioner: str = "hash",
    max_supersteps: int = 500,
    ckpt_dir: str | None = None,
    resume: bool = True,
    ckpt_every: int = 1,
    engine: str = "dataset",
):
    """Run SALSA for ``iters`` iterations; returns (BSPResult, Dataset of
    (vid, auth, hub), both L1-normalized).

    ``g`` must be a union graph built over ``hits.union_flag_edges`` output
    with ``edge_cols=["flag"]`` (shareable with a HITS run over the same
    corpus); when ``edges_ds`` (plain directed edges) is given the union
    graph is built here."""
    if g is None:
        g = build_graph(
            union_flag_edges(edges_ds), vertices_ds, num_parts=num_parts,
            partitioner=partitioner, directed=True, edge_cols=["flag"],
        )
    ctx = {
        "iters": int(iters),
        "ckpt_every": ckpt_every,
        "partitioner": g.partitioner,
        "num_parts": g.num_parts,
    }
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(
        g, SALSA(), ctx, max_supersteps=max_supersteps, ckpt_dir=ckpt_dir,
        resume=resume,
    )
    scores = res.state_dataset().select_columns(["vid", "auth", "hub"])
    return res, scores
