"""HITS (hubs & authorities) over a directed link graph.

The reference library stops at PageRank-family scores (sample-hama/.../
PageRank.java); HITS is the other classic link-analysis fixpoint a crawl
pipeline wants (Kleinberg 1999, public): per iteration

    auth(v) = sum_{u -> v} hub(u)   then L1-normalize auth
    hub(u)  = sum_{u -> v} auth(v)  then L1-normalize hub

The hub update is a PULL along out-edges — a vertex needs the authority of
the pages it links TO — which a CSR of out-edges cannot push. Instead of a
second reversed graph, the job runs on one UNION graph: every directed edge
(u, v) contributes a forward union edge (u -> v, flag bit 1) and a reverse
union edge (v -> u, flag bit 2), deduplicated into a single CSR with a
per-edge ``flag`` value (1 / 2 / 3) persisted via ``build_graph(edge_cols=
["flag"])``. Auth contributions travel along flag&1 edges, hub
contributions along flag&2 edges — both are plain BSP pushes.

Normalization is distributed: each phase sends its raw per-partition L1
partial as P broadcast message rows (payload ``kind=1``); receivers divide
by the summed partials one superstep later, so no superstep materializes a
global vector anywhere. One HITS iteration = 2 supersteps (auth phase at
odd s, hub phase at even s) + one final normalize-only superstep.

Determinism: messages are sorted by (kind, dst, val) before reduction and
partials reduce in fixed partition order, so results are bit-identical
across runs and parallelism levels; the SQL oracle differs only by float
summation order (absorbed by ROUND(.., 8), same argument as pagerank_sql).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.graph import LinkGraph, build_graph
from raylink.superstep import Algorithm, run_bsp, sort_msgs
from raylink.superstep_tasks import run_bsp_tasks
from raylink.util import unpack_hi, route_parts

FWD = 1
REV = 2


def union_flag_edges(edges_ds):
    """Directed edges -> deduplicated union edges (src, dst, flag) where
    flag bit 1 marks an original edge src->dst and bit 2 an original edge
    dst->src. One packed-key groupby; duplicate input edges collapse (the
    flag set is recovered as min|max, exact because flags take only the
    values 1 and 2)."""
    from ray.data.aggregate import Max, Min

    from raylink.util import assert_packable

    def pack(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        assert_packable(s, "union_flag_edges src")
        assert_packable(d, "union_flag_edges dst")
        key = np.concatenate([(s << np.int64(32)) | d, (d << np.int64(32)) | s])
        flag = np.concatenate(
            [np.full(len(s), FWD, np.int64), np.full(len(d), REV, np.int64)]
        )
        return pa.table({"key": pa.array(key), "flag": pa.array(flag)})

    def unpack(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False)
        lo = batch.column("min(flag)").to_numpy(zero_copy_only=False)
        hi = batch.column("max(flag)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(unpack_hi(k)),
                "dst": pa.array(k & np.int64(0xFFFFFFFF)),
                "flag": pa.array((lo | hi).astype(np.float64)),
            }
        )

    return (
        edges_ds.map_batches(pack, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Min("flag"), Max("flag"))
        .map_batches(unpack, batch_format="pyarrow")
    )


class HITS(Algorithm):
    """ctx: iters (K), n_vertices, num_parts, partitioner."""

    name = "hits"
    msg_fields = [("val", pa.float64()), ("kind", pa.int8())]

    def init(self, shard: dict, ctx: dict) -> dict:
        n_local = len(shard["vids"])
        return {
            "auth": np.zeros(n_local, dtype=np.float64),
            "hub": np.full(n_local, 1.0 / ctx["n_vertices"], dtype=np.float64),
        }

    def _emit(self, shard: dict, ctx: dict, values: np.ndarray, bit: int):
        """Push values along union edges carrying ``bit``, pre-summed per
        destination, plus one L1-partial broadcast row per partition."""
        indptr, indices = shard["indptr"], shard["indices"]
        deg = np.diff(indptr)
        mask = (shard["e_flag"].astype(np.int64) & bit) > 0
        contrib = np.repeat(values, deg)[mask]
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


def hits(
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
    """Run HITS for ``iters`` iterations; returns (BSPResult, Dataset of
    (vid, auth, hub), both L1-normalized).

    ``g`` must be a union graph built over ``union_flag_edges`` output with
    ``edge_cols=["flag"]``; when ``edges_ds`` (plain directed edges) is
    given the union graph is built here."""
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
        g, HITS(), ctx, max_supersteps=max_supersteps, ckpt_dir=ckpt_dir,
        resume=resume,
    )
    scores = res.state_dataset().select_columns(["vid", "auth", "hub"])
    return res, scores
