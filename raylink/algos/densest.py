"""Densest subgraph via parallel peeling — link-farm / spam-core detection.

Charikar's greedy peel (STOC 2000) made parallel by Bahmani, Kumar,
Vassilvitskii ("Densest Subgraph in Streaming and MapReduce", VLDB 2012):
each round removes EVERY vertex whose degree is at most ``factor`` times
the current average density rho = E/V (``factor = 2(1+eps)``; the default
3 is eps = 0.5), guaranteeing |V| shrinks by (1+eps) per round — at most
log_{1+eps} V rounds — and that the best intermediate subgraph has density
>= rho_opt / (2(1+eps)). The web use case is the classic one: the densest
region of a host/link graph is where link farms and boosting cliques live.

Reference analog: none (the reference library has no density peeling; the
nearest machinery is KCore's iterated peel, which this mirrors in shape).

Execution: ONE BSP job on the superstep engine (two supersteps per peel
round), not a driver-side Dataset loop — the peel's profile is
many-cheap-rounds, exactly what the task engine's resident CSR shards are
for (the Dataset-loop formulation paid ~3 full pipeline executions per
round; at sf0.1 that was 15 s of fixed per-execution overhead for ~1 s of
compute). Degrees live as per-partition state and are maintained
incrementally by removal messages; the global (V, E) needed for the
threshold travels as P broadcast partial rows per partition (the HITS
normalization pattern, hits.py) so no superstep materializes anything
global anywhere:

- even superstep 2t ("sync"): apply removal counts from round t-1 to the
  degree array, then broadcast this partition's (alive count, alive degree
  sum) to all P partitions;
- odd superstep 2t+1 ("peel"): sum the P partials -> exact V_t and
  E_t = sum_deg/2 (every alive-alive edge is counted twice, alive-dead
  edges zero times after the sync), remove alive vertices with
  ``deg <= (factor * E) // V``, message 1 along each CSR edge of a removed
  vertex (combined per destination); dead receivers ignore stale removals,
  so no per-edge liveness state is needed.

Exactness: everything the peel decides is INTEGER — counts and degree
sums are int64 end-to-end, so rounds are bit-exactly SQL-mirrorable with
no float thresholds and no message-order sensitivity. The one float
comparison — picking the best round by density — is a single IEEE
division per round, identical on both sides (first-max rule == SQL
``ORDER BY density DESC, round ASC LIMIT 1``). Per-round (V, 2E) reach the
driver through the ``extra_metrics`` history channel (O(rounds) driver
state, summed per-partition partials — exact: integer-valued float64).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.superstep import Algorithm
from raylink.util import route_parts, splitmix64


def _canonical_simple_edges(edges_ds, num_buckets: int = 32):
    """(src, dst) in any order/multiplicity -> distinct undirected simple
    edges (a < b), self-loops dropped. Coarse-bucket pair distinct (no
    packed 32-bit key assumption — pairs dedup via per-bucket lexsort)."""
    B = np.uint64(num_buckets)

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        if len(a):  # all-self-loop / empty batches skip the dedup mask
            # per-batch pre-dedup before the shuffle
            order = np.lexsort((b, a))
            a, b = a[order], b[order]
            first = np.concatenate(
                ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1]))
            )
            a, b = a[first], b[first]
        return pa.table(
            {
                "db": pa.array((splitmix64(a.astype(np.uint64)) % B).astype(np.int32)),
                "a": pa.array(a),
                "b": pa.array(b),
            }
        )

    def dedup(group: pa.Table) -> pa.Table:
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        return pa.table({"a": pa.array(a[first]), "b": pa.array(b[first])})

    return edges_ds.map_batches(canon, batch_format="pyarrow").groupby(
        "db"
    ).map_groups(dedup, batch_format="pyarrow")


_RM, _CNT, _DEG = 0, 1, 2  # message kinds


class DensestPeel(Algorithm):
    """BSP peel: state (alive, deg, peel_round) per owned vid; two
    supersteps per peel round (module docstring). ``ctx`` needs ``factor``,
    ``num_parts``, ``partitioner``."""

    name = "densest_peel"
    msg_fields = [("val", pa.int64()), ("kind", pa.int8())]

    def init(self, shard: dict, ctx: dict) -> dict:
        nv = len(shard["vids"])
        return {
            "alive": np.ones(nv, dtype=np.int64),
            "deg": np.diff(shard["indptr"]).astype(np.int64),
            "peel_round": np.full(nv, -1, dtype=np.int64),
        }

    def _broadcast(self, alive, deg, ctx) -> pa.Table:
        cnt = int(alive.sum())
        sd = int(deg[alive == 1].sum())
        pp = np.arange(ctx["num_parts"], dtype=np.int32)
        z = np.zeros(len(pp), np.int64)
        return pa.concat_tables(
            [
                self.make_msgs(pp, z, val=np.full(len(pp), cnt, np.int64),
                               kind=np.full(len(pp), _CNT, np.int8)),
                self.make_msgs(pp, z, val=np.full(len(pp), sd, np.int64),
                               kind=np.full(len(pp), _DEG, np.int8)),
            ]
        )

    def step(self, s, shard, state, msgs, ctx):
        vids = shard["vids"]
        # np.array (copy): tasks-engine state arrays are object-store-backed
        # and read-only; both phases mutate in place
        alive = np.array(state["alive"], np.int64)
        deg = np.array(state["deg"], np.int64)
        peel = np.array(state["peel_round"], np.int64)
        state = {"alive": alive, "deg": deg, "peel_round": peel}

        kind = (
            msgs.column("kind").to_numpy(zero_copy_only=False)
            if msgs.num_rows
            else np.empty(0, np.int8)
        )
        vals = (
            msgs.column("val").to_numpy(zero_copy_only=False)
            if msgs.num_rows
            else np.empty(0, np.int64)
        )

        if s % 2 == 0:  # sync: apply round t-1 removals, broadcast partials
            rm = kind == _RM
            if np.any(rm):
                d = msgs.column("dst").to_numpy(zero_copy_only=False)[rm]
                pos = np.searchsorted(vids, d)
                # dead targets are harmless: their deg is never read again
                np.subtract.at(deg, pos, vals[rm])
            out = self._broadcast(alive, deg, ctx)
            return state, out, int(alive.sum()), 0.0

        # peel: exact global (V, E) from the summed per-partition partials
        V = int(vals[kind == _CNT].sum())
        sd = int(vals[kind == _DEG].sum())
        if V == 0:
            return state, None, 0, 0.0
        thr = (ctx["factor"] * (sd // 2)) // V  # integer-exact, == SQL
        t = (s - 1) // 2
        rm = (alive == 1) & (deg <= thr)
        n_rm = int(rm.sum())
        out = None
        if n_rm:
            peel[rm] = t
            alive[rm] = 0
            indptr, indices = shard["indptr"], shard["indices"]
            starts = indptr[:-1][rm]
            cnts = (indptr[1:] - indptr[:-1])[rm]
            total = int(cnts.sum())
            if total:
                ofs = np.repeat(np.cumsum(cnts) - cnts, cnts)
                idx = np.repeat(starts, cnts) + np.arange(
                    total, dtype=np.int64
                ) - ofs
                dsts, counts = np.unique(indices[idx], return_counts=True)
                out = self.make_msgs(
                    route_parts(shard, ctx, dsts), dsts,
                    val=counts.astype(np.int64),
                    kind=np.full(len(dsts), _RM, np.int8),
                )
        return state, out, int(alive.sum()), float(n_rm)

    def extra_metrics(self, state, shard, ctx) -> dict:
        # meaningful ONLY after even (sync) supersteps: per-partition
        # (alive count, alive degree sum) partials; the manifest history
        # SUM across partitions gives the round's exact (V, 2E).
        # Post-peel (odd) rows are stale and ignored by the wrapper.
        alive = state["alive"]
        return {
            "nv_part": float(alive.sum()),
            "deg2_part": float(state["deg"][alive == 1].sum()),
        }


def densest_subgraph(
    edges_ds,
    verts_ds,
    factor: int = 3,
    max_rounds: int = 64,
    num_buckets: int = 32,
    num_parts: int = 8,
    engine: str = "tasks",
    ckpt_dir: str | None = None,
):
    """Parallel peel to empty; returns ``(stats, Dataset (vid, peel_round,
    in_densest))`` where ``stats`` is the per-round list of dicts
    ``{round, n_edges, n_vertices, density}`` (the driver's only state,
    O(rounds)), ``peel_round`` is the round the vertex was removed, and
    ``in_densest`` is 1 iff the vertex belongs to the densest intermediate
    subgraph (the first round of maximum density; its member set is every
    vertex with ``peel_round >= best_round``). ``verts_ds`` must contain
    every edge endpoint (isolated vertices allowed — they peel in round 0).
    """
    import ray.data as rd

    from raylink.graph import build_graph
    from raylink.superstep import run_bsp
    from raylink.superstep_tasks import run_bsp_tasks

    canon = _canonical_simple_edges(edges_ds, num_buckets).map_batches(
        lambda b: pa.table({"src": b.column("a"), "dst": b.column("b")}),
        batch_format="pyarrow",
    )
    verts = verts_ds.map_batches(
        lambda b: pa.table({"vid": b.column("vid")}), batch_format="pyarrow"
    )
    g = build_graph(
        canon, verts, num_parts=num_parts, partitioner="hash", directed=False
    )
    ctx = {
        "factor": int(factor),
        "num_parts": g.num_parts,
        "partitioner": g.partitioner,
    }
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(
        g, DensestPeel(), ctx,
        max_supersteps=2 * max_rounds + 2, ckpt_dir=ckpt_dir,
    )
    if res.history and res.history[-1]["n_active"] > 0:
        raise RuntimeError(
            f"densest_subgraph: {max_rounds} rounds without emptying "
            f"(n_active={int(res.history[-1]['n_active'])}) — the (1+eps) "
            "shrink guarantee requires factor >= 3"
        )

    stats = []
    for row in res.history:
        if row["superstep"] % 2 == 0 and row["nv_part"] > 0:
            nv = int(row["nv_part"])
            ne = int(row["deg2_part"]) // 2
            stats.append(
                {"round": row["superstep"] // 2, "n_edges": ne,
                 "n_vertices": nv,
                 "density": float(np.float64(ne) / np.float64(nv))}
            )
    if not stats:  # empty input graph
        empty = pa.table(
            {"vid": pa.array([], type=pa.int64()),
             "peel_round": pa.array([], type=pa.int64()),
             "in_densest": pa.array([], type=pa.int64())}
        )
        return stats, rd.from_arrow(empty)

    dens = np.array([s["density"] for s in stats], dtype=np.float64)
    best = int(np.argmax(dens))  # first max == SQL (density DESC, round ASC)

    def final(b: pa.Table) -> pa.Table:
        pr = b.column("peel_round").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": b.column("vid"),
                "peel_round": b.column("peel_round"),
                "in_densest": pa.array((pr >= best).astype(np.int64)),
            }
        )

    return stats, res.state_dataset().map_batches(final, batch_format="pyarrow")
