"""Deterministic random walks over the directed edge table — the
graph-embedding / corpus-sampling primitive (DeepWalk/node2vec-style input
generation), expressed hash-driven so replays, retries and the SQL oracle
all reproduce bit-identical walks with zero RNG state.

One walker starts at every distinct source vertex. At step s, the walker at
vertex v moves to the out-neighbour u minimizing

    (splitmix64(walker ^ mul64(s+1, K1) ^ mul64(u, K2) ^ seed), u)

— a pure function of (walker, step, candidate), so the choice needs no
coordination; a walker at a sink vertex (no out-edges) simply ends early.
The per-step transition is one coarse-bucket groupby joining the frontier
against the STATIC bucketed adjacency (edges are bucketed and materialized
once; only the walker-sized frontier re-shuffles per step). The driver holds
nothing but Dataset handles; outputs accumulate as a lazy union of per-step
frontiers.

No reference analog (GoFFish has no walk operator); built for the
training-data side of the engine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.util import splitmix64

U64 = np.uint64
K1 = U64(0x9E3779B97F4A7C15)
K2 = U64(0xBF58476D1CE4E5B9)


def _bucket(v: np.ndarray, num_buckets: int) -> np.ndarray:
    return (splitmix64(v.astype(np.uint64)) % U64(num_buckets)).astype(np.int32)


def random_walks(edges_ds, walk_len: int = 6, seed: int = 0,
                 num_buckets: int = 64):
    """-> Dataset (walker, step, vid): the visited vertex per step,
    step 0 = the start vertex (walker == start vid). Walks follow edge
    direction; duplicate edges are harmless (identical candidates tie to
    the same argmin)."""
    sd = U64(np.uint64(seed))

    def tag_edges(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "b": pa.array(_bucket(s, num_buckets)),
                "vid": pa.array(s),
                "dst": pa.array(d),
                "walker": pa.array(np.full(len(s), -1, dtype=np.int64)),
            }
        )

    adj = edges_ds.map_batches(tag_edges, batch_format="pyarrow").materialize()

    def starts(batch: pa.Table) -> pa.Table:
        v = np.unique(
            batch.column("src").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table({"b": pa.array(_bucket(v, num_buckets)),
                         "walker": pa.array(v)})

    def dedupe(group: pa.Table) -> pa.Table:
        v = np.unique(group.column("walker").to_numpy(zero_copy_only=False))
        return pa.table({"walker": pa.array(v), "vid": pa.array(v)})

    # distinct start vertices: per-batch unique -> ONE coarse-bucket
    # groupby (B python groups, not one per walker)
    frontier = (
        edges_ds.map_batches(starts, batch_format="pyarrow")
        .groupby("b")
        .map_groups(dedupe, batch_format="pyarrow")
        .materialize()
    )

    def with_step(ds, s: int):
        return ds.map_batches(
            lambda b: pa.table(
                {"walker": b.column("walker"),
                 "step": pa.array(np.full(b.num_rows, s, dtype=np.int64)),
                 "vid": b.column("vid")}
            ),
            batch_format="pyarrow",
        )

    out = [with_step(frontier, 0)]
    for s in range(walk_len):
        def tag_frontier(batch: pa.Table) -> pa.Table:
            v = batch.column("vid").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "b": pa.array(_bucket(v, num_buckets)),
                    "vid": batch.column("vid"),
                    "dst": pa.array(np.full(len(v), -1, dtype=np.int64)),
                    "walker": batch.column("walker"),
                }
            )

        def advance(group: pa.Table, s=s) -> pa.Table:
            vid = group.column("vid").to_numpy(zero_copy_only=False)
            dst = group.column("dst").to_numpy(zero_copy_only=False)
            wlk = group.column("walker").to_numpy(zero_copy_only=False)
            is_edge = wlk < 0
            esrc, edst = vid[is_edge], dst[is_edge]
            order = np.argsort(esrc, kind="stable")
            esrc, edst = esrc[order], edst[order]
            fvid, fwlk = vid[~is_edge], wlk[~is_edge]
            lo = np.searchsorted(esrc, fvid, side="left")
            hi = np.searchsorted(esrc, fvid, side="right")
            counts = hi - lo
            total = int(counts.sum())
            if total == 0:
                return pa.table(
                    {"walker": pa.array([], type=pa.int64()),
                     "vid": pa.array([], type=pa.int64())}
                )
            widx = np.repeat(np.arange(len(fvid), dtype=np.int64), counts)
            base = np.zeros(len(fvid), dtype=np.int64)
            np.cumsum(counts[:-1], out=base[1:])
            eidx = np.repeat(lo, counts) + (
                np.arange(total, dtype=np.int64) - np.repeat(base, counts)
            )
            cand = edst[eidx]
            with np.errstate(over="ignore"):
                mix = (
                    fwlk[widx].astype(np.uint64)
                    ^ (U64(s + 1) * K1)
                    ^ (cand.astype(np.uint64) * K2)
                    ^ sd
                )
            h = splitmix64(mix)
            sel = np.lexsort((cand, h, widx))
            first = sel[np.r_[True, widx[sel][1:] != widx[sel][:-1]]]
            return pa.table(
                {"walker": pa.array(fwlk[widx[first]]),
                 "vid": pa.array(cand[first])}
            )

        both = adj.union(
            frontier.map_batches(tag_frontier, batch_format="pyarrow")
        )
        frontier = both.groupby("b").map_groups(
            advance, batch_format="pyarrow"
        ).materialize()
        out.append(with_step(frontier, s + 1))

    return out[0].union(*out[1:])
