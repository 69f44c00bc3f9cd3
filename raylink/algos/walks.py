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


def node2vec_walks(
    edges_ds,
    walk_len: int = 6,
    w_return: int = 1,
    w_common: int = 4,
    w_far: int = 2,
    seed: int = 0,
    num_buckets: int = 64,
):
    """Second-order (node2vec, Grover & Leskovec 2016 — public) biased
    walks, deterministic and RNG-free: at vertex ``cur`` coming from
    ``prev``, candidate ``cand`` weighs

        w_return  if cand == prev            (1/p in the paper)
        w_common  if edge (prev, cand) exists
        w_far     otherwise                   (1/q)

    with INTEGER weights so the hash-driven pick mirrors exactly in SQL:
    the walker draws ``r = splitmix64(walker ^ (s+1)*K1 ^ seed) mod
    total_weight`` and takes the first candidate (vid ascending) whose
    cumulative weight exceeds r. Step 0 has no prev (prev = -1), so every
    candidate weighs ``w_far`` — a uniform pick.

    Shuffle shape per step: candidates are generated in a coarse-bucket
    group keyed by hash(cur) against the STATIC bucketed adjacency
    (materialized once), then re-bucketed by hash(prev) — every walker has
    ONE prev, so its candidates land in one group WITH the edges needed
    for the (prev, cand) membership test (packed-key searchsorted; ids
    guarded by ``assert_packable``) — where the weighted pick happens.
    Step 0 needs no membership and picks inside the first group. Frontier
    rows only re-shuffle; the driver holds Dataset handles.

    -> Dataset (walker, step, vid), one walker per distinct source vertex;
    sink walks end early."""
    from raylink.util import assert_packable

    sd = U64(np.uint64(seed))
    wr, wc, wf = int(w_return), int(w_common), int(w_far)
    if min(wr, wc, wf) < 1:
        raise ValueError("node2vec weights must be positive integers")

    def tag_edges(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        assert_packable(s, "node2vec src")
        assert_packable(d, "node2vec dst")
        neg = np.full(len(s), -1, dtype=np.int64)
        return pa.table(
            {
                "b": pa.array(_bucket(s, num_buckets)),
                "walker": pa.array(neg),
                "prev": pa.array(neg),
                "cur": pa.array(s),
                "cand": pa.array(d),
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
        return pa.table(
            {"walker": pa.array(v),
             "prev": pa.array(np.full(len(v), -1, dtype=np.int64)),
             "vid": pa.array(v)}
        )

    frontier = (
        edges_ds.map_batches(starts, batch_format="pyarrow")
        .groupby("b")
        .map_groups(dedupe, batch_format="pyarrow")
        .materialize()
    )

    def _group_parts(group: pa.Table):
        """Split a mixed group into dedup'd sorted edges + walker rows."""
        wlk = group.column("walker").to_numpy(zero_copy_only=False)
        cur = group.column("cur").to_numpy(zero_copy_only=False)
        cand = group.column("cand").to_numpy(zero_copy_only=False)
        prev = group.column("prev").to_numpy(zero_copy_only=False)
        is_edge = wlk < 0
        ek = np.unique(
            (cur[is_edge].astype(np.uint64) << U64(32))
            | cand[is_edge].astype(np.uint64)
        )
        esrc = (ek >> U64(32)).astype(np.int64)
        edst = (ek & U64(0xFFFFFFFF)).astype(np.int64)
        f = ~is_edge
        return ek, esrc, edst, wlk[f], prev[f], cur[f], cand[f]

    def _pick(widx, wlk_u, cand, w, s):
        """First candidate (per walker segment, cand ascending within the
        caller's ordering) whose cumulative weight exceeds the walker's
        hash draw; returns selected positions into cand."""
        seg_start = np.r_[True, widx[1:] != widx[:-1]]
        starts_i = np.flatnonzero(seg_start)
        gc = np.cumsum(w)
        base = np.where(starts_i > 0, gc[starts_i - 1], 0)
        totals = np.r_[gc[starts_i[1:] - 1], gc[-1]] - base
        with np.errstate(over="ignore"):
            mix = (
                wlk_u.astype(np.uint64) ^ (U64(s + 1) * K1) ^ sd
            )
        r = (splitmix64(mix) % totals.astype(np.uint64)).astype(np.int64)
        tgt = base + r
        sel = np.searchsorted(gc, tgt, side="right")
        return sel

    _empty = pa.table(
        {
            "walker": pa.array([], type=pa.int64()),
            "prev": pa.array([], type=pa.int64()),
            "vid": pa.array([], type=pa.int64()),
        }
    )

    def _expand(esrc, edst, fvid, fwlk, fprev):
        """Out-edge candidates per walker -> (widx, cand) + walker arrays
        sorted by (walker order given, cand asc)."""
        lo = np.searchsorted(esrc, fvid, side="left")
        hi = np.searchsorted(esrc, fvid, side="right")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return None
        widx = np.repeat(np.arange(len(fvid), dtype=np.int64), counts)
        base = np.zeros(len(fvid), dtype=np.int64)
        np.cumsum(counts[:-1], out=base[1:])
        eidx = np.repeat(lo, counts) + (
            np.arange(total, dtype=np.int64) - np.repeat(base, counts)
        )
        return widx, edst[eidx]

    def stage_a(group: pa.Table, s: int) -> pa.Table:
        _, esrc, edst, fwlk, fprev, fcur, _ = _group_parts(group)
        ex = _expand(esrc, edst, fcur, fwlk, fprev)
        if ex is None:
            if s == 0:
                return _empty
            return pa.table(
                {"b": pa.array([], type=pa.int32()),
                 "walker": pa.array([], type=pa.int64()),
                 "prev": pa.array([], type=pa.int64()),
                 "cur": pa.array([], type=pa.int64()),
                 "cand": pa.array([], type=pa.int64())}
            )
        widx, cand = ex
        if s == 0:
            # uniform (all-w_far) pick right here: no prev, no membership
            w = np.full(len(cand), wf, dtype=np.int64)
            sel = _pick(widx, fwlk[np.unique(widx)], cand, w, s)
            # widx is already grouped ascending by construction; cand asc
            # within each walker (CSR slices of the sorted edge array)
            return pa.table(
                {"walker": pa.array(fwlk[widx[sel]]),
                 "prev": pa.array(fcur[widx[sel]]),
                 "vid": pa.array(cand[sel])}
            )
        return pa.table(
            {
                "b": pa.array(_bucket(fprev[widx], num_buckets)),
                "walker": pa.array(fwlk[widx]),
                "prev": pa.array(fprev[widx]),
                "cur": pa.array(fcur[widx]),
                "cand": pa.array(cand),
            }
        )

    def stage_b(group: pa.Table, s: int) -> pa.Table:
        ek, _, _, fwlk, fprev, fcur, fcand = _group_parts(group)
        if len(fwlk) == 0:
            return _empty
        # candidates arrive unordered across batches: restore the
        # deterministic (walker, cand) order the pick rule needs
        order = np.lexsort((fcand, fwlk))
        fwlk, fprev, fcur, fcand = (
            fwlk[order], fprev[order], fcur[order], fcand[order]
        )
        pk = (fprev.astype(np.uint64) << U64(32)) | fcand.astype(np.uint64)
        pos = np.searchsorted(ek, pk)
        member = (pos < len(ek)) & (ek[np.minimum(pos, max(len(ek) - 1, 0))] == pk) if len(ek) else np.zeros(len(pk), bool)
        w = np.where(
            fcand == fprev, wr, np.where(member, wc, wf)
        ).astype(np.int64)
        widx = np.cumsum(np.r_[False, fwlk[1:] != fwlk[:-1]])
        first = np.r_[True, fwlk[1:] != fwlk[:-1]]
        sel = _pick(widx, fwlk[first], fcand, w, s)
        return pa.table(
            {"walker": pa.array(fwlk[sel]),
             "prev": pa.array(fcur[sel]),
             "vid": pa.array(fcand[sel])}
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
                    "walker": batch.column("walker"),
                    "prev": batch.column("prev"),
                    "cur": batch.column("vid"),
                    "cand": pa.array(np.full(len(v), -1, dtype=np.int64)),
                }
            )

        mixed = adj.union(frontier.map_batches(tag_frontier, batch_format="pyarrow"))
        stepped = mixed.groupby("b").map_groups(
            lambda g, s=s: stage_a(g, s), batch_format="pyarrow"
        )
        if s == 0:
            frontier = stepped.materialize()
        else:
            frontier = (
                adj.union(stepped)
                .groupby("b")
                .map_groups(lambda g, s=s: stage_b(g, s), batch_format="pyarrow")
                .materialize()
            )
        out.append(with_step(frontier, s + 1))

    return out[0].union(*out[1:])


def walks_to_corpus(walks_ds, num_buckets: int = 64):
    """(walker, step, vid) walk rows -> (walker, seq) training lines — the
    corpus export that feeds skip-gram embedding training on the walks
    (DeepWalk/node2vec stage 2). One hash(walker) coarse-bucket groupby;
    per-group assembly is fully Arrow (cast + ListArray + binary_join), no
    per-walk python."""
    import pyarrow.compute as pc

    def tag(batch: pa.Table) -> pa.Table:
        w = batch.column("walker").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "b", pa.array((splitmix64(w.astype(np.uint64)) % U64(num_buckets)).astype(np.int32))
        )

    def assemble(group: pa.Table) -> pa.Table:
        w = group.column("walker").to_numpy(zero_copy_only=False)
        s = group.column("step").to_numpy(zero_copy_only=False)
        v = group.column("vid").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, w))
        w, v = w[order], v[order]
        first = np.r_[True, w[1:] != w[:-1]]
        counts = np.diff(np.r_[np.flatnonzero(first), len(w)])
        offs = np.zeros(len(counts) + 1, np.int32)
        np.cumsum(counts, out=offs[1:])
        vals = pc.cast(pa.array(v), pa.string())
        lists = pa.ListArray.from_arrays(pa.array(offs), vals)
        return pa.table(
            {
                "walker": pa.array(w[first]),
                "seq": pc.binary_join(lists, " "),
            }
        )

    return (
        walks_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("b")
        .map_groups(assemble, batch_format="pyarrow")
    )
