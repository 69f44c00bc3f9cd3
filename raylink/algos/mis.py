"""Deterministic distributed maximal independent set — Luby's algorithm
with splitmix64 vertex priorities.

The reference has no MIS sample (it is the canonical symmetry-breaking
primitive of the BSP literature the reference's samples come from); this is
a builder-brief graph operator. Priorities are splitmix64(vid XOR seed) —
splitmix64 is a BIJECTION on uint64, so distinct vids get distinct
priorities, every round has winners, and the result is fully deterministic
(mirrored bit-for-bit in SQL via the shared ``_sm64`` kernel, unrolled
rounds like the k-truss oracle).

Round r (classic Luby, priority variant):
  winners  = alive vertices whose priority is strictly below every alive
             neighbour's (vertices with NO alive neighbour win trivially);
  removed  = alive neighbours of the winners;
  alive    = alive - winners - removed.
Each round is a handful of coarse-bucket / thresholded-broadcast dataflow
ops; the driver sees only per-round row COUNTS (used for the
broadcast-vs-hash choice and termination), never vertex rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.util import splitmix64

U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _pri(v: np.ndarray, seed: np.uint64) -> np.ndarray:
    """uint64 priority of each vid — stateless, recomputed where needed
    (cheaper than carrying a column through every shuffle)."""
    return splitmix64(v.astype(np.uint64) ^ seed)


def maximal_independent_set(
    edges_ds,
    seed: int = 0,
    num_buckets: int = 32,
    max_rounds: int = 24,
):
    """-> Dataset (vid, mis_round): one row per MIS member with the round
    it joined. The MIS is over the undirected SIMPLE graph (self-loops
    dropped, like every graph op here — a self-looped vertex is treated as
    loop-free). Vertices absent from the edge list are unknown here and
    trivially independent — union a vertex table downstream if needed.

    Converges in O(log n) rounds w.h.p.; raises if ``max_rounds`` is hit
    with alive vertices left (determinism means a rerun hits the same
    count — raise ``max_rounds``)."""
    from raylink.algos.triangles import _canon, _unpack
    from raylink.join import (
        anti_join,
        bucketed_distinct,
        semi_join,
        with_typed_empty,
    )

    sd = np.uint64(seed)
    B = np.uint64(num_buckets)

    distinct = bucketed_distinct(
        edges_ds.map_batches(_canon, batch_format="pyarrow"), "key", num_buckets=64
    )

    def und_rows(batch: pa.Table) -> pa.Table:
        a, b = _unpack(batch.column("key").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "v": pa.array(np.concatenate([a, b])),
                "n": pa.array(np.concatenate([b, a])),
            }
        )

    und = distinct.map_batches(und_rows, batch_format="pyarrow").materialize()
    alive = bucketed_distinct(und, "v").materialize()
    n_alive = alive.count()

    def nb_min_part(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        p = _pri(n, sd)
        uv, inv = np.unique(v, return_inverse=True)
        mp = np.full(len(uv), U64_MAX, dtype=np.uint64)
        np.minimum.at(mp, inv, p)
        return pa.table(
            {
                "mb": pa.array(
                    (splitmix64(uv.astype(np.uint64)) % B).astype(np.int32)
                ),
                "v": pa.array(uv),
                "mp": pa.array(mp, type=pa.uint64()),
            }
        )

    def nb_min_comb(group: pa.Table) -> pa.Table:
        v = group.column("v").to_numpy(zero_copy_only=False)
        p = group.column("mp").to_numpy(zero_copy_only=False)
        uv, inv = np.unique(v, return_inverse=True)
        mp = np.full(len(uv), U64_MAX, dtype=np.uint64)
        np.minimum.at(mp, inv, p)
        return pa.table(
            {"v": pa.array(uv), "mp": pa.array(mp, type=pa.uint64())}
        )

    def winners_fn(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        mp = batch.column("mp").to_numpy(zero_copy_only=False)
        return pa.table({"v": pa.array(v[_pri(v, sd) < mp])})

    def tag_round(r: int):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "vid": batch.column("v"),
                    "mis_round": pa.array(
                        np.full(len(batch), r, dtype=np.int64)
                    ),
                }
            )

        return fn

    def as_v(col: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({col: batch.column("v")})

        return fn

    mis_parts = []
    for r in range(max_rounds):
        if n_alive == 0:
            break
        # 1. min alive-neighbour priority per covered vertex (und is pruned
        #    to alive x alive each round, so every row counts)
        m_ds = (
            und.map_batches(nb_min_part, batch_format="pyarrow")
            .groupby("mb")
            .map_groups(nb_min_comb, batch_format="pyarrow")
            .materialize()
        )
        n_m = m_ds.count()
        # 2. winners: covered vertices beating every alive neighbour (pure
        #    stateless filter), plus alive vertices with NO alive neighbour
        w_cov = m_ds.map_batches(winners_fn, batch_format="pyarrow")
        iso = anti_join(alive, m_ds, on="v", left_cols={}, n_key_rows=n_m)
        w = bucketed_distinct(w_cov.union(iso), "v").materialize()
        n_w = w.count()
        mis_parts.append(w.map_batches(tag_round(r), batch_format="pyarrow"))
        # 3. removed = alive neighbours of the covered winners
        rem = semi_join(
            und, w, on="v", left_cols={"n": pa.int64()}, n_key_rows=n_w
        ).map_batches(
            lambda b: pa.table({"v": b.column("n")}), batch_format="pyarrow"
        )
        dead = bucketed_distinct(w.union(rem), "v").materialize()
        n_dead = dead.count()
        # 4. shrink the alive set and prune both edge endpoints
        alive = anti_join(
            alive, dead, on="v", left_cols={}, n_key_rows=n_dead
        ).materialize()
        n_alive = alive.count()
        alive_n = alive.map_batches(as_v("n"), batch_format="pyarrow")
        und = semi_join(
            und, alive, on="v", left_cols={"n": pa.int64()}, n_key_rows=n_alive
        )
        und = semi_join(
            und, alive_n, on="n", left_cols={"v": pa.int64()},
            n_key_rows=n_alive,
        ).materialize()
    if n_alive > 0:
        raise RuntimeError(
            f"maximal_independent_set: {n_alive} vertices alive after "
            f"{max_rounds} rounds — raise max_rounds"
        )

    out = mis_parts[0]
    for part in mis_parts[1:]:
        out = out.union(part)
    return with_typed_empty(out, {"vid": pa.int64(), "mis_round": pa.int64()})
