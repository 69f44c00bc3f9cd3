"""Minimum spanning forest — distributed Boruvka.

The reference has no MST sample (it is the classic BSP benchmark alongside
PageRank/CC/SSSP); this is a builder-brief graph operator — e.g. the
backbone of a weighted host graph. Edges are totally ordered by
(weight, min_vid, max_vid), so the spanning forest is UNIQUE even with tied
weights and the whole run is deterministic (mirrored in SQL with unrolled
Boruvka rounds + per-round recursive min-label closures).

Per Boruvka round:
  1. attach current component labels to both edge endpoints — thresholded
     ``attach_lookup`` (``ray.put`` broadcast while the vertex->component
     map is small, ``hash_join`` when dataset-sized; the count is free
     metadata off the materialized map); drop intra-component edges
     permanently;
  2. per-component minimum incident edge under the total order — ONE
     coarse-bucket groupby (all rows of a component land in one group);
  3. contract: the selected edges form a functional graph f(c) = partner
     component whose every weak component contains exactly one 2-cycle
     (its minimal edge, picked from both sides — the strict total order
     makes longer cycles impossible). Below the broadcast threshold the
     pointer graph (<= #components rows, >= halving per round) is resolved
     driver-side in numpy (the ``attach_lookup`` precedent: bounded pull,
     identical result); above it, distributed pointer DOUBLING
     (f = f . f, one ``hash_join`` per jump, O(log depth) jumps).
Components at least halve per round, so rounds = O(log V). The selected
edges are deduped once at the end (an edge is selectable in exactly one
round; only the per-round 2-cycle pick duplicates).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from raylink.util import unpack_hi, splitmix64


def _contract_roots(c: np.ndarray, p: np.ndarray):
    """Resolve the Boruvka pointer graph f(c) = p (every selected edge
    points its component at its partner) to per-row roots: sort by c,
    break each 2-cycle at its LOWER endpoint, pointer-chase to fixpoint.
    Returns (c_sorted, roots) aligned — shared by the broadcast and
    distributed contraction branches (they must stay in lockstep)."""
    order = np.argsort(c)
    c, p = c[order], p[order]
    fi = np.searchsorted(c, p)  # f as an index array (total: every
    # partner is itself a component with a selected edge)
    ff = fi[fi]
    is_root = (c[ff] == c) & (c < p)  # 2-cycle, lower endpoint
    fi = np.where(is_root, np.arange(len(c)), fi)
    while True:
        f2 = fi[fi]
        if (f2 == fi).all():
            break
        fi = f2
    return c, c[fi]


def minimum_spanning_forest(
    edges_ds,
    num_buckets: int = 32,
    max_rounds: int = 48,
    broadcast_threshold: int | None = None,
):
    """-> Dataset (src, dst, weight): the unique minimum spanning forest of
    the undirected weighted graph under the (weight, src, dst) edge total
    order (src < dst canonical; self-loops dropped; the minimum-weight
    parallel edge wins by the same order). Input columns: src, dst, weight
    (numeric; compared as float64)."""
    import ray

    from raylink.join import (BROADCAST_THRESHOLD, attach_lookup, hash_join,
                              loop_barrier, with_typed_empty)

    if broadcast_threshold is None:
        broadcast_threshold = BROADCAST_THRESHOLD
    B = np.uint64(num_buckets)
    debug = bool(os.environ.get("RAYLINK_MST_DEBUG"))

    def canon_w(batch: pa.Table) -> pa.Table:
        from raylink.util import assert_packable

        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        w = batch.column("weight").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        keep = s != d
        s, d, w = s[keep], d[keep], w[keep]
        a = np.minimum(s, d).astype(np.int64)
        b = np.maximum(s, d).astype(np.int64)
        assert_packable(a, "minimum_spanning_forest vid")
        assert_packable(b, "minimum_spanning_forest vid")
        key = (a << np.int64(32)) | b
        order = np.lexsort((w, key))
        key, w = key[order], w[order]
        first = np.r_[True, key[1:] != key[:-1]]  # min weight per pair
        key, w = key[first], w[first]
        return pa.table(
            {
                "kb": pa.array(
                    (splitmix64(key.view(np.uint64)) % B).astype(np.int32)
                ),
                "key": pa.array(key),
                "weight": pa.array(w),
            }
        )

    def min_per_key(group: pa.Table, key_col: str, extra: tuple = ()):
        """First row per ``key_col`` under (key_col, weight, key) — the
        (weight, src, dst) edge total order; ``extra`` columns ride along."""
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        w = group.column("weight").to_numpy(zero_copy_only=False)
        others = {nm: group.column(nm).to_numpy(zero_copy_only=False)
                  for nm in extra}
        if "key" in others:
            # tiebreak on the packed key as UNSIGNED: keys whose src half
            # is >= 2**31 are negative int64, and a signed sort would
            # invert the documented (weight, src, dst) total order
            order = np.lexsort((others["key"].view(np.uint64), w, k))
        else:
            order = np.lexsort((w, k))
        k, w = k[order], w[order]
        first = np.r_[True, k[1:] != k[:-1]]
        cols = {key_col: pa.array(k[first]), "weight": pa.array(w[first])}
        for nm, arr in others.items():
            cols[nm] = pa.array(arr[order][first])
        return pa.table(cols)

    alive = (
        edges_ds.map_batches(canon_w, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(lambda g: min_per_key(g, "key"), batch_format="pyarrow")
        .materialize()
    )

    def endpoints(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False)
        v = np.unique(
            np.concatenate([unpack_hi(k), k & np.int64(0xFFFFFFFF)])
        )
        return pa.table({"vid": pa.array(v), "comp": pa.array(v)})

    from raylink.join import bucketed_distinct

    comp = (
        bucketed_distinct(
            alive.map_batches(endpoints, batch_format="pyarrow"), "vid"
        )
        .map_batches(
            lambda b: pa.table(
                {"vid": b.column("vid"), "comp": b.column("vid")}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def split_vids(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": pa.array(unpack_hi(k)),
                "vid2": pa.array(k & np.int64(0xFFFFFFFF)),
                "key": batch.column("key"),
                "weight": batch.column("weight"),
            }
        )

    def comp_rows(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False)
        w = batch.column("weight").to_numpy(zero_copy_only=False)
        ca = batch.column("ca").to_numpy(zero_copy_only=False)
        cb = batch.column("cb").to_numpy(zero_copy_only=False)
        c = np.concatenate([ca, cb])
        o = np.concatenate([cb, ca])
        kk = np.concatenate([k, k])
        ww = np.concatenate([w, w])
        return pa.table(
            {
                "cbk": pa.array(
                    (splitmix64(c.astype(np.uint64)) % B).astype(np.int32)
                ),
                "c": pa.array(c),
                "p": pa.array(o),
                "key": pa.array(kk),
                "weight": pa.array(ww),
            }
        )

    forest_parts = []
    n_comp0 = comp.count()
    if n_comp0 <= broadcast_threshold:
        # vertex->component map held DRIVER-side for the whole run (bounded
        # by the broadcast threshold — the attach_lookup precedent; the
        # distributed branch below covers crawl-scale V). Each round is then
        # exactly TWO dataset executions: one broadcast attach+cross-filter
        # map (barriered — it feeds count, the sel stage and the next
        # round), and the per-component argmin groupby.
        cdf = comp.to_pandas()
        vids_s = cdf["vid"].to_numpy(np.int64)
        order0 = np.argsort(vids_s)
        vids_s = vids_s[order0]
        comps_a = cdf["comp"].to_numpy(np.int64)[order0]
        for rnd in range(max_rounds):
            if alive.count() == 0:
                break
            ref = ray.put((vids_s, comps_a))

            def attach_cross(batch: pa.Table) -> pa.Table:
                vs, ca_map = ray.get(ref)
                k = batch.column("key").to_numpy(zero_copy_only=False)
                a = unpack_hi(k)
                b = k & np.int64(0xFFFFFFFF)
                ca = ca_map[np.searchsorted(vs, a)]
                cb = ca_map[np.searchsorted(vs, b)]
                keep = ca != cb
                sel_b = batch.filter(pa.array(keep))
                return pa.table(
                    {
                        "key": sel_b.column("key"),
                        "weight": sel_b.column("weight"),
                        "ca": pa.array(ca[keep]),
                        "cb": pa.array(cb[keep]),
                    }
                )

            alive = loop_barrier(
                alive.map_batches(attach_cross, batch_format="pyarrow"),
                "mst-alive",
            )
            n_alive = alive.count()
            if debug:
                print(f"[mst] round {rnd}: cross edges {n_alive}", flush=True)
            if n_alive == 0:
                break
            sel = (
                alive.map_batches(comp_rows, batch_format="pyarrow")
                .groupby("cbk")
                .map_groups(
                    lambda g: min_per_key(g, "c", extra=("p", "key")),
                    batch_format="pyarrow",
                )
                .materialize()
            )
            forest_parts.append(sel.select_columns(["key", "weight"]))
            # contraction fully driver-side (sel is bounded by #components)
            pdf = sel.select_columns(["c", "p"]).to_pandas()
            c, roots = _contract_roots(
                pdf["c"].to_numpy(np.int64), pdf["p"].to_numpy(np.int64)
            )
            pos = np.searchsorted(c, comps_a)
            hit = (pos < len(c)) & (
                c[np.minimum(pos, max(len(c) - 1, 0))] == comps_a
            )
            comps_a = np.where(hit, roots[np.minimum(pos, len(c) - 1)],
                               comps_a)
        else:
            if alive.count() > 0:
                raise RuntimeError(
                    "minimum_spanning_forest: not converged — raise max_rounds"
                )
        return _finish_forest(forest_parts, B)

    for rnd in range(max_rounds):
        if alive.count() == 0:
            break
        n_comp = comp.count()
        # 1. component labels on both endpoints (thresholded broadcast/hash)
        ea = attach_lookup(
            alive.map_batches(split_vids, batch_format="pyarrow"),
            comp,
            on="vid",
            left_cols={"vid2": pa.int64(), "key": pa.int64(),
                       "weight": pa.float64()},
            value_cols={"comp": pa.int64()},
            n_lookup_rows=n_comp,
            broadcast_threshold=broadcast_threshold,
            num_buckets=num_buckets,
        ).map_batches(
            lambda b: pa.table(
                {
                    "vid2": b.column("vid2"),
                    "key": b.column("key"),
                    "weight": b.column("weight"),
                    "ca": b.column("comp"),
                }
            ),
            batch_format="pyarrow",
        )
        eab = attach_lookup(
            ea,
            comp.map_batches(
                lambda b: pa.table(
                    {"vid2": b.column("vid"), "cb": b.column("comp")}
                ),
                batch_format="pyarrow",
            ),
            on="vid2",
            left_cols={"key": pa.int64(), "weight": pa.float64(),
                       "ca": pa.int64()},
            value_cols={"cb": pa.int64()},
            n_lookup_rows=n_comp,
            broadcast_threshold=broadcast_threshold,
            num_buckets=num_buckets,
        )

        def cross_only(batch: pa.Table) -> pa.Table:
            ca = batch.column("ca").to_numpy(zero_copy_only=False)
            cb = batch.column("cb").to_numpy(zero_copy_only=False)
            sel = batch.filter(pa.array(ca != cb))
            return pa.table(
                {
                    "key": sel.column("key"),
                    "weight": sel.column("weight"),
                    "ca": sel.column("ca"),
                    "cb": sel.column("cb"),
                }
            )

        alive = loop_barrier(
            eab.map_batches(cross_only, batch_format="pyarrow"), "mst-alive"
        )
        n_alive = alive.count()
        if debug:
            print(f"[mst] round {rnd}: comps {n_comp}, cross edges {n_alive}",
                  flush=True)
        if n_alive == 0:
            break
        # 2. per-component min incident edge under (weight, key)
        sel = (
            alive.map_batches(comp_rows, batch_format="pyarrow")
            .groupby("cbk")
            .map_groups(
                lambda g: min_per_key(g, "c", extra=("p", "key")),
                batch_format="pyarrow",
            )
            .materialize()
        )
        forest_parts.append(sel.select_columns(["key", "weight"]))
        n_sel = sel.count()
        # 3. contract the pointer graph f(c) = p
        if n_sel <= broadcast_threshold:
            # bounded pull (<= #components rows, >= halving per round) —
            # the attach_lookup broadcast precedent; identical result to
            # the distributed doubling path (path-agreement tested)
            pdf = sel.select_columns(["c", "p"]).to_pandas()
            c, roots = _contract_roots(
                pdf["c"].to_numpy(np.int64), pdf["p"].to_numpy(np.int64)
            )
            ref = ray.put((c, roots))

            def relabel(batch: pa.Table) -> pa.Table:
                cs, rs = ray.get(ref)
                cc = batch.column("comp").to_numpy(zero_copy_only=False)
                pos = np.searchsorted(cs, cc)
                ok = (pos < len(cs)) & (
                    cs[np.minimum(pos, max(len(cs) - 1, 0))] == cc
                )
                # comps without a selected edge are FINISHED (no cross
                # edges): their vertices never reach alive edges again —
                # drop them (matches the hash path's inner join)
                sel_b = batch.filter(pa.array(ok))
                return pa.table(
                    {
                        "vid": sel_b.column("vid"),
                        "comp": pa.array(rs[pos[ok]]),
                    }
                )

            comp = loop_barrier(
                comp.map_batches(relabel, batch_format="pyarrow"), "mst-comp"
            )
        else:
            f = loop_barrier(
                sel.map_batches(
                    lambda b: pa.table({"c": b.column("c"), "p": b.column("p")}),
                    batch_format="pyarrow",
                ),
                "mst-f",
            )
            fp = hash_join(
                f,
                f.map_batches(
                    lambda b: pa.table(
                        {"p": b.column("c"), "pp": b.column("p")}
                    ),
                    batch_format="pyarrow",
                ),
                on="p",
                left_cols={"c": pa.int64()},
                right_cols={"pp": pa.int64()},
                num_buckets=num_buckets,
            )

            def root_fix(batch: pa.Table) -> pa.Table:
                c = batch.column("c").to_numpy(zero_copy_only=False)
                pcol = batch.column("p").to_numpy(zero_copy_only=False)
                pp = batch.column("pp").to_numpy(zero_copy_only=False)
                newp = np.where((pp == c) & (c < pcol), c, pcol)
                return pa.table({"c": pa.array(c), "p": pa.array(newp)})

            f = loop_barrier(
                fp.map_batches(root_fix, batch_format="pyarrow"), "mst-f"
            )
            # pointer doubling halves tree depth per jump and is idempotent
            # at the fixpoint, so ceil(log2(n_sel)) + 1 jumps always suffice
            # — no per-iteration convergence aggregate needed
            n_jumps = int(np.ceil(np.log2(max(n_sel, 2)))) + 1
            for jump in range(n_jumps):
                f = hash_join(
                    f,
                    f.map_batches(
                        lambda b: pa.table(
                            {"p": b.column("c"), "pp": b.column("p")}
                        ),
                        batch_format="pyarrow",
                    ),
                    on="p",
                    left_cols={"c": pa.int64()},
                    right_cols={"pp": pa.int64()},
                    num_buckets=num_buckets,
                )
                f = loop_barrier(
                    f.map_batches(
                        lambda b: pa.table(
                            {"c": b.column("c"), "p": b.column("pp")}
                        ),
                        batch_format="pyarrow",
                    ),
                    "mst-f",
                )
                if debug:
                    print(f"[mst]   jump {jump + 1}/{n_jumps}", flush=True)
            comp = hash_join(
                comp.map_batches(
                    lambda b: pa.table(
                        {"c": b.column("comp"), "vid": b.column("vid")}
                    ),
                    batch_format="pyarrow",
                ),
                f,
                on="c",
                left_cols={"vid": pa.int64()},
                right_cols={"p": pa.int64()},
                strict=False,  # finished components drop out (see above)
                num_buckets=num_buckets,
            )
            comp = loop_barrier(
                comp.map_batches(
                    lambda b: pa.table(
                        {"vid": b.column("vid"), "comp": b.column("p")}
                    ),
                    batch_format="pyarrow",
                ),
                "mst-comp",
            )
    else:
        if alive.count() > 0:
            raise RuntimeError(
                "minimum_spanning_forest: not converged — raise max_rounds"
            )

    return _finish_forest(forest_parts, B)


def _finish_forest(forest_parts, B: np.uint64):
    """Union the per-round selected edges, dedupe the 2-cycle double picks
    once (an edge is selectable in exactly one round), unpack to
    (src, dst, weight)."""
    from raylink.join import with_typed_empty

    empty = {"src": pa.int64(), "dst": pa.int64(), "weight": pa.float64()}
    if not forest_parts:
        import ray.data as rd

        return rd.from_arrow(
            pa.table({nm: pa.array([], type=t) for nm, t in empty.items()})
        )
    out = forest_parts[0]
    for part in forest_parts[1:]:
        out = out.union(part)

    def fkey_bucket(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "fbk": pa.array(
                    (splitmix64(k.view(np.uint64)) % B).astype(np.int32)
                ),
                "key": batch.column("key"),
                "weight": batch.column("weight"),
            }
        )

    def unpack_uniq(group: pa.Table) -> pa.Table:
        k = group.column("key").to_numpy(zero_copy_only=False)
        w = group.column("weight").to_numpy(zero_copy_only=False)
        order = np.lexsort((w, k))
        k, w = k[order], w[order]
        first = np.r_[True, k[1:] != k[:-1]]
        k, w = k[first], w[first]
        return pa.table(
            {
                "src": pa.array(unpack_hi(k)),
                "dst": pa.array(k & np.int64(0xFFFFFFFF)),
                "weight": pa.array(w),
            }
        )

    return with_typed_empty(
        out.map_batches(fkey_bucket, batch_format="pyarrow")
        .groupby("fbk")
        .map_groups(unpack_uniq, batch_format="pyarrow"),
        empty,
    )
