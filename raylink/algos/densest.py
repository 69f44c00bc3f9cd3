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

Exactness: everything the peel decides is INTEGER — the removal test
``deg <= factor * E / V`` is evaluated as ``deg <= (factor * E) // V``
(equivalent for integer deg, no overflow: factor * E stays well inside
int64), so rounds are bit-exactly SQL-mirrorable with no float thresholds.
The one float comparison — picking the best round by density — is a single
IEEE division per round, identical on both sides (first-max rule == SQL
``ORDER BY density DESC, round ASC LIMIT 1``).

Scale shape: per round two coarse-bucket semi-joins re-induce the edge set
on the survivors, one ``bucketed_sum`` computes degrees, and the driver
holds only (round, E, V) scalars; loop-carried datasets go through
``loop_barrier`` parquet snapshots (the Ray 2.49 lineage-reexecution
guard). Removed vertices stream to per-round snapshots — the output
(vid, peel_round, in_densest) is assembled distributedly, nothing
vertex-sized on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.util import splitmix64


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


def densest_subgraph(
    edges_ds,
    verts_ds,
    factor: int = 3,
    max_rounds: int = 64,
    num_buckets: int = 32,
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

    from raylink.join import bucketed_sum, loop_barrier, semi_join

    verts = verts_ds.map_batches(
        lambda b: pa.table({"vid": b.column("vid")}), batch_format="pyarrow"
    )
    edges = loop_barrier(
        _canonical_simple_edges(edges_ds, num_buckets), "densest-e0"
    )
    verts = loop_barrier(verts, "densest-v0")

    stats = []
    removed_paths = []
    r = 0
    while True:
        nv = verts.count()
        if nv == 0:
            break
        if r >= max_rounds:
            raise RuntimeError(
                f"densest_subgraph: {max_rounds} rounds without emptying "
                f"(nv={nv}) — the (1+eps) shrink guarantee requires "
                "factor >= 3"
            )
        ne = edges.count()
        stats.append(
            {"round": r, "n_edges": ne, "n_vertices": nv,
             "density": float(np.float64(ne) / np.float64(nv))}
        )
        thr = (factor * ne) // nv  # deg <= factor*E/V, integer-exact

        ends = edges.map_batches(
            lambda b: pa.table(
                {
                    "vid": pa.concat_arrays(
                        [b.column("a").combine_chunks(),
                         b.column("b").combine_chunks()]
                    ),
                    "one": pa.array(np.ones(2 * b.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
        deg = bucketed_sum(ends, "vid", "one", out_val="c",
                           num_buckets=num_buckets)
        survivors = deg.map_batches(
            lambda b, t=thr: b.filter(
                pa.compute.greater(b.column("c"), pa.scalar(t))
            ).select(["vid"]),
            batch_format="pyarrow",
        )
        survivors = loop_barrier(survivors, f"densest-s{r}")
        removed = semi_join(
            verts, survivors, on="vid", left_cols={}, anti=True,
            n_key_rows=nv, num_buckets=num_buckets,
        ).map_batches(
            lambda b, t=r: pa.table(
                {
                    "vid": b.column("vid"),
                    "peel_round": pa.array(
                        np.full(b.num_rows, t, dtype=np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        removed_paths.append(loop_barrier(removed, f"densest-r{r}"))
        # survivors ARE the next vertex set (edge endpoints are always
        # current vertices, so deg rows never mention peeled vids)
        verts = survivors

        def as_col(name):  # semi_join keys must carry the join column name
            return survivors.map_batches(
                lambda b, nm=name: pa.table({nm: b.column("vid")}),
                batch_format="pyarrow",
            )

        edges = semi_join(
            semi_join(edges, as_col("a"), on="a",
                      left_cols={"b": pa.int64()},
                      n_key_rows=nv, num_buckets=num_buckets),
            as_col("b"), on="b", left_cols={"a": pa.int64()},
            n_key_rows=nv, num_buckets=num_buckets,
        )
        edges = loop_barrier(edges, f"densest-e{r + 1}")
        r += 1

    if not stats:  # empty input graph
        empty = pa.table(
            {"vid": pa.array([], type=pa.int64()),
             "peel_round": pa.array([], type=pa.int64()),
             "in_densest": pa.array([], type=pa.int64())}
        )
        return stats, rd.from_arrow(empty)

    dens = np.array([s["density"] for s in stats], dtype=np.float64)
    best = int(np.argmax(dens))  # first max == SQL (density DESC, round ASC)

    out = removed_paths[0]
    for ds in removed_paths[1:]:
        out = out.union(ds)
    return stats, out.map_batches(
        lambda b: pa.table(
            {
                "vid": b.column("vid"),
                "peel_round": b.column("peel_round"),
                "in_densest": pa.array(
                    (
                        b.column("peel_round").to_numpy(zero_copy_only=False)
                        >= best
                    ).astype(np.int64)
                ),
            }
        ),
        batch_format="pyarrow",
    )
