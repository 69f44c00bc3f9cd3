"""Bow-tie decomposition of a directed web graph (Broder et al., "Graph
structure in the Web", WWW 2000 — public literature).

Every vertex is labeled with its macro-structure region relative to the
largest strongly connected component (the CORE; ties broken by min SCC
label):

  CORE          the largest SCC
  IN            reaches the CORE, not in it
  OUT           reachable from the CORE, not in it
  TUBE          on an IN->...->OUT path avoiding the CORE
  TENDRIL       hangs off IN (forward) xor leads into OUT (backward)
  OTHER         same weak component as the CORE, none of the above
                (attached to a tendril against its direction)
  DISCONNECTED  a different weak component

The reference is graph-only and ships no bow-tie job; this is the classic
crawl-analytics composition of the engine's existing primitives:

  SCC (FB-coloring BSP, algos/scc.py) -> core id (one bounded groupby +
  top-1; a single scalar reaches the driver) -> four multi-source
  reachability legs, each a SUPERSOURCE SSSP: a virtual vertex S
  (2^31 - 1, outside the packable vid range of any real corpus id space)
  gets an edge to every seed, and one directed hop-BFS BSP job marks the
  reachable set — the seed set is dataset-sized and never touches the
  driver (it enters as edge rows built by a map_batches over the previous
  leg's result).

  leg 1  fwd(CORE)  over the edges          -> OUT
  leg 2  bwd(CORE)  over the reversed edges -> IN
  leg 3  fwd(bwd-finite)                    -> tube/tendril forward flag
  leg 4  bwd(fwd-finite)                    -> tube/tendril backward flag

  (legs 3/4 seed from IN u CORE / OUT u CORE: for any vertex outside
  CORE/IN/OUT the extra CORE seeds add nothing — fwd(CORE) \ CORE = OUT —
  so the classification is identical to seeding from IN/OUT alone, and no
  scc-label join is needed to build the seed edges.)

Classification is ONE coarse-bucket shuffle: the six per-vertex facts
(scc label, four leg distances, weak component) union as tagged rows,
pivot vectorized per bucket. Scale notes: S is a fanout-|seeds| hub in one
partition — the documented high-degree-vertex surface of the BSP engine
(split the supersource by seed ranges at crawl scale); everything else
rides the SSSP/SCC/CC scale arguments unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SUPER_SOURCE = np.int64((1 << 31) - 1)  # packable, outside every vid space

REGIONS = ("CORE", "IN", "OUT", "TUBE", "TENDRIL", "OTHER", "DISCONNECTED")


def _seed_edges(flag_ds, exclude: int):
    """(vid, dist) rows with dist >= 0 and vid != exclude -> supersource
    edge rows (S -> vid)."""

    def mk(batch: pa.Table) -> pa.Table:
        v = batch.column("vid").to_numpy(zero_copy_only=False)
        d = batch.column("dist").to_numpy(zero_copy_only=False)
        v = v[(d >= 0) & (v != exclude)]
        return pa.table(
            {"src": pa.array(np.full(len(v), SUPER_SOURCE, dtype=np.int64)),
             "dst": pa.array(v.astype(np.int64))}
        )

    return flag_ds.map_batches(mk, batch_format="pyarrow")


def _reach(edges_ds, seed_edges_ds, reverse: bool, ckpt_dir: str | None,
           engine: str = "tasks"):
    """Directed reachability from the seed set as a supersource hop-BFS ->
    Dataset (vid, dist) with dist = -1 unreachable (S row included)."""
    from raylink.algos.sssp import sssp

    def orient(batch: pa.Table) -> pa.Table:
        s, d = batch.column("src"), batch.column("dst")
        if reverse:
            s, d = d, s
        return pa.table({"src": s, "dst": d})

    aug = edges_ds.select_columns(["src", "dst"]).map_batches(
        orient, batch_format="pyarrow"
    ).union(seed_edges_ds)
    _, dists = sssp(
        edges_ds=aug, source=int(SUPER_SOURCE), directed=True,
        engine=engine, ckpt_dir=ckpt_dir,
    )
    return dists


def bowtie(edges_ds, sccs_ds, comps_ds, ckpt_root: str | None = None,
           engine: str = "tasks", num_buckets: int = 32):
    """-> Dataset (vid, region) per vertex of ``sccs_ds`` (the full vertex
    set). ``edges_ds``: directed (src, dst); ``sccs_ds``: (vid, scc);
    ``comps_ds``: (vid, component) of the undirected closure."""
    from raylink import storage
    from raylink.join import bucketed_sum
    from raylink.util import splitmix64

    sccs_ds = sccs_ds.materialize()

    # core = largest SCC, ties -> min label; one bounded sum + top-1 scalar
    sizes = bucketed_sum(
        sccs_ds.map_batches(
            lambda b: pa.table(
                {"scc": b.column("scc"),
                 "c": pa.array(np.ones(len(b), dtype=np.int64))}
            ),
            batch_format="pyarrow",
        ),
        "scc", "c", out_val="size", num_buckets=num_buckets,
    )
    top = sizes.sort(["size", "scc"], descending=[True, False]).limit(1)
    core_id = int(top.take(1)[0]["scc"])
    # the scc label is the MAX member vid -> itself a core member; its weak
    # component identifies the core's WCC
    wcc_core = int(
        comps_ds.filter(lambda r: r["vid"] == core_id).take(1)[0]["component"]
    )

    def ck(name: str) -> str | None:
        return storage.join(ckpt_root, name) if ckpt_root else None

    core_seeds = _seed_edges(
        sccs_ds.map_batches(
            lambda b: pa.table(
                {"vid": b.column("vid"),
                 "dist": pa.array(
                     (b.column("scc").to_numpy(zero_copy_only=False)
                      == core_id).astype(np.int64) - 1
                 )}
            ),
            batch_format="pyarrow",
        ),
        exclude=-1,
    )
    fwd = _reach(edges_ds, core_seeds, reverse=False, ckpt_dir=ck("fwd"),
                 engine=engine).materialize()
    bwd = _reach(edges_ds, core_seeds, reverse=True, ckpt_dir=ck("bwd"),
                 engine=engine).materialize()
    fin = _reach(edges_ds, _seed_edges(bwd, exclude=int(SUPER_SOURCE)),
                 reverse=False, ckpt_dir=ck("fin"), engine=engine)
    bout = _reach(edges_ds, _seed_edges(fwd, exclude=int(SUPER_SOURCE)),
                  reverse=True, ckpt_dir=ck("bout"), engine=engine)

    B = np.uint64(num_buckets)

    def tag(ds, t: int, col: str):
        def mk(batch: pa.Table) -> pa.Table:
            v = batch.column("vid").to_numpy(zero_copy_only=False)
            x = batch.column(col).to_numpy(zero_copy_only=False)
            keep = v != SUPER_SOURCE
            v, x = v[keep].astype(np.int64), x[keep].astype(np.int64)
            return pa.table(
                {"bkt": pa.array(
                    (splitmix64(v.astype(np.uint64)) % B).astype(np.int32)
                 ),
                 "vid": pa.array(v),
                 "tag": pa.array(np.full(len(v), t, dtype=np.int64)),
                 "val": pa.array(x)}
            )

        return ds.map_batches(mk, batch_format="pyarrow")

    tagged = (
        tag(sccs_ds, 0, "scc")
        .union(tag(fwd, 1, "dist"))
        .union(tag(bwd, 2, "dist"))
        .union(tag(fin, 3, "dist"))
        .union(tag(bout, 4, "dist"))
        .union(tag(comps_ds, 5, "component"))
    )

    def classify(group: pa.Table) -> pa.Table:
        v = group.column("vid").to_numpy(zero_copy_only=False)
        t = group.column("tag").to_numpy(zero_copy_only=False)
        x = group.column("val").to_numpy(zero_copy_only=False)
        uv, inv = np.unique(v, return_inverse=True)
        n = len(uv)
        # pivot: facts[tag] per vertex; vertices missing a leg (isolated —
        # never entered a reach graph) default to unreachable / own labels
        facts = np.full((6, n), -1, dtype=np.int64)
        facts[t, inv] = x
        scc = facts[0]
        is_core = scc == core_id
        is_in = (facts[2] >= 0) & ~is_core
        is_out = (facts[1] >= 0) & ~is_core
        f3, b4 = facts[3] >= 0, facts[4] >= 0
        rest = ~(is_core | is_in | is_out)
        is_tube = rest & f3 & b4
        is_tendril = rest & (f3 ^ b4)
        same_wcc = facts[5] == wcc_core
        region = np.where(
            is_core, "CORE",
            np.where(is_in, "IN",
                     np.where(is_out, "OUT",
                              np.where(is_tube, "TUBE",
                                       np.where(is_tendril, "TENDRIL",
                                                np.where(same_wcc, "OTHER",
                                                         "DISCONNECTED"))))),
        )
        return pa.table({"vid": pa.array(uv), "region": pa.array(region)})

    return tagged.groupby("bkt").map_groups(classify, batch_format="pyarrow")
