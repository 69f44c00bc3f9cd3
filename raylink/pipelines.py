"""End-to-end pipeline glue: testdata dir -> pages -> edges -> LinkGraph.

Graph builds and BSP checkpoints are cached under deterministic /tmp paths
keyed by (inputs, params, code version): re-running a query resumes instead
of recomputing — the same mechanism that makes production runs resumable
(north-rule lineage requirement) also accelerates repeated driver calls.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

from raylink.util import isin_sorted, unpack_hi
import pyarrow as pa

from raylink.extract import ExtractPages, explode_links
from raylink.graph import GRAPH_ROOT, LinkGraph, build_graph
from raylink.synth import pages_dataset

# bump when algorithm/build semantics change (invalidates cached graph dirs
# and checkpoints keyed below)
CODE_VERSION = "v2"


def cache_key(*parts) -> str:
    return hashlib.md5("|".join(str(p) for p in [CODE_VERSION, *parts]).encode()).hexdigest()[:16]


def _ids_from_urls(batch: pa.Table) -> pa.Table:
    """Synthetic-corpus vid assignment: the url path embeds the doc id.
    Vectorized with pyarrow.compute (strip everything up to the last '/',
    cast) — no per-row python. General corpora without embedded ids use
    ``hash_ids_from_urls`` instead."""
    import pyarrow.compute as pc

    def ids(col):
        return pc.cast(
            pc.replace_substring_regex(col, pattern="^.*/", replacement=""),
            pa.int64(),
        )

    return pa.table(
        {
            "src": ids(batch.column("src_url")),
            "dst": ids(batch.column("dst_url")),
        }
    )


def hash_ids_from_urls(batch: pa.Table) -> pa.Table:
    """General-corpus vid assignment: vid = hash64_str(url) (splitmix64 of
    the FNV-1a url digest). Use when urls carry no embedded integer id —
    the production path for a real crawl; collision bound documented on
    ``raylink.util.hash64_str``."""
    from raylink.util import hash64_str

    return pa.table(
        {
            "src": pa.array(hash64_str(batch.column("src_url"))),
            "dst": pa.array(hash64_str(batch.column("dst_url"))),
        }
    )


def page_edge_tables(sf_dir: str, concurrency: int = 4, batch_size: int = 512):
    """pages -> extract (actor pool) -> (extracted_ds, edges_ds, verts_ds, n)."""
    import ray.data as rd

    pages, n = pages_dataset(sf_dir)
    # autoscaling pool (min 1): a fixed pool of `concurrency` actors can
    # reserve every CPU on small clusters and starve the upstream read
    extracted = pages.drop_columns(["text"]).map_batches(
        ExtractPages, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency),
    )
    edges = extracted.map_batches(explode_links, batch_format="pyarrow").map_batches(
        _ids_from_urls, batch_format="pyarrow"
    )
    # distributed vertex range — the driver never holds an O(V) table
    verts = rd.range(n).map_batches(
        lambda b: pa.table({"vid": b.column("id")}), batch_format="pyarrow"
    )
    return extracted, edges, verts, n


def page_graph(
    sf_dir: str,
    directed: bool = True,
    num_parts: int | None = 8,
    partitioner: str = "mod",
    concurrency: int = 4,
) -> LinkGraph:
    """Build (or reuse the cached) LinkGraph of the synthetic page corpus.

    Default partitioner is 'mod' so subgraph-level results are expressible in
    the SQL oracle; PageRank/CC/LPA values are partitioning-invariant.
    ``num_parts=None`` sizes the partition count from the extracted edge
    count via ``auto_num_parts`` (the crawl-scale default — P=8 holds only
    while one partition's CSR fits a worker heap)."""
    from raylink import storage
    from raylink.graph import auto_num_parts

    edges = None
    if num_parts is None:
        _, edges, verts, _ = page_edge_tables(sf_dir, concurrency=concurrency)
        edges = edges.materialize()
        num_parts = auto_num_parts(edges.count())
    key = cache_key("page_graph", sf_dir, directed, num_parts, partitioner)
    gdir = storage.join(GRAPH_ROOT, key)
    if storage.exists(storage.join(gdir, "manifest.json")):
        return LinkGraph.load(gdir)
    if edges is None:
        _, edges, verts, _ = page_edge_tables(sf_dir, concurrency=concurrency)
        # materialize the (small) edge table before build: the undirected
        # closure references the edge pipeline twice, and two extraction
        # actor pools can reserve every CPU and starve the upstream read
        # (deadlock at low cpus)
        edges = edges.materialize()
    return build_graph(
        edges,
        verts,
        num_parts=num_parts,
        partitioner=partitioner,
        directed=directed,
        graph_dir=gdir,
    )


def distinct_edges(edges_ds):
    """Exact dedup of (src,dst) via a packed-key groupby. Enforces the
    vid < 2**32 packing contract (guard raises with a pointer to
    ``raylink.ids.dense_id_remap`` for hash-assigned 63-bit id corpora)."""
    from raylink.util import assert_packable

    def pack(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        assert_packable(s, "distinct_edges src")
        assert_packable(d, "distinct_edges dst")
        return pa.table({"key": pa.array(np.unique((s << np.int64(32)) | d))})

    def unpack(batch: pa.Table) -> pa.Table:
        k = batch.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(unpack_hi(k)),
                "dst": pa.array(k & np.int64(0xFFFFFFFF)),
            }
        )

    from raylink.join import bucketed_distinct

    return bucketed_distinct(
        edges_ds.map_batches(pack, batch_format="pyarrow"), "key", num_buckets=64
    ).map_batches(unpack, batch_format="pyarrow")


def diff_edges(edges_a, edges_b):
    """Crawl-snapshot edge diff: distinct edges of capture B minus capture A
    ('added') plus A minus B ('removed'), as (src, dst, change) rows.

    Shape: packed-key distinct on each side (one groupby each), then two
    distributed anti-joins (``join.anti_join`` — bucketed by splitmix64,
    nothing driver-side). The same 32-bit packing contract as
    ``distinct_edges`` (guard raises, dense_id_remap is the cure)."""
    from raylink.join import anti_join

    def pack(batch: pa.Table) -> pa.Table:
        from raylink.util import assert_packable

        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        assert_packable(s, "diff_edges src")
        assert_packable(d, "diff_edges dst")
        return pa.table({"key": pa.array(np.unique((s << np.int64(32)) | d))})

    def unpack(change: str):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch.column("key").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "src": pa.array(unpack_hi(k)),
                    "dst": pa.array(k & np.int64(0xFFFFFFFF)),
                    "change": pa.array([change] * len(k), type=pa.string()),
                }
            )

        return fn

    def distinct_keys(e):
        from raylink.join import bucketed_distinct

        return bucketed_distinct(
            e.map_batches(pack, batch_format="pyarrow"), "key", num_buckets=64
        )

    ka, kb = distinct_keys(edges_a), distinct_keys(edges_b)
    added = anti_join(kb, ka, on="key", left_cols={}).map_batches(
        unpack("added"), batch_format="pyarrow"
    )
    removed = anti_join(ka, kb, on="key", left_cols={}).map_batches(
        unpack("removed"), batch_format="pyarrow"
    )
    return added.union(removed)


def degree_table(edges_ds, verts_ds):
    """(vid, out_degree, in_degree) including zero-degree vertices — one
    groupby over stacked per-batch partial counts."""

    def stack(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        sv, sc = np.unique(s, return_counts=True)
        dv, dc = np.unique(d, return_counts=True)
        return pa.table(
            {
                "vid": pa.array(np.concatenate([sv, dv])),
                "o": pa.array(np.concatenate([sc, np.zeros(len(dv), np.int64)])),
                "i": pa.array(np.concatenate([np.zeros(len(sv), np.int64), dc])),
            }
        )

    def vzero(batch: pa.Table) -> pa.Table:
        n = len(batch)
        z = np.zeros(n, dtype=np.int64)
        return pa.table({"vid": batch.column("vid"), "o": pa.array(z), "i": pa.array(z)})

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "out_degree": batch.column("sum(o)"),
                "in_degree": batch.column("sum(i)"),
            }
        )

    stacked = edges_ds.map_batches(stack, batch_format="pyarrow").union(
        verts_ds.map_batches(vzero, batch_format="pyarrow")
    )
    return (
        stacked.groupby("vid").sum(["o", "i"]).map_batches(finish, batch_format="pyarrow")
    )


def mirror_groups(edges_ds, num_buckets: int = 64):
    """Mirror detection: group pages whose DISTINCT outlink sets are
    IDENTICAL — the crawl mirror/alias shape (the same document served from
    two urls links to exactly the same targets; CC-style crawls dedup these
    before ranking). -> Dataset (vid, mirror_rep, n_mirrors), one row per
    member of every group of >= 2 pages, where ``mirror_rep`` is the group's
    min vid. Pages with no outlinks are NOT grouped (an empty outlink set is
    not evidence of mirroring).

    Shape: per-batch distinct (src, dst) -> bucket by splitmix64(src) so
    every edge of a src lands in ONE group -> per-group sorted-outlink
    fingerprint (FNV-1a over the ascending dsts' little-endian int64 bytes,
    ``util.fnv1a_ranges`` — one kernel over the whole group, no per-src
    python) -> one coarse-bucketed fingerprint groupby -> groups of >= 2
    emitted. Fingerprint+degree equality stands in for set equality
    (~2^-64 false-merge per pair — the documented trade of every hashed op
    here, same as ``ops.dedup``). Both shuffles carry one row per page,
    never the outlink lists themselves."""
    from raylink.util import fnv1a_ranges, splitmix64

    B = np.uint64(num_buckets)

    def bucket(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        # per-batch distinct (src, dst) pre-combine before the shuffle
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        keep = np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])]
        s, d = s[keep], d[keep]
        return pa.table(
            {
                "b": pa.array((splitmix64(s.astype(np.uint64)) % B).astype(np.int32)),
                "src": pa.array(s),
                "dst": pa.array(d),
            }
        )

    def fingerprint(group: pa.Table) -> pa.Table:
        s = group.column("src").to_numpy(zero_copy_only=False)
        d = group.column("dst").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, s))  # ascending dsts per src
        s, d = s[order], d[order]
        keep = np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])]
        s, d = s[keep], d[keep]
        first = np.r_[True, s[1:] != s[:-1]]
        starts = np.flatnonzero(first)
        degs = np.diff(np.r_[starts, len(s)])
        data = np.ascontiguousarray(d, dtype=np.int64).view(np.uint8)
        fp = fnv1a_ranges(data, starts * 8, degs * 8).view(np.int64)
        return pa.table(
            {
                "fb": pa.array(
                    (splitmix64(fp.view(np.uint64)) % B).astype(np.int32)
                ),
                "vid": pa.array(s[first]),
                "fp": pa.array(fp),
                "deg": pa.array(degs.astype(np.int64)),
            }
        )

    def groups(group: pa.Table) -> pa.Table:
        v = group.column("vid").to_numpy(zero_copy_only=False)
        fp = group.column("fp").to_numpy(zero_copy_only=False)
        dg = group.column("deg").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, dg, fp))
        v, fp, dg = v[order], fp[order], dg[order]
        first = np.r_[True, (fp[1:] != fp[:-1]) | (dg[1:] != dg[:-1])]
        seg = np.cumsum(first) - 1
        sizes = np.bincount(seg)
        keep = sizes[seg] >= 2  # groups of >= 2 only
        reps = v[np.flatnonzero(first)]  # min vid per group (v sorted in seg)
        return pa.table(
            {
                "vid": pa.array(v[keep]),
                "mirror_rep": pa.array(reps[seg[keep]]),
                "n_mirrors": pa.array(sizes[seg[keep]].astype(np.int64)),
            }
        )

    return (
        edges_ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(fingerprint, batch_format="pyarrow")
        .groupby("fb")
        .map_groups(groups, batch_format="pyarrow")
    )


def khop_egonet(edges_ds, seeds: list[int], k: int):
    """Induced subgraph of the k-hop UNDIRECTED neighbourhood of a seed
    set: the canonical simple edges (src < dst, self-loops dropped) whose
    BOTH endpoints lie within hop distance <= k of any seed -> Dataset
    (src, dst) — the subgraph-extraction primitive (debug slices, ego-net
    sampling, community close-ups).

    Shape: k rounds of frontier expansion, each ONE distributed semi-join
    over the symmetric adjacency (``join.semi_join``: all rows of a vertex
    land in one bucket group) + a bucketed distinct
    (``join.bucketed_distinct`` — per-key groupby machinery costs seconds
    even on tiny inputs); then two semi-joins keep edges with both
    endpoints visited. The driver holds only the seed list; frontiers, the
    visited set and the result stay Datasets. Rounds are k sequential
    shuffles — fine for the small k an ego-net means (use the BSP engine's
    BFS for deep traversals)."""
    import ray.data as rd

    from raylink.algos.triangles import _canon, _unpack
    from raylink.join import bucketed_distinct, semi_join

    canon = edges_ds.map_batches(_canon, batch_format="pyarrow")
    distinct = bucketed_distinct(canon, "key").materialize()

    def und_rows(batch: pa.Table) -> pa.Table:
        a, b = _unpack(batch.column("key").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "v": pa.array(np.concatenate([a, b])),
                "n": pa.array(np.concatenate([b, a])),
            }
        )

    und = distinct.map_batches(und_rows, batch_format="pyarrow").materialize()
    visited = rd.from_arrow(
        pa.table({"v": pa.array(np.asarray(sorted(set(seeds)), dtype=np.int64))})
    )
    n_visited = visited.count()
    for _ in range(k):
        # visited is materialized each round, so its row count is free
        # metadata — the thresholded broadcast-vs-hash semi-join choice
        # costs no extra execution (the attach_lookup pattern)
        reached = semi_join(
            und, visited, on="v", left_cols={"n": pa.int64()},
            n_key_rows=n_visited,
        )
        nxt = reached.map_batches(
            lambda b: pa.table({"v": b.column("n")}), batch_format="pyarrow"
        )
        visited = bucketed_distinct(visited.union(nxt), "v").materialize()
        n_visited = visited.count()

    def unpack_edges(batch: pa.Table) -> pa.Table:
        a, b = _unpack(batch.column("key").to_numpy(zero_copy_only=False))
        return pa.table({"src": pa.array(a), "dst": pa.array(b)})

    def as_col(name):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({name: batch.column("v")})

        return fn

    vis_src = visited.map_batches(as_col("src"), batch_format="pyarrow")
    vis_dst = visited.map_batches(as_col("dst"), batch_format="pyarrow")
    both = distinct.map_batches(unpack_edges, batch_format="pyarrow")
    both = semi_join(
        both, vis_src, on="src", left_cols={"dst": pa.int64()},
        n_key_rows=n_visited,
    )
    from raylink.join import with_typed_empty

    return with_typed_empty(
        semi_join(
            both, vis_dst, on="dst", left_cols={"src": pa.int64()},
            n_key_rows=n_visited,
        ),
        {"dst": pa.int64(), "src": pa.int64()},
    )


def negative_samples(edges_ds, n_vertices: int, k: int = 5, seed: int = 0):
    """Deterministic negative-edge sampling (link-prediction / GNN training
    needs non-edges in ~k : 1 ratio to edges): for every vertex u in the
    DENSE id space [0, n_vertices) and slot j in [0, k), candidate
    w = splitmix64(u XOR (j+1)*GOLDEN XOR seed) % n_vertices; the row
    survives iff w != u and {u, w} is not an edge -> Dataset
    (src, dst, slot). Fully replay-invariant (pure hash of (u, j)) and
    mirrored bit-for-bit in SQL.

    Shape: one vectorized map over the vertex table (k candidates per
    vertex, no RNG state) + ONE distributed anti-join against the canonical
    edge keys — nothing driver-side. Requires dense ids
    (``ids.dense_id_remap`` for hash-id corpora) and vids < 2^32 (packed
    keys; the ``assert_packable`` guard in ``_canon`` raises otherwise)."""
    import ray.data as rd

    from raylink.algos.triangles import _canon
    from raylink.join import anti_join, bucketed_distinct
    from raylink.util import splitmix64

    GOLDEN = np.uint64(0x9E3779B97F4A7C15)
    sd = np.uint64(seed)
    nv = np.uint64(n_vertices)

    edge_keys = bucketed_distinct(
        edges_ds.map_batches(_canon, batch_format="pyarrow"), "key"
    )
    # distributed vertex range — the driver never holds an O(V) table
    verts = rd.range(n_vertices).map_batches(
        lambda b: pa.table({"vid": b.column("id")}), batch_format="pyarrow"
    )

    def candidates(batch: pa.Table) -> pa.Table:
        u = batch.column("vid").to_numpy(zero_copy_only=False)
        us, ws, js = [], [], []
        for j in range(k):
            w = (
                splitmix64(u.astype(np.uint64) ^ (np.uint64(j + 1) * GOLDEN) ^ sd)
                % nv
            ).astype(np.int64)
            keep = w != u
            us.append(u[keep])
            ws.append(w[keep])
            js.append(np.full(int(keep.sum()), j, dtype=np.int64))
        uu = np.concatenate(us)
        ww = np.concatenate(ws)
        a = np.minimum(uu, ww)
        b = np.maximum(uu, ww)
        return pa.table(
            {
                "key": pa.array((a << np.int64(32)) | b),
                "src": pa.array(uu),
                "dst": pa.array(ww),
                "slot": pa.array(np.concatenate(js)),
            }
        )

    return anti_join(
        verts.map_batches(candidates, batch_format="pyarrow"),
        edge_keys,
        on="key",
        left_cols={"src": pa.int64(), "dst": pa.int64(), "slot": pa.int64()},
    ).map_batches(
        lambda b: pa.table(
            {"src": b.column("src"), "dst": b.column("dst"),
             "slot": b.column("slot")}
        ),
        batch_format="pyarrow",
    )


def resolve_redirects(redirects_ds, num_buckets: int = 64, max_rounds: int = 40):
    """Resolve redirect chains over a functional link table: ``redirects_ds``
    has columns ``(src:int64, dst:int64)`` with each ``src`` appearing at
    most once (a page redirects to exactly one target). Returns a Dataset
    ``(src, final, hops)`` where ``final`` is the first target reached from
    ``src`` that is not itself a redirect source and ``hops`` the exact
    number of redirect steps taken — the crawl canonicalization pass that
    rewrites every link to its chain-terminal destination.

    Distributed POINTER DOUBLING: each round composes the current map with
    itself — every row is emitted twice, once as a PROBE keyed by its
    current target and once as an INDEX keyed by its source; a probe whose
    target matches an index source jumps to that index row's target and adds
    its hop count. One coarse-bucket groupby shuffle per round, and a chain
    of length L resolves in ceil(log2 L) rounds, so 10^1..10^3-long chain
    tails over 10^12 urls cost ~10 shuffles of 2x the redirect-table size —
    never O(L) sequential lookups and nothing driver-side (the driver sees
    one scalar per round). Rounds are snapshotted through ``loop_barrier``
    (chained lineage re-executes exponentially in Ray 2.49 — see
    join.loop_barrier). A redirect CYCLE never reaches a terminal; chains up
    to 2**max_rounds hops resolve within the budget, and one extra
    verification round observes the required zero-jump fixpoint (a run
    whose last budgeted round still jumped is only DONE if the next round
    jumps zero times — without it, chains resolving exactly on the budget
    would raise spuriously). Unresolved rows after that raise rather than
    return silently-wrong targets. Duplicate sources
    raise inside the compose task (equal keys land in one bucket).

    Reference analog: none — the reference loads pre-built adjacency lists
    (hama/.../LongTextAdjacencyListReader.java:88-106); this is part of the
    crawl-derivation layer the north rule adds in front of the graph build.
    """
    from raylink.join import loop_barrier
    from raylink.util import splitmix64

    B = np.uint64(num_buckets)

    def init(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "hops": pa.array(np.ones(n, np.int64)),
                "jmp": pa.array(np.zeros(n, np.int64)),
            }
        )

    def tag(as_index: bool):
        def fn(batch: pa.Table) -> pa.Table:
            key = batch.column("src" if as_index else "dst").to_numpy(
                zero_copy_only=False
            )
            return pa.table(
                {
                    "b": pa.array(
                        (splitmix64(key.astype(np.uint64)) % B).astype(np.int32)
                    ),
                    "src": batch.column("src"),
                    "dst": batch.column("dst"),
                    "hops": batch.column("hops"),
                    "_s": pa.array(
                        np.full(len(batch), 1 if as_index else 0, np.int8)
                    ),
                }
            )

        return fn

    def compose(group: pa.Table) -> pa.Table:
        s = group.column("_s").to_numpy(zero_copy_only=False)
        probe = group.filter(pa.array(s == 0))
        idx = group.filter(pa.array(s == 1))
        isrc = idx.column("src").to_numpy(zero_copy_only=False)
        if len(np.unique(isrc)) != len(isrc):
            raise ValueError(
                "resolve_redirects: duplicate redirect source (not a "
                "functional table)"
            )
        cur = probe.column("dst").to_numpy(zero_copy_only=False)
        hops = probe.column("hops").to_numpy(zero_copy_only=False)
        order = np.argsort(isrc)
        ss = isrc[order]
        hit, pos = isin_sorted(ss, cur, return_pos=True)
        take = order[pos[hit]]
        idst = idx.column("dst").to_numpy(zero_copy_only=False)
        ihops = idx.column("hops").to_numpy(zero_copy_only=False)
        new_dst = cur.copy()
        new_dst[hit] = idst[take]
        new_hops = hops.copy()
        new_hops[hit] = hops[hit] + ihops[take]
        return pa.table(
            {
                "src": probe.column("src"),
                "dst": pa.array(new_dst),
                "hops": pa.array(new_hops),
                "jmp": pa.array(hit.astype(np.int64)),
            }
        )

    m = redirects_ds.map_batches(init, batch_format="pyarrow")
    for _ in range(max_rounds + 1):  # +1 = the zero-jump verification round
        both = m.map_batches(tag(False), batch_format="pyarrow").union(
            m.map_batches(tag(True), batch_format="pyarrow")
        )
        m = loop_barrier(
            both.groupby("b").map_groups(compose, batch_format="pyarrow"),
            "redirects",
        )
        if not (m.sum("jmp") or 0):
            break
    else:
        raise RuntimeError(
            f"resolve_redirects: chains unresolved after {max_rounds} "
            "doubling rounds (redirect cycle, or raise max_rounds)"
        )
    return m.map_batches(
        lambda b: pa.table(
            {
                "src": b.column("src"),
                "final": b.column("dst"),
                "hops": b.column("hops"),
            }
        ),
        batch_format="pyarrow",
    )


def edge_reciprocity(edges_ds, num_buckets: int = 32):
    """Link reciprocity of the directed graph: the fraction of distinct
    non-self edges (a, b) whose reverse (b, a) also exists — the classic
    web-graph mutual-linking statistic.

    One coarse-bucket shuffle keyed by the UNORDERED pair hash, so an edge
    and its reverse provably colocate; per-group membership is a packed-key
    searchsorted; the driver folds <= num_buckets (n, r) partial rows.
    Self-loops are excluded. -> single-row pa.Table
    (n_edges, n_reciprocal, reciprocity)."""
    from raylink.util import assert_packable, splitmix64

    B = np.uint64(num_buckets)
    M32 = np.uint64(0xFFFFFFFF)

    def tag(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        assert_packable(s, "edge_reciprocity src")
        assert_packable(d, "edge_reciprocity dst")
        keep = s != d
        s, d = s[keep], d[keep]
        k = np.unique((s.astype(np.uint64) << np.uint64(32)) | d.astype(np.uint64))
        s2, d2 = k >> np.uint64(32), k & M32
        u = (np.minimum(s2, d2) << np.uint64(32)) | np.maximum(s2, d2)
        return pa.table(
            {
                "b": pa.array((splitmix64(u) % B).astype(np.int32)),
                "k": pa.array(k.astype(np.int64)),
            }
        )

    def per_group(group: pa.Table) -> pa.Table:
        k = np.unique(
            group.column("k").to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        s, d = k >> np.uint64(32), k & M32
        rk = (d << np.uint64(32)) | s
        pos = np.searchsorted(k, rk)
        member = (
            (pos < len(k)) & (k[np.minimum(pos, max(len(k) - 1, 0))] == rk)
            if len(k)
            else np.zeros(0, bool)
        )
        return pa.table(
            {
                "n": pa.array([len(k)], type=pa.int64()),
                "r": pa.array([int(member.sum())], type=pa.int64()),
            }
        )

    rows = (
        edges_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("b")
        .map_groups(per_group, batch_format="pyarrow")
        .take_all()
    )  # <= num_buckets rows
    n = sum(x["n"] for x in rows)
    r = sum(x["r"] for x in rows)
    return pa.table(
        {
            "n_edges": pa.array([n], type=pa.int64()),
            "n_reciprocal": pa.array([r], type=pa.int64()),
            "reciprocity": pa.array(
                [float(np.int64(r) / np.int64(n)) if n else 0.0],
                type=pa.float64(),
            ),
        }
    )


def avg_neighbor_degree(edges_ds):
    """Average-neighbor-degree curve knn(k) over the UNDIRECTED simple
    graph (self-loops dropped) — the degree-correlation profile that
    complements the scalar assortativity coefficient.

    annd(k) = (sum over degree-k vertices of their neighbors' degree sum)
    / (k * n_k): integer numerator and denominator, ONE IEEE division per
    degree class (no float means to drift across engines).

    Shape: packed-key distinct closure -> per-vertex degree (bucketed sum)
    -> two distributed ``hash_join`` degree attaches -> per-vertex
    neighbor-degree sums (bucketed) -> bounded combine tree over degree
    classes. -> Dataset (deg, n_vertices, sum_nbr_deg, avg_nbr_deg)."""
    from raylink.graph import undirect
    from raylink.join import bucketed_sum, hash_join, tree_groupby_sum

    und = distinct_edges(undirect(edges_ds)).map_batches(
        lambda b: b.filter(
            pa.compute.not_equal(b.column("src"), b.column("dst"))
        ),
        batch_format="pyarrow",
    )
    ones = und.map_batches(
        lambda b: pa.table(
            {"vid": b.column("src"),
             "one": pa.array(np.ones(b.num_rows, np.int64))}
        ),
        batch_format="pyarrow",
    )
    deg = bucketed_sum(ones, key="vid", val="one", out_val="k")
    # neighbor-degree rows: deg(dst) attached to each closure edge
    ekey = und.map_batches(
        lambda b: pa.table({"vid": b.column("dst"), "src": b.column("src")}),
        batch_format="pyarrow",
    )
    nbr = hash_join(
        ekey, deg, on="vid",
        left_cols={"src": pa.int64()}, right_cols={"k": pa.int64()},
    )
    sums = bucketed_sum(
        nbr.map_batches(
            lambda b: pa.table(
                {"vid": b.column("src"), "k": b.column("k")}
            ),
            batch_format="pyarrow",
        ),
        key="vid", val="k", out_val="s",
    )
    per_v = hash_join(
        sums, deg, on="vid",
        left_cols={"s": pa.int64()}, right_cols={"k": pa.int64()},
    ).map_batches(
        lambda b: pa.table(
            {"deg": b.column("k"), "s": b.column("s"),
             "one": pa.array(np.ones(b.num_rows, np.int64))}
        ),
        batch_format="pyarrow",
    )
    agg = tree_groupby_sum(per_v, ["deg"], ["s", "one"])

    def finish(b: pa.Table) -> pa.Table:
        k = b.column("deg").to_numpy(zero_copy_only=False)
        s = b.column("sum(s)").to_numpy(zero_copy_only=False)
        n = b.column("sum(one)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "deg": pa.array(k),
                "n_vertices": pa.array(n),
                "sum_nbr_deg": pa.array(s),
                "avg_nbr_deg": pa.array(s / (k * n)),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def rich_club_curve(edges_ds, num_buckets: int = 64):
    """Rich-club coefficient curve of the undirected simple graph
    (Colizza et al. 2006, public): for every degree threshold k in
    [0, max_deg), phi(k) = 2 * E_k / (N_k * (N_k - 1)) where N_k counts
    vertices with deg > k and E_k the edges with BOTH endpoints' deg > k
    — the link-farm / elite-core connectivity diagnostic. -> Dataset
    (k, n_nodes, n_edges, phi), rows where N_k >= 2 only.

    Scale shape: E_k needs deg on both endpoints — one ``pair_attach``
    (two coarse-bucket shuffles, no broadcast); both histograms are then
    per-batch partials summed into O(max_deg) rows, and the survival-
    function finish runs on that single tiny block (never O(V) anywhere
    off-cluster). One IEEE division per output row, identical in the SQL
    mirror."""
    from raylink.algos.triangles import _distinct_and_degrees
    from raylink.join import bucketed_sum, pair_attach
    from raylink.util import round_half_away

    distinct, deg_ds = _distinct_and_degrees(edges_ds)
    att = pair_attach(distinct, deg_ds, {"deg": pa.int64()}, id_col="vid")

    def edge_hist(batch: pa.Table) -> pa.Table:
        m = np.minimum(
            batch.column("deg_a").to_numpy(zero_copy_only=False),
            batch.column("deg_b").to_numpy(zero_copy_only=False),
        )
        d, c = np.unique(m, return_counts=True)
        return pa.table(
            {"d": pa.array(d), "ec": pa.array(c.astype(np.int64))}
        )

    def vert_hist(batch: pa.Table) -> pa.Table:
        d, c = np.unique(
            batch.column("deg").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table(
            {"d": pa.array(d), "nc": pa.array(c.astype(np.int64))}
        )

    eh = bucketed_sum(
        att.map_batches(edge_hist, batch_format="pyarrow"),
        "d", "ec", num_buckets=num_buckets,
    ).map_batches(
        lambda b: pa.table(
            {"d": b.column("d"), "ec": b.column("sum(ec)"),
             "nc": pa.array(np.zeros(b.num_rows, np.int64))}
        ),
        batch_format="pyarrow",
    )
    nh = bucketed_sum(
        deg_ds.map_batches(vert_hist, batch_format="pyarrow"),
        "d", "nc", num_buckets=num_buckets,
    ).map_batches(
        lambda b: pa.table(
            {"d": b.column("d"), "ec": pa.array(np.zeros(b.num_rows, np.int64)),
             "nc": b.column("sum(nc)")}
        ),
        batch_format="pyarrow",
    )

    def finish(batch: pa.Table) -> pa.Table:
        d = batch.column("d").to_numpy(zero_copy_only=False)
        ec = batch.column("ec").to_numpy(zero_copy_only=False)
        nc = batch.column("nc").to_numpy(zero_copy_only=False)
        if len(d) == 0:
            return pa.table(
                {"k": pa.array([], type=pa.int64()),
                 "n_nodes": pa.array([], type=pa.int64()),
                 "n_edges": pa.array([], type=pa.int64()),
                 "phi": pa.array([], type=pa.float64())}
            )
        md = int(d.max())
        ecf = np.zeros(md + 1, np.int64)
        ncf = np.zeros(md + 1, np.int64)
        np.add.at(ecf, d, ec)
        np.add.at(ncf, d, nc)
        # survival: counts with value > k, for k = 0..md-1
        e_gt = np.cumsum(ecf[::-1])[::-1]  # e_gt[j] = count with d >= j
        n_gt = np.cumsum(ncf[::-1])[::-1]
        k = np.arange(md, dtype=np.int64)
        N = n_gt[1:]  # deg > k  ==  deg >= k+1
        E = e_gt[1:]
        keep = N >= 2
        k, N, E = k[keep], N[keep], E[keep]
        phi = round_half_away(2.0 * E / (N * (N - 1.0)), 8)
        return pa.table(
            {"k": pa.array(k), "n_nodes": pa.array(N),
             "n_edges": pa.array(E), "phi": pa.array(phi)}
        )

    return (
        eh.union(nh)
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow", batch_size=None)
    )


def host_link_locality(edges_ds, num_buckets: int = 64):
    """Per-source-host link locality over the DISTINCT page edges:
    n_links (distinct outgoing edges of the host's pages), n_intra (those
    staying on the same host), locality = intra share — the classic
    site-insularity / boilerplate-navigation diagnostic of a crawl.
    -> Dataset (host, n_links, n_intra, locality r8).

    Hosts are parsed from the synthesized URL STRINGS with the Arrow RE2
    kernels (the domain_stats path — exercising the real string pipeline,
    not the closed-form id rule the oracle uses); per-batch
    dictionary-encode + bincount partials, one host-cardinality groupby,
    one IEEE division per host."""
    import pyarrow.compute as pc

    from raylink.synth import urls_of
    from raylink.util import round_half_away

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column("src")
        d = batch.column("dst")

        def host_of(col):
            url = urls_of(col)
            return pc.replace_substring_regex(
                pc.replace_substring_regex(
                    url, pattern="^https://", replacement=""
                ),
                pattern="/.*$", replacement="",
            )

        hs = host_of(s)
        hd = host_of(d)
        same = pc.equal(hs, hd).to_numpy(zero_copy_only=False)
        he = (
            hs.combine_chunks() if isinstance(hs, pa.ChunkedArray) else hs
        ).dictionary_encode()
        codes = he.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nh = len(he.dictionary)
        n = np.bincount(codes, minlength=nh).astype(np.int64)
        ni = np.bincount(codes[same], minlength=nh).astype(np.int64)
        return pa.table(
            {"host": he.dictionary, "n": pa.array(n), "ni": pa.array(ni)}
        )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("sum(n)").to_numpy(zero_copy_only=False)
        ni = batch.column("sum(ni)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "host": batch.column("host"),
                "n_links": pa.array(n),
                "n_intra": pa.array(ni),
                "locality": pa.array(round_half_away(ni / n, 8)),
            }
        )

    return (
        distinct_edges(edges_ds)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .sum(["n", "ni"])
        .map_batches(finish, batch_format="pyarrow")
    )


GINI_SCALE = 10**9


def degree_gini(edges_ds):
    """Gini coefficient of the undirected distinct-neighbour degree
    distribution over edge-incident vertices — the one-number inequality
    summary of the power law (link-farm / hub-concentration diagnostic).
    -> single-row Dataset (n_vertices, sum_deg, gini_num, gini_den,
    gini_scaled) where, with degrees sorted ascending d_1..d_n,
    gini = (2 * sum_i i*d_i - (n+1) * sum_d) / (n * sum_d) — reported as
    exact int64 numerator/denominator plus the floor-scaled integer
    (GINI_SCALE * num) // den (bit-portable; computed in Python bigints —
    no float ever crosses the engine/oracle boundary). int64 bound: the
    num/den COLUMNS require
    n * sum_deg < 2^63 — holds through ~1e8-vertex graphs at web degrees;
    beyond that keep gini_scaled (always < GINI_SCALE) and widen the
    ratio columns to decimal128.

    Scale shape: the degree table streams into per-batch (deg -> count)
    histogram partials, a bounded combine tree (cells = distinct degree
    values, O(max_deg)), and ONE final single-block pass that turns runs of
    equal degrees into exact rank sums (rank-sum of a run = c*before +
    c*(c+1)/2 — order within a run does not change sum_i i*d_i). The
    driver never sees per-vertex rows."""
    from raylink.algos.triangles import _distinct_and_degrees
    from raylink.join import tree_groupby_sum

    _, deg_ds = _distinct_and_degrees(edges_ds)

    def hist_partial(batch: pa.Table) -> pa.Table:
        d = batch.column("deg").to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(d, return_counts=True)
        return pa.table({"k": pa.array(uk.astype(np.int64)),
                         "c": pa.array(cnt.astype(np.int64))})

    hist = tree_groupby_sum(
        deg_ds.map_batches(hist_partial, batch_format="pyarrow"), ["k"], ["c"]
    )

    def finish(batch: pa.Table) -> pa.Table:
        k = batch.column("k").to_numpy(zero_copy_only=False)
        c = batch.column("sum(c)").to_numpy(zero_copy_only=False)
        order = np.argsort(k)
        k, c = k[order], c[order]
        n = int(c.sum())
        s = int((k * c).sum())
        before = np.cumsum(c) - c
        # sum over vertices of rank*deg, ranks 1..n ascending by deg
        r = int((k * (c * before + c * (c + 1) // 2)).sum())
        num = 2 * r - (n + 1) * s
        den = n * s
        return pa.table(
            {
                "n_vertices": pa.array([n], type=pa.int64()),
                "sum_deg": pa.array([s], type=pa.int64()),
                "gini_num": pa.array([num], type=pa.int64()),
                "gini_den": pa.array([den], type=pa.int64()),
                "gini_scaled": pa.array([(GINI_SCALE * num) // den],
                                        type=pa.int64()),
            }
        )

    return hist.repartition(1).map_batches(
        finish, batch_format="pyarrow", batch_size=None
    )


def frontier_rank(edges_ds, fetched_mod: int = 4, fetched_res: int = 1,
                  k: int = 100, num_buckets: int = 64):
    """Crawl-frontier prioritization: rank DISCOVERED-BUT-UNFETCHED pages
    by how many distinct fetched pages link to them — the scheduling pass
    that decides what a crawler fetches next. Fetched membership is the
    planted closed form vid % fetched_mod != fetched_res (the pii_scan
    precedent — the synthetic corpus has no fetch log); a real crawl swaps
    in an anti-join against the fetch-log vid set, same dataflow. ->
    Dataset (vid, n_inlinks), top-k by (n_inlinks DESC, vid).

    Shape: per-batch filter (fetched src -> unfetched dst, so src != dst
    by residue) -> packed-key exact dedup (``bucketed_distinct``: a
    page linking twice counts once) -> per-dst ``bucketed_sum`` ->
    per-block local top-k coalesced into one final top-k block. The
    driver never holds more than the k result rows."""
    from raylink.join import bucketed_distinct, bucketed_sum
    from raylink.util import assert_packable

    M = np.int64(fetched_mod)
    R = np.int64(fetched_res)

    def pack(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        m = (s % M != R) & (d % M == R)
        s, d = s[m], d[m]
        assert_packable(s, "frontier_rank src")
        assert_packable(d, "frontier_rank dst")
        return pa.table({"key": pa.array((s << np.int64(32)) | d)})

    distinct = bucketed_distinct(
        edges_ds.map_batches(pack, batch_format="pyarrow"), "key",
        num_buckets=num_buckets,
    )

    def per_dst(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy(zero_copy_only=False)
        d = key & np.int64(0xFFFFFFFF)
        uk, cnt = np.unique(d, return_counts=True)
        return pa.table({"vid": pa.array(uk),
                         "c": pa.array(cnt.astype(np.int64))})

    counts = bucketed_sum(
        distinct.map_batches(per_dst, batch_format="pyarrow"),
        "vid", "c", out_val="n_inlinks", num_buckets=num_buckets,
    )

    def topk(batch: pa.Table) -> pa.Table:
        v = batch.column("vid").to_numpy(zero_copy_only=False)
        n = batch.column("n_inlinks").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -n))[:k]
        return pa.table(
            {"vid": pa.array(v[order]), "n_inlinks": pa.array(n[order])}
        )

    return (
        counts.map_batches(topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(topk, batch_format="pyarrow", batch_size=None)
    )


def crawl_schedule(edges_ds, fetched_mod: int = 4, fetched_res: int = 1,
                   host_mod: int = 97, num_buckets: int = 64):
    """Politeness-aware crawl scheduling: every discovered-but-unfetched
    page gets a per-HOST fetch slot — slot s means "s-th wave", so a
    crawler issuing one request per host per wave never hammers a single
    server while still fetching highest-value pages first. Priority within
    a host = (distinct in-links from fetched pages DESC, vid); host is the
    planted vid % host_mod (the host_rank convention — a real crawl swaps
    in the url host). -> Dataset (vid, host, n_inlinks, slot 1..).

    Shape: ``frontier_rank``'s distinct fetched->unfetched in-link counts
    (packed-key dedup + per-dst sum), then ONE groupby(host) ranking pass
    — host cardinality bounds the group count, and per-host frontier
    volume bounds group size (politeness means a crawler only needs the
    top slots per host; cap with a LIMIT downstream)."""
    from raylink.join import bucketed_distinct, bucketed_sum
    from raylink.util import assert_packable

    M = np.int64(fetched_mod)
    R = np.int64(fetched_res)

    def pack(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        m = (s % M != R) & (d % M == R)
        s, d = s[m], d[m]
        assert_packable(s, "crawl_schedule src")
        assert_packable(d, "crawl_schedule dst")
        return pa.table({"key": pa.array((s << np.int64(32)) | d)})

    distinct = bucketed_distinct(
        edges_ds.map_batches(pack, batch_format="pyarrow"), "key",
        num_buckets=num_buckets,
    )

    def per_dst(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy(zero_copy_only=False)
        d = key & np.int64(0xFFFFFFFF)
        uk, cnt = np.unique(d, return_counts=True)
        return pa.table({"vid": pa.array(uk),
                         "c": pa.array(cnt.astype(np.int64))})

    counts = bucketed_sum(
        distinct.map_batches(per_dst, batch_format="pyarrow"),
        "vid", "c", out_val="n_inlinks", num_buckets=num_buckets,
    )

    H = np.int64(host_mod)

    def add_host(batch: pa.Table) -> pa.Table:
        v = batch.column("vid").to_numpy(zero_copy_only=False)
        return pa.table(
            {"vid": pa.array(v), "host": pa.array(v % H),
             "n_inlinks": batch.column("n_inlinks")}
        )

    def slots(group: pa.Table) -> pa.Table:
        v = group.column("vid").to_numpy(zero_copy_only=False)
        n = group.column("n_inlinks").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -n))
        return pa.table(
            {"vid": pa.array(v[order]),
             "host": group.column("host").take(pa.array(order)),
             "n_inlinks": pa.array(n[order]),
             "slot": pa.array(np.arange(1, len(order) + 1, dtype=np.int64))}
        )

    return (
        counts.map_batches(add_host, batch_format="pyarrow")
        .groupby("host")
        .map_groups(slots, batch_format="pyarrow")
    )
