"""Named query implementations backing ``__ray_entry__.queries()``.

Each function takes ``sf_dir`` (a testdata scale directory) and returns a Ray
Dataset / pyarrow Table. Column names and types match the corresponding SQL
oracle in ``raylink.oracles_sql`` exactly (the driver hash-compares values).

Graph queries run over the synthetic page corpus derived from ``documents``
(LINK SPEC v1, raylink/synth.py) with the 'mod' partitioner and P=8 so
subgraph identities are SQL-checkable. BSP checkpoints live under
deterministic /tmp keys — repeated calls resume instead of recomputing.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from raylink.oracles_sql import P
from raylink.pipelines import (
    cache_key,
    degree_table,
    distinct_edges,
    page_edge_tables,
    page_graph,
)
from raylink.superstep import CKPT_ROOT
from raylink.util import pearson_partials, round_half_away

PR_ITERS = 30
HITS_ITERS = 8
KATZ_ITERS = 8


def _ckpt(name: str, sf_dir: str, *extra) -> str:
    from raylink import storage

    return storage.join(CKPT_ROOT, f"{name}-{cache_key(name, sf_dir, *extra)}")


# --------------------------------------------------------------------- graph
def q_page_text(sf_dir: str):
    extracted, _, _, _ = page_edge_tables(sf_dir)
    return extracted.select_columns(["url", "text"])


def q_warc_roundtrip(sf_dir: str):
    """Crawl on-ramp end-to-end: pages -> WARC container files (one gzip
    member per record, Common-Crawl layout) -> ``read_warc`` (actor-pool
    parse) -> actor-pool HTML extraction -> (url, warc_ts, text). The oracle
    checks both the byte-identical extracted text AND the WARC-Date
    timestamp surviving serialize/parse."""
    from raylink.extract import ExtractPages
    from raylink.synth import pages_dataset
    from raylink.warc import read_warc, write_warc

    warc_dir = os.path.join("/tmp/raylink/warc", cache_key("warc", sf_dir))
    if not os.path.isdir(warc_dir) or not os.listdir(warc_dir):
        pages, _ = pages_dataset(sf_dir, include_golden=False)
        write_warc(pages.select_columns(["url", "warc_ts", "html"]), warc_dir)
    ds = read_warc(warc_dir)
    extracted = ds.drop_columns(["n_skipped"]).map_batches(
        ExtractPages, batch_format="pyarrow", batch_size=512, concurrency=(1, 4)
    )
    return extracted.select_columns(["url", "warc_ts", "text"])


def q_page_edges(sf_dir: str):
    _, edges, _, _ = page_edge_tables(sf_dir)
    return distinct_edges(edges)


def q_url_canon(sf_dir: str):
    """URL canonicalization over a deterministically-messied corpus: for
    each doc, a raw url with planted case/port/dot-segment/dup-slash/
    fragment noise (mod rules below, mirrored in SQL), canonicalized by the
    Arrow RE2 pipeline (ops/urls.py). Output (doc_id, url_raw, url_canon)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.ops.urls import canonicalize_urls

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def plant(batch: pa.Table) -> pa.Table:
        i = batch.column("doc_id")
        s = pc.cast(i, pa.string())
        site = pc.cast(pc.subtract(i, pc.multiply(pc.divide(i, 97), 97)), pa.string())

        def mod0(m):
            return pc.equal(pc.subtract(i, pc.multiply(pc.divide(i, m), m)), 0)

        head = pc.if_else(
            mod0(2),
            pc.binary_join_element_wise("HTTPS://SITE", site, ".EXAMPLE", ""),
            pc.binary_join_element_wise("https://site", site, ".example", ""),
        )
        head = pc.binary_join_element_wise(
            head, pc.if_else(mod0(3), ":443", ""), ""
        )
        path = pc.if_else(
            mod0(5),
            pc.binary_join_element_wise("/d/./", s, ""),
            pc.if_else(
                mod0(7),
                pc.binary_join_element_wise("/d/x/../", s, ""),
                pc.if_else(
                    mod0(11),
                    pc.binary_join_element_wise("/d//", s, ""),
                    pc.binary_join_element_wise("/d/", s, ""),
                ),
            ),
        )
        frag = pc.if_else(
            mod0(13), pc.binary_join_element_wise("#s", s, ""), ""
        )
        raw = pc.binary_join_element_wise(head, path, frag, "")
        return pa.table(
            {
                "doc_id": i,
                "url_raw": raw,
                "url_canon": canonicalize_urls(raw),
            }
        )

    return docs.map_batches(plant, batch_format="pyarrow")


def q_crawl_diff(sf_dir: str):
    """Two-capture crawl diff: capture A = out-links of even-doc pages,
    capture B = out-links of doc_id % 3 != 0 pages (deterministic snapshot
    membership); output = edges added / removed between captures via the
    distributed anti-joins (``pipelines.diff_edges``)."""
    from raylink.pipelines import diff_edges

    _, edges, _, _ = page_edge_tables(sf_dir)
    edges = edges.materialize()  # referenced by both capture filters

    def cap(mod: int, keep_rem_ne: int | None):
        def fn(batch: pa.Table) -> pa.Table:
            s = batch.column("src").to_numpy(zero_copy_only=False)
            m = (s % mod) == 0 if keep_rem_ne is None else (s % mod) != keep_rem_ne
            return batch.filter(pa.array(m))

        return fn

    a = edges.map_batches(cap(2, None), batch_format="pyarrow")
    b = edges.map_batches(cap(3, 0), batch_format="pyarrow")
    return diff_edges(a, b)


def q_dense_remap(sf_dir: str):
    """Production-id-regime remap: page edges with hash64_str(url) vids
    (63-bit — unpackable for (a<<32)|b keys) -> ``dense_id_remap`` ->
    the (vid, dense) inverse mapping, dense ascending. Exact SQL oracle via
    the FNV-1a/splitmix64 mirrors (dense = ROW_NUMBER over (bucket, vid))."""
    from raylink.extract import explode_links
    from raylink.ids import dense_id_remap
    from raylink.pipelines import hash_ids_from_urls, page_edge_tables

    ex, _, _, _ = page_edge_tables(sf_dir)
    edges_h = ex.map_batches(explode_links, batch_format="pyarrow").map_batches(
        hash_ids_from_urls, batch_format="pyarrow"
    )
    _, mapping = dense_id_remap(edges_h, num_buckets=16)
    return mapping.sort("dense")


def q_pagerank(sf_dir: str):
    from raylink.algos import pagerank

    g = page_graph(sf_dir, directed=True)
    # tasks engine is bit-identical for fixed iteration counts (tested)
    _, ranks = pagerank(
        g=g, iters=PR_ITERS, engine="tasks",
        ckpt_dir=_ckpt("pagerank", sf_dir, PR_ITERS),
    )

    def rnd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "rank": pa.array(
                    round_half_away(batch.column("rank").to_numpy(zero_copy_only=False), 8)
                ),
            }
        )

    return ranks.map_batches(rnd, batch_format="pyarrow")


def q_katz(sf_dir: str):
    """Katz centrality (alpha=0.05, beta=1, 8 fixed iterations) over the
    directed page graph — attenuated-path-count centrality; same BSP
    shuffle shape as PageRank but unnormalized pushes."""
    from raylink.algos.pagerank import katz

    g = page_graph(sf_dir, directed=True)
    _, ranks = katz(
        g, alpha=0.05, beta=1.0, iters=KATZ_ITERS, engine="tasks",
        ckpt_dir=_ckpt("katz", sf_dir, KATZ_ITERS),
    )

    def rnd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "rank": pa.array(
                    round_half_away(
                        batch.column("rank").to_numpy(zero_copy_only=False), 8
                    )
                ),
            }
        )

    return ranks.map_batches(rnd, batch_format="pyarrow")


EIGEN_ITERS = 8


def q_eigenvector(sf_dir: str):
    """Eigenvector centrality (8 power iterations, L1-normalized) over the
    directed page graph — the undamped PageRank sibling; HITS-style
    broadcast-partial normalization, one superstep per iteration."""
    from raylink.algos.eigenvector import eigenvector_centrality

    g = page_graph(sf_dir, directed=True)
    _, scores = eigenvector_centrality(
        g=g, iters=EIGEN_ITERS, engine="tasks",
        ckpt_dir=_ckpt("eigenvector", sf_dir, EIGEN_ITERS),
    )

    def rnd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "score": pa.array(
                    round_half_away(
                        batch.column("x").to_numpy(zero_copy_only=False), 8
                    )
                ),
            }
        )

    return scores.map_batches(rnd, batch_format="pyarrow")


def q_host_top_pages(sf_dir: str):
    """Top-3 pages per host by PageRank (the crawl's per-site
    representative-page pick): resumes q_pagerank's checkpoints, parses
    hosts with the Arrow regex kernels, ranks on int64-scaled
    ROUND(rank, 8) keys (exact cross-engine ordering), one `group_topk`
    shuffle. -> (host, vid, rank, rk)."""
    import pyarrow.compute as pc

    from raylink.algos import pagerank
    from raylink.ops.select import group_topk
    from raylink.synth import urls_of

    g = page_graph(sf_dir, directed=True)
    _, ranks = pagerank(
        g=g, iters=PR_ITERS, engine="tasks",
        ckpt_dir=_ckpt("pagerank", sf_dir, PR_ITERS),
    )

    def prep(b: pa.Table) -> pa.Table:
        vid = b.column("vid")
        url = urls_of(vid)
        host = pc.replace_substring_regex(
            pc.replace_substring_regex(url, pattern="^https://", replacement=""),
            pattern="/.*$", replacement="",
        )
        r8 = round_half_away(
            b.column("rank").to_numpy(zero_copy_only=False), 8
        )
        return pa.table(
            {
                "host": host,
                "vid": vid,
                "rank": pa.array(r8),
                "ri": pa.array(np.rint(r8 * 1e8).astype(np.int64)),
            }
        )

    top = group_topk(
        ranks.map_batches(prep, batch_format="pyarrow"),
        key_col="host", score_col="ri", k=3, id_col="vid",
    )
    return top.map_batches(
        lambda b: b.drop_columns(["ri"]), batch_format="pyarrow"
    )


def q_weighted_pagerank(sf_dir: str):
    """Edge-weighted PageRank (rank distributed proportional to the
    deterministic edge weight 1 + (7*src + 13*dst) % 5), 20 fixed
    iterations, ranks rounded to 8 decimals like q_pagerank."""
    from raylink.algos import pagerank
    from raylink.graph import build_graph

    _, edges, verts, _ = page_edge_tables(sf_dir)

    def add_w(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        w = 1.0 + (s * 7 + d * 13) % 5
        return batch.append_column("weight", pa.array(w.astype(np.float64)))

    eds = distinct_edges(edges).map_batches(
        add_w, batch_format="pyarrow"
    ).materialize()
    g = build_graph(eds, verts, num_parts=8, partitioner="mod",
                    directed=True, weighted=True)
    _, ranks = pagerank(
        g=g, iters=20, engine="tasks", weighted=True,
        ckpt_dir=_ckpt("weighted_pagerank", sf_dir, 20),
    )

    def rnd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "rank": pa.array(
                    round_half_away(batch.column("rank").to_numpy(zero_copy_only=False), 8)
                ),
            }
        )

    return ranks.map_batches(rnd, batch_format="pyarrow")


def q_host_rank(sf_dir: str):
    """Host-level authority: coarsen the page graph to the host graph
    (edge weight = number of distinct page links between the hosts, packed
    host-pair key groupby) and run edge-weighted PageRank over it — the
    domain-ranking pass of a crawl pipeline. Output (host, rank@r8)."""
    from raylink.algos import pagerank
    from raylink.graph import build_graph

    _, edges, _, _ = page_edge_tables(sf_dir)
    de = distinct_edges(edges)

    def to_host(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False) % 97
        d = b.column("dst").to_numpy(zero_copy_only=False) % 97
        key = s * 97 + d
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(uk), "w": pa.array(cnt.astype(np.int64))})

    hed = (
        de.map_batches(to_host, batch_format="pyarrow")
        .groupby("key")
        .sum("w")
        .map_batches(
            lambda b: pa.table(
                {
                    "src": pa.array(
                        b.column("key").to_numpy(zero_copy_only=False) // 97
                    ),
                    "dst": pa.array(
                        b.column("key").to_numpy(zero_copy_only=False) % 97
                    ),
                    "weight": pa.array(
                        b.column("sum(w)")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.float64)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()  # tiny (<= 97*97 rows); referenced twice below
    )
    hverts = hed.map_batches(
        lambda b: pa.table(
            {
                "vid": pa.array(
                    np.unique(
                        np.concatenate(
                            [
                                b.column("src").to_numpy(zero_copy_only=False),
                                b.column("dst").to_numpy(zero_copy_only=False),
                            ]
                        )
                    )
                )
            }
        ),
        batch_format="pyarrow",
    ).groupby("vid").count().select_columns(["vid"])
    g = build_graph(hed, hverts, num_parts=4, partitioner="mod",
                    directed=True, weighted=True)
    _, ranks = pagerank(
        g=g, iters=20, engine="tasks", weighted=True,
        ckpt_dir=_ckpt("host_rank", sf_dir, 20),
    )

    def rnd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "host": batch.column("vid"),
                "rank": pa.array(
                    round_half_away(
                        batch.column("rank").to_numpy(zero_copy_only=False), 8
                    )
                ),
            }
        )

    return ranks.map_batches(rnd, batch_format="pyarrow")


def q_pagerank_converged(sf_dir: str):
    """eps-convergence mode (north-rule 1e-6). The halt round is a
    deterministic function of the input (tasks engine halts exactly at the
    first round with max|delta| <= eps); on the driver's sf0.01 corpus that
    is 27 update rounds, so the oracle is the 27-iteration unrolled SQL."""
    from raylink.algos import pagerank

    g = page_graph(sf_dir, directed=True)
    _, ranks = pagerank(g=g, eps=1e-6, engine="tasks", ckpt_dir=_ckpt("pagerank_eps", sf_dir))

    def rnd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "rank": pa.array(
                    round_half_away(batch.column("rank").to_numpy(zero_copy_only=False), 8)
                ),
            }
        )

    return ranks.map_batches(rnd, batch_format="pyarrow")


def q_seeded_pagerank(sf_dir: str):
    """Personalized PageRank with teleport proportional to a per-vertex seed
    value 1 + (vid % 7) stored in the shards via build_graph(vertex_cols) —
    exercises vertex-property plumbing end-to-end; exact SQL oracle
    (unrolled iterations with the same seed formula)."""
    import ray.data as rd

    from raylink.algos import seeded_pagerank
    from raylink.graph import build_graph
    from raylink.oracles_sql import P

    _, edges, verts, n = page_edge_tables(sf_dir)

    def add_seed(batch: pa.Table) -> pa.Table:
        v = batch.column("vid").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "seed", pa.array((1.0 + (v % 7)).astype(np.float64))
        )

    verts_s = verts.map_batches(add_seed, batch_format="pyarrow")
    key = cache_key("seeded_pr_graph", sf_dir)
    from raylink import storage
    from raylink.pipelines import GRAPH_ROOT

    gdir = storage.join(GRAPH_ROOT, key)
    if storage.exists(storage.join(gdir, "manifest.json")):
        from raylink.graph import LinkGraph

        g = LinkGraph.load(gdir)
    else:
        g = build_graph(
            edges.materialize(), verts_s, num_parts=P, partitioner="mod",
            directed=True, vertex_cols=["seed"], graph_dir=gdir,
        )
    # seed_total has a closed form: sum over vids of 1 + (vid % 7)
    v = np.arange(n, dtype=np.int64)
    seed_total = float(np.sum(1.0 + (v % 7)))
    _, ranks = seeded_pagerank(
        g=g, seed_total=seed_total, iters=PR_ITERS, engine="tasks",
        ckpt_dir=_ckpt("seeded_pr", sf_dir, PR_ITERS),
    )

    def rnd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "rank": pa.array(
                    round_half_away(batch.column("rank").to_numpy(zero_copy_only=False), 8)
                ),
            }
        )

    return ranks.map_batches(rnd, batch_format="pyarrow")


def q_connected_components(sf_dir: str):
    from raylink.algos import connected_components

    g = page_graph(sf_dir, directed=False)
    # meta-graph rounds are tiny -> the raw-task exchange fast path
    _, comps = connected_components(g=g, ckpt_dir=_ckpt("cc", sf_dir), engine="tasks")

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"vid": batch.column("vid"), "component": batch.column("component")}
        )

    return comps.map_batches(cast, batch_format="pyarrow")


def _dual_graph(sf_dir: str):
    """Cached dual-direction page graph (e_dirmask; algos.scc.scc_edges) —
    shared by scc and betweenness."""
    from raylink import storage
    from raylink.algos.scc import scc_edges
    from raylink.graph import LinkGraph, build_graph
    from raylink.pipelines import GRAPH_ROOT

    gdir = storage.join(GRAPH_ROOT, cache_key("scc_graph", sf_dir))
    if storage.exists(storage.join(gdir, "manifest.json")):
        return LinkGraph.load(gdir)
    _, edges, verts, _ = page_edge_tables(sf_dir)
    return build_graph(
        scc_edges(edges.materialize()), verts, num_parts=8,
        partitioner="mod", directed=True, edge_cols=["dirmask"],
        graph_dir=gdir,
    )


def q_scc(sf_dir: str):
    """Strongly connected components of the DIRECTED page graph (scc = max
    vid of the component — FB-coloring root convention)."""
    from raylink.algos.scc import scc

    _, comps = scc(g=_dual_graph(sf_dir), ckpt_dir=_ckpt("scc", sf_dir),
                   engine="tasks")
    return comps


def q_wcc_sizes(sf_dir: str):
    """Weakly-connected-component size distribution (size, n_components)
    — scc_sizes' undirected sibling; resumes q_connected_components'
    checkpoints; two bounded groupbys."""
    from raylink.algos import connected_components

    g = page_graph(sf_dir, directed=False)
    _, comps = connected_components(
        g=g, ckpt_dir=_ckpt("cc", sf_dir), engine="tasks"
    )
    sizes = comps.groupby("component").count().map_batches(
        lambda b: pa.table({"size": b.column("count()")}),
        batch_format="pyarrow",
    )
    return sizes.groupby("size").count().map_batches(
        lambda b: pa.table(
            {
                "size": b.column("size"),
                "n_components": b.column("count()"),
            }
        ),
        batch_format="pyarrow",
    )


def q_scc_sizes(sf_dir: str):
    """SCC size distribution (size, n_components) — the bow-tie
    measurement of a web graph (how much of the crawl sits in the giant
    strongly connected core vs. IN/OUT tendrils). Two bounded groupbys
    over the scc labels."""
    from raylink.algos.scc import scc

    _, comps = scc(g=_dual_graph(sf_dir), ckpt_dir=_ckpt("scc", sf_dir),
                   engine="tasks")
    sizes = comps.groupby("scc").count().map_batches(
        lambda b: pa.table({"size": b.column("count()")}),
        batch_format="pyarrow",
    )
    return sizes.groupby("size").count().map_batches(
        lambda b: pa.table(
            {"size": b.column("size"), "n_components": b.column("count()")}
        ),
        batch_format="pyarrow",
    )


def q_betweenness(sf_dir: str):
    """Sampled Brandes betweenness from the harmonic seeds over the
    directed page graph (dual-graph BSP: forward sigma BFS + backward
    dependency accumulation), rounded to 6 decimals (cross-engine float
    association; both sides < 1e-10 apart, the subgraph_rank argument)."""
    from raylink.algos.centrality import betweenness_sampled

    _, out = betweenness_sampled(
        _dual_graph(sf_dir), HARMONIC_SEEDS, engine="tasks",
        ckpt_dir=_ckpt("betweenness", sf_dir, *HARMONIC_SEEDS),
    )

    def rnd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "bc": pa.array(
                    round_half_away(
                        batch.column("bc").to_numpy(zero_copy_only=False), 6
                    )
                ),
            }
        )

    return out.map_batches(rnd, batch_format="pyarrow")


HARMONIC_SEEDS = [0, 1, 2, 7]


def q_harmonic(sf_dir: str):
    """Seed-sampled harmonic centrality (directed BFS from the three hubs +
    a non-hub) — k BFS trees in one BSP job."""
    from raylink.algos.centrality import harmonic_centrality

    g = page_graph(sf_dir, directed=True)
    _, out = harmonic_centrality(
        g, HARMONIC_SEEDS, engine="tasks",
        ckpt_dir=_ckpt("harmonic", sf_dir, *HARMONIC_SEEDS),
    )
    return out


def q_closeness(sf_dir: str):
    """Closeness centrality of the harmonic seeds — per-seed integer
    aggregates over the SAME multi-source-BFS checkpoints as q_harmonic
    (resumes with zero extra supersteps when both run)."""
    from raylink.algos.centrality import closeness_of_seeds

    g = page_graph(sf_dir, directed=True)
    return closeness_of_seeds(
        g, HARMONIC_SEEDS, engine="tasks",
        ckpt_dir=_ckpt("harmonic", sf_dir, *HARMONIC_SEEDS),
    )


ANF_ROUNDS = 8


def q_hyperanf(sf_dir: str):
    """HyperANF in-ball estimates after ANF_ROUNDS merge rounds over the
    directed page graph: per vertex the HLL register sum (integer-exact),
    zero-register count, and the standard estimate — registers are
    deterministic (splitmix64(vid) item hashes), so the oracle mirrors
    them register-for-register through 8 unrolled max-merge rounds."""
    from raylink.algos.anf import hyperanf

    g = page_graph(sf_dir, directed=True)
    _, balls = hyperanf(
        g=g, p=6, rounds=ANF_ROUNDS, engine="tasks",
        ckpt_dir=_ckpt("hyperanf", sf_dir, ANF_ROUNDS),
    )
    return balls.sort("vid")


def q_label_propagation(sf_dir: str):
    from raylink.algos import label_propagation

    g = page_graph(sf_dir, directed=False)
    _, labels = label_propagation(g=g, engine="tasks", ckpt_dir=_ckpt("lpa", sf_dir))
    return labels


DENSEST_SQL_ROUNDS = 32


def q_densest(sf_dir: str):
    """Parallel-peel densest subgraph over the undirected simple page
    graph (factor 3 = eps 0.5): per-vertex peel round + membership in the
    densest intermediate subgraph. Integer thresholds end-to-end, so the
    peel is bit-exactly mirrored; the engine's round cap equals the SQL
    unroll so a budget overrun raises instead of silently mismatching."""
    from raylink.algos.densest import densest_subgraph

    _, edges, verts, _ = page_edge_tables(sf_dir)
    _, out = densest_subgraph(
        edges.materialize(), verts, factor=3, max_rounds=DENSEST_SQL_ROUNDS
    )
    return out.sort("vid")


def q_balanced_pagerank(sf_dir: str):
    """PageRank through the hub-balanced EXPLICIT partitioning
    (graph.hub_balanced_parts -> build_graph(partitioner="explicit")):
    the skew machinery is driver-gated by partitioning invariance — the
    oracle is the same unrolled PR fixpoint the hash build matches."""
    from raylink import storage
    from raylink.algos import pagerank
    from raylink.graph import LinkGraph, build_graph, hub_balanced_parts
    from raylink.pipelines import GRAPH_ROOT

    gdir = storage.join(GRAPH_ROOT, cache_key("balanced_graph", sf_dir))
    if storage.exists(storage.join(gdir, "manifest.json")):
        g = LinkGraph.load(gdir)
    else:
        _, edges, verts, _ = page_edge_tables(sf_dir)
        edges = edges.materialize()
        assign, edges_p = hub_balanced_parts(edges, verts, num_parts=8,
                                             top_k=64)
        g = build_graph(
            edges_p, assign, num_parts=8, partitioner="explicit",
            directed=True, graph_dir=gdir,
        )
    _, ranks = pagerank(
        g=g, iters=PR_ITERS, engine="tasks",
        ckpt_dir=_ckpt("balanced_pr", sf_dir, PR_ITERS),
    )

    def rnd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "rank": pa.array(
                    round_half_away(
                        batch.column("rank").to_numpy(zero_copy_only=False), 8
                    )
                ),
            }
        )

    return ranks.map_batches(rnd, batch_format="pyarrow")


PPR_ITERS = 12


def q_ppr(sf_dir: str):
    """k-seed personalized PageRank (random walk with restart) from the
    harmonic seed set, one BSP job with k rank columns; fixed 12 rounds,
    mirrored per seed per round in SQL."""
    from raylink.algos.pagerank import multi_seed_ppr

    g = page_graph(sf_dir, directed=True)
    _, out = multi_seed_ppr(
        g, HARMONIC_SEEDS, iters=PPR_ITERS, engine="tasks",
        ckpt_dir=_ckpt("ppr", sf_dir, PPR_ITERS, *HARMONIC_SEEDS),
    )

    def rnd(batch: pa.Table) -> pa.Table:
        cols = {"vid": batch.column("vid")}
        for i in range(len(HARMONIC_SEEDS)):
            cols[f"r{i}"] = pa.array(
                round_half_away(
                    batch.column(f"r{i}").to_numpy(zero_copy_only=False), 8
                )
            )
        return pa.table(cols)

    return out.map_batches(rnd, batch_format="pyarrow").sort("vid")


WL_ROUNDS = 3


def q_wl_classes(sf_dir: str):
    """1-WL color-refinement classes (3 rounds) over the undirected page
    graph — structural page-role fingerprints; canonical min-vid class
    labels, partitioning-invariant."""
    from raylink.algos.wl import wl_classes

    g = page_graph(sf_dir, directed=False)
    _, labels = wl_classes(
        g=g, rounds=WL_ROUNDS, engine="tasks",
        ckpt_dir=_ckpt("wl", sf_dir, WL_ROUNDS),
    )
    return labels.sort("vid")


LPA_COMMUNITY_ROUNDS = 5


def q_communities(sf_dir: str):
    """Max-frequency LPA communities over the undirected page graph after
    LPA_COMMUNITY_ROUNDS synchronous rounds (deterministic: ties to the
    smallest label, isolated vertices keep their own) — mirrored round
    for round in SQL."""
    from raylink.algos.lpa import community_lpa

    g = page_graph(sf_dir, directed=False)
    _, labels = community_lpa(
        g=g, rounds=LPA_COMMUNITY_ROUNDS, engine="tasks",
        ckpt_dir=_ckpt("community_lpa", sf_dir, LPA_COMMUNITY_ROUNDS),
    )
    return labels.sort("vid")


def q_triangles(sf_dir: str):
    from raylink.algos import triangle_count

    _, edges, _, _ = page_edge_tables(sf_dir)
    t = triangle_count(edges)
    return pa.table({"triangles": pa.array([t], type=pa.int64())})


def q_degree_histogram(sf_dir: str):
    """Degree distribution (the power-law check): one row per distinct
    degree value with the number of vertices having that out-/in-degree.
    Per-batch bincount partials -> one degree-cardinality groupby."""
    _, edges, verts, _ = page_edge_tables(sf_dir)
    deg = degree_table(distinct_edges(edges), verts)

    def partial(batch: pa.Table) -> pa.Table:
        od = batch.column("out_degree").to_numpy(zero_copy_only=False)
        idg = batch.column("in_degree").to_numpy(zero_copy_only=False)
        m = int(max(od.max(initial=0), idg.max(initial=0))) + 1
        no = np.bincount(od, minlength=m).astype(np.int64)
        ni = np.bincount(idg, minlength=m).astype(np.int64)
        keep = (no > 0) | (ni > 0)
        return pa.table(
            {
                "degree": pa.array(np.flatnonzero(keep).astype(np.int64)),
                "o": pa.array(no[keep]),
                "i": pa.array(ni[keep]),
            }
        )

    return (
        deg.map_batches(partial, batch_format="pyarrow")
        .groupby("degree")
        .sum(["o", "i"])
        .map_batches(
            lambda b: pa.table(
                {"degree": b.column("degree"),
                 "n_out": b.column("sum(o)"),
                 "n_in": b.column("sum(i)")}
            ),
            batch_format="pyarrow",
        )
    )


def q_clustering_coeff(sf_dir: str):
    """Per-vertex triangle counts + local clustering coefficient over the
    page graph (isolated vertices included with deg=tri=0, coeff=0)."""
    from raylink.algos.triangles import local_clustering

    _, edges, verts, _ = page_edge_tables(sf_dir)
    return local_clustering(edges, verts_ds=verts)


def q_random_walks(sf_dir: str):
    """Deterministic hash-driven 6-step walks from every source vertex of
    the directed page graph."""
    from raylink.algos.walks import random_walks

    _, edges, _, _ = page_edge_tables(sf_dir)
    return random_walks(edges, walk_len=6, seed=0)


def q_avg_neighbor_degree(sf_dir: str):
    """Average-neighbor-degree curve knn(k) over the undirected page
    graph — degree-correlation profile (assortativity's curve form)."""
    from raylink.pipelines import avg_neighbor_degree

    _, edges, _, _ = page_edge_tables(sf_dir)
    return avg_neighbor_degree(edges)


def q_robustness(sf_dir: str, k: int = 10):
    """Hub-removal robustness (attack-tolerance of the crawl graph):
    remove the top-``k`` vertices by total degree (out+in over distinct
    directed edges, ties by vid), then measure the surviving undirected
    component structure. The hub list is the only driver-side state (k
    rows); the surviving-graph CC is the engine's own meta-graph LPA.
    -> one row (n_removed, n_vertices, n_components, giant_size)."""
    import pyarrow.compute as pc
    import ray

    from raylink.algos import connected_components
    from raylink.pipelines import degree_table, distinct_edges

    _, edges, verts, _ = page_edge_tables(sf_dir)
    de = distinct_edges(edges).materialize()
    deg = degree_table(de, verts).map_batches(
        lambda b: pa.table(
            {
                "vid": b.column("vid"),
                "d": pa.array(
                    b.column("out_degree").to_numpy(zero_copy_only=False)
                    + b.column("in_degree").to_numpy(zero_copy_only=False)
                ),
            }
        ),
        batch_format="pyarrow",
    )
    hub_rows = deg.sort(["d", "vid"], descending=[True, False]).limit(k).take_all()
    hubs = np.sort(np.array([r["vid"] for r in hub_rows], dtype=np.int64))
    href = ray.put(hubs)

    def drop_hub_edges(b: pa.Table) -> pa.Table:
        hs = ray.get(href)
        s = b.column("src").to_numpy(zero_copy_only=False)
        d = b.column("dst").to_numpy(zero_copy_only=False)
        keep = ~(np.isin(s, hs) | np.isin(d, hs))
        return b.filter(pa.array(keep))

    def drop_hub_verts(b: pa.Table) -> pa.Table:
        hs = ray.get(href)
        v = b.column("vid").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(~np.isin(v, hs)))

    fe = de.map_batches(drop_hub_edges, batch_format="pyarrow")
    fv = verts.map_batches(drop_hub_verts, batch_format="pyarrow")
    _, comps = connected_components(
        fe, vertices_ds=fv,
        ckpt_dir=_ckpt("robustness", sf_dir, k), engine="tasks",
    )
    from ray.data.aggregate import Count, Max

    sizes = comps.groupby("component").count()
    agg = sizes.aggregate(Count(), Max("count()"))
    nv = fv.count()
    n_comp = int(agg["count()"])
    giant = int(agg["max(count())"])
    return pa.table(
        {
            "n_removed": pa.array([len(hubs)], type=pa.int64()),
            "n_vertices": pa.array([nv], type=pa.int64()),
            "n_components": pa.array([n_comp], type=pa.int64()),
            "giant_size": pa.array([giant], type=pa.int64()),
        }
    )


def q_walk_corpus(sf_dir: str):
    """Embedding-training corpus lines from the node2vec walks: per-walker
    step-ordered vid sequence (one hash(walker) groupby, Arrow-native
    assembly)."""
    from raylink.algos.walks import node2vec_walks, walks_to_corpus

    _, edges, _, _ = page_edge_tables(sf_dir)
    walks = node2vec_walks(
        edges, walk_len=6, w_return=1, w_common=4, w_far=2, seed=0
    )
    return walks_to_corpus(walks)


def q_reciprocity(sf_dir: str):
    """Link reciprocity of the directed page graph (mutual-link fraction
    over distinct non-self edges) — one unordered-pair-keyed shuffle."""
    from raylink.pipelines import edge_reciprocity

    _, edges, _, _ = page_edge_tables(sf_dir)
    return edge_reciprocity(edges)


def q_node2vec(sf_dir: str):
    """Second-order (node2vec) biased 6-step walks: integer class weights
    (return 1 : common-neighbor 4 : far 2), hash-driven picks — the
    graph-embedding corpus sampler."""
    from raylink.algos.walks import node2vec_walks

    _, edges, _, _ = page_edge_tables(sf_dir)
    return node2vec_walks(
        edges, walk_len=6, w_return=1, w_common=4, w_far=2, seed=0
    )


def q_edge_support(sf_dir: str):
    """Per-edge triangle support (k-truss primitive) over the page graph."""
    from raylink.algos.triangles import edge_support

    _, edges, _, _ = page_edge_tables(sf_dir)
    return edge_support(edges)


def q_ktruss(sf_dir: str):
    """3-truss of the page graph: edges supported by >= 1 triangle after
    iterated peeling, with final-subgraph support."""
    from raylink.algos.triangles import ktruss

    _, edges, _, _ = page_edge_tables(sf_dir)
    return ktruss(edges, k=3)


def q_assortativity(sf_dir: str):
    """Degree assortativity (Pearson degree-degree correlation, both
    orientations) of the undirected page graph."""
    from raylink.algos.triangles import degree_assortativity

    _, edges, _, _ = page_edge_tables(sf_dir)
    return degree_assortativity(edges)


def q_four_cycles(sf_dir: str):
    """Exact global 4-cycle count of the undirected page graph (diagonal
    identity over common-neighbour pairs)."""
    from raylink.algos.triangles import four_cycle_count

    _, edges, _, _ = page_edge_tables(sf_dir)
    n = four_cycle_count(edges)
    return pa.table({"four_cycles": pa.array([n], type=pa.int64())})


def q_four_cliques(sf_dir: str):
    """Exact K4 count over the page graph augmented with deterministically
    PLANTED 4-cliques ({d..d+3} for every doc_id divisible by 97 — the
    synthetic link spec itself is K4-free, so the planting makes the
    oracle non-trivial; interactions with existing edges count too, both
    sides see the same graph)."""
    import ray.data as rd

    from raylink.algos.triangles import four_clique_count

    _, edges, _, n = page_edge_tables(sf_dir)
    m = n - (n % 3)

    def plant(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        d = d[(d % 97 == 0) & (d + 3 < m)]
        offs = np.array(
            [(i, j) for i in range(4) for j in range(4) if i < j],
            dtype=np.int64,
        )
        src = (d[:, None] + offs[None, :, 0]).ravel()
        dst = (d[:, None] + offs[None, :, 1]).ravel()
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    aug = edges.union(docs.map_batches(plant, batch_format="pyarrow"))
    k4 = four_clique_count(aug)
    return pa.table({"four_cliques": pa.array([k4], type=pa.int64())})


def q_degrees(sf_dir: str):
    _, edges, verts, _ = page_edge_tables(sf_dir)
    return degree_table(distinct_edges(edges), verts)


def q_subgraphs(sf_dir: str):
    from raylink.graph import vertex_table

    g = page_graph(sf_dir, directed=False)

    def out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "part": pa.array(
                    batch.column("part").to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "sg": batch.column("sg_minvid"),
            }
        )

    return vertex_table(g).map_batches(out, batch_format="pyarrow")


def q_meta_graph(sf_dir: str):
    from raylink.graph import meta_edges

    g = page_graph(sf_dir, directed=False)
    me = meta_edges(g).map_batches(
        lambda b: pa.table({"src": b.column("src_sg"), "dst": b.column("dst_sg")}),
        batch_format="pyarrow",
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"sg_src": batch.column("src"), "sg_dst": batch.column("dst")}
        )

    return distinct_edges(me).map_batches(rename, batch_format="pyarrow")


def q_sssp(sf_dir: str):
    from raylink.algos import sssp

    g = page_graph(sf_dir, directed=False)
    _, dists = sssp(g=g, source=0, engine="tasks", ckpt_dir=_ckpt("sssp", sf_dir, 0))
    return dists


def q_kcore(sf_dir: str):
    from raylink.algos import kcore

    g = page_graph(sf_dir, directed=False)
    _, members = kcore(g=g, k=3, engine="tasks", ckpt_dir=_ckpt("kcore", sf_dir, 3))
    return members.select_columns(["vid", "in_core"])


def q_graph_stats(sf_dir: str):
    """One-row graph summary. Everything is a distributed aggregate
    (VERDICT r2 item 3): n_components = groupby-count count (only the scalar
    reaches the driver), degree stats = per-batch partials + one Dataset
    ``aggregate`` — no O(V) ``to_pandas``/``unique`` pull anywhere."""
    from ray.data.aggregate import Max, Sum

    gd = page_graph(sf_dir, directed=True)
    gu = page_graph(sf_dir, directed=False)
    comps = q_connected_components(sf_dir)
    n_components = comps.groupby("component").count().count()

    def deg_partial(b: pa.Table) -> pa.Table:
        od = b.column("out_degree").to_numpy(zero_copy_only=False)
        idg = b.column("in_degree").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "iso": pa.array([int(((od == 0) & (idg == 0)).sum())], type=pa.int64()),
                "mo": pa.array([int(od.max()) if len(od) else 0], type=pa.int64()),
                "mi": pa.array([int(idg.max()) if len(idg) else 0], type=pa.int64()),
            }
        )

    agg = (
        q_degrees(sf_dir)
        .map_batches(deg_partial, batch_format="pyarrow")
        .aggregate(Sum("iso"), Max("mo"), Max("mi"))
    )
    return pa.table(
        {
            "n_vertices": pa.array([gd.n_vertices], type=pa.int64()),
            "n_edges": pa.array([gd.n_edges], type=pa.int64()),
            "n_components": pa.array([n_components], type=pa.int64()),
            "n_subgraphs": pa.array([gu.n_subgraphs], type=pa.int64()),
            "n_isolated": pa.array([int(agg["sum(iso)"])], type=pa.int64()),
            "max_out_degree": pa.array([int(agg["max(mo)"])], type=pa.int64()),
            "max_in_degree": pa.array([int(agg["max(mi)"])], type=pa.int64()),
        }
    )


def q_link_positions(sf_dir: str):
    """Typed edge values end-to-end (reference IEdge.java:26-34 parity,
    VERDICT r2 item 10): anchors exploded WITH their 0-based page position,
    persisted per shard as ``e_pos`` via ``build_graph(edge_cols=['pos'])``,
    read back through ``edge_table`` -> (src, dst, pos). Duplicate edges
    keep MIN(pos) — the documented (weight, *edge_cols) dedup order."""
    import ray.data as rd

    from raylink import storage
    from raylink.extract import ExtractPages, explode_links_pos
    from raylink.graph import GRAPH_ROOT, LinkGraph, build_graph, edge_table
    from raylink.synth import pages_dataset

    key = cache_key("pos_graph", sf_dir)
    gdir = storage.join(GRAPH_ROOT, key)
    if storage.exists(storage.join(gdir, "manifest.json")):
        g = LinkGraph.load(gdir)
        return edge_table(g, ["pos"])
    pages, n = pages_dataset(sf_dir, include_golden=False)
    extracted = pages.map_batches(
        ExtractPages, batch_format="pyarrow", batch_size=512,
        concurrency=(1, 4),
    )

    def ids_with_pos(batch: pa.Table) -> pa.Table:
        from raylink.pipelines import _ids_from_urls

        ids = _ids_from_urls(batch)
        return ids.append_column("pos", batch.column("pos"))

    edges = (
        extracted.map_batches(explode_links_pos, batch_format="pyarrow")
        .map_batches(ids_with_pos, batch_format="pyarrow")
        .materialize()
    )
    verts = rd.from_arrow(
        pa.table({"vid": pa.array(np.arange(n, dtype=np.int64))})
    )
    g = build_graph(
        edges, verts, num_parts=P, partitioner="mod", directed=True,
        graph_dir=gdir, edge_cols=["pos"],
    )
    return edge_table(g, ["pos"])


# ------------------------------------------------------- relational (TPC-H-ish)
# The driver testdata ships TPC-H-shaped tables; these queries exercise the
# engine's relational layer (column-pruned reads, per-batch integer-scaled
# partial aggregation before the groupby, broadcast of tiny dimensions,
# large x large hash_join) on the biggest tables. All money/discount/tax
# arithmetic is INTEGER-SCALED (cents), so every aggregate is exact in
# int64 and the DuckDB oracle comparison is bit-exact — no float-summation
# order sensitivity anywhere.
#
# Scale bound (documented, not silent): the scaled charge term is
# ~1e11 per row, so a SINGLE int64 group sum stays exact up to ~1e7 rows
# per group per batch (partials) and ~9e18 total — beyond ~1e7 rows per
# GLOBAL group the final sum should move to per-group hierarchical
# accumulation (int128 limbs or decimal), same pattern as the splitmix64
# SQL mirror in oracles_sql._mul64.

_SHIP_CUTOFF = np.datetime64("2001-01-01", "us")
_Q3_DATE = np.datetime64("2000-03-15", "us")


def _cents(arr) -> np.ndarray:
    """Exact-2dp float column -> int64 cents (values are exact multiples of
    0.01, so nearest-int is exact; matches SQL ROUND(x*100)::BIGINT)."""
    return np.rint(arr.to_numpy(zero_copy_only=False) * 100).astype(np.int64)


def q_pricing_summary(sf_dir: str, lineitem_paths: list[str] | None = None):
    """TPC-H Q1-shaped pricing summary: per (returnflag, linestatus) sums /
    averages over shipped lineitems. Shape: column-pruned read -> per-batch
    integer partial aggregates (one row per group per batch) -> tiny
    groupby -> final division. Nothing bigger than #groups shuffles.
    ``lineitem_paths`` overrides the fact-table read (bench amplification:
    pass the same file N times for an N x scan)."""
    import pyarrow.compute as pc
    import ray.data as rd

    # row filter pushed to the parquet scanner (row-group statistics prune
    # IO before a byte leaves storage — the 100-TB design point); the
    # in-batch filter below stays as the exactness guarantee (pushdown is
    # also exact, so it is a no-op on the surviving rows)
    li = rd.read_parquet(
        lineitem_paths or f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
        filter=pc.field("l_shipdate")
        <= pa.scalar(_SHIP_CUTOFF.item(), type=pa.timestamp("us")),
    )

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(
            pc.less_equal(
                b.column("l_shipdate"),
                pa.scalar(_SHIP_CUTOFF.item(), type=pa.timestamp("us")),
            )
        )
        if t.num_rows == 0:
            return pa.table(
                {"l_returnflag": pa.array([], type=pa.string()),
                 "l_linestatus": pa.array([], type=pa.string()),
                 "qty": pa.array([], type=pa.int64()),
                 "base": pa.array([], type=pa.int64()),
                 "disc_price": pa.array([], type=pa.int64()),
                 "charge": pa.array([], type=pa.int64()),
                 "disc": pa.array([], type=pa.int64()),
                 "cnt": pa.array([], type=pa.int64())}
            )
        # Arrow-native group keys: dictionary-encode both string columns
        # (no per-row python objects on the fact-table scan), combine the
        # integer codes into one packed key for the per-batch grouping.
        rf = t.column("l_returnflag").combine_chunks().dictionary_encode()
        ls = t.column("l_linestatus").combine_chunks().dictionary_encode()
        rfc = rf.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        lsc = ls.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nls = len(ls.dictionary)
        uk, inv = np.unique(rfc * nls + lsc, return_inverse=True)
        q = np.rint(t.column("l_quantity").to_numpy(zero_copy_only=False)).astype(np.int64)
        ec = _cents(t.column("l_extendedprice"))
        dc = _cents(t.column("l_discount"))
        tc = _cents(t.column("l_tax"))
        dp = ec * (100 - dc)
        ch = dp * (100 + tc)
        ng = len(uk)

        def gsum(v):  # int64 accumulation end-to-end — exact up to the
            # documented ~1e7 rows/group int64 bound regardless of batch size
            out = np.zeros(ng, dtype=np.int64)
            np.add.at(out, inv, v.astype(np.int64))
            return out

        return pa.table(
            {
                "l_returnflag": rf.dictionary.take(pa.array(uk // nls)),
                "l_linestatus": ls.dictionary.take(pa.array(uk % nls)),
                "qty": pa.array(gsum(q)),
                "base": pa.array(gsum(ec)),
                "disc_price": pa.array(gsum(dp)),
                "charge": pa.array(gsum(ch)),
                "disc": pa.array(gsum(dc)),
                "cnt": pa.array(np.bincount(inv, minlength=ng).astype(np.int64)),
            }
        )

    from raylink.join import tree_groupby_sum

    # 6 groups max: map-only combine tree, not the sort-based Aggregate
    agg = tree_groupby_sum(
        li.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        ["qty", "base", "disc_price", "charge", "disc", "cnt"],
    )

    def finish(b: pa.Table) -> pa.Table:
        qty = b.column("sum(qty)").to_numpy(zero_copy_only=False).astype(np.int64)
        base = b.column("sum(base)").to_numpy(zero_copy_only=False).astype(np.int64)
        dp = b.column("sum(disc_price)").to_numpy(zero_copy_only=False).astype(np.int64)
        ch = b.column("sum(charge)").to_numpy(zero_copy_only=False).astype(np.int64)
        dc = b.column("sum(disc)").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = b.column("sum(cnt)").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "sum_qty": pa.array(qty.astype(np.float64)),
                "sum_base_price": pa.array(base.astype(np.float64) / 100.0),
                "sum_disc_price": pa.array(dp.astype(np.float64) / 10000.0),
                "sum_charge": pa.array(ch.astype(np.float64) / 1000000.0),
                "avg_qty": pa.array(qty.astype(np.float64) / cnt),
                "avg_price": pa.array(base.astype(np.float64) / 100.0 / cnt),
                "avg_disc": pa.array(dc.astype(np.float64) / 100.0 / cnt),
                "count_order": pa.array(cnt),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"]
    )


def _parquet_rows(sf_dir: str, name: str) -> int:
    """Row count from the parquet FOOTER — free (no execution), so join
    shapes can be size-thresholded without materializing anything."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/{name}.parquet").metadata.num_rows


def q_shipping_priority(sf_dir: str, broadcast_threshold: int | None = None):
    """TPC-H Q3-shaped shipping priority: top-10 open orders of BUILDING
    customers by pending revenue. Shape: the customer semi-join is
    size-thresholded on the parquet-footer row count — broadcast the
    filtered custkeys (``ray.put``) while the dimension is small, switch to
    the distributed ``hash_join`` semi-join when it is dataset-sized; then
    date-filtered fact reads, large x large ``hash_join`` lineitem x
    orders, per-batch integer revenue partials, multi-key groupby,
    distributed sort + limit."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from raylink.join import BROADCAST_THRESHOLD, hash_join

    if broadcast_threshold is None:
        broadcast_threshold = BROADCAST_THRESHOLD
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"],
        filter=pc.field("c_mktsegment") == "BUILDING",
    ).map_batches(
        lambda b: b.filter(pc.equal(b.column("c_mktsegment"), pa.scalar("BUILDING")))
        .select(["c_custkey"]),
        batch_format="pyarrow",
    )
    d1 = pa.scalar(_Q3_DATE.item(), type=pa.timestamp("us"))
    orders_raw = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pc.field("o_orderdate") < d1,  # scanner-level row pruning
    )

    if _parquet_rows(sf_dir, "customer") <= broadcast_threshold:
        ckeys = np.sort(cust.to_pandas()["c_custkey"].to_numpy(np.int64))
        cref = ray.put(ckeys)

        def orders_f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.less(b.column("o_orderdate"), d1))
            ck = ray.get(cref)
            ok = t.column("o_custkey").to_numpy(zero_copy_only=False)
            if len(ck) == 0:  # empty dimension: nothing can match
                hit = np.zeros(len(ok), dtype=bool)
            else:
                pos = np.searchsorted(ck, ok)
                hit = (pos < len(ck)) & (ck[np.minimum(pos, len(ck) - 1)] == ok)
            t = t.filter(pa.array(hit))
            return pa.table(
                {"okey": t.column("o_orderkey"),
                 "o_orderdate": t.column("o_orderdate")}
            )

        orders = orders_raw.map_batches(orders_f, batch_format="pyarrow")
    else:  # dataset-sized dimension: distributed semi-join (inner hash_join)

        def odate_f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.less(b.column("o_orderdate"), d1))
            return pa.table(
                {
                    "ckey": t.column("o_custkey"),
                    "okey": t.column("o_orderkey"),
                    "o_orderdate": t.column("o_orderdate"),
                }
            )

        odate = orders_raw.map_batches(odate_f, batch_format="pyarrow")
        ckds = cust.map_batches(
            lambda b: pa.table(
                {"ckey": b.column("c_custkey"),
                 "bld": pa.array(np.ones(b.num_rows, dtype=np.int8))}
            ),
            batch_format="pyarrow",
        )
        orders = hash_join(
            odate, ckds, on="ckey",
            left_cols={"okey": pa.int64(), "o_orderdate": pa.timestamp("us")},
            right_cols={"bld": pa.int8()},
            strict=False,
        ).select_columns(["okey", "o_orderdate"])

    def li_f(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater(b.column("l_shipdate"), d1))
        rev = _cents(t.column("l_extendedprice")) * (
            100 - _cents(t.column("l_discount"))
        )
        return pa.table({"okey": t.column("l_orderkey"), "rev": pa.array(rev)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=pc.field("l_shipdate") > d1,  # scanner-level row pruning
    ).map_batches(li_f, batch_format="pyarrow")

    def rev_final(b: pa.Table) -> pa.Table:
        ok = b.column("okey").to_numpy(zero_copy_only=False)
        uk, idx, inv = np.unique(ok, return_index=True, return_inverse=True)
        rev = b.column("rev").to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, rev)  # int64-exact regardless of batch size
        dates = b.column("o_orderdate").take(pa.array(idx))
        return pa.table(
            {"l_orderkey": pa.array(uk), "rev": pa.array(s), "o_orderdate": dates}
        )

    # revenue groups on the JOIN key, so the aggregation runs inside the
    # join's bucket groups (hash_join post) — each okey's rows are complete
    # there, making the sums globally final with no second shuffle;
    # o_orderdate rides along (functionally dependent on the order key)
    agg = hash_join(
        li, orders, on="okey",
        left_cols={"rev": pa.int64()},
        right_cols={"o_orderdate": pa.timestamp("us")},
        strict=False,
        post=rev_final,
    )
    top = agg.sort(["rev", "l_orderkey"], descending=[True, False]).limit(10)
    return top.map_batches(
        lambda b: pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "revenue": pa.array(
                    b.column("rev").to_numpy(zero_copy_only=False).astype(np.float64)
                    / 10000.0
                ),
                "o_orderdate": b.column("o_orderdate"),
            }
        ),
        batch_format="pyarrow",
    )


def q_nation_revenue(sf_dir: str, broadcast_threshold: int | None = None):
    """TPC-H Q5-shaped revenue per customer nation: nation (25 rows) is a
    driver map; the customer nationkey attach goes through the thresholded
    ``attach_lookup`` (broadcast while small, distributed hash join when the
    dimension is dataset-sized — decided from the parquet footer row count,
    no execution); then one large x large ``hash_join`` orders x lineitem +
    integer partial aggregation by nation. -> (n_name, revenue), ordered by
    revenue desc, name asc."""
    import ray.data as rd

    from raylink.join import attach_lookup, hash_join

    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nmap = dict(zip(nat["n_nationkey"], nat["n_name"]))
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda b: pa.table(
            {"ckey": b.column("c_custkey"),
             "nkey": pa.compute.cast(b.column("c_nationkey"), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    orders_k = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda b: pa.table(
            {"okey": b.column("o_orderkey"), "ckey": b.column("o_custkey")}
        ),
        batch_format="pyarrow",
    )
    from raylink.join import BROADCAST_THRESHOLD

    orders = attach_lookup(
        orders_k, cust, on="ckey",
        left_cols={"okey": pa.int64()}, value_cols={"nkey": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "customer"),
        broadcast_threshold=(
            BROADCAST_THRESHOLD if broadcast_threshold is None
            else broadcast_threshold
        ),
    ).select_columns(["okey", "nkey"])

    def li_f(b: pa.Table) -> pa.Table:
        rev = _cents(b.column("l_extendedprice")) * (
            100 - _cents(b.column("l_discount"))
        )
        return pa.table({"okey": b.column("l_orderkey"), "rev": pa.array(rev)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_f, batch_format="pyarrow")

    def nat_partial(b: pa.Table) -> pa.Table:
        nk = b.column("nkey").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(nk, return_inverse=True)
        rev = b.column("rev").to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, rev)  # int64-exact regardless of batch size
        return pa.table({"nkey": pa.array(uk), "rev": pa.array(s)})

    from raylink.join import tree_groupby_sum

    # nation partials collapse inside the join's bucket groups (post) —
    # <=25 rows leave each bucket — then a map-only combine tree finishes
    # (nkey is NOT the join key, so per-bucket sums are partials)
    joined = hash_join(
        li, orders, on="okey",
        left_cols={"rev": pa.int64()}, right_cols={"nkey": pa.int64()},
        strict=False,
        post=nat_partial,
    )
    agg = tree_groupby_sum(joined, ["nkey"], ["rev"])

    def finish(b: pa.Table) -> pa.Table:
        nk = b.column("nkey").to_numpy(zero_copy_only=False)
        s = b.column("sum(rev)").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n_name": pa.array([nmap[int(k)] for k in nk], type=pa.string()),
                "revenue": pa.array(s.astype(np.float64) / 10000.0),
                "rev_i": pa.array(s),
            }
        )

    out = agg.map_batches(finish, batch_format="pyarrow")
    return out.sort(["rev_i", "n_name"], descending=[True, False]).drop_columns(
        ["rev_i"]
    )


# ------------------------------------------------------------ documents ops
def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


def q_dedup_exact(sf_dir: str):
    from raylink.ops.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir))


def q_dedup_ngram(sf_dir: str):
    from raylink.ops.dedup import ngram_pairs

    return ngram_pairs(_docs(sf_dir), n=3, tau=0.5)


def q_containment(sf_dir: str):
    """Asymmetric n-gram containment pairs (|A n B| / min(|A|, |B|) >=
    0.2) — subset-duplication (quote / aggregator-wrap) detection the
    symmetric Jaccard threshold misses."""
    from raylink.ops.dedup import containment_pairs

    return containment_pairs(_docs(sf_dir), n=3, tau=0.2)


def q_novelty(sf_dir: str):
    """Per-doc trigram novelty (fraction of the doc's distinct grams with
    corpus DF 1) — the uniqueness curation signal."""
    from raylink.ops.dedup import novelty_scores

    return novelty_scores(_docs(sf_dir), n=3)


def q_dedup_minhash(sf_dir: str):
    from raylink.ops.dedup import minhash_pairs

    return minhash_pairs(_docs(sf_dir), n=3, tau=0.5)


def q_dedup_incremental(sf_dir: str):
    """Incremental MinHash near-dup for a continuous crawl: docs with
    doc_id % 10 == 4 play the newly-crawled batch; output = the LSH pairs
    touching the new batch (old x old candidates never form)."""
    from raylink.ops.dedup import minhash_pairs_incremental

    docs = _docs(sf_dir)

    def split(want_new: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            m = (ids % 10 == 4) == want_new
            return batch.filter(pa.array(m))

        return fn

    old = docs.map_batches(split(False), batch_format="pyarrow")
    new = docs.map_batches(split(True), batch_format="pyarrow")
    return minhash_pairs_incremental(old, new, n=3, tau=0.5)


def q_dedup_simhash(sf_dir: str):
    from raylink.ops.dedup import simhash_pairs

    return simhash_pairs(_docs(sf_dir), max_hamming=3)


def q_token_count(sf_dir: str):
    from raylink.ops.textstats import TextStats

    stats = _docs(sf_dir).map_batches(
        TextStats, batch_format="pyarrow", batch_size=512, concurrency=(1, 2)
    )
    total = stats.sum("n_tokens")
    return pa.table({"total_tokens": pa.array([int(total)], type=pa.int64())})


def q_text_stats(sf_dir: str):
    from raylink.ops.textstats import TextStats

    return _docs(sf_dir).map_batches(
        TextStats, batch_format="pyarrow", batch_size=512, concurrency=(1, 2)
    )


def q_lang_id(sf_dir: str):
    from raylink.ops.textstats import LangId

    return _docs(sf_dir).map_batches(
        LangId, batch_format="pyarrow", batch_size=512, concurrency=(1, 2)
    )


def q_fingerprint(sf_dir: str):
    from raylink.ops.textstats import fingerprint_batch

    return _docs(sf_dir).map_batches(
        fingerprint_batch, batch_format="pyarrow"
    ).select_columns(["doc_id", "fp_md5"])


def q_curation_funnel(sf_dir: str):
    """The canonical training-data curation funnel, composed end-to-end:
    keep a document iff (quality keep rule) AND (predicted lang == 'en')
    AND (it is the canonical copy of its exact-dup group). One streaming
    pass computes stats+lang per batch; the dedup keep-set arrives via the
    distributed exact-dedup groupby and a hash join (no driver set).
    Output: (doc_id, n_words, quality) of survivors."""
    from raylink.join import hash_join
    from raylink.ops.dedup import exact_dedup
    from raylink.ops.textstats import LangId, TextStats

    docs = _docs(sf_dir)
    stats = docs.map_batches(TextStats, batch_format="pyarrow", batch_size=512,
                             concurrency=(1, 2))
    langs = _docs(sf_dir).map_batches(LangId, batch_format="pyarrow",
                                      batch_size=512, concurrency=(1, 2))
    keep_ids = exact_dedup(_docs(sf_dir)).map_batches(
        lambda b: pa.table({"doc_id": b.column("keep_id"),
                            "is_keep": pa.array(np.ones(len(b), dtype=np.int64))}),
        batch_format="pyarrow",
    )
    j1 = hash_join(
        stats.map_batches(
            lambda b: pa.table({"doc_id": b.column("doc_id"),
                                "n_words": b.column("n_words"),
                                "quality": b.column("quality"),
                                "keep": b.column("keep")}),
            batch_format="pyarrow",
        ),
        langs.map_batches(
            lambda b: pa.table({"doc_id": b.column("doc_id"),
                                "pred_lang": b.column("pred_lang")}),
            batch_format="pyarrow",
        ),
        on="doc_id",
        left_cols={"n_words": pa.int64(), "quality": pa.float64(),
                   "keep": pa.bool_()},
        right_cols={"pred_lang": pa.string()},
    )
    j2 = hash_join(
        j1, keep_ids, on="doc_id",
        left_cols={"n_words": pa.int64(), "quality": pa.float64(),
                   "keep": pa.bool_(), "pred_lang": pa.string()},
        right_cols={"is_keep": pa.int64()},
        strict=False,  # non-canonical dups have no keep row -> dropped
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.and_(
            batch.column("keep"),
            pc.equal(batch.column("pred_lang"), pa.scalar("en")),
        )
        kept = batch.filter(mask)
        return pa.table(
            {
                "doc_id": kept.column("doc_id"),
                "n_words": kept.column("n_words"),
                "quality": kept.column("quality"),
            }
        )

    return j2.map_batches(finish, batch_format="pyarrow")


def q_search_topk(sf_dir: str):
    """BM25-lite search ranking: top-20 docs for the fixed query
    (spark, join, window) by tf x (N/df) — two shuffle-free scans +
    distributed sort."""
    from raylink.ops.textstats import search_topk

    return search_topk(
        _docs(sf_dir), ["spark", "join", "window"], k=20,
        n_docs=_parquet_rows(sf_dir, "documents"),
    )


def q_token_topk(sf_dir: str):
    """Top-100 vocabulary tokens (cnt desc, token asc tie-break)."""
    from raylink.ops.textstats import token_topk

    return token_topk(_docs(sf_dir), k=100)


def q_distinct_hll(sf_dir: str):
    """HyperLogLog (p=12) distinct-word estimate over documents — the
    mergeable-sketch path for crawl-scale cardinality (vs token_topk's
    exact vocabulary shuffle)."""
    from raylink.ops.sketch import hll_distinct_words

    return hll_distinct_words(_docs(sf_dir), p=12)


def q_decontaminate(sf_dir: str):
    """Benchmark-contamination flags: the 'benchmark' is the deterministic
    pseudo-eval-set doc_id % 101 == 7; a doc is contaminated iff it shares
    any verbatim 8-word-gram with a benchmark doc."""
    from raylink.ops.dedup import decontaminate

    docs = _docs(sf_dir)

    def bench_filter(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 101 == 7))

    bench = docs.map_batches(bench_filter, batch_format="pyarrow")
    return decontaminate(docs, bench, n=8)


def q_bloom_decontaminate(sf_dir: str):
    """Bloom-filter decontamination (fixed 2^16-bit broadcast bitset, k=4
    probes) over the same doc_id % 101 == 7 pseudo-benchmark — the
    bounded-broadcast variant of `decontaminate`; the oracle reproduces the
    sketch's false positives exactly."""
    from raylink.ops.sketch import bloom_decontaminate

    docs = _docs(sf_dir)

    def bench_filter(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 101 == 7))

    bench = docs.map_batches(bench_filter, batch_format="pyarrow")
    return bloom_decontaminate(docs, bench, n=8, m_bits=16, k=4)


def _plant_pii(batch: pa.Table) -> pa.Table:
    """Deterministic PII planting shared by q_pii_scan / q_pii_redact (the
    synthetic corpus is digit-free): an email / an IPv4 / a long number on
    doc_id mod 7/11/13 == 0 rows, mirrored verbatim in the SQL oracles."""
    import pyarrow.compute as pc

    ids = batch.column("doc_id").combine_chunks()
    idn = ids.to_numpy(zero_copy_only=False)
    s = lambda a: pc.cast(a, pa.string())  # noqa: E731
    j = pc.binary_join_element_wise
    empty = pa.scalar("", type=pa.string())
    em = pc.if_else(
        pa.array(idn % 7 == 0),
        j(" contact admin", s(ids), "@example.com", ""), empty,
    )
    ip = pc.if_else(
        pa.array(idn % 11 == 0),
        j(" 10.", s(pa.array(idn % 256)), ".0.", s(pa.array(idn % 100)), ""),
        empty,
    )
    ln = pc.if_else(
        pa.array(idn % 13 == 0),
        j(" ", s(pa.array(1000000000 + idn)), ""), empty,
    )
    text = pc.fill_null(batch.column("text").combine_chunks(), "")
    return pa.table({"doc_id": ids, "text": j(text, em, ip, ln, "")})


def q_pii_scan(sf_dir: str):
    """PII-pattern counts over the deterministically planted corpus — the
    scan itself (`ops.textstats.pii_scan`) is generic and pattern-only."""
    from raylink.ops.textstats import pii_scan

    return pii_scan(_docs(sf_dir).map_batches(_plant_pii, batch_format="pyarrow"))


def q_pii_redact(sf_dir: str):
    """PII redaction over the same planted corpus: emails/IPv4s/long digit
    runs replaced by <EMAIL>/<IP>/<NUM> placeholders in a fixed stage
    order -> (doc_id, redacted_text, n_redactions)."""
    from raylink.ops.textstats import pii_redact

    return pii_redact(_docs(sf_dir).map_batches(_plant_pii, batch_format="pyarrow"))


def q_cooccurrence(sf_dir: str):
    """Top-100 window-3 skip-gram word pairs over the documents table."""
    from raylink.ops.textstats import cooccurrence_topk

    return cooccurrence_topk(_docs(sf_dir), window=3, k=100)


def q_postings(sf_dir: str):
    """Inverted index over the documents table, df in [2, 400] (the max_df
    cut drops the corpus-wide stopword rows)."""
    from raylink.ops.textstats import postings

    return postings(_docs(sf_dir), min_df=2, max_df=400)


def q_bigram_topk(sf_dir: str):
    """Top-100 adjacent word pairs (cnt desc, bigram asc tie-break)."""
    from raylink.ops.textstats import bigram_topk

    return bigram_topk(_docs(sf_dir), k=100)


def q_bpe_merges(sf_dir: str):
    """Learn the top-6 BPE merge rules over the corpus word vocabulary —
    the tokenizer-training stage (Sennrich et al. 2016). The corpus is
    scanned once; every round runs over the vocabulary Dataset (pair
    partials -> bucket groupby -> per-bucket winners; driver holds <=
    num_buckets rows/round)."""
    from raylink.ops.bpe import bpe_merges

    return bpe_merges(_docs(sf_dir), rounds=6)


def q_bpe_token_count(sf_dir: str):
    """Tokenizer train-then-apply: learn 6 BPE merges, then count per-doc
    subword tokens with the merge-table actor pool (shuffle-free
    inference scan) -> (doc_id, n_bpe_tokens)."""
    from raylink.ops.bpe import bpe_token_count

    return bpe_token_count(_docs(sf_dir), rounds=6)


def q_bigram_coherence(sf_dir: str):
    """Per-doc bigram coherence (mean corpus frequency of the doc's
    adjacent word pairs) — the n-gram-LM fluency proxy curation filter."""
    from raylink.ops.textstats import bigram_coherence

    return bigram_coherence(_docs(sf_dir)).sort("doc_id")


def q_lm_score(sf_dir: str):
    """Smoothed bigram-LM likelihood score per doc (fixed-point CCNet-style
    fluency signal): mean over bigram occurrences of
    ((bc+1)*SCALE) // (uc(w1)+V)."""
    from raylink.ops.textstats import lm_score

    return lm_score(_docs(sf_dir)).sort("doc_id")


DSIR_TARGET = "src0"


def q_dsir_weights(sf_dir: str):
    """DSIR-style hashed n-gram importance scores against the src0 target
    distribution (linear-domain fixed-point variant) — the data-selection
    signal for importance resampling."""
    import ray.data as rd

    from raylink.ops.textstats import dsir_weights

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return dsir_weights(docs, target_source=DSIR_TARGET)


def q_typo_pairs(sf_dir: str):
    """Edit-distance-1 vocabulary pairs via SymSpell deletion-neighborhood
    blocking, over the corpus vocabulary plus deterministically planted
    typos (the pii_scan precedent — the closed-form corpus has no natural
    typos): docs with doc_id % 7 == 2 contribute their first word with the
    2nd character deleted (words of length >= 4 only)."""
    import pyarrow.compute as pc

    from raylink.ops.textstats import _word_codes, typo_pairs

    def vocab_rows(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        _, _, dic = _word_codes(text)
        words = [pc.cast(dic, pa.string())]
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        st = pc.extract_regex(pc.utf8_lower(text), r"(?P<fw>[a-z]+)")
        fw = pc.fill_null(pc.struct_field(st, "fw"), "")
        keep = (
            (ids % 7 == 2)
            & (pc.utf8_length(fw).to_numpy(zero_copy_only=False) >= 4)
        )
        if keep.any():
            fwk = fw.filter(pa.array(keep))
            words.append(
                pc.binary_join_element_wise(
                    pc.utf8_slice_codeunits(fwk, 0, 1),
                    pc.utf8_slice_codeunits(fwk, 2, 1 << 30),
                    "",
                )
            )
        out = pa.concat_arrays(
            [w.combine_chunks() if isinstance(w, pa.ChunkedArray) else w
             for w in words]
        )
        return pa.table({"word": out})

    vocab = _docs(sf_dir).map_batches(vocab_rows, batch_format="pyarrow")
    return typo_pairs(vocab)


PERC_DIM = 64
PERC_ROUNDS = 6


def q_perceptron(sf_dir: str):
    """Batch-perceptron training of a hashed bag-of-words linear classifier
    (6 full-corpus rounds, integer updates) -> the dim+1 final weights —
    the TRAINING side of the curation stack's quality classifier."""
    import ray.data as rd

    from raylink.ops.train import perceptron_train

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    weights, _ = perceptron_train(docs, dim=PERC_DIM, rounds=PERC_ROUNDS)
    return weights


def q_perceptron_scores(sf_dir: str):
    """Inference with the trained perceptron: per-doc planted label y,
    prediction yhat and integer margin — train + eval end-to-end."""
    import ray.data as rd

    from raylink.ops.train import perceptron_eval, perceptron_train

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    weights, _ = perceptron_train(docs, dim=PERC_DIM, rounds=PERC_ROUNDS)
    return perceptron_eval(docs, weights, dim=PERC_DIM)


def q_dsir_sample(sf_dir: str):
    """DSIR importance resampling against src0: docs kept with probability
    proportional to their fixed-point target/raw ratio (deterministic
    splitmix64 draw — no RNG state)."""
    import ray.data as rd

    from raylink.ops.textstats import dsir_resample

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    return dsir_resample(docs, target_source=DSIR_TARGET)


def q_dedup_clusters(sf_dir: str):
    """Near-dup resolution: connected components over the n-gram Jaccard
    pair graph -> one cluster id (min doc_id) per document. Composes the
    curation layer (pair generation + distributed verify) with the graph
    engine (meta-graph CC) — the standard 'pick a canonical doc per
    duplicate cluster' step of a crawl pipeline."""
    from raylink.algos import connected_components
    from raylink.ops.dedup import ngram_pairs

    docs = _docs(sf_dir)
    pairs = ngram_pairs(docs, n=3, tau=0.5).map_batches(
        lambda b: pa.table({"src": b.column("doc_a"), "dst": b.column("doc_b")}),
        batch_format="pyarrow",
    ).materialize()
    verts = docs.map_batches(
        lambda b: pa.table({"vid": b.column("doc_id")}), batch_format="pyarrow"
    )
    _, comps = connected_components(
        pairs, vertices_ds=verts, num_parts=P, partitioner="mod",
        engine="tasks", ckpt_dir=_ckpt("dedup_clusters", sf_dir),
    )
    return comps.map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("vid"), "cluster": b.column("component")}
        ),
        batch_format="pyarrow",
    )


def q_dedup_survivors(sf_dir: str):
    """The dedup OUTPUT corpus: one canonical doc (min doc_id) per
    near-dup cluster, annotated with its cluster size — the row-level
    decision the cluster resolution exists for."""
    from raylink.join import bucketed_sum, hash_join

    comps = q_dedup_clusters(sf_dir)

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"cluster": batch.column("cluster"),
             "c": pa.array(np.ones(batch.num_rows, np.int64))}
        )

    sizes = bucketed_sum(
        comps.map_batches(ones, batch_format="pyarrow"),
        "cluster", "c", out_val="n_in_cluster",
    )

    def canon(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        cl = batch.column("cluster").to_numpy(zero_copy_only=False)
        m = d == cl
        return pa.table({"cluster": pa.array(cl[m])})

    return hash_join(
        comps.map_batches(canon, batch_format="pyarrow"), sizes,
        on="cluster", left_cols={}, right_cols={"n_in_cluster": pa.int64()},
    ).map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("cluster"),
             "n_in_cluster": b.column("n_in_cluster")}
        ),
        batch_format="pyarrow",
    )


def q_host_vocab(sf_dir: str):
    """Per-host vocabulary-richness estimate (HLL distinct words per
    site, p=8) — the grouped sketch: shuffle carries at most
    hosts x 256 register rows, never per-host vocabularies."""
    import pyarrow.compute as pc

    from raylink.ops.sketch import hll_grouped_distinct_words

    extracted, _, _, _ = page_edge_tables(sf_dir)

    def host_col(batch: pa.Table) -> pa.Table:
        host = pc.replace_substring_regex(
            pc.replace_substring_regex(
                batch.column("url"), pattern="^https://", replacement=""
            ),
            pattern="/.*$", replacement="",
        )
        return pa.table({"host": host, "text": batch.column("text")})

    pages = extracted.map_batches(host_col, batch_format="pyarrow")
    return hll_grouped_distinct_words(pages, "host", p=8).sort("host")


def q_domain_stats(sf_dir: str):
    """Per-site aggregates over the crawled pages (host, n_pages,
    total_chars) — domain-level curation (crawl allow/deny lists, per-site
    caps). Host parsed from the url with vectorized Arrow kernels; partial
    per-batch aggregation before the one vocabulary-sized groupby."""
    import pyarrow.compute as pc

    extracted, _, _, _ = page_edge_tables(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        host = pc.replace_substring_regex(
            pc.replace_substring_regex(batch.column("url"), pattern="^https://", replacement=""),
            pattern="/.*$", replacement="",
        )
        chars = pc.utf8_length(batch.column("text"))
        # Arrow-native partial: dictionary-encode the host strings, then
        # bincount/int64-accumulate over the integer codes — no pandas, no
        # python string objects on the page scan.
        he = (
            host.combine_chunks() if isinstance(host, pa.ChunkedArray) else host
        ).dictionary_encode()
        codes = he.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nh = len(he.dictionary)
        cn = chars.to_numpy(zero_copy_only=False).astype(np.int64)
        csum = np.zeros(nh, dtype=np.int64)
        np.add.at(csum, codes, cn)
        return pa.table(
            {
                "host": he.dictionary,
                "n": pa.array(np.bincount(codes, minlength=nh).astype(np.int64)),
                "c": pa.array(csum),
            }
        )

    return (
        extracted.map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .sum(["n", "c"])
        .map_batches(
            lambda b: pa.table(
                {
                    "host": b.column("host"),
                    "n_pages": b.column("sum(n)"),
                    "total_chars": b.column("sum(c)"),
                }
            ),
            batch_format="pyarrow",
        )
    )


# ----------------------------------------------------------- embeddings ops
def _emb(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def q_knn(sf_dir: str):
    from raylink.ops.similarity import knn_brute

    return knn_brute(_emb(sf_dir), query_ids=list(range(10)), k=5)


def q_ann_lsh(sf_dir: str):
    from raylink.ops.similarity import lsh_ann

    return lsh_ann(_emb(sf_dir), query_ids=list(range(10)), k=5)


def q_ann_ivf(sf_dir: str):
    """IVF inverted-file ANN (seeded codebook, deterministic); rows-only —
    recall is approximate by design, verified >= 0.8 vs brute force in
    pytest (test_ivf_ann_recall)."""
    from raylink.ops.similarity import ivf_ann

    return ivf_ann(_emb(sf_dir), query_ids=list(range(10)), k=5,
                   n_centroids=16, n_probe=4)


def q_ann_join(sf_dir: str):
    """Dataset-sized-query ANN (VERDICT r2 item 4): every embedding is a
    query, k nearest via the bucketed candidate join — no broadcast query
    matrix. Rows-only (float hyperplane geometry has no SQL mirror); recall
    >= 0.6 vs brute force at >=10k queries is pytest-verified
    (test_knn_join_recall)."""
    from raylink.ops.similarity import knn_join

    return knn_join(_emb(sf_dir), k=3, n_tables=12, bits=6)


def q_embedding_pairs(sf_dir: str):
    from raylink.ops.similarity import embedding_pairs

    return embedding_pairs(_emb(sf_dir), tau=0.4)


def q_embedding_pairs_lsh(sf_dir: str):
    """Sketch-bucketed cosine near-dup (subquadratic scale path); rows-only —
    recall is probabilistic by design (the sf embeddings top out near cosine
    0.5, where theory gives ~0.8 catch at these parameters); verified >= 0.8
    vs the exact join on clustered vectors in pytest
    (test_embedding_pairs_lsh_recall)."""
    from raylink.ops.similarity import embedding_pairs_lsh

    return embedding_pairs_lsh(_emb(sf_dir), tau=0.4, n_tables=24, bits=6)


# ---------------------------------------------------------------- events ops
def q_events_window(sf_dir: str):
    import ray.data as rd

    from raylink.ops.windows import tumbling_window

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "value"]
    )
    return tumbling_window(ev, size_sec=3600)


def q_event_transitions(sf_dir: str):
    """Clickstream transition matrix: adjacent (from_type, to_type) counts
    over per-user event sequences — one hash(user) shuffle."""
    import ray.data as rd

    from raylink.ops.windows import event_transitions

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    return event_transitions(ev)


def q_embedding_gram(sf_dir: str):
    """Exact int64 Gram matrix of the quantized embedding corpus (upper
    triangle) — the covariance/PCA building block; one streaming pass of
    d x d integer matmul partials."""
    import ray.data as rd

    from raylink.ops.similarity import embedding_gram

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return embedding_gram(emb)


def q_running_total(sf_dir: str):
    """Per-user running cumulative event value in (ts, event_id) order —
    the ledger/balance window primitive; one user-bucket shuffle."""
    import ray.data as rd

    from raylink.ops.windows import running_total

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )
    return running_total(ev)


def q_host_link_locality(sf_dir: str):
    """Per-host intra-site link share over the distinct page edges — the
    site-insularity diagnostic; hosts parsed from URL strings with Arrow
    RE2, one host-cardinality groupby."""
    from raylink.pipelines import host_link_locality

    _, edges, _, _ = page_edge_tables(sf_dir)
    return host_link_locality(edges)


def q_props_stats(sf_dir: str):
    """Log-payload field extraction: the integer ``k`` field of the JSON
    ``props`` column pulled with one vectorized RE2 kernel (no per-row
    JSON parser on the hot path), then per-event-type integer stats —
    the schema-on-read step of every event pipeline. -> (event_type, n,
    sum_k, min_k, max_k)."""
    import pyarrow.compute as pc
    import ray.data as rd

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        st = pc.extract_regex(
            pc.fill_null(batch.column("props").combine_chunks(), ""),
            r'"k":\s*(?P<k>-?\d+)',
        )
        k = pc.cast(
            pc.fill_null(pc.struct_field(st, "k"), "0"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        et = batch.column("event_type").combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nt = len(et.dictionary)
        n = np.bincount(codes, minlength=nt).astype(np.int64)
        s = np.zeros(nt, np.int64)
        np.add.at(s, codes, k)
        mn = np.full(nt, np.iinfo(np.int64).max, np.int64)
        mx = np.full(nt, np.iinfo(np.int64).min, np.int64)
        np.minimum.at(mn, codes, k)
        np.maximum.at(mx, codes, k)
        return pa.table(
            {"event_type": et.dictionary, "n": pa.array(n),
             "sum_k": pa.array(s), "min_k": pa.array(mn),
             "max_k": pa.array(mx)}
        )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "n": batch.column("sum(n)"),
                "sum_k": batch.column("sum(sum_k)"),
                "min_k": batch.column("min(min_k)"),
                "max_k": batch.column("max(max_k)"),
            }
        )

    from ray.data.aggregate import Max, Min, Sum

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n"), Sum("sum_k"), Min("min_k"), Max("max_k"))
        .map_batches(finish, batch_format="pyarrow")
    )


def q_event_anomalies(sf_dir: str):
    """Per-type daily-volume anomaly flags WITHOUT float boundaries: day
    (type, day) counts, then the z > 3 test evaluated in pure integers —
    (n*x - s)^2 > 9*(n*s2 - s^2) is z^2 > 9 cleared of denominators
    (int64-exact while n*x < ~3e9; documented). -> (event_type, day, cnt,
    flagged). The per-type stats table is type-cardinality-bounded
    (take_all + ray.put broadcast, the codebook precedent)."""
    import ray
    import ray.data as rd

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def day_rows(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        day = ts.astype("datetime64[D]").astype(np.int64)
        et = batch.column("event_type").combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        key = codes * np.int64(1 << 32) + day  # batch-local pack
        uk, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                "event_type": et.dictionary.take(pa.array(uk >> np.int64(32))),
                "day": pa.array(uk & np.int64(0xFFFFFFFF)),
                "c": pa.array(c.astype(np.int64)),
            }
        )

    counts = (
        ev.map_batches(day_rows, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .sum("c")
        .materialize()  # consumed by the stats pass and the flag pass
    )

    def stat_partial(batch: pa.Table) -> pa.Table:
        c = batch.column("sum(c)").to_numpy(zero_copy_only=False)
        et = batch.column("event_type").combine_chunks().dictionary_encode()
        codes = et.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nt = len(et.dictionary)
        n = np.bincount(codes, minlength=nt).astype(np.int64)
        s = np.zeros(nt, np.int64)
        s2 = np.zeros(nt, np.int64)
        np.add.at(s, codes, c)
        np.add.at(s2, codes, c * c)
        return pa.table(
            {"event_type": et.dictionary, "n": pa.array(n),
             "s": pa.array(s), "s2": pa.array(s2)}
        )

    stats = (
        counts.map_batches(stat_partial, batch_format="pyarrow")
        .groupby("event_type")
        .sum(["n", "s", "s2"])
        .take_all()  # one row per event type — type-cardinality-bounded
    )
    smap = {
        r["event_type"]: (r["sum(n)"], r["sum(s)"], r["sum(s2)"])
        for r in stats
    }
    sref = ray.put(smap)

    def flag(batch: pa.Table) -> pa.Table:
        sm = ray.get(sref)
        et = batch.column("event_type").to_pylist()
        c = batch.column("sum(c)").to_numpy(zero_copy_only=False)
        n = np.array([sm[t][0] for t in et], np.int64)
        s = np.array([sm[t][1] for t in et], np.int64)
        s2 = np.array([sm[t][2] for t in et], np.int64)
        dev = n * c - s
        fl = (dev * dev > 9 * (n * s2 - s * s)).astype(np.int64)
        return pa.table(
            {"event_type": batch.column("event_type"),
             "day": batch.column("day"), "cnt": pa.array(c),
             "flagged": pa.array(fl)}
        )

    return counts.map_batches(flag, batch_format="pyarrow")


MIX_SEED = 11


def q_mixture_sample(sf_dir: str):
    """Data-mixture downsampling: per-source keep rate
    ((N % 10) + 1) / 10 for source 'srcN', applied as a deterministic
    splitmix64 draw per doc — the corpus-reweighting step before
    training-data packing. -> kept (doc_id, source) rows."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.util import splitmix64

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )

    def keep(batch: pa.Table) -> pa.Table:
        src = batch.column("source").combine_chunks()
        num = pc.cast(
            pc.utf8_slice_codeunits(src, 3, 1 << 30), pa.int64()
        ).to_numpy(zero_copy_only=False)
        rate = (num % 10 + 1) * np.int64(100)  # permille
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        draw = (
            splitmix64(ids.astype(np.uint64) ^ np.uint64(MIX_SEED))
            % np.uint64(1000)
        ).astype(np.int64)
        m = draw < rate
        return pa.table(
            {"doc_id": pa.array(ids[m]), "source": src.filter(pa.array(m))}
        )

    return docs.map_batches(keep, batch_format="pyarrow")


GAP_QS = (0.5, 0.9, 0.99)


def q_gap_quantiles(sf_dir: str):
    """Per-event-type exact p50/p90/p99 of the gap since the same user's
    previous event — the inter-arrival latency profile (session-gap /
    alerting threshold picking)."""
    import ray.data as rd

    from raylink.ops.windows import event_gap_quantiles

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return event_gap_quantiles(ev, qs=GAP_QS)


def q_rolling_actives(sf_dir: str):
    """DAU + 7-day rolling distinct active users per epoch-day — the
    product-analytics WAU pair; distinct-pair expansion, never a sum of
    daily counts (multi-day users would double-count)."""
    import ray.data as rd

    from raylink.ops.windows import rolling_active_users

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    return rolling_active_users(ev, window_days=7)


def q_cohort_retention(sf_dir: str):
    """Day-grain cohort retention matrix over the events table: cohort =
    each user's first active epoch-day; cells count distinct users active
    N days later. One hash(user) shuffle + bounded combine tree."""
    import ray.data as rd

    from raylink.ops.windows import cohort_retention

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return cohort_retention(ev, bucket_us=86_400_000_000)


def q_events_sessionize(sf_dir: str):
    import ray.data as rd

    from raylink.ops.windows import sessionize

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "value"]
    )
    return sessionize(ev, gap_sec=1800)


def q_events_latest(sf_dir: str):
    """Newest event per user (ties by event_id asc) — the crawl-dedup
    keep-latest-capture shape exercised on the events table."""
    import ray.data as rd

    from raylink.ops.select import latest_by_key

    ev = rd.read_parquet(f"{sf_dir}/events.parquet")
    return latest_by_key(ev, key_col="user_id", order_col="ts",
                         id_col="event_id")


def q_events_asof(sf_dir: str):
    """Each click gets the latest prior-or-same-instant view's value for
    its user (classic event-log feature attach): distributed ``asof_join``
    on (user_id, ts), right ties broken by greatest event_id. Left-join
    semantics — clicks with no prior view keep a null ``view_value``.
    Output ts is int64 epoch microseconds (the join's comparison domain)."""
    import ray.data as rd

    from raylink.join import asof_join

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def split(kind: str, rename: str | None):
        def fn(b: pa.Table) -> pa.Table:
            t = b.filter(pa.compute.equal(b.column("event_type"), pa.scalar(kind)))
            cols = {
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "event_id": t.column("event_id"),
                (rename or "value"): t.column("value"),
            }
            return pa.table(cols)

        return fn

    clicks = ev.map_batches(split("click", None), batch_format="pyarrow")
    views = ev.map_batches(split("view", "view_value"), batch_format="pyarrow")
    out = asof_join(
        clicks, views, key="user_id", time="ts",
        left_cols={"event_id": pa.int64(), "value": pa.float64()},
        right_cols={"view_value": pa.float64()},
        tie="event_id",
    )
    return out.sort("event_id")


def q_events_range(sf_dir: str):
    """Every click within two days AFTER a view by the same user (the
    attribution-window shape): distributed ``range_join`` on
    user_id × [view.ts, view.ts + 2d], bucket width = the window width so
    each interval replicates into at most two time buckets. Times are
    int64 epoch micros (the join's comparison domain)."""
    import ray.data as rd

    from raylink.join import range_join

    W = 2 * 24 * 3600 * 1_000_000  # 2 days in epoch micros

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def views(b: pa.Table) -> pa.Table:
        t = b.filter(pa.compute.equal(b.column("event_type"), pa.scalar("view")))
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        ts = ts.astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "lo": pa.array(ts),
                "hi": pa.array(ts + W),
                "view_id": t.column("event_id"),
            }
        )

    def clicks(b: pa.Table) -> pa.Table:
        t = b.filter(pa.compute.equal(b.column("event_type"), pa.scalar("click")))
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "click_id": t.column("event_id"),
                "click_value": t.column("value"),
            }
        )

    out = range_join(
        ev.map_batches(views, batch_format="pyarrow"),
        ev.map_batches(clicks, batch_format="pyarrow"),
        lo="lo", hi="hi", time="ts",
        left_cols={"view_id": pa.int64()},
        right_cols={"click_id": pa.int64(), "click_value": pa.float64()},
        key="user_id", bucket_width=W,
    )
    return out.sort(["view_id", "click_id"])


def q_events_overlap(sf_dir: str):
    """Overlapping one-day activity windows between views and purchases of
    the same user (the exposure-overlap shape): distributed
    ``interval_join`` on user_id x [ts, ts + 1d] for both sides. Times are
    int64 epoch micros."""
    import ray.data as rd

    from raylink.join import interval_join

    W = 24 * 3600 * 1_000_000  # 1 day in epoch micros

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def windows(kind: str, lo: str, hi: str, idc: str):
        def fn(b: pa.Table) -> pa.Table:
            t = b.filter(pa.compute.equal(b.column("event_type"), pa.scalar(kind)))
            ts = t.column("ts").to_numpy(zero_copy_only=False)
            ts = ts.astype("datetime64[us]").astype(np.int64)
            return pa.table(
                {
                    "user_id": t.column("user_id"),
                    lo: pa.array(ts),
                    hi: pa.array(ts + W),
                    idc: t.column("event_id"),
                }
            )

        return fn

    out = interval_join(
        ev.map_batches(windows("view", "v_lo", "v_hi", "view_id"),
                       batch_format="pyarrow"),
        ev.map_batches(windows("purchase", "p_lo", "p_hi", "purchase_id"),
                       batch_format="pyarrow"),
        left_bounds=("v_lo", "v_hi"), right_bounds=("p_lo", "p_hi"),
        left_cols={"view_id": pa.int64()},
        right_cols={"purchase_id": pa.int64()},
        key="user_id", bucket_width=W,
    )
    return out.sort(["view_id", "purchase_id"])


def q_repeated_substrings(sf_dir: str):
    """Cross-document exact repeated 40-byte substrings at content-defined
    anchors (byte % 16 == 0 — spaces among others): the exact-substring
    dedup signal. Groups key on the window bytes themselves (no hash
    verify pass); counts are final in one shuffle."""
    import ray.data as rd

    from raylink.ops.dedup import repeated_substrings

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return repeated_substrings(
        docs, window=40, modulus=16, residue=0, min_docs=2
    ).sort("window")


def q_substring_pairs(sf_dir: str):
    """Near-duplicate candidate doc pairs sharing >= 3 distinct repeated
    40-byte windows (exact-substring sibling of dedup_ngram), with the
    max_df=64 hot-window cut."""
    import ray.data as rd

    from raylink.ops.dedup import substring_pairs

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return substring_pairs(
        docs, window=40, modulus=16, residue=0, min_shared=3, max_df=64
    ).sort(["doc_a", "doc_b"])


def q_funnel(sf_dir: str):
    """Three-stage attribution funnel: view -> click within 2 days ->
    purchase within 2 days of the click, same user throughout; per-user
    count of complete chains. Pure composition: two ``range_join`` passes
    then one bucketed per-user sum — each stage is the events_range
    shape, no new machinery."""
    import ray.data as rd

    from raylink.join import bucketed_sum, range_join

    W = 2 * 24 * 3600 * 1_000_000

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def stage(kind: str, idc: str):
        def fn(b: pa.Table) -> pa.Table:
            t = b.filter(pa.compute.equal(b.column("event_type"), pa.scalar(kind)))
            ts = t.column("ts").to_numpy(zero_copy_only=False)
            ts = ts.astype("datetime64[us]").astype(np.int64)
            return pa.table(
                {"user_id": t.column("user_id"), "ts_pt": pa.array(ts),
                 idc: t.column("event_id")}
            )

        return fn

    def widen(ds, idcs):
        # point rows -> [t, t+W] interval rows, carrying the chain ids
        def fn(b: pa.Table) -> pa.Table:
            t = b.column("ts_pt").to_numpy(zero_copy_only=False).astype(np.int64)
            cols = {"user_id": b.column("user_id"),
                    "lo": pa.array(t), "hi": pa.array(t + W)}
            for c in idcs:
                cols[c] = b.column(c)
            return pa.table(cols)

        return ds.map_batches(fn, batch_format="pyarrow")

    views = ev.map_batches(stage("view", "view_id"), batch_format="pyarrow")
    clicks = ev.map_batches(stage("click", "click_id"), batch_format="pyarrow")
    purchases = ev.map_batches(stage("purchase", "purchase_id"),
                               batch_format="pyarrow")

    vc = range_join(
        widen(views, ["view_id"]), clicks,
        lo="lo", hi="hi", time="ts_pt",
        left_cols={"view_id": pa.int64()},
        right_cols={"click_id": pa.int64()},
        key="user_id", bucket_width=W,
    )

    def vc_points(b: pa.Table) -> pa.Table:
        # the matched click time becomes the next stage's interval start
        return pa.table(
            {"user_id": b.column("user_id"), "ts_pt": b.column("ts_pt"),
             "view_id": b.column("view_id"), "click_id": b.column("click_id")}
        )

    chains = range_join(
        widen(vc.map_batches(vc_points, batch_format="pyarrow"),
              ["view_id", "click_id"]),
        purchases,
        lo="lo", hi="hi", time="ts_pt",
        left_cols={"view_id": pa.int64(), "click_id": pa.int64()},
        right_cols={"purchase_id": pa.int64()},
        key="user_id", bucket_width=W,
    )
    ones = chains.map_batches(
        lambda b: pa.table(
            {"user_id": b.column("user_id"),
             "one": pa.array(np.ones(b.num_rows, dtype=np.int64))}
        ),
        batch_format="pyarrow",
    )
    return bucketed_sum(ones, "user_id", "one", out_val="n_chains").sort(
        "user_id"
    )


def q_doc_sample(sf_dir: str):
    """Deterministic stratified Bernoulli sample of the documents table:
    50% of English docs, 20% of everything else, seed 7 — the keep
    decision is splitmix64(doc_id ^ seed) < fraction * 2^64, mirrored
    bit-for-bit in SQL."""
    import ray.data as rd

    from raylink.ops.select import stratified_sample

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "source", "n_chars"],
    )
    return stratified_sample(
        docs, "doc_id", 0.2, seed=7, by="lang", fractions={"en": 0.5}
    ).sort("doc_id")


def q_source_topk(sf_dir: str):
    """Top-3 documents per source by length (ties by doc_id asc) with a
    1-based ``rk`` — per-batch local top-k before the one coarse-bucket
    shuffle (``ops.select.group_topk``)."""
    import ray.data as rd

    from raylink.ops.select import group_topk

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    return group_topk(docs, "source", "n_chars", k=3, id_col="doc_id").sort(
        ["source", "rk"]
    )


def q_doc_top_terms(sf_dir: str):
    """Top-3 distinctive terms per document by tf/df (log-free idf — see
    ops.textstats.doc_top_terms), rank-ordered."""
    from raylink.ops.textstats import doc_top_terms

    return doc_top_terms(_docs(sf_dir), k=3).sort(["doc_id", "rk"])


def q_source_sample(sf_dir: str):
    """Exactly 5 uniformly-chosen docs per source (seed 11) via the
    hash-permutation top-k composition (ops.select.sample_k_per_group)."""
    import ray.data as rd

    from raylink.ops.select import sample_k_per_group

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    )
    return sample_k_per_group(docs, "source", "doc_id", k=5, seed=11).sort(
        ["source", "rk"]
    )


def q_length_quantiles(sf_dir: str):
    """Per-language document-length quantiles (p25/p50/p75/p95 of n_chars)
    via the exact distributed histogram (ops.select.group_quantiles) —
    the curation-threshold-picking query."""
    import ray.data as rd

    from raylink.ops.select import group_quantiles

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"]
    )
    return group_quantiles(docs, "lang", "n_chars", [0.25, 0.5, 0.75, 0.95]).sort(
        ["lang", "q"]
    )


# ------------------------------------------------------------ multimodal stub
def q_media_dedup(sf_dir: str):
    """Exact media dedup on raw payload bytes over the documents-derived
    RLNK corpus — identical blob <=> identical text, so the oracle dedups
    by the text string; content addressing before any decode."""
    from raylink.ops.multimodal import media_dedup, media_from_documents

    return media_dedup(media_from_documents(_docs(sf_dir)))


def _flatten_media_features(batch: pa.Table) -> pa.Table:
    """features: list<float64>[8] -> f0..f7 scalar columns, ROUND-pinned;
    zero-copy list flatten -> reshape (VERDICT r4 item 5), no per-row
    Python materialization."""
    n = batch.num_rows
    if n:
        f = batch.column("features")
        if isinstance(f, pa.ChunkedArray):
            f = f.combine_chunks()
        m = (
            f.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(n, 8)
        )
    else:
        m = np.zeros((0, 8))
    cols = {
        "media_id": batch.column("media_id"),
        "width": batch.column("width"),
        "height": batch.column("height"),
        "n_bytes": batch.column("n_bytes"),
    }
    for k in range(8):
        cols[f"f{k}"] = pa.array(round_half_away(m[:, k], 6))
    return pa.table(cols)


def q_media_features(sf_dir: str):
    """Decode features over a deterministic media corpus derived from the
    documents table (text bytes wrapped as RLNKIMG1 blobs) — the byte
    histogram is recomputed by the SQL oracle, so this is hash-exact. The
    PRNG synth_media plumbing path stays covered in pytest."""
    from raylink.ops.multimodal import media_features, media_from_documents

    feats = media_features(
        media_from_documents(_docs(sf_dir)), batch_size=64, concurrency=2
    )
    return feats.map_batches(_flatten_media_features, batch_format="pyarrow")


def q_media_bmp_features(sf_dir: str):
    """Decode features over REAL image files: each document's text bytes
    encoded as a genuine 8-bit grayscale BMP (identity palette, padded
    bottom-up row — any image viewer opens these), decoded by the
    pure-numpy BMP parser in DecodeMedia's real-codec chain. Same byte
    histogram as q_media_features, so the same SQL oracle applies —
    the previously-unexecuted non-RLNK decode path, oracle-gated
    (VERDICT r4 item 4)."""
    from raylink.ops.multimodal import media_bmp_from_documents, media_features

    feats = media_features(
        media_bmp_from_documents(_docs(sf_dir)), batch_size=64, concurrency=2
    )
    return feats.map_batches(_flatten_media_features, batch_format="pyarrow")


def q_media_resize(sf_dir: str):
    """Nearest-neighbour resize of the document-derived media corpus to 8x8;
    the resized PAYLOAD (pure ASCII — sampled text bytes) is md5-
    fingerprinted so the SQL oracle can reconstruct it byte-for-byte
    (media_resize_sql); numpy oracle for the resample itself in pytest
    (test_media_resize)."""
    import hashlib

    from raylink.ops.multimodal import media_from_documents, resize_media

    resized = resize_media(media_from_documents(_docs(sf_dir)), out_w=8, out_h=8,
                           concurrency=2)

    def fp(batch: pa.Table) -> pa.Table:
        md5s = [
            hashlib.md5(bytes(b)[12:]).hexdigest()  # payload only (ASCII)
            for b in batch.column("media").to_pylist()
        ]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "width": batch.column("width"),
                "height": batch.column("height"),
                "fp_md5": pa.array(md5s, type=pa.string()),
            }
        )

    return resized.map_batches(fp, batch_format="pyarrow")


def q_media_frames(sf_dir: str):
    """Frame sampling over 'video'-shaped blobs (docs text bytes chunked as
    16x4 frames), every 2nd frame; rows-only, pytest oracle
    (test_frame_sampler)."""
    from raylink.ops.multimodal import sample_frames, media_from_documents
    import struct as _struct

    media = media_from_documents(_docs(sf_dir))

    def as_video(batch: pa.Table) -> pa.Table:
        # reinterpret each blob's payload as 16x4-byte frames
        blobs = []
        for b in batch.column("media").to_pylist():
            b = bytes(b)
            blobs.append(b[:8] + _struct.pack("<HH", 16, 4) + b[12:])
        return pa.table(
            {"media_id": batch.column("media_id"),
             "media": pa.array(blobs, type=pa.binary())}
        )

    frames = sample_frames(media.map_batches(as_video, batch_format="pyarrow"),
                           every=2, concurrency=2)
    return frames.map_batches(
        lambda b: pa.table({"media_id": b.column("media_id"),
                            "frame_idx": b.column("frame_idx")}),
        batch_format="pyarrow",
    )


def q_sssp_weighted(sf_dir: str):
    """Weighted Dijkstra (edge weight = deterministic function of endpoints);
    rows-only check, oracle-tested in pytest (test_weighted_sssp)."""
    import ray.data as rd

    from raylink.algos import sssp
    from raylink.graph import build_graph
    from raylink.pipelines import page_edge_tables

    _, edges, verts, _ = page_edge_tables(sf_dir)

    def add_w(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        w = 1.0 + (s * 7 + d * 13) % 5
        return batch.append_column("weight", pa.array(w.astype(np.float64)))

    eds = edges.map_batches(add_w, batch_format="pyarrow").materialize()
    g = build_graph(eds, verts, num_parts=P, partitioner="mod", directed=False, weighted=True)
    _, dists = sssp(
        g=g, source=0, weighted=True, engine="tasks",
        ckpt_dir=_ckpt("sssp_w", sf_dir, 0),
    )
    return dists


def q_coreness(sf_dir: str):
    """Full core decomposition, backed by the single-pass Montresor engine —
    the scale path (iterated peeling runs one BSP job per k; Montresor is
    one job total and stays the pytest oracle's comparison target)."""
    from raylink.algos import coreness_montresor

    g = page_graph(sf_dir, directed=False)
    _, cores = coreness_montresor(
        g=g, engine="tasks", ckpt_dir=_ckpt("coreness_q", sf_dir)
    )
    return cores


def q_subgraph_rank(sf_dir: str):
    """Block-PageRank warm start (reference SubgraphRank); converges to the
    PageRank fixpoint, so the oracle is the deep-unrolled PR SQL compared at
    r6 (tolerance argument in oracles_sql.subgraph_rank_sql). eps=1e-10
    puts the engine within ~1e-9 of the fixpoint."""
    from raylink.algos import subgraph_rank

    g = page_graph(sf_dir, directed=True)
    # eps=1e-12: ~7e-12 of the fixpoint at halt — together with the
    # 120-iteration oracle this makes an r6 rounding-boundary hit
    # (observed once at sf0.1 with eps=1e-10/T=60) vanishingly unlikely
    _, ranks = subgraph_rank(
        g=g, eps=1e-12, engine="tasks", ckpt_dir=_ckpt("sgrank12", sf_dir)
    )

    def rnd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "rank": pa.array(
                    round_half_away(batch.column("rank").to_numpy(zero_copy_only=False), 6)
                ),
            }
        )

    return ranks.map_batches(rnd, batch_format="pyarrow")


def q_incremental_pagerank(sf_dir: str):
    """Recrawl-incremental PageRank: rank snapshot A (the full graph minus
    the ~2% of edges with (src+dst) % 50 == 0 — a realistic recrawl delta),
    persist those ranks as a vertex value on the full graph, warm-start PR
    from them (``init_ranks``). Same fixpoint as a cold run — the oracle is
    the deep-unrolled PR fixpoint at r6 (subgraph_rank_sql's tolerance
    argument) — in fewer supersteps (asserted in pytest; a warm start only
    pays off when the snapshots are CLOSE — seeding from a structurally
    different graph converges slower than cold, which the test also
    documents)."""
    import ray.data as rd

    from raylink import storage
    from raylink.algos import pagerank
    from raylink.graph import LinkGraph, build_graph
    from raylink.pipelines import GRAPH_ROOT

    _, edges, verts, _ = page_edge_tables(sf_dir)
    edges = edges.materialize()

    def drop_delta(b: pa.Table) -> pa.Table:
        s = b.column("src").to_numpy(zero_copy_only=False)
        d = b.column("dst").to_numpy(zero_copy_only=False)
        return b.filter(pa.array((s + d) % 50 != 0))

    prev = edges.map_batches(drop_delta, batch_format="pyarrow")
    g_a = build_graph(prev, verts, num_parts=8, partitioner="mod", directed=True)
    _, ranks_a = pagerank(
        g=g_a, eps=1e-8, engine="tasks", ckpt_dir=_ckpt("incpr_a", sf_dir)
    )
    verts_b = ranks_a.map_batches(
        lambda b: pa.table({"vid": b.column("vid"), "rank0": b.column("rank")}),
        batch_format="pyarrow",
    )
    gdir = storage.join(GRAPH_ROOT, cache_key("incpr_graph", sf_dir))
    if storage.exists(storage.join(gdir, "manifest.json")):
        g_b = LinkGraph.load(gdir)
    else:
        g_b = build_graph(
            edges, verts_b, num_parts=8, partitioner="mod", directed=True,
            vertex_cols=["rank0"], graph_dir=gdir,
        )
    _, ranks = pagerank(
        g=g_b, eps=1e-12, engine="tasks", init_ranks="rank0",
        ckpt_dir=_ckpt("incpr_b", sf_dir),
    )

    def rnd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "rank": pa.array(
                    round_half_away(
                        batch.column("rank").to_numpy(zero_copy_only=False), 6
                    )
                ),
            }
        )

    return ranks.map_batches(rnd, batch_format="pyarrow")


def q_recrawl_round(sf_dir: str):
    """The weekly recrawl operation, composed end-to-end (VERDICT r4 item
    9): crawl diff -> partition-pruned graph update -> warm-start PageRank
    — the four incremental paths proving they compose, not just pass alone.

    Captures: A (old crawl) = out-links of even-src pages; B (new crawl) =
    out-links of src % 3 != 0 pages (q_crawl_diff's deterministic snapshot
    membership). Steps:
      1. rank capture A (the previous week's ranks),
      2. rebuild A's graph with those ranks persisted as vertex value
         ``rank0`` (the warm-start column),
      3. ``diff_edges(A, B)`` -> added/removed, fed to
         ``apply_edge_updates`` (only touched partitions rebuild),
      4. PageRank on the updated graph, ``init_ranks="rank0"``, eps=1e-12
         (same fixpoint as cold — unique contraction fixpoint — reached
         from the warm trajectory),
      5. per-page diff counts (added_out/removed_out packed into one
         int64 value -> ONE bucketed_sum shuffle, zero-completed over all
         vids) attached to the ranks.
    Oracle: recrawl_round_sql — deep-unrolled PR (T=120, the
    subgraph_rank_sql tolerance argument) over capture B's edges + EXCEPT
    diff counts. -> (vid, rank r6, added_out, removed_out)."""
    import pyarrow.compute as pc

    from raylink.algos import pagerank
    from raylink.graph import apply_edge_updates, build_graph
    from raylink.join import attach_lookup, bucketed_sum
    from raylink.pipelines import diff_edges

    _, edges, verts, _ = page_edge_tables(sf_dir)
    edges = edges.materialize()

    def cap(is_b: bool):
        def fn(batch: pa.Table) -> pa.Table:
            s = batch.column("src").to_numpy(zero_copy_only=False)
            m = (s % 3) != 0 if is_b else (s % 2) == 0
            return batch.filter(pa.array(m))

        return fn

    cap_a = edges.map_batches(cap(False), batch_format="pyarrow").materialize()
    cap_b = edges.map_batches(cap(True), batch_format="pyarrow").materialize()

    # 1. last week's ranks
    g_a = build_graph(cap_a, verts, num_parts=8, partitioner="hash",
                      directed=True)
    _, ranks_a = pagerank(g=g_a, eps=1e-8, engine="tasks",
                          ckpt_dir=_ckpt("recrawl_a", sf_dir))
    verts_warm = ranks_a.map_batches(
        lambda b: pa.table({"vid": b.column("vid"), "rank0": b.column("rank")}),
        batch_format="pyarrow",
    )
    # 2. old graph with the warm column persisted
    g_warm = build_graph(cap_a, verts_warm, num_parts=8, partitioner="hash",
                         directed=True, vertex_cols=["rank0"])

    # 3. diff -> incremental update (only touched partitions rebuild)
    diff = diff_edges(cap_a, cap_b).materialize()

    def only(change: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.equal(batch.column("change"), change)
            ).select(["src", "dst"])

        return fn

    adds = diff.map_batches(only("added"), batch_format="pyarrow")
    dels = diff.map_batches(only("removed"), batch_format="pyarrow")
    g_b = apply_edge_updates(g_warm, adds=adds, dels=dels)

    # 4. warm-start PR on the updated graph
    _, ranks = pagerank(g=g_b, eps=1e-12, engine="tasks",
                        init_ranks="rank0", ckpt_dir=_ckpt("recrawl_b", sf_dir))

    # 5. per-src diff counts: added in the high 32 bits, removed in the low
    # (each bounded by max outdegree << 2^31) -> one shuffle for both
    def diff_counts(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        is_add = pc.equal(batch.column("change"), "added").to_numpy(
            zero_copy_only=False
        )
        v = np.where(is_add, np.int64(1) << np.int64(32), np.int64(1))
        return pa.table({"v": pa.array(s), "c": pa.array(v)})

    def zero_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"v": batch.column("vid"),
             "c": pa.array(np.zeros(batch.num_rows, dtype=np.int64))}
        )

    stacked = diff.map_batches(diff_counts, batch_format="pyarrow").union(
        ranks.map_batches(zero_rows, batch_format="pyarrow")
    )
    counts = bucketed_sum(stacked, key="v", val="c", out_val="packed")

    def unpack(batch: pa.Table) -> pa.Table:
        p = batch.column("packed").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": batch.column("v"),
                "added_out": pa.array(p >> np.int64(32)),
                "removed_out": pa.array(p & np.int64(0xFFFFFFFF)),
            }
        )

    counts = counts.map_batches(unpack, batch_format="pyarrow")

    rank_r6 = ranks.map_batches(
        lambda b: pa.table(
            {
                "vid": b.column("vid"),
                "rank": pa.array(
                    round_half_away(
                        b.column("rank").to_numpy(zero_copy_only=False), 6
                    )
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return attach_lookup(
        counts, rank_r6, on="vid",
        left_cols={"added_out": pa.int64(), "removed_out": pa.int64()},
        value_cols={"rank": pa.float64()}, n_lookup_rows=rank_r6.count(),
    )


def q_spanning_forest(sf_dir: str):
    """Per-component BFS spanning forest; rows-only, invariant-tested in
    pytest (test_spanning_forest)."""
    from raylink.algos import spanning_forest

    g = page_graph(sf_dir, directed=False)
    _, forest = spanning_forest(g=g, ckpt_dir=_ckpt("forest", sf_dir))
    return forest


def q_coreness_montresor(sf_dir: str):
    """Single-pass Montresor core decomposition; rows-only, pytest oracle
    (test_coreness_montresor, equal to iterated peeling)."""
    from raylink.algos import coreness_montresor

    g = page_graph(sf_dir, directed=False)
    _, cores = coreness_montresor(
        g=g, engine="tasks", ckpt_dir=_ckpt("coreness_m", sf_dir)
    )
    return cores


def q_meta_diameter(sf_dir: str):
    """Meta-graph BFS eccentricity (reference GraphStats diameter probing);
    rows-only (single row)."""
    from raylink.graph import meta_diameter

    g = page_graph(sf_dir, directed=False)
    return pa.table({"meta_diameter": pa.array([meta_diameter(g)], type=pa.int64())})


def q_graph_kmeans(sf_dir: str):
    """GPS-style k-means graph clustering (k=6, 2 iterations, deterministic
    seeds); rows-only, invariants + crossing oracle in pytest."""
    from raylink.algos import graph_kmeans
    from raylink.pipelines import distinct_edges

    g = page_graph(sf_dir, directed=False)
    _, edges, _, _ = page_edge_tables(sf_dir)
    labels, _ = graph_kmeans(
        distinct_edges(edges).materialize(), g=g, k=6, max_iterations=2,
        ckpt_root=_ckpt("kmeans", sf_dir),
    )
    return labels


def q_cooccur_pagerank(sf_dir: str):
    """Graph-from-relational-data: parts co-occurring in an order form an
    edge; PageRank (10 fixed rounds, r8) over that graph. Demonstrates
    deriving the link graph from warehouse tables instead of crawl HTML."""
    import ray.data as rd

    from raylink.algos import pagerank
    from raylink.graph import build_graph
    from raylink.pipelines import distinct_edges
    from raylink.util import splitmix64

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def bucketize(batch: pa.Table) -> pa.Table:
        ok = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "b",
            pa.array((splitmix64(ok.astype(np.uint64)) % np.uint64(64)).astype(np.int32)),
        )

    def pairs(group: pa.Table) -> pa.Table:
        # coarse bucket serves many orders; per-order pair generation
        ok = group.column("l_orderkey").to_numpy(zero_copy_only=False)
        pk = group.column("l_partkey").to_numpy(zero_copy_only=False)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        ends = np.r_[starts[1:], len(ok)]
        srcs, dsts = [], []
        for st, en in zip(starts, ends):
            ps = np.unique(pk[st:en])
            if len(ps) < 2:
                continue
            ii, jj = np.triu_indices(len(ps), k=1)
            srcs.append(np.concatenate([ps[ii], ps[jj]]))
            dsts.append(np.concatenate([ps[jj], ps[ii]]))
        if not srcs:
            return pa.table({"src": pa.array([], type=pa.int64()),
                             "dst": pa.array([], type=pa.int64())})
        return pa.table(
            {"src": pa.array(np.concatenate(srcs)), "dst": pa.array(np.concatenate(dsts))}
        )

    edges = distinct_edges(
        li.map_batches(bucketize, batch_format="pyarrow")
        .groupby("b")
        .map_groups(pairs, batch_format="pyarrow")
    ).materialize()
    parts_tbl = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    verts = parts_tbl.map_batches(
        lambda b: pa.table({"vid": b.column("p_partkey")}), batch_format="pyarrow"
    )
    g = build_graph(
        edges, verts, num_parts=P, partitioner="mod", directed=True,
        graph_dir=None,
    )
    _, ranks = pagerank(g=g, iters=10, engine="tasks",
                        ckpt_dir=_ckpt("cooccur_pr", sf_dir))

    def rnd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "rank": pa.array(
                    round_half_away(batch.column("rank").to_numpy(zero_copy_only=False), 8)
                ),
            }
        )

    return ranks.map_batches(rnd, batch_format="pyarrow")


def q_hits(sf_dir: str):
    """HITS hubs/authorities (8 iterations, L1-normalized) over the page
    link graph. Runs on a flag-tagged UNION graph (forward+reverse edges in
    one CSR, per-edge flag via edge_cols) so the hub pull is a plain BSP
    push — see raylink/algos/hits.py."""
    from raylink.algos.hits import hits, union_flag_edges
    from raylink.graph import build_graph
    from raylink.pipelines import page_edge_tables

    _, edges, verts, _ = page_edge_tables(sf_dir)
    g = build_graph(
        union_flag_edges(edges.materialize()), verts, num_parts=P,
        partitioner="mod", directed=True, edge_cols=["flag"],
    )
    _, scores = hits(g=g, iters=HITS_ITERS, engine="tasks",
                     ckpt_dir=_ckpt("hits", sf_dir, HITS_ITERS))

    def rnd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "auth": pa.array(round_half_away(
                    batch.column("auth").to_numpy(zero_copy_only=False), 8)),
                "hub": pa.array(round_half_away(
                    batch.column("hub").to_numpy(zero_copy_only=False), 8)),
            }
        )

    return scores.map_batches(rnd, batch_format="pyarrow")


def q_order_priority(sf_dir: str):
    """TPC-H Q4 shape: orders in a quarter having at least one discounted
    line item — the EXISTS predicate as a distributed hash SEMI-join
    (lineitem is dataset-sized: no broadcast), with per-priority counting
    fused into the join tasks (post hook -> per-bucket partials -> one
    5-row groupby)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import semi_join

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_discount"]
    ).map_batches(
        lambda b: pa.table(
            {"o_orderkey": b.filter(pc.greater(b.column("l_discount"), 0.05))
             .column("l_orderkey")}
        ),
        batch_format="pyarrow",
    )
    d0 = pa.scalar(np.datetime64("1996-01-01", "us").item(), type=pa.timestamp("us"))
    d1 = pa.scalar(np.datetime64("1996-04-01", "us").item(), type=pa.timestamp("us"))
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
    ).map_batches(
        lambda b: b.filter(
            pc.and_(pc.greater_equal(b.column("o_orderdate"), d0),
                    pc.less(b.column("o_orderdate"), d1))
        ).select(["o_orderkey", "o_orderpriority"]),
        batch_format="pyarrow",
    )

    def cnt(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t.column("o_orderpriority").combine_chunks())
        return pa.table(
            {"o_orderpriority": vc.field("values"),
             "order_count": pc.cast(vc.field("counts"), pa.int64())}
        )

    partials = semi_join(
        orders, li, on="o_orderkey",
        left_cols={"o_orderpriority": pa.string()}, post=cnt,
    )
    out = partials.groupby("o_orderpriority").sum("order_count")
    return out.map_batches(
        lambda b: pa.table(
            {"o_orderpriority": b.column("o_orderpriority"),
             "order_count": b.column("sum(order_count)")}
        ),
        batch_format="pyarrow",
    )


def q_customers_no_urgent(sf_dir: str):
    """NOT EXISTS as a distributed hash ANTI-join: customers who never
    placed a 1-URGENT order. Orders is the big side — keys bucket-shuffle,
    nothing on the driver."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import anti_join

    urgent = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).map_batches(
        lambda b: pa.table(
            {"c_custkey": b.filter(
                pc.equal(b.column("o_orderpriority"), pa.scalar("1-URGENT"))
            ).column("o_custkey")}
        ),
        batch_format="pyarrow",
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_acctbal"]
    )
    return anti_join(
        cust, urgent, on="c_custkey",
        left_cols={"c_name": pa.string(), "c_acctbal": pa.float64()},
    )


def q_doc_repetition(sf_dir: str):
    """Gopher-style repetition signals per doc (top-word / dup-char /
    top-bigram fractions) — a streaming map-only stage, no shuffle."""
    from raylink.ops.textstats import repetition_stats

    return _docs(sf_dir).map_batches(
        repetition_stats, batch_format="pyarrow", batch_size=512
    )


PACK_BUDGET = 4096


def q_pack_windows(sf_dir: str):
    """Training-sequence packing: assign each doc to the 4096-token shard
    its exclusive running token total (doc_id order) starts in. Exercises
    the distributed ordered prefix sum (range-bucket histogram + per-bucket
    scan — the driver holds O(buckets))."""
    from raylink.ops.select import pack_windows
    from raylink.ops.textstats import TextStats

    toks = _docs(sf_dir).map_batches(
        TextStats, batch_format="pyarrow", batch_size=512, concurrency=(1, 2)
    ).select_columns(["doc_id", "n_tokens"])
    return pack_windows(toks, "doc_id", "n_tokens", budget=PACK_BUDGET)


def q_link_prediction(sf_dir: str):
    """Common-neighbour link prediction: the top-50 NON-adjacent page pairs
    by shared-neighbour count on the undirected page graph (integer-exact
    score; deterministic (common DESC, src, dst) order). Wedge dataflow
    shared with four_cycles + distributed anti-join against the edge set +
    distributed sort/limit — the driver holds only the 50 result rows."""
    from raylink.algos.triangles import link_prediction

    _, edges, _, _ = page_edge_tables(sf_dir)
    return link_prediction(edges, k=50)


def q_resource_alloc(sf_dir: str):
    """Resource-Allocation link prediction: top-50 non-adjacent page pairs
    by sum over common neighbours z of RA_SCALE // deg(z) — the
    degree-weighted sibling of ``link_prediction``, integer-exact in fixed
    point (no libm logs)."""
    from raylink.algos.triangles import resource_allocation

    _, edges, _, _ = page_edge_tables(sf_dir)
    return resource_allocation(edges, k=50)


def q_rich_club(sf_dir: str):
    """Rich-club coefficient curve phi(k) over the undirected page graph —
    elite-core connectivity (link-farm diagnostic); O(max_deg) histogram
    survival functions, one pair_attach for edge min-degrees."""
    from raylink.pipelines import rich_club_curve

    _, edges, _, _ = page_edge_tables(sf_dir)
    return rich_club_curve(edges)


def q_link_pred_eval(sf_dir: str):
    """Held-out evaluation of the common-neighbour link predictor:
    deterministic 1-in-5 edge holdout, top-100 predictions on the train
    graph, precision against the held-out edges."""
    from raylink.algos.triangles import link_prediction_eval

    _, edges, _, _ = page_edge_tables(sf_dir)
    return link_prediction_eval(edges, k=100, holdout_mod=5)


def q_recommend_topk(sf_dir: str):
    """Per-page top-3 link recommendations by common neighbours — the
    recsys sibling of link_prediction (per-vertex lists instead of one
    global top-k)."""
    from raylink.algos.triangles import recommend_topk

    _, edges, _, _ = page_edge_tables(sf_dir)
    return recommend_topk(edges, k=3)


def q_mirrors(sf_dir: str):
    """Mirror/alias detection over a deterministically planted edge set
    (the pii_scan precedent — the closed-form synthetic graph has no
    natural mirrors): every source s with s % 10 == 6 has its outlink set
    copied to s+1, and (s+1)'s own edges dropped ((s+1) % 10 == 7), so
    each such (s, s+1) is a planted mirror pair. ``mirror_groups`` then
    groups pages whose DISTINCT outlink sets are identical. Output
    (vid, mirror_rep, n_mirrors), groups of >= 2 only."""
    from raylink.pipelines import mirror_groups

    _, edges, _, _ = page_edge_tables(sf_dir)

    def plant(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s % 10 != 7
        copy = s % 10 == 6
        return pa.table(
            {
                "src": pa.array(np.concatenate([s[keep], s[copy] + 1])),
                "dst": pa.array(np.concatenate([d[keep], d[copy]])),
            }
        )

    return mirror_groups(edges.map_batches(plant, batch_format="pyarrow"))


BOILER_MIN_DOCS = 20


def q_boilerplate(sf_dir: str):
    """CCNet-style boilerplate-line removal over a deterministically
    line-structured corpus (the documents table has no newlines, so lines
    are planted — the pii_scan precedent): even doc_ids get a shared promo
    header line 'promo variant <doc_id % 3>', and every doc's body splits
    into its first-8-words line plus the remainder line.
    ``remove_boilerplate(min_docs=20)`` then drops every line shared by
    >= 20 distinct docs (the three promo variants; an incidentally shared
    body line would be dropped identically by engine and oracle). Output
    (doc_id, clean_text, n_removed, n_lines)."""
    from raylink.ops.textstats import remove_boilerplate

    return remove_boilerplate(_planted_lines(sf_dir), min_docs=BOILER_MIN_DOCS)


def _planted_lines(sf_dir: str):
    """The documents table with deterministic line structure planted (the
    corpus has no newlines): even doc_ids get a shared 'promo variant
    <doc_id % 3>' header line; every body splits into its first-8-words
    line plus the remainder line. Shared by the line-level ops
    (q_boilerplate, q_line_dedup) and mirrored in their SQL oracles."""
    import pyarrow.compute as pc

    def plant(batch: pa.Table) -> pa.Table:
        text = (
            pc.fill_null(batch.column("text"), "")
            .combine_chunks()
            .cast(pa.large_string())
        )
        ws = pc.split_pattern(text, " ")
        sp = pa.scalar(" ", type=pa.large_string())
        head = pc.binary_join(pc.list_slice(ws, 0, 8), sp)
        tail = pc.binary_join(pc.list_slice(ws, 8), sp)
        body = pc.binary_join_element_wise(
            head, tail, pa.scalar("\n", type=pa.large_string())
        )
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        variants = np.array(
            ["promo variant 0\n", "promo variant 1\n", "promo variant 2\n"],
            dtype=object,
        )
        promo = pa.array(
            np.where(did % 2 == 0, variants[did % 3], ""),
            type=pa.large_string(),
        )
        t2 = pc.binary_join_element_wise(
            promo, body, pa.scalar("", type=pa.large_string())
        )
        return pa.table({"doc_id": batch.column("doc_id"), "text": t2})

    return _docs(sf_dir).map_batches(plant, batch_format="pyarrow")


def q_line_dedup(sf_dir: str):
    """Global first-occurrence line dedup (RefinedWeb/C4-style) over the
    planted line corpus: every line survives only at its minimal
    (doc_id, position) occurrence corpus-wide
    (ops/textstats.dedup_lines). -> (doc_id, clean_text, n_removed,
    n_lines)."""
    from raylink.ops.textstats import dedup_lines

    return dedup_lines(_planted_lines(sf_dir))


def q_cms_topk(sf_dir: str):
    """Count-min-sketch word-frequency estimation: exact top-50 tokens with
    their CMS estimates (register table built distributed, bounded by the
    sketch size; est >= cnt one-sided error surfaced as a column)."""
    from raylink.ops.sketch import cms_word_topk

    return cms_word_topk(_docs(sf_dir), k=50)


EGO_SEEDS = [17, 123]


def q_egonet(sf_dir: str):
    """2-hop ego-net extraction: the induced canonical edges of the 2-hop
    undirected neighbourhood of seeds {17, 123} — k rounds of distributed
    semi-join frontier expansion, nothing driver-side."""
    from raylink.pipelines import khop_egonet

    _, edges, _, _ = page_edge_tables(sf_dir)
    return khop_egonet(edges, EGO_SEEDS, k=2)


def q_mis(sf_dir: str):
    """Deterministic maximal independent set (Luby with splitmix64
    priorities) over the undirected page graph -> (vid, mis_round)."""
    from raylink.algos.mis import maximal_independent_set

    _, edges, _, _ = page_edge_tables(sf_dir)
    return maximal_independent_set(edges, seed=0)


def q_modularity(sf_dir: str):
    """Per-community modularity contributions of the LPA communities —
    the standard partition-quality metric q_i = E_i/E - (d_i/2E)^2 (Q =
    sum q_i): one resume of the SAME community_lpa checkpoint
    q_communities runs, then label attach on both edge endpoints
    (thresholded broadcast/hash), integer internal-edge and degree-sum
    aggregates per label, and two IEEE float ops per row at the end ->
    (label, n_vertices, internal_edges, degree_sum, q)."""
    from raylink.algos.lpa import community_lpa
    from raylink.algos.triangles import _canon, _unpack
    from raylink.join import attach_lookup, bucketed_distinct, with_typed_empty
    from raylink.util import splitmix64

    g = page_graph(sf_dir, directed=False)
    _, labels = community_lpa(
        g=g, rounds=LPA_COMMUNITY_ROUNDS, engine="tasks",
        ckpt_dir=_ckpt("community_lpa", sf_dir, LPA_COMMUNITY_ROUNDS),
    )
    n_verts = g.n_vertices

    _, edges, _, _ = page_edge_tables(sf_dir)
    simple = bucketed_distinct(
        edges.map_batches(_canon, batch_format="pyarrow"), "key",
        num_buckets=64,
    )
    n_edges = simple.count()  # E: one scalar on the driver

    def pair_rows(batch: pa.Table) -> pa.Table:
        a, b = _unpack(batch.column("key").to_numpy(zero_copy_only=False))
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    pairs = simple.map_batches(pair_rows, batch_format="pyarrow")

    def keyed(col: str):
        return labels.map_batches(
            lambda t, c=col: pa.table(
                {c: t.column("vid"), "label": t.column("label")}
            ),
            batch_format="pyarrow",
        )

    both = attach_lookup(
        attach_lookup(
            pairs, keyed("a"), on="a", left_cols={"b": pa.int64()},
            value_cols={"label": pa.int64()}, n_lookup_rows=n_verts,
        ).map_batches(
            lambda t: pa.table(
                {"b": t.column("b"), "la": t.column("label"),
                 "a": t.column("a")}
            ),
            batch_format="pyarrow",
        ),
        keyed("b"), on="b", left_cols={"a": pa.int64(), "la": pa.int64()},
        value_cols={"label": pa.int64()}, n_lookup_rows=n_verts,
    )

    B = np.uint64(32)

    def label_partials(batch: pa.Table) -> pa.Table:
        la = batch.column("la").to_numpy(zero_copy_only=False)
        lb = batch.column("label").to_numpy(zero_copy_only=False)
        # each edge credits 1 degree to both endpoint labels; internal
        # edges (la == lb) credit 1 internal + 2 degree to the one label
        lab = np.concatenate([la, lb])
        deg = np.ones(len(lab), dtype=np.int64)
        internal = np.concatenate(
            [(la == lb).astype(np.int64), np.zeros(len(lb), np.int64)]
        )
        ul, inv = np.unique(lab, return_inverse=True)
        ds_ = np.zeros(len(ul), dtype=np.int64)
        is_ = np.zeros(len(ul), dtype=np.int64)
        np.add.at(ds_, inv, deg)
        np.add.at(is_, inv, internal)
        return pa.table(
            {
                "lb2": pa.array(
                    (splitmix64(ul.astype(np.uint64)) % B).astype(np.int32)
                ),
                "label": pa.array(ul),
                "deg": pa.array(ds_),
                "internal": pa.array(is_),
            }
        )

    def vert_partials(batch: pa.Table) -> pa.Table:
        lv = batch.column("label").to_numpy(zero_copy_only=False)
        ul, cnt = np.unique(lv, return_counts=True)
        return pa.table(
            {
                "lb2": pa.array(
                    (splitmix64(ul.astype(np.uint64)) % B).astype(np.int32)
                ),
                "label": pa.array(ul),
                "deg": pa.array(np.zeros(len(ul), dtype=np.int64)),
                "internal": pa.array(np.zeros(len(ul), dtype=np.int64)),
                "nv": pa.array(cnt.astype(np.int64)),
            }
        )

    def zero_nv(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "nv", pa.array(np.zeros(len(batch), dtype=np.int64))
        )

    rows = (
        both.map_batches(label_partials, batch_format="pyarrow")
        .map_batches(zero_nv, batch_format="pyarrow")
        .union(labels.map_batches(vert_partials, batch_format="pyarrow"))
    )

    E = float(n_edges)

    def combine(group: pa.Table) -> pa.Table:
        lab = group.column("label").to_numpy(zero_copy_only=False)
        ul, inv = np.unique(lab, return_inverse=True)
        deg = np.zeros(len(ul), dtype=np.int64)
        internal = np.zeros(len(ul), dtype=np.int64)
        nv = np.zeros(len(ul), dtype=np.int64)
        np.add.at(deg, inv, group.column("deg").to_numpy(zero_copy_only=False))
        np.add.at(
            internal, inv,
            group.column("internal").to_numpy(zero_copy_only=False),
        )
        np.add.at(nv, inv, group.column("nv").to_numpy(zero_copy_only=False))
        t = deg / (2.0 * E)
        q = internal / E - t * t
        from raylink.util import round_half_away

        return pa.table(
            {
                "label": pa.array(ul),
                "n_vertices": pa.array(nv),
                "internal_edges": pa.array(internal),
                "degree_sum": pa.array(deg),
                "q": pa.array(round_half_away(q, 8)),
            }
        )

    return with_typed_empty(
        rows.groupby("lb2").map_groups(combine, batch_format="pyarrow"),
        {"label": pa.int64(), "n_vertices": pa.int64(),
         "internal_edges": pa.int64(), "degree_sum": pa.int64(),
         "q": pa.float64()},
    ).sort("label")


JP_ROUNDS = 32


def q_coloring(sf_dir: str):
    """Greedy proper coloring (Jones-Plassmann, splitmix64-priority-order
    first-fit) of the undirected page graph -> (vid, color, jp_round);
    jp_round = the vertex's depth in the decreasing-priority DAG = the BSP
    superstep it colored in. Engine round budget == the SQL unroll, so a
    budget overrun raises instead of silently mismatching."""
    from raylink.algos.coloring import jp_coloring

    g = page_graph(sf_dir, directed=False)
    _, out = jp_coloring(
        g=g, seed=0, max_rounds=JP_ROUNDS, engine="tasks",
        ckpt_dir=_ckpt("jp_coloring", sf_dir),
    )
    return out.sort("vid")


MATCH_ROUNDS = 32


def q_matching(sf_dir: str):
    """Deterministic maximal matching (mutual-best handshake, splitmix64
    edge priorities) of the undirected page graph -> (vid, mate,
    match_round); unmatched vertices carry -1/-1. Engine round budget ==
    the SQL unroll."""
    from raylink.algos.matching import maximal_matching

    g = page_graph(sf_dir, directed=False)
    _, out = maximal_matching(
        g=g, max_rounds=MATCH_ROUNDS, engine="tasks",
        ckpt_dir=_ckpt("matching", sf_dir),
    )
    return out.sort("vid")


def q_chunk_docs(sf_dir: str):
    """RAG/pretraining chunking: 64-word windows starting every 48 words
    (16-word overlap) -> (doc_id, chunk_idx, chunk_text, n_tokens)."""
    from raylink.ops.select import chunk_docs

    return chunk_docs(_docs(sf_dir), chunk=64, overlap=16)


def q_mst(sf_dir: str):
    """Minimum spanning forest of the page graph under deterministic
    planted weights w = 1 + (7*src + 13*dst) % 5 (the synthetic graph is
    unweighted — the test_weighted_sssp planting precedent), tie-broken by
    the (weight, src, dst) total order -> (src, dst, weight)."""
    from raylink.algos.mst import minimum_spanning_forest

    _, edges, _, _ = page_edge_tables(sf_dir)

    def add_w(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        w = (1.0 + (7 * s + 13 * d) % 5).astype(np.float64)
        return pa.table(
            {"src": batch.column("src"), "dst": batch.column("dst"),
             "weight": pa.array(w)}
        )

    return minimum_spanning_forest(edges.map_batches(add_w, batch_format="pyarrow"))


def q_negative_samples(sf_dir: str):
    """Deterministic negative-edge sampling over the page graph (3 slots
    per vertex, non-edges only) -> (src, dst, slot)."""
    from raylink.pipelines import negative_samples

    _, edges, _, n = page_edge_tables(sf_dir)
    return negative_samples(edges, n_vertices=n, k=3, seed=0)


def q_big_orders(sf_dir: str):
    """TPC-H Q18 shape ("large volume customers"): orders whose total
    line-item quantity exceeds 300 units, with the customer name attached.
    Shape: per-batch integer quantity partials -> ``bucketed_sum`` per
    order (unbounded key cardinality, coarse buckets) -> distributed
    HAVING filter -> large x large ``hash_join`` against orders ->
    thresholded customer-name attach -> distributed sort + limit 100.
    -> (c_name, o_custkey, o_orderkey, o_orderdate, total_price, sum_qty)
    ordered by total_price desc, orderkey asc."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import attach_lookup, bucketed_sum, hash_join

    def qty_f(b: pa.Table) -> pa.Table:
        q = np.rint(
            b.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)  # quantities are whole units stored as doubles
        return pa.table({"okey": b.column("l_orderkey"), "qty": pa.array(q)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    ).map_batches(qty_f, batch_format="pyarrow")
    sums = bucketed_sum(li, key="okey", val="qty", out_val="sum_qty")
    big = sums.map_batches(
        lambda b: b.filter(pc.greater(b.column("sum_qty"), 300)),
        batch_format="pyarrow",
    )

    def ord_f(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "okey": b.column("o_orderkey"),
                "ckey": b.column("o_custkey"),
                "o_orderdate": b.column("o_orderdate"),
                "price": pa.array(_cents(b.column("o_totalprice"))),
            }
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(ord_f, batch_format="pyarrow")
    joined = hash_join(
        big, orders, on="okey",
        left_cols={"sum_qty": pa.int64()},
        right_cols={
            "ckey": pa.int64(),
            "o_orderdate": pa.timestamp("us"),
            "price": pa.int64(),
        },
        strict=False,
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(
        lambda b: pa.table(
            {"ckey": b.column("c_custkey"), "c_name": b.column("c_name")}
        ),
        batch_format="pyarrow",
    )
    named = attach_lookup(
        joined, cust, on="ckey",
        left_cols={
            "okey": pa.int64(),
            "sum_qty": pa.int64(),
            "o_orderdate": pa.timestamp("us"),
            "price": pa.int64(),
        },
        value_cols={"c_name": pa.string()},
        n_lookup_rows=_parquet_rows(sf_dir, "customer"),
    )
    top = named.sort(["price", "okey"], descending=[True, False]).limit(100)
    return top.map_batches(
        lambda b: pa.table(
            {
                "c_name": b.column("c_name"),
                "o_custkey": b.column("ckey"),
                "o_orderkey": b.column("okey"),
                "o_orderdate": b.column("o_orderdate"),
                "total_price": pa.array(
                    b.column("price").to_numpy(zero_copy_only=False).astype(
                        np.float64
                    )
                    / 100.0
                ),
                "sum_qty": b.column("sum_qty"),
            }
        ),
        batch_format="pyarrow",
    )


def q_returned_revenue(sf_dir: str):
    """TPC-H Q10 shape ("returned item reporting"): revenue lost to
    returned items per customer over a half-year of orders, top 20.
    Shape: scanner-pruned date filter on orders + returnflag filter on
    lineitem -> large x large ``hash_join`` with per-customer integer
    partials fused into the join tasks (custkey is NOT the join key, so
    they are partials) -> ``bucketed_sum`` per customer -> distributed
    sort + limit 20 -> thresholded name/acctbal attach on the 20 rows.
    -> (c_custkey, c_name, c_acctbal, revenue) ordered by revenue desc."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import attach_lookup, bucketed_sum, hash_join

    d0 = pa.scalar(np.datetime64("1996-01-01", "us").item(), type=pa.timestamp("us"))
    d1 = pa.scalar(np.datetime64("1996-07-01", "us").item(), type=pa.timestamp("us"))

    def li_f(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("l_returnflag"), "R"))
        rev = _cents(t.column("l_extendedprice")) * (
            100 - _cents(t.column("l_discount"))
        )
        return pa.table({"okey": t.column("l_orderkey"), "rev": pa.array(rev)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
        filter=pc.field("l_returnflag") == "R",  # scanner-level row pruning
    ).map_batches(li_f, batch_format="pyarrow")

    def ord_f(b: pa.Table) -> pa.Table:
        t = b.filter(
            pc.and_(pc.greater_equal(b.column("o_orderdate"), d0),
                    pc.less(b.column("o_orderdate"), d1))
        )
        return pa.table({"okey": t.column("o_orderkey"), "ckey": t.column("o_custkey")})

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= d0) & (pc.field("o_orderdate") < d1),
    ).map_batches(ord_f, batch_format="pyarrow")

    def cust_partial(b: pa.Table) -> pa.Table:
        ck = b.column("ckey").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(ck, return_inverse=True)
        rev = b.column("rev").to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, rev)
        return pa.table({"ckey": pa.array(uk), "rev": pa.array(s)})

    joined = hash_join(
        li, orders, on="okey",
        left_cols={"rev": pa.int64()}, right_cols={"ckey": pa.int64()},
        strict=False,
        post=cust_partial,
    )
    agg = bucketed_sum(joined, key="ckey", val="rev", out_val="rev")
    top = agg.sort(["rev", "ckey"], descending=[True, False]).limit(20)
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal"],
    ).map_batches(
        lambda b: pa.table(
            {
                "ckey": b.column("c_custkey"),
                "c_name": b.column("c_name"),
                "c_acctbal": b.column("c_acctbal"),
            }
        ),
        batch_format="pyarrow",
    )
    named = attach_lookup(
        top, cust, on="ckey",
        left_cols={"rev": pa.int64()},
        value_cols={"c_name": pa.string(), "c_acctbal": pa.float64()},
        n_lookup_rows=_parquet_rows(sf_dir, "customer"),
    )
    return named.map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b.column("ckey"),
                "c_name": b.column("c_name"),
                "c_acctbal": b.column("c_acctbal"),
                "revenue": pa.array(
                    b.column("rev").to_numpy(zero_copy_only=False).astype(
                        np.float64
                    )
                    / 10000.0
                ),
            }
        ),
        batch_format="pyarrow",
    )


def q_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape ("forecasting revenue change"): one column-pruned,
    scanner-filtered pass over lineitem, integer cents partials, a single
    scalar out — the pure-scan baseline of the relational suite.
    -> one row (revenue)."""
    import pyarrow.compute as pc
    import ray.data as rd

    d0 = pa.scalar(np.datetime64("1996-01-01", "us").item(), type=pa.timestamp("us"))
    d1 = pa.scalar(np.datetime64("1997-01-01", "us").item(), type=pa.timestamp("us"))

    def f(b: pa.Table) -> pa.Table:
        dc = _cents(b.column("l_discount"))
        qty = np.rint(
            b.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        sd = b.column("l_shipdate")
        if isinstance(sd, pa.ChunkedArray):
            sd = sd.combine_chunks()
        t = sd.cast(pa.int64()).to_numpy(zero_copy_only=False)
        lo = np.datetime64("1996-01-01", "us").astype(np.int64)
        hi = np.datetime64("1997-01-01", "us").astype(np.int64)
        keep = (t >= lo) & (t < hi) & (dc >= 5) & (dc <= 7) & (qty < 24)
        rev = (_cents(b.column("l_extendedprice"))[keep] * dc[keep]).sum()
        return pa.table({"rev": pa.array([int(rev)], type=pa.int64())})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        filter=(pc.field("l_shipdate") >= d0) & (pc.field("l_shipdate") < d1),
    ).map_batches(f, batch_format="pyarrow")
    total = int(li.sum("rev"))
    return pa.table(
        {"revenue": pa.array([float(np.int64(total) / np.int64(10000))],
                             type=pa.float64())}
    )


def q_part_profit(sf_dir: str):
    """TPC-H Q9 shape ("product type profit"): PROMO-part revenue per
    (supplier nation, ship year). Shape: promo partkeys -> thresholded
    semi-join filter on the lineitem scan (zero shuffle while the part
    dimension broadcasts, bucketed when dataset-sized), supplier-nation
    attach via thresholded lookup, per-batch integer (nation, year)
    partials, bounded combine tree. -> (n_name, yr, revenue)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import attach_lookup, semi_join, tree_groupby_sum

    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_name"]))
    promo = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).map_batches(
        lambda b: pa.table(
            {"pkey": b.filter(pc.equal(b.column("p_type"), "PROMO"))
             .column("p_partkey")}
        ),
        batch_format="pyarrow",
    )
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda b: pa.table(
            {"skey": b.column("s_suppkey"),
             "nkey": pc.cast(b.column("s_nationkey"), pa.int64())}
        ),
        batch_format="pyarrow",
    )

    def li_f(b: pa.Table) -> pa.Table:
        rev = _cents(b.column("l_extendedprice")) * (
            100 - _cents(b.column("l_discount"))
        )
        yr = pc.cast(pc.year(b.column("l_shipdate")), pa.int64())
        return pa.table(
            {
                "pkey": b.column("l_partkey"),
                "skey": b.column("l_suppkey"),
                "yr": yr,
                "rev": pa.array(rev),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    ).map_batches(li_f, batch_format="pyarrow")
    filtered = semi_join(
        li, promo, on="pkey",
        left_cols={"skey": pa.int64(), "yr": pa.int64(), "rev": pa.int64()},
        n_key_rows=_parquet_rows(sf_dir, "part"),
    )
    attached = attach_lookup(
        filtered, supp, on="skey",
        left_cols={"yr": pa.int64(), "rev": pa.int64()},
        value_cols={"nkey": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "supplier"),
    )

    def partial(b: pa.Table) -> pa.Table:
        nk = b.column("nkey").to_numpy(zero_copy_only=False)
        yr = b.column("yr").to_numpy(zero_copy_only=False)
        rev = b.column("rev").to_numpy(zero_copy_only=False)
        key = nk * 10000 + yr
        uk, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, rev)
        return pa.table(
            {
                "nkey": pa.array(uk // 10000),
                "yr": pa.array(uk % 10000),
                "rev": pa.array(s),
            }
        )

    agg = tree_groupby_sum(
        attached.map_batches(partial, batch_format="pyarrow"),
        ["nkey", "yr"], ["rev"],
    )

    def finish(b: pa.Table) -> pa.Table:
        nk = b.column("nkey").to_pylist()
        return pa.table(
            {
                "n_name": pa.array([nmap[k] for k in nk], type=pa.string()),
                "yr": b.column("yr"),
                "revenue": pa.array(
                    b.column("sum(rev)").to_numpy(zero_copy_only=False)
                    .astype(np.float64) / 10000.0
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_brand_suppliers(sf_dir: str):
    """TPC-H Q16 shape ("parts/supplier relationship"): distinct supplier
    count per part brand off the fact table. Shape: thresholded brand
    attach on the lineitem scan, per-batch (brand, supplier) pair dedup,
    ONE pair-hash coarse-bucket groupby (all rows of a pair colocate ->
    in-group dedup is global) with per-brand partial counts, bounded
    combine tree. -> (p_brand, supplier_cnt)."""
    import ray.data as rd

    from raylink.join import attach_lookup, tree_groupby_sum
    from raylink.util import splitmix64, text_hash64

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    ).map_batches(
        lambda b: pa.table(
            {"pkey": b.column("p_partkey"), "p_brand": b.column("p_brand")}
        ),
        batch_format="pyarrow",
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).map_batches(
        lambda b: pa.table(
            {"pkey": b.column("l_partkey"), "skey": b.column("l_suppkey")}
        ),
        batch_format="pyarrow",
    )
    branded = attach_lookup(
        li, part, on="pkey",
        left_cols={"skey": pa.int64()},
        value_cols={"p_brand": pa.string()},
        n_lookup_rows=_parquet_rows(sf_dir, "part"),
    )
    B = np.uint64(64)

    def pair_rows(b: pa.Table) -> pa.Table:
        br = b.column("p_brand")
        if isinstance(br, pa.ChunkedArray):
            br = br.combine_chunks()
        enc = br.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        sk = b.column("skey").to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, code))
        c, s = code[order], sk[order]
        keep = np.r_[True, (c[1:] != c[:-1]) | (s[1:] != s[:-1])]
        c, s = c[keep], s[keep]
        brand = enc.dictionary.take(pa.array(c))
        h = text_hash64(brand) ^ splitmix64(s.astype(np.uint64))
        return pa.table(
            {
                "b": pa.array((splitmix64(h) % B).astype(np.int32)),
                "p_brand": brand,
                "skey": pa.array(s),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        br = group.column("p_brand")
        if isinstance(br, pa.ChunkedArray):
            br = br.combine_chunks()
        enc = br.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        sk = group.column("skey").to_numpy(zero_copy_only=False)
        key = np.unique(code * np.int64(1 << 32) + sk)
        cnt = np.bincount(
            (key >> np.int64(32)).astype(np.int64), minlength=len(enc.dictionary)
        )
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "p_brand": enc.dictionary.take(pa.array(nz)),
                "supplier_cnt": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    partials = (
        branded.map_batches(pair_rows, batch_format="pyarrow")
        .groupby("b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    agg = tree_groupby_sum(partials, ["p_brand"], ["supplier_cnt"])
    return agg.map_batches(
        lambda b: pa.table(
            {
                "p_brand": b.column("p_brand"),
                "supplier_cnt": b.column("sum(supplier_cnt)"),
            }
        ),
        batch_format="pyarrow",
    )


def q_customer_distribution(sf_dir: str):
    """TPC-H Q13 shape: distribution of customers by order count (urgent
    orders excluded) INCLUDING the zero-order bin — the classic LEFT OUTER
    JOIN + double GROUP BY, re-expressed join-free: per-customer counts
    from one bucketed sum over the filtered orders scan, the histogram via
    the bounded combine tree, and the zero bin by arithmetic
    (n_customers - customers_with_orders) off the customer parquet FOOTER
    row count — the left side is never scanned at all."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from raylink.join import bucketed_sum, tree_groupby_sum

    n_cust = pq.read_metadata(f"{sf_dir}/customer.parquet").num_rows
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )

    def part(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch.column("o_orderpriority"), "1-URGENT")
        ck = batch.filter(keep).column("o_custkey").to_numpy(zero_copy_only=False)
        uc, c = np.unique(ck, return_counts=True)
        return pa.table(
            {"o_custkey": pa.array(uc), "c": pa.array(c.astype(np.int64))}
        )

    oc = bucketed_sum(
        orders.map_batches(part, batch_format="pyarrow"),
        "o_custkey", "c", out_val="c_count",
    )

    def hist_part(batch: pa.Table) -> pa.Table:
        v, n = np.unique(
            batch.column("c_count").to_numpy(zero_copy_only=False),
            return_counts=True,
        )
        return pa.table(
            {"c_count": pa.array(v), "h": pa.array(n.astype(np.int64))}
        )

    hist = tree_groupby_sum(
        oc.map_batches(hist_part, batch_format="pyarrow"), ["c_count"], ["h"]
    )

    def finish(batch: pa.Table) -> pa.Table:
        # tree_groupby_sum ends single-block, so the zero bin appends once
        v = batch.column("c_count").to_numpy(zero_copy_only=False)
        h = batch.column("sum(h)").to_numpy(zero_copy_only=False)
        zero = n_cust - int(h.sum())
        if zero > 0:
            v = np.r_[np.int64(0), v]
            h = np.r_[np.int64(zero), h]
        return pa.table({"c_count": pa.array(v), "custdist": pa.array(h)})

    return hist.map_batches(finish, batch_format="pyarrow", batch_size=None)


def q_events_sliding(sf_dir: str):
    """Sliding-window (1 h window, 15 min hop) per-user event aggregate."""
    import ray.data as rd

    from raylink.ops.windows import sliding_window

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    return sliding_window(ev, size_sec=3600, slide_sec=900)


def q_table_profile(sf_dir: str):
    """Data-quality profile of the events table's numeric columns
    (row counts, null counts, min/max) — the pre-training validation scan."""
    import ray.data as rd

    from raylink.ops.select import table_profile

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    return table_profile(ev, ["event_id", "user_id", "value"])


def q_dataset_checksum(sf_dir: str):
    """Order-invariant documents checksum (XOR of per-row hashes) — the
    integrity check a resumable 100-TB pipeline runs after every stage."""
    from raylink.ops.select import dataset_checksum

    return dataset_checksum(_docs(sf_dir))


def q_redirects(sf_dir: str):
    """Redirect-chain resolution over a deterministically planted redirect
    table: every doc with ``doc_id % 32 != 0 and doc_id >= 4`` redirects to
    ``doc_id - 1 - doc_id % 3`` (strictly decreasing -> acyclic; chains up
    to ~31 single steps, resolved by ``pipelines.resolve_redirects`` in
    ceil(log2 L) pointer-doubling rounds). Output (src, final, hops) —
    the crawl canonicalization pass. Exact recursive-CTE oracle."""
    import ray.data as rd

    from raylink.pipelines import resolve_redirects

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def plant(batch: pa.Table) -> pa.Table:
        i = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = (i % 32 != 0) & (i >= 4)
        s = i[keep]
        return pa.table({"src": pa.array(s), "dst": pa.array(s - 1 - s % 3)})

    red = docs.map_batches(plant, batch_format="pyarrow")
    return resolve_redirects(red).sort("src")


def q_graph_update(sf_dir: str):
    """Incremental recrawl update: from the built page graph, delete every
    out-edge of pages with ``src % 13 == 5`` (their links changed) and add
    planted edges ``(i, (7*i + 11) % m)`` for ``i % 29 == 1`` (self-loops
    excluded), via ``graph.apply_edge_updates`` (partition-pruned rebuild
    — untouched shards byte-copied). Output = PageRank over the UPDATED
    graph, 30 fixed iterations, rounded like q_pagerank. Exact oracle:
    the same edge edit in SQL + the unrolled PR CTEs."""
    import ray.data as rd

    from raylink.algos import pagerank
    from raylink.graph import apply_edge_updates, edge_table
    from raylink.pipelines import cache_key
    from raylink.graph import GRAPH_ROOT
    from raylink import storage

    g0 = page_graph(sf_dir, directed=True)
    _, _, _, n = page_edge_tables(sf_dir)
    m = n - (n % 3)

    dels = edge_table(g0).map_batches(
        lambda b: b.filter(
            pa.array(
                b.column("src").to_numpy(zero_copy_only=False) % 13 == 5
            )
        ),
        batch_format="pyarrow",
    )
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def plant_adds(batch: pa.Table) -> pa.Table:
        i = batch.column("doc_id").to_numpy(zero_copy_only=False)
        s = i[i % 29 == 1]
        d = (7 * s + 11) % m
        keep = d != s
        return pa.table({"src": pa.array(s[keep]), "dst": pa.array(d[keep])})

    adds = docs.map_batches(plant_adds, batch_format="pyarrow")
    out_dir = storage.join(
        GRAPH_ROOT, f"upd-{cache_key('graph_update', sf_dir)}"
    )
    g1 = apply_edge_updates(g0, adds=adds, dels=dels, out_dir=out_dir)
    _, ranks = pagerank(
        g=g1, iters=PR_ITERS, engine="tasks",
        ckpt_dir=_ckpt("graph_update_pr", sf_dir, PR_ITERS),
    )

    def rnd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "rank": pa.array(
                    round_half_away(
                        batch.column("rank").to_numpy(zero_copy_only=False), 8
                    )
                ),
            }
        )

    return ranks.map_batches(rnd, batch_format="pyarrow")


def q_quality_filter(sf_dir: str):
    """Percentile-threshold curation filter: keep docs whose model score
    reaches the corpus P80 — score with the actor-pool linear model, take
    the exact distributed quantile (histogram shuffle carries distinct
    score values only), broadcast the one threshold scalar, filter in a
    shuffle-free scan. The scoring scan runs twice (quantile + filter);
    both are shuffle-free. -> (doc_id, score) survivors."""
    import pyarrow.compute as pc

    from raylink.ops.select import group_quantiles
    from raylink.ops.textstats import linear_score

    sc = linear_score(_docs(sf_dir)).select_columns(["doc_id", "score"])
    keyed = sc.map_batches(
        lambda b: pa.table(
            {"k": pa.array(np.zeros(b.num_rows, np.int64)),
             "score": b.column("score")}
        ),
        batch_format="pyarrow",
    )
    rows = group_quantiles(keyed, "k", "score", [0.8]).take_all()
    t = int(rows[0]["score"])
    return sc.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("score"), t)),
        batch_format="pyarrow",
    )


def q_source_quality(sf_dir: str):
    """Per-source quality report: doc count and mean linear-model score
    per `source` value — integer score sums per batch on dictionary codes,
    bounded combine tree (sources are a small vocabulary), one IEEE
    division per source. -> (source, n_docs, sum_score, mean_score)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import tree_groupby_sum
    from raylink.ops.textstats import LinearScorer

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )

    class _Partial:
        def __init__(self) -> None:
            self.scorer = LinearScorer()

        def __call__(self, batch: pa.Table) -> pa.Table:
            y = self.scorer(batch).column("score").to_numpy(
                zero_copy_only=False
            )
            src = batch.column("source")
            if isinstance(src, pa.ChunkedArray):
                src = src.combine_chunks()
            enc = src.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            ns = len(enc.dictionary)
            s = np.zeros(ns, np.int64)
            np.add.at(s, codes, y)
            return pa.table(
                {
                    "source": enc.dictionary,
                    "n": pa.array(
                        np.bincount(codes, minlength=ns).astype(np.int64)
                    ),
                    "s": pa.array(s),
                }
            )

    partials = docs.map_batches(
        _Partial, batch_format="pyarrow", concurrency=(1, 8)
    )
    agg = tree_groupby_sum(partials, ["source"], ["n", "s"])

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("sum(n)").to_numpy(zero_copy_only=False)
        s = b.column("sum(s)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "source": b.column("source"),
                "n_docs": pa.array(n),
                "sum_score": pa.array(s),
                "mean_score": pa.array(s / n),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_corr_length_quality(sf_dir: str):
    """Signed r^2 between document length (chars) and the linear-model
    quality score — the pre-training sanity correlation, sqrt-free so it
    mirrors exactly: integer partial sums (n, Sx, Sy, Sxy, Sxx, Syy) per
    batch, python-int driver fold (arbitrary precision), sign(cov) *
    cov^2/(varx*vary) with the two big-int->double conversions and one
    IEEE division identical on both engines, ROUND 6.
    -> one row (n_docs, signed_r2)."""
    import pyarrow.compute as pc

    from raylink.ops.textstats import LinearScorer

    class _Partial:
        def __init__(self) -> None:
            self.scorer = LinearScorer()

        def __call__(self, batch: pa.Table) -> pa.Table:
            scored = self.scorer(batch)
            y = scored.column("score").to_numpy(zero_copy_only=False)
            x = pc.utf8_length(
                pc.fill_null(batch.column("text").combine_chunks(), "")
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            p = pearson_partials(x, y)
            return pa.table(
                {k: pa.array([v], type=pa.int64()) for k, v in p.items()}
            )

    rows = _docs(sf_dir).map_batches(
        _Partial, batch_format="pyarrow", concurrency=(1, 8)
    ).take_all()  # one tiny row per batch
    n = sum(r["n"] for r in rows)
    sx = sum(r["sx"] for r in rows)
    sy = sum(r["sy"] for r in rows)
    sxy = sum(r["sxy"] for r in rows)
    sxx = sum(r["sxx"] for r in rows)
    syy = sum(r["syy"] for r in rows)
    num = n * sxy - sx * sy
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    if dx * dy == 0:
        r2 = 0.0
    else:
        r2 = float(num * num) / float(dx * dy)  # exact-int -> double, 1 div
        if num < 0:
            r2 = -1.0 * r2
    return pa.table(
        {
            "n_docs": pa.array([n], type=pa.int64()),
            "signed_r2": pa.array([round_half_away(np.float64(r2), 6)],
                                  type=pa.float64()),
        }
    )


def q_quality_score(sf_dir: str):
    """Hashed-feature linear model scoring (the curation pipeline's
    quality-classifier inference stage): integer weights derived from
    splitmix64(fnv1a(word) % dim XOR splitmix64(seed)), per-doc score =
    int64 sum over word occurrences, label = score > 0. Actor-pool scan,
    zero shuffle. Exact oracle (hash/weight formula mirrored in SQL)."""
    import ray.data as rd

    from raylink.ops.textstats import linear_score

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return linear_score(docs).sort("doc_id")


# ---------------------------------------------------------------- r4 wave 8
# remaining TPC-H shapes expressible over this schema (no partsupp /
# shipmode / commitdate columns exist, so Q2/Q11/Q12/Q19-21 are not)


def q_nation_trade(sf_dir: str):
    """TPC-H Q7 shape ("volume shipping"): revenue between every ordered
    (supplier nation, customer nation) pair per ship year, cross-nation
    only. Shape: thresholded supplier-nation attach on the lineitem scan,
    thresholded customer-nation attach on orders, ONE large x large
    ``hash_join`` on orderkey whose ``post`` hook filters snat != cnat and
    collapses to integer (snat, cnat, yr) partials inside the join's
    bucket groups, bounded combine tree. -> (supp_nation, cust_nation,
    yr, revenue)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import attach_lookup, hash_join, tree_groupby_sum

    nat = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_name"]))

    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda b: pa.table(
            {"skey": b.column("s_suppkey"),
             "snat": pc.cast(b.column("s_nationkey"), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda b: pa.table(
            {"ckey": b.column("c_custkey"),
             "cnat": pc.cast(b.column("c_nationkey"), pa.int64())}
        ),
        batch_format="pyarrow",
    )

    def li_f(b: pa.Table) -> pa.Table:
        rev = _cents(b.column("l_extendedprice")) * (
            100 - _cents(b.column("l_discount"))
        )
        return pa.table(
            {
                "okey": b.column("l_orderkey"),
                "skey": b.column("l_suppkey"),
                "yr": pc.cast(pc.year(b.column("l_shipdate")), pa.int64()),
                "rev": pa.array(rev),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    ).map_batches(li_f, batch_format="pyarrow")
    li = attach_lookup(
        li, supp, on="skey",
        left_cols={"okey": pa.int64(), "yr": pa.int64(), "rev": pa.int64()},
        value_cols={"snat": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "supplier"),
    )
    orders = attach_lookup(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
        ).map_batches(
            lambda b: pa.table(
                {"okey": b.column("o_orderkey"), "ckey": b.column("o_custkey")}
            ),
            batch_format="pyarrow",
        ),
        cust, on="ckey",
        left_cols={"okey": pa.int64()}, value_cols={"cnat": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "customer"),
    ).select_columns(["okey", "cnat"])

    def pair_partial(b: pa.Table) -> pa.Table:
        sn = b.column("snat").to_numpy(zero_copy_only=False)
        cn = b.column("cnat").to_numpy(zero_copy_only=False)
        keep = sn != cn
        sn, cn = sn[keep], cn[keep]
        yr = b.column("yr").to_numpy(zero_copy_only=False)[keep]
        rev = b.column("rev").to_numpy(zero_copy_only=False)[keep]
        # nations < 2**7, years < 2**12: the packed partial key is tiny
        key = ((sn << np.int64(7)) | cn) * np.int64(4096) + yr
        uk, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, rev)
        return pa.table(
            {
                "snat": pa.array((uk // 4096) >> np.int64(7)),
                "cnat": pa.array((uk // 4096) & np.int64(0x7F)),
                "yr": pa.array(uk % 4096),
                "rev": pa.array(s),
            }
        )

    joined = hash_join(
        li.select_columns(["okey", "snat", "yr", "rev"]), orders, on="okey",
        left_cols={"snat": pa.int64(), "yr": pa.int64(), "rev": pa.int64()},
        right_cols={"cnat": pa.int64()},
        strict=False,
        post=pair_partial,
    )
    agg = tree_groupby_sum(joined, ["snat", "cnat", "yr"], ["rev"])

    def finish(b: pa.Table) -> pa.Table:
        sn = b.column("snat").to_pylist()
        cn = b.column("cnat").to_pylist()
        return pa.table(
            {
                "supp_nation": pa.array([nmap[k] for k in sn], pa.string()),
                "cust_nation": pa.array([nmap[k] for k in cn], pa.string()),
                "yr": b.column("yr"),
                "revenue": pa.array(
                    b.column("sum(rev)").to_numpy(zero_copy_only=False)
                    .astype(np.float64) / 10000.0
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_market_share(sf_dir: str, region_name: str = "ASIA",
                   part_type: str = "STANDARD"):
    """TPC-H Q8 shape ("national market share"): the target nation's share
    of STANDARD-part revenue among orders of ``region_name`` customers,
    per order year. The target nation is the region's minimum nationkey
    (deterministic; the synthetic schema has no fixed 'BRAZIL'). Shape:
    part-type semi-join on the lineitem scan, thresholded supplier-nation
    attach, region-filtered customer->order attach, ONE large x large
    ``hash_join`` on orderkey with per-(year) integer (num, den) partials
    in its ``post`` hook. -> (yr, mkt_share)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import attach_lookup, hash_join, semi_join, tree_groupby_sum

    reg = rd.read_parquet(f"{sf_dir}/region.parquet").to_pandas()
    rkey = int(reg.loc[reg["r_name"] == region_name, "r_regionkey"].iloc[0])
    nat = rd.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    region_nats = np.sort(
        nat.loc[nat["n_regionkey"] == rkey, "n_nationkey"].to_numpy(np.int64)
    )
    target = int(region_nats[0])

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).map_batches(
        lambda b: pa.table(
            {"pkey": b.filter(pc.equal(b.column("p_type"), part_type))
             .column("p_partkey")}
        ),
        batch_format="pyarrow",
    )
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda b: pa.table(
            {"skey": b.column("s_suppkey"),
             "snat": pc.cast(b.column("s_nationkey"), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda b: pa.table(
            {"ckey": b.column("c_custkey"),
             "cnat": pc.cast(b.column("c_nationkey"), pa.int64())}
        ),
        batch_format="pyarrow",
    )

    def li_f(b: pa.Table) -> pa.Table:
        rev = _cents(b.column("l_extendedprice")) * (
            100 - _cents(b.column("l_discount"))
        )
        return pa.table(
            {
                "pkey": b.column("l_partkey"),
                "okey": b.column("l_orderkey"),
                "skey": b.column("l_suppkey"),
                "rev": pa.array(rev),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_orderkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    ).map_batches(li_f, batch_format="pyarrow")
    li = semi_join(
        li, parts, on="pkey",
        left_cols={"okey": pa.int64(), "skey": pa.int64(), "rev": pa.int64()},
        n_key_rows=_parquet_rows(sf_dir, "part"),
    )
    li = attach_lookup(
        li, supp, on="skey",
        left_cols={"okey": pa.int64(), "rev": pa.int64()},
        value_cols={"snat": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "supplier"),
    )

    rnset = region_nats  # tiny (<=25): closed over, not shuffled

    def ord_f(b: pa.Table) -> pa.Table:
        cn = b.column("cnat").to_numpy(zero_copy_only=False)
        keep = np.isin(cn, rnset)
        t = b.filter(pa.array(keep))
        return pa.table(
            {
                "okey": t.column("okey"),
                "yr": pc.cast(pc.year(t.column("o_orderdate")), pa.int64()),
            }
        )

    orders = attach_lookup(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
        ).map_batches(
            lambda b: pa.table(
                {"okey": b.column("o_orderkey"),
                 "ckey": b.column("o_custkey"),
                 "o_orderdate": b.column("o_orderdate")}
            ),
            batch_format="pyarrow",
        ),
        cust, on="ckey",
        left_cols={"okey": pa.int64(), "o_orderdate": pa.timestamp("us")},
        value_cols={"cnat": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "customer"),
    ).map_batches(ord_f, batch_format="pyarrow")

    def share_partial(b: pa.Table) -> pa.Table:
        yr = b.column("yr").to_numpy(zero_copy_only=False)
        sn = b.column("snat").to_numpy(zero_copy_only=False)
        rev = b.column("rev").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(yr, return_inverse=True)
        den = np.zeros(len(uk), np.int64)
        num = np.zeros(len(uk), np.int64)
        np.add.at(den, inv, rev)
        np.add.at(num, inv, np.where(sn == target, rev, 0))
        return pa.table(
            {"yr": pa.array(uk), "num": pa.array(num), "den": pa.array(den)}
        )

    joined = hash_join(
        li.select_columns(["okey", "snat", "rev"]), orders, on="okey",
        left_cols={"snat": pa.int64(), "rev": pa.int64()},
        right_cols={"yr": pa.int64()},
        strict=False,
        post=share_partial,
    )
    agg = tree_groupby_sum(joined, ["yr"], ["num", "den"])

    def finish(b: pa.Table) -> pa.Table:
        num = b.column("sum(num)").to_numpy(zero_copy_only=False)
        den = b.column("sum(den)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "yr": b.column("yr"),
                "mkt_share": pa.array(
                    num.astype(np.float64) / den.astype(np.float64)
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape ("promotion effect"): per ship (year, month), the
    percentage of revenue from PROMO-type parts. Shape: thresholded
    promo-flag attach on the lineitem scan (0/1 from the part dimension),
    per-batch integer (num, den) month partials, bounded combine tree, one
    float division per group. -> (yr, mo, promo_pct)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import attach_lookup, tree_groupby_sum

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).map_batches(
        lambda b: pa.table(
            {
                "pkey": b.column("p_partkey"),
                "isp": pc.cast(
                    pc.equal(b.column("p_type"), "PROMO"), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def li_f(b: pa.Table) -> pa.Table:
        rev = _cents(b.column("l_extendedprice")) * (
            100 - _cents(b.column("l_discount"))
        )
        yr = pc.cast(pc.year(b.column("l_shipdate")), pa.int64())
        mo = pc.cast(pc.month(b.column("l_shipdate")), pa.int64())
        return pa.table(
            {
                "pkey": b.column("l_partkey"),
                "ym": pc.add(pc.multiply(yr, pa.scalar(100, pa.int64())), mo),
                "rev": pa.array(rev),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(li_f, batch_format="pyarrow")
    li = attach_lookup(
        li, parts, on="pkey",
        left_cols={"ym": pa.int64(), "rev": pa.int64()},
        value_cols={"isp": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "part"),
    )

    def partial(b: pa.Table) -> pa.Table:
        ym = b.column("ym").to_numpy(zero_copy_only=False)
        rev = b.column("rev").to_numpy(zero_copy_only=False)
        isp = b.column("isp").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(ym, return_inverse=True)
        den = np.zeros(len(uk), np.int64)
        num = np.zeros(len(uk), np.int64)
        np.add.at(den, inv, rev)
        np.add.at(num, inv, rev * isp)
        return pa.table(
            {"ym": pa.array(uk), "num": pa.array(num), "den": pa.array(den)}
        )

    agg = tree_groupby_sum(
        li.map_batches(partial, batch_format="pyarrow"), ["ym"], ["num", "den"]
    )

    def finish(b: pa.Table) -> pa.Table:
        ym = b.column("ym").to_numpy(zero_copy_only=False)
        num = b.column("sum(num)").to_numpy(zero_copy_only=False)
        den = b.column("sum(den)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "yr": pa.array(ym // 100),
                "mo": pa.array(ym % 100),
                "promo_pct": pa.array(
                    100.0 * (num.astype(np.float64) / den.astype(np.float64))
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def q_top_supplier(sf_dir: str):
    """TPC-H Q15 shape ("top supplier"): supplier(s) with the maximum
    quarter revenue (1996Q1 shipments). Shape: date-pruned lineitem scan,
    ``bucketed_sum`` per supplier (unbounded key cardinality), global max
    as a Dataset aggregate (O(1) on the driver), distributed equality
    filter. Ties all surface (same as the SQL mirror). -> (s_suppkey,
    total_revenue)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import bucketed_sum

    lo = np.datetime64("1996-01-01", "us").astype("datetime64[us]")
    hi = np.datetime64("1996-04-01", "us").astype("datetime64[us]")

    def li_f(b: pa.Table) -> pa.Table:
        t = b.column("l_shipdate").to_numpy(zero_copy_only=False)
        keep = (t >= lo) & (t < hi)  # residual filter after row-group pruning
        b = b.filter(pa.array(keep))
        rev = _cents(b.column("l_extendedprice")) * (
            100 - _cents(b.column("l_discount"))
        )
        return pa.table({"skey": b.column("l_suppkey"), "rev": pa.array(rev)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= pa.scalar(lo))
        & (pc.field("l_shipdate") < pa.scalar(hi)),
    ).map_batches(li_f, batch_format="pyarrow")
    sums = bucketed_sum(li, key="skey", val="rev", out_val="rev")
    best = int(sums.max("rev"))

    def finish(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("rev"), pa.scalar(best, pa.int64())))
        return pa.table(
            {
                "s_suppkey": t.column("skey"),
                "total_revenue": pa.array(
                    t.column("rev").to_numpy(zero_copy_only=False)
                    .astype(np.float64) / 10000.0
                ),
            }
        )

    return sums.map_batches(finish, batch_format="pyarrow")


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape ("small-quantity-order revenue"): per part, the
    yearly-average revenue of lineitems whose quantity is below 20% of
    that part's average quantity. The threshold is evaluated in exact
    integers (quantities are whole units): qty < 0.2 * (sumq/cnt) <=>
    5*qty*cnt < sumq — no float boundary, bit-exact on both sides. Shape:
    ONE coarse-bucket per-part (sumq, cnt) groupby, thresholded attach of
    the per-part aggregates back onto the scan, distributed filter,
    ``bucketed_sum`` of the surviving revenue. -> (p_partkey,
    avg_yearly)."""
    import ray.data as rd

    from raylink.join import attach_lookup, bucketed_sum
    from raylink.util import splitmix64

    def li_f(b: pa.Table) -> pa.Table:
        q = np.rint(
            b.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "pkey": b.column("l_partkey"),
                "qty": pa.array(q),
                "price": pa.array(_cents(b.column("l_extendedprice"))),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).map_batches(li_f, batch_format="pyarrow")

    B = np.uint64(32)

    def bucket(b: pa.Table) -> pa.Table:
        pk = b.column("pkey").to_numpy(zero_copy_only=False)
        qty = b.column("qty").to_numpy(zero_copy_only=False)
        # per-batch pre-combine before the shuffle
        uk, inv = np.unique(pk, return_inverse=True)
        sq = np.zeros(len(uk), np.int64)
        cn = np.zeros(len(uk), np.int64)
        np.add.at(sq, inv, qty)
        np.add.at(cn, inv, 1)
        return pa.table(
            {
                "pb": pa.array(
                    (splitmix64(uk.astype(np.uint64)) % B).astype(np.int32)
                ),
                "pkey": pa.array(uk),
                "sumq": pa.array(sq),
                "cnt": pa.array(cn),
            }
        )

    def combine(g: pa.Table) -> pa.Table:
        pk = g.column("pkey").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(pk, return_inverse=True)
        sq = np.zeros(len(uk), np.int64)
        cn = np.zeros(len(uk), np.int64)
        np.add.at(sq, inv, g.column("sumq").to_numpy(zero_copy_only=False))
        np.add.at(cn, inv, g.column("cnt").to_numpy(zero_copy_only=False))
        return pa.table(
            {"pkey": pa.array(uk), "sumq": pa.array(sq), "cnt": pa.array(cn)}
        )

    per_part = (
        li.map_batches(bucket, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(combine, batch_format="pyarrow")
    )
    attached = attach_lookup(
        li, per_part, on="pkey",
        left_cols={"qty": pa.int64(), "price": pa.int64()},
        value_cols={"sumq": pa.int64(), "cnt": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "part"),
    )

    def small(b: pa.Table) -> pa.Table:
        qty = b.column("qty").to_numpy(zero_copy_only=False)
        sq = b.column("sumq").to_numpy(zero_copy_only=False)
        cn = b.column("cnt").to_numpy(zero_copy_only=False)
        keep = 5 * qty * cn < sq  # qty < 0.2*avg, exact in integers
        t = b.filter(pa.array(keep))
        return pa.table({"pkey": t.column("pkey"), "price": t.column("price")})

    sums = bucketed_sum(
        attached.map_batches(small, batch_format="pyarrow"),
        key="pkey", val="price", out_val="price",
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": b.column("pkey"),
                "avg_yearly": pa.array(
                    (b.column("price").to_numpy(zero_copy_only=False)
                     .astype(np.float64) / 100.0) / 7.0
                ),
            }
        )

    return sums.map_batches(finish, batch_format="pyarrow")


def q_salsa(sf_dir: str):
    """SALSA hubs/authorities (8 iterations, degree-normalized pushes,
    L1-normalized) over the page link graph — the TKC-resistant sibling of
    HITS, same flag-tagged UNION graph machinery (raylink/algos/salsa.py)."""
    from raylink.algos.hits import union_flag_edges
    from raylink.algos.salsa import salsa
    from raylink.graph import build_graph
    from raylink.pipelines import page_edge_tables

    _, edges, verts, _ = page_edge_tables(sf_dir)
    g = build_graph(
        union_flag_edges(edges.materialize()), verts, num_parts=P,
        partitioner="mod", directed=True, edge_cols=["flag"],
    )
    _, scores = salsa(g=g, iters=HITS_ITERS, engine="tasks",
                      ckpt_dir=_ckpt("salsa", sf_dir, HITS_ITERS))

    def rnd(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": batch.column("vid"),
                "auth": pa.array(round_half_away(
                    batch.column("auth").to_numpy(zero_copy_only=False), 8)),
                "hub": pa.array(round_half_away(
                    batch.column("hub").to_numpy(zero_copy_only=False), 8)),
            }
        )

    return scores.map_batches(rnd, batch_format="pyarrow")


def q_dag_layers(sf_dir: str):
    """Bow-tie depth stratification of the crawl: SCC labels (resuming
    q_scc's checkpoints) -> distinct cross-component condensation edges ->
    ONE BSP max-propagation layering of the acyclic condensation
    (algos/dag.py) -> layer attached back per vertex. -> (vid, scc,
    layer)."""
    from raylink.algos.dag import condensation_layers
    from raylink.algos.scc import scc

    g_dual = _dual_graph(sf_dir)
    _, comps = scc(g=g_dual, ckpt_dir=_ckpt("scc", sf_dir), engine="tasks")
    _, edges, _, _ = page_edge_tables(sf_dir)
    return condensation_layers(
        edges.materialize(), comps, n_vertices=g_dual.n_vertices,
        ckpt_dir=_ckpt("dag_layers", sf_dir),
    )


def q_fastrp(sf_dir: str):
    """FastRP node embeddings (8 dims, 3 transition-matrix powers,
    weights 0.25/0.5/1.0) over the directed page graph — deterministic
    sparse projection, one d-column BSP job (algos/fastrp.py). ->
    (vid, dim, emb) rounded to 8 decimals."""
    from raylink.algos.fastrp import fastrp

    g = page_graph(sf_dir, directed=True)
    _, out = fastrp(g=g, dims=8, iters=3, engine="tasks",
                    ckpt_dir=_ckpt("fastrp", sf_dir))
    return out


def q_source_overlap(sf_dir: str):
    """Cross-source 8-gram contamination matrix over the documents table
    (ops/dedup.source_overlap): distinct shared grams per unordered
    source pair. -> (source_a, source_b, shared_grams)."""
    import ray.data as rd

    from raylink.ops.dedup import source_overlap

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )
    return source_overlap(docs, n=8)


def q_centroid_similarity(sf_dir: str):
    """Per-label centroid cosine matrix over the embeddings table
    (ops/similarity.centroid_similarity): which labels sit close in
    embedding space. -> (label_a, label_b, cosine) rounded to 6."""
    import ray.data as rd

    from raylink.ops.similarity import centroid_similarity

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )
    return centroid_similarity(emb)


def q_part_revenue_share(sf_dir: str):
    """TPC-H Q11 shape ("important stock identification", adapted: no
    partsupp table ships with the testdata, so the value measure is
    lineitem revenue per part): parts whose revenue exceeds ``1.25 /
    n_parts`` of TOTAL revenue (1.25x the mean — the testdata's per-part
    revenue tops out near 1.9x mean, so 2.5x would be vacuous) — the
    HAVING-against-a-global-aggregate shape. Per-part ``bucketed_sum`` of
    integer revenue partials, the total as ONE Dataset aggregate (O(1)
    driver-side), the threshold test in exact integers (``4 * rev *
    n_parts > 5 * total`` — no float boundary), distributed filter.
    ``n_parts`` comes from the parquet
    FOOTER (no execution). int64 bound: ``4 * rev * n_parts`` needs
    rev * n_parts < 4.6e18 — holds through TPC-H sf1000.
    -> (p_partkey, part_revenue)."""
    import ray.data as rd

    from raylink.join import bucketed_sum

    def li_f(b: pa.Table) -> pa.Table:
        dc = _cents(b.column("l_discount"))
        rev = _cents(b.column("l_extendedprice")) * (100 - dc)
        return pa.table({"pkey": b.column("l_partkey"), "rev": pa.array(rev)})

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_f, batch_format="pyarrow")
    sums = bucketed_sum(li, key="pkey", val="rev", out_val="rev")
    total = int(sums.sum("rev"))
    n_parts = _parquet_rows(sf_dir, "part")

    def keep(b: pa.Table) -> pa.Table:
        rev = b.column("rev").to_numpy(zero_copy_only=False)
        t = b.filter(pa.array(4 * rev * n_parts > 5 * total))
        return pa.table(
            {
                "p_partkey": t.column("pkey"),
                "part_revenue": pa.array(
                    t.column("rev").to_numpy(zero_copy_only=False) / 10000.0
                ),
            }
        )

    return sums.map_batches(keep, batch_format="pyarrow")


def q_dormant_customers(sf_dir: str):
    """TPC-H Q22 shape ("global sales opportunity"): per nation, the count
    and total balance of customers with above-average positive balances
    who placed no order since 2001-01-01 (the testdata gives EVERY
    customer historic orders, so Q22's literal "never ordered" is vacuous;
    the dormancy cutoff keeps ~40% of customers at every scale). Shape:
    the global (sum, count) over positive balances as one Dataset
    aggregate (two int64 scalars on the driver), the above-average test
    in exact integers (``bal * n > sum``), distributed ANTI-join against
    the scanner-filtered recent-order custkeys (orders is the big side —
    keys bucket-shuffle), nation-keyed integer partials through the
    bounded combine tree. -> (c_nationkey, numcust, totacctbal)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import anti_join, tree_groupby_sum

    def c_f(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "nat": b.column("c_nationkey"),
                "bal": pa.array(_cents(b.column("c_acctbal"))),
            }
        )

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    ).map_batches(c_f, batch_format="pyarrow")

    def pos_partial(b: pa.Table) -> pa.Table:
        bal = b.column("bal").to_numpy(zero_copy_only=False)
        p = bal[bal > 0]
        return pa.table(
            {
                "s": pa.array([int(p.sum())], type=pa.int64()),
                "n": pa.array([len(p)], type=pa.int64()),
            }
        )

    parts = cust.map_batches(pos_partial, batch_format="pyarrow")
    s_pos, n_pos = int(parts.sum("s")), int(parts.sum("n"))

    def rich(b: pa.Table) -> pa.Table:
        bal = b.column("bal").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(bal * n_pos > s_pos))

    cutoff = pa.scalar(
        np.datetime64("2001-01-01", "us").item(), type=pa.timestamp("us")
    )
    okeys = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
        filter=pc.field("o_orderdate") >= cutoff,  # scanner-level pruning
    ).map_batches(
        lambda b: pa.table(
            {
                "c_custkey": b.filter(
                    pc.greater_equal(b.column("o_orderdate"), cutoff)
                ).column("o_custkey")
            }
        ),
        batch_format="pyarrow",
    )
    dormant = anti_join(
        cust.map_batches(rich, batch_format="pyarrow"),
        okeys,
        on="c_custkey",
        left_cols={"nat": pa.int64(), "bal": pa.int64()},
    )

    def nat_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "nat": b.column("nat"),
                "one": pa.array(np.ones(len(b), np.int64)),
                "bal": b.column("bal"),
            }
        )

    sums = tree_groupby_sum(
        dormant.map_batches(nat_rows, batch_format="pyarrow"),
        keys=["nat"], sum_cols=["one", "bal"],
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_nationkey": b.column("nat"),
                "numcust": b.column("sum(one)"),
                "totacctbal": pa.array(
                    b.column("sum(bal)").to_numpy(zero_copy_only=False) / 100.0
                ),
            }
        )

    return sums.map_batches(finish, batch_format="pyarrow")


def q_cheapest_supplier(sf_dir: str):
    """TPC-H Q2 shape ("minimum cost supplier", adapted: unit of cost is
    the minimum lineitem price per part; ties resolve to the smallest
    suppkey): the correlated-MIN-subquery shape as a distributed
    argmin. Per-batch lexicographic (price, suppkey) argmin per part
    pre-combines before ONE coarse-bucket groupby (all rows of a part
    colocate, so the group argmin is global), then the supplier name
    attaches via the thresholded lookup. -> (p_partkey, min_price,
    s_suppkey, s_name)."""
    import ray.data as rd

    from raylink.join import attach_lookup
    from raylink.util import splitmix64

    B = np.uint64(32)

    def argmin_rows(pk, pr, sk) -> pa.Table:
        order = np.lexsort((sk, pr, pk))
        pk, pr, sk = pk[order], pr[order], sk[order]
        first = np.ones(len(pk), bool)
        first[1:] = pk[1:] != pk[:-1]
        return pk[first], pr[first], sk[first]

    def li_f(b: pa.Table) -> pa.Table:
        pk, pr, sk = argmin_rows(
            b.column("l_partkey").to_numpy(zero_copy_only=False),
            _cents(b.column("l_extendedprice")),
            b.column("l_suppkey").to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "mb": pa.array(
                    (splitmix64(pk.astype(np.uint64)) % B).astype(np.int32)
                ),
                "pkey": pa.array(pk),
                "price": pa.array(pr),
                "skey": pa.array(sk),
            }
        )

    def combine(g: pa.Table) -> pa.Table:
        pk, pr, sk = argmin_rows(
            g.column("pkey").to_numpy(zero_copy_only=False),
            g.column("price").to_numpy(zero_copy_only=False),
            g.column("skey").to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {"pkey": pa.array(pk), "price": pa.array(pr),
             "s_suppkey": pa.array(sk)}
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    )
    mins = (
        li.map_batches(li_f, batch_format="pyarrow")
        .groupby("mb")
        .map_groups(combine, batch_format="pyarrow")
    )
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    out = attach_lookup(
        mins, supp, on="s_suppkey",
        left_cols={"pkey": pa.int64(), "price": pa.int64()},
        value_cols={"s_name": pa.string()},
        n_lookup_rows=_parquet_rows(sf_dir, "supplier"),
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": b.column("pkey"),
                "min_price": pa.array(
                    b.column("price").to_numpy(zero_copy_only=False) / 100.0
                ),
                "s_suppkey": b.column("s_suppkey"),
                "s_name": b.column("s_name"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_sole_supplier(sf_dir: str):
    """TPC-H Q21 shape ("suppliers who kept orders waiting", adapted to
    the shipped columns: suppliers who were the SOLE supplier on
    multi-line orders, counted per supplier). The same-table
    EXISTS/NOT-EXISTS pair collapses into per-order aggregates inside ONE
    hash(orderkey) bucket group (an order's lines colocate, so line and
    distinct-supplier counts are global); per-supplier counts pre-combine
    in-group before one ``bucketed_sum``, then the supplier name attaches
    via the thresholded lookup. -> (s_suppkey, s_name, numwait)."""
    import ray.data as rd

    from raylink.join import attach_lookup, bucketed_sum
    from raylink.util import splitmix64

    B = np.uint64(64)

    def li_f(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        # per-batch pre-combine: distinct (order, supp) pairs + line counts
        order = np.lexsort((sk, ok))
        ok, sk = ok[order], sk[order]
        first = np.ones(len(ok), bool)
        first[1:] = (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])
        starts = np.flatnonzero(first)
        cnt = np.diff(np.append(starts, len(ok)))
        return pa.table(
            {
                "ob": pa.array(
                    (splitmix64(ok[starts].astype(np.uint64)) % B).astype(np.int32)
                ),
                "okey": pa.array(ok[starts]),
                "skey": pa.array(sk[starts]),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    def per_order(g: pa.Table) -> pa.Table:
        ok = g.column("okey").to_numpy(zero_copy_only=False)
        sk = g.column("skey").to_numpy(zero_copy_only=False)
        cn = g.column("cnt").to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, ok))
        ok, sk, cn = ok[order], sk[order], cn[order]
        # collapse duplicate (okey, skey) partials from different batches
        pf = np.ones(len(ok), bool)
        pf[1:] = (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])
        pstart = np.flatnonzero(pf)
        pcnt = np.add.reduceat(cn, pstart) if len(ok) else cn[:0]
        pok, psk = ok[pstart], sk[pstart]
        # per-order: number of distinct suppliers + total line count
        of = np.ones(len(pok), bool)
        of[1:] = pok[1:] != pok[:-1]
        ostart = np.flatnonzero(of)
        nsupp = np.diff(np.append(ostart, len(pok)))
        nlines = np.add.reduceat(pcnt, ostart) if len(pok) else pcnt[:0]
        solo = (nsupp == 1) & (nlines >= 2)
        winners = psk[ostart[solo]]
        uk, cts = np.unique(winners, return_counts=True)
        return pa.table(
            {"skey": pa.array(uk), "n": pa.array(cts.astype(np.int64))}
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    per_supp = bucketed_sum(
        li.map_batches(li_f, batch_format="pyarrow")
        .groupby("ob")
        .map_groups(per_order, batch_format="pyarrow"),
        key="skey", val="n", out_val="numwait",
    )
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    out = attach_lookup(
        per_supp.map_batches(
            lambda b: pa.table(
                {"s_suppkey": b.column("skey"), "numwait": b.column("numwait")}
            ),
            batch_format="pyarrow",
        ),
        supp, on="s_suppkey",
        left_cols={"numwait": pa.int64()},
        value_cols={"s_name": pa.string()},
        n_lookup_rows=_parquet_rows(sf_dir, "supplier"),
    )
    return out


def q_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape ("discounted revenue"): revenue under an OR of
    three (brand, size, quantity-window) branch predicates. Shape: the
    part dimension folds into ONE int8 branch code per partkey (branches
    are exclusive — a part has one brand), attached onto the fact scan via
    the thresholded lookup; the disjunction is a vectorized mask over
    (branch, quantity); integer cents partials -> one scalar.
    -> one row (revenue)."""
    import ray.data as rd

    from raylink.join import attach_lookup

    BRANCHES = (  # (brand, max_size, qty_lo, qty_hi)
        ("Brand#12", 15, 1, 11),
        ("Brand#23", 25, 10, 20),
        ("Brand#34", 35, 20, 30),
    )

    def p_f(b: pa.Table) -> pa.Table:
        brand = b.column("p_brand").to_pandas().to_numpy(dtype=object)
        size = b.column("p_size").to_numpy(zero_copy_only=False)
        code = np.zeros(len(b), np.int64)
        for i, (br, mx, _, _) in enumerate(BRANCHES, start=1):
            code[(brand == br) & (size <= mx)] = i
        return pa.table({"p_partkey": b.column("p_partkey"), "branch": pa.array(code)})

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    ).map_batches(p_f, batch_format="pyarrow")

    def li_f(b: pa.Table) -> pa.Table:
        dc = _cents(b.column("l_discount"))
        rev = _cents(b.column("l_extendedprice")) * (100 - dc)
        qty = np.rint(
            b.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        return pa.table(
            {
                "p_partkey": b.column("l_partkey"),
                "rev": pa.array(rev),
                "qty": pa.array(qty),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_quantity"],
    ).map_batches(li_f, batch_format="pyarrow")
    att = attach_lookup(
        li, part, on="p_partkey",
        left_cols={"rev": pa.int64(), "qty": pa.int64()},
        value_cols={"branch": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "part"),
    )

    def partial(b: pa.Table) -> pa.Table:
        br = b.column("branch").to_numpy(zero_copy_only=False)
        qty = b.column("qty").to_numpy(zero_copy_only=False)
        rev = b.column("rev").to_numpy(zero_copy_only=False)
        keep = np.zeros(len(b), bool)
        for i, (_, _, lo, hi) in enumerate(BRANCHES, start=1):
            keep |= (br == i) & (qty >= lo) & (qty <= hi)
        return pa.table(
            {"s": pa.array([int(rev[keep].sum())], type=pa.int64())}
        )

    total = int(att.map_batches(partial, batch_format="pyarrow").sum("s"))
    return pa.table(
        {"revenue": pa.array([total / 10000.0], type=pa.float64())}
    )


def q_ship_delay_priority(sf_dir: str):
    """TPC-H Q12 shape ("shipping modes and order priority", adapted to
    the shipped columns: no l_shipmode/commitdate/receiptdate, so the
    class attribute is the order->ship latency — 'late' when the line
    shipped more than 90 days after the order, else 'quick'): per class,
    how many lines belong to high-priority (1-URGENT / 2-HIGH) vs
    low-priority orders. Shape: scanner-filtered 1997 fact scan, the order
    dimension folded to TWO int64 columns (epoch-day + priority bit)
    before the thresholded lookup attaches it, per-batch 2x2 bincount
    partials, ONE 4-scalar Dataset aggregate — O(1) on the driver.
    -> (ship_class, high_line_count, low_line_count), 2 rows."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import attach_lookup

    d0 = pa.scalar(np.datetime64("1997-01-01", "us").item(), type=pa.timestamp("us"))
    d1 = pa.scalar(np.datetime64("1998-01-01", "us").item(), type=pa.timestamp("us"))

    def o_f(b: pa.Table) -> pa.Table:
        pri = b.column("o_orderpriority")
        high = pc.or_(
            pc.equal(pri, pa.scalar("1-URGENT")), pc.equal(pri, pa.scalar("2-HIGH"))
        ).to_numpy(zero_copy_only=False)
        odays = (
            b.column("o_orderdate")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "odays": pa.array(odays),
                "high": pa.array(high.astype(np.int64)),
            }
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(o_f, batch_format="pyarrow")

    def li_f(b: pa.Table) -> pa.Table:
        t = b.filter(
            pc.and_(pc.greater_equal(b.column("l_shipdate"), d0),
                    pc.less(b.column("l_shipdate"), d1))
        )
        sdays = (
            t.column("l_shipdate")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        return pa.table(
            {"o_orderkey": t.column("l_orderkey"), "sdays": pa.array(sdays)}
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"],
        filter=(pc.field("l_shipdate") >= d0) & (pc.field("l_shipdate") < d1),
    ).map_batches(li_f, batch_format="pyarrow")
    att = attach_lookup(
        li, orders, on="o_orderkey",
        left_cols={"sdays": pa.int64()},
        value_cols={"odays": pa.int64(), "high": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "orders"),
    )

    def partial(b: pa.Table) -> pa.Table:
        late = (
            b.column("sdays").to_numpy(zero_copy_only=False)
            - b.column("odays").to_numpy(zero_copy_only=False)
        ) > 90
        high = b.column("high").to_numpy(zero_copy_only=False).astype(bool)
        c = np.bincount(2 * late.astype(np.int64) + high, minlength=4)
        return pa.table(
            {
                "qh": pa.array([int(c[1])], type=pa.int64()),
                "ql": pa.array([int(c[0])], type=pa.int64()),
                "lh": pa.array([int(c[3])], type=pa.int64()),
                "ll": pa.array([int(c[2])], type=pa.int64()),
            }
        )

    s = att.map_batches(partial, batch_format="pyarrow").sum(
        ["qh", "ql", "lh", "ll"]
    )
    return pa.table(
        {
            "ship_class": pa.array(["late", "quick"]),
            "high_line_count": pa.array(
                [int(s["sum(lh)"]), int(s["sum(qh)"])], type=pa.int64()
            ),
            "low_line_count": pa.array(
                [int(s["sum(ll)"]), int(s["sum(ql)"])], type=pa.int64()
            ),
        }
    )


def q_excess_suppliers(sf_dir: str):
    """TPC-H Q20 shape ("potential part promotion", adapted: no partsupp
    availability column, so 'excess' is a fixed shipped-quantity bar):
    suppliers who shipped more than 45 units of some 'small%'-named part
    during 1997, with their nation — the nested-semi-join pyramid. Shape:
    the part-name filter broadcast as a distinct-key SEMI-join onto the
    scanner-filtered fact scan (zero shuffles), per-batch (supp, part)
    qty pre-combine, ONE hash(supp) bucket groupby (a supplier's pairs
    colocate, so the per-pair sums and the per-supplier DISTINCT are both
    global), then supplier + nation names attach via thresholded lookups.
    -> (s_suppkey, s_name, n_name)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.join import attach_lookup, semi_join
    from raylink.util import splitmix64

    B = np.uint64(64)
    d0 = pa.scalar(np.datetime64("1997-01-01", "us").item(), type=pa.timestamp("us"))
    d1 = pa.scalar(np.datetime64("1998-01-01", "us").item(), type=pa.timestamp("us"))

    small = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    ).map_batches(
        lambda b: pa.table(
            {"l_partkey": b.filter(
                pc.starts_with(b.column("p_name"), "small")
            ).column("p_partkey")}
        ),
        batch_format="pyarrow",
    )

    def li_f(b: pa.Table) -> pa.Table:
        t = b.filter(
            pc.and_(pc.greater_equal(b.column("l_shipdate"), d0),
                    pc.less(b.column("l_shipdate"), d1))
        )
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = np.rint(
            t.column("l_quantity").to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        # per-batch (supp, part) qty pre-combine
        order = np.lexsort((pk, sk))
        sk, pk, qty = sk[order], pk[order], qty[order]
        first = np.ones(len(sk), bool)
        first[1:] = (sk[1:] != sk[:-1]) | (pk[1:] != pk[:-1])
        starts = np.flatnonzero(first)
        qsum = np.add.reduceat(qty, starts) if len(sk) else qty[:0]
        return pa.table(
            {
                "l_partkey": pa.array(pk[starts]),
                "skey": pa.array(sk[starts]),
                "qty": pa.array(qsum),
            }
        )

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_shipdate"],
        filter=(pc.field("l_shipdate") >= d0) & (pc.field("l_shipdate") < d1),
    ).map_batches(li_f, batch_format="pyarrow")
    matched = semi_join(
        li, small, on="l_partkey",
        left_cols={"skey": pa.int64(), "qty": pa.int64()},
        n_key_rows=_parquet_rows(sf_dir, "part"),
    )

    def bucket(b: pa.Table) -> pa.Table:
        sk = b.column("skey").to_numpy(zero_copy_only=False)
        return b.append_column(
            "sb", pa.array((splitmix64(sk.astype(np.uint64)) % B).astype(np.int32))
        )

    def winners(g: pa.Table) -> pa.Table:
        sk = g.column("skey").to_numpy(zero_copy_only=False)
        pk = g.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = g.column("qty").to_numpy(zero_copy_only=False)
        order = np.lexsort((pk, sk))
        sk, pk, qty = sk[order], pk[order], qty[order]
        first = np.ones(len(sk), bool)
        first[1:] = (sk[1:] != sk[:-1]) | (pk[1:] != pk[:-1])
        starts = np.flatnonzero(first)
        qsum = np.add.reduceat(qty, starts) if len(sk) else qty[:0]
        hits = np.unique(sk[starts][qsum > 45])
        return pa.table({"s_suppkey": pa.array(hits)})

    supps = (
        matched.map_batches(bucket, batch_format="pyarrow")
        .groupby("sb")
        .map_groups(winners, batch_format="pyarrow")
    )
    supplier = rd.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey"],
    ).map_batches(
        lambda b: b.rename_columns(["s_suppkey", "s_name", "n_nationkey"]),
        batch_format="pyarrow",
    )
    named = attach_lookup(
        supps, supplier, on="s_suppkey",
        left_cols={},
        value_cols={"s_name": pa.string(), "n_nationkey": pa.int64()},
        n_lookup_rows=_parquet_rows(sf_dir, "supplier"),
    )
    nation = rd.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    out = attach_lookup(
        named, nation, on="n_nationkey",
        left_cols={"s_suppkey": pa.int64(), "s_name": pa.string()},
        value_cols={"n_name": pa.string()},
        n_lookup_rows=_parquet_rows(sf_dir, "nation"),
    )
    return out.map_batches(
        lambda b: b.select(["s_suppkey", "s_name", "n_name"]),
        batch_format="pyarrow",
    )


def q_kmeans(sf_dir: str):
    """Distributed Lloyd k-means over the embedding corpus (k=8, 3 centroid
    updates + final hard assignment) — the clustering stage of semantic
    curation (cluster-then-filter / SemDeDup-style pipelines). INTEGER-
    EXACT end to end (fixed-point quantization, int64 distances, pure-
    integer centroid rounding), so the unrolled SQL oracle matches
    bit-for-bit; see ops.similarity.kmeans_lloyd for the scale shape
    (broadcast centroids, k x (dim+1) int64 partial rows per batch,
    bounded combine tree, O(k x dim) driver state).
    -> (vec_id, cluster)."""
    import ray.data as rd

    from raylink.ops.similarity import kmeans_lloyd

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return kmeans_lloyd(emb, k=8, rounds=3)


def q_semantic_dedup(sf_dir: str):
    """SemDeDup-style semantic near-dup pruning (cluster with Lloyd
    k-means, then inside each cluster drop every vector with a
    smaller-vec_id neighbor within int64 squared-L2 ``tau``) — the
    embedding sibling of dedup_exact/dedup_minhash; see
    ops.similarity.semantic_dedup for the scale contract (quadratic term
    bounded per cluster; k grows with the corpus).
    -> (vec_id, cluster) survivors."""
    import ray.data as rd

    from raylink.ops.similarity import semantic_dedup

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return semantic_dedup(emb, k=8, rounds=3)


def q_neighbor_jaccard(sf_dir: str):
    """Jaccard link prediction: top-50 non-adjacent page pairs by
    neighbourhood Jaccard in int64 fixed point ((JAC_SCALE * common) //
    (deg_u + deg_w - common)) — the degree-normalized sibling of
    link_prediction/resource_alloc (common-neighbour counts alone rank
    hub pairs first; Jaccard ranks by overlap FRACTION)."""
    from raylink.algos.triangles import neighbor_jaccard

    _, edges, _, _ = page_edge_tables(sf_dir)
    return neighbor_jaccard(edges, k=50)


def q_event_trigrams(sf_dir: str):
    """Clickstream path motifs: counts of every run of three consecutive
    event types over per-user (ts, event_id)-ordered sequences — the
    3-gram sibling of event_transitions (funnel discovery)."""
    import ray.data as rd

    from raylink.ops.windows import event_trigrams

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    return event_trigrams(ev)


SPLIT_SEED = 17
SPLIT_BOUNDS = (80, 90)


def q_train_split(sf_dir: str):
    """Deterministic train/val/test split audit: every doc is assigned by
    splitmix64(doc_id ^ 17) % 100 (< 80 train, < 90 val, else test) and
    the per-(source, split) doc counts + char sums are reported — the
    dataset-versioning step before packing; the hash IS the coin, so the
    assignment is stable under any partitioning/replay."""
    import ray.data as rd

    from raylink.ops.select import train_split

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    return train_split(docs, seed=SPLIT_SEED, bounds=SPLIT_BOUNDS)


def q_degree_gini(sf_dir: str):
    """Gini coefficient of the undirected distinct-neighbour degree
    distribution over edge-incident pages — the one-number
    hub-concentration summary of the degree power law (exact int64
    numerator/denominator + floor-scaled integer; no float boundary)."""
    from raylink.pipelines import degree_gini

    _, edges, _, _ = page_edge_tables(sf_dir)
    return degree_gini(edges)


def q_pca_project(sf_dir: str):
    """1-D PCA reduce of the embedding corpus: integer power iteration on
    the exact int64 Gram matrix (uncentered), then every vector's exact
    integer projection onto the resulting direction — spectral ordering /
    dominant-axis diagnostics with no float on the engine/oracle
    boundary."""
    import ray.data as rd

    from raylink.ops.similarity import pca_project

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return pca_project(emb, rounds=12)


def q_crawl_frontier(sf_dir: str):
    """Crawl-frontier prioritization: top-100 unfetched pages (planted
    fetch membership vid % 4 != 1) by distinct in-links from fetched
    pages — the what-to-fetch-next scheduling pass."""
    from raylink.pipelines import frontier_rank

    _, edges, _, _ = page_edge_tables(sf_dir)
    return frontier_rank(edges, fetched_mod=4, fetched_res=1, k=100)


def q_lang_fertility(sf_dir: str):
    """Per-language tokenizer-fertility audit: doc counts, exact RE2 token
    totals and utf8 char totals per lang — the chars-per-token comparison
    behind tokenizer/vocab allocation in a training mix."""
    import ray.data as rd

    from raylink.ops.textstats import lang_fertility

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    )
    return lang_fertility(docs)


def q_kmeans_inertia(sf_dir: str):
    """Per-cluster k-means quality: member counts + exact int64
    within-cluster squared-error sums against the final Lloyd centroids —
    the elbow/convergence audit of the clustering stage."""
    import ray.data as rd

    from raylink.ops.similarity import kmeans_inertia

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return kmeans_inertia(emb, k=8, rounds=3)


def q_cluster_labels(sf_dir: str):
    """Cluster x label contingency of the Lloyd assignment vs the corpus
    label column — the purity / external-evaluation audit."""
    import ray.data as rd

    from raylink.ops.similarity import cluster_label_counts

    emb = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
    )
    return cluster_label_counts(emb, k=8, rounds=3)


# ------------------------------------------------------------- r4 wave 14
def q_lexical_diversity(sf_dir: str):
    """Vocabulary-richness profile per document (type/token counts, hapax
    count, Yule's-K repeat mass) — integer-exact, one streaming actor-pool
    pass, zero shuffle."""
    from raylink.ops.textstats import lexical_diversity

    return lexical_diversity(_docs(sf_dir))


def q_window_topk(sf_dir: str):
    """Windowed heavy hitters: per tumbling hour, the top-3 event types by
    count — per-batch bincount partials, one bounded combine tree, in-group
    top-k."""
    import ray.data as rd

    from raylink.ops.windows import window_topk

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )
    return window_topk(ev, size_sec=3600, k=3)


def q_quantized_knn(sf_dir: str):
    """Int8 scalar-quantized brute kNN (the 4x-memory embedding-search
    scale path): exact integer dot products over per-vector max-abs
    quantization; broadcast query matrix, per-batch local top-k, bounded
    merge."""
    from raylink.ops.similarity import quantized_knn

    return quantized_knn(_emb(sf_dir), query_ids=list(range(10)), k=5)


def q_knn_graph(sf_dir: str):
    """Exact kNN GRAPH construction (k=3 for every vector) — the building
    block of graph-based ANN indexes and agglomerative clustering; block-
    pair replication, per-group local top-k, one groupby merge. O(N^2)
    compute because exact; ``knn_join`` is the approximate scale path."""
    from raylink.ops.similarity import knn_all

    return knn_all(_emb(sf_dir), k=3)


def q_knn_outliers(sf_dir: str):
    """kNN outlier detection (Ramaswamy): the 20 vectors with the lowest
    3rd-nearest-neighbor cosine — off-distribution document flagging for
    curation; knn_graph + distributed sort + limit."""
    from raylink.ops.similarity import knn_outliers

    return knn_outliers(_emb(sf_dir), k=3, top_n=20)


def q_mmr_rerank(sf_dir: str):
    """Maximal-Marginal-Relevance diversified top-5 from the 20 nearest
    candidates of query vector 0 (lambda=0.7) — retrieval reranking with a
    diversity penalty; distributed candidate scan, bounded greedy."""
    from raylink.ops.similarity import mmr_rerank

    return mmr_rerank(_emb(sf_dir), query_id=0, n_candidates=20, k=5)


def q_two_hop_sizes(sf_dir: str):
    """Exact 2-hop neighbourhood size per edge-incident page — the local
    influence-radius feature (hyperanf's exact round-2 sibling); wedge
    generation + coarse-bucket distinct + per-vertex sum."""
    from raylink.algos.triangles import two_hop_sizes

    _, edges, _, _ = page_edge_tables(sf_dir)
    return two_hop_sizes(edges)


def q_coarsen(sf_dir: str):
    """Heavy-edge-matching graph coarsening (multilevel-partitioning
    primitive): contract the maximal matching's pairs to min-vid
    representatives over the undirected page graph -> (csrc, cdst, weight)
    parallel-edge-summed coarse edges; reuses q_matching's checkpointed
    BSP result."""
    from raylink.algos.matching import coarsen_graph, maximal_matching

    g = page_graph(sf_dir, directed=False)
    _, matched = maximal_matching(
        g=g, max_rounds=MATCH_ROUNDS, engine="tasks",
        ckpt_dir=_ckpt("matching", sf_dir),
    )
    _, edges, _, _ = page_edge_tables(sf_dir)
    return coarsen_graph(edges, matched)


def q_bowtie(sf_dir: str):
    """Bow-tie decomposition of the directed page graph (Broder WWW 2000):
    every page labeled CORE / IN / OUT / TUBE / TENDRIL / OTHER /
    DISCONNECTED relative to the largest SCC. Composition: checkpointed
    SCC + CC results, four supersource-BFS reachability legs, one
    coarse-bucket classification shuffle (algos/bowtie.py)."""
    from raylink.algos import connected_components
    from raylink.algos.bowtie import bowtie
    from raylink.algos.scc import scc

    _, sccs = scc(g=_dual_graph(sf_dir), ckpt_dir=_ckpt("scc", sf_dir),
                  engine="tasks")
    g = page_graph(sf_dir, directed=False)
    _, comps = connected_components(
        g=g, ckpt_dir=_ckpt("cc", sf_dir), engine="tasks"
    )
    _, edges, _, _ = page_edge_tables(sf_dir)
    de = distinct_edges(edges).materialize()  # consumed by 4 reach legs
    return bowtie(de, sccs, comps, ckpt_root=_ckpt("bowtie", sf_dir))


def q_cocitation(sf_dir: str):
    """Co-citation similarity (Small 1973): top-50 page pairs by the
    number of pages that link to BOTH — the inbound-wedge sibling of
    link_prediction; directed wedge generation + coarse-bucket pair sum."""
    from raylink.algos.triangles import cocitation_pairs

    _, edges, _, _ = page_edge_tables(sf_dir)
    return cocitation_pairs(edges, k=50, mode="cocitation")


def q_bibcoupling(sf_dir: str):
    """Bibliographic coupling (Kessler 1963): top-50 page pairs by the
    number of pages BOTH link to — the outbound-wedge dual of
    cocitation."""
    from raylink.algos.triangles import cocitation_pairs

    _, edges, _, _ = page_edge_tables(sf_dir)
    return cocitation_pairs(edges, k=50, mode="bibcoupling")


def q_bipartite(sf_dir: str):
    """Per-component bipartiteness (odd-cycle detection) via BFS-layer
    parity over the checkpointed spanning forest — one distributed edge
    scan + per-component sum."""
    from raylink.algos import spanning_forest
    from raylink.algos.spanning import bipartite_components

    g = page_graph(sf_dir, directed=False)
    _, forest = spanning_forest(g=g, ckpt_dir=_ckpt("forest", sf_dir))
    _, edges, _, _ = page_edge_tables(sf_dir)
    return bipartite_components(edges, forest.materialize())


def q_kcenter(sf_dir: str):
    """Greedy k-center coreset selection (Gonzalez farthest-point, k=8
    from vec_id 0) — diversity sampling for subset selection; k
    distributed scans, one winning row per step on the driver."""
    from raylink.ops.similarity import kcenter_select

    return kcenter_select(_emb(sf_dir), k=8, start_id=0)


def q_crawl_schedule(sf_dir: str):
    """Politeness-aware crawl scheduling: per-host fetch slots for the
    unfetched frontier, priority = distinct in-links from fetched pages —
    one wave per slot, one request per host per wave."""
    from raylink.pipelines import crawl_schedule

    _, edges, _, _ = page_edge_tables(sf_dir)
    return crawl_schedule(edges, fetched_mod=4, fetched_res=1, host_mod=97)


def q_spam_mass(sf_dir: str):
    """Spam mass (Gyongyi et al., TrustRank VLDB 2004): the fraction of a
    page's PageRank NOT explained by trust flowing from the trusted seed
    set — spam_mass = (pr - trust)/pr where trust = the mean of the
    per-seed personalized-PageRank columns (teleport uniform over the
    seeds, by linearity). Reuses the checkpointed q_pagerank and q_ppr BSP
    results; ONE distributed hash join + a vectorized ratio — the classic
    web-spam demotion signal."""
    from raylink.join import hash_join

    pr = q_pagerank(sf_dir)
    ppr = q_ppr(sf_dir)
    nseeds = len(HARMONIC_SEEDS)
    joined = hash_join(
        ppr, pr, on="vid",
        left_cols={f"r{i}": pa.float64() for i in range(nseeds)},
        right_cols={"rank": pa.float64()},
    )

    def sm(batch: pa.Table) -> pa.Table:
        p = batch.column("rank").to_numpy(zero_copy_only=False)
        t = batch.column("r0").to_numpy(zero_copy_only=False).copy()
        for i in range(1, nseeds):
            t = t + batch.column(f"r{i}").to_numpy(zero_copy_only=False)
        trust = round_half_away(t / float(nseeds), 8)
        mass = round_half_away((p - trust) / p, 6)
        return pa.table(
            {"vid": batch.column("vid"), "pr": pa.array(p),
             "trust": pa.array(trust), "spam_mass": pa.array(mass)}
        )

    return joined.map_batches(sm, batch_format="pyarrow")


def q_effective_diameter(sf_dir: str):
    """Seed-sampled effective diameter (90th-percentile reachable-pair hop
    distance) — resumes the harmonic/closeness MultiSourceBFS checkpoints;
    all-integer threshold arithmetic, one scalar row."""
    from raylink.algos.centrality import effective_diameter_of_seeds

    g = page_graph(sf_dir, directed=True)
    return effective_diameter_of_seeds(
        g, HARMONIC_SEEDS, engine="tasks",
        ckpt_dir=_ckpt("harmonic", sf_dir, *HARMONIC_SEEDS),
    )


def q_distinctive_terms(sf_dir: str):
    """Per-source distinctive vocabulary: top-10 words per source by int64
    fixed-point chi-squared association — the training-mix composition
    audit; one word-hash bucket shuffle."""
    import ray.data as rd

    from raylink.ops.textstats import distinctive_terms

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    return distinctive_terms(docs, k=10)


def q_late_events(sf_dir: str):
    """Watermark-style late-data audit: per-user arrival-order skew vs the
    running event-time watermark, late = skew > 300 s; one user-bucket
    shuffle, all-integer."""
    import ray.data as rd

    from raylink.ops.windows import late_events

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    return late_events(ev, allowed_lateness_sec=300)


def q_global_clustering(sf_dir: str):
    """Global clustering coefficient (transitivity): 3*triangles / wedges
    with wedges = sum d*(d-1)/2 over undirected distinct-neighbour
    degrees, reported in int64 fixed point gcc = (3*T*10^9) // W — the
    one-number triadic-closure summary next to the per-vertex
    clustering_coeff. Distributed triangle count + per-batch wedge
    partials; three scalars on the driver."""
    from raylink.algos import triangle_count
    from raylink.algos.triangles import _distinct_and_degrees

    _, edges, _, _ = page_edge_tables(sf_dir)
    t = triangle_count(edges)
    _, deg_ds = _distinct_and_degrees(edges)

    def wpart(batch: pa.Table) -> pa.Table:
        d = batch.column("deg").to_numpy(zero_copy_only=False)
        return pa.table(
            {"w": pa.array([int((d * (d - 1) // 2).sum())], type=pa.int64())}
        )

    w = int(deg_ds.map_batches(wpart, batch_format="pyarrow").sum("w"))
    gcc = (3 * t * 10**9) // w if w else 0
    return pa.table(
        {"triangles": pa.array([t], type=pa.int64()),
         "wedges": pa.array([w], type=pa.int64()),
         "gcc": pa.array([gcc], type=pa.int64())}
    )


def q_partition_skew(sf_dir: str):
    """Partition-balance observability for the P=8 'mod' partitioner:
    per-partition vertex and src-side distinct-edge counts — the skew
    audit behind every shuffle-sizing decision; per-batch bincount
    partials, one bounded combine tree."""
    from raylink.join import tree_groupby_sum
    from raylink.oracles_sql import P

    _, edges, verts, _ = page_edge_tables(sf_dir)
    de = distinct_edges(edges)

    def vpart(batch: pa.Table) -> pa.Table:
        v = batch.column("vid").to_numpy(zero_copy_only=False)
        c = np.bincount(v % P, minlength=P).astype(np.int64)
        return pa.table(
            {"part": pa.array(np.arange(P, dtype=np.int64)),
             "nv": pa.array(c),
             "ne": pa.array(np.zeros(P, dtype=np.int64))}
        )

    def epart(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        c = np.bincount(s % P, minlength=P).astype(np.int64)
        return pa.table(
            {"part": pa.array(np.arange(P, dtype=np.int64)),
             "nv": pa.array(np.zeros(P, dtype=np.int64)),
             "ne": pa.array(c)}
        )

    rows = verts.map_batches(vpart, batch_format="pyarrow").union(
        de.map_batches(epart, batch_format="pyarrow")
    )
    agg = tree_groupby_sum(rows, ["part"], ["nv", "ne"])
    return agg.map_batches(
        lambda b: pa.table(
            {"part": b.column("part"),
             "n_vertices": b.column("sum(nv)"),
             "n_edges": b.column("sum(ne)")}
        ),
        batch_format="pyarrow",
    )


def q_blocklist_filter(sf_dir: str):
    """Blocklist phrase gate: per-doc non-overlapping hit counts for a
    fixed phrase list, blocked = total > 2; one streaming Arrow
    count_substring pass."""
    from raylink.ops.textstats import blocklist_filter

    return blocklist_filter(_docs(sf_dir))


def q_quality_ranks(sf_dir: str):
    """Rank/percentile transform of the TextStats quality score (RANK()
    tie semantics, fixed-point percentile) — score calibration before
    thresholding a filter at a target keep rate; grid-bounded histogram
    broadcast, one streaming lookup pass."""
    from raylink.ops.textstats import quality_ranks

    return quality_ranks(_docs(sf_dir))


def q_directed_triangles(sf_dir: str):
    """Directed 3-cycle (feedback-loop) count over the DIRECTED page graph
    — the motif the undirected triangle_count collapses; each cycle counted
    once at its minimum vertex."""
    from raylink.algos.triangles import directed_triangles

    _, edges, _, _ = page_edge_tables(sf_dir)
    return directed_triangles(edges)


def q_local_bridges(sf_dir: str):
    """Local bridges (Granovetter 1973): undirected edges whose endpoints
    share NO common neighbour — removing one lengthens its endpoints'
    distance beyond 2; the classic weak-tie/community-boundary signal.
    Composition: ``edge_support`` (the k-truss primitive, 0-support rows
    included) filtered to support == 0 — no new shuffle shape."""
    import pyarrow.compute as pc

    from raylink.algos.triangles import edge_support

    _, edges, _, _ = page_edge_tables(sf_dir)
    sup = edge_support(edges)
    return sup.map_batches(
        lambda b: b.filter(pc.equal(b.column("support"), 0)).select(
            ["src", "dst"]
        ),
        batch_format="pyarrow",
    )


def q_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 shape ("suppliers who kept orders waiting", adapted to
    the synthetic schema: no commit/receipt dates, so late :=
    l_shipdate > o_orderdate + 90 days): for finished ('F') orders with
    >= 2 distinct suppliers where EXACTLY ONE supplier shipped late,
    charge that supplier one wait; report (s_name, n_name, numwait) for
    suppliers in region 0, top 100 by (numwait DESC, s_name).

    Shape: both fact tables hash-bucketed by orderkey and COGROUPED in one
    shuffle (orders rows ride tagged alongside lineitem rows — no separate
    hash-join pass); per-bucket vectorized per-order distinct-supplier /
    late-supplier analysis emits one credit row per qualifying order;
    ``bucketed_sum`` per supplier; nation+region names attached from the
    broadcast-sized dimension tables; distributed sort + limit 100."""
    import ray
    import ray.data as rd

    from raylink.join import bucketed_sum
    from raylink.util import splitmix64

    NB = np.uint64(64)
    LATE_US = np.int64(90 * 86400) * np.int64(1_000_000)

    def ord_rows(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        f = b.filter(pc.equal(b.column("o_orderstatus"), "F"))
        ok = f.column("o_orderkey").to_numpy(zero_copy_only=False)
        od = f.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "bkt": pa.array(
                    (splitmix64(ok.astype(np.uint64)) % NB).astype(np.int32)
                ),
                "okey": pa.array(ok),
                "a": pa.array(od),  # order date (us) on order rows
                "b": pa.array(np.full(len(ok), -1, dtype=np.int64)),
            }
        )

    def li_rows(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        sh = b.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array(
                    (splitmix64(ok.astype(np.uint64)) % NB).astype(np.int32)
                ),
                "okey": pa.array(ok),
                "a": pa.array(sh),  # ship date (us) on lineitem rows
                "b": pa.array(sk.astype(np.int64)),  # suppkey >= 0 tags li
            }
        )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_orderdate"],
    ).map_batches(ord_rows, batch_format="pyarrow")
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).map_batches(li_rows, batch_format="pyarrow")

    def per_order(group: pa.Table) -> pa.Table:
        ok = group.column("okey").to_numpy(zero_copy_only=False)
        a = group.column("a").to_numpy(zero_copy_only=False)
        sk = group.column("b").to_numpy(zero_copy_only=False)
        is_ord = sk < 0
        # order-date lookup for this bucket's 'F' orders
        o_keys = ok[is_ord]
        o_sort = np.argsort(o_keys, kind="stable")
        o_keys = o_keys[o_sort]
        o_dates = a[is_ord][o_sort]
        lk, ls, lsk = ok[~is_ord], a[~is_ord], sk[~is_ord]
        if len(o_keys) == 0 or len(lk) == 0:
            return pa.table({"skey": pa.array([], type=pa.int64()),
                             "w": pa.array([], type=pa.int64())})
        pos = np.searchsorted(o_keys, lk)
        hit = (pos < len(o_keys)) & (
            o_keys[np.minimum(pos, len(o_keys) - 1)] == lk
        )
        lk, ls, lsk, pos = lk[hit], ls[hit], lsk[hit], pos[hit]
        if len(lk) == 0:
            return pa.table({"skey": pa.array([], type=pa.int64()),
                             "w": pa.array([], type=pa.int64())})
        late = ls > o_dates[pos] + LATE_US
        # distinct (order, supplier) pairs with any-late flag
        order_ = np.lexsort((lsk, lk))
        lk, lsk, late = lk[order_], lsk[order_], late[order_]
        new = np.r_[True, (lk[1:] != lk[:-1]) | (lsk[1:] != lsk[:-1])]
        seg = np.cumsum(new) - 1
        p_ok = lk[new]
        p_sk = lsk[new]
        p_late = np.zeros(seg[-1] + 1, dtype=bool)
        np.logical_or.at(p_late, seg, late)
        # per order: distinct suppliers + distinct late suppliers
        onew = np.r_[True, p_ok[1:] != p_ok[:-1]]
        oseg = np.cumsum(onew) - 1
        n_ord = oseg[-1] + 1
        ns = np.bincount(oseg, minlength=n_ord)
        nl = np.bincount(oseg, weights=p_late.astype(np.int64),
                         minlength=n_ord).astype(np.int64)
        qual = (ns >= 2) & (nl == 1)
        credit = qual[oseg] & p_late
        w_sk = p_sk[credit]
        uk, cnt = np.unique(w_sk, return_counts=True)
        return pa.table({"skey": pa.array(uk),
                         "w": pa.array(cnt.astype(np.int64))})

    credits = (
        orders.union(li).groupby("bkt").map_groups(
            per_order, batch_format="pyarrow"
        )
    )
    waits = bucketed_sum(credits, key="skey", val="w", out_val="numwait")

    # region-0 supplier dimension (broadcast-sized: 10k rows/SF)
    import pyarrow.parquet as pq

    st = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name", "s_nationkey"]
    )
    nt = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    nk = nt.column("n_nationkey").to_numpy(zero_copy_only=False)
    nr = nt.column("n_regionkey").to_numpy(zero_copy_only=False)
    nn = np.asarray(nt.column("n_name").to_pylist(), dtype=object)
    n_sort = np.argsort(nk, kind="stable")
    nk, nr, nn = nk[n_sort], nr[n_sort], nn[n_sort]
    sk_ = st.column("s_suppkey").to_numpy(zero_copy_only=False)
    snk = st.column("s_nationkey").to_numpy(zero_copy_only=False)
    sn = np.asarray(st.column("s_name").to_pylist(), dtype=object)
    npos = np.searchsorted(nk, snk)
    keep = nr[npos] == 0
    s_sort = np.argsort(sk_[keep], kind="stable")
    dim_keys = sk_[keep][s_sort]
    dim_name = sn[keep][s_sort]
    dim_nation = nn[npos[keep]][s_sort]
    dim_ref = ray.put((dim_keys, dim_name, dim_nation))

    def attach(b: pa.Table) -> pa.Table:
        dk, dn, dna = ray.get(dim_ref)
        sk2 = b.column("skey").to_numpy(zero_copy_only=False)
        w = b.column("numwait").to_numpy(zero_copy_only=False)
        if len(dk) == 0:
            hit = np.zeros(len(sk2), dtype=bool)
            pos2 = np.zeros(len(sk2), dtype=np.int64)
        else:
            pos2 = np.searchsorted(dk, sk2)
            hit = (pos2 < len(dk)) & (
                dk[np.minimum(pos2, len(dk) - 1)] == sk2
            )
        pos2 = pos2[hit]
        return pa.table(
            {
                "s_name": pa.array(dn[pos2].tolist(), type=pa.string()),
                "n_name": pa.array(dna[pos2].tolist(), type=pa.string()),
                "numwait": pa.array(w[hit].astype(np.int64)),
            }
        )

    out = waits.map_batches(attach, batch_format="pyarrow")
    return out.sort(["numwait", "s_name"], descending=[True, False]).limit(100)


def q_assortativity_directed(sf_dir: str):
    """Directed out->in degree assortativity of the page graph — does
    linking-a-lot correlate with being-linked-a-lot (hub->authority
    structure the undirected coefficient symmetrizes away)."""
    from raylink.algos.triangles import directed_assortativity

    _, edges, _, _ = page_edge_tables(sf_dir)
    return directed_assortativity(edges)


def q_host_pr_mass(sf_dir: str):
    """Per-host PageRank mass concentration — SUM of page ranks by host
    plus each host's share of total mass: the link-farm / host-level
    demotion aggregate (distinct from q_host_rank, which ranks the
    COARSENED host graph). Float sums are pinned exactly: each rank is
    scaled to int64 pico-units (rank * 1e12, round half-away — the
    big_orders cents trick) BEFORE summing, so the per-host aggregation is
    integer-exact and order-independent on both engine and SQL sides.
    Reuses q_pagerank's checkpointed BSP result; one 97-ary groupby."""
    from raylink.algos import pagerank
    from raylink.join import tree_groupby_sum

    g = page_graph(sf_dir, directed=True)
    _, ranks = pagerank(
        g=g, iters=PR_ITERS, engine="tasks",
        ckpt_dir=_ckpt("pagerank", sf_dir, PR_ITERS),
    )

    def fp_rows(batch: pa.Table) -> pa.Table:
        vid = batch.column("vid").to_numpy(zero_copy_only=False)
        r = batch.column("rank").to_numpy(zero_copy_only=False)
        f = round_half_away(r * np.float64(1e12), 0).astype(np.int64)
        return pa.table(
            {"host": pa.array(vid % np.int64(97)), "f": pa.array(f)}
        )

    mass = tree_groupby_sum(
        ranks.map_batches(fp_rows, batch_format="pyarrow"), ["host"], ["f"]
    ).map_batches(
        lambda b: pa.table(
            {"host": b.column("host"), "mass_fp": b.column("sum(f)")}
        ),
        batch_format="pyarrow",
    ).materialize()
    tot = int(mass.sum("mass_fp") or 0)

    def share(batch: pa.Table) -> pa.Table:
        m = batch.column("mass_fp").to_numpy(zero_copy_only=False)
        s = round_half_away(
            m.astype(np.float64) / np.float64(tot), 6
        )
        return batch.append_column("share", pa.array(s))

    return mass.map_batches(share, batch_format="pyarrow")


def _link_host_diversity(sf_dir: str, vertex_col: str, other_col: str,
                         deg_name: str):
    """Shared engine for q_outlink_diversity / q_inlink_diversity (the two
    were ~140 near-duplicated lines, VERDICT r4 item 6): distinct
    (vertex, other-side-host) pairs vs distinct links per vertex,
    diversity = n_hosts/degree (r6). Host id is the synthetic site number
    (vid % 97 — the closed-form ``synth.url_of`` host). Shape: distinct
    edges (packable-guarded) -> packed (vertex, host) distinct -> two
    coarse-bucket count-sums -> one thresholded attach -> single
    ROUND-half-away-pinned division. -> (vid, <deg_name>, n_hosts,
    diversity)."""
    from raylink.join import attach_lookup, bucketed_distinct, bucketed_sum

    _, edges, _, _ = page_edge_tables(sf_dir)
    de = distinct_edges(edges).materialize()

    def pack(batch: pa.Table) -> pa.Table:
        v = batch.column(vertex_col).to_numpy(zero_copy_only=False)
        o = batch.column(other_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {"key": pa.array((v << np.int64(32)) | (o % np.int64(97)))}
        )

    sh = bucketed_distinct(
        de.map_batches(pack, batch_format="pyarrow"), "key"
    )

    def ones(col: str):
        def f(batch: pa.Table) -> pa.Table:
            if col == "key":
                v = batch.column("key").to_numpy(zero_copy_only=False) >> np.int64(32)
            else:
                v = batch.column(col).to_numpy(zero_copy_only=False)
            return pa.table(
                {"v": pa.array(v), "c": pa.array(np.ones(len(v), np.int64))}
            )

        return f

    deg = bucketed_sum(
        de.map_batches(ones(vertex_col), batch_format="pyarrow"),
        key="v", val="c", out_val=deg_name,
    ).map_batches(
        lambda b: pa.table({"vid": b.column("v"), deg_name: b.column(deg_name)}),
        batch_format="pyarrow",
    ).materialize()
    nhosts = bucketed_sum(
        sh.map_batches(ones("key"), batch_format="pyarrow"),
        key="v", val="c", out_val="n_hosts",
    ).map_batches(
        lambda b: pa.table({"vid": b.column("v"), "n_hosts": b.column("n_hosts")}),
        batch_format="pyarrow",
    )

    out = attach_lookup(
        nhosts, deg, on="vid", left_cols={"n_hosts": pa.int64()},
        value_cols={deg_name: pa.int64()}, n_lookup_rows=deg.count(),
    )

    def div(batch: pa.Table) -> pa.Table:
        h = batch.column("n_hosts").to_numpy(zero_copy_only=False)
        o = batch.column(deg_name).to_numpy(zero_copy_only=False)
        d = round_half_away(h.astype(np.float64) / o.astype(np.float64), 6)
        return pa.table(
            {
                "vid": batch.column("vid"),
                deg_name: pa.array(o.astype(np.int64)),
                "n_hosts": pa.array(h.astype(np.int64)),
                "diversity": pa.array(d),
            }
        )

    return out.map_batches(div, batch_format="pyarrow")


def q_outlink_diversity(sf_dir: str):
    """Per-page outlink host diversity — distinct target hosts vs distinct
    outlinks per source page, diversity = n_hosts/outdeg (r6): the
    link-farm smell test (spam pages concentrate outlinks on few hosts).
    -> (vid, outdeg, n_hosts, diversity); see _link_host_diversity."""
    return _link_host_diversity(sf_dir, "src", "dst", "outdeg")


def q_page_titles(sf_dir: str):
    """Per-page <title> text parsed from the raw HTML bytes (first title
    element, RE2-vectorized, no per-row Python) — crawl-metadata
    extraction next to the byte-contract body text."""
    from raylink.extract import extract_titles
    from raylink.synth import pages_dataset

    pages, _ = pages_dataset(sf_dir, include_golden=False)
    return pages.select_columns(["url", "html"]).map_batches(
        extract_titles, batch_format="pyarrow", batch_size=512
    )


def q_degree_inout_corr(sf_dir: str):
    """Per-vertex in/out degree correlation — Pearson of (out_degree,
    in_degree) across ALL vertices (zero-degree included): do pages that
    link a lot also GET linked a lot (a standard web-graph measurement
    next to the per-edge assortativity coefficients). Reuses
    ``degree_table``; one 5-scalar per-batch integer partial; final
    expression IEEE-pinned like directed_assortativity.
    -> one row (corr r6, n_vertices)."""
    _, edges, verts, _ = page_edge_tables(sf_dir)
    deg = degree_table(distinct_edges(edges), verts)

    def partial(batch: pa.Table) -> pa.Table:
        p = pearson_partials(
            batch.column("out_degree").to_numpy(zero_copy_only=False),
            batch.column("in_degree").to_numpy(zero_copy_only=False),
        )
        return pa.table({k: pa.array([v], type=pa.int64()) for k, v in p.items()})

    sums = deg.map_batches(partial, batch_format="pyarrow").sum(
        ["n", "sx", "sy", "sxy", "sxx", "syy"]
    )
    n = int(sums["sum(n)"] or 0)
    sx, sy = int(sums["sum(sx)"] or 0), int(sums["sum(sy)"] or 0)
    sxy = int(sums["sum(sxy)"] or 0)
    sxx, syy = int(sums["sum(sxx)"] or 0), int(sums["sum(syy)"] or 0)
    f1, f2 = n * sxx - sx * sx, n * syy - sy * sy
    if f1 == 0 or f2 == 0:
        r = 0.0
    else:
        den = np.sqrt(np.float64(f1) * np.float64(f2))
        r = float(round_half_away(np.float64(n * sxy - sx * sy) / den, 6))
    return pa.table(
        {
            "corr": pa.array([r], type=pa.float64()),
            "n_vertices": pa.array([n], type=pa.int64()),
        }
    )


def q_inlink_diversity(sf_dir: str):
    """Per-page inlink host diversity — distinct SOURCE hosts vs distinct
    inlinks per target page (the inbound mirror of q_outlink_diversity):
    authority earned from many hosts vs hammered from one — the inbound
    link-farm smell. -> (vid, indeg, n_hosts, diversity); see
    _link_host_diversity."""
    return _link_host_diversity(sf_dir, "dst", "src", "indeg")
