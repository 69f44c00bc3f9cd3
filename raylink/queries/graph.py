from __future__ import annotations

import os  # noqa: F401

import numpy as np  # noqa: F401
import pyarrow as pa  # noqa: F401

from raylink.oracles_sql import P  # noqa: F401
from raylink.pipelines import (  # noqa: F401
    cache_key,
    degree_table,
    distinct_edges,
    page_edge_tables,
    page_graph,
)
from raylink.superstep import CKPT_ROOT  # noqa: F401
from raylink.util import pearson_partials, round_half_away  # noqa: F401

from raylink.queries._common import (  # noqa: F401
    PR_ITERS,
    HITS_ITERS,
    KATZ_ITERS,
    EIGEN_ITERS,
    HARMONIC_SEEDS,
    ANF_ROUNDS,
    DENSEST_SQL_ROUNDS,
    PPR_ITERS,
    WL_ROUNDS,
    LPA_COMMUNITY_ROUNDS,
    _SHIP_CUTOFF,
    _Q3_DATE,
    DSIR_TARGET,
    PERC_DIM,
    PERC_ROUNDS,
    MIX_SEED,
    GAP_QS,
    PACK_BUDGET,
    BOILER_MIN_DOCS,
    EGO_SEEDS,
    JP_ROUNDS,
    MATCH_ROUNDS,
    SPLIT_SEED,
    SPLIT_BOUNDS,
    _ckpt,
    _dual_graph,
    _cents,
    _parquet_rows,
    _docs,
    _plant_pii,
    _emb,
    _flatten_media_features,
    _planted_lines,
    _link_host_diversity,
)


def q_page_edges(sf_dir: str):
    _, edges, _, _ = page_edge_tables(sf_dir)
    return distinct_edges(edges)


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


def q_neighbor_jaccard(sf_dir: str):
    """Jaccard link prediction: top-50 non-adjacent page pairs by
    neighbourhood Jaccard in int64 fixed point ((JAC_SCALE * common) //
    (deg_u + deg_w - common)) — the degree-normalized sibling of
    link_prediction/resource_alloc (common-neighbour counts alone rank
    hub pairs first; Jaccard ranks by overlap FRACTION)."""
    from raylink.algos.triangles import neighbor_jaccard

    _, edges, _, _ = page_edge_tables(sf_dir)
    return neighbor_jaccard(edges, k=50)


def q_degree_gini(sf_dir: str):
    """Gini coefficient of the undirected distinct-neighbour degree
    distribution over edge-incident pages — the one-number
    hub-concentration summary of the degree power law (exact int64
    numerator/denominator + floor-scaled integer; no float boundary)."""
    from raylink.pipelines import degree_gini

    _, edges, _, _ = page_edge_tables(sf_dir)
    return degree_gini(edges)


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
