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
from raylink.queries.graph import q_pagerank, q_ppr  # noqa: F401


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


def q_host_link_locality(sf_dir: str):
    """Per-host intra-site link share over the distinct page edges — the
    site-insularity diagnostic; hosts parsed from URL strings with Arrow
    RE2, one host-cardinality groupby."""
    from raylink.pipelines import host_link_locality

    _, edges, _, _ = page_edge_tables(sf_dir)
    return host_link_locality(edges)


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


def q_crawl_frontier(sf_dir: str):
    """Crawl-frontier prioritization: top-100 unfetched pages (planted
    fetch membership vid % 4 != 1) by distinct in-links from fetched
    pages — the what-to-fetch-next scheduling pass."""
    from raylink.pipelines import frontier_rank

    _, edges, _, _ = page_edge_tables(sf_dir)
    return frontier_rank(edges, fetched_mod=4, fetched_res=1, k=100)


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


def q_sitemap_coverage(sf_dir: str):
    """Sitemap coverage audit: per-host sitemapindex (2-part, namespaced
    XML with CDATA and lastmod — parsed by the generic recursive expander
    in ops/sitemap.py) vs the crawled pages. -> (vid, host, in_sitemap);
    the fixture 'forgets' doc_id % 4 == 2, which the oracle mirrors."""
    from raylink.ops.sitemap import sitemap_coverage
    from raylink.synth import pages_dataset

    pages, n = pages_dataset(sf_dir, include_golden=False)
    return sitemap_coverage(pages.select_columns(["url"]), n)


def q_robots_filter(sf_dir: str):
    """RFC 9309 robots.txt compliance over the page corpus: per-host
    robots.txt (deterministic fixture text carrying wildcard + $-anchored
    Allow/Disallow rules and a per-bot override group) parsed and matched
    by the generic longest-match engine (ops/robots.py), rules compiled
    once and ray.put-broadcast. -> (vid, host, allowed); oracle mirrors the
    fixture's closed form."""
    from raylink.ops.robots import robots_filter
    from raylink.synth import pages_dataset

    pages, _ = pages_dataset(sf_dir, include_golden=False)
    return robots_filter(pages.select_columns(["url"]))


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


def q_inlink_diversity(sf_dir: str):
    """Per-page inlink host diversity — distinct SOURCE hosts vs distinct
    inlinks per target page (the inbound mirror of q_outlink_diversity):
    authority earned from many hosts vs hammered from one — the inbound
    link-farm smell. -> (vid, indeg, n_hosts, diversity); see
    _link_host_diversity."""
    return _link_host_diversity(sf_dir, "dst", "src", "indeg")
