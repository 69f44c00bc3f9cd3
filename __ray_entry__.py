"""Driver contract for the raylink engine (Ray Data target).

``entry()`` runs the flagship pipeline (synthetic Common-Crawl-style pages ->
actor-pool HTML extraction -> edge table -> partitioned CSR build -> PageRank
to 1e-6 convergence) at sf0.001. ``queries()`` exposes every implemented
operator/pipeline (SURVEY.md §2 + training-data ops); ``oracle_sql()`` gives
the DuckDB-equivalent SQL for each SQL-expressible one (see
raylink/oracles_sql.py — iterative graph algorithms are mirrored with
unrolled/recursive CTEs over the closed-form synthetic link graph).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship: pages -> extract -> graph -> PageRank(eps=1e-6) at sf0.001.

    Returns a Dataset (url, vid, rank)."""
    import pyarrow as pa

    from raylink.pipelines import page_graph
    from raylink.algos import pagerank
    from raylink.queries import _ckpt
    from raylink.synth import urls_of

    sf = "/root/testdata/sf0.001"
    g = page_graph(sf, directed=True)
    _, ranks = pagerank(g=g, eps=1e-6, engine="tasks", ckpt_dir=_ckpt("entry_pagerank", sf))

    def add_url(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": urls_of(batch.column("vid")),
                "vid": batch.column("vid"),
                "rank": batch.column("rank"),
            }
        )

    return ranks.map_batches(add_url, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    from raylink import queries as q

    return {
        # graph engine over the synthetic page corpus
        "page_text": q.q_page_text,
        "warc_roundtrip": q.q_warc_roundtrip,
        "page_edges": q.q_page_edges,
        "pagerank": q.q_pagerank,
        "pagerank_converged": q.q_pagerank_converged,
        "weighted_pagerank": q.q_weighted_pagerank,
        "host_rank": q.q_host_rank,
        "host_top_pages": q.q_host_top_pages,
        "seeded_pagerank": q.q_seeded_pagerank,
        "incremental_pagerank": q.q_incremental_pagerank,
        "connected_components": q.q_connected_components,
        "scc": q.q_scc,
        "scc_sizes": q.q_scc_sizes,
        "wcc_sizes": q.q_wcc_sizes,
        "harmonic": q.q_harmonic,
        "closeness": q.q_closeness,
        "hyperanf": q.q_hyperanf,
        "ppr": q.q_ppr,
        "balanced_pagerank": q.q_balanced_pagerank,
        "host_vocab": q.q_host_vocab,
        "betweenness": q.q_betweenness,
        "label_propagation": q.q_label_propagation,
        "communities": q.q_communities,
        "modularity": q.q_modularity,
        "wl_classes": q.q_wl_classes,
        "densest": q.q_densest,
        "triangle_count": q.q_triangles,
        "four_cycles": q.q_four_cycles,
        "four_cliques": q.q_four_cliques,
        "degrees": q.q_degrees,
        "degree_histogram": q.q_degree_histogram,
        "clustering_coeff": q.q_clustering_coeff,
        "assortativity": q.q_assortativity,
        "edge_support": q.q_edge_support,
        "ktruss": q.q_ktruss,
        "random_walks": q.q_random_walks,
        "node2vec": q.q_node2vec,
        "walk_corpus": q.q_walk_corpus,
        "reciprocity": q.q_reciprocity,
        "robustness": q.q_robustness,
        "avg_neighbor_degree": q.q_avg_neighbor_degree,
        "subgraphs": q.q_subgraphs,
        "meta_graph": q.q_meta_graph,
        "sssp": q.q_sssp,
        "sssp_weighted": q.q_sssp_weighted,
        "kcore": q.q_kcore,
        "coreness": q.q_coreness,
        "coreness_montresor": q.q_coreness_montresor,
        "subgraph_rank": q.q_subgraph_rank,
        "graph_stats": q.q_graph_stats,
        "spanning_forest": q.q_spanning_forest,
        "meta_diameter": q.q_meta_diameter,
        "graph_kmeans": q.q_graph_kmeans,
        "cooccur_pagerank": q.q_cooccur_pagerank,
        "hits": q.q_hits,
        "katz": q.q_katz,
        "link_positions": q.q_link_positions,
        "dense_remap": q.q_dense_remap,
        "crawl_diff": q.q_crawl_diff,
        "graph_update": q.q_graph_update,
        "redirects": q.q_redirects,
        "url_canon": q.q_url_canon,
        "link_prediction": q.q_link_prediction,
        "mirrors": q.q_mirrors,
        "egonet": q.q_egonet,
        "mis": q.q_mis,
        "coloring": q.q_coloring,
        "matching": q.q_matching,
        "mst": q.q_mst,
        "negative_samples": q.q_negative_samples,
        # relational layer over the TPC-H-shaped tables
        "pricing_summary": q.q_pricing_summary,
        "shipping_priority": q.q_shipping_priority,
        "nation_revenue": q.q_nation_revenue,
        "order_priority": q.q_order_priority,
        "customers_no_urgent": q.q_customers_no_urgent,
        "customer_distribution": q.q_customer_distribution,
        "big_orders": q.q_big_orders,
        "part_profit": q.q_part_profit,
        "forecast_revenue": q.q_forecast_revenue,
        "brand_suppliers": q.q_brand_suppliers,
        "returned_revenue": q.q_returned_revenue,
        # training-data ops
        "dedup_exact": q.q_dedup_exact,
        "dedup_ngram": q.q_dedup_ngram,
        "containment": q.q_containment,
        "novelty": q.q_novelty,
        "dedup_minhash": q.q_dedup_minhash,
        "dedup_simhash": q.q_dedup_simhash,
        "token_count": q.q_token_count,
        "token_topk": q.q_token_topk,
        "search_topk": q.q_search_topk,
        "distinct_hll": q.q_distinct_hll,
        "cms_topk": q.q_cms_topk,
        "doc_top_terms": q.q_doc_top_terms,
        "dedup_clusters": q.q_dedup_clusters,
        "decontaminate": q.q_decontaminate,
        "bloom_decontaminate": q.q_bloom_decontaminate,
        "domain_stats": q.q_domain_stats,
        "curation_funnel": q.q_curation_funnel,
        "text_stats": q.q_text_stats,
        "quality_score": q.q_quality_score,
        "quality_filter": q.q_quality_filter,
        "corr_length_quality": q.q_corr_length_quality,
        "source_quality": q.q_source_quality,
        "lang_id": q.q_lang_id,
        "fingerprint": q.q_fingerprint,
        "doc_repetition": q.q_doc_repetition,
        "pack_windows": q.q_pack_windows,
        "chunk_docs": q.q_chunk_docs,
        "knn": q.q_knn,
        "ann_lsh": q.q_ann_lsh,
        "ann_ivf": q.q_ann_ivf,
        "ann_join": q.q_ann_join,
        "embedding_pairs": q.q_embedding_pairs,
        "embedding_pairs_lsh": q.q_embedding_pairs_lsh,
        "events_window": q.q_events_window,
        "events_sliding": q.q_events_sliding,
        "table_profile": q.q_table_profile,
        "dataset_checksum": q.q_dataset_checksum,
        "events_asof": q.q_events_asof,
        "events_range": q.q_events_range,
        "events_overlap": q.q_events_overlap,
        "funnel": q.q_funnel,
        "bigram_coherence": q.q_bigram_coherence,
        "bpe_merges": q.q_bpe_merges,
        "bpe_token_count": q.q_bpe_token_count,
        "repeated_substrings": q.q_repeated_substrings,
        "substring_pairs": q.q_substring_pairs,
        "events_latest": q.q_events_latest,
        "bigram_topk": q.q_bigram_topk,
        "postings": q.q_postings,
        "pii_scan": q.q_pii_scan,
        "pii_redact": q.q_pii_redact,
        "boilerplate": q.q_boilerplate,
        "cooccurrence": q.q_cooccurrence,
        "doc_sample": q.q_doc_sample,
        "source_topk": q.q_source_topk,
        "source_sample": q.q_source_sample,
        "length_quantiles": q.q_length_quantiles,
        "events_sessionize": q.q_events_sessionize,
        "cohort_retention": q.q_cohort_retention,
        "event_transitions": q.q_event_transitions,
        "media_features": q.q_media_features,
        "media_resize": q.q_media_resize,
        "media_frames": q.q_media_frames,
    }


def oracle_sql() -> dict[str, str]:
    from raylink import oracles_sql as o
    from raylink import queries as q

    return {
        "page_text": o.page_text_sql(),
        "warc_roundtrip": o.warc_roundtrip_sql(),
        "page_edges": o.page_edges_sql(),
        "link_positions": o.link_positions_sql(),
        "dense_remap": o.dense_remap_sql(),
        "crawl_diff": o.crawl_diff_sql(),
        "graph_update": o.graph_update_sql(),
        "redirects": o.redirects_sql(),
        "url_canon": o.url_canon_sql(),
        "link_prediction": o.link_prediction_sql(),
        "mirrors": o.mirrors_sql(),
        "egonet": o.egonet_sql(seeds=tuple(q.EGO_SEEDS), k=2),
        "mis": o.mis_sql(rounds=16, seed=0),
        "coloring": o.coloring_sql(rounds=q.JP_ROUNDS, seed=0),
        "matching": o.matching_sql(rounds=q.MATCH_ROUNDS),
        "mst": o.mst_sql(rounds=14),
        "negative_samples": o.negative_samples_sql(k=3, seed=0),
        "pricing_summary": o.pricing_summary_sql(),
        "shipping_priority": o.shipping_priority_sql(),
        "nation_revenue": o.nation_revenue_sql(),
        "order_priority": o.order_priority_sql(),
        "customers_no_urgent": o.customers_no_urgent_sql(),
        "customer_distribution": o.customer_distribution_sql(),
        "big_orders": o.big_orders_sql(),
        "part_profit": o.part_profit_sql(),
        "forecast_revenue": o.forecast_revenue_sql(),
        "brand_suppliers": o.brand_suppliers_sql(),
        "returned_revenue": o.returned_revenue_sql(),
        "pagerank": o.pagerank_sql(iters=30),
        "balanced_pagerank": o.pagerank_sql(iters=30),
        "host_vocab": o.host_vocab_sql(p=8),
        "pagerank_converged": o.pagerank_sql(iters=27),
        "weighted_pagerank": o.weighted_pagerank_sql(iters=20),
        "host_rank": o.host_rank_sql(iters=20),
        "host_top_pages": o.host_top_pages_sql(iters=30, k=3),
        "seeded_pagerank": o.seeded_pagerank_sql(iters=30),
        # incremental PR converges to the plain-PR fixpoint; same deep-
        # unrolled oracle + r6 tolerance argument as subgraph_rank
        "incremental_pagerank": o.subgraph_rank_sql(),
        "cooccur_pagerank": o.cooccur_pagerank_sql(iters=10),
        "hits": o.hits_sql(iters=8),
        "katz": o.katz_sql(iters=q.KATZ_ITERS, alpha=0.05, beta=1.0),
        "connected_components": o.cc_sql(),
        "scc": o.scc_sql(),
        "scc_sizes": o.scc_sizes_sql(),
        "wcc_sizes": o.wcc_sizes_sql(),
        "harmonic": o.harmonic_sql(seeds=tuple(q.HARMONIC_SEEDS)),
        "closeness": o.closeness_sql(seeds=tuple(q.HARMONIC_SEEDS)),
        "hyperanf": o.hyperanf_sql(p=6, rounds=q.ANF_ROUNDS),
        "ppr": o.ppr_sql(seeds=tuple(q.HARMONIC_SEEDS), iters=q.PPR_ITERS),
        "betweenness": o.betweenness_sql(seeds=tuple(q.HARMONIC_SEEDS)),
        "label_propagation": o.lpa_sql(),
        "communities": o.communities_sql(rounds=q.LPA_COMMUNITY_ROUNDS),
        "modularity": o.modularity_sql(rounds=q.LPA_COMMUNITY_ROUNDS),
        "wl_classes": o.wl_classes_sql(rounds=q.WL_ROUNDS),
        "densest": o.densest_sql(factor=3, rounds=q.DENSEST_SQL_ROUNDS),
        "triangle_count": o.triangles_sql(),
        "four_cycles": o.four_cycles_sql(),
        "four_cliques": o.four_cliques_sql(),
        "degrees": o.degrees_sql(),
        "degree_histogram": o.degree_histogram_sql(),
        "clustering_coeff": o.clustering_coeff_sql(),
        "assortativity": o.assortativity_sql(),
        "edge_support": o.edge_support_sql(),
        "ktruss": o.ktruss_sql(k=3, rounds=10),
        "random_walks": o.random_walks_sql(walk_len=6, seed=0),
        "reciprocity": o.reciprocity_sql(),
        "robustness": o.robustness_sql(k=10),
        "avg_neighbor_degree": o.avg_neighbor_degree_sql(),
        "node2vec": o.node2vec_sql(
            walk_len=6, w_return=1, w_common=4, w_far=2, seed=0
        ),
        "walk_corpus": o.walk_corpus_sql(
            walk_len=6, w_return=1, w_common=4, w_far=2, seed=0
        ),
        "subgraphs": o.subgraphs_sql(),
        "meta_graph": o.meta_graph_sql(),
        "sssp": o.sssp_sql(source=0),
        "graph_stats": o.graph_stats_sql(),
        "dedup_exact": o.dedup_exact_sql(),
        "dedup_ngram": o.ngram_pairs_sql(tau=0.5),
        "containment": o.containment_pairs_sql(n=3, tau=0.2),
        "novelty": o.novelty_sql(n=3),
        "dedup_minhash": o.dedup_minhash_sql(tau=0.5),
        "dedup_simhash": o.dedup_simhash_sql(max_hamming=3),
        "media_resize": o.media_resize_sql(),
        "media_frames": o.media_frames_sql(),
        "token_count": o.token_count_sql(),
        "token_topk": o.token_topk_sql(k=100),
        "search_topk": o.search_topk_sql(terms=("spark", "join", "window"), k=20),
        "distinct_hll": o.distinct_hll_sql(p=12),
        "cms_topk": o.cms_topk_sql(k=50),
        "doc_top_terms": o.doc_top_terms_sql(3),
        "dedup_clusters": o.dedup_clusters_sql(tau=0.5),
        "decontaminate": o.decontaminate_sql(n=8),
        "bloom_decontaminate": o.bloom_decontaminate_sql(n=8, m_bits=16, k=4),
        "domain_stats": o.domain_stats_sql(),
        "curation_funnel": o.curation_funnel_sql(),
        "text_stats": o.text_stats_sql(),
        "quality_score": o.quality_score_sql(),
        "quality_filter": o.quality_filter_sql(q=0.8),
        "corr_length_quality": o.corr_length_quality_sql(),
        "source_quality": o.source_quality_sql(),
        "lang_id": o.lang_id_sql(),
        "fingerprint": o.fingerprint_sql(),
        "doc_repetition": o.doc_repetition_sql(),
        "pack_windows": o.pack_windows_sql(budget=q.PACK_BUDGET),
        "knn": o.knn_sql(k=5, n_queries=10),
        "embedding_pairs": o.embedding_pairs_sql(tau=0.4),
        "events_window": o.events_window_sql(3600),
        "events_sliding": o.sliding_window_sql(size_sec=3600, slide_sec=900),
        "table_profile": o.table_profile_sql(),
        "dataset_checksum": o.dataset_checksum_sql(),
        "events_asof": o.events_asof_sql(),
        "events_range": o.events_range_sql(),
        "events_overlap": o.events_overlap_sql(),
        "funnel": o.funnel_sql(),
        "bigram_coherence": o.bigram_coherence_sql(),
        "bpe_merges": o.bpe_merges_sql(rounds=6),
        "bpe_token_count": o.bpe_token_count_sql(rounds=6),
        "repeated_substrings": o.repeated_substrings_sql(),
        "substring_pairs": o.substring_pairs_sql(),
        "events_latest": o.events_latest_sql(),
        "bigram_topk": o.bigram_topk_sql(k=100),
        "postings": o.postings_sql(min_df=2, max_df=400),
        "pii_scan": o.pii_scan_sql(),
        "pii_redact": o.pii_redact_sql(),
        "chunk_docs": o.chunk_docs_sql(chunk=64, overlap=16),
        "boilerplate": o.boilerplate_sql(min_docs=q.BOILER_MIN_DOCS),
        "cooccurrence": o.cooccurrence_sql(window=3, k=100),
        "doc_sample": o.stratified_sample_sql(0.2, 7, {"en": 0.5}),
        "source_topk": o.source_topk_sql(3),
        "source_sample": o.sample_k_per_group_sql(5, 11),
        "length_quantiles": o.length_quantiles_sql(),
        "spanning_forest": o.spanning_forest_sql(),
        "events_sessionize": o.sessionize_sql(1800),
        "cohort_retention": o.cohort_retention_sql(bucket_us=86_400_000_000),
        "event_transitions": o.event_transitions_sql(),
        "kcore": o.kcore_sql(k=3),
        "sssp_weighted": o.sssp_weighted_sql(source=0),
        "coreness": o.coreness_sql(k_max=6),
        "coreness_montresor": o.coreness_sql(k_max=6),
        "meta_diameter": o.meta_diameter_sql(),
        "media_features": o.media_features_sql(),
        "subgraph_rank": o.subgraph_rank_sql(),
        "graph_kmeans": o.graph_kmeans_sql(),
        # rows-only (genuinely non-SQL-mirrorable: float random-hyperplane /
        # centroid geometry): ann_lsh, ann_ivf, embedding_pairs_lsh — each
        # oracle-tested in pytest (recall vs brute force)
    }
