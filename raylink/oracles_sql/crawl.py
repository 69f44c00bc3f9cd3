from __future__ import annotations

from raylink.ops.textstats import (  # noqa: F401
    CJK_PATTERN,
    STOP_DE,
    STOP_EN,
    STOP_ES,
    STOP_FR,
    TOKEN_PATTERN,
    WORD_PATTERN,
)

from raylink.oracles_sql._common import (  # noqa: F401
    P,
    GRAPH_CTES,
    CC_CTE,
    SG_CTE,
    _STOP,
    PAGE_TEXT_CTES,
    _M64,
    _M32,
    _with,
    _pagerank_ctes,
    _lpa_label_ctes,
    _mul64,
    _add64,
    _sm64,
    _fnv64,
    _perceptron_ctes,
    _matching_ctes,
    _bpe_ctes,
    _kmeans_ctes,
)


def page_text_sql() -> str:
    return (
        _with(
            GRAPH_CTES,
            """k AS (
  SELECT d.doc_id, d.text,
    CASE WHEN d.doc_id < p.m
         THEN (d.doc_id % 5) + 1 + CASE WHEN d.doc_id % 7 = 3 THEN 1 ELSE 0 END
         ELSE 0 END AS nlinks
  FROM documents d, mm p)""",
        )
        + """
SELECT 'https://site' || (doc_id % 97) || '.example/d/' || doc_id AS url,
       'Document ' || doc_id || chr(10)
       || replace(replace(text, chr(13), ' '), chr(10), ' ')
       || CASE WHEN nlinks > 0
               THEN chr(10) || rtrim(repeat('link' || chr(10), nlinks), chr(10))
               ELSE '' END AS text
FROM k"""
    )


def warc_roundtrip_sql() -> str:
    """page_text plus the WARC-Date timestamp: warc_ts(i) = 2024-01-01 +
    i seconds (synth.make_pages_batch), serialized to a WARC header and
    parsed back — must survive the container roundtrip exactly."""
    return (
        _with(
            GRAPH_CTES,
            """k AS (
  SELECT d.doc_id, d.text,
    CASE WHEN d.doc_id < p.m
         THEN (d.doc_id % 5) + 1 + CASE WHEN d.doc_id % 7 = 3 THEN 1 ELSE 0 END
         ELSE 0 END AS nlinks
  FROM documents d, mm p)""",
        )
        + """
SELECT 'https://site' || (doc_id % 97) || '.example/d/' || doc_id AS url,
       TIMESTAMP '2024-01-01 00:00:00'
         + to_microseconds(doc_id * 1000000) AS warc_ts,
       'Document ' || doc_id || chr(10)
       || replace(replace(text, chr(13), ' '), chr(10), ' ')
       || CASE WHEN nlinks > 0
               THEN chr(10) || rtrim(repeat('link' || chr(10), nlinks), chr(10))
               ELSE '' END AS text
FROM k"""
    )


def url_canon_sql() -> str:
    """Mirrors queries.q_url_canon: the planted messy urls and the RE2
    canonicalization pipeline (ops/urls.py) step for step — both engines
    run RE2 GlobalReplace, so even overlap-skip behavior is identical."""
    plant = r"""
raw AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0
          THEN 'HTTPS://SITE' || (doc_id % 97) || '.EXAMPLE'
          ELSE 'https://site' || (doc_id % 97) || '.example' END
     || CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END
     || CASE WHEN doc_id % 5 = 0 THEN '/d/./' || doc_id
             WHEN doc_id % 7 = 0 THEN '/d/x/../' || doc_id
             WHEN doc_id % 11 = 0 THEN '/d//' || doc_id
             ELSE '/d/' || doc_id END
     || CASE WHEN doc_id % 13 = 0 THEN '#s' || doc_id ELSE '' END
    ) AS url_raw
  FROM documents)"""
    return (
        "WITH "
        + plant
        + r""",
u1 AS (SELECT doc_id, url_raw,
              regexp_replace(url_raw, '#.*$', '', 'g') AS u
       FROM raw),
hr AS (SELECT doc_id, url_raw,
              lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)) AS head,
              regexp_replace(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', '') AS rest
       FROM u1),
h2 AS (SELECT doc_id, url_raw,
              regexp_replace(regexp_replace(head,
                '^(https://[^/:]*):443$', '\1'),
                '^(http://[^/:]*):80$', '\1') AS head,
              regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                regexp_replace(regexp_replace(regexp_replace(rest,
                  '/\./', '/', 'g'),
                  '/\./', '/', 'g'),
                  '/\.$', '/'),
                  '/[^/?#]+/\.\./', '/', 'g'),
                  '/[^/?#]+/\.\./', '/', 'g'),
                  '/[^/?#]+/\.\.$', '/'),
                  '//+', '/', 'g') AS rest
       FROM hr)
SELECT doc_id, url_raw, head || rest AS url_canon FROM h2"""
    )


def crawl_diff_sql() -> str:
    """Mirrors queries.q_crawl_diff: capture A = edges with even src,
    capture B = edges with src % 3 != 0; NOT EXISTS both ways."""
    return (
        _with(
            GRAPH_CTES,
            "a AS (SELECT src, dst FROM edges WHERE src % 2 = 0)",
            "b AS (SELECT src, dst FROM edges WHERE src % 3 <> 0)",
        )
        + """
SELECT b.src::BIGINT AS src, b.dst::BIGINT AS dst, 'added' AS change
FROM b WHERE NOT EXISTS (SELECT 1 FROM a WHERE a.src = b.src AND a.dst = b.dst)
UNION ALL
SELECT a.src::BIGINT, a.dst::BIGINT, 'removed'
FROM a WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.src = a.src AND b.dst = a.dst)"""
    )


def recrawl_round_sql(iters: int = 120) -> str:
    """Mirrors queries.q_recrawl_round: PageRank fixpoint over capture B's
    edge set (src % 3 != 0 — what the incrementally-updated graph holds
    after diff -> apply_edge_updates), deep-unrolled T=120 at ROUND 6 (the
    subgraph_rank_sql tolerance argument: warm start changes the engine's
    trajectory, not the unique contraction fixpoint), plus per-src
    added/removed edge counts via EXCEPT between the two captures."""
    ctes = [
        GRAPH_CTES,
        "a_e AS MATERIALIZED (SELECT src, dst FROM edges WHERE src % 2 = 0)",
        "b_e AS MATERIALIZED (SELECT src, dst FROM edges WHERE src % 3 <> 0)",
        "deg AS (SELECT src AS vid, count(*)::BIGINT AS outdeg FROM b_e GROUP BY src)",
        "pr0 AS (SELECT vid, 1.0 / nn.n AS rank FROM verts, nn)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""pr{t} AS MATERIALIZED (
  SELECT v.vid, 0.15 / (SELECT n FROM nn) + 0.85 * COALESCE(s.ms, 0) AS rank
  FROM verts v LEFT JOIN (
    SELECT e.dst AS vid, SUM(p.rank / d.outdeg) AS ms
    FROM pr{t - 1} p JOIN deg d ON d.vid = p.vid JOIN b_e e ON e.src = p.vid
    GROUP BY e.dst
  ) s ON s.vid = v.vid)"""
        )
    ctes.append(
        "adds AS (SELECT src, count(*)::BIGINT AS c FROM "
        "(SELECT src, dst FROM b_e EXCEPT SELECT src, dst FROM a_e) GROUP BY src)"
    )
    ctes.append(
        "rems AS (SELECT src, count(*)::BIGINT AS c FROM "
        "(SELECT src, dst FROM a_e EXCEPT SELECT src, dst FROM b_e) GROUP BY src)"
    )
    return _with(*ctes) + f"""
SELECT v.vid::BIGINT AS vid, ROUND(p.rank, 6) AS rank,
       COALESCE(a.c, 0)::BIGINT AS added_out,
       COALESCE(r.c, 0)::BIGINT AS removed_out
FROM verts v JOIN pr{iters} p ON p.vid = v.vid
LEFT JOIN adds a ON a.src = v.vid LEFT JOIN rems r ON r.src = v.vid"""


def domain_stats_sql() -> str:
    """Per-site page counts + extracted-text char totals (mirrors
    queries.q_domain_stats over the synthetic url scheme)."""
    return (
        _with(GRAPH_CTES, *PAGE_TEXT_CTES)
        + """
SELECT host, count(*)::BIGINT AS n_pages,
       SUM(length(txt))::BIGINT AS total_chars
FROM pg GROUP BY host"""
    )


def mirrors_sql() -> str:
    """Mirrors queries.q_mirrors: plant (s % 10 == 6 outlink sets copied to
    s+1, s+1's own edges dropped), then group pages by identical distinct
    outlink sets; groups of >= 2 only."""
    return (
        _with(
            GRAPH_CTES,
            """e2 AS (SELECT src, dst FROM edges WHERE src % 10 <> 7
  UNION ALL SELECT src + 1, dst FROM edges WHERE src % 10 = 6)""",
            """olm AS (SELECT src, array_to_string(list_sort(list(DISTINCT dst)), ',') AS sig
  FROM e2 GROUP BY src)""",
            """gm AS (SELECT sig, min(src) AS rep, count(*)::BIGINT AS n
  FROM olm GROUP BY sig HAVING count(*) >= 2)""",
        )
        + """
SELECT o.src AS vid, gm.rep AS mirror_rep, gm.n AS n_mirrors
FROM olm o JOIN gm ON o.sig = gm.sig"""
    )


def redirects_sql() -> str:
    """Mirrors queries.q_redirects: the planted functional redirect table
    (doc_id % 32 != 0 AND doc_id >= 4 -> doc_id - 1 - doc_id % 3) chased to
    its chain terminal by a recursive CTE; terminal = a target that is not
    itself a redirect source. hops = exact chain length (matches the
    pointer-doubling hop accounting)."""
    return """
WITH RECURSIVE r AS (
  SELECT doc_id AS src, doc_id - 1 - (doc_id % 3) AS dst
  FROM documents WHERE doc_id % 32 <> 0 AND doc_id >= 4
),
chase(src, cur, hops) AS (
  SELECT src, dst, CAST(1 AS BIGINT) FROM r
  UNION ALL
  SELECT c.src, r2.dst, c.hops + 1
  FROM chase c JOIN r r2 ON c.cur = r2.src
)
SELECT c.src AS src, c.cur AS final, c.hops AS hops
FROM chase c
WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.src = c.cur)
ORDER BY src"""


def host_link_locality_sql() -> str:
    """Mirrors pipelines.host_link_locality: distinct directed page edges,
    host = the synthesized 'site<vid % 97>.example' label (closed form of
    the URL rule the engine parses back with RE2), intra share with one
    double division."""
    return (
        _with(
            GRAPH_CTES,
            """hle AS (SELECT DISTINCT src, dst FROM edges)""",
            """hlc AS (SELECT 'site' || CAST(src % 97 AS VARCHAR) || '.example' AS host,
         count(*)::BIGINT AS n,
         count(*) FILTER (src % 97 = dst % 97)::BIGINT AS ni
  FROM hle GROUP BY 1)""",
        )
        + """
SELECT host, n AS n_links, ni AS n_intra, ROUND(ni / n, 8) AS locality
FROM hlc"""
    )


def crawl_frontier_sql(fetched_mod: int = 4, fetched_res: int = 1,
                       k: int = 100) -> str:
    """pipelines.frontier_rank: distinct fetched->unfetched links (planted
    residue membership), per-target distinct in-link counts, top-k by
    (n_inlinks DESC, vid)."""
    return (
        _with(
            GRAPH_CTES,
            f"""fre AS (SELECT DISTINCT src, dst FROM edges
  WHERE src % {fetched_mod} <> {fetched_res}
    AND dst % {fetched_mod} = {fetched_res})""",
            "frc AS (SELECT dst AS vid, count(*)::BIGINT AS n_inlinks FROM fre GROUP BY dst)",
        )
        + f"""
SELECT vid, n_inlinks FROM frc
ORDER BY n_inlinks DESC, vid LIMIT {k}"""
    )


def crawl_schedule_sql(fetched_mod: int = 4, fetched_res: int = 1,
                       host_mod: int = 97) -> str:
    """Mirror of pipelines.crawl_schedule: frontier in-link counts, then
    row_number per host ordered by (n_inlinks DESC, vid)."""
    return (
        _with(
            GRAPH_CTES,
            f"""fre AS (SELECT DISTINCT src, dst FROM edges
  WHERE src % {fetched_mod} <> {fetched_res}
    AND dst % {fetched_mod} = {fetched_res})""",
            "frc AS (SELECT dst AS vid, count(*)::BIGINT AS n_inlinks FROM fre GROUP BY dst)",
        )
        + f"""
SELECT vid::BIGINT AS vid, (vid % {host_mod})::BIGINT AS host, n_inlinks,
       row_number() OVER (PARTITION BY vid % {host_mod}
                          ORDER BY n_inlinks DESC, vid)::BIGINT AS slot
FROM frc"""
    )


def spam_mass_sql(seeds=(0, 1, 2, 7), pr_iters: int = 30,
                  ppr_iters: int = 12, alpha: float = 0.85) -> str:
    """Mirror of queries.q_spam_mass: the unrolled PageRank chain and the
    per-seed PPR chains in one WITH; trust = ROUND(mean of r8-rounded
    per-seed PPRs, 8), spam_mass = ROUND((pr - trust)/pr, 6) — the exact
    float op order of the engine's vectorized ratio."""
    tp = repr(1.0 - alpha)
    ctes = _pagerank_ctes(pr_iters)  # GRAPH_CTES, deg, pr1..prN
    for i, s in enumerate(seeds):
        ctes.append(
            f"p{i}_0 AS (SELECT vid, CASE WHEN vid = {s} THEN 1.0 ELSE 0.0 "
            f"END AS r FROM verts)"
        )
        for t in range(1, ppr_iters + 1):
            ctes.append(
                f"""p{i}_{t} AS MATERIALIZED (
  SELECT v.vid,
         {alpha} * COALESCE(m.ms, 0)
         + {tp} * (CASE WHEN v.vid = {s} THEN 1.0 ELSE 0.0 END) AS r
  FROM verts v LEFT JOIN (
    SELECT e.dst AS vid, SUM(p.r / d.outdeg) AS ms
    FROM p{i}_{t - 1} p JOIN deg d ON d.vid = p.vid
    JOIN edges e ON e.src = p.vid
    GROUP BY e.dst
  ) m ON m.vid = v.vid)"""
            )
    trust_sum = " + ".join(
        f"ROUND(p{i}.r, 8)" for i in range(len(seeds))
    )
    joins = "\n".join(
        f"JOIN p{i}_{ppr_iters} p{i} ON p{i}.vid = pr.vid"
        for i in range(len(seeds))
    )
    return (
        _with(*ctes)
        + f"""
SELECT vid, pr, trust, ROUND((pr - trust) / pr, 6) AS spam_mass
FROM (
  SELECT pr.vid::BIGINT AS vid, ROUND(pr.rank, 8) AS pr,
         ROUND(({trust_sum}) / {float(len(seeds))!r}, 8) AS trust
  FROM pr{pr_iters} pr
{joins})"""
    )


def outlink_diversity_sql() -> str:
    """Mirrors queries.q_outlink_diversity: distinct target hosts vs
    distinct outlinks per source; one BIGINT->DOUBLE division, ROUND 6
    (half-away both sides)."""
    return (
        _with(
            GRAPH_CTES,
            """od AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
hh AS (SELECT DISTINCT src, dst % 97 AS host FROM edges),
nh AS (SELECT src, count(*) AS n_hosts FROM hh GROUP BY src)""",
        )
        + """
SELECT od.src::BIGINT AS vid, od.outdeg::BIGINT AS outdeg,
       nh.n_hosts::BIGINT AS n_hosts,
       ROUND(nh.n_hosts::DOUBLE / od.outdeg::DOUBLE, 6) AS diversity
FROM od JOIN nh ON nh.src = od.src"""
    )


def page_titles_sql() -> str:
    """Mirrors queries.q_page_titles over the closed-form synthetic HTML
    (synth.page_html writes <title>Skip {i}</title>)."""
    return """
SELECT 'https://site' || (doc_id % 97) || '.example/d/' || doc_id AS url,
       'Skip ' || doc_id AS title
FROM documents"""


def inlink_diversity_sql() -> str:
    """Mirrors queries.q_inlink_diversity (outlink_diversity_sql with the
    endpoints swapped)."""
    return (
        _with(
            GRAPH_CTES,
            """idg AS (SELECT dst, count(*) AS indeg FROM edges GROUP BY dst),
hh AS (SELECT DISTINCT dst, src % 97 AS host FROM edges),
nh AS (SELECT dst, count(*) AS n_hosts FROM hh GROUP BY dst)""",
        )
        + """
SELECT idg.dst::BIGINT AS vid, idg.indeg::BIGINT AS indeg,
       nh.n_hosts::BIGINT AS n_hosts,
       ROUND(nh.n_hosts::DOUBLE / idg.indeg::DOUBLE, 6) AS diversity
FROM idg JOIN nh ON nh.dst = idg.dst"""
    )


def robots_filter_sql() -> str:
    """Mirrors queries.q_robots_filter's fixture corpus in closed form
    (ops/robots.synth_robots): hosts h%3==0 -> the raylinkbot group blocks
    ids starting with '1'; other hosts -> the * group allows only ids
    ending in the host's last digit."""
    return """
SELECT doc_id AS vid, (doc_id % 97)::BIGINT AS host,
       CASE WHEN (doc_id % 97) % 3 = 0
            THEN NOT (CAST(doc_id AS VARCHAR) LIKE '1%')
            ELSE (doc_id % 10) = ((doc_id % 97) % 10) END AS allowed
FROM documents"""


def sitemap_coverage_sql() -> str:
    """Mirrors queries.q_sitemap_coverage's fixture corpus in closed form
    (ops/sitemap.synth_sitemaps): every doc is listed in its host's
    sitemap except doc_id % 4 == 2."""
    return """
SELECT doc_id AS vid, (doc_id % 97)::BIGINT AS host,
       (doc_id % 4 <> 2) AS in_sitemap
FROM documents"""
