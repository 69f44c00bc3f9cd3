"""ANSI-SQL oracles (DuckDB dialect) for every SQL-expressible query in
``__ray_entry__.queries()``.

The synthetic page corpus embeds a link graph with a closed form
(raylink/synth.py LINK SPEC v1), so even the HTML-extraction pipeline and the
iterative graph algorithms have SQL oracles: edge generation is mirrored with
``generate_series``, PageRank as K unrolled CTE iterations, CC/SSSP/subgraph
labeling as recursive CTEs. Scalar text rules mirror raylink.ops 1:1.

Column names and integer/float types are matched exactly to the Ray results
(the driver hash-compares values after sorting columns by name).
"""

from __future__ import annotations

from raylink.ops.textstats import (
    CJK_PATTERN,
    STOP_DE,
    STOP_EN,
    STOP_ES,
    STOP_FR,
    TOKEN_PATTERN,
    WORD_PATTERN,
)

P = 8  # partitions used by the oracle-checked graph queries (mod partitioner)

# ---- shared CTE snippets -----------------------------------------------------

GRAPH_CTES = """
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
mm AS (SELECT n, n - (n % 3) AS m FROM nn),
edges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT d.doc_id AS src, (d.doc_id + 3*j*j) % p.m AS dst
    FROM documents d, mm p, unnest(generate_series(1, (d.doc_id % 5) + 1)) AS t(j)
    WHERE d.doc_id < p.m
    UNION ALL
    SELECT d.doc_id, d.doc_id % 3 FROM documents d, mm p
    WHERE d.doc_id < p.m AND d.doc_id % 7 = 3
  )
),
und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
verts AS (SELECT doc_id AS vid FROM documents)
"""

CC_CTE = """
lbl AS (
  SELECT vid, vid AS l FROM verts
  UNION
  SELECT e.dst, x.l FROM lbl x JOIN und e ON e.src = x.vid
),
comp AS (SELECT vid, MIN(l)::BIGINT AS component FROM lbl GROUP BY vid)
"""

SG_CTE = f"""
sp AS (SELECT src, dst FROM und WHERE src % {P} = dst % {P}),
sglbl AS (
  SELECT vid, vid AS l FROM verts
  UNION
  SELECT e.dst, x.l FROM sglbl x JOIN sp e ON e.src = x.vid
),
sgmap AS (SELECT vid, MIN(l)::BIGINT AS sg FROM sglbl GROUP BY vid)
"""


def _with(*ctes: str, recursive: bool = False) -> str:
    return ("WITH RECURSIVE " if recursive else "WITH ") + ",".join(ctes)


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


def page_edges_sql() -> str:
    return _with(GRAPH_CTES) + "\nSELECT src::BIGINT AS src, dst::BIGINT AS dst FROM edges"


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


def dense_remap_sql(num_buckets: int = 16) -> str:
    """Mirrors queries.q_dense_remap: vid = hash64_str(url_of(v)) (FNV-1a ->
    splitmix64 -> >>1), bucket = splitmix64(vid) % B, dense = rank over
    (bucket asc, vid asc)."""
    return (
        _with(
            GRAPH_CTES,
            "vv AS (SELECT DISTINCT v FROM (SELECT src AS v FROM edges "
            "UNION ALL SELECT dst AS v FROM edges))",
            "uu AS (SELECT 'https://site' || CAST(v % 97 AS VARCHAR) || "
            "'.example/d/' || CAST(v AS VARCHAR) AS url FROM vv)",
            f"hh AS (SELECT ({_sm64(_fnv64('url'))} >> 1) AS h FROM uu)",
            f"bb AS (SELECT CAST(h AS BIGINT) AS vid, "
            f"({_sm64('h')}) % {num_buckets} AS bkt FROM hh)",
        )
        + "\nSELECT vid, CAST(ROW_NUMBER() OVER (ORDER BY bkt, vid) - 1 "
        "AS BIGINT) AS dense FROM bb ORDER BY dense"
    )


def link_positions_sql() -> str:
    """Mirrors queries.q_link_positions: the LINK SPEC v1 closed form with
    each anchor's 0-based page position (series links at j-1; the hub link,
    appended last, at (d%5)+1), MIN(pos) per distinct (src,dst) — matching
    the engine's (weight, *edge_cols)-minimal dedup."""
    return (
        _with(
            "nn AS (SELECT count(*)::BIGINT AS n FROM documents)",
            "mm AS (SELECT n, n - (n % 3) AS m FROM nn)",
            """raw AS (
  SELECT d.doc_id AS src, (d.doc_id + 3*j*j) % p.m AS dst, (j - 1)::DOUBLE AS pos
  FROM documents d, mm p, unnest(generate_series(1, (d.doc_id % 5) + 1)) AS t(j)
  WHERE d.doc_id < p.m
  UNION ALL
  SELECT d.doc_id, d.doc_id % 3, ((d.doc_id % 5) + 1)::DOUBLE
  FROM documents d, mm p
  WHERE d.doc_id < p.m AND d.doc_id % 7 = 3
)""",
        )
        + "\nSELECT src::BIGINT AS src, dst::BIGINT AS dst, MIN(pos) AS pos "
        "FROM raw GROUP BY src, dst"
    )


def _pagerank_ctes(iters: int) -> list:
    ctes = [
        GRAPH_CTES,
        "deg AS (SELECT src AS vid, count(*)::BIGINT AS outdeg FROM edges GROUP BY src)",
        "pr0 AS (SELECT vid, 1.0 / nn.n AS rank FROM verts, nn)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""pr{t} AS MATERIALIZED (
  SELECT v.vid, 0.15 / (SELECT n FROM nn) + 0.85 * COALESCE(s.ms, 0) AS rank
  FROM verts v LEFT JOIN (
    SELECT e.dst AS vid, SUM(p.rank / d.outdeg) AS ms
    FROM pr{t - 1} p JOIN deg d ON d.vid = p.vid JOIN edges e ON e.src = p.vid
    GROUP BY e.dst
  ) s ON s.vid = v.vid)"""
        )
    return ctes


def pagerank_sql(iters: int = 30, decimals: int = 8) -> str:
    return (
        _with(*_pagerank_ctes(iters))
        + f"\nSELECT vid::BIGINT AS vid, ROUND(rank, {decimals}) AS rank FROM pr{iters}"
    )


def host_top_pages_sql(iters: int = 30, k: int = 3) -> str:
    """queries.q_host_top_pages: top-k pages per host by the ROUND(rank, 8)
    PageRank value (ties by vid) — ordering on the rounded value is
    identical to the engine's int64-scaled sort keys."""
    return (
        _with(*_pagerank_ctes(iters))
        + f"""
SELECT host, vid::BIGINT AS vid, rank, rn AS rk FROM (
  SELECT 'site' || (vid % 97) || '.example' AS host, vid,
         ROUND(rank, 8) AS rank,
         ROW_NUMBER() OVER (PARTITION BY vid % 97
                            ORDER BY ROUND(rank, 8) DESC, vid) AS rn
  FROM pr{iters})
WHERE rn <= {k}"""
    )


def hits_sql(iters: int = 8, decimals: int = 8) -> str:
    """HITS with per-phase L1 normalization, unrolled like pagerank_sql.
    The engine normalizes by dividing received sums by the broadcast L1
    partial of the SENDER values (constant factors cancel every phase, so
    nothing drifts); SQL normalizes sender values first — the two differ
    only by float association, absorbed by ROUND(.., decimals)."""
    ctes = [
        GRAPH_CTES,
        "h0 AS (SELECT vid, 1.0 / nn.n AS hub FROM verts, nn)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""ar{t} AS MATERIALIZED (
  SELECT v.vid, COALESCE(s.ms, 0) AS ar FROM verts v LEFT JOIN (
    SELECT e.dst AS vid, SUM(h.hub) AS ms
    FROM h{t - 1} h JOIN edges e ON e.src = h.vid GROUP BY e.dst
  ) s ON s.vid = v.vid)"""
        )
        ctes.append(
            f"a{t} AS (SELECT vid, ar / (SELECT SUM(ar) FROM ar{t}) AS auth FROM ar{t})"
        )
        ctes.append(
            f"""hr{t} AS MATERIALIZED (
  SELECT v.vid, COALESCE(s.ms, 0) AS hr FROM verts v LEFT JOIN (
    SELECT e.src AS vid, SUM(a.auth) AS ms
    FROM a{t} a JOIN edges e ON e.dst = a.vid GROUP BY e.src
  ) s ON s.vid = v.vid)"""
        )
        ctes.append(
            f"h{t} AS (SELECT vid, hr / (SELECT SUM(hr) FROM hr{t}) AS hub FROM hr{t})"
        )
    return (
        _with(*ctes)
        + f"""
SELECT a.vid::BIGINT AS vid, ROUND(a.auth, {decimals}) AS auth,
       ROUND(h.hub, {decimals}) AS hub
FROM a{iters} a JOIN h{iters} h ON h.vid = a.vid"""
    )


def subgraph_rank_sql(iters: int = 120) -> str:
    """SubgraphRank converges to the plain-PageRank fixpoint (same global
    update operator, warm start only changes the trajectory). Oracle = the
    unrolled PR iteration run deep (T=120: 0.85^120 ~ 3e-9 contraction of
    the initial distance puts SQL well under 1e-10 of the fixpoint),
    compared at ROUND(..., 6); the engine halts at eps=1e-12 (~7e-12 from
    the fixpoint). With both sides < 1e-10 from the shared fixpoint, a
    disagreement needs a true rank within 1e-10 of a 5e-7 rounding
    boundary — ~1e-4 expected hits per 10^6 vertices (documented tolerance
    argument; the earlier T=60/eps=1e-10 margin produced exactly one such
    hit at sf0.1)."""
    return pagerank_sql(iters=iters, decimals=6)


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


def seeded_pagerank_sql(iters: int = 30) -> str:
    """Personalized PageRank: teleport proportional to seed s(v)=1+(v%7)
    (mirrors queries.q_seeded_pagerank / algos.SeededPageRank)."""
    ctes = [
        GRAPH_CTES,
        "deg AS (SELECT src AS vid, count(*)::BIGINT AS outdeg FROM edges GROUP BY src)",
        "sd AS (SELECT vid, CAST(1 + vid % 7 AS DOUBLE) AS s FROM verts)",
        "st AS (SELECT SUM(s) AS tot FROM sd)",
        "pr0 AS (SELECT vid, s / (SELECT tot FROM st) AS rank FROM sd)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""pr{t} AS MATERIALIZED (
  SELECT sd.vid, 0.15 * sd.s / (SELECT tot FROM st) + 0.85 * COALESCE(x.ms, 0) AS rank
  FROM sd LEFT JOIN (
    SELECT e.dst AS vid, SUM(p.rank / d.outdeg) AS ms
    FROM pr{t - 1} p JOIN deg d ON d.vid = p.vid JOIN edges e ON e.src = p.vid
    GROUP BY e.dst
  ) x ON x.vid = sd.vid)"""
        )
    return _with(*ctes) + f"\nSELECT vid::BIGINT AS vid, ROUND(rank, 8) AS rank FROM pr{iters}"


def cc_sql() -> str:
    return (
        _with(GRAPH_CTES, CC_CTE, recursive=True)
        + "\nSELECT vid::BIGINT AS vid, component FROM comp"
    )


def scc_sql() -> str:
    """SCC via mutual reachability over the directed closure; scc = MAX vid
    of the component (algos/scc.py root-id convention)."""
    return (
        _with(
            GRAPH_CTES,
            """reach AS (
  SELECT src AS a, dst AS b FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
mut AS (SELECT r1.a AS v, r1.b AS u FROM reach r1
        JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a)""",
            recursive=True,
        )
        + """
SELECT v.vid::BIGINT AS vid,
       GREATEST(v.vid, COALESCE(MAX(m.u), v.vid))::BIGINT AS scc
FROM verts v LEFT JOIN mut m ON m.v = v.vid
GROUP BY v.vid"""
    )


def scc_sizes_sql() -> str:
    """Size distribution of the SCCs (bow-tie measurement)."""
    return (
        _with(
            GRAPH_CTES,
            """reach AS (
  SELECT src AS a, dst AS b FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
mut AS (SELECT r1.a AS v, r1.b AS u FROM reach r1
        JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a),
sccm AS (SELECT v.vid, GREATEST(v.vid, COALESCE(MAX(m.u), v.vid)) AS scc
         FROM verts v LEFT JOIN mut m ON m.v = v.vid GROUP BY v.vid),
szs AS (SELECT scc, count(*)::BIGINT AS size FROM sccm GROUP BY scc)""",
            recursive=True,
        )
        + """
SELECT size, count(*)::BIGINT AS n_components FROM szs GROUP BY size"""
    )


def lpa_sql() -> str:
    return (
        _with(GRAPH_CTES, CC_CTE, recursive=True)
        + "\nSELECT vid::BIGINT AS vid, component AS label FROM comp"
    )


def triangles_sql() -> str:
    return (
        _with(
            GRAPH_CTES,
            """fwd AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst)""",
        )
        + """
SELECT count(*)::BIGINT AS triangles
FROM fwd e1 JOIN fwd e2 ON e2.a = e1.b JOIN fwd e3 ON e3.a = e1.a AND e3.b = e2.b"""
    )


def four_cycles_sql() -> str:
    """Mirrors algos.triangles.four_cycle_count: C4 = (1/2) sum over
    canonical pairs of C(common_neighbours, 2) on the undirected simple
    graph."""
    return (
        _with(
            GRAPH_CTES,
            """u4 AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst)""",
            "adj4 AS (SELECT a AS v, b AS n FROM u4 UNION ALL SELECT b, a FROM u4)",
            """wp4 AS (SELECT x.n AS u, y.n AS w
  FROM adj4 x JOIN adj4 y ON x.v = y.v AND x.n < y.n)""",
            "k4 AS (SELECT u, w, count(*)::BIGINT AS c FROM wp4 GROUP BY u, w)",
        )
        + """
SELECT (COALESCE(SUM(c * (c - 1) / 2), 0) / 2)::BIGINT AS four_cycles FROM k4"""
    )


def clustering_coeff_sql() -> str:
    """Mirrors algos.triangles.local_clustering: per-vertex triangle count
    (each a<b<c triangle credits all three) and 2*tri/(deg*(deg-1))."""
    return (
        _with(
            GRAPH_CTES,
            """fwd AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM fwd e1 JOIN fwd e2 ON e2.a = e1.b
  JOIN fwd e3 ON e3.a = e1.a AND e3.b = e2.b),
pv AS (SELECT v, count(*) AS tri FROM (
  SELECT x AS v FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
) GROUP BY v),
ud AS (SELECT v, count(*) AS deg FROM (
  SELECT a AS v FROM fwd UNION ALL SELECT b AS v FROM fwd
) GROUP BY v)""",
        )
        + """
SELECT verts.vid::BIGINT AS vid,
       COALESCE(ud.deg, 0)::BIGINT AS deg,
       COALESCE(pv.tri, 0)::BIGINT AS tri,
       CASE WHEN COALESCE(ud.deg, 0) >= 2
            THEN ROUND(2.0 * COALESCE(pv.tri, 0) / (ud.deg * (ud.deg - 1)), 6)
            ELSE 0.0 END AS coeff
FROM verts LEFT JOIN ud ON ud.v = verts.vid LEFT JOIN pv ON pv.v = verts.vid"""
    )


def edge_support_sql() -> str:
    """Mirrors algos.triangles.edge_support: each x<y<z triangle credits
    its three (already vid-canonical) edges; 0-support edges kept."""
    return (
        _with(
            GRAPH_CTES,
            """fwd AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM fwd e1 JOIN fwd e2 ON e2.a = e1.b
  JOIN fwd e3 ON e3.a = e1.a AND e3.b = e2.b),
es AS (SELECT a, b, count(*) AS c FROM (
  SELECT x AS a, y AS b FROM tri
  UNION ALL SELECT x, z FROM tri
  UNION ALL SELECT y, z FROM tri
) GROUP BY a, b)""",
        )
        + """
SELECT fwd.a::BIGINT AS src, fwd.b::BIGINT AS dst,
       COALESCE(es.c, 0)::BIGINT AS support
FROM fwd LEFT JOIN es ON es.a = fwd.a AND es.b = fwd.b"""
    )


def assortativity_sql() -> str:
    """Mirrors algos.triangles.degree_assortativity: with both edge
    orientations in the sample, Sx=Sy and Sxx=Syy, so
    r = (n*Sxy - Sx^2) / (n*Sxx - Sx^2); integer sums, one double div."""
    return (
        _with(
            GRAPH_CTES,
            """fwd AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst),
ud AS (SELECT v, count(*) AS deg FROM (
  SELECT a AS v FROM fwd UNION ALL SELECT b AS v FROM fwd
) GROUP BY v),
s AS (SELECT 2*count(*) AS n, SUM(du.deg + dv.deg) AS sx,
             2*SUM(du.deg * dv.deg) AS sxy,
             SUM(du.deg*du.deg + dv.deg*dv.deg) AS sxx
      FROM fwd JOIN ud du ON du.v = fwd.a JOIN ud dv ON dv.v = fwd.b)""",
        )
        + """
SELECT CASE WHEN n*sxx - sx*sx = 0 THEN 0.0
            ELSE ROUND((n*sxy - sx*sx)::DOUBLE / ((n*sxx - sx*sx)::DOUBLE), 6)
       END AS assortativity,
       (n / 2)::BIGINT AS n_edges
FROM s"""
    )


def degrees_sql() -> str:
    return (
        _with(GRAPH_CTES)
        + """
SELECT v.vid::BIGINT AS vid,
       COALESCE(o.c, 0)::BIGINT AS out_degree,
       COALESCE(i.c, 0)::BIGINT AS in_degree
FROM verts v
LEFT JOIN (SELECT src, count(*) AS c FROM edges GROUP BY src) o ON o.src = v.vid
LEFT JOIN (SELECT dst, count(*) AS c FROM edges GROUP BY dst) i ON i.dst = v.vid"""
    )


def subgraphs_sql() -> str:
    return (
        _with(GRAPH_CTES, SG_CTE, recursive=True)
        + f"\nSELECT vid::BIGINT AS vid, (vid % {P})::BIGINT AS part, sg FROM sgmap"
    )


def meta_graph_sql() -> str:
    return (
        _with(GRAPH_CTES, SG_CTE, recursive=True)
        + f"""
SELECT DISTINCT a.sg AS sg_src, b.sg AS sg_dst
FROM und e JOIN sgmap a ON a.vid = e.src JOIN sgmap b ON b.vid = e.dst
WHERE e.src % {P} <> e.dst % {P}"""
    )


def sssp_sql(source: int = 0, cap: int = 64) -> str:
    return (
        _with(
            GRAPH_CTES,
            f"""dists AS (
  SELECT CAST({source} AS BIGINT) AS vid, 0 AS d
  UNION
  SELECT e.dst, x.d + 1 FROM dists x JOIN und e ON e.src = x.vid WHERE x.d < {cap}
)""",
            recursive=True,
        )
        + """
SELECT v.vid::BIGINT AS vid, COALESCE(MIN(x.d), -1)::BIGINT AS dist
FROM verts v LEFT JOIN dists x ON x.vid = v.vid GROUP BY v.vid"""
    )


def harmonic_sql(seeds=(0, 1, 2, 7), cap: int = 160) -> str:
    """Seed-sampled harmonic centrality: one recursive BFS CTE per seed
    over the DIRECTED edges; harmonic = the same left-associated IEEE sum
    the engine computes (algos/centrality.py finish), so floats are exact."""
    ctes = [GRAPH_CTES]
    for j, seed in enumerate(seeds):
        ctes.append(
            f"""b{j} AS (
  SELECT CAST({seed} AS BIGINT) AS vid, 0 AS d
  UNION
  SELECT e.dst, x.d + 1 FROM b{j} x JOIN edges e ON e.src = x.vid WHERE x.d < {cap}
)"""
        )
        ctes.append(
            f"m{j} AS (SELECT vid, MIN(d) AS d FROM b{j} GROUP BY vid)"
        )
    dcols = ", ".join(
        f"COALESCE(m{j}.d, -1)::BIGINT AS d{j}" for j in range(len(seeds))
    )
    hsum = " + ".join(
        f"(CASE WHEN m{j}.d > 0 THEN 1.0 / m{j}.d ELSE 0.0 END)"
        for j in range(len(seeds))
    )
    joins = " ".join(
        f"LEFT JOIN m{j} ON m{j}.vid = v.vid" for j in range(len(seeds))
    )
    return (
        _with(*ctes, recursive=True)
        + f"""
SELECT v.vid::BIGINT AS vid, {dcols}, {hsum} AS harmonic
FROM verts v {joins}"""
    )


def betweenness_sql(seeds=(0, 1, 2, 7), cap: int = 160,
                    decimals: int = 6) -> str:
    """Sampled Brandes betweenness via shortest-path-DAG path enumeration
    (no per-level unrolling). Per seed: recursive BFS distances (capped at
    ``cap`` — must exceed the graph's max depth; an undershoot loses
    distance rows loudly, it cannot be silently wrong); sigma = COUNT of
    enumerated seed->v DAG paths (UNION ALL recursion, terminates because
    dist strictly increases along DAG edges); and the dependency identity
    delta(v) = sigma_v * SUM over nonempty DAG paths v->t of 1/sigma_t
    (expanding Brandes' recurrence), realized as ONE recursive suffix-path
    CTE per seed. Row counts = total shortest-path/suffix-path mass
    (measured: ~1.8e4 at 500 docs, ~1.0e7 at 5000 — enumeration is cheap
    because shortest-path DAGs here are narrow). ROUND absorbs the
    cross-engine float-association difference (both sides < 1e-12 apart;
    the subgraph_rank boundary argument)."""
    ctes = [GRAPH_CTES]
    terms = []
    for j, s in enumerate(seeds):
        ctes.append(
            f"""b{j} AS (
  SELECT CAST({s} AS BIGINT) AS vid, 0 AS d
  UNION
  SELECT e.dst, x.d + 1 FROM b{j} x JOIN edges e ON e.src = x.vid WHERE x.d < {cap}
)"""
        )
        ctes.append(
            f"m{j} AS MATERIALIZED (SELECT vid, MIN(d) AS d FROM b{j} GROUP BY vid)"
        )
        ctes.append(
            f"""dagp{j} AS (
  SELECT CAST({s} AS BIGINT) AS vid, 0 AS d
  UNION ALL
  SELECT e.dst, x.d + 1 FROM dagp{j} x
  JOIN edges e ON e.src = x.vid
  JOIN m{j} md ON md.vid = e.dst AND md.d = x.d + 1
)"""
        )
        ctes.append(
            f"sig{j} AS MATERIALIZED (SELECT vid, count(*)::DOUBLE AS sg "
            f"FROM dagp{j} GROUP BY vid)"
        )
        ctes.append(
            f"""suf{j} AS (
  SELECT vid AS o, vid AS w, d FROM m{j}
  UNION ALL
  SELECT x.o, e.dst, x.d + 1 FROM suf{j} x
  JOIN edges e ON e.src = x.w
  JOIN m{j} md ON md.vid = e.dst AND md.d = x.d + 1
)"""
        )
        ctes.append(
            f"""dl{j} AS MATERIALIZED (
  SELECT x.o AS vid, SUM(1.0 / st.sg) AS acc
  FROM suf{j} x JOIN sig{j} st ON st.vid = x.w
  WHERE x.w <> x.o
  GROUP BY x.o)"""
        )
        terms.append(
            f"(CASE WHEN v.vid = {s} THEN 0.0 ELSE "
            f"COALESCE(sg{j}.sg * dl{j}.acc, 0.0) END)"
        )
    joins = " ".join(
        f"LEFT JOIN sig{j} sg{j} ON sg{j}.vid = v.vid "
        f"LEFT JOIN dl{j} ON dl{j}.vid = v.vid"
        for j in range(len(seeds))
    )
    return (
        _with(*ctes, recursive=True)
        + f"""
SELECT v.vid::BIGINT AS vid, ROUND({' + '.join(terms)}, {decimals}) AS bc
FROM verts v {joins}"""
    )


def graph_stats_sql() -> str:
    return (
        _with(GRAPH_CTES, CC_CTE, SG_CTE, recursive=True)
        + """
SELECT (SELECT count(*) FROM verts)::BIGINT AS n_vertices,
       (SELECT count(*) FROM edges)::BIGINT AS n_edges,
       (SELECT count(DISTINCT component) FROM comp)::BIGINT AS n_components,
       (SELECT count(DISTINCT sg) FROM sgmap)::BIGINT AS n_subgraphs,
       (SELECT count(*) FROM verts v WHERE NOT EXISTS (SELECT 1 FROM und WHERE src = v.vid))::BIGINT AS n_isolated,
       (SELECT max(c) FROM (SELECT count(*) AS c FROM edges GROUP BY src))::BIGINT AS max_out_degree,
       (SELECT max(c) FROM (SELECT count(*) AS c FROM edges GROUP BY dst))::BIGINT AS max_in_degree"""
    )


# ---- documents / embeddings / events ----------------------------------------

_STOP = lambda ws: ", ".join(f"'{w}'" for w in ws)  # noqa: E731


def dedup_exact_sql() -> str:
    return (
        "SELECT min(doc_id)::BIGINT AS keep_id, count(*)::BIGINT AS n_dups "
        "FROM documents GROUP BY md5(text)"
    )


def ngram_pairs_sql(n: int = 3, tau: float = 0.5) -> str:
    assert n == 3, "oracle written for trigrams"
    return f"""
WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
g AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
  FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
  WHERE len(ws) >= 3
),
sz AS (SELECT doc_id, count(*) AS nb FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT ia::BIGINT AS doc_a, ib::BIGINT AS doc_b,
       ROUND(c * 1.0 / (sa.nb + sb.nb - c), 6) AS jaccard
FROM inter JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
WHERE ROUND(c * 1.0 / (sa.nb + sb.nb - c), 6) >= {tau}"""


def curation_funnel_sql() -> str:
    """Quality AND lang=='en' AND canonical-exact-dup survivor funnel
    (mirrors queries.q_curation_funnel; reuses the text_stats / lang_id /
    dedup_exact rules 1:1)."""
    stop = _STOP(STOP_EN)
    sr = f"CASE WHEN len(ws) = 0 THEN 0.0 ELSE len(list_filter(ws, x -> x IN ({stop}))) * 1.0 / len(ws) END"
    avg = "CASE WHEN len(ws) = 0 THEN 0.0 ELSE list_aggregate(list_transform(ws, x -> length(x)), 'sum') * 1.0 / len(ws) END"
    cnt = lambda ws: f"len(list_filter(ws, x -> x IN ({_STOP(ws)})))"  # noqa: E731
    c_en, c_de, c_fr, c_es = cnt(STOP_EN), cnt(STOP_DE), cnt(STOP_FR), cnt(STOP_ES)
    return f"""
WITH w AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[\\x{{4e00}}-\\x{{9fff}}]')) AS cjk,
         regexp_extract_all(lower(text), '{WORD_PATTERN}') AS ws
  FROM documents),
s AS (
  SELECT doc_id,
         len(ws)::BIGINT AS n_words,
         ROUND(LEAST(len(ws), 50) / 50.0 * 0.5 + LEAST({sr}, 0.4) / 0.4 * 0.5, 6) AS quality,
         (len(ws) >= 10 AND {avg} BETWEEN 2.0 AND 12.0) AS keep,
         cjk, {c_en} AS en, {c_de} AS de, {c_fr} AS fr, {c_es} AS es
  FROM w),
lang AS (
  SELECT doc_id,
         CASE WHEN cjk > 0 THEN 'zh'
              WHEN en = 0 AND de = 0 AND fr = 0 AND es = 0 THEN 'und'
              WHEN en >= de AND en >= fr AND en >= es THEN 'en'
              WHEN de >= fr AND de >= es THEN 'de'
              WHEN fr >= es THEN 'fr'
              ELSE 'es' END AS pred_lang
  FROM s),
canon AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
SELECT s.doc_id, s.n_words, s.quality
FROM s JOIN lang USING (doc_id) JOIN canon USING (doc_id)
WHERE s.keep AND lang.pred_lang = 'en'"""


def token_topk_sql(k: int = 100) -> str:
    return f"""
SELECT token, count(*)::BIGINT AS cnt FROM (
  SELECT unnest(regexp_extract_all(lower(text), '{WORD_PATTERN}')) AS token
  FROM documents)
GROUP BY token ORDER BY cnt DESC, token LIMIT {k}"""


def distinct_hll_sql(p: int = 12) -> str:
    """HyperLogLog distinct-word estimate, mirrored register-for-register
    (ops/sketch.py): item hash = splitmix64(fnv1a(word)) — the shared
    mirrored kernels — register = low p bits, rank = 1 + clz of the top
    64-p bits (bit length via bin()); the register sum is INTEGER
    (2^(32-min(rank,32)) terms, <= 2^44 total) so only the final estimate
    expression is float, written in the engine's exact IEEE order."""
    m = 1 << p
    wbits = 64 - p
    raw = f"0.7213 / (1.0 + 1.079 / {m}) * {m} * {m} * 4294967296.0 / sum_t"
    return f"""
WITH words AS MATERIALIZED (
  SELECT DISTINCT unnest(regexp_extract_all(lower(text), '{WORD_PATTERN}')) AS word
  FROM documents),
hh AS MATERIALIZED (SELECT {_sm64(_fnv64("word"))} AS h FROM words),
rr AS (SELECT CAST(h & CAST({m - 1} AS UBIGINT) AS BIGINT) AS reg,
              CASE WHEN (h >> {p}) = CAST(0 AS UBIGINT) THEN {wbits + 1}
                   ELSE {wbits} - length(bin(h >> {p})) + 1 END AS rank
       FROM hh),
regs AS (SELECT reg, MAX(rank) AS mr FROM rr GROUP BY reg),
allr AS (SELECT t.r AS reg, COALESCE(regs.mr, 0) AS mr
         FROM unnest(generate_series(0, {m - 1})) AS t(r)
         LEFT JOIN regs ON regs.reg = t.r),
agg AS (SELECT SUM(CAST(1 AS BIGINT) << (32 - LEAST(mr, 32)))::BIGINT AS sum_t,
               SUM(CASE WHEN mr = 0 THEN 1 ELSE 0 END)::BIGINT AS n_zero
        FROM allr)
SELECT {m}::BIGINT AS n_registers, n_zero, sum_t,
       ROUND(CASE WHEN ({raw}) <= {2.5 * m} AND n_zero > 0
                  THEN {m} * ln({float(m)} / n_zero)
                  ELSE {raw} END, 6) AS distinct_est
FROM agg"""


def densest_sql(factor: int = 3, rounds: int = 32) -> str:
    """Parallel densest-subgraph peel mirrored round for round
    (algos/densest.py): undirected simple edges (LEAST/GREATEST distinct,
    self-loops dropped), removal test ``deg <= (factor * E) // V``
    (integer division — identical to the engine), best round by the single
    IEEE division ``ne/nv`` with first-max (ORDER BY density DESC, round
    ASC). peel_round = the round a vertex left; in_densest = peel_round >=
    best round."""
    ctes = [
        GRAPH_CTES,
        "ce AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM edges WHERE src <> dst)",
        "s0 AS (SELECT vid FROM verts)",
        "e0 AS (SELECT a, b FROM ce)",
    ]
    for t in range(rounds):
        ctes.append(
            f"m{t} AS (SELECT (SELECT COUNT(*) FROM e{t}) AS ne, "
            f"(SELECT COUNT(*) FROM s{t}) AS nv)"
        )
        ctes.append(
            f"""d{t} AS (SELECT v, COUNT(*)::BIGINT AS c FROM (
  SELECT a AS v FROM e{t} UNION ALL SELECT b AS v FROM e{t}) GROUP BY v)"""
        )
        ctes.append(
            f"""s{t + 1} AS MATERIALIZED (
  SELECT d.v AS vid FROM d{t} d, m{t} m
  WHERE m.nv > 0 AND d.c > ({factor} * m.ne) // GREATEST(m.nv, 1))"""
        )
        ctes.append(
            f"""e{t + 1} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{t} e
  WHERE EXISTS (SELECT 1 FROM s{t + 1} s WHERE s.vid = e.a)
    AND EXISTS (SELECT 1 FROM s{t + 1} s WHERE s.vid = e.b))"""
        )
        ctes.append(
            f"""rem{t} AS (
  SELECT s.vid, {t} AS peel FROM s{t} s
  WHERE NOT EXISTS (SELECT 1 FROM s{t + 1} x WHERE x.vid = s.vid))"""
        )
    stat_rows = " UNION ALL ".join(
        f"SELECT {t} AS r, ne, nv FROM m{t} WHERE nv > 0"
        for t in range(rounds)
    )
    rem_rows = " UNION ALL ".join(
        f"SELECT vid, peel FROM rem{t}" for t in range(rounds)
    )
    ctes.append(f"st AS ({stat_rows})")
    ctes.append(
        "best AS (SELECT r FROM st "
        "ORDER BY CAST(ne AS DOUBLE) / nv DESC, r ASC LIMIT 1)"
    )
    ctes.append(f"rems AS ({rem_rows})")
    return (
        _with(*ctes)
        + """
SELECT vid::BIGINT AS vid, peel::BIGINT AS peel_round,
       (CASE WHEN peel >= (SELECT r FROM best) THEN 1 ELSE 0 END)::BIGINT
         AS in_densest
FROM rems ORDER BY vid"""
    )


def ppr_sql(seeds=(0, 1, 2, 7), iters: int = 12, alpha: float = 0.85,
            decimals: int = 8) -> str:
    """Mirror of queries.q_ppr (algos/pagerank.MultiSeedPPR): per seed an
    independent PPR fixpoint unrolled ``iters`` rounds —
    r = alpha * sum_in(r/outdeg) + (1-alpha) * [vid == seed] from
    r0 = [vid == seed]. The (1-alpha) literal is emitted as python's repr
    of the engine's ``1.0 - alpha`` double so the teleport constant is
    bit-identical on both sides."""
    tp = repr(1.0 - alpha)
    ctes = [
        GRAPH_CTES,
        "deg AS (SELECT src AS vid, count(*)::BIGINT AS outdeg FROM edges GROUP BY src)",
    ]
    for i, s in enumerate(seeds):
        ctes.append(
            f"p{i}_0 AS (SELECT vid, CASE WHEN vid = {s} THEN 1.0 ELSE 0.0 "
            f"END AS r FROM verts)"
        )
        for t in range(1, iters + 1):
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
    sel = ", ".join(
        f"ROUND(p{i}.r, {decimals}) AS r{i}" for i in range(len(seeds))
    )
    joins = " ".join(
        f"JOIN p{i}_{iters} p{i} ON p{i}.vid = v.vid"
        for i in range(len(seeds))
    )
    return (
        _with(*ctes)
        + f"\nSELECT v.vid::BIGINT AS vid, {sel} FROM verts v {joins} ORDER BY v.vid"
    )


def four_cliques_sql() -> str:
    """Mirror of queries.q_four_cliques: K4 count over the page graph
    plus planted 4-cliques ({d..d+3} for doc_id % 97 == 0, d+3 < m);
    ordered 4-way self-join over the canonical simple edges."""
    return (
        _with(
            GRAPH_CTES,
            """plant AS (
  SELECT d.doc_id + x.i AS src, d.doc_id + y.j AS dst
  FROM documents d, mm p,
       unnest(generate_series(0, 3)) AS x(i),
       unnest(generate_series(0, 3)) AS y(j)
  WHERE d.doc_id % 97 = 0 AND d.doc_id + 3 < p.m AND x.i < y.j)""",
            """ce AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM (SELECT src, dst FROM edges UNION ALL SELECT src, dst FROM plant)
  WHERE src <> dst)""",
        )
        + """
SELECT COUNT(*)::BIGINT AS four_cliques FROM ce ab
JOIN ce ac ON ac.a = ab.a AND ac.b > ab.b
JOIN ce ad ON ad.a = ab.a AND ad.b > ac.b
JOIN ce bc ON bc.a = ab.b AND bc.b = ac.b
JOIN ce bd ON bd.a = ab.b AND bd.b = ad.b
JOIN ce cd ON cd.a = ac.b AND cd.b = ad.b"""
    )


def wl_classes_sql(rounds: int = 3) -> str:
    """Mirror of queries.q_wl_classes (algos/wl.py): 1-WL color
    refinement over the undirected closure, classes as canonical min-vid
    labels. The oracle partitions by the EXACT signature (own label,
    sorted neighbor-label multiset) — no hash mirroring, so an engine
    FNV collision (probability ~2^-64 per class pair) would surface as a
    mismatch here rather than pass silently."""
    ctes = [
        GRAPH_CTES,
        """dd AS (SELECT v.vid, COALESCE(c.c, 0) AS deg
  FROM verts v LEFT JOIN (SELECT src, COUNT(*) AS c FROM und GROUP BY src) c
  ON c.src = v.vid)""",
        "l0 AS (SELECT vid, MIN(vid) OVER (PARTITION BY deg) AS lab FROM dd)",
    ]
    for t in range(1, rounds + 1):
        ctes.append(
            f"""s{t} AS (
  SELECT e.src AS vid, array_agg(l.lab ORDER BY l.lab) AS sig
  FROM und e JOIN l{t - 1} l ON l.vid = e.dst GROUP BY e.src)"""
        )
        ctes.append(
            f"""j{t} AS (
  SELECT l.vid, l.lab AS own, COALESCE(s.sig, CAST([] AS BIGINT[])) AS sig
  FROM l{t - 1} l LEFT JOIN s{t} s ON s.vid = l.vid)"""
        )
        ctes.append(
            f"l{t} AS MATERIALIZED (SELECT vid, MIN(vid) OVER "
            f"(PARTITION BY own, sig) AS lab FROM j{t})"
        )
    return (
        _with(*ctes)
        + f"\nSELECT vid::BIGINT AS vid, lab::BIGINT AS wl_class "
        f"FROM l{rounds} ORDER BY vid"
    )


def _lpa_label_ctes(rounds: int) -> list:
    """The max-frequency-LPA label CTE chain (l0..l<rounds>), shared by
    communities_sql and modularity_sql."""
    ctes = ["l0 AS (SELECT vid, vid AS lab FROM verts)"]
    for t in range(1, rounds + 1):
        ctes.append(
            f"""c{t} AS (
  SELECT e.src AS vid, l.lab, COUNT(*) AS c
  FROM und e JOIN l{t - 1} l ON l.vid = e.dst
  GROUP BY e.src, l.lab)""",
        )
        ctes.append(
            f"""p{t} AS (
  SELECT vid, lab,
         ROW_NUMBER() OVER (PARTITION BY vid ORDER BY c DESC, lab ASC) AS rk
  FROM c{t})""",
        )
        ctes.append(
            f"""l{t} AS MATERIALIZED (
  SELECT prev.vid, COALESCE(p.lab, prev.lab) AS lab
  FROM l{t - 1} prev
  LEFT JOIN (SELECT vid, lab FROM p{t} WHERE rk = 1) p ON p.vid = prev.vid)""",
        )
    return ctes


def communities_sql(rounds: int = 5) -> str:
    """Max-frequency LPA mirrored round for round (algos/lpa.CommunityLPA):
    label(v, t) = most frequent neighbor label at t-1 over the undirected
    closure, ties to the smallest label, no-neighbor vertices keep their
    previous label. The engine may halt early at a fixpoint — a fixpoint
    reproduces itself, so the round-``rounds`` table is identical."""
    ctes = [GRAPH_CTES] + _lpa_label_ctes(rounds)
    return (
        _with(*ctes)
        + f"\nSELECT vid::BIGINT AS vid, lab::BIGINT AS label FROM l{rounds} ORDER BY vid"
    )


def modularity_sql(rounds: int = 5) -> str:
    """Mirrors queries.q_modularity: LPA labels (the communities_sql
    chain), then per-label internal-edge / endpoint-degree integer counts
    over the simple undirected edge set, and the engine's exact float
    expression q = internal/E - (deg/(2E))^2 (two divisions + one
    multiply, then round-half-away(8) == ROUND)."""
    ctes = [GRAPH_CTES] + _lpa_label_ctes(rounds) + [
        """se AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst)""",
        "ec AS (SELECT COUNT(*)::BIGINT AS c FROM se)",
        f"lab AS (SELECT vid, lab FROM l{rounds})",
        """inc AS (
  SELECT la.lab AS label, 1 AS deg,
         CASE WHEN la.lab = lb.lab THEN 1 ELSE 0 END AS internal
  FROM se JOIN lab la ON la.vid = se.a JOIN lab lb ON lb.vid = se.b
  UNION ALL
  SELECT lb.lab, 1, 0
  FROM se JOIN lab la ON la.vid = se.a JOIN lab lb ON lb.vid = se.b)""",
        """pl AS (SELECT label, SUM(deg)::BIGINT AS degree_sum,
  SUM(internal)::BIGINT AS internal_edges FROM inc GROUP BY label)""",
        """nvt AS (SELECT lab AS label, COUNT(*)::BIGINT AS n_vertices
  FROM lab GROUP BY lab)""",
    ]
    return (
        _with(*ctes)
        + """
SELECT n.label, n.n_vertices,
       COALESCE(p.internal_edges, 0)::BIGINT AS internal_edges,
       COALESCE(p.degree_sum, 0)::BIGINT AS degree_sum,
       ROUND(COALESCE(p.internal_edges, 0) / CAST(ec.c AS DOUBLE)
             - (COALESCE(p.degree_sum, 0) / (2.0 * ec.c))
               * (COALESCE(p.degree_sum, 0) / (2.0 * ec.c)), 8) AS q
FROM nvt n LEFT JOIN pl p USING (label), ec ORDER BY n.label"""
    )


def hyperanf_sql(p: int = 6, rounds: int = 8) -> str:
    """HyperANF mirrored register-for-register (algos/anf.py): item hash =
    splitmix64(vid), register/rank as in distinct_hll_sql; each round the
    per-vertex sparse register set max-merges with the IN-neighbors' sets
    (the engine pushes along out-edges, so v accumulates its in-ball);
    absent registers count rank 0. Register sums are INTEGER; the estimate
    is the engine's exact expression (incl. the linear-counting branch)."""
    m = 1 << p
    wbits = 64 - p
    raw = f"0.7213 / (1.0 + 1.079 / {m}) * {m} * {m} * 4294967296.0 / sum_t"
    ctes = [
        GRAPH_CTES,
        f"h0 AS (SELECT vid, {_sm64('CAST(vid AS UBIGINT)')} AS h FROM verts)",
        f"""r0 AS (SELECT vid,
  CAST(h & CAST({m - 1} AS UBIGINT) AS BIGINT) AS reg,
  CASE WHEN (h >> {p}) = CAST(0 AS UBIGINT) THEN {wbits + 1}
       ELSE {wbits} - length(bin(h >> {p})) + 1 END AS rank
FROM h0)""",
    ]
    for t in range(1, rounds + 1):
        ctes.append(
            f"""r{t} AS MATERIALIZED (
  SELECT v AS vid, reg, MAX(rank) AS rank FROM (
    SELECT vid AS v, reg, rank FROM r{t - 1}
    UNION ALL
    SELECT e.dst AS v, r.reg, r.rank FROM r{t - 1} r JOIN edges e ON e.src = r.vid
  ) GROUP BY v, reg)"""
        )
    ctes.append(
        f"""agg AS (
  SELECT vid,
         (SUM(CAST(1 AS BIGINT) << (32 - LEAST(rank, 32)))
          + ({m} - COUNT(*)) * 4294967296)::BIGINT AS sum_t,
         ({m} - COUNT(*))::BIGINT AS n_zero
  FROM r{rounds} GROUP BY vid)"""
    )
    return (
        _with(*ctes)
        + f"""
SELECT vid::BIGINT AS vid, sum_t, n_zero,
       ROUND(CASE WHEN ({raw}) <= {2.5 * m} AND n_zero > 0
                  THEN {m} * ln({float(m)} / n_zero)
                  ELSE {raw} END, 6) AS est
FROM agg ORDER BY vid"""
    )


def host_vocab_sql(p: int = 8) -> str:
    """Per-host HLL distinct-word estimates, register-for-register
    (ops/sketch.hll_grouped_distinct_words): page text rebuilt from the
    synthetic spec (the shared PAGE_TEXT_CTES), words = the shared
    WORD_PATTERN extraction, item hash = splitmix64(FNV-1a(word)),
    registers MAX-merged per (host, reg)."""
    m = 1 << p
    wbits = 64 - p
    raw = f"0.7213 / (1.0 + 1.079 / {m}) * {m} * {m} * 4294967296.0 / sum_t"
    return (
        _with(
            GRAPH_CTES,
            *PAGE_TEXT_CTES,
            f"""hw AS MATERIALIZED (
  SELECT DISTINCT host, word
  FROM pg, unnest(regexp_extract_all(lower(txt), '{WORD_PATTERN}')) AS w(word))""",
            f"hh AS (SELECT host, {_sm64(_fnv64('word'))} AS h FROM hw)",
            f"""rr AS (SELECT host,
  CAST(h & CAST({m - 1} AS UBIGINT) AS BIGINT) AS reg,
  CASE WHEN (h >> {p}) = CAST(0 AS UBIGINT) THEN {wbits + 1}
       ELSE {wbits} - length(bin(h >> {p})) + 1 END AS rank
FROM hh)""",
            "regs AS (SELECT host, reg, MAX(rank) AS mr FROM rr GROUP BY host, reg)",
            f"""agg AS (SELECT host,
  (SUM(CAST(1 AS BIGINT) << (32 - LEAST(mr, 32)))
   + ({m} - COUNT(*)) * 4294967296)::BIGINT AS sum_t,
  ({m} - COUNT(*))::BIGINT AS n_zero
FROM regs GROUP BY host)""",
        )
        + f"""
SELECT u.host,
       COALESCE(a.n_zero, {m})::BIGINT AS n_zero,
       COALESCE(a.sum_t, {m} * 4294967296)::BIGINT AS sum_t,
       ROUND(CASE WHEN ({raw.replace("sum_t", "COALESCE(a.sum_t, " + str(m) + " * 4294967296)")}) <= {2.5 * m}
                   AND COALESCE(a.n_zero, {m}) > 0
                  THEN {m} * ln({float(m)} / COALESCE(a.n_zero, {m}))
                  ELSE {raw.replace("sum_t", "COALESCE(a.sum_t, " + str(m) + " * 4294967296)")} END, 6)
         AS distinct_est
FROM (SELECT DISTINCT host FROM pg) u
LEFT JOIN agg a ON a.host = u.host ORDER BY u.host"""
    )



def dedup_clusters_sql(n: int = 3, tau: float = 0.5) -> str:
    """Connected components over the n-gram Jaccard pair graph (mirrors
    queries.q_dedup_clusters): cluster = min doc_id reachable via pairs."""
    assert n == 3, "oracle written for trigrams"
    return f"""
WITH RECURSIVE w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
g AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
  FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
  WHERE len(ws) >= 3
),
sz AS (SELECT doc_id, count(*) AS nb FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS MATERIALIZED (
  SELECT ia, ib FROM inter JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
  WHERE ROUND(c * 1.0 / (sa.nb + sb.nb - c), 6) >= {tau}
),
e AS (SELECT ia AS a, ib AS b FROM pairs UNION SELECT ib, ia FROM pairs),
lbl AS (
  SELECT doc_id AS vid, doc_id AS l FROM documents
  UNION
  SELECT e.b, x.l FROM lbl x JOIN e ON e.a = x.vid
)
SELECT vid::BIGINT AS doc_id, MIN(l)::BIGINT AS cluster FROM lbl GROUP BY vid"""


def dedup_survivors_sql(n: int = 3, tau: float = 0.5) -> str:
    """Mirrors queries.q_dedup_survivors: wraps the dedup_clusters chain,
    keeps canonical docs (doc_id == cluster) with their cluster size."""
    return f"""
WITH dsc AS ({dedup_clusters_sql(n, tau)}),
dss AS (SELECT cluster, count(*)::BIGINT AS n_in_cluster
        FROM dsc GROUP BY cluster)
SELECT dsc.doc_id, dss.n_in_cluster
FROM dsc JOIN dss USING (cluster)
WHERE dsc.doc_id = dsc.cluster"""


def event_anomalies_sql() -> str:
    """Mirrors queries.q_event_anomalies: per-(type, day) counts, z > 3
    spike test cleared of denominators — (n*x - s)^2 > 9*(n*s2 - s^2),
    all integer."""
    return """
WITH dce AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                    count(*)::BIGINT AS cnt
             FROM events GROUP BY 1, 2),
ste AS (SELECT event_type, count(*)::BIGINT AS n, SUM(cnt)::BIGINT AS s,
               SUM(cnt * cnt)::BIGINT AS s2
        FROM dce GROUP BY 1)
SELECT d.event_type, d.day::BIGINT AS day, d.cnt,
       CASE WHEN (st.n * d.cnt - st.s) * (st.n * d.cnt - st.s)
                 > 9 * (st.n * st.s2 - st.s * st.s)
            THEN 1 ELSE 0 END::BIGINT AS flagged
FROM dce d JOIN ste st USING (event_type)"""


def mixture_sample_sql(seed: int = 11) -> str:
    """Mirrors queries.q_mixture_sample: keep rate ((N % 10) + 1) * 100
    permille for source 'srcN', splitmix64(doc_id XOR seed) % 1000 draw
    (bit-mirrored)."""
    draw = _sm64(f"xor(CAST(doc_id AS UBIGINT), CAST({seed} AS UBIGINT))")
    return f"""
SELECT doc_id, source FROM documents
WHERE CAST({draw} % CAST(1000 AS UBIGINT) AS BIGINT)
      < (CAST(substr(source, 4) AS BIGINT) % 10 + 1) * 100"""


PAGE_TEXT_CTES = (
    """k AS (
  SELECT d.doc_id, d.text,
    CASE WHEN d.doc_id < p.m
         THEN (d.doc_id % 5) + 1 + CASE WHEN d.doc_id % 7 = 3 THEN 1 ELSE 0 END
         ELSE 0 END AS nlinks
  FROM documents d, mm p)""",
    """pg AS (
  SELECT 'site' || (doc_id % 97) || '.example' AS host,
         'Document ' || doc_id || chr(10)
           || replace(replace(text, chr(13), ' '), chr(10), ' ')
           || CASE WHEN nlinks > 0
                   THEN chr(10) || rtrim(repeat('link' || chr(10), nlinks), chr(10))
                   ELSE '' END AS txt
  FROM k)""",
)  # the synthetic page text, reconstructed once for every host-level oracle


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



def token_count_sql() -> str:
    return (
        "SELECT SUM(len(regexp_extract_all(text, '"
        + TOKEN_PATTERN
        + "')))::BIGINT AS total_tokens FROM documents"
    )


def text_stats_sql() -> str:
    stop = _STOP(STOP_EN)
    sr = f"CASE WHEN len(ws) = 0 THEN 0.0 ELSE len(list_filter(ws, x -> x IN ({stop}))) * 1.0 / len(ws) END"
    avg = "CASE WHEN len(ws) = 0 THEN 0.0 ELSE list_aggregate(list_transform(ws, x -> length(x)), 'sum') * 1.0 / len(ws) END"
    return f"""
WITH w AS (
  SELECT doc_id, length(text)::BIGINT AS n_chars,
         len(regexp_extract_all(text, '{TOKEN_PATTERN}'))::BIGINT AS n_tokens,
         regexp_extract_all(lower(text), '{WORD_PATTERN}') AS ws
  FROM documents)
SELECT doc_id, n_chars, n_tokens,
       len(ws)::BIGINT AS n_words,
       len(list_distinct(ws))::BIGINT AS n_uniq_words,
       ROUND({sr}, 6) AS stop_ratio,
       ROUND(LEAST(len(ws), 50) / 50.0 * 0.5 + LEAST({sr}, 0.4) / 0.4 * 0.5, 6) AS quality,
       (len(ws) >= 10 AND {avg} BETWEEN 2.0 AND 12.0) AS keep
FROM w"""


def lang_id_sql() -> str:
    cnt = lambda ws: f"len(list_filter(ws, x -> x IN ({_STOP(ws)})))"  # noqa: E731
    c_en, c_de, c_fr, c_es = cnt(STOP_EN), cnt(STOP_DE), cnt(STOP_FR), cnt(STOP_ES)
    return f"""
WITH w AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[\\x{{4e00}}-\\x{{9fff}}]')) AS cjk,
         regexp_extract_all(lower(text), '{WORD_PATTERN}') AS ws
  FROM documents),
c AS (SELECT doc_id, cjk, {c_en} AS en, {c_de} AS de, {c_fr} AS fr, {c_es} AS es FROM w)
SELECT doc_id,
       CASE WHEN cjk > 0 THEN 'zh'
            WHEN en = 0 AND de = 0 AND fr = 0 AND es = 0 THEN 'und'
            WHEN en >= de AND en >= fr AND en >= es THEN 'en'
            WHEN de >= fr AND de >= es THEN 'de'
            WHEN fr >= es THEN 'fr'
            ELSE 'es' END AS pred_lang
FROM c"""


def fingerprint_sql() -> str:
    return "SELECT doc_id, md5(text) AS fp_md5 FROM documents"


def knn_sql(k: int = 5, n_queries: int = 10) -> str:
    return f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {n_queries}),
s AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])), 6) AS cosine
  FROM q JOIN embeddings e ON e.vec_id <> q.vec_id)
SELECT query_id::BIGINT AS query_id, neighbor_id::BIGINT AS neighbor_id, cosine,
       rank::BIGINT AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM s)
WHERE rank <= {k}"""


def embedding_pairs_sql(tau: float = 0.4) -> str:
    return f"""
SELECT a.vec_id::BIGINT AS id_a, b.vec_id::BIGINT AS id_b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6) >= {tau}"""


def events_window_sql(size_sec: int = 3600) -> str:
    return f"""
SELECT user_id::BIGINT AS user_id,
       (CAST(floor(epoch(ts) / {size_sec}) AS BIGINT) * {size_sec}) AS window_start,
       count(*)::BIGINT AS n_events,
       ROUND(SUM(value), 6) AS sum_value
FROM events GROUP BY 1, 2"""


def spanning_forest_sql(cap: int = 64) -> str:
    """BFS forest fixpoint: dist = multi-source BFS from component minima;
    parent(v) = min vid among neighbours at dist(v)-1 (engine tie-break)."""
    return (
        _with(
            GRAPH_CTES,
            CC_CTE,
            f"""bfs AS (
  SELECT DISTINCT component AS vid, 0 AS d FROM comp
  UNION
  SELECT e.dst, x.d + 1 FROM bfs x JOIN und e ON e.src = x.vid WHERE x.d < {cap}
),
dist AS (SELECT vid, MIN(d) AS d FROM bfs GROUP BY vid)""",
            recursive=True,
        )
        + """
SELECT v.vid::BIGINT AS vid,
       c.component AS root,
       dd.d::BIGINT AS dist,
       COALESCE(p.parent, -1)::BIGINT AS parent
FROM verts v
JOIN comp c ON c.vid = v.vid
JOIN dist dd ON dd.vid = v.vid
LEFT JOIN (
  SELECT e.dst AS vid, MIN(e.src)::BIGINT AS parent
  FROM und e JOIN dist a ON a.vid = e.src JOIN dist b ON b.vid = e.dst
  WHERE a.d = b.d - 1
  GROUP BY e.dst
) p ON p.vid = v.vid"""
    )


def sessionize_sql(gap_sec: int = 1800) -> str:
    """Session windows via lag/cumsum window functions (gap > gap_sec starts
    a new session) — mirrors ops.windows.sessionize exactly."""
    return f"""
WITH e AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep, value FROM events),
x AS (
  SELECT *, CASE WHEN lag(ep) OVER w IS NULL
                   OR ep - lag(ep) OVER w > {gap_sec}
                 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ep)
),
y AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ep
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM x
)
SELECT user_id::BIGINT AS user_id,
       MIN(ep) AS session_start,
       count(*)::BIGINT AS n_events,
       ROUND(SUM(value), 6) AS sum_value,
       (MAX(ep) - MIN(ep))::BIGINT AS duration_sec
FROM y GROUP BY user_id, sid"""


def kcore_sql(k: int = 3, rounds: int = 60) -> str:
    """Fixed-k core membership by unrolled peeling: each round keeps vertices
    with >= k surviving neighbours; `rounds` must exceed the true peeling
    depth (fixpoint is reached early and further rounds are no-ops)."""
    ctes = [GRAPH_CTES, "a0 AS MATERIALIZED (SELECT vid FROM verts)"]
    for t in range(rounds):
        ctes.append(
            f"""a{t + 1} AS MATERIALIZED (
  SELECT e.src AS vid FROM und e
  JOIN a{t} x ON x.vid = e.src JOIN a{t} y ON y.vid = e.dst
  GROUP BY e.src HAVING count(*) >= {k})"""
        )
    return (
        _with(*ctes)
        + f"""
SELECT v.vid::BIGINT AS vid,
       (v.vid IN (SELECT vid FROM a{rounds})) AS in_core
FROM verts v"""
    )


def sssp_weighted_sql(source: int = 0, rounds: int = 80) -> str:
    """Weighted shortest paths by unrolled Bellman-Ford relaxation over the
    undirected closure with the deterministic weight w = 1 + (src*7+dst*13)%5
    (mirrors queries.q_sssp_weighted). Weights are small integers, so float64
    distance sums are exact; `rounds` must exceed the max shortest-path hop
    count."""
    ctes = [
        GRAPH_CTES,
        """wdir AS (SELECT src, dst, CAST(1 + (src*7 + dst*13) % 5 AS DOUBLE) AS w FROM edges),
wund AS MATERIALIZED (
  -- reverse edges carry the ORIGINAL direction's weight (engine undirect());
  -- per-pair dedup keeps the min weight (engine shard build)
  SELECT src, dst, MIN(w) AS w FROM (
    SELECT src, dst, w FROM wdir UNION ALL SELECT dst AS src, src AS dst, w FROM wdir
  ) GROUP BY src, dst)""",
        f"d0 AS MATERIALIZED (SELECT CAST({source} AS BIGINT) AS vid, CAST(0 AS DOUBLE) AS d)",
    ]
    for t in range(rounds):
        ctes.append(
            f"""d{t + 1} AS MATERIALIZED (
  SELECT vid, MIN(d) AS d FROM (
    SELECT vid, d FROM d{t}
    UNION ALL
    SELECT e.dst, x.d + e.w FROM d{t} x JOIN wund e ON e.src = x.vid
  ) GROUP BY vid)"""
        )
    return (
        _with(*ctes)
        + f"""
SELECT v.vid::BIGINT AS vid, COALESCE(x.d, -1.0) AS dist
FROM verts v LEFT JOIN d{rounds} x ON x.vid = v.vid"""
    )


def coreness_sql(k_max: int = 6, rounds: int = 40) -> str:
    """Full core decomposition: core(v) = sum over k of [v in k-core], each
    k-core computed by unrolled peeling (k-core membership is monotone in k).
    k_max must exceed the graph's max core number; rounds the peeling depth."""
    ctes = [GRAPH_CTES]
    finals = []
    for k in range(1, k_max + 1):
        ctes.append(f"c{k}_0 AS MATERIALIZED (SELECT vid FROM verts)")
        for t in range(rounds):
            ctes.append(
                f"""c{k}_{t + 1} AS MATERIALIZED (
  SELECT e.src AS vid FROM und e
  JOIN c{k}_{t} x ON x.vid = e.src JOIN c{k}_{t} y ON y.vid = e.dst
  GROUP BY e.src HAVING count(*) >= {k})"""
            )
        finals.append(f"(CASE WHEN v.vid IN (SELECT vid FROM c{k}_{rounds}) THEN 1 ELSE 0 END)")
    return (
        _with(*ctes)
        + f"""
SELECT v.vid::BIGINT AS vid, ({' + '.join(finals)})::BIGINT AS core
FROM verts v"""
    )


def meta_diameter_sql(n_seeds: int = 4, cap: int = 64) -> str:
    """Meta-graph BFS eccentricity from the n_seeds smallest subgraph ids
    (mirrors graph.meta_diameter): max over seeds of max min-hop distance."""
    return (
        _with(
            GRAPH_CTES,
            SG_CTE,
            f"""mg AS (
  SELECT DISTINCT a.sg AS s, b.sg AS d
  FROM und e JOIN sgmap a ON a.vid = e.src JOIN sgmap b ON b.vid = e.dst
  WHERE e.src % {P} <> e.dst % {P}
),
seeds AS (SELECT DISTINCT s AS vid FROM mg ORDER BY s LIMIT {n_seeds}),
bfs AS (
  SELECT vid, vid AS root, 0 AS dd FROM seeds
  UNION
  SELECT e.d, x.root, x.dd + 1 FROM bfs x JOIN mg e ON e.s = x.vid
  WHERE x.dd < {cap}
)""",
            recursive=True,
        )
        + """
SELECT COALESCE(MAX(md), 0)::BIGINT AS meta_diameter
FROM (SELECT root, vid, MIN(dd) AS md FROM bfs GROUP BY root, vid)"""
    )


def media_features_sql(n_bins: int = 8) -> str:
    """Byte-histogram features of the document-derived RLNKIMG1 media corpus
    (mirrors queries.q_media_features / ops.multimodal.DecodeMedia): the
    synthetic text is ASCII, so ord(char) == byte value."""
    fs = ",\n       ".join(
        f"ROUND(COALESCE(SUM(CASE WHEN CAST(floor(v / 32) AS INT) = {k} THEN 1 END), 0)"
        f" * 1.0 / GREATEST(count(v), 1), 6) AS f{k}"
        for k in range(n_bins)
    )
    return f"""
WITH ch AS (
  SELECT doc_id, ord(substr(text, i, 1)) AS v
  FROM documents, unnest(generate_series(1, length(text))) AS t(i)
)
SELECT d.doc_id AS media_id,
       LEAST(strlen(d.text), 65535)::INTEGER AS width,
       1::INTEGER AS height,
       strlen(d.text)::BIGINT AS n_bytes,
       {fs}
FROM documents d LEFT JOIN ch ON ch.doc_id = d.doc_id
GROUP BY d.doc_id, d.text"""


# ---- overflow-safe 64-bit arithmetic (HUGEINT limbs) for hash mirroring ----
_M64 = "18446744073709551616"  # 2^64
_M32 = "4294967296"  # 2^32


def _mul64(a: str, b: str) -> str:
    """(a*b) mod 2^64 over UBIGINT operands via 32-bit limbs (DuckDB errors
    on native 64-bit overflow, so intermediates go through HUGEINT)."""
    return (
        f"CAST(((( (CAST(({a}) >> 32 AS HUGEINT) * (({b}) % {_M32})) % {_M32} "
        f"+ (CAST(({a}) % {_M32} AS HUGEINT) * (({b}) >> 32)) % {_M32}) % {_M32}) * {_M32} "
        f"+ CAST(({a}) % {_M32} AS HUGEINT) * (({b}) % {_M32})) % {_M64} AS UBIGINT)"
    )


def _add64(a: str, b: str) -> str:
    return f"CAST((CAST({a} AS HUGEINT) + CAST({b} AS HUGEINT)) % {_M64} AS UBIGINT)"


def _sm64(x: str) -> str:
    """splitmix64 finalizer (mirrors raylink.util.splitmix64 bit-for-bit —
    verified against the numpy implementation)."""
    z1 = _add64(x, "CAST(11400714819323198485 AS UBIGINT)")
    e1 = f"xor({z1}, ({z1}) >> 30)"
    z2 = _mul64(e1, "CAST(13787848793156543929 AS UBIGINT)")
    e2 = f"xor({z2}, ({z2}) >> 27)"
    z3 = _mul64(e2, "CAST(10723151780598845931 AS UBIGINT)")
    return f"xor({z3}, ({z3}) >> 31)"


def _fnv64(char_col: str) -> str:
    """FNV-1a over a word's chars (ASCII ⇒ chars == utf-8 bytes) via
    list_reduce — mirrors raylink.util.text_hash64 bit-for-bit."""
    step = _mul64("xor(h, cv)", "CAST(1099511628211 AS UBIGINT)")
    return (
        f"list_reduce(list_prepend(CAST(14695981039346656037 AS UBIGINT), "
        f"list_transform(split({char_col}, ''), c -> CAST(ord(c) AS UBIGINT))), "
        f"(h, cv) -> {step})"
    )


def dedup_simhash_sql(max_hamming: int = 3) -> str:
    """SimHash near-dup pairs (mirrors ops.dedup.simhash_pairs exactly):
    simhash = per-bit majority of FNV-1a word hashes weighted by counts; the
    engine's 4x16-bit banding is COMPLETE for hamming <= 3 (pigeonhole: <4
    differing bits leave one band identical), so its output equals ALL pairs
    with hamming <= max_hamming — directly expressible. The uint64 simhash
    is reinterpreted as two's-complement BIGINT like the engine's int64."""
    assert max_hamming <= 3, "banding completeness argument holds for <= 3"
    return f"""
WITH wh AS MATERIALIZED (
  SELECT word, {_fnv64("word")} AS h
  FROM (SELECT DISTINCT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
        FROM documents)
),
dw AS (
  SELECT doc_id, word, count(*) AS c
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
        FROM documents)
  GROUP BY 1, 2
),
bits AS (
  SELECT dw.doc_id, t.b,
         SUM(CASE WHEN (wh.h >> t.b) & 1 = 1 THEN dw.c ELSE -dw.c END) AS acc
  FROM dw JOIN wh USING (word), unnest(generate_series(0, 63)) AS t(b)
  GROUP BY 1, 2
),
shv AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN acc > 0
                       THEN CAST(CAST(1 AS UBIGINT) << b AS HUGEINT)
                       ELSE 0 END) AS HUGEINT) AS v
  FROM bits GROUP BY doc_id
),
sh AS (
  SELECT d.doc_id,
         COALESCE(
           CASE WHEN s.v >= 9223372036854775808
                THEN CAST(s.v - 18446744073709551616 AS BIGINT)
                ELSE CAST(s.v AS BIGINT) END, 0) AS simhash
  FROM documents d LEFT JOIN shv s ON s.doc_id = d.doc_id
)
SELECT a.doc_id::BIGINT AS doc_a, b.doc_id::BIGINT AS doc_b,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"""


def dedup_minhash_sql(n: int = 3, tau: float = 0.5, bands: int = 32,
                      rows: int = 4, seed: int = 7,
                      pair_filter: str = "") -> str:
    """MinHash-LSH near-dup pairs (mirrors ops.dedup.minhash_pairs exactly,
    including which pairs the LSH *finds*): the 128 permutation seeds are
    inlined as literals (same numpy PRNG stream the engine uses), gram
    hashes are FNV-1a mirrored bit-for-bit, signatures are
    min(splitmix64(gram_hash ^ seed_i)) per permutation, band buckets fold
    4 signature rows with the engine's FNV-prime chain and compare on the
    top-56 bits (the engine drops the low 8), and candidates are verified
    with the exact trigram jaccard at ROUND(...,6) >= tau."""
    import numpy as np

    assert n == 3, "oracle written for trigrams"
    rng = np.random.default_rng(seed)
    seeds = rng.integers(0, 2**63, size=bands * rows, dtype=np.int64).astype(np.uint64)
    seed_rows = ", ".join(
        f"({i}, CAST({int(s)} AS UBIGINT))" for i, s in enumerate(seeds)
    )
    # band-hash fold over the 4 sig values of band b (1-indexed list access):
    # h = h * 1099511628211 + sig  (uint64 wrap), h0 = 0
    P = "CAST(1099511628211 AS UBIGINT)"
    fold = "CAST(0 AS UBIGINT)"
    for r in range(rows):
        fold = _add64(_mul64(fold, P), f"l[b*{rows} + {r + 1}]")
    return f"""
WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
g AS MATERIALIZED (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
  FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
  WHERE len(ws) >= 3
),
gh AS MATERIALIZED (
  SELECT gram, {_fnv64("gram")} AS h FROM (SELECT DISTINCT gram FROM g)
),
seeds(i, s) AS (VALUES {seed_rows}),
sig AS MATERIALIZED (
  SELECT g.doc_id, seeds.i,
         MIN({_sm64("xor(gh.h, seeds.s)")}) AS m
  FROM g JOIN gh USING (gram), seeds
  GROUP BY 1, 2
),
sl AS (SELECT doc_id, list(m ORDER BY i) AS l FROM sig GROUP BY doc_id),
bnd AS MATERIALIZED (
  SELECT doc_id, b, ({fold}) >> 8 AS bh
  FROM sl, unnest(generate_series(0, {bands - 1})) AS t(b)
),
cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
  FROM bnd a JOIN bnd b ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
),
sz AS (SELECT doc_id, count(*) AS nb FROM g GROUP BY doc_id),
inter AS (
  SELECT c.ia, c.ib, count(*) AS c
  FROM cand c JOIN g ga ON ga.doc_id = c.ia JOIN g gb
    ON gb.doc_id = c.ib AND gb.gram = ga.gram
  GROUP BY 1, 2
)
SELECT ia::BIGINT AS doc_a, ib::BIGINT AS doc_b,
       ROUND(i.c * 1.0 / (sa.nb + sb.nb - i.c), 6) AS jaccard
FROM inter i JOIN sz sa ON sa.doc_id = i.ia JOIN sz sb ON sb.doc_id = i.ib
WHERE ROUND(i.c * 1.0 / (sa.nb + sb.nb - i.c), 6) >= {tau}{pair_filter}"""


def graph_kmeans_sql(k: int = 6, seed: int = 42, iterations: int = 2,
                     cap: int = 64) -> str:
    """GPS-style graph k-means (mirrors queries.q_graph_kmeans exactly):
    per iteration, seeds = the k vertices minimizing splitmix64(vid ^ salt)
    (salt = seed + 7919*it, hash mirrored bit-for-bit via _sm64); cluster
    assignment converges to the lexicographic argmin of (hops-to-seed,
    seed-id) per vertex (multi-source BFS fixpoint, = the engine's
    (dist, cluster) tie-break rule); the kept iteration is the one with
    strictly fewer distinct-directed-edge crossings (first wins ties).
    Unreached vertices keep cluster -1 and dist 2^62."""
    INF = 1 << 62
    ctes = [GRAPH_CTES]
    sm = _sm64("xor(CAST(vid AS UBIGINT), CAST({salt} AS UBIGINT))")
    for it in range(iterations):
        salt = seed + 7919 * it
        ctes.append(
            f"seeds{it} AS MATERIALIZED (SELECT vid FROM ("
            f"SELECT vid, {sm.format(salt=salt)} AS h FROM verts "
            f"ORDER BY h, vid LIMIT {k}))"
        )
        ctes.append(
            f"""bfs{it} AS (
  SELECT vid, vid AS c, 0 AS d FROM seeds{it}
  UNION
  SELECT e.dst, x.c, x.d + 1 FROM bfs{it} x JOIN und e ON e.src = x.vid
  WHERE x.d < {cap}
)"""
        )
        ctes.append(
            f"""lab{it} AS MATERIALIZED (
  SELECT v.vid,
         COALESCE(m.cluster, -1)::BIGINT AS cluster,
         COALESCE(m.dist, {INF})::BIGINT AS dist
  FROM verts v LEFT JOIN (
    SELECT b.vid, MIN(b.c) AS cluster, dm.dist
    FROM (SELECT vid, MIN(d) AS dist FROM bfs{it} GROUP BY vid) dm
    JOIN bfs{it} b ON b.vid = dm.vid AND b.d = dm.dist
    GROUP BY b.vid, dm.dist
  ) m ON m.vid = v.vid)"""
        )
        ctes.append(
            f"""x{it} AS (
  SELECT count(*)::BIGINT AS c FROM edges e
  JOIN lab{it} a ON a.vid = e.src JOIN lab{it} b ON b.vid = e.dst
  WHERE a.cluster <> b.cluster)"""
        )
    return (
        _with(*ctes, recursive=True)
        + """
SELECT vid::BIGINT AS vid, cluster, dist
FROM lab1 WHERE (SELECT c FROM x1) < (SELECT c FROM x0)
UNION ALL
SELECT vid::BIGINT AS vid, cluster, dist
FROM lab0 WHERE (SELECT c FROM x1) >= (SELECT c FROM x0)"""
    )


def media_frames_sql(frame_w: int = 16, frame_h: int = 4, every: int = 2) -> str:
    """Frame sampling over the document-derived 'video' blobs (mirrors
    queries.q_media_frames): n_frames = floor(bytes / (w*h)), emit every
    ``every``-th frame index."""
    fsize = frame_w * frame_h
    return f"""
SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_idx
FROM (SELECT doc_id, strlen(text) // {fsize} AS nf FROM documents),
     unnest(generate_series(0, CAST(nf - 1 AS BIGINT), {every})) AS t(f)
WHERE nf >= 1"""


def media_resize_sql(out_w: int = 8, out_h: int = 8) -> str:
    """8x8 nearest-neighbour resize fingerprint of the document-derived
    media (mirrors queries.q_media_resize): the source is a (w x 1) byte
    image of the ASCII text, so every output row samples the same w-length
    row at columns floor(c*w/8); the resized PAYLOAD is reconstructed
    byte-for-byte in SQL (ASCII, so chars == bytes) and md5'd."""
    # sampled row: chars at 1-based positions floor(c*w/out_w)+1, c=0..out_w-1
    cells = " || ".join(
        f"substr(text, (({c} * w) // {out_w}) + 1, 1)" for c in range(out_w)
    )
    return f"""
WITH m AS (
  SELECT doc_id, text, LEAST(strlen(text), 65535) AS w FROM documents
),
r AS (
  SELECT doc_id, w, CASE WHEN w = 0 THEN repeat(chr(0), {out_w})
                         ELSE ({cells}) END AS row
  FROM m
)
SELECT doc_id AS media_id,
       {out_w}::INTEGER AS width, {out_h}::INTEGER AS height,
       md5(repeat(row, {out_h})) AS fp_md5
FROM r"""


def cooccur_pagerank_sql(iters: int = 10) -> str:
    """PageRank over the lineitem part-co-occurrence graph (vertex set =
    part table; same update rule/constants as pagerank_sql)."""
    ctes = [
        """edges AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
)""",
        "verts AS (SELECT p_partkey AS vid FROM part)",
        "nn AS (SELECT count(*)::BIGINT AS n FROM part)",
        "deg AS (SELECT src AS vid, count(*)::BIGINT AS outdeg FROM edges GROUP BY src)",
        "pr0 AS (SELECT vid, 1.0 / nn.n AS rank FROM verts, nn)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""pr{t} AS MATERIALIZED (
  SELECT v.vid, 0.15 / (SELECT n FROM nn) + 0.85 * COALESCE(s.ms, 0) AS rank
  FROM verts v LEFT JOIN (
    SELECT e.dst AS vid, SUM(p.rank / d.outdeg) AS ms
    FROM pr{t - 1} p JOIN deg d ON d.vid = p.vid JOIN edges e ON e.src = p.vid
    GROUP BY e.dst
  ) s ON s.vid = v.vid)"""
        )
    return _with(*ctes) + f"\nSELECT vid::BIGINT AS vid, ROUND(rank, 8) AS rank FROM pr{iters}"


# ------------------------------------------------------- relational (TPC-H-ish)
# Mirrors raylink.queries.q_pricing_summary / q_shipping_priority /
# q_nation_revenue. All money arithmetic is integer-scaled (cents) on BOTH
# sides, so sums are exact in BIGINT and the final double divisions are
# bit-identical — no float-summation order sensitivity.

def pricing_summary_sql() -> str:
    return """
WITH f AS (
  SELECT CAST(ROUND(l_quantity) AS BIGINT) AS q,
         CAST(ROUND(l_extendedprice*100) AS BIGINT) AS ec,
         CAST(ROUND(l_discount*100) AS BIGINT) AS dc,
         CAST(ROUND(l_tax*100) AS BIGINT) AS tc,
         l_returnflag, l_linestatus
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-01-01'
)
SELECT l_returnflag, l_linestatus,
       SUM(q)::DOUBLE AS sum_qty,
       SUM(ec)::DOUBLE / 100.0 AS sum_base_price,
       SUM(ec*(100-dc))::DOUBLE / 10000.0 AS sum_disc_price,
       SUM(ec*(100-dc)*(100+tc))::DOUBLE / 1000000.0 AS sum_charge,
       SUM(q)::DOUBLE / COUNT(*) AS avg_qty,
       SUM(ec)::DOUBLE / 100.0 / COUNT(*) AS avg_price,
       SUM(dc)::DOUBLE / 100.0 / COUNT(*) AS avg_disc,
       COUNT(*)::BIGINT AS count_order
FROM f GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""


def shipping_priority_sql() -> str:
    return """
WITH c AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
o AS (
  SELECT o_orderkey, o_orderdate FROM orders
  JOIN c ON o_custkey = c_custkey
  WHERE o_orderdate < TIMESTAMP '2000-03-15'
),
l AS (
  SELECT l_orderkey,
         CAST(ROUND(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS rev_i
  FROM lineitem WHERE l_shipdate > TIMESTAMP '2000-03-15'
)
SELECT l.l_orderkey,
       SUM(l.rev_i)::DOUBLE / 10000.0 AS revenue,
       o.o_orderdate
FROM l JOIN o ON l.l_orderkey = o.o_orderkey
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY SUM(l.rev_i) DESC, l.l_orderkey
LIMIT 10"""


def nation_revenue_sql() -> str:
    return """
WITH l AS (
  SELECT l_orderkey,
         CAST(ROUND(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS rev_i
  FROM lineitem
)
SELECT n.n_name,
       SUM(l.rev_i)::DOUBLE / 10000.0 AS revenue
FROM l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY SUM(l.rev_i) DESC, n.n_name"""


# ------------------------------------------------- selection / event-log ops
def events_asof_sql() -> str:
    """Mirror of queries.q_events_asof: per click, the latest view of the
    same user with view.ts <= click.ts, ties on ts broken by greatest
    event_id; unmatched clicks keep NULL view_value. ts is epoch us (the
    asof_join comparison domain)."""
    return """
WITH v AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'view'),
     c AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click')
SELECT c.user_id,
       epoch_us(c.ts) AS ts,
       c.event_id,
       c.value,
       (SELECT s.value FROM v s
         WHERE s.user_id = c.user_id AND s.ts <= c.ts
         ORDER BY s.ts DESC, s.event_id DESC LIMIT 1) AS view_value
FROM c
ORDER BY c.event_id
"""


def repeated_substrings_sql(
    window: int = 40, modulus: int = 16, residue: int = 0, min_docs: int = 2
) -> str:
    """Mirror of queries.q_repeated_substrings: windows start at every
    1-based position i whose character code satisfies ``% modulus ==
    residue`` (the corpus is ASCII, so DuckDB's character semantics equal
    the engine's byte semantics), grouped by the exact window text."""
    return f"""
WITH a AS (
  SELECT d.doc_id, substring(d.text, t.i, {window}) AS w
  FROM documents d,
       unnest(generate_series(1, length(d.text) - {window} + 1)) AS t(i)
  WHERE (ord(substring(d.text, t.i, 1)) % {modulus}) = {residue}
)
SELECT w AS "window",
       COUNT(DISTINCT doc_id)::BIGINT AS n_docs,
       COUNT(*)::BIGINT AS n_occ
FROM a GROUP BY w HAVING COUNT(DISTINCT doc_id) >= {min_docs}
ORDER BY w
"""


def substring_pairs_sql(
    window: int = 40, modulus: int = 16, residue: int = 0,
    min_shared: int = 3, max_df: int = 64,
) -> str:
    """Mirror of queries.q_substring_pairs: distinct (window, doc) rows,
    DF-cut windows (2 <= df <= max_df), canonical doc pairs counted per
    shared window."""
    return f"""
WITH a AS (
  SELECT DISTINCT d.doc_id, substring(d.text, t.i, {window}) AS w
  FROM documents d,
       unnest(generate_series(1, length(d.text) - {window} + 1)) AS t(i)
  WHERE (ord(substring(d.text, t.i, 1)) % {modulus}) = {residue}
),
keep AS (SELECT w FROM a GROUP BY w
         HAVING COUNT(*) >= 2 AND COUNT(*) <= {max_df})
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*)::BIGINT AS n_shared
FROM a x JOIN a y ON x.w = y.w AND x.doc_id < y.doc_id
JOIN keep k ON k.w = x.w
GROUP BY x.doc_id, y.doc_id
HAVING COUNT(*) >= {min_shared}
ORDER BY doc_a, doc_b
"""


def events_range_sql() -> str:
    """Mirror of queries.q_events_range: every (view, click) pair of the
    same user with click.ts in the inclusive two-day window after the
    view. Times are epoch micros, matching the range_join comparison
    domain."""
    w = 2 * 24 * 3600 * 1_000_000
    return f"""
WITH v AS (SELECT user_id,
                  epoch_us(ts) AS lo,
                  epoch_us(ts) + {w} AS hi,
                  event_id AS view_id
           FROM events WHERE event_type = 'view'),
     c AS (SELECT user_id,
                  epoch_us(ts) AS ts,
                  event_id AS click_id,
                  value AS click_value
           FROM events WHERE event_type = 'click')
SELECT v.user_id, v.lo, v.hi, c.ts, v.view_id, c.click_id, c.click_value
FROM v JOIN c
  ON c.user_id = v.user_id AND c.ts >= v.lo AND c.ts <= v.hi
ORDER BY v.view_id, c.click_id
"""


def events_overlap_sql() -> str:
    """Mirror of queries.q_events_overlap: (view, purchase) pairs of the
    same user whose one-day windows overlap (inclusive). Epoch micros."""
    w = 24 * 3600 * 1_000_000
    return f"""
WITH v AS (SELECT user_id, epoch_us(ts) AS v_lo, epoch_us(ts) + {w} AS v_hi,
                  event_id AS view_id
           FROM events WHERE event_type = 'view'),
     p AS (SELECT user_id, epoch_us(ts) AS p_lo, epoch_us(ts) + {w} AS p_hi,
                  event_id AS purchase_id
           FROM events WHERE event_type = 'purchase')
SELECT v.user_id, v.v_lo, v.v_hi, p.p_lo, p.p_hi, v.view_id, p.purchase_id
FROM v JOIN p
  ON p.user_id = v.user_id AND v.v_lo <= p.p_hi AND p.p_lo <= v.v_hi
ORDER BY v.view_id, p.purchase_id
"""


def funnel_sql() -> str:
    """Mirror of queries.q_funnel: complete view->click->purchase chains
    (each step within the inclusive 2-day window of the previous, same
    user), counted per user."""
    w = 2 * 24 * 3600 * 1_000_000
    return f"""
WITH v AS (SELECT user_id, epoch_us(ts) AS t, event_id FROM events WHERE event_type = 'view'),
     c AS (SELECT user_id, epoch_us(ts) AS t, event_id FROM events WHERE event_type = 'click'),
     p AS (SELECT user_id, epoch_us(ts) AS t, event_id FROM events WHERE event_type = 'purchase')
SELECT v.user_id, COUNT(*)::BIGINT AS n_chains
FROM v
JOIN c ON c.user_id = v.user_id AND c.t >= v.t AND c.t <= v.t + {w}
JOIN p ON p.user_id = v.user_id AND p.t >= c.t AND p.t <= c.t + {w}
GROUP BY v.user_id
ORDER BY v.user_id
"""


def stratified_sample_sql(
    fraction: float = 0.2, seed: int = 7, fractions: dict | None = None,
    by: str = "lang",
) -> str:
    """Mirror of queries.q_doc_sample: keep iff
    splitmix64(doc_id ^ seed) < floor(fraction * 2^64) with per-stratum
    thresholds — the SAME float->int threshold computation as
    ops.select._thresh, so the cut constants are bit-identical."""
    fractions = {"en": 0.5} if fractions is None else fractions

    def thresh(f: float) -> int:
        return min(int(f * 2.0**64), 2**64 - 1)

    cases = " ".join(
        f"WHEN '{k}' THEN CAST({thresh(v)} AS UBIGINT)"
        for k, v in fractions.items()
    )
    cut = f"CASE {by} {cases} ELSE CAST({thresh(fraction)} AS UBIGINT) END"
    h = _sm64(f"xor(CAST(doc_id AS UBIGINT), CAST({seed} AS UBIGINT))")
    return f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {h} < {cut}
ORDER BY doc_id
"""


def source_topk_sql(k: int = 3) -> str:
    """Mirror of queries.q_source_topk: top-k docs per source by n_chars
    desc, doc_id asc, 1-based rank."""
    return f"""
SELECT doc_id, source, n_chars, rk FROM (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
) WHERE rk <= {k}
ORDER BY source, rk
"""


def doc_top_terms_sql(k: int = 3) -> str:
    """Mirror of queries.q_doc_top_terms: tf = per-doc token count, df =
    docs containing the token, score = one IEEE division tf/df (bit-equal
    to the numpy side), top-k per doc by score desc, term asc."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_PATTERN}')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE) / df.df AS score,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC,
                                     tf.term) AS rk
  FROM tf JOIN df USING (term))
SELECT doc_id, term, tf, df, score, rk
FROM scored WHERE rk <= {k}
ORDER BY doc_id, rk
"""


def sample_k_per_group_sql(k: int = 5, seed: int = 11) -> str:
    """Mirror of queries.q_source_sample: priority = splitmix64(doc_id ^
    seed) reinterpreted as two's-complement BIGINT (matching the engine's
    .view(int64)), ROW_NUMBER per source by priority desc, doc_id asc."""
    h = _sm64(f"xor(CAST(doc_id AS UBIGINT), CAST({seed} AS UBIGINT))")
    pri = (
        f"CASE WHEN {h} >= 9223372036854775808 "
        f"THEN CAST({h} - 18446744073709551616 AS BIGINT) "
        f"ELSE CAST({h} AS BIGINT) END"
    )
    return f"""
WITH t AS (SELECT doc_id, source, {pri} AS pri FROM documents)
SELECT doc_id, source, pri, rk FROM (
  SELECT doc_id, source, pri,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY pri DESC, doc_id) AS rk
  FROM t) WHERE rk <= {k}
ORDER BY source, rk
"""


def length_quantiles_sql(qs=(0.25, 0.5, 0.75, 0.95)) -> str:
    """Mirror of queries.q_length_quantiles: DuckDB quantile_disc is
    sorted_values[ceil(q*n)-1] — exactly group_quantiles' rule (verified
    against the index formula for n in {2,4,5})."""
    parts = " UNION ALL ".join(
        f"SELECT lang, CAST({q} AS DOUBLE) AS q, "
        f"quantile_disc(n_chars, {q}) AS n_chars FROM documents GROUP BY lang"
        for q in qs
    )
    return parts + " ORDER BY lang, q"


def order_priority_sql() -> str:
    """Mirror of q_order_priority (TPC-H Q4 shape, EXISTS semi-join)."""
    return """
SELECT o_orderpriority, count(*)::BIGINT AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05)
GROUP BY o_orderpriority"""


def customers_no_urgent_sql() -> str:
    """Mirror of q_customers_no_urgent (NOT EXISTS anti-join)."""
    return """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')"""


def doc_repetition_sql(decimals: int = 8) -> str:
    """Mirror of ops.textstats.repetition_stats (one IEEE division per
    fraction; bigrams as space-joined adjacent word pairs — words are
    [a-z]+ so the join is collision-free)."""
    return f"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{WORD_PATTERN}') AS ws
  FROM documents
), per AS (
  SELECT doc_id, wd, count(*)::BIGINT AS c, length(wd)::BIGINT AS lc
  FROM (SELECT doc_id, unnest(ws) AS wd FROM w) GROUP BY doc_id, wd
), agg AS (
  SELECT doc_id, SUM(c)::BIGINT AS n_words, MAX(c)::BIGINT AS top_c,
         SUM(c * lc)::BIGINT AS total_chars,
         SUM(CASE WHEN c > 1 THEN c * lc ELSE 0 END)::BIGINT AS dup_chars
  FROM per GROUP BY doc_id
), bagg AS (
  SELECT doc_id, MAX(c)::BIGINT AS top_b FROM (
    SELECT doc_id, bg, count(*) AS c FROM (
      SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1),
                            i -> ws[i] || ' ' || ws[i + 1])) AS bg
      FROM w) GROUP BY doc_id, bg
  ) GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(a.n_words, 0)::BIGINT AS n_words,
  ROUND(CASE WHEN a.n_words > 0 THEN a.top_c / a.n_words::DOUBLE
        ELSE 0.0 END, {decimals}) AS top_word_frac,
  ROUND(CASE WHEN a.total_chars > 0 THEN a.dup_chars / a.total_chars::DOUBLE
        ELSE 0.0 END, {decimals}) AS dup_char_frac,
  ROUND(CASE WHEN a.n_words > 1 THEN COALESCE(b.top_b, 0) / (a.n_words - 1)::DOUBLE
        ELSE 0.0 END, {decimals}) AS top_bigram_frac
FROM documents d LEFT JOIN agg a USING (doc_id) LEFT JOIN bagg b USING (doc_id)"""


def pack_windows_sql(budget: int = 4096) -> str:
    """Mirror of q_pack_windows: exclusive window prefix sum over doc_id
    order, integer-divided into token-budget shards."""
    return f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{TOKEN_PATTERN}'))::BIGINT AS n_tokens
  FROM documents)
SELECT doc_id, n_tokens,
       (COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        // {budget})::BIGINT AS shard
FROM t"""


def bigram_topk_sql(k: int = 100) -> str:
    """Mirrors ops.textstats.bigram_topk: adjacent [a-z]+ word pairs of
    lower(text), pairs never straddle documents, count ALL occurrences."""
    return f"""
SELECT ws[i] || ' ' || ws[i+1] AS bigram, count(*)::BIGINT AS cnt
FROM (SELECT regexp_extract_all(lower(text), '{WORD_PATTERN}') AS ws
      FROM documents),
     unnest(generate_series(1, len(ws) - 1)) AS t(i)
WHERE len(ws) >= 2
GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT {k}"""


def bigram_coherence_sql() -> str:
    """Mirrors ops.textstats.bigram_coherence: adjacent [a-z]+ pairs of
    lower(text) (never straddling documents), score = SUM(corpus count of
    each occurrence's pair) / n_bigrams — integer sums, one double
    division, round-half-away(8) == ROUND for positive args. Groups by the
    bigram STRING, so an engine-side FNV collision would fail here."""
    return """
WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
           FROM documents),
g AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bigram
      FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)
      WHERE len(ws) >= 2),
cnts AS (SELECT bigram, count(*)::BIGINT AS c FROM g GROUP BY bigram),
per AS (SELECT g.doc_id, SUM(c.c)::BIGINT AS ssum, COUNT(*)::BIGINT AS nbg
        FROM g JOIN cnts c USING (bigram) GROUP BY g.doc_id)
SELECT w.doc_id,
       COALESCE(per.nbg, 0)::BIGINT AS n_bigrams,
       COALESCE(per.ssum, 0)::BIGINT AS freq_sum,
       CASE WHEN COALESCE(per.nbg, 0) = 0 THEN 0.0
            ELSE ROUND(per.ssum / CAST(per.nbg AS DOUBLE), 8) END AS coherence
FROM w LEFT JOIN per USING (doc_id) ORDER BY w.doc_id"""


def lm_score_sql(scale: int = 10**6) -> str:
    """Mirrors ops.textstats.lm_score: adjacent [a-z]+ pairs of
    lower(text), per-occurrence fixed-point smoothed conditional
    probability ((bc+1)*scale) // (uc(w1)+V) — all-integer sums, one
    double division, round-half-away(8) == ROUND for positive args.
    Groups by the bigram/word STRINGS, so an engine-side FNV collision
    fails here."""
    return f"""
WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
           FROM documents),
g AS (SELECT doc_id, ws[i] AS w1, ws[i] || ' ' || ws[i+1] AS bigram
      FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)
      WHERE len(ws) >= 2),
bcn AS (SELECT bigram, count(*)::BIGINT AS c FROM g GROUP BY bigram),
ucn AS (SELECT word, count(*)::BIGINT AS c
        FROM (SELECT unnest(ws) AS word FROM w) GROUP BY word),
vvn AS (SELECT count(*)::BIGINT AS v FROM ucn),
per AS (SELECT g.doc_id,
               SUM((b.c + 1) * {scale} // (u.c + (SELECT v FROM vvn)))::BIGINT AS lps,
               COUNT(*)::BIGINT AS nbg
        FROM g JOIN bcn b USING (bigram) JOIN ucn u ON u.word = g.w1
        GROUP BY g.doc_id)
SELECT w.doc_id,
       COALESCE(per.nbg, 0)::BIGINT AS n_bigrams,
       COALESCE(per.lps, 0)::BIGINT AS lp_sum,
       CASE WHEN COALESCE(per.nbg, 0) = 0 THEN 0.0
            ELSE ROUND(per.lps / (per.nbg * {scale}.0), 8) END AS lm_score
FROM w LEFT JOIN per USING (doc_id) ORDER BY w.doc_id"""


def dsir_weights_sql(target_source: str = "src0", d: int = 1024,
                     scale: int = 10**6) -> str:
    """Mirrors ops.textstats.dsir_weights: unigram + bigram occurrences of
    [a-z]+ words, FNV-1a mod d feature buckets, fixed-point add-one
    target/raw ratio r = ((ct+1)*scale) // (cr+1), doc score = occurrence
    mean with one double division. Hash collisions merge buckets
    identically on both sides (inherent to hashed DSIR)."""
    return f"""
WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
           FROM documents),
occ AS (
  SELECT doc_id, unnest(ws) AS g FROM w
  UNION ALL
  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
  FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 2),
gh AS MATERIALIZED (
  SELECT g, CAST({_fnv64('g')} % {d} AS BIGINT) AS f
  FROM (SELECT DISTINCT g FROM occ)),
ofr AS (SELECT occ.doc_id, gh.f FROM occ JOIN gh USING (g)),
crr AS (SELECT f, count(*)::BIGINT AS c FROM ofr GROUP BY f),
ctt AS (SELECT f, count(*)::BIGINT AS c FROM ofr
        JOIN documents dd USING (doc_id)
        WHERE dd.source = '{target_source}' GROUP BY f),
rr AS (SELECT crr.f,
              ((COALESCE(ctt.c, 0) + 1) * {scale}) // (crr.c + 1) AS r
       FROM crr LEFT JOIN ctt ON ctt.f = crr.f),
per AS (SELECT ofr.doc_id, SUM(rr.r)::BIGINT AS rs, COUNT(*)::BIGINT AS nf
        FROM ofr JOIN rr USING (f) GROUP BY ofr.doc_id)
SELECT d2.doc_id,
       COALESCE(per.nf, 0)::BIGINT AS n_feats,
       COALESCE(per.rs, 0)::BIGINT AS ratio_sum,
       CASE WHEN COALESCE(per.nf, 0) = 0 THEN 0.0
            ELSE ROUND(per.rs / (per.nf * {scale}.0), 8) END AS dsir_score
FROM documents d2 LEFT JOIN per ON per.doc_id = d2.doc_id"""


def dsir_sample_sql(target_source: str = "src0", d: int = 1024,
                    scale: int = 10**6, seed: int = 0) -> str:
    """Mirrors ops.textstats.dsir_resample: wraps the dsir_weights chain,
    p_keep = ratio_sum // n_feats, kept iff
    splitmix64(doc_id XOR seed) % scale < p_keep (bit-mirrored)."""
    draw = _sm64(f"xor(CAST(doc_id AS UBIGINT), CAST({seed} AS UBIGINT))")
    return f"""
WITH dsw AS ({dsir_weights_sql(target_source, d, scale)})
SELECT doc_id, n_feats, ratio_sum,
       CASE WHEN n_feats > 0 THEN ratio_sum // n_feats ELSE 0 END AS p_keep
FROM dsw
WHERE CAST({draw} % CAST({scale} AS UBIGINT) AS BIGINT) <
      CASE WHEN n_feats > 0 THEN ratio_sum // n_feats ELSE 0 END"""


def typo_pairs_sql() -> str:
    """Mirrors queries.q_typo_pairs / ops.textstats.typo_pairs: vocabulary
    = corpus [a-z]+ words plus planted 2nd-char-deleted first words of
    doc_id % 7 == 2 docs; output = distinct (a < b) pairs at levenshtein
    distance exactly 1 (the oracle brute-forces V^2 — the engine's
    deletion blocking is the scale path, provably complete for ed = 1)."""
    return """
WITH tpd AS (SELECT doc_id, lower(text) AS t FROM documents),
tpv AS (
  SELECT DISTINCT unnest(regexp_extract_all(t, '[a-z]+')) AS word FROM tpd
  UNION
  SELECT substr(fw, 1, 1) || substr(fw, 3) AS word
  FROM (SELECT doc_id, regexp_extract(t, '[a-z]+') AS fw FROM tpd)
  WHERE doc_id % 7 = 2 AND length(fw) >= 4)
SELECT a.word AS word_a, b.word AS word_b
FROM tpv a JOIN tpv b ON a.word < b.word
WHERE levenshtein(a.word, b.word) = 1"""


def _perceptron_ctes(dim: int, rounds: int) -> str:
    """Shared unrolled-round CTE chain mirroring ops.train.perceptron_train
    bit-for-bit: hashed [a-z]+ word counts (FNV-1a mod dim) + bias feature
    at j=dim, planted label y = sign(mass[0, dim/2) - mass[dim/2, dim)),
    batch updates w += SUM(y*x) over margin-<=0 docs — all integer."""
    half = dim // 2
    ctes = [
        "ppw AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws"
        " FROM documents)",
        f"""pgh AS MATERIALIZED (
  SELECT word, CAST({_fnv64('word')} % {dim} AS BIGINT) AS j
  FROM (SELECT DISTINCT unnest(ws) AS word FROM ppw))""",
        f"""pdw AS MATERIALIZED (
  SELECT doc_id, j, count(*)::BIGINT AS c
  FROM (SELECT doc_id, unnest(ws) AS word FROM ppw) o JOIN pgh USING (word)
  GROUP BY doc_id, j
  UNION ALL SELECT doc_id, {dim}::BIGINT, 1::BIGINT FROM documents)""",
        f"""plab AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN SUM(CASE WHEN j < {half} THEN c
                           WHEN j < {dim} THEN -c ELSE 0 END) >= 0
              THEN 1 ELSE -1 END::BIGINT AS y
  FROM pdw GROUP BY doc_id)""",
        f"pp0 AS (SELECT unnest(generate_series(0, {dim}))::BIGINT AS j, "
        "0::BIGINT AS w)",
    ]
    for t in range(1, rounds + 1):
        ctes.append(
            f"""pm{t} AS MATERIALIZED (
  SELECT d.doc_id, SUM(d.c * p.w)::BIGINT AS m
  FROM pdw d JOIN pp{t - 1} p USING (j) GROUP BY d.doc_id)"""
        )
        ctes.append(
            f"""pu{t} AS (
  SELECT d.j, SUM(l.y * d.c)::BIGINT AS u
  FROM pdw d JOIN plab l USING (doc_id) JOIN pm{t} m ON m.doc_id = d.doc_id
  WHERE l.y * m.m <= 0 GROUP BY d.j)"""
        )
        ctes.append(
            f"""pp{t} AS MATERIALIZED (
  SELECT p.j, (p.w + COALESCE(u.u, 0))::BIGINT AS w
  FROM pp{t - 1} p LEFT JOIN pu{t} u USING (j))"""
        )
    return _with(*ctes)


def perceptron_sql(dim: int = 64, rounds: int = 6) -> str:
    """Final perceptron weight vector after ``rounds`` unrolled batch
    updates (mirrors ops.train.perceptron_train, all-integer)."""
    return _perceptron_ctes(dim, rounds) + f"""
SELECT j, w FROM pp{rounds}"""


def perceptron_scores_sql(dim: int = 64, rounds: int = 6) -> str:
    """Per-doc label/prediction/margin of the trained perceptron (mirrors
    ops.train.perceptron_eval; yhat = +1 iff margin >= 0)."""
    return _perceptron_ctes(dim, rounds) + f"""
, pfm AS (SELECT d.doc_id, SUM(d.c * p.w)::BIGINT AS m
          FROM pdw d JOIN pp{rounds} p USING (j) GROUP BY d.doc_id)
SELECT l.doc_id, l.y,
       CASE WHEN pfm.m >= 0 THEN 1 ELSE -1 END::BIGINT AS yhat,
       pfm.m AS margin
FROM plab l JOIN pfm ON pfm.doc_id = l.doc_id"""


def events_latest_sql() -> str:
    """Mirrors ops.select.latest_by_key(user_id, ts, event_id): the single
    newest event per user, ties by event_id ASC."""
    return """
SELECT event_id, ts, user_id, event_type, value, props FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
  FROM events) WHERE rn = 1"""


def decontaminate_sql(n: int = 8, bench_mod: int = 101, bench_rem: int = 7) -> str:
    """Mirrors ops.dedup.decontaminate over the doc_id % mod == rem
    pseudo-benchmark: words = [a-z0-9]+ of lower(text), gram = n
    consecutive words space-joined; n_hits counts all window occurrences."""
    gram = " || ' ' || ".join(f"ws[i+{j}]" for j in range(n)).replace("ws[i+0]", "ws[i]")
    return f"""
WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
g AS (
  SELECT doc_id, {gram} AS gram
  FROM w, unnest(generate_series(1, len(ws) - {n - 1})) AS t(i)
  WHERE len(ws) >= {n}
),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % {bench_mod} = {bench_rem}),
hits AS (SELECT g.doc_id, count(*) AS h FROM g JOIN bench USING (gram) GROUP BY 1)
SELECT w.doc_id,
       greatest(len(w.ws) - {n - 1}, 0)::BIGINT AS n_grams,
       COALESCE(hits.h, 0)::BIGINT AS n_hits,
       COALESCE(hits.h, 0) > 0 AS contaminated
FROM w LEFT JOIN hits ON hits.doc_id = w.doc_id"""


def bloom_decontaminate_sql(n: int = 8, m_bits: int = 16, k: int = 4,
                            bench_mod: int = 101, bench_rem: int = 7) -> str:
    """Mirrors ops.sketch.bloom_decontaminate bit-for-bit: gram FNV-1a ->
    k probe positions splitmix64(gh XOR j*GOLDEN) & (2^m_bits - 1); the
    bench bitset is the distinct position set; a gram occurrence is flagged
    iff ALL k of its positions are set — INCLUDING false positives, which
    the mirror reproduces exactly."""
    m = 1 << m_bits
    golden = 0x9E3779B97F4A7C15
    consts = ", ".join(
        f"({j}, CAST({(j * golden) % (1 << 64)} AS UBIGINT))" for j in range(k)
    )
    gram = " || ' ' || ".join(f"ws[i+{j}]" for j in range(n)).replace("ws[i+0]", "ws[i]")
    pos_expr = (
        f"CAST({_sm64('xor(g2.gh, c.cj)')} & CAST({m - 1} AS UBIGINT) AS BIGINT)"
    )
    return f"""
WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
g AS (
  SELECT doc_id, i, {gram} AS gram
  FROM w, unnest(generate_series(1, len(ws) - {n - 1})) AS t(i)
  WHERE len(ws) >= {n}
),
g2 AS MATERIALIZED (SELECT doc_id, i, {_fnv64("gram")} AS gh FROM g),
consts(j, cj) AS (VALUES {consts}),
bits AS MATERIALIZED (
  SELECT DISTINCT {pos_expr} AS pos
  FROM (SELECT DISTINCT gh FROM g2 WHERE doc_id % {bench_mod} = {bench_rem}) g2,
       consts c
),
cpos AS (SELECT g2.doc_id, g2.i, c.j, {pos_expr} AS pos FROM g2, consts c),
flagged AS (
  SELECT doc_id, i FROM cpos JOIN bits USING (pos)
  GROUP BY doc_id, i HAVING count(*) = {k}
),
hits AS (SELECT doc_id, count(*) AS h FROM flagged GROUP BY doc_id)
SELECT w.doc_id,
       greatest(len(w.ws) - {n - 1}, 0)::BIGINT AS n_grams,
       COALESCE(hits.h, 0)::BIGINT AS n_bloom_hits,
       COALESCE(hits.h, 0) > 0 AS contaminated_bloom
FROM w LEFT JOIN hits ON hits.doc_id = w.doc_id"""


def postings_sql(min_df: int = 2, max_df: int = 400) -> str:
    """Mirrors ops.textstats.postings: sorted ascending doc_id posting
    lists, comma-joined; df bounds inclusive."""
    return f"""
SELECT token, count(DISTINCT doc_id)::BIGINT AS df,
       array_to_string(list_sort(array_agg(DISTINCT doc_id)), ',') AS postings
FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_PATTERN}')) AS token
      FROM documents)
GROUP BY token
HAVING count(DISTINCT doc_id) BETWEEN {min_df} AND {max_df}"""


def random_walks_sql(walk_len: int = 6, seed: int = 0) -> str:
    """Mirrors algos.walks.random_walks bit-for-bit: one walker per
    distinct source vertex; step s moves to the out-neighbour minimizing
    (splitmix64(walker ^ (s+1)*K1 ^ dst*K2 ^ seed), dst); sink vertices
    end the walk. Steps unrolled like the PageRank oracle."""
    K1, K2 = 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9
    ctes = [GRAPH_CTES,
            "w0 AS (SELECT DISTINCT src AS walker, src AS vid FROM edges)"]
    for s in range(walk_len):
        c1 = ((s + 1) * K1) % (1 << 64)  # constant folded in python
        mix = (
            f"xor(xor(xor(CAST(w.walker AS UBIGINT), "
            f"CAST({c1} AS UBIGINT)), "
            + _mul64("CAST(e.dst AS UBIGINT)", f"CAST({K2} AS UBIGINT)")
            + f"), CAST({seed} AS UBIGINT))"
        )
        # mix as a named column so _sm64's ~8x operand expansion stays small
        # MATERIALIZED: each w{s} is referenced twice (next step + the final
        # UNION); inlining would duplicate the plan subtree per step —
        # exponential in walk_len — and DuckDB's retained buffer blocks for
        # the blown-up plan can exhaust vm.max_map_count for the process.
        ctes.append(
            f"""w{s + 1} AS MATERIALIZED (SELECT walker, vid FROM (
  SELECT walker, vid,
         row_number() OVER (PARTITION BY walker
                            ORDER BY {_sm64('mx')}, vid) AS rn
  FROM (SELECT w.walker, e.dst AS vid, {mix} AS mx
        FROM w{s} w JOIN edges e ON e.src = w.vid)) WHERE rn = 1)"""
        )
    union = "\nUNION ALL ".join(
        f"SELECT walker::BIGINT AS walker, {s}::BIGINT AS step, vid::BIGINT AS vid FROM w{s}"
        for s in range(walk_len + 1)
    )
    return _with(*ctes) + "\n" + union


def weighted_pagerank_sql(iters: int = 20, decimals: int = 8) -> str:
    """Mirrors algos.pagerank.WeightedPageRank over the deterministic edge
    weight 1 + (7*src + 13*dst) % 5: rank flows proportional to w/wsum;
    zero-out-weight vertices leak mass like dangling ones. Unrolled like
    pagerank_sql; float association differences absorbed by ROUND."""
    ctes = [
        GRAPH_CTES,
        "ew AS (SELECT src, dst, 1.0 + (src*7 + dst*13) % 5 AS w FROM edges)",
        "ws AS (SELECT src AS vid, SUM(w) AS s FROM ew GROUP BY src)",
        "wpr0 AS (SELECT vid, 1.0 / nn.n AS rank FROM verts, nn)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""wpr{t} AS MATERIALIZED (
  SELECT v.vid, 0.15 / (SELECT n FROM nn) + 0.85 * COALESCE(m.ms, 0) AS rank
  FROM verts v LEFT JOIN (
    SELECT e.dst AS vid, SUM(p.rank * (e.w / w.s)) AS ms
    FROM wpr{t - 1} p JOIN ws w ON w.vid = p.vid JOIN ew e ON e.src = p.vid
    GROUP BY e.dst
  ) m ON m.vid = v.vid)"""
        )
    return (
        _with(*ctes)
        + f"\nSELECT vid::BIGINT AS vid, ROUND(rank, {decimals}) AS rank FROM wpr{iters}"
    )


def host_rank_sql(iters: int = 20, decimals: int = 8) -> str:
    """Mirrors queries.q_host_rank: host graph = distinct page edges
    grouped by (src%97, dst%97) with count weights; weighted PR unrolled
    like weighted_pagerank_sql (ROUND absorbs float association)."""
    ctes = [
        GRAPH_CTES,
        """he AS MATERIALIZED (
  SELECT src % 97 AS hs, dst % 97 AS hd, count(*)::DOUBLE AS w
  FROM edges GROUP BY 1, 2)""",
        "hv AS (SELECT DISTINCT v FROM (SELECT hs AS v FROM he UNION ALL SELECT hd FROM he))",
        "hn AS (SELECT count(*)::BIGINT AS n FROM hv)",
        "hws AS (SELECT hs AS v, SUM(w) AS s FROM he GROUP BY hs)",
        "hpr0 AS (SELECT v, 1.0 / hn.n AS rank FROM hv, hn)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""hpr{t} AS MATERIALIZED (
  SELECT hv.v, 0.15 / (SELECT n FROM hn) + 0.85 * COALESCE(m.ms, 0) AS rank
  FROM hv LEFT JOIN (
    SELECT e.hd AS v, SUM(p.rank * (e.w / s.s)) AS ms
    FROM hpr{t - 1} p JOIN hws s ON s.v = p.v JOIN he e ON e.hs = p.v
    GROUP BY e.hd
  ) m ON m.v = hv.v)"""
        )
    return (
        _with(*ctes)
        + f"\nSELECT v::BIGINT AS host, ROUND(rank, {decimals}) AS rank FROM hpr{iters}"
    )


def ktruss_sql(k: int = 3, rounds: int = 10) -> str:
    """Mirrors algos.triangles.ktruss: per round, keep edges in >= k-2
    triangles of the CURRENT subgraph; unrolled ``rounds`` times (rounds
    past the fixpoint are no-ops, so any rounds >= the engine's actual
    round count yields the identical fixpoint). Output = surviving edges
    with their support in the final subgraph."""
    t = k - 2
    ctes = [
        GRAPH_CTES,
        """ke0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst)""",
    ]
    for r in range(rounds):
        # MATERIALIZED throughout: multiply-referenced un-materialized CTEs
        # would inline and blow up exponentially across rounds
        ctes.append(
            f"""kt{r} AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ke{r} e1 JOIN ke{r} e2 ON e2.a = e1.b
  JOIN ke{r} e3 ON e3.a = e1.a AND e3.b = e2.b)""",
        )
        ctes.append(
            f"""ks{r} AS MATERIALIZED (SELECT a, b, count(*) AS c FROM (
  SELECT x AS a, y AS b FROM kt{r}
  UNION ALL SELECT x, z FROM kt{r}
  UNION ALL SELECT y, z FROM kt{r}
) GROUP BY a, b)""",
        )
        ctes.append(
            f"""ke{r + 1} AS MATERIALIZED (SELECT e.a, e.b FROM ke{r} e
  JOIN ks{r} s ON s.a = e.a AND s.b = e.b WHERE s.c >= {t})"""
        )
    return (
        _with(*ctes)
        + f"""
SELECT s.a::BIGINT AS src, s.b::BIGINT AS dst, s.c::BIGINT AS support
FROM ks{rounds - 1} s JOIN ke{rounds} e ON e.a = s.a AND e.b = s.b"""
    )


def pii_scan_sql() -> str:
    """Mirrors queries.q_pii_scan: the deterministic PII planting (mod
    7/11/13) and ops.textstats.pii_scan's RE2 patterns, verbatim."""
    planted = (
        "text"
        " || CASE WHEN doc_id % 7 = 0 THEN ' contact admin' || doc_id || '@example.com' ELSE '' END"
        " || CASE WHEN doc_id % 11 = 0 THEN ' 10.' || (doc_id % 256) || '.0.' || (doc_id % 100) ELSE '' END"
        " || CASE WHEN doc_id % 13 = 0 THEN ' ' || (1000000000 + doc_id) ELSE '' END"
    )
    em = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
    ip = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
    ln = r"\b[0-9]{9,16}\b"
    return f"""
SELECT doc_id,
       len(regexp_extract_all(t, '{em}'))::BIGINT AS n_emails,
       len(regexp_extract_all(t, '{ip}'))::BIGINT AS n_ipv4,
       len(regexp_extract_all(t, '{ln}'))::BIGINT AS n_longnums,
       (len(regexp_extract_all(t, '{em}'))
        + len(regexp_extract_all(t, '{ip}'))
        + len(regexp_extract_all(t, '{ln}'))) > 0 AS has_pii
FROM (SELECT doc_id, {planted} AS t FROM documents)"""


def cooccurrence_sql(window: int = 3, k: int = 100) -> str:
    """Mirrors ops.textstats.cooccurrence_topk: unordered pairs within
    ``window`` positions, canonicalized lexicographically (binary
    collation == numpy codepoint order on the ascii [a-z]+ words)."""
    return f"""
SELECT pair, count(*)::BIGINT AS cnt FROM (
  SELECT CASE WHEN ws[i] <= ws[i+d] THEN ws[i] || ' ' || ws[i+d]
              ELSE ws[i+d] || ' ' || ws[i] END AS pair
  FROM (SELECT regexp_extract_all(lower(text), '{WORD_PATTERN}') AS ws
        FROM documents),
       unnest(generate_series(1, len(ws) - 1)) AS a(i),
       unnest(generate_series(1, {window})) AS b(d)
  WHERE i + d <= len(ws))
GROUP BY pair ORDER BY cnt DESC, pair LIMIT {k}"""


def degree_histogram_sql() -> str:
    """Mirrors queries.q_degree_histogram: vertices per distinct out-/in-
    degree value (rows where both counts are zero don't exist)."""
    return (
        _with(
            GRAPH_CTES,
            """d AS (SELECT v.vid, COALESCE(o.c, 0) AS od, COALESCE(i.c, 0) AS idg
  FROM verts v
  LEFT JOIN (SELECT src, count(*) AS c FROM edges GROUP BY src) o ON o.src = v.vid
  LEFT JOIN (SELECT dst, count(*) AS c FROM edges GROUP BY dst) i ON i.dst = v.vid),
ho AS (SELECT od AS degree, count(*) AS n FROM d GROUP BY od),
hi AS (SELECT idg AS degree, count(*) AS n FROM d GROUP BY idg)""",
        )
        + """
SELECT COALESCE(ho.degree, hi.degree)::BIGINT AS degree,
       COALESCE(ho.n, 0)::BIGINT AS n_out,
       COALESCE(hi.n, 0)::BIGINT AS n_in
FROM ho FULL JOIN hi ON hi.degree = ho.degree"""
    )


def link_prediction_sql(k: int = 50) -> str:
    """Mirrors algos.triangles.link_prediction: common-neighbour counts for
    canonical non-adjacent pairs on the undirected simple graph, top-k by
    (common DESC, src, dst)."""
    return (
        _with(
            GRAPH_CTES,
            """ue AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst)""",
            "adjp AS (SELECT a AS v, b AS n FROM ue UNION ALL SELECT b, a FROM ue)",
            """wpp AS (SELECT x.n AS u, y.n AS w
  FROM adjp x JOIN adjp y ON x.v = y.v AND x.n < y.n)""",
            "kp AS (SELECT u, w, count(*)::BIGINT AS c FROM wpp GROUP BY u, w)",
            """nep AS (SELECT u, w, c FROM kp
  WHERE NOT EXISTS (SELECT 1 FROM ue WHERE ue.a = kp.u AND ue.b = kp.w))""",
        )
        + f"""
SELECT u AS src, w AS dst, c AS common FROM nep
ORDER BY c DESC, src, dst LIMIT {k}"""
    )


def resource_alloc_sql(k: int = 50, scale: int = 10**6) -> str:
    """Mirrors algos.triangles.resource_allocation: int64 fixed-point RA
    scores (sum over common neighbours z of scale // deg(z)) for canonical
    non-adjacent pairs on the undirected simple graph, top-k by
    (score DESC, src, dst) — all-integer arithmetic, no float boundary."""
    return (
        _with(
            GRAPH_CTES,
            """uer AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst)""",
            "adjr AS (SELECT a AS v, b AS n FROM uer UNION ALL SELECT b, a FROM uer)",
            "degr AS (SELECT v, count(*)::BIGINT AS dg FROM adjr GROUP BY v)",
            f"""wppr AS (SELECT x.n AS u, y.n AS w, ({scale} // d.dg)::BIGINT AS wt
  FROM adjr x JOIN adjr y ON x.v = y.v AND x.n < y.n
  JOIN degr d ON d.v = x.v)""",
            "kpr AS (SELECT u, w, SUM(wt)::BIGINT AS sc FROM wppr GROUP BY u, w)",
            """nepr AS (SELECT u, w, sc FROM kpr
  WHERE NOT EXISTS (SELECT 1 FROM uer WHERE uer.a = kpr.u AND uer.b = kpr.w))""",
        )
        + f"""
SELECT u AS src, w AS dst, sc AS score FROM nepr
ORDER BY sc DESC, src, dst LIMIT {k}"""
    )


def link_pred_eval_sql(k: int = 100, holdout_mod: int = 5) -> str:
    """Mirrors algos.triangles.link_prediction_eval: splitmix64 packed-key
    holdout (residue 0 = test), common-neighbour top-k on the train
    adjacency (c DESC, u, w — the engine's tie order), hit count against
    the held-out edges, one double division."""
    key = _sm64("CAST(a * 4294967296 + b AS UBIGINT)")
    return (
        _with(
            GRAPH_CTES,
            """uelp AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst)""",
            f"""uelk AS (SELECT a, b,
  CAST({key} % CAST({holdout_mod} AS UBIGINT) AS BIGINT) AS r FROM uelp)""",
            "trnlp AS (SELECT a, b FROM uelk WHERE r <> 0)",
            "tstlp AS (SELECT a, b FROM uelk WHERE r = 0)",
            "adjlp AS (SELECT a AS v, b AS n FROM trnlp UNION ALL SELECT b, a FROM trnlp)",
            """kplp AS (SELECT x.n AS u, y.n AS w, count(*)::BIGINT AS c
  FROM adjlp x JOIN adjlp y ON x.v = y.v AND x.n < y.n GROUP BY u, w)""",
            """nelp AS (SELECT u, w, c FROM kplp
  WHERE NOT EXISTS (SELECT 1 FROM trnlp WHERE trnlp.a = kplp.u AND trnlp.b = kplp.w))""",
            f"prlp AS (SELECT u, w FROM nelp ORDER BY c DESC, u, w LIMIT {k})",
        )
        + f"""
SELECT {k}::BIGINT AS k,
       (SELECT count(*) FROM prlp)::BIGINT AS n_preds,
       (SELECT count(*) FROM tstlp)::BIGINT AS n_test,
       (SELECT count(*) FROM prlp p JOIN tstlp t
        ON t.a = p.u AND t.b = p.w)::BIGINT AS hits,
       CASE WHEN (SELECT count(*) FROM prlp) = 0 THEN 0.0
            ELSE ROUND((SELECT count(*) FROM prlp p JOIN tstlp t
                        ON t.a = p.u AND t.b = p.w)
                       / (SELECT count(*) FROM prlp), 8) END AS precision"""
    )


def recommend_topk_sql(k: int = 3) -> str:
    """Mirrors algos.triangles.recommend_topk: non-adjacent
    common-neighbour pairs feed both endpoints' lists, ROW_NUMBER per vid
    over (common DESC, cand ASC), top-k."""
    return (
        _with(
            GRAPH_CTES,
            """uert AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst)""",
            "adjrt AS (SELECT a AS v, b AS n FROM uert UNION ALL SELECT b, a FROM uert)",
            """kprt AS (SELECT x.n AS u, y.n AS w, count(*)::BIGINT AS c
  FROM adjrt x JOIN adjrt y ON x.v = y.v AND x.n < y.n GROUP BY u, w)""",
            """nert AS (SELECT u, w, c FROM kprt
  WHERE NOT EXISTS (SELECT 1 FROM uert WHERE uert.a = kprt.u AND uert.b = kprt.w))""",
            """cdrt AS (SELECT u AS vid, w AS cand, c FROM nert
  UNION ALL SELECT w, u, c FROM nert)""",
        )
        + f"""
SELECT vid, cand, c AS common, rk FROM (
  SELECT vid, cand, c,
         ROW_NUMBER() OVER (PARTITION BY vid ORDER BY c DESC, cand) AS rk
  FROM cdrt)
WHERE rk <= {k}"""
    )


def media_dedup_sql() -> str:
    """Mirrors queries.q_media_dedup: the RLNK blob embeds the full text
    bytes, so blob equality <=> text equality — keep min doc_id per
    distinct text with the copy count."""
    return """
SELECT MIN(doc_id)::BIGINT AS keep_id, count(*)::BIGINT AS n_copies
FROM documents GROUP BY COALESCE(text, '')"""


def rich_club_sql() -> str:
    """Mirrors pipelines.rich_club_curve: undirected simple graph,
    N_k = vertices with deg > k, E_k = edges with min(deg_a, deg_b) > k,
    phi = ROUND(2.0 * E / (N * (N - 1.0)), 8), rows with N_k >= 2 for
    k in [0, max_deg)."""
    return (
        _with(
            GRAPH_CTES,
            """uerc AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst)""",
            "adjrc AS (SELECT a AS v FROM uerc UNION ALL SELECT b FROM uerc)",
            "degrc AS (SELECT v, count(*)::BIGINT AS dg FROM adjrc GROUP BY v)",
            """merc AS (SELECT LEAST(da.dg, db.dg) AS m
  FROM uerc JOIN degrc da ON da.v = uerc.a JOIN degrc db ON db.v = uerc.b)""",
            """krc AS (SELECT unnest(generate_series(
  0, (SELECT MAX(dg) FROM degrc) - 1)) AS k)""",
        )
        + """
SELECT k::BIGINT AS k,
       n::BIGINT AS n_nodes,
       e::BIGINT AS n_edges,
       ROUND(2.0 * e / (n * (n - 1.0)), 8) AS phi
FROM (SELECT k,
             (SELECT count(*) FROM degrc WHERE dg > k) AS n,
             (SELECT count(*) FROM merc WHERE m > k) AS e
      FROM krc)
WHERE n >= 2"""
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


def boilerplate_sql(min_docs: int = 20) -> str:
    """Mirrors queries.q_boilerplate + ops.textstats.remove_boilerplate:
    plant the promo header / 8-word-head / remainder lines, then drop every
    line occurring in >= min_docs distinct docs and re-join kept lines in
    order (engine hash equality == line equality up to the documented
    ~2^-64 FNV collision trade)."""
    return f"""
WITH base AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
planted AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0
          THEN 'promo variant ' || (doc_id % 3)::VARCHAR || chr(10)
          ELSE '' END)
    || array_to_string(ws[1:8], ' ') || chr(10) || array_to_string(ws[9:], ' ')
    AS t2
  FROM base),
l AS (
  SELECT doc_id, unnest(string_split(t2, chr(10))) AS line,
         generate_subscripts(string_split(t2, chr(10)), 1) AS i
  FROM planted),
freq AS (SELECT line FROM l GROUP BY line
         HAVING count(DISTINCT doc_id) >= {min_docs}),
kept AS (SELECT doc_id, i, line FROM l
         WHERE line NOT IN (SELECT line FROM freq)),
agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS clean_text,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, count(*) AS n_lines FROM l GROUP BY doc_id)
SELECT t.doc_id, COALESCE(a.clean_text, '') AS clean_text,
       (t.n_lines - COALESCE(a.n_kept, 0))::BIGINT AS n_removed,
       t.n_lines::BIGINT AS n_lines
FROM tot t LEFT JOIN agg a USING (doc_id)"""


def cms_topk_sql(k: int = 50, depth: int = 4, width_bits: int = 12) -> str:
    """Mirrors ops.sketch.cms_word_topk register-for-register: register
    (j, pos) sums the TRUE counts of every word with
    splitmix64(fnv1a(word) XOR j*GOLDEN) & (2^width_bits - 1) == pos; the
    estimate is the MIN over the word's depth registers."""
    golden = 0x9E3779B97F4A7C15
    m = (1 << width_bits) - 1
    consts = ", ".join(
        f"({j}, CAST({(j * golden) % (1 << 64)} AS UBIGINT))" for j in range(depth)
    )
    pos_w = f"CAST({_sm64('xor(wh.h, c.cj)')} & CAST({m} AS UBIGINT) AS BIGINT)"
    pos_t = f"CAST({_sm64('xor(t.h, c2.cj)')} & CAST({m} AS UBIGINT) AS BIGINT)"
    return f"""
WITH wc AS MATERIALIZED (
  SELECT token, count(*)::BIGINT AS cnt FROM (
    SELECT unnest(regexp_extract_all(lower(text), '{WORD_PATTERN}')) AS token
    FROM documents) GROUP BY token),
wh AS MATERIALIZED (SELECT token, cnt, {_fnv64("token")} AS h FROM wc),
consts(j, cj) AS (VALUES {consts}),
reg AS MATERIALIZED (
  SELECT c.j AS j, {pos_w} AS pos, SUM(wh.cnt)::BIGINT AS r
  FROM wh, consts c GROUP BY 1, 2),
topk AS (SELECT token, cnt, h FROM wh ORDER BY cnt DESC, token LIMIT {k})
SELECT t.token, t.cnt, MIN(reg.r)::BIGINT AS est
FROM topk t CROSS JOIN consts c2
JOIN reg ON reg.j = c2.j AND reg.pos = {pos_t}
GROUP BY t.token, t.cnt"""


def egonet_sql(seeds=(17, 123), k: int = 2) -> str:
    """Mirrors pipelines.khop_egonet: recursive BFS to depth k over the
    symmetric adjacency, induced canonical simple edges."""
    vals = ", ".join(f"({s})" for s in seeds)
    return (
        _with(
            GRAPH_CTES,
            f"seedse(vid) AS (VALUES {vals})",
            f"""bfse(vid, d) AS (
  SELECT vid, 0 FROM seedse
  UNION
  SELECT e.dst, b.d + 1 FROM bfse b JOIN und e ON e.src = b.vid WHERE b.d < {k})""",
            "vise AS (SELECT DISTINCT vid FROM bfse)",
            """ece AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst)""",
            recursive=True,
        )
        + """
SELECT ece.a AS src, ece.b AS dst
FROM ece JOIN vise v1 ON v1.vid = ece.a JOIN vise v2 ON v2.vid = ece.b"""
    )


def mis_sql(rounds: int = 16, seed: int = 0) -> str:
    """Mirrors algos.mis.maximal_independent_set bit-for-bit: priority =
    splitmix64(vid XOR seed); per round, alive vertices beating every alive
    neighbour's priority (or with no alive neighbour) join, their alive
    neighbours are removed. Unrolled like the k-truss oracle — rounds past
    the engine's convergence are empty no-ops."""

    def p(x: str) -> str:
        return _sm64(f"xor(CAST({x} AS UBIGINT), CAST({seed} AS UBIGINT))")

    ctes = [
        GRAPH_CTES,
        """alv0 AS MATERIALIZED (
  SELECT DISTINCT src AS vid FROM und WHERE src <> dst)""",
    ]
    for r in range(rounds):
        ctes.append(
            f"""mn{r} AS MATERIALIZED (
  SELECT e.src AS vid, MIN({p('e.dst')}) AS mp
  FROM und e JOIN alv{r} x ON x.vid = e.src JOIN alv{r} y ON y.vid = e.dst
  WHERE e.src <> e.dst GROUP BY e.src)"""
        )
        ctes.append(
            f"""wn{r} AS MATERIALIZED (
  SELECT a.vid FROM alv{r} a LEFT JOIN mn{r} m ON m.vid = a.vid
  WHERE m.mp IS NULL OR {p('a.vid')} < m.mp)"""
        )
        ctes.append(
            f"""rm{r} AS MATERIALIZED (
  SELECT DISTINCT e.dst AS vid
  FROM und e JOIN wn{r} w ON w.vid = e.src JOIN alv{r} y ON y.vid = e.dst
  WHERE e.src <> e.dst)"""
        )
        ctes.append(
            f"""alv{r + 1} AS MATERIALIZED (
  SELECT vid FROM alv{r}
  WHERE vid NOT IN (SELECT vid FROM wn{r})
    AND vid NOT IN (SELECT vid FROM rm{r}))"""
        )
    union = "\nUNION ALL ".join(
        f"SELECT vid, CAST({r} AS BIGINT) AS mis_round FROM wn{r}"
        for r in range(rounds)
    )
    return _with(*ctes) + "\n" + union


def coloring_sql(rounds: int = 32, seed: int = 0) -> str:
    """Mirrors algos.coloring.jp_coloring round for round: priority =
    splitmix64(vid XOR seed); per round, uncolored vertices beating every
    uncolored neighbour's priority (or with none) win and take
    color = mex{colors of already-colored neighbours}. mex relationally:
    candidates {0} union {c+1 : c used}, smallest candidate NOT used (an
    anti-join — all smaller candidates are used by mex's minimality).
    Unrolled like the MIS oracle — rounds past convergence are no-ops."""

    def p(x: str) -> str:
        return _sm64(f"xor(CAST({x} AS UBIGINT), CAST({seed} AS UBIGINT))")

    ctes = [
        GRAPH_CTES,
        "unc0 AS MATERIALIZED (SELECT vid FROM verts)",
        """col0 AS MATERIALIZED (
  SELECT CAST(NULL AS BIGINT) AS vid, CAST(NULL AS BIGINT) AS color,
         CAST(NULL AS BIGINT) AS jp_round WHERE FALSE)""",
    ]
    for r in range(rounds):
        ctes.append(
            f"""mn{r} AS MATERIALIZED (
  SELECT e.src AS vid, MIN({p('e.dst')}) AS mp
  FROM und e JOIN unc{r} x ON x.vid = e.src JOIN unc{r} y ON y.vid = e.dst
  WHERE e.src <> e.dst GROUP BY e.src)"""
        )
        ctes.append(
            f"""wn{r} AS MATERIALIZED (
  SELECT a.vid FROM unc{r} a LEFT JOIN mn{r} m ON m.vid = a.vid
  WHERE m.mp IS NULL OR {p('a.vid')} < m.mp)"""
        )
        ctes.append(
            f"""nc{r} AS MATERIALIZED (
  SELECT DISTINCT w.vid, c.color
  FROM wn{r} w JOIN und e ON e.src = w.vid JOIN col{r} c ON c.vid = e.dst
  WHERE e.src <> e.dst)"""
        )
        ctes.append(
            f"""cand{r} AS (
  SELECT vid, color + 1 AS cnd FROM nc{r}
  UNION ALL SELECT vid, 0 AS cnd FROM wn{r})"""
        )
        ctes.append(
            f"""mex{r} AS MATERIALIZED (
  SELECT a.vid, MIN(a.cnd)::BIGINT AS color
  FROM cand{r} a LEFT JOIN nc{r} b ON b.vid = a.vid AND b.color = a.cnd
  WHERE b.vid IS NULL GROUP BY a.vid)"""
        )
        ctes.append(
            f"""col{r + 1} AS MATERIALIZED (
  SELECT * FROM col{r}
  UNION ALL SELECT vid, color, CAST({r} AS BIGINT) AS jp_round FROM mex{r})"""
        )
        ctes.append(
            f"""unc{r + 1} AS MATERIALIZED (
  SELECT vid FROM unc{r} WHERE vid NOT IN (SELECT vid FROM wn{r}))"""
        )
    return (
        _with(*ctes)
        + f"\nSELECT vid, color, jp_round FROM col{rounds} ORDER BY vid"
    )


def _matching_ctes(rounds: int = 32) -> list:
    """CTE chain mirroring algos.matching.maximal_matching round for round:
    edge priority = splitmix64(splitmix64(src) XOR splitmix64(dst))
    (symmetric; incident ties impossible — splitmix is a bijection), per
    round every unmatched vertex's best alive edge is its (pri, partner)
    minimum, and mutual bests match. Unrolled; rounds past convergence are
    no-ops. Final table: mt{rounds} (vid, mate, match_round) — matched
    vertices only. Shared by matching_sql and coarsen_sql."""
    ctes = [
        GRAPH_CTES,
        f"""pv AS MATERIALIZED (
  SELECT vid, {_sm64('CAST(vid AS UBIGINT)')} AS h FROM verts)""",
        f"""ecand AS MATERIALIZED (
  SELECT e.src AS v, e.dst AS o, {_sm64('xor(a.h, b.h)')} AS pri
  FROM und e JOIN pv a ON a.vid = e.src JOIN pv b ON b.vid = e.dst
  WHERE e.src <> e.dst)""",
        """mt0 AS MATERIALIZED (
  SELECT CAST(NULL AS BIGINT) AS vid, CAST(NULL AS BIGINT) AS mate,
         CAST(NULL AS BIGINT) AS match_round WHERE FALSE)""",
    ]
    for r in range(rounds):
        ctes.append(
            f"""al{r} AS MATERIALIZED (
  SELECT c.v, c.o, c.pri FROM ecand c
  WHERE c.v NOT IN (SELECT vid FROM mt{r})
    AND c.o NOT IN (SELECT vid FROM mt{r}))"""
        )
        ctes.append(
            f"""bs{r} AS MATERIALIZED (
  SELECT v, o FROM (
    SELECT v, o, ROW_NUMBER() OVER (PARTITION BY v ORDER BY pri, o) AS rn
    FROM al{r}) WHERE rn = 1)"""
        )
        ctes.append(
            f"""wn{r} AS MATERIALIZED (
  SELECT a.v, a.o FROM bs{r} a JOIN bs{r} b ON b.v = a.o AND b.o = a.v)"""
        )
        ctes.append(
            f"""mt{r + 1} AS MATERIALIZED (
  SELECT * FROM mt{r}
  UNION ALL
  SELECT v AS vid, o AS mate, CAST({r} AS BIGINT) AS match_round
  FROM wn{r})"""
        )
    return ctes


def matching_sql(rounds: int = 32) -> str:
    """See _matching_ctes."""
    return (
        _with(*_matching_ctes(rounds))
        + f"""
SELECT vv.vid, COALESCE(m.mate, -1) AS mate,
       COALESCE(m.match_round, -1) AS match_round
FROM verts vv LEFT JOIN mt{rounds} m ON m.vid = vv.vid ORDER BY vv.vid"""
    )


def coarsen_sql(rounds: int = 32) -> str:
    """Mirror of algos.matching.coarsen_graph: contract the maximal
    matching to MIN-vid representatives, drop self-loops, sum parallel
    edges."""
    ctes = _matching_ctes(rounds) + [
        f"""rep AS (
  SELECT vv.vid,
         CASE WHEN m.mate IS NOT NULL THEN LEAST(vv.vid, m.mate)
              ELSE vv.vid END AS r
  FROM verts vv LEFT JOIN mt{rounds} m ON m.vid = vv.vid)""",
        """ce AS (
  SELECT LEAST(ra.r, rb.r) AS csrc, GREATEST(ra.r, rb.r) AS cdst
  FROM (SELECT src, dst FROM und WHERE src < dst) e
  JOIN rep ra ON ra.vid = e.src
  JOIN rep rb ON rb.vid = e.dst
  WHERE ra.r <> rb.r)""",
    ]
    return (
        _with(*ctes)
        + """
SELECT csrc::BIGINT AS csrc, cdst::BIGINT AS cdst,
       count(*)::BIGINT AS weight
FROM ce GROUP BY 1, 2"""
    )


def pii_redact_sql() -> str:
    """Mirrors queries.q_pii_redact + ops.textstats.pii_redact: the same
    planting as pii_scan_sql, then the fixed three-stage RE2 global
    replacement (each pattern counted on the text as it stands before its
    own replacement)."""
    planted = (
        "text"
        " || CASE WHEN doc_id % 7 = 0 THEN ' contact admin' || doc_id || '@example.com' ELSE '' END"
        " || CASE WHEN doc_id % 11 = 0 THEN ' 10.' || (doc_id % 256) || '.0.' || (doc_id % 100) ELSE '' END"
        " || CASE WHEN doc_id % 13 = 0 THEN ' ' || (1000000000 + doc_id) ELSE '' END"
    )
    em = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
    ip = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
    ln = r"\b[0-9]{9,16}\b"
    return f"""
WITH t0 AS (SELECT doc_id, {planted} AS t FROM documents),
t1 AS (SELECT doc_id, len(regexp_extract_all(t, '{em}'))::BIGINT AS n_em,
              regexp_replace(t, '{em}', '<EMAIL>', 'g') AS t FROM t0),
t2 AS (SELECT doc_id, n_em, len(regexp_extract_all(t, '{ip}'))::BIGINT AS n_ip,
              regexp_replace(t, '{ip}', '<IP>', 'g') AS t FROM t1),
t3 AS (SELECT doc_id, n_em, n_ip,
              len(regexp_extract_all(t, '{ln}'))::BIGINT AS n_ln,
              regexp_replace(t, '{ln}', '<NUM>', 'g') AS t FROM t2)
SELECT doc_id, t AS redacted_text, (n_em + n_ip + n_ln)::BIGINT AS n_redactions
FROM t3"""


def chunk_docs_sql(chunk: int = 64, overlap: int = 16) -> str:
    """Mirrors ops.select.chunk_docs: [a-z]+ words, windows of ``chunk``
    words starting every ``chunk - overlap``; starts < n_words; 0-word docs
    yield no rows."""
    step = chunk - overlap
    return f"""
WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '{WORD_PATTERN}') AS ws
           FROM documents)
SELECT doc_id, k AS chunk_idx,
       array_to_string(ws[k*{step}+1 : k*{step}+{chunk}], ' ') AS chunk_text,
       LEAST(len(ws) - k*{step}, {chunk})::BIGINT AS n_tokens
FROM w, unnest(generate_series(0,
       CAST(CEIL(len(ws) * 1.0 / {step}) AS BIGINT) - 1)) AS t(k)
WHERE len(ws) > 0"""


def mst_sql(rounds: int = 14) -> str:
    """Mirrors algos.mst.minimum_spanning_forest + queries.q_mst: Boruvka
    unrolled ``rounds`` times (components at least halve per round; rounds
    past convergence are empty no-ops). Per round: cross edges under the
    current labels, per-component min edge by the (w, a, b) total order
    (ROW_NUMBER), then a recursive min-label closure over the selected
    component graph for the relabel — label VALUES differ from the
    engine's 2-cycle roots but the vertex partition is identical, and the
    forest output carries no labels."""
    ctes = [
        GRAPH_CTES,
        """wea AS MATERIALIZED (
  SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
         MIN(1 + (7*src + 13*dst) % 5) AS w
  FROM edges WHERE src <> dst GROUP BY 1, 2)""",
        """cmp0 AS MATERIALIZED (
  SELECT vid, vid AS comp FROM (
    SELECT a AS vid FROM wea UNION SELECT b FROM wea))""",
    ]
    for r in range(rounds):
        ctes.append(
            f"""ce{r} AS MATERIALIZED (
  SELECT e.a, e.b, e.w, ca.comp AS ca, cb.comp AS cb
  FROM wea e JOIN cmp{r} ca ON ca.vid = e.a JOIN cmp{r} cb ON cb.vid = e.b
  WHERE ca.comp <> cb.comp)"""
        )
        ctes.append(
            f"""sel{r} AS MATERIALIZED (
  SELECT c, p, a, b, w FROM (
    SELECT c, p, a, b, w,
           ROW_NUMBER() OVER (PARTITION BY c ORDER BY w, a, b) AS rn
    FROM (SELECT ca AS c, cb AS p, a, b, w FROM ce{r}
          UNION ALL SELECT cb, ca, a, b, w FROM ce{r}))
  WHERE rn = 1)"""
        )
        ctes.append(
            f"""su{r} AS MATERIALIZED (
  SELECT c, p FROM sel{r} UNION SELECT p, c FROM sel{r})"""
        )
        ctes.append(
            f"""cl{r} AS (
  SELECT DISTINCT c, c AS l FROM su{r}
  UNION
  SELECT e.p, x.l FROM cl{r} x JOIN su{r} e ON e.c = x.c)"""
        )
        ctes.append(
            f"rt{r} AS MATERIALIZED (SELECT c, MIN(l) AS l FROM cl{r} GROUP BY c)"
        )
        ctes.append(
            f"""cmp{r + 1} AS MATERIALIZED (
  SELECT v.vid, COALESCE(rt.l, v.comp) AS comp
  FROM cmp{r} v LEFT JOIN rt{r} rt ON rt.c = v.comp)"""
        )
    union = "\n  UNION ALL ".join(
        f"SELECT a, b, w FROM sel{r}" for r in range(rounds)
    )
    return (
        _with(*ctes, recursive=True)
        + f"""
SELECT a::BIGINT AS src, b::BIGINT AS dst, CAST(w AS DOUBLE) AS weight
FROM (SELECT DISTINCT a, b, w FROM ({union}))"""
    )


def negative_samples_sql(k: int = 3, seed: int = 0) -> str:
    """Mirrors pipelines.negative_samples bit-for-bit: candidate
    w = splitmix64(u XOR (j+1)*GOLDEN XOR seed) % n, kept iff w != u and
    {u, w} is not a canonical edge."""
    golden = 0x9E3779B97F4A7C15
    consts = ", ".join(
        f"({j}, CAST({((j + 1) * golden) % (1 << 64)} AS UBIGINT))"
        for j in range(k)
    )
    h = _sm64(f"xor(xor(CAST(v.vid AS UBIGINT), c.cj), CAST({seed} AS UBIGINT))")
    return (
        _with(
            GRAPH_CTES,
            f"nconsts(j, cj) AS (VALUES {consts})",
            """nue AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst)""",
            f"""ncand AS (
  SELECT v.vid AS src,
         CAST(({h}) % (SELECT CAST(n AS UBIGINT) FROM nn) AS BIGINT) AS dst,
         c.j AS slot
  FROM verts v CROSS JOIN nconsts c)""",
        )
        + """
SELECT src, dst, slot FROM ncand
WHERE dst <> src
  AND NOT EXISTS (SELECT 1 FROM nue
                  WHERE nue.a = LEAST(src, dst)
                    AND nue.b = GREATEST(src, dst))"""
    )


def customer_distribution_sql() -> str:
    """Mirrors queries.q_customer_distribution (TPC-H Q13 shape): LEFT
    OUTER JOIN customer x filtered order counts, histogram over the count
    including the zero bin."""
    return """
WITH oc AS (SELECT o_custkey, count(*) AS c_count FROM orders
            WHERE o_orderpriority <> '1-URGENT' GROUP BY o_custkey)
SELECT c_count::BIGINT AS c_count, count(*)::BIGINT AS custdist
FROM (SELECT COALESCE(oc.c_count, 0) AS c_count
      FROM customer c LEFT JOIN oc ON oc.o_custkey = c.c_custkey)
GROUP BY 1"""


def sliding_window_sql(size_sec: int = 3600, slide_sec: int = 900) -> str:
    """Mirrors ops.windows.sliding_window: window starts k*slide for k in
    [floor((e - size)/slide) + 1, floor(e/slide)] (epochs positive, so
    float floor-division is exact below 2^53)."""
    return f"""
SELECT user_id::BIGINT AS user_id,
       (k * {slide_sec})::BIGINT AS window_start,
       count(*)::BIGINT AS n_events,
       ROUND(SUM(value), 6) AS sum_value
FROM (
  SELECT user_id, value,
         unnest(generate_series(
           CAST(floor((epoch(ts) - {size_sec}) / {slide_sec}) AS BIGINT) + 1,
           CAST(floor(epoch(ts) / {slide_sec}) AS BIGINT))) AS k
  FROM events)
GROUP BY 1, 2"""


def table_profile_sql() -> str:
    """Mirrors ops.select.table_profile over the events numeric columns."""
    parts = []
    for c in ("event_id", "user_id", "value"):
        parts.append(
            f"""SELECT '{c}' AS "column", count(*)::BIGINT AS n,
       (count(*) - count({c}))::BIGINT AS n_null,
       CAST(min({c}) AS DOUBLE) AS "min", CAST(max({c}) AS DOUBLE) AS "max"
FROM events"""
        )
    return "\nUNION ALL ".join(parts)


def dataset_checksum_sql() -> str:
    """Mirrors ops.select.dataset_checksum bit-for-bit: per-row hash =
    splitmix64(fnv1a(text) XOR uint64(doc_id)), folded with bit_xor
    (order-invariant), reinterpreted as two's-complement BIGINT."""
    h = _sm64(f"xor({_fnv64('text')}, CAST(doc_id AS UBIGINT))")
    return f"""
WITH hx AS (SELECT {h} AS x FROM documents),
fx AS (SELECT count(*)::BIGINT AS n_rows, bit_xor(x) AS xr FROM hx)
SELECT n_rows,
       CASE WHEN xr >= 9223372036854775808
            THEN CAST(xr - 18446744073709551616 AS BIGINT)
            ELSE CAST(xr AS BIGINT) END AS checksum
FROM fx"""


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


def graph_update_sql(iters: int = 30, decimals: int = 8) -> str:
    """Mirrors queries.q_graph_update: the recrawl edit (drop out-edges of
    src % 13 == 5 pages, add (i, (7i+11) % m) for i % 29 == 1, self-loops
    excluded) applied to the synthetic edge set, then the standard unrolled
    PageRank CTEs over the EDITED graph."""
    ctes = [
        GRAPH_CTES,
        """ed AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges WHERE src % 13 <> 5
    UNION ALL
    SELECT d.doc_id, (7 * d.doc_id + 11) % p.m FROM documents d, mm p
    WHERE d.doc_id % 29 = 1 AND (7 * d.doc_id + 11) % p.m <> d.doc_id
  ))""",
        "deg2 AS (SELECT src AS vid, count(*)::BIGINT AS outdeg FROM ed GROUP BY src)",
        "pr0 AS (SELECT vid, 1.0 / nn.n AS rank FROM verts, nn)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""pr{t} AS MATERIALIZED (
  SELECT v.vid, 0.15 / (SELECT n FROM nn) + 0.85 * COALESCE(s.ms, 0) AS rank
  FROM verts v LEFT JOIN (
    SELECT e.dst AS vid, SUM(p.rank / d.outdeg) AS ms
    FROM pr{t - 1} p JOIN deg2 d ON d.vid = p.vid JOIN ed e ON e.src = p.vid
    GROUP BY e.dst
  ) s ON s.vid = v.vid)"""
        )
    return (
        _with(*ctes)
        + f"\nSELECT vid::BIGINT AS vid, ROUND(rank, {decimals}) AS rank FROM pr{iters}"
    )


def quality_score_sql(dim: int = 1 << 16, seed_const: int = 10451216379200822465) -> str:
    """Mirrors queries.q_quality_score bit-for-bit: weight of a word =
    (splitmix64((fnv1a(word) % dim) XOR splitmix64(seed)) % 15) - 7 with
    splitmix64(seed=1) inlined as a constant (10451216379200822465),
    score = per-doc sum over occurrences, label = score > 0."""
    j = f"{_fnv64('word')} % CAST({dim} AS UBIGINT)"
    w = _sm64(f"xor({j}, CAST({seed_const} AS UBIGINT))")
    return f"""
WITH occ AS MATERIALIZED (
  SELECT d.doc_id, unnest(regexp_extract_all(lower(d.text), '[a-z]+')) AS word
  FROM documents d
),
wt AS MATERIALIZED (
  SELECT word, CAST({w} % CAST(15 AS UBIGINT) AS BIGINT) - 7 AS w
  FROM (SELECT DISTINCT word FROM occ)
),
sc AS (
  SELECT o.doc_id, SUM(w.w)::BIGINT AS score
  FROM occ o JOIN wt w ON w.word = o.word GROUP BY o.doc_id
)
SELECT d.doc_id, COALESCE(sc.score, 0)::BIGINT AS score,
       CAST(CASE WHEN COALESCE(sc.score, 0) > 0 THEN 1 ELSE 0 END AS TINYINT) AS label
FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
ORDER BY d.doc_id"""


def _bpe_ctes(rounds: int, merge_all: bool) -> list:
    """Shared CTE chain for the BPE oracles: v0 = word vocabulary with
    character symbol lists; each round counts adjacent symbol pairs
    weighted by word count (overlapping occurrences included, exactly like
    the engine's flattened zip), picks the best by (count DESC, lhs, rhs)
    binary order (identical to python's code-point order for the [a-z]+
    vocabulary), and applies the greedy left-to-right non-overlapping
    merge via run-grouped even offsets (consecutive matched positions are
    within one word by construction). All integer arithmetic.
    ``merge_all`` also applies the LAST selected merge (yielding
    v{rounds}, the fully-merged vocabulary for tokenizer inference)."""
    parts = [
        f"""v0 AS MATERIALIZED (
  SELECT word, count(*)::BIGINT AS cnt,
         list_transform(generate_series(1, length(word)), i -> word[i]) AS syms
  FROM (SELECT unnest(regexp_extract_all(lower(text), '{WORD_PATTERN}')) AS word
        FROM documents)
  GROUP BY word)"""
    ]
    for r in range(rounds):
        parts.append(
            f"""p{r} AS (SELECT l, r2, SUM(cnt)::BIGINT AS c FROM (
    SELECT syms[i] AS l, syms[i+1] AS r2, cnt
    FROM v{r}, unnest(generate_series(1, len(syms)-1)) AS t(i))
  GROUP BY l, r2),
b{r} AS MATERIALIZED (SELECT l, r2, c FROM p{r} ORDER BY c DESC, l, r2 LIMIT 1)"""
        )
        if merge_all or r < rounds - 1:
            parts.append(
                f"""m{r} AS (SELECT word, cnt, i, syms[i] AS s,
    (i < len(syms) AND syms[i] = b.l AND syms[i+1] = b.r2) AS mm
  FROM v{r}, b{r} b, unnest(generate_series(1, len(syms))) AS t(i)),
k{r} AS (SELECT word, i FROM (
    SELECT word, i, i - MIN(i) OVER (PARTITION BY word, i - rn) AS off
    FROM (SELECT word, i, ROW_NUMBER() OVER (PARTITION BY word ORDER BY i) AS rn
          FROM m{r} WHERE mm))
  WHERE off % 2 = 0),
v{r + 1} AS MATERIALIZED (
  SELECT m.word, m.cnt,
         list(CASE WHEN k1.i IS NOT NULL THEN b.l || b.r2 ELSE m.s END
              ORDER BY m.i) AS syms
  FROM m{r} m CROSS JOIN b{r} b
  LEFT JOIN k{r} k1 ON k1.word = m.word AND k1.i = m.i
  LEFT JOIN k{r} k2 ON k2.word = m.word AND k2.i = m.i - 1
  WHERE k2.i IS NULL
  GROUP BY m.word, m.cnt)"""
            )
    return parts


def bpe_merges_sql(rounds: int = 6) -> str:
    """Mirrors ops/bpe.bpe_merges round for round (see _bpe_ctes)."""
    parts = _bpe_ctes(rounds, merge_all=False)
    unions = "\nUNION ALL\n".join(
        f"SELECT {r}::BIGINT AS round, l AS lhs, r2 AS rhs, l || r2 AS merged,"
        f" c AS cnt FROM b{r}"
        for r in range(rounds)
    )
    return "WITH " + ",\n".join(parts) + f"\nSELECT * FROM ({unions}) ORDER BY round"


def bpe_token_count_sql(rounds: int = 6) -> str:
    """Mirrors ops/bpe.bpe_token_count: learn ``rounds`` merges, apply ALL
    of them to the vocabulary (v{rounds}), then per-doc subword token count
    = sum of len(syms) over the doc's word occurrences; docs with no words
    count 0. Assumes the corpus yields >= rounds merges (true for the
    synthetic documents at every sf; the engine stops early otherwise)."""
    parts = _bpe_ctes(rounds, merge_all=True)
    parts.append(
        f"""occ AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_PATTERN}')) AS word
  FROM documents),
tc AS (
  SELECT o.doc_id, SUM(len(v.syms))::BIGINT AS n
  FROM occ o JOIN v{rounds} v USING (word) GROUP BY o.doc_id)"""
    )
    return (
        "WITH " + ",\n".join(parts)
        + """
SELECT d.doc_id, COALESCE(tc.n, 0)::BIGINT AS n_bpe_tokens
FROM documents d LEFT JOIN tc ON tc.doc_id = d.doc_id"""
    )


def big_orders_sql() -> str:
    """TPC-H Q18 shape (queries.q_big_orders): total_price is the exact
    cents integer divided once by 100.0 (identical IEEE op on both sides);
    the HAVING threshold and the (price DESC, orderkey) top-100 rule match
    the engine's integer sort keys."""
    return """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(round(l_quantity) AS BIGINT))::BIGINT AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > 300)
SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
       ROUND(o.o_totalprice * 100)::BIGINT / 100.0 AS total_price,
       b.sum_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY ROUND(o.o_totalprice * 100)::BIGINT DESC, o.o_orderkey
LIMIT 100"""


def returned_revenue_sql() -> str:
    """TPC-H Q10 shape (queries.q_returned_revenue): integer-scaled
    (cents x discount-percent) revenue — exact int64 sums, one final IEEE
    division by 10000.0; deterministic top-20 by (revenue DESC, custkey)."""
    return """
WITH rev AS (
  SELECT o.o_custkey AS ckey,
         SUM(ROUND(l.l_extendedprice * 100)::BIGINT
             * (100 - ROUND(l.l_discount * 100)::BIGINT))::BIGINT AS r
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1996-07-01'
  GROUP BY o.o_custkey),
top AS (SELECT ckey, r FROM rev ORDER BY r DESC, ckey LIMIT 20)
SELECT c.c_custkey, c.c_name, c.c_acctbal, t.r / 10000.0 AS revenue
FROM top t JOIN customer c ON c.c_custkey = t.ckey"""


def katz_sql(iters: int = 8, alpha: float = 0.05, beta: float = 1.0,
             decimals: int = 8) -> str:
    """Katz centrality unrolled like pagerank_sql: x0 = beta,
    x_{t+1} = beta + alpha * SUM(in-neighbor x_t) (no degree
    normalization). Float association differences are absorbed by
    ROUND(.., decimals) on both sides."""
    ctes = [
        GRAPH_CTES,
        f"k0 AS (SELECT vid, {beta!r}::DOUBLE AS rank FROM verts)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""k{t} AS MATERIALIZED (
  SELECT v.vid, {beta!r} + {alpha!r} * COALESCE(s.ms, 0) AS rank
  FROM verts v LEFT JOIN (
    SELECT e.dst AS vid, SUM(p.rank) AS ms
    FROM k{t - 1} p JOIN edges e ON e.src = p.vid
    GROUP BY e.dst
  ) s ON s.vid = v.vid)"""
        )
    return (
        _with(*ctes)
        + f"\nSELECT vid::BIGINT AS vid, ROUND(rank, {decimals}) AS rank FROM k{iters}"
    )


def eigenvector_sql(iters: int = 8, decimals: int = 8) -> str:
    """Mirrors algos.eigenvector.eigenvector_centrality: x0 = 1/N,
    x_t = (in-neighbor sum of x_{t-1}) / SUM(x_{t-1}), final output
    x_K / SUM(x_K) — L1-normalized power iteration. Float association
    differences are absorbed by ROUND(.., decimals) on both sides; a
    zero norm (edgeless graph) yields all-zero scores on both sides."""
    ctes = [
        GRAPH_CTES,
        "ev0 AS (SELECT vid, 1.0 / (SELECT n FROM nn) AS x FROM verts)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""ev{t} AS MATERIALIZED (
  SELECT v.vid,
         CASE WHEN (SELECT SUM(x) FROM ev{t - 1}) = 0 THEN 0.0
              ELSE COALESCE(s.ms, 0) / (SELECT SUM(x) FROM ev{t - 1}) END AS x
  FROM verts v LEFT JOIN (
    SELECT e.dst AS vid, SUM(p.x) AS ms
    FROM ev{t - 1} p JOIN edges e ON e.src = p.vid
    GROUP BY e.dst
  ) s ON s.vid = v.vid)"""
        )
    return (
        _with(*ctes)
        + f"""
SELECT vid::BIGINT AS vid,
       ROUND(CASE WHEN (SELECT SUM(x) FROM ev{iters}) = 0 THEN 0.0
                  ELSE x / (SELECT SUM(x) FROM ev{iters}) END,
             {decimals}) AS score
FROM ev{iters}"""
    )


def node2vec_sql(walk_len: int = 6, w_return: int = 1, w_common: int = 4,
                 w_far: int = 2, seed: int = 0) -> str:
    """Mirrors algos.walks.node2vec_walks bit-for-bit: candidate weight =
    w_return if cand == prev, w_common if edge (prev, cand) exists, w_far
    otherwise (step 0 has prev = -1 -> uniform w_far); the walker's draw is
    splitmix64(walker XOR (s+1)*K1 XOR seed) mod total_weight and the
    chosen candidate is the unique one with cw - wgt <= r < cw under
    (cand ASC) cumulative weights. Steps unrolled; edges are DISTINCT on
    both sides."""
    K1 = 0x9E3779B97F4A7C15
    ctes = [
        GRAPH_CTES,
        "n0 AS (SELECT DISTINCT src AS walker, CAST(-1 AS BIGINT) AS prev, "
        "src AS vid FROM edges)",
    ]
    for s in range(walk_len):
        c1 = ((s + 1) * K1) % (1 << 64)
        mix = (
            f"xor(xor(CAST(w.walker AS UBIGINT), CAST({c1} AS UBIGINT)), "
            f"CAST({seed} AS UBIGINT))"
        )
        ctes.append(
            f"""n{s + 1} AS MATERIALIZED (
  SELECT walker, cur AS prev, cand AS vid FROM (
    SELECT walker, cur, cand, wgt,
           SUM(wgt) OVER (PARTITION BY walker ORDER BY cand
                          ROWS UNBOUNDED PRECEDING) AS cw,
           CAST({_sm64('mx')} % CAST(SUM(wgt) OVER (PARTITION BY walker)
                                     AS UBIGINT) AS BIGINT) AS r
    FROM (
      SELECT w.walker, w.vid AS cur, e.dst AS cand, {mix} AS mx,
             CASE WHEN e.dst = w.prev THEN {w_return}
                  WHEN EXISTS (SELECT 1 FROM edges e2
                               WHERE e2.src = w.prev AND e2.dst = e.dst)
                  THEN {w_common}
                  ELSE {w_far} END AS wgt
      FROM n{s} w JOIN edges e ON e.src = w.vid))
  WHERE cw - wgt <= r AND r < cw)"""
        )
    union = "\nUNION ALL ".join(
        f"SELECT walker::BIGINT AS walker, {s}::BIGINT AS step, "
        f"vid::BIGINT AS vid FROM n{s}"
        for s in range(walk_len + 1)
    )
    return _with(*ctes) + "\n" + union


def quality_filter_sql(q: float = 0.8) -> str:
    """Percentile curation filter (queries.q_quality_filter): threshold =
    quantile_disc(score, q) over ALL docs' linear-model scores (the engine's
    group_quantiles rule equals quantile_disc exactly); survivors keep
    (doc_id, score)."""
    return f"""
WITH sc AS MATERIALIZED ({quality_score_sql()}),
thr AS (SELECT quantile_disc(score, {q}) AS t FROM sc)
SELECT sc.doc_id, sc.score FROM sc, thr WHERE sc.score >= thr.t"""


def containment_pairs_sql(n: int = 3, tau: float = 0.2) -> str:
    """ops/dedup.containment_pairs: the ngram_pairs_sql shape with the
    asymmetric ratio c / LEAST(|A|, |B|)."""
    assert n == 3, "oracle written for trigrams"
    return f"""
WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
g AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
  FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
  WHERE len(ws) >= 3
),
sz AS (SELECT doc_id, count(*) AS nb FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT ia::BIGINT AS doc_a, ib::BIGINT AS doc_b,
       ROUND(c * 1.0 / LEAST(sa.nb, sb.nb), 6) AS containment
FROM inter JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
WHERE ROUND(c * 1.0 / LEAST(sa.nb, sb.nb), 6) >= {tau}"""


def cohort_retention_sql(bucket_us: int = 604_800_000_000) -> str:
    """ops/windows.cohort_retention: integer floor-division epoch weeks
    (// on positive BIGINT microseconds), cohort = min active week per
    user, cells = distinct users per (cohort, offset)."""
    return f"""
WITH a AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {bucket_us} AS w FROM events),
c AS (SELECT user_id, MIN(w) AS cw FROM a GROUP BY user_id)
SELECT c.cw::BIGINT AS cohort, (a.w - c.cw)::BIGINT AS "offset",
       count(*)::BIGINT AS n_users
FROM a JOIN c USING (user_id)
GROUP BY 1, 2"""


def embedding_gram_sql(scale: int = 10**6) -> str:
    """Mirrors ops.similarity.embedding_gram: the kmeans quantization
    contract (CAST(round(v * scale) AS BIGINT)), integer products, upper
    triangle (0-based dims)."""
    return f"""
WITH geq AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS j,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * {scale}) AS BIGINT) AS x
  FROM embeddings)
SELECT a.j::BIGINT AS i, b.j::BIGINT AS j, SUM(a.x * b.x)::BIGINT AS g
FROM geq a JOIN geq b ON b.vec_id = a.vec_id AND b.j >= a.j
GROUP BY 1, 2"""


def running_total_sql() -> str:
    """Mirrors ops.windows.running_total: per-user windowed SUM in
    (ts, event_id) order; ROUND(.., 6) absorbs prefix-sum association
    differences between the sequential cumsum and the window aggregate."""
    return """
SELECT event_id, user_id, ts,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 6) AS cum_value
FROM events"""


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


def props_stats_sql() -> str:
    """Mirrors queries.q_props_stats: the integer k field of the JSON
    props payload via the same RE2 pattern (missing/unparseable -> 0,
    matching the engine's fill_null), per-event-type integer stats."""
    return r"""
SELECT event_type,
       count(*)::BIGINT AS n,
       SUM(k)::BIGINT AS sum_k,
       MIN(k)::BIGINT AS min_k,
       MAX(k)::BIGINT AS max_k
FROM (SELECT event_type,
             COALESCE(TRY_CAST(regexp_extract(COALESCE(props, ''),
                 '"k":\s*(-?\d+)', 1) AS BIGINT), 0) AS k
      FROM events)
GROUP BY event_type"""


def gap_quantiles_sql(qs=(0.5, 0.9, 0.99)) -> str:
    """Mirrors ops.windows.event_gap_quantiles: LAG per user over
    (ts, event_id), gap grouped by the later event's type, quantile_disc
    (== group_quantiles' ceil(q*n)-1 rule)."""
    base = """
WITH gpq AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events)
"""
    parts = " UNION ALL ".join(
        f"SELECT event_type, CAST({q} AS DOUBLE) AS q, "
        f"quantile_disc(gap_us, {q})::BIGINT AS gap_us "
        f"FROM gpq WHERE gap_us IS NOT NULL GROUP BY event_type"
        for q in qs
    )
    return base + parts


def rolling_actives_sql(window_days: int = 7) -> str:
    """ops/windows.rolling_active_users: day = epoch-day floor of ts,
    dau = distinct users per day, wau = distinct users over the trailing
    ``window_days`` days — mirrored as the same distinct-(day, user)
    expansion; output rows are exactly the days WITH events."""
    return f"""
WITH rap AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events),
rad AS (SELECT day, count(*)::BIGINT AS dau FROM rap GROUP BY day),
rax AS (SELECT DISTINCT day + j AS td, user_id
        FROM rap, unnest(generate_series(0, {window_days - 1})) AS t(j)),
raw_ AS (SELECT td, count(*)::BIGINT AS wau FROM rax GROUP BY td)
SELECT d.day::BIGINT AS day, d.dau, w.wau
FROM rad d JOIN raw_ w ON w.td = d.day"""


def reciprocity_sql() -> str:
    """pipelines.edge_reciprocity: distinct non-self directed edges;
    reciprocal iff the reverse edge exists; one IEEE division."""
    return _with(GRAPH_CTES) + """
, ce AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
agg AS (SELECT count(*)::BIGINT AS n,
               count(*) FILTER (EXISTS (SELECT 1 FROM ce b
                                        WHERE b.src = ce.dst
                                          AND b.dst = ce.src))::BIGINT AS r
        FROM ce)
SELECT n AS n_edges, r AS n_reciprocal, r * 1.0 / n AS reciprocity FROM agg"""


def event_transitions_sql() -> str:
    """ops/windows.event_transitions: per-user sequences ordered by
    (ts, event_id), adjacent transition counts."""
    return """
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events)
SELECT event_type AS from_type, nxt AS to_type, count(*)::BIGINT AS n
FROM s WHERE nxt IS NOT NULL
GROUP BY 1, 2"""


def avg_neighbor_degree_sql() -> str:
    """pipelines.avg_neighbor_degree: undirected simple closure, integer
    degree sums, one division per degree class (SUM*1.0/(k*n) equals the
    engine's int64/int64 numpy division exactly)."""
    return _with(GRAPH_CTES) + """
, anduu AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT src AS a, dst AS b FROM edges
    UNION ALL SELECT dst, src FROM edges)
  WHERE a <> b),
anddg AS MATERIALIZED (SELECT a AS vid, count(*)::BIGINT AS k FROM anduu GROUP BY a),
andss AS (SELECT u.a AS vid, SUM(d2.k)::BIGINT AS s
      FROM anduu u JOIN anddg d2 ON d2.vid = u.b GROUP BY u.a)
SELECT d.k AS deg, count(*)::BIGINT AS n_vertices, SUM(andss.s)::BIGINT AS sum_nbr_deg,
       SUM(andss.s) * 1.0 / (d.k * count(*)) AS avg_nbr_deg
FROM andss JOIN anddg d USING (vid) GROUP BY d.k"""


def part_profit_sql() -> str:
    """TPC-H Q9 shape (queries.q_part_profit): PROMO-part cents revenue per
    (supplier nation, ship year); integer sums, one division by 10000.0."""
    return """
SELECT n.n_name, year(l.l_shipdate)::BIGINT AS yr,
       SUM(ROUND(l.l_extendedprice * 100)::BIGINT
           * (100 - ROUND(l.l_discount * 100)::BIGINT))::BIGINT / 10000.0
         AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY 1, 2"""


def closeness_sql(seeds=(0, 1, 2, 7), cap: int = 160) -> str:
    """algos/centrality.closeness_of_seeds: per-seed reachable-set size and
    integer distance sum off the same recursive BFS CTEs as harmonic_sql;
    closeness = (r - 1) / s in one IEEE division."""
    ctes = [GRAPH_CTES]
    for j, seed in enumerate(seeds):
        ctes.append(
            f"""b{j} AS (
  SELECT CAST({seed} AS BIGINT) AS vid, 0 AS d
  UNION
  SELECT e.dst, x.d + 1 FROM b{j} x JOIN edges e ON e.src = x.vid WHERE x.d < {cap}
)"""
        )
        ctes.append(
            f"m{j} AS (SELECT vid, MIN(d) AS d FROM b{j} GROUP BY vid)"
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({seed} AS BIGINT) AS seed, count(*)::BIGINT AS n_reached,"
        f" SUM(d)::BIGINT AS dist_sum,"
        f" CASE WHEN SUM(d) > 0 THEN (count(*) - 1) * 1.0 / SUM(d)"
        f" ELSE 0.0 END AS closeness FROM m{j}"
        for j, seed in enumerate(seeds)
    )
    return _with(*ctes, recursive=True) + "\n" + unions


def brand_suppliers_sql() -> str:
    """TPC-H Q16 shape (queries.q_brand_suppliers): distinct suppliers per
    brand off the fact table."""
    return """
SELECT p.p_brand, count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY p.p_brand"""


def robustness_sql(k: int = 10) -> str:
    """queries.q_robustness: remove the top-k total-degree vertices
    (distinct directed edges, ties by vid) and measure the surviving
    undirected component structure — min-label closure like CC_CTE."""
    return _with(
        GRAPH_CTES,
        f"""dd AS (
  SELECT v.vid,
         (SELECT count(*) FROM edges e WHERE e.src = v.vid)
       + (SELECT count(*) FROM edges e WHERE e.dst = v.vid) AS d
  FROM verts v),
hubs AS MATERIALIZED (SELECT vid FROM dd ORDER BY d DESC, vid LIMIT {k}),
fverts AS MATERIALIZED (
  SELECT vid FROM verts WHERE vid NOT IN (SELECT vid FROM hubs)),
fund AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM edges
  WHERE src NOT IN (SELECT vid FROM hubs)
    AND dst NOT IN (SELECT vid FROM hubs)
  UNION
  SELECT dst, src FROM edges
  WHERE src NOT IN (SELECT vid FROM hubs)
    AND dst NOT IN (SELECT vid FROM hubs)),
flbl AS (
  SELECT vid, vid AS l FROM fverts
  UNION
  SELECT e.b, x.l FROM flbl x JOIN fund e ON e.a = x.vid),
fcomp AS (SELECT vid, MIN(l) AS l FROM flbl GROUP BY vid),
fsz AS (SELECT l, count(*)::BIGINT AS c FROM fcomp GROUP BY l)""",
        recursive=True,
    ) + f"""
SELECT {k}::BIGINT AS n_removed,
       (SELECT count(*) FROM fverts)::BIGINT AS n_vertices,
       (SELECT count(*) FROM fsz)::BIGINT AS n_components,
       (SELECT max(c) FROM fsz)::BIGINT AS giant_size"""


def forecast_revenue_sql() -> str:
    """TPC-H Q6 shape (queries.q_forecast_revenue): integer cents x
    discount-percent sum, one division by 10000.0."""
    return """
SELECT SUM(ROUND(l_extendedprice * 100)::BIGINT
           * ROUND(l_discount * 100)::BIGINT)::BIGINT / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND ROUND(l_discount * 100)::BIGINT BETWEEN 5 AND 7
  AND CAST(round(l_quantity) AS BIGINT) < 24"""


def novelty_sql(n: int = 3) -> str:
    """ops/dedup.novelty_scores: distinct per-doc trigram DF, unique
    fraction; docs with no grams score 0."""
    assert n == 3, "oracle written for trigrams"
    return """
WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
g AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
  FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
  WHERE len(ws) >= 3),
df AS (SELECT gram, count(*) AS c FROM g GROUP BY gram),
p AS (SELECT g.doc_id, count(*)::BIGINT AS t,
             count(*) FILTER (df.c = 1)::BIGINT AS u
      FROM g JOIN df USING (gram) GROUP BY g.doc_id)
SELECT d.doc_id, COALESCE(p.t, 0)::BIGINT AS n_grams,
       COALESCE(p.u, 0)::BIGINT AS n_unique,
       CASE WHEN COALESCE(p.t, 0) > 0 THEN p.u * 1.0 / p.t
            ELSE 0.0 END AS novelty
FROM documents d LEFT JOIN p USING (doc_id)"""


def search_topk_sql(terms=("spark", "join", "window"), k: int = 20) -> str:
    """ops/textstats.search_topk: tf x (N/df) in the given term order
    (left-associated float sum, identical on both engines)."""
    tfs = ", ".join(
        f"count(*) FILTER (word = '{t}')::BIGINT AS tf{j}"
        for j, t in enumerate(terms)
    )
    dfs = ", ".join(
        f"GREATEST((SELECT count(DISTINCT doc_id) FROM occ WHERE word = '{t}'),"
        f" 1) AS df{j}"
        for j, t in enumerate(terms)
    )
    score = " + ".join(
        f"tf.tf{j} * ((SELECT n FROM nn2) * 1.0 / dd.df{j})"
        for j in range(len(terms))
    )
    return f"""
WITH occ AS MATERIALIZED (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{WORD_PATTERN}')) AS word
  FROM documents),
nn2 AS (SELECT count(*)::BIGINT AS n FROM documents),
tf AS (SELECT doc_id, {tfs} FROM occ GROUP BY doc_id),
dd AS (SELECT {dfs})
SELECT tf.doc_id, {score} AS score
FROM tf, dd
WHERE {score} > 0
ORDER BY score DESC, tf.doc_id
LIMIT {k}"""


def walk_corpus_sql(walk_len: int = 6, w_return: int = 1, w_common: int = 4,
                    w_far: int = 2, seed: int = 0) -> str:
    """algos/walks.walks_to_corpus over the node2vec walks: per-walker
    step-ordered vid sequence as a space-joined line."""
    inner = node2vec_sql(walk_len, w_return, w_common, w_far, seed)
    return f"""
WITH wk AS ({inner})
SELECT walker, string_agg(vid::VARCHAR, ' ' ORDER BY step) AS seq
FROM wk GROUP BY walker"""


def corr_length_quality_sql() -> str:
    """queries.q_corr_length_quality: signed r^2 (sqrt-free Pearson)
    between char length and the linear-model score; HUGEINT integer sums,
    two int->double conversions, one division, ROUND 6."""
    return f"""
WITH sc AS MATERIALIZED ({quality_score_sql()}),
xy AS (SELECT length(COALESCE(d.text, ''))::BIGINT AS x, sc.score AS y
       FROM documents d JOIN sc ON sc.doc_id = d.doc_id),
s AS (SELECT count(*)::HUGEINT AS n, SUM(x)::HUGEINT AS sx,
             SUM(y)::HUGEINT AS sy, SUM(x*y)::HUGEINT AS sxy,
             SUM(x*x)::HUGEINT AS sxx, SUM(y*y)::HUGEINT AS syy
      FROM xy),
d AS (SELECT n, n*sxy - sx*sy AS num, n*sxx - sx*sx AS dx,
             n*syy - sy*sy AS dy FROM s)
SELECT n::BIGINT AS n_docs,
       CASE WHEN dx * dy = 0 THEN 0.0
            ELSE ROUND(CASE WHEN num < 0 THEN -1.0 ELSE 1.0 END
                       * (num*num)::DOUBLE / ((dx*dy)::DOUBLE), 6)
       END AS signed_r2
FROM d"""


def source_quality_sql() -> str:
    """queries.q_source_quality: integer score sums per source, one IEEE
    division per row (SUM::BIGINT * 1.0 / n == numpy int64/int64)."""
    return f"""
WITH sc AS MATERIALIZED ({quality_score_sql()})
SELECT d.source, count(*)::BIGINT AS n_docs,
       SUM(sc.score)::BIGINT AS sum_score,
       SUM(sc.score)::BIGINT * 1.0 / count(*) AS mean_score
FROM documents d JOIN sc ON sc.doc_id = d.doc_id
GROUP BY d.source"""


def wcc_sizes_sql() -> str:
    """Size distribution of the weakly connected components (scc_sizes'
    undirected sibling, off the shared CC_CTE min-label closure)."""
    return _with(GRAPH_CTES, CC_CTE, recursive=True) + """
SELECT size, count(*)::BIGINT AS n_components FROM (
  SELECT component, count(*)::BIGINT AS size FROM comp GROUP BY component)
GROUP BY size"""


def nation_trade_sql() -> str:
    """TPC-H Q7 shape (queries.q_nation_trade): cross-nation cents revenue
    per (supplier nation, customer nation, ship year); integer sums, one
    division by 10000.0."""
    return """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       year(l.l_shipdate)::BIGINT AS yr,
       SUM(ROUND(l.l_extendedprice * 100)::BIGINT
           * (100 - ROUND(l.l_discount * 100)::BIGINT))::BIGINT / 10000.0
         AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
WHERE s.s_nationkey <> c.c_nationkey
GROUP BY 1, 2, 3"""


def market_share_sql(region_name: str = "ASIA",
                     part_type: str = "STANDARD") -> str:
    """TPC-H Q8 shape (queries.q_market_share): target nation = the
    region's minimum nationkey; share = int64 num / int64 den, one double
    division per year (int->double conversion rounds identically on both
    sides)."""
    return f"""
WITH tgt AS (
  SELECT MIN(n_nationkey) AS k FROM nation n
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = '{region_name}')
SELECT year(o.o_orderdate)::BIGINT AS yr,
       SUM(CASE WHEN s.s_nationkey = (SELECT k FROM tgt)
           THEN ROUND(l.l_extendedprice * 100)::BIGINT
                * (100 - ROUND(l.l_discount * 100)::BIGINT) ELSE 0
           END)::BIGINT
       / SUM(ROUND(l.l_extendedprice * 100)::BIGINT
             * (100 - ROUND(l.l_discount * 100)::BIGINT))::BIGINT
         AS mkt_share
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = '{part_type}'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation nc ON nc.n_nationkey = c.c_nationkey
JOIN region rc ON rc.r_regionkey = nc.n_regionkey
WHERE rc.r_name = '{region_name}'
GROUP BY 1"""


def promo_revenue_sql() -> str:
    """TPC-H Q14 shape (queries.q_promo_revenue): per ship (year, month),
    100.0 * (num / den) with int64 cents sums — the parenthesized int/int
    double division first, then the scale, matching the engine's op
    order."""
    return """
SELECT year(l_shipdate)::BIGINT AS yr, month(l_shipdate)::BIGINT AS mo,
       100.0 * (
         SUM(CASE WHEN p.p_type = 'PROMO'
             THEN ROUND(l.l_extendedprice * 100)::BIGINT
                  * (100 - ROUND(l.l_discount * 100)::BIGINT) ELSE 0
             END)::BIGINT
         / SUM(ROUND(l.l_extendedprice * 100)::BIGINT
               * (100 - ROUND(l.l_discount * 100)::BIGINT))::BIGINT
       ) AS promo_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY 1, 2"""


def top_supplier_sql() -> str:
    """TPC-H Q15 shape (queries.q_top_supplier): max 1996Q1 cents revenue
    per supplier, ties surface; one division by 10000.0."""
    return """
WITH sr AS (
  SELECT l_suppkey,
         SUM(ROUND(l_extendedprice * 100)::BIGINT
             * (100 - ROUND(l_discount * 100)::BIGINT))::BIGINT AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT l_suppkey AS s_suppkey, rev / 10000.0 AS total_revenue
FROM sr WHERE rev = (SELECT MAX(rev) FROM sr)"""


def small_qty_revenue_sql() -> str:
    """TPC-H Q17 shape (queries.q_small_qty_revenue): the 20%-of-average
    quantity threshold evaluated in exact integers (5*qty*cnt < sumq —
    quantities are whole units), then cents/100.0/7.0 per part."""
    return """
WITH pq AS (
  SELECT l_partkey,
         SUM(CAST(round(l_quantity) AS BIGINT))::BIGINT AS sumq,
         COUNT(*)::BIGINT AS cnt
  FROM lineitem GROUP BY l_partkey)
SELECT l.l_partkey AS p_partkey,
       (SUM(ROUND(l.l_extendedprice * 100)::BIGINT)::BIGINT / 100.0) / 7.0
         AS avg_yearly
FROM lineitem l
JOIN pq ON pq.l_partkey = l.l_partkey
WHERE 5 * CAST(round(l.l_quantity) AS BIGINT) * pq.cnt < pq.sumq
GROUP BY 1"""


def salsa_sql(iters: int = 8, decimals: int = 8) -> str:
    """SALSA (algos/salsa.py): HITS with degree-normalized pushes —
    auth(v) = sum hub(u)/outdeg(u) over in-edges, hub(u) = sum
    auth(v)/indeg(v) over out-edges, each phase L1-normalized. Unrolled
    like hits_sql; the engine normalizes one superstep late with the
    broadcast sender L1 (constant factors cancel), differing only by float
    association — absorbed by ROUND(.., decimals)."""
    ctes = [
        GRAPH_CTES,
        "sod AS (SELECT src AS vid, COUNT(*)::BIGINT AS d FROM edges GROUP BY src)",
        "sid AS (SELECT dst AS vid, COUNT(*)::BIGINT AS d FROM edges GROUP BY dst)",
        "sh0 AS (SELECT vid, 1.0 / nn.n AS hub FROM verts, nn)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""sar{t} AS MATERIALIZED (
  SELECT v.vid, COALESCE(s.ms, 0) AS ar FROM verts v LEFT JOIN (
    SELECT e.dst AS vid, SUM(h.hub / od.d) AS ms
    FROM sh{t - 1} h
    JOIN edges e ON e.src = h.vid
    JOIN sod od ON od.vid = h.vid
    GROUP BY e.dst
  ) s ON s.vid = v.vid)"""
        )
        ctes.append(
            f"sa{t} AS (SELECT vid, ar / (SELECT SUM(ar) FROM sar{t}) AS auth FROM sar{t})"
        )
        ctes.append(
            f"""shr{t} AS MATERIALIZED (
  SELECT v.vid, COALESCE(s.ms, 0) AS hr FROM verts v LEFT JOIN (
    SELECT e.src AS vid, SUM(a.auth / id.d) AS ms
    FROM sa{t} a
    JOIN edges e ON e.dst = a.vid
    JOIN sid id ON id.vid = a.vid
    GROUP BY e.src
  ) s ON s.vid = v.vid)"""
        )
        ctes.append(
            f"sh{t} AS (SELECT vid, hr / (SELECT SUM(hr) FROM shr{t}) AS hub FROM shr{t})"
        )
    return (
        _with(*ctes)
        + f"""
SELECT a.vid::BIGINT AS vid, ROUND(a.auth, {decimals}) AS auth,
       ROUND(h.hub, {decimals}) AS hub
FROM sa{iters} a JOIN sh{iters} h ON h.vid = a.vid"""
    )


def dag_layers_sql(cap: int = 200) -> str:
    """SCC-condensation longest-path layers (algos/dag.py): the scc_sql
    mutual-reachability labels, distinct cross-component edges, recursive
    longest-path depth (MAX d per component — acyclic, terminates at the
    DAG depth; ``cap`` mirrors the engine's superstep cap)."""
    return (
        _with(
            GRAPH_CTES,
            """reach AS (
  SELECT src AS a, dst AS b FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
mut AS (SELECT r1.a AS v, r1.b AS u FROM reach r1
        JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a),
sccm AS (SELECT v.vid, GREATEST(v.vid, COALESCE(MAX(m.u), v.vid)) AS scc
         FROM verts v LEFT JOIN mut m ON m.v = v.vid GROUP BY v.vid),
ced AS (SELECT DISTINCT s1.scc AS ls, s2.scc AS ld
        FROM edges e
        JOIN sccm s1 ON s1.vid = e.src
        JOIN sccm s2 ON s2.vid = e.dst
        WHERE s1.scc <> s2.scc),
lp AS (
  SELECT scc AS lab, 0 AS d FROM (SELECT DISTINCT scc FROM sccm)
  UNION
  SELECT c.ld, x.d + 1 FROM lp x JOIN ced c ON c.ls = x.lab
  WHERE x.d < """ + str(cap) + """),
lay AS (SELECT lab, MAX(d)::BIGINT AS layer FROM lp GROUP BY lab)""",
            recursive=True,
        )
        + """
SELECT s.vid::BIGINT AS vid, s.scc::BIGINT AS scc, l.layer
FROM sccm s JOIN lay l ON l.lab = s.scc"""
    )


def line_dedup_sql() -> str:
    """Mirrors queries.q_line_dedup + ops.textstats.dedup_lines: plant the
    promo header / 8-word-head / remainder lines, keep each distinct line
    only at its first (doc_id, position) occurrence corpus-wide, re-join
    kept lines in order (engine hash equality == line equality up to the
    documented ~2^-64 FNV collision trade)."""
    return """
WITH base AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
planted AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0
          THEN 'promo variant ' || (doc_id % 3)::VARCHAR || chr(10)
          ELSE '' END)
    || array_to_string(ws[1:8], ' ') || chr(10) || array_to_string(ws[9:], ' ')
    AS t2
  FROM base),
l AS (
  SELECT doc_id, unnest(string_split(t2, chr(10))) AS line,
         generate_subscripts(string_split(t2, chr(10)), 1) AS i
  FROM planted),
kept AS (SELECT doc_id, i, line FROM l
         QUALIFY ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, i) = 1),
agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS clean_text,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, count(*) AS n_lines FROM l GROUP BY doc_id)
SELECT t.doc_id, COALESCE(a.clean_text, '') AS clean_text,
       (t.n_lines - COALESCE(a.n_kept, 0))::BIGINT AS n_removed,
       t.n_lines::BIGINT AS n_lines
FROM tot t LEFT JOIN agg a USING (doc_id)"""


def fastrp_sql(dims: int = 8, weights=(0.25, 0.5, 1.0),
               decimals: int = 8) -> str:
    """FastRP embeddings (algos/fastrp.py): deterministic sparse sign
    projection R[v,j] from splitmix64(v*dims + j) % 6 (0 -> +1, 1 -> -1,
    else 0), iters = len(weights) transition-matrix applications
    (val/outdeg pushed along out-edges), weighted sum with the engine's
    exact left-associated op order; ROUND absorbs float summation-order
    differences (the PageRank-family argument)."""
    key = f"CAST(g.vid * {dims} + g.j AS UBIGINT)"
    u = _sm64(key)
    proj = (f"CASE WHEN ({u}) % 6 = 0 THEN 1.0 "
            f"WHEN ({u}) % 6 = 1 THEN -1.0 ELSE 0.0 END")
    ctes = [
        GRAPH_CTES,
        f"fdim AS (SELECT unnest(range(0, {dims})) AS j)",
        "fgrid AS (SELECT v.vid, d.j FROM verts v, fdim d)",
        "fdeg AS (SELECT src AS vid, COUNT(*)::BIGINT AS d "
        "FROM edges GROUP BY src)",
        f"fx0 AS MATERIALIZED (SELECT g.vid, g.j, {proj} AS val FROM fgrid g)",
    ]
    for k in range(1, len(weights) + 1):
        ctes.append(
            f"""fx{k} AS MATERIALIZED (
  SELECT g.vid, g.j, COALESCE(s.ms, 0) AS val FROM fgrid g LEFT JOIN (
    SELECT e.dst AS vid, x.j, SUM(x.val / fd.d) AS ms
    FROM fx{k - 1} x
    JOIN edges e ON e.src = x.vid
    JOIN fdeg fd ON fd.vid = x.vid
    GROUP BY e.dst, x.j
  ) s ON s.vid = g.vid AND s.j = g.j)"""
        )
    terms = " + ".join(
        f"{w!r} * fx{k + 1}.val" for k, w in enumerate(weights)
    )
    joins = "".join(
        f"\nJOIN fx{k + 1} ON fx{k + 1}.vid = g.vid AND fx{k + 1}.j = g.j"
        for k in range(len(weights))
    )
    return (
        _with(*ctes)
        + f"""
SELECT g.vid::BIGINT AS vid, g.j::BIGINT AS dim,
       ROUND({terms}, {decimals}) AS emb
FROM fgrid g{joins}"""
    )


def source_overlap_sql(n: int = 8) -> str:
    """Mirrors ops.dedup.source_overlap: distinct (source, gram) pairs,
    self-joined on the gram with source_a < source_b (engine hash
    equality == gram equality up to the documented ~2^-64 FNV trade)."""
    gram = " || ' ' || ".join(
        f"ws[i+{j}]" for j in range(n)
    ).replace("ws[i+0]", "ws[i]")
    return f"""
WITH w AS (SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
           FROM documents),
g AS (SELECT source, {gram} AS gram
      FROM w, unnest(generate_series(1, len(ws) - {n - 1})) AS t(i)
      WHERE len(ws) >= {n}),
d AS (SELECT DISTINCT source, gram FROM g)
SELECT a.source AS source_a, b.source AS source_b,
       COUNT(*)::BIGINT AS shared_grams
FROM d a JOIN d b ON a.gram = b.gram AND a.source < b.source
GROUP BY 1, 2"""


def centroid_similarity_sql(decimals: int = 6) -> str:
    """Mirrors ops.similarity.centroid_similarity: per-(label, dim)
    centroid = SUM(val)/COUNT(*), L2 norms (IEEE sqrt is correctly
    rounded on both sides), pairwise dot via a dim self-join; float
    summation order differs from the engine's fixed-order fold — absorbed
    by ROUND(.., decimals), the PageRank-family argument."""
    return f"""
WITH ee AS (SELECT label::BIGINT AS label,
                   unnest(embedding) AS v,
                   generate_subscripts(embedding, 1) AS j
            FROM embeddings),
ec AS (SELECT label, j, SUM(CAST(v AS DOUBLE)) / COUNT(*) AS c
       FROM ee GROUP BY 1, 2),
en AS (SELECT label, SQRT(SUM(c * c)) AS nrm FROM ec GROUP BY 1),
ed AS (SELECT a.label AS la, b.label AS lb, SUM(a.c * b.c) AS dot
       FROM ec a JOIN ec b ON a.j = b.j AND a.label < b.label
       GROUP BY 1, 2)
SELECT d.la AS label_a, d.lb AS label_b,
       ROUND(d.dot / (na.nrm * nb.nrm), {decimals}) AS cosine
FROM ed d
JOIN en na ON na.label = d.la
JOIN en nb ON nb.label = d.lb"""


def part_revenue_share_sql() -> str:
    """TPC-H Q11 shape (queries.q_part_revenue_share): HAVING against a
    global aggregate, threshold 1.25/n_parts evaluated in exact integers
    (4 * rev * n_parts > 5 * total)."""
    return """
WITH prs AS (
  SELECT l_partkey,
         SUM(ROUND(l_extendedprice * 100)::BIGINT
             * (100 - ROUND(l_discount * 100)::BIGINT))::BIGINT AS rev
  FROM lineitem GROUP BY 1),
prt AS (SELECT SUM(rev)::BIGINT AS t,
               (SELECT COUNT(*) FROM part)::BIGINT AS np
        FROM prs)
SELECT p.l_partkey AS p_partkey, p.rev / 10000.0 AS part_revenue
FROM prs p, prt
WHERE 4 * p.rev * prt.np > 5 * prt.t"""


def dormant_customers_sql() -> str:
    """TPC-H Q22 shape (queries.q_dormant_customers): above-average
    positive balance in exact integers (bal * n > sum), NOT EXISTS
    recent (>= 2001-01-01) orders, per-nation count + total."""
    return """
WITH dcp AS (SELECT SUM(ROUND(c_acctbal * 100)::BIGINT)::BIGINT AS s,
                    COUNT(*)::BIGINT AS n
             FROM customer WHERE ROUND(c_acctbal * 100)::BIGINT > 0),
dcd AS (SELECT c_nationkey, ROUND(c_acctbal * 100)::BIGINT AS bal
        FROM customer c, dcp
        WHERE ROUND(c_acctbal * 100)::BIGINT * dcp.n > dcp.s
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= DATE '2001-01-01'))
SELECT c_nationkey, COUNT(*)::BIGINT AS numcust,
       SUM(bal)::BIGINT / 100.0 AS totacctbal
FROM dcd GROUP BY 1"""


def cheapest_supplier_sql() -> str:
    """TPC-H Q2 shape (queries.q_cheapest_supplier): per part the
    minimum-price line's supplier, ties to the smallest suppkey."""
    return """
WITH csm AS (
  SELECT l_partkey, MIN(ROUND(l_extendedprice * 100)::BIGINT) AS mc
  FROM lineitem GROUP BY 1),
csw AS (
  SELECT l.l_partkey, m.mc, MIN(l.l_suppkey) AS sk
  FROM lineitem l
  JOIN csm m ON m.l_partkey = l.l_partkey
            AND ROUND(l.l_extendedprice * 100)::BIGINT = m.mc
  GROUP BY 1, 2)
SELECT w.l_partkey AS p_partkey, w.mc / 100.0 AS min_price,
       w.sk AS s_suppkey, s.s_name AS s_name
FROM csw w JOIN supplier s ON s.s_suppkey = w.sk"""


def sole_supplier_sql() -> str:
    """TPC-H Q21 shape (queries.q_sole_supplier): suppliers who were the
    sole supplier on multi-line orders, counted per supplier."""
    return """
WITH sso AS (
  SELECT l_orderkey, MIN(l_suppkey) AS sk
  FROM lineitem GROUP BY 1
  HAVING COUNT(*) >= 2 AND COUNT(DISTINCT l_suppkey) = 1)
SELECT s.s_suppkey AS s_suppkey, COUNT(*)::BIGINT AS numwait,
       s.s_name AS s_name
FROM sso JOIN supplier s ON s.s_suppkey = sso.sk
GROUP BY 1, 3"""


def disjunctive_revenue_sql() -> str:
    """TPC-H Q19 shape (queries.q_disjunctive_revenue): OR of three
    (brand, size, quantity-window) branches, integer cents arithmetic."""
    return """
SELECT COALESCE(SUM(ROUND(l.l_extendedprice * 100)::BIGINT
                    * (100 - ROUND(l.l_discount * 100)::BIGINT))::BIGINT,
                0) / 10000.0 AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size <= 15
       AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size <= 25
       AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size <= 35
       AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 20 AND 30)"""


def ship_delay_priority_sql() -> str:
    """TPC-H Q12 shape (queries.q_ship_delay_priority): lines shipped in
    1997 classed by order->ship latency (late = >90 days), counted by
    order-priority class."""
    return """
SELECT CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) > 90
            THEN 'late' ELSE 'quick' END AS ship_class,
       SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= DATE '1997-01-01' AND l.l_shipdate < DATE '1998-01-01'
GROUP BY 1"""


def excess_suppliers_sql() -> str:
    """TPC-H Q20 shape (queries.q_excess_suppliers): suppliers who shipped
    > 45 units of a 'small%'-named part during 1997, with nation."""
    return """
WITH xsp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
xsq AS (SELECT l_suppkey, l_partkey,
               SUM(CAST(round(l_quantity) AS BIGINT)) AS qty
        FROM lineitem
        WHERE l_shipdate >= DATE '1997-01-01'
          AND l_shipdate < DATE '1998-01-01'
          AND l_partkey IN (SELECT p_partkey FROM xsp)
        GROUP BY 1, 2),
xss AS (SELECT DISTINCT l_suppkey FROM xsq WHERE qty > 45)
SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name, n.n_name AS n_name
FROM xss
JOIN supplier s ON s.s_suppkey = xss.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey"""


def _kmeans_ctes(k: int, rounds: int, scale: int) -> str:
    """The shared Lloyd CTE chain (kme quantized dims, kini seeds, kmc0 and
    ``rounds`` unrolled update rounds, final assignment ka{rounds+1}) —
    used by kmeans_sql and semantic_dedup_sql so the two oracles cannot
    drift."""
    parts = [
        f"""
WITH kme AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS j,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * {scale}) AS BIGINT) AS x
  FROM embeddings),
kini AS (
  SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS k
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})),
kmc0 AS (
  SELECT i.k, m.j, m.x AS c FROM kini i JOIN kme m ON m.vec_id = i.vec_id)"""
    ]
    for r in range(1, rounds + 2):
        parts.append(f""",
kd{r} AS (
  SELECT m.vec_id, c.k, SUM((m.x - c.c) * (m.x - c.c)) AS d2
  FROM kme m JOIN kmc{r - 1} c ON c.j = m.j GROUP BY 1, 2),
ka{r} AS (
  SELECT vec_id, k FROM (
    SELECT vec_id, k,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, k) AS rn
    FROM kd{r}) WHERE rn = 1)""")
        if r <= rounds:
            parts.append(f""",
ks{r} AS (
  SELECT a.k, m.j, SUM(m.x) AS s, COUNT(*) AS n
  FROM ka{r} a JOIN kme m ON m.vec_id = a.vec_id GROUP BY 1, 2),
kmc{r} AS (
  SELECT p.k, p.j,
         COALESCE(CASE WHEN u.s >= 0 THEN (2 * u.s + u.n) // (2 * u.n)
                       ELSE -((-2 * u.s + u.n) // (2 * u.n)) END,
                  p.c) AS c
  FROM kmc{r - 1} p LEFT JOIN ks{r} u ON u.k = p.k AND u.j = p.j)""")
    return "".join(parts)


def kmeans_sql(k: int = 8, rounds: int = 3, scale: int = 10**6) -> str:
    """Mirrors queries.q_kmeans / ops.similarity.kmeans_lloyd bit-for-bit:
    int64 fixed-point vectors, integer squared distances, argmin ties to
    the smallest cluster (ROW_NUMBER ORDER BY d2, k == np.argmin
    first-hit), centroid update s/n rounded half away in PURE integer
    arithmetic ((2s+n)//(2n), sign-cased), empty clusters keep the
    previous centroid (COALESCE over a LEFT JOIN). ``rounds`` update
    rounds unrolled, then the final assignment."""
    return (
        _kmeans_ctes(k, rounds, scale)
        + f"""
SELECT vec_id, k AS cluster FROM ka{rounds + 1}"""
    )


def semantic_dedup_sql(
    k: int = 8,
    rounds: int = 3,
    tau: int = 1_450_000_000_000,
    scale: int = 10**6,
) -> str:
    """Mirrors queries.q_semantic_dedup / ops.similarity.semantic_dedup:
    the shared Lloyd chain assigns clusters, then a within-cluster pair
    join computes int64 squared L2 distances and NOT EXISTS drops every
    vector with a smaller-vec_id neighbor under ``tau`` — all integer, so
    the threshold has no float boundary."""
    return (
        _kmeans_ctes(k, rounds, scale)
        + f""",
sdv AS (SELECT vec_id, k AS cluster FROM ka{rounds + 1}),
sdd AS (
  SELECT a.vec_id AS vi,
         SUM((ma.x - mb.x) * (ma.x - mb.x)) AS d2
  FROM sdv a
  JOIN sdv b ON b.cluster = a.cluster AND b.vec_id < a.vec_id
  JOIN kme ma ON ma.vec_id = a.vec_id
  JOIN kme mb ON mb.vec_id = b.vec_id AND mb.j = ma.j
  GROUP BY a.vec_id, b.vec_id)
SELECT v.vec_id, v.cluster FROM sdv v
WHERE NOT EXISTS (SELECT 1 FROM sdd d
                  WHERE d.vi = v.vec_id AND d.d2 < {tau})"""
    )


def neighbor_jaccard_sql(k: int = 50, scale: int = 10**9) -> str:
    """Mirrors algos.triangles.neighbor_jaccard: int64 fixed-point Jaccard
    ((scale * common) // (deg_u + deg_w - common)) for canonical
    non-adjacent pairs on the undirected simple graph, top-k by
    (score DESC, src, dst) — integer floor division on both sides."""
    return (
        _with(
            GRAPH_CTES,
            """uenj AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst)""",
            "adjnj AS (SELECT a AS v, b AS n FROM uenj UNION ALL SELECT b, a FROM uenj)",
            "degnj AS (SELECT v, count(*)::BIGINT AS dg FROM adjnj GROUP BY v)",
            """wpnj AS (SELECT x.n AS u, y.n AS w
  FROM adjnj x JOIN adjnj y ON x.v = y.v AND x.n < y.n)""",
            "kpnj AS (SELECT u, w, count(*)::BIGINT AS c FROM wpnj GROUP BY u, w)",
            """nenj AS (SELECT u, w, c FROM kpnj
  WHERE NOT EXISTS (SELECT 1 FROM uenj WHERE uenj.a = kpnj.u AND uenj.b = kpnj.w))""",
            f"""scnj AS (SELECT u, w, c,
  (({scale}::BIGINT * c) // (du.dg + dw.dg - c))::BIGINT AS score
  FROM nenj JOIN degnj du ON du.v = nenj.u JOIN degnj dw ON dw.v = nenj.w)""",
        )
        + f"""
SELECT u AS src, w AS dst, c AS common, score FROM scnj
ORDER BY score DESC, src, dst LIMIT {k}"""
    )


def event_trigrams_sql() -> str:
    """ops/windows.event_trigrams: per-user sequences ordered by
    (ts, event_id), runs of three consecutive event types counted."""
    return """
WITH s3 AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS nx1,
         lead(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS nx2
  FROM events)
SELECT event_type AS t1, nx1 AS t2, nx2 AS t3, count(*)::BIGINT AS n
FROM s3 WHERE nx2 IS NOT NULL
GROUP BY 1, 2, 3"""


def train_split_sql(seed: int = 17, bounds: tuple = (80, 90)) -> str:
    """ops/select.train_split: splitmix64(doc_id XOR seed) % 100 assignment
    (< bounds[0] train, < bounds[1] val, else test), per-(source, split)
    doc counts + char sums (bit-mirrored draw)."""
    draw = _sm64(f"xor(CAST(doc_id AS UBIGINT), CAST({seed} AS UBIGINT))")
    return f"""
WITH asg AS (
  SELECT source, n_chars,
         CASE WHEN CAST({draw} % CAST(100 AS UBIGINT) AS BIGINT) < {bounds[0]}
              THEN 'train'
              WHEN CAST({draw} % CAST(100 AS UBIGINT) AS BIGINT) < {bounds[1]}
              THEN 'val' ELSE 'test' END AS split
  FROM documents)
SELECT source, split, count(*)::BIGINT AS n_docs,
       SUM(n_chars)::BIGINT AS sum_chars
FROM asg GROUP BY source, split"""


def degree_gini_sql(scale: int = 10**9) -> str:
    """pipelines.degree_gini: Gini of the undirected distinct-neighbour
    degree distribution over edge-incident vertices — exact rank-sum over
    runs of equal degrees (c*before + c*(c+1)//2), all-integer; the scaled
    ratio goes through HUGEINT (DuckDB errors on native int64 overflow)."""
    return (
        _with(
            GRAPH_CTES,
            """uegi AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst)""",
            "adjgi AS (SELECT a AS v, b AS n FROM uegi UNION ALL SELECT b, a FROM uegi)",
            "deggi AS (SELECT v, count(*)::BIGINT AS k FROM adjgi GROUP BY v)",
            "hgi AS (SELECT k, count(*)::BIGINT AS c FROM deggi GROUP BY k)",
            """cgi AS (SELECT k, c,
  COALESCE(SUM(c) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0)::BIGINT AS bf FROM hgi)""",
            """tgi AS (SELECT SUM(c)::BIGINT AS n, SUM(k * c)::BIGINT AS s,
  SUM(k * (c * bf + c * (c + 1) // 2))::BIGINT AS r FROM cgi)""",
        )
        + f"""
SELECT n AS n_vertices, s AS sum_deg,
       (2 * r - (n + 1) * s)::BIGINT AS gini_num,
       (n * s)::BIGINT AS gini_den,
       CAST(({scale}::HUGEINT * (2 * r - (n + 1) * s)) // (CAST(n AS HUGEINT) * s)
            AS BIGINT) AS gini_scaled
FROM tgi"""
    )


def pca_project_sql(scale: int = 10**6, rounds: int = 12,
                    pscale: int = 10**6) -> str:
    """Mirrors ops.similarity.pca_project: the kmeans quantization contract,
    exact Gram (symmetrized), ``rounds`` unrolled integer power iterations
    (w = G v through HUGEINT — |G v| exceeds int64 — then
    v = (w * pscale) // max|w|, DuckDB's // truncating toward zero exactly
    like the engine's _tdiv_int), final exact integer projection."""
    ctes = [
        f"""pcq AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
         CAST(round(CAST(unnest(embedding) AS DOUBLE) * {scale}) AS BIGINT) AS x
  FROM embeddings)""",
        """pcg AS MATERIALIZED (SELECT a.j AS i, b.j AS j, SUM(a.x * b.x)::BIGINT AS g
  FROM pcq a JOIN pcq b ON b.vec_id = a.vec_id AND b.j >= a.j GROUP BY 1, 2)""",
        """pcs AS MATERIALIZED (SELECT i, j, g FROM pcg
  UNION ALL SELECT j, i, g FROM pcg WHERE i <> j)""",
        "pv0 AS (SELECT DISTINCT i AS d, CAST(1 AS HUGEINT) AS v FROM pcs)",
    ]
    # every per-round CTE is MATERIALIZED: pv{t} references pw{t} twice
    # (via pm{t}), so inlining would re-evaluate the whole chain 2^rounds
    # times
    for t in range(1, rounds + 1):
        ctes.append(
            f"""pw{t} AS MATERIALIZED (
  SELECT g.i AS d, SUM(CAST(g.g AS HUGEINT) * p.v) AS w
  FROM pcs g JOIN pv{t - 1} p ON p.d = g.j GROUP BY 1)"""
        )
        ctes.append(
            f"pm{t} AS MATERIALIZED (SELECT GREATEST(MAX(ABS(w)), 1) AS m FROM pw{t})"
        )
        ctes.append(
            f"pv{t} AS MATERIALIZED (SELECT d, (w * {pscale}) // m AS v FROM pw{t}, pm{t})"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT q.vec_id, SUM(q.x * CAST(p.v AS BIGINT))::BIGINT AS proj
FROM pcq q JOIN pv{rounds} p ON p.d = q.j GROUP BY 1"""
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


def lang_fertility_sql() -> str:
    """ops/textstats.lang_fertility: per-language doc counts, RE2 token
    totals (the TextStats partition), utf8 char totals."""
    return (
        "SELECT lang, count(*)::BIGINT AS n_docs, "
        + "SUM(len(regexp_extract_all(text, '"
        + TOKEN_PATTERN
        + "')))::BIGINT AS sum_tokens, "
        + "SUM(length(text))::BIGINT AS sum_chars FROM documents GROUP BY lang"
    )


def kmeans_inertia_sql(k: int = 8, rounds: int = 3, scale: int = 10**6) -> str:
    """Mirrors ops.similarity.kmeans_inertia: the shared Lloyd chain's
    final assignment joined back to its own distance rows, per-cluster
    counts + exact int64 SSE."""
    r = rounds + 1
    return (
        _kmeans_ctes(k, rounds, scale)
        + f"""
SELECT a.k AS cluster, count(*)::BIGINT AS n, SUM(d.d2)::BIGINT AS sse
FROM ka{r} a JOIN kd{r} d ON d.vec_id = a.vec_id AND d.k = a.k
GROUP BY a.k"""
    )


def cluster_labels_sql(k: int = 8, rounds: int = 3, scale: int = 10**6) -> str:
    """Mirrors ops.similarity.cluster_label_counts: final Lloyd assignment
    joined to the label column, (cluster, label) counts."""
    r = rounds + 1
    return (
        _kmeans_ctes(k, rounds, scale)
        + f"""
SELECT a.k AS cluster, CAST(e.label AS BIGINT) AS label,
       count(*)::BIGINT AS n
FROM ka{r} a JOIN embeddings e ON e.vec_id = a.vec_id
GROUP BY 1, 2"""
    )


# ------------------------------------------------------------- r4 wave 14
def lexical_diversity_sql() -> str:
    """Mirror of ops.textstats.lexical_diversity: per (doc, word)
    occurrence counts over WORD_PATTERN words; all-integer outputs."""
    return f"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{WORD_PATTERN}') AS ws
  FROM documents),
u AS (SELECT doc_id, x AS word FROM w, unnest(ws) AS t(x)),
c AS (SELECT doc_id, word, count(*)::BIGINT AS c FROM u GROUP BY 1, 2)
SELECT w.doc_id,
       COALESCE(SUM(c.c), 0)::BIGINT AS n_words,
       COUNT(c.word)::BIGINT AS n_types,
       COALESCE(SUM(CASE WHEN c.c = 1 THEN 1 ELSE 0 END), 0)::BIGINT AS n_hapax,
       COALESCE(SUM(c.c * c.c), 0)::BIGINT AS rep_mass
FROM w LEFT JOIN c ON c.doc_id = w.doc_id
GROUP BY w.doc_id"""


def window_topk_sql(size_sec: int = 3600, k: int = 3) -> str:
    """Mirror of ops.windows.window_topk: tumbling-window event-type
    top-k, ties on event_type ascending."""
    return f"""
WITH c AS (
  SELECT (CAST(floor(epoch(ts) / {size_sec}) AS BIGINT) * {size_sec})
           AS window_start,
         event_type, count(*)::BIGINT AS n_events
  FROM events GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY window_start
                                   ORDER BY n_events DESC, event_type)
               AS rank FROM c)
SELECT window_start, event_type, n_events, rank::BIGINT AS rank
FROM r WHERE rank <= {k}"""


def quantized_knn_sql(k: int = 5, n_queries: int = 10) -> str:
    """Mirror of ops.similarity.quantized_knn: int8 per-vector max-abs
    quantization, exact integer dot/norms, qcos = dot/sqrt(na)/sqrt(nb)."""
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS mx FROM e),
q8 AS (SELECT vec_id,
              CASE WHEN mx = 0 THEN list_transform(v, x -> 0.0)
                   ELSE list_transform(v, x -> round(x / mx * 127)) END AS q
       FROM s),
qs AS (SELECT vec_id, q,
              list_dot_product(q, q) AS nrm FROM q8),
qq AS (SELECT * FROM qs WHERE vec_id < {n_queries}),
p AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         ROUND(list_dot_product(a.q, b.q)
               / sqrt(CASE WHEN a.nrm = 0 THEN 1 ELSE a.nrm END)
               / sqrt(CASE WHEN b.nrm = 0 THEN 1 ELSE b.nrm END), 6) AS qcos
  FROM qq a JOIN qs b ON b.vec_id <> a.vec_id)
SELECT query_id::BIGINT AS query_id, neighbor_id::BIGINT AS neighbor_id,
       qcos, rank::BIGINT AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY qcos DESC, neighbor_id) AS rank
      FROM p)
WHERE rank <= {k}"""


def knn_graph_sql(k: int = 3) -> str:
    """Mirror of ops.similarity.knn_all: exact kNN for every vector."""
    return f"""
WITH s AS (
  SELECT a.vec_id AS vid, b.vec_id AS nid,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6)
           AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)
SELECT vid::BIGINT AS vec_id, nid::BIGINT AS neighbor_id, cosine,
       rank::BIGINT AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY vid
                                   ORDER BY cosine DESC, nid) AS rank
      FROM s)
WHERE rank <= {k}"""


def knn_outliers_sql(k: int = 3, top_n: int = 20) -> str:
    """Mirror of ops.similarity.knn_outliers: kth-NN cosine ascending."""
    return f"""
WITH s AS (
  SELECT a.vec_id AS vid, b.vec_id AS nid,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6)
           AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY vid
                                   ORDER BY cosine DESC, nid) AS rk FROM s),
kth AS (SELECT vid, cosine FROM r WHERE rk = {k}),
o AS (SELECT vid, cosine,
             row_number() OVER (ORDER BY cosine, vid) AS rank FROM kth)
SELECT vid::BIGINT AS vec_id, cosine AS kth_cosine, rank::BIGINT AS rank
FROM o WHERE rank <= {top_n}"""


def mmr_rerank_sql(query_id: int = 0, n_candidates: int = 20, k: int = 5,
                   lam: float = 0.7) -> str:
    """Mirror of ops.similarity.mmr_rerank: unrolled greedy MMR selection.
    The diversity weight is emitted as repr(1 - lam) so the IEEE value
    matches the engine's ``1 - lam`` exactly (0.7 -> 0.30000000000000004)."""
    lam_r, dlam_r = repr(lam), repr(1 - lam)
    ctes = [f"""cand AS (
  SELECT neighbor_id AS vid, cosine AS rel
  FROM (SELECT e.vec_id AS neighbor_id,
               ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                            CAST(e.embedding AS DOUBLE[])), 6)
                 AS cosine,
               row_number() OVER (
                 ORDER BY ROUND(list_cosine_similarity(
                            CAST(q.embedding AS DOUBLE[]),
                            CAST(e.embedding AS DOUBLE[])), 6) DESC,
                          e.vec_id) AS rk
        FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
        WHERE q.vec_id = {query_id})
  WHERE rk <= {n_candidates})""",
            """pairsim AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6)
           AS cos
  FROM embeddings a JOIN embeddings b
    ON a.vec_id <> b.vec_id
   AND a.vec_id IN (SELECT vid FROM cand)
   AND b.vec_id IN (SELECT vid FROM cand))""",
            f"""sel1 AS (
  SELECT vid, ROUND({lam_r} * rel, 6) AS score, 1 AS r FROM cand
  ORDER BY ROUND({lam_r} * rel, 6) DESC, vid LIMIT 1)""",
            "selected1 AS (SELECT * FROM sel1)"]
    for i in range(2, k + 1):
        ctes.append(f"""sc{i} AS (
  SELECT c.vid,
         ROUND({lam_r} * c.rel - {dlam_r} * (
           SELECT MAX(p.cos) FROM pairsim p
           WHERE p.a = c.vid
             AND p.b IN (SELECT vid FROM selected{i - 1})), 6) AS score
  FROM cand c WHERE c.vid NOT IN (SELECT vid FROM selected{i - 1}))""")
        ctes.append(f"""sel{i} AS (
  SELECT vid, score, {i} AS r FROM sc{i} ORDER BY score DESC, vid LIMIT 1)""")
        ctes.append(f"""selected{i} AS (
  SELECT * FROM selected{i - 1} UNION ALL SELECT * FROM sel{i})""")
    return ("WITH " + ",\n".join(ctes)
            + f"""
SELECT vid::BIGINT AS vec_id, score AS mmr_score, r::BIGINT AS sel_rank
FROM selected{k}""")


def two_hop_sizes_sql() -> str:
    """Mirror of algos.triangles.two_hop_sizes: distinct vertices within
    undirected distance 1..2, self excluded."""
    return (
        _with(
            GRAPH_CTES,
            """n2 AS (
  SELECT u.src AS a, u.dst AS c FROM und u
  UNION
  SELECT u1.src, u2.dst FROM und u1 JOIN und u2 ON u2.src = u1.dst
  WHERE u2.dst <> u1.src)""",
        )
        + """
SELECT a::BIGINT AS vid, count(*)::BIGINT AS two_hop FROM n2 GROUP BY a"""
    )


def bowtie_sql() -> str:
    """Mirror of algos.bowtie: the directed transitive closure gives SCC
    labels (scc_sql's convention), the core = largest SCC (ties -> min
    label), frontier-BFS recursive sets for the four reachability legs,
    CC_CTE for the weak components. Every consumer of the closure and of a
    recursive set is MATERIALIZED — without it DuckDB re-expands the
    closure per reference and OOMs at sf0.1."""
    return (
        _with(
            GRAPH_CTES,
            """reach AS (
  SELECT src AS a, dst AS b FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
sccm AS MATERIALIZED (
  SELECT v.vid, GREATEST(v.vid, COALESCE(MAX(m.u), v.vid)) AS scc
  FROM verts v LEFT JOIN (
    SELECT r1.a AS v, r1.b AS u FROM reach r1
    JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a) m ON m.v = v.vid
  GROUP BY v.vid),
core AS MATERIALIZED (
  SELECT scc FROM (SELECT scc, count(*) AS size FROM sccm GROUP BY scc)
  ORDER BY size DESC, scc LIMIT 1),
corev AS MATERIALIZED (
  SELECT vid FROM sccm WHERE scc = (SELECT scc FROM core)),
fwdc AS (SELECT vid FROM corev UNION
         SELECT e.dst FROM fwdc f JOIN edges e ON e.src = f.vid),
fwdm AS MATERIALIZED (SELECT vid FROM fwdc),
bwdc AS (SELECT vid FROM corev UNION
         SELECT e.src FROM bwdc f JOIN edges e ON e.dst = f.vid),
bwdm AS MATERIALIZED (SELECT vid FROM bwdc),
finc AS (SELECT vid FROM bwdm UNION
         SELECT e.dst FROM finc f JOIN edges e ON e.src = f.vid),
finm AS MATERIALIZED (SELECT vid FROM finc),
boutc AS (SELECT vid FROM fwdm UNION
          SELECT e.src FROM boutc f JOIN edges e ON e.dst = f.vid),
boutm AS MATERIALIZED (SELECT vid FROM boutc)""",
            CC_CTE,
            """compm AS MATERIALIZED (SELECT vid, component FROM comp),
wcccore AS MATERIALIZED (
  SELECT component FROM compm WHERE vid = (SELECT scc FROM core))""",
            recursive=True,
        )
        + """
SELECT v.vid::BIGINT AS vid,
       CASE WHEN s.scc = (SELECT scc FROM core) THEN 'CORE'
            WHEN v.vid IN (SELECT vid FROM bwdm) THEN 'IN'
            WHEN v.vid IN (SELECT vid FROM fwdm) THEN 'OUT'
            WHEN v.vid IN (SELECT vid FROM finm)
                 AND v.vid IN (SELECT vid FROM boutm) THEN 'TUBE'
            WHEN v.vid IN (SELECT vid FROM finm)
                 OR v.vid IN (SELECT vid FROM boutm) THEN 'TENDRIL'
            WHEN c.component = (SELECT component FROM wcccore) THEN 'OTHER'
            ELSE 'DISCONNECTED' END AS region
FROM verts v JOIN sccm s ON s.vid = v.vid JOIN compm c ON c.vid = v.vid"""
    )


def cocitation_sql(k: int = 50, mode: str = "cocitation") -> str:
    """Mirror of algos.triangles.cocitation_pairs."""
    if mode == "cocitation":
        join = "e2.src = e1.src AND e1.dst < e2.dst"
        a, b = "e1.dst", "e2.dst"
    else:
        join = "e2.dst = e1.dst AND e1.src < e2.src"
        a, b = "e1.src", "e2.src"
    return (
        _with(
            GRAPH_CTES,
            f"""co AS (
  SELECT {a} AS a, {b} AS b, count(*)::BIGINT AS common
  FROM edges e1 JOIN edges e2 ON {join}
  GROUP BY 1, 2),
rk AS (SELECT *, row_number() OVER (ORDER BY common DESC, a, b) AS rank
       FROM co)""",
        )
        + f"""
SELECT a::BIGINT AS src, b::BIGINT AS dst, common, rank::BIGINT AS rank
FROM rk WHERE rank <= {k}"""
    )


def bipartite_sql(cap: int = 64) -> str:
    """Mirror of algos.spanning.bipartite_components: a component is
    bipartite iff no undirected edge joins equal BFS-layer parities
    (spanning_forest_sql's multi-source dist)."""
    return (
        _with(
            GRAPH_CTES,
            CC_CTE,
            f"""bfs AS (
  SELECT DISTINCT component AS vid, 0 AS d FROM comp
  UNION
  SELECT e.dst, x.d + 1 FROM bfs x JOIN und e ON e.src = x.vid WHERE x.d < {cap}
),
dist AS (SELECT vid, MIN(d) AS d FROM bfs GROUP BY vid),
viol AS (
  SELECT c.component AS root,
         SUM(CASE WHEN (a.d + b.d) % 2 = 0 THEN 1 ELSE 0 END) AS nviol
  FROM und e
  JOIN dist a ON a.vid = e.src
  JOIN dist b ON b.vid = e.dst
  JOIN comp c ON c.vid = e.src
  WHERE e.src < e.dst
  GROUP BY 1),
roots AS (SELECT DISTINCT component AS root FROM comp)""",
            recursive=True,
        )
        + """
SELECT r.root::BIGINT AS component,
       COALESCE(v.nviol, 0) = 0 AS is_bipartite
FROM roots r LEFT JOIN viol v ON v.root = r.root"""
    )


def kcenter_sql(k: int = 8, start_id: int = 0) -> str:
    """Mirror of ops.similarity.kcenter_select: unrolled greedy
    farthest-point steps; per-pair r6 round BEFORE the max, ties by
    vec_id."""
    ctes = [f"""sel1 AS (
  SELECT CAST({start_id} AS BIGINT) AS vid,
         CAST(-2.0 AS DOUBLE) AS far_cos, 1 AS r)""",
            "selected1 AS (SELECT * FROM sel1)"]
    for i in range(2, k + 1):
        ctes.append(f"""sc{i} AS (
  SELECT e.vec_id AS vid,
         MAX(ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                          CAST(s.embedding AS DOUBLE[])), 6))
           AS mc
  FROM embeddings e JOIN embeddings s
    ON s.vec_id IN (SELECT vid FROM selected{i - 1})
  WHERE e.vec_id NOT IN (SELECT vid FROM selected{i - 1})
  GROUP BY e.vec_id)""")
        ctes.append(f"""sel{i} AS (
  SELECT vid, mc AS far_cos, {i} AS r FROM sc{i}
  ORDER BY mc, vid LIMIT 1)""")
        ctes.append(f"""selected{i} AS (
  SELECT * FROM selected{i - 1} UNION ALL SELECT * FROM sel{i})""")
    return ("WITH " + ",\n".join(ctes)
            + f"""
SELECT vid::BIGINT AS vec_id, far_cos, r::BIGINT AS sel_rank
FROM selected{k}""")


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


def effective_diameter_sql(seeds=(0, 1, 2, 7), cap: int = 160,
                           q_num: int = 9, q_den: int = 10) -> str:
    """Mirror of algos.centrality.effective_diameter_of_seeds: per-seed
    BFS distances (harmonic_sql's CTEs), pooled distance histogram,
    ceiling-division threshold, smallest d with cum >= threshold."""
    ctes = [GRAPH_CTES]
    for j, seed in enumerate(seeds):
        ctes.append(
            f"""b{j} AS (
  SELECT CAST({seed} AS BIGINT) AS vid, 0 AS d
  UNION
  SELECT e.dst, x.d + 1 FROM b{j} x JOIN edges e ON e.src = x.vid WHERE x.d < {cap}
)"""
        )
        ctes.append(
            f"m{j} AS (SELECT vid, MIN(d) AS d FROM b{j} GROUP BY vid)"
        )
    pool = " UNION ALL ".join(
        f"SELECT d FROM m{j}" for j in range(len(seeds))
    )
    ctes.append(f"pool AS ({pool})")
    ctes.append(
        """hist AS (SELECT d, count(*)::BIGINT AS c FROM pool GROUP BY d),
cum AS (SELECT d, SUM(c) OVER (ORDER BY d) AS cc,
               (SELECT SUM(c) FROM hist) AS total FROM hist)"""
    )
    return (
        _with(*ctes, recursive=True)
        + f"""
SELECT d::BIGINT AS eff_diameter, total::BIGINT AS n_pairs,
       cc::BIGINT AS n_within
FROM cum
WHERE cc >= ({q_num} * total + {q_den - 1}) // {q_den}
ORDER BY d LIMIT 1"""
    )


def distinctive_terms_sql(k: int = 10) -> str:
    """Mirror of ops.textstats.distinctive_terms: doc-frequency chi2 in
    int64 fixed point (diff = a*N - n_s*dft; score = diff^2*1000 // denom),
    ties (score DESC, token)."""
    return f"""
WITH w AS (
  SELECT d.doc_id, d.source, x AS word
  FROM (SELECT doc_id, source,
               list_distinct(regexp_extract_all(lower(text), '{WORD_PATTERN}')) AS ws
        FROM documents) d, unnest(d.ws) AS t(x)),
a AS (SELECT source, word, count(*)::BIGINT AS df_in FROM w GROUP BY 1, 2),
tt AS (SELECT word, count(*)::BIGINT AS dft FROM w GROUP BY 1),
ns AS (SELECT source, count(*)::BIGINT AS n_s FROM documents GROUP BY 1),
nt AS (SELECT count(*)::BIGINT AS n FROM documents),
sc AS (
  SELECT a.source, a.word AS token, a.df_in, tt.dft AS df_total,
         CASE WHEN tt.dft * (nt.n - tt.dft) * ns.n_s * (nt.n - ns.n_s) > 0
              THEN ((a.df_in * nt.n - ns.n_s * tt.dft)
                    * (a.df_in * nt.n - ns.n_s * tt.dft) * 1000)
                   // (tt.dft * (nt.n - tt.dft) * ns.n_s * (nt.n - ns.n_s))
              ELSE 0 END AS score
  FROM a JOIN tt ON tt.word = a.word JOIN ns ON ns.source = a.source, nt),
r AS (SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY score DESC, token) AS rank
      FROM sc)
SELECT source, token, df_in, df_total, score::BIGINT AS score,
       rank::BIGINT AS rank
FROM r WHERE rank <= {k}"""


def late_events_sql(allowed_lateness_sec: int = 300) -> str:
    """Mirror of ops.windows.late_events: per-user running max event time
    over arrival (event_id) order, shifted by one row."""
    return f"""
WITH e AS (SELECT event_id, user_id,
                  CAST(floor(epoch(ts)) AS BIGINT) AS ep FROM events),
w AS (SELECT event_id, user_id,
             MAX(ep) OVER (PARTITION BY user_id ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS wm,
             ep
      FROM e)
SELECT event_id, user_id,
       GREATEST(COALESCE(wm - ep, 0), 0)::BIGINT AS skew_sec,
       GREATEST(COALESCE(wm - ep, 0), 0) > {allowed_lateness_sec} AS late
FROM w"""


def blocklist_filter_sql(phrases=("spark", "dup", "merge"),
                         max_hits: int = 2) -> str:
    """Mirror of ops.textstats.blocklist_filter: non-overlapping substring
    counts via the replace-length identity."""
    terms = " + ".join(
        f"(length(text) - length(replace(text, '{p}', ''))) // {len(p)}"
        for p in phrases
    )
    return f"""
SELECT doc_id, ({terms})::BIGINT AS n_hits,
       ({terms}) > {max_hits} AS blocked
FROM documents"""


def quality_ranks_sql(scale: int = 10**6) -> str:
    """Mirror of ops.textstats.quality_ranks: RANK() over the r6 quality,
    pct = ((rank-1)*scale) // N."""
    return f"""
WITH ts AS MATERIALIZED ({text_stats_sql()}),
nn2 AS (SELECT count(*)::BIGINT AS n FROM ts),
r AS (SELECT doc_id, quality,
             rank() OVER (ORDER BY quality) AS rank FROM ts)
SELECT doc_id, quality, rank::BIGINT AS rank,
       ((rank - 1) * {scale}) // (SELECT n FROM nn2) AS pct
FROM r"""


def global_clustering_sql() -> str:
    """Mirror of queries.q_global_clustering: transitivity 3T/W in int64
    fixed point."""
    return (
        _with(
            GRAPH_CTES,
            """fwd AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst),
tri AS (SELECT count(*)::BIGINT AS t
        FROM fwd e1 JOIN fwd e2 ON e2.a = e1.b
        JOIN fwd e3 ON e3.a = e1.a AND e3.b = e2.b),
degu AS (SELECT src AS v, count(*)::BIGINT AS d FROM und
         WHERE src <> dst GROUP BY src),
wdg AS (SELECT SUM(d * (d - 1) // 2)::BIGINT AS w FROM degu)""",
        )
        + """
SELECT tri.t AS triangles, wdg.w AS wedges,
       (CASE WHEN wdg.w > 0 THEN (3 * tri.t * 1000000000) // wdg.w
             ELSE 0 END)::BIGINT AS gcc
FROM tri, wdg"""
    )


def partition_skew_sql(p: int = 8) -> str:
    """Mirror of queries.q_partition_skew: per-partition vertex and
    src-side distinct-edge counts under the 'mod' partitioner."""
    return (
        _with(
            GRAPH_CTES,
            f"""vp AS (SELECT vid % {p} AS part, count(*)::BIGINT AS nv
  FROM verts GROUP BY 1),
ep AS (SELECT src % {p} AS part, count(*)::BIGINT AS ne
  FROM edges GROUP BY 1)""",
        )
        + """
SELECT vp.part::BIGINT AS part, vp.nv AS n_vertices,
       COALESCE(ep.ne, 0)::BIGINT AS n_edges
FROM vp LEFT JOIN ep ON ep.part = vp.part"""
    )


def directed_triangles_sql() -> str:
    """Mirrors algos.triangles.directed_triangles: directed 3-cycles
    i->j->k->i counted once at the minimum vertex (e1.src < e2.src,
    e1.src < e3.src); self-loop guards on all three legs match the
    engine's distinct-simple-edge input."""
    return (
        _with(GRAPH_CTES)
        + """
SELECT count(*)::BIGINT AS cycles
FROM edges e1
JOIN edges e2 ON e2.src = e1.dst AND e2.src <> e2.dst
JOIN edges e3 ON e3.src = e2.dst AND e3.dst = e1.src AND e3.src <> e3.dst
WHERE e1.src < e2.src AND e1.src < e3.src AND e1.src <> e1.dst"""
    )


def local_bridges_sql() -> str:
    """Mirrors queries.q_local_bridges: canonical undirected edges whose
    endpoints have NO common neighbour — support = 0 in the
    edge_support_sql triangle-credit relation."""
    return (
        _with(
            GRAPH_CTES,
            """fwd AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE src <> dst),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM fwd e1 JOIN fwd e2 ON e2.a = e1.b
  JOIN fwd e3 ON e3.a = e1.a AND e3.b = e2.b),
es AS (SELECT a, b FROM (
  SELECT x AS a, y AS b FROM tri
  UNION ALL SELECT x, z FROM tri
  UNION ALL SELECT y, z FROM tri
) GROUP BY a, b)""",
        )
        + """
SELECT fwd.a::BIGINT AS src, fwd.b::BIGINT AS dst
FROM fwd LEFT JOIN es ON es.a = fwd.a AND es.b = fwd.b
WHERE es.a IS NULL"""
    )


def waiting_suppliers_sql() -> str:
    """Mirrors queries.q_waiting_suppliers (TPC-H Q21 adapted: late :=
    l_shipdate > o_orderdate + 90 days; finished orders; exactly one late
    supplier among >= 2 distinct suppliers; region-0 suppliers; top 100 by
    numwait DESC, s_name — unique supplier names make the cut
    deterministic)."""
    return """
WITH f AS (
  SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F'),
l AS (
  SELECT li.l_orderkey AS okey, li.l_suppkey AS skey,
         (li.l_shipdate > f.o_orderdate + INTERVAL 90 DAY) AS late
  FROM lineitem li JOIN f ON li.l_orderkey = f.o_orderkey),
ps AS (SELECT okey, skey, bool_or(late) AS late FROM l GROUP BY okey, skey),
po AS (SELECT okey, count(*) AS ns,
              count(*) FILTER (WHERE late) AS nl
       FROM ps GROUP BY okey),
q AS (SELECT ps.skey FROM ps JOIN po ON po.okey = ps.okey
      WHERE ps.late AND po.ns >= 2 AND po.nl = 1),
agg AS (SELECT skey, count(*)::BIGINT AS numwait FROM q GROUP BY skey)
SELECT s.s_name, n.n_name, agg.numwait
FROM agg
JOIN supplier s ON s.s_suppkey = agg.skey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_regionkey = 0
ORDER BY agg.numwait DESC, s.s_name
LIMIT 100"""


def assortativity_directed_sql() -> str:
    """Mirrors algos.triangles.directed_assortativity: exact integer sums;
    the final expression repeats the engine's IEEE order (BIGINT->DOUBLE
    casts, one multiply, one sqrt, one divide, ROUND 6 — DuckDB ROUND is
    half-away, matching round_half_away)."""
    return (
        _with(
            GRAPH_CTES,
            """fwd AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
od AS (SELECT src AS v, count(*) AS d FROM fwd GROUP BY src),
idg AS (SELECT dst AS v, count(*) AS d FROM fwd GROUP BY dst),
s AS (SELECT count(*) AS n, SUM(o.d) AS sx, SUM(i.d) AS sy,
             SUM(o.d * i.d) AS sxy, SUM(o.d * o.d) AS sxx,
             SUM(i.d * i.d) AS syy
      FROM fwd JOIN od o ON o.v = fwd.src JOIN idg i ON i.v = fwd.dst)""",
        )
        + """
SELECT CASE WHEN (n*sxx - sx*sx) = 0 OR (n*syy - sy*sy) = 0 THEN 0.0
            ELSE ROUND((n*sxy - sx*sy)::DOUBLE
                       / sqrt((n*sxx - sx*sx)::DOUBLE
                              * (n*syy - sy*sy)::DOUBLE), 6)
       END AS assortativity,
       n::BIGINT AS n_edges
FROM s"""
    )


def host_pr_mass_sql(iters: int = 30) -> str:
    """Mirrors queries.q_host_pr_mass: pico-unit (1e12) int64 scaling before the
    per-host SUM makes the float aggregation order-independent; share is
    one BIGINT->DOUBLE division, ROUND 6 (half-away both sides)."""
    return (
        _with(
            *_pagerank_ctes(iters),
            f"""fp AS (SELECT vid % 97 AS host,
            CAST(ROUND(rank * 1000000000000.0) AS BIGINT) AS f FROM pr{iters}),
m AS (SELECT host, SUM(f)::BIGINT AS mass_fp FROM fp GROUP BY host),
t AS (SELECT SUM(mass_fp)::BIGINT AS tot FROM m)""",
        )
        + """
SELECT m.host::BIGINT AS host, m.mass_fp,
       ROUND(m.mass_fp::DOUBLE / t.tot::DOUBLE, 6) AS share
FROM m, t"""
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


def degree_inout_corr_sql() -> str:
    """Mirrors queries.q_degree_inout_corr: degrees_sql's per-vertex
    (out, in) relation, exact integer sums, the directed_assortativity
    IEEE-pinned final expression."""
    return (
        _with(
            GRAPH_CTES,
            """dg AS (
  SELECT v.vid, COALESCE(o.c, 0) AS x, COALESCE(i.c, 0) AS y
  FROM verts v
  LEFT JOIN (SELECT src, count(*) AS c FROM edges GROUP BY src) o ON o.src = v.vid
  LEFT JOIN (SELECT dst, count(*) AS c FROM edges GROUP BY dst) i ON i.dst = v.vid),
s AS (SELECT count(*) AS n, SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
             SUM(x*x) AS sxx, SUM(y*y) AS syy FROM dg)""",
        )
        + """
SELECT CASE WHEN (n*sxx - sx*sx) = 0 OR (n*syy - sy*sy) = 0 THEN 0.0
            ELSE ROUND((n*sxy - sx*sy)::DOUBLE
                       / sqrt((n*sxx - sx*sx)::DOUBLE
                              * (n*syy - sy*sy)::DOUBLE), 6)
       END AS corr,
       n::BIGINT AS n_vertices
FROM s"""
    )


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
