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


def page_edges_sql() -> str:
    return _with(GRAPH_CTES) + "\nSELECT src::BIGINT AS src, dst::BIGINT AS dst FROM edges"


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


def walk_corpus_sql(walk_len: int = 6, w_return: int = 1, w_common: int = 4,
                    w_far: int = 2, seed: int = 0) -> str:
    """algos/walks.walks_to_corpus over the node2vec walks: per-walker
    step-ordered vid sequence as a space-joined line."""
    inner = node2vec_sql(walk_len, w_return, w_common, w_far, seed)
    return f"""
WITH wk AS ({inner})
SELECT walker, string_agg(vid::VARCHAR, ' ' ORDER BY step) AS seq
FROM wk GROUP BY walker"""


def wcc_sizes_sql() -> str:
    """Size distribution of the weakly connected components (scc_sizes'
    undirected sibling, off the shared CC_CTE min-label closure)."""
    return _with(GRAPH_CTES, CC_CTE, recursive=True) + """
SELECT size, count(*)::BIGINT AS n_components FROM (
  SELECT component, count(*)::BIGINT AS size FROM comp GROUP BY component)
GROUP BY size"""


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
