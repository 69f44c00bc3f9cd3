"""Shared CTE snippets, 64-bit-arithmetic mirrors and helpers for the
raylink.oracles_sql domain modules.

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


_STOP = lambda ws: ", ".join(f"'{w}'" for w in ws)  # noqa: E731


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


_M64 = "18446744073709551616"  # 2^64


_M32 = "4294967296"  # 2^32
