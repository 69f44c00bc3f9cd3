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


def cc_sql() -> str:
    return (
        _with(GRAPH_CTES, CC_CTE, recursive=True)
        + "\nSELECT vid::BIGINT AS vid, component FROM comp"
    )


def lpa_sql() -> str:
    return (
        _with(GRAPH_CTES, CC_CTE, recursive=True)
        + "\nSELECT vid::BIGINT AS vid, component AS label FROM comp"
    )


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


def mixture_sample_sql(seed: int = 11) -> str:
    """Mirrors queries.q_mixture_sample: keep rate ((N % 10) + 1) * 100
    permille for source 'srcN', splitmix64(doc_id XOR seed) % 1000 draw
    (bit-mirrored)."""
    draw = _sm64(f"xor(CAST(doc_id AS UBIGINT), CAST({seed} AS UBIGINT))")
    return f"""
SELECT doc_id, source FROM documents
WHERE CAST({draw} % CAST(1000 AS UBIGINT) AS BIGINT)
      < (CAST(substr(source, 4) AS BIGINT) % 10 + 1) * 100"""


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


def audio_features_sql(window: int = 256, midpoint: int = 64) -> str:
    """Mirrors queries.q_audio_features: the WAV samples ARE the ASCII text
    bytes, so per-window integer energy and threshold crossings recompute
    from ord(substr(..)) with LAG for the consecutive-sample comparison."""
    return f"""
WITH ch AS (
  SELECT doc_id, i, ord(substr(text, i, 1)) AS v
  FROM documents, unnest(generate_series(1, strlen(text))) AS t(i)
),
w AS (
  SELECT doc_id, (i - 1) // {window} AS win, i, v - 128 AS c,
         CASE WHEN v >= {midpoint} THEN 1 ELSE 0 END AS sgn
  FROM ch
),
l AS (
  SELECT doc_id, win, c, sgn,
         LAG(sgn) OVER (PARTITION BY doc_id ORDER BY i) AS psgn,
         LAG(win) OVER (PARTITION BY doc_id ORDER BY i) AS pwin
  FROM w
)
SELECT doc_id AS media_id, win::BIGINT AS win, count(*)::BIGINT AS n_samples,
       SUM(c * c)::BIGINT AS sum_sq,
       COALESCE(SUM(CASE WHEN pwin = win AND sgn <> psgn THEN 1 END), 0)::BIGINT
         AS zero_crossings
FROM l GROUP BY doc_id, win"""


def media_y4m_frames_sql(frame_bytes: int = 64, every: int = 2) -> str:
    """Mirrors queries.q_media_y4m_frames: the Y4M stream carries the text
    bytes as 16x4 luma frames, so frame f's payload is the ASCII substring
    [f*64, f*64+64) — md5'd on both sides."""
    return f"""
SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_idx,
       md5(substr(text, CAST(f * {frame_bytes} + 1 AS BIGINT), {frame_bytes}))
         AS frame_md5
FROM (SELECT doc_id, text, strlen(text) // {frame_bytes} AS nf FROM documents),
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


def media_dedup_sql() -> str:
    """Mirrors queries.q_media_dedup: the RLNK blob embeds the full text
    bytes, so blob equality <=> text equality — keep min doc_id per
    distinct text with the copy count."""
    return """
SELECT MIN(doc_id)::BIGINT AS keep_id, count(*)::BIGINT AS n_copies
FROM documents GROUP BY COALESCE(text, '')"""


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
