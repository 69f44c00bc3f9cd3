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


def events_window_sql(size_sec: int = 3600) -> str:
    return f"""
SELECT user_id::BIGINT AS user_id,
       (CAST(floor(epoch(ts) / {size_sec}) AS BIGINT) * {size_sec}) AS window_start,
       count(*)::BIGINT AS n_events,
       ROUND(SUM(value), 6) AS sum_value
FROM events GROUP BY 1, 2"""


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


def events_latest_sql() -> str:
    """Mirrors ops.select.latest_by_key(user_id, ts, event_id): the single
    newest event per user, ties by event_id ASC."""
    return """
SELECT event_id, ts, user_id, event_type, value, props FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rn
  FROM events) WHERE rn = 1"""


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


def running_total_sql() -> str:
    """Mirrors ops.windows.running_total: per-user windowed SUM in
    (ts, event_id) order; ROUND(.., 6) absorbs prefix-sum association
    differences between the sequential cumsum and the window aggregate."""
    return """
SELECT event_id, user_id, ts,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 6) AS cum_value
FROM events"""


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
