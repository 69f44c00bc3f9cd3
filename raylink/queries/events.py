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
