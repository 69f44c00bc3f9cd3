"""Windowed aggregates over the ``events`` stream-shaped table.

Ray Data has no event-time/watermark engine (and neither does the strictly
batch-BSP reference, SURVEY.md §2.9); stream-shaped workloads are treated as
an ordered, partitioned log: tumbling windows = key-computed groupby with
per-batch partial aggregation; session windows = per-key ``map_groups`` over
ts-sorted groups. Ordering assumption: windows are computed from absolute
event time, so input order is irrelevant; session assignment sorts within the
per-user group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raylink.util import round_half_away


def tumbling_window(events_ds, size_sec: int = 3600):
    """-> Dataset (user_id, window_start:int64 epoch sec, n_events,
    sum_value r6). Pre-aggregates per batch before the groupby shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        epoch = ts.astype("datetime64[s]").astype(np.int64)
        ws = (epoch // size_sec) * size_sec
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"user_id": uid, "window_start": ws, "value": val})
        agg = df.groupby(["user_id", "window_start"], sort=True).agg(
            n=("value", "size"), s=("value", "sum")
        )
        agg = agg.reset_index()
        return pa.table(
            {
                "user_id": pa.array(agg["user_id"].to_numpy(np.int64)),
                "window_start": pa.array(agg["window_start"].to_numpy(np.int64)),
                "n": pa.array(agg["n"].to_numpy(np.int64)),
                "s": pa.array(agg["s"].to_numpy(np.float64)),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "window_start": batch.column("window_start"),
                "n_events": batch.column("sum(n)"),
                "sum_value": pa.array(
                    round_half_away(
                        batch.column("sum(s)").to_numpy(zero_copy_only=False), 6
                    )
                ),
            }
        )

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "window_start"])
        .sum(["n", "s"])
        .map_batches(finish, batch_format="pyarrow")
    )


def sessionize(events_ds, gap_sec: int = 1800, num_buckets: int = 64):
    """Session windows per user (new session when gap > gap_sec) ->
    (user_id, session_start:int64 epoch sec, n_events, sum_value r6,
    duration_sec).

    Users are coarse-bucketed (hash(user_id) % num_buckets) so one shuffle
    group serves MANY users — a per-user groupby would spawn millions of
    tiny groups on a crawl-scale event log. Inside each bucket group the
    rows are lexsorted by (user, epoch) once and sessions are segmented
    fully vectorized (cumsum of break flags + reduceat-style bincounts)."""
    from raylink.util import splitmix64

    B = np.uint64(num_buckets)

    def bucketize(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        epoch = ts.astype("datetime64[s]").astype(np.int64)
        return pa.table(
            {
                "b": pa.array((splitmix64(uid.astype(np.uint64)) % B).astype(np.int32)),
                "user_id": pa.array(uid),
                "epoch": pa.array(epoch),
                "value": batch.column("value"),
            }
        )

    def sessions(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy(zero_copy_only=False)
        epoch = group.column("epoch").to_numpy(zero_copy_only=False)
        val = group.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((epoch, uid))
        u, e, v = uid[order], epoch[order], val[order]
        brk = np.ones(len(u), dtype=bool)
        if len(u) > 1:
            brk[1:] = (u[1:] != u[:-1]) | ((e[1:] - e[:-1]) > gap_sec)
        sid = np.cumsum(brk) - 1
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(u)]
        n_events = ends - starts
        sums = np.bincount(sid, weights=v)
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "session_start": pa.array(e[starts]),
                "n_events": pa.array(n_events.astype(np.int64)),
                "sum_value": pa.array(round_half_away(sums, 6)),
                "duration_sec": pa.array(e[ends - 1] - e[starts]),
            }
        )

    return (
        events_ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("b")
        .map_groups(sessions, batch_format="pyarrow")
    )


def sliding_window(events_ds, size_sec: int = 3600, slide_sec: int = 900):
    """Sliding (hopping) window aggregate: every event lands in each window
    [ws, ws + size_sec) with ws a multiple of ``slide_sec`` containing its
    timestamp -> Dataset (user_id, window_start:int64 epoch sec, n_events,
    sum_value r6) — the overlap sibling of ``tumbling_window`` (trend /
    rate monitoring). Expansion factor is ~size/slide per event; the
    per-event window list is generated vectorized (the chunk_docs repeat
    trick) and pre-aggregated per batch before one groupby shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        epoch = ts.astype("datetime64[s]").astype(np.int64)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        k_hi = epoch // slide_sec
        k_lo = (epoch - size_sec) // slide_sec + 1
        reps = (k_hi - k_lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(epoch), dtype=np.int64), reps)
        offs = np.cumsum(reps) - reps
        k = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(offs, reps) \
            + np.repeat(k_lo, reps)
        df = pd.DataFrame(
            {"user_id": uid[idx], "window_start": k * slide_sec,
             "value": val[idx]}
        )
        agg = df.groupby(["user_id", "window_start"], sort=True).agg(
            n=("value", "size"), s=("value", "sum")
        ).reset_index()
        return pa.table(
            {
                "user_id": pa.array(agg["user_id"].to_numpy(np.int64)),
                "window_start": pa.array(
                    agg["window_start"].to_numpy(np.int64)
                ),
                "n": pa.array(agg["n"].to_numpy(np.int64)),
                "s": pa.array(agg["s"].to_numpy(np.float64)),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "window_start": batch.column("window_start"),
                "n_events": batch.column("sum(n)"),
                "sum_value": pa.array(
                    round_half_away(
                        batch.column("sum(s)").to_numpy(zero_copy_only=False), 6
                    )
                ),
            }
        )

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "window_start"])
        .sum(["n", "s"])
        .map_batches(finish, batch_format="pyarrow")
    )


WEEK_US = 604_800_000_000  # epoch-week bucket (7 * 86400 * 1e6 us)


def cohort_retention(events_ds, user_col: str = "user_id", ts_col: str = "ts",
                     bucket_us: int = WEEK_US, num_buckets: int = 64):
    """Cohort retention matrix: cohort(user) = the user's FIRST active
    epoch-week (``floor(epoch_us / bucket_us)``); each cell counts the
    cohort's distinct users active ``week_offset`` weeks later.
    -> Dataset (cohort, "offset", n_users) — grain set by ``bucket_us``
    (weeks by default; pass 86_400_000_000 for days).

    Shape: per-batch distinct (user, week) pairs (lexsort dedup — raw
    events never shuffle) -> ONE hash(user) coarse-bucket groupby (all of
    a user's weeks colocate, so the per-user min week is global) with
    per-group (cohort, offset) count pre-aggregation -> bounded combine
    tree (cells are #weeks^2 at most)."""
    from raylink.join import tree_groupby_sum
    from raylink.util import splitmix64

    B = np.uint64(num_buckets)
    W = np.int64(bucket_us)

    def pairs(batch: pa.Table) -> pa.Table:
        u = batch.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        w = ts.cast(pa.int64()).to_numpy(zero_copy_only=False) // W
        order = np.lexsort((w, u))
        us, ws = u[order], w[order]
        keep = np.r_[True, (us[1:] != us[:-1]) | (ws[1:] != ws[:-1])]
        us, ws = us[keep], ws[keep]
        return pa.table(
            {
                "b": pa.array(
                    (splitmix64(us.astype(np.uint64)) % B).astype(np.int32)
                ),
                "user": pa.array(us),
                "w": pa.array(ws),
            }
        )

    def per_user(group: pa.Table) -> pa.Table:
        u = group.column("user").to_numpy(zero_copy_only=False)
        w = group.column("w").to_numpy(zero_copy_only=False)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        keep = np.r_[True, (u[1:] != u[:-1]) | (w[1:] != w[:-1])]
        u, w = u[keep], w[keep]  # cross-batch dups
        first = np.r_[True, u[1:] != u[:-1]]
        grp = np.cumsum(first) - 1
        cohort = w[first][grp]  # rows sorted by (u, w): first week == min
        off = w - cohort
        key = np.lexsort((off, cohort))
        ck, ok_ = cohort[key], off[key]
        runs = np.r_[True, (ck[1:] != ck[:-1]) | (ok_[1:] != ok_[:-1])]
        starts = np.flatnonzero(runs)
        counts = np.diff(np.r_[starts, len(ck)])
        return pa.table(
            {
                "cohort": pa.array(ck[starts]),
                "offset": pa.array(ok_[starts]),
                "n_users": pa.array(counts.astype(np.int64)),
            }
        )

    partials = (
        events_ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("b")
        .map_groups(per_user, batch_format="pyarrow")
    )
    agg = tree_groupby_sum(partials, ["cohort", "offset"], ["n_users"])
    return agg.map_batches(
        lambda b: pa.table(
            {
                "cohort": b.column("cohort"),
                "offset": b.column("offset"),
                "n_users": b.column("sum(n_users)"),
            }
        ),
        batch_format="pyarrow",
    )


def event_transitions(events_ds, user_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      id_col: str = "event_id", num_buckets: int = 64):
    """Clickstream transition counts: for each user's event sequence
    (ordered by ts, ties by event id), count adjacent (from_type, to_type)
    transitions across the corpus -> Dataset (from_type, to_type, n).

    Shape: ONE hash(user) coarse-bucket groupby (a user's events colocate,
    so adjacency is global), per-group vectorized sequence walk
    (lexsort + boundary masks) with in-group (from, to) pre-counts on
    dictionary codes, then the bounded combine tree (cells <= n_types^2).
    Raw event rows shuffle once; nothing is driver-side."""
    from raylink.join import tree_groupby_sum
    from raylink.util import splitmix64

    B = np.uint64(num_buckets)

    def tag(batch: pa.Table) -> pa.Table:
        u = batch.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "b": pa.array(
                    (splitmix64(u.astype(np.uint64)) % B).astype(np.int32)
                ),
                "u": pa.array(u),
                "t": batch.column(ts_col),
                "i": batch.column(id_col),
                "y": batch.column(type_col),
            }
        )

    _empty = pa.table(
        {
            "from_type": pa.array([], type=pa.string()),
            "to_type": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        }
    )

    def per_user(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        ts = group.column("t")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        t = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        i = group.column("i").to_numpy(zero_copy_only=False)
        y = group.column("y")
        if isinstance(y, pa.ChunkedArray):
            y = y.combine_chunks()
        enc = y.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((i, t, u))
        u, code = u[order], code[order]
        same = u[1:] == u[:-1]
        if not same.any():
            return _empty
        a, b = code[:-1][same], code[1:][same]
        nd = len(enc.dictionary)
        key = a * nd + b
        uk, cnt = np.unique(key, return_counts=True)
        dic = enc.dictionary
        return pa.table(
            {
                "from_type": dic.take(pa.array(uk // nd)),
                "to_type": dic.take(pa.array(uk % nd)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    partials = (
        events_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("b")
        .map_groups(per_user, batch_format="pyarrow")
    )
    agg = tree_groupby_sum(partials, ["from_type", "to_type"], ["n"])
    return agg.map_batches(
        lambda b: pa.table(
            {
                "from_type": b.column("from_type"),
                "to_type": b.column("to_type"),
                "n": b.column("sum(n)"),
            }
        ),
        batch_format="pyarrow",
    )


def rolling_active_users(events_ds, window_days: int = 7,
                         num_buckets: int = 64):
    """Daily active users + trailing ``window_days``-day rolling DISTINCT
    active users — the DAU/WAU product-analytics pair. -> Dataset
    (day, dau, wau) with one row per epoch-day (UTC) that has >= 1 event;
    dau = distinct users that day, wau = distinct users in
    [day - window_days + 1, day]. All integer, no float boundary.

    The rolling distinct does NOT sum daily counts (users active on several
    days would double-count): each globally-distinct (day, user) pair is
    expanded to the ``window_days`` target days it makes active, and the
    expansion is distinct-counted again. Dataflow: per-batch distinct
    packed (day << 32 | user) keys -> ``bucketed_distinct`` ->
    (a) per-day sum -> DAU; (b) vectorized x``window_days`` expansion ->
    ``bucketed_distinct`` -> per-day sum -> WAU; one ``hash_join`` of the
    two day tables (day cardinality = date range, tiny next to events).
    Shuffles carry at most distinct-pair rows, never raw events."""
    from raylink.join import bucketed_distinct, bucketed_sum, hash_join
    from raylink.util import assert_packable

    W = int(window_days)

    def pairs(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        day = ts.astype("datetime64[D]").astype(np.int64)
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        assert_packable(uid, "rolling_active_users user_id")
        assert_packable(day, "rolling_active_users day")
        key = np.unique((day << np.int64(32)) | uid)
        return pa.table({"du": pa.array(key)})

    dup = bucketed_distinct(
        events_ds.map_batches(pairs, batch_format="pyarrow"),
        "du", num_buckets=num_buckets,
    ).materialize()  # consumed by both the DAU and the WAU branch

    def day_ones(batch: pa.Table) -> pa.Table:
        k = batch.column("du").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "day": pa.array(k >> np.int64(32)),
                "c": pa.array(np.ones(len(k), dtype=np.int64)),
            }
        )

    dau = bucketed_sum(
        dup.map_batches(day_ones, batch_format="pyarrow"),
        "day", "c", out_val="dau", num_buckets=num_buckets,
    )

    def expand(batch: pa.Table) -> pa.Table:
        k = batch.column("du").to_numpy(zero_copy_only=False)
        day = k >> np.int64(32)
        uid = k & np.int64(0xFFFFFFFF)
        td = (day[:, None] + np.arange(W, dtype=np.int64)).ravel()
        tu = np.unique((td << np.int64(32)) | np.repeat(uid, W))
        return pa.table({"tu": pa.array(tu)})

    wau_pairs = bucketed_distinct(
        dup.map_batches(expand, batch_format="pyarrow"),
        "tu", num_buckets=num_buckets,
    )

    def tday_ones(batch: pa.Table) -> pa.Table:
        k = batch.column("tu").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "day": pa.array(k >> np.int64(32)),
                "c": pa.array(np.ones(len(k), dtype=np.int64)),
            }
        )

    wau = bucketed_sum(
        wau_pairs.map_batches(tday_ones, batch_format="pyarrow"),
        "day", "c", out_val="wau", num_buckets=num_buckets,
    )
    # every data day appears in the expansion (offset 0), so strict holds;
    # expansion-only tail days (after the last event) are dropped by the
    # left-driven join — the output is exactly the days with events
    return hash_join(
        dau, wau, on="day",
        left_cols={"dau": pa.int64()}, right_cols={"wau": pa.int64()},
    )


def running_total(events_ds, num_buckets: int = 64):
    """Per-user running cumulative ``value`` in event-time order
    (ts, event_id) -> Dataset (event_id, user_id, ts, cum_value) — the
    ledger/balance window primitive. One hash(user) coarse-bucket shuffle
    (all of a user's events co-locate); the per-user prefix sum is a
    sequential left-associated float64 cumsum whose association noise vs
    the SQL windowed SUM is absorbed by round-half-away(6) on both sides."""
    from raylink.util import round_half_away, splitmix64

    B = np.uint64(num_buckets)

    def bucket(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "ub",
            pa.array((splitmix64(u.astype(np.uint64)) % B).astype(np.int32)),
        )

    def cum(group: pa.Table) -> pa.Table:
        u = group.column("user_id").to_numpy(zero_copy_only=False)
        ts = group.column("ts").to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        val = group.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts, eid, val = u[order], ts[order], eid[order], val[order]
        bounds = np.r_[
            np.flatnonzero(np.r_[True, u[1:] != u[:-1]]), len(u)
        ]
        cum_v = np.empty(len(u), np.float64)
        for s0, s1 in zip(bounds[:-1], bounds[1:]):  # per user: sequential
            cum_v[s0:s1] = np.cumsum(val[s0:s1])     # left-assoc prefix sum
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(u),
                "ts": pa.array(ts),
                "cum_value": pa.array(round_half_away(cum_v, 6)),
            }
        )

    return (
        events_ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(cum, batch_format="pyarrow")
    )


def event_gap_quantiles(events_ds, qs=(0.5, 0.9, 0.99), num_buckets: int = 64):
    """Per-event-type exact quantiles of the gap since the SAME USER's
    previous event (microseconds) — the inter-arrival latency profile
    behind session-gap / alerting thresholds. One hash(user) bucket
    shuffle orders each user's stream by (ts, event_id) and emits one
    (event_type, gap_us) row per non-first event (type = the LATER
    event's); quantiles via ``group_quantiles`` (the distributed exact
    histogram, quantile_disc rule). -> Dataset (event_type, q, gap_us)."""
    from raylink.ops.select import group_quantiles
    from raylink.util import splitmix64

    B = np.uint64(num_buckets)

    def bucket(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "ub",
            pa.array((splitmix64(u.astype(np.uint64)) % B).astype(np.int32)),
        )

    def gaps(group: pa.Table) -> pa.Table:
        u = group.column("user_id").to_numpy(zero_copy_only=False)
        ts = group.column("ts").to_numpy(zero_copy_only=False).astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        et = group.column("event_type").combine_chunks()
        order = np.lexsort((eid, ts, u))
        u, ts = u[order], ts[order]
        same = np.r_[False, u[1:] == u[:-1]]
        gap = np.empty(len(u), np.int64)
        gap[1:] = ts[1:] - ts[:-1]
        return pa.table(
            {
                "event_type": et.take(pa.array(order[same])),
                "gap_us": pa.array(gap[same]),
            }
        )

    rows = (
        events_ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(gaps, batch_format="pyarrow")
    )
    return group_quantiles(rows, "event_type", "gap_us", list(qs))


def event_trigrams(events_ds, user_col: str = "user_id",
                   ts_col: str = "ts", type_col: str = "event_type",
                   id_col: str = "event_id", num_buckets: int = 64):
    """Clickstream path motifs: for each user's event sequence (ordered by
    ts, ties by event id), count every run of THREE consecutive event types
    across the corpus -> Dataset (t1, t2, t3, n) — the 3-gram sibling of
    ``event_transitions`` (funnel discovery / Markov-order-2 check).

    Shape: identical to ``event_transitions`` — ONE hash(user) coarse-bucket
    groupby (a user's events colocate, so adjacency is global), per-group
    vectorized triple extraction on dictionary codes with in-group
    pre-counts (cells <= n_types^3), then the bounded combine tree. Raw
    event rows shuffle once; nothing is driver-side."""
    from raylink.join import tree_groupby_sum
    from raylink.util import splitmix64

    B = np.uint64(num_buckets)

    def tag(batch: pa.Table) -> pa.Table:
        u = batch.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "b": pa.array(
                    (splitmix64(u.astype(np.uint64)) % B).astype(np.int32)
                ),
                "u": pa.array(u),
                "t": batch.column(ts_col),
                "i": batch.column(id_col),
                "y": batch.column(type_col),
            }
        )

    _empty = pa.table(
        {
            "t1": pa.array([], type=pa.string()),
            "t2": pa.array([], type=pa.string()),
            "t3": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        }
    )

    def per_user(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        if len(u) < 3:
            return _empty
        ts = group.column("t")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        t = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        i = group.column("i").to_numpy(zero_copy_only=False)
        y = group.column("y")
        if isinstance(y, pa.ChunkedArray):
            y = y.combine_chunks()
        enc = y.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((i, t, u))
        u, code = u[order], code[order]
        # u is sorted, so u[2:] == u[:-2] implies the middle row matches too
        same = u[2:] == u[:-2]
        if not same.any():
            return _empty
        a = code[:-2][same]
        b = code[1:-1][same]
        c = code[2:][same]
        nd = np.int64(len(enc.dictionary))
        key = (a * nd + b) * nd + c
        uk, cnt = np.unique(key, return_counts=True)
        dic = enc.dictionary
        return pa.table(
            {
                "t1": dic.take(pa.array(uk // (nd * nd))),
                "t2": dic.take(pa.array((uk // nd) % nd)),
                "t3": dic.take(pa.array(uk % nd)),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    partials = (
        events_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("b")
        .map_groups(per_user, batch_format="pyarrow")
    )
    agg = tree_groupby_sum(partials, ["t1", "t2", "t3"], ["n"])
    return agg.map_batches(
        lambda b: pa.table(
            {
                "t1": b.column("t1"),
                "t2": b.column("t2"),
                "t3": b.column("t3"),
                "n": b.column("sum(n)"),
            }
        ),
        batch_format="pyarrow",
    )


def window_topk(events_ds, size_sec: int = 3600, k: int = 3):
    """Windowed heavy hitters: per tumbling window, the top-``k`` event
    types by count -> (window_start:int64 epoch sec, event_type, n_events,
    rank 1..k). Ties break on event_type ascending (deterministic).

    Shape: per-batch (window, type) partial counts (dictionary-encode +
    bincount over combined codes — no per-row Python), one groupby-sum
    shuffle whose key cardinality is windows x types (tiny vs the event
    stream), then an in-group top-k. The same pre-aggregate-then-shuffle
    profile as ``tumbling_window``; event volume never reaches the
    shuffle."""
    from raylink.join import tree_groupby_sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        ws = (ts.astype("datetime64[s]").astype(np.int64) // size_sec) * size_sec
        enc = pc.dictionary_encode(
            batch.column("event_type").combine_chunks()
        )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # pack (window ordinal, type code) into one bincount key
        uw, winv = np.unique(ws, return_inverse=True)
        nt = len(enc.dictionary)
        cnt = np.bincount(winv * nt + codes, minlength=len(uw) * nt)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "window_start": pa.array(uw[nz // nt]),
                "event_type": enc.dictionary.take(pa.array(nz % nt)),
                "n": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    counts = tree_groupby_sum(
        events_ds.map_batches(partial, batch_format="pyarrow"),
        ["window_start", "event_type"], ["n"],
    )

    def topk(group: pa.Table) -> pa.Table:
        n = group.column("sum(n)").to_numpy(zero_copy_only=False)
        et = group.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((et, -n))[:k]
        return pa.table(
            {
                "window_start": group.column("window_start").take(
                    pa.array(order)
                ),
                "event_type": pa.array(et[order]),
                "n_events": pa.array(n[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return counts.groupby("window_start").map_groups(
        topk, batch_format="pyarrow"
    )


def late_events(events_ds, allowed_lateness_sec: int = 300,
                num_buckets: int = 64):
    """Watermark-style late-data detection: in per-user ARRIVAL order
    (event_id — the repo's running_total convention), an event is LATE
    when its event time trails the user's watermark (the max event time
    of earlier-arriving events) by more than ``allowed_lateness_sec`` —
    the out-of-order-stream audit a windowed pipeline needs before
    trusting its window closes. -> Dataset (event_id, user_id, skew_sec,
    late) with skew_sec = max(watermark - ts, 0) in whole seconds, int64.

    One hash(user) coarse-bucket shuffle; the per-user running max is a
    vectorized np.maximum.accumulate per user segment — all-integer, so
    the SQL window-function mirror is bit-exact."""
    from raylink.util import splitmix64

    B = np.uint64(num_buckets)

    def bucket(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "ub",
            pa.array((splitmix64(u.astype(np.uint64)) % B).astype(np.int32)),
        )

    def flag(group: pa.Table) -> pa.Table:
        u = group.column("user_id").to_numpy(zero_copy_only=False)
        ts = group.column("ts").to_numpy(zero_copy_only=False)
        ep = ts.astype("datetime64[s]").astype(np.int64)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, u))  # arrival order within user
        u, ep, eid = u[order], ep[order], eid[order]
        bounds = np.r_[np.flatnonzero(np.r_[True, u[1:] != u[:-1]]), len(u)]
        skew = np.zeros(len(u), np.int64)
        for s0, s1 in zip(bounds[:-1], bounds[1:]):  # per user: sequential
            run = np.maximum.accumulate(ep[s0:s1])
            # watermark BEFORE this event: shift the running max by one
            skew[s0 + 1 : s1] = np.maximum(run[:-1] - ep[s0 + 1 : s1], 0)
        return pa.table(
            {"event_id": pa.array(eid), "user_id": pa.array(u),
             "skew_sec": pa.array(skew),
             "late": pa.array(skew > allowed_lateness_sec)}
        )

    return (
        events_ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(flag, batch_format="pyarrow")
    )
