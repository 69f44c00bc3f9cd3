"""Distributed joins: the large x large hash join and the thresholded
broadcast-or-shuffle lookup.

Every join in the engine is one of three shapes, picked by data size:

- **broadcast lookup** — the small side fits comfortably in a worker heap:
  ``ray.put`` the sorted arrays once, ``searchsorted`` per batch. O(1)
  shuffles; wrong when the small side is dataset-sized.
- **hash join** (``hash_join``) — both sides dataset-sized: bucket both by
  ``splitmix64(key) % B``, union, one ``groupby(bucket)`` shuffle, vectorized
  searchsorted lookup per bucket group. One shuffle group serves many keys,
  so group count stays at ``num_buckets`` regardless of row count.
- **pair attach** (``pair_attach``) — join per-entity values onto packed
  ``(a<<32)|b`` pair keys (dedup verify, degree orientation): two bucket
  shuffles, documented in the function.

``attach_lookup`` picks broadcast vs hash join from an explicit row count —
the caller always knows it (graph manifests carry n_vertices/n_subgraphs) —
so no code path silently materializes a dataset-sized table on the driver.

Schemas are passed explicitly as name->pyarrow-type dicts everywhere:
``Dataset.schema()`` would eagerly execute the upstream pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.util import unpack_hi, isin_sorted, splitmix64

# lookups above this many rows switch from ray.put broadcast to a hash join
BROADCAST_THRESHOLD = 2_000_000


def _time_i64(col) -> np.ndarray:
    """int64 view of a time/bound column: timestamps compare as their
    int64 epoch-microsecond representation (shared by the as-of, range
    and interval joins — one coercion rule, one place)."""
    a = col.to_numpy(zero_copy_only=False)
    if np.issubdtype(a.dtype, np.datetime64):
        return a.astype("datetime64[us]").astype(np.int64)
    return a.astype(np.int64)


def with_typed_empty(ds, fields: dict):
    """Guarantee ``ds`` carries this schema even when every upstream group is
    empty: ``map_groups`` over zero groups yields schema-less empty blocks
    that break downstream column access (``to_pandas()`` without columns).
    Prepending a zero-row typed block via ``union`` costs nothing, keeps the
    pipeline lazy/streaming, and is a no-op when data is present."""
    import ray.data as rd

    empty = pa.table({nm: pa.array([], type=t) for nm, t in fields.items()})
    # Known Ray 2.49 caveat this cannot fix: map_batches STRIPS the schema
    # from all-empty task outputs, and when every block of a dataset is
    # empty AND one of them is schema-less, ``to_pandas`` loses the columns
    # (``ds.schema()`` stays correct). Non-empty results are unaffected —
    # one non-empty typed block wins the merge. Read fully-empty results
    # via ``take_all``/``schema()`` rather than ``to_pandas`` columns.
    return rd.from_arrow(empty).union(ds)


def hash_join(
    left_ds,
    right_ds,
    on: str,
    left_cols: dict,
    right_cols: dict,
    num_buckets: int = 64,
    strict: bool = True,
    post=None,
):
    """Distributed hash equi-join on an int64 key.

    - ``left_cols`` / ``right_cols``: explicit name->pyarrow-type column
      dicts, EXCLUDING ``on``; names must be disjoint.
    - left keys may repeat; right keys must be unique (a lookup relation).
    - ``strict=True`` raises if a left key has no right match (the engine's
      joins are referential: labels/degrees exist for every vertex);
      ``strict=False`` drops unmatched left rows (inner join).
    - ``post``: optional ``pa.Table -> pa.Table`` applied to each joined
      bucket group INSIDE the join task, before any rows leave it. A join
      key lives in exactly one bucket and the group function sees its
      complete group, so a per-``on``-key aggregation here is globally
      correct with NO second shuffle — and shrinks the join output to the
      aggregate's cardinality before it hits the object store (the
      join-then-groupby-on-the-same-key pattern should always land here).
      Aggregations on OTHER keys emit per-bucket partials — combine them
      downstream (``tree_groupby_sum`` / ``groupby``).

    Skew: all rows of one KEY land in one bucket group, so a single hot key
    carrying a large fraction of the left side concentrates in one group
    (correctness unaffected — tested; only that group's task is bigger).
    For such workloads raise ``num_buckets`` (more, smaller groups) or
    pre-aggregate the left side per key before joining — the engine's own
    call sites join per-vertex relations where key multiplicity is bounded
    by degree, already capped upstream by combiners/DF cuts.

    Returns Dataset (``on``, *left_cols, *right_cols).
    """
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"hash_join column collision: {sorted(overlap)}")
    B = np.uint64(num_buckets)

    def tag(is_left: bool):
        def fn(batch: pa.Table) -> pa.Table:
            key = batch.column(on).to_numpy(zero_copy_only=False)
            n = len(key)
            cols = {
                "b": pa.array((splitmix64(key.astype(np.uint64)) % B).astype(np.int32)),
                on: batch.column(on),
                "_s": pa.array(
                    np.zeros(n, np.int8) if is_left else np.ones(n, np.int8)
                ),
            }
            for nm, typ in left_cols.items():
                cols[nm] = batch.column(nm) if is_left else pa.nulls(n, type=typ)
            for nm, typ in right_cols.items():
                cols[nm] = pa.nulls(n, type=typ) if is_left else batch.column(nm)
            return pa.table(cols)

        return fn

    def join_group(group: pa.Table) -> pa.Table:
        s = group.column("_s").to_numpy(zero_copy_only=False)
        left = group.filter(pa.array(s == 0))
        right = group.filter(pa.array(s == 1))
        lkey = left.column(on).to_numpy(zero_copy_only=False)
        rkey = right.column(on).to_numpy(zero_copy_only=False)
        order = np.argsort(rkey)
        rs = rkey[order]
        ok, pos = isin_sorted(rs, lkey, return_pos=True)
        if strict and not ok.all():
            missing = np.unique(lkey[~ok])[:5]
            raise ValueError(f"hash_join: no right row for keys {missing.tolist()}")
        lsel = left.filter(pa.array(ok))
        taken = right.take(pa.array(order[pos[ok]]))
        cols = {on: lsel.column(on)}
        for nm in left_cols:
            cols[nm] = lsel.column(nm)
        for nm in right_cols:
            cols[nm] = taken.column(nm)
        out = pa.table(cols)
        return post(out) if post is not None else out

    both = left_ds.map_batches(tag(True), batch_format="pyarrow").union(
        right_ds.map_batches(tag(False), batch_format="pyarrow")
    )
    return both.groupby("b").map_groups(join_group, batch_format="pyarrow")


def tree_groupby_sum(ds, keys: list[str], sum_cols: list[str], fanin: int = 32):
    """Groupby-sum for BOUNDED group cardinality (#groups <= ~1e4, known a
    priori: report dimensions like (returnflag, linestatus) or nation) as a
    map-only combine tree instead of Ray's sort-based ``groupby().sum()``.

    The sort-based Aggregate operator pays its all-to-all machinery per
    BLOCK regardless of row count — measured 6.4 s on 1,248 partial rows
    (sf0.1 pricing_summary) where this tree takes <1 s. Shape: in-task
    Arrow hash aggregation (``Table.group_by`` — C++ kernels) after a
    ``repartition(fanin)`` coalesce, then a final single-block combine.
    Data moved is #blocks x #groups tiny rows, two coalesce exchanges, no
    sort. At 1M input blocks and 1e4 groups the mid level sees ~1e10/fanin
    rows split across ``fanin`` tasks and emits fanin x #groups — use the
    default sort-based groupby instead when cardinality is unbounded
    (per-key relations like degrees or order keys).

    Output columns: ``keys + [f"sum({c})" for c in sum_cols]`` — drop-in
    for ``ds.groupby(keys).sum(sum_cols)`` consumers.
    """
    aggs = [(c, "sum") for c in sum_cols]
    plain = list(keys) + list(sum_cols)

    def combine(batch: pa.Table) -> pa.Table:
        # group_by yields keys first, then <c>_sum in agg order -> rename
        # back to the plain names so the next level re-aggregates them
        return batch.group_by(keys).aggregate(aggs).rename_columns(plain)

    def finish(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            list(keys) + [f"sum({c})" for c in sum_cols]
        )

    t = ds.repartition(fanin).map_batches(
        combine, batch_format="pyarrow", batch_size=None
    )
    t = t.repartition(1).map_batches(
        combine, batch_format="pyarrow", batch_size=None
    )
    return t.map_batches(finish, batch_format="pyarrow", batch_size=None)


def attach_lookup(
    ds,
    lookup_ds,
    on: str,
    left_cols: dict,
    value_cols: dict,
    n_lookup_rows: int,
    broadcast_threshold: int = BROADCAST_THRESHOLD,
    num_buckets: int = 64,
):
    """Attach ``value_cols`` from a unique-keyed lookup relation onto ``ds``.

    Picks the join shape from ``n_lookup_rows`` (callers know it from graph
    manifests / aggregates): small -> ``ray.put`` broadcast + per-batch
    searchsorted (one pass, zero shuffles); large -> ``hash_join`` (one
    shuffle, nothing driver-side). Both paths produce identical rows (tested).
    """
    if n_lookup_rows <= broadcast_threshold:
        import ray

        pdf = lookup_ds.to_pandas()
        key = pdf[on].to_numpy(np.int64)
        order = np.argsort(key)
        vals = {nm: pdf[nm].to_numpy()[order] for nm in value_cols}
        ref = ray.put((key[order], vals))

        def attach(batch: pa.Table) -> pa.Table:
            k_sorted, v = ray.get(ref)
            bkey = batch.column(on).to_numpy(zero_copy_only=False)
            ok, pos = isin_sorted(k_sorted, bkey, return_pos=True)
            if not ok.all():
                missing = np.unique(bkey[~ok])[:5]
                raise ValueError(f"attach_lookup: no lookup row for {missing.tolist()}")
            cols = {on: batch.column(on)}
            for nm in left_cols:
                cols[nm] = batch.column(nm)
            for nm in value_cols:
                cols[nm] = pa.array(v[nm][pos])
            return pa.table(cols)

        return ds.map_batches(attach, batch_format="pyarrow")
    return hash_join(
        ds, lookup_ds, on, left_cols, value_cols, num_buckets=num_buckets
    )


def semi_join(
    left_ds,
    keys_ds,
    on: str,
    left_cols: dict,
    anti: bool = False,
    n_key_rows: int | None = None,
    broadcast_threshold: int = BROADCAST_THRESHOLD,
    num_buckets: int = 64,
    post=None,
):
    """Distributed semi-join (``anti=False``: keep left rows whose ``on``
    exists in ``keys_ds``) / anti-join (``anti=True``: keep rows with NO
    match) — the EXISTS / NOT EXISTS shapes. ``keys_ds`` needs only the
    ``on`` column; duplicate keys are fine (membership, not multiplicity).

    Shape choice mirrors ``attach_lookup``: when the caller knows the key
    relation is small (``n_key_rows`` <= threshold) the distinct keys are
    ``ray.put`` once and every left batch filters locally — ZERO shuffles
    (a semi-join never widens rows, so the broadcast path is a pure
    streaming filter). Otherwise both sides bucket by ``splitmix64(key)``
    and one groupby shuffle filters per bucket; all rows of one key land in
    one group, so membership is exact.

    ``post`` (hash path only) runs per joined bucket group inside the task;
    aggregations on non-``on`` keys emit per-bucket partials — combine
    downstream (same contract as ``hash_join.post``).

    Returns Dataset (``on``, *left_cols).
    """
    import ray

    if n_key_rows is not None and n_key_rows <= broadcast_threshold:
        # unique() on an empty dataset returns None; null keys never match
        # under EXISTS semantics, so drop them before the int cast.
        raw = [k for k in (keys_ds.unique(on) or []) if k is not None]
        keys = np.unique(np.asarray(raw, dtype=np.int64))
        ref = ray.put(keys)

        def flt(batch: pa.Table) -> pa.Table:
            k_sorted = ray.get(ref)
            bkey = batch.column(on).to_numpy(zero_copy_only=False)
            hit = isin_sorted(k_sorted, bkey)
            sel = batch.filter(pa.array(hit ^ anti))
            out = pa.table(
                {on: sel.column(on), **{nm: sel.column(nm) for nm in left_cols}}
            )
            return post(out) if post is not None else out

        return left_ds.map_batches(flt, batch_format="pyarrow")

    B = np.uint64(num_buckets)

    def tag(is_left: bool):
        def fn(batch: pa.Table) -> pa.Table:
            key = batch.column(on).to_numpy(zero_copy_only=False)
            if not is_left:
                key = np.unique(key)  # per-batch membership pre-dedup
            n = len(key)
            cols = {
                "b": pa.array((splitmix64(key.astype(np.uint64)) % B).astype(np.int32)),
                on: pa.array(key) if not is_left else batch.column(on),
                "_s": pa.array(np.zeros(n, np.int8) if is_left else np.ones(n, np.int8)),
            }
            for nm, typ in left_cols.items():
                cols[nm] = batch.column(nm) if is_left else pa.nulls(n, type=typ)
            return pa.table(cols)

        return fn

    def filter_group(group: pa.Table) -> pa.Table:
        s = group.column("_s").to_numpy(zero_copy_only=False)
        left = group.filter(pa.array(s == 0))
        rkey = np.unique(
            group.column(on).to_numpy(zero_copy_only=False)[s == 1]
        )
        lkey = left.column(on).to_numpy(zero_copy_only=False)
        hit = isin_sorted(rkey, lkey)
        sel = left.filter(pa.array(hit ^ anti))
        out = pa.table(
            {on: sel.column(on), **{nm: sel.column(nm) for nm in left_cols}}
        )
        return post(out) if post is not None else out

    both = left_ds.map_batches(tag(True), batch_format="pyarrow").union(
        keys_ds.map_batches(tag(False), batch_format="pyarrow")
    )
    return both.groupby("b").map_groups(filter_group, batch_format="pyarrow")


def anti_join(left_ds, keys_ds, on: str, left_cols: dict, **kw):
    """NOT EXISTS: left rows whose ``on`` has no row in ``keys_ds``."""
    return semi_join(left_ds, keys_ds, on, left_cols, anti=True, **kw)


def asof_join(
    left_ds,
    right_ds,
    key: str,
    time: str,
    left_cols: dict,
    right_cols: dict,
    tie: str | None = None,
    num_buckets: int = 64,
):
    """Distributed as-of join: for every left row ``(key, t)``, attach the
    right row with the same ``key`` and the greatest ``time <= t``
    (inclusive). Among right rows tied on ``time``, the greatest ``tie``
    column wins (pass e.g. an event id for full determinism); left rows
    with no prior right row keep null value columns (left-join semantics).

    Ray Data has no as-of join; the reference is graph-only — this is a
    builder-brief (training-data / event-log) operator. Shape: the same
    one-shuffle bucket union as ``hash_join`` (all rows of a key land in
    one bucket group), then a fully VECTORIZED per-group sweep — sort by
    (key, time, side, tie) with right rows before left at equal time, take
    a running maximum of right-row positions, and invalidate matches whose
    filled position belongs to a different key (the running max never
    resets, but a leak across a key boundary necessarily has a different
    key value, so the equality check nulls it). No per-key Python loop —
    group cost is O(n log n) in the bucket's row count.

    ``time`` columns must be int64-comparable (epoch ints or timestamps —
    timestamps are compared as their int64 representation). Columns:
    ``left_cols`` / ``right_cols`` as in ``hash_join`` (disjoint,
    excluding ``key``/``time``/``tie``). Returns Dataset
    ``(key, time, *left_cols, *right_cols)`` — one row per left row.
    """
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"asof_join column collision: {sorted(overlap)}")
    B = np.uint64(num_buckets)

    def tag(is_left: bool):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch.column(key).to_numpy(zero_copy_only=False)
            n = len(k)
            cols = {
                "b": pa.array((splitmix64(k.astype(np.uint64)) % B).astype(np.int32)),
                key: batch.column(key),
                "_t": pa.array(_time_i64(batch.column(time))),
                "_s": pa.array(
                    np.ones(n, np.int8) if is_left else np.zeros(n, np.int8)
                ),
                # tie only orders RIGHT rows among equal times; left rows'
                # position after rights at equal (key, time) is fixed by _s,
                # so the column need only exist on the right side
                "_tie": pa.array(
                    _time_i64(batch.column(tie))
                    if (tie is not None and not is_left)
                    else np.zeros(n, np.int64)
                ),
            }
            for nm, typ in left_cols.items():
                cols[nm] = batch.column(nm) if is_left else pa.nulls(n, type=typ)
            for nm, typ in right_cols.items():
                cols[nm] = pa.nulls(n, type=typ) if is_left else batch.column(nm)
            return pa.table(cols)

        return fn

    def sweep(group: pa.Table) -> pa.Table:
        k = group.column(key).to_numpy(zero_copy_only=False)
        t = group.column("_t").to_numpy(zero_copy_only=False)
        s = group.column("_s").to_numpy(zero_copy_only=False)
        tv = group.column("_tie").to_numpy(zero_copy_only=False)
        n = len(k)
        # right rows (side 0) sort before left at equal (key, time); right
        # ties order by _tie so the running max lands on the greatest
        order = np.lexsort((tv, s, t, k))
        ks, ss = k[order], s[order]
        is_right = ss == 0
        last_r = np.maximum.accumulate(
            np.where(is_right, np.arange(n, dtype=np.int64), -1)
        )
        lpos = np.flatnonzero(~is_right)
        fill = last_r[lpos]
        ok = (fill >= 0) & (ks[np.maximum(fill, 0)] == ks[lpos])
        left_orig = order[lpos]
        lsel = group.take(pa.array(left_orig))
        cols = {key: lsel.column(key), time: lsel.column("_t")}
        for nm in left_cols:
            cols[nm] = lsel.column(nm)
        matched = order[np.where(ok, fill, 0)]
        rtaken = group.take(pa.array(matched))
        okp = pa.array(ok)
        for nm, typ in right_cols.items():
            vals = rtaken.column(nm)
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            cols[nm] = pa.compute.if_else(okp, vals, pa.scalar(None, type=typ))
        return pa.table(cols)

    both = left_ds.map_batches(tag(True), batch_format="pyarrow").union(
        right_ds.map_batches(tag(False), batch_format="pyarrow")
    )
    return both.groupby("b").map_groups(sweep, batch_format="pyarrow")


def range_join(
    left_ds,
    right_ds,
    lo: str,
    hi: str,
    time: str,
    left_cols: dict,
    right_cols: dict,
    key: str | None = None,
    bucket_width: int | None = None,
    num_buckets: int = 64,
    max_span_buckets: int = 1024,
    post=None,
    out_fields: dict | None = None,
):
    """Distributed range (interval × point) join: every left row carries an
    inclusive interval ``[lo, hi]``; it pairs with every right row whose
    ``time`` falls inside it — optionally also requiring ``left.key ==
    right.key``. Inner-join semantics: one output row per matched pair,
    left rows with no match emit nothing.

    Ray Data has no range join and the reference is graph-only — this is a
    builder-brief (event-log / feature-window) operator. Shape: the time
    axis is cut into fixed ``bucket_width`` buckets; each RIGHT point lands
    in exactly one bucket, each LEFT interval replicates into every bucket
    it overlaps (``hi//W - lo//W + 1`` rows — the documented replication
    factor; intervals spanning more than ``max_span_buckets`` buckets raise
    rather than silently exploding). A pair is generated only in the right
    point's bucket, so no post-dedup pass exists. Buckets hash into
    ``num_buckets`` coarse shuffle groups (group key mixes the time bucket
    with the equality key, so a hot time range spreads across the key
    space); inside a group the sweep is fully vectorized: each left
    replica becomes an *open* probe at ``lo`` and a *close* probe at
    ``hi``, all rows lexsort by ``(key, tbucket, t, open<right<close)``,
    and a cumulative count of right rows between each open/close pair
    yields the match counts — every row between the two probes provably
    shares their ``(key, tbucket)`` prefix, so the matches are exact. Pair
    expansion is the repeat/arange pattern; no per-key Python loop.

    ``bucket_width`` is required (time-domain units, e.g. epoch micros):
    pick it near the typical interval width so replication stays ~2×.
    ``lo``/``hi``/``time`` must be int64-comparable (epoch ints or
    timestamps — timestamps compare as int64 micros). ``left_cols`` /
    ``right_cols`` as in ``hash_join`` (disjoint, excluding the
    key/bound/time columns). Returns Dataset ``(key?, lo, hi, time,
    *left_cols, *right_cols)`` with the bound/time columns as int64.
    Output size is the true match count — inherently up to |L|×|R|;
    bound it upstream (tighter intervals / pre-filters) not here.
    """
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"range_join column collision: {sorted(overlap)}")
    payload = set(left_cols) | set(right_cols)
    reserved = {"b", "_k", "_tb", "_lo", "_hi", "_t", "_s", lo, hi, time}
    if key is not None:
        reserved.add(key)
    bad = payload & reserved
    if bad:  # a colliding payload column would clobber the shuffle key
        raise ValueError(
            f"range_join payload columns collide with reserved/bound "
            f"names: {sorted(bad)}"
        )
    if bucket_width is None or bucket_width <= 0:
        raise ValueError("range_join requires a positive bucket_width")
    W = np.int64(bucket_width)
    B = np.uint64(num_buckets)

    def _grp(k: np.ndarray, tb: np.ndarray) -> pa.Array:
        mix = splitmix64(tb.astype(np.uint64))
        if key is not None:
            mix ^= splitmix64(k.astype(np.uint64))
        return pa.array((splitmix64(mix) % B).astype(np.int32))

    def tag_left(batch: pa.Table) -> pa.Table:
        lov = _time_i64(batch.column(lo))
        hiv = _time_i64(batch.column(hi))
        valid = lov <= hiv  # empty intervals never match; drop them here
        t = batch.filter(pa.array(valid))
        lov, hiv = lov[valid], hiv[valid]
        tb_lo = np.floor_divide(lov, W)
        tb_hi = np.floor_divide(hiv, W)
        span = tb_hi - tb_lo + 1
        if len(span) and span.max(initial=0) > max_span_buckets:
            raise ValueError(
                f"range_join: an interval spans {int(span.max())} time "
                f"buckets (> max_span_buckets={max_span_buckets}); raise "
                "bucket_width or pre-split the interval"
            )
        n_out = int(span.sum())
        src = np.repeat(np.arange(len(lov), dtype=np.int64), span)
        offs = np.concatenate(([0], np.cumsum(span)[:-1]))
        tb = (np.arange(n_out, dtype=np.int64) - offs[src]) + tb_lo[src]
        rep = t.take(pa.array(src))
        k = (
            rep.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
            if key is not None
            else np.zeros(n_out, np.int64)
        )
        cols = {
            "b": _grp(k, tb),
            "_k": pa.array(k),
            "_tb": pa.array(tb),
            "_lo": pa.array(lov[src]),
            "_hi": pa.array(hiv[src]),
            "_t": pa.array(np.zeros(n_out, np.int64)),
            "_s": pa.array(np.ones(n_out, np.int8)),
        }
        for nm, typ in left_cols.items():
            cols[nm] = rep.column(nm)
        for nm, typ in right_cols.items():
            cols[nm] = pa.nulls(n_out, type=typ)
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        tv = _time_i64(batch.column(time))
        n = len(tv)
        tb = np.floor_divide(tv, W)
        k = (
            batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
            if key is not None
            else np.zeros(n, np.int64)
        )
        cols = {
            "b": _grp(k, tb),
            "_k": pa.array(k),
            "_tb": pa.array(tb),
            "_lo": pa.array(np.zeros(n, np.int64)),
            "_hi": pa.array(np.zeros(n, np.int64)),
            "_t": pa.array(tv),
            "_s": pa.array(np.zeros(n, np.int8)),
        }
        for nm, typ in left_cols.items():
            cols[nm] = pa.nulls(n, type=typ)
        for nm, typ in right_cols.items():
            cols[nm] = batch.column(nm)
        return pa.table(cols)

    def sweep(group: pa.Table) -> pa.Table:
        s = group.column("_s").to_numpy(zero_copy_only=False)
        L = group.filter(pa.array(s == 1))
        R = group.filter(pa.array(s == 0))
        nl, nr = L.num_rows, R.num_rows

        def empty() -> pa.Table:
            cols = {}
            if key is not None:
                cols[key] = pa.array([], type=pa.int64())
            cols[lo] = pa.array([], type=pa.int64())
            cols[hi] = pa.array([], type=pa.int64())
            cols[time] = pa.array([], type=pa.int64())
            for nm, typ in left_cols.items():
                cols[nm] = pa.array([], type=L.schema.field(nm).type)
            for nm, typ in right_cols.items():
                cols[nm] = pa.array([], type=R.schema.field(nm).type)
            return pa.table(cols)

        if nl == 0 or nr == 0:
            return post(empty()) if post is not None else empty()
        lk = L.column("_k").to_numpy(zero_copy_only=False)
        ltb = L.column("_tb").to_numpy(zero_copy_only=False)
        llo = L.column("_lo").to_numpy(zero_copy_only=False)
        lhi = L.column("_hi").to_numpy(zero_copy_only=False)
        rk = R.column("_k").to_numpy(zero_copy_only=False)
        rtb = R.column("_tb").to_numpy(zero_copy_only=False)
        rt = R.column("_t").to_numpy(zero_copy_only=False)
        # open probes (order 0), right rows (order 1), close probes (order 2)
        total = 2 * nl + nr
        ck = np.concatenate((lk, lk, rk))
        ctb = np.concatenate((ltb, ltb, rtb))
        ct = np.concatenate((llo, lhi, rt))
        cord = np.concatenate(
            (np.zeros(nl, np.int8), np.full(nl, 2, np.int8), np.ones(nr, np.int8))
        )
        order = np.lexsort((cord, ct, ctb, ck))
        is_right = cord[order] == 1
        cum = np.cumsum(is_right)  # rights at-or-before each sorted position
        pos_of = np.empty(total, np.int64)
        pos_of[order] = np.arange(total, dtype=np.int64)
        start_r = cum[pos_of[:nl]]  # open probe is not a right: strictly-before count
        end_r = cum[pos_of[nl : 2 * nl]]
        counts = end_r - start_r
        total_m = int(counts.sum())
        if total_m == 0:
            return post(empty()) if post is not None else empty()
        rpos_sorted = np.flatnonzero(is_right)  # sorted positions of rights
        lrep = np.repeat(np.arange(nl, dtype=np.int64), counts)
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        rank = (np.arange(total_m, dtype=np.int64) - offs[lrep]) + start_r[lrep]
        rorig = order[rpos_sorted[rank]] - 2 * nl  # back to R row index
        lsel = L.take(pa.array(lrep))
        rsel = R.take(pa.array(rorig))
        cols = {}
        if key is not None:
            cols[key] = lsel.column("_k")
        cols[lo] = lsel.column("_lo")
        cols[hi] = lsel.column("_hi")
        cols[time] = rsel.column("_t")
        for nm in left_cols:
            cols[nm] = lsel.column(nm)
        for nm in right_cols:
            cols[nm] = rsel.column(nm)
        out = pa.table(cols)
        return post(out) if post is not None else out

    both = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow")
    )
    if out_fields is None:
        out_fields = {}
        if key is not None:
            out_fields[key] = pa.int64()
        out_fields[lo] = pa.int64()
        out_fields[hi] = pa.int64()
        out_fields[time] = pa.int64()
        out_fields.update(left_cols)
        out_fields.update(right_cols)
    return with_typed_empty(
        both.groupby("b").map_groups(sweep, batch_format="pyarrow"), out_fields
    )


def interval_join(
    left_ds,
    right_ds,
    left_bounds: tuple,
    right_bounds: tuple,
    left_cols: dict,
    right_cols: dict,
    key: str | None = None,
    bucket_width: int | None = None,
    num_buckets: int = 64,
    max_span_buckets: int = 1024,
):
    """Distributed interval-overlap join: left rows carry inclusive
    ``[l_lo, l_hi]``, right rows ``[r_lo, r_hi]``; a pair is emitted iff
    the intervals overlap (``l_lo <= r_hi and r_lo <= l_hi``), optionally
    also requiring key equality. Inner-join semantics, one row per
    overlapping pair.

    Decomposes EXACTLY into two ``range_join`` passes on the overlap's
    start point ``max(l_lo, r_lo)`` (each pair has one start, so no pair
    is produced twice and none is missed):

    - pass 1 (``r_lo >= l_lo``): right START points in left intervals —
      ``r_lo in [l_lo, l_hi]`` implies overlap, and covers all such pairs;
    - pass 2 (``r_lo < l_lo``, strict): left START points in right
      intervals shifted to ``[r_lo + 1, r_hi]`` — integer time domain
      makes ``r_lo < l_lo`` equivalent to ``l_lo >= r_lo + 1``; intervals
      with ``r_lo + 1 > r_hi`` (width < 2) can have no strictly-later
      overlap start and drop out as invalid.

    Bounds must be int64-comparable (epoch ints / timestamps). Returns
    Dataset ``(key?, l_lo, l_hi, r_lo, r_hi, *left_cols, *right_cols)``
    with int64 bound columns. Same scale shape and parameters as
    ``range_join`` (bucket replication, span guard, coarse hashed shuffle
    groups, vectorized sweeps); output size is the true overlap count.
    """
    l_lo, l_hi = left_bounds
    r_lo, r_hi = right_bounds
    reserved = {l_lo, l_hi, r_lo, r_hi}
    overlap = (set(left_cols) | set(right_cols)) & reserved
    if overlap:
        raise ValueError(f"interval_join column collision: {sorted(overlap)}")

    kw = dict(
        key=key, bucket_width=bucket_width, num_buckets=num_buckets,
        max_span_buckets=max_span_buckets,
    )

    # pass 1: right rows become their start points, carrying r_hi.
    # The point side of a range_join is not validity-checked, so empty
    # (lo > hi) intervals must drop here, as they do on the interval side.
    def r_points(b: pa.Table) -> pa.Table:
        rl = _time_i64(b.column(r_lo))
        rh = _time_i64(b.column(r_hi))
        valid = rl <= rh
        t = b.filter(pa.array(valid))
        cols = {}
        if key is not None:
            cols[key] = t.column(key)
        cols["_t"] = pa.array(rl[valid])
        cols["_rhi"] = pa.array(rh[valid])
        for nm in right_cols:
            cols[nm] = t.column(nm)
        return pa.table(cols)

    out_fields = {}
    if key is not None:
        out_fields[key] = pa.int64()
    out_fields.update({l_lo: pa.int64(), l_hi: pa.int64(),
                       r_lo: pa.int64(), r_hi: pa.int64()})
    out_fields.update(left_cols)
    out_fields.update(right_cols)

    def p1_norm(b: pa.Table) -> pa.Table:
        cols = {}
        if key is not None:
            cols[key] = b.column(key)
        cols[l_lo] = b.column(l_lo)
        cols[l_hi] = b.column(l_hi)
        cols[r_lo] = b.column("_t")
        cols[r_hi] = b.column("_rhi")
        for nm in left_cols:
            cols[nm] = b.column(nm)
        for nm in right_cols:
            cols[nm] = b.column(nm)
        return pa.table(cols)

    # pass runs entirely inside range_join: the norm is its in-sweep
    # ``post`` (a trailing map_batches would strip the schema from empty
    # outputs and an all-empty result would lose its columns)
    p1 = range_join(
        left_ds, right_ds.map_batches(r_points, batch_format="pyarrow"),
        lo=l_lo, hi=l_hi, time="_t",
        left_cols=left_cols,
        right_cols={"_rhi": pa.int64(), **right_cols},
        post=p1_norm, out_fields=out_fields,
        **kw,
    )

    # pass 2: right intervals shifted strict, left rows as start points
    def r_shift(b: pa.Table) -> pa.Table:
        cols = {}
        if key is not None:
            cols[key] = b.column(key)
        rl = _time_i64(b.column(r_lo))
        cols["_slo"] = pa.array(rl + 1)
        cols["_shi"] = pa.array(_time_i64(b.column(r_hi)))
        cols["_rlo"] = pa.array(rl)  # original start for the output
        for nm in right_cols:
            cols[nm] = b.column(nm)
        return pa.table(cols)

    def l_points(b: pa.Table) -> pa.Table:
        ll = _time_i64(b.column(l_lo))
        lh = _time_i64(b.column(l_hi))
        valid = ll <= lh  # see r_points
        t = b.filter(pa.array(valid))
        cols = {}
        if key is not None:
            cols[key] = t.column(key)
        cols["_t"] = pa.array(ll[valid])
        cols["_lhi"] = pa.array(lh[valid])
        for nm in left_cols:
            cols[nm] = t.column(nm)
        return pa.table(cols)

    def p2_norm(b: pa.Table) -> pa.Table:
        cols = {}
        if key is not None:
            cols[key] = b.column(key)
        cols[l_lo] = b.column("_t")
        cols[l_hi] = b.column("_lhi")
        cols[r_lo] = b.column("_rlo")
        cols[r_hi] = b.column("_shi")
        for nm in left_cols:
            cols[nm] = b.column(nm)
        for nm in right_cols:
            cols[nm] = b.column(nm)
        return pa.table(cols)

    p2 = range_join(
        right_ds.map_batches(r_shift, batch_format="pyarrow"),
        left_ds.map_batches(l_points, batch_format="pyarrow"),
        lo="_slo", hi="_shi", time="_t",
        left_cols={"_rlo": pa.int64(), **right_cols},
        right_cols={"_lhi": pa.int64(), **left_cols},
        post=p2_norm, out_fields=out_fields,
        **kw,
    )
    return p1.union(p2)


def pair_attach(cand_ds, values_ds, value_fields: dict,
                carry_fields: dict | None = None, num_buckets: int = 64,
                id_col: str = "doc_id"):
    """Join per-entity value columns onto packed candidate pair keys, fully
    distributed (the crawl-scale verify path — replaces any broadcast/driver
    lookup of a dataset-sized side).

    - ``cand_ds``: Dataset with ``key`` = (a<<32)|b (a<b, ids < 2**32) plus
      optional ``carry_fields`` columns passed through (e.g. counts). Keys
      must be unique (dedupe upstream with a groupby).
    - ``values_ds``: Dataset (``id_col``, **value_fields) — ONE row per id.
    - Returns Dataset (key, <v>_a, <v>_b, ..., *carry).

    Shape: two coarse-bucket shuffles. (1) candidate keys explode into one
    row per (pair, side) bucketed by hash(id); value rows flow into the same
    buckets; a vectorized searchsorted lookup inside each bucket group
    attaches the id's values. (2) attached rows re-bucket by hash(key); each
    group pairs up side 0/1 rows per key. One shuffle group serves many ids/
    keys, so group count stays at ``num_buckets`` regardless of input size.
    """
    names = list(value_fields)
    carry = dict(carry_fields or {})
    B = np.uint64(num_buckets)

    def explode(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy(zero_copy_only=False)
        a = unpack_hi(key)
        b = key & np.int64(0xFFFFFFFF)
        ent = np.concatenate([a, b])
        side = np.concatenate(
            [np.zeros(len(key), np.int8), np.ones(len(key), np.int8)]
        )
        cols = {
            "b": pa.array((splitmix64(ent.astype(np.uint64)) % B).astype(np.int32)),
            id_col: pa.array(ent),
            "key": pa.array(np.concatenate([key, key])),
            "side": pa.array(side),
        }
        for nm, typ in value_fields.items():
            cols[nm] = pa.nulls(len(ent), type=typ)
        for nm in carry:
            c = batch.column(nm)
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            cols[nm] = pa.concat_arrays([c, c])
        return pa.table(cols)

    def val_rows(batch: pa.Table) -> pa.Table:
        ent = batch.column(id_col).to_numpy(zero_copy_only=False)
        n = len(ent)
        cols = {
            "b": pa.array((splitmix64(ent.astype(np.uint64)) % B).astype(np.int32)),
            id_col: batch.column(id_col),
            "key": pa.array(np.full(n, -1, dtype=np.int64)),
            "side": pa.array(np.full(n, -1, dtype=np.int8)),
        }
        for nm in names:
            cols[nm] = batch.column(nm)
        for nm, typ in carry.items():
            cols[nm] = pa.nulls(n, type=typ)
        return pa.table(cols)

    def attach(group: pa.Table) -> pa.Table:
        side = group.column("side").to_numpy(zero_copy_only=False)
        is_val = side < 0
        vrows = group.filter(pa.array(is_val))
        crows = group.filter(pa.array(~is_val))
        key = crows.column("key").to_numpy(zero_copy_only=False)
        cols = {
            "kb": pa.array(
                (splitmix64(key.astype(np.uint64)) % B).astype(np.int32)
            ),
            "key": crows.column("key"),
            "side": crows.column("side"),
        }
        if crows.num_rows:
            vent = vrows.column(id_col).to_numpy(zero_copy_only=False)
            order = np.argsort(vent)
            cent = crows.column(id_col).to_numpy(zero_copy_only=False)
            ok, pos = isin_sorted(vent[order], cent, return_pos=True)
            if not ok.all():
                raise ValueError("pair_attach: candidate id missing a value row")
            taken = vrows.take(pa.array(order[pos]))
            for nm in names:
                cols[nm] = taken.column(nm)
        else:
            for nm, typ in value_fields.items():
                cols[nm] = pa.nulls(0, type=typ)
        for nm in carry:
            cols[nm] = crows.column(nm)
        return pa.table(cols)

    def pairup(group: pa.Table) -> pa.Table:
        key = group.column("key").to_numpy(zero_copy_only=False)
        side = group.column("side").to_numpy(zero_copy_only=False)
        order = np.lexsort((side, key))
        t = group.take(pa.array(order))
        k = key[order]
        if len(k) % 2 or not np.array_equal(k[0::2], k[1::2]):
            raise ValueError("pair_attach: unpaired candidate key in bucket")
        ev = t.take(pa.array(np.arange(0, len(k), 2)))
        od = t.take(pa.array(np.arange(1, len(k), 2)))
        cols = {"key": pa.array(k[0::2])}
        for nm in names:
            cols[f"{nm}_a"] = ev.column(nm)
            cols[f"{nm}_b"] = od.column(nm)
        for nm in carry:
            cols[nm] = ev.column(nm)
        return pa.table(cols)

    exploded = cand_ds.map_batches(explode, batch_format="pyarrow")
    vals = values_ds.map_batches(val_rows, batch_format="pyarrow")
    attached = (
        exploded.union(vals)
        .groupby("b")
        .map_groups(attach, batch_format="pyarrow")
    )
    return attached.groupby("kb").map_groups(pairup, batch_format="pyarrow")


def bucketed_distinct(ds, col: str, num_buckets: int = 32):
    """Distributed DISTINCT over one int64 column as a coarse-bucket
    groupby + vectorized per-bucket ``np.unique`` — Ray's per-key
    ``groupby(col).count()`` pays the sort-based aggregate machinery per
    distinct key (the same overhead ``tree_groupby_sum`` documents), which
    adds seconds per call even on thousand-row inputs. All rows of a value
    land in one bucket, so the result is exact. -> Dataset (col,)."""
    B = np.uint64(num_buckets)

    def bucket(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        u = np.unique(v)  # per-batch pre-dedup before the shuffle
        return pa.table(
            {
                "db": pa.array((splitmix64(u.astype(np.uint64)) % B).astype(np.int32)),
                col: pa.array(u),
            }
        )

    def uniq(group: pa.Table) -> pa.Table:
        v = group.column(col).to_numpy(zero_copy_only=False)
        return pa.table({col: pa.array(np.unique(v))})

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("db")
        .map_groups(uniq, batch_format="pyarrow")
    )


def bucketed_sum(ds, key: str, val: str, out_val: str | None = None,
                 num_buckets: int = 32):
    """Exact per-key int64 SUM over an int64 key column as a coarse-bucket
    groupby + vectorized per-bucket ``np.unique``/``np.add.at`` — the
    unbounded-cardinality sibling of ``tree_groupby_sum`` (same rationale
    as ``bucketed_distinct``: Ray's sort-based aggregate pays per-key
    machinery). All rows of a key land in one bucket, so sums are exact
    and complete. -> Dataset (key, out_val) — out_val defaults to
    ``f"sum({val})"`` for drop-in ``groupby(key).sum(val)`` replacement."""
    out_val = out_val or f"sum({val})"
    B = np.uint64(num_buckets)

    def bucket(batch: pa.Table) -> pa.Table:
        k = batch.column(key).to_numpy(zero_copy_only=False)
        v = batch.column(val).to_numpy(zero_copy_only=False)
        # per-batch pre-combine before the shuffle
        uk, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, v.astype(np.int64))
        return pa.table(
            {
                "sb": pa.array((splitmix64(uk.astype(np.uint64)) % B).astype(np.int32)),
                key: pa.array(uk),
                val: pa.array(s),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        k = group.column(key).to_numpy(zero_copy_only=False)
        v = group.column(val).to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, v)
        return pa.table({key: pa.array(uk), out_val: pa.array(s)})

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("sb")
        .map_groups(combine, batch_format="pyarrow")
    )


def loop_barrier(ds, tag: str = "loop"):
    """Snapshot a loop-carried Dataset to parquet and read it back — the
    barrier for ITERATIVE dataflow (Boruvka rounds, pointer doubling,
    frontier loops). ``Dataset.materialize()`` is NOT enough here: feeding
    a materialized dataset into both sides of the next round's join makes
    execution time grow exponentially with round count in Ray 2.49
    (measured: 12 chained 30-row self-joins degrade 1 s -> 60 s/iteration;
    flat ~3 s with this parquet barrier — the same reason the BSP engine
    checkpoints supersteps to parquet, superstep.py).

    Scratch goes through ``raylink.storage`` under ``$RAYLINK_CKPT_ROOT/
    loop`` (shared storage on a multi-node cluster, like every other
    checkpoint path; node-local /tmp would silently scatter partitions
    across nodes). One directory per call. Snapshots must OUTLIVE the loop
    round that wrote them — the returned Dataset is lazy and its parquet is
    re-read on every downstream execution — so nothing is deleted eagerly;
    call ``loop_barrier_cleanup(tag)`` once the loop's results have been
    fully consumed (or rely on the checkpoint root's normal lifecycle)."""
    import uuid

    import ray.data as rd

    from raylink import storage
    from raylink.superstep import CKPT_ROOT

    root = storage.join(CKPT_ROOT, "loop")
    path = storage.join(root, f"{tag}-{uuid.uuid4().hex[:12]}")
    ds.write_parquet(path)
    if not storage.exists(path) or not storage.listdir(path):
        # empty dataset -> zero files written; the (already-executed, empty)
        # input is safe to hand back — its only consumer is a count/terminal
        return ds
    _LOOP_DIRS.setdefault(tag, []).append(path)
    return rd.read_parquet(path)


_LOOP_DIRS: dict = {}  # tag -> snapshot dirs written this process


def loop_barrier_cleanup(tag: str) -> int:
    """Delete every snapshot ``loop_barrier`` wrote under ``tag`` in this
    process. Call ONLY after the loop's outputs are fully materialized
    (written to their own parquet / collected) — the barrier Datasets are
    lazy readers of these files. Returns the number of dirs removed."""
    from raylink import storage

    dirs = _LOOP_DIRS.pop(tag, [])
    for d in dirs:
        storage.delete_dir(d)
    return len(dirs)
