"""Row-selection operators for training-data curation: deterministic
(stratified) sampling, per-group top-k, and exact-k per-group sampling.

None exist in the reference (it is a graph-only BSP engine); all are
builder-brief training-data-pipeline requirements, built from pure
``map_batches`` / one-coarse-shuffle shapes:

- ``stratified_sample`` touches each row once (a hash compare — no RNG
  state, no shuffle, reproducible under any partitioning / retry order:
  the keep decision is a pure function of the id and seed, like the
  splitmix64 partitioner in ``graph.py``).
- ``group_topk`` reduces per batch BEFORE its one shuffle (global top-k of
  a group is contained in the union of per-batch top-ks), so at most
  ``k x groups-per-batch`` rows per batch hit the exchange; groups are
  coarse-bucketed by key hash like every other groupby in the engine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.util import splitmix64

U64 = np.uint64


def _thresh(fraction: float) -> np.uint64:
    """fraction in [0,1] -> inclusive-exclusive uint64 cut, exact: keep iff
    splitmix64(id ^ seed) < floor(fraction * 2^64). The cut saturates at
    2^64-1, so fraction=1.0 keeps everything except an id hashing to
    exactly 2^64-1 (probability 2^-64 — documented, and the SQL mirror
    computes the identical constant, so both engines always agree)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    return U64(min(int(fraction * 2.0**64), 2**64 - 1))


def stratified_sample(
    ds,
    id_col: str,
    fraction: float,
    seed: int = 0,
    by: str | None = None,
    fractions: dict | None = None,
):
    """Deterministic Bernoulli sample: keep a row iff
    ``splitmix64(uint64(id) ^ seed) < fraction * 2^64``.

    - ``by`` + ``fractions``: per-stratum rates — a row whose ``by`` value
      has an entry in ``fractions`` uses that rate, anything else uses
      ``fraction`` (the default rate).
    - Pure per-batch filter: no shuffle, no driver state, identical output
      under any partitioning/replay (the hash IS the coin). Mirrored
      bit-for-bit in SQL by ``oracles_sql.stratified_sample_sql``.
    """
    fractions = dict(fractions or {})
    default_t = _thresh(fraction)
    strat_t = {k: _thresh(v) for k, v in fractions.items()}
    sd = U64(np.uint64(seed))

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = splitmix64(ids ^ sd)
        if by is None or not strat_t:
            return batch.filter(pa.array(h < default_t))
        # few strata: dictionary-encode and map codes -> thresholds
        col = batch.column(by)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = col.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        # null stratum -> NaN index; route to the default threshold (the
        # SQL mirror's CASE ... ELSE branch)
        null_mask = np.isnan(codes) if codes.dtype.kind == "f" else None
        codes = np.nan_to_num(codes, nan=0.0).astype(np.int64) \
            if null_mask is not None else codes.astype(np.int64)
        vocab = enc.dictionary.to_pylist()
        lut = np.array(
            [strat_t.get(v, default_t) for v in vocab], dtype=np.uint64
        )
        thr = lut[codes] if len(lut) else np.full(len(codes), default_t,
                                                  dtype=np.uint64)
        if null_mask is not None:
            thr = np.where(null_mask, np.uint64(default_t), thr)
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def group_topk(
    ds,
    key_col: str,
    score_col: str,
    k: int,
    id_col: str,
    num_buckets: int = 64,
):
    """Top-``k`` rows per ``key_col`` value by ``score_col`` DESC, ties
    broken by ``id_col`` ASC (fully deterministic). Returns a Dataset with
    the input's columns plus ``rk`` (1-based rank within the key).

    Shape: vectorized per-batch top-k per key (lexsort + segment ranks) ->
    coarse bucket groupby on hash(key) -> identical per-group final top-k.
    Per-batch reduction bounds the shuffle at ``k x keys-per-batch`` rows;
    one bucket group serves many keys so group count stays ``num_buckets``
    at any key cardinality. A single hot key concentrates at most ``k x
    n_blocks`` rows in its bucket.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    B = np.uint64(num_buckets)

    def _key_codes(batch: pa.Table) -> np.ndarray:
        """Per-batch grouping codes for the key: ints pass through; strings
        go through dictionary codes (only equal-clustering matters for the
        segment ranks, not global order)."""
        col = batch.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            return col.to_numpy(zero_copy_only=False).astype(np.int64)
        return col.dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)

    def _key_hash(batch: pa.Table) -> np.ndarray:
        from raylink.util import text_hash64

        col = batch.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            return col.to_numpy(zero_copy_only=False).astype(np.uint64)
        return text_hash64(col.to_pylist())

    def local_topk(batch: pa.Table, final: bool) -> pa.Table:
        if batch.num_rows == 0:
            out = batch
            ranks = np.empty(0, dtype=np.int64)
        else:
            key = _key_codes(batch)
            score = batch.column(score_col).to_numpy(zero_copy_only=False)
            # descending score: negate in the score's own domain (int64
            # negation is exact; the float cast would round above 2^53).
            # Unsigned dtypes go through int64 first — negating a uint
            # wraps and scrambles the order (values must be < 2^63).
            if np.issubdtype(score.dtype, np.unsignedinteger):
                score = score.astype(np.int64)
            neg = -score if np.issubdtype(score.dtype, np.integer) \
                else -score.astype(np.float64)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, neg, key))
            ks = key[order]
            seg = np.empty(len(ks), dtype=bool)
            seg[0] = True
            np.not_equal(ks[1:], ks[:-1], out=seg[1:])
            seg_ids = np.cumsum(seg) - 1
            starts = np.flatnonzero(seg)
            rank = np.arange(len(ks), dtype=np.int64) - starts[seg_ids]
            sel = order[rank < k]
            out = batch.take(pa.array(sel))
            ranks = rank[rank < k] + 1
        if not final:
            return out  # partial: ranks recomputed in the final pass
        return out.append_column("rk", pa.array(ranks))

    def tag(batch: pa.Table) -> pa.Table:
        t = local_topk(batch, final=False)
        if t.num_rows == 0:
            bcol = np.empty(0, dtype=np.int32)
        else:
            bcol = (splitmix64(_key_hash(t)) % B).astype(np.int32)
        return t.append_column("_b", pa.array(bcol))

    def final(group: pa.Table) -> pa.Table:
        return local_topk(group.drop_columns(["_b"]), final=True)

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(final, batch_format="pyarrow")
    )


def sample_k_per_group(ds, key_col: str, id_col: str, k: int, seed: int = 0,
                       num_buckets: int = 64):
    """Exactly ``min(k, |group|)`` uniformly-chosen rows per ``key_col``
    value — sampling as a composition of existing primitives: rank rows by
    the deterministic pseudo-random permutation ``splitmix64(id ^ seed)``
    (reinterpreted as two's-complement int64, descending) and take the
    per-group top-k. Replay/partitioning-invariant like
    ``stratified_sample`` (the hash IS the coin) but with an exact per-key
    count instead of a rate. Returns input columns + ``pri`` (the int64
    priority) + ``rk`` (1-based)."""
    sd = U64(np.uint64(seed))

    def pri(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        p = splitmix64(ids ^ sd).view(np.int64)
        return batch.append_column("pri", pa.array(p))

    return group_topk(
        ds.map_batches(pri, batch_format="pyarrow"),
        key_col=key_col, score_col="pri", k=k, id_col=id_col,
        num_buckets=num_buckets,
    )


def group_quantiles(ds, key_col: str, value_col: str, qs: list[float],
                    num_buckets: int = 64):
    """Exact per-key discrete quantiles via a distributed value HISTOGRAM
    -> Dataset (key_col, q:float64, value_col) with one row per (key, q).

    Right when the value domain is gridded (int lengths, scores, counts):
    per-batch (key, value, count) partials shrink the shuffle to distinct
    (key, value) pairs — the raw rows never move and never sort. All rows
    of a key land in one hash bucket group, where the quantile indices are
    read off the cumulative histogram fully vectorized across keys (the
    global-cumsum + per-key-offset searchsorted trick — no per-key loop).
    Quantile rule matches SQL ``quantile_disc`` exactly:
    ``sorted_values[ceil(q*n) - 1]`` (0-indexed), computed with the same
    double-precision ``q*n`` product on both engines.
    """
    if not qs or not all(0.0 < q <= 1.0 for q in qs):
        raise ValueError("qs must be in (0, 1]")
    B = np.uint64(num_buckets)
    qarr = np.asarray(sorted(qs), dtype=np.float64)

    def _khash(col) -> np.ndarray:
        from raylink.util import text_hash64

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            return col.to_numpy(zero_copy_only=False).astype(np.uint64)
        return text_hash64(col.to_pylist())

    def partial(batch: pa.Table) -> pa.Table:
        # key identity travels as the ORIGINAL column (string or int);
        # the hash is only the bucket route, so collisions cost nothing
        k = batch.column(key_col)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        kn = k.to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((v, kn))
        ks, vs = kn[order], v[order]
        new = np.empty(len(ks), dtype=bool)
        if len(ks):
            new[0] = True
            new[1:] = (ks[1:] != ks[:-1]) | (vs[1:] != vs[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(ks)))
        ku = k.take(pa.array(order[starts]))
        return pa.table(
            {
                "b": pa.array((splitmix64(_khash(ku)) % B).astype(np.int32)),
                "k": ku,
                "v": pa.array(vs[starts]),
                "c": pa.array(cnt.astype(np.int64)),
            }
        )

    def quantiles(group: pa.Table) -> pa.Table:
        karr = group.column("k")
        if isinstance(karr, pa.ChunkedArray):
            karr = karr.combine_chunks()
        k = karr.to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, k))
        ks, vs, cs = k[order], v[order], c[order]
        # merge duplicate (key, value) partials from different batches
        new = np.empty(len(ks), dtype=bool)
        new[0] = True
        new[1:] = (ks[1:] != ks[:-1]) | (vs[1:] != vs[:-1])
        seg = np.cumsum(new) - 1
        m = int(seg[-1]) + 1
        cm = np.zeros(m, dtype=np.int64)
        np.add.at(cm, seg, cs)
        km, vm = ks[new], vs[new]
        # per-key segments over the merged histogram
        knew = np.empty(m, dtype=bool)
        knew[0] = True
        knew[1:] = km[1:] != km[:-1]
        kstarts = np.flatnonzero(knew)
        nkeys = len(kstarts)
        csum = np.cumsum(cm)
        offsets = np.where(kstarts > 0, csum[kstarts - 1], 0)
        ends = np.append(kstarts[1:], m) - 1
        n_per_key = csum[ends] - offsets
        out_k, out_q, out_v = [], [], []
        for q in qarr:
            # DuckDB quantile_disc: 0-indexed ceil(q*n)-1, same double mul
            target = np.ceil(q * n_per_key).astype(np.int64) - 1
            g = np.searchsorted(csum, offsets + target, side="right")
            out_k.append(km[kstarts])  # sorted-order key per segment
            out_q.append(np.full(nkeys, q))
            out_v.append(vm[g])
        return pa.table(
            {
                key_col: pa.array(
                    np.concatenate(out_k).tolist(), type=karr.type
                ),
                "q": pa.array(np.concatenate(out_q)),
                value_col: pa.array(np.concatenate(out_v)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("b")
        .map_groups(quantiles, batch_format="pyarrow")
    )


def ordered_prefix_sum(ds, key_col: str, value_col: str, out_col: str = "prefix",
                       num_buckets: int = 256, carry_cols: dict | None = None):
    """EXCLUSIVE running sum of ``value_col`` in ascending-``key_col`` order
    -> Dataset (key_col, value_col, *carry_cols, out_col) — the distributed
    ``SUM(v) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING .. 1 PRECEDING)``.

    Shape (same family as ``ids.dense_id_remap`` but with RANGE buckets,
    since a prefix needs the global order, not just a bijection): two
    streaming passes over the input —

    1. min/max of the key (one aggregate) fix ``B`` equal-width key ranges;
       per-batch ``np.add.at`` partials -> a ``groupby('b').sum`` of B rows;
       the driver holds only the O(B) bucket totals and exclusive-scans them
       into offsets (``ray.put`` once).
    2. one ``groupby('b')`` shuffle co-locates each key range; inside a
       group: sort by key, cumsum, add the bucket offset.

    Keys must be UNIQUE (duplicate keys make "the previous row" undefined —
    same as SQL); asserted per bucket group. Equal-width ranges mean skewed
    key CLUSTERING concentrates rows in few buckets (ids clustered in 1% of
    the key span -> ~0.01*B useful buckets); dense or uniform ids — the id
    regimes this engine produces (``dense_id_remap``, ``hash_ids``) — fill
    all B evenly. int64 value sums are exact (no float accumulation).
    """
    import ray
    from ray.data.aggregate import Max, Min

    from raylink.join import tree_groupby_sum

    carry = dict(carry_cols or {})
    B = int(num_buckets)
    stats = ds.aggregate(Min(on=key_col), Max(on=key_col))  # one pass
    if stats is None or stats.get(f"min({key_col})") is None:
        # empty input: emit the documented output schema with zero rows
        import ray.data as rd

        sch = ds.schema(fetch_if_missing=True)

        def _typ(nm):
            try:
                return sch.base_schema.field(nm).type
            except Exception:
                return pa.int64()

        cols = {key_col: pa.array([], type=_typ(key_col)),
                value_col: pa.array([], type=_typ(value_col))}
        for nm in carry:
            cols[nm] = pa.array([], type=_typ(nm))
        cols[out_col] = pa.array([], type=pa.int64())
        return rd.from_arrow(pa.table(cols))
    kmin = int(stats[f"min({key_col})"])
    kmax = int(stats[f"max({key_col})"])
    # ceil-divide the span so bucket ids stay < B; uint64 arithmetic keeps
    # (kmax - kmin) safe for any int64 key pair
    span = np.uint64(np.int64(kmax) - np.int64(kmin)) + np.uint64(1)
    bsize = int((span + np.uint64(B) - np.uint64(1)) // np.uint64(B)) or 1

    def _bkt(k: np.ndarray) -> np.ndarray:
        return ((k.astype(np.int64) - kmin).astype(np.uint64)
                // np.uint64(bsize)).astype(np.int32)

    def bucket_sums(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = _bkt(k)
        s = np.zeros(B, dtype=np.int64)
        np.add.at(s, b, v)
        nz = np.flatnonzero(s)
        return pa.table({"b": pa.array(nz.astype(np.int32)),
                         "s": pa.array(s[nz])})

    hist = tree_groupby_sum(
        ds.map_batches(bucket_sums, batch_format="pyarrow"), ["b"], ["s"]
    ).to_pandas()
    totals = np.zeros(B, dtype=np.int64)
    if len(hist) and "b" in hist.columns:  # all-zero values -> no rows
        totals[hist["b"].to_numpy(np.int64)] = hist["sum(s)"].to_numpy(np.int64)
    offsets_ref = ray.put(np.concatenate([[0], np.cumsum(totals)[:-1]]))

    def tag(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        cols = {"b": pa.array(_bkt(k)), key_col: batch.column(key_col),
                value_col: batch.column(value_col)}
        for nm in carry:
            cols[nm] = batch.column(nm)
        return pa.table(cols)

    def scan(group: pa.Table) -> pa.Table:
        offsets = ray.get(offsets_ref)
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        v = group.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = int(group.column("b")[0].as_py())
        order = np.argsort(k, kind="stable")
        ks, vs = k[order], v[order]
        if len(ks) > 1 and (ks[1:] == ks[:-1]).any():
            raise ValueError(
                f"ordered_prefix_sum: duplicate {key_col} values (prefix "
                "order undefined, same as SQL ORDER BY with ties)"
            )
        prefix = np.empty(len(vs), dtype=np.int64)
        prefix[order] = offsets[b] + np.cumsum(vs) - vs  # exclusive
        cols = {key_col: group.column(key_col),
                value_col: group.column(value_col)}
        for nm in carry:
            cols[nm] = group.column(nm)
        cols[out_col] = pa.array(prefix)
        return pa.table(cols)

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("b")
        .map_groups(scan, batch_format="pyarrow")
    )


def latest_by_key(ds, key_col: str, order_col: str, id_col: str):
    """Keep the single newest row per ``key_col`` value: max ``order_col``,
    ties broken by ``id_col`` ASC (fully deterministic) — the crawl-dedup
    shape ("keep the latest capture per url") over any table. Returns the
    input columns unchanged, one row per distinct key.

    Shape: ``group_topk(k=1)`` on an int64 view of the order column — the
    per-batch pre-reduce means at most one row per key per batch reaches
    the single coarse-bucket shuffle; a key's winner is the winner of its
    per-batch winners. Timestamps order by their epoch integer (timezone
    is a display attribute; the stored instant is what compares)."""
    drop = ["_ord", "rk"]

    def ordv(batch: pa.Table) -> pa.Table:
        col = batch.column(order_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_timestamp(col.type):
            v = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        elif pa.types.is_floating(col.type):
            # int64-truncating a float order would silently reorder rows
            # (100.9 vs 100.2 both -> 100); demand an exact domain
            raise TypeError(
                "latest_by_key: float order_col would truncate — cast to "
                "timestamp or integer first"
            )
        else:
            v = col.to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("_ord", pa.array(v))

    top = group_topk(
        ds.map_batches(ordv, batch_format="pyarrow"),
        key_col=key_col, score_col="_ord", k=1, id_col=id_col,
    )
    return top.map_batches(
        lambda b: b.drop_columns(drop), batch_format="pyarrow"
    )


def pack_windows(ds, key_col: str, tokens_col: str, budget: int,
                 num_buckets: int = 256):
    """Token-bucket sharding for training-sequence packing: assign each
    document to the fixed-token-budget shard its EXCLUSIVE running token
    total lands in (ascending ``key_col`` order) -> Dataset
    (key_col, tokens_col, shard:int64).

    ``shard = floor(prefix / budget)`` — the streaming equivalent of
    concatenate-in-order-and-cut-every-``budget``-tokens; a document
    straddling a boundary belongs to the shard it STARTS in (documents are
    never split; consumers pad or wrap). SQL-exact: integer division of the
    window prefix sum.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    pref = ordered_prefix_sum(ds, key_col, tokens_col, out_col="_p",
                              num_buckets=num_buckets)

    def fin(batch: pa.Table) -> pa.Table:
        p = batch.column("_p").to_numpy(zero_copy_only=False)
        return pa.table(
            {key_col: batch.column(key_col),
             tokens_col: batch.column(tokens_col),
             "shard": pa.array(p // np.int64(budget))}
        )

    return pref.map_batches(fin, batch_format="pyarrow")


def chunk_docs(docs_ds, chunk: int = 64, overlap: int = 16):
    """Fixed-size word chunking with overlap — the RAG / pretraining
    chunker: each doc's ``[a-z]+`` words (the shared ``WORD_PATTERN`` rule)
    split into windows of ``chunk`` words starting every ``chunk - overlap``
    words -> Dataset (doc_id, chunk_idx, chunk_text, n_tokens). Chunk
    starts are 0, C-O, 2(C-O), ... while start < n_words (the final chunk
    may be short); 0-word docs yield no rows. Deterministic and exactly
    SQL-mirrorable (list slicing + generate_series).

    Shape: map-only and shuffle-free — a doc is whole within its batch, so
    every chunk assembles locally: word occurrences explode to (chunk,
    word) pairs (each word lands in <= ceil(C/(C-O)) chunks), then one
    vectorized ListArray re-join per batch. 100-TB note: output size is
    input x ~C/(C-O); the stage streams and never holds more than a batch.
    """
    import pyarrow.compute as pc

    from raylink.ops.textstats import _word_codes

    if not (0 <= overlap < chunk):
        raise ValueError("require 0 <= overlap < chunk")
    step = chunk - overlap

    def chunks(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        doc_idx, codes, dic = _word_codes(text)
        if len(doc_idx) == 0:  # every doc wordless -> no chunk rows
            return pa.table(
                {"doc_id": pa.array([], type=batch.column("doc_id").type),
                 "chunk_idx": pa.array([], type=pa.int64()),
                 "chunk_text": pa.array([], type=pa.string()),
                 "n_tokens": pa.array([], type=pa.int64())}
            )
        n = len(batch)
        n_words = np.bincount(doc_idx, minlength=n)
        # word position within its doc
        starts_doc = np.r_[0, np.cumsum(n_words)[:-1]]
        pos = np.arange(len(doc_idx), dtype=np.int64) - starts_doc[doc_idx]
        # chunks containing word at pos p: k in [ceil((p-C+1)/step), p//step]
        k_lo = np.maximum(-(-(pos - chunk + 1) // step), 0)
        k_hi = pos // step  # inclusive; start k*step <= pos always valid
        reps = (k_hi - k_lo + 1).astype(np.int64)
        w_rep = np.repeat(np.arange(len(doc_idx), dtype=np.int64), reps)
        offs = np.cumsum(reps) - reps
        k_of = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(offs, reps) \
            + np.repeat(k_lo, reps)
        d_of = doc_idx[w_rep]
        # order rows by (doc, chunk, pos): w_rep is pos-ordered per doc, so a
        # stable sort on (doc, chunk) keeps word order inside each chunk
        order = np.lexsort((w_rep, k_of, d_of))
        d_s, k_s, w_s = d_of[order], k_of[order], w_rep[order]
        seg = np.r_[True, (d_s[1:] != d_s[:-1]) | (k_s[1:] != k_s[:-1])]
        seg_id = np.cumsum(seg) - 1
        seg_len = np.bincount(seg_id)
        words = dic.take(pa.array(codes[w_s]))
        la = pa.LargeListArray.from_arrays(
            pa.array(np.r_[np.int64(0), np.cumsum(seg_len)], type=pa.int64()),
            words,
        )
        joined = pc.binary_join(la, pa.scalar(" ", type=words.type))
        first = np.flatnonzero(seg)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").take(pa.array(d_s[first])),
                "chunk_idx": pa.array(k_s[first]),
                "chunk_text": pc.cast(joined, pa.string()),
                "n_tokens": pa.array(seg_len.astype(np.int64)),
            }
        )

    return docs_ds.map_batches(chunks, batch_format="pyarrow")


def table_profile(ds, num_cols: list[str]):
    """Data-quality profile of numeric columns -> Dataset
    (column, n, n_null, min, max) — the pre-training validation pass (row
    counts, null rates, range sanity) as one streaming scan: per-batch
    partials (one tiny row per column per batch), a single-block combine.
    min/max are exact for any numeric type (carried as float64)."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        names, ns, nulls, mns, mxs = [], [], [], [], []
        for c in num_cols:
            col = batch.column(c)
            names.append(c)
            ns.append(len(col))
            nulls.append(col.null_count)
            v = col.drop_null()
            mns.append(
                float(pc.min(v).as_py()) if len(v) else np.inf
            )
            mxs.append(
                float(pc.max(v).as_py()) if len(v) else -np.inf
            )
        return pa.table(
            {
                "column": pa.array(names, type=pa.string()),
                "n": pa.array(np.array(ns, dtype=np.int64)),
                "n_null": pa.array(np.array(nulls, dtype=np.int64)),
                "mn": pa.array(np.array(mns, dtype=np.float64)),
                "mx": pa.array(np.array(mxs, dtype=np.float64)),
            }
        )

    def combine(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        agg = df.groupby("column", sort=True).agg(
            n=("n", "sum"), n_null=("n_null", "sum"),
            mn=("mn", "min"), mx=("mx", "max"),
        ).reset_index()
        # an all-null column never left the +-inf sentinels: report NULL
        # (what SQL min()/max() return), never inf bounds with min > max
        allnull = agg["n"].to_numpy(np.int64) == agg["n_null"].to_numpy(np.int64)
        mn = agg["mn"].to_numpy(np.float64)
        mx = agg["mx"].to_numpy(np.float64)
        return pa.table(
            {
                "column": pa.array(agg["column"], type=pa.string()),
                "n": pa.array(agg["n"].to_numpy(np.int64)),
                "n_null": pa.array(agg["n_null"].to_numpy(np.int64)),
                "min": pa.array(
                    [None if a else float(v) for a, v in zip(allnull, mn)],
                    type=pa.float64(),
                ),
                "max": pa.array(
                    [None if a else float(v) for a, v in zip(allnull, mx)],
                    type=pa.float64(),
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(combine, batch_format="pyarrow", batch_size=None)
    )


def dataset_checksum(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """Order-invariant content checksum -> one row (n_rows, checksum):
    checksum = XOR over rows of splitmix64(fnv1a(text) XOR uint64(id)) —
    the integrity check for resumable pipelines (same rows in any order /
    partitioning produce the same value; any changed, dropped or
    duplicated-an-even-number-of-times row flips it). Per-batch XOR
    partials, one single-block fold; mirrored bit-for-bit in SQL
    (bit_xor)."""
    from raylink.util import splitmix64, text_hash64

    def partial(batch: pa.Table) -> pa.Table:
        h = text_hash64(batch.column(text_col))
        i = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        x = np.bitwise_xor.reduce(splitmix64(h ^ i)) if len(h) else np.uint64(0)
        return pa.table(
            {
                "n": pa.array([len(h)], type=pa.int64()),
                "x": pa.array([np.int64(x.astype(np.int64))]),
            }
        )

    def fold(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        x = batch.column("x").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_rows": pa.array([int(n.sum())], type=pa.int64()),
                "checksum": pa.array(
                    [np.int64(np.bitwise_xor.reduce(x.view(np.uint64)).astype(np.int64))]
                ),
            }
        )

    return (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(fold, batch_format="pyarrow", batch_size=None)
    )


SPLIT_NAMES = ("train", "val", "test")


def train_split(ds, id_col: str = "doc_id", by: str = "source",
                chars_col: str = "n_chars", seed: int = 0,
                bounds: tuple = (80, 90)):
    """Deterministic mutually-exclusive train/val/test assignment per row
    (the dataset-versioning step before training-data packing): a row's
    split is decided by splitmix64(uint64(id) ^ seed) % 100 —
    < bounds[0] -> train, < bounds[1] -> val, else test — so the
    assignment is reproducible under any partitioning/replay (the hash IS
    the coin) and a doc never leaks across splits between runs. -> Dataset
    (<by>, split, n_docs, sum_chars) — the per-stratum audit table; the
    assignment itself is a pure per-batch map, no shuffle, and the audit
    aggregate is a bounded combine tree (cells <= n_strata * 3). Mirrored
    bit-for-bit in SQL by ``oracles_sql.train_split_sql``."""
    from raylink.join import tree_groupby_sum

    sd = U64(np.uint64(seed))
    lo, hi = int(bounds[0]), int(bounds[1])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        r = (splitmix64(ids ^ sd) % np.uint64(100)).astype(np.int64)
        code = np.where(r < lo, 0, np.where(r < hi, 1, 2)).astype(np.int64)
        by_col = batch.column(by)
        if isinstance(by_col, pa.ChunkedArray):
            by_col = by_col.combine_chunks()
        enc = by_col.dictionary_encode()
        bcode = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ch = batch.column(chars_col).to_numpy(zero_copy_only=False).astype(np.int64)
        key = bcode * 3 + code
        ng = len(enc.dictionary) * 3
        cnt = np.bincount(key, minlength=ng).astype(np.int64)
        s = np.zeros(ng, dtype=np.int64)
        np.add.at(s, key, ch)
        keep = cnt > 0
        idx = np.nonzero(keep)[0]
        return pa.table(
            {
                by: enc.dictionary.take(pa.array(idx // 3)),
                "split": pa.array([SPLIT_NAMES[i % 3] for i in idx],
                                  type=pa.string()),
                "n_docs": pa.array(cnt[idx]),
                "sum_chars": pa.array(s[idx]),
            }
        )

    agg = tree_groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        [by, "split"], ["n_docs", "sum_chars"],
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                by: b.column(by),
                "split": b.column("split"),
                "n_docs": b.column("sum(n_docs)"),
                "sum_chars": b.column("sum(sum_chars)"),
            }
        ),
        batch_format="pyarrow",
    )
