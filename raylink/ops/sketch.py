"""Mergeable sketches for crawl-scale cardinality estimation.

At 10^12 documents, exact ``COUNT(DISTINCT token)`` is an all-to-all shuffle
of the full vocabulary; a HyperLogLog register table is 2^p integers that
merge with elementwise MAX — one bounded-cardinality groupby, no vocabulary
ever shuffles. This is the "novel sketch as a custom operator" row of the
builder brief: partial registers per batch (map-only), MAX-merge groupby
(2^p rows), estimate from the merged table.

Everything is bit-exactly SQL-mirrorable (oracles_sql.distinct_hll_sql):
the item hash is splitmix64(FNV-1a(word)) — the same mirrored kernels every
dedup oracle uses — and the register sum is carried as an INTEGER
(sum of 2^(32 - min(rank,32)) <= 2^44, exact in int64/pandas), so the only
float ops are the final estimate expression, written as the identical IEEE
sequence on both sides and rounded.

Reference analog: none (the reference has no sketches); the operator shape
follows the public HyperLogLog paper (Flajolet et al. 2007) with the
standard linear-counting small-range correction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.util import splitmix64, text_hash64

RANK_CAP = 32  # T = 2^(32 - min(rank, 32)): keeps the register sum exact int64


def _bitlen_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized bit length of uint64 (0 -> 0). Integer-only (float log2
    is unsafe above 2^53)."""
    bl = np.zeros(w.shape, dtype=np.int64)
    v = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(shift))
        bl[m] += shift
        v[m] >>= np.uint64(shift)
    bl[w > 0] += 1
    return bl


def hll_ranks(hashes: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hashes -> (register int64, rank int64). Register = low p bits;
    rank = 1 + leading-zero count of the remaining 64-p bits (1..64-p+1)."""
    h = hashes.astype(np.uint64, copy=False)
    reg = (h & np.uint64((1 << p) - 1)).astype(np.int64)
    w = h >> np.uint64(p)
    rank = (64 - p) - _bitlen_u64(w) + 1
    return reg, rank


class HllWordsPartial:
    """Actor-pool map_batches stage: documents batch -> per-batch register
    partial (reg, rank) with at most 2^p rows — the shuffle after this
    stage is bounded by 2^p * n_blocks regardless of corpus size."""

    def __init__(self, p: int = 12, column: str = "text") -> None:
        self.p = p
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        from raylink.ops.textstats import _word_codes
        import pyarrow.compute as pc

        text = pc.fill_null(batch.column(self.column).combine_chunks(), "")
        _, _, dictionary = _word_codes(text)
        if len(dictionary) == 0:
            return pa.table({"reg": pa.array([], type=pa.int64()),
                             "rank": pa.array([], type=pa.int64())})
        h = splitmix64(text_hash64(dictionary))
        reg, rank = hll_ranks(h, self.p)
        m = 1 << self.p
        regmax = np.zeros(m, dtype=np.int64)
        np.maximum.at(regmax, reg, rank)
        nz = np.flatnonzero(regmax)
        return pa.table({"reg": pa.array(nz, type=pa.int64()),
                         "rank": pa.array(regmax[nz], type=pa.int64())})


def hll_estimate_from_registers(max_ranks: np.ndarray, p: int) -> dict:
    """Merged register table (len 2^p, 0 = empty) -> estimate fields.

    The register sum is integer-exact: S = sum 2^(RANK_CAP - min(rank, CAP))
    (<= 2^(p + RANK_CAP), exact in int64 for p <= 30). The estimate is the
    standard HLL formula with linear counting below 2.5m; the float
    expression order matches distinct_hll_sql token for token."""
    m = 1 << p
    capped = np.minimum(max_ranks, RANK_CAP)
    sum_t = int((np.int64(1) << (RANK_CAP - capped)).sum())
    n_zero = int((max_ranks == 0).sum())
    est = (
        0.7213 / (1.0 + 1.079 / m) * m * m * float(1 << RANK_CAP) / sum_t
    )
    if est <= 2.5 * m and n_zero > 0:
        est = m * float(np.log(m / n_zero))
    from raylink.util import round_half_away

    return {
        "n_registers": m,
        "n_zero": n_zero,
        "sum_t": sum_t,
        "distinct_est": float(round_half_away(est, 6)),
    }


GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def bloom_positions(gh: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n,) uint64 gram hashes -> (n, k) int64 bit positions:
    pos_j = splitmix64(gh XOR j*GOLDEN) & (2^m_bits - 1). Mirrored
    bit-for-bit in SQL (bloom_decontaminate_sql)."""
    mask = np.uint64((1 << m_bits) - 1)
    out = np.empty((len(gh), k), dtype=np.int64)
    with np.errstate(over="ignore"):  # j*GOLDEN wraps mod 2^64 by design
        for j in range(k):
            out[:, j] = (
                splitmix64(gh ^ (np.uint64(j) * GOLDEN)) & mask
            ).astype(np.int64)
    return out


def bloom_decontaminate(docs_ds, bench_ds, n: int = 8, m_bits: int = 16,
                        k: int = 4):
    """Benchmark decontamination through a Bloom filter — the
    BOUNDED-broadcast variant of ``ops.dedup.decontaminate``.

    The exact pass broadcasts the benchmark's distinct gram hashes
    (unbounded: grows with the eval suite); this broadcasts a FIXED 2^m_bits
    bitset (64 KiB at m_bits=19) no matter how large the suite gets — the
    trade is a documented false-positive rate (1-e^(-k*n/m))^k, and Bloom
    FPs only ever OVER-flag (safe direction for decontamination).

    Every probe position is a mirrored hash (FNV-1a gram -> splitmix64 with
    per-probe XOR constants), so the SQL oracle reproduces the EXACT output
    including which grams false-positive — the sketch itself is under the
    correctness gate, not just its happy path.

    Build side: distinct bench gram hashes (distributed) -> positions ->
    distinct positions (bounded by 2^m_bits rows) -> driver bitset ->
    ``ray.put``. Scan side: shuffle-free map_batches membership test.
    Returns Dataset (doc_id, n_grams, n_bloom_hits, contaminated_bloom).
    """
    import pyarrow as pa
    import ray

    from raylink.ops.dedup import _gram_hashes

    m = 1 << m_bits

    def bench_pos(batch: pa.Table) -> pa.Table:
        gh, _ = _gram_hashes(batch.column("text").to_pylist(), n)
        pos = bloom_positions(np.unique(gh), k, m_bits)
        return pa.table({"pos": pa.array(np.unique(pos))})

    distinct_pos = (
        bench_ds.map_batches(bench_pos, batch_format="pyarrow")
        .groupby("pos")
        .count()
    )
    bits = np.zeros(m, dtype=bool)
    for r in distinct_pos.select_columns(["pos"]).take_all():  # <= 2^m_bits
        bits[int(r["pos"])] = True
    ref = ray.put(bits)

    def scan(batch: pa.Table) -> pa.Table:
        filt = ray.get(ref)
        texts = batch.column("text").to_pylist()
        gh, counts = _gram_hashes(texts, n)
        if len(gh):
            pos = bloom_positions(gh, k, m_bits)
            hit = filt[pos].all(axis=1)
        else:
            hit = np.zeros(0, dtype=bool)
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        n_hits = np.bincount(doc_idx[hit], minlength=len(texts)).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_grams": pa.array(counts),
                "n_bloom_hits": pa.array(n_hits),
                "contaminated_bloom": pa.array(n_hits > 0),
            }
        )

    return docs_ds.map_batches(scan, batch_format="pyarrow")


def hll_distinct_words(ds, p: int = 12, column: str = "text",
                       concurrency=(1, 4)) -> pa.Table:
    """Distinct-[a-z]+-word estimate over a documents Dataset.

    pipeline: map_batches partial (<= 2^p rows out per block) ->
    groupby(reg).max(rank) (bounded 2^p-row shuffle) -> driver estimate
    from the 2^p-row merged table (O(2^p) driver pull — the sketch, not
    the data). Returns a 1-row pyarrow Table."""
    partials = ds.map_batches(
        HllWordsPartial,
        fn_constructor_kwargs={"p": p, "column": column},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    merged = partials.groupby("reg").max("rank")
    rows = merged.take_all()  # <= 2^p rows by construction
    max_ranks = np.zeros(1 << p, dtype=np.int64)
    for r in rows:
        max_ranks[int(r["reg"])] = int(r["max(rank)"])
    f = hll_estimate_from_registers(max_ranks, p)
    return pa.table({k: pa.array([v]) for k, v in f.items()})


def cms_word_topk(docs_ds, k: int = 50, depth: int = 4, width_bits: int = 12):
    """Count-min-sketch word-frequency estimation: the depth x 2^width_bits
    register table is built DISTRIBUTED (per-batch register partials ->
    one bounded combine over <= depth * 2^width_bits rows — the sketch
    never grows with the corpus), then the exact top-k tokens (the
    ``token_topk`` dataflow) are reported with their CMS estimates ->
    Dataset (token, cnt, est). ``est >= cnt`` always (the CMS one-sided
    error); ``est - cnt`` is the hash-collision overcount. Register
    position j of word w = splitmix64(fnv1a(w) XOR j*GOLDEN) &
    (2^width_bits - 1) — the shared bloom probe scheme
    (``bloom_positions``), mirrored bit-for-bit in SQL (cms_topk_sql).

    At 100 TB: the registers are the ONLY reduced state (depth * 2^b int64
    = 128 KiB at the defaults), collected once (bounded by sketch size, the
    HLL precedent) and ``ray.put``-broadcast for the estimate pass — any
    candidate word set can then be estimated with zero vocabulary shuffle.
    """
    import pyarrow.compute as pc
    import ray

    from raylink.join import tree_groupby_sum
    from raylink.ops.textstats import _word_codes, token_topk
    from raylink.util import text_hash64

    size = depth << width_bits
    jbase = np.arange(depth, dtype=np.int64) << width_bits  # row offsets

    def reg_partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        _, codes, dic = _word_codes(text)
        cnt = np.bincount(codes, minlength=len(dic)).astype(np.int64)
        wh = text_hash64(pc.cast(dic, pa.string()))
        pos = bloom_positions(wh, depth, width_bits)  # (V, depth)
        flat = (pos + jbase).ravel(order="F")  # j-major
        r = np.zeros(size, dtype=np.int64)
        np.add.at(r, flat, np.tile(cnt, depth))
        nz = np.flatnonzero(r)
        return pa.table({"r": pa.array(nz), "cnt": pa.array(r[nz])})

    regs = tree_groupby_sum(
        docs_ds.map_batches(reg_partial, batch_format="pyarrow"), ["r"], ["cnt"]
    )
    reg = np.zeros(size, dtype=np.int64)
    for row in regs.take_all():  # <= depth * 2^width_bits rows by construction
        reg[int(row["r"])] = int(row["sum(cnt)"])
    ref = ray.put(reg)

    def estimate(batch: pa.Table) -> pa.Table:
        r = ray.get(ref)
        wh = text_hash64(batch.column("token"))
        pos = bloom_positions(wh, depth, width_bits)  # (n, depth)
        est = r[pos + jbase].min(axis=1)
        return pa.table(
            {
                "token": batch.column("token"),
                "cnt": batch.column("cnt"),
                "est": pa.array(est),
            }
        )

    return token_topk(docs_ds, k).map_batches(estimate, batch_format="pyarrow")


def hll_grouped_distinct_words(
    ds,
    key_col: str,
    p: int = 8,
    text_col: str = "text",
    num_buckets: int = 32,
):
    """Per-KEY HyperLogLog distinct-word estimates — the grouped sibling
    of ``hll_distinct_words`` (e.g. vocabulary richness per crawl host:
    exact per-host COUNT(DISTINCT word) shuffles the full per-host
    vocabulary; this shuffles at most ``n_keys x 2^p`` register rows).

    Per batch: key strings dictionary-encode, word occurrences come from
    the shared Arrow extractor (``textstats._word_codes``), item hash =
    splitmix64(FNV-1a(word)) — the same mirrored kernels as every sketch
    — and per-(key, register) maxima accumulate SPARSELY (sort + run
    maxima over the occurrence rows — no dense keys x 2^p matrix, so key
    cardinality is unbounded), so the shuffle carries only nonzero
    (key, reg, rank) partials. One
    coarse-bucket groupby (bucketed by FNV of the key string — all rows
    of one key in one group) MAX-merges and emits per-key estimate rows.

    Returns Dataset ``(key_col, n_zero, sum_t, distinct_est)`` with the
    integer register sum exact and the estimate expression identical to
    ``hll_estimate_from_registers`` (register-exactly SQL-mirrorable).
    """
    import pyarrow.compute as pc

    from raylink.ops.textstats import _word_codes
    from raylink.util import round_half_away, text_hash64

    m = 1 << p
    B = np.uint64(num_buckets)

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column(text_col).combine_chunks(), "")
        keys = batch.column(key_col).combine_chunks().dictionary_encode()
        kcodes = keys.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        kdict = keys.dictionary
        nk = len(kdict)
        if nk == 0:
            return pa.table(
                {"kb": pa.array([], type=pa.int32()),
                 key_col: pa.array([], type=pa.string()),
                 "reg": pa.array([], type=pa.int64()),
                 "rank": pa.array([], type=pa.int64())}
            )
        doc_idx, codes, dictionary = _word_codes(text)
        kh = splitmix64(text_hash64(kdict))
        if len(codes):
            wh = splitmix64(text_hash64(dictionary))
            reg, rank = hll_ranks(wh, p)
            key2 = kcodes[doc_idx] * m + reg[codes]
            rk = rank[codes]
            order = np.lexsort((rk, key2))
            k2, r2 = key2[order], rk[order]
            starts = np.flatnonzero(np.r_[True, k2[1:] != k2[:-1]])
            ends = np.r_[starts[1:], len(k2)] - 1  # rank asc -> max last
            ki = k2[starts] // m
            regs = (k2[starts] % m).astype(np.int64)
            ranks = r2[ends]
        else:
            ki = np.empty(0, dtype=np.int64)
            regs = np.empty(0, dtype=np.int64)
            ranks = np.empty(0, dtype=np.int64)
        # keys with NO words still get a presence row (rank 0 — dropped
        # from the register merge but keeping the key in the output with
        # distinct_est = 0.0, like the ungrouped sibling)
        silent = np.setdiff1d(np.arange(nk, dtype=np.int64), ki)
        if len(silent):
            ki = np.concatenate([ki, silent])
            regs = np.concatenate([regs, np.zeros(len(silent), np.int64)])
            ranks = np.concatenate([ranks, np.zeros(len(silent), np.int64)])
        return pa.table(
            {
                "kb": pa.array(((kh[ki] % B)).astype(np.int32)),
                key_col: kdict.take(pa.array(ki)),
                "reg": pa.array(regs),
                "rank": pa.array(ranks),
            }
        )

    def reduce_group(group: pa.Table) -> pa.Table:
        keys = group.column(key_col).combine_chunks().dictionary_encode()
        kcodes = keys.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        kdict = keys.dictionary
        nk = len(kdict)
        reg = group.column("reg").to_numpy(zero_copy_only=False)
        rank = group.column("rank").to_numpy(zero_copy_only=False)
        live = rank > 0  # rank-0 presence rows carry the key only
        key2 = kcodes[live] * m + reg[live]
        rklive = rank[live]
        order = np.lexsort((rklive, key2))
        k2, r2 = key2[order], rklive[order]
        if len(k2):
            starts = np.flatnonzero(np.r_[True, k2[1:] != k2[:-1]])
            ends = np.r_[starts[1:], len(k2)] - 1
            ki = k2[starts] // m
            mx = r2[ends]
        else:
            ki = np.empty(0, dtype=np.int64)
            mx = np.empty(0, dtype=np.int64)
        nnz = np.bincount(ki, minlength=nk)
        capped = np.minimum(mx, RANK_CAP)
        sum_t = np.full(nk, 0, dtype=np.int64)
        np.add.at(sum_t, ki, np.int64(1) << (RANK_CAP - capped))
        sum_t += (m - nnz) * (np.int64(1) << RANK_CAP)
        n_zero = (m - nnz).astype(np.int64)
        raw = 0.7213 / (1.0 + 1.079 / m) * m * m * float(1 << RANK_CAP) / sum_t
        lin = np.zeros(nk)
        nzpos = n_zero > 0
        lin[nzpos] = m * np.log(m / n_zero[nzpos])
        est = np.where((raw <= 2.5 * m) & nzpos, lin, raw)
        return pa.table(
            {
                key_col: kdict,
                "n_zero": pa.array(n_zero),
                "sum_t": pa.array(sum_t),
                "distinct_est": pa.array(round_half_away(est, 6)),
            }
        )

    from raylink.join import with_typed_empty

    return with_typed_empty(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(reduce_group, batch_format="pyarrow"),
        {key_col: pa.string(), "n_zero": pa.int64(), "sum_t": pa.int64(),
         "distinct_est": pa.float64()},
    )
