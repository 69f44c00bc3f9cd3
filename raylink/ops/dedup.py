"""Deduplication operators over the ``documents`` table.

Five families, each the standard large-scale construction (exact dedup =
hash-partition + per-group first; MinHash-LSH = shingle -> minhash -> band ->
bucket groupby -> verify; SimHash banding; n-gram Jaccard self-join;
embedding-cosine near-dup), expressed as Ray Data pipelines:

- ``exact_dedup``      : md5-keyed groupby, keep min doc_id (SQL-checkable).
- ``ngram_pairs``      : exact word-n-gram Jaccard >= tau via a gram-keyed
  pair-generation groupby (SQL-checkable). Hot grams (document frequency >
  ``max_df``) are dropped on BOTH sides — the standard DF cut that bounds the
  per-gram pair blowup at scale.
- ``minhash_pairs``    : b bands x r rows LSH candidates + exact verify.
- ``simhash_pairs``    : 64-bit simhash, 4x16-bit band candidates + exact
  hamming verify.
- ``embedding_pairs`` / in ``similarity.py``: cosine near-dup.

Shingling/minhash state (hash coefficients) is built once per actor
(callable classes). Candidate verification is fully distributed: per-doc
values (signatures / gram sets / set sizes) are joined onto the candidate
pair keys by ``_pair_attach`` — two coarse-bucket shuffles (by doc id, then
by pair key), no dataset-sized driver materialization anywhere — and each
pair is verified vectorized inside ``map_batches``.

Pair keys are bit-packed ``(a << 32) | b`` throughout, so doc ids MUST be in
``[0, 2**32)`` (same contract as ``raylink.algos.triangles``); the bucket
stages assert it once per group.

Ordering contract for chained dedup (standard crawl-curation practice): run
``exact_dedup`` FIRST. Near-dup pair generation is quadratic in the copy
count of exactly-duplicated texts (every copy pair shares every shingle/
band), so mass exact duplication must be removed before the n-gram/LSH
stages; ``max_df`` additionally caps any single shingle's contribution.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from raylink.util import assert_packable, round_half_away, text_hash64, unpack_hi

WORD_RE = re.compile(r"[a-z0-9]+")

MERSENNE = (1 << 61) - 1


def _assert_packable(ids: np.ndarray) -> None:
    """Pair keys are (a<<32)|b — the shared util guard (one home for the
    contract and its dense_id_remap pointer)."""
    assert_packable(ids, "dedup pair generation doc_id")


def _grams_of(text: str, n: int) -> set:
    ws = WORD_RE.findall((text or "").lower())
    if len(ws) < n:
        return set()
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def _gram_lists(texts, n: int) -> list[list[str]]:
    """Per-doc shingle LISTS (duplicates kept — min/unique downstream are
    dup-invariant). Kept as the readable reference for ``_gram_hashes``;
    used only by tests/oracles now."""
    out = []
    for t in texts:
        ws = WORD_RE.findall((t or "").lower())
        out.append(
            [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
            if len(ws) >= n
            else []
        )
    return out


def _gram_hashes(texts, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(gram FNV-1a hashes for every shingle of every doc, per-doc counts).

    The shingle string "w1 w2 ... wn" is a SUBSTRING of the doc's
    space-joined normalized word list, so each gram is hashed as a byte
    RANGE over one per-doc buffer (``util.fnv1a_ranges``) — no per-gram
    python string is ever constructed (the former ``" ".join`` per shingle
    was the hot path's dominant allocator churn). WORD_RE matches only
    ascii [a-z0-9], so byte offsets == char offsets. Bit-identical to
    hashing ``_gram_lists`` output (property-tested)."""
    from raylink.util import fnv1a_ranges

    chunks: list[bytes] = []
    starts_all: list[np.ndarray] = []
    lens_all: list[np.ndarray] = []
    counts = np.zeros(len(texts), dtype=np.int64)
    off = 0
    for di, t in enumerate(texts):
        ws = WORD_RE.findall((t or "").lower())
        if len(ws) < n:
            continue
        norm = " ".join(ws)
        b = norm.encode("ascii")
        wlens = np.fromiter((len(w) for w in ws), dtype=np.int64, count=len(ws))
        wstarts = np.zeros(len(ws), dtype=np.int64)
        np.cumsum(wlens[:-1] + 1, out=wstarts[1:])
        g = len(ws) - n + 1
        gs = wstarts[:g]
        glens = wstarts[n - 1 :] + wlens[n - 1 :] - gs
        starts_all.append(gs + off)
        lens_all.append(glens)
        counts[di] = g
        chunks.append(b)
        off += len(b)
    if not chunks:
        return np.empty(0, dtype=np.uint64), counts
    data = np.frombuffer(b"".join(chunks), dtype=np.uint8)
    gh = fnv1a_ranges(
        data, np.concatenate(starts_all), np.concatenate(lens_all)
    )
    return gh, counts


# distributed pair-value join lives in raylink.join (shared with the
# similarity ops and the graph-side degree/label attaches)
from raylink.join import pair_attach as _pair_attach  # noqa: E402
from raylink.join import with_typed_empty as _with_typed_empty  # noqa: E402


# ------------------------------------------------------------------ exact
def exact_dedup(docs_ds):
    """-> Dataset (keep_id, n_dups): one row per distinct text content."""

    def add_hash(batch: pa.Table) -> pa.Table:
        h = [hashlib.md5((t or "").encode()).hexdigest() for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"), "h": pa.array(h)})

    def bucketize(batch: pa.Table) -> pa.Table:
        # coarse buckets: one shuffle group per bucket, NOT per distinct hash
        # (a per-key groupby would spawn one task per unique document)
        h = batch.column("h").to_pylist()
        b = np.array([int(x[:8], 16) % 64 for x in h], dtype=np.int32)
        return batch.append_column("b", pa.array(b))

    def per_bucket(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        hs = np.array(group.column("h").to_pylist())
        order = np.lexsort((ids, hs))
        ids, hs = ids[order], hs[order]
        first = np.r_[True, hs[1:] != hs[:-1]]
        seg = np.cumsum(first) - 1
        counts = np.bincount(seg)
        return pa.table(
            {
                "keep_id": pa.array(ids[first]),
                "n_dups": pa.array(counts.astype(np.int64)),
            }
        )

    return (
        docs_ds.map_batches(add_hash, batch_format="pyarrow")
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


# ------------------------------------------------------------------ n-gram
class _Shingler:
    """(doc_id, text) batch -> one row per DISTINCT shingle per doc, as its
    64-bit FNV hash (``gh``). Gram identity is its hash from the start —
    the gram strings themselves never leave the stage (they were only ever
    hashed downstream; shipping them through the shuffle was pure waste).
    Same negligible-collision assumption documented at ``ngram_pairs``."""

    def __init__(self, n: int):
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        gh, counts = _gram_hashes(batch.column("text").to_pylist(), self.n)
        bounds = np.r_[0, np.cumsum(counts)]
        uniq = [np.unique(gh[bounds[i] : bounds[i + 1]]) for i in range(len(ids))]
        ulens = np.fromiter((len(u) for u in uniq), dtype=np.int64, count=len(uniq))
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, ulens)),
                "gh": pa.array(
                    (np.concatenate(uniq) if len(uniq) else np.empty(0, np.uint64))
                    .astype(np.int64)
                ),
            }
        )


def ngram_pairs(docs_ds, n: int = 3, tau: float = 0.5, max_df: int | None = None,
                metric: str = "jaccard"):
    """Exact n-gram set-similarity pairs -> Dataset (doc_a, doc_b, <metric> r6).

    metric="jaccard": |A n B| / |A u B|; metric="containment":
    |A n B| / min(|A|, |B|) — the asymmetric-duplication signal (a short
    doc quoted wholesale inside a long one scores ~1.0 where Jaccard
    stays low). max_df: drop grams appearing in more than max_df docs
    (DF cut; must be mirrored in any oracle)."""
    if metric not in ("jaccard", "containment"):
        raise ValueError(f"unknown metric {metric!r}")
    grams = docs_ds.map_batches(_Shingler(n), batch_format="pyarrow")

    def add_bucket(batch: pa.Table) -> pa.Table:
        # gram-hash coarse buckets: all rows of one gram land in one bucket,
        # but one shuffle group serves many grams (per-gram map_groups would
        # spawn one task per distinct shingle). Gram identity is its 64-bit
        # FNV hash — collision probability ~(n_grams^2)/2^65, negligible below
        # ~1e8 distinct shingles (documented assumption).
        gh = batch.column("gh").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "gh": batch.column("gh"),
                "b": pa.array((gh % np.uint64(64)).astype(np.int32)),
            }
        )

    def per_bucket_pairs(group: pa.Table) -> pa.Table:
        gh = group.column("gh").to_numpy(zero_copy_only=False)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        _assert_packable(ids)
        order = np.lexsort((ids, gh))
        gh, ids = gh[order], ids[order]
        starts = np.flatnonzero(np.r_[True, gh[1:] != gh[:-1]])
        ends = np.r_[starts[1:], len(gh)]
        keys = []
        for st, en in zip(starts, ends):
            d = en - st
            if d < 2 or (max_df is not None and d > max_df):
                continue
            docs = np.unique(ids[st:en])
            if len(docs) < 2:
                continue
            ii, jj = np.triu_indices(len(docs), k=1)
            keys.append((docs[ii] << np.int64(32)) | docs[jj])
        if not keys:
            return pa.table({"key": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        key, c = np.unique(np.concatenate(keys), return_counts=True)
        return pa.table({"key": pa.array(key), "c": pa.array(c.astype(np.int64))})

    inter = (
        grams.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(per_bucket_pairs, batch_format="pyarrow")
        .groupby("key")
        .sum("c")
        .map_batches(
            lambda b: pa.table({"key": b.column("key"), "c": b.column("sum(c)")}),
            batch_format="pyarrow",
        )
    )
    # |gram set| per doc, attached to each pair by the distributed pair join
    # (no driver-side size table, no broadcast). Under a DF cut the sizes
    # count only SURVIVING grams (df <= max_df, singletons included) — the
    # reported value is then the true Jaccard of the DF-cut sets; counting
    # all grams here while the intersection was cut made the ratio
    # asymmetric (a near-dup pair whose shared grams are hot scored ~0).
    if max_df is None:
        sizes = grams.groupby("doc_id").count().map_batches(
            lambda b: pa.table(
                {"doc_id": b.column("doc_id"), "sz": b.column("count()")}
            ),
            batch_format="pyarrow",
        )
    else:

        def surviving_sizes(group: pa.Table) -> pa.Table:
            gh = group.column("gh").to_numpy(zero_copy_only=False)
            ids = group.column("doc_id").to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, gh))
            gh_s, ids_s = gh[order], ids[order]
            starts = np.flatnonzero(np.r_[True, gh_s[1:] != gh_s[:-1]])
            d = np.diff(np.r_[starts, len(gh_s)])
            keep = np.repeat(d <= max_df, d)
            ud, cnt = np.unique(ids_s[keep], return_counts=True)
            return pa.table(
                {"doc_id": pa.array(ud), "szp": pa.array(cnt.astype(np.int64))}
            )

        from raylink.join import bucketed_sum

        sizes = bucketed_sum(
            grams.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("b")
            .map_groups(surviving_sizes, batch_format="pyarrow"),
            "doc_id", "szp", out_val="sz",
        )
    paired = _pair_attach(
        inter, sizes, {"sz": pa.int64()}, carry_fields={"c": pa.int64()}
    )

    def jac(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy(zero_copy_only=False)
        a, b = unpack_hi(key), key & np.int64(0xFFFFFFFF)
        c = batch.column("c").to_numpy(zero_copy_only=False)
        na = batch.column("sz_a").to_numpy(zero_copy_only=False)
        nb = batch.column("sz_b").to_numpy(zero_copy_only=False)
        if metric == "containment":
            j = round_half_away(c / np.minimum(na, nb), 6)
        else:
            j = round_half_away(c / (na + nb - c), 6)
        keep = j >= tau
        return pa.table(
            {
                "doc_a": pa.array(a[keep]),
                "doc_b": pa.array(b[keep]),
                metric: pa.array(j[keep]),
            }
        )

    return _with_typed_empty(
        paired.map_batches(jac, batch_format="pyarrow"),
        {"doc_a": pa.int64(), "doc_b": pa.int64(), metric: pa.float64()},
    )


# ------------------------------------------------------------------ minhash
class _GramSetHasher:
    """Per-doc sorted unique 64-bit gram hashes (the exact-verify payload):
    (doc_id, grams: list<uint64>). Docs with no grams get an empty list so
    every doc has a value row for ``_pair_attach``."""

    def __init__(self, n: int):
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        # ONE range-hash pass over every shingle in the batch (no per-gram
        # strings), then per-doc sorted-unique on numpy slices
        # (np.unique(hashes) == the hashes of the distinct-gram set, sorted
        # — min/set semantics are dup-invariant)
        gh, counts = _gram_hashes(batch.column("text").to_pylist(), self.n)
        bounds = np.r_[0, np.cumsum(counts)]
        sets = [
            np.unique(gh[bounds[i] : bounds[i + 1]]) for i in range(len(ids))
        ]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "grams": pa.array(
                    [s.tolist() for s in sets], type=pa.list_(pa.uint64())
                ),
            }
        )


class MinHasher:
    """Per-actor state: seeded xor-mix hash family (one seed per
    permutation); sig_i = min over grams of splitmix64(gram_hash ^ seed_i) —
    fully vectorized in uint64, no 128-bit modular arithmetic needed."""

    def __init__(self, n: int = 3, perms: int = 128, seed: int = 7):
        from raylink.util import splitmix64

        self.n = n
        rng = np.random.default_rng(seed)
        self.seeds = rng.integers(0, 2**63, size=perms, dtype=np.int64).astype(np.uint64)
        self.perms = perms
        self._mix = splitmix64
        # reusable scratch for the (seed_chunk x grams) working set — fresh
        # numpy allocations of this size pay first-touch page faults worth
        # ~10x the arithmetic per batch (measured), so actors keep buffers
        self._bufs: tuple | None = None

    def signature(self, text: str) -> np.ndarray:
        grams = sorted(_grams_of(text, self.n))
        if not grams:
            return np.zeros(self.perms, dtype=np.uint64)
        x = text_hash64(grams)
        return self._mix(x[None, :] ^ self.seeds[:, None]).min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # batched: ONE range-hash pass over every shingle in the batch (no
        # per-gram python strings, see _gram_hashes), then per-doc mins via
        # np.minimum.reduceat, chunked over seeds to bound the working set.
        # Bit-identical to per-doc ``signature`` (min is dup-invariant, so
        # the per-doc sorted-set step there is unnecessary); property-tested.
        ids = batch.column("doc_id").to_pylist()
        gh, counts = _gram_hashes(batch.column("text").to_pylist(), self.n)
        sigs = np.zeros((len(ids), self.perms), dtype=np.uint64)
        nonempty = counts > 0
        if nonempty.any():
            from raylink.util import splitmix64_inplace

            seg_starts = np.r_[0, np.cumsum(counts)][:-1][nonempty]
            G = len(gh)
            # seed chunk sized so the working set (2 scratch rows x chunk x
            # 8 B + the gram hashes) stays L2-resident (~0.5 MB): measured
            # 2x faster single-core than 16 MB chunks AND keeps the stage
            # CPU-bound instead of DRAM-bound, which is what preserves
            # multi-core scaling on the curation leg
            step = max(1, min(self.perms, int(64_000 // max(G, 1)) or 1))
            need = step * G
            if self._bufs is None or self._bufs[0].size < need:
                self._bufs = (np.empty(need, np.uint64), np.empty(need, np.uint64))
            a_flat, t_flat = self._bufs
            for c0 in range(0, self.perms, step):
                seeds = self.seeds[c0 : c0 + step]
                c = len(seeds)
                a = a_flat[: c * G].reshape(c, G)
                tmp = t_flat[: c * G].reshape(c, G)
                np.bitwise_xor(gh[None, :], seeds[:, None], out=a)
                splitmix64_inplace(a, tmp)
                sigs[nonempty, c0 : c0 + c] = np.minimum.reduceat(
                    a, seg_starts, axis=1
                ).T
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "sig": pa.array(sigs.tolist(), type=pa.list_(pa.uint64())),
            }
        )


def minhash_pairs(
    docs_ds, n: int = 3, tau: float = 0.7, bands: int = 32, rows: int = 4,
    seed: int = 7, max_bucket: int | None = None,
):
    """MinHash-LSH near-dup -> Dataset (doc_a, doc_b, jaccard r6), exact
    Jaccard verified >= tau. b=32 x r=4 => P(catch | j=0.9) ~ 1-1e-15.

    ``max_bucket`` is the boilerplate-cluster scale guard: candidate
    generation is O(K^2) per band-bucket, so one template with 100k
    near-identical pages would emit ~5e9 pairs per band. When a bucket
    exceeds ``max_bucket`` docs, it degrades to STAR pairs — every doc
    paired with the bucket's min doc, O(K) — which preserves dedup
    CLUSTERS (connected components over verified pairs: in a boilerplate
    bucket every doc verifies against the representative, so the component
    is unchanged) but no longer enumerates every within-cluster pair
    (pair-level recall trade-off, cluster-level none in the
    mutually-similar case that creates giant buckets). Default None =
    exact all-pairs (the oracle-gated path)."""
    hasher = MinHasher(n=n, perms=bands * rows, seed=seed)
    sigs = docs_ds.map_batches(hasher, batch_format="pyarrow")

    def to_buckets(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if len(ids) == 0:  # np.array([]) is 1-D; the band slice needs 2-D
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "bucket": pa.array([], type=pa.uint64())}
            )
        sig = np.array(batch.column("sig").to_pylist(), dtype=np.uint64)
        out_id, out_bucket = [], []
        for bi in range(bands):
            band = sig[:, bi * rows : (bi + 1) * rows]
            h = np.zeros(len(ids), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for c in range(rows):
                    h = h * np.uint64(1099511628211) + band[:, c]
            out_id.append(ids)
            out_bucket.append((np.uint64(bi) << np.uint64(56)) ^ (h >> np.uint64(8)))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id)),
                "bucket": pa.array(np.concatenate(out_bucket)),
            }
        )

    buckets = sigs.map_batches(to_buckets, batch_format="pyarrow")

    def coarse(batch: pa.Table) -> pa.Table:
        bk = batch.column("bucket").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "cb", pa.array((bk % np.uint64(64)).astype(np.int32))
        )

    def cand(group: pa.Table) -> pa.Table:
        # one shuffle group serves many LSH buckets (segment by bucket value)
        bk = group.column("bucket").to_numpy(zero_copy_only=False)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        _assert_packable(ids)
        order = np.lexsort((ids, bk))
        bk, ids = bk[order], ids[order]
        starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        ends = np.r_[starts[1:], len(bk)]
        keys = []
        for st, en in zip(starts, ends):
            docs = np.unique(ids[st:en])
            if len(docs) < 2:
                continue
            if max_bucket is not None and len(docs) > max_bucket:
                # giant (boilerplate) bucket: star pairs to the min doc
                keys.append((docs[0] << np.int64(32)) | docs[1:])
                continue
            ii, jj = np.triu_indices(len(docs), k=1)
            keys.append((docs[ii] << np.int64(32)) | docs[jj])
        if not keys:
            return pa.table({"key": pa.array([], type=pa.int64())})
        return pa.table({"key": pa.array(np.unique(np.concatenate(keys)))})

    cand_keys = (
        buckets.map_batches(coarse, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(cand, batch_format="pyarrow")
        .groupby("key")
        .count()
        .select_columns(["key"])
    )
    # exact-Jaccard verify, distributed: per-doc sorted gram-hash sets are
    # joined onto the pair keys (two bucket shuffles, no driver loop), then
    # each pair intersects two sorted uint64 arrays inside map_batches.
    # Gram identity = its 64-bit FNV hash (same negligible-collision
    # assumption as candidate generation, documented at add_bucket).
    gram_sets = docs_ds.map_batches(_GramSetHasher(n), batch_format="pyarrow")
    paired = _pair_attach(cand_keys, gram_sets, {"grams": pa.list_(pa.uint64())})

    def verify(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy(zero_copy_only=False)
        ga = batch.column("grams_a").combine_chunks()
        gb = batch.column("grams_b").combine_chunks()
        fa = ga.flatten().to_numpy(zero_copy_only=False)
        fb = gb.flatten().to_numpy(zero_copy_only=False)
        oa = ga.offsets.to_numpy(zero_copy_only=False)
        ob = gb.offsets.to_numpy(zero_copy_only=False)
        out_a, out_b, out_j = [], [], []
        for i in range(len(key)):
            sa = fa[oa[i] : oa[i + 1]]
            sb = fb[ob[i] : ob[i + 1]]
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            u = len(sa) + len(sb) - inter
            j = inter / u if u else 0.0
            if j >= tau:
                out_a.append(int(unpack_hi(key[i])))
                out_b.append(int(key[i] & np.int64(0xFFFFFFFF)))
                out_j.append(float(round_half_away(j, 6)))
        return pa.table(
            {
                "doc_a": pa.array(out_a, type=pa.int64()),
                "doc_b": pa.array(out_b, type=pa.int64()),
                "jaccard": pa.array(out_j, type=pa.float64()),
            }
        )

    return _with_typed_empty(
        paired.map_batches(verify, batch_format="pyarrow"),
        {"doc_a": pa.int64(), "doc_b": pa.int64(), "jaccard": pa.float64()},
    )


# ------------------------------------------------------------------ simhash
class SimHasher:
    def __init__(self, seed: int = 0):
        self.word = WORD_RE
        # reusable W-length scratch (same treatment as MinHasher._bufs):
        # fresh numpy allocations pay first-touch page faults worth ~10x the
        # arithmetic per batch, so the callable keeps a grow-only buffer
        self._scratch = np.empty(0, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # per-doc unique words+counts, then ONE vectorized text_hash64 over
        # all unique words in the batch; bit-majority accumulation is a
        # segment reduceat over the whole batch. Values unchanged.
        ids = batch.column("doc_id").to_pylist()
        n = len(ids)
        uws, ucs = [], []
        for t in batch.column("text").to_pylist():
            ws, cs = np.unique(self.word.findall((t or "").lower()), return_counts=True)
            uws.append(ws)
            ucs.append(cs)
        counts = np.fromiter((len(w) for w in uws), dtype=np.int64, count=n)
        out = np.zeros(n, dtype=np.int64)
        nonempty = counts > 0
        if nonempty.any():
            hs = text_hash64([w for ws in uws for w in ws])
            cs_all = np.concatenate(ucs) if len(ucs) else np.empty(0, np.int64)
            seg_starts = np.r_[0, np.cumsum(counts)][:-1][nonempty]
            # per-bit accumulation without the (W x 64) matrix: for bit j,
            # acc_j(doc) = 2 * sum(counts where bit set) - total(doc); one
            # W-length scratch reused across the 64 iterations keeps the
            # working set cache-resident (the old two W x 64 int64
            # temporaries were ~100 MB of per-batch allocator churn)
            tot = np.add.reduceat(cs_all, seg_starts)
            if self._scratch.size < len(hs):
                self._scratch = np.empty(
                    max(len(hs), 2 * self._scratch.size), dtype=np.int64
                )
            scratch = self._scratch[: len(hs)]
            sh = np.zeros(int(nonempty.sum()), dtype=np.uint64)
            for j in range(64):
                np.bitwise_and(
                    (hs >> np.uint64(j)).view(np.int64), np.int64(1), out=scratch
                )
                scratch *= cs_all
                set_sum = np.add.reduceat(scratch, seg_starts)
                sh |= ((2 * set_sum - tot) > 0).astype(np.uint64) << np.uint64(j)
            out[nonempty] = sh.astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()), "simhash": pa.array(out)}
        )


def simhash_pairs(docs_ds, max_hamming: int = 3,
                  max_bucket: int | None = None):
    """SimHash near-dup: 4x16-bit bands (catches all pairs with hamming <= 3
    by pigeonhole) + exact hamming verify -> (doc_a, doc_b, hamming).

    ``max_bucket``: same boilerplate-cluster O(K^2) guard as
    ``minhash_pairs`` — an oversized band-bucket degrades to star pairs
    against its min doc (cluster-preserving in the mutually-similar case;
    default None = exact all-pairs, the oracle-gated path)."""
    sigs = docs_ds.map_batches(SimHasher(), batch_format="pyarrow").materialize()

    def to_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sh = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        out_id, out_b = [], []
        for bi in range(4):
            chunk = (sh >> np.uint64(16 * bi)) & np.uint64(0xFFFF)
            out_id.append(ids)
            out_b.append((np.uint64(bi) << np.uint64(16)) | chunk)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id)),
                "band": pa.array(np.concatenate(out_b).astype(np.int64)),
            }
        )

    def coarse(batch: pa.Table) -> pa.Table:
        bd = batch.column("band").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "cb", pa.array((bd % np.int64(64)).astype(np.int32))
        )

    def cand(group: pa.Table) -> pa.Table:
        # one shuffle group serves many 16-bit bands (segment by band value)
        bd = group.column("band").to_numpy(zero_copy_only=False)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        _assert_packable(ids)
        order = np.lexsort((ids, bd))
        bd, ids = bd[order], ids[order]
        starts = np.flatnonzero(np.r_[True, bd[1:] != bd[:-1]])
        ends = np.r_[starts[1:], len(bd)]
        keys = []
        for st, en in zip(starts, ends):
            docs = np.unique(ids[st:en])
            if len(docs) < 2:
                continue
            if max_bucket is not None and len(docs) > max_bucket:
                # giant (boilerplate) bucket: star pairs to the min doc
                keys.append((docs[0] << np.int64(32)) | docs[1:])
                continue
            ii, jj = np.triu_indices(len(docs), k=1)
            keys.append((docs[ii] << np.int64(32)) | docs[jj])
        if not keys:
            return pa.table({"key": pa.array([], type=pa.int64())})
        return pa.table({"key": pa.array(np.unique(np.concatenate(keys)))})

    cands = (
        sigs.map_batches(to_bands, batch_format="pyarrow")
        .map_batches(coarse, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(cand, batch_format="pyarrow")
        .groupby("key")
        .count()
        .select_columns(["key"])
    )
    # distributed verify: signatures joined onto pair keys (two bucket
    # shuffles), hamming = vectorized xor + popcount per batch — no full
    # signature table on the driver.
    paired = _pair_attach(cands, sigs, {"simhash": pa.int64()})

    def verify(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy(zero_copy_only=False)
        a, b = unpack_hi(key), key & np.int64(0xFFFFFFFF)
        sa = batch.column("simhash_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        sb = batch.column("simhash_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        x = np.ascontiguousarray(sa ^ sb)
        ham = (
            np.unpackbits(x.view(np.uint8)).reshape(len(x), 64).sum(axis=1).astype(np.int64)
            if len(x)
            else np.array([], dtype=np.int64)
        )
        keep = ham <= max_hamming
        return pa.table(
            {
                "doc_a": pa.array(a[keep]),
                "doc_b": pa.array(b[keep]),
                "hamming": pa.array(ham[keep]),
            }
        )

    return _with_typed_empty(
        paired.map_batches(verify, batch_format="pyarrow"),
        {"doc_a": pa.int64(), "doc_b": pa.int64(), "hamming": pa.int64()},
    )


# --------------------------------------------------------------- contamination
def decontaminate(docs_ds, bench_ds, n: int = 8):
    """Benchmark-contamination flagging: mark every document whose text
    contains any word ``n``-gram of any benchmark document -> Dataset
    (doc_id, n_grams, n_hits, contaminated) — the standard train-set
    decontamination pass (an n-gram of an eval set appearing verbatim in a
    training doc leaks the benchmark).

    Grams use the same rule as ``ngram_pairs``: words = ``[a-z0-9]+`` runs
    of lower(text), gram = n consecutive words space-joined, compared by
    FNV-1a hash (the documented ~2^-64 false-positive trade of every
    hashed-gram op here; a collision can only over-flag, never miss).
    ``n_hits`` counts gram OCCURRENCES in the doc (all windows), so a
    tolerance threshold can be applied downstream.

    Shape: the benchmark gram set is distinct-reduced DISTRIBUTED
    (per-batch unique -> one vocabulary groupby), and only the final
    distinct hash list lands on the driver for the ``ray.put`` broadcast —
    bounded by the benchmark VOCABULARY, small by definition (an eval
    suite, not a corpus). The corpus-side scan is one map_batches with a
    sorted-array membership test; the 100-TB side never shuffles at all.
    """
    import ray

    def bench_grams(batch: pa.Table) -> pa.Table:
        gh, _ = _gram_hashes(batch.column("text").to_pylist(), n)
        return pa.table({"gh": pa.array(np.unique(gh).view(np.int64))})

    distinct = (
        bench_ds.map_batches(bench_grams, batch_format="pyarrow")
        .groupby("gh")
        .count()
    )
    ghs = np.array(
        [r["gh"] for r in distinct.select_columns(["gh"]).take_all()],
        dtype=np.int64,
    )
    bench_sorted = np.sort(ghs.view(np.uint64))
    ref = ray.put(bench_sorted)

    def scan(batch: pa.Table) -> pa.Table:
        bench = ray.get(ref)
        texts = batch.column("text").to_pylist()
        gh, counts = _gram_hashes(texts, n)
        if len(bench) and len(gh):
            pos = np.searchsorted(bench, gh)
            hit = (pos < len(bench)) & (
                bench[np.minimum(pos, len(bench) - 1)] == gh
            )
        else:
            hit = np.zeros(len(gh), dtype=bool)
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        n_hits = np.bincount(
            doc_idx[hit], minlength=len(texts)
        ).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_grams": pa.array(counts),
                "n_hits": pa.array(n_hits),
                "contaminated": pa.array(n_hits > 0),
            }
        )

    return docs_ds.map_batches(scan, batch_format="pyarrow")


def repeated_substrings(
    docs_ds,
    window: int = 40,
    modulus: int = 16,
    residue: int = 0,
    min_docs: int = 2,
    num_buckets: int = 64,
    per_occurrence: bool = False,
):
    """Cross-document EXACT repeated substrings — the exact-substring
    dedup signal (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", which uses suffix arrays; this is the
    shuffle-friendly distributed formulation).

    A ``window``-byte window starts at every CONTENT-DEFINED anchor:
    positions whose byte value ``b`` has ``b % modulus == residue`` (the
    defaults anchor on the space byte among others — word boundaries).
    Content-defined selection is alignment-independent: a region shared
    verbatim by two documents selects the SAME anchors inside the region
    in both, so every shared run that contains an anchor with ``window``
    bytes of room is found — unlike stride sampling (which misses when
    the two copies start at different offsets mod the stride) and with
    1/anchor-density of per-position emission.

    Exactness: the group key is the window BYTES themselves — the FNV-1a
    hash only routes the shuffle, so hash collisions cannot produce false
    groups and no verify pass exists. All occurrences of one window land
    in one bucket group, making the (n_docs, n_occ) counts final.

    Returns Dataset ``(window, n_docs, n_occ)`` for windows seen in at
    least ``min_docs`` distinct documents; ``per_occurrence=True``
    instead returns ``(window, doc_id, pos)`` rows (0-based BYTE
    position) for those windows — the spans an exact-substring dedup
    pass would cut. Windows are emitted as strings (documents are text;
    a window that would split a multi-byte UTF-8 sequence would fail the
    cast loudly rather than silently corrupt).
    """
    W = int(window)

    def reduce_group(group: pa.Table) -> pa.Table:
        arr = group.column("win").combine_chunks()
        k = len(arr)
        buf = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
        mat = buf[arr.offset * W : (arr.offset + k) * W].reshape(k, W)
        void = np.ascontiguousarray(mat).view(f"V{W}").ravel()
        docs = group.column("doc_id").to_numpy(zero_copy_only=False)
        pos = group.column("pos").to_numpy(zero_copy_only=False)
        # sort by (window, doc, pos): the distinct-doc count below walks
        # adjacent (window, doc) transitions, so a doc's occurrences MUST
        # be contiguous — within-group row order from the shuffle is not
        # contractual
        order = np.lexsort((pos, docs, void))
        v, d, p = void[order], docs[order], pos[order]
        starts = np.flatnonzero(np.concatenate(([True], v[1:] != v[:-1])))
        counts = np.diff(np.append(starts, k))
        gidx = np.repeat(np.arange(len(starts)), counts)
        # distinct docs per window: unique (window, doc) pairs
        nd = np.zeros(len(starts), dtype=np.int64)
        first_pair = np.concatenate(
            ([True], (v[1:] != v[:-1]) | (d[1:] != d[:-1]))
        )
        np.add.at(nd, gidx[first_pair], 1)
        keep_g = nd >= min_docs
        if per_occurrence:
            keep = keep_g[gidx]
            wins = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(W), int(keep.sum()),
                [None, pa.py_buffer(
                    np.ascontiguousarray(
                        mat[order][keep]
                    ).tobytes()
                )],
            )
            return pa.table(
                {
                    "window": wins.cast(pa.string()),
                    "doc_id": pa.array(d[keep]),
                    "pos": pa.array(p[keep]),
                }
            )
        sel = np.flatnonzero(keep_g)
        wins = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(W), len(sel),
            [None, pa.py_buffer(
                np.ascontiguousarray(mat[order][starts[sel]]).tobytes()
            )],
        )
        return pa.table(
            {
                "window": wins.cast(pa.string()),
                "n_docs": pa.array(nd[sel]),
                "n_occ": pa.array(counts[sel].astype(np.int64)),
            }
        )

    from raylink.join import with_typed_empty

    fields = (
        {"window": pa.string(), "doc_id": pa.int64(), "pos": pa.int64()}
        if per_occurrence
        else {"window": pa.string(), "n_docs": pa.int64(), "n_occ": pa.int64()}
    )
    return with_typed_empty(
        _anchor_rows(docs_ds, window, modulus, residue, num_buckets)
        .groupby("wb")
        .map_groups(reduce_group, batch_format="pyarrow"),
        fields,
    )


def _anchor_rows(docs_ds, window: int, modulus: int, residue: int,
                 num_buckets: int = 64):
    """Shared anchor stage of the exact-substring family: Dataset
    ``(wb, win, doc_id, pos)`` — one row per content-defined anchor
    (byte % modulus == residue) with the window BYTES as fixed-size
    binary; ``wb`` = FNV-1a(window) % num_buckets routes the shuffle so
    every occurrence of one window lands in one group."""
    from numpy.lib.stride_tricks import sliding_window_view

    W = int(window)
    B = np.uint64(num_buckets)
    FNV_OFF = np.uint64(14695981039346656037)
    FNV_PRIME = np.uint64(1099511628211)

    def anchors(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        mats, out_ids, out_pos = [], [], []
        for i, t in enumerate(texts):
            b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
            if len(b) < W:
                continue
            pos = np.flatnonzero(b % np.uint8(modulus) == np.uint8(residue))
            pos = pos[pos + W <= len(b)]
            if not len(pos):
                continue
            mats.append(sliding_window_view(b, W)[pos])
            out_ids.append(np.full(len(pos), ids[i], dtype=np.int64))
            out_pos.append(pos.astype(np.int64))
        if not mats:
            return pa.table(
                {"wb": pa.array([], type=pa.int32()),
                 "win": pa.array([], type=pa.binary(W)),
                 "doc_id": pa.array([], type=pa.int64()),
                 "pos": pa.array([], type=pa.int64())}
            )
        mat = np.ascontiguousarray(np.concatenate(mats))
        h = np.full(len(mat), FNV_OFF)
        for j in range(W):  # vectorized across rows, loop over W positions
            h = (h ^ mat[:, j].astype(np.uint64)) * FNV_PRIME
        return pa.table(
            {
                "wb": pa.array((h % B).astype(np.int32)),
                "win": pa.FixedSizeBinaryArray.from_buffers(
                    pa.binary(W), len(mat), [None, pa.py_buffer(mat.tobytes())]
                ),
                "doc_id": pa.array(np.concatenate(out_ids)),
                "pos": pa.array(np.concatenate(out_pos)),
            }
        )

    return docs_ds.map_batches(anchors, batch_format="pyarrow")


def substring_pairs(
    docs_ds,
    window: int = 40,
    modulus: int = 16,
    residue: int = 0,
    min_shared: int = 2,
    max_df: int = 64,
    num_buckets: int = 64,
):
    """Near-duplicate candidate pairs from EXACT shared substrings: doc
    pairs sharing at least ``min_shared`` distinct repeated windows (the
    ``repeated_substrings`` anchors), the exact-substring sibling of
    ``ngram_pairs``. Windows present in more than ``max_df`` documents
    are dropped before pair expansion (the DF cut that bounds the
    per-window quadratic blowup — same contract as ``ngram_pairs``'
    ``max_df``; boilerplate shared by everything is not a dup signal).

    Shape: the anchor shuffle groups all rows of a window together; the
    group emits canonical (doc_a < doc_b) pairs per surviving window
    (distinct docs only), pre-counted per batch; one more coarse-bucket
    groupby sums shared-window counts per pair. Returns Dataset
    ``(doc_a, doc_b, n_shared)``.
    """
    rows = _anchor_rows(docs_ds, window, modulus, residue, num_buckets)
    W = int(window)
    B = np.uint64(num_buckets)

    def pairs_of_group(group: pa.Table) -> pa.Table:
        arr = group.column("win").combine_chunks()
        k = len(arr)
        buf = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
        mat = buf[arr.offset * W : (arr.offset + k) * W].reshape(k, W)
        void = np.ascontiguousarray(mat).view(f"V{W}").ravel()
        docs = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((docs, void))
        v, d = void[order], docs[order]
        # distinct (window, doc)
        first = np.concatenate(([True], (v[1:] != v[:-1]) | (d[1:] != d[:-1])))
        v, d = v[first], d[first]
        starts = np.flatnonzero(np.concatenate(([True], v[1:] != v[:-1])))
        counts = np.diff(np.append(starts, len(v)))
        keep = (counts >= 2) & (counts <= max_df)
        a_out, b_out = [], []
        for s, c in zip(starts[keep], counts[keep]):
            dd = d[s : s + c]  # sorted ascending (lexsort doc secondary)
            ii, jj = np.triu_indices(c, k=1)
            a_out.append(dd[ii])
            b_out.append(dd[jj])
        if not a_out:
            return pa.table(
                {"pb": pa.array([], type=pa.int32()),
                 "doc_a": pa.array([], type=pa.int64()),
                 "doc_b": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64())}
            )
        a = np.concatenate(a_out)
        b = np.concatenate(b_out)
        # pre-count identical pairs within the group before the shuffle
        order2 = np.lexsort((b, a))
        a, b = a[order2], b[order2]
        first2 = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        st2 = np.flatnonzero(first2)
        n = np.diff(np.append(st2, len(a))).astype(np.int64)
        a, b = a[st2], b[st2]
        from raylink.util import splitmix64

        bkt = (
            splitmix64(a.astype(np.uint64) ^ splitmix64(b.astype(np.uint64)))
            % B
        ).astype(np.int32)
        return pa.table(
            {"pb": pa.array(bkt), "doc_a": pa.array(a),
             "doc_b": pa.array(b), "n": pa.array(n)}
        )

    def sum_pairs(group: pa.Table) -> pa.Table:
        a = group.column("doc_a").to_numpy(zero_copy_only=False)
        b = group.column("doc_b").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b, n = a[order], b[order], n[order]
        first = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        st = np.flatnonzero(first)
        tot = np.add.reduceat(n, st)
        keep = tot >= min_shared
        return pa.table(
            {"doc_a": pa.array(a[st][keep]), "doc_b": pa.array(b[st][keep]),
             "n_shared": pa.array(tot[keep].astype(np.int64))}
        )

    from raylink.join import with_typed_empty

    return with_typed_empty(
        rows.groupby("wb")
        .map_groups(pairs_of_group, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(sum_pairs, batch_format="pyarrow"),
        {"doc_a": pa.int64(), "doc_b": pa.int64(), "n_shared": pa.int64()},
    )


def containment_pairs(docs_ds, n: int = 3, tau: float = 0.2,
                      max_df: int | None = None):
    """n-gram CONTAINMENT pairs (|A n B| / min sizes) — same distributed
    shape as ``ngram_pairs`` (shared machinery), different final ratio;
    catches subset-duplication (quotes, aggregator wraps) that symmetric
    Jaccard misses."""
    return ngram_pairs(docs_ds, n=n, tau=tau, max_df=max_df,
                       metric="containment")


def novelty_scores(docs_ds, n: int = 3, num_buckets: int = 64):
    """Per-doc n-gram novelty: the fraction of the doc's DISTINCT n-grams
    whose corpus document frequency is 1 — high novelty = content seen
    nowhere else (the inverse signal of the dedup families; a curation
    uniqueness score). -> Dataset (doc_id, n_grams, n_unique, novelty).

    Shape: the `_Shingler` distinct (doc, gram-hash) rows -> ONE gram-hash
    coarse-bucket groupby (a gram's rows colocate, so DF is global) with
    per-doc (total, unique) pre-sums -> one doc-hash bucket sum; docs with
    no grams ride along as zero rows from the doc scan. One IEEE division
    per doc."""
    from raylink.util import splitmix64

    B = np.uint64(num_buckets)
    grams = docs_ds.map_batches(_Shingler(n), batch_format="pyarrow")

    def add_bucket(batch: pa.Table) -> pa.Table:
        gh = batch.column("gh").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "b": pa.array((gh % B).astype(np.int32)),
                "doc_id": batch.column("doc_id"),
                "gh": batch.column("gh"),
            }
        )

    def df_partial(group: pa.Table) -> pa.Table:
        gh = group.column("gh").to_numpy(zero_copy_only=False)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(gh, kind="stable")
        gh, ids = gh[order], ids[order]
        starts = np.flatnonzero(np.r_[True, gh[1:] != gh[:-1]])
        df = np.diff(np.r_[starts, len(gh)])
        uniq_row = np.repeat(df == 1, df)
        ud, inv = np.unique(ids, return_inverse=True)
        t = np.bincount(inv, minlength=len(ud)).astype(np.int64)
        u = np.zeros(len(ud), np.int64)
        np.add.at(u, inv, uniq_row.astype(np.int64))
        return pa.table(
            {
                "db": pa.array(
                    (splitmix64(ud.astype(np.uint64)) % B).astype(np.int32)
                ),
                "doc_id": pa.array(ud),
                "t": pa.array(t),
                "u": pa.array(u),
            }
        )

    def zero_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        z = np.zeros(len(ids), np.int64)
        return pa.table(
            {
                "db": pa.array(
                    (splitmix64(ids.astype(np.uint64)) % B).astype(np.int32)
                ),
                "doc_id": pa.array(ids),
                "t": pa.array(z),
                "u": pa.array(z),
            }
        )

    partials = (
        grams.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("b")
        .map_groups(df_partial, batch_format="pyarrow")
        .union(docs_ds.map_batches(zero_rows, batch_format="pyarrow"))
    )

    def per_doc(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        u = group.column("u").to_numpy(zero_copy_only=False)
        ud, inv = np.unique(ids, return_inverse=True)
        ts = np.zeros(len(ud), np.int64)
        us = np.zeros(len(ud), np.int64)
        np.add.at(ts, inv, t)
        np.add.at(us, inv, u)
        return pa.table(
            {
                "doc_id": pa.array(ud),
                "n_grams": pa.array(ts),
                "n_unique": pa.array(us),
                "novelty": pa.array(
                    np.where(ts > 0, us / np.maximum(ts, 1), 0.0)
                ),
            }
        )

    return partials.groupby("db").map_groups(per_doc, batch_format="pyarrow")


def source_overlap(docs_ds, n: int = 8, num_buckets: int = 32):
    """Cross-source contamination matrix: for every unordered source pair
    (a < b), the number of DISTINCT word ``n``-grams occurring in BOTH
    sources -> Dataset (source_a, source_b, shared_grams). The dataset-
    audit companion of ``decontaminate``: where that guards one benchmark
    against the corpus, this quantifies leakage between every pair of
    ingest sources (mirror sites, syndicated feeds, scraped re-posts).

    Grams use the same rule as every hashed-gram op here (words =
    [a-z0-9]+ of lower(text), FNV-1a over byte ranges; hash equality
    stands in for gram equality, the documented ~2^-64 trade). Shape:
    per-batch distinct (gram, source) rows -> ONE gram-hash coarse-bucket
    groupby (all rows of a gram colocate, so the per-gram source set is
    global) -> fully vectorized within-segment pair expansion (each
    gram's k sources emit C(k,2) source pairs; k is bounded by the SOURCE
    cardinality, not the corpus) with in-group partial counts -> bounded
    combine tree over the (source_a, source_b) keys."""
    from raylink.join import tree_groupby_sum
    from raylink.util import splitmix64

    B = np.uint64(num_buckets)

    def partial(batch: pa.Table) -> pa.Table:
        gh, counts = _gram_hashes(batch.column("text").to_pylist(), n)
        src = np.asarray(batch.column("source").to_pylist(), dtype=object)
        gsrc = np.repeat(src, counts)
        hs = gh.view(np.int64)
        order = np.lexsort((gsrc, hs))
        hs, gsrc = hs[order], gsrc[order]
        first = np.r_[True, (hs[1:] != hs[:-1]) | (gsrc[1:] != gsrc[:-1])]
        hs, gsrc = hs[first], gsrc[first]
        return pa.table(
            {
                "gb": pa.array(
                    (splitmix64(hs.view(np.uint64)) % B).astype(np.int32)
                ),
                "gh": pa.array(hs),
                "src": pa.array(gsrc, type=pa.string()),
            }
        )

    def pair_counts(group: pa.Table) -> pa.Table:
        hs = group.column("gh").to_numpy(zero_copy_only=False)
        src = np.asarray(group.column("src").to_pylist(), dtype=object)
        order = np.lexsort((src, hs))
        hs, src = hs[order], src[order]
        first = np.r_[True, (hs[1:] != hs[:-1]) | (src[1:] != src[:-1])]
        hs, src = hs[first], src[first]
        # segments = grams; sources sorted within each segment
        seg = np.r_[True, hs[1:] != hs[:-1]]
        seg_start = np.flatnonzero(seg)
        k = np.diff(np.r_[seg_start, len(hs)])
        # every row pairs with every position of its segment; keep the
        # strict upper triangle (partner pos > own pos => src_a < src_b)
        kk = np.repeat(k, k)                      # per row: its segment size
        row = np.arange(len(hs), dtype=np.int64)
        own_pos = row - np.repeat(seg_start, k)
        tot = int(kk.sum())
        partner = (
            np.arange(tot, dtype=np.int64)
            - np.repeat(np.cumsum(kk) - kk, kk)
        )
        keep = partner > np.repeat(own_pos, kk)
        a = src[np.repeat(row, kk)[keep]]
        b = src[(np.repeat(np.repeat(seg_start, k), kk) + partner)[keep]]
        if len(a) == 0:
            return pa.table(
                {
                    "source_a": pa.array([], type=pa.string()),
                    "source_b": pa.array([], type=pa.string()),
                    "shared": pa.array([], type=pa.int64()),
                }
            )
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        bound = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        starts = np.flatnonzero(bound)
        cnt = np.diff(np.r_[starts, len(a)])
        return pa.table(
            {
                "source_a": pa.array(a[starts], type=pa.string()),
                "source_b": pa.array(b[starts], type=pa.string()),
                "shared": pa.array(cnt.astype(np.int64)),
            }
        )

    partials = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(pair_counts, batch_format="pyarrow")
    )
    agg = tree_groupby_sum(partials, ["source_a", "source_b"], ["shared"])
    return agg.map_batches(
        lambda t: pa.table(
            {
                "source_a": t.column("source_a"),
                "source_b": t.column("source_b"),
                "shared_grams": t.column("sum(shared)"),
            }
        ),
        batch_format="pyarrow",
    )


def minhash_pairs_incremental(
    old_docs_ds, new_docs_ds, n: int = 3, tau: float = 0.7,
    bands: int = 32, rows: int = 4, seed: int = 7,
):
    """Continuous-crawl incremental near-dup: the MinHash-LSH pairs that
    TOUCH the new batch (old-new and new-new), exact Jaccard >= tau —
    bit-identical to filtering ``minhash_pairs(old ∪ new)`` down to pairs
    with >= 1 new side, but old x old candidates NEVER FORM: inside each
    LSH-bucket segment pairs are generated new x all only, so the
    incremental cost tracks the NEW batch's bucket collisions, not the
    corpus size (the point of indexing a continuous crawl). In production
    the old side's signatures and gram-sets come from the previous run's
    persisted parquet (both are plain Datasets); recomputed here from the
    docs for self-containment. -> Dataset (doc_a, doc_b, jaccard r6)."""
    import pyarrow as pa

    from raylink.util import round_half_away, unpack_hi

    hasher = MinHasher(n=n, perms=bands * rows, seed=seed)

    def tag(is_new: int):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "is_new",
                pa.array(np.full(batch.num_rows, is_new, dtype=np.int8)),
            )

        return fn

    docs = old_docs_ds.map_batches(tag(0), batch_format="pyarrow").union(
        new_docs_ds.map_batches(tag(1), batch_format="pyarrow")
    )

    def to_buckets(batch: pa.Table) -> pa.Table:
        flags = batch.column("is_new").to_numpy(zero_copy_only=False)
        sigt = hasher(batch.drop_columns(["is_new"]))
        ids = sigt.column("doc_id").to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "is_new": pa.array([], type=pa.int8()),
                 "bucket": pa.array([], type=pa.uint64())}
            )
        sig = np.array(sigt.column("sig").to_pylist(), dtype=np.uint64)
        out_id, out_new, out_bucket = [], [], []
        for bi in range(bands):
            band = sig[:, bi * rows : (bi + 1) * rows]
            h = np.zeros(len(ids), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for c in range(rows):
                    h = h * np.uint64(1099511628211) + band[:, c]
            out_id.append(ids)
            out_new.append(flags)
            out_bucket.append((np.uint64(bi) << np.uint64(56)) ^ (h >> np.uint64(8)))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id)),
                "is_new": pa.array(np.concatenate(out_new)),
                "bucket": pa.array(np.concatenate(out_bucket)),
            }
        )

    buckets = docs.map_batches(to_buckets, batch_format="pyarrow")

    def coarse(batch: pa.Table) -> pa.Table:
        bk = batch.column("bucket").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "cb", pa.array((bk % np.uint64(64)).astype(np.int32))
        )

    def cand(group: pa.Table) -> pa.Table:
        bk = group.column("bucket").to_numpy(zero_copy_only=False)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        nw = group.column("is_new").to_numpy(zero_copy_only=False)
        _assert_packable(ids)
        order = np.lexsort((ids, bk))
        bk, ids, nw = bk[order], ids[order], nw[order]
        starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        ends = np.r_[starts[1:], len(bk)]
        keys = []
        for st, en in zip(starts, ends):
            docs_seg, first = np.unique(ids[st:en], return_index=True)
            flags = nw[st:en][first]
            newd = docs_seg[flags == 1]
            if len(newd) == 0 or len(docs_seg) < 2:
                continue  # old x old pairs never form
            a = np.repeat(newd, len(docs_seg))
            b = np.tile(docs_seg, len(newd))
            m = a != b
            a, b = a[m], b[m]
            lo = np.minimum(a, b)
            hi = np.maximum(a, b)
            keys.append(np.unique((lo << np.int64(32)) | hi))
        if not keys:
            return pa.table({"key": pa.array([], type=pa.int64())})
        return pa.table({"key": pa.array(np.unique(np.concatenate(keys)))})

    cand_keys = (
        buckets.map_batches(coarse, batch_format="pyarrow")
        .groupby("cb")
        .map_groups(cand, batch_format="pyarrow")
        .groupby("key")
        .count()
        .select_columns(["key"])
    )
    gram_sets = docs.drop_columns(["is_new"]).map_batches(
        _GramSetHasher(n), batch_format="pyarrow"
    )
    paired = _pair_attach(cand_keys, gram_sets, {"grams": pa.list_(pa.uint64())})

    def verify(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy(zero_copy_only=False)
        ga = batch.column("grams_a").combine_chunks()
        gb = batch.column("grams_b").combine_chunks()
        fa = ga.flatten().to_numpy(zero_copy_only=False)
        fb = gb.flatten().to_numpy(zero_copy_only=False)
        oa = ga.offsets.to_numpy(zero_copy_only=False)
        ob = gb.offsets.to_numpy(zero_copy_only=False)
        out_a, out_b, out_j = [], [], []
        for i in range(len(key)):
            sa = fa[oa[i] : oa[i + 1]]
            sb = fb[ob[i] : ob[i + 1]]
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            u = len(sa) + len(sb) - inter
            j = inter / u if u else 0.0
            if j >= tau:
                out_a.append(int(unpack_hi(key[i])))
                out_b.append(int(key[i] & np.int64(0xFFFFFFFF)))
                out_j.append(float(round_half_away(j, 6)))
        return pa.table(
            {
                "doc_a": pa.array(out_a, type=pa.int64()),
                "doc_b": pa.array(out_b, type=pa.int64()),
                "jaccard": pa.array(out_j, type=pa.float64()),
            }
        )

    return _with_typed_empty(
        paired.map_batches(verify, batch_format="pyarrow"),
        {"doc_a": pa.int64(), "doc_b": pa.int64(), "jaccard": pa.float64()},
    )
