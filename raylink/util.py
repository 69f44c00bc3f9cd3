"""Deterministic hashing / partitioning helpers (vectorized, numpy).

The reference encodes partition into ids by bit-packing
(LongTextAdjacencyListReader.java:97-98,293-294). We keep the same idea:
``sgid = local_idx | (part << 32)`` but choose the *partitioner* explicitly:

- ``mod_partitioner``  : ``vid % P`` — trivially SQL-expressible, used by the
  oracle-checked subgraph queries.
- ``hash_partitioner`` : splitmix64-scrambled ``vid`` — the production default;
  robust to structured id spaces (sequential crawl ids would otherwise put
  neighbouring pages in the same partition and skew boundary traffic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

U64 = np.uint64
MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64/int64 arrays."""
    z = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        z += U64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> U64(30))) * U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> U64(27))) * U64(0x94D049BB133111EB)
        z = z ^ (z >> U64(31))
    return z


def splitmix64_inplace(z: np.ndarray, tmp: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer computed IN PLACE on uint64 array ``z`` using
    preallocated scratch ``tmp`` (same shape). Bit-identical to
    ``splitmix64``; exists because per-call allocation of large temporaries
    dominates wall time on the minhash hot path (first-touch page faults on
    fresh mmap'd buffers cost ~10x the arithmetic)."""
    with np.errstate(over="ignore"):
        z += U64(0x9E3779B97F4A7C15)
        np.right_shift(z, U64(30), out=tmp)
        z ^= tmp
        z *= U64(0xBF58476D1CE4E5B9)
        np.right_shift(z, U64(27), out=tmp)
        z ^= tmp
        z *= U64(0x94D049BB133111EB)
        np.right_shift(z, U64(31), out=tmp)
        z ^= tmp
    return z


def hash_partitioner(vids: np.ndarray, num_parts: int) -> np.ndarray:
    return (splitmix64(vids) % U64(num_parts)).astype(np.int32)


def mod_partitioner(vids: np.ndarray, num_parts: int) -> np.ndarray:
    return (vids.astype(np.int64) % np.int64(num_parts)).astype(np.int32)


PARTITIONERS = {"hash": hash_partitioner, "mod": mod_partitioner}


def isin_sorted(
    haystack: np.ndarray, needles: np.ndarray, return_pos: bool = False
):
    """Membership of each needle in a SORTED haystack — the
    searchsorted + bounds-clamp + equality idiom, in one place.
    With ``return_pos`` also returns the insertion positions (valid as
    haystack indices wherever the mask is True)."""
    if len(haystack) == 0:
        hit = np.zeros(len(needles), dtype=bool)
        return (hit, np.zeros(len(needles), dtype=np.int64)) if return_pos else hit
    pos = np.searchsorted(haystack, needles)
    hit = (pos < len(haystack)) & (
        haystack[np.minimum(pos, len(haystack) - 1)] == needles
    )
    return (hit, pos) if return_pos else hit


def route_parts(shard: dict, ctx: dict, dsts: np.ndarray) -> np.ndarray:
    """Destination partition of each message target.

    Function partitioners ('hash' / 'mod') compute it; the 'explicit'
    partitioner (pre-partitioned inputs, the reference's FullInfoSplitReader
    family, FullInfoSplitReader.java:55-66) looks it up in the shard's
    stored target->part arrays. Every BSP message in the engine targets a
    CSR edge endpoint, so the per-shard (tgt_vids, tgt_parts) arrays cover
    all routable destinations."""
    dsts = np.asarray(dsts, dtype=np.int64)
    if ctx["partitioner"] == "explicit":
        tv, tp = shard["tgt_vids"], shard["tgt_parts"]
        pos = np.searchsorted(tv, dsts)
        ok = (
            (pos < len(tv)) & (tv[np.minimum(pos, max(len(tv) - 1, 0))] == dsts)
            if len(tv)
            else np.zeros(len(dsts), dtype=bool)
        )
        if not ok.all():
            missing = np.unique(dsts[~ok])[:5]
            raise KeyError(
                f"explicit partitioner: no stored partition for message "
                f"targets {missing.tolist()} (not CSR edge endpoints?)"
            )
        return tp[pos].astype(np.int32)
    return PARTITIONERS[ctx["partitioner"]](dsts, ctx["num_parts"])


def unpack_hi(keys):
    """High 32 bits of an (a<<32)|b packed pair key — via an UNSIGNED
    shift: an arithmetic ``>> 32`` on int64 sign-extends keys whose high
    half is >= 2**31, which ``assert_packable`` explicitly permits."""
    arr = np.asarray(keys)
    return (arr.astype(np.uint64) >> np.uint64(32)).astype(np.int64)


def assert_packable(ids: np.ndarray, what: str = "packed pair key") -> None:
    """Enforce the id < 2**32 contract of every (a<<32)|b packed-key
    operator (distinct_edges, triangle_count, dedup pair generation,
    pair_attach). 63-bit ids from ``hash_ids_from_urls`` silently alias
    under the shift — run ``raylink.ids.dense_id_remap`` first to get
    packable dense ids for such corpora."""
    if len(ids) and (int(ids.min()) < 0 or int(ids.max()) >= 1 << 32):
        raise ValueError(
            f"{what}: ids must be in [0, 2**32) for (a<<32)|b packing; "
            f"got range [{int(ids.min())}, {int(ids.max())}] — remap with "
            "raylink.ids.dense_id_remap (hash-assigned 63-bit ids alias "
            "under the 32-bit shift)"
        )


def make_sgid(part: np.ndarray, local_idx: np.ndarray) -> np.ndarray:
    """Reference subgraph-id encoding: local_idx | (part << 32)
    (LongTextAdjacencyListReader.java:293-294).

    Packing contract (same family as ``assert_packable``): local_idx and
    part must each fit 32 bits / 31 bits respectively. local_idx is a
    per-partition running index (bounded by per-shard vertex count) and
    part is the partition number — both orders of magnitude below the bound
    at any partitioning a single shard's memory can hold, so this is a
    structural invariant, not a data-dependent one like vid packing."""
    return (local_idx.astype(np.int64)) | (part.astype(np.int64) << np.int64(32))


def round_half_away(x, decimals: int = 6):
    """Round half away from zero — matches DuckDB/C ROUND() tie-breaking
    (numpy's np.round is half-even, which diverges on exact binary midpoints
    like 69/128 = 0.5390625). Used wherever results are compared to SQL."""
    x = np.asarray(x, dtype=np.float64)
    p = 10.0**decimals
    return np.copysign(np.floor(np.abs(x) * p + 0.5) / p, x)


def pearson_partials(x: np.ndarray, y: np.ndarray) -> dict:
    """The 6-scalar integer Pearson partial for one batch — {n, sx, sy,
    sxy, sxx, syy}, each an exact python int destined for an int64 column —
    with an explicit overflow guard (ADVICE r4): numpy int64 products wrap
    silently, while the DuckDB oracle's SUM(BIGINT) promotes to HUGEINT, so
    a hub with degree d in a batch of b rows is only exact while
    b * d^2 < 2^63 (d ~ 3e6 at b = 1e6 rows — far above any web host's
    degree at this repo's partition sizes, but reachable on a pathological
    supernode). Rather than diverge from the oracle, raise: the caller
    should shard the batch (smaller batch_size) or pre-scale the metric."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    n = len(x)
    mx = int(np.abs(x).max(initial=0))
    my = int(np.abs(y).max(initial=0))
    worst = max(mx * mx, my * my, mx * my)
    if n and worst and worst > (2**63 - 1) // n:
        raise OverflowError(
            f"int64 Pearson partials would wrap: batch n={n}, "
            f"max|x|={mx}, max|y|={my}; reduce batch_size or rescale"
        )
    return {
        "n": n, "sx": int(x.sum()), "sy": int(y.sum()),
        "sxy": int((x * y).sum()), "sxx": int((x * x).sum()),
        "syy": int((y * y).sum()),
    }


def hash64_str(texts) -> np.ndarray:
    """General-corpus 64-bit string id: splitmix64-finalized FNV-1a of the
    utf-8 bytes, returned as non-negative int64 (top bit cleared so ids fit
    every signed-int64 code path).

    Collision note: with a 63-bit space, expected collisions ~ n^2 / 2^64 —
    negligible below ~10^9 urls; a 10^12-url crawl expects ~5*10^4 colliding
    pairs, so at that scale assign ids with a 128-bit digest + dedup pass
    instead (documented limitation, same as any 64-bit id scheme)."""
    return (splitmix64(text_hash64(texts)) >> U64(1)).astype(np.int64)


FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)


def text_hash64(texts) -> np.ndarray:
    """Stable 64-bit FNV-1a hash of strings, vectorized position-parallel.

    FNV-1a is sequential over each string's bytes but independent ACROSS
    strings, so the loop runs over byte POSITIONS (one numpy xor+multiply
    over all still-active strings per position) instead of over every byte
    in python — the same pattern as ``rolling_hash``
    (raylink/ops/textstats.py). Bit-identical to the scalar reference
    implementation (property-tested), which matters because the MinHash /
    SimHash / n-gram SQL oracles mirror these exact values.

    Accepts a python list of strings or a pyarrow (Chunked)Array; utf-8
    encoding and the concatenated byte buffer come zero-copy from Arrow.
    Strings are processed longest-first so the active set at each position
    is a contiguous prefix (no boolean masks in the hot loop). Cost:
    O(max_len) numpy kernel launches + O(total_bytes) work."""
    if isinstance(texts, pa.ChunkedArray):
        arr = texts.combine_chunks()
    elif isinstance(texts, pa.Array):
        arr = texts
    else:
        arr = pa.array(texts, type=pa.string())
    arr = arr.cast(pa.large_string())
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if arr.null_count:
        arr = arr.fill_null("")
    buf_b = arr.buffers()
    offsets = np.frombuffer(buf_b[1], dtype=np.int64, count=n + 1,
                            offset=arr.offset * 8)
    data = np.frombuffer(buf_b[2], dtype=np.uint8) if buf_b[2] is not None \
        else np.empty(0, dtype=np.uint8)
    starts = offsets[:-1]
    lens = offsets[1:] - starts
    return fnv1a_ranges(data, starts, lens)


def fnv1a_ranges(data: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """FNV-1a of arbitrary (possibly overlapping) byte ranges of ``data``,
    position-parallel. This is the shingle kernel: n-gram substrings of one
    normalized document string are hashed directly as ranges — no per-gram
    python string is ever built."""
    n = len(starts)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    order = np.argsort(-lens, kind="stable")
    s_ord = starts[order]
    l_ord = lens[order]
    L = int(l_ord[0]) if n else 0
    # active count at byte position j = #ranges with len > j
    cnt = np.bincount(lens, minlength=L + 1)
    n_active = n - np.cumsum(cnt)
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(L):
            k = int(n_active[j])
            v = h[:k]
            v ^= data[s_ord[:k] + j]
            v *= FNV_PRIME
    out = np.empty(n, dtype=np.uint64)
    out[order] = h
    return out


def text_hash64_scalar(texts) -> np.ndarray:
    """Reference scalar FNV-1a (python loop per byte) — kept as the
    property-test oracle for ``text_hash64``."""
    out = np.empty(len(texts), dtype=np.uint64)
    fnv_offset = 0xCBF29CE484222325
    fnv_prime = 0x100000001B3
    mask = 0xFFFFFFFFFFFFFFFF
    for i, t in enumerate(texts):
        h = fnv_offset
        for b in (t or "").encode("utf-8"):
            h = ((h ^ b) * fnv_prime) & mask
        out[i] = h
    return out
