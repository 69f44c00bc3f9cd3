"""Byte-pair-encoding merge learning over the corpus word vocabulary.

The tokenizer-training stage of a training-data pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units" —
public algorithm): learn the top-R greedy merge rules from word
frequencies. No reference analog (the reference is graph-only) — this is
a builder-brief training-data requirement, like the dedup/decontamination
family.

Scale shape
-----------
The corpus is scanned ONCE (per-batch word counts via the shared
``_word_codes`` extractor, dictionary-coded — no per-row python), then
every round runs over the *vocabulary* Dataset (distinct words + counts),
which is orders of magnitude smaller than the corpus but still
dataset-sized at crawl scale, so it is never driver-materialized:

- pair counting = per-batch pre-combined adjacent-pair partials -> one
  coarse-bucket groupby; each bucket group emits only its LOCAL best row,
  so the driver sees <= ``num_buckets`` rows per round (all occurrences of
  a pair land in one bucket, so per-bucket totals are complete and the
  global argmax is among the bucket winners);
- the merge is a shuffle-free vectorized map over the vocabulary
  (flattened symbol arrays, run-grouped non-overlapping match selection);
- loop-carried vocabulary state goes through ``join.loop_barrier``
  (chained lazy lineage re-executes exponentially in Ray 2.49 — see the
  barrier's docstring).

Determinism: merge choice is (count DESC, lhs ASC, rhs ASC) on the raw
symbol strings; words are ``[a-z]+`` (WORD_PATTERN), and UTF-8 byte order
equals code-point order, so numpy/python and DuckDB binary collation sort
identically — the SQL oracle (oracles_sql.bpe_merges_sql) mirrors the
rounds exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.util import splitmix64, text_hash64

_SEP = "\x01"  # pair-key separator; symbols are [a-z]+ so never collides


def _chars_list(words: pa.Array) -> pa.ListArray:
    """StringArray of ``[a-z]+`` words -> list<string> of single-character
    symbols, built directly from the UTF-8 buffer (ASCII contract: one
    byte == one character == one initial symbol). No per-word python."""
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    arr = words.cast(pa.large_string())
    n = len(arr)
    bufs = arr.buffers()
    if n == 0 or bufs[2] is None:
        return pa.ListArray.from_arrays(
            pa.array(np.zeros(n + 1, np.int32)), pa.array([], type=pa.string())
        )
    offsets = np.frombuffer(bufs[1], np.int64, n + 1, offset=arr.offset * 8)
    data = np.frombuffer(bufs[2], np.uint8)
    flat = np.ascontiguousarray(data[offsets[0] : offsets[-1]])
    if flat.size and flat.max() >= 128:
        raise ValueError("bpe vocabulary must be ASCII ([a-z]+ words)")
    ch_off = np.arange(len(flat) + 1, dtype=np.int32)
    values = pa.Array.from_buffers(
        pa.string(),
        len(flat),
        [None, pa.py_buffer(ch_off.tobytes()), pa.py_buffer(flat.tobytes())],
    )
    lo = (offsets - offsets[0]).astype(np.int32)
    return pa.ListArray.from_arrays(pa.array(lo), values)


def _flatten_syms(batch: pa.Table):
    """(flat object ndarray of symbols, row index per position, n_rows)."""
    syms = batch.column("syms")
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    n = len(syms)
    lens = np.asarray(
        pa.compute.list_value_length(syms).to_numpy(zero_copy_only=False),
        dtype=np.int64,
    )
    flat = np.asarray(syms.flatten().to_numpy(zero_copy_only=False), dtype=object)
    row = np.repeat(np.arange(n, dtype=np.int64), lens)
    return flat, row, n


def vocab_dataset(docs_ds, text_col: str = "text", num_buckets: int = 32):
    """documents -> (word, cnt, syms) vocabulary Dataset. One corpus scan
    (dictionary-coded per-batch counts), one word-hash bucket groupby."""
    B = np.uint64(num_buckets)

    def partial(batch: pa.Table) -> pa.Table:
        from raylink.ops.textstats import _word_codes

        text = pa.compute.fill_null(batch.column(text_col).combine_chunks(), "")
        _, codes, dictionary = _word_codes(text)
        cnt = np.bincount(codes, minlength=len(dictionary)).astype(np.int64)
        bk = (splitmix64(text_hash64(dictionary)) % B).astype(np.int32)
        return pa.table(
            {"bk": pa.array(bk), "word": dictionary, "cnt": pa.array(cnt)}
        )

    def combine(group: pa.Table) -> pa.Table:
        w = group.column("word")
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        enc = w.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cnt = group.column("cnt").to_numpy(zero_copy_only=False)
        s = np.zeros(len(enc.dictionary), np.int64)
        np.add.at(s, codes, cnt)
        words = enc.dictionary
        return pa.table(
            {"word": words, "cnt": pa.array(s), "syms": _chars_list(words)}
        )

    return (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bk")
        .map_groups(combine, batch_format="pyarrow")
    )


_EMPTY_PAIRS = pa.table(
    {
        "bk": pa.array([], type=pa.int32()),
        "lhs": pa.array([], type=pa.string()),
        "rhs": pa.array([], type=pa.string()),
        "cnt": pa.array([], type=pa.int64()),
    }
)


def _best_pair(vocab_ds, num_buckets: int):
    """Global best adjacent pair (count DESC, lhs ASC, rhs ASC) or None.

    Per-batch pre-combined pair partials -> bucket groupby -> per-bucket
    LOCAL winner -> driver picks among <= num_buckets rows."""
    B = np.uint64(num_buckets)

    def pairs_partial(batch: pa.Table) -> pa.Table:
        flat, row, _ = _flatten_syms(batch)
        cnt = batch.column("cnt").to_numpy(zero_copy_only=False)
        if flat.size < 2:
            return _EMPTY_PAIRS
        ok = row[:-1] == row[1:]
        if not ok.any():
            return _EMPTY_PAIRS
        li = flat[:-1][ok]
        ri = flat[1:][ok]
        w = cnt[row[:-1][ok]]
        key = li + _SEP + ri
        uk, first, inv = np.unique(key, return_index=True, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, w)
        ks = pa.array(uk.tolist(), type=pa.string())
        bk = (splitmix64(text_hash64(ks)) % B).astype(np.int32)
        return pa.table(
            {
                "bk": pa.array(bk),
                "lhs": pa.array(li[first].tolist(), type=pa.string()),
                "rhs": pa.array(ri[first].tolist(), type=pa.string()),
                "cnt": pa.array(s),
            }
        )

    def local_best(group: pa.Table) -> pa.Table:
        lhs = np.asarray(group.column("lhs").to_numpy(zero_copy_only=False), object)
        rhs = np.asarray(group.column("rhs").to_numpy(zero_copy_only=False), object)
        c = group.column("cnt").to_numpy(zero_copy_only=False)
        key = lhs + _SEP + rhs
        uk, first, inv = np.unique(key, return_index=True, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, c)
        m = s == s.max()
        # ties are few: python min over the tied candidates only
        l_m, r_m = lhs[first][m], rhs[first][m]
        bl, br = min(zip(l_m, r_m))
        return pa.table(
            {
                "lhs": pa.array([bl], type=pa.string()),
                "rhs": pa.array([br], type=pa.string()),
                "cnt": pa.array([int(s.max())], type=pa.int64()),
            }
        )

    winners = (
        vocab_ds.map_batches(pairs_partial, batch_format="pyarrow")
        .groupby("bk")
        .map_groups(local_best, batch_format="pyarrow")
        .take_all()
    )  # <= num_buckets rows
    if not winners:
        return None
    best = max(winners, key=lambda r: (r["cnt"], _NegStr(r["lhs"]), _NegStr(r["rhs"])))
    return best["lhs"], best["rhs"], int(best["cnt"])


class _NegStr:
    """Reverse-order string wrapper so max() picks (cnt DESC, str ASC)."""

    __slots__ = ("s",)

    def __init__(self, s: str) -> None:
        self.s = s

    def __lt__(self, other: "_NegStr") -> bool:
        return self.s > other.s

    def __eq__(self, other: object) -> bool:
        return isinstance(other, _NegStr) and self.s == other.s


def _merge_flat(flat: np.ndarray, row: np.ndarray, lhs: str, rhs: str):
    """Apply one merge rule to flattened (symbol, row) arrays: replace
    non-overlapping left-to-right (lhs, rhs) occurrences with the
    concatenated symbol, vectorized: matches are run-grouped by positional
    adjacency (consecutive matched positions are provably within one word)
    and even offsets within a run are kept — exactly the sequential greedy
    scan's result. -> (flat, row)."""
    if flat.size >= 2:
        m = (flat[:-1] == lhs) & (flat[1:] == rhs) & (row[:-1] == row[1:])
        idx = np.flatnonzero(m)
    else:
        idx = np.empty(0, np.int64)
    if not idx.size:
        return flat, row
    new_run = np.ones(idx.size, bool)
    new_run[1:] = idx[1:] != idx[:-1] + 1
    run_id = np.cumsum(new_run) - 1
    starts = idx[new_run]
    kept = idx[(idx - starts[run_id]) % 2 == 0]
    drop = np.zeros(flat.size, bool)
    drop[kept + 1] = True
    out = flat.copy()
    out[kept] = lhs + rhs
    keep_mask = ~drop
    return out[keep_mask], row[keep_mask]


def _merge_pair(vocab_ds, lhs: str, rhs: str):
    """One merge round over the vocabulary Dataset (shuffle-free map)."""

    def apply(batch: pa.Table) -> pa.Table:
        flat, row, n = _flatten_syms(batch)
        out, row = _merge_flat(flat, row, lhs, rhs)
        counts = np.bincount(row, minlength=n)
        offs = np.zeros(n + 1, np.int32)
        np.cumsum(counts, out=offs[1:])
        syms_new = pa.ListArray.from_arrays(
            pa.array(offs), pa.array(out.tolist(), type=pa.string())
        )
        return pa.table(
            {
                "word": batch.column("word"),
                "cnt": batch.column("cnt"),
                "syms": syms_new,
            }
        )

    return vocab_ds.map_batches(apply, batch_format="pyarrow")


def bpe_merges(
    docs_ds,
    rounds: int = 6,
    text_col: str = "text",
    num_buckets: int = 32,
) -> pa.Table:
    """Learn the top-``rounds`` BPE merge rules from the corpus.

    -> pa.Table (round:int64, lhs, rhs, merged:string, cnt:int64), one row
    per learned rule in learning order; ``cnt`` is the pair's exact corpus
    frequency (weighted by word count) at selection time. Stops early if
    the vocabulary runs out of adjacent pairs. The driver holds R rule
    rows + <= num_buckets candidate rows per round — never the vocabulary.
    """
    import uuid

    from raylink.join import loop_barrier, loop_barrier_cleanup

    # unique per call: cleanup must not touch a concurrent run's snapshots
    tag = f"bpe-{uuid.uuid4().hex[:8]}"
    vocab = loop_barrier(vocab_dataset(docs_ds, text_col, num_buckets), tag=tag)
    rows: list[dict] = []
    try:
        for r in range(rounds):
            best = _best_pair(vocab, num_buckets)
            if best is None:
                break
            lhs, rhs, cnt = best
            rows.append(
                {"round": r, "lhs": lhs, "rhs": rhs, "merged": lhs + rhs, "cnt": cnt}
            )
            if r < rounds - 1:
                vocab = loop_barrier(_merge_pair(vocab, lhs, rhs), tag=tag)
    finally:
        loop_barrier_cleanup(tag)
    return pa.table(
        {
            "round": pa.array([x["round"] for x in rows], type=pa.int64()),
            "lhs": pa.array([x["lhs"] for x in rows], type=pa.string()),
            "rhs": pa.array([x["rhs"] for x in rows], type=pa.string()),
            "merged": pa.array([x["merged"] for x in rows], type=pa.string()),
            "cnt": pa.array([x["cnt"] for x in rows], type=pa.int64()),
        }
    )


class BPETokenCounter:
    """Tokenizer-inference stage (actor pool): count per-doc subword tokens
    under a learned merge table. The merge list is tiny (R rules) and lives
    in the actor; each batch re-derives its OWN vocabulary (dictionary
    codes), applies the R merges to that vocabulary's symbol arrays (merging
    is per-word and the rule order is fixed, so the result equals applying
    them to the global vocabulary), and sums symbols per doc — shuffle-free,
    no per-row python."""

    def __init__(self, merges: list[tuple[str, str]], text_col: str = "text"):
        self.merges = list(merges)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from raylink.ops.textstats import _word_codes

        text = pa.compute.fill_null(
            batch.column(self.text_col).combine_chunks(), ""
        )
        n = len(text)
        doc_idx, codes, dictionary = _word_codes(text)
        syms = _chars_list(dictionary)
        lens = np.diff(syms.offsets.to_numpy(zero_copy_only=False))
        flat = np.asarray(syms.values.to_numpy(zero_copy_only=False), object)
        row = np.repeat(np.arange(len(dictionary), dtype=np.int64), lens)
        for lhs, rhs in self.merges:
            flat, row = _merge_flat(flat, row, lhs, rhs)
        n_syms = np.bincount(row, minlength=len(dictionary)).astype(np.int64)
        out = np.zeros(n, np.int64)
        np.add.at(out, doc_idx, n_syms[codes])
        return pa.table(
            {"doc_id": batch.column("doc_id"), "n_bpe_tokens": pa.array(out)}
        )


def bpe_token_count(
    docs_ds,
    merges: list[tuple[str, str]] | None = None,
    rounds: int = 6,
    text_col: str = "text",
    num_buckets: int = 32,
    concurrency=(1, 8),
):
    """Train-then-apply: learn ``rounds`` merges (unless given) and count
    per-doc subword tokens -> Dataset (doc_id, n_bpe_tokens)."""
    if merges is None:
        mt = bpe_merges(
            docs_ds, rounds=rounds, text_col=text_col, num_buckets=num_buckets
        )
        merges = list(zip(mt.column("lhs").to_pylist(), mt.column("rhs").to_pylist()))
    return docs_ds.map_batches(
        BPETokenCounter,
        fn_constructor_args=(merges, text_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
