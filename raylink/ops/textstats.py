"""Text analysis over the ``documents`` table: token counting, quality
scoring, language identification (n-gram/stopword heuristic), document
fingerprinting.

Every scalar rule here is deliberately expressible in ANSI SQL so the driver
can cross-check the Ray pipeline against DuckDB (see ``__ray_entry__``). All
stages are vectorized-per-batch ``map_batches`` callables; ``TextStats`` is a
callable class (actor pool) so regexes compile once per actor.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from raylink.util import isin_sorted, round_half_away, unpack_hi

TOKEN_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"
WORD_PATTERN = r"[a-z]+"
CJK_PATTERN = "[一-鿿]"

# ascii-only stopword sets (RE2/Python regex parity; see lang_id rule below)
STOP_EN = ("the", "and", "of", "to", "in", "is", "that", "for", "a", "with")
STOP_DE = ("der", "die", "und", "das", "nicht", "ist", "zu", "ein", "den", "von")
STOP_FR = ("le", "la", "les", "et", "des", "est", "un", "une", "du", "dans")
STOP_ES = ("el", "los", "las", "y", "es", "un", "una", "por", "con", "para")


def _word_codes(text: pa.Array):
    """lower(text) -> ``[a-z]+`` word OCCURRENCES, fully Arrow-vectorized:
    (doc_idx int64 per occurrence, dictionary code per occurrence,
    dictionary StringArray). The extraction rule equals
    ``re.findall(WORD_PATTERN, text.lower())``: split on the complement
    regex and drop boundary empties. Dictionary codes make every
    downstream count exact string equality with no per-doc Python."""
    import pyarrow.compute as pc

    n = len(text)
    words_list = pc.split_pattern_regex(pc.utf8_lower(text), pattern="[^a-z]+")
    lens = pc.list_value_length(words_list).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(words_list)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    keep = pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
    if not keep.all():
        flat = flat.filter(pa.array(keep))
        doc_idx = doc_idx[keep]
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return doc_idx, codes, enc.dictionary


def _stop_hits(doc_idx, codes, dictionary, stopset, n) -> np.ndarray:
    """Per-doc occurrence count of words in ``stopset`` — one python pass
    over the (small) batch VOCABULARY, vectorized over occurrences."""
    mask = np.fromiter(
        (w in stopset for w in dictionary.to_pylist()), bool, len(dictionary)
    )
    return np.bincount(doc_idx[mask[codes]], minlength=n).astype(np.int64)


class TextStats:
    """documents batch -> per-doc stats.

    Output columns (all mirrored 1:1 in oracle SQL):
      doc_id, n_chars, n_tokens, n_words, n_uniq_words, stop_ratio (r6),
      quality (r6), keep (bool)
    Quality rule (C4-ish): keep iff n_words >= 10 and 2 <= avg word length
    <= 12; quality = min(n_words,50)/50 * 0.5 + min(stop_ratio,0.4)/0.4 * 0.5.

    (r4) vectorized: words via ``_word_codes``; n_tokens as the sum of two
    disjoint RE2 match counts (alnum runs + lone non-alnum-non-space chars
    — the same partition TOKEN_PATTERN's alternation produces), aligning
    the engine with the DuckDB oracle's RE2 semantics. Every ratio is the
    identical IEEE division sequence the per-doc loop performed.
    """

    def __init__(self) -> None:
        self.stop_en = frozenset(STOP_EN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        n = len(text)
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        n_tokens = (
            pc.count_substring_regex(text, pattern="[A-Za-z0-9]+")
            .to_numpy(zero_copy_only=False)
            + pc.count_substring_regex(text, pattern=r"[^A-Za-z0-9\s]")
            .to_numpy(zero_copy_only=False)
        ).astype(np.int64)

        doc_idx, codes, dic = _word_codes(text)
        n_words = np.bincount(doc_idx, minlength=n).astype(np.int64)
        ukey = np.unique((doc_idx << np.int64(32)) | codes)
        n_uniq = np.bincount(
            (unpack_hi(ukey)).astype(np.int64), minlength=n
        ).astype(np.int64)
        ns = _stop_hits(doc_idx, codes, dic, self.stop_en, n)
        wlen = pc.utf8_length(dic).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        wchars = np.zeros(n, dtype=np.int64)
        np.add.at(wchars, doc_idx, wlen[codes])

        sr = np.zeros(n, dtype=np.float64)
        np.divide(ns, n_words, out=sr, where=n_words > 0)
        avg = np.zeros(n, dtype=np.float64)
        np.divide(wchars, n_words, out=avg, where=n_words > 0)
        keep = (n_words >= 10) & (avg >= 2.0) & (avg <= 12.0)
        quality = round_half_away(
            np.minimum(n_words, 50) / 50.0 * 0.5
            + np.minimum(sr, 0.4) / 0.4 * 0.5,
            6,
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pa.array(n_chars),
                "n_tokens": pa.array(n_tokens),
                "n_words": pa.array(n_words),
                "n_uniq_words": pa.array(n_uniq),
                "stop_ratio": pa.array(round_half_away(sr, 6)),
                "quality": pa.array(quality),
                "keep": pa.array(keep),
            }
        )


class LangId:
    """Stopword/CJK-heuristic language id -> (doc_id, pred_lang).

    Rule (mirrored in SQL): CJK chars present -> 'zh'; else argmax of
    per-language stopword hit counts with tie order en > de > fr > es;
    all-zero -> 'und'.
    """

    def __init__(self) -> None:
        self.sets = [
            ("en", frozenset(STOP_EN)),
            ("de", frozenset(STOP_DE)),
            ("fr", frozenset(STOP_FR)),
            ("es", frozenset(STOP_ES)),
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        n = len(text)
        cjk = (
            pc.count_substring_regex(text, pattern=CJK_PATTERN)
            .to_numpy(zero_copy_only=False) > 0
        )
        doc_idx, codes, dic = _word_codes(text)
        counts = np.stack(
            [_stop_hits(doc_idx, codes, dic, s, n) for _, s in self.sets]
        )
        best = counts.max(axis=0)
        # argmax takes the FIRST maximal row -> tie order en > de > fr > es
        langs = np.array([nm for nm, _ in self.sets])[counts.argmax(axis=0)]
        preds = np.where(cjk, "zh", np.where(best == 0, "und", langs))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pred_lang": pa.array(preds.tolist(), type=pa.string()),
            }
        )


def token_topk(docs_ds, k: int = 100):
    """Global top-k most frequent lowercase word tokens -> Dataset
    (token, cnt), ordered (cnt desc, token asc) — vocabulary building.

    Shape: per-batch partial counts (one row per distinct token per batch,
    NOT per occurrence) -> one groupby sum over the vocabulary-sized table
    -> distributed sort + limit. The full corpus never leaves the workers;
    only distinct-token rows shuffle. (r4) vectorized: the batch vocabulary
    falls straight out of ``_word_codes``' dictionary encode."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        _, codes, dic = _word_codes(text)
        c = np.bincount(codes, minlength=len(dic)).astype(np.int64)
        return pa.table(
            {
                "token": pc.cast(dic, pa.string()),
                "c": pa.array(c),
            }
        )

    agg = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .sum("c")
        .map_batches(
            lambda b: pa.table({"token": b.column("token"), "cnt": b.column("sum(c)")}),
            batch_format="pyarrow",
        )
    )
    return agg.sort(["cnt", "token"], descending=[True, False]).limit(k)


def bigram_topk(docs_ds, k: int = 100):
    """Global top-k most frequent ADJACENT lowercase word pairs -> Dataset
    (bigram "w1 w2", cnt), ordered (cnt desc, bigram asc) — the n-gram LM /
    collocation-mining primitive next to ``token_topk``.

    Shape identical to ``token_topk``: per-batch partial counts keyed on
    packed dictionary-code pairs (one row per distinct pair per batch, the
    pair STRING built once per distinct pair, never per occurrence) -> one
    vocabulary-sized groupby sum -> distributed sort + limit. Adjacency
    falls out of ``_word_codes``' flattened order (document order), pairs
    never straddle documents."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        doc_idx, codes, dic = _word_codes(text)
        if len(doc_idx) < 2:
            return pa.table(
                {"bigram": pa.array([], type=pa.string()),
                 "c": pa.array([], type=pa.int64())}
            )
        adj = doc_idx[1:] == doc_idx[:-1]
        V = np.int64(len(dic))
        pid = codes[:-1][adj] * V + codes[1:][adj]
        upid, c = np.unique(pid, return_counts=True)
        left = dic.take(pa.array(upid // V))
        right = dic.take(pa.array(upid % V))
        return pa.table(
            {
                "bigram": pc.binary_join_element_wise(
                    pc.cast(left, pa.string()), pc.cast(right, pa.string()), " "
                ),
                "c": pa.array(c.astype(np.int64)),
            }
        )

    agg = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .sum("c")
        .map_batches(
            lambda b: pa.table(
                {"bigram": b.column("bigram"), "cnt": b.column("sum(c)")}
            ),
            batch_format="pyarrow",
        )
    )
    return agg.sort(["cnt", "bigram"], descending=[True, False]).limit(k)


def bigram_coherence(docs_ds, num_buckets: int = 64):
    """Per-document bigram coherence — the n-gram-LM fluency proxy of the
    curation stack: score(doc) = mean over the doc's adjacent word pairs of
    that pair's CORPUS frequency (docs made of common collocations score
    high; shuffled/garbage text scores ~1). -> Dataset (doc_id, n_bigrams,
    freq_sum, coherence); bigram-less docs (len < 2 words) score 0.0.

    Two passes over the bigram relation, neither driver-side and nothing
    broadcast (the bigram table is vocabulary^2-bounded, NOT small):
      1. global counts: per-batch partials keyed on FNV-1a(bigram) (one
         row per distinct pair per batch), one coarse-bucket sum;
      2. per-doc rollup: (doc_id, bigram-hash, multiplicity) rows joined
         against the counts with ``hash_join(post=...)`` — the per-bucket
         per-doc partial sums happen INSIDE the join task, so the join
         output is per-(bucket, doc) partials, not per-occurrence rows —
         then one coarse-bucket combine per doc_id.
    Integer sums throughout; the score is ONE IEEE division +
    round-half-away(8), bit-equal to the SQL mirror (which groups by the
    bigram STRING — an FNV collision would merge counts and FAIL the
    oracle gate, never pass silently; ~2^-64 per vocab pair, the same
    documented trade as the hashed shingles in ops/dedup.py).
    """
    import pyarrow.compute as pc

    from raylink.join import anti_join, hash_join, with_typed_empty
    from raylink.util import round_half_away, splitmix64, text_hash64

    B = np.uint64(num_buckets)

    def _pair_rows(batch: pa.Table, with_doc: bool) -> pa.Table:
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        doc_idx, codes, dic = _word_codes(text)
        if len(doc_idx) < 2:
            cols = {"bh": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.int64())}
            if with_doc:
                cols["doc_id"] = pa.array([], type=pa.int64())
            return pa.table(cols)
        adj = doc_idx[1:] == doc_idx[:-1]
        V = np.int64(len(dic))
        pid = codes[:-1][adj] * V + codes[1:][adj]
        if with_doc:  # distinct per (doc, pair), keep multiplicity
            key = doc_idx[:-1][adj]
            uk, inv, c = np.unique(
                key * (V * V) + pid, return_inverse=True, return_counts=True
            )
            upid = uk % (V * V)
            udoc = doc_ids[(uk // (V * V)).astype(np.int64)]
        else:
            upid, c = np.unique(pid, return_counts=True)
        left = dic.take(pa.array(upid // V))
        right = dic.take(pa.array(upid % V))
        bigrams = pc.binary_join_element_wise(
            pc.cast(left, pa.string()), pc.cast(right, pa.string()), " "
        )
        bh = text_hash64(bigrams).astype(np.int64)
        cols = {"bh": pa.array(bh), "c": pa.array(c.astype(np.int64))}
        if with_doc:
            cols["doc_id"] = pa.array(udoc)
        return pa.table(cols)

    def count_partial(batch: pa.Table) -> pa.Table:
        t = _pair_rows(batch, with_doc=False)
        return t.append_column(
            "kb",
            pa.array(
                (
                    splitmix64(
                        t.column("bh").to_numpy(zero_copy_only=False).astype(
                            np.uint64
                        )
                    )
                    % B
                ).astype(np.int32)
            ),
        )

    def count_comb(group: pa.Table) -> pa.Table:
        h = group.column("bh").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        uh, inv = np.unique(h, return_inverse=True)
        s = np.zeros(len(uh), dtype=np.int64)
        np.add.at(s, inv, c)
        return pa.table({"bh": pa.array(uh), "cnt": pa.array(s)})

    counts = (
        docs_ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(count_comb, batch_format="pyarrow")
    )

    doc_rows = docs_ds.map_batches(
        lambda b: _pair_rows(b, with_doc=True), batch_format="pyarrow"
    )

    def per_doc_partial(group: pa.Table) -> pa.Table:
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        occ = group.column("c").to_numpy(zero_copy_only=False)
        cnt = group.column("cnt").to_numpy(zero_copy_only=False)
        ud, inv = np.unique(d, return_inverse=True)
        ssum = np.zeros(len(ud), dtype=np.int64)
        nbg = np.zeros(len(ud), dtype=np.int64)
        np.add.at(ssum, inv, occ * cnt)
        np.add.at(nbg, inv, occ)
        return pa.table(
            {"doc_id": pa.array(ud), "ssum": pa.array(ssum),
             "nbg": pa.array(nbg)}
        )

    partials = hash_join(
        doc_rows, counts, on="bh",
        left_cols={"doc_id": pa.int64(), "c": pa.int64()},
        right_cols={"cnt": pa.int64()},
        post=per_doc_partial,
    )

    def doc_bucket(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "db",
            pa.array((splitmix64(d.astype(np.uint64)) % B).astype(np.int32)),
        )

    def doc_comb(group: pa.Table) -> pa.Table:
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        s1 = group.column("ssum").to_numpy(zero_copy_only=False)
        s2 = group.column("nbg").to_numpy(zero_copy_only=False)
        ud, inv = np.unique(d, return_inverse=True)
        ssum = np.zeros(len(ud), dtype=np.int64)
        nbg = np.zeros(len(ud), dtype=np.int64)
        np.add.at(ssum, inv, s1)
        np.add.at(nbg, inv, s2)
        coh = np.zeros(len(ud), dtype=np.float64)
        pos = nbg > 0
        coh[pos] = round_half_away(
            ssum[pos].astype(np.float64) / nbg[pos], 8
        )
        return pa.table(
            {"doc_id": pa.array(ud), "n_bigrams": pa.array(nbg),
             "freq_sum": pa.array(ssum),
             "coherence": pa.array(coh)}
        )

    scored = (
        partials.map_batches(doc_bucket, batch_format="pyarrow")
        .groupby("db")
        .map_groups(doc_comb, batch_format="pyarrow")
    )
    ids = docs_ds.map_batches(
        lambda b: pa.table({"doc_id": b.column("doc_id")}),
        batch_format="pyarrow",
    )
    zeros = anti_join(
        ids, scored, on="doc_id", left_cols={}
    ).map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("doc_id"),
             "n_bigrams": pa.array(np.zeros(len(b), dtype=np.int64)),
             "freq_sum": pa.array(np.zeros(len(b), dtype=np.int64)),
             "coherence": pa.array(np.zeros(len(b), dtype=np.float64))}
        ),
        batch_format="pyarrow",
    )
    return with_typed_empty(
        scored.union(zeros),
        {"doc_id": pa.int64(), "n_bigrams": pa.int64(),
         "freq_sum": pa.int64(), "coherence": pa.float64()},
    )


PII_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_IPV4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_LONGNUM = r"\b[0-9]{9,16}\b"  # SSN/CC/phone-class digit runs


def pii_scan(docs_ds):
    """PII-pattern counts per document -> (doc_id, n_emails, n_ipv4,
    n_longnums, has_pii) — the pre-redaction scan of a curation pipeline
    (flag or route docs containing contact/identifier strings).

    Patterns are RE2-safe (no backrefs/lookarounds) and evaluated with
    Arrow's ``count_substring_regex`` — fully vectorized over the batch,
    shuffle-free, and mirrored verbatim in the DuckDB oracle (both engines
    run RE2 semantics, so counts agree exactly)."""
    import pyarrow.compute as pc

    def scan(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        em = pc.count_substring_regex(text, pattern=PII_EMAIL) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ip = pc.count_substring_regex(text, pattern=PII_IPV4) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ln = pc.count_substring_regex(text, pattern=PII_LONGNUM) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_emails": pa.array(em),
                "n_ipv4": pa.array(ip),
                "n_longnums": pa.array(ln),
                "has_pii": pa.array((em + ip + ln) > 0),
            }
        )

    return docs_ds.map_batches(scan, batch_format="pyarrow")


def postings(docs_ds, min_df: int = 1, max_df: int | None = None,
             num_buckets: int = 64):
    """Inverted-index build: token -> sorted posting list -> Dataset
    (token, df, postings) with ``postings`` the comma-joined ascending
    doc_id list (a string column hashes/compares stably across engines;
    a consumer splits it or writes it to a list<int64> parquet column).

    ``min_df``/``max_df`` bound the index: ``max_df`` drops stopword-class
    tokens whose posting lists would be corpus-sized (the same DF cut as
    ``ops.dedup.ngram_pairs``) — at crawl scale an uncut 'the' row would
    be one multi-GB value.

    Shape: per-batch distinct (token, doc_id) rows (each document lives in
    exactly one batch row, so batch-distinct IS globally distinct) ->
    ONE hash-bucket groupby on the token -> per-bucket fully-Arrow list
    assembly (lexsort + ``pc.binary_join`` over a ListArray; no per-token
    python string building)."""
    import pyarrow.compute as pc

    from raylink.util import splitmix64, text_hash64

    B = np.uint64(num_buckets)

    def rows(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        doc_idx, codes, dic = _word_codes(text)
        ukey = np.unique((doc_idx << np.int64(32)) | codes)
        udoc = (unpack_hi(ukey)).astype(np.int64)
        ucode = (ukey & np.int64(0xFFFFFFFF)).astype(np.int64)
        terms = pc.cast(dic, pa.string()).take(pa.array(ucode))
        b = (splitmix64(text_hash64(dic)[ucode]) % B).astype(
            np.int32
        )
        return pa.table(
            {"b": pa.array(b), "token": terms,
             "doc_id": pa.array(doc_ids[udoc])}
        )

    def assemble(group: pa.Table) -> pa.Table:
        enc = group.column("token").combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        docs = group.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((docs, codes))
        cs, ds_ = codes[order], docs[order]
        seg = np.r_[True, cs[1:] != cs[:-1]]
        starts = np.flatnonzero(seg)
        offsets = np.r_[starts, len(cs)].astype(np.int32)
        df = (offsets[1:] - offsets[:-1]).astype(np.int64)
        keep = df >= min_df
        if max_df is not None:
            keep &= df <= max_df
        lists = pa.ListArray.from_arrays(
            pa.array(offsets), pc.cast(pa.array(ds_), pa.string())
        )
        out = pa.table(
            {
                "token": enc.dictionary.take(pa.array(cs[starts])),
                "df": pa.array(df),
                "postings": pc.binary_join(lists, ","),
            }
        )
        return out.filter(pa.array(keep))

    return (
        docs_ds.map_batches(rows, batch_format="pyarrow")
        .groupby("b")
        .map_groups(assemble, batch_format="pyarrow")
    )


def cooccurrence_topk(docs_ds, window: int = 3, k: int = 100):
    """Top-k co-occurring word pairs within ``window`` positions (the
    skip-gram statistic embedding training consumes) -> Dataset
    (pair "w1 w2" with w1 <= w2 lexicographic, cnt), ordered
    (cnt desc, pair asc). Every ordered occurrence (i, i+d), d=1..window,
    counts once; pairs never straddle documents.

    Same shape as ``bigram_topk``: per-batch counts on packed canonical
    code pairs (codes mapped through the batch dictionary's lexicographic
    rank so min/max on ranks IS string LEAST/GREATEST), pair strings built
    once per distinct pair per batch -> vocabulary-sized groupby sum ->
    distributed sort + limit."""
    import pyarrow.compute as pc

    if window < 1:
        raise ValueError("window must be >= 1")

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        doc_idx, codes, dic = _word_codes(text)
        empty = pa.table(
            {"pair": pa.array([], type=pa.string()),
             "c": pa.array([], type=pa.int64())}
        )
        if len(doc_idx) < 2:
            return empty
        # lexicographic rank of the batch vocabulary (ascii [a-z]+ words:
        # numpy codepoint order == SQL binary collation)
        words = np.asarray(dic.to_pylist())
        order = np.argsort(words)
        rank = np.empty(len(words), dtype=np.int64)
        rank[order] = np.arange(len(words), dtype=np.int64)
        r = rank[codes]
        V = np.int64(len(words))
        pids = []
        for d in range(1, window + 1):
            if len(doc_idx) <= d:
                break
            same = doc_idx[d:] == doc_idx[:-d]
            a, b = r[:-d][same], r[d:][same]
            pids.append(np.minimum(a, b) * V + np.maximum(a, b))
        if not pids:
            return empty
        upid, c = np.unique(np.concatenate(pids), return_counts=True)
        inv = order  # rank -> dictionary code
        left = dic.take(pa.array(inv[upid // V]))
        right = dic.take(pa.array(inv[upid % V]))
        return pa.table(
            {
                "pair": pc.binary_join_element_wise(
                    pc.cast(left, pa.string()), pc.cast(right, pa.string()), " "
                ),
                "c": pa.array(c.astype(np.int64)),
            }
        )

    agg = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("pair")
        .sum("c")
        .map_batches(
            lambda b: pa.table(
                {"pair": b.column("pair"), "cnt": b.column("sum(c)")}
            ),
            batch_format="pyarrow",
        )
    )
    return agg.sort(["cnt", "pair"], descending=[True, False]).limit(k)


def rolling_hash(texts) -> np.ndarray:
    """Vectorized Horner rolling hash h = (h*257 + byte) mod 2^61-1.

    Position-parallel across the batch: one loop over byte POSITIONS (max
    doc length) with numpy ops across all docs, instead of a python loop
    over every byte of every doc (~100x less interpreter time on uniform
    corpora). Mersenne-prime reduction keeps everything in uint64:
    with x = a*2^53 + c, x*257 ≡ a + (c<<8) + x (mod 2^61-1) since
    2^61 ≡ 1; the sum is < 2^62, so two conditional subtracts finish the
    reduction."""
    MOD = np.uint64((1 << 61) - 1)
    M53 = np.uint64((1 << 53) - 1)
    bufs = [np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8) for t in texts]
    n = len(bufs)
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    L = int(lens.max()) if n else 0
    mat = np.zeros((n, L), dtype=np.uint64)
    for i, b in enumerate(bufs):
        mat[i, : len(b)] = b
    h = np.zeros(n, dtype=np.uint64)
    for j in range(L):
        active = np.flatnonzero(lens > j)
        x = h[active]
        x = (x >> np.uint64(53)) + ((x & M53) << np.uint64(8)) + x  # x*257 pre-reduction
        x += mat[active, j]
        x = np.where(x >= MOD, x - MOD, x)
        x = np.where(x >= MOD, x - MOD, x)
        h[active] = x
    return h.astype(np.int64)


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Content fingerprints: md5 hex (SQL-checkable) + 64-bit rolling
    polynomial hash mod 2^61-1 (engine-side shingling primitive)."""
    texts = batch.column("text").to_pylist()
    md5s = [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts]
    rolls = rolling_hash(texts)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fp_md5": pa.array(md5s, type=pa.string()),
            "fp_roll": pa.array(rolls),
        }
    )


def doc_top_terms(docs_ds, k: int = 3, num_buckets: int = 64):
    """Per-document distinctive terms: top-``k`` tokens by ``tf/df`` (term
    frequency over corpus document frequency), ties by term asc ->
    Dataset (doc_id, term, tf, df, score, rk).

    ``tf/df`` is the log-free idf variant: ``ln(N/df)`` is strictly
    decreasing in ``df`` for a fixed corpus, so for tf=1 the ranking equals
    classic tf-idf, and in general it is this engine's documented scoring
    choice — the point is BIT-EXACT cross-engine ordering: the score is one
    IEEE-754 division (correctly rounded, so identical in numpy and SQL),
    where ``ln`` implementations may differ between libms.

    Shape (crawl-scale): per-batch (doc_id, term, tf) rows, bucketed by
    FNV-1a(term) — a bucket group holds ALL rows of its terms, so DF
    (rows per term: one row per distinct (doc, term)) is computed and
    attached inside the SAME group, join + aggregation in ONE shuffle (the
    ``hash_join(post=...)`` insight without the second dataset). Then
    ``group_topk`` per doc (second bucketed shuffle). Term strings shuffle
    once as payload; grouping runs on the int64 hash (the ~2^-65
    per-vocab-pair collision risk is the same documented trade as the
    hashed n-gram shingles in ops/dedup.py — and a collision would merge
    DF counts, never drop rows). Nothing driver-side.
    """
    import pyarrow.compute as pc

    from raylink.ops.select import group_topk
    from raylink.util import splitmix64, text_hash64

    B = np.uint64(num_buckets)

    def tf_rows(batch: pa.Table) -> pa.Table:
        # (r4) vectorized: per-(doc, term) tf from packed (doc_idx, code)
        # keys; terms hashed once per batch VOCABULARY, not per occurrence
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        doc_idx, codes, dic = _word_codes(text)
        ukey, tf = np.unique(
            (doc_idx << np.int64(32)) | codes, return_counts=True
        )
        udoc = (unpack_hi(ukey)).astype(np.int64)
        ucode = (ukey & np.int64(0xFFFFFFFF)).astype(np.int64)
        hdic = text_hash64(dic)
        h = hdic[ucode]
        return pa.table(
            {
                "b": pa.array((splitmix64(h) % B).astype(np.int32)),
                "h": pa.array(h.astype(np.int64)),
                "doc_id": pa.array(doc_ids[udoc]),
                "term": pc.cast(dic, pa.string()).take(pa.array(ucode)),
                "tf": pa.array(tf.astype(np.int64)),
            }
        )

    def attach_df(group: pa.Table) -> pa.Table:
        h = group.column("h").to_numpy(zero_copy_only=False)
        _, inv, cnt = np.unique(h, return_inverse=True, return_counts=True)
        tfv = group.column("tf").to_numpy(zero_copy_only=False)
        dfv = cnt[inv].astype(np.int64)
        return pa.table(
            {
                "doc_id": group.column("doc_id"),
                "term": group.column("term"),
                "tf": group.column("tf"),
                "df": pa.array(dfv),
                "score": pa.array(tfv.astype(np.float64) / dfv),
            }
        )

    scored = (
        docs_ds.map_batches(tf_rows, batch_format="pyarrow")
        .groupby("b")
        .map_groups(attach_df, batch_format="pyarrow")
    )
    return group_topk(
        scored, key_col="doc_id", score_col="score", k=k, id_col="term",
        num_buckets=num_buckets,
    )


def repetition_stats(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signals per document (NLP curation filter:
    docs dominated by repeated words/phrases are boilerplate or spam) ->
    (doc_id, n_words, top_word_frac, dup_char_frac, top_bigram_frac).

      top_word_frac   occurrences of the most frequent word / n_words
      dup_char_frac   chars inside words occurring >1x (ALL occurrences)
                      / total word chars
      top_bigram_frac occurrences of the most frequent adjacent word pair
                      / (n_words - 1)

    Zero-denominator docs report 0.0. Words = ``[a-z]+`` runs of
    lower(text), the same rule as ``TextStats``/``WORD_PATTERN`` — here
    extracted fully vectorized (Arrow ``split_pattern_regex`` on the
    complement + empty-drop; no per-doc Python). Per-(doc,word) counting
    runs on dictionary codes packed with the batch-local doc index — exact
    string equality, no hash collisions. Each fraction is one IEEE division
    + round-half-away(8), bit-equal to the SQL mirror.
    """
    import pyarrow.compute as pc

    n = len(batch)
    doc_ids = batch.column("doc_id")
    text = pc.fill_null(batch.column("text").combine_chunks(), "")
    doc_idx, codes, dic = _word_codes(text)
    wlen = pc.utf8_length(dic).to_numpy(zero_copy_only=False).astype(np.int64)

    n_words = np.bincount(doc_idx, minlength=n).astype(np.int64)
    total_chars = np.zeros(n, dtype=np.int64)
    np.add.at(total_chars, doc_idx, wlen[codes])

    # per-(doc, word) counts on packed keys (doc_idx < 2^31, codes < 2^31)
    key = (doc_idx << np.int64(32)) | codes
    ukey, ucnt = np.unique(key, return_counts=True)
    udoc = (unpack_hi(ukey)).astype(np.int64)
    ucode = (ukey & np.int64(0xFFFFFFFF)).astype(np.int64)
    top_word = np.zeros(n, dtype=np.int64)
    np.maximum.at(top_word, udoc, ucnt)
    dup_chars = np.zeros(n, dtype=np.int64)
    dup = ucnt > 1
    np.add.at(dup_chars, udoc[dup], ucnt[dup] * wlen[ucode[dup]])

    # adjacent word pairs: flattened order IS document order
    V = np.int64(len(dic))
    adj = doc_idx[1:] == doc_idx[:-1] if len(doc_idx) else np.zeros(0, bool)
    top_bigram = np.zeros(n, dtype=np.int64)
    if adj.any():
        pid = (doc_idx[:-1][adj] * V + codes[:-1][adj]) * V + codes[1:][adj]
        upid, upc = np.unique(pid, return_counts=True)
        np.maximum.at(top_bigram, (upid // (V * V)).astype(np.int64), upc)
    n_bigrams = np.maximum(n_words - 1, 0)

    def frac(num: np.ndarray, den: np.ndarray) -> pa.Array:
        out = np.zeros(n, dtype=np.float64)
        nz = den > 0
        out[nz] = num[nz] / den[nz]
        return pa.array(round_half_away(out, 8))

    return pa.table(
        {
            "doc_id": doc_ids,
            "n_words": pa.array(n_words),
            "top_word_frac": frac(top_word, n_words),
            "dup_char_frac": frac(dup_chars, total_chars),
            "top_bigram_frac": frac(top_bigram, n_bigrams),
        }
    )


def remove_boilerplate(docs_ds, min_docs: int, text_col: str = "text",
                       broadcast_threshold: int | None = None,
                       num_buckets: int = 64):
    """CCNet-style boilerplate-line removal: drop every LINE (newline-split
    segment) that occurs verbatim in >= ``min_docs`` DISTINCT documents —
    the template/nav/footer cut that runs before any document-level dedup in
    a crawl curation funnel. -> Dataset (doc_id, clean_text, n_removed,
    n_lines); ``clean_text`` is the kept lines re-joined with newlines in
    original order ('' when every line is boilerplate).

    Shape (two passes over the corpus):
      1. per-batch: split -> FNV-1a per line (``util.text_hash64``, one
         vectorized kernel over the flattened Arrow line buffer) -> per-doc
         dedup -> per-batch partial document-frequency rows (line_hash, df);
      2. one groupby-sum over the line-hash partials (shuffle carries at
         most the distinct-line vocabulary, never the text), filter
         df >= min_docs;
      3. removal, THRESHOLDED like every attach in the engine: while the
         frequent-hash set is small (<= broadcast_threshold — the common
         case: template lines are few by definition) it is ``ray.put`` once
         and the scan is a zero-shuffle sorted-membership pass; above the
         threshold (a permissive min_docs over a vast corpus) the lines
         anti-join the frequent set distributed (rows carry the line text
         once) and docs re-assemble in a doc-bucketed groupby — identical
         output, path-agreement tested.
    Hash equality stands in for line equality (~2^-64 false-drop per
    distinct line pair — the documented trade of every hashed op here; a
    collision can only over-remove, never corrupt kept text)."""
    import pyarrow.compute as pc
    import ray

    from raylink.join import BROADCAST_THRESHOLD, anti_join
    from raylink.util import splitmix64, text_hash64

    if broadcast_threshold is None:
        broadcast_threshold = BROADCAST_THRESHOLD

    def split_lines(batch: pa.Table):
        text = pc.fill_null(batch.column(text_col), "").combine_chunks()
        lines = pc.split_pattern(text.cast(pa.large_string()), "\n")
        flat = pc.list_flatten(lines)
        n_lines = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
        h = text_hash64(flat)
        return lines, flat, n_lines.astype(np.int64), h

    def df_partial(batch: pa.Table) -> pa.Table:
        _, _, n_lines, h = split_lines(batch)
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), n_lines)
        # distinct (doc, line) within the batch (docs are whole per batch)
        order = np.lexsort((h, doc_idx))
        hs, ds_ = h[order], doc_idx[order]
        first = np.r_[True, (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])]
        uh, c = np.unique(hs[first], return_counts=True)
        return pa.table(
            {"h": pa.array(uh.view(np.int64)), "df": pa.array(c.astype(np.int64))}
        )

    def keep_frequent(batch: pa.Table) -> pa.Table:
        m = pc.greater_equal(batch.column("sum(df)"), min_docs)
        return batch.filter(m).select(["h"])

    freq = (
        docs_ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("h")
        .sum("df")
        .map_batches(keep_frequent, batch_format="pyarrow")
        .materialize()
    )
    n_freq = freq.count()

    if n_freq <= broadcast_threshold:
        hs = np.array([r["h"] for r in freq.take_all()], dtype=np.int64)
        boiler = ray.put(np.sort(hs.view(np.uint64)))

        def scan(batch: pa.Table) -> pa.Table:
            b = ray.get(boiler)
            _, flat, n_lines, h = split_lines(batch)
            hit = isin_sorted(b, h)
            doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), n_lines)
            keep = ~hit
            kept_per_doc = np.bincount(doc_idx[keep], minlength=len(batch))
            offsets = np.r_[np.int64(0), np.cumsum(kept_per_doc)]
            kept_lines = pa.LargeListArray.from_arrays(
                pa.array(offsets, type=pa.int64()), flat.filter(pa.array(keep))
            )
            clean = pc.binary_join(
                kept_lines, pa.scalar("\n", type=pa.large_string())
            )
            n_removed = np.bincount(doc_idx[hit], minlength=len(batch))
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "clean_text": clean.cast(pa.string()),
                    "n_removed": pa.array(n_removed.astype(np.int64)),
                    "n_lines": pa.array(n_lines),
                }
            )

        return docs_ds.map_batches(scan, batch_format="pyarrow")

    # distributed path: line rows anti-join the frequent set, docs
    # re-assemble in a doc-bucketed groupby. Every doc also emits one
    # pos=-1 marker row carrying (doc_id, n_lines) whose hash is
    # splitmix64(doc_id) — it survives the anti-join unless it collides
    # with a frequent line hash (the same ~2^-64 trade as the hashes
    # themselves), so all-lines-removed docs still produce a row.
    B = np.uint64(num_buckets)

    def line_rows(batch: pa.Table) -> pa.Table:
        _, flat, n_lines, h = split_lines(batch)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        doc = np.repeat(ids, n_lines)
        starts = np.r_[np.int64(0), np.cumsum(n_lines)[:-1]]
        pos = np.arange(len(doc), dtype=np.int64) - starts.repeat(n_lines)
        nl = np.repeat(n_lines, n_lines)
        marker_h = splitmix64(ids.astype(np.uint64)).view(np.int64)
        empty = pa.array([""] * len(ids), type=pa.large_string())
        return pa.table(
            {
                "h": pa.array(np.concatenate([h.view(np.int64), marker_h])),
                "doc_id": pa.array(np.concatenate([doc, ids])),
                "pos": pa.array(
                    np.concatenate([pos, np.full(len(ids), -1, np.int64)])
                ),
                "nl": pa.array(np.concatenate([nl, n_lines])),
                "line": pa.concat_arrays(
                    [flat.combine_chunks() if isinstance(flat, pa.ChunkedArray)
                     else flat, empty]
                ),
            }
        )

    kept = anti_join(
        docs_ds.map_batches(line_rows, batch_format="pyarrow"),
        freq,
        on="h",
        left_cols={"doc_id": pa.int64(), "pos": pa.int64(),
                   "nl": pa.int64(), "line": pa.large_string()},
        n_key_rows=n_freq,
        broadcast_threshold=broadcast_threshold,
        num_buckets=num_buckets,
    )

    def bucket_doc(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "db": pa.array(
                    (splitmix64(d.astype(np.uint64)) % B).astype(np.int32)
                ),
                "doc_id": batch.column("doc_id"),
                "pos": batch.column("pos"),
                "nl": batch.column("nl"),
                "line": batch.column("line"),
            }
        )

    def assemble(group: pa.Table) -> pa.Table:
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        p = group.column("pos").to_numpy(zero_copy_only=False)
        nl = group.column("nl").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, d))
        d, p, nl = d[order], p[order], nl[order]
        lines = group.column("line").take(pa.array(order))
        real = p >= 0  # markers excluded from the join
        seg = np.r_[True, d[1:] != d[:-1]]
        starts = np.flatnonzero(seg)
        doc_ids = d[starts]
        doc_nl = nl[starts]
        kept_per_doc = np.add.reduceat(real.astype(np.int64), starts)
        keep_mask = pa.array(real)
        offsets = np.r_[np.int64(0), np.cumsum(kept_per_doc)]
        la = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()),
            lines.filter(keep_mask).combine_chunks()
            if isinstance(lines, pa.ChunkedArray)
            else lines.filter(keep_mask),
        )
        clean = pc.binary_join(la, pa.scalar("\n", type=pa.large_string()))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids),
                "clean_text": clean.cast(pa.string()),
                "n_removed": pa.array(doc_nl - kept_per_doc),
                "n_lines": pa.array(doc_nl),
            }
        )

    return (
        kept.map_batches(bucket_doc, batch_format="pyarrow")
        .groupby("db")
        .map_groups(assemble, batch_format="pyarrow")
    )


def dedup_lines(docs_ds, text_col: str = "text", num_buckets: int = 64):
    """Global first-occurrence LINE dedup (RefinedWeb/C4-style): every
    newline-split segment is kept only at its first occurrence across the
    WHOLE corpus — first = minimal (doc_id, position) — and removed
    everywhere else; documents re-join their surviving lines in order.
    Runs after boilerplate removal in a curation funnel (boilerplate cuts
    lines frequent across docs; this cuts every later repeat, including
    within-run near-mirrors that never cross the frequency bar).
    -> Dataset (doc_id, clean_text, n_removed, n_lines).

    Shape (two passes over the corpus):
      1. per-batch: split -> FNV-1a per line -> per-batch lexicographic
         (doc_id, pos) argmin per hash -> ONE coarse-bucket groupby
         combines them to the global per-line minimum (the shuffle carries
         the distinct-line vocabulary, never the text);
      2. line rows (carrying the text once) ``hash_join`` the min table on
         the line hash — no broadcast fast path: the min table IS the
         vocabulary, dataset-sized by definition — keep rows where
         (doc_id, pos) equals the minimum, re-assemble in a doc-bucketed
         groupby. Every doc emits a pos=-1 marker row that bypasses the
         join, so all-lines-removed docs still produce a row.
    Lexicographic argmin instead of a packed (doc<<32)|pos key: packed
    int64 minima sign-flip for doc_id >= 2**31, which assert_packable
    permits. Hash equality stands in for line equality (~2^-64 per
    distinct pair; a collision can only over-remove, never corrupt)."""
    import pyarrow.compute as pc

    from raylink.join import hash_join
    from raylink.util import splitmix64, text_hash64

    B = np.uint64(num_buckets)

    def split_lines(batch: pa.Table):
        text = pc.fill_null(batch.column(text_col), "").combine_chunks()
        lines = pc.split_pattern(text.cast(pa.large_string()), "\n")
        flat = pc.list_flatten(lines)
        n_lines = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
        return flat, n_lines.astype(np.int64), text_hash64(flat)

    def min_partial(batch: pa.Table) -> pa.Table:
        flat, n_lines, h = split_lines(batch)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        doc = np.repeat(ids, n_lines)
        starts = np.r_[np.int64(0), np.cumsum(n_lines)[:-1]]
        pos = np.arange(len(doc), dtype=np.int64) - starts.repeat(n_lines)
        hs = h.view(np.int64)
        order = np.lexsort((pos, doc, hs))
        hs, doc, pos = hs[order], doc[order], pos[order]
        first = np.r_[True, hs[1:] != hs[:-1]]
        hs, doc, pos = hs[first], doc[first], pos[first]
        return pa.table(
            {
                "hb": pa.array(
                    (splitmix64(hs.view(np.uint64)) % B).astype(np.int32)
                ),
                "h": pa.array(hs),
                "mdoc": pa.array(doc),
                "mpos": pa.array(pos),
            }
        )

    def min_combine(group: pa.Table) -> pa.Table:
        hs = group.column("h").to_numpy(zero_copy_only=False)
        doc = group.column("mdoc").to_numpy(zero_copy_only=False)
        pos = group.column("mpos").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, doc, hs))
        hs, doc, pos = hs[order], doc[order], pos[order]
        first = np.r_[True, hs[1:] != hs[:-1]]
        return pa.table(
            {
                "h": pa.array(hs[first]),
                "mdoc": pa.array(doc[first]),
                "mpos": pa.array(pos[first]),
            }
        )

    mins = (
        docs_ds.map_batches(min_partial, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(min_combine, batch_format="pyarrow")
    )

    def line_rows(batch: pa.Table) -> pa.Table:
        flat, n_lines, h = split_lines(batch)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        doc = np.repeat(ids, n_lines)
        starts = np.r_[np.int64(0), np.cumsum(n_lines)[:-1]]
        pos = np.arange(len(doc), dtype=np.int64) - starts.repeat(n_lines)
        return pa.table(
            {
                "h": pa.array(h.view(np.int64)),
                "doc_id": pa.array(doc),
                "pos": pa.array(pos),
                "nl": pa.array(np.repeat(n_lines, n_lines)),
                "line": flat.combine_chunks()
                if isinstance(flat, pa.ChunkedArray) else flat,
            }
        )

    def keep_first(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(b.column("doc_id"), b.column("mdoc")),
            pc.equal(b.column("pos"), b.column("mpos")),
        )
        return b.filter(keep).select(["doc_id", "pos", "nl", "line"])

    kept = hash_join(
        docs_ds.map_batches(line_rows, batch_format="pyarrow"),
        mins,
        on="h",
        left_cols={"doc_id": pa.int64(), "pos": pa.int64(),
                   "nl": pa.int64(), "line": pa.large_string()},
        right_cols={"mdoc": pa.int64(), "mpos": pa.int64()},
        num_buckets=num_buckets,
        post=keep_first,
    )

    def markers(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column(text_col), "").combine_chunks()
        lines = pc.split_pattern(text.cast(pa.large_string()), "\n")
        n_lines = pc.list_value_length(lines).to_numpy(zero_copy_only=False)
        n = len(batch)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pos": pa.array(np.full(n, -1, np.int64)),
                "nl": pa.array(n_lines.astype(np.int64)),
                "line": pa.array([""] * n, type=pa.large_string()),
            }
        )

    rows = kept.union(docs_ds.map_batches(markers, batch_format="pyarrow"))

    def bucket_doc(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "db": pa.array(
                    (splitmix64(d.astype(np.uint64)) % B).astype(np.int32)
                ),
                "doc_id": batch.column("doc_id"),
                "pos": batch.column("pos"),
                "nl": batch.column("nl"),
                "line": batch.column("line"),
            }
        )

    def assemble(group: pa.Table) -> pa.Table:
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        p = group.column("pos").to_numpy(zero_copy_only=False)
        nl = group.column("nl").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, d))
        d, p, nl = d[order], p[order], nl[order]
        lines = group.column("line").take(pa.array(order))
        real = p >= 0  # markers excluded from the text
        seg = np.r_[True, d[1:] != d[:-1]]
        starts = np.flatnonzero(seg)
        doc_ids = d[starts]
        doc_nl = nl[starts]
        kept_per_doc = np.add.reduceat(real.astype(np.int64), starts)
        keep_mask = pa.array(real)
        offsets = np.r_[np.int64(0), np.cumsum(kept_per_doc)]
        la = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()),
            lines.filter(keep_mask).combine_chunks()
            if isinstance(lines, pa.ChunkedArray)
            else lines.filter(keep_mask),
        )
        clean = pc.binary_join(la, pa.scalar("\n", type=pa.large_string()))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids),
                "clean_text": clean.cast(pa.string()),
                "n_removed": pa.array(doc_nl - kept_per_doc),
                "n_lines": pa.array(doc_nl),
            }
        )

    return (
        rows.map_batches(bucket_doc, batch_format="pyarrow")
        .groupby("db")
        .map_groups(assemble, batch_format="pyarrow")
    )


def pii_redact(docs_ds):
    """PII redaction: emails -> ``<EMAIL>``, IPv4s -> ``<IP>``, long digit
    runs -> ``<NUM>`` (in that fixed order — each pattern is counted on the
    text AS IT STANDS before its own replacement, so the stage order is
    part of the contract and mirrored verbatim in SQL). -> Dataset
    (doc_id, redacted_text, n_redactions). Arrow RE2 ``replace/
    count_substring_regex`` kernels — fully vectorized, shuffle-free, the
    redaction sibling of ``pii_scan``."""
    import pyarrow.compute as pc

    def redact(batch: pa.Table) -> pa.Table:
        t0 = pc.fill_null(batch.column("text").combine_chunks(), "")
        em = pc.count_substring_regex(t0, pattern=PII_EMAIL) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        t1 = pc.replace_substring_regex(t0, pattern=PII_EMAIL,
                                        replacement="<EMAIL>")
        ip = pc.count_substring_regex(t1, pattern=PII_IPV4) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        t2 = pc.replace_substring_regex(t1, pattern=PII_IPV4,
                                        replacement="<IP>")
        ln = pc.count_substring_regex(t2, pattern=PII_LONGNUM) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        t3 = pc.replace_substring_regex(t2, pattern=PII_LONGNUM,
                                        replacement="<NUM>")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "redacted_text": t3,
                "n_redactions": pa.array(em + ip + ln),
            }
        )

    return docs_ds.map_batches(redact, batch_format="pyarrow")


class LinearScorer:
    """Hashed-feature linear classifier scoring — the fastText-shaped
    quality-model inference stage of a curation pipeline, as an actor-pool
    ``map_batches`` class: the weight table (the "model") is built ONCE per
    actor in ``__init__`` (the model-load pattern; reference analog: graph
    parsed once per BSP peer, GraphJobRunner.java:105-182), scoring is one
    vectorized pass per batch.

    Model: feature index of a word = fnv1a(word) % dim; weight[j] =
    (splitmix64(j XOR splitmix64(seed)) % 15) - 7 — deterministic integer
    weights in [-7, 7], so the doc score (sum of weights over word
    OCCURRENCES) is int64-exact and bit-mirrorable in SQL. A trained model
    drops in by replacing ``_weights`` (e.g. np.load of an artifact) — the
    plumbing (per-actor load, hashed lookup, per-doc bincount) is the
    production shape; the arithmetic here is chosen for oracle exactness.

    Output: (doc_id, score:int64, label:int8 = score > 0).
    """

    def __init__(self, dim: int = 1 << 16, seed: int = 1):
        from raylink.util import splitmix64

        self.dim = np.uint64(dim)
        k = splitmix64(np.array([seed], dtype=np.uint64))[0]
        j = np.arange(dim, dtype=np.uint64)
        self._w = (splitmix64(j ^ k) % np.uint64(15)).astype(np.int64) - 7

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from raylink.util import text_hash64

        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        n = len(batch)
        doc_idx, codes, dictionary = _word_codes(text)
        # hash the VOCABULARY once per batch, not every occurrence
        wv = self._w[
            (text_hash64(dictionary) % self.dim).astype(np.int64)
        ]
        score = np.zeros(n, dtype=np.int64)
        np.add.at(score, doc_idx, wv[codes])
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "score": pa.array(score),
                "label": pa.array((score > 0).astype(np.int8)),
            }
        )


def linear_score(docs_ds, dim: int = 1 << 16, seed: int = 1,
                 concurrency=(1, 8)):
    """documents -> (doc_id, score, label) via the actor-pool
    ``LinearScorer`` (shuffle-free scan)."""
    return docs_ds.map_batches(
        LinearScorer,
        fn_constructor_kwargs={"dim": dim, "seed": seed},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def search_topk(docs_ds, terms: list[str], k: int = 20,
                n_docs: int | None = None):
    """Search-ranking stage: score every doc against a small fixed query
    (tf x inverse-document-frequency, BM25-lite) and return the top-k.

    score(d) = sum over terms IN GIVEN ORDER of tf(d, t) * (N / df_t) —
    each weight is ONE division and the per-doc sum is a fixed-order
    left-associated float expression, so scores are bit-identical across
    engines. Two shuffle-free scans (global DF first — k scalars on the
    driver — then scoring) + one distributed sort + limit. Ties break by
    doc_id. -> Dataset (doc_id, score), score > 0 rows only."""
    import pyarrow.compute as pc

    terms = list(terms)
    if not terms:
        raise ValueError("terms must be non-empty")
    if n_docs is None:
        n_docs = docs_ds.count()

    tset = pa.array(terms, type=pa.string())

    def tf_matrix(batch: pa.Table) -> np.ndarray:
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        n = len(text)
        doc_idx, codes, dic = _word_codes(text)
        # vectorized term lookup: per dictionary word, its term index (or
        # null -> NaN) — no python scan over the batch vocabulary
        tix = pc.index_in(dic, value_set=tset).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        tf = np.zeros((n, len(terms)), np.int64)
        occ = tix[codes]
        hit = ~np.isnan(occ)
        np.add.at(tf, (doc_idx[hit], occ[hit].astype(np.int64)), 1)
        return tf

    def df_partial(batch: pa.Table) -> pa.Table:
        tf = tf_matrix(batch)
        return pa.table(
            {
                "j": pa.array(np.arange(len(terms), dtype=np.int64)),
                "df": pa.array((tf > 0).sum(axis=0).astype(np.int64)),
            }
        )

    df_rows = (
        docs_ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("j")
        .sum("df")
        .take_all()
    )  # len(terms) rows on the driver
    df = np.ones(len(terms), np.int64)
    for r in df_rows:
        if r["sum(df)"] > 0:
            df[r["j"]] = r["sum(df)"]
    w = np.int64(n_docs) / df  # one IEEE division per term

    def score(batch: pa.Table) -> pa.Table:
        tf = tf_matrix(batch)
        s = np.zeros(len(tf), np.float64)
        for j in range(len(terms)):  # fixed order, left-associated
            s = s + tf[:, j] * w[j]
        keep = s > 0
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(pa.array(keep)),
                "score": pa.array(s[keep]),
            }
        )

    scored = docs_ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(["score", "doc_id"], descending=[True, False]).limit(k)


LM_SCALE = 10**6


def lm_score(docs_ds, num_buckets: int = 64,
             broadcast_threshold: int = 1 << 16, force: str | None = None):
    """Smoothed bigram language-model likelihood score per document — the
    CCNet/KenLM-style fluency signal of a curation pipeline, in int64
    FIXED POINT so the score is bit-portable across engines (the kmeans
    precedent: libm log/exp are not; integer ratios are). Per adjacent
    ``[a-z]+`` word-pair occurrence (w1, w2):

        p = ((bc(w1 w2) + 1) * LM_SCALE) // (uc(w1) + V)

    — add-one-smoothed conditional bigram probability, floored to 1e-6
    fixed point; bc = corpus bigram count, uc = corpus occurrence count of
    the LEFT word, V = corpus distinct-word count. The doc score is the
    occurrence mean, ONE IEEE division: lm_score =
    round_half_away(lp_sum / (n_bigrams * LM_SCALE), 8). -> Dataset
    (doc_id, n_bigrams, lp_sum, lm_score); docs with < 2 words score 0.

    Dataflow (the bigram_coherence shape plus one more lookup relation,
    everything distributed, nothing broadcast but the scalar V):
    global bigram counts (FNV bigram hash, left-word hash carried) and
    global unigram counts each via per-batch hash-keyed partials + one
    coarse-bucket combine; the unigram join then runs on the
    vocabulary^2-bounded DISTINCT-bigram relation, producing a per-bigram
    fixed-point lp1 lookup table — per-(doc, bigram) occurrence rows pay
    only ONE ``hash_join`` (against lp1, per-doc partial computed INSIDE
    the join task), never a per-occurrence unigram shuffle. Below
    ``broadcast_threshold`` distinct bigrams the lp1 table instead
    broadcasts via ``ray.put`` and scoring collapses to a single
    shuffle-free map over the docs (the thresholded attach pattern of the
    relational dimension joins — at a 10^12-token crawl vocab^2 exceeds
    any driver, so the join path stays); ``force`` pins a path for
    testing ('broadcast' | 'shuffle'), both bit-identical. The SQL
    mirror groups by the bigram/word STRINGS, so an FNV collision fails
    the oracle gate, never passes silently (~2^-64 per vocab pair)."""
    import pyarrow.compute as pc

    from raylink.join import anti_join, hash_join, with_typed_empty
    from raylink.util import round_half_away, splitmix64, text_hash64

    B = np.uint64(num_buckets)

    def _grams(batch: pa.Table, what: str) -> pa.Table:
        """what='bigram': (bh, w1h, c) distinct bigram counts of the batch
        (w1h = left-word hash, carried so the unigram join can happen on
        the vocabulary^2-bounded bigram relation, never per occurrence);
        what='word': (wh, c) word-occurrence counts of the batch;
        what='doc': (doc_id, bh, c) per-(doc, bigram) multiplicity."""
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        doc_idx, codes, dic = _word_codes(text)
        if what == "word":
            wh = text_hash64(dic).astype(np.int64)
            uc_, cc = np.unique(codes, return_counts=True)
            return pa.table(
                {"wh": pa.array(wh[uc_]), "c": pa.array(cc.astype(np.int64))}
            )
        if len(doc_idx) < 2:
            cols = {"bh": pa.array([], type=pa.int64()),
                    "c": pa.array([], type=pa.int64())}
            if what == "doc":
                cols["doc_id"] = pa.array([], type=pa.int64())
            else:
                cols["w1h"] = pa.array([], type=pa.int64())
            return pa.table(cols)
        adj = doc_idx[1:] == doc_idx[:-1]
        V = np.int64(len(dic))
        left_c = codes[:-1][adj]
        pid = left_c * V + codes[1:][adj]
        if what == "doc":
            key = doc_idx[:-1][adj]
            uk, c = np.unique(key * (V * V) + pid, return_counts=True)
            upid = uk % (V * V)
            udoc = doc_ids[(uk // (V * V)).astype(np.int64)]
        else:
            upid, c = np.unique(pid, return_counts=True)
        left = dic.take(pa.array(upid // V))
        right = dic.take(pa.array(upid % V))
        bigrams = pc.binary_join_element_wise(
            pc.cast(left, pa.string()), pc.cast(right, pa.string()), " "
        )
        bh = text_hash64(bigrams).astype(np.int64)
        cols = {"bh": pa.array(bh), "c": pa.array(c.astype(np.int64))}
        if what == "doc":
            cols["doc_id"] = pa.array(udoc)
        else:
            cols["w1h"] = pa.array(text_hash64(left).astype(np.int64))
        return pa.table(cols)

    def _bucket_comb(key: str, out: str):
        def bucket(batch: pa.Table) -> pa.Table:
            h = batch.column(key).to_numpy(zero_copy_only=False)
            return batch.append_column(
                "hb",
                pa.array((splitmix64(h.astype(np.uint64)) % B).astype(np.int32)),
            )

        def comb(group: pa.Table) -> pa.Table:
            h = group.column(key).to_numpy(zero_copy_only=False)
            c = group.column("c").to_numpy(zero_copy_only=False)
            uh, inv = np.unique(h, return_inverse=True)
            s = np.zeros(len(uh), dtype=np.int64)
            np.add.at(s, inv, c)
            return pa.table({key: pa.array(uh), out: pa.array(s)})

        return bucket, comb

    bb, _ = _bucket_comb("bh", "bc")

    def bc_comb(group: pa.Table) -> pa.Table:
        # per-bh count sum, w1h carried (identical for every row of a bh —
        # an FNV bigram collision would merge counts and FAIL the oracle)
        h = group.column("bh").to_numpy(zero_copy_only=False)
        c = group.column("c").to_numpy(zero_copy_only=False)
        w1 = group.column("w1h").to_numpy(zero_copy_only=False)
        if len(h) == 0:
            return pa.table(
                {"bh": pa.array([], type=pa.int64()),
                 "w1h": pa.array([], type=pa.int64()),
                 "bc": pa.array([], type=pa.int64())}
            )
        order = np.argsort(h, kind="stable")
        h, c, w1 = h[order], c[order], w1[order]
        first = np.concatenate(([True], h[1:] != h[:-1]))
        seg = np.cumsum(first) - 1
        s = np.zeros(int(seg[-1]) + 1, dtype=np.int64)
        np.add.at(s, seg, c)
        return pa.table(
            {"bh": pa.array(h[first]), "w1h": pa.array(w1[first]),
             "bc": pa.array(s)}
        )

    bcounts = (
        docs_ds.map_batches(lambda b: _grams(b, "bigram"), batch_format="pyarrow")
        .map_batches(bb, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(bc_comb, batch_format="pyarrow")
    )
    wb, wc_ = _bucket_comb("wh", "uc")
    ucounts = (
        docs_ds.map_batches(lambda b: _grams(b, "word"), batch_format="pyarrow")
        .map_batches(wb, batch_format="pyarrow")
        .groupby("hb")
        .map_groups(wc_, batch_format="pyarrow")
    ).materialize()  # consumed by count() and the join
    V_corpus = int(ucounts.count())  # scalar: corpus distinct-word count

    bc_mat = bcounts.materialize()
    n_bigrams_tot = bc_mat.count()
    use_bcast = force == "broadcast" or (
        force is None
        and n_bigrams_tot <= broadcast_threshold
        and V_corpus <= broadcast_threshold
    )
    if use_bcast:
        import ray

        if n_bigrams_tot == 0:  # bigram-less corpus: empty lookup table
            bh_k = np.empty(0, np.int64)
            lp1 = np.empty(0, np.int64)
        else:
            bdf = bc_mat.to_pandas()   # <= threshold rows by the gate
            udf = ucounts.to_pandas()  # <= threshold rows by the gate
            uw = udf["wh"].to_numpy(np.int64)
            uo = np.argsort(uw, kind="stable")
            uw, uv = uw[uo], udf["uc"].to_numpy(np.int64)[uo]
            w1 = bdf["w1h"].to_numpy(np.int64)
            ucv = uv[np.searchsorted(uw, w1)]
            bh_k = bdf["bh"].to_numpy(np.int64)
            lp1 = ((bdf["bc"].to_numpy(np.int64) + 1) * np.int64(LM_SCALE)) // (
                ucv + np.int64(V_corpus)
            )
        bo = np.argsort(bh_k, kind="stable")
        ref = ray.put((bh_k[bo], lp1[bo]))

        def bscore(batch: pa.Table) -> pa.Table:
            bhs, lp1s = ray.get(ref)
            t = _grams(batch, "doc")
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            n = len(ids)
            lps = np.zeros(n, np.int64)
            nbg = np.zeros(n, np.int64)
            if t.num_rows:
                order = np.argsort(ids, kind="stable")
                d = t.column("doc_id").to_numpy(zero_copy_only=False)
                row = order[np.searchsorted(ids[order], d)]
                bh_q = t.column("bh").to_numpy(zero_copy_only=False)
                p = np.searchsorted(bhs, bh_q)
                # every doc bigram is in the corpus counts by construction;
                # guard the invariant (a miss would read a WRONG lp1)
                if len(bhs) == 0 or not (
                    bhs[np.minimum(p, len(bhs) - 1)] == bh_q
                ).all():
                    raise AssertionError(
                        "lm_score broadcast table is missing a doc bigram"
                    )
                c = t.column("c").to_numpy(zero_copy_only=False)
                np.add.at(lps, row, c * lp1s[p])
                np.add.at(nbg, row, c)
            sc = np.zeros(n, np.float64)
            pos = nbg > 0
            sc[pos] = round_half_away(
                lps[pos] / (nbg[pos] * float(LM_SCALE)), 8
            )
            return pa.table(
                {"doc_id": batch.column("doc_id"), "n_bigrams": pa.array(nbg),
                 "lp_sum": pa.array(lps), "lm_score": pa.array(sc)}
            )

        return docs_ds.map_batches(bscore, batch_format="pyarrow")

    # lp1 per DISTINCT bigram: the unigram join runs on the
    # vocabulary^2-bounded bigram relation, never on per-occurrence rows
    ucounts_j = ucounts.map_batches(
        lambda b: pa.table({"w1h": b.column("wh"), "uc": b.column("uc")}),
        batch_format="pyarrow",
    )

    def lp1_rows(batch: pa.Table) -> pa.Table:
        bcv = batch.column("bc").to_numpy(zero_copy_only=False)
        ucv = batch.column("uc").to_numpy(zero_copy_only=False)
        lp1 = ((bcv + 1) * np.int64(LM_SCALE)) // (ucv + np.int64(V_corpus))
        return pa.table({"bh": batch.column("bh"), "lp1": pa.array(lp1)})

    lp1_tbl = hash_join(
        bc_mat, ucounts_j, on="w1h",
        left_cols={"bh": pa.int64(), "bc": pa.int64()},
        right_cols={"uc": pa.int64()},
    ).map_batches(lp1_rows, batch_format="pyarrow")

    doc_rows = docs_ds.map_batches(
        lambda b: _grams(b, "doc"), batch_format="pyarrow"
    )

    def per_doc_partial(group: pa.Table) -> pa.Table:
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        occ = group.column("c").to_numpy(zero_copy_only=False)
        lp1 = group.column("lp1").to_numpy(zero_copy_only=False)
        ud, inv = np.unique(d, return_inverse=True)
        lps = np.zeros(len(ud), dtype=np.int64)
        nbg = np.zeros(len(ud), dtype=np.int64)
        np.add.at(lps, inv, occ * lp1)
        np.add.at(nbg, inv, occ)
        return pa.table(
            {"doc_id": pa.array(ud), "lps": pa.array(lps), "nbg": pa.array(nbg)}
        )

    partials = hash_join(
        doc_rows, lp1_tbl, on="bh",
        left_cols={"doc_id": pa.int64(), "c": pa.int64()},
        right_cols={"lp1": pa.int64()},
        post=per_doc_partial,
    )

    def doc_bucket(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "db",
            pa.array((splitmix64(d.astype(np.uint64)) % B).astype(np.int32)),
        )

    def doc_comb(group: pa.Table) -> pa.Table:
        d = group.column("doc_id").to_numpy(zero_copy_only=False)
        s1 = group.column("lps").to_numpy(zero_copy_only=False)
        s2 = group.column("nbg").to_numpy(zero_copy_only=False)
        ud, inv = np.unique(d, return_inverse=True)
        lps = np.zeros(len(ud), dtype=np.int64)
        nbg = np.zeros(len(ud), dtype=np.int64)
        np.add.at(lps, inv, s1)
        np.add.at(nbg, inv, s2)
        sc = np.zeros(len(ud), dtype=np.float64)
        pos = nbg > 0
        sc[pos] = round_half_away(
            lps[pos] / (nbg[pos] * float(LM_SCALE)), 8
        )
        return pa.table(
            {"doc_id": pa.array(ud), "n_bigrams": pa.array(nbg),
             "lp_sum": pa.array(lps), "lm_score": pa.array(sc)}
        )

    scored = (
        partials.map_batches(doc_bucket, batch_format="pyarrow")
        .groupby("db")
        .map_groups(doc_comb, batch_format="pyarrow")
    )
    ids = docs_ds.map_batches(
        lambda b: pa.table({"doc_id": b.column("doc_id")}),
        batch_format="pyarrow",
    )
    zeros = anti_join(
        ids, scored, on="doc_id", left_cols={}
    ).map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("doc_id"),
             "n_bigrams": pa.array(np.zeros(len(b), dtype=np.int64)),
             "lp_sum": pa.array(np.zeros(len(b), dtype=np.int64)),
             "lm_score": pa.array(np.zeros(len(b), dtype=np.float64))}
        ),
        batch_format="pyarrow",
    )
    return with_typed_empty(
        scored.union(zeros),
        {"doc_id": pa.int64(), "n_bigrams": pa.int64(),
         "lp_sum": pa.int64(), "lm_score": pa.float64()},
    )


DSIR_D = 1024  # hashed feature buckets (unigrams + bigrams share the space)


def dsir_weights(docs_ds, target_source: str, num_features: int = DSIR_D):
    """DSIR-style importance score per document (Xie et al. 2023, public:
    Data Selection via Importance Resampling — hashed n-gram features,
    target-vs-raw likelihood ratio). This is the LINEAR-DOMAIN fixed-point
    variant: per feature bucket f,

        r[f] = ((ct[f] + 1) * LM_SCALE) // (cr[f] + 1)

    — add-one-smoothed target/raw occurrence-count ratio (ct = occurrences
    in target-source docs, cr = in the whole corpus); the doc score is the
    occurrence mean of r, one IEEE division. Log-domain DSIR sums
    log(p_t/p_r) — libm logs are not bit-portable across engines (the
    kmeans/lm_score precedent), integer ratios are; the linear mean keeps
    the same target-likeness ordering signal. -> Dataset (doc_id, n_feats,
    ratio_sum, dsir_score); featureless docs score 0.

    Features: every [a-z]+ unigram occurrence and every adjacent-bigram
    occurrence, FNV-1a-hashed mod ``num_features`` (hash collisions merge
    buckets IDENTICALLY on both engines — inherent to hashed DSIR, not a
    silent-failure channel). Scale shape: the histogram pass reduces to
    <= num_features rows (driver-bounded by D, the IVF-codebook
    precedent), the ratio table broadcasts once via ray.put, and scoring
    is a shuffle-free per-batch pass."""
    import ray
    import pyarrow.compute as pc

    from raylink.util import round_half_away, text_hash64

    D = int(num_features)

    def _occ_feats(batch: pa.Table):
        """Per-occurrence feature ids + doc segmentation for one batch."""
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        doc_idx, codes, dic = _word_codes(text)
        dic_h = (text_hash64(dic) % np.uint64(D)).astype(np.int64)
        uf = dic_h[codes]
        adj = doc_idx[1:] == doc_idx[:-1]
        V = np.int64(max(len(dic), 1))
        lc, rc = codes[:-1][adj], codes[1:][adj]
        if len(lc):
            pid = lc * V + rc
            upid, inv = np.unique(pid, return_inverse=True)
            bigrams = pc.binary_join_element_wise(
                pc.cast(dic.take(pa.array(upid // V)), pa.string()),
                pc.cast(dic.take(pa.array(upid % V)), pa.string()),
                " ",
            )
            bf = (text_hash64(bigrams) % np.uint64(D)).astype(np.int64)[inv]
        else:
            bf = np.empty(0, np.int64)
        f_all = np.concatenate([uf, bf])
        d_all = np.concatenate([doc_idx, doc_idx[:-1][adj]])
        return f_all, d_all

    def hist_partial(batch: pa.Table) -> pa.Table:
        f_all, d_all = _occ_feats(batch)
        src = batch.column("source").to_numpy(zero_copy_only=False)
        is_t = (src == target_source)[d_all]
        cr = np.bincount(f_all, minlength=D).astype(np.int64)
        ct = np.bincount(f_all[is_t], minlength=D).astype(np.int64)
        nz = np.flatnonzero(cr)
        return pa.table(
            {"f": pa.array(nz.astype(np.int64)), "ct": pa.array(ct[nz]),
             "cr": pa.array(cr[nz])}
        )

    hist = (
        docs_ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("f")
        .sum(["ct", "cr"])
        .take_all()  # <= D rows — bounded by num_features, never by corpus
    )
    ct = np.zeros(D, np.int64)
    cr = np.zeros(D, np.int64)
    for row in hist:
        ct[row["f"]] = row["sum(ct)"]
        cr[row["f"]] = row["sum(cr)"]
    r = ((ct + 1) * np.int64(LM_SCALE)) // (cr + 1)
    r_ref = ray.put(r)  # broadcast once, read per task

    def score(batch: pa.Table) -> pa.Table:
        rv = ray.get(r_ref)
        f_all, d_all = _occ_feats(batch)
        n = batch.num_rows
        rs = np.zeros(n, np.int64)
        np.add.at(rs, d_all, rv[f_all])
        nf = np.bincount(d_all, minlength=n).astype(np.int64)
        sc = np.zeros(n, np.float64)
        pos = nf > 0
        sc[pos] = round_half_away(rs[pos] / (nf[pos] * float(LM_SCALE)), 8)
        return pa.table(
            {"doc_id": batch.column("doc_id"), "n_feats": pa.array(nf),
             "ratio_sum": pa.array(rs), "dsir_score": pa.array(sc)}
        )

    return docs_ds.map_batches(score, batch_format="pyarrow")


def _ed1(a: str, b: str) -> bool:
    """Exact edit-distance == 1 predicate (O(len) two-pointer)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1 or a == b:
        return False
    if la == lb:
        return sum(1 for x, y in zip(a, b) if x != y) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def typo_pairs(vocab_ds, num_buckets: int = 32, max_len: int = 24):
    """Edit-distance-1 pairs over a vocabulary — the typo/OCR-variant
    detection step of a text-cleaning pipeline, via SymSpell-style
    DELETION-NEIGHBORHOOD blocking (Garbe 2012, public): every word keys
    itself plus each of its one-character-deletion variants; two words at
    edit distance 1 ALWAYS share a key (substitution -> same deletion at
    that position; insertion/deletion -> the shorter word IS a variant of
    the longer), so the blocking is complete — never O(V^2). Candidates
    sharing a key are verified with the exact ``_ed1`` predicate (a
    shared key only bounds ed <= 2). -> Dataset (word_a, word_b), a < b,
    distinct.

    ``vocab_ds``: Dataset with a ``word`` string column (distinct rows not
    required — deduped here). Deletion variants are generated VECTORIZED
    per position (one pair of Arrow slice kernels per position, bounded by
    ``max_len``; longer words key on their first max_len+1 positions —
    still complete for pairs whose edit lies in that prefix window, and
    exact-complete whenever words are <= max_len long). The per-pair
    verify is a python loop, deletion-pruned (the minhash-verify
    precedent)."""
    import pyarrow.compute as pc

    from raylink.util import splitmix64, text_hash64

    B = np.uint64(num_buckets)

    def keys(batch: pa.Table) -> pa.Table:
        w = pc.fill_null(batch.column("word").combine_chunks(), "")
        ln = pc.utf8_length(w).to_numpy(zero_copy_only=False)
        outs_w, outs_k = [w], [w]  # the word keys itself (0-deletion)
        for i in range(min(int(ln.max(initial=0)), max_len + 1)):
            m = ln > i  # words long enough to delete position i
            if not m.any():
                break
            wi = w.filter(pa.array(m))
            var = pc.binary_join_element_wise(
                pc.utf8_slice_codeunits(wi, 0, i),
                pc.utf8_slice_codeunits(wi, i + 1, 1 << 30),
                "",
            )
            outs_w.append(wi)
            outs_k.append(var)
        words = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in outs_w])
        ks = pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in outs_k])
        kb = (splitmix64(text_hash64(ks)) % B).astype(np.int32)
        return pa.table({"kb": pa.array(kb), "k": ks, "word": words})

    def block_pairs(group: pa.Table) -> pa.Table:
        df = group.select(["k", "word"]).to_pandas()
        df = df.drop_duplicates()
        out_a, out_b = [], []
        for _, seg in df.groupby("k", sort=False):
            ws = sorted(set(seg["word"]))
            for i in range(len(ws)):
                for j in range(i + 1, len(ws)):
                    if _ed1(ws[i], ws[j]):
                        out_a.append(ws[i])
                        out_b.append(ws[j])
        if not out_a:
            return pa.table({"pb": pa.array([], type=pa.int32()),
                             "word_a": pa.array([], type=pa.string()),
                             "word_b": pa.array([], type=pa.string())})
        pair = pa.array([f"{a}\x00{b}" for a, b in zip(out_a, out_b)])
        pb = (splitmix64(text_hash64(pair)) % B).astype(np.int32)
        return pa.table({"pb": pa.array(pb), "word_a": pa.array(out_a),
                         "word_b": pa.array(out_b)})

    def pair_dedup(group: pa.Table) -> pa.Table:
        df = group.select(["word_a", "word_b"]).to_pandas()
        df = df.drop_duplicates().sort_values(["word_a", "word_b"])
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        vocab_ds.map_batches(keys, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(block_pairs, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(pair_dedup, batch_format="pyarrow")
        .select_columns(["word_a", "word_b"])
    )


def dsir_resample(docs_ds, target_source: str, num_features: int = DSIR_D,
                  seed: int = 0):
    """Importance RESAMPLING on the DSIR weights — the selection step that
    completes the DSIR pipeline (weight, then sample proportionally):
    doc kept iff splitmix64(doc_id XOR seed) % LM_SCALE < p_keep, with
    p_keep = ratio_sum // n_feats (the doc's fixed-point mean target/raw
    ratio; <= LM_SCALE because target counts are a subset of raw counts).
    Deterministic — no RNG state, resumable, identical across engines and
    parallelism. -> Dataset (doc_id, n_feats, ratio_sum, p_keep), kept
    rows only; featureless docs are never kept (p_keep = 0)."""
    from raylink.util import splitmix64

    weighted = dsir_weights(docs_ds, target_source, num_features)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        nf = batch.column("n_feats").to_numpy(zero_copy_only=False)
        rs = batch.column("ratio_sum").to_numpy(zero_copy_only=False)
        p = np.where(nf > 0, rs // np.maximum(nf, 1), 0)
        draw = (
            splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
            % np.uint64(LM_SCALE)
        ).astype(np.int64)
        m = draw < p
        return pa.table(
            {"doc_id": pa.array(ids[m]), "n_feats": pa.array(nf[m]),
             "ratio_sum": pa.array(rs[m]), "p_keep": pa.array(p[m])}
        )

    return weighted.map_batches(keep, batch_format="pyarrow")


def lang_fertility(docs_ds):
    """Per-language tokenizer-fertility audit: (lang, n_docs, sum_tokens,
    sum_chars) over the corpus — the chars-per-token comparison that
    decides tokenizer/vocab allocation across languages in a training-data
    mix. Token counting is the TextStats RE2 partition (alnum runs + lone
    symbols), chars are utf8 lengths — all integers, mirrored exactly in
    SQL. Shape: per-batch dictionary-coded bincount partials -> bounded
    combine tree (cells = #languages); no per-doc rows shuffle."""
    import pyarrow.compute as pc

    from raylink.join import tree_groupby_sum

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        n_tokens = (
            pc.count_substring_regex(text, pattern="[A-Za-z0-9]+")
            .to_numpy(zero_copy_only=False)
            + pc.count_substring_regex(text, pattern=r"[^A-Za-z0-9\s]")
            .to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        lang = batch.column("lang")
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        enc = lang.dictionary_encode()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ng = len(enc.dictionary)
        cnt = np.bincount(code, minlength=ng).astype(np.int64)
        st = np.zeros(ng, dtype=np.int64)
        np.add.at(st, code, n_tokens)
        sc = np.zeros(ng, dtype=np.int64)
        np.add.at(sc, code, n_chars)
        return pa.table(
            {
                "lang": enc.dictionary,
                "n_docs": pa.array(cnt),
                "sum_tokens": pa.array(st),
                "sum_chars": pa.array(sc),
            }
        )

    agg = tree_groupby_sum(
        docs_ds.map_batches(partial, batch_format="pyarrow"),
        ["lang"], ["n_docs", "sum_tokens", "sum_chars"],
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "lang": b.column("lang"),
                "n_docs": b.column("sum(n_docs)"),
                "sum_tokens": b.column("sum(sum_tokens)"),
                "sum_chars": b.column("sum(sum_chars)"),
            }
        ),
        batch_format="pyarrow",
    )


def lexical_diversity(docs_ds):
    """-> Dataset (doc_id, n_words, n_types, n_hapax, rep_mass) — the
    vocabulary-richness profile a curation pipeline thresholds on (low
    type/token ratio or high repeat mass flags template/spam text; hapax
    share estimates vocabulary growth).

    All four stats are integer-exact: per (doc, word) occurrence counts c
    give n_types = |{c}|, n_hapax = |{c == 1}|, rep_mass = sum c^2 (the
    numerator of Yule's K). One streaming actor-pool pass, zero shuffle:
    words via the shared ``_word_codes`` vectorized extractor, per-doc
    counts via one packed (doc_idx << 32 | code) unique — no per-row
    Python. Scale: output is one row per input row; embarrassingly
    parallel."""
    from raylink.util import unpack_hi

    def stats(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        n = len(text)
        doc_idx, codes, _ = _word_codes(text)
        n_words = np.bincount(doc_idx, minlength=n).astype(np.int64)
        key = (doc_idx << np.int64(32)) | codes
        ukey, cnt = np.unique(key, return_counts=True)
        udoc = unpack_hi(ukey).astype(np.int64)
        n_types = np.bincount(udoc, minlength=n).astype(np.int64)
        n_hapax = np.bincount(udoc[cnt == 1], minlength=n).astype(np.int64)
        rep = np.zeros(n, dtype=np.int64)
        np.add.at(rep, udoc, cnt.astype(np.int64) ** 2)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(n_words),
                "n_types": pa.array(n_types),
                "n_hapax": pa.array(n_hapax),
                "rep_mass": pa.array(rep),
            }
        )

    return docs_ds.map_batches(stats, batch_format="pyarrow", batch_size=512)


def distinctive_terms(docs_ds, k: int = 10, num_buckets: int = 64):
    """Per-source distinctive vocabulary: the top-``k`` words per source by
    chi-squared association between word document-frequency and source
    membership — the corpus-composition / topicality audit of a training
    mix (which terms make each source different).

    Scoring is int64 fixed point, so the SQL mirror is bit-exact: with
    a = docs in source containing w, dft = docs anywhere containing w,
    n_s = source size, N = corpus size, the chi2 numerator's cross term
    reduces to diff = a*N - n_s*dft, and
      score = (diff * diff * 1000) // (dft*(N-dft)*n_s*(N-n_s))
    (monotone in chi2 at fixed N; 0 when the denominator vanishes).
    int64-exact while diff^2 * 1000 < 2^63 — guaranteed for corpora up to
    ~50k docs in the adversarial worst case and far beyond for Zipfian
    vocabularies; at crawl scale score per shard or switch the final
    division to float.

    Shape: per-batch distinct (source, word) presence rows pre-combined ->
    ONE word-hash bucket groupby (all sources of a word co-locate, so dft
    is in-group exact) with the tiny source-size table broadcast ->
    per-bucket local per-source top-k -> one coalesced final top-k block.
    """
    import pyarrow.compute as pc
    import ray

    from raylink.join import tree_groupby_sum
    from raylink.util import splitmix64, text_hash64, unpack_hi

    B = np.uint64(num_buckets)

    src_counts = tree_groupby_sum(
        docs_ds.map_batches(
            lambda b: pa.table(
                {"source": b.column("source"),
                 "c": pa.array(np.ones(len(b), dtype=np.int64))}
            ),
            batch_format="pyarrow",
        ),
        ["source"], ["c"],
    ).to_pandas()  # bounded: one row per source
    ns_map = dict(zip(src_counts["source"], src_counts["sum(c)"]))
    N = int(src_counts["sum(c)"].sum())
    ref = ray.put(ns_map)

    def rows(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        doc_idx, codes, dic = _word_codes(text)
        senc = batch.column("source").combine_chunks().dictionary_encode()
        scodes = senc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # distinct (doc, word) -> per (source, word) presence counts
        ukey = np.unique((doc_idx << np.int64(32)) | codes)
        udoc = unpack_hi(ukey).astype(np.int64)
        ucode = (ukey & np.int64(0xFFFFFFFF)).astype(np.int64)
        sw = (scodes[udoc] << np.int64(32)) | ucode
        usw, cnt = np.unique(sw, return_counts=True)
        us = unpack_hi(usw).astype(np.int64)
        uw = (usw & np.int64(0xFFFFFFFF)).astype(np.int64)
        terms = pc.cast(dic, pa.string()).take(pa.array(uw))
        bkt = (splitmix64(text_hash64(dic)[uw]) % B).astype(np.int32)
        return pa.table(
            {"b": pa.array(bkt),
             "token": terms,
             "source": pc.cast(senc.dictionary, pa.string()).take(
                 pa.array(us)
             ),
             "a": pa.array(cnt.astype(np.int64))}
        )

    def score_topk(group: pa.Table) -> pa.Table:
        ns_ = ray.get(ref)
        tok = group.column("token").combine_chunks().dictionary_encode()
        tcodes = tok.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        src = group.column("source").to_numpy(zero_copy_only=False)
        a0 = group.column("a").to_numpy(zero_copy_only=False)
        # combine per (token, source) across batch partials, then dft
        key = (tcodes << np.int64(32)) | np.searchsorted(
            np.sort(np.unique(src)), src
        )
        usrc = np.sort(np.unique(src))
        ukey, inv = np.unique(key, return_inverse=True)
        a = np.zeros(len(ukey), np.int64)
        np.add.at(a, inv, a0)
        ut = unpack_hi(ukey).astype(np.int64)
        usx = (ukey & np.int64(0xFFFFFFFF)).astype(np.int64)
        dft = np.zeros(int(ut.max()) + 1 if len(ut) else 0, np.int64)
        np.add.at(dft, ut, a)
        dftv = dft[ut]
        n_s = np.array([ns_[usrc[i]] for i in usx], dtype=np.int64)
        diff = a * np.int64(N) - n_s * dftv
        denom = dftv * (np.int64(N) - dftv) * n_s * (np.int64(N) - n_s)
        score = np.where(
            denom > 0, (diff * diff * np.int64(1000)) // np.maximum(denom, 1),
            np.int64(0),
        )
        # local per-source top-k
        keep = []
        for sx in np.unique(usx):
            m = np.flatnonzero(usx == sx)
            toks = np.asarray(
                pc.cast(tok.dictionary, pa.string()).to_numpy(
                    zero_copy_only=False
                )
            )[ut[m]]
            order = np.lexsort((toks, -score[m]))[:k]
            keep.append(m[order])
        if not keep:
            return pa.table(
                {"source": pa.array([], type=pa.string()),
                 "token": pa.array([], type=pa.string()),
                 "df_in": pa.array([], type=pa.int64()),
                 "df_total": pa.array([], type=pa.int64()),
                 "score": pa.array([], type=pa.int64())}
            )
        sel = np.concatenate(keep)
        toks_all = np.asarray(
            pc.cast(tok.dictionary, pa.string()).to_numpy(
                zero_copy_only=False
            )
        )
        return pa.table(
            {"source": pa.array(usrc[usx[sel]]),
             "token": pa.array(toks_all[ut[sel]]),
             "df_in": pa.array(a[sel]),
             "df_total": pa.array(dftv[sel]),
             "score": pa.array(score[sel])}
        )

    def final_topk(group: pa.Table) -> pa.Table:
        s = group.column("score").to_numpy(zero_copy_only=False)
        t = group.column("token").to_numpy(zero_copy_only=False)
        order = np.lexsort((t, -s))[:k]
        idx = pa.array(order)
        return pa.table(
            {"source": group.column("source").take(idx),
             "token": pa.array(t[order]),
             "df_in": group.column("df_in").take(idx),
             "df_total": group.column("df_total").take(idx),
             "score": pa.array(s[order]),
             "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64))}
        )

    return (
        docs_ds.map_batches(rows, batch_format="pyarrow")
        .groupby("b")
        .map_groups(score_topk, batch_format="pyarrow")
        .groupby("source")
        .map_groups(final_topk, batch_format="pyarrow")
    )


BLOCKLIST = ("spark", "dup", "merge")


def blocklist_filter(docs_ds, phrases: tuple = BLOCKLIST,
                     max_hits: int = 2):
    """Blocklist / phrase-based safety filtering: count non-overlapping
    occurrences of each blocklist phrase per document (plain substring,
    case-sensitive) and flag documents whose TOTAL hits exceed
    ``max_hits`` — the standard curation gate for banned-phrase /
    boilerplate-marker lists. -> Dataset (doc_id, n_hits, blocked).

    One streaming pass, zero shuffle; per-phrase counting is the Arrow
    ``count_substring`` kernel (greedy non-overlapping, the same semantics
    as SQL's replace-length formula), vectorized over the batch. At crawl
    scale with thousands of phrases swap in an Aho-Corasick actor pool —
    same stage contract."""
    import pyarrow.compute as pc

    def flag(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text").combine_chunks(), "")
        total = np.zeros(len(text), dtype=np.int64)
        for ph in phrases:
            total += (
                pc.count_substring(text, pattern=ph)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "n_hits": pa.array(total),
             "blocked": pa.array(total > max_hits)}
        )

    return docs_ds.map_batches(flag, batch_format="pyarrow")


def quality_ranks(docs_ds, scale: int = 10**6):
    """Percentile/rank transform of the TextStats quality score: every
    document's rank = 1 + #docs with strictly smaller quality (ties share
    the rank — SQL RANK() semantics) plus the fixed-point percentile
    pct = ((rank - 1) * 10^6) // N. The score-calibration step before
    thresholding a quality filter at a target keep rate.

    Shape: quality is r6-rounded, so scaled = round(quality * 10^6) is an
    EXACT integer key on a bounded grid (<= 10^6 + 1 distinct values —
    bounded by the grid, not the corpus). One bucketed histogram sum over
    the grid keys; the value->count table (grid-bounded) is pulled once
    and broadcast; per-doc rank is then a searchsorted lookup in the same
    streaming pass. -> Dataset (doc_id, quality, rank, pct)."""
    import ray

    from raylink.join import bucketed_sum
    from raylink.util import round_half_away

    stats = docs_ds.map_batches(
        TextStats, batch_format="pyarrow", batch_size=512,
        concurrency=(1, 2),
    ).map_batches(
        lambda b: pa.table(
            {"doc_id": b.column("doc_id"),
             "quality": b.column("quality"),
             "k": pa.array(
                 round_half_away(
                     b.column("quality").to_numpy(zero_copy_only=False)
                     * scale, 0
                 ).astype(np.int64)
             ),
             "c": pa.array(np.ones(len(b), dtype=np.int64))}
        ),
        batch_format="pyarrow",
    ).materialize()

    hist = bucketed_sum(
        stats.select_columns(["k", "c"]), "k", "c", out_val="n"
    ).to_pandas()  # grid-bounded pull (<= scale + 1 rows), documented
    vals = hist["k"].to_numpy(np.int64)
    cnts = hist["n"].to_numpy(np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    below = np.concatenate([[0], np.cumsum(cnts)[:-1]])
    n_total = int(cnts.sum())
    ref = ray.put((vals, below))

    def rank(batch: pa.Table) -> pa.Table:
        v, b = ray.get(ref)
        k = batch.column("k").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(v, k)
        r = b[pos] + 1
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "quality": batch.column("quality"),
             "rank": pa.array(r.astype(np.int64)),
             "pct": pa.array(((r - 1) * np.int64(10**6)) // n_total)}
        )

    return stats.map_batches(rank, batch_format="pyarrow")
