"""BPE merge learning (ops/bpe.py) vs a sequential python replica."""

import re

import numpy as np
import pyarrow as pa
import pytest

from raylink.ops.bpe import bpe_merges


def _python_bpe(texts: list[str], rounds: int):
    """Classic sequential BPE (Sennrich et al. 2016) over the word
    vocabulary: count adjacent pairs weighted by word frequency (overlaps
    included), pick (cnt DESC, lhs ASC, rhs ASC), greedy left-to-right
    non-overlapping merge."""
    vocab: dict[tuple, int] = {}
    for t in texts:
        for w in re.findall(r"[a-z]+", (t or "").lower()):
            vocab[tuple(w)] = vocab.get(tuple(w), 0) + 1
    merges = []
    for r in range(rounds):
        counts: dict[tuple, int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                counts[syms[i], syms[i + 1]] = counts.get((syms[i], syms[i + 1]), 0) + c
        if not counts:
            break
        best = max(counts.items(), key=lambda kv: (kv[1], _neg(kv[0][0]), _neg(kv[0][1])))
        (a, b), cnt = best
        merges.append((r, a, b, a + b, cnt))
        # distinct words stay distinct after merging (the concatenation of
        # a word's symbols is always the word itself), so keying the new
        # vocab by the merged sequence is lossless
        vocab = _merge_words(vocab, a, b)
    return merges


class _neg:
    __slots__ = ("s",)

    def __init__(self, s):
        self.s = s

    def __lt__(self, o):
        return self.s > o.s

    def __eq__(self, o):
        return self.s == o.s


def _merge_words(vocab, a, b):
    nv = {}
    for syms, c in vocab.items():
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        nv[tuple(out)] = c  # words stay distinct: key by merged sequence
    return nv


def _engine_rows(ds_table: pa.Table):
    return list(
        zip(
            ds_table.column("round").to_pylist(),
            ds_table.column("lhs").to_pylist(),
            ds_table.column("rhs").to_pylist(),
            ds_table.column("merged").to_pylist(),
            ds_table.column("cnt").to_pylist(),
        )
    )


def _run(texts, rounds, **kw):
    import ray.data as rd

    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    return _engine_rows(bpe_merges(rd.from_arrow(tbl), rounds=rounds, **kw))


def test_bpe_matches_python_replica(ray_session):
    texts = [
        "lower lower lowest newer newer newer wider wide widest",
        "new new new newer lower low low lowest wide",
        "the theme then there these those the the",
    ]
    got = _run(texts, rounds=8)
    want = _python_bpe(texts, 8)
    assert got == want
    # second-order merges must appear (a learned symbol used as input)
    assert any(len(l) > 1 or len(r) > 1 for (_, l, r, _, _) in got)


def test_bpe_overlap_left_to_right(ray_session):
    # "aaaa" x1: pairs (a,a)=3; greedy merge -> [aa, aa]; next round
    # (aa,aa)=1 from this word
    got = _run(["aaaa aaaa b"], rounds=2)
    assert got[0] == (0, "a", "a", "aa", 6)
    assert got[1] == (1, "aa", "aa", "aaaa", 2)


def test_bpe_tiebreak_lexicographic(ray_session):
    # (a,b) and (c,d) both occur twice -> pick (a,b) by lhs order
    got = _run(["ab cd", "ab cd"], rounds=1)
    assert got == [(0, "a", "b", "ab", 2)]


def test_bpe_exhausts_pairs(ray_session):
    # single-char words only: no pairs at all -> zero merges
    got = _run(["a b c", "a b"], rounds=4)
    assert got == []


def test_bpe_nulls_and_empty(ray_session):
    import ray.data as rd

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array(["hello hello", None], type=pa.string()),
        }
    )
    got = _engine_rows(bpe_merges(rd.from_arrow(tbl), rounds=2))
    want = _python_bpe(["hello hello", ""], 2)
    assert got == want


def test_bpe_token_count_matches_replica(ray_session):
    import ray.data as rd

    from raylink.ops.bpe import bpe_token_count

    texts = [
        "lower lower lowest newer newer newer wider wide widest",
        "new new newer lower low low lowest wide",
        "",
        None,
        "zzz qqq",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    got = (
        bpe_token_count(rd.from_arrow(tbl), rounds=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # python replica: learn 4 merges, segment each word greedily
    merges = _python_bpe([t or "" for t in texts], 4)
    rules = [(m[1], m[2]) for m in merges]

    def seg_len(word):
        syms = list(word)
        for a, b in rules:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    exp = [
        sum(seg_len(w) for w in re.findall(r"[a-z]+", (t or "").lower()))
        for t in texts
    ]
    assert got["n_bpe_tokens"].tolist() == exp
    assert got["doc_id"].tolist() == list(range(len(texts)))
