"""HyperLogLog sketch (ops/sketch.py): register parity with a brute-force
replica, accuracy in the HLL regime, and the distributed merge path."""

import numpy as np
import pyarrow as pa
import pytest

from raylink.ops.sketch import (
    RANK_CAP,
    hll_estimate_from_registers,
    hll_ranks,
    _bitlen_u64,
)
from raylink.util import splitmix64, text_hash64


def _letters(i: int) -> str:
    """Distinct all-letter word per i (digits would split under [a-z]+)."""
    s = ""
    i += 1
    while i:
        s += chr(ord("a") + i % 26)
        i //= 26
    return s


def test_bitlen():
    w = np.array([0, 1, 2, 3, 4, 2**52, 2**52 + 1, 2**63, 2**64 - 1],
                 dtype=np.uint64)
    assert _bitlen_u64(w).tolist() == [0, 1, 2, 2, 3, 53, 53, 64, 64]


def test_ranks_bounds():
    h = np.array([0, 1, 2**63, 2**64 - 1], dtype=np.uint64)
    reg, rank = hll_ranks(h, 12)
    assert reg.tolist() == [0, 1, 0, 4095]
    # h=0 and h=1: top 52 bits zero -> rank 53; h with MSB set -> rank 1
    assert rank.tolist() == [53, 53, 1, 1]


def test_estimate_accuracy_hll_regime():
    n = 30_000
    words = [_letters(i) for i in range(n)]
    assert len(set(words)) == n
    h = splitmix64(text_hash64(words))
    reg, rank = hll_ranks(h, 12)
    mr = np.zeros(4096, dtype=np.int64)
    np.maximum.at(mr, reg, rank)
    f = hll_estimate_from_registers(mr, 12)
    # 1.04/sqrt(4096) ~ 1.6% standard error; allow 5%
    assert abs(f["distinct_est"] - n) / n < 0.05
    assert f["n_zero"] == 0 or f["distinct_est"] > 2.5 * 4096  # HLL branch


def test_merge_equals_global():
    """MAX-merge of per-shard registers == registers of the union (the
    property the groupby relies on)."""
    a = [_letters(i) for i in range(0, 5000)]
    b = [_letters(i) for i in range(2500, 9000)]  # overlap
    def regs(ws):
        h = splitmix64(text_hash64(ws))
        reg, rank = hll_ranks(h, 10)
        m = np.zeros(1024, dtype=np.int64)
        np.maximum.at(m, reg, rank)
        return m
    merged = np.maximum(regs(a), regs(b))
    assert (merged == regs(sorted(set(a) | set(b)))).all()


@pytest.mark.usefixtures("ray_session")
def test_hll_distinct_words_dataset():
    """Distributed path == pure-python replica on the same rows."""
    import ray.data as rd

    from raylink.ops.sketch import hll_distinct_words

    texts = ["the quick brown fox", "jumps over the lazy dog",
             " ".join(_letters(i) for i in range(800)), ""]
    docs = rd.from_arrow(pa.table({"text": texts})).repartition(3)
    out = hll_distinct_words(docs, p=12)
    import re

    vocab = sorted(set(w for t in texts for w in re.findall("[a-z]+", t)))
    h = splitmix64(text_hash64(vocab))
    reg, rank = hll_ranks(h, 12)
    mr = np.zeros(4096, dtype=np.int64)
    np.maximum.at(mr, reg, rank)
    want = hll_estimate_from_registers(mr, 12)
    got = {k: out.column(k)[0].as_py() for k in out.column_names}
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_bloom_decontaminate_superset_of_exact():
    """Bloom flags are a SUPERSET of the exact pass (FPs only over-flag,
    never miss); a tight filter (m_bits=8) actually produces FPs on this
    input while a roomy one (m_bits=18) matches the exact pass."""
    import ray.data as rd

    from raylink.ops.dedup import decontaminate
    from raylink.ops.sketch import bloom_decontaminate

    leak = " ".join(_letters(i) for i in range(40, 52))
    texts = [leak] + [
        " ".join(_letters(j) for j in range(i, i + 30)) for i in range(100, 400, 3)
    ]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })).repartition(4)
    bench = rd.from_arrow(pa.table({
        "doc_id": pa.array([10_000], type=pa.int64()),
        "text": pa.array([leak + " " + _letters(999)]),
    }))
    exact = decontaminate(docs, bench, n=8).to_pandas().set_index("doc_id").sort_index()
    assert exact["contaminated"].sum() == 1  # only the planted leak doc

    tight = bloom_decontaminate(docs, bench, n=8, m_bits=8, k=2) \
        .to_pandas().set_index("doc_id").sort_index()
    roomy = bloom_decontaminate(docs, bench, n=8, m_bits=18, k=4) \
        .to_pandas().set_index("doc_id").sort_index()
    for blm in (tight, roomy):
        assert (blm["n_bloom_hits"] >= exact["n_hits"]).all()  # superset
    assert roomy["contaminated_bloom"].equals(exact["contaminated"])
    assert tight["contaminated_bloom"].sum() > exact["contaminated"].sum()  # FPs


def test_cms_word_topk(ray_session):
    import re

    import ray.data as rd

    from raylink.ops.sketch import cms_word_topk

    texts = [
        "apple banana apple cherry",
        "banana apple durian durian durian",
        "elderberry fig grape apple banana",
    ]
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(3), type=pa.int64()),
                  "text": pa.array(texts)})
    ).repartition(2)
    true = {}
    for t in texts:
        for w in re.findall("[a-z]+", t.lower()):
            true[w] = true.get(w, 0) + 1
    # roomy sketch (few words, 2^16 buckets): collisions ~0 -> est == cnt
    got = cms_word_topk(docs, k=10, depth=4, width_bits=16).to_pandas()
    assert dict(zip(got["token"], got["cnt"])) == dict(
        sorted(true.items(), key=lambda r: (-r[1], r[0]))[:10]
    )
    assert (got["est"] == got["cnt"]).all()
    # tight sketch (16 buckets, 1 row): collisions certain across batches,
    # but the one-sided bound must hold and totals must be conserved
    tight = cms_word_topk(docs, k=10, depth=1, width_bits=2).to_pandas()
    assert (tight["est"] >= tight["cnt"]).all()
    assert dict(zip(tight["token"], tight["cnt"])) == dict(
        sorted(true.items(), key=lambda r: (-r[1], r[0]))[:10]
    )


def test_repeated_substrings(ray_session):
    """Cross-doc exact repeated windows vs a python oracle: content-
    defined anchors (byte % 16 == 0), aggregate and per-occurrence modes,
    null/short docs, alignment-shifted copies still found."""
    import ray.data as rd

    from raylink.ops.dedup import repeated_substrings

    docs = [
        (0, "the quick brown fox jumps over the lazy dog and keeps running far away"),
        (1, "yesterday the quick brown fox jumps over the lazy dog and keeps running home"),
        (2, "completely unrelated text with no overlap whatsoever in this document body"),
        (3, "padding padding the quick brown fox jumps over the lazy dog and keeps on"),
        (4, None),
        (5, "short"),
        (6, "the quick brown fox jumps over the lazy dog and keeps running far away"),
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([d[0] for d in docs], pa.int64()),
                  "text": pa.array([d[1] for d in docs], pa.string())})
    ).repartition(3)
    W, MOD, RES = 40, 16, 0
    from collections import defaultdict

    occ = defaultdict(list)
    for did, t in docs:
        b = (t or "").encode()
        for i in range(len(b) - W + 1):
            if b[i] % MOD == RES:
                occ[b[i:i + W]].append((did, i))
    want = {
        w.decode(): (len({d for d, _ in v}), len(v))
        for w, v in occ.items()
        if len({d for d, _ in v}) >= 2
    }
    out = repeated_substrings(ds, window=W, modulus=MOD, residue=RES).to_pandas()
    assert {r.window: (r.n_docs, r.n_occ) for r in out.itertuples()} == want
    assert len(want) > 0  # docs 0/1/3 share a 40-byte run at shifted offsets

    per = repeated_substrings(
        ds, window=W, modulus=MOD, residue=RES, per_occurrence=True
    ).to_pandas()
    want_occ = {
        (w.decode(), d, p)
        for w, v in occ.items()
        if len({d for d, _ in v}) >= 2
        for d, p in v
    }
    assert set(zip(per["window"], per["doc_id"], per["pos"])) == want_occ
    assert len(per) == len(want_occ)


def test_substring_pairs(ray_session):
    """Doc pairs by shared distinct windows vs a python oracle, with the
    max_df hot-window cut and the min_shared threshold."""
    import ray.data as rd
    from collections import defaultdict

    from raylink.ops.dedup import substring_pairs

    shared = "the quick brown fox jumps over the lazy dog and keeps running onward"
    docs = [
        (0, shared + " alpha variant ending text here"),
        (1, "prefix words " + shared + " beta tail"),
        (2, "totally different content with zero overlap across the corpus body here"),
        (3, "xx " + shared),
        (4, None),
        (5, "tiny"),
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([d[0] for d in docs], pa.int64()),
                  "text": pa.array([d[1] for d in docs], pa.string())})
    ).repartition(3)
    W, MOD, RES, MINS, MAXDF = 40, 16, 0, 2, 64
    wd = defaultdict(set)
    for did, t in docs:
        b = (t or "").encode()
        for i in range(len(b) - W + 1):
            if b[i] % MOD == RES:
                wd[b[i:i + W]].add(did)
    pc = defaultdict(int)
    for w, dset in wd.items():
        if 2 <= len(dset) <= MAXDF:
            s = sorted(dset)
            for x in range(len(s)):
                for y in range(x + 1, len(s)):
                    pc[(s[x], s[y])] += 1
    want = {k: v for k, v in pc.items() if v >= MINS}
    out = substring_pairs(
        ds, window=W, modulus=MOD, residue=RES, min_shared=MINS, max_df=MAXDF
    ).to_pandas()
    assert {(r.doc_a, r.doc_b): r.n_shared for r in out.itertuples()} == want
    assert len(want) >= 3

    # max_df=1 kills every window -> empty result
    none = substring_pairs(ds, window=W, modulus=MOD, residue=RES,
                           min_shared=1, max_df=1)
    assert none.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_hll_grouped_distinct_words():
    """Grouped HLL (per-key registers) == per-key brute-force replica:
    same registers, same integer sum, same rounded estimate — including a
    key whose rows are split across partitions and a key in the
    linear-counting regime."""
    import re

    import ray.data as rd

    from raylink.ops.sketch import hll_grouped_distinct_words

    P = 8
    m = 1 << P
    hosts, texts = [], []
    for i in range(60):
        h = f"h{i % 3}"
        # h0 gets a big vocabulary (HLL regime), h2 a tiny one (linear)
        span = 120 if h == "h0" else (30 if h == "h1" else 2)
        hosts.append(h)
        texts.append(" ".join(_letters(i * span + j) for j in range(span)))
    hosts.append("empty")
    texts.append("")
    docs = rd.from_arrow(
        pa.table({"host": hosts, "text": texts})
    ).repartition(7)
    out = (
        hll_grouped_distinct_words(docs, "host", p=P)
        .to_pandas()
        .set_index("host")
    )
    # a wordless key still appears, with an empty-register estimate (the
    # ungrouped sibling's behavior)
    assert set(out.index) == {"h0", "h1", "h2", "empty"}
    erow = out.loc["empty"]
    assert int(erow["n_zero"]) == m
    assert int(erow["sum_t"]) == m * (1 << 32)
    assert float(erow["distinct_est"]) == 0.0
    for h in ("h0", "h1", "h2"):
        vocab = sorted(
            {
                w
                for hh, t in zip(hosts, texts)
                if hh == h
                for w in re.findall("[a-z]+", t)
            }
        )
        hsh = splitmix64(text_hash64(vocab))
        reg, rank = hll_ranks(hsh, P)
        mr = np.zeros(m, dtype=np.int64)
        np.maximum.at(mr, reg, rank)
        want = hll_estimate_from_registers(mr, P)
        got = out.loc[h]
        assert int(got["n_zero"]) == want["n_zero"], h
        assert int(got["sum_t"]) == want["sum_t"], h
        assert float(got["distinct_est"]) == want["distinct_est"], h
        # sanity: the estimate is actually close to the truth
        assert abs(float(got["distinct_est"]) - len(vocab)) <= 0.25 * len(vocab) + 2
