"""Property-based robustness: random small graphs vs NumPy oracles
(hypothesis). Would have caught the empty-frontier BFS bug: arbitrary edge
sets produce isolated vertices, self-referential shapes, empty partitions."""

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracles import bfs_oracle, cc_oracle, pr_oracle

N = 40

edge_sets = st.lists(
    st.tuples(st.integers(0, N - 1), st.integers(0, N - 1)),
    min_size=0,
    max_size=120,
)


def _mk(edges_list, ray_session=None):
    import ray.data as rd

    pairs = sorted({(s, d) for s, d in edges_list if s != d})
    edges = np.array(pairs, dtype=np.int64).reshape(-1, 2)
    eds = rd.from_arrow(
        pa.table({"src": pa.array(edges[:, 0]), "dst": pa.array(edges[:, 1])})
    )
    verts = rd.from_arrow(pa.table({"vid": pa.array(np.arange(N, dtype=np.int64))}))
    return edges, eds, verts


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(edge_sets)
def test_property_pagerank(ray_session, edges_list):
    from raylink.algos import pagerank

    edges, eds, verts = _mk(edges_list)
    _, ranks = pagerank(eds, vertices_ds=verts, num_parts=3, iters=6,
                        engine="tasks", resume=False)
    got = ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    np.testing.assert_allclose(got, pr_oracle(N, edges, iters=6), atol=1e-12)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(edge_sets)
def test_property_cc_sssp(ray_session, edges_list):
    from raylink.algos import connected_components, sssp
    from raylink.graph import build_graph

    edges, eds, verts = _mk(edges_list)
    g = build_graph(eds, verts, num_parts=3, directed=False)
    _, comps = connected_components(g=g, resume=False)
    np.testing.assert_array_equal(
        comps.to_pandas().sort_values("vid")["component"].to_numpy(),
        cc_oracle(N, edges),
    )
    _, dists = sssp(g=g, source=0, engine="tasks", resume=False)
    np.testing.assert_array_equal(
        dists.to_pandas().sort_values("vid")["dist"].to_numpy(),
        bfs_oracle(N, edges, 0),
    )


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.tuples(st.integers(0, 30), st.integers(0, 10**6)),
             min_size=0, max_size=80),
)
def test_property_hash_join_vs_pandas(ray_session, left_rows):
    """hash_join == pandas inner merge on arbitrary (possibly duplicated,
    possibly unmatched) left keys against a unique right relation."""
    import pandas as pd
    import ray.data as rd

    from raylink.join import hash_join

    lk = np.array([k for k, _ in left_rows], dtype=np.int64)
    lx = np.array([x for _, x in left_rows], dtype=np.int64)
    rk = np.arange(0, 31, 2, dtype=np.int64)  # evens only -> odd keys unmatched
    rv = rk * 100
    left = rd.from_arrow(pa.table({"k": pa.array(lk), "x": pa.array(lx)}))
    right = rd.from_arrow(pa.table({"k": pa.array(rk), "v": pa.array(rv)}))
    got = hash_join(left, right, on="k", left_cols={"x": pa.int64()},
                    right_cols={"v": pa.int64()}, strict=False).to_pandas()
    exp = (
        pd.DataFrame({"k": lk, "x": lx})
        .merge(pd.DataFrame({"k": rk, "v": rv}), on="k", how="inner")
        .sort_values(["k", "x"]).reset_index(drop=True)
    )
    assert len(got) == len(exp)
    if len(exp):
        got = got.sort_values(["k", "x"]).reset_index(drop=True)
        assert got.equals(exp[["k", "x", "v"]])


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.tuples(st.integers(0, 25), st.integers(0, 25)),
             min_size=0, max_size=60),
)
def test_property_pair_attach(ray_session, raw_pairs):
    """pair_attach returns exactly one row per unique pair key with both
    sides' values correctly attached, for arbitrary pair sets."""
    import ray.data as rd

    from raylink.join import pair_attach

    pairs = sorted({(min(a, b), max(a, b)) for a, b in raw_pairs if a != b})
    keys = np.array([(a << 32) | b for a, b in pairs], dtype=np.int64)
    cand = rd.from_arrow(pa.table({"key": pa.array(keys)}))
    ids = np.arange(26, dtype=np.int64)
    vals = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids), "val": pa.array(ids * 7)})
    )
    got = pair_attach(cand, vals, {"val": pa.int64()}).to_pandas()
    assert len(got) == len(pairs)
    if len(pairs):
        got = got.sort_values("key")
        a = got["key"].to_numpy() >> 32
        b = got["key"].to_numpy() & 0xFFFFFFFF
        np.testing.assert_array_equal(got["val_a"].to_numpy(), a * 7)
        np.testing.assert_array_equal(got["val_b"].to_numpy(), b * 7)


@given(
    texts=st.lists(
        st.text(max_size=80) | st.just("") | st.text(alphabet="中文🎉é ", max_size=30),
        max_size=40,
    )
)
@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_property_text_hash64_vectorized(texts):
    """Position-parallel FNV-1a must be bit-identical to the scalar
    reference — the minhash/simhash/ngram SQL oracles mirror these values."""
    from raylink.util import text_hash64, text_hash64_scalar

    np.testing.assert_array_equal(text_hash64(texts), text_hash64_scalar(texts))
    np.testing.assert_array_equal(
        text_hash64(pa.array(texts, type=pa.string())), text_hash64_scalar(texts)
    )


@given(
    texts=st.lists(
        st.text(max_size=120) | st.text(alphabet="ab 01 ZÄ中.🎉", max_size=60),
        max_size=25,
    ),
    n=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_property_gram_hashes_match_joined_strings(texts, n):
    """Range-hashed shingles (no per-gram strings) must equal hashing the
    ' '-joined gram strings — the dedup oracles mirror those exact values."""
    from raylink.ops.dedup import _gram_hashes, _gram_lists
    from raylink.util import text_hash64_scalar

    gh, counts = _gram_hashes(texts, n)
    gl = _gram_lists(texts, n)
    assert counts.tolist() == [len(g) for g in gl]
    exp = text_hash64_scalar([g for gs in gl for g in gs])
    np.testing.assert_array_equal(gh, exp)


@given(
    words=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=10), min_size=1, max_size=20
    ),
    pair=st.tuples(
        st.text(alphabet="ab", min_size=1, max_size=2),
        st.text(alphabet="ab", min_size=1, max_size=2),
    ),
)
@settings(max_examples=200, deadline=None)
def test_property_bpe_merge_flat_equals_sequential_scan(words, pair):
    """The run-grouped vectorized merge (ops/bpe._merge_flat) must equal
    the sequential greedy left-to-right scan on every word — including
    overlapping matches (lhs == rhs) and cross-word boundaries."""
    from raylink.ops.bpe import _merge_flat

    a, b = pair
    flat = np.array([c for w in words for c in w], dtype=object)
    row = np.repeat(
        np.arange(len(words), dtype=np.int64), [len(w) for w in words]
    )
    got_f, got_r = _merge_flat(flat, row, a, b)
    exp_f, exp_r = [], []
    for i, w in enumerate(words):
        syms, j = list(w), 0
        out = []
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        exp_f.extend(out)
        exp_r.extend([i] * len(out))
    assert got_f.tolist() == exp_f
    assert got_r.tolist() == exp_r


@given(
    st.text(alphabet="abc", min_size=0, max_size=8),
    st.text(alphabet="abc", min_size=0, max_size=8),
)
@settings(max_examples=300, deadline=None)
def test_ed1_equals_levenshtein(a, b):
    """ops.textstats._ed1 == (full DP levenshtein == 1) on a tiny alphabet
    (small alphabet maximizes boundary collisions: equal strings,
    transpositions, repeated runs)."""
    from raylink.ops.textstats import _ed1

    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    assert _ed1(a, b) == (dp[len(b)] == 1)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bmp_gray8_roundtrip_property(w, h, seed):
    """encode_bmp_gray8 -> _bmp_decode is the identity on arbitrary
    dimensions (every stride-padding / flip case), pixels exact."""
    from raylink.ops.multimodal import _bmp_decode, encode_bmp_gray8

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h, dtype=np.uint8)
    got_w, got_h, got = _bmp_decode(encode_bmp_gray8(px, w, h))
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(got, px)
