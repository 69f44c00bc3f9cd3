"""raylink.join: the large x large hash join, the thresholded lookup, and
the forced shuffle paths of triangles / CC / kmeans-crossing — each shuffle
path must produce exactly what the broadcast path produces."""

import numpy as np
import pyarrow as pa
import pytest

from oracles import cc_oracle, triangle_oracle
from raylink.synth import expected_edges

N = 121


@pytest.fixture(scope="module")
def edge_data(ray_session):
    import ray.data as rd

    edges = expected_edges(N)
    edges_ds = rd.from_arrow(
        pa.table({"src": pa.array(edges[:, 0]), "dst": pa.array(edges[:, 1])})
    ).materialize()
    verts_ds = rd.from_arrow(pa.table({"vid": pa.array(np.arange(N, dtype=np.int64))}))
    return edges, edges_ds, verts_ds


def test_hash_join_basic(ray_session):
    import ray.data as rd

    from raylink.join import hash_join

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 2, 3, 7], type=pa.int64()),
                  "x": pa.array([10, 20, 21, 30, 70], type=pa.int64())})
    )
    right = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 7, 9], type=pa.int64()),
                  "y": pa.array([-1, -2, -3, -7, -9], type=pa.int64())})
    )
    out = hash_join(left, right, on="k", left_cols={"x": pa.int64()},
                    right_cols={"y": pa.int64()}).to_pandas().sort_values(["k", "x"])
    assert list(out["k"]) == [1, 2, 2, 3, 7]  # duplicate left keys preserved
    assert list(out["y"]) == [-1, -2, -2, -3, -7]


def test_hash_join_strict_raises(ray_session):
    import ray.data as rd

    from raylink.join import hash_join

    left = rd.from_arrow(pa.table({"k": pa.array([1, 5], type=pa.int64()),
                                   "x": pa.array([0, 0], type=pa.int64())}))
    right = rd.from_arrow(pa.table({"k": pa.array([1], type=pa.int64()),
                                    "y": pa.array([9], type=pa.int64())}))
    with pytest.raises(Exception, match="no right row"):
        hash_join(left, right, on="k", left_cols={"x": pa.int64()},
                  right_cols={"y": pa.int64()}).materialize()
    # non-strict: inner join drops the unmatched key
    out = hash_join(left, right, on="k", left_cols={"x": pa.int64()},
                    right_cols={"y": pa.int64()}, strict=False).to_pandas()
    assert list(out["k"]) == [1]


def test_attach_lookup_paths_agree(ray_session):
    import ray.data as rd

    from raylink.join import attach_lookup

    rng = np.random.default_rng(0)
    keys = rng.permutation(200).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": pa.array(keys),
                                 "x": pa.array(keys * 3)})).materialize()
    lk = rd.from_arrow(
        pa.table({"k": pa.array(np.arange(200, dtype=np.int64)),
                  "v": pa.array(np.arange(200, dtype=np.int64) * 7)})
    ).materialize()
    kw = dict(on="k", left_cols={"x": pa.int64()}, value_cols={"v": pa.int64()},
              n_lookup_rows=200)
    a = attach_lookup(ds, lk, broadcast_threshold=10**6, **kw).to_pandas().sort_values("k").reset_index(drop=True)
    b = attach_lookup(ds, lk, broadcast_threshold=0, **kw).to_pandas().sort_values("k").reset_index(drop=True)
    assert (a == b).all().all()
    assert (a["v"] == a["k"] * 7).all()


def test_triangles_shuffle_path(edge_data):
    from raylink.algos import triangle_count

    edges, edges_ds, _ = edge_data
    exp = triangle_oracle(N, edges)
    got_b = triangle_count(edges_ds, force="broadcast")
    got_s = triangle_count(edges_ds, force="shuffle")
    assert got_b == got_s == exp


def test_cc_shuffle_attach(edge_data, tmp_path):
    from raylink.algos import connected_components

    edges, edges_ds, verts_ds = edge_data
    _, comps = connected_components(
        edges_ds, vertices_ds=verts_ds, num_parts=4,
        ckpt_dir=str(tmp_path / "ck"), broadcast_threshold=0,  # force hash join
    )
    pdf = comps.to_pandas().sort_values("vid")
    np.testing.assert_array_equal(pdf["component"].to_numpy(), cc_oracle(N, edges))


def test_spanning_shuffle_attach(edge_data, tmp_path):
    """spanning_forest with broadcast_threshold=0 forces the hash-join path
    for the component attach (VERDICT r2 item 2: no O(V) driver pull);
    results must match the broadcast path bit for bit."""
    from raylink.algos import spanning_forest

    edges, edges_ds, verts_ds = edge_data
    _, f_sh = spanning_forest(
        edges_ds, vertices_ds=verts_ds, num_parts=4,
        ckpt_dir=str(tmp_path / "cksh"), broadcast_threshold=0,
    )
    _, f_bc = spanning_forest(
        edges_ds, vertices_ds=verts_ds, num_parts=4,
        ckpt_dir=str(tmp_path / "ckbc"),
    )
    a = f_sh.to_pandas().sort_values("vid").reset_index(drop=True)
    b = f_bc.to_pandas().sort_values("vid").reset_index(drop=True)
    assert a[["vid", "root", "dist", "parent"]].equals(
        b[["vid", "root", "dist", "parent"]]
    )
    comps = cc_oracle(N, edges)
    np.testing.assert_array_equal(
        a["root"].to_numpy(), comps[a["vid"].to_numpy()]
    )


def test_crossing_count_paths_agree(edge_data, tmp_path):
    import ray.data as rd

    from raylink.algos.kmeans import crossing_count

    edges, edges_ds, _ = edge_data
    labels = rd.from_arrow(
        pa.table({"vid": pa.array(np.arange(N, dtype=np.int64)),
                  "cluster": pa.array((np.arange(N) % 3).astype(np.int64))})
    ).materialize()
    b = crossing_count(edges_ds, labels, N, force="broadcast")
    s = crossing_count(edges_ds, labels, N, force="shuffle")
    exp = int(np.sum((edges[:, 0] % 3) != (edges[:, 1] % 3)))
    assert b == s == exp


def test_hash_join_hot_key_skew(ray_session):
    """A single key carrying half the left side: correctness is unaffected
    by the bucket concentration (the documented skew behavior)."""
    import ray.data as rd

    from raylink.join import hash_join

    hot = np.full(5000, 7, dtype=np.int64)
    cold = np.arange(5000, dtype=np.int64) % 100
    lk = np.concatenate([hot, cold])
    lx = np.arange(len(lk), dtype=np.int64)
    left = rd.from_arrow(pa.table({"k": pa.array(lk), "x": pa.array(lx)}))
    right = rd.from_arrow(
        pa.table({"k": pa.array(np.arange(100, dtype=np.int64)),
                  "v": pa.array(np.arange(100, dtype=np.int64) * 11)})
    )
    out = hash_join(left, right, on="k", left_cols={"x": pa.int64()},
                    right_cols={"v": pa.int64()}).to_pandas()
    assert len(out) == len(lk)
    assert (out["v"] == out["k"] * 11).all()
    assert (out["k"] == 7).sum() == 5000 + 50  # hot rows + cold k==7 rows


def test_tree_groupby_sum(ray_session):
    """Map-only combine tree == sort-based groupby().sum() for bounded
    group cardinality (string + int keys, many blocks)."""
    import ray.data as rd

    from raylink.join import tree_groupby_sum

    rng = np.random.default_rng(7)
    keys = np.array(["A", "B", "C"])[rng.integers(0, 3, 5000)]
    k2 = rng.integers(0, 2, 5000).astype(np.int64)
    v = rng.integers(-100, 100, 5000).astype(np.int64)
    w = rng.integers(0, 10, 5000).astype(np.int64)
    t = pa.table({"k": pa.array(keys), "k2": pa.array(k2),
                  "v": pa.array(v), "w": pa.array(w)})
    ds = rd.from_arrow(t).repartition(17)

    got = (
        tree_groupby_sum(ds, ["k", "k2"], ["v", "w"], fanin=4)
        .to_pandas().sort_values(["k", "k2"]).reset_index(drop=True)
    )
    want = (
        ds.groupby(["k", "k2"]).sum(["v", "w"])
        .to_pandas().sort_values(["k", "k2"]).reset_index(drop=True)
    )
    assert list(got.columns) == ["k", "k2", "sum(v)", "sum(w)"]
    assert got.equals(want[got.columns])


def test_hash_join_post_aggregates_in_task(ray_session):
    """hash_join(post=...) on the JOIN key: per-group sums are globally
    final (each key's rows are complete within its bucket group) — matches
    the join-then-groupby result exactly, including under repeated left
    keys spread over many input blocks."""
    import ray.data as rd

    from raylink.join import hash_join

    rng = np.random.default_rng(11)
    lk = rng.integers(0, 40, 3000).astype(np.int64)
    lv = rng.integers(1, 50, 3000).astype(np.int64)
    left = rd.from_arrow(
        pa.table({"k": pa.array(lk), "val": pa.array(lv)})
    ).repartition(13)
    right = rd.from_arrow(
        pa.table({"k": pa.array(np.arange(40, dtype=np.int64)),
                  "tag": pa.array(np.arange(40, dtype=np.int64) * 10)})
    )

    def post(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        uk, idx, inv = np.unique(k, return_index=True, return_inverse=True)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, t.column("val").to_numpy(zero_copy_only=False))
        return pa.table({"k": pa.array(uk), "val": pa.array(s),
                         "tag": t.column("tag").take(pa.array(idx))})

    got = (
        hash_join(left, right, on="k",
                  left_cols={"val": pa.int64()}, right_cols={"tag": pa.int64()},
                  num_buckets=8, post=post)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    import pandas as pd

    want = pd.DataFrame({"k": np.arange(40, dtype=np.int64)})
    want["val"] = pd.Series(lv).groupby(lk).sum().reindex(np.arange(40)).fillna(0).astype(np.int64)
    want = want[want["val"] > 0].reset_index(drop=True)
    want["tag"] = want["k"] * 10
    assert got.equals(want)


def test_semi_anti_join_paths_agree(ray_session):
    """Broadcast and hash paths of semi_join/anti_join produce identical
    rows; pandas isin is the oracle. Duplicate keys on both sides, an empty
    key relation, and a key in the keys_ds absent from the left are all
    covered."""
    import pandas as pd
    import ray.data as rd

    from raylink.join import anti_join, semi_join

    rng = np.random.default_rng(7)
    lk = rng.integers(0, 50, 300).astype(np.int64)
    lv = rng.normal(size=300)
    keys = np.concatenate(
        [rng.integers(0, 30, 80).astype(np.int64), np.array([999], np.int64)]
    )
    left = rd.from_arrow(pa.table({"k": pa.array(lk), "v": pa.array(lv)}))
    kds = rd.from_arrow(pa.table({"k": pa.array(keys)}))
    exp_semi = pd.DataFrame({"k": lk, "v": lv})[pd.Series(lk).isin(keys).to_numpy()]
    exp_anti = pd.DataFrame({"k": lk, "v": lv})[~pd.Series(lk).isin(keys).to_numpy()]

    for n_key_rows in (None, len(keys)):  # hash path, broadcast path
        got_s = (
            semi_join(left, kds, "k", {"v": pa.float64()}, n_key_rows=n_key_rows)
            .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        )
        got_a = (
            anti_join(left, kds, "k", {"v": pa.float64()}, n_key_rows=n_key_rows)
            .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got_s, exp_semi.sort_values(["k", "v"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got_a, exp_anti.sort_values(["k", "v"]).reset_index(drop=True)
        )

    # empty key relation: semi -> nothing, anti -> everything
    empty = rd.from_arrow(pa.table({"k": pa.array([], type=pa.int64())}))
    assert semi_join(left, empty, "k", {"v": pa.float64()}, n_key_rows=0).count() == 0
    assert anti_join(left, empty, "k", {"v": pa.float64()}).count() == 300


def test_diff_edges(ray_session):
    """Crawl-snapshot edge diff == set difference both ways (python oracle);
    identical snapshots -> empty diff."""
    import ray.data as rd

    from raylink.pipelines import diff_edges

    rng = np.random.default_rng(5)
    ea = np.unique(rng.integers(0, 40, size=(300, 2)), axis=0)
    eb = np.unique(rng.integers(0, 40, size=(300, 2)), axis=0)

    def ds(e):
        return rd.from_arrow(pa.table({
            "src": pa.array(e[:, 0].astype(np.int64)),
            "dst": pa.array(e[:, 1].astype(np.int64)),
        })).repartition(3)

    got = diff_edges(ds(ea), ds(eb)).to_pandas()
    sa = {tuple(r) for r in ea.tolist()}
    sb = {tuple(r) for r in eb.tolist()}
    want_added = sb - sa
    want_removed = sa - sb
    g_added = {(r.src, r.dst) for r in got.itertuples() if r.change == "added"}
    g_removed = {(r.src, r.dst) for r in got.itertuples() if r.change == "removed"}
    assert g_added == want_added and g_removed == want_removed
    assert len(got) == len(want_added) + len(want_removed)  # no dup rows

    assert diff_edges(ds(ea), ds(ea)).count() == 0
