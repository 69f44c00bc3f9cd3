"""Crawl-scale id handling: packed-key guards, dense-id remap, collision-safe
url ids (VERDICT r3 items 1 and 10)."""

import numpy as np
import pyarrow as pa
import pytest

from tests.oracles import triangle_oracle

N = 40


def _hash_edges():
    """The synthetic edge set with vids pushed through hash64_str — the
    63-bit production id regime of hash_ids_from_urls."""
    import ray.data as rd

    from raylink.synth import expected_edges
    from raylink.util import hash64_str

    edges = expected_edges(N)
    hids = hash64_str([f"https://site{i}.example/" for i in range(N)])
    assert int(hids.max()) >= 1 << 32  # the regime the guards exist for
    eds = rd.from_arrow(
        pa.table(
            {"src": pa.array(hids[edges[:, 0]].astype(np.int64)),
             "dst": pa.array(hids[edges[:, 1]].astype(np.int64))}
        )
    )
    return edges, hids, eds


def test_packed_key_guards_raise_on_63bit_ids(ray_session):
    from raylink.algos import triangle_count
    from raylink.pipelines import distinct_edges

    _, _, eds = _hash_edges()
    with pytest.raises(Exception, match="dense_id_remap"):
        distinct_edges(eds).materialize()
    with pytest.raises(Exception, match="dense_id_remap"):
        triangle_count(eds)


def test_dense_id_remap_end_to_end(ray_session):
    """hash-assigned ids -> dense_id_remap -> packed-key operators give the
    exact counts of the original integer-id graph."""
    from raylink.algos import triangle_count
    from raylink.ids import dense_id_remap
    from raylink.pipelines import distinct_edges

    edges, hids, eds = _hash_edges()
    remapped, mapping = dense_id_remap(eds, num_buckets=16)
    mp = mapping.to_pandas().sort_values("vid").reset_index(drop=True)

    # bijection onto [0, n_distinct_vids)
    used = np.unique(np.concatenate([edges[:, 0], edges[:, 1]]))
    assert len(mp) == len(used)
    assert sorted(mp["dense"].tolist()) == list(range(len(used)))
    assert set(mp["vid"]) == set(int(h) for h in hids[used])

    # deterministic: a second remap produces the identical mapping
    _, mapping2 = dense_id_remap(eds, num_buckets=16)
    mp2 = mapping2.to_pandas().sort_values("vid").reset_index(drop=True)
    assert mp.equals(mp2)

    # packed-key operators now run and match the integer-id oracles
    assert triangle_count(remapped) == triangle_oracle(N, edges)
    n_distinct = len({(int(s), int(d)) for s, d in edges})
    assert distinct_edges(remapped).count() == n_distinct

    # forced distributed join path agrees with the broadcast path
    remap_sh, _ = dense_id_remap(eds, num_buckets=16, broadcast_threshold=0)
    a = remapped.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    b = remap_sh.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert a.equals(b)


def test_dense_id_remap_carry_cols(ray_session):
    import ray.data as rd

    from raylink.ids import dense_id_remap

    eds = rd.from_arrow(
        pa.table(
            {"src": pa.array([1 << 40, 1 << 41], type=pa.int64()),
             "dst": pa.array([1 << 41, 1 << 42], type=pa.int64()),
             "weight": pa.array([0.5, 2.5])}
        )
    )
    remapped, mapping = dense_id_remap(
        eds, num_buckets=4, carry_cols={"weight": pa.float64()}
    )
    pdf = remapped.to_pandas().sort_values("weight").reset_index(drop=True)
    mp = dict(zip(mapping.to_pandas()["vid"], mapping.to_pandas()["dense"]))
    assert pdf["weight"].tolist() == [0.5, 2.5]
    assert pdf.loc[0, "src"] == mp[1 << 40] and pdf.loc[0, "dst"] == mp[1 << 41]
    assert pdf.loc[1, "src"] == mp[1 << 41] and pdf.loc[1, "dst"] == mp[1 << 42]


def test_collision_safe_ids_forced_collisions(ray_session):
    """A deliberately colliding hash (mod 16) must still yield injective vids
    over distinct urls, deterministically."""
    import ray.data as rd

    from raylink.ids import collision_safe_ids
    from raylink.util import hash64_str

    urls = [f"https://site{i}.example/p{i % 7}" for i in range(300)]
    ds = rd.from_arrow(pa.table({"url": pa.array(urls)}))

    def bad_hash(u):
        return (hash64_str(u) % 16).astype(np.int64)

    out = collision_safe_ids(ds, _hashfn=bad_hash).to_pandas()
    assert len(out) == len(set(urls))
    assert out["vid"].nunique() == len(set(urls))
    out2 = collision_safe_ids(ds, _hashfn=bad_hash).to_pandas()
    a = out.sort_values("url").reset_index(drop=True)
    b = out2.sort_values("url").reset_index(drop=True)
    assert a.equals(b)

    # collision-free input keeps the plain hash64_str ids untouched
    clean = collision_safe_ids(ds).to_pandas().sort_values("url")
    exp = hash64_str(sorted(set(urls)))
    assert clean["vid"].tolist() == [int(h) for h in exp]


def test_packed_ops_high_half_ids(ray_session):
    """vids in [2**31, 2**32) — permitted by assert_packable — survive the
    pack/unpack round trip (an arithmetic >>32 would sign-extend them):
    distinct_edges returns them verbatim and triangle_count stays exact."""
    import ray.data as rd

    from raylink.algos.triangles import triangle_count
    from raylink.pipelines import distinct_edges

    base = 3_000_000_000  # > 2**31
    tri = [(base, base + 1), (base + 1, base + 2), (base + 2, base)]
    extra = [(base, base + 3), (base + 3, base + 4)]
    eds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in tri + extra], type=pa.int64()),
                "dst": pa.array([b for _, b in tri + extra], type=pa.int64()),
            }
        )
    )
    got = distinct_edges(eds).to_pandas()
    pairs = {(int(a), int(b)) for a, b in zip(got["src"], got["dst"])}
    want = set(tri + extra)  # distinct_edges preserves direction
    assert pairs == want
    assert (got["src"] > 0).all()
    assert triangle_count(eds) == 1
