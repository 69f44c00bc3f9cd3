"""Skew handling (north-rule requirement; the reference has none, SURVEY.md
§4): a supernode graph must not blow up any stage.

- triangle counting: degree-ordered orientation keeps the supernode's
  oriented out-degree ~0 (all its edges point AT it), so the wedge stage
  stays linear where bare vid-ordering would enumerate C(deg, 2) pairs;
- PageRank/LPA: per-partition pre-aggregation per destination caps the
  supernode's inbound message rows at P (one combined row per partition).
"""

import numpy as np
import pyarrow as pa
import pytest

from oracles import pr_oracle


def _star_plus_triangles(n_leaves=20000):
    """Vertex 0 is a supernode (n_leaves in-edges); vertices 1..6 form two
    triangles among themselves."""
    src = np.arange(1, n_leaves + 1, dtype=np.int64)
    dst = np.zeros(n_leaves, dtype=np.int64)
    tri = np.array(
        [[1, 2], [2, 3], [1, 3], [4, 5], [5, 6], [4, 6]], dtype=np.int64
    )
    edges = np.concatenate(
        [np.stack([src, dst], axis=1), tri]
    )
    return edges, n_leaves + 1


@pytest.fixture(scope="module")
def star(ray_session):
    import ray.data as rd

    edges, n = _star_plus_triangles()
    ds = rd.from_arrow(
        pa.table({"src": pa.array(edges[:, 0]), "dst": pa.array(edges[:, 1])})
    )
    verts = rd.from_arrow(pa.table({"vid": pa.array(np.arange(n, dtype=np.int64))}))
    return edges, n, ds, verts


def test_triangles_supernode(star):
    """Degree orientation: the wedge stage emits ~O(E) candidates, not
    C(20000, 2) ~ 2e8; exact count preserved."""
    import time

    from raylink.algos import triangle_count

    edges, n, ds, verts = star
    t0 = time.time()
    got = triangle_count(ds)
    # 2 leaf triangles + 6 through the hub (each leaf-triangle edge closes
    # a triangle with vertex 0: {0,a,b} for each of the 6 leaf edges)
    assert got == 8
    assert time.time() - t0 < 60


def test_pagerank_supernode_messages_bounded(star, tmp_path):
    """Per-partition combiners: supernode receives <= P message rows per
    superstep regardless of its in-degree."""
    from raylink.algos import pagerank
    from raylink.graph import build_graph

    edges, n, ds, verts = star
    g = build_graph(ds, verts, num_parts=4, graph_dir=str(tmp_path / "g"))
    res, ranks = pagerank(g=g, iters=3, ckpt_dir=str(tmp_path / "ck"), engine="tasks")
    # total message rows per round ~ distinct (src_part, dst) pairs:
    # leaves only send to vertex 0 => <= P rows for it, plus triangle vertices
    for h in res.history[1:]:
        assert h["msgs_in"] <= 4 * 8  # P * (few distinct dsts), NOT ~20k
    got = ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    np.testing.assert_allclose(got, pr_oracle(n, edges, iters=3), atol=1e-12)


def test_hub_balanced_parts(ray_session, tmp_path):
    """Send-side shard balance: mega-hubs that hash-clump into one
    partition get spread by the greedy top-k reassign; per-shard edge
    counts even out and PageRank is bit-identical to the hash build
    (partitioning invariance)."""
    import ray.data as rd

    from raylink.algos import pagerank
    from raylink.graph import build_graph, hub_balanced_parts, load_shard
    from raylink.util import hash_partitioner

    P, N = 4, 120
    rng = np.random.default_rng(3)
    # three hubs that all hash into the SAME partition
    all_vids = np.arange(N, dtype=np.int64)
    parts0 = hash_partitioner(all_vids, P)
    target = np.bincount(parts0, minlength=P).argmax()
    hubs = all_vids[parts0 == target][:3]
    assert len(hubs) == 3
    rows = []
    for h in hubs:  # 300 out-edges each
        dsts = rng.choice(all_vids[all_vids != h], size=300, replace=True)
        rows += [(int(h), int(d)) for d in np.unique(dsts)]
    for v in all_vids:  # sparse background ring
        rows.append((int(v), int((v + 1) % N)))
    rows = sorted(set(rows))
    edges = rd.from_arrow(
        pa.table({"src": pa.array([r[0] for r in rows], pa.int64()),
                  "dst": pa.array([r[1] for r in rows], pa.int64())})
    )
    verts = rd.from_arrow(pa.table({"vid": pa.array(all_vids)}))

    def shard_edges(g):
        return np.array(
            [len(load_shard(g.graph_dir, p, g.filesystem)["indices"])
             for p in g.parts]
        )

    g_hash = build_graph(edges, verts, num_parts=P, partitioner="hash",
                         directed=True, graph_dir=str(tmp_path / "gh"))
    assign, edges_p = hub_balanced_parts(edges, verts, P, top_k=8)
    g_bal = build_graph(edges_p, assign, num_parts=P, partitioner="explicit",
                        directed=True, graph_dir=str(tmp_path / "gb"))
    eh, eb = shard_edges(g_hash), shard_edges(g_bal)
    assert eh.sum() == eb.sum()
    assert eh.max() > 2 * eh.sum() / P  # the clump is real in the hash build
    assert eb.max() < eh.max()  # balancing helped
    # the three hubs ended up on three different partitions
    sh = load_shard  # noqa: F841  (readability)
    hub_parts = set()
    for p in g_bal.parts:
        vids = load_shard(g_bal.graph_dir, p, g_bal.filesystem)["vids"]
        hub_parts.update({p for h in hubs if h in vids})
    assert len(hub_parts) == 3

    _, r1 = pagerank(g=g_hash, iters=10, ckpt_dir=str(tmp_path / "p1"))
    _, r2 = pagerank(g=g_bal, iters=10, ckpt_dir=str(tmp_path / "p2"))
    d1 = r1.to_pandas().sort_values("vid").reset_index(drop=True)
    d2 = r2.to_pandas().sort_values("vid").reset_index(drop=True)
    np.testing.assert_array_equal(d1["vid"], d2["vid"])
    np.testing.assert_allclose(d1["rank"], d2["rank"], rtol=0, atol=1e-14)
