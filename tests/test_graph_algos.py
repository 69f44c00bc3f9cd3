"""BSP engine + algorithms vs pure-NumPy golden oracles on the synthetic
link graph (FIXTURES.md §4): PR allclose 1e-6 (here: exact to 1e-12),
CC/LPA/SSSP/k-core/triangles exact."""

import numpy as np
import pyarrow as pa
import pytest

from oracles import bfs_oracle, cc_oracle, kcore_oracle, pr_oracle, triangle_oracle
from raylink.synth import expected_edges

N = 121


@pytest.fixture(scope="module")
def edge_data(ray_session):
    import ray.data as rd

    edges = expected_edges(N)
    edges_ds = rd.from_arrow(
        pa.table({"src": pa.array(edges[:, 0]), "dst": pa.array(edges[:, 1])})
    )
    verts_ds = rd.from_arrow(pa.table({"vid": pa.array(np.arange(N, dtype=np.int64))}))
    return edges, edges_ds, verts_ds


def _sorted_state(ds, col):
    pdf = ds.to_pandas().sort_values("vid").reset_index(drop=True)
    assert (pdf["vid"].to_numpy() == np.arange(N)).all()
    return pdf[col].to_numpy()


def test_pagerank_fixed_iters(edge_data):
    from raylink.algos import pagerank

    edges, edges_ds, verts_ds = edge_data
    res, ranks = pagerank(edges_ds, vertices_ds=verts_ds, num_parts=4, iters=15)
    got = _sorted_state(ranks, "rank")
    exp = pr_oracle(N, edges, iters=15)
    np.testing.assert_allclose(got, exp, rtol=0, atol=1e-12)
    assert res.supersteps_run == 16  # ss0 emit-only + 15 update rounds


def test_pagerank_converged(edge_data):
    from raylink.algos import pagerank

    edges, edges_ds, verts_ds = edge_data
    res, ranks = pagerank(edges_ds, vertices_ds=verts_ds, num_parts=4, eps=1e-6)
    got = _sorted_state(ranks, "rank")
    exp = pr_oracle(N, edges, eps=1e-6)
    np.testing.assert_allclose(got, exp, rtol=0, atol=1e-9)
    # north-rule gate: allclose 1e-6 against converged reference values
    np.testing.assert_allclose(got, pr_oracle(N, edges, eps=1e-9), atol=1e-6)


def test_connected_components(edge_data):
    from raylink.algos import connected_components

    edges, edges_ds, verts_ds = edge_data
    res, comps = connected_components(edges_ds, vertices_ds=verts_ds, num_parts=4)
    got = _sorted_state(comps, "component")
    exp = cc_oracle(N, edges)
    np.testing.assert_array_equal(got, exp)
    # 3 residue components + N%3 isolated vertices
    assert len(np.unique(got)) == 3 + N % 3
    assert res.supersteps_run < 20


def test_label_propagation(edge_data):
    from raylink.algos import label_propagation

    edges, edges_ds, verts_ds = edge_data
    _, labels = label_propagation(edges_ds, vertices_ds=verts_ds, num_parts=4)
    got = _sorted_state(labels, "label")
    np.testing.assert_array_equal(got, cc_oracle(N, edges))


def test_sssp(edge_data):
    from raylink.algos import sssp

    edges, edges_ds, verts_ds = edge_data
    _, dists = sssp(edges_ds, vertices_ds=verts_ds, source=0, num_parts=4)
    got = _sorted_state(dists, "dist")
    np.testing.assert_array_equal(got, bfs_oracle(N, edges, 0))


def test_kcore(edge_data):
    from raylink.algos import kcore

    edges, edges_ds, verts_ds = edge_data
    _, members = kcore(edges_ds, vertices_ds=verts_ds, k=3, num_parts=4)
    got = _sorted_state(members, "in_core")
    np.testing.assert_array_equal(got, kcore_oracle(N, edges, 3))


def test_triangles(edge_data):
    from raylink.algos import triangle_count

    edges, edges_ds, _ = edge_data
    got = triangle_count(edges_ds)
    exp = triangle_oracle(N, edges)
    assert exp > 0, "synthetic graph should contain triangles"
    assert got == exp


def test_isolated_tail_vertices(edge_data):
    """N%3 tail vertices are isolated: own component, dist -1, and PageRank
    exactly (1-alpha)/N (no-dangling-mass semantics pinned)."""
    from raylink.algos import pagerank, sssp

    edges, edges_ds, verts_ds = edge_data
    assert N % 3 == 1  # vid N-1 is an isolated tail vertex
    _, dists = sssp(edges_ds, vertices_ds=verts_ds, source=0, num_parts=4)
    assert _sorted_state(dists, "dist")[N - 1] == -1
    _, ranks = pagerank(edges_ds, vertices_ds=verts_ds, num_parts=4, iters=5)
    assert abs(_sorted_state(ranks, "rank")[N - 1] - 0.15 / N) < 1e-15
