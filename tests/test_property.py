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
