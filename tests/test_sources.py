"""Reader-family parity (SURVEY.md §2.2): adjacency-list text and JSON-rows
sources feed build_graph and reproduce oracle results."""

import json

import numpy as np
import pytest

from oracles import cc_oracle, pr_oracle
from raylink.synth import expected_edges

N = 99


@pytest.fixture(scope="module")
def adj_files(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("adj")
    edges = expected_edges(N)
    adj = {i: [] for i in range(N)}
    for s, t in edges:
        adj[int(s)].append(int(t))
    plain = d / "graph.txt"
    with open(plain, "w") as f:
        for i in range(N):
            f.write(" ".join([str(i)] + [str(t) for t in adj[i]]) + "\n")
    withp = d / "graph_pid.txt"
    with open(withp, "w") as f:
        for i in range(N):
            f.write(" ".join([str(i), str(i % 4)] + [str(t) for t in adj[i]]) + "\n")
    jsonf = d / "graph.jsonl"
    with open(jsonf, "w") as f:
        for i in range(N):
            sinks = [[t, 100 + t, 2.5] for t in adj[i]]
            f.write(json.dumps([i, i % 4, float(i), sinks]) + "\n")
    return str(plain), str(withp), str(jsonf), edges


def test_read_adjacency_text(adj_files):
    from raylink.algos import pagerank
    from raylink.sources import read_adjacency_text

    plain, _, _, edges = adj_files
    eds, vds = read_adjacency_text(plain)
    assert vds.count() == N
    _, ranks = pagerank(eds, vertices_ds=vds, num_parts=4, iters=8)
    got = ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    np.testing.assert_allclose(got, pr_oracle(N, edges, iters=8), atol=1e-12)


def test_read_adjacency_text_with_partition(adj_files):
    from raylink.algos import connected_components
    from raylink.sources import read_adjacency_text

    _, withp, _, edges = adj_files
    eds, vds = read_adjacency_text(withp, with_partition=True)
    _, comps = connected_components(eds, vertices_ds=vds, num_parts=4)
    got = comps.to_pandas().sort_values("vid")["component"].to_numpy()
    np.testing.assert_array_equal(got, cc_oracle(N, edges))


def test_read_edges_json(adj_files):
    from raylink.sources import read_edges_json

    _, _, jsonf, edges = adj_files
    eds, vds = read_edges_json(jsonf)
    pdf = eds.to_pandas()
    got = np.array(sorted(zip(pdf["src"], pdf["dst"])), dtype=np.int64)
    np.testing.assert_array_equal(got, edges)
    assert (pdf["weight"] == 2.5).all()
    vdf = vds.to_pandas().sort_values("vid")
    assert (vdf["value"].to_numpy() == np.arange(N, dtype=float)).all()
