"""Storage abstraction: every shard/checkpoint/boundary/sink byte must go
through raylink.storage (pyarrow.fs), so graph and checkpoint roots can live
on shared storage (the multi-node requirement). Verified two ways:

- ``file://`` URIs end-to-end (build -> BSP both engines -> resume), results
  bit-identical to the plain-path run;
- an explicit ``SubTreeFileSystem`` (the pyarrow mock-fs pattern): plain
  relative paths that only make sense inside the subtree, proving no code
  path falls back to bare POSIX on the original path strings.
"""

import numpy as np
import pyarrow as pa
import pytest
from pyarrow import fs as pafs

from raylink.synth import expected_edges

N = 97


@pytest.fixture(scope="module")
def edge_data(ray_session):
    import ray.data as rd

    edges = expected_edges(N)
    edges_ds = rd.from_arrow(
        pa.table({"src": pa.array(edges[:, 0]), "dst": pa.array(edges[:, 1])})
    ).materialize()
    verts_ds = rd.from_arrow(
        pa.table({"vid": pa.array(np.arange(N, dtype=np.int64))})
    )
    return edges, edges_ds, verts_ds


def _ranks(ds):
    return ds.to_pandas().sort_values("vid")["rank"].to_numpy()


def test_file_uri_roundtrip(edge_data, tmp_path):
    """build_graph + pagerank (both engines) + resume over file:// URIs."""
    from raylink.algos import pagerank
    from raylink.graph import LinkGraph, build_graph

    edges, edges_ds, verts_ds = edge_data
    # plain-path reference run
    g0 = build_graph(edges_ds, verts_ds, num_parts=4,
                     graph_dir=str(tmp_path / "plain_g"))
    _, r0 = pagerank(g=g0, iters=8, ckpt_dir=str(tmp_path / "plain_ck"))
    exp = _ranks(r0)

    uri_g = f"file://{tmp_path}/uri_g"
    uri_ck = f"file://{tmp_path}/uri_ck"
    g = build_graph(edges_ds, verts_ds, num_parts=4, graph_dir=uri_g)
    assert (tmp_path / "uri_g" / "manifest.json").exists()
    g2 = LinkGraph.load(uri_g)
    assert g2.n_edges == g0.n_edges and g2.n_vertices == N

    res, ranks = pagerank(g=g, iters=8, ckpt_dir=uri_ck)
    np.testing.assert_array_equal(_ranks(ranks), exp)
    # resume through the URI: zero supersteps, bit-identical
    res2, ranks2 = pagerank(g=g, iters=8, ckpt_dir=uri_ck)
    assert res2.supersteps_run == 0
    np.testing.assert_array_equal(_ranks(ranks2), exp)

    # tasks engine over the same URI graph, fresh ckpt
    res3, ranks3 = pagerank(g=g, iters=8, engine="tasks",
                            ckpt_dir=f"file://{tmp_path}/uri_ck_tasks")
    np.testing.assert_array_equal(_ranks(ranks3), exp)


def test_subtree_filesystem(edge_data, tmp_path):
    """Explicit pyarrow SubTreeFileSystem: graph dir and ckpt dir are plain
    relative names that only resolve inside the subtree."""
    from raylink.algos.pagerank import PageRank
    from raylink.graph import LinkGraph, build_graph, meta_edges, vertex_table
    from raylink.superstep import run_bsp

    edges, edges_ds, verts_ds = edge_data
    base = tmp_path / "subtree_base"
    base.mkdir()
    fs = pafs.SubTreeFileSystem(str(base), pafs.LocalFileSystem())

    g = build_graph(edges_ds, verts_ds, num_parts=4, graph_dir="graphs/g1",
                    filesystem=fs)
    # shards/boundary landed inside the subtree, nowhere else
    assert (base / "graphs" / "g1" / "shard_0.npz").exists()
    assert (base / "graphs" / "g1" / "boundary").is_dir()
    g2 = LinkGraph.load("graphs/g1", filesystem=fs)
    assert g2.n_vertices == N

    # BSP over the subtree fs (dataset engine), vs plain-path reference
    g0 = build_graph(edges_ds, verts_ds, num_parts=4,
                     graph_dir=str(tmp_path / "plain_g2"))
    from raylink.algos import pagerank

    _, r0 = pagerank(g=g0, iters=6, ckpt_dir=str(tmp_path / "plain_ck2"))
    res = run_bsp(g, PageRank(), {"iters": 6, "alpha": 0.85,
                                  "partitioner": g.partitioner,
                                  "num_parts": g.num_parts},
                  max_supersteps=7, ckpt_dir="ckpt/pr1")
    assert (base / "ckpt" / "pr1" / "manifest.json").exists()
    got = (
        res.state_dataset().to_pandas().sort_values("vid")["rank"].to_numpy()
    )
    np.testing.assert_array_equal(got, _ranks(r0))

    # topology reads through the fs
    vt = vertex_table(g).to_pandas()
    assert len(vt) == N
    me = meta_edges(g).to_pandas()
    assert len(me) > 0


def test_sink_uri(ray_session, tmp_path):
    import ray.data as rd

    from raylink.sink import read_partitioned, write_partitioned

    ds = rd.from_arrow(
        pa.table({"k": pa.array(np.arange(100, dtype=np.int64)),
                  "v": pa.array(np.arange(100, dtype=np.int64) * 2)})
    )
    out = f"file://{tmp_path}/sink_out"
    man = write_partitioned(ds, out, key="k", num_parts=4)
    assert sorted(man["completed"]) == [0, 1, 2, 3]
    back = read_partitioned(out).to_pandas().sort_values("k")
    assert (back["v"].to_numpy() == np.arange(100) * 2).all()
    # re-run skips everything (resumable output)
    man2 = write_partitioned(ds, out, key="k", num_parts=4)
    assert man2["completed"] == man["completed"]
