"""Strongly connected components (algos/scc.py) vs the boolean-closure
oracle: the synthetic link graph, adversarial digraphs (DAG, descending
chain, two cycles sharing a vertex... ), partitioning invariance, and
mid-job resume with driver-phase replay."""

import numpy as np
import pyarrow as pa
import pytest

from oracles import scc_oracle
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


def _run_scc(edges_ds, verts_ds, n, tmp, **kw):
    from raylink.algos.scc import scc

    res, comps = scc(edges_ds, vertices_ds=verts_ds, ckpt_dir=str(tmp), **kw)
    pdf = comps.to_pandas().sort_values("vid").reset_index(drop=True)
    assert (pdf["vid"].to_numpy() == np.arange(n)).all()
    return res, pdf["scc"].to_numpy()


def test_scc_synthetic_graph(edge_data, tmp_path):
    edges, edges_ds, verts_ds = edge_data
    _, got = _run_scc(edges_ds, verts_ds, N, tmp_path / "ck", num_parts=4)
    np.testing.assert_array_equal(got, scc_oracle(N, edges))


def test_scc_partitioning_invariant(edge_data, tmp_path):
    edges, edges_ds, verts_ds = edge_data
    _, a = _run_scc(edges_ds, verts_ds, N, tmp_path / "p2", num_parts=2)
    _, b = _run_scc(edges_ds, verts_ds, N, tmp_path / "p7",
                    num_parts=7, partitioner="mod")
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize(
    "name,n,edges",
    [
        ("dag", 6, [(0, 1), (1, 2), (0, 3), (3, 2), (2, 4), (2, 5)]),
        # descending chain: the FB-coloring worst case (one peel per vertex)
        ("desc_chain", 5, [(4, 3), (3, 2), (2, 1), (1, 0)]),
        ("two_cycles_shared", 5,
         [(0, 1), (1, 0), (1, 2), (2, 3), (3, 1), (3, 4)]),
        ("self_loops", 4, [(0, 0), (1, 2), (2, 1), (3, 3)]),
        ("full_cycle", 6, [(i, (i + 1) % 6) for i in range(6)]),
        ("bowtie", 7,
         [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (3, 6)]),
    ],
)
def test_scc_adversarial(ray_session, tmp_path, name, n, edges):
    import ray.data as rd

    edges_ds = rd.from_arrow(pa.table({
        "src": pa.array(np.array([e[0] for e in edges], dtype=np.int64)),
        "dst": pa.array(np.array([e[1] for e in edges], dtype=np.int64)),
    }))
    verts_ds = rd.from_arrow(pa.table({"vid": pa.array(np.arange(n, dtype=np.int64))}))
    _, got = _run_scc(edges_ds, verts_ds, n, tmp_path / name, num_parts=3)
    np.testing.assert_array_equal(got, scc_oracle(n, edges))


def test_scc_resume_phase_replay(edge_data, tmp_path):
    """Interrupt mid-job (max_supersteps cap), resume on the same ckpt_dir:
    the driver phase is replayed from manifest history and the final
    assignment is identical to an uninterrupted run."""
    edges, edges_ds, verts_ds = edge_data
    from raylink.algos.scc import scc, scc_edges
    from raylink.graph import build_graph

    g = build_graph(scc_edges(edges_ds), verts_ds, num_parts=4,
                    partitioner="hash", directed=True, edge_cols=["dirmask"])
    _, full = scc(g=g, ckpt_dir=str(tmp_path / "full"))
    res1, _ = scc(g=g, max_supersteps=4, ckpt_dir=str(tmp_path / "int"))
    assert res1.last_superstep == 3  # actually interrupted mid-job
    res2, resumed = scc(g=g, ckpt_dir=str(tmp_path / "int"))
    assert res2.supersteps_run < res2.last_superstep + 1  # skipped rounds
    a = full.to_pandas().sort_values("vid").reset_index(drop=True)
    b = resumed.to_pandas().sort_values("vid").reset_index(drop=True)
    np.testing.assert_array_equal(a["scc"].to_numpy(), b["scc"].to_numpy())


def test_scc_engines_agree(edge_data, tmp_path):
    """Dataset-shuffle and raw-task BSP engines produce identical SCC ids
    (phase flips are evaluated per round in both)."""
    edges, edges_ds, verts_ds = edge_data
    from raylink.algos.scc import scc, scc_edges
    from raylink.graph import build_graph

    g = build_graph(scc_edges(edges_ds), verts_ds, num_parts=4,
                    partitioner="hash", directed=True, edge_cols=["dirmask"])
    _, a = scc(g=g, ckpt_dir=str(tmp_path / "ds"), engine="dataset")
    _, b = scc(g=g, ckpt_dir=str(tmp_path / "tk"), engine="tasks")
    pa_ = a.to_pandas().sort_values("vid").reset_index(drop=True)
    pb = b.to_pandas().sort_values("vid").reset_index(drop=True)
    np.testing.assert_array_equal(pa_["scc"].to_numpy(), pb["scc"].to_numpy())
