"""Checkpoint/resume + determinism (FIXTURES.md §5, north-rule requirements):
- resume after an interrupted run must produce bit-identical results;
- a fresh re-run over the same input must be bit-identical (float summation
  order pinned);
- partition count must not change results.
"""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from raylink.synth import expected_edges

N = 99


@pytest.fixture()
def graph_inputs(ray_session):
    import ray.data as rd

    edges = expected_edges(N)
    edges_ds = rd.from_arrow(
        pa.table({"src": pa.array(edges[:, 0]), "dst": pa.array(edges[:, 1])})
    )
    verts_ds = rd.from_arrow(pa.table({"vid": pa.array(np.arange(N, dtype=np.int64))}))
    return edges_ds, verts_ds


def _ranks(ds):
    return ds.to_pandas().sort_values("vid")["rank"].to_numpy()


def test_resume_mid_iteration_bit_identical(graph_inputs, tmp_path):
    from raylink.algos import pagerank
    from raylink.graph import build_graph

    edges_ds, verts_ds = graph_inputs
    g = build_graph(edges_ds, verts_ds, num_parts=4, graph_dir=str(tmp_path / "g"))

    ck_full = str(tmp_path / "full")
    _, ranks_full = pagerank(g=g, iters=12, ckpt_dir=ck_full)
    full = _ranks(ranks_full)

    # "interrupted" run: stop after 5 supersteps (driver crash analog),
    # then resume to completion from the on-disk manifest + checkpoints
    ck_int = str(tmp_path / "interrupted")
    res1, _ = pagerank(g=g, iters=12, max_supersteps=5, ckpt_dir=ck_int)
    assert res1.supersteps_run == 5
    res2, ranks_resumed = pagerank(g=g, iters=12, ckpt_dir=ck_int)
    assert res2.supersteps_run == 8  # supersteps 5..12 only
    resumed = _ranks(ranks_resumed)
    assert np.array_equal(full, resumed), "resume must be bit-identical"


def test_rerun_is_bit_identical(graph_inputs, tmp_path):
    from raylink.algos import pagerank
    from raylink.graph import build_graph

    edges_ds, verts_ds = graph_inputs
    a = []
    for run in range(2):
        g = build_graph(
            edges_ds, verts_ds, num_parts=4, graph_dir=str(tmp_path / f"g{run}")
        )
        _, ranks = pagerank(g=g, iters=10, ckpt_dir=str(tmp_path / f"ck{run}"))
        a.append(_ranks(ranks))
    assert np.array_equal(a[0], a[1])


def test_partition_count_invariance(graph_inputs, tmp_path):
    from raylink.algos import pagerank
    from raylink.graph import build_graph

    edges_ds, verts_ds = graph_inputs
    outs = []
    for np_ in (2, 7):
        g = build_graph(
            edges_ds, verts_ds, num_parts=np_, graph_dir=str(tmp_path / f"g{np_}")
        )
        _, ranks = pagerank(g=g, iters=10, ckpt_dir=str(tmp_path / f"ck{np_}"))
        outs.append(_ranks(ranks))
    # bit-identical across partitionings: per-dst sums are reduced in a
    # deterministic global order regardless of which partition sent them
    np.testing.assert_allclose(outs[0], outs[1], rtol=0, atol=5e-16)


def test_graph_build_resume(graph_inputs, tmp_path):
    """A completed graph dir is reused, not rebuilt (manifest lineage)."""
    from raylink.graph import LinkGraph, build_graph

    edges_ds, verts_ds = graph_inputs
    gdir = str(tmp_path / "g")
    g1 = build_graph(edges_ds, verts_ds, num_parts=4, graph_dir=gdir)
    g2 = LinkGraph.load(gdir)
    assert g2.n_vertices == g1.n_vertices == N
    assert g2.parts == g1.parts


def test_superstep_fusion_exact_for_fixed_iters(graph_inputs, tmp_path):
    """ckpt_every>1 fuses rounds into one lazy execution; fixed-iteration
    runs must stay bit-identical (chain clamped to the iteration budget)."""
    from raylink.algos import pagerank
    from raylink.graph import build_graph

    edges_ds, verts_ds = graph_inputs
    g = build_graph(edges_ds, verts_ds, num_parts=4, graph_dir=str(tmp_path / "g"))
    _, r1 = pagerank(g=g, iters=12, ckpt_dir=str(tmp_path / "c1"), ckpt_every=1)
    res4, r4 = pagerank(g=g, iters=12, ckpt_dir=str(tmp_path / "c4"), ckpt_every=4)
    a = r1.to_pandas().sort_values("vid")["rank"].to_numpy()
    b = r4.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert np.array_equal(a, b)
    assert res4.last_superstep == 12


def test_tasks_engine_bit_identical(graph_inputs, tmp_path):
    """The raw-task BSP fast path must produce bit-identical results to the
    canonical Dataset-shuffle engine (same kernels, same reduction order)."""
    from raylink.algos import label_propagation, pagerank
    from raylink.graph import build_graph

    edges_ds, verts_ds = graph_inputs
    g = build_graph(edges_ds, verts_ds, num_parts=4, graph_dir=str(tmp_path / "g"))
    _, r_ds = pagerank(g=g, iters=10, ckpt_dir=str(tmp_path / "d"), engine="dataset")
    _, r_tk = pagerank(g=g, iters=10, ckpt_dir=str(tmp_path / "t"), engine="tasks",
                       ckpt_every=4)
    a = r_ds.to_pandas().sort_values("vid")["rank"].to_numpy()
    b = r_tk.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert np.array_equal(a, b)

    gu = build_graph(edges_ds, verts_ds, num_parts=4, directed=False,
                     graph_dir=str(tmp_path / "gu"))
    _, l_ds = label_propagation(g=gu, ckpt_dir=str(tmp_path / "ld"))
    _, l_tk = label_propagation(g=gu, ckpt_dir=str(tmp_path / "lt"), engine="tasks")
    la = l_ds.to_pandas().sort_values("vid")["label"].to_numpy()
    lb = l_tk.to_pandas().sort_values("vid")["label"].to_numpy()
    assert np.array_equal(la, lb)


def test_tasks_engine_resume(graph_inputs, tmp_path):
    """Interrupted task-engine run resumes bit-identically from its
    checkpoint (same Checkpoint layout as the Dataset engine)."""
    from raylink.algos import pagerank
    from raylink.graph import build_graph

    edges_ds, verts_ds = graph_inputs
    g = build_graph(edges_ds, verts_ds, num_parts=4, graph_dir=str(tmp_path / "g"))
    _, full = pagerank(g=g, iters=12, ckpt_dir=str(tmp_path / "f"), engine="tasks")
    res1, _ = pagerank(g=g, iters=12, max_supersteps=5,
                       ckpt_dir=str(tmp_path / "i"), engine="tasks")
    res2, resumed = pagerank(g=g, iters=12, ckpt_dir=str(tmp_path / "i"),
                             engine="tasks")
    a = full.to_pandas().sort_values("vid")["rank"].to_numpy()
    b = resumed.to_pandas().sort_values("vid")["rank"].to_numpy()
    assert np.array_equal(a, b)


def test_checkpoint_retention(graph_inputs, tmp_path):
    """Old-round checkpoints are garbage-collected (storage-bounded jobs);
    the retained window still resumes bit-identically; retain_rounds=0
    keeps everything."""
    from raylink.algos import pagerank
    from raylink.graph import build_graph

    edges_ds, verts_ds = graph_inputs
    g = build_graph(edges_ds, verts_ds, num_parts=4, graph_dir=str(tmp_path / "g"))

    ck = str(tmp_path / "gc")
    _, ranks = pagerank(g=g, iters=10, ckpt_dir=ck)
    full = _ranks(ranks)
    ss_dirs = sorted(os.listdir(os.path.join(ck, "state")))
    assert len(ss_dirs) <= 3, f"retention failed: {ss_dirs}"
    assert "ss=10" in ss_dirs  # the final round survives
    # resume of the FINISHED job from the retained window: zero supersteps
    res2, ranks2 = pagerank(g=g, iters=10, ckpt_dir=ck)
    assert res2.supersteps_run == 0
    assert np.array_equal(full, _ranks(ranks2))

    # interrupted-then-resumed with GC active stays bit-identical
    ck_i = str(tmp_path / "gci")
    pagerank(g=g, iters=10, max_supersteps=5, ckpt_dir=ck_i)
    _, ranks_r = pagerank(g=g, iters=10, ckpt_dir=ck_i)
    assert np.array_equal(full, _ranks(ranks_r))

    # retain_rounds=0 disables GC (tasks engine leg too)
    ck0 = str(tmp_path / "keepall")
    pagerank(g=g, iters=6, ckpt_dir=ck0, engine="tasks", ckpt_every=1)
    # run_bsp_tasks takes ctx via pagerank's kwargs; patch through a direct call
    from raylink.algos.pagerank import PageRank
    from raylink.superstep_tasks import run_bsp_tasks

    ck1 = str(tmp_path / "keepall2")
    run_bsp_tasks(g, PageRank(),
                  {"iters": 6, "partitioner": g.partitioner,
                   "num_parts": g.num_parts, "retain_rounds": 0},
                  max_supersteps=7, ckpt_dir=ck1)
    assert len(os.listdir(os.path.join(ck1, "state"))) == 7  # ss=0..6 all kept
