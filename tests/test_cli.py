"""CLI job launcher smoke: adjacency input -> BSP job -> resumable
partitioned output, in a subprocess that owns its own Ray session."""

import glob
import json
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from oracles import cc_oracle
from raylink.synth import expected_edges

N = 99


def test_cli_cc_roundtrip(tmp_path):
    edges = expected_edges(N)
    adj = {i: [] for i in range(N)}
    for s, d in edges:
        adj[int(s)].append(int(d))
    gfile = tmp_path / "g.txt"
    with open(gfile, "w") as f:
        for i in range(N):
            f.write(" ".join([str(i)] + [str(t) for t in adj[i]]) + "\n")
    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "-m", "raylink.cli", "cc", "--edges", str(gfile),
         "--format", "adjacency", "--out", str(out), "--num-parts", "4",
         "--engine", "tasks", "--num-cpus", "4"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["out_partitions"] == 4
    parts = sorted(glob.glob(str(out / "part=*" / "data.parquet")))
    df = pd.concat([pq.read_table(p).to_pandas() for p in parts]).sort_values("vid")
    np.testing.assert_array_equal(df["component"].to_numpy(), cc_oracle(N, edges))


def test_cli_full_info_pagerank(tmp_path):
    """full_info format -> explicit partitioner end-to-end via the CLI."""
    edges = expected_edges(N)
    part_of = lambda v: v % 3  # noqa: E731
    adj = {i: set() for i in range(N)}
    for s, d in edges:
        adj[int(s)].add(int(d))
    gfile = tmp_path / "fi.txt"
    # reference parser order: pid vid sgid (sink sgid pid)+
    with open(gfile, "w") as f:
        for v in range(N):
            toks = [str(part_of(v)), str(v), str(v + 500)]
            for d in sorted(adj[v]):
                toks += [str(d), str(d + 500), str(part_of(d))]
            f.write(" ".join(toks) + "\n")
    r = subprocess.run(
        [sys.executable, "-m", "raylink.cli", "pagerank", "--edges", str(gfile),
         "--format", "full_info", "--iters", "5", "--engine", "tasks",
         "--num-cpus", "4"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["rows"] == N and summary["supersteps"] == 6


def test_cli_named_query(tmp_path):
    """Generic query launcher: any q_<name> pipeline runs via the CLI and
    writes parquet."""
    r = subprocess.run(
        [sys.executable, "-m", "raylink.cli", "query", "--name", "pricing_summary",
         "--sf-dir", "/root/testdata/sf0.001", "--out", str(tmp_path / "q1"),
         "--num-cpus", "4"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["query"] == "pricing_summary" and summary["rows"] >= 1
    # unknown name lists what exists
    r2 = subprocess.run(
        [sys.executable, "-m", "raylink.cli", "query", "--name", "nope",
         "--sf-dir", "/root/testdata/sf0.001", "--num-cpus", "4"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert r2.returncode == 2
    out = json.loads(r2.stdout.strip().splitlines()[-1])
    assert "pricing_summary" in out["available"]


def test_cli_scc(tmp_path):
    """scc via the CLI on adjacency input; ids match the closure oracle."""
    from oracles import scc_oracle

    edges = expected_edges(N)
    adj = {i: [] for i in range(N)}
    for s, d in edges:
        adj[int(s)].append(int(d))
    gfile = tmp_path / "g.txt"
    with open(gfile, "w") as f:
        for i in range(N):
            f.write(" ".join([str(i)] + [str(t) for t in adj[i]]) + "\n")
    out = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "-m", "raylink.cli", "scc", "--edges", str(gfile),
         "--format", "adjacency", "--out", str(out), "--num-parts", "4",
         "--engine", "tasks", "--num-cpus", "4"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    parts = sorted(glob.glob(str(out / "part=*" / "data.parquet")))
    df = pd.concat([pq.read_table(p).to_pandas() for p in parts]).sort_values("vid")
    np.testing.assert_array_equal(df["scc"].to_numpy(), scc_oracle(N, edges))
