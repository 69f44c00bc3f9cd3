"""Multi-raylet validation: run the flagship + tasks-engine BSP + a
relational join + a mid-job resume against a given Ray session and print ONE
JSON line of deterministic result hashes, so a real two-node cluster run can
be diffed bit-for-bit against single-process local mode.

This is the evidence leg for the reference's cluster deployment story
(reference: Docker/Hama/Goffish_Hama_Bin/goffish:6-15 — a Docker-swarm Hama
cluster); every other scale claim in this repo was measured on one raylet.
The tasks engine's P x P ObjectRef message exchange (superstep_tasks.py) and
Ray Data's block movement both cross the raylet/object-store boundary here.

Scope: a SAME-BOX multi-raylet cluster (all state roots under this
machine's /tmp). Against a multi-MACHINE cluster, point RAYLINK_CKPT_ROOT /
RAYLINK_GRAPH_ROOT at shared storage (s3://-style URIs) first — node-local
/tmp is not visible across workers.

Usage:
  python tools/cluster_validate.py --local             # address="local", 16 cpus
  python tools/cluster_validate.py --address IP:PORT   # join existing cluster
  python tools/cluster_validate.py --sf DIR            # testdata dir (sf0.001)

Orchestrated end-to-end (start head + worker raylet, run both modes, diff,
ray stop) by `python bench.py --cluster` and tests/test_cluster.py.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries chosen to cover every distributed substrate: Dataset-BSP engine
# (pagerank), meta-graph CC, raw-task BSP engine with P x P ObjectRef
# exchange (label_propagation via run_bsp_tasks), a large x large hash join
# (nation_revenue), and the bucketed triangle close shuffle.
QUERIES = [
    "pagerank",
    "connected_components",
    "label_propagation",
    "nation_revenue",
    "triangle_count",
]


def result_hash(res) -> tuple[str, int]:
    """Driver-compare-style canonical hash: columns sorted by name, rows
    sorted by all columns, object columns stringified, md5 over CSV."""
    from tools.check_correctness import canon, to_pandas

    df = canon(to_pandas(res))
    csv = df.to_csv(index=False, float_format="%.17g")
    return hashlib.md5(csv.encode()).hexdigest(), len(df)


def probe_nodes(ray) -> dict:
    """How many raylets are alive, and how many distinct nodes actually
    execute concurrently-scheduled tasks right now."""
    alive = [n for n in ray.nodes() if n["Alive"]]

    @ray.remote(num_cpus=1)
    def _where() -> str:
        time.sleep(0.5)  # hold the CPU so the probes must spread
        return ray.get_runtime_context().get_node_id()

    total_cpus = int(sum(n["Resources"].get("CPU", 0) for n in alive))
    seen = set(ray.get([_where.remote() for _ in range(total_cpus)]))
    return {"alive_raylets": len(alive), "task_nodes_seen": len(seen),
            "total_cpus": total_cpus}


def run_resume(sf_dir: str, ckpt_dir: str) -> dict:
    """PageRank with checkpointing, then a fresh invocation over the same
    ckpt_dir: must do ZERO additional supersteps and return bit-identical
    ranks (the resume contract, tests/test_resume.py, now cross-raylet)."""
    import shutil

    import numpy as np

    from raylink.algos import pagerank
    from raylink.pipelines import page_edge_tables

    shutil.rmtree(ckpt_dir, ignore_errors=True)
    _, edges, verts, _ = page_edge_tables(sf_dir)
    edges = edges.materialize()
    r1, ranks1 = pagerank(edges, vertices_ds=verts, num_parts=4, eps=1e-6,
                          ckpt_dir=ckpt_dir)
    p1 = ranks1.to_pandas().sort_values("vid")["rank"].to_numpy()
    r2, ranks2 = pagerank(g=r1.graph, eps=1e-6, ckpt_dir=ckpt_dir)
    p2 = ranks2.to_pandas().sort_values("vid")["rank"].to_numpy()
    ok = r2.supersteps_run == 0 and np.array_equal(p1, p2)
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    return {"resume_supersteps": r2.supersteps_run,
            "resume_bit_identical": bool(ok),
            "ranks_md5": hashlib.md5(p1.tobytes()).hexdigest()}


def run_flagship(sf_dir: str, scale: int, reps: int = 2) -> dict:
    """The bench flagship chain (amplified pages -> extract -> build ->
    PageRank-to-1e-6 on the tasks engine), timed on whatever session is
    active — the first cross-raylet throughput number for this repo."""
    import statistics

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    import bench
    from raylink.algos import pagerank
    from raylink.graph import build_graph

    pages, n = bench.amplified_pages(sf_dir, scale)
    pages = pages.materialize()
    verts = rd.from_arrow(pa.table({"vid": pa.array(np.arange(n, dtype=np.int64))}))
    walls, n_edges, rank_md5 = [], 0, ""
    for _rep in range(reps):
        t0 = time.perf_counter()
        edges = bench.flagship_edges(pages).materialize()
        n_edges = edges.count()
        g = build_graph(edges, verts, num_parts=8, partitioner="hash",
                        directed=True)
        res, ranks = pagerank(g=g, eps=1e-6, resume=False, engine="tasks",
                              ckpt_every=5)
        p = ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
        rank_md5 = hashlib.md5(p.tobytes()).hexdigest()
        walls.append(time.perf_counter() - t0)
    wall = statistics.median(walls)
    return {"flagship_sec": round(wall, 2), "n_pages": n, "n_edges": n_edges,
            "supersteps": res.supersteps_run,
            "edges_per_sec_total": round(n_edges * res.supersteps_run / wall),
            "ranks_md5": rank_md5, "reps": reps}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--address", default=None,
                    help="existing cluster address (IP:PORT)")
    ap.add_argument("--local", action="store_true",
                    help="single-process local mode (the control)")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--num-cpus", type=int, default=16,
                    help="cpus for --local mode (match the cluster total)")
    ap.add_argument("--flagship-only", action="store_true",
                    help="time the flagship chain instead of the hash suite")
    ap.add_argument("--scale", type=int, default=8,
                    help="corpus amplification for --flagship-only")
    args = ap.parse_args()

    # ISOLATED state roots per mode (review finding): the hash-suite
    # queries checkpoint+cache under deterministic keys; with a shared
    # /tmp/raylink root the second mode would RESUME the first mode's
    # completed checkpoints (0 supersteps) and the bit-identical comparison
    # would be true by construction. Fresh roots force every mode to
    # compute from scratch — the cluster mode genuinely crosses raylets.
    import shutil

    mode_tag = "cluster" if args.address else "local"
    scratch = f"/tmp/raylink_cv/{mode_tag}"
    shutil.rmtree(scratch, ignore_errors=True)
    os.environ["RAYLINK_CKPT_ROOT"] = f"{scratch}/ckpt"
    os.environ["RAYLINK_GRAPH_ROOT"] = f"{scratch}/graphs"

    import ray

    if args.address:
        ray.init(address=args.address, include_dashboard=False,
                 logging_level="ERROR")
        mode = "cluster"
    else:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
        mode = "local"
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    out = {"mode": mode, "sf": args.sf, "nodes": probe_nodes(ray),
           "hashes": {}, "rows": {}, "wall": {}}
    if args.flagship_only:
        out["flagship"] = run_flagship(args.sf, args.scale)
    else:
        import __ray_entry__

        qs = __ray_entry__.queries()
        for name in QUERIES:
            t0 = time.perf_counter()
            h, n = result_hash(qs[name](args.sf))
            out["hashes"][name] = h
            out["rows"][name] = n
            out["wall"][name] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        out["resume"] = run_resume(args.sf, f"/tmp/raylink/ck_{mode}")
        out["wall"]["resume"] = round(time.perf_counter() - t0, 2)

    ray.shutdown()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
