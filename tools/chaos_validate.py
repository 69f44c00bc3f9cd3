"""Node-loss chaos validation: PageRank on a two-raylet cluster with the
WORKER raylet SIGKILLed mid-job. The claim under test is the 100-TB
operations story: losing a node mid-superstep must not corrupt results —
the job either survives in-flight (Ray task retry + lineage reconstruction
re-executes the dead node's deterministic BSP tasks) or a fresh driver
resumes from the per-superstep parquet checkpoint — and the final ranks are
BIT-IDENTICAL to an undisturbed run either way.

Orchestrates: start head+worker -> control run (undisturbed, records the
reference md5) -> chaos run (kill worker ~mid-PageRank) -> if the driver
died, resume-driver run on the surviving node -> compare md5s -> teardown.
Prints ONE JSON line. Invoked by `python bench.py --chaos`.

Driver mode (--driver): connects to the cluster, builds/loads the graph,
runs PageRank (tasks engine, ckpt_every=1), prints PR_START before the
first superstep and RANKS_MD5=<md5> on success.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT = int(os.environ.get("RAYLINK_CHAOS_PORT", "63793"))
ADDR = f"127.0.0.1:{PORT}"
TMPDIR = f"/tmp/rl_chaos_{PORT}"
GDIR = f"{TMPDIR}_graph"
CKPT = f"{TMPDIR}_ckpt"


def driver() -> int:
    import ray

    ray.init(address=ADDR, include_dashboard=False, logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    import bench
    from raylink import storage
    from raylink.algos import pagerank
    from raylink.graph import LinkGraph, build_graph

    sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    scale = int(os.environ.get("RAYLINK_BENCH_SCALE", "24"))
    if storage.exists(storage.join(GDIR, "manifest.json")):
        g = LinkGraph.load(GDIR)
    else:
        pages, n = bench.amplified_pages(sf, scale)
        edges = bench.flagship_edges(pages)
        verts = rd.from_arrow(
            pa.table({"vid": pa.array(np.arange(n, dtype=np.int64))})
        )
        g = build_graph(edges, verts, num_parts=8, partitioner="hash",
                        directed=True, graph_dir=GDIR)
    print("PR_START", flush=True)
    _, ranks = pagerank(g=g, eps=1e-6, engine="tasks", ckpt_dir=CKPT,
                        ckpt_every=1, resume=True)
    p = ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    print(f"RANKS_MD5={hashlib.md5(p.tobytes()).hexdigest()}", flush=True)
    ray.shutdown()
    return 0


def orchestrate() -> int:
    import shutil

    env = {k: v for k, v in os.environ.items() if k != "RAY_ADDRESS"}
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def teardown():
        subprocess.run(["pkill", "-9", "-f", TMPDIR], capture_output=True)
        time.sleep(2.0)

    def run_driver(ckpt_fresh: bool) -> tuple[int, str | None, float]:
        if ckpt_fresh:
            shutil.rmtree(CKPT, ignore_errors=True)
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--driver"],
            env=env, cwd=here, capture_output=True, text=True, timeout=900,
        )
        wall = time.perf_counter() - t0
        md5 = None
        for line in proc.stdout.splitlines():
            if line.startswith("RANKS_MD5="):
                md5 = line.split("=", 1)[1]
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-2000:] + "\n")
        return proc.returncode, md5, wall

    def start_cluster():
        # a SIGKILLed raylet can leave the survivor degraded; chaos
        # recovery always resumes on a freshly restarted cluster (graph
        # shards + per-superstep checkpoints live on shared storage and
        # survive the restart — that is the point of the layout)
        teardown()
        shutil.rmtree(TMPDIR, ignore_errors=True)
        subprocess.run(
            ["ray", "start", "--head", f"--port={PORT}", "--num-cpus=8",
             "--include-dashboard=false", "--disable-usage-stats",
             f"--temp-dir={TMPDIR}"],
            env=env, check=True, capture_output=True, text=True,
        )
        subprocess.run(
            ["ray", "start", f"--address={ADDR}", "--num-cpus=8",
             "--disable-usage-stats"],
            env=env, check=True, capture_output=True, text=True,
        )

    shutil.rmtree(GDIR, ignore_errors=True)
    shutil.rmtree(CKPT, ignore_errors=True)
    out: dict = {"metric": "worker-raylet SIGKILL mid-PageRank, bit-identical"}
    try:
        start_cluster()
        # control: undisturbed run (also builds + persists the graph)
        rc, control_md5, control_wall = run_driver(ckpt_fresh=True)
        assert rc == 0 and control_md5, "control run failed"
        out["control_md5"] = control_md5
        out["control_sec"] = round(control_wall, 2)

        # chaos: fresh ckpt, kill the WORKER raylet shortly after PR starts
        import threading

        shutil.rmtree(CKPT, ignore_errors=True)
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--driver"],
            env=env, cwd=here, stdout=subprocess.PIPE, text=True,
        )
        # watchdog: a driver hung in ray.get after the node loss must not
        # hang the orchestrator — the stdout iteration below has no
        # deadline of its own (review finding)
        watchdog = threading.Timer(600.0, proc.kill)
        watchdog.start()
        kill_delay = float(os.environ.get("RAYLINK_CHAOS_DELAY", "0.6"))
        md5 = None
        for line in proc.stdout:  # type: ignore[union-attr]
            if line.startswith("PR_START"):
                time.sleep(kill_delay)
                # the worker raylet is the one bound to the .1 sockets;
                # pattern scoped to THIS cluster's temp dir so concurrent
                # clusters (bench --cluster, pytest) are never touched,
                # and the match is VERIFIED — an unmatched pkill would
                # silently certify an undisturbed run (review finding)
                rc_k = subprocess.run(
                    ["pkill", "-9", "-f",
                     rf"raylet_socket_name={TMPDIR}/.*raylet\.1"],
                    capture_output=True,
                ).returncode
                out["worker_killed"] = rc_k == 0
                assert rc_k == 0, "worker raylet kill pattern matched nothing"
            elif line.startswith("RANKS_MD5="):
                md5 = line.split("=", 1)[1].strip()
        rc = proc.wait(timeout=900)
        watchdog.cancel()
        assert out.get("worker_killed"), (
            "driver ended before PR_START was seen; no chaos was injected"
        )
        if rc == 0 and md5:
            out["scenario"] = "survived_inflight"  # task retry / lineage
            out["chaos_md5"] = md5
        else:
            # driver lost objects beyond reconstruction: restart the
            # cluster and resume from the per-superstep checkpoint
            start_cluster()
            rc2, md5, resume_wall = run_driver(ckpt_fresh=False)
            assert rc2 == 0 and md5, "resume driver failed after node loss"
            out["scenario"] = "resumed_from_checkpoint"
            out["chaos_md5"] = md5
            out["resume_sec"] = round(resume_wall, 2)
        out["bit_identical"] = out["chaos_md5"] == control_md5

        # scenario 2: kill the DRIVER mid-run (process crash, not node
        # loss) and resume from the per-superstep checkpoint — the weekly
        # operations case (driver OOM/preemption). Must also be
        # bit-identical. Fresh cluster so scenario 1's node loss cannot
        # bleed into this measurement.
        start_cluster()
        shutil.rmtree(CKPT, ignore_errors=True)
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--driver"],
            env=env, cwd=here, stdout=subprocess.PIPE, text=True,
        )
        killed_mid_run = False
        for line in proc.stdout:  # type: ignore[union-attr]
            if line.startswith("PR_START"):
                time.sleep(kill_delay)
                proc.kill()
                killed_mid_run = True
                break
        proc.wait(timeout=120)
        # a driver that died before PR_START would make the "resume" below
        # a full fresh run — vacuously bit-identical (review finding)
        assert killed_mid_run, "driver ended before PR_START in scenario 2"
        rc3, md5_d, resume_wall = run_driver(ckpt_fresh=False)
        assert rc3 == 0 and md5_d, "resume after driver kill failed"
        out["driver_kill"] = {
            "resumed_md5": md5_d,
            "bit_identical": md5_d == control_md5,
            "resume_sec": round(resume_wall, 2),
        }
        out["bit_identical"] = (
            out["bit_identical"] and md5_d == control_md5
        )
    finally:
        teardown()
        shutil.rmtree(GDIR, ignore_errors=True)
        shutil.rmtree(CKPT, ignore_errors=True)
    print(json.dumps(out))
    return 0 if out.get("bit_identical") else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--driver", action="store_true")
    args = ap.parse_args()
    sys.exit(driver() if args.driver else orchestrate())
