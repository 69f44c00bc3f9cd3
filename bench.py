"""Benchmark harness (driver contract).

Runs the flagship pipeline — synthetic Common-Crawl-style pages -> actor-pool
HTML extraction -> edge table -> partitioned CSR build -> PageRank to 1e-6
convergence — plus secondary pipelines, over $GRAFT_SF_DIR (default
/root/testdata/sf0.1), and prints ONE JSON line:

  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-stage sec...}, "sf": ..., "num_cpus": N,
   "edges_per_sec": ..., "supersteps_per_hour": ...}

The corpus is amplified deterministically (RAYLINK_BENCH_SCALE copies of the
sf documents table, default 24 -> ~120k pages at sf0.1) so the graph is big
enough to measure shuffle throughput, still a pure function of the input.

``--scaling``: runs the same job in two fresh processes at num_cpus=8 and 32
and reports throughput scaling efficiency (the sandbox stand-in for the
north rule's N vs 4N cluster sizes).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SCALE = int(os.environ.get("RAYLINK_BENCH_SCALE", "24"))


def amplified_pages(sf_dir: str, scale: int):
    """documents x scale (deterministic id offsets) -> pages Dataset + n."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from raylink.synth import make_pages_batch

    base = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    nb = base.num_rows
    n = nb * scale
    copies = []
    for k in range(scale):
        ids = pa.array(
            (base.column("doc_id").to_numpy(zero_copy_only=False) + k * nb)
        )
        copies.append(
            pa.table({"doc_id": ids, "text": base.column("text"), "lang": base.column("lang")})
        )
    docs = rd.from_arrow(pa.concat_tables(copies)).repartition(NUM_CPUS * 2)
    pages = docs.map_batches(
        lambda b: make_pages_batch(b, n), batch_format="pyarrow", batch_size=2048
    )
    return pages, n


def run_bench() -> dict:
    import numpy as np
    import pyarrow as pa
    import ray

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        logging_level="ERROR", ignore_reinit_error=True,
    )
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from raylink.extract import ExtractPages, explode_links
    from raylink.graph import build_graph
    from raylink.pipelines import _ids_from_urls
    from raylink.algos import connected_components, pagerank, triangle_count

    queries: dict[str, float] = {}
    t_total0 = time.perf_counter()

    # 1. extract (the stateful actor-pool stage over zero-copy Arrow batches)
    t0 = time.perf_counter()
    pages, n = amplified_pages(SF_DIR, SCALE)
    pages = pages.materialize()  # isolate extraction timing from synthesis
    queries["synthesize"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    extracted = pages.drop_columns(["text"]).map_batches(
        ExtractPages, batch_format="pyarrow", batch_size=1024,
        concurrency=max(2, NUM_CPUS - 2),
    )
    edges = (
        extracted.map_batches(explode_links, batch_format="pyarrow")
        .map_batches(_ids_from_urls, batch_format="pyarrow")
        .materialize()
    )
    n_edge_rows = edges.count()
    queries["extract"] = round(time.perf_counter() - t0, 3)

    # 2. graph build (one all-to-all shuffle; per-partition CSR + subgraphs)
    t0 = time.perf_counter()
    verts = rd.from_arrow(
        pa.table({"vid": pa.array(np.arange(n, dtype=np.int64))})
    )
    g = build_graph(edges, verts, num_parts=NUM_CPUS, partitioner="hash", directed=True)
    queries["graph_build"] = round(time.perf_counter() - t0, 3)

    # 3. PageRank to 1e-6 (the north-star metric)
    t0 = time.perf_counter()
    res, ranks = pagerank(g=g, eps=1e-6, resume=False)
    ranks_pdf_head = ranks.to_pandas()  # consume
    pr_wall = time.perf_counter() - t0
    queries["pagerank"] = round(pr_wall, 3)
    update_rounds = max(1, res.supersteps_run - 1)
    edges_per_sec = g.n_edges * update_rounds / pr_wall
    supersteps_per_hour = res.supersteps_run / pr_wall * 3600

    # 4. secondary pipelines
    t0 = time.perf_counter()
    gu = build_graph(edges, verts, num_parts=NUM_CPUS, partitioner="hash", directed=False)
    _, comps = connected_components(g=gu, resume=False)
    comps.count()
    queries["connected_components"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    tri = triangle_count(edges)
    queries["triangles"] = round(time.perf_counter() - t0, 3)

    headline = queries["extract"] + queries["graph_build"] + queries["pagerank"]
    out = {
        "metric": "flagship pages->extract->graph->pagerank(1e-6) wall sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_pages": n,
        "n_edges": g.n_edges,
        "edge_rows_extracted": n_edge_rows,
        "pr_supersteps": res.supersteps_run,
        "edges_per_sec": round(edges_per_sec),
        "supersteps_per_hour": round(supersteps_per_hour),
        "triangles": tri,
        "total_sec": round(time.perf_counter() - t_total0, 3),
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = one(lo), one(hi)
    # throughput basis: headline work / sec
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling efficiency (throughput basis), num_cpus 8 -> 32",
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "edges_per_sec_8": r_lo["edges_per_sec"],
        "edges_per_sec_32": r_hi["edges_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "queries_8": r_lo["queries"],
        "queries_32": r_hi["queries"],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
