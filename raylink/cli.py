"""Job launcher CLI — the reference's properties-file DefaultJob analog.

GoFFish jobs are launched by a properties-driven runner choosing reader,
algorithm and parameters via config (job/DefaultJob.java:49-117,
Docker/.../properties/PageRank.properties, CLI Docker/.../goffish:46-52).
Here the same pluggability is a subcommand CLI designed for `ray job submit`:

  python -m raylink.cli pagerank --edges edges.parquet --out /tmp/pr \\
      --eps 1e-6 --num-parts 32 --engine tasks
  python -m raylink.cli cc --edges graph.txt --format adjacency --out /tmp/cc
  python -m raylink.cli triangles --edges edges.parquet

The CLI owns its Ray session (guarded init); results are written with the
resumable partitioned sink. Re-running a finished job resumes/skips.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _load_edges(args):
    import ray.data as rd

    if args.format == "adjacency":
        from raylink.sources import read_adjacency_text

        return read_adjacency_text(args.edges, with_partition=args.with_partition)
    if args.format == "json":
        from raylink.sources import read_edges_json

        return read_edges_json(args.edges)
    if args.format == "full_info":
        from raylink.sources import read_full_info

        return read_full_info(args.edges)
    if args.format == "giraph":
        from raylink.sources import read_giraph_adjacency

        return read_giraph_adjacency(args.edges)
    edges = rd.read_parquet(args.edges)
    verts = rd.read_parquet(args.vertices) if args.vertices else None
    return edges, verts


def _build(args, directed: bool, vertex_cols=None):
    from raylink.graph import build_graph

    edges, verts = _load_edges(args)
    if args.format != "parquet":
        edges = edges.materialize()
    # full_info inputs are pre-partitioned: force the explicit partitioner
    partitioner = "explicit" if args.format == "full_info" else args.partitioner
    return build_graph(
        edges,
        verts,
        num_parts=args.num_parts,
        partitioner=partitioner,
        directed=directed if partitioner != "explicit" else True,
        graph_dir=args.graph_dir,
        weighted=args.weighted,
        vertex_cols=vertex_cols,
    ), edges


def _main_query(argv) -> int:
    """Generic named-query launcher: every pipeline in ``raylink.queries``
    (graph, dedup, similarity, text, relational, media) is `ray job
    submit`-able without code — the DefaultJob pluggability extended to the
    whole query surface.

      python -m raylink.cli query --name pricing_summary \\
          --sf-dir /root/testdata/sf0.01 --out /tmp/q1
    """
    p = argparse.ArgumentParser(prog="raylink query")
    p.add_argument("--name", required=True,
                   help="query name (function q_<name> in raylink.queries)")
    p.add_argument("--sf-dir", dest="sf_dir", required=True)
    p.add_argument("--out", help="output parquet directory (omit to count)")
    p.add_argument("--num-cpus", type=int)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from raylink import queries as q

    fn = getattr(q, f"q_{args.name}", None)
    if fn is None:
        names = sorted(n[2:] for n in dir(q) if n.startswith("q_"))
        print(json.dumps({"error": f"unknown query {args.name!r}",
                          "available": names}))
        return 2
    t0 = time.perf_counter()
    res = fn(args.sf_dir)
    import pyarrow as pa
    import ray.data as rd

    ds = res if hasattr(res, "write_parquet") else rd.from_arrow(
        res if isinstance(res, pa.Table) else pa.Table.from_pandas(res)
    )
    if args.out:
        from raylink import storage

        # Ray's write_parquet APPENDS uniquely-named files; clearing first
        # makes a re-run overwrite instead of duplicating rows
        storage.delete_dir(args.out)
        ds.write_parquet(args.out)
        rows = rd.read_parquet(args.out).count()
    else:
        rows = ds.count()
    print(json.dumps({
        "query": args.name, "rows": rows, "out": args.out,
        "sec": round(time.perf_counter() - t0, 3),
    }))
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "query":
        return _main_query(argv[1:])
    p = argparse.ArgumentParser(prog="raylink", description=__doc__)
    p.add_argument("algorithm", choices=[
        "pagerank", "seeded_pagerank", "subgraphrank", "cc", "lpa", "sssp",
        "kcore", "coreness", "triangles", "forest", "kmeans", "scc",
    ])
    p.add_argument("--edges", required=True, help="parquet glob / text / jsonl path")
    p.add_argument("--vertices", help="optional vertex parquet (vid[, value cols])")
    p.add_argument("--format",
                   choices=["parquet", "adjacency", "json", "full_info", "giraph"],
                   default="parquet")
    p.add_argument("--seed-col", dest="seed_col", default="seed",
                   help="vertex value column for seeded_pagerank")
    p.add_argument("--with-partition", action="store_true")
    p.add_argument("--out", help="output directory (partitioned parquet)")
    p.add_argument("--num-parts", type=int, default=16)
    p.add_argument("--partitioner", choices=["hash", "mod"], default="hash")
    p.add_argument("--engine", choices=["dataset", "tasks"], default="dataset")
    p.add_argument("--eps", type=float, default=1e-6)
    p.add_argument("--iters", type=int)
    p.add_argument("--source", type=int, default=0)
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--weighted", action="store_true")
    p.add_argument("--ckpt-dir", dest="ckpt_dir")
    p.add_argument("--ckpt-every", type=int, default=1)
    p.add_argument("--graph-dir", dest="graph_dir")
    p.add_argument("--num-cpus", type=int)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(address="local", **kwargs)
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    t0 = time.perf_counter()
    summary: dict = {"algorithm": args.algorithm}
    common = dict(ckpt_dir=args.ckpt_dir, ckpt_every=args.ckpt_every, engine=args.engine)

    if args.algorithm == "triangles":
        import pyarrow as pa
        import ray.data as rd

        from raylink.algos import triangle_count

        edges, _ = _load_edges(args)
        summary["triangles"] = triangle_count(edges)
        # one-row result so --out is honored like every other algorithm
        result = rd.from_arrow(
            pa.table({"vid": pa.array([0], type=pa.int64()),
                      "triangles": pa.array([summary["triangles"]],
                                            type=pa.int64())})
        )
    elif args.algorithm == "seeded_pagerank":
        from raylink.algos import seeded_pagerank

        edges, verts = _load_edges(args)
        if verts is None:
            p.error("seeded_pagerank needs --vertices with the seed column")
        res, result = seeded_pagerank(
            edges, vertices_ds=verts, seed_col=args.seed_col,
            num_parts=args.num_parts, partitioner=args.partitioner,
            eps=args.eps, iters=args.iters, **common,
        )
        summary.update(supersteps=res.supersteps_run, wall_sec=round(res.wall_sec, 2))
    elif args.algorithm in ("pagerank", "subgraphrank"):
        from raylink.algos import pagerank, subgraph_rank

        fn = pagerank if args.algorithm == "pagerank" else subgraph_rank
        g, _ = _build(args, directed=True)
        kw = dict(common)
        if args.algorithm == "pagerank":
            kw.update(eps=args.eps, iters=args.iters)
        else:
            kw.update(eps=args.eps)
            kw.pop("ckpt_every", None)
        res, result = fn(g=g, **kw)
        summary.update(supersteps=res.supersteps_run, wall_sec=round(res.wall_sec, 2))
    elif args.algorithm == "scc":
        from raylink.algos.scc import scc

        edges, verts = _load_edges(args)
        res, result = scc(
            edges, vertices_ds=verts, num_parts=args.num_parts,
            partitioner=args.partitioner, ckpt_dir=args.ckpt_dir,
            graph_dir=args.graph_dir, engine=args.engine,
        )
        summary.update(supersteps=res.supersteps_run, wall_sec=round(res.wall_sec, 2))
    elif args.algorithm == "kmeans":
        from raylink.algos import graph_kmeans

        g, edges = _build(args, directed=False)
        result, history = graph_kmeans(edges.materialize(), g=g, k=args.k,
                                       engine=args.engine)
        summary["history"] = history
    else:
        g, _ = _build(args, directed=False)
        if args.algorithm == "cc":
            from raylink.algos import connected_components

            res, result = connected_components(g=g, **common)
        elif args.algorithm == "lpa":
            from raylink.algos import label_propagation

            res, result = label_propagation(g=g, **common)
        elif args.algorithm == "sssp":
            from raylink.algos import sssp

            res, result = sssp(g=g, source=args.source, weighted=args.weighted, **common)
        elif args.algorithm == "kcore":
            from raylink.algos import kcore

            res, result = kcore(g=g, k=args.k, **common)
        elif args.algorithm == "coreness":
            from raylink.algos import coreness_montresor

            kw = dict(common)
            kw.pop("ckpt_every", None)
            res, result = coreness_montresor(g=g, **kw)
        elif args.algorithm == "forest":
            from raylink.algos import spanning_forest

            res, result = spanning_forest(g=g, engine=args.engine,
                                          ckpt_dir=args.ckpt_dir)
        summary.update(supersteps=res.supersteps_run, wall_sec=round(res.wall_sec, 2))

    if result is not None and args.out:
        from raylink.sink import write_partitioned

        man = write_partitioned(result, args.out, key="vid", num_parts=args.num_parts,
                                partitioner=args.partitioner)
        summary["out"] = args.out
        summary["out_partitions"] = len(man["completed"])
    elif result is not None:
        summary["rows"] = result.count()
    summary["total_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
