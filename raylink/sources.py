"""Graph sources beyond the pages pipeline — parity with the reference's
reader family (SURVEY.md §2.2).

| reference reader | here |
|---|---|
| LongTextAdjacencyListReader ("VID Sink1 Sink2 ...", whitespace) | ``read_adjacency_text`` |
| PartitionsLongTextAdjacencyListReader ("VID PID Sink1 ...") | ``read_adjacency_text(with_partition=True)`` (partition column surfaced; the engine re-partitions by its own key — explicit partitioning is an offline-pipeline artifact we deliberately replace, SURVEY.md §3.3) |
| LongTextJSONReader ("[src, pid, value, [[sink, eid, evalue], ...]]") | ``read_edges_json`` (vertex/edge values carried) |
| FullInfoSplitReader family (pre-partitioned "pid vid sgid (sink sgid pid)+") | ``read_full_info`` + ``build_graph(partitioner="explicit")`` — rows shuffle to the partitions given in the file; subgraphs are still re-discovered online (within-partition WCCs, identical up to id naming) |
| Giraph LongDoubleDoubleAdjacencyListSubgraphInputFormat ("vid value sink...") | ``read_giraph_adjacency`` (runtime #2's format family; vertex values carried) |
| edge list parquet/csv | ``ray.data.read_parquet`` / ``read_csv`` directly |

All parse work is vectorized-per-batch over ``read_text`` lines; outputs are
the standard ``(src:int64, dst:int64[, weight:float64])`` edge Dataset plus
an optional vertex Dataset, ready for ``raylink.graph.build_graph``.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa


def _parse_adj_batch(
    batch: pa.Table, with_partition: bool, strict: bool = True
) -> pa.Table:
    srcs: list[int] = []
    dsts: list[int] = []
    pids: list[int] = []
    for line in batch.column("text").to_pylist():
        parts = line.split()
        if not parts:
            continue
        try:
            vid = int(parts[0])
            pid = int(parts[1]) if with_partition else -1
            sinks_raw = parts[2:] if with_partition else parts[1:]
            sinks = [int(t) for t in sinks_raw]
        except ValueError:
            if strict:
                raise ValueError(
                    f"malformed adjacency line {line!r}; pass strict=False "
                    "to skip malformed lines whole"
                ) from None
            continue  # salvage mode: skip the whole malformed line
        for t in sinks:
            srcs.append(vid)
            dsts.append(t)
            pids.append(pid)
        if not sinks:  # vertex row with no out-edges: keep as sentinel
            srcs.append(vid)
            dsts.append(-1)
            pids.append(pid)
    cols = {
        "src": pa.array(np.asarray(srcs, dtype=np.int64)),
        "dst": pa.array(np.asarray(dsts, dtype=np.int64)),
    }
    if with_partition:
        cols["pid"] = pa.array(np.asarray(pids, dtype=np.int32))
    return pa.table(cols)


def read_adjacency_text(paths, with_partition: bool = False,
                        strict: bool = True):
    """Whitespace adjacency-list text -> (edges_ds, vertices_ds).

    Line format: ``VID Sink1 Sink2 ...`` (reference default reader,
    hama/.../LongTextAdjacencyListReader.java:88-106), or
    ``VID PartitionID Sink1 ...`` with ``with_partition=True``
    (PartitionsLongTextAdjacencyListReader.java:57-59).

    ``strict=True`` (default) raises on a malformed line — the reference's
    Long.parseLong semantics. ``strict=False`` is the crawl-salvage mode: a
    malformed line is skipped whole (valid lines around it are unaffected),
    for multi-TB inputs where one corrupt shard must not kill the job."""
    import ray.data as rd

    raw = rd.read_text(paths)
    parsed = raw.map_batches(
        lambda b: _parse_adj_batch(b, with_partition, strict),
        batch_format="pyarrow",
    )
    edges = parsed.map_batches(
        lambda b: b.filter(
            pa.compute.greater_equal(b.column("dst"), 0)
        ).select(["src", "dst"]),
        batch_format="pyarrow",
    )

    def verts(batch: pa.Table) -> pa.Table:
        # vertices = src ∪ sinks: a sink vid need not have a line of its
        # own (the reference reader materializes such remote vertices
        # during resolution, LongTextAdjacencyListReader.java:119-135);
        # with_partition surfaces the file-given pid as ``part`` (sink-only
        # vertices get -1 — the file assigns them no partition; the engine
        # re-partitions by its own key unless built explicitly)
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        if not with_partition:
            return pa.table(
                {"vid": pa.array(np.unique(np.concatenate([s, d[d >= 0]])))}
            )
        pid = batch.column("pid").to_numpy(zero_copy_only=False)
        vid = np.concatenate([s, d[d >= 0]])
        part = np.concatenate(
            [pid.astype(np.int64), np.full(int((d >= 0).sum()), -1)]
        )
        order = np.lexsort((-part, vid))  # real pid (max) wins per vid
        v_s, p_s = vid[order], part[order]
        first = np.r_[True, v_s[1:] != v_s[:-1]]
        return pa.table(
            {"vid": pa.array(v_s[first]),
             "part": pa.array(p_s[first].astype(np.int32))}
        )

    if with_partition:
        # MAX-combine the per-batch (vid, part) rows: a vid's real pid
        # (>= 0) beats the -1 sink sentinel from other batches
        vertices = (
            parsed.map_batches(verts, batch_format="pyarrow")
            .groupby("vid")
            .max("part")
            .map_batches(
                lambda b: pa.table(
                    {"vid": b.column("vid"),
                     "part": pa.compute.cast(b.column("max(part)"),
                                             pa.int32())}
                ),
                batch_format="pyarrow",
            )
        )
    else:
        vertices = parsed.map_batches(verts, batch_format="pyarrow").groupby(
            "vid"
        ).count().select_columns(["vid"])
    return edges, vertices


def read_full_info(paths):
    """Pre-partitioned full-info text reader (reference FullInfoSplitReader
    family): each line ``pid vid sgid (sink_vid sink_sgid sink_pid)+`` fully
    specifies a vertex's partition and every edge target's partition, so
    loading needs NO resolution protocol — feed the result to
    ``build_graph(partitioner="explicit")``.

    Field order follows the reference PARSER, not its Javadoc: the Javadoc
    comment says ``pid sgid vid`` but ``createVertex`` reads
    ``vertexID = vertexValue[1]`` and ``subgraphID = vertexValue[2]``
    (hama/.../FullInfoSplitReader.java:170-174) — real reference-format
    files have the vertex id in column 1.

    Returns (edges_ds (src, dst, src_part, dst_part), vertices_ds
    (vid, part)). File-given sgids are ignored: subgraphs are re-discovered
    as within-partition WCCs at build, which yields the same groups up to
    id naming (documented divergence)."""
    import ray.data as rd

    raw = rd.read_text(paths)

    def parse(batch: pa.Table) -> pa.Table:
        src, dst, sp, dp = [], [], [], []
        for line in batch.column("text").to_pylist():
            parts = line.split()
            if not parts:
                continue
            # parts[1] is the VERTEX id, parts[2] the (ignored) subgraph id —
            # matching FullInfoSplitReader.createVertex, not its Javadoc
            pid, vid = int(parts[0]), int(parts[1])
            sinks = parts[3:]
            for i in range(0, len(sinks) - 2, 3):
                src.append(vid)
                dst.append(int(sinks[i]))
                sp.append(pid)
                dp.append(int(sinks[i + 2]))
        return pa.table(
            {
                "src": pa.array(np.asarray(src, dtype=np.int64)),
                "dst": pa.array(np.asarray(dst, dtype=np.int64)),
                "src_part": pa.array(np.asarray(sp, dtype=np.int32)),
                "dst_part": pa.array(np.asarray(dp, dtype=np.int32)),
            }
        )

    def verts(batch: pa.Table) -> pa.Table:
        vvid, vpart = [], []
        for line in batch.column("text").to_pylist():
            parts = line.split()
            if not parts:
                continue
            vvid.append(int(parts[1]))
            vpart.append(int(parts[0]))
        return pa.table(
            {
                "vid": pa.array(np.asarray(vvid, dtype=np.int64)),
                "part": pa.array(np.asarray(vpart, dtype=np.int32)),
            }
        )

    return (
        raw.map_batches(parse, batch_format="pyarrow"),
        raw.map_batches(verts, batch_format="pyarrow"),
    )


def read_giraph_adjacency(paths, split: str = None):
    """Giraph-runtime adjacency reader (reference runtime #2's
    LongDoubleDoubleAdjacencyListSubgraphInputFormat /
    AdjacencyListTextSubgraphInputFormat.java:123-164): each line is
    ``vid vertex_value sink1 sink2 ...`` (id at [0], double value at [1],
    edge targets from [2]; default whitespace separator). Returns
    (edges_ds (src, dst), vertices_ds (vid, value)) — feed
    ``build_graph(vertex_cols=["value"])`` to carry the vertex values."""
    import ray.data as rd

    raw = rd.read_text(paths)

    def parse_edges(batch: pa.Table) -> pa.Table:
        srcs, dsts = [], []
        for line in batch.column("text").to_pylist():
            parts = line.split(split)
            if len(parts) < 2:
                continue
            vid = int(parts[0])
            for t in parts[2:]:
                srcs.append(vid)
                dsts.append(int(t))
        return pa.table(
            {
                "src": pa.array(np.asarray(srcs, dtype=np.int64)),
                "dst": pa.array(np.asarray(dsts, dtype=np.int64)),
            }
        )

    def parse_verts(batch: pa.Table) -> pa.Table:
        vids, vals = [], []
        for line in batch.column("text").to_pylist():
            parts = line.split(split)
            if len(parts) < 2:
                continue
            vids.append(int(parts[0]))
            vals.append(float(parts[1]))
        return pa.table(
            {
                "vid": pa.array(np.asarray(vids, dtype=np.int64)),
                "value": pa.array(np.asarray(vals, dtype=np.float64)),
            }
        )

    return (
        raw.map_batches(parse_edges, batch_format="pyarrow"),
        raw.map_batches(parse_verts, batch_format="pyarrow"),
    )


def read_edges_json(paths, edge_value_cols: list[str] | None = None):
    """JSON-rows reader (reference LongTextJSONReader.java:61-64,285-317):
    each line ``[srcid, pid, srcvalue, [[sinkid, edgeid, edgevalue], ...]]``.
    Returns (edges_ds (src, dst, weight, eid, *edge_value_cols), vertices_ds
    with value). ``eid`` is the file-given edge id (IEdge.java:26-34; -1
    when absent) — persist it per shard with ``build_graph(edge_cols=...)``.

    The reference carries an ARBITRARY edge value per edge (edgeValues[2]
    becomes the IEdge value, LongTextJSONReader.java:306-310). Scalar values
    land in ``weight`` (the common single-valued case). Multi-valued edges
    — ``edgevalue`` a JSON list — are exposed via ``edge_value_cols``: pass
    the names for each list slot and they become typed float64 columns,
    ready for ``build_graph(edge_cols=edge_value_cols)`` / ``edge_table``
    round-trips (``weight`` is then 1.0 unless 'weight' is one of the
    names)."""
    import ray.data as rd

    raw = rd.read_text(paths)
    ev_names = list(edge_value_cols or [])

    def edges_fn(batch: pa.Table) -> pa.Table:
        srcs, dsts, weights, eids = [], [], [], []
        evs = [[] for _ in ev_names]
        for line in batch.column("text").to_pylist():
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            vid = int(rec[0])
            for sink in rec[3]:
                srcs.append(vid)
                dsts.append(int(sink[0]))
                eids.append(int(sink[1]) if len(sink) > 1 else -1)
                val = sink[2] if len(sink) > 2 else 1.0
                if ev_names:
                    vals = val if isinstance(val, (list, tuple)) else [val]
                    if len(vals) != len(ev_names):
                        raise ValueError(
                            f"read_edges_json: edge value arity {len(vals)} "
                            f"!= edge_value_cols arity {len(ev_names)}"
                        )
                    for slot, v in zip(evs, vals):
                        slot.append(float(v))
                    weights.append(
                        float(vals[ev_names.index("weight")])
                        if "weight" in ev_names else 1.0
                    )
                else:
                    weights.append(float(val))
        cols = {
            "src": pa.array(np.asarray(srcs, dtype=np.int64)),
            "dst": pa.array(np.asarray(dsts, dtype=np.int64)),
            "weight": pa.array(np.asarray(weights, dtype=np.float64)),
            "eid": pa.array(np.asarray(eids, dtype=np.int64)),
        }
        for nm, slot in zip(ev_names, evs):
            if nm != "weight":
                cols[nm] = pa.array(np.asarray(slot, dtype=np.float64))
        return pa.table(cols)

    def verts_fn(batch: pa.Table) -> pa.Table:
        vids, vals = [], []
        for line in batch.column("text").to_pylist():
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            vids.append(int(rec[0]))
            vals.append(float(rec[2]))
        return pa.table(
            {
                "vid": pa.array(np.asarray(vids, dtype=np.int64)),
                "value": pa.array(np.asarray(vals, dtype=np.float64)),
            }
        )

    return raw.map_batches(edges_fn, batch_format="pyarrow"), raw.map_batches(
        verts_fn, batch_format="pyarrow"
    )
