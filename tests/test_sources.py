"""Reader-family parity (SURVEY.md §2.2): adjacency-list text and JSON-rows
sources feed build_graph and reproduce oracle results."""

import json

import numpy as np
import pytest

from oracles import cc_oracle, pr_oracle
from raylink.synth import expected_edges

N = 99


@pytest.fixture(scope="module")
def adj_files(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("adj")
    edges = expected_edges(N)
    adj = {i: [] for i in range(N)}
    for s, t in edges:
        adj[int(s)].append(int(t))
    plain = d / "graph.txt"
    with open(plain, "w") as f:
        for i in range(N):
            f.write(" ".join([str(i)] + [str(t) for t in adj[i]]) + "\n")
    withp = d / "graph_pid.txt"
    with open(withp, "w") as f:
        for i in range(N):
            f.write(" ".join([str(i), str(i % 4)] + [str(t) for t in adj[i]]) + "\n")
    jsonf = d / "graph.jsonl"
    with open(jsonf, "w") as f:
        for i in range(N):
            sinks = [[t, 100 + t, 2.5] for t in adj[i]]
            f.write(json.dumps([i, i % 4, float(i), sinks]) + "\n")
    return str(plain), str(withp), str(jsonf), edges


def test_read_adjacency_text(adj_files):
    from raylink.algos import pagerank
    from raylink.sources import read_adjacency_text

    plain, _, _, edges = adj_files
    eds, vds = read_adjacency_text(plain)
    assert vds.count() == N
    _, ranks = pagerank(eds, vertices_ds=vds, num_parts=4, iters=8)
    got = ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    np.testing.assert_allclose(got, pr_oracle(N, edges, iters=8), atol=1e-12)


def test_read_adjacency_text_with_partition(adj_files):
    from raylink.algos import connected_components
    from raylink.sources import read_adjacency_text

    _, withp, _, edges = adj_files
    eds, vds = read_adjacency_text(withp, with_partition=True)
    _, comps = connected_components(eds, vertices_ds=vds, num_parts=4)
    got = comps.to_pandas().sort_values("vid")["component"].to_numpy()
    np.testing.assert_array_equal(got, cc_oracle(N, edges))


def test_read_edges_json(adj_files, tmp_path):
    from raylink.sources import read_edges_json

    _, _, jsonf, edges = adj_files
    eds, vds = read_edges_json(jsonf)
    pdf = eds.to_pandas()
    got = np.array(sorted(zip(pdf["src"], pdf["dst"])), dtype=np.int64)
    np.testing.assert_array_equal(got, edges)
    assert (pdf["weight"] == 2.5).all()
    # file-given edge ids surface (fixture writes eid = 100 + sink)
    assert (pdf["eid"].to_numpy() == 100 + pdf["dst"].to_numpy()).all()
    vdf = vds.to_pandas().sort_values("vid")
    assert (vdf["value"].to_numpy() == np.arange(N, dtype=float)).all()

    # edge ids persist per shard through the edge-value machinery
    from raylink.graph import build_graph, edge_table

    g = build_graph(eds.materialize(), vds, num_parts=4, directed=True,
                    weighted=True, edge_cols=["eid"],
                    graph_dir=str(tmp_path / "gj"))
    et = edge_table(g, ["eid"]).to_pandas()
    assert (et["eid"].to_numpy() == 100 + et["dst"].to_numpy()).all()


def test_read_edges_json_multivalue(ray_session, tmp_path):
    """Multi-valued JSON edge values (reference LongTextJSONReader.java:
    306-310 — edgevalue is arbitrary) land as named typed columns and
    round-trip through build_graph(edge_cols)/edge_table (VERDICT r3
    item 4)."""
    import json as _json

    from raylink.graph import build_graph, edge_table
    from raylink.sources import read_edges_json

    # 4 vertices, edge value = [cap, cost] per edge
    lines = []
    raw_edges = {(0, 1): (10.0, 0.5), (0, 2): (20.0, 1.5),
                 (1, 2): (30.0, 2.5), (2, 3): (40.0, 3.5)}
    adj = {}
    for (s, d), (cap, cost) in raw_edges.items():
        adj.setdefault(s, []).append([d, 100 + d, [cap, cost]])
    for v in range(4):
        lines.append(_json.dumps([v, v % 2, float(v), adj.get(v, [])]))
    f = tmp_path / "mv.json"
    f.write_text("\n".join(lines) + "\n")

    eds, vds = read_edges_json(str(f), edge_value_cols=["cap", "cost"])
    pdf = eds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert list(pdf.columns) == ["src", "dst", "weight", "eid", "cap", "cost"]
    for _, r in pdf.iterrows():
        cap, cost = raw_edges[(r["src"], r["dst"])]
        assert r["cap"] == cap and r["cost"] == cost and r["weight"] == 1.0

    g = build_graph(eds.materialize(), vds, num_parts=2, directed=True,
                    weighted=True, edge_cols=["eid", "cap", "cost"],
                    graph_dir=str(tmp_path / "gmv"))
    et = edge_table(g, ["eid", "cap", "cost"]).to_pandas()
    assert len(et) == len(raw_edges)
    for _, r in et.iterrows():
        cap, cost = raw_edges[(r["src"], r["dst"])]
        assert r["cap"] == cap and r["cost"] == cost
        assert r["eid"] == 100 + r["dst"]

    # scalar edgevalue named as weight via edge_value_cols
    lines2 = [_json.dumps([0, 0, 0.0, [[1, 7, 3.25]]]),
              _json.dumps([1, 1, 1.0, []])]
    f2 = tmp_path / "sv.json"
    f2.write_text("\n".join(lines2) + "\n")
    eds2, _ = read_edges_json(str(f2), edge_value_cols=["weight"])
    p2 = eds2.to_pandas()
    assert p2["weight"].tolist() == [3.25] and p2["eid"].tolist() == [7]


def test_hash_ids_from_urls(ray_session, tmp_path):
    """General-corpus vid path: build the graph from URLs alone (no embedded
    ids) via hash64(url); PageRank must match the id-built graph after
    mapping hash-vids back to urls (VERDICT r1 item 7)."""
    import pyarrow as pa
    import ray.data as rd

    from raylink.algos import pagerank
    from raylink.pipelines import _ids_from_urls, hash_ids_from_urls
    from raylink.synth import url_of
    from raylink.util import hash64_str

    n = 60
    # small synthetic link table (deterministic): i -> (i*3+1) % n, i -> (i+7) % n
    src_urls, dst_urls = [], []
    for i in range(n):
        for d in ((i * 3 + 1) % n, (i + 7) % n):
            if d != i:
                src_urls.append(url_of(i))
                dst_urls.append(url_of(d))
    links = pa.table({"src_url": pa.array(src_urls), "dst_url": pa.array(dst_urls)})
    urls = [url_of(i) for i in range(n)]

    # id-built graph (urls embed the id)
    eds_id = rd.from_arrow(links).map_batches(_ids_from_urls, batch_format="pyarrow")
    verts_id = rd.from_arrow(pa.table({"vid": pa.array(np.arange(n, dtype=np.int64))}))
    _, r_id = pagerank(eds_id, vertices_ds=verts_id, num_parts=4, iters=10,
                       ckpt_dir=str(tmp_path / "cki"))
    pdf_id = r_id.to_pandas().sort_values("vid").reset_index(drop=True)

    # hash-built graph (urls opaque)
    eds_h = rd.from_arrow(links).map_batches(hash_ids_from_urls, batch_format="pyarrow")
    hvid = hash64_str(urls)
    assert len(np.unique(hvid)) == n  # no collisions at this scale
    verts_h = rd.from_arrow(pa.table({"vid": pa.array(np.sort(hvid))}))
    _, r_h = pagerank(eds_h, vertices_ds=verts_h, num_parts=4, iters=10,
                      ckpt_dir=str(tmp_path / "ckh"))
    pdf_h = r_h.to_pandas().set_index("vid")
    # map hash-vid -> original id and compare rank vectors
    ranks_by_id = pdf_h.loc[hvid, "rank"].to_numpy()
    np.testing.assert_allclose(ranks_by_id, pdf_id["rank"].to_numpy(), atol=1e-12)


def test_read_full_info_explicit_partitioning(ray_session, tmp_path):
    """Pre-partitioned ingestion: full-info file with a custom partition map
    (not expressible by any registered partitioner) -> explicit build ->
    shards honor the map; CC and SSSP match the oracles through the stored
    routing tables, on both BSP engines."""
    from raylink.algos import connected_components, sssp
    from raylink.graph import build_graph, load_shard
    from raylink.sources import read_full_info

    edges = expected_edges(N)
    part_of = lambda v: (v * 7 + 3) % 5  # noqa: E731
    # undirected closure adjacency
    adj = {v: set() for v in range(N)}
    for s, d in edges:
        adj[int(s)].add(int(d))
        adj[int(d)].add(int(s))
    path = tmp_path / "full_info.txt"
    # reference parser order: pid vid sgid (sink sgid pid)+ — sgid is written
    # as vid+1000 so a vid/sgid column swap (ADVICE r2) cannot pass silently
    with open(path, "w") as f:
        for v in range(N):
            toks = [str(part_of(v)), str(v), str(v + 1000)]
            for d in sorted(adj[v]):
                toks += [str(d), str(d + 1000), str(part_of(d))]
            f.write(" ".join(toks) + "\n")

    eds, vds = read_full_info(str(path))
    g = build_graph(eds.materialize(), vds, num_parts=5, partitioner="explicit",
                    directed=True, graph_dir=str(tmp_path / "gfi"))
    assert g.partitioner == "explicit"
    # shards contain exactly the vids of their explicit partition
    for p in g.parts:
        sh = load_shard(g.graph_dir, p)
        assert (np.array([part_of(v) for v in sh["vids"]]) == p).all()
        assert "tgt_vids" in sh and "tgt_parts" in sh

    _, comps = connected_components(g=g, ckpt_dir=str(tmp_path / "ckc"))
    got = comps.to_pandas().sort_values("vid")["component"].to_numpy()
    np.testing.assert_array_equal(got, cc_oracle(N, edges))

    from oracles import bfs_oracle

    _, dists = sssp(g=g, source=0, engine="tasks", ckpt_dir=str(tmp_path / "cks"))
    got_d = dists.to_pandas().sort_values("vid")["dist"].to_numpy()
    np.testing.assert_array_equal(got_d, bfs_oracle(N, edges, 0))


def test_read_giraph_adjacency(adj_files, tmp_path):
    """Giraph-runtime adjacency format (vid value sink...) loads, carries
    vertex values into shards, and reproduces the PageRank oracle."""
    from raylink.algos import pagerank
    from raylink.graph import build_graph, load_shard
    from raylink.sources import read_giraph_adjacency

    _, _, _, edges = adj_files
    adj = {i: [] for i in range(N)}
    for s, t in edges:
        adj[int(s)].append(int(t))
    path = tmp_path / "giraph.txt"
    with open(path, "w") as f:
        for i in range(N):
            f.write(" ".join([str(i), str(0.5 * i)] + [str(t) for t in adj[i]]) + "\n")

    eds, vds = read_giraph_adjacency(str(path))
    g = build_graph(eds.materialize(), vds, num_parts=4, directed=True,
                    vertex_cols=["value"], graph_dir=str(tmp_path / "gg"))
    got_vals = {}
    for p in g.parts:
        sh = load_shard(g.graph_dir, p)
        got_vals.update(dict(zip(sh["vids"].tolist(), sh["v_value"].tolist())))
    assert got_vals == {v: 0.5 * v for v in range(N)}
    _, ranks = pagerank(g=g, iters=8, ckpt_dir=str(tmp_path / "ck"))
    got = ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    np.testing.assert_allclose(got, pr_oracle(N, edges, iters=8), atol=1e-12)


def test_read_adjacency_text_sink_only_vertices(ray_session, tmp_path):
    """A sink vid with no line of its own still becomes a vertex (the
    reference materializes remote vertices during resolution); with
    with_partition=True the file-given pid is surfaced as ``part`` and
    sink-only vertices carry -1."""
    from raylink.sources import read_adjacency_text

    plain = tmp_path / "plain.txt"
    plain.write_text("1 2\n3\n")  # vertex 2 exists only as a sink
    eds, vds = read_adjacency_text(str(plain))
    assert sorted(vds.to_pandas()["vid"]) == [1, 2, 3]
    assert eds.to_pandas().values.tolist() == [[1, 2]]

    withp = tmp_path / "withp.txt"
    withp.write_text("1 0 2 4\n3 1\n")  # 2 and 4 are sink-only
    _, vds2 = read_adjacency_text(str(withp), with_partition=True)
    pdf = vds2.to_pandas().sort_values("vid").reset_index(drop=True)
    assert pdf["vid"].tolist() == [1, 2, 3, 4]
    assert pdf["part"].tolist() == [0, -1, 1, -1]


def test_read_adjacency_text_salvage(ray_session, tmp_path):
    """strict=False skips malformed lines whole; strict=True raises with a
    pointer to the salvage mode (reference Long.parseLong parity)."""
    import pytest

    from raylink.sources import read_adjacency_text

    f = tmp_path / "adj.txt"
    f.write_text(
        "0 1 2\n"
        "garbage line\n"      # non-integer vid
        "1 2 xyz\n"           # non-integer sink: whole line skipped
        "\n"
        "2 0\n"
    )
    edges, verts = read_adjacency_text(str(f), strict=False)
    got = sorted(map(tuple, edges.to_pandas()[["src", "dst"]].to_numpy()))
    assert got == [(0, 1), (0, 2), (2, 0)]
    assert sorted(verts.to_pandas()["vid"]) == [0, 1, 2]

    with pytest.raises(Exception, match="strict=False"):
        read_adjacency_text(str(f))[0].to_pandas()


def test_read_adjacency_text_roundtrip_fuzz(ray_session, tmp_path):
    """Property: serialize a random edge list as adjacency text, interleave
    random garbage lines, read back with strict=False -> the exact original
    edge multiset (hypothesis-style, seeded loop to keep the Ray session
    shared)."""
    import numpy as np

    from raylink.sources import read_adjacency_text

    rng = np.random.default_rng(123)
    for trial in range(5):
        n = int(rng.integers(2, 30))
        adj = {v: sorted(set(rng.integers(0, n, rng.integers(0, 6)).tolist()))
               for v in range(n)}
        lines = [
            " ".join([str(v)] + [str(d) for d in ds]) for v, ds in adj.items()
        ]
        garbage = ["not numbers", "1.5 2.5", "9" * 40 + "x", "  ", "\t"]
        for g in garbage:
            lines.insert(int(rng.integers(0, len(lines) + 1)), g)
        f = tmp_path / f"fz{trial}.txt"
        f.write_text("\n".join(lines) + "\n")
        edges, verts = read_adjacency_text(str(f), strict=False)
        got = sorted(map(tuple, edges.to_pandas()[["src", "dst"]].to_numpy()))
        want = sorted((v, d) for v, ds in adj.items() for d in ds)
        assert got == want, trial
        vids = set(verts.to_pandas()["vid"])
        assert vids == set(adj) | {d for ds in adj.values() for d in ds}
