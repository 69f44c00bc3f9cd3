"""PageRank — semantics match sample-hama/.../PageRank.java:19-148 exactly:

- N = global vertex count (reference: superstep-0 count broadcast, :48-52;
  here: known at graph build);
- initial rank 1/N (:48-52);
- sync update ``rank = alpha * sum(in) + (1-alpha)/N`` with alpha=0.85
  (:21-22,107);
- NO dangling-mass redistribution: rank/outDeg is pushed only along existing
  out-edges (:123-133) — vertices without out-edges leak their mass;
- per-partition pre-aggregation of contributions per destination before the
  shuffle mirrors the reference's per-subgraph aggregation (:135-141);
- convergence: global max |delta| <= eps (reference: per-vertex 1e-3 flags
  broadcast until all converged, :82-84,114-116; eps configurable — the
  north rule grades at 1e-6), or a fixed iteration count (``iters``) for
  SQL-oracle parity.

Determinism: incoming messages are sorted by (dst, val) before summation and
local contributions are reduced in CSR edge order, so results are
bit-identical across runs, resumes, and parallelism levels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raylink.graph import LinkGraph, build_graph
from raylink.superstep import Algorithm, run_bsp, sort_msgs
from raylink.superstep_tasks import run_bsp_tasks
from raylink.util import route_parts


class PageRank(Algorithm):
    name = "pagerank"
    msg_fields = [("val", pa.float64())]

    def _teleport(self, shard: dict, ctx: dict):
        """Per-vertex teleport mass (scalar or vid-aligned array); the base
        rule is uniform (1-alpha)/N. Hook for personalization."""
        return (1.0 - ctx.get("alpha", 0.85)) / ctx["n_vertices"]

    def init(self, shard: dict, ctx: dict) -> dict:
        col = ctx.get("init_ranks")
        if col is not None:
            # warm start from a persisted vertex value (incremental PR on a
            # recrawl: seed with the previous snapshot's ranks — same
            # fixpoint, fewer supersteps to eps)
            return {"rank": shard[f"v_{col}"].astype(np.float64, copy=True)}
        n_local = len(shard["vids"])
        rank0 = 1.0 / ctx["n_vertices"]
        return {"rank": np.full(n_local, rank0, dtype=np.float64)}

    def step(self, s: int, shard: dict, state: dict, msgs: pa.Table, ctx: dict):
        vids, indptr, indices = shard["vids"], shard["indptr"], shard["indices"]
        alpha = ctx.get("alpha", 0.85)
        eps = ctx.get("eps", 1e-6)
        rank = np.asarray(state["rank"], dtype=np.float64)
        delta_max = 0.0
        n_active = len(vids)
        if s > 0:
            msgs = sort_msgs(msgs, ["dst", "val"])
            inmass = np.zeros(len(vids), dtype=np.float64)
            if msgs.num_rows:
                pos = np.searchsorted(vids, msgs.column("dst").to_numpy(zero_copy_only=False))
                np.add.at(inmass, pos, msgs.column("val").to_numpy(zero_copy_only=False))
            new_rank = alpha * inmass + self._teleport(shard, ctx)
            delta_max = float(np.max(np.abs(new_rank - rank))) if len(vids) else 0.0
            rank = new_rank
            n_active = int(np.sum(np.abs(new_rank - state["rank"]) > eps))
        state = {"rank": rank}
        out = self._emit(shard, ctx, rank)
        return state, out, n_active, delta_max

    def _emit(self, shard: dict, ctx: dict, rank: np.ndarray):
        """Contributions rank/outdeg along out-edges, pre-summed per dst
        (reduced in CSR edge order — deterministic)."""
        indptr, indices = shard["indptr"], shard["indices"]
        deg = np.diff(indptr)
        has_out = deg > 0
        if not np.any(has_out):
            return None
        contrib = np.repeat(
            np.where(has_out, rank / np.maximum(deg, 1), 0.0), deg
        )
        dsts, inv = np.unique(indices, return_inverse=True)
        sums = np.zeros(len(dsts), dtype=np.float64)
        np.add.at(sums, inv, contrib)
        return self.make_msgs(route_parts(shard, ctx, dsts), dsts, val=sums)

    def halted(self, agg: dict, s: int, ctx: dict) -> bool:
        iters = ctx.get("iters")
        if iters is not None:
            return s >= iters
        return s > 0 and agg["delta_max"] <= ctx.get("eps", 1e-6)


class WeightedPageRank(PageRank):
    """Edge-weighted PageRank: a vertex's rank is distributed over its
    out-edges proportional to edge weight (rank * w/wsum instead of
    rank/outdeg) — the web-graph variant where link prominence (e.g.
    anchor position or link count) weights the transition matrix. Weights
    come from the CSR-aligned ``shard['weights']`` persisted by
    ``build_graph(weighted=True)``; zero-weight-sum vertices leak their
    mass exactly like dangling vertices in the base rule."""

    name = "weighted_pagerank"

    def _emit(self, shard: dict, ctx: dict, rank: np.ndarray):
        indptr, indices = shard["indptr"], shard["indices"]
        w = shard.get("weights")
        if w is None:
            raise KeyError(
                "shard has no edge weights — build the graph with "
                "build_graph(weighted=True)"
            )
        deg = np.diff(indptr)
        if not np.any(deg > 0):
            return None
        w = np.asarray(w, dtype=np.float64)
        src_idx = np.repeat(np.arange(len(deg), dtype=np.int64), deg)
        wsum = np.zeros(len(deg), dtype=np.float64)
        np.add.at(wsum, src_idx, w)
        safe = np.where(wsum > 0, wsum, 1.0)
        contrib = rank[src_idx] * (w / safe[src_idx])
        dsts, inv = np.unique(indices, return_inverse=True)
        sums = np.zeros(len(dsts), dtype=np.float64)
        np.add.at(sums, inv, contrib)
        return self.make_msgs(route_parts(shard, ctx, dsts), dsts, val=sums)


class SeededPageRank(PageRank):
    """Personalized/value-seeded PageRank: teleport mass proportional to a
    per-vertex seed value stored in the shard (``v_<seed_col>``, persisted by
    ``build_graph(vertex_cols=[...])``) — exercises the reference's vertex
    values end-to-end (IVertex.java:28-43 carried into compute()).

    rank0 = s(v)/S; rank = alpha*sum(in) + (1-alpha)*s(v)/S with
    S = ctx['seed_total'] (global seed sum, computed once by the caller)."""

    name = "seeded_pagerank"

    def _seed(self, shard: dict, ctx: dict) -> np.ndarray:
        col = "v_" + ctx.get("seed_col", "seed")
        if col not in shard:
            raise KeyError(
                f"shard has no vertex value array '{col}' — build the graph "
                f"with build_graph(vertex_cols=['{ctx.get('seed_col', 'seed')}'])"
            )
        return shard[col]

    def _teleport(self, shard: dict, ctx: dict):
        alpha = ctx.get("alpha", 0.85)
        return (1.0 - alpha) * self._seed(shard, ctx) / ctx["seed_total"]

    def init(self, shard: dict, ctx: dict) -> dict:
        return {"rank": self._seed(shard, ctx) / ctx["seed_total"]}


def seeded_pagerank(
    edges_ds=None,
    g: LinkGraph | None = None,
    vertices_ds=None,
    seed_col: str = "seed",
    seed_total: float | None = None,
    num_parts: int = 16,
    partitioner: str = "hash",
    alpha: float = 0.85,
    eps: float = 1e-6,
    iters: int | None = None,
    max_supersteps: int = 500,
    ckpt_dir: str | None = None,
    resume: bool = True,
    ckpt_every: int = 1,
    engine: str = "dataset",
):
    """Personalized PageRank seeded by a vertex value column.

    ``vertices_ds`` must carry (vid, <seed_col>); ``seed_total`` (the global
    seed sum) is computed with one tiny aggregate when not given."""
    if g is None:
        if vertices_ds is None:
            raise ValueError("seeded_pagerank needs vertices_ds with the seed column")
        if seed_total is None:
            seed_total = float(vertices_ds.sum(seed_col))
        g = build_graph(
            edges_ds, vertices_ds, num_parts=num_parts, partitioner=partitioner,
            directed=True, vertex_cols=[seed_col],
        )
    if seed_total is None:
        raise ValueError("seed_total required when passing a prebuilt graph")
    ctx = {
        "alpha": alpha,
        "eps": eps,
        "iters": iters,
        "ckpt_every": ckpt_every,
        "partitioner": g.partitioner,
        "num_parts": g.num_parts,
        "seed_col": seed_col,
        "seed_total": float(seed_total),
    }
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(
        g, SeededPageRank(), ctx, max_supersteps=max_supersteps,
        ckpt_dir=ckpt_dir, resume=resume,
    )
    ranks = res.state_dataset().select_columns(["vid", "rank"])
    return res, ranks


def pagerank(
    edges_ds=None,
    g: LinkGraph | None = None,
    vertices_ds=None,
    num_parts: int = 16,
    partitioner: str = "hash",
    alpha: float = 0.85,
    eps: float = 1e-6,
    iters: int | None = None,
    max_supersteps: int = 500,
    ckpt_dir: str | None = None,
    resume: bool = True,
    ckpt_every: int = 1,
    engine: str = "dataset",
    weighted: bool = False,
    init_ranks: str | None = None,
):
    """Run PageRank; returns (BSPResult, ranks Dataset (vid, rank)).
    ``weighted=True`` distributes rank proportional to edge weights
    (requires a weighted graph). ``init_ranks`` names a vertex value column
    persisted at build time (``build_graph(vertex_cols=[col])``) to warm-
    start from — incremental recompute on a recrawl (same fixpoint, fewer
    supersteps)."""
    if g is None:
        g = build_graph(
            edges_ds, vertices_ds, num_parts=num_parts, partitioner=partitioner,
            directed=True, weighted=weighted,
        )
    ctx = {
        "alpha": alpha,
        "eps": eps,
        "iters": iters,
        "ckpt_every": ckpt_every,
        "partitioner": g.partitioner,
        "num_parts": g.num_parts,
    }
    if init_ranks is not None:
        ctx["init_ranks"] = init_ranks
    algo = WeightedPageRank() if weighted else PageRank()
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(
        g, algo, ctx, max_supersteps=max_supersteps, ckpt_dir=ckpt_dir,
        resume=resume,
    )
    ranks = res.state_dataset().select_columns(["vid", "rank"])
    return res, ranks


class MultiSeedPPR(Algorithm):
    """k-seed personalized PageRank in ONE BSP job: per-vertex state is a
    k-column rank matrix (one independent PPR vector per seed — random
    walk with restart), updated synchronously as
    ``r_s = alpha * sum_in(r_s/outdeg) + (1-alpha) * [v == seed_s]``
    from ``r_s^0 = [v == seed_s]``. The per-seed vectors share every
    shuffle: messages carry k pre-combined columns per destination (the
    harmonic-centrality k-columns pattern applied to PageRank), so k
    seeds cost one job, not k. ``seeded_pagerank`` is the different
    single-vector semantics (one teleport distribution over all
    vertices); this is per-seed proximity — "related pages for each hub".
    Fixed ``iters`` only (the SQL mirror unrolls per seed per round).
    Determinism: messages sort by (dst, *columns) before accumulation —
    bit-equal rows commute, so sums are order-independent."""

    name = "multi_seed_ppr"

    def __init__(self, k: int) -> None:
        self.k = k
        self.msg_fields = [(f"r{i}", pa.float64()) for i in range(k)]

    def _mat(self, cols, n: int) -> np.ndarray:
        m = np.empty((n, self.k), dtype=np.float64)
        for i in range(self.k):
            m[:, i] = np.asarray(cols[f"r{i}"], dtype=np.float64)
        return m

    def init(self, shard: dict, ctx: dict) -> dict:
        vids = shard["vids"]
        seeds = np.asarray(ctx["seeds"], dtype=np.int64)
        m = (vids[:, None] == seeds[None, :]).astype(np.float64)
        return {f"r{i}": m[:, i].copy() for i in range(self.k)}

    def step(self, s: int, shard: dict, state: dict, msgs: pa.Table, ctx: dict):
        vids, indptr, indices = shard["vids"], shard["indptr"], shard["indices"]
        n = len(vids)
        alpha = ctx.get("alpha", 0.85)
        seeds = np.asarray(ctx["seeds"], dtype=np.int64)
        rank = self._mat(state, n)
        if s > 0:
            msgs = sort_msgs(
                msgs, ["dst"] + [f"r{i}" for i in range(self.k)]
            )
            inmass = np.zeros((n, self.k), dtype=np.float64)
            if msgs.num_rows:
                pos = np.searchsorted(
                    vids, msgs.column("dst").to_numpy(zero_copy_only=False)
                )
                np.add.at(
                    inmass, pos, self._mat(
                        {f"r{i}": msgs.column(f"r{i}").to_numpy(zero_copy_only=False)
                         for i in range(self.k)},
                        msgs.num_rows,
                    ),
                )
            rank = alpha * inmass + (1.0 - alpha) * (
                vids[:, None] == seeds[None, :]
            )
        state = {f"r{i}": rank[:, i].copy() for i in range(self.k)}
        deg = np.diff(indptr)
        has_out = deg > 0
        out = None
        if np.any(has_out):
            contrib = np.repeat(
                np.where(has_out[:, None], rank / np.maximum(deg, 1)[:, None], 0.0),
                deg, axis=0,
            )
            dsts, inv = np.unique(indices, return_inverse=True)
            sums = np.zeros((len(dsts), self.k), dtype=np.float64)
            np.add.at(sums, inv, contrib)
            out = self.make_msgs(
                route_parts(shard, ctx, dsts), dsts,
                **{f"r{i}": sums[:, i] for i in range(self.k)},
            )
        return state, out, n, 0.0

    def halted(self, agg: dict, s: int, ctx: dict) -> bool:
        return s >= ctx["iters"]


def multi_seed_ppr(
    g: LinkGraph,
    seeds,
    iters: int = 12,
    alpha: float = 0.85,
    ckpt_dir: str | None = None,
    resume: bool = True,
    ckpt_every: int = 1,
    engine: str = "dataset",
):
    """Per-seed PPR columns after ``iters`` rounds. Returns (BSPResult,
    Dataset (vid, r0..r{k-1})) with column i = the PPR vector of
    ``seeds[i]``."""
    seeds = list(seeds)
    ctx = {
        "partitioner": g.partitioner, "num_parts": g.num_parts,
        "ckpt_every": ckpt_every, "seeds": seeds, "alpha": alpha,
        "iters": iters,
    }
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(
        g, MultiSeedPPR(len(seeds)), ctx, max_supersteps=iters + 1,
        ckpt_dir=ckpt_dir, resume=resume,
    )
    cols = ["vid"] + [f"r{i}" for i in range(len(seeds))]
    return res, res.state_dataset().select_columns(cols)


class Katz(PageRank):
    """Katz centrality (Katz 1953, public): ``x = beta + alpha * A^T x``
    iterated — each vertex pushes its WHOLE score along every out-edge
    (no out-degree normalization), receivers add the constant ``beta``
    attenuated-path mass. Same message/shuffle shape as PageRank (per-dst
    pre-combine, deterministic CSR-order reduction); fixed iteration count
    for SQL-oracle parity. ``alpha`` must be below 1/lambda_max for the
    series to converge — callers pick a conservative value (the suite uses
    0.05); with fixed ``iters`` the computation is exact either way."""

    name = "katz"

    def _teleport(self, shard: dict, ctx: dict):
        return ctx.get("beta", 1.0)

    def init(self, shard: dict, ctx: dict) -> dict:
        beta = ctx.get("beta", 1.0)
        return {"rank": np.full(len(shard["vids"]), beta, dtype=np.float64)}

    def _emit(self, shard: dict, ctx: dict, rank: np.ndarray):
        indptr, indices = shard["indptr"], shard["indices"]
        deg = np.diff(indptr)
        if not np.any(deg > 0):
            return None
        contrib = np.repeat(rank, deg)
        dsts, inv = np.unique(indices, return_inverse=True)
        sums = np.zeros(len(dsts), dtype=np.float64)
        np.add.at(sums, inv, contrib)
        return self.make_msgs(route_parts(shard, ctx, dsts), dsts, val=sums)


def katz(
    g: LinkGraph,
    alpha: float = 0.05,
    beta: float = 1.0,
    iters: int = 8,
    ckpt_dir: str | None = None,
    resume: bool = True,
    ckpt_every: int = 1,
    engine: str = "dataset",
):
    """Katz centrality after ``iters`` update rounds; returns
    (BSPResult, Dataset (vid, rank))."""
    ctx = {
        "alpha": alpha,
        "beta": beta,
        "iters": iters,
        "ckpt_every": ckpt_every,
        "partitioner": g.partitioner,
        "num_parts": g.num_parts,
    }
    _run = run_bsp_tasks if engine == "tasks" else run_bsp
    res = _run(
        g, Katz(), ctx, max_supersteps=iters + 1, ckpt_dir=ckpt_dir,
        resume=resume,
    )
    return res, res.state_dataset().select_columns(["vid", "rank"])
