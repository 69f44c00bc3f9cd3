"""BSP-on-Datasets superstep driver.

The reference executes supersteps as Hama BSP: per-peer compute threads, then
``peer.sync()`` barrier, messages delivered next superstep, termination by
heartbeats + GLOBAL_HALT broadcast (GraphJobRunner.java:210-354,428-504,606).

Ray-Data-native re-expression (SURVEY.md §1.3, §7):

- a superstep = ONE ``groupby('dst_part').map_groups(step)`` shuffle of the
  round's message Dataset (plus one 'tick' row per partition so every
  partition runs even with no mail — replaces the run-iff
  ``!votedToHalt || hasMessages`` check, GraphJobRunner.java:309);
- the barrier = materializing the round's outgoing messages via
  ``write_parquet`` — which *is* the checkpoint (barrier == checkpoint, so
  resume-from-mid-iteration is free);
- per-partition vertex state lives in Arrow/parquet state tables
  (``state/ss={s}/part-{p}.parquet``), not Python closures — reference analog:
  compute-instance fields surviving supersteps (PageRank.java:27-30);
- termination: the driver reads the round's tiny metrics table and halts when
  ``sum(active)==0 and msgs_out==0`` (replaces heartbeat bit-twiddling; the
  reference even has an operator-precedence bug there,
  GraphJobRunner.java:434);
- a ``manifest.json`` with per-round lineage + metrics makes any run
  resumable: re-running skips completed supersteps.

Determinism contract: algorithms MUST reduce messages in a deterministic
order (sort by key columns before summing) so that resume and N-vs-4N-cpu
runs are bit-identical (SURVEY.md §7.4 float-summation-order).

BSP ordering guarantee (messages from round t all visible at t+1, Hama
contract, SURVEY.md §2.9) holds because round t's message Dataset is fully
materialized before round t+1 starts.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from raylink import storage
from raylink.graph import LinkGraph, load_shard

# May be a URI (s3://bucket/ckpt): all state/metrics/message/manifest IO goes
# through raylink.storage (pyarrow.fs), so multi-node resume only needs this
# root pointed at shared storage.
CKPT_ROOT = os.environ.get("RAYLINK_CKPT_ROOT", "/tmp/raylink/ckpt")

MSG_BASE_FIELDS = [("dst_part", pa.int32()), ("dst", pa.int64())]


class Algorithm:
    """Subgraph/vertex computation plugged into the BSP driver — the analog
    of subclassing AbstractSubgraphComputation (goffish-api/..:49).

    - ``msg_fields``: payload columns beyond (dst_part:int32, dst:int64)
    - ``init(shard, ctx)`` -> state dict of per-owned-vid numpy arrays
    - ``step(s, shard, state, msgs, ctx)`` -> (state, msgs_out_table|None,
       n_active, delta_max) — called once per partition per superstep; at
       s==0 ``msgs`` is empty (reference ss0 semantics).
    """

    name = "algorithm"
    msg_fields: list = []

    def init(self, shard: dict, ctx: dict) -> dict:
        raise NotImplementedError

    def step(self, s: int, shard: dict, state: dict, msgs: pa.Table, ctx: dict):
        raise NotImplementedError

    def halted(self, agg: dict, s: int, ctx: dict) -> bool:
        return agg["n_active"] == 0 and agg["msgs_out"] == 0

    def extra_metrics(self, state: dict, shard: dict, ctx: dict) -> dict:
        """Optional per-partition float metrics computed from the
        POST-step state, e.g. a partial sum a curve is built from
        (HyperANF's per-round neighborhood-function partial). Written into
        the round's metrics parquet and SUM-aggregated across partitions
        into the manifest history — per-round aggregates therefore survive
        checkpoint GC without retaining old state rounds. Keys must not
        collide with the built-in metric names."""
        return {}

    def msg_schema(self) -> pa.Schema:
        return pa.schema(MSG_BASE_FIELDS + list(self.msg_fields))

    def empty_msgs(self) -> pa.Table:
        return self.msg_schema().empty_table()

    def make_msgs(self, dst_part, dst, **payload) -> pa.Table:
        cols = {"dst_part": pa.array(np.asarray(dst_part, dtype=np.int32)),
                "dst": pa.array(np.asarray(dst, dtype=np.int64))}
        for name, typ in self.msg_fields:
            cols[name] = pa.array(payload[name], type=typ)
        return pa.table(cols)


def sort_msgs(msgs: pa.Table, keys: list[str]) -> pa.Table:
    """Deterministic message order before float reduction."""
    if msgs.num_rows == 0:
        return msgs
    return msgs.sort_by([(k, "ascending") for k in keys])


# --------------------------------------------------------------- checkpointing
@dataclass
class Checkpoint:
    """All IO via raylink.storage: ``ckpt_dir`` may be a URI, ``filesystem``
    an explicit pyarrow.fs FileSystem (pickles into Ray tasks)."""

    ckpt_dir: str
    filesystem: object = None

    def state_path(self, s: int, p: int) -> str:
        return storage.join(self.ckpt_dir, "state", f"ss={s}", f"part-{p}.parquet")

    def msgs_dir(self, s: int) -> str:
        return storage.join(self.ckpt_dir, "msgs", f"s{s:05d}")  # no "=" in path: read_parquet would hive-parse it into a column

    def metrics_path(self, s: int, p: int) -> str:
        return storage.join(self.ckpt_dir, "metrics", f"ss={s}", f"part-{p}.parquet")

    def write_atomic(self, table: pa.Table, path: str) -> None:
        storage.write_table_atomic(table, path, self.filesystem)

    def read_table(self, path: str) -> pa.Table:
        return storage.read_table(path, self.filesystem)

    def exists(self, path: str) -> bool:
        return storage.exists(path, self.filesystem)

    def manifest_path(self) -> str:
        return storage.join(self.ckpt_dir, "manifest.json")

    def read_manifest(self) -> dict | None:
        return storage.read_json(self.manifest_path(), self.filesystem)

    def write_manifest(self, man: dict) -> None:
        storage.write_json_atomic(man, self.manifest_path(), self.filesystem)

    def gc_rounds(self, upto: int) -> None:
        """Delete state/metrics/message checkpoints of supersteps <= upto.

        Retention is what makes multi-day crawl-scale jobs storage-bounded:
        resume only ever needs the LAST complete round (state + its message
        parquet + manifest), and per-round aggregate metrics live on in the
        manifest history. Old-round files are dead weight that at 10^12-
        vertex scale would otherwise grow the checkpoint root by one full
        state copy per superstep."""
        if upto < 0:
            return
        for sub, pat in (("state", "ss="), ("metrics", "ss=")):
            base = storage.join(self.ckpt_dir, sub)
            for d in storage.list_subdirs(base, self.filesystem):
                if not d.startswith(pat):
                    continue
                try:
                    s = int(d.split("=", 1)[1])
                except ValueError:
                    continue
                if s <= upto:
                    storage.delete_dir(storage.join(base, d), self.filesystem)
        mbase = storage.join(self.ckpt_dir, "msgs")
        for d in storage.list_subdirs(mbase, self.filesystem):
            try:
                s = int(d.lstrip("s"))
            except ValueError:
                continue
            if s <= upto:
                storage.delete_dir(storage.join(mbase, d), self.filesystem)

    def round_metrics(self, s: int, parts: list[int]) -> dict:
        rows = []
        for p in parts:
            rows.append(self.read_table(self.metrics_path(s, p)))
        t = pa.concat_tables(rows)
        agg = {
            "n_active": int(pa.compute.sum(t.column("n_active")).as_py() or 0),
            "msgs_in": int(pa.compute.sum(t.column("msgs_in")).as_py() or 0),
            "msgs_out": int(pa.compute.sum(t.column("msgs_out")).as_py() or 0),
            "delta_max": float(pa.compute.max(t.column("delta_max")).as_py() or 0.0),
            "compute_ms": float(pa.compute.sum(t.column("compute_ms")).as_py() or 0.0),
        }
        # algorithm extra_metrics columns: SUM across partitions
        for c in t.column_names:
            if c not in agg and c not in ("superstep", "part"):
                agg[c] = float(pa.compute.sum(t.column(c)).as_py() or 0.0)
        return agg


# ------------------------------------------------------------------ the runner
class _StepRunner:
    """Pickled per superstep; executed once per partition group."""

    def __init__(self, algo: Algorithm, g: LinkGraph, ck: Checkpoint, s: int, ctx: dict):
        self.algo, self.g, self.ck, self.s, self.ctx = algo, g, ck, s, ctx
        self.__name__ = f"{algo.name}_ss{s}"  # for Ray Data progress display

    def _load_state(self, p: int) -> dict:
        t = self.ck.read_table(self.ck.state_path(self.s - 1, p))
        state = {c: t.column(c).to_numpy(zero_copy_only=False) for c in t.column_names}
        aux_path = self.ck.state_path(self.s - 1, p) + ".aux"
        if self.ck.exists(aux_path):
            ta = self.ck.read_table(aux_path)
            state.update(
                {c: ta.column(c).to_numpy(zero_copy_only=False) for c in ta.column_names}
            )
        return state

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        p = int(group.column("dst_part")[0].as_py())
        msgs = group.filter(pa.compute.greater_equal(group.column("dst"), 0))
        shard = load_shard(self.g.graph_dir, p, self.g.filesystem)
        if self.s == 0:
            state = self.algo.init(shard, self.ctx)
        else:
            state = self._load_state(p)
        state, msgs_out, n_active, delta_max = self.algo.step(
            self.s, shard, state, msgs, self.ctx
        )
        if msgs_out is None:
            msgs_out = self.algo.empty_msgs()
        # vid-aligned arrays -> the state table; other lengths (e.g. per-edge
        # neighbour-estimate state, Montresor k-core) -> an aux sidecar file
        nv = len(shard["vids"])
        state_cols = {"vid": pa.array(shard["vids"])}
        aux_cols = {}
        for k, v in state.items():
            if k != "vid":
                (state_cols if len(v) == nv else aux_cols)[k] = pa.array(v)
        self.ck.write_atomic(pa.table(state_cols), self.ck.state_path(self.s, p))
        if aux_cols:
            self.ck.write_atomic(
                pa.table(aux_cols), self.ck.state_path(self.s, p) + ".aux"
            )
        ms = (time.perf_counter() - t0) * 1000.0
        mcols = {
            "superstep": pa.array([self.s], type=pa.int64()),
            "part": pa.array([p], type=pa.int32()),
            "n_active": pa.array([int(n_active)], type=pa.int64()),
            "msgs_in": pa.array([msgs.num_rows], type=pa.int64()),
            "msgs_out": pa.array([msgs_out.num_rows], type=pa.int64()),
            "delta_max": pa.array([float(delta_max)], type=pa.float64()),
            "compute_ms": pa.array([ms], type=pa.float64()),
        }
        for k, v in self.algo.extra_metrics(state, shard, self.ctx).items():
            mcols[k] = pa.array([float(v)], type=pa.float64())
        self.ck.write_atomic(pa.table(mcols), self.ck.metrics_path(self.s, p))
        return msgs_out


@dataclass
class BSPResult:
    graph: LinkGraph
    ckpt_dir: str
    last_superstep: int
    supersteps_run: int
    history: list = field(default_factory=list)
    wall_sec: float = 0.0

    def state_dataset(self):
        import ray.data as rd

        ck = Checkpoint(self.ckpt_dir, self.graph.filesystem)
        paths = [
            ck.state_path(self.last_superstep, p) for p in self.graph.parts
        ]
        paths, fs = storage.for_ray(paths, self.graph.filesystem)
        return rd.read_parquet(paths, filesystem=fs)


def run_bsp(
    g: LinkGraph,
    algo: Algorithm,
    ctx: dict | None = None,
    max_supersteps: int = 200,
    ckpt_dir: str | None = None,
    resume: bool = True,
) -> BSPResult:
    import ray.data as rd

    ctx = dict(ctx or {})
    ctx.setdefault("n_vertices", g.n_vertices)
    if ckpt_dir is None:
        ckpt_dir = storage.join(CKPT_ROOT, f"{algo.name}-{uuid.uuid4().hex[:12]}")
    # checkpoints share the graph's filesystem (URIs resolve per-process)
    ck = Checkpoint(ckpt_dir, g.filesystem)
    storage.makedirs(ckpt_dir, g.filesystem)

    # tick rows: one per partition, dst=-1 (ensures every partition computes)
    tick_cols = {
        "dst_part": pa.array(np.asarray(g.parts, dtype=np.int32)),
        "dst": pa.array(np.full(len(g.parts), -1, dtype=np.int64)),
    }
    for name, typ in algo.msg_fields:
        tick_cols[name] = pa.nulls(len(g.parts), type=typ)
    ticks = pa.table(tick_cols)

    # superstep fusion: `ckpt_every` (default 1) consecutive supersteps are
    # chained LAZILY into one Ray Data execution — every groupby in the chain
    # is an all-to-all barrier, so BSP ordering still holds round by round,
    # but the fixed per-execution driver overhead is paid once per chain.
    # The chain ends with a parquet message checkpoint (the resume point);
    # per-partition state/metrics are still persisted every round by the
    # runners (idempotent, so mid-chain retries/replays are safe).
    # With convergence-based halting the check runs at chain boundaries, so
    # up to ckpt_every-1 extra rounds may execute past the halt condition —
    # harmless for monotone fixpoint algorithms (PR keeps refining, min-label
    # stays put); fixed-iteration runs clamp the chain so counts are exact.
    ckpt_every = max(1, int(ctx.get("ckpt_every", 1)))

    history: list[dict] = []
    s_start, msgs_ds, halted = 0, None, False
    man = ck.read_manifest() if resume else None
    gsig = (f"{g.partitioner}/{g.num_parts}/{g.n_vertices}/"
            f"{g.n_edges}/{g.n_subgraphs}/{int(g.directed)}")
    if man is not None and man.get("algo") == algo.name and (
        man.get("graph_sig") is not None and man["graph_sig"] != gsig
    ):
        # resuming a different graph's checkpoint silently misaligns every
        # per-vid state array — refuse loudly
        # per-vid state arrays would silently misalign — refuse loudly
        raise ValueError(
            f"run_bsp: ckpt_dir {ckpt_dir!r} holds a {algo.name} run over a "
            f"structurally different graph ({man['graph_sig']} != {gsig}) — "
            "use a fresh ckpt_dir (or resume=False)"
        )
    if man is not None and man.get("algo") == algo.name:
        halted = man.get("halted", False)
        if halted:
            # finished job: final state lives at last_complete
            s_start = man["last_complete"] + 1
            history = man.get("history", [])
        else:
            last = man["resume_superstep"]
            history = man.get("history", [])[: last + 1]
            s_start = last + 1
            if man.get("msg_rows", 0) > 0:
                mp, mfs = storage.for_ray(ck.msgs_dir(last), ck.filesystem)
                msgs_ds = rd.read_parquet(mp, filesystem=mfs)

    t_run0 = time.perf_counter()
    s = s_start
    while not halted and s < max_supersteps:
        t0 = time.perf_counter()
        k = min(ckpt_every, max_supersteps - s)
        if ctx.get("iters") is not None:  # exact round count for fixed-iter runs
            k = max(1, min(k, int(ctx["iters"]) - s + 1))
        in_ds = rd.from_arrow(ticks)
        if msgs_ds is not None:
            in_ds = in_ds.union(msgs_ds)
        for j in range(k):
            runner = _StepRunner(algo, g, ck, s + j, ctx)
            out = in_ds.groupby("dst_part").map_groups(runner, batch_format="pyarrow")
            if j + 1 < k:
                in_ds = rd.from_arrow(ticks).union(out)
        s_end = s + k - 1
        mdir = ck.msgs_dir(s_end)
        # clear any partial files from an interrupted earlier attempt —
        # Ray's write_parquet APPENDS uniquely-named files, so leftovers
        # would be unioned with this round's messages on the re-read
        storage.delete_dir(mdir, ck.filesystem)
        storage.makedirs(mdir, ck.filesystem)
        mp, mfs = storage.for_ray(mdir, ck.filesystem)
        # executes the whole chain; the write IS the checkpoint/barrier
        out.write_parquet(mp, filesystem=mfs)
        chain_wall = time.perf_counter() - t0
        last_agg = None
        for j in range(k):
            agg = ck.round_metrics(s + j, g.parts)
            agg["superstep"] = s + j
            agg["wall_sec"] = chain_wall / k
            history.append(agg)
            halted = halted or algo.halted(agg, s + j, ctx)
            last_agg = agg
        if last_agg["msgs_out"] > 0:
            msgs_ds = rd.read_parquet(mp, filesystem=mfs)
        else:
            msgs_ds = None
            if not halted and last_agg["n_active"] == 0:
                halted = True
        ck.write_manifest(
            {
                "algo": algo.name,
                "graph_dir": g.graph_dir,
                "graph_sig": gsig,
                "resume_superstep": s_end,
                "last_complete": s_end,
                "msg_rows": last_agg["msgs_out"],
                "halted": halted,
                "history": history,
            }
        )
        # retention: drop rounds older than the resume window (0 keeps all)
        retain = int(ctx.get("retain_rounds", 2))
        if retain > 0:
            ck.gc_rounds(s_end - retain)
        s = s_end + 1

    return BSPResult(
        graph=g,
        ckpt_dir=ckpt_dir,
        last_superstep=s - 1,
        supersteps_run=s - s_start,
        history=history,
        wall_sec=time.perf_counter() - t_run0,
    )
