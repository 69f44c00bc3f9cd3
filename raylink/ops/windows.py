"""Windowed aggregates over the ``events`` stream-shaped table.

Ray Data has no event-time/watermark engine (and neither does the strictly
batch-BSP reference, SURVEY.md §2.9); stream-shaped workloads are treated as
an ordered, partitioned log: tumbling windows = key-computed groupby with
per-batch partial aggregation; session windows = per-key ``map_groups`` over
ts-sorted groups. Ordering assumption: windows are computed from absolute
event time, so input order is irrelevant; session assignment sorts within the
per-user group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raylink.util import round_half_away


def tumbling_window(events_ds, size_sec: int = 3600):
    """-> Dataset (user_id, window_start:int64 epoch sec, n_events,
    sum_value r6). Pre-aggregates per batch before the groupby shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        epoch = ts.astype("datetime64[s]").astype(np.int64)
        ws = (epoch // size_sec) * size_sec
        uid = batch.column("user_id").to_numpy(zero_copy_only=False)
        val = batch.column("value").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"user_id": uid, "window_start": ws, "value": val})
        agg = df.groupby(["user_id", "window_start"], sort=True).agg(
            n=("value", "size"), s=("value", "sum")
        )
        agg = agg.reset_index()
        return pa.table(
            {
                "user_id": pa.array(agg["user_id"].to_numpy(np.int64)),
                "window_start": pa.array(agg["window_start"].to_numpy(np.int64)),
                "n": pa.array(agg["n"].to_numpy(np.int64)),
                "s": pa.array(agg["s"].to_numpy(np.float64)),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "window_start": batch.column("window_start"),
                "n_events": batch.column("sum(n)"),
                "sum_value": pa.array(
                    round_half_away(
                        batch.column("sum(s)").to_numpy(zero_copy_only=False), 6
                    )
                ),
            }
        )

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "window_start"])
        .sum(["n", "s"])
        .map_batches(finish, batch_format="pyarrow")
    )


def sessionize(events_ds, gap_sec: int = 1800):
    """Session windows per user (new session when gap > gap_sec) ->
    (user_id, session_start:int64 epoch sec, n_events, sum_value r6,
    duration_sec)."""

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("ts").reset_index(drop=True)
        epoch = g["ts"].astype("int64") // 1_000_000
        new = (epoch.diff().fillna(gap_sec + 1) > gap_sec).cumsum()
        out = (
            pd.DataFrame(
                {"epoch": epoch, "value": g["value"], "sid": new}
            )
            .groupby("sid")
            .agg(
                session_start=("epoch", "min"),
                session_end=("epoch", "max"),
                n_events=("value", "size"),
                sum_value=("value", "sum"),
            )
            .reset_index(drop=True)
        )
        out.insert(0, "user_id", group["user_id"].iloc[0])
        out["sum_value"] = out["sum_value"].round(6)
        out["duration_sec"] = out["session_end"] - out["session_start"]
        return out[["user_id", "session_start", "n_events", "sum_value", "duration_sec"]]

    return events_ds.groupby("user_id").map_groups(sessions, batch_format="pandas")
