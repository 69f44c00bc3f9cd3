"""Canonical pyarrow schemas (SURVEY.md §7.1) — the engine's table contracts.

The reference's type system is Hadoop Writable generics chosen per job
(goffish-api/.../ISubgraphCompute.java:23-32); here every inter-stage payload
is a typed Arrow table with one of these schemas.
"""

from __future__ import annotations

import pyarrow as pa

PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),  # golden extracted text (input_hint contract)
        ("lang", pa.string()),
    ]
)

EDGES = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
EDGES_WEIGHTED = EDGES.append(pa.field("weight", pa.float64()))

VERTICES = pa.schema([("vid", pa.int64())])

# BSP message envelope: base fields + algorithm payload columns
MESSAGE_BASE = pa.schema([("dst_part", pa.int32()), ("dst", pa.int64())])

# per-partition vertex state checkpoint: vid + algorithm state columns
STATE_BASE = pa.schema([("vid", pa.int64())])

METRICS = pa.schema(
    [
        ("superstep", pa.int64()),
        ("part", pa.int32()),
        ("n_active", pa.int64()),
        ("msgs_in", pa.int64()),
        ("msgs_out", pa.int64()),
        ("delta_max", pa.float64()),
        ("compute_ms", pa.float64()),
    ]
)

MEDIA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)
