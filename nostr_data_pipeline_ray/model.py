"""Canonical Arrow schemas for the engine.

The transcript table shape is authoritative from BASELINE.json input_hint:
(conv_id: string, turn_idx: int32, role: string, text: string, tool: string,
ts: timestamp[us]). Change events add (op: insert|update|delete, lsn: int64).

The reference's analog is the raw Nostr event dict
(reference: src/nostr_pipeline/transformers/event_processor.py:41-51) and its
SQLAlchemy models (reference: src/nostr_pipeline/models.py:24-230); here every
table is a pyarrow schema over immutable Parquet.
"""

from __future__ import annotations

import pyarrow as pa

ROLES = ("user", "assistant", "tool", "system")
OPS = ("insert", "update", "delete")

TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# binlog/WAL change-event schema: transcripts + (op, lsn). lsn is the global
# total order used for last-writer-wins (reference analog: arrival order /
# received_at, src/nostr_pipeline/loaders/event_loader.py:203-215).
CHANGELOG_SCHEMA = pa.schema(
    list(TRANSCRIPT_SCHEMA)
    + [
        pa.field("op", pa.string()),
        pa.field("lsn", pa.int64()),
    ]
)

# lake snapshot schema: transcripts + lsn retained so cross-epoch LWW merges
# stay correct (a later epoch's older duplicate cannot overwrite).
LAKE_SCHEMA = pa.schema(list(TRANSCRIPT_SCHEMA) + [pa.field("lsn", pa.int64())])

# upsert key (reference analog: PK probe at event_loader.py:35-38, upsert at
# event_loader.py:60-87)
KEY_COLUMNS = ("conv_id", "turn_idx")
