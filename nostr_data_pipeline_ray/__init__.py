"""nostr_data_pipeline_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of
uncoated-engineering/nostr-data-pipeline (reference at /root/reference) on
Ray Data: a simulated binlog/WAL of insert/update/delete change events over
Parquet transcript tables is tailed and applied as key-partitioned
last-writer-wins upserts into a Parquet lake with an idempotent two-phase
commit manifest, per-partition LSN watermarks and lineage metrics, plus the
reference's analytics operators (grouped aggregates, top-k, joins, windowed
timelines, dedup, search) expressed as Dataset pipelines.

Design notes (scale-first):
- every per-record transform is a vectorized ``map_batches`` over Arrow;
- the only all-to-all exchange in the CDC apply is ONE ``groupby(pkey)``
  over pre-combined (locally deduplicated) change rows;
- partitions untouched by an epoch are carried forward in the manifest
  (metadata only — no rewrite);
- the lake is a directory of per-partition Parquet files committed by a
  single atomic manifest rename, so retries and resumes are exactly-once.
"""

from .config import EngineConfig
from .model import CHANGELOG_SCHEMA, LAKE_SCHEMA, TRANSCRIPT_SCHEMA

__all__ = [
    "EngineConfig",
    "TRANSCRIPT_SCHEMA",
    "CHANGELOG_SCHEMA",
    "LAKE_SCHEMA",
]

__version__ = "0.1.0"
