"""Deterministic synthetic transcript/changelog generator.

Generates the engine-specific tables described in FIXTURES.md §1–§4:
a simulated binlog/WAL of change events over multi-turn transcripts with
  * Zipf-skewed conv_id popularity (hot-conversation skew tests),
  * ~70% insert / 25% update / 5% delete,
  * duplicate deliveries of some lsn rows (reference analog: the same event
    arriving from multiple relays, deduped per batch at
    src/nostr_pipeline/pipeline.py:202-211),
  * updates/deletes only referencing previously inserted keys,
  * LSN-ordered non-overlapping segment files (resume boundary = segment),
  * an optional schema-evolution tail segment adding ``tool_meta``.

Everything is seeded and vectorized (numpy + pyarrow); generation is cached
under an output directory keyed by a params hash so repeated calls are
idempotent (tests, the DuckDB oracle and the bench all see identical bytes).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .model import CHANGELOG_SCHEMA, ROLES

_EPOCH_2024_US = np.int64(1_704_067_200) * 1_000_000  # 2024-01-01T00:00:00Z in µs

_TOOLS = np.array(["", "search", "python", "browser", "calculator"], dtype=object)
_PHRASES = np.array(
    [
        "let me look into that",
        "here is the result of the tool call",
        "summarizing the previous turns",
        "the answer depends on the context window",
        "retrying with a different approach",
        "streaming the partial output now",
        "checking the table schema first",
        "the merge completed without conflicts",
    ],
    dtype=object,
)


@dataclass(frozen=True)
class ChangelogSpec:
    """Parameters of a synthetic changelog. Hash of these keys the cache dir."""

    n_events: int = 20_000
    n_convs: int = 600
    n_segments: int = 8
    seed: int = 42
    zipf_alpha: float = 1.1
    max_turns: int = 40
    dup_frac: float = 0.02
    delete_frac: float = 0.18  # of non-first occurrences → ~5% overall
    evolve: bool = False  # last segment gains a tool_meta column

    def cache_key(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]


def _build_changelog_arrays(spec: ChangelogSpec) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events

    # Zipf-skewed conversation popularity
    ranks = np.arange(1, spec.n_convs + 1, dtype=np.float64)
    p = ranks ** (-spec.zipf_alpha)
    p /= p.sum()
    conv = rng.choice(spec.n_convs, size=n, p=p).astype(np.int64)

    turns_per_conv = rng.integers(1, spec.max_turns + 1, size=spec.n_convs)
    turn = np.floor(rng.random(n) * turns_per_conv[conv]).astype(np.int32)

    # op: first occurrence of a key in LSN order is the insert; later
    # occurrences are updates (or deletes with delete_frac probability) —
    # guarantees updates/deletes only reference previously inserted keys.
    key = conv * np.int64(1_000_000) + turn
    first_idx = np.unique(key, return_index=True)[1]
    is_first = np.zeros(n, dtype=bool)
    is_first[first_idx] = True
    is_delete = (~is_first) & (rng.random(n) < spec.delete_frac)

    role_idx = rng.choice(len(ROLES), size=n, p=[0.35, 0.45, 0.15, 0.05])
    tool_idx = np.where(role_idx == 2, rng.integers(1, len(_TOOLS), size=n), 0)
    phrase_idx = rng.integers(0, len(_PHRASES), size=n)
    repeats = rng.integers(1, 6, size=n)

    lsn = np.arange(n, dtype=np.int64)
    ts_us = _EPOCH_2024_US + lsn * np.int64(1_000_000)

    return {
        "conv": conv,
        "turn": turn,
        "role_idx": role_idx,
        "tool_idx": tool_idx,
        "phrase_idx": phrase_idx,
        "repeats": repeats,
        "is_delete": is_delete,
        "is_first": is_first,
        "lsn": lsn,
        "ts_us": ts_us,
    }


def _arrays_to_table(a: dict[str, np.ndarray]) -> pa.Table:
    # chunked build: a single pa.string() array caps at 2 GiB of payload,
    # which ~15M transcript texts exceed — build per-chunk and concat
    n = len(a["lsn"])
    chunk = 2_000_000
    if n > chunk:
        parts = [
            _arrays_to_table({k: v[i : i + chunk] for k, v in a.items()})
            for i in range(0, n, chunk)
        ]
        return pa.concat_tables(parts)
    conv_id = pc.binary_join_element_wise(
        "conv-", pc.cast(pa.array(a["conv"]), pa.string()), ""
    )
    roles = pa.array(np.array(ROLES, dtype=object)[a["role_idx"]])
    tools = pa.array(_TOOLS[a["tool_idx"]])
    # text is a deterministic function of (conv, turn, lsn) so the per-turn
    # text-equality invariant has one unambiguous expected value per key.
    base = pc.binary_join_element_wise(
        pa.array(_PHRASES[a["phrase_idx"]]),
        " [c",
        pc.cast(pa.array(a["conv"]), pa.string()),
        " t",
        pc.cast(pa.array(a["turn"]), pa.string()),
        " v",
        pc.cast(pa.array(a["lsn"]), pa.string()),
        "] ",
        "",
    )
    text = pc.binary_repeat(base, pa.array(a["repeats"], pa.int32()))
    op = pa.array(np.where(a["is_first"], "insert", np.where(a["is_delete"], "delete", "update")))
    ts = pa.array(a["ts_us"], pa.timestamp("us"))
    return pa.table(
        {
            "conv_id": conv_id,
            "turn_idx": pa.array(a["turn"], pa.int32()),
            "role": roles,
            "text": text,
            "tool": tools,
            "ts": ts,
            "op": op,
            "lsn": pa.array(a["lsn"], pa.int64()),
        },
        schema=CHANGELOG_SCHEMA,
    )


def generate_changelog(out_dir: str, spec: ChangelogSpec) -> str:
    """Write LSN-ordered binlog segments under ``out_dir/binlog/``.

    Idempotent: if ``out_dir/_done.json`` matches the spec hash, returns
    immediately. Returns the binlog directory path.
    """
    binlog = os.path.join(out_dir, "binlog")
    done = os.path.join(out_dir, "_done.json")
    key = spec.cache_key()
    if os.path.exists(done):
        with open(done) as f:
            if json.load(f).get("key") == key:
                return binlog
    os.makedirs(binlog, exist_ok=True)
    for old in os.listdir(binlog):
        os.unlink(os.path.join(binlog, old))

    arrays = _build_changelog_arrays(spec)

    # duplicate deliveries: re-append a sample of rows with identical lsn,
    # then stable-sort by lsn so segments remain LSN-ordered (dups adjacent).
    # Done in numpy index space BEFORE Arrow conversion — a global take() on
    # a >2 GiB string column overflows 32-bit offsets.
    rng = np.random.default_rng(spec.seed + 1)
    n = len(arrays["lsn"])
    dup_idx = rng.choice(n, size=int(spec.dup_frac * n), replace=False)
    combined = np.concatenate([np.arange(n, dtype=np.int64), dup_idx])
    order = np.argsort(arrays["lsn"][combined], kind="stable")
    final_idx = combined[order]
    table = _arrays_to_table({k: v[final_idx] for k, v in arrays.items()})

    bounds = np.linspace(0, table.num_rows, spec.n_segments + 1).astype(int)
    for i in range(spec.n_segments):
        seg = table.slice(bounds[i], bounds[i + 1] - bounds[i])
        if spec.evolve and i == spec.n_segments - 1:
            # additive schema evolution: the tail segment carries tool_meta
            meta = pc.binary_join_element_wise(
                '{"calls":', pc.cast(pc.add(seg["turn_idx"], 1), pa.string()), "}", ""
            )
            seg = seg.append_column("tool_meta", meta)
        pq.write_table(seg, os.path.join(binlog, f"seg-{i:05d}.parquet"))

    tmp = done + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"key": key, "spec": asdict(spec), "rows": table.num_rows}, f)
    os.replace(tmp, done)
    return binlog


def expected_final_state(binlog_dir: str) -> pa.Table:
    """Test oracle: LWW-reduce the whole binlog with DuckDB (FIXTURES.md §3).

    For each (conv_id, turn_idx): the row with max lsn whose op != delete,
    sorted by (conv_id, turn_idx). Small scales only (driver-side).
    """
    import duckdb

    con = duckdb.connect()
    out = con.execute(expected_final_state_sql(binlog_dir)).arrow()
    con.close()
    return out


def expected_final_state_sql(binlog_dir: str) -> str:
    """The DuckDB SQL oracle for the final lake state after full replay."""
    return expected_state_sql_for_files([f"{binlog_dir}/*.parquet"])


def expected_state_sql_for_files(paths: list[str]) -> str:
    """The same LWW oracle over an explicit segment-file list — the
    time-travel oracle's building block: the state as of epoch e is the
    LWW fold of exactly the segment files epochs 0..e applied."""
    file_list = ", ".join(f"'{p}'" for p in paths)
    return f"""
        SELECT conv_id, turn_idx, role, text, tool, ts, lsn
        FROM (
            SELECT * FROM read_parquet([{file_list}], union_by_name=true)
            QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) = 1
        )
        WHERE op != 'delete'
        ORDER BY conv_id, turn_idx
        """
