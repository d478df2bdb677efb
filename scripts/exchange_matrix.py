"""Staged-exchange format matrix: parquet vs Arrow IPC (uncompressed /
LZ4 / zstd) at 8 and 32 CPUs on the sf0.1 CDC replay.

Round-3 verdict ask: measure IPC-with-LZ4 frames as the middle point
between parquet's small bytes and uncompressed IPC's cheap encode, and
report a matrix with scaling. Protocol matches bench.py --scaling:
fresh process per leg (NDP_BENCH_CDC_ONLY=1, single attempt), formats
INTERLEAVED within each round so every format sees the same host-noise
window, median across rounds. One warm-up leg first.

Usage: python scripts/exchange_matrix.py [rounds]   (default 3)
Prints one JSON blob; paste the table into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from pathlib import Path

FORMATS = ["parquet", "ipc", "ipc-lz4", "ipc-zstd"]
CPUS = [8, 32]
BENCH = str(Path(__file__).resolve().parent.parent / "bench.py")


def one(fmt: str, ncpu: int) -> float:
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS=str(ncpu),
        NDP_BENCH_CDC_ONLY="1",
        NDP_BENCH_CDC_ATTEMPTS="2",  # warm attempt dodges first-touch faults
        NDP_STAGED_FORMAT=fmt,
    )
    out = subprocess.run(
        [sys.executable, BENCH],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=str(Path(BENCH).parent),
    ).stdout
    rec = json.loads(out.strip().splitlines()[-1])
    return rec["cdc"]["events_per_sec"]


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    one("parquet", 8)  # warm-up: page cache + synth cache + worker spawn
    samples: dict[tuple[str, int], list[float]] = {
        (f, c): [] for f in FORMATS for c in CPUS
    }
    for r in range(rounds):
        for fmt in FORMATS:
            for ncpu in CPUS:
                ev = one(fmt, ncpu)
                samples[(fmt, ncpu)].append(ev)
                print(
                    f"round {r} {fmt:9s} cpus={ncpu:2d} {ev/1e6:6.2f}M ev/s",
                    file=sys.stderr,
                )
    result = {}
    for fmt in FORMATS:
        med8 = statistics.median(samples[(fmt, 8)])
        med32 = statistics.median(samples[(fmt, 32)])
        result[fmt] = {
            "ev_per_sec_8": round(med8),
            "ev_per_sec_32": round(med32),
            "eff_8_to_32": round((med32 / med8) / 4, 3),
            "all_8": [round(x) for x in samples[(fmt, 8)]],
            "all_32": [round(x) for x in samples[(fmt, 32)]],
        }
    print(json.dumps({"rounds": rounds, "matrix": result}))


if __name__ == "__main__":
    main()
