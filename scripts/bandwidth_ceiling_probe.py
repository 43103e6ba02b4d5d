#!/usr/bin/env python3
"""Spark-free MEMORY-BANDWIDTH weak-scaling ceiling probe for THIS box.

Companion to :mod:`machine_ceiling_probe` (which measures the box's
ceiling for CPU-bound string work — 0.99 at 2v8).  Real pipeline stages
are a MIX: they compute over rows AND stream every stage's input and
output through memory — on this sandbox the corpus, all stage parquet,
and shuffle files live on tmpfs (/dev/shm), i.e. in RAM, so stage I/O
IS memory traffic.  A single-socket box has one memory controller;
weak scaling (4x data at 4x procs) multiplies the required aggregate
bandwidth by 4 while the controller's roof stays fixed.

Each worker process streams a fixed number of bytes through numpy
copies of a 64 MB buffer (working set far beyond LLC, so every copy is
DRAM traffic).  The work is embarrassingly parallel with zero shared
state — ideal weak scaling (equal elapsed at any N) is achievable by
construction, so whatever this probe measures from N to 4N processes
is the MACHINE's sustained-bandwidth ceiling, not any engine's.

Adjudication use: the KG pipeline's 2v8 weak-scaling band
(BENCH/BASELINE.md) must be read against BOTH probes — a measured
pipeline efficiency between the bandwidth ceiling (lower bound for
pure-streaming stages) and the CPU ceiling (upper bound for
pure-compute stages) is the box's signature, not the plan's.  On a
real cluster each of the 4N executors brings its OWN memory
controller and local disks, so aggregate bandwidth scales with N —
exactly the resource a single box cannot emulate.

Usage:
    python scripts/bandwidth_ceiling_probe.py          # 2 vs 8
    python scripts/bandwidth_ceiling_probe.py 1 4      # any two levels
"""
from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

BUF_MB = 64          # per-process buffer; far beyond any LLC
QUANTA = 400         # copies per process (~51 GB traffic each)


def work(quanta: int) -> int:
    a = np.empty(BUF_MB * 1024 * 1024, dtype=np.uint8)
    a[:] = 1
    b = np.empty_like(a)
    s = 0
    for _ in range(quanta):
        np.copyto(b, a)  # streaming read+write: 2 * BUF_MB DRAM traffic
        s += int(b[::4096].sum())
    return s


def run(n_procs: int, quanta: int = QUANTA) -> float:
    """Pool creation stays OUTSIDE the timed window (same methodology as
    machine_ceiling_probe.run: a cluster's executors pre-exist a job, so
    forking N interpreters is not part of the bandwidth being measured —
    with it inside, the hi config pays a fixed setup cost the lo config
    barely sees and the two probes' ceilings stop being comparable)."""
    with mp.Pool(n_procs) as pool:
        t0 = time.monotonic()
        pool.map(work, [quanta] * n_procs)
        return time.monotonic() - t0


def main() -> None:
    configs = [int(x) for x in sys.argv[1:]] or [2, 8]
    run(2, quanta=20)  # warm fork/alloc machinery (first-touch faults)
    timings: dict[int, list[float]] = {}
    for _ in range(2):  # interleave reps so a noise window hits both
        for n in configs:
            dt = run(n)
            timings.setdefault(n, []).append(dt)
            print(f"procs={n} elapsed={dt:.2f}s", flush=True)
    best = {n: min(v) for n, v in timings.items()}
    lo, hi = min(best), max(best)
    gbps = {
        n: round(n * QUANTA * 2 * BUF_MB / 1024 / best[n], 1)
        for n in best
    }
    print(
        json.dumps(
            {
                "probe": "memory_bandwidth_weak_ceiling",
                "lo_procs": lo,
                "hi_procs": hi,
                "elapsed_lo": round(best[lo], 2),
                "elapsed_hi": round(best[hi], 2),
                "aggregate_gb_per_sec": gbps,
                "ceiling": round(best[lo] / best[hi], 3),
                "all_reps": {
                    str(n): [round(x, 2) for x in v]
                    for n, v in timings.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
