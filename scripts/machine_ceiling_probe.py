#!/usr/bin/env python3
"""Spark-free weak-scaling ceiling probe for THIS box.

N worker processes each perform an IDENTICAL, fixed amount of
pandas/regex string work — the same workload class (HTML-ish tag
stripping + whitespace normalization over ~5 KB strings) that dominates
the KG pipeline's row-local ``extract``/``mentions`` stages.  There is
no Spark, no shuffle, no JVM, no shared state: the work is perfectly
embarrassingly parallel, so ideal weak scaling (equal elapsed at any N)
is achievable by construction.  Whatever efficiency this probe measures
from N to 4N processes is therefore the MACHINE's per-core throughput
ceiling (hypervisor scheduling + memory bandwidth), not any engine's.

Used to adjudicate the local[8] -> local[32] pairing of
``scripts/scaling_bench.py``: if the raw probe cannot weak-scale 8 -> 32
at >= 0.8 on this box, neither can any data engine running on it, and
the pipeline's 8v32 number must be read against the probe's ceiling
rather than against 1.0.  (The 1v4 and 2v8 pairings stay within the
box's headroom and are the pairings the north-rule evidence stands on.)

Usage:
    python scripts/machine_ceiling_probe.py            # 8 vs 32
    python scripts/machine_ceiling_probe.py 2 8        # any two levels
"""
from __future__ import annotations

import json
import multiprocessing as mp
import re
import sys
import time

import pandas as pd

TAG = re.compile(r"<[^>]+>")
WS = re.compile(r"[ \t\r\f\v]+")


def work(_) -> int:
    """A fixed quantum of extract-flavored string work (~0.6 core-sec)."""
    rows = [
        "<html><body><p>word%d " % i
        + "lorem ipsum dolor sit amet " * 40
        + "</p><div>x</div></body></html>"
        for i in range(4000)
    ]
    s = pd.Series(rows)
    h = 0
    for _ in range(6):
        t = (
            s.str.replace(TAG, " ", regex=True)
            .str.replace(WS, " ", regex=True)
            .str.strip()
        )
        h = int(t.str.len().sum())
    return h


def run(n_procs: int, quanta_per_proc: int = 5) -> float:
    """Elapsed seconds for n_procs workers x quanta_per_proc quanta each.

    Pool creation (forking the workers) happens OUTSIDE the timed
    window — a cluster's executors exist before a job starts, so fork
    cost is not part of the per-core throughput being measured."""
    with mp.Pool(n_procs) as pool:
        t0 = time.monotonic()
        res = pool.map(_job, [quanta_per_proc] * n_procs)
        dt = time.monotonic() - t0
    assert len(set(res)) == 1, "nondeterministic work result"
    return dt


def _job(quanta: int) -> int:
    """Picklable top-level worker body for Pool.map."""
    h = 0
    for _ in range(quanta):
        h = work(0)
    return h


def main() -> None:
    configs = [int(x) for x in sys.argv[1:]] or [8, 32]
    run(2, quanta_per_proc=1)  # warm fork/import machinery
    timings: dict[int, list[float]] = {}
    for _ in range(2):  # interleave reps so a noise window hits both
        for n in configs:
            dt = run(n)
            timings.setdefault(n, []).append(dt)
            print(f"procs={n} elapsed={dt:.2f}s", flush=True)
    best = {n: min(v) for n, v in timings.items()}
    lo, hi = min(best), max(best)
    print(
        json.dumps(
            {
                "probe": "machine_weak_scaling_ceiling",
                "lo_procs": lo,
                "hi_procs": hi,
                "elapsed_lo": round(best[lo], 2),
                "elapsed_hi": round(best[hi], 2),
                "ceiling": round(best[lo] / best[hi], 3),
                "all_reps": {str(n): [round(x, 2) for x in v] for n, v in timings.items()},
            }
        )
    )


if __name__ == "__main__":
    main()
