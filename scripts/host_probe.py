"""Host-contention probe for the scaling methodology (BASELINE.md).

This sandbox is a shared VM whose absolute speed and memory-bandwidth
scaling drift with hypervisor load. Before (and alongside) a
``bench.py --scaling`` run, this probe measures:

1. single-core throughput (a fixed numpy-regex workload, Mops/s) — tracks
   absolute host speed drift between runs;
2. N-process memory-bandwidth scaling at 4 vs 16 concurrent processes —
   the HARDWARE ceiling for any data-parallel job in this container. A
   reading of e.g. 0.60 means perfectly-parallel memory-bound code cannot
   exceed 0.60 efficiency at that moment, whatever the engine does.

Usage: python scripts/host_probe.py  ->  one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def _bandwidth_worker(arr_mb: int, iters: int, out):
    import numpy as np

    a = np.random.default_rng(0).standard_normal(arr_mb * 131072)  # 8B elems
    b = np.empty_like(a)
    t0 = time.perf_counter()
    for _ in range(iters):
        np.copyto(b, a)
        b *= 1.0000001
    out.put((arr_mb * iters * 2) / (time.perf_counter() - t0))  # MB/s-ish


def bandwidth_at(n_procs: int, arr_mb: int = 64, iters: int = 40) -> float:
    """Aggregate copy throughput of n_procs concurrent memory-bound procs."""
    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_bandwidth_worker, args=(arr_mb, iters, q))
        for _ in range(n_procs)
    ]
    for p in procs:
        p.start()
    vals = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(vals)


def single_core() -> float:
    import re

    import numpy as np

    rng = np.random.default_rng(1)
    words = ["".join(map(chr, rng.integers(97, 123, 8))) for _ in range(2000)]
    text = " ".join(words) * 50
    rx = re.compile(r"[a-z0-9_]+")
    t0 = time.perf_counter()
    n = 0
    for _ in range(20):
        n += len(rx.findall(text))
    return n / (time.perf_counter() - t0) / 1e6  # Mtok/s


def main() -> dict:
    sc = single_core()
    bw4 = bandwidth_at(4)
    bw16 = bandwidth_at(16)
    return {
        "metric": "host_probe",
        "single_core_mtok_s": round(sc, 2),
        "bw_4_procs": round(bw4, 1),
        "bw_16_procs": round(bw16, 1),
        "bw_scaling_4_to_16": round((bw16 / bw4) / 4.0, 3),
    }


if __name__ == "__main__":
    print(json.dumps(main()))
