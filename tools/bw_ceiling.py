#!/usr/bin/env python
"""Host DRAM-bandwidth scaling ceiling: aggregate memcpy throughput at
1, 2, 4, 8 concurrent processes.

Why this exists (round 5): the north-rule scaling criterion is N vs 4N
*executors*. The sandbox proxy runs both levels on ONE host, so the two
levels share one memory controller — a resource a real 4N-executor
cluster multiplies with the nodes. This probe measures how far that
shared controller itself scales: each worker process copies a private
256 MiB pair (same working set as the bench's bandwidth sentinel,
tools/sentinel.py:70-79) in a loop for a fixed window; aggregate GB/s at
K processes / (K x single-process GB/s) is the hardware's own "scaling
efficiency" for purely bandwidth-bound work. If that number is below
0.8 at K=4, then a 1v4 proxy of ANY job with a bandwidth-bound fraction
is capped below 0.8 by the host, independent of the job's plan quality.

Usage: python tools/bw_ceiling.py [window_sec]   (default 6 s/level)
Writes BENCH/bw_ceiling.json and prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

BW_MB = 256
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worker(window: float, out: "mp.Queue", start_at: float) -> None:
    src = bytearray(b"\xa5" * (BW_MB << 20))
    dst = bytearray(BW_MB << 20)
    # barrier-ish start so all workers contend for the full window
    while time.perf_counter() < start_at:
        pass
    n = 0
    t0 = time.perf_counter()
    while True:
        dst[:] = src
        n += 1
        t = time.perf_counter()
        if t - t0 >= window:
            break
    out.put((n * BW_MB / 1024.0) / (t - t0))  # GB/s copied by this worker


def level(k: int, window: float) -> float:
    q: "mp.Queue" = mp.Queue()
    start_at = time.perf_counter() + 1.5  # alloc + first-touch headroom
    procs = [mp.Process(target=_worker, args=(window, q, start_at))
             for _ in range(k)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(rates)


def main() -> None:
    window = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    ks = (1, 2, 4, 8)
    # best-of-2 per level: one-sided noise can only slow a level down
    agg = {k: max(level(k, window) for _ in range(2)) for k in ks}
    eff = {k: round(agg[k] / (k * agg[1]), 3) for k in ks}
    out = {
        "window_sec": window,
        "copy_mb_per_proc": BW_MB,
        "aggregate_gb_per_sec": {k: round(v, 2) for k, v in agg.items()},
        "bandwidth_scaling_efficiency_vs_1": eff,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "bw_ceiling.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
