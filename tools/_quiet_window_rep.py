"""Fire one scaling-worker rep the moment the host goes quiet.

Polls the sentinel (tools/bench_scaling.py) once a minute; when three
consecutive walls sit at the idle floor (median < THRESH x floor), fires a
single worker rep at the requested parallelism with sentinel sampling, then
prints the rep JSON. One-shot helper for catching a clean measurement on a
host with minute-scale noise phases; the systematic protocol lives in
tools/bench_scaling.py.

Usage: python tools/_quiet_window_rep.py CPUS CORPUS_DIR [max_wait_min]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import os
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_scaling import calibrate, run_rep, sentinel_wall  # noqa: E402

THRESH = 1.2


def main() -> None:
    cpus = int(sys.argv[1])
    corpus_dir = sys.argv[2]
    max_wait = float(sys.argv[3]) if len(sys.argv) > 3 else 45.0
    floor = calibrate()
    print(f"floor {floor:.3f}s; waiting for quiet window "
          f"(median of 3 < {THRESH}x)", flush=True)
    deadline = time.time() + max_wait * 60
    while time.time() < deadline:
        walls = [sentinel_wall() for _ in range(3)]
        med = statistics.median(walls)
        print(f"probe {[round(w, 3) for w in walls]} "
              f"({med / floor:.2f}x)", flush=True)
        if med < THRESH * floor:
            print("quiet - firing rep", flush=True)
            r = run_rep(cpus, corpus_dir, None, floor)
            print(json.dumps(r), flush=True)
            return
        time.sleep(60)
    print("no quiet window before deadline", flush=True)


if __name__ == "__main__":
    main()
