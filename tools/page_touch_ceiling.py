"""Measure deliverable FRESH-PAGE-TOUCH throughput vs process count.

Companion to cpu_ceiling.py. Each worker repeatedly mmaps an anonymous
region and writes one byte per 4 KiB page (first-touch = page fault +
kernel zeroing; on a Firecracker/virtio-mem style host, possibly a
host-side fault handler), unmaps, repeats. Aggregate pages/sec vs process
count tells whether the sandbox's *memory-delivery* path scales with
cores the way its ALU path (cpu_ceiling.py) does. Motivation: round-5
telemetry (BENCH/BASELINE.md) shows the KG job burning 50-70% of all 32
cores in sys time with user at 8% — the signature of page-fault
serialization, which would explain local[32] reps running absolutely
slower than local[8] on the same input while sha256 scales at 0.8+.

Usage: python tools/page_touch_ceiling.py [--levels 1,8,32] [--secs 5]
       [--mb 256] [--reps 2] [--json-out PATH]
"""

from __future__ import annotations

import argparse
import json
import mmap
import multiprocessing as mp
import statistics
import time

PAGE = 4096


def _worker(secs: float, mb: int, out_q) -> None:
    n_pages = 0
    size = mb << 20
    deadline = time.monotonic() + secs
    while time.monotonic() < deadline:
        m = mmap.mmap(-1, size)
        for off in range(0, size, PAGE):
            m[off] = 1
        n_pages += size // PAGE
        m.close()
    out_q.put(n_pages)


def run_level(procs: int, secs: float, mb: int) -> dict:
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(secs, mb, q)) for _ in range(procs)]
    for p in ps:
        p.start()
    counts = [q.get() for _ in ps]
    for p in ps:
        p.join()
    total = sum(counts)
    return {
        "procs": procs,
        "pages_total": total,
        "pages_per_sec": round(total / secs, 1),
        "mb_per_sec": round(total * PAGE / secs / 1e6, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="1,8,32")
    ap.add_argument("--secs", type=float, default=5.0)
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    by_level: dict[int, list[dict]] = {p: [] for p in levels}
    for rep in range(args.reps):
        for p in levels:
            r = run_level(p, args.secs, args.mb)
            by_level[p].append(r)
            print(
                f"rep {rep + 1} procs={p:3d}: {r['pages_per_sec']:>12.1f} pages/s"
                f" = {r['mb_per_sec']:.0f} MB/s first-touch",
                flush=True,
            )

    base = max(r["pages_per_sec"] for r in by_level[levels[0]])
    base_per_proc = base / levels[0]
    summary = {}
    for p in levels:
        rates = [r["pages_per_sec"] for r in by_level[p]]
        best = max(rates)
        summary[p] = {
            "procs": p,
            "pages_per_sec": rates,
            "best": best,
            "median": round(statistics.median(rates), 1),
            "speedup_vs_1proc": round(best / base_per_proc, 2),
            "efficiency": round(best / (p * base_per_proc), 3),
        }
        print(
            f"procs={p:3d}: best {best:>12.1f} pages/s  speedup "
            f"x{summary[p]['speedup_vs_1proc']}  efficiency {summary[p]['efficiency']}",
            flush=True,
        )

    out = {
        "protocol": {
            "work": f"mmap anonymous {args.mb} MiB, write 1 byte/4 KiB page, munmap, loop",
            "secs_per_rep": args.secs,
            "reps": args.reps,
            "interleaved": True,
        },
        "levels": summary,
    }
    line = json.dumps(out)
    print(line)
    if args.json_out:
        with open(args.json_out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    mp.set_start_method("spawn", force=True)
    main()
