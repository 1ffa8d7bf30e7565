"""Measure the host's *deliverable* aggregate CPU throughput vs process count.

Pure CPython + multiprocessing sha256 — no Spark, no JVM, no I/O — so the
result isolates the hardware/hypervisor layer from everything the KG
pipeline adds on top. Motivation: the round-5 8v32 scaling attempts
(BENCH/scaling_8v32.json) show every local[32] rep slower in *absolute*
wall than every local[8] rep on the same input, across two independent
runs, while `nproc` reports 32 and the system is >90% idle. If this tool
shows aggregate throughput saturating well below 32x the single-process
rate, the north-rule's two-parallelism proxy is bounded by the sandbox's
deliverable compute, not by the pipeline's plan — which is the honest
finding to record in BENCH/BASELINE.md.

Protocol: for each process count P in --levels, fork P workers; each
worker sha256-hashes a 1 MiB buffer in a tight loop for --secs seconds
and reports its hash count. Aggregate rate = sum(counts)/secs. Repeat
--reps times per level, interleaved across levels (A/B/A/B...) so a slow
host phase hits all levels equally; report per-rep rates, best and
median. Ideal scaling: rate(P) = P * rate(1). Efficiency(P) =
rate(P) / (P * rate(1_best)).

Usage: python tools/cpu_ceiling.py [--levels 1,2,4,8,16,32] [--secs 10]
       [--reps 3] [--json-out PATH]
"""

import argparse
import hashlib
import json
import multiprocessing as mp
import statistics
import sys
import time


def _worker(secs: float, out_q) -> None:
    buf = b"\x5a" * (1 << 20)
    n = 0
    deadline = time.monotonic() + secs
    h = hashlib.sha256
    while time.monotonic() < deadline:
        h(buf).digest()
        n += 1
    out_q.put(n)


def run_level(procs: int, secs: float) -> dict:
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(secs, q)) for _ in range(procs)]
    t0 = time.monotonic()
    for p in ps:
        p.start()
    counts = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.monotonic() - t0
    total = sum(counts)
    return {
        "procs": procs,
        "wall_sec": round(wall, 3),
        "hashes_total": total,
        "hashes_per_sec": round(total / secs, 1),
        "per_proc_min": min(counts),
        "per_proc_max": max(counts),
        "per_proc_imbalance": round(max(counts) / max(min(counts), 1), 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="1,2,4,8,16,32")
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    by_level: dict[int, list[dict]] = {p: [] for p in levels}
    for rep in range(args.reps):
        for p in levels:
            r = run_level(p, args.secs)
            by_level[p].append(r)
            print(
                f"rep {rep + 1} procs={p:3d}: {r['hashes_per_sec']:>10.1f} MiB-hashes/s"
                f" (imbalance x{r['per_proc_imbalance']})",
                flush=True,
            )

    base = max(r["hashes_per_sec"] for r in by_level[levels[0]])
    base_per_proc = base / levels[0]
    summary = {}
    for p in levels:
        rates = [r["hashes_per_sec"] for r in by_level[p]]
        best = max(rates)
        summary[p] = {
            "procs": p,
            "rates": rates,
            "best": best,
            "median": round(statistics.median(rates), 1),
            "speedup_vs_1proc": round(best / base_per_proc, 2),
            "efficiency": round(best / (p * base_per_proc), 3),
        }
        print(
            f"procs={p:3d}: best {best:>10.1f}/s  speedup x{summary[p]['speedup_vs_1proc']}"
            f"  efficiency {summary[p]['efficiency']}",
            flush=True,
        )

    out = {
        "protocol": {
            "work": "sha256 over 1 MiB buffer, tight loop",
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
