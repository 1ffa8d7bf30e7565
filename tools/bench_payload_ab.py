"""8-core json-vs-typed payload A/B for ``sinks.write_layer_union``
(round-3 verdict task: resolve the "json is the measured winner" docstring
against the typed default with a current, noise-controlled measurement).

Same protocol as tools/bench_scaling.py (sentinel contamination sampling,
auto-reject + retry, interleaved A/B reps); one parallelism level, two
payload configs. Writes BENCH/payload_ab_8core.md.

Usage: python tools/bench_payload_ab.py [n_incidents] [--cpus 8] [--reps R]
           [--corpus-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from multilingual_wiki_event_pipeline_spark import datagen  # noqa: E402
from tools.bench_scaling import calibrate, run_rep  # noqa: E402

CONFIGS = ("json", "typed")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("n_incidents", nargs="?", type=int, default=60000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2,
                    help="accepted reps wanted per config")
    ap.add_argument("--max-attempts", type=int, default=None)
    ap.add_argument("--corpus-dir", default=None)
    args = ap.parse_args()
    max_attempts = args.max_attempts or args.reps + 2
    keep = args.corpus_dir is not None
    corpus_dir = args.corpus_dir or tempfile.mkdtemp(
        prefix="mwep_ab_corpus_", dir="/dev/shm"
    )
    floor = calibrate()
    print(f"sentinel floor: {floor:.3f}s", flush=True)
    reps: dict[str, list[dict]] = {c: [] for c in CONFIGS}
    attempts = {c: 0 for c in CONFIGS}
    try:
        if not os.path.exists(os.path.join(corpus_dir, "transcripts.parquet")):
            os.makedirs(corpus_dir, exist_ok=True)
            datagen.generate_to_dir(corpus_dir, n_incidents=args.n_incidents,
                                    seed=42)
        while True:
            progressed = False
            for c in CONFIGS:
                n_ok = sum(r["sentinel"]["accepted"] for r in reps[c])
                if n_ok >= args.reps or attempts[c] >= max_attempts:
                    continue
                attempts[c] += 1
                r = run_rep(args.cpus, corpus_dir, c, floor)
                reps[c].append(r)
                s = r["sentinel"]
                print(
                    f"{c} rep {attempts[c]}: wall {r['wall_sec']}s "
                    f"out_layers {r['stage_wall_sec'].get('out_layers')}s "
                    f"sentinel p75x{s['p75_ratio']} "
                    f"{'ok' if s['accepted'] else 'REJECTED'}",
                    flush=True,
                )
                progressed = True
            if not progressed:
                break
    finally:
        if not keep:
            shutil.rmtree(corpus_dir, ignore_errors=True)

    summary = {}
    for c in CONFIGS:
        acc = [r for r in reps[c] if r["sentinel"]["accepted"]] or reps[c]
        best = min(acc, key=lambda r: r["wall_sec"])
        summary[c] = {
            "best_wall_sec": best["wall_sec"],
            "median_wall_sec": round(
                statistics.median(r["wall_sec"] for r in acc), 2),
            "best_out_layers_sec": best["stage_wall_sec"].get("out_layers"),
            "accepted_walls_sec": [r["wall_sec"] for r in acc],
            "rejected_walls_sec": [
                r["wall_sec"] for r in reps[c]
                if not r["sentinel"]["accepted"]
            ],
            "stage_wall_sec": best["stage_wall_sec"],
            "counts": best["counts"],
            "n_turns": best["n_turns"],
        }
    j, t = summary["json"], summary["typed"]
    assert j["counts"] == t["counts"], (j["counts"], t["counts"])

    md = f"""# BENCH — payload A/B at 8 cores (json vs typed layer union)

Same full-pipeline job, same input ({args.n_incidents:,} incidents =
{j['n_turns']:,} turns), same JVM sizing, `local[{args.cpus}]`; only
`write_layer_union(payload=...)` differs. Interleaved reps with the
sentinel contamination protocol of `tools/bench_scaling.py`.

| payload | best wall (s) | median | out_layers stage (s) | accepted walls | rejected |
|---|---|---|---|---|---|
| json | {j['best_wall_sec']} | {j['median_wall_sec']} | {j['best_out_layers_sec']} | {j['accepted_walls_sec']} | {j['rejected_walls_sec']} |
| typed | {t['best_wall_sec']} | {t['median_wall_sec']} | {t['best_out_layers_sec']} | {t['accepted_walls_sec']} | {t['rejected_walls_sec']} |

Output counts identical across configs: {json.dumps(j['counts'])}.

Per-stage walls of each best rep:

| stage | json | typed |
|---|---|---|
""" + "\n".join(
        f"| {s} | {j['stage_wall_sec'].get(s, '—')} | {t['stage_wall_sec'].get(s, '—')} |"
        for s in sorted(set(j["stage_wall_sec"]) | set(t["stage_wall_sec"]))
    ) + f"""

Context: `typed` is the shipped default (scaling winner, 1→4 efficiency
0.849 vs json 0.691 — BENCH/scaling_1v4.json — and stored layers keep
column pruning); `json` remains the single-JVM wall knob when this A/B
shows it ahead. Reproduce:
`python tools/bench_payload_ab.py {args.n_incidents} --cpus {args.cpus}`.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "payload_ab_8core.md"), "w") as f:
        f.write(md)
    with open(os.path.join(REPO, "BENCH", "payload_ab_8core.json"), "w") as f:
        json.dump({"n_incidents": args.n_incidents, "cpus": args.cpus,
                   "summary": summary,
                   "reps": {c: [{k: r[k] for k in
                                 ("wall_sec", "stage_wall_sec", "sentinel")}
                                for r in reps[c]] for c in CONFIGS}}, f,
                  indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
