"""Sample host-level counters every N seconds while a command runs.

Records /proc/stat CPU-mode deltas (user/sys/idle/iowait/steal as
fractions of total ticks), PSI cpu/io 'some' totals, and aggregate disk
sectors read/written — the telemetry needed to attribute a slow wall to
compute vs stall. Used to adjudicate the round-5 local[32]-slower-than-
local[8] anomaly (BENCH/scaling_8v32.json).

Usage: python tools/_run_telemetry.py <out.jsonl> -- <cmd> [args...]
"""

from __future__ import annotations

import json
import subprocess
import sys
import threading
import time


def _read_proc_stat() -> list[int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return [int(x) for x in parts[1:]]


def _read_psi(kind: str) -> float:
    try:
        with open(f"/proc/pressure/{kind}") as f:
            line = f.readline()  # 'some avg10=... total=NNN' (usec)
        return int(line.rsplit("=", 1)[1]) / 1e6
    except OSError:
        return 0.0


def _read_disk() -> tuple[int, int]:
    rd = wr = 0
    with open("/proc/diskstats") as f:
        for line in f:
            p = line.split()
            if p[2].startswith(("loop", "ram")):
                continue
            rd += int(p[5])
            wr += int(p[9])
    return rd, wr


def sample_loop(out_path: str, stop: threading.Event, period: float) -> None:
    prev_stat = _read_proc_stat()
    prev_disk = _read_disk()
    prev_t = time.monotonic()
    with open(out_path, "w") as out:
        while not stop.wait(period):
            st = _read_proc_stat()
            dk = _read_disk()
            now = time.monotonic()
            d = [b - a for a, b in zip(prev_stat, st)]
            tot = sum(d) or 1
            rec = {
                "t": round(now - prev_t, 1),
                "user": round((d[0] + d[1]) / tot, 3),
                "sys": round(d[2] / tot, 3),
                "idle": round(d[3] / tot, 3),
                "iowait": round(d[4] / tot, 3),
                "irq": round((d[5] + d[6]) / tot, 3),
                "steal": round(d[7] / tot, 3) if len(d) > 7 else 0.0,
                "psi_cpu_some": round(_read_psi("cpu"), 1),
                "psi_io_some": round(_read_psi("io"), 1),
                "disk_rd_mb": round((dk[0] - prev_disk[0]) * 512 / 1e6, 1),
                "disk_wr_mb": round((dk[1] - prev_disk[1]) * 512 / 1e6, 1),
            }
            out.write(json.dumps(rec) + "\n")
            out.flush()
            prev_stat, prev_disk, prev_t = st, dk, now


def main() -> None:
    out_path = sys.argv[1]
    assert sys.argv[2] == "--"
    cmd = sys.argv[3:]
    stop = threading.Event()
    th = threading.Thread(target=sample_loop, args=(out_path, stop, 5.0))
    th.start()
    t0 = time.monotonic()
    try:
        rc = subprocess.run(cmd).returncode
    finally:
        wall = time.monotonic() - t0
        stop.set()
        th.join()
    print(json.dumps({"cmd_wall_sec": round(wall, 1), "rc": rc}))
    sys.exit(rc)


if __name__ == "__main__":
    main()
