"""Host CPU-inflation probe: how much does ONE cpu-second cost at N busy
cores vs at 4N?

Runs N independent Python processes, each doing a fixed pure-CPU integer
loop (no memory traffic beyond L1, no I/O, no Ray, no engine code), and
reports per-process ``time.thread_time``. Any inflation at higher N is a
property of the PLATFORM (hypervisor scheduling/steal, clock management,
shared caches) — not of the engine being benchmarked.

Used by BENCH/BASELINE.md to separate the engine's scaling efficiency
from the single-box measurement artifact: on this sandbox VM the same
loop costs ~21% more cpu-time per process at 32 busy cores than at 8.

Usage: python scripts/cpu_inflation_probe.py [levels ...]  (default 8 32)
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

_WORK = """
import time
t0 = time.thread_time()
x = 0
for i in range(8_000_000):
    x = (x * 1103515245 + 12345) & 0xFFFFFFFF
print(time.thread_time() - t0)
"""


def run_level(n: int) -> dict:
    procs = [
        subprocess.Popen([sys.executable, "-c", _WORK],
                         stdout=subprocess.PIPE, text=True)
        for _ in range(n)
    ]
    vals = sorted(float(p.communicate()[0]) for p in procs)
    return {
        "n_procs": n,
        "median_cpu_sec": round(statistics.median(vals), 3),
        "mean_cpu_sec": round(statistics.mean(vals), 3),
        "max_cpu_sec": round(max(vals), 3),
    }


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [8, 32]
    out = {"levels": [run_level(n) for n in levels]}
    if len(out["levels"]) >= 2:
        lo, hi = out["levels"][0], out["levels"][-1]
        out["inflation_lo_to_hi"] = round(
            hi["median_cpu_sec"] / lo["median_cpu_sec"], 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
