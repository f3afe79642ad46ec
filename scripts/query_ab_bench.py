"""Focused query benchmark for regression rechecks (VERDICT r3 item 1).

Times selected queries N times in one Ray session at sf0.1/32 cpus, with
the pure-CPU calibration probe before and after (host-noise protocol from
the perf notes: quiet baseline ~1.21-1.27; never conclude from one run).

Usage: python scripts/query_ab_bench.py q17_minhash_pairs,q22_simhash_dups [reps]
"""

import json
import os
import statistics
import sys
import time

# WIKICRAWL_REPO selects the code under test (same-window A/B vs an old
# checkout: point it at a git worktree of the old commit)
sys.path.insert(0, os.environ.get("WIKICRAWL_REPO", "/root/repo"))


def main() -> None:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "q17_minhash_pairs", "q22_simhash_dups"]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = "/root/testdata/sf0.1"

    from bench import NUM_CPUS, init_ray, warm_workers
    try:
        from bench import calibrate_cpu
    except ImportError:  # older checkouts predate the probe
        import subprocess

        def calibrate_cpu(n_procs):
            work = ("import time\nt0 = time.thread_time()\nx = 0\n"
                    "for i in range(8_000_000):\n"
                    "    x = (x * 1103515245 + 12345) & 0xFFFFFFFF\n"
                    "print(time.thread_time() - t0)\n")
            procs = [subprocess.Popen([sys.executable, "-c", work],
                                      stdout=subprocess.PIPE, text=True)
                     for _ in range(n_procs)]
            vals = sorted(float(p.communicate()[0]) for p in procs)
            return round(statistics.median(vals), 4)

    cal0 = calibrate_cpu(8)
    init_ray(NUM_CPUS)
    warm_workers(NUM_CPUS)
    from ray.data import DataContext

    DataContext.get_current().execution_options.preserve_order = False
    from wikicrawl.queries import QUERIES

    out = {}
    for name in names:
        fn = QUERIES[name]
        fn(sf_dir)  # warm (plans, imports, parquet cache)
        laps = []
        for _ in range(reps):
            t0 = time.time()
            fn(sf_dir)
            laps.append(round(time.time() - t0, 3))
        out[name] = {"laps": laps, "median": statistics.median(laps)}
    cal1 = calibrate_cpu(8)
    rec = {"sf": 0.1, "num_cpus": NUM_CPUS, "cal_before": cal0,
           "cal_after": cal1, "queries": out}
    print(json.dumps(rec))
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
