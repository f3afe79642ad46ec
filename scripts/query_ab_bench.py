"""Focused query benchmark for regression rechecks (VERDICT r3 item 1).

Times selected queries N times in one Ray session at sf0.1/32 cpus, with
the pure-CPU calibration probe before and after (host-noise protocol from
the perf notes: quiet baseline ~1.21-1.27; never conclude from one run).

Usage: python scripts/query_ab_bench.py q17_minhash_pairs,q22_simhash_dups [reps]
"""

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "q17_minhash_pairs", "q22_simhash_dups"]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = "/root/testdata/sf0.1"

    from bench import NUM_CPUS, calibrate_cpu, init_ray, warm_workers

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
