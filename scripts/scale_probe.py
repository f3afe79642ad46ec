"""Large-corpus scale probe UNDER MEMORY PRESSURE (VERDICT r3 item 3).

Runs the headline crawl on a 240k+ entity corpus with a deliberately
small plasma object store, and reports everything the 100-TB design
claims should happen gracefully:

- per-phase driver timings (the crawl's own lap counters);
- PLASMA SPILL counters (bytes/objects spilled + restored, parsed from
  ray's memory summary and the raylet log);
- SEEN-SET spill behavior (shards are forced into their sorted-run spill
  machinery via a small ``seen_resident_keys``): run-file counts + bytes
  under <out>/seen_spill;
- throughput, so two invocations at different num_cpus give the N->4N
  efficiency at this corpus size.

Usage:
  python scripts/scale_probe.py <num_cpus> [entities] [store_gb] [resident_keys_log2]
  (defaults: 240000 entities, 4 GiB store, 2^18 resident keys/shard)

Prints ONE JSON line; pair two runs (e.g. 4 and 16) for the efficiency
number and archive under BENCH/.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ENTITIES = int(sys.argv[2]) if len(sys.argv) > 2 else 240_000
STORE_GB = float(sys.argv[3]) if len(sys.argv) > 3 else 4.0
RESIDENT_KEYS = 1 << (int(sys.argv[4]) if len(sys.argv) > 4 else 18)

os.environ.setdefault("BENCH_ENTITIES", str(ENTITIES))


def spill_stats() -> dict:
    """Plasma spill/restore counters: memory_summary + raylet log lines."""
    out = {}
    try:
        import ray
        from ray._private.internal_api import memory_summary

        s = memory_summary(stats_only=True)
        m = re.search(r"Spilled (\d+) MiB, (\d+) objects", s)
        if m:
            out["plasma_spilled_mib"] = int(m.group(1))
            out["plasma_spilled_objects"] = int(m.group(2))
        m = re.search(r"Restored (\d+) MiB, (\d+) objects", s)
        if m:
            out["plasma_restored_mib"] = int(m.group(1))
            out["plasma_restored_objects"] = int(m.group(2))
        out["object_store_used_mib"] = None
        m = re.search(r"Plasma memory usage (\d+) MiB", s)
        if m:
            out["object_store_used_mib"] = int(m.group(1))
    except Exception as e:  # noqa: BLE001 — diagnostics only
        out["memory_summary_error"] = f"{type(e).__name__}: {e}"
    # raylet.out carries the spill worker's own progress lines
    logs = sorted(glob.glob("/tmp/ray/*/session_*/logs/raylet.out"),
                  key=os.path.getmtime)
    if logs:
        spilled = 0
        with open(logs[-1], errors="replace") as f:
            for line in f:
                if "Spilled " in line:
                    spilled += 1
        out["raylet_spill_log_lines"] = spilled
    return out


def seen_spill_stats(out_dir: str) -> dict:
    d = os.path.join(out_dir, "seen_spill")
    files = glob.glob(os.path.join(d, "**", "*"), recursive=True)
    files = [f for f in files if os.path.isfile(f)]
    return {
        "seen_spill_run_files": len(files),
        "seen_spill_bytes": sum(os.path.getsize(f) for f in files),
    }


def main() -> None:
    import ray

    import bench
    from wikicrawl.pipelines.crawl import CrawlConfig, crawl

    corpus = bench.ensure_corpus(ENTITIES)
    cal0 = bench.calibrate_cpu(NUM_CPUS)
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR",
             object_store_memory=int(STORE_GB * (1 << 30)))
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    bench.warm_workers(NUM_CPUS)

    out = f"/tmp/wikicrawl_probe_out_{NUM_CPUS}"
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    cfg = CrawlConfig(
        corpus_dir=corpus, out_dir=out,
        durable_payload=os.environ.get("BENCH_DURABLE", "1") != "0",
        entity_wave=5000, strict_order=False,
        fetch_concurrency=max(2, NUM_CPUS - 1),
        write_workers=2 if NUM_CPUS <= 8 else max(3, NUM_CPUS // 8),
        fetch_batch=256, resolve_concurrency=max(2, NUM_CPUS // 4),
        n_frontier_shards=4, n_seen_shards=4, n_table_partitions=16,
        seen_resident_keys=RESIDENT_KEYS,  # force the sorted-run spill path
    )
    t0 = time.time()
    res = crawl(cfg)
    wall = time.time() - t0
    cal1 = bench.calibrate_cpu(NUM_CPUS)

    fetched = res.metrics["fetched"]
    rec = {
        "metric": "scale probe under memory pressure",
        "entities": ENTITIES,
        "num_cpus": NUM_CPUS,
        "object_store_gb": STORE_GB,
        "seen_resident_keys": RESIDENT_KEYS,
        "sec": round(wall, 2),
        "fetched": fetched,
        "urls_per_sec": round(fetched / wall, 1),
        "image_rows": res.tables["images_out"].read_all().num_rows,
        "timings": {k: round(v, 2) for k, v in
                    res.metrics.get("timings", {}).items()},
        "calib": [cal0, cal1],
        **spill_stats(),
        **seen_spill_stats(out),
    }
    ray.shutdown()
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
