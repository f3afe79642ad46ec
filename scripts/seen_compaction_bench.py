"""Disk probe for the seen-set spill path (NOTES_ROUND3 item 2).

Measures, for one SeenSet shard with a spill dir:
- bulk-insert throughput while runs spill (keys/s),
- run compaction throughput (keys/s through _compact_runs),
- membership-probe throughput against spilled runs (keys/s),
so the 10^10-URL story rests on a measured per-shard number instead of a
claim. Pure numpy + disk — no Ray. Usage:

    python scripts/seen_compaction_bench.py [n_keys_millions] [spill_dir]

Defaults: 8M keys, a tempdir under /tmp (pass a dir on the target device
to probe that device).
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikicrawl.state.seen import SeenSet  # noqa: E402


def main() -> None:
    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    n = int(n_m * 1_000_000)
    base = sys.argv[2] if len(sys.argv) > 2 else None
    tmp = tempfile.mkdtemp(prefix="seen_probe_", dir=base)

    # resident budget forces ~n/16 spills; max_runs forces real compactions
    s = SeenSet(capacity=1 << 20, spill_dir=tmp,
                max_resident_keys=max(1 << 18, n // 16), max_runs=4)
    rng = np.random.default_rng(11)
    batch = 1 << 20
    t0 = time.perf_counter()
    compact_t = 0.0
    orig_compact = s._compact_runs

    def timed_compact(*a, **kw):
        nonlocal compact_t
        c0 = time.perf_counter()
        orig_compact(*a, **kw)
        compact_t += time.perf_counter() - c0

    s._compact_runs = timed_compact
    inserted = 0
    keep = []
    for i in range(0, n, batch):
        keys = rng.integers(1, 2**63, size=min(batch, n - i)).astype(np.uint64)
        s.insert_batch(keys)
        inserted += len(keys)
        if i == 0:
            keep = keys[:100_000]
    t_ins = time.perf_counter() - t0

    # force one final full compaction over everything on disk
    s._spill_if_needed()
    if len(s._runs) > 1:
        c0 = time.perf_counter()
        orig_compact()
        compact_t += time.perf_counter() - c0
    total_spilled = sum(len(r) for r in s._runs)

    t0 = time.perf_counter()
    hits = s.contains_batch(np.asarray(keep))
    t_probe = time.perf_counter() - t0
    assert hits.all()

    print({
        "n_keys": inserted,
        "insert_keys_per_s": round(inserted / t_ins),
        "compact_sec_total": round(compact_t, 2),
        "compact_keys_per_s": round(total_spilled / compact_t) if compact_t else None,
        "spilled_keys": total_spilled,
        "runs_after": len(s._runs),
        "probe_keys_per_s": round(len(keep) / t_probe),
        "spill_dir": tmp,
    })
    for f in os.listdir(tmp):
        os.remove(os.path.join(tmp, f))
    os.rmdir(tmp)


if __name__ == "__main__":
    main()
