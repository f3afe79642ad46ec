"""State-shard death resilience (VERDICT r3 item 7 — the "ugly case").

Runs scripts/shard_death_smoke.py in a SUBPROCESS: a seen-set shard
actor is hard-killed (``ray.kill``, no restart) at the top of wave 3 —
state Ray cannot rebuild from lineage. The crawl fails; ``resume=True``
in the SAME Ray session restores EXACT golden parity from the committed
wave manifests + admission WAL + seen segments, appending to (never
rewriting) the committed crawl log."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_seen_shard_death_resume_golden_parity():
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "shard_death_smoke.py")],
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["shard_killed"], "shard was not killed"
    assert out["manifests_before_resume"] > 0
    assert out["committed_preserved_append_only"]
    assert out["ok"], out
