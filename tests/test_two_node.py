"""Two-node Ray cluster golden parity (north_rule multi-node evidence).

Runs scripts/two_node_smoke.py in a SUBPROCESS: a `ray.cluster_utils.
Cluster` (head raylet + second raylet, separate object stores) cannot
share a process with the session-scoped single-node fixture. The script
asserts task spread across both node ids and full golden parity (tables,
crawl order, URL-seen set) vs the straight-line oracle — the same checks
as tests/test_parity.py, but through cross-node object transfer."""

import json

from tests._smoke import run_smoke


def test_two_node_cluster_golden_parity():
    # one environmental retry: see tests/_smoke.py
    res = run_smoke("two_node_smoke.py")
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["nodes"] == 2
    assert out["task_node_spread"] == 2
    assert out["ok"], out
