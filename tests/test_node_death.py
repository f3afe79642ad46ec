"""Node-death resilience (north_rule fault-tolerance evidence).

Runs scripts/node_death_smoke.py in a SUBPROCESS: a two-raylet
`ray.cluster_utils.Cluster` loses its second node (hard kill) mid-crawl;
Ray re-executes the lost tasks on the survivor via lineage
reconstruction, the state plane survives on the head (driver-affinity,
state/placement.py), and the output tables + exact crawl order still
match the straight-line oracle."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_node_death_mid_crawl_golden_parity():
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "node_death_smoke.py")],
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["node_killed"], "node was not killed mid-crawl"
    assert out["alive_nodes_after"] == 1
    assert out["ok"], out
