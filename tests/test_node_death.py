"""Node-death resilience (north_rule fault-tolerance evidence).

Runs scripts/node_death_smoke.py in a SUBPROCESS: a two-raylet
`ray.cluster_utils.Cluster` loses its second node (hard kill) mid-crawl;
Ray re-executes the lost tasks on the survivor via lineage
reconstruction, the state plane survives on the head (driver-affinity,
state/placement.py), and the output tables + exact crawl order still
match the straight-line oracle."""

import json

from tests._smoke import run_smoke


def test_node_death_mid_crawl_golden_parity():
    # one environmental retry: see tests/_smoke.py (in-suite raylet
    # contention flake, reproduced as host-side in round 4)
    res = run_smoke("node_death_smoke.py")
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["node_killed"], "node was not killed mid-crawl"
    assert out["alive_nodes_after"] == 1
    assert out["ok"], out
