"""NODE-death resilience: golden parity after losing a raylet mid-crawl.

Two-node `ray.cluster_utils.Cluster`; a background thread hard-removes
the second raylet shortly after the crawl starts. Everything that lived
there dies: in-flight fetch tasks, their plasma objects, any spilled
copies of the corpus broadcast. Ray re-executes lost tasks on the
surviving node (lineage reconstruction re-fetches lost inputs from the
owner on the head node); the state plane (frontier/seen shards) survives
because it takes soft driver-node affinity (state/placement.py). The
crawl must finish and match the straight-line oracle value-exactly —
tables AND exact crawl order.

Prints ONE JSON line. Run directly or via tests/test_node_death.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = "/tmp/wikicrawl_nodedeath_corpus"
OUT = "/tmp/wikicrawl_nodedeath_out"

TS_COLS = {"last_crawled_at", "last_success_at", "dat"}
BOOK_COLS = {"_row_id", "_dat_creat"}


def norm(tbl, sort_keys):
    df = tbl.to_pandas() if hasattr(tbl, "to_pandas") else tbl
    df = df.drop(columns=[c for c in df.columns if c in TS_COLS | BOOK_COLS])
    return df.sort_values(sort_keys).reset_index(drop=True)


def frames_equal(a, b) -> bool:
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        if a[c].dtype == object:
            if not (a[c].fillna("\x00") == b[c].fillna("\x00")).all():
                return False
        elif not a[c].equals(b[c]):
            return False
    return True


def main() -> None:
    import ray
    from ray.cluster_utils import Cluster

    from wikicrawl.oracle import run_oracle
    from wikicrawl.pipelines.crawl import CrawlConfig, crawl, read_crawl_log
    from wikicrawl.synth import generate

    generate(CORPUS, n_entities=1500, seed=42)

    # Explicit small object stores: the default (30% of host RAM per
    # raylet) lets this 2-raylet cluster contend with any concurrently
    # running Ray session (the pytest fixture, external sessions) for
    # /dev/shm headroom — the documented in-suite flake mode. The smoke
    # corpus is ~1500 entities; 1 GiB per node is an order of magnitude
    # more than it needs.
    store = 1 << 30
    cluster = Cluster(
        initialize_head=True,
        head_node_args={"num_cpus": 2, "include_dashboard": False,
                        "object_store_memory": store},
    )
    # Bind the driver BEFORE adding the victim: on a same-IP single-host
    # cluster the driver's raylet choice is a race over the registered
    # nodes, and ray.cluster_utils.remove_node(victim) calls
    # ray.shutdown() mid-crawl (then raises) whenever the driver landed
    # on the victim — the actual mechanism behind this smoke's
    # historical "environmental" flake (reproduced deterministically on
    # an idle box, 2026-08-19). With only the head registered at init
    # time the driver can bind nowhere else.
    ray.init(address=cluster.address, logging_level="ERROR",
             include_dashboard=False)
    victim = cluster.add_node(num_cpus=2, object_store_memory=store)
    cluster.wait_for_nodes()
    import ray._private.worker as _rw

    assert (_rw.global_worker.node._raylet_socket_name
            != victim._raylet_socket_name), "driver bound to the victim"
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    assert len([n for n in ray.nodes() if n["Alive"]]) == 2

    killed = {"at": None}

    def killer():
        time.sleep(2.5)  # mid-crawl: after waves are in flight
        cluster.remove_node(victim, allow_graceful=False)
        killed["at"] = time.time()

    t = threading.Thread(target=killer, daemon=True)

    shutil.rmtree(OUT, ignore_errors=True)
    cfg = CrawlConfig(corpus_dir=CORPUS, out_dir=OUT, entity_wave=64,
                      strict_order=True)
    t.start()
    t0 = time.time()
    res = crawl(cfg)
    wall = time.time() - t0

    # GCS aliveness lags the hard kill by the heartbeat timeout — poll
    deadline = time.time() + 60
    alive = 2
    while time.time() < deadline:
        alive = len([n for n in ray.nodes() if n["Alive"]])
        if alive == 1:
            break
        time.sleep(1)
    oracle = run_oracle(CORPUS)
    checks = {
        "pages": frames_equal(
            norm(res.tables["pages"].read_all(), ["wikidata_id", "lang"]),
            norm(oracle.pages, ["wikidata_id", "lang"])),
        "sections": frames_equal(
            norm(res.tables["sections"].read_all(),
                 ["wikidata_id", "lang", "display_order"]),
            norm(oracle.sections, ["wikidata_id", "lang", "display_order"])),
        "images_out": frames_equal(
            norm(res.tables["images_out"].read_all(),
                 ["wikidata_id", "lang", "display_order"]),
            norm(oracle.images_out, ["wikidata_id", "lang", "display_order"])),
    }
    log = read_crawl_log(OUT).to_pandas()
    want_log = oracle.crawl_log.to_pandas()
    checks["crawl_order"] = bool(
        len(log) == len(want_log)
        and (log["canonical_url"].to_numpy()
             == want_log["canonical_url"].to_numpy()).all()
        and (log["seq"].to_numpy() == want_log["seq"].to_numpy()).all()
    )
    out = {
        "metric": "node-death mid-crawl golden parity",
        "node_killed": killed["at"] is not None and killed["at"] - t0 < wall,
        "alive_nodes_after": alive,
        "crawl_sec": round(wall, 2),
        "fetched": res.metrics["fetched"],
        "parity": checks,
        "ok": (killed["at"] is not None and alive == 1
               and all(checks.values())),
    }
    ray.shutdown()
    cluster.shutdown()
    print(json.dumps(out))
    assert out["ok"], out


if __name__ == "__main__":
    main()
