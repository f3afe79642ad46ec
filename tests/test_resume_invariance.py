"""Resume-from-checkpoint and parallelism-invariance tests.

- resume: stop the crawl mid-run (max_waves), restart with resume=True,
  assert the final tables/log/seen set equal an uninterrupted run
  (the reference's 'reasonably idempotent' contract, README:506-516).
- invariance: identical outputs at different actor-pool sizes / shard
  counts (the reference's workers=1 vs workers=8 protocol,
  doc/wikipedia-crawler-optimization.md:192-208).
"""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from wikicrawl.pipelines.crawl import CrawlConfig, crawl, read_crawl_log
from wikicrawl.synth import generate

CORPUS = "/tmp/wikicrawl_test_corpus_t1"


@pytest.fixture(scope="session")
def corpus():
    generate(CORPUS, n_entities=200, seed=42)
    return CORPUS


def run(out, corpus, **kw):
    shutil.rmtree(out, ignore_errors=True)
    cfg = CrawlConfig(corpus_dir=corpus, out_dir=out, **kw)
    return crawl(cfg)


def table_snapshot(res, drop_book=True):
    out = {}
    for name, t in res.tables.items():
        df = t.read_all().to_pandas()
        drop = [c for c in df.columns
                if c in ("last_crawled_at", "last_success_at", "dat")
                or (drop_book and c.startswith("_"))]
        df = df.drop(columns=drop)
        out[name] = df.sort_values(list(df.columns[:3])).reset_index(drop=True)
    return out


def seen_hashes(out_dir):
    d = os.path.join(out_dir, "seen_segments")
    hashes = set()
    for f in os.listdir(d):
        if f.endswith(".parquet"):
            hashes.update(pq.read_table(os.path.join(d, f))["url_hash"].to_pylist())
    return hashes


def assert_same(res_a, out_a, res_b, out_b):
    snap_a, snap_b = table_snapshot(res_a), table_snapshot(res_b)
    for name in snap_a:
        a, b = snap_a[name], snap_b[name]
        assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)}"
        for c in a.columns:
            if a[c].dtype == object:
                assert (a[c].fillna("\x00") == b[c].fillna("\x00")).all(), f"{name}.{c}"
            else:
                assert a[c].equals(b[c]), f"{name}.{c}"
    assert seen_hashes(out_a) == seen_hashes(out_b)
    la = read_crawl_log(out_a).to_pandas()
    lb = read_crawl_log(out_b).to_pandas()
    assert (la["canonical_url"].to_numpy() == lb["canonical_url"].to_numpy()).all()


def test_resume_after_interruption(corpus, ray_session):
    full_out = "/tmp/wc_resume_full"
    part_out = "/tmp/wc_resume_part"
    full = run(full_out, corpus, entity_wave=64, strict_order=True)

    # interrupted run: stop after 2 waves, then resume to completion
    shutil.rmtree(part_out, ignore_errors=True)
    cfg1 = CrawlConfig(corpus_dir=corpus, out_dir=part_out, entity_wave=64,
                       strict_order=True, max_waves=2)
    crawl(cfg1)
    assert len(os.listdir(os.path.join(part_out, "checkpoints"))) == 2
    cfg2 = CrawlConfig(corpus_dir=corpus, out_dir=part_out, entity_wave=64,
                       strict_order=True, resume=True)
    resumed = crawl(cfg2)

    assert_same(full, full_out, resumed, part_out)


def test_parallelism_invariance(corpus, ray_session):
    a = run("/tmp/wc_inv_a", corpus, entity_wave=32, strict_order=True,
            fetch_concurrency=1, resolve_concurrency=1,
            n_frontier_shards=1, n_seen_shards=1, n_table_partitions=4)
    b = run("/tmp/wc_inv_b", corpus, entity_wave=128, strict_order=True,
            fetch_concurrency=4, resolve_concurrency=2,
            n_frontier_shards=3, n_seen_shards=4, n_table_partitions=8)
    assert_same(a, "/tmp/wc_inv_a", b, "/tmp/wc_inv_b")
