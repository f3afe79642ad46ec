"""Sharded pages-corpus broadcast (pipelines/crawl._load_pages fan-out).

At bench scale (120k+ entities) the pages table broadcast is read by
parallel Ray tasks — one per contiguous row-group range — and reassembled
worker-side with a zero-copy concat (stages/crawl_stages._cached_wiki).
The small test corpora land in ONE row group and take the driver path, so
this file forces the sharded path explicitly:

- shard/reassembly parity: the concat of `_read_row_groups` task outputs
  must equal `pq.read_table` of the whole file, bit-exactly;
- end-to-end: a corpus rewritten with tiny row groups (content UNCHANGED,
  only parquet layout differs) must crawl to identical tables/log/seen.
"""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from wikicrawl.pipelines.crawl import CrawlConfig, crawl, read_crawl_log
from wikicrawl.synth import generate

from .test_resume_invariance import assert_same, run, table_snapshot  # noqa: F401

CORPUS = "/tmp/wikicrawl_test_corpus_t1"  # shared with resume tests
CORPUS_RECHUNK = "/tmp/wikicrawl_test_corpus_rechunk"


@pytest.fixture(scope="module")
def corpora():
    generate(CORPUS, n_entities=200, seed=42)
    shutil.rmtree(CORPUS_RECHUNK, ignore_errors=True)
    shutil.copytree(CORPUS, CORPUS_RECHUNK)
    for name in ("pages_html.parquet", "images.parquet"):
        p = os.path.join(CORPUS_RECHUNK, name)
        pq.write_table(pq.read_table(p), p, row_group_size=32)
    return CORPUS, CORPUS_RECHUNK


def test_shard_reassembly_bit_exact(ray_session, corpora):
    from wikicrawl.pipelines.crawl import _read_row_groups

    _, rechunk = corpora
    path = os.path.join(rechunk, "pages_html.parquet")
    ng = pq.ParquetFile(path).metadata.num_row_groups
    assert ng > 1, "rechunked corpus must have multiple row groups"
    k = min(ng, 8)
    bounds = [list(range(i * ng // k, (i + 1) * ng // k)) for i in range(k)]
    shards = ray.get([_read_row_groups.remote(path, b) for b in bounds if b])
    # bounds cover every row group exactly once, in file order
    assert sorted(g for b in bounds for g in b) == list(range(ng))
    got = pa.concat_tables(shards)
    want = pq.read_table(path)
    assert got.schema.equals(want.schema)
    assert got.num_rows == want.num_rows
    assert got.equals(want.combine_chunks().replace_schema_metadata(
        got.schema.metadata))


def test_sharded_broadcast_crawl_parity(ray_session, corpora):
    """Same content, different parquet layout -> value-identical crawl
    (tables, seen set, exact crawl order)."""
    orig, rechunk = corpora
    res_a = run("/tmp/wikicrawl_out_shard_a", orig)
    res_b = run("/tmp/wikicrawl_out_shard_b", rechunk)
    assert_same(res_a, "/tmp/wikicrawl_out_shard_a",
                res_b, "/tmp/wikicrawl_out_shard_b")
