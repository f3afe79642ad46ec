"""Unit tests for seen-set filters, frontier shard state, and KeyedTable
merge-insert (the verify_inplace_upsert invariants ported —
migrations/verify_inplace_upsert.py:1-50)."""

import numpy as np
import pyarrow as pa
import pytest

from wikicrawl.state.frontier import FrontierShardState
from wikicrawl.state.seen import BloomFilter, CuckooFilter, SeenSet
from wikicrawl.state.table import KeyedTable


def test_bloom_no_false_negatives():
    bf = BloomFilter(capacity=5000)
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 2**63, size=3000).astype(np.uint64)
    bf.add_batch(keys)
    assert bf.contains_batch(keys).all()
    other = rng.integers(0, 2**63, size=3000).astype(np.uint64)
    fresh = other[~np.isin(other, keys)]
    fp = bf.contains_batch(fresh).mean()
    assert fp < 0.05


def test_cuckoo_membership_and_fp():
    cf = CuckooFilter(capacity=4000)
    rng = np.random.default_rng(2)
    keys = rng.integers(1, 2**63, size=2000).astype(np.uint64)
    for k in keys:
        cf.insert(int(k))
    assert cf.contains_batch(keys).all()
    other = rng.integers(1, 2**63, size=2000).astype(np.uint64)
    fresh = other[~np.isin(other, keys)]
    assert cf.contains_batch(fresh).mean() < 0.02


def test_seen_set_first_wins_and_exactness(tmp_path):
    s = SeenSet(capacity=1 << 12)
    rng = np.random.default_rng(3)
    a = rng.integers(0, 2**63, size=500).astype(np.uint64)
    new1 = s.insert_batch(a)
    assert new1.all()
    new2 = s.insert_batch(a)  # exact: every re-insert rejected
    assert not new2.any()
    b = rng.integers(0, 2**63, size=500).astype(np.uint64)
    b_fresh = b[~np.isin(b, a)]
    assert s.insert_batch(b_fresh).all()
    assert len(s) == 500 + len(b_fresh)
    # segment round-trip
    seg = str(tmp_path / "seg.parquet")
    s.flush_segment(seg)
    s2 = SeenSet(capacity=1 << 12)
    s2.load_segment(seg)
    assert len(s2) == len(s)
    assert not s2.insert_batch(a[:10]).any()


def test_frontier_priority_and_politeness():
    st = FrontierShardState(0, rate=3, burst=3)
    rows = [
        dict(family_rank=1, seed_order=0, lang_rank=0, host="en.x", path="/wiki/A"),
        dict(family_rank=0, seed_order=1, lang_rank=1, host="en.x", path="/wiki/B"),
        dict(family_rank=0, seed_order=1, lang_rank=0, host="en.x", path="/wiki/C"),
        dict(family_rank=0, seed_order=0, lang_rank=0, host="fr.x", path="/wiki/D"),
        dict(family_rank=2, seed_order=0, lang_rank=0, host="en.x", path="/wiki/E"),
    ]
    assert st.push_batch(rows) == 5
    wave1 = st.pop_wave()
    # per-host budget 3: en.x yields its top-3 by priority; fr.x yields its 1
    en = [r["path"] for r in wave1 if r["host"] == "en.x"]
    assert en == ["/wiki/C", "/wiki/B", "/wiki/A"]
    assert [r["path"] for r in wave1 if r["host"] == "fr.x"] == ["/wiki/D"]
    wave2 = st.pop_wave()
    assert [r["path"] for r in wave2] == ["/wiki/E"]
    assert st.pop_wave() == []


def test_frontier_robots_denied_at_admission():
    st = FrontierShardState(
        0, rate=10, burst=10, robots_rules={"en.x": ("/wiki/Special_blocked",)}
    )
    rows = [
        dict(family_rank=0, seed_order=0, lang_rank=0, host="en.x", path="/wiki/OK"),
        dict(family_rank=0, seed_order=1, lang_rank=0, host="en.x",
             path="/wiki/Special_blocked_Z"),
    ]
    assert st.push_batch(rows) == 1
    assert st.robots_denied == 1
    assert [r["path"] for r in st.pop_wave()] == ["/wiki/OK"]


SCHEMA = pa.schema(
    [
        ("qid", pa.string()),
        ("lang", pa.string()),
        ("display_order", pa.int32()),
        ("val", pa.string()),
    ]
)


def make_tbl(rows):
    cols = {f.name: [r.get(f.name) for r in rows] for f in SCHEMA}
    return pa.table(cols, schema=SCHEMA)


def test_keyed_table_upsert_invariants(tmp_path):
    t = KeyedTable(
        str(tmp_path / "tbl"),
        SCHEMA,
        key=["qid", "lang", "display_order"],
        n_partitions=4,
        prune_group=["qid", "lang"],
    )
    r1 = [
        dict(qid="Q1", lang="en", display_order=1, val="a"),
        dict(qid="Q1", lang="en", display_order=2, val="b"),
        dict(qid="Q1", lang="en", display_order=3, val="c"),
        dict(qid="Q2", lang="fr", display_order=1, val="z"),
    ]
    c = t.merge_insert(make_tbl(r1), clock=100)
    assert c == {"inserted": 4, "updated": 0, "deleted": 0}
    before = t.read_all().to_pandas().set_index(["qid", "lang", "display_order"])

    # re-crawl Q1/en with only 2 images, first updated in place
    r2 = [
        dict(qid="Q1", lang="en", display_order=1, val="a2"),
        dict(qid="Q1", lang="en", display_order=2, val="b"),
    ]
    c = t.merge_insert(make_tbl(r2), clock=200)
    assert c["updated"] == 2 and c["inserted"] == 0
    assert c["deleted"] == 1  # tail prune: display_order 3 gone
    after = t.read_all().to_pandas().set_index(["qid", "lang", "display_order"])

    # stable row identity + insert-only creation stamp (verify_inplace_upsert)
    assert after.loc[("Q1", "en", 1), "_row_id"] == before.loc[("Q1", "en", 1), "_row_id"]
    assert after.loc[("Q1", "en", 1), "_dat_creat"] == 100
    assert after.loc[("Q1", "en", 1), "val"] == "a2"
    # untouched group unaffected
    assert after.loc[("Q2", "fr", 1), "val"] == "z"
    # no duplicates on the key
    assert after.index.is_unique
    assert ("Q1", "en", 3) not in after.index

    # empty-group delete branch (page now has zero images)
    assert t.delete_group([("Q2", "fr")]) == 1
    final = t.read_all().to_pandas()
    assert set(final.qid) == {"Q1"}


def test_keyed_table_idempotent_replay(tmp_path):
    t = KeyedTable(str(tmp_path / "tbl"), SCHEMA, key=["qid", "lang", "display_order"],
                   n_partitions=2, prune_group=["qid", "lang"])
    rows = [dict(qid=f"Q{i}", lang="en", display_order=1, val=str(i)) for i in range(20)]
    t.merge_insert(make_tbl(rows), clock=1)
    snap1 = t.read_all().to_pandas().sort_values("qid").reset_index(drop=True)
    t.merge_insert(make_tbl(rows), clock=2)  # replay (resume overlap)
    snap2 = t.read_all().to_pandas().sort_values("qid").reset_index(drop=True)
    assert snap1.equals(snap2)  # byte-identical incl. _row_id/_dat_creat


def test_seen_set_exact_after_cuckoo_overflow(tmp_path):
    """ADVICE r1: once the cuckoo overflows (insert fails after MAX_KICKS),
    membership must fall back to the exact store — a seen URL must never
    report unseen (false negative)."""
    # tiny cuckoo with growth capped at its RAM ceiling -> guaranteed overfull
    s = SeenSet(capacity=1 << 4, max_filter_capacity=1 << 4)
    rng = np.random.default_rng(11)
    keys = rng.integers(1, 2**63, size=5000).astype(np.uint64)
    assert s.insert_batch(keys).all()
    assert not s._cuckoo_complete  # the overflow actually happened
    assert s.contains_batch(keys).all()  # exact despite cuckoo misses
    assert not s.insert_batch(keys).any()
    fresh = rng.integers(1, 2**63, size=5000).astype(np.uint64)
    fresh = fresh[~np.isin(fresh, keys)]
    assert not s.contains_batch(fresh).any()


def test_seen_set_compaction_keeps_exactness():
    """Inserts far beyond _DELTA_MAX force sorted-array compaction; the
    first-wins contract must hold across the delta/sorted boundary."""
    s = SeenSet(capacity=1 << 16)
    rng = np.random.default_rng(12)
    a = rng.integers(1, 2**63, size=20000).astype(np.uint64)
    a = np.unique(a)
    assert s.insert_batch(a).all()
    assert len(s._sorted) > 0  # compaction ran
    assert not s.insert_batch(a).any()
    assert s.contains_batch(a).all()


def test_seen_set_spill_runs_memory_budget(tmp_path):
    """10^10-URL path: with a spill dir and a tiny resident budget the exact
    store overflows to sorted on-disk runs (memmap probes), compaction
    bounds the run count, and first-wins/membership stay EXACT."""
    import os

    s = SeenSet(capacity=1 << 16, spill_dir=str(tmp_path / "spill"),
                max_resident_keys=10_000, max_runs=2)
    rng = np.random.default_rng(21)
    chunks = [np.unique(rng.integers(1, 2**63, size=20_000).astype(np.uint64))
              for _ in range(6)]
    seen_all = []
    for c in chunks:
        fresh = c[~np.isin(c, np.concatenate(seen_all))] if seen_all else c
        assert s.insert_batch(fresh).all()
        seen_all.append(fresh)
        assert s.resident_keys() <= 10_000 + s._DELTA_MAX + 20_000  # bounded
    allk = np.concatenate(seen_all)
    assert len(s._runs) >= 1  # spilling actually happened
    assert len(s._runs) <= 2 + 1  # compaction bounds run count
    assert s.contains_batch(allk).all()  # exact across RAM + runs
    assert not s.insert_batch(allk).any()  # first-wins exact
    other = rng.integers(1, 2**63, size=5000).astype(np.uint64)
    other = other[~np.isin(other, allk)]
    assert not s.contains_batch(other).any()
    # run files really are on disk
    files = os.listdir(tmp_path / "spill")
    assert any(f.startswith("run-") for f in files)


def test_seen_set_autogrow_stays_fast_and_exact():
    """480k-corpus regression: at ~1M keys the cuckoo must auto-grow
    (rebuild at 2x) instead of saturating into the 500-kick Python
    eviction loop per insert (drv_seen was 352s at 930k keys pre-fix)."""
    import time

    s = SeenSet(capacity=1 << 16)
    rng = np.random.default_rng(31)
    chunks = []
    t0 = time.time()
    for _ in range(20):
        c = rng.integers(1, 2**63, size=50_000).astype(np.uint64)
        s.insert_batch(c)
        chunks.append(c)
    assert time.time() - t0 < 15  # ~1.5s on the bench box; minutes pre-fix
    assert s._cuckoo_complete  # grew before overflow, fast path intact
    allk = np.unique(np.concatenate(chunks))
    assert len(s) == len(allk)
    assert s.contains_batch(allk).all()
    assert not s.insert_batch(allk).any()


def test_compaction_vectorized_merge_exact(tmp_path):
    """The vectorized k-way merge must equal a global sort+unique of all
    spilled keys, across MANY rounds (chunk smaller than the runs) and
    with heavy cross-run duplication."""
    s = SeenSet(capacity=1 << 12, spill_dir=str(tmp_path / "sp"),
                max_resident_keys=1, max_runs=100)  # no auto-compaction
    rng = np.random.default_rng(3)
    all_keys = []
    for _ in range(5):
        k = rng.integers(1, 5000, size=800).astype(np.uint64)  # dup-heavy
        s.insert_batch(k)
        all_keys.append(k)
    assert len(s._runs) >= 5
    s._compact_runs(chunk_keys=64)  # force multi-round merging
    assert len(s._runs) == 1
    got = np.asarray(s._runs[0])
    want = np.unique(np.concatenate(all_keys))
    assert np.array_equal(got, want)
    assert s.contains_batch(want).all()
