"""queries() vs oracle_sql() on the driver testdata at sf0.001 — the same
comparison the driver's correctness gate runs at sf0.01."""

import duckdb
import pytest

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _compare(got, want):
    from scripts.check_queries import compare

    return compare("q", got, want)


@pytest.mark.parametrize("name", [
    "q01_pricing_summary", "q02_regex_filter", "q03_first_wins",
    "q04_anti_join", "q05_shared_frequency", "q06_staleness_order",
    "q07_keep_freshest", "q08_topk", "q09_window_tumbling",
    "q10_broadcast_join", "q11_hash_join", "q12_asof_join",
    "q13_token_stats", "q14_lang_id", "q15_quality", "q16_exact_dedup",
    "q17_minhash_pairs", "q18_simhash", "q19_embedding_dups", "q20_ann_topk",
    "q22_simhash_dups",
])
def test_query_matches_oracle(name, con, ray_session):
    from wikicrawl.queries import ORACLE_SQL, QUERIES

    got = QUERIES[name](SF)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = con.execute(ORACLE_SQL[name]).fetchdf()
    status = _compare(got, want)
    assert status is None, f"{name}: {status}"


def test_q21_recall_report(ray_session):
    """q21's oracle is a frozen expectation at the driver's sf0.01; at
    sf0.001 we assert the semantic contract instead: recall vs the exact
    q20 meets the committed floor for every query."""
    from wikicrawl.queries import IVF_RECALL_FLOOR_MILLI, QUERIES

    rep = QUERIES["q21_ann_ivf"](SF)
    assert len(rep) > 0
    assert (rep.recall_milli >= IVF_RECALL_FLOOR_MILLI).all()
    assert rep.meets_floor.all()


def test_entry_contract(ray_session):
    import __ray_entry__ as E

    ds = E.entry()
    df = ds.to_pandas()
    assert len(df) == 500
    assert set(E.oracle_sql()) <= set(E.queries())
