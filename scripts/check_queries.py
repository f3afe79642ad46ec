"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle SQL side-by-side, compare row count, schema (column
names) and values (column-sorted, row-sorted)."""

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run(sf_dir: str, only=None):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from wikicrawl.queries import ORACLE_SQL, QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        got = fn(sf_dir)
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        sql = ORACLE_SQL.get(name)
        if sql is None:
            print(f"{name}: rows-only ({len(got)} rows) OK")
            continue
        want = con.execute(sql).fetchdf()
        status = compare(name, got, want)
        if status:
            failures.append((name, status))
            print(f"{name}: FAIL — {status}")
        else:
            print(f"{name}: OK ({len(got)} rows)")
    return failures


def compare(name, got: pd.DataFrame, want: pd.DataFrame):
    if sorted(got.columns) != sorted(want.columns):
        return f"columns {sorted(got.columns)} vs {sorted(want.columns)}"
    if len(got) != len(want):
        return f"rows {len(got)} vs {len(want)}"
    g = got[sorted(got.columns)].copy()
    w = want[sorted(want.columns)].copy()
    sort_cols = list(g.columns)

    def normcol(s):
        if s.dtype == object:
            return s.astype(str)
        return s

    g = g.apply(normcol).sort_values(sort_cols).reset_index(drop=True)
    w = w.apply(normcol).sort_values(sort_cols).reset_index(drop=True)
    for c in g.columns:
        a, b = g[c], w[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            ok = np.allclose(a.astype(float).fillna(-1e18),
                             b.astype(float).fillna(-1e18), rtol=0, atol=1e-9)
        else:
            try:
                ok = (a.fillna(-1) == b.fillna(-1)).all()
            except Exception:
                ok = (a.astype(str) == b.astype(str)).all()
        if not ok:
            bad = np.flatnonzero(~(a.astype(str) == b.astype(str)).to_numpy())[:3]
            return f"col {c} differs at rows {bad.tolist()}: {a.iloc[bad].tolist()} vs {b.iloc[bad].tolist()}"
    return None


if __name__ == "__main__":
    import time

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    t0 = time.time()
    fails = run(sf_dir, only)
    print(f"TOTAL {time.time() - t0:.1f} s wall "
          f"({'subset' if only else 'all queries'}, {sf_dir})")
    import ray

    ray.shutdown()
    sys.exit(1 if fails else 0)
