"""Streaming-shaped operators: gap-based sessionization.

Sessionization (the classic stateful streaming op — "split each user's
event stream into sessions separated by > gap of inactivity") maps onto
Ray Data as ONE hash-partition shuffle: sessions are key-local, and a
bucket holds whole key groups, so every session is computed inside
exactly one vectorized per-bucket kernel — no cross-partition state, no
per-key Python. The same gap-islands semantics are plain SQL (LAG +
windowed SUM), so the operator has an exact DuckDB oracle (q30).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from wikicrawl.functions.joins import bucket_of


def _ts_i64(series: pd.Series) -> np.ndarray:
    v = series.to_numpy()
    if np.issubdtype(v.dtype, np.datetime64):
        return v.astype("datetime64[us]").astype(np.int64)
    return v.astype(np.int64)


def sessionize(ds, key_col: str, ts_col: str, gap_us: int,
               n_buckets: int = 32):
    """Gap-based sessions per key -> Dataset of
    (key, session_start_us, session_end_us, n_events).

    A new session starts at the first event of a key or when the gap to
    the previous event is STRICTLY greater than ``gap_us`` (ties at
    exactly gap_us stay in the session — matches the SQL oracle's
    ``>``). Per bucket: one lexsort by (key, ts), boundary mask where the
    key changes or the gap exceeds gap_us, sessions read off the
    boundary indices — fully vectorized. Partitioning assumption: one
    bucket's rows fit a worker (hash keying keeps key groups whole, so
    results are independent of n_buckets)."""
    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__bucket", pa.array(bucket_of(t[key_col], n_buckets)))

    def bucket_sessions(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key_col].to_numpy()
        t = _ts_i64(g[ts_col])
        if len(k) == 0:
            return pd.DataFrame({
                key_col: k,
                "session_start_us": t[:0],
                "session_end_us": t[:0],
                "n_events": np.array([], dtype=np.int64),
            })
        order = np.lexsort((t, k))
        k, t = k[order], t[order]
        new = np.empty(len(k), dtype=bool)
        new[0] = True
        new[1:] = (k[1:] != k[:-1]) | ((t[1:] - t[:-1]) > gap_us)
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(k))
        return pd.DataFrame({
            key_col: k[starts],
            "session_start_us": t[starts],
            "session_end_us": t[ends - 1],
            "n_events": (ends - starts).astype(np.int64),
        })

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(bucket_sessions, batch_format="pandas")
    )
