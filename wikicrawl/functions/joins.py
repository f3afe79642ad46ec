"""Join strategies (SURVEY §2.6): broadcast lookup, partitioned hash join,
as-of join — each documenting its partitioning assumption.

- broadcast_join: small side ``ray.put`` once, pandas merge per batch inside
  ``map_batches`` — zero shuffle; correct whenever the small side fits a
  worker's heap (dimension tables, vocab, blocklists).
- hash_join: both sides large — add ``bucket = hash(key) % B`` to both,
  co-group per bucket, merge bucket-wise. The shuffle moves each side once;
  skew is handled by salting hot keys into sub-buckets upstream.
- asof_join: per-key ``merge_asof`` inside ``groupby(key).map_groups`` after
  in-group ts sort — assumes key-partitioned grouping (the groupby provides
  it) and per-group memory bounded by the key's history.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


class BroadcastJoiner:
    """map_batches callable: left batch -> merged with broadcast right df."""

    def __init__(self, right_ref, on, how: str = "inner"):
        import ray

        self.right: pd.DataFrame = ray.get(right_ref)
        self.on = on
        self.how = how

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(self.right, on=self.on, how=self.how)


def broadcast_join(left_ds, right_df: pd.DataFrame, on, how: str = "inner"):
    import ray

    ref = ray.put(right_df)
    return left_ds.map_batches(
        BroadcastJoiner,
        fn_constructor_args=(ref, on, how),
        batch_format="pandas",
        concurrency=2,
        num_cpus=0.5,
    )


def _bucket_of(values, n_buckets: int) -> np.ndarray:
    """Stable buckets; hashes unique values only (keys repeat heavily)."""
    codes, uniques = pd.factorize(np.asarray(values, dtype=object))
    uh = np.empty(len(uniques), dtype=np.int64)
    for i, v in enumerate(uniques):
        h = hashlib.blake2b(str(v).encode(), digest_size=8).digest()
        uh[i] = int.from_bytes(h, "little") % n_buckets
    if len(codes) == 0:
        return codes.astype(np.int64)
    return uh[codes]


def hash_join(left_ds, right_ds, on: str, n_buckets: int = 16, how: str = "inner"):
    """Partitioned hash join of two Datasets on one key column.

    Both sides are tagged with ``bucket = hash(key) % B`` and unioned into a
    single groupby (ONE shuffle total); schemas are aligned for the union
    and each side's dtypes restored inside the bucket join."""
    def _dtypes(ds):
        """Column dtypes from dataset metadata (no data execution). Handles
        both Arrow schemas and pandas block schemas."""
        import pyarrow as pa

        sch = ds.schema()
        out = {}
        for n, t in zip(sch.names, sch.types):
            if isinstance(t, pa.DataType):
                empty = pa.schema([pa.field(n, t)]).empty_table().to_pandas()
                out[n] = str(empty.dtypes[n])
            else:
                out[n] = str(np.dtype(t))
        return out

    l_dtypes = _dtypes(left_ds)
    r_dtypes = _dtypes(right_ds)
    all_cols = list(dict.fromkeys(list(l_dtypes) + list(r_dtypes)))

    def tag(df: pd.DataFrame, side: str) -> pd.DataFrame:
        df = df.copy()
        for c in all_cols:
            if c not in df.columns:
                df[c] = pd.Series([None] * len(df), dtype="object")
        df = df[all_cols]
        df["__bucket"] = _bucket_of(df[on].tolist(), n_buckets)
        df["__side"] = side
        return df

    left = left_ds.map_batches(lambda d: tag(d, "l"), batch_format="pandas")
    right = right_ds.map_batches(lambda d: tag(d, "r"), batch_format="pandas")
    both = left.union(right)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"][list(l_dtypes)].astype(l_dtypes)
        r = g[g["__side"] == "r"][list(r_dtypes)].astype(r_dtypes)
        if len(l) == 0 or (len(r) == 0 and how == "inner"):
            return pd.DataFrame()
        return l.merge(r, on=on, how=how)

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def asof_join_groups(group: pd.DataFrame, left_ts: str, right_ts: str,
                     left_cols: list[str], right_cols: list[str]) -> pd.DataFrame:
    """One key group containing both sides (tagged __side l/r): for each left
    row, the latest right row with right_ts <= left_ts."""
    l = group[group["__side"] == "l"][left_cols + [left_ts]].sort_values(left_ts, kind="mergesort")
    r = group[group["__side"] == "r"][right_cols + [right_ts]].sort_values(right_ts, kind="mergesort")
    if len(l) == 0:
        return pd.DataFrame()
    merged = pd.merge_asof(l, r, left_on=left_ts, right_on=right_ts,
                           direction="backward")
    return merged
