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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def broadcast_join(left_ds, right_df: pd.DataFrame, on, how: str = "inner"):
    """Small side ``ray.put`` once; STATELESS tasks merge per batch against
    the worker-global cached copy (no actor pool, no spawn cost — the
    broadcast is fetched zero-copy once per worker)."""
    import ray

    from wikicrawl.functions._cache import broadcast_cached

    ref = ray.put(right_df)

    def merge_batch(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(broadcast_cached(ref), on=on, how=how)

    return left_ds.map_batches(merge_batch, batch_format="pandas")


def bucket_of(arr: "pa.ChunkedArray | pa.Array | np.ndarray", n_buckets: int) -> np.ndarray:
    """Stable vectorized bucket assignment: pandas' C siphash over the key
    column (deterministic across processes via a fixed hash_key), mod B.
    No per-value Python hashing — integer keys never leave numpy."""
    if isinstance(arr, (pa.ChunkedArray, pa.Array)):
        arr = arr.to_pandas().to_numpy()
    # hash_key must be EXACTLY 16 bytes (pandas siphash contract; only
    # consulted for object/string keys — int keys mix without it)
    h = pd.util.hash_array(np.asarray(arr), hash_key="wikicrawl0hjoin1",
                           categorize=True)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def hash_join(left_ds, right_ds, on: str, n_buckets: int = 16, how: str = "inner"):
    """Partitioned hash join of two Datasets on one key column.

    Arrow-native: both sides are tagged with ``bucket = hash(key) % B``
    (vectorized siphash) plus an int8 side marker, null-padded to a shared
    Arrow schema (typed nulls, never object dtype), and unioned into a
    single groupby (ONE shuffle total). Each bucket group splits by side as
    a zero-copy Arrow filter and merges with pandas — the null-padded
    columns are dropped per side BEFORE pandas conversion so dtypes survive.
    Skewed keys: salt hot keys into sub-buckets upstream (partitioning
    assumption: one bucket's rows fit one worker's heap)."""
    def _arrow_schema(ds) -> pa.Schema:
        sch = ds.schema()
        base = getattr(sch, "base_schema", None)
        if isinstance(base, pa.Schema):
            return base
        # PandasBlockSchema: numpy dtypes; object columns map to string
        def conv(t):
            if isinstance(t, pa.DataType):
                return t
            dt = np.dtype(t)
            return pa.string() if dt == object else pa.from_numpy_dtype(dt)

        return pa.schema([(n, conv(t)) for n, t in zip(sch.names, sch.types)])

    l_schema = _arrow_schema(left_ds)
    r_schema = _arrow_schema(right_ds)
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    fields = {n: l_schema.field(n).type for n in l_cols}
    for n in r_cols:
        fields.setdefault(n, r_schema.field(n).type)
    all_cols = list(fields)

    def _pad(n: int, typ: pa.DataType) -> pa.Array:
        # pad the other side's columns with typed ZEROS, never nulls:
        # if an empty pandas block slips into the unioned stream (e.g. a
        # from_pandas input), Ray unifies the whole shuffle to pandas
        # blocks, and an int64 column WITH nulls degrades to float64 —
        # silently mangling the low bits of 64-bit keys/hashes (observed:
        # joined simhash values off by <400). Pads are dropped per side
        # before the merge, so their value is never read.
        if pa.types.is_integer(typ) or pa.types.is_boolean(typ) \
                or pa.types.is_floating(typ):
            return pa.array(np.zeros(n, dtype=np.int8), type=typ)
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            return pa.array([""] * n, type=typ)
        return pa.nulls(n, type=typ)  # nested types: object path, no
                                      # numeric coercion to protect

    def tag(side: int):
        def _tag(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = [
                t[c] if c in t.column_names else _pad(n, fields[c])
                for c in all_cols
            ]
            cols.append(pa.array(bucket_of(t[on], n_buckets)))
            cols.append(pa.array(np.full(n, side, dtype=np.int8)))
            return pa.table(cols, names=all_cols + ["__bucket", "__side"])

        return _tag

    both = left_ds.map_batches(tag(0), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1), batch_format="pyarrow")
    )

    out_cols = l_cols + [c for c in r_cols if c != on]
    out_schema = pa.schema([(c, fields[c]) for c in out_cols])

    def join_bucket(g: pa.Table) -> pa.Table:
        side = g["__side"]
        l = g.filter(pc.equal(side, 0)).select(l_cols).to_pandas()
        r = g.filter(pc.equal(side, 1)).select(r_cols).to_pandas()
        merged = l.merge(r, on=on, how=how)
        if how != "inner":
            return merged[out_cols]  # outer nulls break int coercion
        return pa.Table.from_pandas(merged[out_cols], schema=out_schema,
                                    preserve_index=False)

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def range_join_count_sum(left_ds, right_ds, left_key: str, right_key: str,
                         left_ts: str, right_ts: str, window_us: int,
                         sum_col: str, n_buckets: int = 32,
                         count_name: str = "n_events",
                         sum_name: str = "sum_val"):
    """Distributed RANGE (interval) join with fused aggregation: for each
    left row, count and sum over right rows of the same key with
    ``left_ts <= right_ts < left_ts + window_us`` — the "events within N
    days of the order" shape. A naive expanding join materializes every
    matched pair; this never does: the aggregate is computed from PREFIX
    SUMS inside each bucket, so output size == left size regardless of
    match multiplicity.

    Plan: both sides tagged ``bucket = hash(key) % B``, unioned, ONE
    groupby (single shuffle — same plan shape as :func:`asof_join`). Per
    bucket the kernel is fully vectorized (no per-key loop): right rows
    sort by (key, ts) once; (key, ts) pairs map to a RANK-SPACE composite
    ``key_rank * M + ts_rank`` (dense ranks, so the composite fits int64
    for any bucket up to ~3e9 rows — asserted); the window's [start, end)
    positions come from two np.searchsorted probes and the aggregates from
    prefix-sum differences. Keys absent from the right produce count 0 —
    LEFT-join semantics. Partitioning assumption: one bucket's rows fit a
    worker; raise ``n_buckets`` for bigger inputs (hash keying keeps whole
    key groups bucket-local, so results are unchanged)."""
    l_schema = left_ds.schema().base_schema
    r_schema = right_ds.schema().base_schema
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    fields = {n: l_schema.field(n).type for n in l_cols}
    for n in r_cols:
        fields.setdefault(n, r_schema.field(n).type)
    all_cols = list(fields)

    def tag(side: int, key_col: str):
        def _tag(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = [
                t[c] if c in t.column_names else pa.nulls(n, type=fields[c])
                for c in all_cols
            ]
            cols.append(pa.array(bucket_of(t[key_col], n_buckets)))
            cols.append(pa.array(np.full(n, side, dtype=np.int8)))
            return pa.table(cols, names=all_cols + ["__bucket", "__side"])

        return _tag

    both = left_ds.map_batches(tag(0, left_key), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1, right_key), batch_format="pyarrow")
    )

    def _ts_i64(series: pd.Series) -> np.ndarray:
        v = series.to_numpy()
        if np.issubdtype(v.dtype, np.datetime64):
            return v.astype("datetime64[us]").astype(np.int64)
        return v.astype(np.int64)

    def join_bucket(g: pa.Table) -> pd.DataFrame:
        side = g["__side"]
        l = g.filter(pc.equal(side, 0)).select(l_cols).to_pandas()
        r = g.filter(pc.equal(side, 1)).select(r_cols).to_pandas()
        if len(l) == 0:
            out = l.copy()
            out[count_name] = np.array([], dtype=np.int64)
            out[sum_name] = np.array([], dtype=np.int64)
            return out
        lk = l[left_key].to_numpy()
        lt = _ts_i64(l[left_ts])
        if len(r) == 0:
            out = l.copy()
            out[count_name] = np.zeros(len(l), dtype=np.int64)
            out[sum_name] = np.zeros(len(l), dtype=np.int64)
            return out
        rk = r[right_key].to_numpy()
        rt = _ts_i64(r[right_ts])
        rs = r[sum_col].to_numpy().astype(np.int64)
        order = np.lexsort((rt, rk))
        rk, rt, rs = rk[order], rt[order], rs[order]
        uniq_keys = np.unique(rk)
        uniq_ts = np.unique(rt)
        M = np.int64(len(uniq_ts) + 1)
        kr_r = np.searchsorted(uniq_keys, rk)
        assert int(kr_r[-1] if len(kr_r) else 0) * int(M) < (1 << 62), (
            "range_join bucket too large for rank-space composite; "
            "raise n_buckets")
        comp_r = kr_r * M + np.searchsorted(uniq_ts, rt)
        csum = np.concatenate(([0], np.cumsum(rs)))
        kr_l = np.searchsorted(uniq_keys, lk)
        present = kr_l < len(uniq_keys)
        safe_kr = np.minimum(kr_l, len(uniq_keys) - 1)
        present &= uniq_keys[safe_kr] == lk
        tsr_lo = np.searchsorted(uniq_ts, lt)
        tsr_hi = np.searchsorted(uniq_ts, lt + np.int64(window_us))
        start = np.searchsorted(comp_r, safe_kr * M + tsr_lo)
        end = np.searchsorted(comp_r, safe_kr * M + tsr_hi)
        n = np.where(present, end - start, 0).astype(np.int64)
        s = np.where(present, csum[end] - csum[start], 0).astype(np.int64)
        out = l.copy()
        out[count_name] = n
        out[sum_name] = s
        return out

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


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


def asof_join(left_ds, right_ds, left_key: str, right_key: str,
              left_ts: str, right_ts: str, n_buckets: int = 32,
              right_prep=None):
    """Distributed as-of join: for each left row, the latest right row of
    the same key with right_ts <= left_ts.

    Both sides are tagged with ``bucket = hash(key) % B`` and unioned into
    ONE groupby (single shuffle, same plan shape as :func:`hash_join`);
    each bucket — holding MANY whole key groups — runs a single vectorized
    ``pd.merge_asof(..., by=key)``: no per-key Python, no per-key pandas
    frames. Partitioning assumption: one bucket's rows fit a worker.

    ``right_prep`` (optional, ``DataFrame -> DataFrame``) runs on each
    bucket's right side BEFORE the merge. Because a bucket holds whole
    key groups, any per-key preparation (dedupe, filtering) fused here is
    exactly equivalent to a separate upstream shuffle aggregate — fusing
    it saves that entire all-to-all exchange."""
    l_schema = left_ds.schema().base_schema
    r_schema = right_ds.schema().base_schema
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    fields = {n: l_schema.field(n).type for n in l_cols}
    for n in r_cols:
        fields.setdefault(n, r_schema.field(n).type)
    all_cols = list(fields)

    def tag(side: int, key_col: str):
        def _tag(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = [
                t[c] if c in t.column_names else pa.nulls(n, type=fields[c])
                for c in all_cols
            ]
            cols.append(pa.array(bucket_of(t[key_col], n_buckets)))
            cols.append(pa.array(np.full(n, side, dtype=np.int8)))
            return pa.table(cols, names=all_cols + ["__bucket", "__side"])

        return _tag

    both = left_ds.map_batches(tag(0, left_key), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1, right_key), batch_format="pyarrow")
    )
    out_cols = l_cols + [c for c in r_cols if c not in l_cols]

    def join_bucket(g: pa.Table) -> pd.DataFrame:
        side = g["__side"]
        l = g.filter(pc.equal(side, 0)).select(l_cols).to_pandas()
        r = g.filter(pc.equal(side, 1)).select(r_cols).to_pandas()
        if right_prep is not None:
            r = right_prep(r)
        l = l.sort_values([left_ts, left_key], kind="mergesort")
        r = r.sort_values([right_ts, right_key], kind="mergesort")
        merged = pd.merge_asof(
            l, r, left_on=left_ts, right_on=right_ts,
            left_by=left_key, right_by=right_key, direction="backward",
        )
        return merged[[c for c in out_cols if c in merged.columns]]

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")
