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


# ------------------------------------------------- global shuffle rank

SHUFFLE_BUCKET_BITS = 8  # 256 ordered range buckets


def global_shuffle_rank(ds, id_col: str = "doc_id"):
    """Deterministic GLOBAL corpus shuffle with exact contiguous ranks —
    the "randomize training order" op — as a range-partitioned two-pass
    zip-with-index (the scalable shape; a naive global row_number would
    serialize on the driver):

    - shuffle key = md5-low-64 of the id (DuckDB ``md5_number_upper``),
      compared UNSIGNED on both sides so ordering matches SQL exactly;
    - pass 1: per-batch ``bincount`` of the top ``SHUFFLE_BUCKET_BITS``
      key bits -> a 256-row reduce on the driver -> prefix offsets
      (buckets are ordered BY CONSTRUCTION: every key in bucket b sorts
      before every key in bucket b+1);
    - pass 2: ONE groupby(bucket) shuffle; each bucket sorts its own
      keys vectorized and emits ``rank = offset[bucket] + local_rank``.

    Returns a Dataset of (id_col, rank); ranks are a permutation of
    [0, n). Ties cannot occur (md5 keyed by the unique id; the id is
    still a secondary sort for belt-and-braces determinism)."""
    import ray.data  # noqa: F401  (ds is a ray Dataset)

    from wikicrawl.functions import dedup as F_dedup

    shift = np.uint64(64 - SHUFFLE_BUCKET_BITS)
    n_buckets = 1 << SHUFFLE_BUCKET_BITS

    def keyed(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        h = np.array([F_dedup.token_hash_u64(str(int(i))) for i in ids],
                     dtype=np.uint64)
        return pa.table({
            id_col: pa.array(ids),
            "__key": pa.array(h.view(np.int64)),
            "__b": pa.array((h >> shift).view(np.int64)),
        })

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")

    def bucket_counts(t: pa.Table) -> pa.Table:
        c = np.bincount(t["__b"].to_numpy(), minlength=n_buckets)
        return pa.table({"b": pa.array(np.arange(n_buckets, dtype=np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    counts = keyed_ds.map_batches(bucket_counts,
                                  batch_format="pyarrow").to_pandas()
    per_bucket = counts.groupby("b")["c"].sum().reindex(
        range(n_buckets), fill_value=0).to_numpy()
    offsets = np.concatenate([[0], np.cumsum(per_bucket)[:-1]]).astype(
        np.int64)

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["__b"].iloc[0])
        keys = g["__key"].to_numpy(np.int64).view(np.uint64)
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, keys))  # unsigned key ASC, id ASC
        return pd.DataFrame({
            id_col: ids[order],
            "rank": offsets[b] + np.arange(len(ids), dtype=np.int64),
        })

    return keyed_ds.groupby("__b").map_groups(rank_bucket,
                                              batch_format="pandas")


# ----------------------------------------------------- keyed window functions

def windowed_lag_rank(ds, key_col: str, ts_col: str, id_col: str,
                      val_col: str, n_parts: int = 32):
    """Per-key ordered WINDOW functions — ``row_number``, ``lag``-delta and
    a running sum — the other classic stateful-stream shape next to
    :func:`sessionize` (q30). Emits one row per event:

    - ``rn``        = 1-based rank within the key, ordered (ts, id);
    - ``delta_us``  = microseconds since the key's previous event (0 for
      the first — SQL ``coalesce(ts - lag(ts) OVER w, 0)``);
    - ``cum_milli`` = running sum of ``floor(value*1000 + 0.5)`` — the
      value goes integer (milli) BEFORE the cumulative sum, so the
      result is order-independent int64 (float discipline).

    Same scale shape as sessionize: windows are key-local, so ONE
    hash-partition shuffle puts whole key groups in one bucket and every
    window computes inside a single vectorized kernel (composed stable
    sort + cumcount/diff/cumsum) — no per-key Python, no global sort."""

    def part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__p", pa.array(bucket_of(t[key_col], n_parts)))

    def win(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        keys = g[key_col].to_numpy()
        ts = _ts_i64(g[ts_col])
        vm = np.floor(g[val_col].to_numpy() * 1000.0 + 0.5).astype(np.int64)
        grp = g.groupby(key_col, sort=False)
        rn = grp.cumcount().to_numpy(np.int64) + 1
        first = np.empty(len(ts), dtype=bool)
        if len(ts):
            first[0] = True
            first[1:] = keys[1:] != keys[:-1]
        prev = np.r_[np.int64(0), ts[:-1]] if len(ts) else ts
        delta = np.where(first, np.int64(0), ts - prev)
        cum = pd.Series(vm).groupby(keys, sort=False).cumsum().to_numpy(
            np.int64)
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(), key_col: keys,
            "rn": rn, "delta_us": delta, "cum_milli": cum,
        })

    return (ds.map_batches(part, batch_format="pyarrow")
            .groupby("__p").map_groups(win, batch_format="pandas"))


# ------------------------------------------------------- grouped regression

def group_linreg(ds, key_col: str, ts_col: str, val_col: str,
                 n_parts: int = 32, min_n: int = 2):
    """Per-key ordinary-least-squares TREND of a value over time — the
    grouped "ML-lite" aggregate (drift / trend detection per user, per
    host, per source). Integer-exact contract:

    - x = seconds since the KEY's first event (``(tu - min(tu)) //
      1_000_000``, int64 — centering keeps every moment small);
    - y = ``floor(value * 1000 + 0.5)`` (milli units);
    - moments n, Sx, Sy, Sxy, Sxx are plain int64 sums;
    - ``slope_micro = sign(num) * (|num| * 1_000_000 // den)`` with
      num = n*Sxy - Sx*Sy, den = n*Sxx - Sx*Sx (den > 0 whenever the
      key has >= 2 distinct x) — the sign is split out because DuckDB's
      ``//`` truncates toward zero while Python floors, and the two
      agree only for non-negative operands;
    - ``mean_y_milli = sign-split Sy // n`` likewise.

    Keys with n < min_n or den == 0 (all events in one second) are
    omitted, same as the SQL HAVING. ONE hash-partition shuffle puts
    whole key groups in one bucket; moments are vectorized per bucket;
    the final slope arithmetic runs per KEY (O(#keys) Python ints —
    num*1e6 exceeds int64 by design, arbitrary precision is the exact
    twin of the oracle's HUGEINT)."""

    def part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__p", pa.array(bucket_of(t[key_col], n_parts)))

    def reg(g: pd.DataFrame) -> pd.DataFrame:
        tu = _ts_i64(g[ts_col])
        y = np.floor(g[val_col].to_numpy() * 1000.0 + 0.5).astype(np.int64)
        keys = g[key_col].to_numpy()
        df = pd.DataFrame({"k": keys, "tu": tu, "y": y})
        gmin = df.groupby("k", sort=False)["tu"].transform("min")
        x = (df["tu"].to_numpy() - gmin.to_numpy()) // 1_000_000
        df["x"] = x
        df["xy"] = x * y
        df["xx"] = x * x
        mom = df.groupby("k", sort=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sxx=("xx", "sum")).reset_index()
        rows = []
        for k, n, sx, sy, sxy, sxx in mom.itertuples(index=False):
            n, sx, sy, sxy, sxx = (int(n), int(sx), int(sy), int(sxy),
                                   int(sxx))
            den = n * sxx - sx * sx
            if n < min_n or den == 0:
                continue
            num = n * sxy - sx * sy
            q = abs(num) * 1_000_000 // den
            slope = q if num >= 0 else -q
            qm = abs(sy) // n
            mean_y = qm if sy >= 0 else -qm
            rows.append((k, n, slope, mean_y))
        return pd.DataFrame(rows, columns=[key_col, "n", "slope_micro",
                                           "mean_y_milli"]).astype({
            key_col: np.int64, "n": np.int64, "slope_micro": np.int64,
            "mean_y_milli": np.int64})

    return (ds.map_batches(part, batch_format="pyarrow")
            .groupby("__p").map_groups(reg, batch_format="pandas"))


# ------------------------------------------------- time-decayed scores

DECAY_BUCKET_US = 86_400_000_000  # one day per half-life bucket


def time_decayed_scores(ds, key_col: str = "user_id", ts_col: str = "ts",
                        val_col: str = "value",
                        bucket_us: int = DECAY_BUCKET_US):
    """Per-key exponentially time-decayed score (half-life = one age
    bucket), integer-exact — the streaming "recency-weighted engagement"
    aggregate, computable in one pass because power-of-two decay is a
    right shift:

        ref          = max(ts) over the whole stream (pass 1)
        age(e)       = (ref - ts_e) // bucket_us          (int64)
        vm(e)        = floor(value_e * 1000)              (int64, value >= 0)
        score(key)   = sum over events: vm >> min(age, 62)

    Every step is IEEE-then-integer identical between numpy and DuckDB
    (``vm // (1 << least(age, 62))`` — floor == truncate because vm is
    non-negative by contract).

    Scale shape: pass 1 is a tiny global Max aggregate; pass 2
    pre-combines per (batch, key) with np.unique + np.add.reduceat
    inside map_batches, then ONE groupby over the partials — the shuffle
    moves O(keys x blocks) partial rows, never the event count.
    Returns a DataFrame (key, n_events, decayed_milli) sorted by key."""
    from ray.data.aggregate import Max, Sum

    ref = ds.aggregate(Max(ts_col, alias_name="m"))["m"]
    ref_us = int(pd.Timestamp(ref).value // 1000) if not isinstance(
        ref, (int, np.integer)) else int(ref)

    def partials(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(pd.Series(t[ts_col].to_pandas()))
        vm = np.floor(
            t[val_col].to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)
        # enforce the value >= 0 contract (cheap, vectorized): for
        # negative vm the >> floors while the SQL twin's integer // (on a
        # negative dividend DuckDB truncates toward zero) diverges
        # (-7 >> 1 = -4 vs -7 // 2 = -3) — fail loudly instead of
        # silently breaking oracle parity (ADVICE r4)
        if len(vm) and int(vm.min()) < 0:
            raise ValueError(
                "time_decayed_scores requires value >= 0 (milli-floored); "
                f"got min {vm.min()}")
        age = np.minimum((ref_us - ts) // bucket_us, 62)
        contrib = vm >> age
        order = np.argsort(keys, kind="stable")
        keys, contrib = keys[order], contrib[order]
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        return pa.table({
            key_col: pa.array(keys[starts], pa.int64()),
            "n_events": pa.array(np.diff(np.r_[starts, len(keys)]),
                                 pa.int64()),
            "decayed_milli": pa.array(np.add.reduceat(contrib, starts)
                                      if len(keys) else contrib[:0],
                                      pa.int64()),
        })

    out = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("decayed_milli", alias_name="decayed_milli"))
        .to_pandas()
    )
    out = out.sort_values(key_col).reset_index(drop=True)
    for c in ("n_events", "decayed_milli"):
        out[c] = out[c].astype("int64")
    return out
