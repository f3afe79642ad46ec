"""Constant-memory cardinality / frequency sketches over token streams.

Both sketches here are the bounded-state summaries a 100-TB corpus pass
actually needs — "how many distinct tokens" and "which tokens are hot"
without a vocabulary-sized shuffle — and both are built INTEGER-EXACT so
a DuckDB oracle can recompute the sketch bit-for-bit (the same design
rule as the q21 LSH planes / q23 grid-quantized k-means):

- :func:`hll_distinct` — HyperLogLog (Flajolet et al. 2007) with m=256
  registers.  hash = md5-low-64 (DuckDB ``md5_number_upper``); bucket =
  low 8 bits; rho = 57 - bit_length(h >> 8) (h>>8 == 0 → 57, the
  saturated register).  The raw estimate is evaluated as ONE integer
  expression (exact rational alpha, power-of-two common denominator),
  so Ray and SQL agree to the last digit.
- :func:`count_min_cells` — a Count-Min sketch (Cormode & Muthukrishnan
  2005), d=4 rows x w=1024 counters, row hash r of token t =
  md5-low-64(f"{r}:{t}") % w.  Cells are SUMS, hence order-independent
  and mergeable: per-batch partial 4x1024 arrays, one O(d*w)-row shuffle.

Scale shape: per-batch partial state is a fixed-size array regardless of
batch width; the merge shuffle is O(d*w * n_batches) rows of 3 int64s —
independent of corpus size.  Nothing token-shaped ever reaches the
driver; only the (constant-size) sketch does.

Reference scope: the reference engine keeps EN/FR page counters and
frequency reports (wikipedia_crawler.py run counters; SURVEY §2.7);
these sketches are the bounded-memory generalization of those counters
for corpus-scale streams.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from wikicrawl.functions import dedup as F_dedup

# ------------------------------------------------------------------ HLL

HLL_P = 8                 # 2^8 = 256 registers
HLL_M = 1 << HLL_P
HLL_RHO_MAX = 64 - HLL_P + 1   # h>>P == 0 -> saturated register (57)
# alpha_256 = 0.7213 / (1 + 1.079/256) as the EXACT rational
# 7213/10000 * 256000/257079 = 1846528/2570790 — both sides use this.
HLL_ALPHA_NUM = 1846528
HLL_ALPHA_DEN = 2570790


def _hll_batch_registers(tokens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rho) partial-max registers for one batch's UNIQUE tokens.

    rho is a pure function of the token, so max-over-occurrences equals
    max-over-distinct — duplicate tokens need no dedup pass at all."""
    hs = np.array([F_dedup.token_hash_u64(t) for t in tokens],
                  dtype=np.uint64)
    bucket = (hs & np.uint64(HLL_M - 1)).astype(np.int64)
    w = (hs >> np.uint64(HLL_P)).astype(np.uint64)
    # bit_length via float log2 is unsafe at boundaries; 56-bit values
    # get an exact integer bit_length from the byte view
    bl = np.zeros(len(w), dtype=np.int64)
    nz = w != 0
    if nz.any():
        wv = w[nz]
        # exact bit_length (float log2 is unsafe at power-of-two
        # boundaries): highest set bit via the descending shift matrix
        bl[nz] = 64 - ((wv[:, None] >> np.arange(63, -1, -1,
                                                 dtype=np.uint64)[None, :])
                       != 0).argmax(axis=1)
    rho = (64 - HLL_P + 1) - bl          # w==0 -> bl 0 -> rho 57
    regs = np.zeros(HLL_M, dtype=np.int64)
    np.maximum.at(regs, bucket, rho)
    nzr = np.flatnonzero(regs)
    return nzr, regs[nzr]


def hll_registers(ds, text_col: str = "text"):
    """Dataset[text] -> the 256 merged HLL registers as a small pandas
    frame (bucket, rho_max), empty registers absent.  One constant-size
    emission per batch, one O(m x batches) groupby-max."""

    def partial(t: pa.Table) -> pa.Table:
        toks: list[str] = []
        for txt in t[text_col].to_pylist():
            toks.extend(F_dedup.tokenize(txt))
        if not toks:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64()),
                             "__b": pa.array([], pa.int64())})
        uniq = np.unique(np.array(toks, dtype=object))
        b, r = _hll_batch_registers(uniq)
        return pa.table({"bucket": pa.array(b), "rho": pa.array(r),
                         "__b": pa.array(b % 16)})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("bucket", sort=False)["rho"].max()
                .rename("rho_max").reset_index())

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("__b").map_groups(merge, batch_format="pandas")
            .to_pandas())


def hll_estimate(registers: pd.DataFrame) -> int:
    """Raw HLL estimate from the merged registers, evaluated in exact
    integer arithmetic: with R = max rho and S = sum over ALL m registers
    of 2^(R - M_j) (empty register -> M_j = 0),

        E = (alpha_num * m^2 * 2^R) // (alpha_den * S).

    No small/large-range corrections — the operator's contract is the
    raw estimator, identically defined in the SQL twin."""
    m_j = np.zeros(HLL_M, dtype=np.int64)
    if len(registers):
        m_j[registers["bucket"].to_numpy(np.int64)] = (
            registers["rho_max"].to_numpy(np.int64))
    r_top = int(m_j.max())
    s = sum(1 << (r_top - int(v)) for v in m_j)
    return (HLL_ALPHA_NUM * HLL_M * HLL_M * (1 << r_top)) // (
        HLL_ALPHA_DEN * s)


# ------------------------------------------------------------ Count-Min

CMS_D = 4
CMS_W = 1024


def cms_row_hash(row: int, token: str) -> int:
    """Column of ``token`` in sketch row ``row`` — md5-low-64 of the
    salted string, mod w (DuckDB: md5_number_upper(r || ':' || tok) % w)."""
    return F_dedup.token_hash_u64(f"{row}:{token}") % CMS_W


def count_min_cells(ds, text_col: str = "text") -> np.ndarray:
    """Dataset[text] -> the full d x w Count-Min array (int64).  Each
    batch folds its token counts into a LOCAL d x w array (4 salted md5s
    per UNIQUE batch token) and emits the nonzero cells; one coarse
    groupby-sum merges them.  Driver state = d*w int64s, constant."""

    def partial(t: pa.Table) -> pa.Table:
        toks: list[str] = []
        for txt in t[text_col].to_pylist():
            toks.extend(F_dedup.tokenize(txt))
        cells = np.zeros((CMS_D, CMS_W), dtype=np.int64)
        if toks:
            uniq, cnt = np.unique(np.array(toks, dtype=object),
                                  return_counts=True)
            for r in range(CMS_D):
                cols = np.array([cms_row_hash(r, t_) for t_ in uniq],
                                dtype=np.int64)
                np.add.at(cells[r], cols, cnt.astype(np.int64))
        rr, cc = np.nonzero(cells)
        return pa.table({
            "r": pa.array(rr.astype(np.int64)),
            "c": pa.array(cc.astype(np.int64)),
            "cnt": pa.array(cells[rr, cc]),
            "__b": pa.array(((rr.astype(np.int64) * CMS_W + cc) % 16)),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby(["r", "c"], sort=False)["cnt"].sum()
                .reset_index())

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("__b").map_groups(merge, batch_format="pandas")
              .to_pandas())
    cells = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    cells[merged["r"].to_numpy(np.int64),
          merged["c"].to_numpy(np.int64)] = merged["cnt"].to_numpy(np.int64)
    return cells


def cms_estimate(cells: np.ndarray, token: str) -> int:
    """Point estimate = min over rows of the token's cell (always >= the
    true count — the CMS one-sided error guarantee, asserted in tests)."""
    return int(min(cells[r, cms_row_hash(r, token)] for r in range(CMS_D)))


def hll_grouped_registers(ds, group_col: str, key_col: str,
                          n_parts: int = 16):
    """Per-GROUP HyperLogLog registers over an int64 key column — the
    grouped form of :func:`hll_registers` (distinct users per event
    type, distinct URLs per host, ...). Key hash = md5-low-64 of the
    DECIMAL STRING of the key (DuckDB: ``md5_number_upper(CAST(k AS
    VARCHAR))``). Emits per-batch partial (group, bucket, rho) maxima —
    at most groups x 256 rows per batch regardless of batch size — and
    merges them with one coarse groupby-max. Returns a pandas frame
    (group, bucket, rho_max)."""

    def partial(t: pa.Table) -> pa.Table:
        gv = t[group_col].to_pylist()
        kv = t[key_col].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"g": gv, "k": kv})
        out_g: list = []
        out_b: list[np.ndarray] = []
        out_r: list[np.ndarray] = []
        for g, sub in df.groupby("g", sort=False):
            uniq = np.unique(sub["k"].to_numpy())
            b, r = _hll_batch_registers(
                np.array([str(int(x)) for x in uniq], dtype=object))
            out_g.extend([g] * len(b))
            out_b.append(b)
            out_r.append(r)
        if not out_g:
            return pa.table({"g": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64()),
                             "__b": pa.array([], pa.int64())})
        b = np.concatenate(out_b)
        return pa.table({
            "g": pa.array([str(x) for x in out_g], pa.string()),
            "bucket": pa.array(b),
            "rho": pa.array(np.concatenate(out_r)),
            "__b": pa.array(b % 16),
        })

    def merge(gr: pd.DataFrame) -> pd.DataFrame:
        return (gr.groupby(["g", "bucket"], sort=False)["rho"].max()
                .rename("rho_max").reset_index())

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("__b").map_groups(merge, batch_format="pandas")
            .to_pandas())
