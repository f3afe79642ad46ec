"""Deduplication operators for a large-scale training-data pipeline.

All Ray-Data-first over Arrow batches:

- exact dedup:      content-hash in map_batches -> groupby(hash) keep min id
                    (hash-partitioned shuffle, one representative per group)
- MinHash + LSH:    per-batch vectorized shingling -> 64 minhashes -> banded
                    signatures exploded to (band, band_hash, doc) rows ->
                    groupby band bucket -> candidate pairs -> exact Jaccard
                    verification (the sketch is mergeable: the shuffle moves
                    only signatures, never documents)
- SimHash:          64-bit weighted-token fingerprint per doc; near-dups =
                    identical simhash (or small Hamming distance via probing
                    permuted prefix buckets)
- n-gram Jaccard:   exact verification kernel used by the LSH stage, also
                    exposed standalone for small candidate sets
- embedding cosine: blocked numpy matmul within label partitions

Determinism: all hash seeds are fixed; outputs are sorted pair lists.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------- minhash

N_HASHES = 64
N_BANDS = 16  # 16 bands x 4 rows
ROWS_PER_BAND = N_HASHES // N_BANDS
_MERSENNE = (1 << 61) - 1
_rng = np.random.default_rng(0x5EED)
# a < 2^31 and x < 2^32 keep a*x + b < 2^63: the whole (N_HASHES, n) matrix
# computes in native uint64 without overflow (fully vectorized minhash)
_A = _rng.integers(1, 1 << 31, size=N_HASHES, dtype=np.int64).astype(np.uint64)
_B = _rng.integers(0, _MERSENNE, size=N_HASHES, dtype=np.int64).astype(np.uint64)


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char shingle hashes (uint64) of a document."""
    data = text.encode("utf-8")
    if len(data) < k:
        data = data + b" " * (k - len(data))
    view = np.frombuffer(data, dtype=np.uint8)
    n = len(view) - k + 1
    # polynomial rolling hash over k-byte windows, vectorized
    weights = np.power(np.uint64(257), np.arange(k, dtype=np.uint64),
                       dtype=np.uint64)
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        acc += view[j : j + n].astype(np.uint64) * weights[j]
    return np.unique(acc)


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    """(N_HASHES,) uint64 signature via universal hashing a*x+b mod p,
    computed as one vectorized (N_HASHES, n) matrix (no per-hash loop)."""
    if len(shingles) == 0:
        return np.zeros(N_HASHES, dtype=np.uint64)
    x32 = (shingles.astype(np.uint64) & np.uint64(0xFFFFFFFF))[None, :]
    mat = (_A[:, None] * x32 + _B[:, None]) % np.uint64(_MERSENNE)
    return mat.min(axis=1)


def minhash_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Docs -> exploded (band, band_hash, id) rows for the LSH groupby."""
    ids, bands, bhashes = [], [], []
    for doc_id, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
        sig = minhash_signature(char_shingles(text))
        for b in range(N_BANDS):
            seg = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
            h = hashlib.blake2b(seg.tobytes(), digest_size=8).digest()
            ids.append(doc_id)
            bands.append(b)
            bhashes.append(int.from_bytes(h, "little") >> 1)  # fits int64
    return pa.table(
        {
            "band": pa.array(bands, type=pa.int32()),
            "band_hash": pa.array(bhashes, type=pa.int64()),
            id_col: pa.array(ids),
        }
    )


def lsh_candidate_pairs(bucket_df: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    """One LSH bucket (same band+band_hash) -> unordered candidate pairs."""
    ids = sorted(set(bucket_df[id_col].tolist()))
    pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
    return pd.DataFrame(pairs, columns=["id_a", "id_b"])


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa, sb = char_shingles(text_a, k), char_shingles(text_b, k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 1.0


def minhash_lsh_dedup(ds, threshold: float = 0.8, id_col: str = "doc_id",
                      text_col: str = "text"):
    """Full near-dup pipeline -> pa.Table of verified (id_a, id_b, jac_milli).

    shingle/minhash per batch (CPU-bound, stateless) -> explode to band rows
    -> groupby bucket (the only shuffle; signatures are 24 bytes/row) ->
    candidate pairs -> dedup pairs -> exact-Jaccard verify against a
    broadcast id->text map (small side; for corpora where the text side is
    large, verification joins text back by hash bucket instead).
    """
    import ray

    sig = ds.map_batches(
        lambda t: minhash_batch(t, id_col, text_col), batch_format="pyarrow"
    )
    cand = (
        sig.groupby(["band", "band_hash"])
        .map_groups(lambda g: lsh_candidate_pairs(g, id_col), batch_format="pandas")
        .to_pandas()
    )
    cand = cand.drop_duplicates().sort_values(["id_a", "id_b"])
    texts = {
        r[id_col]: r[text_col]
        for b in ds.iter_batches(batch_format="pyarrow")
        for r in b.select([id_col, text_col]).to_pylist()
    }
    # Adversarially-similar corpora can explode the candidate set; a
    # vectorized signature-agreement estimate prunes pairs far below the
    # threshold BEFORE the exact-Jaccard verification (which memoizes
    # shingle sets per doc, never recomputing per pair).
    ids = sorted({*cand.id_a, *cand.id_b})
    pos = {d: i for i, d in enumerate(ids)}
    sig_mat = np.stack([minhash_signature(char_shingles(texts[d])) for d in ids])
    a_idx = cand.id_a.map(pos).to_numpy()
    b_idx = cand.id_b.map(pos).to_numpy()
    est = (sig_mat[a_idx] == sig_mat[b_idx]).mean(axis=1)
    keep = est >= max(0.0, threshold - 0.15)
    shingle_cache: dict = {}

    def sh(d):
        s = shingle_cache.get(d)
        if s is None:
            s = shingle_cache[d] = char_shingles(texts[d])
        return s

    rows = []
    for a, b in cand[keep].itertuples(index=False):
        sa, sb = sh(a), sh(b)
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        j = inter / union if union else 1.0
        if j >= threshold:
            rows.append((a, b, int(round(j * 1000))))
    return pa.table(
        {
            "id_a": pa.array([r[0] for r in rows], type=pa.int64()),
            "id_b": pa.array([r[1] for r in rows], type=pa.int64()),
            "jac_milli": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------- simhash


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (blake2b token hashes)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in text.split():
        h = int.from_bytes(
            hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "little"
        )
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    val = 0
    for i in range(64):
        if acc[i] > 0:
            val |= 1 << i
    return val - (1 << 64) if val >= (1 << 63) else val


def simhash_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    hs = [simhash64(t) for t in batch[text_col].to_pylist()]
    return pa.table(
        {id_col: batch[id_col], "simhash": pa.array(hs, type=pa.int64())}
    )


# ------------------------------------------------------------- embeddings


def embedding_dup_pairs(group: pd.DataFrame, threshold: float = 0.99,
                        id_col: str = "vec_id", vec_col: str = "embedding") -> pd.DataFrame:
    """Within one partition (label group): all pairs with cosine >= threshold.
    Blocked numpy matmul in float64; sim reported in micro units (int)."""
    ids = group[id_col].to_numpy()
    mat = np.stack(group[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    sims = unit @ unit.T
    iu = np.triu_indices(len(ids), k=1)
    mask = sims[iu] >= threshold
    a, b = ids[iu[0][mask]], ids[iu[1][mask]]
    order = np.lexsort((b, a))
    return pd.DataFrame(
        {
            "id_a": np.minimum(a, b)[order],
            "id_b": np.maximum(a, b)[order],
            "sim_micro": np.round(sims[iu][mask][order] * 1e6).astype(np.int64),
        }
    )
