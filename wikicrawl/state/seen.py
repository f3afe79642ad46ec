"""URL-seen set: bloom pre-filter + cuckoo filter + exact backing store.

north_rule requires (a) a sharded cuckoo-filter URL-seen set with bloom
pre-filter keyed by canonicalized+hashed URLs, and (b) EXACT final seen-set
parity with the reference. Approximate filters alone cannot give (b) — a
cuckoo false positive would silently drop a URL. Design (SURVEY §4.2.3):

- bloom: negative -> URL definitely new (common case at the frontier's edge,
  one cache-friendly probe, no exact lookup);
- cuckoo: holds 16-bit fingerprints, supports deletes/aging, bounds the
  false-positive rate of the "maybe seen" path;
- exact backing: the inserted 64-bit hashes themselves — in RAM as a set,
  spillable to sorted uint64 parquet segments per checkpoint; consulted ONLY
  when bloom+cuckoo both say "maybe".

So the fast path is O(1) probes and the *result* is exact. Shards are
``hash % n_shards`` actors; membership/insert calls are batched per shard
(one ray call per shard per wave, not per URL).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray


class BloomFilter:
    """Plain m-bit / k-hash bloom over uint64 keys (vectorized numpy)."""

    def __init__(self, capacity: int, fp_rate: float = 0.01):
        m = max(64, int(-capacity * np.log(fp_rate) / (np.log(2) ** 2)))
        self.m = int(2 ** np.ceil(np.log2(m)))  # power of two -> mask, not mod
        self.k = max(1, int(round(self.m / max(capacity, 1) * np.log(2))))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)
        self._mask = np.uint64(self.m - 1)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        # double hashing: h1 + i*h2 (Kirsch-Mitzenmacher)
        h1 = keys
        h2 = (keys >> np.uint64(17)) | np.uint64(1)
        idx = np.empty((self.k, len(keys)), dtype=np.uint64)
        for i in range(self.k):
            idx[i] = (h1 + np.uint64(i) * h2) & self._mask
        return idx

    def add_batch(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(keys)
        word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        bit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return bit.all(axis=0).astype(bool)


class CuckooFilter:
    """Standard (2, 4) cuckoo filter with 16-bit fingerprints over uint64 keys."""

    MAX_KICKS = 500

    def __init__(self, capacity: int):
        n_buckets = max(8, int(2 ** np.ceil(np.log2(capacity / 4 * 1.1 + 1))))
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, 4), dtype=np.uint16)  # 0 = empty
        self._mask = np.uint64(n_buckets - 1)
        self._rng = np.random.default_rng(0xC0FFEE)

    def _fp(self, key: np.uint64) -> np.uint16:
        fp = np.uint16((int(key) >> 48) & 0xFFFF)
        return fp if fp != 0 else np.uint16(1)

    def _i1(self, key: int) -> int:
        return int(np.uint64(key) & self._mask)

    def _i2(self, i1: int, fp: int) -> int:
        # partial-key cuckoo: alt index = i1 xor hash(fp)
        h = (int(fp) * 0x5BD1E995) & 0xFFFFFFFFFFFFFFFF
        return int((i1 ^ h) & int(self._mask))

    def insert(self, key: int) -> bool:
        fp = int(self._fp(np.uint64(key)))
        i1 = self._i1(key)
        i2 = self._i2(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                return True
        i = i1 if self._rng.integers(2) else i2
        for _ in range(self.MAX_KICKS):
            slot = int(self._rng.integers(4))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = self._i2(i, fp)
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                return True
        return False  # table overfull; exact backing still catches membership

    def contains(self, key: int) -> bool:
        fp = int(self._fp(np.uint64(key)))
        i1 = self._i1(key)
        i2 = self._i2(i1, fp)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership probe: fingerprints + both bucket indexes
        computed in one numpy pass (no per-key Python)."""
        keys = np.asarray(keys, dtype=np.uint64)
        fp = ((keys >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        i1 = (keys & self._mask).astype(np.int64)
        h = (fp.astype(np.uint64) * np.uint64(0x5BD1E995))
        i2 = ((i1.astype(np.uint64) ^ h) & self._mask).astype(np.int64)
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2


class SeenSet:
    """Exact seen-set with bloom/cuckoo fast path and parquet spill segments.

    Membership chain (each stage vectorized, each prunes the next):
    bloom negative -> definitely new; cuckoo negative -> definitely new
    WHILE the cuckoo has never overflowed (``_cuckoo_complete``) — after an
    insert failure the cuckoo becomes a positive-only accelerator and misses
    fall through to the exact store (no false negatives; ADVICE r1 fix);
    exact store = sorted uint64 array (searchsorted probe) + small delta set
    compacted when it grows.

    10^10-URL path: with ``spill_dir`` set, the resident sorted array is
    bounded by ``max_resident_keys`` — overflow spills to sorted uint64
    runs on disk, probed via np.memmap searchsorted (OS page cache; only
    bloom/cuckoo-positive keys ever reach a run probe). Runs are merged by
    sorted-run compaction when their count exceeds ``max_runs``, so probe
    cost stays O(log N) over a handful of runs. Spill runs are run-scoped
    derived state (rebuilt from checkpoint segments on resume)."""

    _DELTA_MAX = 8192

    def __init__(self, capacity: int = 1 << 16, spill_dir: str | None = None,
                 max_resident_keys: int = 1 << 22, max_runs: int = 4):
        self.bloom = BloomFilter(capacity)
        self.cuckoo = CuckooFilter(capacity)
        self._sorted = np.empty(0, dtype=np.uint64)
        self._delta: set[int] = set()
        self._cuckoo_complete = True
        self._staged: list[int] = []  # inserts since last segment flush
        self.spill_dir = spill_dir
        self.max_resident_keys = max_resident_keys
        self.max_runs = max_runs
        self._runs: list[np.memmap] = []
        self._run_seq = 0
        if spill_dir:
            os.makedirs(spill_dir, exist_ok=True)

    # -- spill runs ------------------------------------------------------

    def _write_run(self, arr: np.ndarray) -> None:
        path = os.path.join(self.spill_dir, f"run-{self._run_seq:06d}.npy")
        self._run_seq += 1
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(arr.astype("<u8").tobytes())
        os.replace(tmp, path)
        self._runs.append(np.memmap(path, dtype="<u8", mode="r"))

    def _spill_if_needed(self) -> None:
        if self.spill_dir is None or len(self._sorted) <= self.max_resident_keys:
            return
        self._write_run(self._sorted)
        self._sorted = np.empty(0, dtype=np.uint64)
        if len(self._runs) > self.max_runs:
            self._compact_runs()

    def _compact_runs(self, chunk_keys: int = 1 << 20) -> None:
        """Sorted-run compaction as a STREAMING k-way merge: runs are read
        in bounded chunks through their memmaps and the merged run is
        written incrementally — peak RAM is O(max_runs x chunk), never the
        total key count (the 10^10/shard case)."""
        import heapq

        path = os.path.join(self.spill_dir, f"run-{self._run_seq:06d}.npy")
        self._run_seq += 1
        tmp = path + ".tmp"

        def chunks(run):
            for i in range(0, len(run), chunk_keys):
                yield np.asarray(run[i : i + chunk_keys])

        def keys_of(run):
            for c in chunks(run):
                yield from c.tolist()

        old = [r.filename for r in self._runs]
        with open(tmp, "wb") as f:
            buf: list[int] = []
            last = None
            for k in heapq.merge(*(keys_of(r) for r in self._runs)):
                if k == last:
                    continue  # dedupe across runs
                last = k
                buf.append(k)
                if len(buf) >= chunk_keys:
                    f.write(np.array(buf, dtype="<u8").tobytes())
                    buf = []
            if buf:
                f.write(np.array(buf, dtype="<u8").tobytes())
        os.replace(tmp, path)
        self._runs = [np.memmap(path, dtype="<u8", mode="r")]
        for p in old:
            os.remove(p)

    def resident_keys(self) -> int:
        """Keys held in RAM (budget observability; spill runs excluded)."""
        return len(self._sorted) + len(self._delta)

    def _exact_member(self, keys: np.ndarray) -> np.ndarray:
        out = np.zeros(len(keys), dtype=bool)
        if len(self._sorted):
            idx = np.clip(np.searchsorted(self._sorted, keys), 0,
                          len(self._sorted) - 1)
            out = self._sorted[idx] == keys
        for run in self._runs:
            rem = np.flatnonzero(~out)
            if not len(rem):
                break
            idx = np.clip(np.searchsorted(run, keys[rem]), 0, len(run) - 1)
            out[rem] = np.asarray(run[idx]) == keys[rem]
        if self._delta:
            d = self._delta
            for j in np.flatnonzero(~out):
                if int(keys[j]) in d:
                    out[j] = True
        return out

    def _member(self, keys: np.ndarray) -> np.ndarray:
        """Full chain over already-unique keys."""
        out = np.zeros(len(keys), dtype=bool)
        maybe = self.bloom.contains_batch(keys)
        if not maybe.any():
            return out
        m = np.flatnonzero(maybe)
        if self._cuckoo_complete:
            ck = self.cuckoo.contains_batch(keys[m])
            m = m[ck]
            if len(m) == 0:
                return out
        out[m] = self._exact_member(keys[m])
        return out

    def _compact(self) -> None:
        limit = self._DELTA_MAX
        if self.spill_dir is not None:
            limit = min(limit, self.max_resident_keys)
        if len(self._delta) > limit:
            arr = np.fromiter(self._delta, dtype=np.uint64, count=len(self._delta))
            self._sorted = np.sort(np.concatenate([self._sorted, arr]))
            self._delta = set()
            self._spill_if_needed()

    def insert_batch(self, keys: np.ndarray) -> np.ndarray:
        """Insert; returns mask of keys that were NEW (first-wins — only the
        first occurrence of a duplicate within the batch is new)."""
        keys = np.asarray(keys, dtype=np.uint64)
        uniq, first_idx = np.unique(keys, return_index=True)
        member = self._member(uniq)
        new_uniq = uniq[~member]
        new = np.zeros(len(keys), dtype=bool)
        new[first_idx[~member]] = True
        for k in new_uniq:
            ki = int(k)
            self._delta.add(ki)
            self._staged.append(ki)
            if not self.cuckoo.insert(ki):
                self._cuckoo_complete = False
        self.bloom.add_batch(new_uniq)
        self._compact()
        return new

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        uniq, inverse = np.unique(keys, return_inverse=True)
        return self._member(uniq)[inverse]

    @property
    def exact(self) -> set[int]:
        """Exact membership as a Python set (tests/verification; small scales)."""
        out = set(int(k) for k in self._sorted) | self._delta
        for run in self._runs:
            out |= set(int(k) for k in np.asarray(run))
        return out

    def __len__(self) -> int:
        return (len(self._sorted) + len(self._delta)
                + sum(len(r) for r in self._runs))

    # -- checkpoint segments --------------------------------------------

    def flush_segment(self, path: str) -> int:
        """Write staged inserts as one sorted uint64 parquet segment."""
        staged = self._staged
        self._staged = []
        arr = np.array(sorted(staged), dtype=np.uint64)
        tbl = pa.table({"url_hash": pa.array(arr, type=pa.uint64())})
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        return len(arr)

    def load_segment(self, path: str) -> int:
        keys = pq.read_table(path)["url_hash"].to_numpy().astype(np.uint64)
        self._sorted = np.unique(np.concatenate([self._sorted, keys]))
        self._spill_if_needed()
        for k in keys:
            if not self.cuckoo.insert(int(k)):
                self._cuckoo_complete = False
        self.bloom.add_batch(keys)
        return len(keys)


@ray.remote
class SeenShardActor:
    """One shard of the URL-seen set (keys routed by ``hash % n_shards``)."""

    def __init__(self, shard_id: int, capacity: int = 1 << 16,
                 spill_dir: str | None = None,
                 max_resident_keys: int = 1 << 22):
        self.shard_id = shard_id
        self.seen = SeenSet(capacity, spill_dir=spill_dir,
                            max_resident_keys=max_resident_keys)

    def insert_batch(self, keys: np.ndarray) -> np.ndarray:
        return self.seen.insert_batch(keys)

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        return self.seen.contains_batch(keys)

    def size(self) -> int:
        return len(self.seen)

    def flush_segment(self, path: str) -> int:
        return self.seen.flush_segment(path)

    def load_segment(self, path: str) -> int:
        return self.seen.load_segment(path)

    def dump(self) -> set[int]:
        """Verification helper (small scales only)."""
        return set(self.seen.exact)


class ShardedSeenSet:
    """Driver-side facade: batches keys per shard, one ray call per shard."""

    def __init__(self, n_shards: int, capacity_per_shard: int = 1 << 16,
                 spill_dir: str | None = None,
                 max_resident_keys: int = 1 << 22):
        self.n_shards = n_shards
        self.shards = [
            SeenShardActor.remote(
                i, capacity_per_shard,
                os.path.join(spill_dir, f"shard-{i:04d}") if spill_dir else None,
                max_resident_keys,
            )
            for i in range(n_shards)
        ]

    def _route(self, keys: np.ndarray) -> np.ndarray:
        return (keys % np.uint64(self.n_shards)).astype(np.int64)

    def insert_batch(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.uint64)
        owner = self._route(keys)
        refs, order = [], []
        for s in range(self.n_shards):
            idx = np.flatnonzero(owner == s)
            if len(idx):
                refs.append(self.shards[s].insert_batch.remote(keys[idx]))
                order.append(idx)
        out = np.zeros(len(keys), dtype=bool)
        for idx, res in zip(order, ray.get(refs)):
            out[idx] = res
        return out

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def flush_segments_async(self, dir_path: str, wave: int) -> list:
        """Submit the per-shard segment flush WITHOUT waiting. Actor tasks
        execute in submission order, so the snapshot each shard writes
        contains exactly the inserts up to this wave even though later
        waves keep inserting while the write happens; the caller passes
        the refs to whatever must wait on durability (the manifest
        commit)."""
        os.makedirs(dir_path, exist_ok=True)
        return [
            s.flush_segment.remote(
                os.path.join(dir_path, f"seen-w{wave:06d}-s{i:04d}.parquet")
            )
            for i, s in enumerate(self.shards)
        ]

    def flush_segments(self, dir_path: str, wave: int) -> None:
        ray.get(self.flush_segments_async(dir_path, wave))

    def load_segments(self, dir_path: str, max_wave: int | None = None) -> int:
        """Load segments, optionally only those from waves <= max_wave (an
        orphan segment from a wave that never committed its manifest must NOT
        mark its URLs as seen, or the resumed wave would skip them)."""
        if not os.path.isdir(dir_path):
            return 0
        total = 0
        refs = []
        for name in sorted(os.listdir(dir_path)):
            if not name.endswith(".parquet"):
                continue
            wave = int(name.split("-w")[1].split("-")[0])
            if max_wave is not None and wave > max_wave:
                continue
            shard = int(name.rsplit("-s", 1)[1].split(".")[0])
            refs.append(self.shards[shard].load_segment.remote(os.path.join(dir_path, name)))
        for n in ray.get(refs):
            total += n
        return total

    def all_hashes(self) -> set[int]:
        """Test/verification helper: union of exact sets (small scales only)."""
        out: set[int] = set()
        for s in ray.get([s.dump.remote() for s in self.shards]):
            out |= s
        return out
