"""Finalize-phase co-partition shuffle of the images binary corpus.

The at-scale (bucketed) attach previously had EVERY images_out merge task
read ALL hash(image_id) buckets: a partition's image ids spread uniformly
over the buckets, so aggregate decompress was n_partitions x corpus.
Measured at 960k entities / 16 partitions / 64 buckets: ~192 GB of
aggregate bucket decompress, finalize_merges 64 s at 16 cpus vs 42 s at
4 cpus — ANTI-scaling, because 16 concurrent full-corpus reads contend on
memory bandwidth while the work itself is pure duplication. (480k never
hit this: its images table fit images_broadcast_limit_bytes and rode the
zero-copy plasma broadcast.)

This pass moves the bytes to the OUTPUT partitioning once, then each merge
task reads only its own partition's bytes:

1. one column-pruned scan per staged images_out partition dir — the unique
   ``image_id`` values partition p needs (reads ONLY that column of the
   staging/compact files; runs after the compaction drain, so the dir is
   stable);
2. one small broadcast: an (image_id, part) pairs table, ``ray.put`` once
   and zero-copy in every bucket task. Shared images (one id referenced by
   entities in several partitions) appear once per needing partition;
3. one Ray task per bucket file: read THAT bucket once, inner-probe the
   pairs against the bucket's ids, write one parts file per touched output
   partition (atomic tmp -> replace);
4. merge task p attaches from ``parts/p=<p>/`` alone.

Aggregate: the corpus is decompressed exactly twice (bucket pass + merge
read) instead of n_partitions times, and the only all-to-all volume is one
compressed copy of the bytes — the standard "shuffle the big side to the
consumer partitioning" move. On a real cluster the pairs broadcast is the
scale limit (~#gallery-rows x ~20 B); past ~10^9 rows, hash-partition the
pairs by bucket instead of broadcasting (documented, not needed at this
corpus: 960k entities -> ~4M pairs ~ 100 MB).

Reference parity note: the reference attaches bytes row-at-a-time from its
MySQL media store (vaugouin/wikipedia-crawler wikipediacrawler.py's image
insert path); the semantics here are identical (every gallery row carries
its image bytes exactly once in the final table) — only the movement plan
is Ray-native.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

#: schema of the images source table (bucket files carry exactly this)
IMAGES_SRC_FIELDS = [
    ("image_id", pa.string()),
    ("bytes", pa.binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("phash", pa.int64()),
]


def empty_images_table() -> pa.Table:
    return pa.table({n: pa.array([], t) for n, t in IMAGES_SRC_FIELDS})


@ray.remote
def _partition_image_ids(pdir: str) -> pa.Array:
    """Unique image_ids a staged images_out partition needs (column-pruned:
    reads only ``image_id`` from each staging/compact parquet)."""
    files = sorted(
        os.path.join(pdir, f) for f in os.listdir(pdir)
        if f.endswith(".parquet")
    )
    if not files:
        return pa.array([], pa.string())
    cols = [pq.read_table(f, columns=["image_id"])["image_id"] for f in files]
    import pyarrow.compute as pc

    combined = pa.chunked_array(
        [c for col in cols for c in col.chunks] or [pa.array([], pa.string())]
    )
    out = pc.unique(pc.drop_null(combined))
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


@ray.remote
def _split_bucket(bucket_path: str, pairs_ref_t, parts_dir: str) -> int:
    """Route one bucket's rows to their output-partition parts files.

    ``pairs_ref_t``: ``(ObjectRef,)`` of the (image_id, part) pairs table —
    nested so Ray does not auto-deref it into every task's argument list;
    the get is a zero-copy plasma map."""
    pairs: pa.Table = ray.get(pairs_ref_t[0])
    # prune to the attach columns (the source table may carry extras, e.g.
    # caption — never read by _attach_from, so never decompress or ship it)
    want = ["image_id"] + [n for n, _ in IMAGES_SRC_FIELDS if n != "image_id"]
    have = set(pq.read_schema(bucket_path).names)
    tbl = pq.read_table(bucket_path, columns=[c for c in want if c in have])
    if tbl.num_rows == 0 or pairs.num_rows == 0:
        return 0
    # probe direction: bucket ids are unique (images table key), pairs are
    # the big side — index the small side, probe the big one, C-speed both
    idx = pd.Index(tbl["image_id"].to_pandas())
    take = idx.get_indexer(pairs["image_id"].to_pandas())
    mask = take >= 0
    if not mask.any():
        return 0
    take = take[mask]
    part_of = pairs["part"].to_numpy(zero_copy_only=False)[mask]
    base = os.path.splitext(os.path.basename(bucket_path))[0]
    written = 0
    for p in np.unique(part_of):
        sel = part_of == p
        sub = tbl.take(pa.array(take[sel]))
        pdir = os.path.join(parts_dir, f"p={int(p):05d}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, f"{base}.parquet.tmp")
        pq.write_table(sub, tmp)
        os.replace(tmp, os.path.join(pdir, f"{base}.parquet"))
        written += sub.num_rows
    return written


def shuffle_image_bytes_to_parts(images_out_path: str, bucket_dir: str,
                                 out_dir: str) -> tuple:
    """Run the co-partition pass; returns the merge-side ``images_arg``
    ``("parts", parts_dir)``. Idempotent per run: a stale parts dir (crashed
    previous finalize) is cleared first — the shuffle re-derives everything
    from staging + buckets, so replay is value-safe."""
    import shutil

    staging = os.path.join(images_out_path, "staging")
    pdirs = sorted(
        d for d in (os.listdir(staging) if os.path.isdir(staging) else [])
        if d.startswith("p=")
    )
    parts_dir = os.path.join(out_dir, "images_parts")
    shutil.rmtree(parts_dir, ignore_errors=True)
    os.makedirs(parts_dir, exist_ok=True)
    if not pdirs:
        return ("parts", parts_dir)
    id_refs = {
        int(d[2:]): _partition_image_ids.remote(os.path.join(staging, d))
        for d in pdirs
    }
    id_cols, part_cols = [], []
    for p, ref in id_refs.items():
        ids = ray.get(ref)
        if len(ids) == 0:
            continue
        id_cols.append(ids)
        part_cols.append(np.full(len(ids), p, dtype=np.int32))
    if not id_cols:
        return ("parts", parts_dir)
    pairs = pa.table({
        "image_id": pa.concat_arrays(id_cols),
        "part": pa.array(np.concatenate(part_cols), pa.int32()),
    }).combine_chunks()
    pairs_ref = ray.put(pairs)
    bucket_files = sorted(
        os.path.join(bucket_dir, f) for f in os.listdir(bucket_dir)
        if f.startswith("bucket-") and f.endswith(".parquet")
    )
    ray.get([
        _split_bucket.remote(bf, (pairs_ref,), parts_dir)
        for bf in bucket_files
    ])
    return ("parts", parts_dir)
