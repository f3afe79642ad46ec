"""The crawl pipeline: seeds -> frontier -> fetch/extract -> Lance-style sinks.

Ray-Data-first (SURVEY §3.4), LSM-shaped writes:

    seeds.parquet ─▶ validity filter ─▶ first-wins precedence dedup
    (ownership aggregate + broadcast semi-join) ─▶ ONE streaming resolver
    job for the whole run (driver consumes ordered resolved blocks while
    Ray resolves ahead — resolve overlaps everything downstream)
    ─▶ per wave (driver does only admission + seq assignment):
        seen-set admission (sharded bloom/cuckoo/exact actors, first-wins;
        every admission journaled to the admission WAL first)
        ─▶ frontier push/pop as ARROW TABLES (hash(host) shards: priority
           heaps, per-host token buckets; row dicts only inside actors)
        ─▶ background wave job: crawl-log segment ─▶ map_batches(fetch
           tasks — one HTML parse: sections+captions+links) ─▶ payload
           DELTA ─▶ discovered links admitted to the frontier at rank 99
           (``discover_links``) ─▶ delta staged into every output table's
           partition buckets
        ─▶ checkpoint manifest commits FIFO after the wave's job
    ─▶ finalize: merges only — one Ray task per staged (table, partition);
       image BYTES attach at this single write (broadcast ref below the
       size limit, hash-bucketed parquet above it).

Scale notes: per-wave cost is O(wave), compaction is O(total) once; the
entity stream never materializes as a driver list; bytes move from their
source to disk exactly once; no all-to-all exchange anywhere in the write
path. Resume = last committed manifest + seen segments + admission-WAL
replay (journal minus crawl log) — lossless after kill -9, no duplicate
fetches. ``strict_order=True`` reproduces the reference's chunk-serial
schedule exactly (parity config; with ``discover_links`` it waits each
wave job so BFS admission stays deterministic); ``strict_order=False``
overlaps waves (throughput config) while per-host priority order is still
enforced by the frontier heaps.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from wikicrawl import schema as S
from wikicrawl.checkpoint import CheckpointLog
from wikicrawl.stages.crawl_stages import (
    AttachBytes,
    FetchExtract,
    _attach_from,
    Resolver,
    make_fetch_fn,
    make_resolver_fn,
    prepare_bucketed_images,
    payload_to_entity_images,
    payload_to_image_refs,
    payload_to_movie_format,
    payload_to_pages,
    payload_to_sections,
)
from wikicrawl.state.frontier import ShardedFrontier
from wikicrawl.state.seen import ShardedSeenSet
from wikicrawl.state.table import KeyedTable, key_partition


@dataclass
class CrawlConfig:
    corpus_dir: str
    out_dir: str
    n_frontier_shards: int = 2
    n_seen_shards: int = 2
    n_table_partitions: int = 8
    entity_wave: int = 1024  # entities per wave
    host_rate: float = 1e9  # politeness tokens per wave per host
    host_burst: float = 1e9
    fetch_concurrency: int = 4
    fetch_batch: int = 64
    resolve_concurrency: int = 2
    strict_order: bool = True  # parity schedule (reference chunk-serial)
    write_workers: int = 2  # concurrent background wave jobs (fetch+stage)
    discover_links: bool = False  # dynamic frontier: in-body /wiki/ links
    # feed the frontier at rank 99 (BFS tier) after canonicalize + robots +
    # seen-set first-wins admission (north_star link discovery)
    resume: bool = False
    max_waves: int = 10_000_000
    halt_after_waves: int | None = None  # crash simulation for resume tests:
    # stop after N committed waves WITHOUT draining the frontier backlog or
    # finalizing — exactly the state a killed process leaves behind
    families: tuple[str, ...] | None = None  # quick-mode scoping: crawl only
    # these content families (exclusion chains still consider ALL seeds)
    only_qids: frozenset | None = None  # entity-level scoping (incremental
    # recrawl: refresh exactly these entities; keyed upserts keep the rest)
    seen_resident_keys: int = 1 << 22  # per-shard RAM budget for the exact
    # seen store; overflow spills to sorted uint64 runs probed via memmap
    images_broadcast_limit_bytes: int = 1 << 30  # images table above this
    # is hash(image_id)-bucketed parquet (per-task bucket loads) instead of
    # one ray.put broadcast — the binary corpus can never be one object
    hot_hosts: dict | None = None  # {host: n_split} skew-aware sub-queues
    # (north_rule hot-host clause; per-host budget preserved, split across
    # sub-queues; strict per-host order holds per sub-queue)
    host_delays: dict | None = None  # {host: delay_ticks} robots Crawl-delay
    # analog: the host's token bucket refills at 1/delay per tick with
    # burst 1 (one fetch every `delay` waves), overriding the global rate
    max_link_depth: int | None = None  # BFS depth budget for discovery:
    # seeds are depth 0; links inherit parent depth + 1 and are dropped
    # beyond this depth at admission (None = unbounded)
    staging_compact_files: int | None = None  # LSM-style tiered staging
    # compaction DURING the crawl: when a partition's staging dir holds
    # >= this many un-compacted files, a background Ray task folds them
    # into one `compact-*` run (each row rewritten at most once — runs
    # are never re-compacted). Bounds finalize's small-file read bill at
    # unbounded wave counts (the 480k lesson: ~2 ms/file open cost made
    # finalize the scaling ceiling). Crash/replay-safe BY CONSTRUCTION:
    # any interleaving leaves either the run, the originals, or both —
    # duplicate rows carry identical (key, _seq) and collapse in
    # merge_partition's stable crawl-order dedup. None = AUTO (the
    # default): compaction arms itself per partition dir at
    # `staging_compact_auto_files`, so unbounded wave counts are handled
    # without an operator knob (VERDICT r4 #6). Set 0 to disable.
    staging_compact_auto_files: int = 128  # auto-mode arming threshold:
    # a partition dir crossing this many un-compacted files gets folded.
    # 128 files x the measured ~2 ms/file open cost keeps each finalize
    # merge's small-file bill under ~0.3 s/partition while staying above
    # the per-dir file count of the tuned 120k bench regime (~117 =
    # entities/fetch_batch tasks), which therefore never pays a rewrite;
    # the 480k/fetch_batch=256 regime (~1900 files/dir untreated) arms it.
    durable_payload: bool = True  # False = ephemeral mode: the nested
    # payload delta is NOT persisted (staging, crawl log, seen segments and
    # manifests still are — the five OUTPUT tables are identical). Halves
    # the bytes written per wave; resume and link discovery need the delta,
    # so both require durable_payload=True (validated at crawl start).
    # Used by the scaling bench to isolate the shared-disk term.


@dataclass
class CrawlResult:
    out_dir: str
    tables: dict
    metrics: dict = field(default_factory=dict)


QID_PATTERN = r"^Q[0-9]+$"

# Fan-out tasks use SPREAD, not the default locality-aware packing: the
# corpus broadcast refs live on the head node, so DEFAULT scheduling packs
# every fetch/resolve task next to them and a second node sits idle
# (measured: 4+4-cpu two-node crawl ran at ~one-node-of-4 speed). SPREAD
# round-robins across nodes; the worker-global corpus cache means each
# node fetches the broadcast exactly once. No-op on a single node.
_SPREAD = {"scheduling_strategy": "SPREAD"}


@ray.remote
def _read_row_groups(path: str, groups: list) -> pa.Table:
    """One shard of the pages-corpus broadcast: read a contiguous
    row-group range; the returned table lands in plasma from THIS worker
    (parallel read + parallel put — the driver never copies the corpus).
    combine_chunks so downstream per-row lookups are O(1) per element."""
    return pq.ParquetFile(path).read_row_groups(groups).combine_chunks()


@ray.remote
def _fetch_slice_task(slice_tbl: pa.Table, sitelinks_ref_t, pages_ref_t,
                      delta_part: str | None, stage_specs: dict,
                      robots, discover: bool):
    """ONE fused task per wave slice: fetch+extract against the
    worker-global corpus cache, link-candidate derivation, staging writes
    for all five output tables, the delta part write (skipped in ephemeral
    mode), and the wave counters returned to the driver. The bodies are
    the same batch functions the map_batches form uses — fusing them into
    a raw task removed the per-wave streaming-executor setup (serial
    from_arrow puts + executor overhead), a measured per-wave fixed cost
    that did not scale (round 3). Counter totals replace the round-2
    delta read-back. (A per-wave plasma consolidation of the derived
    tables was tried and REVERTED: routing the derived corpus through the
    object store cost more than the small staging files it saved.)"""
    import collections
    import time as _t

    from wikicrawl.stages.crawl_stages import (
        FetchExtract,
        _cached_wiki,
        make_link_candidates_fn,
    )

    # fault-injection hook (tests only): the FIRST task to claim the
    # marker dies as a hard worker crash BEFORE any side effect; Ray's
    # default task retry re-executes it, and the staging writes are
    # idempotent (content-hash filenames + atomic rename), so the retried
    # run must be value-identical — asserted by scripts/fault_retry_smoke
    fault_dir = os.environ.get("WIKICRAWL_FAULT_ONCE_DIR")
    if fault_dir:
        try:
            fd = os.open(os.path.join(fault_dir, "died"),
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            os._exit(1)
        except FileExistsError:
            pass
        except OSError:
            # stale env var pointing at a missing dir must degrade to a
            # no-op, not exhaust Ray retries on every attempt (ADVICE r3)
            pass

    _cpu0, _w0 = _t.thread_time(), _t.time()
    wiki = _cached_wiki(sitelinks_ref_t[0], pages_ref_t[0])
    payload = FetchExtract.run(wiki, slice_tbl)
    if discover:
        payload = make_link_candidates_fn(robots)(payload)
    ok = payload.filter(pc.and_(payload["success"], payload["has_content"]))
    cnt = collections.Counter(
        zip(ok["family"].to_pylist(), ok["lang"].to_pylist())
    )
    for name, fn in _DERIVE.items():
        derived = fn(payload)
        if derived.num_rows:
            staging, key, nparts = stage_specs[name]
            _write_staging_files(derived, staging, key, nparts)
    if delta_part is not None:
        pq.write_table(payload, delta_part + ".tmp")
        os.replace(delta_part + ".tmp", delta_part)
    return (
        payload.num_rows,
        int(pc.sum(payload["requests"]).as_py() or 0),
        [(f"{f}/{l}", c) for (f, l), c in cnt.items()],
        (_t.thread_time() - _cpu0, _t.time() - _w0),
    )


@ray.remote
def _resolve_slice(slice_tbl: pa.Table, sitelinks_ref_t, robots):
    """One resolver fan-out task (worker-global corpus cache, same as the
    map_batches form). Raw task on purpose: the driver consumes resolved
    slices strictly IN ORDER while Ray executes them in parallel — ordered
    streaming consumption without flipping the GLOBAL preserve_order flag,
    which round 2 set for this one stage and thereby forced head-of-line
    ordered execution on every per-wave fetch job too."""
    from wikicrawl.stages.crawl_stages import make_resolver_fn

    return make_resolver_fn(sitelinks_ref_t[0], robots)(slice_tbl)


def _resolved_stream(slices, sitelinks_ref, robots, window: int = 512):
    """Yield resolved slice tables in submission order with a bounded
    in-flight window (backpressure: at most ``window`` resolved slices live
    in the object store ahead of the consumer)."""
    refs = []
    n = len(slices)
    resolve = _resolve_slice.options(**_SPREAD)
    for i in range(min(window, n)):
        refs.append(resolve.remote(slices[i], (sitelinks_ref,), robots))
    for i in range(n):
        tbl = ray.get(refs[i])
        j = i + window
        if j < n:
            refs.append(resolve.remote(slices[j], (sitelinks_ref,), robots))
        yield tbl


OWNER_SMALL_LIMIT_ENV = "WIKICRAWL_OWNER_SMALL_LIMIT"


def _owner_small_limit() -> int:
    """Seed-row count below which the ownership aggregate runs driver-side
    and ships as one broadcast key set; above it everything is a
    distributed aggregate + hash-bucketed semi-join. Env-overridable so
    tests can force the at-scale path (VERDICT r2 item 3)."""
    return int(os.environ.get(OWNER_SMALL_LIMIT_ENV, 5_000_000))


def _owner_key(qids, ranks):
    """Composite (wikidata_id, family_rank) semi-join key — one vectorized
    Arrow kernel, no per-row Python. Always a combined Array (usable as an
    ``is_in`` value_set)."""
    k = pc.binary_join_element_wise(qids, pc.cast(ranks, pa.string()), "\x1f")
    return k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k


def owned_seed_stream(corpus_dir: str):
    """seeds -> validity filter -> first-wins precedence dedup -> sorted ds.

    The ownership rule IS the exclusion-chain anti-join
    (wikipedia_crawler.py:71-79): keep a seed row iff its family_rank is
    the MIN rank of its qid — instead of 19 chained NOT-IN subqueries, and
    instead of a per-qid map_groups (tiny pandas groups are death by
    overhead). Below ``_owner_small_limit`` the (qid, min_rank) pairs ship
    once as a broadcast composite-key set and the filter is a vectorized
    ``pc.is_in`` per batch; above it the aggregate stays a distributed
    groupby (partial combiners) and the filter is a hash-bucketed
    semi-join (one shuffle per side) — no driver dict on either path.
    """
    from ray.data.aggregate import Min

    seeds_path = os.path.join(corpus_dir, "seeds.parquet")
    ds = rd.read_parquet(seeds_path)
    ds = ds.map_batches(
        lambda t: t.filter(pc.match_substring_regex(t["wikidata_id"], QID_PATTERN)),
        batch_format="pyarrow",
    )
    n_seed_rows = pq.ParquetFile(seeds_path).metadata.num_rows
    if n_seed_rows <= _owner_small_limit():
        # small-side fast path: one vectorized Arrow group_by beats two Ray
        # job launches for the ownership aggregate (driver holds only
        # (qid, min_rank) pairs, never the full rows)
        t = pq.read_table(seeds_path, columns=["wikidata_id", "family_rank"])
        t = t.filter(pc.match_substring_regex(t["wikidata_id"], QID_PATTERN))
        owner_tbl = t.group_by("wikidata_id").aggregate([("family_rank", "min")])
        keys_ref = ray.put(_owner_key(
            owner_tbl["wikidata_id"], owner_tbl["family_rank_min"]
        ))

        from wikicrawl.functions._cache import broadcast_cached

        def keep_owned(t: pa.Table) -> pa.Table:
            ks = broadcast_cached(keys_ref)  # zero-copy once per worker
            mask = pc.is_in(
                _owner_key(t["wikidata_id"], t["family_rank"]), value_set=ks
            )
            return t.filter(mask)

        ds = ds.map_batches(keep_owned, batch_format="pyarrow")
        return ds.sort(["family_rank", "seed_order"])

    # at-scale path: distributed aggregate + hash-bucketed semi-join —
    # the owner side never materializes anywhere; both sides shuffle once
    # on hash(composite key)
    from wikicrawl.functions.joins import hash_join

    owner = ds.groupby("wikidata_id").aggregate(
        Min("family_rank", alias_name="family_rank_min")
    )

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__k", _owner_key(t["wikidata_id"], t["family_rank"])
        )

    def owner_keys_only(t: pa.Table) -> pa.Table:
        return pa.table({"__k": _owner_key(t["wikidata_id"], t["family_rank_min"])})

    seed_cols = [f for f in pq.read_schema(seeds_path).names]
    joined = hash_join(
        ds.map_batches(add_key, batch_format="pyarrow"),
        owner.map_batches(owner_keys_only, batch_format="pyarrow"),
        on="__k",
    )  # right side is unique per qid -> inner join IS the semi-join
    ds = joined.map_batches(
        lambda t: t.select(seed_cols), batch_format="pyarrow"
    )
    return ds.sort(["family_rank", "seed_order"])


def owned_seed_batches(corpus_dir: str, wave_size: int):
    """Yield sorted owned-seed batches.

    Small corpora take a driver-side vectorized Arrow path (filter +
    ownership semi-join via ``pc.is_in`` + sort_by on five narrow columns —
    cheaper than two Ray job launches); larger ones stream through the
    distributed ``owned_seed_stream`` sort."""
    seeds_path = os.path.join(corpus_dir, "seeds.parquet")
    if pq.ParquetFile(seeds_path).metadata.num_rows <= _owner_small_limit():
        t = pq.read_table(seeds_path)
        t = t.filter(pc.match_substring_regex(t["wikidata_id"], QID_PATTERN))
        owner = t.group_by("wikidata_id").aggregate([("family_rank", "min")])
        mask = pc.is_in(
            _owner_key(t["wikidata_id"], t["family_rank"]),
            value_set=_owner_key(
                owner["wikidata_id"], owner["family_rank_min"]
            ),
        )
        t = t.filter(mask).sort_by(
            [("family_rank", "ascending"), ("seed_order", "ascending")]
        )
        for i in range(0, t.num_rows, wave_size):
            yield t.slice(i, wave_size)
        return
    stream = owned_seed_stream(corpus_dir)
    yield from stream.iter_batches(batch_size=wave_size, batch_format="pyarrow")


def _write_staging_files(t: pa.Table, staging: str, key: list[str],
                         nparts: int) -> list[int]:
    """Split one derived batch by target partition and write one staging
    parquet per touched partition. Names derive from the FULL key tuples so
    distinct batches never collide and a replay overwrites identical files
    (resume-safe). Row order inside a file is crawl order; the cross-file
    merge order comes from the ``_seq`` column each row carries."""
    import hashlib as _hashlib

    parts = key_partition(t[key[0]].to_pylist(), nparts)
    touched = []
    for p in sorted(set(parts.tolist())):
        sub = t.filter(pa.array(parts == p))
        h = _hashlib.blake2b(digest_size=10)
        for kc in key:
            h.update("|".join(str(v) for v in sub[kc].to_pylist()).encode())
            h.update(b"\x1f")
        name = h.hexdigest()
        pdir = os.path.join(staging, f"p={p:05d}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, f"{name}.parquet.tmp")
        pq.write_table(sub, tmp)
        os.replace(tmp, os.path.join(pdir, f"{name}.parquet"))
        touched.append(p)
    return touched


@ray.remote
def _compact_staging_dir(pdir: str, snapshot: tuple) -> int:
    """Fold one snapshot of small staging files into a single `compact-*`
    run (tiered: runs are excluded from future snapshots, so every row is
    rewritten at most once). Value-safe under ANY crash/replay
    interleaving — see CrawlConfig.staging_compact_files."""
    import hashlib as _hashlib

    try:
        files = [os.path.join(pdir, f) for f in snapshot]
        files = [f for f in files if os.path.exists(f)]
        if len(files) < 2:
            return 0
        t = pa.concat_tables([pq.read_table(f) for f in files]).combine_chunks()
        h = _hashlib.blake2b("|".join(sorted(snapshot)).encode(),
                             digest_size=10).hexdigest()
        out = os.path.join(pdir, f"compact-{h}.parquet")
        tmp = out + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, out)
        for f in files:
            if os.path.basename(f).startswith("compact-"):
                continue
            try:
                os.remove(f)
            except OSError:
                pass
        return len(files)
    except OSError:
        # the dir can vanish under a stale task after a crash-simulated
        # restart cleared staging — a no-op, never an error
        return 0


@ray.remote
def _merge_partition_task(name: str, path: str, base_schema: pa.Schema,
                          key: list[str], nparts: int, prune, order_col: str,
                          p: int, clock: int,
                          images_arg=None) -> tuple[str, dict]:
    """Merge one partition's staging files into its partition file (single
    writer per partition, SURVEY §7.4). Duplicate keys across staging files
    resolve by the rows' _seq (crawl order) inside merge_partition.

    ``images_arg``: ``("ref", ObjectRef)`` (nested so Ray does NOT
    auto-deref the broadcast table into every task argument) or
    ``("buckets", dir, n)`` — the images binary payload is attached HERE,
    at the final write: staging files carry only the (small) refs, so
    bytes move from their source to disk exactly once."""
    import time as _t

    t0 = _t.time()
    pdir = os.path.join(path, "staging", f"p={p:05d}")
    # a staging compactor (_compact_staging_dir) may fold originals into a
    # compact-* run between this task's listdir and its reads; the fold is
    # value-preserving, so on a vanished file simply re-list and re-read —
    # any consistent snapshot of the dir carries the same rows (ADVICE r4)
    for _attempt in range(8):
        files = sorted(
            os.path.join(pdir, f) for f in os.listdir(pdir)
            if f.endswith(".parquet")
        )
        if not files:
            return name, {"inserted": 0, "updated": 0, "deleted": 0}
        try:
            parts = [pq.read_table(f) for f in files]
            break
        except (FileNotFoundError, pa.ArrowInvalid):
            continue
    else:
        parts = [pq.read_table(f) for f in files]  # surface the real error
    # combine: Arrow `take` on a column with thousands of chunks (one per
    # staging file) degrades to per-element chunk search — one compaction
    # copy here makes every downstream kernel O(1) per element
    chunk = pa.concat_tables(parts).combine_chunks()
    t1 = _t.time()
    if images_arg is not None:
        if images_arg[0] == "parts":
            # finalize-phase co-partitioned bytes (bytes_shuffle.py): this
            # partition's bytes and nothing else — one read, no cache needed
            import pandas as _pd

            from wikicrawl.pipelines.bytes_shuffle import empty_images_table

            bdir = os.path.join(images_arg[1], f"p={p:05d}")
            bfiles = sorted(
                os.path.join(bdir, f) for f in os.listdir(bdir)
                if f.endswith(".parquet")
            ) if os.path.isdir(bdir) else []
            btbl = (
                pa.concat_tables([pq.read_table(f) for f in bfiles])
                .combine_chunks() if bfiles else empty_images_table()
            )
            bidx = _pd.Index(btbl["image_id"].to_pandas())
            chunk = _attach_from(btbl, bidx, chunk).drop_columns(
                ["bytes_found"])
        else:
            chunk = _cached_attach(images_arg)(chunk).drop_columns(
                ["bytes_found"])
    t2 = _t.time()
    t = KeyedTable(path, base_schema, key=key, n_partitions=nparts,
                   prune_group=prune, order_col=order_col)
    res = t.merge_partition(p, chunk, clock)
    t3 = _t.time()
    if os.environ.get("WIKICRAWL_MERGE_TIMING"):
        res = dict(res, _timing=(name, p, len(files), chunk.num_rows,
                                 round(t1 - t0, 2), round(t2 - t1, 2),
                                 round(t3 - t2, 2)))
    return name, res


# worker-process-global AttachBytes cache (same amortization pattern as
# _cached_wiki: the image_id -> row index is built once per worker, the
# bytes table itself is the zero-copy broadcast)
_ATTACH_CACHE: dict = {}


def _cached_attach(images_arg):
    """images_arg: ("ref", ObjectRef) — the broadcast path. (The at-scale
    path arrives as ("parts", dir) and is read directly per partition in
    _merge_partition_task; see pipelines/bytes_shuffle.py.)"""
    key = ("ref", images_arg[1].hex())
    ab = _ATTACH_CACHE.get(key)
    if ab is None:
        _ATTACH_CACHE.clear()
        ab = AttachBytes(images_ref=images_arg[1])
        _ATTACH_CACHE[key] = ab
    return ab


_DERIVE = {
    "pages": payload_to_pages,
    "sections": payload_to_sections,
    # bytes are NOT staged: refs only; _merge_partition_task attaches
    # the binary column at the one final write
    "images_out": payload_to_image_refs,
    "entity_images": payload_to_entity_images,
    "movie_format": payload_to_movie_format,
}


def _clear_staging(tables: dict[str, KeyedTable]) -> None:
    import shutil as _shutil

    for tbl in tables.values():
        staging = os.path.join(tbl.path, "staging")
        _shutil.rmtree(staging, ignore_errors=True)
        os.makedirs(staging, exist_ok=True)


def _make_stage_fn(tables: dict[str, KeyedTable]):
    """One map_batches fn deriving ALL five output tables from a payload
    batch and appending their partition staging files (one payload read
    total — round-1 launched five jobs, each re-reading every delta)."""
    specs = {
        name: (os.path.join(tbl.path, "staging"), tbl.key, tbl.n_partitions)
        for name, tbl in tables.items()
    }

    def stage_batch(t: pa.Table) -> pa.Table:
        for name, fn in _DERIVE.items():
            derived = fn(t)
            if derived.num_rows == 0:
                continue
            staging, key, nparts = specs[name]
            _write_staging_files(derived, staging, key, nparts)
        return pa.table({"n": pa.array([t.num_rows], type=pa.int64())})

    return stage_batch


def _merge_staged(tables: dict[str, KeyedTable], images_arg, clock: int) -> dict:
    """One Ray merge task per staged (table, partition) — touched partitions
    are discovered from the staging directories. No all-to-all exchange."""
    import shutil as _shutil

    refs = []
    for name, tbl in tables.items():
        staging = os.path.join(tbl.path, "staging")
        if not os.path.isdir(staging):
            continue
        base_schema = pa.schema(
            [f for f in tbl.schema if not f.name.startswith("_")]
        )
        for d in sorted(os.listdir(staging)):
            if not d.startswith("p="):
                continue
            refs.append(_merge_partition_task.remote(
                name, tbl.path, base_schema, tbl.key, tbl.n_partitions,
                tbl.prune_group, tbl.order_col, int(d[2:]), clock,
                images_arg if name == "images_out" else None,
            ))
    counters: dict[str, dict] = {
        name: {"inserted": 0, "updated": 0, "deleted": 0} for name in tables
    }
    for name, c in ray.get(refs):
        tim = c.pop("_timing", None)
        if tim is not None:
            print("MERGE_TIMING", tim, flush=True)
        for k in c:
            counters[name][k] += c[k]
    for tbl in tables.values():
        _shutil.rmtree(os.path.join(tbl.path, "staging"), ignore_errors=True)
    return counters


def open_tables(out_dir: str, n_partitions: int) -> dict[str, KeyedTable]:
    return {
        "pages": KeyedTable(
            os.path.join(out_dir, "pages"), S.PAGES,
            key=["wikidata_id", "lang"], n_partitions=n_partitions,
        ),
        "sections": KeyedTable(
            os.path.join(out_dir, "sections"), S.SECTIONS,
            key=["wikidata_id", "lang", "display_order"],
            n_partitions=n_partitions, prune_group=["wikidata_id", "lang"],
        ),
        "images_out": KeyedTable(
            os.path.join(out_dir, "images_out"), S.IMAGES_OUT,
            key=["wikidata_id", "lang", "display_order"],
            n_partitions=n_partitions, prune_group=["wikidata_id", "lang"],
        ),
        "entity_images": KeyedTable(
            os.path.join(out_dir, "entity_images"), S.ENTITY_IMAGES,
            key=["family", "entity_id"], n_partitions=n_partitions,
        ),
        "movie_format": KeyedTable(
            os.path.join(out_dir, "movie_format"), S.MOVIE_FORMAT,
            key=["entity_id"], n_partitions=n_partitions,
        ),
    }


def crawl(cfg: CrawlConfig) -> CrawlResult:
    os.makedirs(cfg.out_dir, exist_ok=True)
    import json

    if not cfg.resume:
        # fresh run: clear run-scoped state (keyed tables persist and are
        # upserted; deltas/logs/checkpoints belong to one run)
        import shutil as _shutil

        for sub in ("payload", "checkpoints", "crawl_log", "seen_segments",
                    "retry", "admissions"):
            _shutil.rmtree(os.path.join(cfg.out_dir, sub), ignore_errors=True)

    with open(os.path.join(cfg.corpus_dir, "meta.json")) as f:
        robots = json.load(f)["robots_disallow"]

    tables = open_tables(cfg.out_dir, cfg.n_table_partitions)
    # staging and seen-set spill runs are run-scoped derived state: clear
    # both on every start (a crashed run's files must not leak in)
    _clear_staging(tables)
    stage_fn = _make_stage_fn(tables)
    if not cfg.durable_payload and (cfg.discover_links or cfg.resume):
        raise ValueError(
            "durable_payload=False (ephemeral mode) is incompatible with "
            "discover_links/resume: both replay from the payload delta"
        )
    stage_specs = {
        name: (os.path.join(tbl.path, "staging"), tbl.key, tbl.n_partitions)
        for name, tbl in tables.items()
    }
    import shutil as _shutil0

    seen_spill = os.path.join(cfg.out_dir, "seen_spill")
    _shutil0.rmtree(seen_spill, ignore_errors=True)
    seen = ShardedSeenSet(cfg.n_seen_shards, spill_dir=seen_spill,
                          max_resident_keys=cfg.seen_resident_keys)
    frontier = ShardedFrontier(
        cfg.n_frontier_shards, cfg.host_rate, cfg.host_burst, robots,
        hot_hosts=cfg.hot_hosts, host_delays=cfg.host_delays,
    )
    # warm the state actors NOW (fire-and-forget no-ops): actor processes
    # spawn lazily on first call, and paying that inside wave 1's
    # admission/pop was a measurable slice of the serial ramp-in
    _actor_warmup = [s.size.remote() for s in seen.shards] + [
        s.backlog.remote() for s in frontier.shards
    ]
    del _actor_warmup
    ckpt = CheckpointLog(cfg.out_dir)
    log_dir = os.path.join(cfg.out_dir, "crawl_log")
    retry_dir = os.path.join(cfg.out_dir, "retry")
    seen_dir = os.path.join(cfg.out_dir, "seen_segments")
    os.makedirs(log_dir, exist_ok=True)
    os.makedirs(retry_dir, exist_ok=True)

    import time as _time

    seq = 0
    wave = 0
    watermark = (-1, -1)  # (family_rank, seed_order) of last processed entity
    metrics = {
        "requests": 0, "fetched": 0, "no_sitelink": 0, "transient": 0,
        "url_dups": 0, "entities": 0,
    }
    timings: dict[str, float] = {}
    # WIKICRAWL_TIMELINE=1: record (name, start, end) spans (relative to
    # crawl start) for the driver laps and every background job — lets a
    # bench run compute the true serial fraction (wall not covered by any
    # in-flight fetch job) instead of guessing from lap sums
    _tl_on = os.environ.get("WIKICRAWL_TIMELINE") == "1"
    timeline: list[tuple[str, float, float]] = []
    _t_zero = _time.time()

    def _span(name: str, t0: float, t1: float) -> None:
        if _tl_on:
            timeline.append((name, round(t0 - _t_zero, 3), round(t1 - _t_zero, 3)))

    def _lap(key: str, t0: float) -> float:
        t1 = _time.time()
        timings[key] = timings.get(key, 0.0) + (t1 - t0)
        _span(key, t0, t1)
        return t1
    payload_dir = os.path.join(cfg.out_dir, "payload")
    os.makedirs(payload_dir, exist_ok=True)
    if cfg.resume:
        m = ckpt.latest()
        if m is None:
            # crashed before the first commit: nothing is durable — clear
            # the run-scoped state exactly like a fresh run (stale deltas /
            # log segments from the dead attempt must not leak into this one)
            import shutil as _shutil

            for sub in ("payload", "crawl_log", "seen_segments", "retry",
                        "admissions"):
                _shutil.rmtree(os.path.join(cfg.out_dir, sub), ignore_errors=True)
                os.makedirs(os.path.join(cfg.out_dir, sub), exist_ok=True)
        if m:
            wave = m["wave"] + 1
            seq = m["seq"]
            watermark = tuple(m["watermark"])
            metrics.update(m["metrics"])
            seen.load_segments(seen_dir, max_wave=m["wave"])
            # ---- admission-WAL replay (ADVICE r1) -----------------------
            # Every admitted row was journaled under admissions/ by the
            # wave that admitted it (seed admissions synchronously on the
            # driver; link admissions inside the wave's job, which the
            # FIFO commit gate waits for). Frontier backlog on resume =
            # journaled admissions of committed waves MINUS the durable
            # crawl log — re-pushed directly (never re-admitted). Journal
            # files and log segments from waves that never committed are
            # dropped first.
            adm_dir_r = os.path.join(cfg.out_dir, "admissions")
            if os.path.isdir(adm_dir_r):
                for name in list(os.listdir(adm_dir_r)):
                    try:
                        w = int(name.split("-")[1])
                    except (IndexError, ValueError):
                        continue
                    if w > m["wave"]:
                        os.remove(os.path.join(adm_dir_r, name))
            for name in list(os.listdir(log_dir)):
                if not name.endswith(".parquet"):
                    continue
                try:
                    s0 = int(name.split("-")[1].split(".")[0])
                except (IndexError, ValueError):
                    continue
                if s0 > m["seq"]:  # wave never committed: its emission replays
                    os.remove(os.path.join(log_dir, name))
            adm_files = sorted(
                os.path.join(adm_dir_r, f)
                for f in os.listdir(adm_dir_r)
                if f.endswith(".parquet")
            ) if os.path.isdir(adm_dir_r) else []
            if adm_files:
                # STREAMING anti-join (VERDICT r2 item 5): at 10^10
                # admissions neither the journal nor the crawl log fits
                # the driver. The log's url_hashes stream into a bounded-
                # RAM exact probe (the SeenSet's own spill-run machinery:
                # resident sorted array + sorted on-disk runs, memmap
                # searchsorted probes); admission files then stream
                # through it one wave-file at a time. Driver memory is
                # O(resident budget), never O(log + journal).
                from wikicrawl.state.seen import SeenSet as _ProbeSet

                probe_dir = os.path.join(cfg.out_dir, "_resume_probe")
                probe = _ProbeSet(capacity=1 << 20, spill_dir=probe_dir,
                                  max_resident_keys=1 << 22)
                for name in sorted(os.listdir(log_dir)):
                    if name.endswith(".parquet"):
                        h = pq.read_table(
                            os.path.join(log_dir, name), columns=["url_hash"]
                        )["url_hash"].to_numpy(zero_copy_only=False)
                        probe.insert_batch(h.astype(np.uint64))
                for f in adm_files:
                    adm = pq.read_table(f)
                    adm_h = adm["url_hash"].to_numpy(
                        zero_copy_only=False).astype(np.uint64)
                    # seen segments can lag job-side admissions by one
                    # flush; the journal is authoritative — make the seen
                    # set complete
                    seen.insert_batch(adm_h)
                    pend = adm.filter(pa.array(~probe.contains_batch(adm_h)))
                    if pend.num_rows:
                        frontier.push_table(pend)
                import shutil as _shutil

                _shutil.rmtree(probe_dir, ignore_errors=True)
            # staging was cleared above, so every surviving delta must be
            # re-staged at finalize: drop the per-delta staging markers
            for name in os.listdir(payload_dir):
                marker = os.path.join(payload_dir, name, "_staged")
                if os.path.exists(marker):
                    os.remove(marker)
            # drop any payload deltas beyond the last committed wave (an
            # interrupted wave replays into a fresh, consistent delta)
            import shutil as _shutil

            for name in os.listdir(payload_dir):
                try:
                    w = int(name.split("-")[1])
                except (IndexError, ValueError):
                    continue
                if w >= wave:
                    _shutil.rmtree(os.path.join(payload_dir, name), ignore_errors=True)

    # broadcast the corpus tables ONCE; every actor gets them zero-copy.
    # The images table (binary payload) broadcasts only below the size
    # limit; above it the bytes live in hash-bucketed parquet and merge
    # tasks load just the buckets their keys touch (VERDICT r1 item 4).
    _t_setup = _time.time()
    # corpus broadcasts: sitelinks are needed immediately (resolve); the
    # pages HTML and image-bytes tables are only touched by the first
    # fetch job / the finalize merges, so their reads + ray.puts overlap
    # the seed-dedup + resolve warmup in background threads (setup_refs
    # was a ~4 s serial fraction at 120k that did not scale with CPUs)
    import threading as _threading

    _bc: dict = {}

    def _load_images():
        images_path = os.path.join(cfg.corpus_dir, "images.parquet")
        if os.path.getsize(images_path) <= cfg.images_broadcast_limit_bytes:
            # combine_chunks once: every merge task `take`s from this
            # table, and take on a many-chunked binary column pays a
            # per-element chunk search
            _bc["images"] = ("ref", ray.put(
                pq.read_table(images_path).combine_chunks()))
        else:
            bucket_dir = os.path.join(cfg.out_dir, "images_buckets")
            prepare_bucketed_images(images_path, bucket_dir, n_buckets=64)
            _bc["images"] = ("buckets", bucket_dir, 64)

    def _load_pages():
        # The pages table is the big broadcast (~1 GiB in memory at 120k
        # entities): a driver-side read + put was a ~6 s serial ramp that
        # stalled the first fetch waves. Fan the read out over one Ray
        # task per contiguous row-group range instead — each shard lands
        # in plasma from its OWN worker (parallel read AND parallel put,
        # no driver copy), and _cached_wiki reassembles the shards with a
        # zero-copy concat. Single-row-group files (older corpora) keep
        # the driver path; combine_chunks first (a multi-chunk 1 GiB
        # table measured 2.9 s to put vs 0.5 s single-chunk).
        path = os.path.join(cfg.corpus_dir, "pages_html.parquet")
        ng = pq.ParquetFile(path).metadata.num_row_groups
        if ng > 1:
            k = min(ng, 8)
            bounds = [
                list(range(i * ng // k, (i + 1) * ng // k)) for i in range(k)
            ]
            _bc["pages"] = tuple(
                _read_row_groups.remote(path, b) for b in bounds if b
            )
        else:
            _bc["pages"] = (ray.put(pq.read_table(path).combine_chunks()),)

    _bc_threads = [
        _threading.Thread(target=_load_images, daemon=True),
        _threading.Thread(target=_load_pages, daemon=True),
    ]
    for t in _bc_threads:
        t.start()
    sitelinks_ref = ray.put(
        pq.read_table(os.path.join(cfg.corpus_dir, "sitelinks.parquet"))
    )

    def pages_ref_get():
        _bc_threads[1].join()
        return _bc["pages"]

    def images_arg_get():
        _bc_threads[0].join()
        return _bc["images"]

    _lap("setup_refs", _t_setup)

    # ---- single streaming resolve job over the whole owned seed stream ----
    # Round-1 ran one BLOCKING resolver job per wave: at 30k entities the
    # per-wave job launches + driver `ray.get` syncs were a ~6 s serial
    # fraction that did not scale with CPUs. Now resolution is ONE Ray Data
    # streaming execution for the entire run: the driver consumes resolved
    # blocks in seed order while Ray keeps resolving ahead — resolve
    # overlaps admission, fetch and writes of earlier waves.
    #
    # Ordering comes from windowed raw resolve tasks consumed in index
    # order (_resolved_stream), NOT from execution_options.preserve_order:
    # that flag is global to the DataContext, so round-2's use of it also
    # forced ordered execution on EVERY per-wave fetch job (head-of-line
    # blocking on the slowest fetch task — a non-scaling term at 32 cpus).
    _t_setup = _time.time()
    from ray.data import DataContext

    DataContext.get_current().execution_options.preserve_order = False
    slice_rows = cfg.entity_wave if cfg.strict_order else min(1024, cfg.entity_wave)
    fam_set = set(cfg.families) if cfg.families is not None else None
    seed_slices = []
    for sl in owned_seed_batches(cfg.corpus_dir, slice_rows):
        if watermark != (-1, -1):
            wm_rank, wm_order = watermark
            sl = sl.filter(
                pc.or_(
                    pc.greater(sl["family_rank"], wm_rank),
                    pc.and_(
                        pc.equal(sl["family_rank"], wm_rank),
                        pc.greater(sl["seed_order"], wm_order),
                    ),
                )
            )
        if fam_set is not None:
            sl = sl.filter(
                pa.array([f in fam_set for f in sl["family"].to_pylist()])
            )
        if cfg.only_qids is not None:
            sl = sl.filter(pc.is_in(
                sl["wikidata_id"],
                value_set=pa.array(sorted(cfg.only_qids), type=pa.string()),
            ))
        if sl.num_rows:
            seed_slices.append(sl)
    _lap("seed_dedup", _t_setup)

    _t_setup = _time.time()
    if seed_slices:
        resolved_iter = _resolved_stream(seed_slices, sitelinks_ref, robots)
    else:
        resolved_iter = iter(())

    def resolved_waves():
        """Group the ordered resolved stream into entity-aligned waves.

        Throughput mode ramps the first waves (wave/8, doubling up to the
        configured size): the first fetch job launches after ~wave/8
        entities resolve instead of a full wave — the timeline showed the
        first-wave resolve wait as the largest serial ramp-in term (the
        cluster is idle until the first job's fan-out). Strict mode keeps
        fixed waves: the parity oracle's chunk-serial schedule depends on
        the wave boundaries."""
        buf, ents = [], 0
        target = cfg.entity_wave if cfg.strict_order else max(
            cfg.entity_wave // 8, 256
        )
        for tbl in resolved_iter:
            if tbl.num_rows == 0:
                continue
            buf.append(tbl)
            ents += int(
                pc.sum(pc.cast(pc.equal(tbl["lang_rank"], 0), pa.int64())).as_py() or 0
            )
            if ents >= target:
                yield ents, pa.concat_tables(buf)
                buf, ents = [], 0
                target = min(target * 2, cfg.entity_wave)
        if buf:
            yield ents, pa.concat_tables(buf)

    _lap("seed_stream", _t_setup)

    # background pipelining: up to two wave writes in flight (independent
    # delta dirs), while checkpoint commits stay FIFO in a single-worker
    # pool, each gated on its own wave's write future
    from concurrent.futures import ThreadPoolExecutor as _TPE

    writes_pool = _TPE(max_workers=max(1, cfg.write_workers))
    commit_pool = _TPE(max_workers=1)
    pending: list = []
    wave_write_futs: dict[int, list] = {}
    # in-flight staging compactions (CrawlConfig.staging_compact_files);
    # finalize waits on them so a run is never merged half-written
    compact_refs: list = []
    _compacting: dict = {}  # pdir -> in-flight run ref (one per dir, no pile-up)

    # effective threshold: explicit N if set, the auto-arming threshold
    # when None (0/negative disables entirely)
    _compact_threshold = (cfg.staging_compact_files
                          if cfg.staging_compact_files is not None
                          else cfg.staging_compact_auto_files)

    def _compact_tick() -> None:
        if _compact_threshold <= 0:
            return
        for pdir, ref in list(_compacting.items()):
            if ray.wait([ref], timeout=0)[0]:
                del _compacting[pdir]
        for tbl in tables.values():
            staging = os.path.join(tbl.path, "staging")
            if not os.path.isdir(staging):
                continue
            for d in os.listdir(staging):
                pdir = os.path.join(staging, d)
                if not d.startswith("p=") or pdir in _compacting:
                    continue
                small = tuple(sorted(
                    f for f in os.listdir(pdir)
                    if f.endswith(".parquet")
                    and not f.startswith("compact-")))
                if len(small) >= _compact_threshold:
                    ref = _compact_staging_dir.remote(pdir, small)
                    compact_refs.append(ref)
                    _compacting[pdir] = ref
    import copy as _copy
    import threading

    metrics_lock = threading.Lock()
    # per-wave metric DELTAS, merged into committed totals strictly FIFO at
    # manifest-commit time: a wave's manifest reflects exactly waves <= it —
    # never a concurrent later wave's counts (ADVICE r1); `metrics` (the
    # resume-loaded totals) seeds the committed baseline
    wave_deltas: dict[int, dict] = {}
    committed_totals = {k: v for k, v in metrics.items() if k != "timings"}

    def add_delta(w: int, counters: dict | None = None,
                  page_counters: dict | None = None) -> None:
        with metrics_lock:
            d = wave_deltas.setdefault(w, {"page_counters": {}})
            for k, v in (counters or {}).items():
                d[k] = d.get(k, 0) + v
            for k, v in (page_counters or {}).items():
                d["page_counters"][k] = d["page_counters"].get(k, 0) + v

    def merge_committed(w: int) -> dict:
        """FIFO-only (single commit worker): fold wave w's delta into the
        committed totals and return a deep snapshot for its manifest."""
        with metrics_lock:
            d = wave_deltas.pop(w, {"page_counters": {}})
        for k, v in d.items():
            if k == "page_counters":
                pcs = committed_totals.setdefault("page_counters", {})
                for pk, pv in v.items():
                    pcs[pk] = pcs.get(pk, 0) + pv
            else:
                committed_totals[k] = committed_totals.get(k, 0) + v
        return _copy.deepcopy(committed_totals)

    from wikicrawl.stages.crawl_stages import RESOLVED_SCHEMA

    RESOLVED_NAMES = [f.name for f in RESOLVED_SCHEMA]

    def process_emitted(tbl: pa.Table, wave_clock: int):
        nonlocal seq
        seq_start = seq + 1
        n = tbl.num_rows
        full = tbl.append_column(
            "seq", pa.array(np.arange(seq + 1, seq + n + 1, dtype=np.int64))
        )
        seq += n
        add_delta(wave_clock, {"fetched": n})
        # everything below (log write, casts, slicing, the fetch job, the
        # delta staging) runs in the BACKGROUND worker — the driver thread
        # only assigned seqs; per-wave driver serial work is a few µs
        delta = os.path.join(payload_dir, f"wave-{wave_clock:06d}-{seq_start:09d}")

        def job():
            jt0 = _time.time()
            # segment named by its first seq: deterministic, replay-safe
            pq.write_table(
                full.select([f.name for f in S.CRAWL_LOG]).cast(S.CRAWL_LOG),
                os.path.join(log_dir, f"seg-{seq_start:09d}.parquet"),
            )
            jt1 = _lap("job_log_write", jt0)
            in_schema = pa.schema(
                [
                    ("family", pa.string()), ("family_rank", pa.int32()),
                    ("entity_id", pa.string()), ("wikidata_id", pa.string()),
                    ("seed_order", pa.int64()), ("lang", pa.string()),
                    ("lang_rank", pa.int32()), ("page_title", pa.string()),
                    ("depth", pa.int32()), ("seq", pa.int64()),
                ]
            )
            wave_tbl = full.select([f.name for f in in_schema]).cast(in_schema)
            # FUSED raw fetch tasks, one per slice: fetch+extract, link
            # candidates, staging for all five tables, delta part write and
            # counter aggregation all happen inside the task; the job only
            # fans out and folds the returned counters. This replaced the
            # per-wave Ray Data micro-job in round 3: its serial from_arrow
            # puts + per-execution streaming-executor overhead were a
            # measured FIXED cost per wave (~1-2 s) that did not scale with
            # CPUs. The batch functions are unchanged map_batches bodies —
            # only the scheduling substrate differs.
            if cfg.durable_payload:
                os.makedirs(delta, exist_ok=True)
            refs = []
            # a wave smaller than fetch_batch x concurrency (the ramp
            # waves, a short tail) still fans out one task per core —
            # the configured batch is a ceiling, not a floor
            eff_batch = max(64, min(
                cfg.fetch_batch,
                -(-wave_tbl.num_rows // max(1, cfg.fetch_concurrency)),
            ))
            for pi, i in enumerate(range(0, wave_tbl.num_rows, eff_batch)):
                part = (
                    os.path.join(delta, f"part-{pi:05d}.parquet")
                    if cfg.durable_payload else None
                )
                refs.append(_fetch_slice_task.options(**_SPREAD).remote(
                    wave_tbl.slice(i, eff_batch).combine_chunks(),
                    (sitelinks_ref,), (pages_ref_get(),), part, stage_specs,
                    robots if cfg.discover_links else None,
                    cfg.discover_links,
                ))
            jt1 = _lap("job_setup", jt1)
            results = ray.get(refs)
            jt1 = _lap("job_exec", jt1)
            requests = sum(r[1] for r in results)
            with metrics_lock:
                timings["task_cpu"] = timings.get("task_cpu", 0.0) + sum(
                    r[3][0] for r in results
                )
                timings["task_wall"] = timings.get("task_wall", 0.0) + sum(
                    r[3][1] for r in results
                )
            pages_cnt: dict[str, int] = {}
            for r in results:
                for k, c in r[2]:
                    pages_cnt[k] = pages_cnt.get(k, 0) + c
            add_delta(wave_clock, {"requests": requests}, pages_cnt)
            if cfg.discover_links:
                process_links(delta, wave_clock)
            if cfg.durable_payload:
                # staging already happened inside the fetch tasks; the
                # marker lets finalize skip this delta
                with open(os.path.join(delta, "_staged"), "w") as mf:
                    mf.write("1")
            _lap("fetch_extract_write", jt0)

        return job

    # ---- dynamic frontier (north_star link discovery) -------------------
    import pandas as pd

    from wikicrawl.families import LANGS

    disc_lock = threading.Lock()
    disc_state = {"next_order": 0}

    def process_links(delta: str, wave_clock: int) -> None:
        """Admission candidates of a freshly-written delta -> first-wins
        seen-set admission -> frontier push at rank 99.

        Canonicalization, robots gating, hashing and LNK-id derivation all
        happened INSIDE the fetch pipeline's workers
        (``make_link_candidates_fn``); here everything is vectorized Arrow:
        flatten the per-page candidate lists in crawl order, first-occurrence
        dedup by url hash, drop robots-blocked urls, insert the rest. The
        BFS discovery order (_seq, then document position) is preserved by
        the _seq sort + order-preserving list flatten."""
        t = pq.read_table(
            delta,
            columns=["lang", "links", "link_url", "link_host", "link_path",
                     "link_hash", "link_id", "link_ok", "depth", "_seq"],
        ).sort_by("_seq")
        link_urls = t["link_url"].combine_chunks()
        titles = pc.list_flatten(t["links"].combine_chunks())
        parents = pc.list_parent_indices(link_urls)
        urls = pc.list_flatten(link_urls)
        if len(urls) == 0:
            return
        hashes_all = (pc.list_flatten(t["link_hash"].combine_chunks())
                      .to_numpy(zero_copy_only=False).astype(np.uint64))
        ok = (pc.list_flatten(t["link_ok"].combine_chunks())
              .to_numpy(zero_copy_only=False).astype(bool))
        child_depth = pc.add(
            t["depth"].combine_chunks().take(parents), pa.scalar(1, pa.int32())
        )
        # wave-local first-occurrence dedup (the reference's `local` set),
        # vectorized: keep the first row of each url hash in crawl order
        first = ~pd.Series(hashes_all).duplicated().to_numpy()
        if cfg.max_link_depth is not None:
            # depth budget: links beyond the BFS tier never enter the
            # local-dedup/robots accounting (they are simply not candidates)
            within = (child_depth.to_numpy(zero_copy_only=False)
                      <= cfg.max_link_depth)
            first = first & within
        n_robots = int((first & ~ok).sum())
        if n_robots:
            add_delta(wave_clock, {"robots_skipped": n_robots})
        keep = first & ok
        if not keep.any():
            return
        keep_arr = pa.array(keep)
        lang_parent = t["lang"].combine_chunks().take(parents)
        lang_rank_parent = pa.array(
            pd.Series(lang_parent.to_pandas())
            .map({l: i for i, l in enumerate(LANGS)})
            .fillna(0).astype(np.int32)
        )
        ids = pc.filter(pc.list_flatten(t["link_id"].combine_chunks()), keep_arr)
        n_kept = len(ids)

        def const(v, typ):
            return pa.array(np.full(n_kept, v), type=typ) if not isinstance(v, str) \
                else pa.array([v] * n_kept, type=typ)

        tbl = pa.table(
            {
                "family": const("discovered", pa.string()),
                "family_rank": pa.array(np.full(n_kept, 99, dtype=np.int32),
                                        type=pa.int32()),
                "entity_id": ids,
                "wikidata_id": ids,
                "seed_order": pa.array(np.zeros(n_kept, dtype=np.int64)),
                "lang": pc.filter(lang_parent, keep_arr),
                "lang_rank": pc.filter(lang_rank_parent, keep_arr),
                "page_title": pc.filter(titles, keep_arr),
                "canonical_url": pc.filter(urls, keep_arr),
                "host": pc.filter(pc.list_flatten(t["link_host"].combine_chunks()), keep_arr),
                "path": pc.filter(pc.list_flatten(t["link_path"].combine_chunks()), keep_arr),
                "url_hash": pa.array(hashes_all[keep], type=pa.uint64()),
                "status": const("resolved", pa.string()),
                "requests": pa.array(np.zeros(n_kept, dtype=np.int64)),
                "depth": pc.cast(pc.filter(child_depth, keep_arr), pa.int32()),
            },
            schema=RESOLVED_SCHEMA,
        )
        hashes = hashes_all[keep]
        with disc_lock:  # admission + discovery-order assignment are atomic
            new = seen.insert_batch(hashes)
            n_new = int(new.sum())
            start = disc_state["next_order"]
            disc_state["next_order"] += n_new
        add_delta(wave_clock, {"url_dups": int((~new).sum()),
                               "discovered": n_new})
        if not n_new:
            return
        admitted = tbl.filter(pa.array(new))
        so = admitted.schema.get_field_index("seed_order")
        admitted = admitted.set_column(
            so, "seed_order",
            pa.array(np.arange(start, start + n_new), type=pa.int64()),
        )
        journal_admissions(admitted, wave_clock,
                           f"links-{os.path.basename(delta)}")
        frontier.push_table(admitted)

    # ---- admission WAL --------------------------------------------------
    # Every admission is journaled BEFORE its frontier push: seed admissions
    # synchronously on the driver, link admissions inside the wave's job
    # (whose completion gates the FIFO manifest commit). Resume reconstructs
    # the frontier backlog as journal(committed waves) - crawl log — no
    # admitted URL can be silently lost (ADVICE r1), with no dependence on
    # racing background pushes.
    adm_dir = os.path.join(cfg.out_dir, "admissions")
    os.makedirs(adm_dir, exist_ok=True)

    def journal_admissions(tbl: pa.Table, wave_id: int, tag: str) -> None:
        path = os.path.join(adm_dir, f"adm-{wave_id:06d}-{tag}.parquet")
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)

    # fault-injection hook (tests only): hard-kill ONE state-plane shard
    # actor at the top of wave N — mid-run, with committed manifests behind
    # it and an in-flight wave ahead. The crawl FAILS (RayActorError
    # surfaces through the facade); the drill then proves resume=True
    # restores exact parity from manifests + admission WAL + seen segments
    # WITHOUT restarting Ray or re-running committed waves
    # (scripts/shard_death_smoke.py).
    _kill_shard_wave = os.environ.get("WIKICRAWL_KILL_SEEN_SHARD_WAVE")

    _t_prev = _time.time()
    for n_entities, res_tbl in resolved_waves():
        _lap("resolve", _t_prev)
        if _kill_shard_wave is not None and wave == int(_kill_shard_wave):
            ray.kill(seen.shards[0], no_restart=True)
        status = res_tbl["status"]
        n_transient = int(pc.sum(pc.cast(pc.equal(status, "transient"), pa.int64())).as_py() or 0)
        add_delta(wave, {
            "entities": n_entities,
            "requests": int(pc.sum(res_tbl["requests"]).as_py() or 0),
            "transient": n_transient,
            "no_sitelink": int(
                pc.sum(pc.cast(pc.equal(status, "no_sitelink"), pa.int64())).as_py() or 0
            ),
            "robots_skipped": int(
                pc.sum(pc.cast(pc.equal(status, "robots"), pa.int64())).as_py() or 0
            ),
        })
        if n_transient:
            tr = res_tbl.filter(pc.equal(status, "transient"))
            pq.write_table(
                tr.select(["family", "wikidata_id", "entity_id"]),
                os.path.join(retry_dir, f"wave-{wave:06d}.parquet"),
            )
        # robots was gated inside the resolver stage: a disallowed URL never
        # reaches the seen set (oracle semantics); the frontier re-checks at
        # push (defense in depth)
        ready_tbl = res_tbl.filter(pc.equal(status, "resolved"))

        if ready_tbl.num_rows:
            _ta = _time.time()
            hashes = ready_tbl["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
            new = seen.insert_batch(hashes)
            add_delta(wave, {"url_dups": int((~new).sum())})
            admitted_tbl = ready_tbl.filter(pa.array(new))
            _ta = _lap("drv_seen", _ta)
            if admitted_tbl.num_rows:
                journal_admissions(admitted_tbl, wave, "seed")
                _ta = _lap("drv_journal", _ta)
                frontier.push_table(admitted_tbl)
                _lap("drv_fpush", _ta)

        # emission: strict mode drains the frontier before the next wave
        while True:
            _tp = _time.time()
            emitted_tbl = frontier.pop_wave_table(RESOLVED_SCHEMA)
            _lap("drv_fpop", _tp)
            if emitted_tbl is not None and emitted_tbl.num_rows:
                fut = writes_pool.submit(process_emitted(emitted_tbl, wave))
                pending.append(fut)
                wave_write_futs.setdefault(wave, []).append(fut)
            if cfg.strict_order and cfg.discover_links and (
                emitted_tbl is not None and emitted_tbl.num_rows
            ):
                # deterministic BFS: the job pushes discovered links; wait
                # for it so the next pop sees them (parity schedule)
                fut.result()
            if not cfg.strict_order or frontier.backlog() == 0:
                break

        last = res_tbl.slice(res_tbl.num_rows - 1, 1)
        watermark = (
            last["family_rank"][0].as_py(),
            last["seed_order"][0].as_py(),
        )
        # segments flushed synchronously (staged set = exactly this wave's
        # inserts); the manifest COMMITS in the background worker AFTER the
        # wave's payload write (FIFO order) — an orphan segment without its
        # manifest is ignored on resume (load_segments max_wave)
        _ts = _time.time()
        flush_refs = seen.flush_segments_async(seen_dir, wave)
        _lap("drv_seen_flush", _ts)
        manifest = {
            "wave": wave,
            "seq": seq,  # this wave's emissions are already numbered
            "watermark": list(watermark),
            "frontier": frontier.snapshots(),
            "seen_size": seen.size(),
        }
        wfuts = wave_write_futs.pop(wave, [])

        def _commit(w=wave, m=manifest, fs=tuple(wfuts), fl=tuple(flush_refs)):
            for f in fs:  # manifest only after this wave's writes landed
                f.result()
            ray.get(list(fl))  # ... and after its seen segments are durable
            m["metrics"] = merge_committed(w)
            ckpt.commit_wave(w, m)

        pending.append(commit_pool.submit(_commit))
        _compact_tick()
        wave += 1
        if cfg.halt_after_waves is not None and wave >= cfg.halt_after_waves:
            # simulate a crash: committed manifests + journal exist, frontier
            # backlog and un-finalized deltas are simply abandoned
            for fut in pending:
                fut.result()
            writes_pool.shutdown(wait=True)
            commit_pool.shutdown(wait=True)
            # a REAL crash kills driver-owned compaction tasks with the
            # driver; this simulated one leaves the process (and Ray
            # session) alive, so drain in-flight compactors here — else a
            # stale task could os.remove staging originals between a
            # resumed run's finalize glob and its read (ADVICE r4).
            # Value-safe either way (the compact run is written before
            # any removal); this only pins the interleaving.
            if compact_refs:
                ray.get(compact_refs)
            metrics["timings"] = {k: round(v, 2) for k, v in timings.items()}
            return CrawlResult(cfg.out_dir, tables, metrics)
        if wave >= cfg.max_waves:
            break
        _t_prev = _time.time()

    # drain any remaining frontier backlog (non-strict mode tail); in-flight
    # jobs may still DISCOVER more links, so an empty backlog only ends the
    # drain after every pending job has finished and it is still empty
    while True:
        if frontier.backlog() == 0:
            for f in list(pending):
                f.result()
            if frontier.backlog() == 0:
                break
        emitted_tbl = frontier.pop_wave_table(RESOLVED_SCHEMA)
        if emitted_tbl is not None and emitted_tbl.num_rows:
            wfut = writes_pool.submit(process_emitted(emitted_tbl, wave))
            pending.append(wfut)
            tail_flush = seen.flush_segments_async(seen_dir, wave)
            manifest = {
                "wave": wave, "seq": seq, "watermark": list(watermark),
                "frontier": frontier.snapshots(),
                "seen_size": seen.size(),
            }

            def _commit_tail(w=wave, m=manifest, f=wfut, fl=tuple(tail_flush)):
                f.result()
                ray.get(list(fl))
                m["metrics"] = merge_committed(w)
                ckpt.commit_wave(w, m)

            pending.append(commit_pool.submit(_commit_tail))
            wave += 1

    # join the background pipeline (propagates any write error)
    for fut in pending:
        fut.result()
    writes_pool.shutdown(wait=True)
    commit_pool.shutdown(wait=True)
    # final totals = committed totals (every wave committed above); keep any
    # leftover tail delta (a tail pop that never formed a wave) merged too
    for w in sorted(list(wave_deltas)):
        merge_committed(w)
    metrics.clear()
    metrics.update(committed_totals)

    # ---- finalize: compact payload deltas into the five keyed tables ----
    # DRAIN in-flight compaction runs (a merge must not read a half-written
    # run) but launch NO new ones here: folding a dir the merge is about to
    # read pays the same per-file opens PLUS a write and a re-read, strictly
    # after the crawl — measured as a serial, un-timed stall before the
    # merge at 960k/16 cpus. Compaction's value is the DURING-crawl ticks.
    t0 = _time.time()
    if compact_refs:
        n_compacted = sum(ray.get(compact_refs))
        metrics["staging_compacted_files"] = n_compacted
        timings["staging_compacted"] = float(n_compacted)
    t0 = _lap("finalize_compact_wait", t0)
    import glob as _glob

    # deltas were staged by their own write jobs (marker per delta dir);
    # only unstaged ones (e.g. committed waves of a resumed run, whose
    # markers are cleared at startup) need the staging pass here
    unstaged = sorted(
        f
        for d in os.listdir(payload_dir)
        if d.startswith("wave-")
        and not os.path.exists(os.path.join(payload_dir, d, "_staged"))
        for f in _glob.glob(os.path.join(payload_dir, d, "*.parquet"))
    )
    any_delta = any(d.startswith("wave-") for d in os.listdir(payload_dir))
    # ephemeral mode leaves no deltas — staged partitions alone drive the merge
    any_staged = any(
        os.path.isdir(os.path.join(tbl.path, "staging"))
        and any(d.startswith("p=")
                for d in os.listdir(os.path.join(tbl.path, "staging")))
        for tbl in tables.values()
    )
    if unstaged:
        rd.read_parquet(unstaged).map_batches(
            stage_fn, batch_format="pyarrow"
        ).materialize()
    if any_delta or any_staged:
        images_arg = images_arg_get()
        if images_arg[0] == "buckets":
            # co-partition the binary corpus to the OUTPUT partitioning once
            # instead of every merge task reading every bucket — the bucketed
            # attach otherwise costs n_partitions x corpus of aggregate
            # decompress (pipelines/bytes_shuffle.py: design + measurements)
            from wikicrawl.pipelines.bytes_shuffle import (
                shuffle_image_bytes_to_parts,
            )

            images_arg = shuffle_image_bytes_to_parts(
                tables["images_out"].path, images_arg[1], cfg.out_dir)
            t0 = _lap("finalize_bytes_shuffle", t0)
        _merge_staged(tables, images_arg, wave)
        t0 = _lap("finalize_merges", t0)
        if images_arg[0] == "parts":
            import shutil as _shutil

            _shutil.rmtree(images_arg[1], ignore_errors=True)

    metrics["timings"] = {k: round(v, 2) for k, v in timings.items()}
    if _tl_on:
        metrics["timeline"] = list(timeline)
    return CrawlResult(cfg.out_dir, tables, metrics)


def read_crawl_log(out_dir: str) -> pa.Table:
    log_dir = os.path.join(out_dir, "crawl_log")
    files = sorted(
        os.path.join(log_dir, f) for f in os.listdir(log_dir) if f.endswith(".parquet")
    )
    if not files:
        return S.CRAWL_LOG.empty_table()
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    return tbl.sort_by("seq")
