"""The crawl pipeline: seeds -> frontier -> fetch/extract -> Lance-style sinks.

Ray-Data-first wave loop (SURVEY §3.4), LSM-shaped writes:

    seeds.parquet ─▶ validity filter ─▶ first-wins precedence dedup
    (ownership aggregate + broadcast semi-join) ─▶ sorted entity stream
    ─▶ per wave (fetch+write pipelined on a background worker):
        map_batches(resolver tasks)   [sitelink resolution, explode langs,
                                       robots gate — worker-global corpus cache]
        ─▶ seen-set admission (sharded bloom/cuckoo/exact actors, first-wins)
        ─▶ frontier push/pop (hash(host) shards: priority heaps, per-host
                              token buckets)
        ─▶ map_batches(fetch tasks)   [one HTML parse: sections+captions]
        ─▶ nested-payload parquet DELTA (one streaming write per wave)
        ─▶ crawl-log segment + seen segments + checkpoint manifest
           (manifest commits after the wave's write; FIFO-ordered)
    ─▶ finalize: ONE compaction per output table — vectorized Arrow explodes
       (list_flatten/parent_indices), AttachBytes actor-pool lookup join,
       shuffle-free staged merge (per-partition staging files + one merge
       task per partition), five tables compacted concurrently.

Scale notes: per-wave cost is O(wave), compaction is O(total) once; the
entity stream never materializes as a driver list (small corpora take a
vectorized Arrow fast path, large ones a distributed sort); bytes flow
straight from stage tasks to their partition's staging bucket — no
all-to-all exchange anywhere in the write path. ``strict_order=True``
reproduces the reference's chunk-serial schedule exactly (parity config);
``strict_order=False`` overlaps waves (throughput config) while per-host
priority order is still enforced by the frontier heaps.
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
    Resolver,
    make_fetch_fn,
    make_resolver_fn,
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
    resume: bool = False
    max_waves: int = 10_000_000
    families: tuple[str, ...] | None = None  # quick-mode scoping: crawl only
    # these content families (exclusion chains still consider ALL seeds)
    hot_hosts: dict | None = None  # {host: n_split} skew-aware sub-queues
    # (north_rule hot-host clause; per-host budget preserved, split across
    # sub-queues; strict per-host order holds per sub-queue)


@dataclass
class CrawlResult:
    out_dir: str
    tables: dict
    metrics: dict = field(default_factory=dict)


QID_PATTERN = r"^Q[0-9]+$"


def owned_seed_stream(corpus_dir: str):
    """seeds -> validity filter -> first-wins precedence dedup -> sorted ds.

    The ownership rule IS the exclusion-chain anti-join
    (wikipedia_crawler.py:71-79): one small aggregate (min family_rank per
    qid, with partial combiners) broadcast back as a semi-join filter —
    instead of 19 chained NOT-IN subqueries, and instead of a per-qid
    map_groups (tiny pandas groups are death by overhead). At 10^10 keys
    the broadcast dict becomes a hash-bucketed join on wikidata_id; the
    aggregate side stays the same.
    """
    from ray.data.aggregate import Min

    seeds_path = os.path.join(corpus_dir, "seeds.parquet")
    ds = rd.read_parquet(seeds_path)
    ds = ds.map_batches(
        lambda t: t.filter(pc.match_substring_regex(t["wikidata_id"], QID_PATTERN)),
        batch_format="pyarrow",
    )
    n_seed_rows = pq.ParquetFile(seeds_path).metadata.num_rows
    if n_seed_rows <= 5_000_000:
        # small-side fast path: one vectorized Arrow group_by beats two Ray
        # job launches for the ownership aggregate (driver holds only
        # (qid, min_rank) pairs, never the full rows)
        t = pq.read_table(seeds_path, columns=["wikidata_id", "family_rank"])
        t = t.filter(pc.match_substring_regex(t["wikidata_id"], QID_PATTERN))
        owner_tbl = t.group_by("wikidata_id").aggregate([("family_rank", "min")])
        owner = dict(
            zip(
                owner_tbl["wikidata_id"].to_pylist(),
                owner_tbl["family_rank_min"].to_pylist(),
            )
        )
    else:  # distributed aggregate with partial combiners
        agg = (
            ds.groupby("wikidata_id")
            .aggregate(Min("family_rank", alias_name="min_rank"))
            .to_pandas()
        )
        owner = dict(zip(agg.wikidata_id, agg.min_rank))
    owner_ref = ray.put(owner)

    def keep_owned(t: pa.Table) -> pa.Table:
        owners = ray.get(owner_ref)
        mask = [
            owners.get(q) == r
            for q, r in zip(t["wikidata_id"].to_pylist(), t["family_rank"].to_pylist())
        ]
        return t.filter(pa.array(mask))

    ds = ds.map_batches(keep_owned, batch_format="pyarrow")
    return ds.sort(["family_rank", "seed_order"])


def owned_seed_batches(corpus_dir: str, wave_size: int):
    """Yield sorted owned-seed batches.

    Small corpora (<= 5M seed rows) take a driver-side vectorized Arrow path
    (filter + ownership semi-join + sort_by on five narrow columns — cheaper
    than two Ray job launches); larger ones stream through the distributed
    ``owned_seed_stream`` sort."""
    seeds_path = os.path.join(corpus_dir, "seeds.parquet")
    if pq.ParquetFile(seeds_path).metadata.num_rows <= 5_000_000:
        t = pq.read_table(seeds_path)
        t = t.filter(pc.match_substring_regex(t["wikidata_id"], QID_PATTERN))
        owner = t.group_by("wikidata_id").aggregate([("family_rank", "min")])
        omap = dict(
            zip(owner["wikidata_id"].to_pylist(), owner["family_rank_min"].to_pylist())
        )
        mask = pa.array(
            [
                omap.get(q) == r
                for q, r in zip(
                    t["wikidata_id"].to_pylist(), t["family_rank"].to_pylist()
                )
            ]
        )
        t = t.filter(mask).sort_by(
            [("family_rank", "ascending"), ("seed_order", "ascending")]
        )
        for i in range(0, t.num_rows, wave_size):
            yield t.slice(i, wave_size)
        return
    stream = owned_seed_stream(corpus_dir)
    yield from stream.iter_batches(batch_size=wave_size, batch_format="pyarrow")


def _merge_table_distributed(ds, table: KeyedTable, clock: int) -> dict:
    """Co-partitioned merge-insert WITHOUT an all-to-all sort:

    1. one streaming pass splits each batch by target partition and appends
       deterministic staging parquet files under ``<table>/staging/p=NN/``
       (no shuffle — bytes move once, straight to their partition's bucket);
    2. one Ray task per touched partition merges its staging files into the
       partition file (single writer per partition, SURVEY §7.4).

    Staging file names derive from the batch's key-hash range, so a replay
    overwrites identical files (resume-safe)."""
    import hashlib as _hashlib

    key0 = table.key[0]
    path, schema, key, prune, order_col, nparts = (
        table.path, table.schema, table.key, table.prune_group,
        table.order_col, table.n_partitions,
    )
    base_schema = pa.schema([f for f in schema if not f.name.startswith("_")])
    staging = os.path.join(path, "staging")
    import shutil as _shutil

    _shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging, exist_ok=True)

    def write_staging(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"part": pa.array([], type=pa.int64())})
        parts = key_partition(t[key0].to_pylist(), nparts)
        touched = []
        for p in sorted(set(parts.tolist())):
            sub = t.filter(pa.array(parts == p))
            # name = hash of the FULL key tuples so distinct batches can
            # never collide (replay overwrites identical content only)
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
        return pa.table({"part": pa.array(touched, type=pa.int64())})

    touched_parts = set(
        ds.map_batches(write_staging, batch_format="pyarrow")
        .to_pandas()["part"].tolist()
    )

    @ray.remote
    def merge_one(p: int) -> dict:
        import pandas as pd

        pdir = os.path.join(staging, f"p={p:05d}")
        files = sorted(
            os.path.join(pdir, f) for f in os.listdir(pdir) if f.endswith(".parquet")
        )
        if not files:
            return {"inserted": 0, "updated": 0, "deleted": 0}
        chunk = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
        t = KeyedTable(path, base_schema, key=key, n_partitions=nparts,
                       prune_group=prune, order_col=order_col)
        return t.merge_partition(p, chunk, clock)

    counters = {"inserted": 0, "updated": 0, "deleted": 0}
    for c in ray.get([merge_one.remote(p) for p in sorted(touched_parts)]):
        for k in counters:
            counters[k] += c[k]
    _shutil.rmtree(staging, ignore_errors=True)
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

        for sub in ("payload", "checkpoints", "crawl_log", "seen_segments", "retry"):
            _shutil.rmtree(os.path.join(cfg.out_dir, sub), ignore_errors=True)

    with open(os.path.join(cfg.corpus_dir, "meta.json")) as f:
        robots = json.load(f)["robots_disallow"]

    tables = open_tables(cfg.out_dir, cfg.n_table_partitions)
    seen = ShardedSeenSet(cfg.n_seen_shards)
    frontier = ShardedFrontier(
        cfg.n_frontier_shards, cfg.host_rate, cfg.host_burst, robots,
        hot_hosts=cfg.hot_hosts,
    )
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

    def _lap(key: str, t0: float) -> float:
        t1 = _time.time()
        timings[key] = timings.get(key, 0.0) + (t1 - t0)
        return t1
    payload_dir = os.path.join(cfg.out_dir, "payload")
    os.makedirs(payload_dir, exist_ok=True)
    if cfg.resume:
        m = ckpt.latest()
        if m:
            wave = m["wave"] + 1
            seq = m["seq"]
            watermark = tuple(m["watermark"])
            metrics.update(m["metrics"])
            seen.load_segments(seen_dir, max_wave=m["wave"])
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

    # broadcast the corpus tables ONCE; every actor gets them zero-copy
    _t_setup = _time.time()
    images_ref = ray.put(pq.read_table(os.path.join(cfg.corpus_dir, "images.parquet")))
    sitelinks_ref = ray.put(
        pq.read_table(os.path.join(cfg.corpus_dir, "sitelinks.parquet"))
    )
    pages_ref = ray.put(
        pq.read_table(os.path.join(cfg.corpus_dir, "pages_html.parquet"))
    )
    _lap("setup_refs", _t_setup)

    _t_setup = _time.time()
    seed_batches = owned_seed_batches(cfg.corpus_dir, cfg.entity_wave)
    _lap("seed_dedup", _t_setup)

    # background pipelining: up to two wave writes in flight (independent
    # delta dirs), while checkpoint commits stay FIFO in a single-worker
    # pool, each gated on its own wave's write future
    from concurrent.futures import ThreadPoolExecutor as _TPE

    writes_pool = _TPE(max_workers=2)
    commit_pool = _TPE(max_workers=1)
    pending: list = []
    wave_write_futs: dict[int, list] = {}
    import threading

    metrics_lock = threading.Lock()

    def process_emitted(rows: list[dict], wave_clock: int):
        nonlocal seq
        seq_start = seq + 1
        for r in rows:
            seq += 1
            r["seq"] = seq
        metrics["fetched"] += len(rows)
        t0 = _time.time()
        from wikicrawl.stages.crawl_stages import RESOLVED_SCHEMA

        emitted_schema = RESOLVED_SCHEMA.append(pa.field("seq", pa.int64()))
        full = pa.Table.from_pylist(rows, schema=emitted_schema)
        # segment named by its first seq: deterministic, replay-safe overwrite
        pq.write_table(
            full.select([f.name for f in S.CRAWL_LOG]).cast(S.CRAWL_LOG),
            os.path.join(log_dir, f"seg-{seq_start:09d}.parquet"),
        )
        in_schema = pa.schema(
            [
                ("family", pa.string()), ("family_rank", pa.int32()),
                ("entity_id", pa.string()), ("wikidata_id", pa.string()),
                ("seed_order", pa.int64()), ("lang", pa.string()),
                ("lang_rank", pa.int32()), ("page_title", pa.string()),
            ]
        )
        wave_tbl = full.select([f.name for f in in_schema]).cast(in_schema)
        # pre-sliced multi-block dataset: tasks fan out WITHOUT a repartition
        # barrier (from_arrow on a list gives one block per slice)
        slices = [
            wave_tbl.slice(i, cfg.fetch_batch)
            for i in range(0, wave_tbl.num_rows, cfg.fetch_batch)
        ]
        fetch_ds = rd.from_arrow(slices)
        # stateless tasks + worker-global corpus cache: no per-wave actor
        # pool startup; state still built once per worker process
        payload = fetch_ds.map_batches(
            make_fetch_fn(sitelinks_ref, pages_ref),
            batch_format="pyarrow",
            batch_size=cfg.fetch_batch,
        ).map_batches(
            lambda t: t.append_column(
                "_wave", pa.array([wave_clock] * t.num_rows, type=pa.int64())
            ),
            batch_format="pyarrow",
        )
        # LSM-style delta: ONE streaming execution per wave writes the nested
        # payload; the five output tables are derived in a single final
        # compaction pass (finalize below) instead of five merges per wave.
        delta = os.path.join(payload_dir, f"wave-{wave_clock:06d}-{seq_start:09d}")

        def job():
            jt0 = _time.time()
            payload.write_parquet(delta)
            # accumulate request totals + per-(family, lang) success counters
            # from the freshly written delta (column-pruned local read —
            # replaces a whole extra finalize pass over all deltas)
            s = pq.read_table(
                delta, columns=["requests", "success", "has_content", "family", "lang"]
            )
            ok = s.filter(pc.and_(s["success"], s["has_content"]))
            import collections

            cnt = collections.Counter(
                zip(ok["family"].to_pylist(), ok["lang"].to_pylist())
            )
            with metrics_lock:
                metrics["requests"] += int(pc.sum(s["requests"]).as_py() or 0)
                pcs = metrics.setdefault("page_counters", {})
                for (f, l), n in cnt.items():
                    k = f"{f}/{l}"
                    pcs[k] = pcs.get(k, 0) + n
            _lap("fetch_extract_write", jt0)

        _lap("emit_prep", t0)
        return job

    _t_prev = _time.time()
    for batch in seed_batches:
        _lap("seed_stream", _t_prev)
        # resume: skip entities at or below the watermark
        if watermark != (-1, -1):
            wm_rank, wm_order = watermark
            mask = pc.or_(
                pc.greater(batch["family_rank"], wm_rank),
                pc.and_(
                    pc.equal(batch["family_rank"], wm_rank),
                    pc.greater(batch["seed_order"], wm_order),
                ),
            )
            batch = batch.filter(mask)
        if cfg.families is not None:
            fam_set = set(cfg.families)
            batch = batch.filter(
                pa.array([f in fam_set for f in batch["family"].to_pylist()])
            )
        if batch.num_rows == 0:
            continue
        metrics["entities"] += batch.num_rows

        t0 = _time.time()
        rbatch = 256
        resolved = (
            rd.from_arrow(
                [batch.slice(i, rbatch) for i in range(0, batch.num_rows, rbatch)]
            )
            .map_batches(
                make_resolver_fn(sitelinks_ref, robots),
                batch_format="pyarrow",
            )
            .to_arrow_refs()
        )
        res_tbl = pa.concat_tables([ray.get(r) for r in resolved])
        t0 = _lap("resolve", t0)
        status = res_tbl["status"]
        metrics["requests"] += int(pc.sum(res_tbl["requests"]).as_py() or 0)
        n_transient = int(pc.sum(pc.cast(pc.equal(status, "transient"), pa.int64())).as_py() or 0)
        metrics["transient"] += n_transient
        metrics["no_sitelink"] += int(
            pc.sum(pc.cast(pc.equal(status, "no_sitelink"), pa.int64())).as_py() or 0
        )
        metrics["robots_skipped"] = metrics.get("robots_skipped", 0) + int(
            pc.sum(pc.cast(pc.equal(status, "robots"), pa.int64())).as_py() or 0
        )
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
            hashes = ready_tbl["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
            new = seen.insert_batch(hashes)
            metrics["url_dups"] += int((~new).sum())
            admitted = ready_tbl.filter(pa.array(new)).to_pylist()
            frontier.push_batch(admitted)

        # emission: strict mode drains the frontier before the next wave
        while True:
            emitted = frontier.pop_wave()
            if emitted:
                fut = writes_pool.submit(process_emitted(emitted, wave))
                pending.append(fut)
                wave_write_futs.setdefault(wave, []).append(fut)
            if not cfg.strict_order or frontier.backlog() == 0:
                break

        last = batch.slice(batch.num_rows - 1, 1)
        watermark = (
            last["family_rank"][0].as_py(),
            last["seed_order"][0].as_py(),
        )
        # segments flushed synchronously (staged set = exactly this wave's
        # inserts); the manifest COMMITS in the background worker AFTER the
        # wave's payload write (FIFO order) — an orphan segment without its
        # manifest is ignored on resume (load_segments max_wave)
        seen.flush_segments(seen_dir, wave)
        manifest = {
            "wave": wave,
            "seq": seq,
            "watermark": list(watermark),
            "metrics": dict(metrics),
            "frontier": frontier.snapshots(),
            "seen_size": seen.size(),
        }
        wfuts = wave_write_futs.pop(wave, [])

        def _commit(w=wave, m=manifest, fs=tuple(wfuts)):
            for f in fs:  # manifest only after this wave's writes landed
                f.result()
            ckpt.commit_wave(w, m)

        pending.append(commit_pool.submit(_commit))
        wave += 1
        if wave >= cfg.max_waves:
            break
        _t_prev = _time.time()

    # drain any remaining frontier backlog (non-strict mode tail)
    while frontier.backlog() > 0:
        emitted = frontier.pop_wave()
        if emitted:
            wfut = writes_pool.submit(process_emitted(emitted, wave))
            pending.append(wfut)
            seen.flush_segments(seen_dir, wave)
            manifest = {
                "wave": wave, "seq": seq, "watermark": list(watermark),
                "metrics": dict(metrics), "frontier": frontier.snapshots(),
                "seen_size": seen.size(),
            }

            def _commit_tail(w=wave, m=manifest, f=wfut):
                f.result()
                ckpt.commit_wave(w, m)

            pending.append(commit_pool.submit(_commit_tail))
            wave += 1

    # join the background pipeline (propagates any write error)
    for fut in pending:
        fut.result()
    writes_pool.shutdown(wait=True)
    commit_pool.shutdown(wait=True)

    # ---- finalize: compact payload deltas into the five keyed tables ----
    t0 = _time.time()
    import glob as _glob

    deltas = sorted(
        f
        for d in os.listdir(payload_dir)
        if d.startswith("wave-")
        for f in _glob.glob(os.path.join(payload_dir, d, "*.parquet"))
    )
    if deltas:
        payload_ds = rd.read_parquet(deltas)
        # (request totals + page counters were accumulated per wave by the
        # write jobs — no extra pass over the deltas needed here)

        images_ds = (
            payload_ds.map_batches(payload_to_image_refs, batch_format="pyarrow")
            .map_batches(
                AttachBytes,
                fn_constructor_kwargs={"images_ref": images_ref},
                batch_format="pyarrow",
                concurrency=min(8, cfg.fetch_concurrency),
                num_cpus=0.5,
            )
            .map_batches(lambda t: t.drop_columns(["bytes_found"]), batch_format="pyarrow")
        )
        # the five table compactions are independent Ray jobs — submit them
        # from driver threads so their (small-task-dominated) schedules overlap
        from concurrent.futures import ThreadPoolExecutor

        jobs = [
            (payload_ds.map_batches(payload_to_pages, batch_format="pyarrow"),
             tables["pages"]),
            (payload_ds.map_batches(payload_to_sections, batch_format="pyarrow"),
             tables["sections"]),
            (images_ds, tables["images_out"]),
            (payload_ds.map_batches(payload_to_entity_images, batch_format="pyarrow"),
             tables["entity_images"]),
            (payload_ds.map_batches(payload_to_movie_format, batch_format="pyarrow"),
             tables["movie_format"]),
        ]
        with ThreadPoolExecutor(max_workers=5) as pool:
            futures = [
                pool.submit(_merge_table_distributed, ds_, tbl_, wave)
                for ds_, tbl_ in jobs
            ]
            for fut in futures:
                fut.result()
        t0 = _lap("finalize_merges", t0)

    metrics["timings"] = {k: round(v, 2) for k, v in timings.items()}
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
