"""CLI entry points: generate / crawl / resume / crawl-one / audit / maintenance.

Examples:
    python -m wikicrawl.cli generate /tmp/vwiki --entities 2000
    python -m wikicrawl.cli crawl /tmp/vwiki /tmp/out --wave 1024
    python -m wikicrawl.cli crawl /tmp/vwiki /tmp/out --resume
    python -m wikicrawl.cli crawl-one /tmp/vwiki /tmp/out Q24815 movie
    python -m wikicrawl.cli audit /tmp/out
    python -m wikicrawl.cli shared-main-images /tmp/out [--apply]

CLI scripts own their Ray session (guarded init + shutdown); library code
never initialises Ray.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import logging
    import os

    import ray

    if not ray.is_initialized():
        # RAY_ADDRESS wins so `ray job submit` drives the same CLI on a
        # real cluster (the job runner sets it to the head node); default
        # is a local session for single-box runs. num_cpus only applies
        # locally — a cluster's size is the cluster's.
        address = os.environ.get("RAY_ADDRESS", "local")
        kwargs = dict(address=address, include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus and address == "local":
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="wikicrawl")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate")
    g.add_argument("corpus_dir")
    g.add_argument("--entities", type=int, default=200)
    g.add_argument("--seed", type=int, default=42)

    c = sub.add_parser("crawl")
    c.add_argument("corpus_dir")
    c.add_argument("out_dir")
    c.add_argument("--wave", type=int, default=1024)
    c.add_argument("--resume", action="store_true")
    c.add_argument("--loose-order", action="store_true",
                   help="pipelined waves (throughput config)")
    c.add_argument("--fetch-concurrency", type=int, default=4)
    c.add_argument("--families", default=None,
                   help="comma list for quick-mode scoping")
    c.add_argument("--discover-links", action="store_true",
                   help="dynamic frontier: follow in-body /wiki/ links")
    c.add_argument("--seen-resident-keys", type=int, default=1 << 22,
                   help="per-shard RAM budget for the exact seen store "
                        "(overflow spills to sorted disk runs)")

    o = sub.add_parser("crawl-one")
    o.add_argument("corpus_dir")
    o.add_argument("out_dir")
    o.add_argument("wikidata_id")
    o.add_argument("content")

    a = sub.add_parser("audit")
    a.add_argument("out_dir")

    s = sub.add_parser("shared-main-images")
    s.add_argument("out_dir")
    s.add_argument("--min-entities", type=int, default=3)
    s.add_argument("--apply", action="store_true")

    ch = sub.add_parser("chrome-breakdown")
    ch.add_argument("out_dir")
    ch.add_argument("--apply", action="store_true")

    rs = sub.add_parser("recrawl-stale",
                        help="refresh pages older than the cutoff")
    rs.add_argument("corpus_dir")
    rs.add_argument("out_dir")
    rs.add_argument("--older-than-seconds", type=float, required=True)
    rs.add_argument("--discover-links", action="store_true")

    td = sub.add_parser("training-data",
                        help="documents.parquet -> dedup/sample/decontam/"
                             "chunk -> partitioned parquet")
    td.add_argument("sf_dir")
    td.add_argument("out_dir")

    args = p.parse_args(argv)

    if args.cmd == "generate":
        from wikicrawl.synth import generate

        print(json.dumps(generate(args.corpus_dir, args.entities, args.seed)))
        return 0

    _init_ray(args.num_cpus)
    import ray

    try:
        if args.cmd == "crawl":
            from wikicrawl.pipelines.crawl import CrawlConfig, crawl

            cfg = CrawlConfig(
                corpus_dir=args.corpus_dir,
                out_dir=args.out_dir,
                entity_wave=args.wave,
                resume=args.resume,
                strict_order=not args.loose_order,
                fetch_concurrency=args.fetch_concurrency,
                families=tuple(args.families.split(",")) if args.families else None,
                discover_links=args.discover_links,
                seen_resident_keys=args.seen_resident_keys,
            )
            res = crawl(cfg)
            print(json.dumps(res.metrics))
        elif args.cmd == "training-data":
            from wikicrawl.pipelines.training_data import run as td_run

            print(json.dumps({"out": td_run(args.sf_dir, args.out_dir)}))
        elif args.cmd == "crawl-one":
            from wikicrawl.pipelines.crawl_one import crawl_one

            print(json.dumps(crawl_one(args.corpus_dir, args.out_dir,
                                       args.wikidata_id, args.content)))
        elif args.cmd == "audit":
            from wikicrawl.pipelines.crawl import open_tables
            from wikicrawl.stages.image_stages import decode_audit

            tables = open_tables(args.out_dir, 16)
            ds = tables["images_out"].read_dataset()
            print(json.dumps(decode_audit(ds)))
        elif args.cmd == "shared-main-images":
            from wikicrawl.pipelines.crawl import open_tables
            from wikicrawl.pipelines.maintenance import shared_main_images

            tables = open_tables(args.out_dir, 16)
            out = shared_main_images(tables["pages"], args.min_entities,
                                     apply=args.apply)
            print(out.to_string())
        elif args.cmd == "recrawl-stale":
            import time

            from wikicrawl.pipelines.maintenance import recrawl_stale

            cutoff_us = int((time.time() - args.older_than_seconds) * 1e6)
            print(json.dumps(recrawl_stale(
                args.corpus_dir, args.out_dir, cutoff_us,
                strict_order=False, discover_links=args.discover_links,
            )))
        elif args.cmd == "chrome-breakdown":
            from wikicrawl.pipelines.crawl import open_tables
            from wikicrawl.pipelines.maintenance import chrome_image_breakdown

            tables = open_tables(args.out_dir, 16)
            print(chrome_image_breakdown(tables["images_out"],
                                         apply=args.apply).to_string())
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
