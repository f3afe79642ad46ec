"""One-shot per-entity API: crawl a single Qid end-to-end.

The reference exposes ``f_wikipediaqidtosqleverything(qid, content, langs)``
(wikipedia_functions.py:76-145): run the full per-entity pipeline for one
entity, parallel-safe (no shared checkpoint writes, no counters). This is
the proof that the per-entity stages are cleanly separable from the wave
orchestration — ``crawl_one`` reuses the exact same payload builder and
sink semantics on a single entity, writing into the same keyed tables.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from wikicrawl import schema as S
from wikicrawl.extract import build_payload
from wikicrawl.families import FAMILY_BY_CONTENT, LANGS
from wikicrawl.pipelines.crawl import open_tables
from wikicrawl.stages.crawl_stages import (
    payload_to_entity_images,
    payload_to_image_refs,
    payload_to_movie_format,
    payload_to_pages,
    payload_to_sections,
)
from wikicrawl.vwiki import VirtualWiki


def crawl_one(corpus_dir: str, out_dir: str, wikidata_id: str, content: str,
              entity_id: str | None = None, langs=LANGS) -> dict:
    """Crawl one entity; returns a summary dict. No checkpoint/seen writes."""
    if content not in FAMILY_BY_CONTENT:
        raise ValueError(f"unknown content family {content!r}")
    fam = FAMILY_BY_CONTENT[content]
    wiki = VirtualWiki.load(corpus_dir)
    images_in = pq.read_table(os.path.join(corpus_dir, "images.parquet"))
    idx = {v: i for i, v in enumerate(images_in["image_id"].to_pylist())}
    tables = open_tables(out_dir, n_partitions=8)

    links, _att = wiki.resolve_sitelinks(wikidata_id)
    if links is None:
        return {"wikidata_id": wikidata_id, "status": "transient"}

    summary = {"wikidata_id": wikidata_id, "status": "ok", "langs": {}}
    from wikicrawl.stages.crawl_stages import PAYLOAD_SCHEMA

    rows = {f.name: [] for f in PAYLOAD_SCHEMA}
    for lang in langs:
        title = links.get(lang)
        if not title:
            summary["langs"][lang] = "no_sitelink"
            continue
        p = build_payload(wiki, title, lang, fam.needs_image)
        summary["langs"][lang] = {
            "sections": len(p["sections"]),
            "images": len(p["page_images"]),
            "success": p["success"],
        }
        rows["family"].append(content)
        rows["family_rank"].append(fam.rank)
        rows["entity_id"].append(entity_id or wikidata_id)
        rows["wikidata_id"].append(wikidata_id)
        rows["lang"].append(lang)
        rows["page_title"].append(p["page_title"])
        rows["site_key"].append(p["site_key"])
        rows["page_url"].append(p["page_url"])
        rows["main_image_url"].append(p["main_image_url"])
        rows["http_status"].append(p["http_status"])
        rows["success"].append(p["success"])
        rows["has_content"].append(p["has_content"])
        rows["requests"].append(p["requests"])
        rows["sections"].append([{"title": t, "content": c} for t, c in p["sections"]])
        rows["images"].append(p["page_images"])
        rows["links"].append(p.get("links", []))
        rows["depth"].append(0)
        rows["_seq"].append(len(rows["_seq"]) + 1)

    payload = pa.table(rows, schema=PAYLOAD_SCHEMA)
    if payload.num_rows:
        tables["pages"].merge_insert(payload_to_pages(payload))
        tables["sections"].merge_insert(payload_to_sections(payload))
        refs = payload_to_image_refs(payload)
        take = [idx.get(i) for i in refs["image_id"].to_pylist()]
        src = images_in.take(pa.array(take, type=pa.int64()))
        cols = {n: refs[n] for n in refs.column_names if n != "_seq"}
        for name in ("bytes", "w", "h", "fmt", "phash"):
            cols[name] = src[name]
        tables["images_out"].merge_insert(pa.table(cols, schema=S.IMAGES_OUT))
        tables["entity_images"].merge_insert(payload_to_entity_images(payload))
        tables["movie_format"].merge_insert(payload_to_movie_format(payload))
    return summary
