"""Ray Data stages of the crawl pipeline (callable classes = actor pools).

Each stage is a class whose ``__init__`` loads its state ONCE per actor
(the reference's module-global session/limiter pattern,
``wikipedia_http.py:53-122``, become actor state) and whose ``__call__``
processes one Arrow batch. Stages:

- :class:`Resolver`    — sitelink resolution (batched wbgetentities analog),
                         explodes entities to (entity, lang) rows with titles,
                         canonical URLs and 64-bit hashes; transient failures
                         become row status, never exceptions (SURVEY §7.5).
- :class:`FetchExtract`— per-(entity, lang) fetch + parse: one HTML parse
                         reused for sections AND captions; chrome/mime
                         filters; lead-image acceptance. Emits a nested
                         payload row (list<struct> sections/images).
- :class:`AttachBytes` — joins exploded image rows with the images input
                         table (broadcast/bucket lookup — the small-side
                         lookup pattern; never a per-batch re-read).

Explode helpers turn the nested payload batch into the five output tables.
"""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from wikicrawl.canonical import canonical_page_url, host_of, url_hash64
from wikicrawl.extract import build_payload
from wikicrawl.families import FAMILY_BY_CONTENT, LANGS
from wikicrawl.sections import extract_format_line
from wikicrawl.vwiki import VirtualWiki


class Resolver:
    """Entity rows -> (entity, lang) rows with resolved titles.

    Output status: "resolved" | "no_sitelink" (entity had none for the lang)
    | "transient" (maxlag exhausted -> retry partition).
    """

    def __init__(self, corpus_dir: str):
        self.wiki = VirtualWiki.load(corpus_dir, with_pages=False)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {
            k: []
            for k in (
                "family", "family_rank", "entity_id", "wikidata_id", "seed_order",
                "lang", "lang_rank", "page_title", "canonical_url", "host",
                "path", "url_hash", "status", "requests",
            )
        }
        for row in batch.to_pylist():
            qid = row["wikidata_id"]
            links, attempts = self.wiki.resolve_sitelinks(qid)

            def emit(lang, lang_rank, title, status, req):
                out["family"].append(row["family"])
                out["family_rank"].append(row["family_rank"])
                out["entity_id"].append(row["entity_id"])
                out["wikidata_id"].append(qid)
                out["seed_order"].append(row["seed_order"])
                out["lang"].append(lang)
                out["lang_rank"].append(lang_rank)
                out["page_title"].append(title or "")
                if title:
                    url = canonical_page_url(title, lang)
                    out["canonical_url"].append(url)
                    out["host"].append(host_of(url))
                    import urllib.parse

                    out["path"].append(urllib.parse.urlparse(url).path)
                    out["url_hash"].append(url_hash64(url))
                else:
                    out["canonical_url"].append("")
                    out["host"].append("")
                    out["path"].append("")
                    out["url_hash"].append(0)
                out["status"].append(status)
                out["requests"].append(req)

            if links is None:
                emit(LANGS[0], 0, None, "transient", attempts)
                continue
            for lang_rank, lang in enumerate(LANGS):
                title = links.get(lang)
                # attempts accounted once per entity (on the first lang row)
                req = attempts if lang_rank == 0 else 0
                if title:
                    emit(lang, lang_rank, title, "resolved", req)
                else:
                    emit(lang, lang_rank, None, "no_sitelink", req)
        schema = pa.schema(
            [
                ("family", pa.string()),
                ("family_rank", pa.int32()),
                ("entity_id", pa.string()),
                ("wikidata_id", pa.string()),
                ("seed_order", pa.int64()),
                ("lang", pa.string()),
                ("lang_rank", pa.int32()),
                ("page_title", pa.string()),
                ("canonical_url", pa.string()),
                ("host", pa.string()),
                ("path", pa.string()),
                ("url_hash", pa.uint64()),
                ("status", pa.string()),
                ("requests", pa.int64()),
            ]
        )
        return pa.table(out, schema=schema)


PAYLOAD_SCHEMA = pa.schema(
    [
        ("family", pa.string()),
        ("family_rank", pa.int32()),
        ("entity_id", pa.string()),
        ("wikidata_id", pa.string()),
        ("lang", pa.string()),
        ("page_title", pa.string()),
        ("site_key", pa.string()),
        ("page_url", pa.string()),
        ("main_image_url", pa.string()),
        ("http_status", pa.int32()),
        ("success", pa.bool_()),
        ("has_content", pa.bool_()),
        ("requests", pa.int64()),
        (
            "sections",
            pa.list_(
                pa.struct([("title", pa.string()), ("content", pa.large_string())])
            ),
        ),
        (
            "images",
            pa.list_(
                pa.struct(
                    [
                        ("display_order", pa.int32()),
                        ("image_id", pa.string()),
                        ("image_url", pa.string()),
                        ("image_url_normalized", pa.string()),
                        ("thumbnail_url", pa.string()),
                        ("media_type", pa.string()),
                        ("file_name", pa.string()),
                        ("commons_title", pa.string()),
                        ("caption", pa.string()),
                    ]
                )
            ),
        ),
    ]
)


class FetchExtract:
    """(entity, lang, title) rows -> nested payload rows."""

    def __init__(self, corpus_dir: str):
        self.wiki = VirtualWiki.load(corpus_dir, with_pages=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {f.name: [] for f in PAYLOAD_SCHEMA}
        for row in batch.to_pylist():
            fam = FAMILY_BY_CONTENT[row["family"]]
            p = build_payload(self.wiki, row["page_title"], row["lang"], fam.needs_image)
            out["family"].append(row["family"])
            out["family_rank"].append(row["family_rank"])
            out["entity_id"].append(row["entity_id"])
            out["wikidata_id"].append(row["wikidata_id"])
            out["lang"].append(row["lang"])
            out["page_title"].append(p["page_title"])
            out["site_key"].append(p["site_key"])
            out["page_url"].append(p["page_url"])
            out["main_image_url"].append(p["main_image_url"])
            out["http_status"].append(p["http_status"])
            out["success"].append(p["success"])
            out["has_content"].append(p["has_content"])
            out["requests"].append(p["requests"])
            out["sections"].append(
                [{"title": t, "content": c} for t, c in p["sections"]]
            )
            out["images"].append(p["page_images"])
        return pa.table(out, schema=PAYLOAD_SCHEMA)


class AttachBytes:
    """Image rows + images input table -> rows extended with bytes/w/h/fmt/phash.

    The images table reference is passed as a ``ray.put`` object ref (read
    zero-copy once per actor in ``__init__``) or as a parquet path; either
    way the lookup index is built ONCE per actor, never per batch."""

    def __init__(self, images_ref=None, images_path: str | None = None):
        import ray

        if images_ref is not None:
            tbl: pa.Table = ray.get(images_ref)
        else:
            tbl = pq.read_table(images_path)
        self.idx: dict[str, int] = {
            v: i for i, v in enumerate(tbl["image_id"].to_pylist())
        }
        self.tbl = tbl

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch["image_id"].to_pylist()
        take = [self.idx.get(r, -1) for r in rows]
        present = pa.array([t >= 0 for t in take])
        take_arr = pa.array([t if t >= 0 else None for t in take], type=pa.int64())
        src = self.tbl.take(take_arr)
        cols = dict(zip(batch.column_names, batch.columns))
        for name in ("bytes", "w", "h", "fmt", "phash"):
            cols[name] = src[name]
        cols["bytes_found"] = present
        return pa.table(cols)


# ------------------------------------------------------------ explodes


def _now_us() -> int:
    return int(datetime.now(timezone.utc).timestamp() * 1_000_000)


def payload_to_pages(batch: pa.Table) -> pa.Table:
    now = _now_us()
    rows = batch.to_pylist()
    from wikicrawl import schema as S

    cols = {f.name: [] for f in S.PAGES}
    for r in rows:
        cols["wikidata_id"].append(r["wikidata_id"])
        cols["lang"].append(r["lang"])
        cols["item_type"].append(r["family"])
        cols["site_key"].append(r["site_key"])
        cols["page_title"].append(r["page_title"])
        cols["page_url"].append(r["page_url"])
        cols["main_image_url"].append(r["main_image_url"] or None)
        cols["page_exists"].append(True)
        cols["http_status"].append(r["http_status"])
        cols["last_crawled_at"].append(now)
        cols["last_success_at"].append(now if r["success"] else None)
    arrays = []
    for f in S.PAGES:
        if isinstance(f.type, pa.TimestampType):
            arrays.append(pa.array(cols[f.name], type=pa.timestamp("us")))
        else:
            arrays.append(pa.array(cols[f.name], type=f.type))
    return pa.Table.from_arrays(arrays, schema=S.PAGES)


def payload_to_sections(batch: pa.Table) -> pa.Table:
    from wikicrawl import schema as S

    cols = {f.name: [] for f in S.SECTIONS}
    for r in batch.to_pylist():
        if not (r["success"] and r["has_content"]):
            continue
        for order, s in enumerate(r["sections"], start=1):
            title, content = s["title"], s["content"].replace("[edit]", "")
            if len(title) > 300:
                title = title[:300]
            cols["wikidata_id"].append(r["wikidata_id"])
            cols["lang"].append(r["lang"])
            cols["display_order"].append(order)
            cols["item_type"].append(r["family"])
            cols["title"].append(title)
            cols["content"].append(content)
    return pa.table(cols, schema=S.SECTIONS)


def payload_to_image_refs(batch: pa.Table) -> pa.Table:
    """Nested images -> flat rows (bytes attached by AttachBytes next)."""
    names = [
        "wikidata_id", "lang", "display_order", "item_type", "image_id",
        "image_url", "image_url_normalized", "thumbnail_url", "media_type",
        "file_name", "commons_title", "caption", "is_main_image",
    ]
    cols = {k: [] for k in names}
    for r in batch.to_pylist():
        main = r["main_image_url"]
        for item in r["images"]:
            cols["wikidata_id"].append(r["wikidata_id"])
            cols["lang"].append(r["lang"])
            cols["display_order"].append(item["display_order"])
            cols["item_type"].append(r["family"])
            cols["image_id"].append(item["image_id"])
            cols["image_url"].append(item["image_url"])
            cols["image_url_normalized"].append(item["image_url_normalized"])
            cols["thumbnail_url"].append(item["thumbnail_url"])
            cols["media_type"].append(item["media_type"])
            cols["file_name"].append(item["file_name"])
            cols["commons_title"].append(item["commons_title"])
            cols["caption"].append(item["caption"])
            cols["is_main_image"].append(bool(main) and item["image_url"] == main)
    schema = pa.schema(
        [
            ("wikidata_id", pa.string()),
            ("lang", pa.string()),
            ("display_order", pa.int32()),
            ("item_type", pa.string()),
            ("image_id", pa.string()),
            ("image_url", pa.string()),
            ("image_url_normalized", pa.string()),
            ("thumbnail_url", pa.string()),
            ("media_type", pa.string()),
            ("file_name", pa.string()),
            ("commons_title", pa.string()),
            ("caption", pa.string()),
            ("is_main_image", pa.bool_()),
        ]
    )
    return pa.table(cols, schema=schema)


def payload_to_entity_images(batch: pa.Table) -> pa.Table:
    from wikicrawl import schema as S

    cols = {f.name: [] for f in S.ENTITY_IMAGES}
    for r in batch.to_pylist():
        fam = FAMILY_BY_CONTENT[r["family"]]
        if fam.needs_image and r["main_image_url"]:
            cols["family"].append(r["family"])
            cols["entity_id"].append(r["entity_id"])
            cols["wikidata_id"].append(r["wikidata_id"])
            cols["image_column"].append(fam.image_column)
            cols["main_image_url"].append(r["main_image_url"])
    return pa.table(cols, schema=S.ENTITY_IMAGES)


def payload_to_movie_format(batch: pa.Table) -> pa.Table:
    from wikicrawl import schema as S

    now = _now_us()
    cols = {f.name: [] for f in S.MOVIE_FORMAT}
    for r in batch.to_pylist():
        fam = FAMILY_BY_CONTENT[r["family"]]
        if not (fam.process_id == 201 and r["lang"] == "fr"):
            continue
        if not (r["success"] and r["has_content"]):
            continue
        for s in r["sections"]:
            title = s["title"][:300]
            if title == "Fiche technique":
                content = s["content"].replace("[edit]", "")
                cols["entity_id"].append(r["entity_id"])
                cols["format_line"].append(extract_format_line(content))
                cols["dat"].append(now)
    arrays = [
        pa.array(cols["entity_id"], type=pa.string()),
        pa.array(cols["format_line"], type=pa.string()),
        pa.array(cols["dat"], type=pa.timestamp("us")),
    ]
    return pa.Table.from_arrays(arrays, schema=S.MOVIE_FORMAT)
