"""Arrow schemas for every table the engine reads or writes.

Input surface (synthesized virtual wiki, FIXTURES.md §1-4) and output surface
(FIXTURES.md §5, mirroring the reference's unique keys
``doc/sql/Wikipedia-tables.sql:24, 69, 105``). The ``images`` input table is
the authoritative shape from BASELINE.json's ``input_hint``.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- inputs

IMAGES = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

SEEDS = pa.schema(
    [
        ("entity_id", pa.string()),
        ("wikidata_id", pa.string()),
        ("family", pa.string()),
        ("family_rank", pa.int32()),
        ("seed_order", pa.int64()),  # position within family by id ASC
    ]
)

SITELINKS = pa.schema(
    [
        ("wikidata_id", pa.string()),
        ("lang", pa.string()),
        ("page_title", pa.string()),
        ("maxlag_fails", pa.int32()),  # virtual wbgetentities fails this many attempts
    ]
)

PAGES_HTML = pa.schema(
    [
        ("lang", pa.string()),
        ("page_title", pa.string()),
        ("host", pa.string()),
        ("html", pa.large_string()),
        ("http_status", pa.int32()),
        ("api_error", pa.string()),  # "" | "maxlag" | "missingtitle"
        ("parse_maxlag_fails", pa.int32()),
        ("main_image_url", pa.string()),  # summary endpoint stand-in ("" = none)
        ("file_names", pa.list_(pa.string())),  # Action-API prop=images stand-in
        ("file_mimes", pa.list_(pa.string())),
    ]
)

# ---------------------------------------------------------------- outputs

PAGES = pa.schema(
    [
        ("wikidata_id", pa.string()),
        ("lang", pa.string()),
        ("item_type", pa.string()),
        ("site_key", pa.string()),
        ("page_title", pa.string()),
        ("page_url", pa.string()),
        ("main_image_url", pa.string()),
        ("page_exists", pa.bool_()),
        ("http_status", pa.int32()),
        ("last_crawled_at", pa.timestamp("us")),
        ("last_success_at", pa.timestamp("us")),
    ]
)

SECTIONS = pa.schema(
    [
        ("wikidata_id", pa.string()),
        ("lang", pa.string()),
        ("display_order", pa.int32()),
        ("item_type", pa.string()),
        ("title", pa.string()),
        ("content", pa.large_string()),
    ]
)

IMAGES_OUT = pa.schema(
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
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("phash", pa.int64()),
    ]
)

ENTITY_IMAGES = pa.schema(  # main-image writeback (per-family entity tables)
    [
        ("family", pa.string()),
        ("entity_id", pa.string()),
        ("wikidata_id", pa.string()),
        ("image_column", pa.string()),
        ("main_image_url", pa.string()),
    ]
)

MOVIE_FORMAT = pa.schema(
    [
        ("entity_id", pa.string()),
        ("format_line", pa.string()),
        ("dat", pa.timestamp("us")),
    ]
)

CRAWL_LOG = pa.schema(
    [
        ("seq", pa.int64()),
        ("canonical_url", pa.string()),
        ("url_hash", pa.uint64()),
        ("host", pa.string()),
        ("family", pa.string()),
        ("entity_id", pa.string()),
        ("wikidata_id", pa.string()),
        ("lang", pa.string()),
    ]
)
