"""Entity-family configuration (the reference's ``arrprocesses`` /
``CONTENT_CONFIG`` re-expressed as a declarative spec).

The reference drives its crawl from 20 per-family configs
(``wikipedia_crawler.py:600-761``, ``wikipedia_page_writer.py:41-62``): each
has a process id, a content name, an SQL seed builder, and an image-writeback
target. Family order IS the crawl precedence — an entity owned by an earlier
family is anti-joined out of every later family (``wikipedia_crawler.py:71-79``).

Here a family is a row of a static table: ``rank`` is the precedence position
(the frontier priority tier), ``needs_image`` mirrors "imagetable != ''"
(families without an image table never call the summary endpoint —
``wikipedia_crawler.py:801``), and ``id_kind`` says whether the family-local
id is an integer (TMDB tables) or the Qid itself (Wikidata/T2S tables).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class FamilySpec:
    rank: int  # precedence position, 0-based (frontier priority tier)
    process_id: int  # the reference's process id (201..223)
    content: str  # ITEM_TYPE value
    needs_image: bool  # fetch lead image? (imagetable != "" in the reference)
    id_kind: str  # "int" (TMDB) | "qid" (Wikidata/T2S)
    image_column: str  # writeback column name ("" when none)


# Precedence order per arrprocesses (wikipedia_crawler.py:600-761, README:287-310).
FAMILIES: tuple[FamilySpec, ...] = (
    FamilySpec(0, 201, "movie", True, "int", "WIKIPEDIA_POSTER_PATH"),
    FamilySpec(1, 202, "person", True, "int", "WIKIPEDIA_PROFILE_PATH"),
    FamilySpec(2, 203, "item", True, "qid", "WIKIPEDIA_IMAGE_PATH"),
    FamilySpec(3, 204, "serie", True, "int", "WIKIPEDIA_POSTER_PATH"),
    FamilySpec(4, 205, "wikidatacharacter", True, "qid", "WIKIPEDIA_PROFILE_PATH"),
    FamilySpec(5, 209, "other", True, "qid", "WIKIPEDIA_IMAGE_PATH"),
    FamilySpec(6, 210, "list", True, "qid", "WIKIPEDIA_IMAGE_PATH"),
    FamilySpec(7, 211, "movement", True, "qid", "WIKIPEDIA_IMAGE_PATH"),
    FamilySpec(8, 212, "collection", True, "qid", "WIKIPEDIA_IMAGE_PATH"),
    FamilySpec(9, 213, "group", True, "qid", "WIKIPEDIA_IMAGE_PATH"),
    FamilySpec(10, 214, "death", True, "qid", "WIKIPEDIA_IMAGE_PATH"),
    FamilySpec(11, 215, "award", True, "qid", "WIKIPEDIA_IMAGE_PATH"),
    FamilySpec(12, 216, "nomination", True, "qid", "WIKIPEDIA_IMAGE_PATH"),
    FamilySpec(13, 217, "topic", True, "qid", "WIKIPEDIA_IMAGE_PATH"),
    FamilySpec(14, 223, "technical", True, "qid", "WIKIPEDIA_IMAGE_PATH"),
    FamilySpec(15, 218, "character", True, "int", "WIKIPEDIA_PROFILE_PATH"),
    FamilySpec(16, 219, "tmdbcollection", False, "int", ""),
    FamilySpec(17, 220, "episode", False, "int", ""),
    FamilySpec(18, 221, "keyword", False, "int", ""),
    FamilySpec(19, 222, "season", False, "int", ""),
)

# Dynamic-frontier pseudo-family (north_star link discovery): pages reached
# through in-body /wiki/ links rather than a seed table. Rank 99 places them
# AFTER every seed family in the frontier's priority order (BFS tier);
# no lead-image writeback, no Format extraction. NOT in FAMILIES (it has no
# seed table and must not join the precedence/exclusion chains).
DISCOVERED = FamilySpec(99, 299, "discovered", False, "qid", "")

FAMILY_BY_CONTENT = {f.content: f for f in FAMILIES}
FAMILY_BY_CONTENT[DISCOVERED.content] = DISCOVERED
FAMILY_BY_RANK = {f.rank: f for f in FAMILIES}

LANGS = ("en", "fr")  # arrlang = {1: 'en', 2: 'fr'} (wikipedia_crawler.py:800)

# Resolver / fetch retry budgets (data semantics, not transport details):
WBGETENTITIES_MAX_RETRIES = 5  # helpers.py:29
PARSE_MAX_RETRIES = 3  # page_writer.py:124
SITELINK_BATCH = 50  # helpers.py:124, crawler.py:808
