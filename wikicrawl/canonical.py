"""URL canonicalization + 64-bit hashing for the URL-seen set.

The reference builds page URLs as
``https://{lang}.wikipedia.org/wiki/{quote(title.replace(' ', '_'))}``
(ref: ``wikipedia_crawler.py:825-828``, ``wikipedia_page_writer.py:76-79``).
The seen-set (north_rule) is keyed by canonicalized+hashed wiki URLs: we
canonicalize exactly that way, then hash to a stable 64-bit key that drives
both the bloom/cuckoo filters and hash partitioning of seen-set shards.

Hashing must be deterministic across processes (no PYTHONHASHSEED
dependence), cheap, and well mixed: blake2b(digest_size=8) on the UTF-8
canonical URL.
"""

from __future__ import annotations

import hashlib
import urllib.parse

import numpy as np


def canonical_page_url(page_title: str, lang: str) -> str:
    """Display title -> canonical page URL (spaces to underscores, then
    percent-encoded). Matches the reference byte-for-byte."""
    return (
        f"https://{lang}.wikipedia.org/wiki/"
        f"{urllib.parse.quote(page_title.replace(' ', '_'))}"
    )


def host_of(url: str) -> str:
    return urllib.parse.urlparse(url).netloc


def url_hash64(url: str) -> int:
    """Stable unsigned 64-bit hash of a canonical URL."""
    return int.from_bytes(
        hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest(), "little"
    )


def url_hash64_batch(urls) -> np.ndarray:
    """Vectorized-enough batch hashing (one C-implemented blake2b per URL)."""
    out = np.empty(len(urls), dtype=np.uint64)
    h = hashlib.blake2b
    for i, u in enumerate(urls):
        out[i] = int.from_bytes(h(u.encode("utf-8"), digest_size=8).digest(), "little")
    return out
