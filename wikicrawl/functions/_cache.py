"""Worker-process-global broadcast cache for STATELESS task stages.

An actor pool pays its spawn cost on every query (~1-2 s of fixed wall at
bench scale); a stateless ``map_batches`` task runs on Ray's long-lived
workers with zero spawn — this cache gives those tasks the same
once-per-worker setup an actor ``__init__`` would (the ``_cached_wiki``
pattern from the crawl stages, generalized): the broadcast object (and any
derived index built from it) is fetched/built once per worker per ref and
reused by every task, with a small LRU bound.
"""

from __future__ import annotations

_CACHE: dict = {}
_MAX_ENTRIES = 8


def broadcast_cached(ref, build=None):
    """Value of ``ray.put`` ref (optionally transformed by ``build``, e.g.
    an index construction), cached per worker process keyed by the ref."""
    key = ref.hex()
    hit = _CACHE.pop(key, None)
    if hit is None:
        import ray

        val = ray.get(ref)
        hit = build(val) if build is not None else val
        while len(_CACHE) >= _MAX_ENTRIES:
            _CACHE.pop(next(iter(_CACHE)))
    _CACHE[key] = hit  # reinsert = most recently used
    return hit
