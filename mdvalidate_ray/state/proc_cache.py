"""Bounded per-worker-process memo for broadcast state.

Long-lived Ray workers serve many successive queries; each query
``ray.put``s fresh broadcast state (joined tables, Bloom filters,
compiled evaluators), so cache keys derived from ObjectRef hexes NEVER
hit again once the query finishes — an unbounded dict is a slow leak of
potentially 100s of MB per entry.  ``get_or_build`` keeps only the most
recently used ``keep`` entries (insertion-ordered dict as a tiny LRU).
"""

from __future__ import annotations

from typing import Any, Callable


def get_or_build(cache: dict, key: Any, build: Callable[[], Any], *,
                 keep: int = 2) -> Any:
    """Return ``cache[key]``, building and inserting it if absent, and
    evict everything but the ``keep`` most recently used entries."""
    st = cache.get(key)
    if st is None:
        st = build()
    else:
        del cache[key]                     # refresh recency
    cache[key] = st
    while len(cache) > keep:
        cache.pop(next(iter(cache)))
    return st
