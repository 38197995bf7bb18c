"""Bounded memo for expensive host-side builds keyed on buffer identity.

Four ops modules grew the same ~15-line pattern independently (tile /
split / subgraph caches): a dict keyed on ``id()`` of the source edge
buffers plus build parameters, FIFO eviction at a small cap, and the
source buffers PINNED inside the cache entry so a garbage-collected
buffer's id cannot be recycled by a different array and alias the key
(the silent-wrong-result hazard every copy warned about). One helper
now owns the discipline; the per-module wrappers keep their signatures.

Why id()-keyed at all: these builds are O(E log E) host work producing
GBs (tiled graphs, bf16 cells), and the graphs they derive from are
immutable arrays passed repeatedly through K-hop loops and training
epochs — identity is the cheapest exact equality available, and the
pinning rule makes it sound.
"""

from __future__ import annotations

from typing import Callable


class HostBuildCache:
    """id()-keyed, pin-and-evict memo (see module docstring).

    ``get(pins, extra, build)``: ``pins`` are the large source objects
    whose identity keys the entry (and which must stay alive while the
    entry does); ``extra`` is a hashable tuple of build parameters and
    cheap value-based identity (e.g. ``nnz``, ``tobytes()`` of a small
    index array). ``build`` runs on miss.
    """

    def __init__(self, max_entries: int = 8):
        self._store: dict = {}
        self._max = max_entries

    def get(self, pins: tuple, extra: tuple, build: Callable):
        key = tuple(id(p) for p in pins) + tuple(extra)
        hit = self._store.get(key)
        if hit is not None:
            return hit[1]
        value = build()
        if len(self._store) >= self._max:
            self._store.pop(next(iter(self._store)))
        self._store[key] = (pins, value)
        return value

    def __len__(self) -> int:
        return len(self._store)

    def clear(self) -> None:
        """Drop every entry (and the pins keeping sources alive) — for
        callers that know the working set changed, e.g. evicting stale
        device-resident cell buffers when graphs are swapped."""
        self._store.clear()
