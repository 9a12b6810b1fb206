"""Process-lifetime staged-table registry.

Expensive derived tables (the co-purchase pair weights, the document
near-dup pair set, trained k-means centroids) are built ONCE per
(process, sf_dir) and re-read by every consumer — the stage-then-consume
shape a 100 TB pipeline uses for any derivation with more than one
downstream job. Each pack keeps its own ``dict`` cache; this module just
REGISTERS those dicts so harnesses (bench passes, tests) can reset every
stage in one call — and, for parquet-backed stages, actually delete the
staged files instead of abandoning them until atexit (ADVICE r14: the
bench's per-pass ``_EDGE_STAGE_CACHE.clear()`` left n_passes copies of
the edge table on disk).
"""

from __future__ import annotations

import shutil

# (cache_dict, values_are_paths)
_REGISTRY: list[tuple[dict, bool]] = []


def register_stage_cache(cache: dict, paths: bool) -> dict:
    """Register a pack-level stage cache. ``paths=True`` means values
    are parquet directories that reset_stage_caches() must rmtree."""
    _REGISTRY.append((cache, paths))
    return cache


def reset_stage_caches() -> None:
    """Clear every registered stage cache, deleting parquet-backed
    stages from disk. Callers must not hold un-materialized DataFrames
    that still read a staged path."""
    for cache, paths in _REGISTRY:
        if paths:
            for p in cache.values():
                shutil.rmtree(p, ignore_errors=True)
        cache.clear()
