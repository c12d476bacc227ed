"""Shared bounded LRU pool of persisted DataFrames.

Operators that derive a bounded intermediate frame referenced from
several plan branches (dedup postings, BM25 postings, bucket-grained
time-series aggregates) persist it here instead of letting each
branch recompute the full input scan. One pool, three disciplines:

- bounded: evicting the least-recently-used entry unpersists it, so
  executor storage is capped at `max_entries` frames;
- invalidation-aware: keys include the input's file-listing snapshot
  (`df.inputFiles()`), so rewriting the parquet at the same path
  (new part-file names) misses the cache instead of silently serving
  frames computed from the old data;
- `clear()` unpersists everything — pipeline reruns that rewrite in
  place should call it (`dedup.clear_dedup_caches()` delegates here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class BoundedDFCache:
    # 16 entries: the dedup/LSH family alone pins ~7 frames for one
    # corpus (postings, signatures, capped ranked/cands/arrays, LSH
    # cands, minhash arrays), so the former 8-entry bound made any
    # session that mixed two dedup operators (or one plus BM25)
    # evict-and-rebuild on every alternation (round-11 ADVICE).
    # Entries are bounded intermediates (linear in postings, persisted
    # MEMORY_AND_DISK), so doubling the cap costs storage-pool churn
    # at worst, never correctness — eviction still unpersists.
    def __init__(self, max_entries: int = 16):
        import threading

        self._max = max_entries
        self._entries: dict[tuple, DataFrame] = {}
        # guards the dict AND the build: concurrent query threads
        # (a multi-tenant driver) must not double-persist the same
        # frame or evict one mid-insert
        # re-entrant: a build() may itself pool a sub-frame (e.g.
        # triangle_count's undirected-edge pool builds on the pooled
        # knn_graph) — a plain Lock would self-deadlock there
        self._lock = threading.RLock()

    def get_or_build(self, key: tuple, build) -> DataFrame:
        with self._lock:
            df = self._entries.pop(key, None)
            if df is None:
                df = build().persist()
            self._entries[key] = df  # (re)insert at LRU tail
            while len(self._entries) > self._max:
                oldest = next(iter(self._entries))
                self._entries.pop(oldest).unpersist(blocking=False)
            return df

    def clear(self) -> None:
        with self._lock:
            for df in self._entries.values():
                df.unpersist(blocking=False)
            self._entries.clear()


def corpus_key(df: DataFrame) -> tuple:
    """Cache key for an input frame: plan identity + a snapshot of
    the backing files (empty for in-memory frames, whose LocalRelation
    plan already encodes the data in semanticHash)."""
    return (df.semanticHash(), tuple(sorted(df.inputFiles())))


SHARED_CACHE = BoundedDFCache()
