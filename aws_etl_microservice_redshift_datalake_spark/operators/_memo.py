"""Session-scoped memo for persisted relations shared across queries.

Several operator families (MinHash shingles, sign-LSH buckets) build one
narrow-but-expensive relation that many queries re-read within a session.
Re-persisting per call stacks identical cached copies into executor storage
("Asked to cache already cached data") until eviction pressure slows
everything — so those relations are memoized per (session, table-state).

Round-5 hardening (ADVICE r4): the memo itself must not leak.

- A rewritten corpus at the same sf_dir changes the parquet stat signature;
  the SUPERSEDED entry is unpersisted and dropped on the next lookup, so the
  stale relation can't stay pinned in executor storage forever.
- Entries are purged once their session is STOPPED (the load-bearing check:
  a memoized DataFrame strongly references its session, so the weakref
  below only clears in the unusual case where the memo entry itself was
  dropped first — sessions abandoned WITHOUT ``stop()`` stay pinned by
  their own entries, which is why cleanup keys on the stopped state).
  A recycled ``id()`` can never be mistaken for the old session because
  identity is re-checked through the weakref, not the integer key.
"""

from __future__ import annotations

import threading
import weakref
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# per-(memo, session, sf_dir) build locks: a Spark driver legitimately runs
# queries from many threads, and two threads missing the same key would each
# build+persist (one copy leaks unreferenced in executor storage — the exact
# pathology the memo exists to prevent). A single global lock would serialize
# INDEPENDENT builds (a 9 s IVF train blocking an unrelated shingle build),
# so locks are per key; _LOCKS_MUTEX only guards the tiny lock-table itself.
_LOCKS_MUTEX = threading.Lock()
_LOCKS: dict[tuple, threading.Lock] = {}


def _key_lock(key: tuple) -> threading.Lock:
    with _LOCKS_MUTEX:
        lk = _LOCKS.get(key)
        if lk is None:
            lk = _LOCKS[key] = threading.Lock()
        return lk


def session_memo(
    memo: dict,
    spark: SparkSession,
    sf_dir: str,
    sig: object,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the memoized persisted relation for (``spark``, ``sf_dir``),
    rebuilding when the table-state signature ``sig`` changed. The build is
    persisted WITH a count() materialization barrier: a lazy cache shared by
    several not-yet-materialized leaf stages inside one action makes each
    racing stage recompute AND serialize the same partitions (measured 4×
    re-shingling — the round-4 rule). Thread-safe: concurrent callers of the
    same key block on one build; different keys build in parallel."""
    # purge dead entries: session GC'd (weakref cleared) OR stopped (the
    # memoized DataFrame strongly references its session, so a stopped
    # session would otherwise stay pinned through its own memo entry —
    # executors and their cache are gone either way, nothing to unpersist)
    def _dead(s) -> bool:
        if s is None:
            return True
        try:
            return s.sparkContext._jsc is None
        except Exception:
            return False

    skey = (id(spark), sf_dir)
    with _key_lock((id(memo), *skey)):
        # all dict reads/mutations happen under the table mutex (another
        # key's thread may be touching the same dict concurrently); only
        # the expensive build+materialize runs outside it, still guarded by
        # this key's lock so a second caller of the SAME key blocks and
        # then re-reads a hit instead of double-building
        stale = None
        with _LOCKS_MUTEX:
            for k in [k for k, (ref, _, _) in memo.items() if _dead(ref())]:
                del memo[k]
            ent = memo.get(skey)
            if ent is not None:
                ref, old_sig, df = ent
                if ref() is spark and old_sig == sig:
                    return df
                if ref() is spark:
                    stale = df  # superseded: evict outside the mutex
                del memo[skey]
        if stale is not None:
            # corpus rewritten at the same sf_dir: evict the superseded
            # relation from executor storage before replacing it
            try:
                stale.unpersist()
            except Exception:
                pass
        df = build().persist()
        df.count()
        with _LOCKS_MUTEX:
            memo[skey] = (weakref.ref(spark), sig, df)
        return df
