"""Lifecycle tracking for operator-internal persisted DataFrames.

Several operators persist an intermediate table because their plan
reads it more than once and an AQE runtime broadcast defeats
ReuseExchange (minhash/simhash/embedding signature tables, span_dedup's
sentence table, unigram/tfidf token tables, pack_offsets' partition
pinning — the last is CORRECTNESS-load-bearing, not just a perf cache).
Those persists are internal: the caller receives a derived DataFrame
and has no handle to unpersist the intermediate, so in a long-lived
multi-query session the blocks accumulate until memory pressure evicts
them (MEMORY_AND_DISK spills rather than OOMs, but disk fills too).

This module is the disposable handle. Every operator routes its
internal persist through :func:`track`. The PER-QUERY tool is
:func:`tracking_scope` — it frees exactly the caches created inside
the scope, after the scope's output is materialized. :func:`release`
is the coarser session-level sweep: it unpersists EVERY tracked handle
globally, so it must only run when NO tracked plan is still awaiting
materialization (releasing another query's not-yet-run cache silently
recomputes its subplan, and for ``pack_offsets`` the partition-pinning
persist is CORRECTNESS-load-bearing — prefer tracking_scope in any
path that interleaves queries). Within a single operator invocation
nothing changes — the cache still lives for the whole plan — so
benchmarks and oracles are unaffected.

References are STRONG on purpose: the operator's local Python wrapper
dies when the operator returns, but the JVM-side cached plan does not
(Spark's cache manager keys on the canonical plan, not on the Python
object), so a weak registry would lose the only unpersist handle while
the blocks live on. The registry is the single owner; ``release()``
both unpersists and drops the references.

``release`` must only run after the output is materialized (collected /
written): Spark caches are lazy, and unpersisting before an action
silently recomputes the subplan — for ``pack_offsets`` that would also
break the partition-pinning correctness guarantee.
"""
from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import DataFrame

_lock = threading.Lock()
_tracked: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an operator-internal persisted DataFrame; returns it."""
    with _lock:
        _tracked.append(df)
    return df


def tracked_count() -> int:
    """Number of tracked (not yet released) persisted handles."""
    with _lock:
        return len(_tracked)


def _unpersist(df: DataFrame) -> bool:
    try:
        df.unpersist()
        return True
    except Exception:  # session already stopped — nothing to free
        return False


def release() -> int:
    """Unpersist every tracked DataFrame (blocking=False); returns how
    many were released. Call AFTER consuming operator output."""
    with _lock:
        dfs, _tracked[:] = _tracked[:], []
    return sum(1 for df in dfs if _unpersist(df))


@contextmanager
def tracking_scope():
    """Scope the caches of the operators invoked inside: on exit,
    unpersist every table THEY tracked (pre-existing handles are left
    alone). Materialize the output before the scope closes."""
    with _lock:
        n_before = len(_tracked)
    try:
        yield
    finally:
        with _lock:
            new, _tracked[n_before:] = _tracked[n_before:], []
        for df in new:
            _unpersist(df)
