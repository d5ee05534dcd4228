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
the scope, after the scope's output is materialized; the driver-facing
surfaces (scripts/verify_oracle.py, bench.py's per-query section) wrap
each query in one, so a 69-query session holds only the active query's
blocks. :func:`release` is the coarser session-level sweep: it
unpersists every tracked handle EXCEPT those tagged
``critical=True`` — persists whose premature unpersist is a
correctness hazard, not just a recompute (pack_offsets' partition pin:
dropping it before the output is materialized can re-execute the range
shuffle with different sampled boundaries and silently corrupt
offsets). Critical handles are only dropped by the scope that owns
them (whose contract is output-materialized-before-exit) or by
``release(include_critical=True)`` at session teardown. Within a
single operator invocation nothing changes — the cache still lives for
the whole plan — so benchmarks and oracles are unaffected.

References are STRONG on purpose: the operator's local Python wrapper
dies when the operator returns, but the JVM-side cached plan does not
(Spark's cache manager keys on the canonical plan, not on the Python
object), so a weak registry would lose the only unpersist handle while
the blocks live on. The registry is the single owner; ``release()``
both unpersists and drops the references.

Scope ownership is CONTEXT-LOCAL (contextvars): a persist tracked by
another thread while a scope is open belongs to that thread's own
context, not to this scope — concurrent operator construction cannot
make one scope unpersist another thread's pending cache. Nested scopes
assign ownership to the innermost open scope.
"""
from __future__ import annotations

import threading
from contextlib import contextmanager
from contextvars import ContextVar

from pyspark.sql import DataFrame

_lock = threading.Lock()
_tracked: list[tuple[DataFrame, bool]] = []  # (df, critical)
# innermost open tracking_scope of THIS context (thread/task-local)
_scope: ContextVar[list | None] = ContextVar("nsp_cache_scope", default=None)


def track(df: DataFrame, critical: bool = False) -> DataFrame:
    """Register an operator-internal persisted DataFrame; returns it.

    ``critical=True`` marks a persist whose premature unpersist breaks
    CORRECTNESS (not just performance): plain :func:`release` refuses
    to drop it. It is freed by the enclosing :func:`tracking_scope`
    (after the scope materializes its output) or by
    ``release(include_critical=True)``.
    """
    entry = (df, critical)
    with _lock:
        _tracked.append(entry)
    scope = _scope.get()
    if scope is not None:
        scope.append(entry)
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


def release(include_critical: bool = False) -> int:
    """Unpersist tracked DataFrames (blocking=False); returns how many
    were released. Call AFTER consuming operator output.

    Critical-tagged persists (see :func:`track`) are kept unless
    ``include_critical=True`` — pass that only when every pending
    output has been materialized (e.g. session teardown).
    """
    with _lock:
        if include_critical:
            dfs, _tracked[:] = [df for df, _ in _tracked], []
        else:
            dfs = [df for df, crit in _tracked if not crit]
            _tracked[:] = [e for e in _tracked if e[1]]
    return sum(1 for df in dfs if _unpersist(df))


@contextmanager
def tracking_scope():
    """Scope the caches of the operators invoked inside: on exit,
    unpersist every table THEY tracked — including critical-tagged
    ones, because the scope contract is that its output is
    materialized before the scope closes. Handles tracked by other
    threads/contexts or pre-existing ones are left alone.
    """
    mine: list = []
    token = _scope.set(mine)
    try:
        yield
    finally:
        _scope.reset(token)
        with _lock:
            _tracked[:] = [
                e for e in _tracked if not any(e is m for m in mine)
            ]
        for df, _ in mine:
            _unpersist(df)
