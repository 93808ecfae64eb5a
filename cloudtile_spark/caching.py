"""Session-scoped persist lifecycle for staged pipelines.

Staged queries persist expensive intermediate frames (dedup/ANN self-join
stages, the adaptive-kNN count tables, the coalesce density table) so a
multi-consumer plan reads the stage once instead of recomputing it per
reference. But a long-lived session (the driver's correctness gate, bench
REPEATS) runs MANY such queries back to back: caches that are never
released accumulate in executor storage memory, evict each other, and
skew later legs (round-2 bench showed 2-3x regressions on legs that ran
after the heavy cached ones, plus `Asked to cache already cached data`
warnings).

Central registry instead of ad-hoc ``.persist()``:

* :func:`stage` persists a frame and records it;
* :func:`stage_view` additionally registers a UNIQUE per-invocation temp
  view name (``<base>_<seq>``) and returns that name, so two queries (or
  two invocations of the same query) never collide on session-global
  view names;
* :func:`release_staged` unpersists everything recorded.

EXECUTION CONTRACT — SERIAL, one query at a time per session
------------------------------------------------------------
Registry queries are wrapped (queries.Query) to call ``release_staged()``
on ENTRY, so each query starts with a clean slate while its OWN staged
frames live until the next query begins — long enough for the caller to
materialize the returned DataFrame. This assumes queries run serially
within a SparkSession: invoking query B's spark_fn releases query A's
staged caches, so a caller that materializes A's result AFTER invoking B
recomputes A's stages from scratch (correct, just slower — persist is an
optimization, never a correctness dependency). Concurrent spark_fn
invocations from multiple threads are NOT supported by this lifecycle;
run each concurrent stream in its own process/session. Callers that want
immediate cleanup (bench legs) call :func:`release_staged` themselves
after collecting.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame

_STAGED: list[DataFrame] = []
_SEQ = itertools.count()


def stage(df: DataFrame, view: str | None = None) -> DataFrame:
    """Persist ``df`` (and register it as temp view ``view`` verbatim if
    given), recording it for a later :func:`release_staged`. Prefer
    :func:`stage_view` when the view name is consumed by later SQL — it
    uniquifies the name per invocation."""
    df.persist()
    if view is not None:
        df.createOrReplaceTempView(view)
    _STAGED.append(df)
    return df


def stage_view(df: DataFrame, base: str) -> str:
    """Persist ``df`` and register it under a unique per-invocation temp
    view name derived from ``base``; returns the actual name. Unique
    names mean a re-invocation (or an interleaved second query) can never
    silently rebind a view another plan still references."""
    name = f"{base}_{next(_SEQ)}"
    df.persist()
    df.createOrReplaceTempView(name)
    _STAGED.append(df)
    return name


def release_staged() -> int:
    """Unpersist every staged frame recorded since the last release.
    Returns the number released. Safe to call with a stopped session."""
    n = len(_STAGED)
    while _STAGED:
        df = _STAGED.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped / frame GC'd — nothing to free
    return n
