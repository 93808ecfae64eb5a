"""Session-scoped persist lifecycle for staged pipelines.

Staged queries persist expensive intermediate frames (dedup/ANN self-join
stages, the adaptive-kNN count tables, the coalesce density table) so a
multi-consumer plan reads the stage once instead of recomputing it per
reference. But a long-lived session (the driver's 66-query correctness
gate, bench REPEATS) runs MANY such queries back to back: caches that are
never released accumulate in executor storage memory, evict each other,
and skew later legs (round-2 bench showed 2-3x regressions on legs that
ran after the heavy cached ones, plus `Asked to cache already cached
data` warnings).

Central registry instead of ad-hoc ``.persist()``:

* :func:`stage` persists a frame (optionally registering a temp view) and
  records it;
* :func:`release_staged` unpersists everything recorded.

Registry queries are wrapped (queries.Query) to call ``release_staged()``
on ENTRY, so each query starts with a clean slate while its OWN staged
frames live until the next query begins — long enough for the caller to
materialize the returned DataFrame. Callers that want immediate cleanup
(bench legs) call :func:`release_staged` themselves after collecting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_STAGED: list[DataFrame] = []


def stage(df: DataFrame, view: str | None = None) -> DataFrame:
    """Persist ``df`` (and register it as temp view ``view`` if given),
    recording it for a later :func:`release_staged`."""
    df.persist()
    if view is not None:
        df.createOrReplaceTempView(view)
    _STAGED.append(df)
    return df


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
