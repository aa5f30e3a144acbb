"""Deterministic lifetime management for operator-internal caches.

Operators that ``persist`` an intermediate (a word set feeding several
plan branches) or ``localCheckpoint`` per-iteration state would
otherwise leak block-manager memory for the life of the session: Spark
only reclaims those blocks when the JVM garbage-collects the RDD
reference, and on a large heap that can take minutes — long enough for
a sequence of queries to evict each other's working set. The round-4 →
round-5 bench showed the failure mode concretely: every query that ran
after the Jaccard family (which persisted its word sets and never
released them) measured 3-5x slower than the same query in a fresh
session, purely from accumulated dead cache blocks.

Two tools, both tied to the natural lifetime boundary — the result
DataFrame handed back to the caller:

- :func:`scoped_persist` persists a scratch frame and unpersists it
  when the *result* DataFrame is garbage-collected. The cache lives
  exactly as long as someone can still run the query; a caller that
  keeps the handle keeps the speedup, a caller that drops it frees the
  executors' memory without ever knowing the scratch frame existed.
  Deriving a new frame from the result and dropping the original fires
  the release early — that is SAFE (persist is an optimization; the
  derived plan recomputes), it just loses the reuse, so operators that
  compose should hold the original handle across any eager step.
- :func:`release_local_checkpoint` deterministically drops the blocks
  behind an (eager) ``localCheckpoint`` once nothing can plan against
  it anymore — e.g. iteration k's state after iteration k+1 has
  materialized. Unlike a persist, a released checkpoint CANNOT be
  recomputed (the lineage was truncated), so this must never be driven
  by a Python-object-lifetime signal: frames derived from a result
  keep planning against the final checkpoint's blocks after the
  original handle dies. Only release state that is provably
  superseded; leave the final checkpoint to the JVM's ContextCleaner.

All releases are best-effort and non-blocking: at interpreter shutdown
the JVM gateway may already be gone, and a failed unpersist just means
falling back to Spark's own GC-driven cleanup.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def scoped_persist(
    scratch: DataFrame,
    result: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist ``scratch`` for as long as ``result`` is referenced.

    Returns ``result`` (for tail-position use). MEMORY_AND_DISK by
    default so a 100 TB-scale scratch set spills instead of evicting
    mid-job.
    """
    scratch.persist(level)
    jdf = scratch._jdf

    def _release() -> None:
        try:
            jdf.unpersist(False)
        except Exception:  # noqa: BLE001 — gateway may be gone at shutdown
            pass

    fin = weakref.finalize(result, _release)
    result.__dict__.setdefault("_scoped_releases", []).append((fin, _release))
    return result


def rescope(src: DataFrame, derived: DataFrame) -> DataFrame:
    """Move ``src``'s scoped-persist release hooks onto ``derived``.

    A caller that derives a new frame from a :func:`scoped_persist`
    result and drops the original handle at build time would otherwise
    fire the release before any action runs — the persist evaporates
    exactly when the derived plan still needs it.  ``rescope`` detaches
    the finalizers from ``src`` and re-anchors them to ``derived``, so
    the scratch caches live as long as the frame that will actually be
    executed.  Returns ``derived`` for tail-position use.
    """
    for fin, release in src.__dict__.pop("_scoped_releases", []):
        fin.detach()
        new_fin = weakref.finalize(derived, release)
        derived.__dict__.setdefault("_scoped_releases", []).append((new_fin, release))
    return derived


def _checkpoint_rdd(df: DataFrame):
    """The JVM RDD backing an eager ``localCheckpoint`` (a LogicalRDD
    leaf). Returns None for plans that aren't checkpoint leaves."""
    try:
        return df._jdf.queryExecution().analyzed().rdd()
    except Exception:  # noqa: BLE001 — non-LogicalRDD plan / gateway gone
        return None


def release_local_checkpoint(df: DataFrame) -> None:
    """Immediately drop the blocks behind a localCheckpoint'd frame.

    Only call once every plan derived from ``df`` has either been
    executed or re-checkpointed — after this the data is gone and the
    checkpoint leaf cannot be recomputed (that is localCheckpoint's
    documented contract; this just makes the release prompt instead of
    waiting for JVM GC).
    """
    rdd = _checkpoint_rdd(df)
    if rdd is not None:
        try:
            rdd.unpersist(False)
        except Exception:  # noqa: BLE001
            pass
