"""Scratch-directory lifecycle: per-process ownership + stale-dir GC.

Every side-effecting demo operator (``sink_*``, compaction, z-order,
the bucketed join's external tables, materialized views, the IVF
serving index) writes under ``<repo>/.scratch``. Round 11's concurrency
fix keyed the IVF index directory by ``applicationId`` so a second
application can never overwrite-delete files a first application is
actively scanning — correct, but it turned every Spark application into
a one-directory disk leak (measured: ~400 directories / 131 MB on a
host after one round of sweeps). This module closes the loop with two
complementary mechanisms:

- **atexit self-clean** — ``owned(path)`` registers a directory as
  owned by THIS process; an ``atexit`` hook removes all owned paths, so
  a cleanly-exiting application reclaims everything it wrote.
- **stale GC** — ``gc_stale()`` runs once per process (triggered by the
  first ``owned()`` call) and removes *unowned* entries whose mtime is
  older than ``SPARK_GRAFT_SCRATCH_TTL`` seconds (default 6 h): the
  crashed-application residue atexit can't cover.

Concurrency contract (pinned by tests/test_concurrent.py and
tests/test_scratch_gc.py): **processes never share a writable scratch
directory** — sink/compact/matview/bucketed paths carry the pid, the
IVF index carries the applicationId — so removing MY directories at
exit can never pull files out from under a sibling application's scan.
The TTL guards *crashed* siblings' residue; live applications stay
ahead of it via **touch-on-reuse** (round-13 ADVICE): ``owned()``
re-touches an already-existing path on every registration (matviews
re-register per access), the bucketed join touches its table files on
the catalog-hit fast path, and the IVF builder re-touches its index on
every cache hit — so a directory written once and re-READ hours later
can never go stale under a long-lived server while a freshly started
sibling sweeps.

At 100 TB the analogue is object-store lifecycle policy: job-scoped
temp prefixes deleted on job completion, plus a bucket TTL rule for
orphans from failed drivers — the same two mechanisms, same split.
"""

from __future__ import annotations

import atexit
import os
import shutil
import threading
import time

#: <repo>/.scratch — single canonical definition (operators re-export).
SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch"
)

#: directories whose CHILDREN are the GC grain: deleting the container
#: wholesale could remove a sibling process's young entry in one shot.
_CONTAINERS = ("matviews", "bucketed", "ingest")

_LOCK = threading.Lock()
_OWNED: set[str] = set()
_HOOKED = False
_GC_RAN = False


def ttl_seconds() -> float:
    """Stale threshold; env-overridable for tests and long-lived hosts."""
    return float(os.environ.get("SPARK_GRAFT_SCRATCH_TTL", 6 * 3600))


def _atexit_clean() -> None:
    for p in list(_OWNED):
        shutil.rmtree(p, ignore_errors=True)


def touch(path: str) -> None:
    """Refresh ``path``'s mtime so a sibling process's TTL sweep sees it
    as young — the keep-alive for scratch state that is written once and
    re-read later (bucketed table files, matview partitions, the IVF
    index). Missing paths are fine (nothing to keep alive yet)."""
    try:
        os.utime(path, None)
    except OSError:
        pass


def owned(path: str) -> str:
    """Register ``path`` as owned by this process (removed at interpreter
    exit) and return it. First call per process also sweeps stale
    residue from crashed applications; an already-existing path is
    re-touched so re-reads keep it younger than any sibling's TTL.
    Idempotent and thread-safe."""
    global _HOOKED
    p = os.path.abspath(path)
    with _LOCK:
        if not _HOOKED:
            atexit.register(_atexit_clean)
            _HOOKED = True
        _OWNED.add(p)
    touch(p)
    gc_stale()
    return p


def disown(path: str) -> None:
    """Drop ``path`` from the atexit set (a caller that deleted it
    early, or a test restoring state)."""
    with _LOCK:
        _OWNED.discard(os.path.abspath(path))


def _candidates() -> list[str]:
    """GC grains: top-level .scratch entries, except containers, whose
    children are the grain instead."""
    if not os.path.isdir(SCRATCH):
        return []
    out = []
    for name in os.listdir(SCRATCH):
        p = os.path.join(SCRATCH, name)
        if name in _CONTAINERS and os.path.isdir(p):
            out.extend(os.path.join(p, c) for c in os.listdir(p))
        else:
            out.append(p)
    return out


def gc_stale(
    ttl: float | None = None, now: float | None = None, force: bool = False
) -> list[str]:
    """Remove unowned scratch entries older than ``ttl`` seconds.

    Runs at most once per process unless ``force`` — the sweep is cheap
    but there is no reason to repeat it on every ``owned()`` call.
    Returns the paths removed (for tests). Removal races between
    concurrent processes are benign (``ignore_errors``)."""
    global _GC_RAN
    with _LOCK:
        if _GC_RAN and not force:
            return []
        _GC_RAN = True
        protected = set(_OWNED)
    cutoff = (now if now is not None else time.time()) - (
        ttl if ttl is not None else ttl_seconds()
    )
    removed = []
    for p in _candidates():
        if os.path.abspath(p) in protected:
            continue
        try:
            if os.path.getmtime(p) >= cutoff:
                continue
        except OSError:
            continue  # vanished under us (sibling GC) — nothing to do
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        else:
            try:
                os.remove(p)
            except OSError:
                pass
        removed.append(p)
    return removed
