"""Retention sweep for superseded index generations (r11 verdict
item 4).

The self-growing-index lifecycle accumulates storage in layers: the
immutable base generation, one epoch partition per micro-batch, and —
after compaction — a gen2 fold plus rebuilt verify payloads. The fold
SUPERSEDES the base + epochs + old payloads, but nothing deleted them:
a self-growing index that never reclaims is a storage leak that at
100 TB dwarfs the data it indexes. This module is the reclaim step.

Crash-safety argument (the contract a maintenance job must carry):

1. **Completeness-gated.** Deletes run only after every REQUIRED gen2
   directory verifies complete — Spark's file committer writes
   ``_SUCCESS`` last, after all task outputs are committed and moved
   into place, so its presence is the fold's commit record. An
   interrupted fold (no ``_SUCCESS``) makes vacuum refuse and leaves
   every superseded byte in place; serving continues from the old
   generations untouched.
2. **Delete-last, idempotent.** Nothing reads a superseded directory
   once the fold is complete (serve repoints to gen2 first), so a
   crash MID-delete leaves only unreferenced orphans; re-running the
   vacuum completes the sweep. Missing superseded dirs are skipped,
   not errors — the re-run is a no-op on what's already gone.
3. **Quiescence is the caller's contract.** Vacuum runs between
   drains, like every compacting store's retention (a checkpointed
   availableNow ingest is trivially quiescent after awaitTermination).
   The streaming CHECKPOINT is never deleted: a later drain resumes
   from recorded offsets against the folded base, starting a fresh
   epoch generation — committed batches are never replayed, so folded
   rows cannot re-enter through the at-least-once layer.
"""

from __future__ import annotations

import os
import shutil


class IncompleteGenerationError(RuntimeError):
    """A required gen2 directory is missing its commit record — the
    fold did not complete; nothing was deleted."""


def _is_committed(path: str) -> bool:
    return os.path.isfile(os.path.join(path, "_SUCCESS"))


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _dirs, names in os.walk(path):
        for n in names:
            try:
                total += os.path.getsize(os.path.join(root, n))
            except OSError:
                pass
    return total


def vacuum_superseded(required: list[str],
                      superseded: list[str],
                      dry_run: bool = False) -> dict:
    """Delete ``superseded`` directories once every ``required``
    (gen2) directory verifies complete. Returns
    ``{"deleted": [...], "skipped": [...], "bytes_reclaimed": n}``.
    Raises :class:`IncompleteGenerationError` (deleting NOTHING) when
    any required directory lacks its ``_SUCCESS`` commit record."""
    missing = [p for p in required if not _is_committed(p)]
    if missing:
        raise IncompleteGenerationError(
            f"fold incomplete, refusing to vacuum: no _SUCCESS in "
            f"{missing}")
    deleted, skipped, reclaimed = [], [], 0
    req = {os.path.abspath(p) for p in required}
    for p in superseded:
        if os.path.abspath(p) in req:     # never eat a live generation
            skipped.append(p)
            continue
        if not os.path.isdir(p):          # idempotent re-run
            skipped.append(p)
            continue
        reclaimed += _tree_bytes(p)
        if not dry_run:
            shutil.rmtree(p)
        deleted.append(p)
    return {"deleted": deleted, "skipped": skipped,
            "bytes_reclaimed": reclaimed}
