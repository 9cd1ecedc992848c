"""Streaming state/plan audit plumbing (r5 verdict item 2).

The batch registry has `scripts/plan_audit.py` + PLANAUDIT.md; streaming
plans only exist inside a RUNNING query, so the equivalent evidence is
the StreamingQueryProgress feed: which stateful operators ran, how many
state-store rows/bytes they held at the end of the drain, how many rows
the watermark dropped or evicted. This module collects that feed via a
StreamingQueryListener so the audit script and the pytest pins consume
the same numbers the production monitoring story would.
"""

from __future__ import annotations

import json
import time

from pyspark.sql.streaming import StreamingQueryListener


class ProgressCollector(StreamingQueryListener):
    """Captures every StreamingQueryProgress emitted while attached.

    Listener events are delivered on a separate dispatch thread, so
    :meth:`drain` waits until every started query has terminated AND its
    progress events have landed before the caller reads them.
    """

    def __init__(self) -> None:
        self.progress: list[dict] = []
        self.started: set[str] = set()
        self.terminated: set[str] = set()

    def onQueryStarted(self, event) -> None:  # noqa: N802 (listener API)
        self.started.add(event.id)

    def onQueryProgress(self, event) -> None:  # noqa: N802
        self.progress.append(json.loads(event.progress.json))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self.terminated.add(event.id)

    def drain(self, timeout: float = 30.0) -> bool:
        """Wait for the async listener bus to deliver everything.

        Returns True only when every started query has terminated (the
        feed is complete). A False return — deadline expired with
        started ⊄ terminated, or no start event was ever delivered —
        means any summary over ``self.progress`` would tabulate a
        PARTIAL feed; callers (scripts/plan_audit.py) must flag the row
        instead of publishing its numbers.
        """
        deadline = time.time() + timeout
        while time.time() < deadline:
            if self.started and self.started <= self.terminated:
                return True
            time.sleep(0.05)
        return False

    def reset(self) -> None:
        self.progress.clear()
        self.started.clear()
        self.terminated.clear()


def summarize(progress: list[dict]) -> dict:
    """Aggregate a progress feed into the audit row shape:

    - n_queries / n_batches: how many streaming queries the registry
      entry ran and how many micro-batches they took;
    - input_rows: total rows the sources delivered;
    - state operators: per (query, operator-index) the LAST batch's
      numRowsTotal (the state the store holds at drain end) and the
      summed evictions/watermark drops across batches — the numbers
      that decide whether a 100 TB/day deployment's state store grows
      without bound.
    """
    by_query: dict[str, list[dict]] = {}
    for p in progress:
        by_query.setdefault(p.get("id", "?"), []).append(p)
    ops: list[dict] = []
    input_rows = 0
    n_batches = 0
    for qid, plist in by_query.items():
        plist.sort(key=lambda p: p.get("batchId", 0))
        n_batches += len(plist)
        input_rows += sum(int(p.get("numInputRows", 0)) for p in plist)
        # Key by (operatorName, index) rather than bare list index: if a
        # query's batches report differing stateOperators lists (e.g. an
        # empty array interleaved, or an operator renamed across a
        # restart), positional alignment would sum different operators
        # under one row. The name+position pair only merges entries that
        # are genuinely the same operator at the same plan slot.
        per_key: dict[tuple[str, int], dict] = {}
        for p in plist:
            for i, so in enumerate(p.get("stateOperators", [])):
                name = so.get("operatorName") or f"op{i}"
                acc = per_key.setdefault((name, i), {
                    "last": None, "removed": 0, "dropped": 0,
                    "updated": 0, "mem": 0,
                })
                acc["last"] = so  # plist is batchId-sorted: last wins
                acc["removed"] += int(so.get("numRowsRemoved", 0))
                acc["dropped"] += int(so.get("numRowsDroppedByWatermark", 0))
                acc["updated"] += int(so.get("numRowsUpdated", 0))
                acc["mem"] = max(acc["mem"], int(so.get("memoryUsedBytes", 0)))
        for (name, _i), acc in sorted(per_key.items(), key=lambda kv: kv[0][1]):
            ops.append({
                "operator": name,
                "final_state_rows": int(acc["last"].get("numRowsTotal", 0)),
                "rows_updated": acc["updated"],
                "rows_removed": acc["removed"],
                "dropped_by_watermark": acc["dropped"],
                "peak_state_bytes": acc["mem"],
            })
    return {
        "n_queries": len(by_query),
        "n_batches": n_batches,
        "input_rows": input_rows,
        "state_operators": ops,
    }
