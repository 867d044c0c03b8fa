"""Per-stage metrics emission (north_rule: "per-stage metrics
emitted"; reference analog: NormalizationStats / ExportStats,
``/root/reference/lib/src/api/export_stats.dart:29-66``).

Two layers:
* :class:`StageMetrics` — a driver-side collector: wrap each pipeline
  stage with ``timed(...)`` and get a metrics TABLE (stage, partition,
  rows_in, rows_out, wall_s) written alongside outputs as JSONL.
* :func:`ray_stage_stats` — parse ``Dataset.stats()`` into rows so
  Ray's own per-operator wall/cpu numbers land in the same table.
"""

from __future__ import annotations

import json
import os
import re
import time
from typing import Any


class StageMetrics:
    def __init__(self) -> None:
        self.rows: list[dict[str, Any]] = []

    def record(
        self,
        stage: str,
        partition: str = "-",
        rows_in: int | None = None,
        rows_out: int | None = None,
        wall_s: float | None = None,
        **extra: Any,
    ) -> None:
        self.rows.append(
            {
                "stage": stage,
                "partition": partition,
                "rows_in": rows_in,
                "rows_out": rows_out,
                "wall_s": None if wall_s is None else round(wall_s, 4),
                **extra,
            }
        )

    def timed(self, stage: str, fn, *args, partition: str = "-", **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        self.record(stage, partition, wall_s=time.perf_counter() - t0)
        return out

    def to_jsonl(self, path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            for r in self.rows:
                f.write(json.dumps(r, sort_keys=True) + "\n")
        os.replace(tmp, path)

    def to_table(self):
        import pyarrow as pa

        if not self.rows:
            return pa.table(
                {
                    "stage": pa.array([], pa.string()),
                    "partition": pa.array([], pa.string()),
                    "rows_in": pa.array([], pa.int64()),
                    "rows_out": pa.array([], pa.int64()),
                    "wall_s": pa.array([], pa.float64()),
                }
            )
        cols = ["stage", "partition", "rows_in", "rows_out", "wall_s"]
        return pa.table({c: [r.get(c) for r in self.rows] for c in cols})


_OP_RE = re.compile(r"Operator (\d+) (\S+?):? .*?in ([\d.]+)s")


def ray_stage_stats(ds) -> list[dict[str, Any]]:
    """Parse Dataset.stats() into (operator, wall_s) metric rows."""
    try:
        stats = ds.stats()
    except Exception:
        return []
    out = []
    for m in _OP_RE.finditer(stats):
        out.append(
            {"stage": m.group(2).rstrip(":"), "operator_index": int(m.group(1)),
             "wall_s": float(m.group(3))}
        )
    return out
