"""Declarative pipeline requests — the reference's
``ActivityExportRequest`` surface (``/root/reference/lib/src/api/
activity_export_request.dart:12-193`` + ``_runPipeline``,
facade:1469-1596) as a config dataclass + one dispatcher.

Request shapes (facade dispatch analog):
* ``payload``  — bytes in, converted payload out (the ``source`` arm)
* ``points``   — already-parsed tables in, encoded payload out
  (the ``activity`` arm: skip parse)
* ``corpus``   — a Dataset of payload rows in, (encoded Dataset,
  diagnostics Dataset) out (the batch arm, Ray-scaled)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pandas as pd

from ..sources import stage as src_stage
from ..stages import autofix as af
from . import convert as cv


@dataclass
class ConvertRequest:
    """Everything the reference threads through a conversion, in one
    declarative object (ParseFidelityMode/AutoFixOptions/
    EncoderOptions analogs)."""

    to_fmt: str
    from_fmt: str | None = None
    autofix: af.AutoFixOptions = field(default_factory=af.AutoFixOptions)
    validate: bool = True
    encoder_options: dict[str, Any] = field(default_factory=dict)
    # payload-shape inputs
    payload: bytes | None = None
    activity_id: str = "activity"
    # points-shape inputs (skip parse)
    points: pd.DataFrame | None = None
    channels: pd.DataFrame | None = None
    spans: pd.DataFrame | None = None
    # corpus-shape input (ray.data.Dataset of payload rows)
    corpus: Any = None
    # corpus arm only: route the combined convert table through a
    # parquet checkpoint (resumable fork) instead of .materialize()
    checkpoint_dir: str | None = None


def run_request(req: ConvertRequest):
    """Dispatch on request shape (facade:1469-1596 analog).

    payload → (bytes, diagnostics_df); points → (bytes, empty df);
    corpus → (encoded Dataset, diagnostics Dataset).
    """
    shapes = sum(x is not None for x in (req.payload, req.points, req.corpus))
    if shapes != 1:
        raise ValueError("exactly one of payload / points / corpus must be set")
    if req.corpus is not None:
        return cv.convert_corpus(
            req.corpus,
            req.to_fmt,
            autofix=req.autofix,
            validate=req.validate,
            checkpoint_dir=req.checkpoint_dir,
        )
    if req.payload is not None:
        return cv.convert_one(
            req.payload, req.to_fmt, req.activity_id, req.from_fmt, req.autofix
        )
    # points shape: normalize/autofix then encode directly
    fixed = af.autofix_group(req.points, req.autofix)
    kwargs = dict(req.encoder_options)
    if req.spans is not None and req.to_fmt in ("tcx", "fit"):
        kwargs.setdefault("spans", req.spans)
    payload = src_stage.encode_activity(req.to_fmt, fixed, req.channels, **kwargs)
    return payload, pd.DataFrame(
        columns=["activity_id", "severity", "code", "message", "path"]
    )
