"""Lance-table input path (BASELINE.json ``input_hint``: the
production corpus is a Lance table of image+caption rows).

Lance and parquet expose the IDENTICAL Arrow schema to every kernel
downstream — the engine is format-agnostic past the read: all stages
consume Arrow batches via ``map_batches``. This module is the single
dispatch point:

* ``*.lance`` dataset directory → ``ray.data.read_lance`` (Ray's
  native Lance datasource; zero-copy Arrow, column projection and
  fragment-parallel scan like the parquet path). Requires the
  ``pylance`` package — NOT present in this sandbox (no network, no
  pip), so the path is import-gated with an actionable error and
  exercised by tests only up to the dispatch/gating boundary.
* anything else → ``ray.data.read_parquet`` (the sandbox stand-in
  with the same Arrow schema, TESTDATA.md).

At 10^12 rows both readers yield one task per fragment/file group —
the ingest contract (shards ≫ cluster width) is the same.
"""

from __future__ import annotations

import importlib.util


def lance_available() -> bool:
    """True when the pylance package (``import lance``) is present."""
    return importlib.util.find_spec("lance") is not None


def is_lance_path(path: str) -> bool:
    return path.rstrip("/").endswith(".lance")


def read_table(path: str, columns: list[str] | None = None, **kwargs):
    """Column-pruned Dataset from a Lance dataset dir or parquet
    file/dir — the shared ingest entry (see module docstring)."""
    import ray.data as rd

    if is_lance_path(path):
        if not lance_available():
            raise ImportError(
                "reading a Lance dataset requires the 'pylance' package "
                "(pip install pylance); this environment has no network — "
                "use the parquet twin of the table (identical Arrow schema)"
            )
        return rd.read_lance(path, columns=columns, **kwargs)
    return rd.read_parquet(path, columns=columns, **kwargs)
