"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; no
``ray.init`` / ``ray.shutdown`` happens here or anywhere in
``activity_files_ray`` library code (bench.py and the pytest fixture
own their sessions).

* ``entry()`` — flagship spatial pipeline on sf0.001 (derived
  trackpoints → cell encode → broadcast PIP join → per-(region, tile)
  counts).
* ``queries()`` — one callable per implemented operator/pipeline
  (SURVEY.md §2 + the spatial/dedup/text/ANN additions).
* ``oracle_sql()`` — matching DuckDB SQL for every SQL-expressible
  query; generated from the same constants as the Ray kernels where
  floats are involved (cell ids, PIP predicates).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from activity_files_ray.pipelines import queries as _q


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return _q.flagship_spatial("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in _q.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: _q.resolve_sql(sql)
        for name, (_fn, sql) in _q.QUERIES.items()
        if sql is not None
    }
