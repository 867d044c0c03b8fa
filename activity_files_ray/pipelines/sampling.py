"""Deterministic corpus splitting / sampling (training-data curation).

Hash-based assignment is the scale-correct split: no shuffle, no
state, no coordination — each row's split/sample decision is a pure
function of its id, so the same row lands in the same split on any
cluster size, under task retries, and when the corpus grows (rows
never migrate between splits as data is appended). The hash is
MD5-top-64, the repo's established SQL-replayable convention
(``dedup._md5_64_many``): DuckDB recomputes it bit-identically as
``('0x' || substr(md5(expr), 1, 16))::UBIGINT``, so every split and
sample below has an exact SQL oracle, not a statistical one.

Boundaries are integer-exact: split weights are integers and each
boundary is ``(2^64 * cum_weight) // total_weight`` computed in
Python big-int arithmetic, then inlined into the SQL as a literal —
no float rounding can ever disagree between the two sides.

Reference anchor: the reference library has no sampling surface (it
converts one file at a time); these are the §"beyond the reference"
training-data operators over the same corpus tables.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_U64 = 1 << 64


def md5_u64(values, salt: str = "") -> np.ndarray:
    """MD5-top-64 of ``salt + str(v)`` per value → uint64 array.

    Matches DuckDB ``('0x' || substr(md5('salt' || CAST(v AS
    VARCHAR)), 1, 16))::UBIGINT`` exactly (int64/str inputs)."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        h = hashlib.md5((salt + str(v)).encode()).digest()[:8]
        out[i] = int.from_bytes(h, "big")
    return out


def md5_u64_sql(id_expr: str, salt: str = "") -> str:
    """The DuckDB expression bit-identical to :func:`md5_u64`."""
    inner = f"CAST({id_expr} AS VARCHAR)"
    if salt:
        inner = f"'{salt}' || {inner}"
    return f"('0x' || substr(md5({inner}), 1, 16))::UBIGINT"


def split_boundaries(weights: list[int]) -> list[int]:
    """Cumulative integer boundaries over the u64 hash space.

    ``weights`` are integer proportions (e.g. [80, 10, 10]); boundary
    i is ``(2^64 * cum_i) // total`` — exact big-int math, no floats.
    The final boundary is exactly 2^64 so the splits are exhaustive."""
    total = sum(weights)
    if total <= 0 or any(w < 0 for w in weights):
        raise ValueError("split weights must be non-negative, sum > 0")
    cum, out = 0, []
    for w in weights:
        cum += w
        out.append((_U64 * cum) // total)
    return out


def hash_split(ds, id_col: str, names: list[str], weights: list[int],
               salt: str = "", out_col: str = "split"):
    """Assign every row a deterministic split label by hashed id.

    Scale shape: a pure per-batch ``map_batches`` — zero shuffle,
    zero state; at 10^12 rows this costs one streaming pass and the
    assignment is reproducible on any cluster size / retry schedule.
    Appending data never moves an existing row between splits."""
    if len(names) != len(weights):
        raise ValueError("names and weights must align")
    # np.searchsorted(side='right') puts h == boundary into the NEXT
    # split, matching the SQL's strict `h < boundary` CASE arms. The
    # final boundary is 2^64 (doesn't fit u64, and its arm is the
    # ELSE anyway) so it is excluded before the numpy conversion.
    labels = np.array(names)
    b_cmp = np.array(split_boundaries(weights)[:-1], dtype=np.uint64)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        h = md5_u64(df[id_col].to_numpy(), salt)
        idx = np.searchsorted(b_cmp, h, side="right")
        df = df.copy()
        df[out_col] = labels[idx]
        return df

    return ds.map_batches(assign, batch_format="pandas", batch_size=None)


def split_sql_case(id_expr: str, names: list[str], weights: list[int],
                   salt: str = "") -> str:
    """SQL CASE expression replaying :func:`hash_split` exactly."""
    bounds = split_boundaries(weights)
    h = md5_u64_sql(id_expr, salt)
    arms = "".join(
        f" WHEN {h} < {bounds[i]} THEN '{names[i]}'"
        for i in range(len(names) - 1)
    )
    return f"CASE{arms} ELSE '{names[-1]}' END"


def hash_sample(ds, id_col: str, keep_num: int, keep_den: int,
                salt: str = ""):
    """Deterministic Bernoulli(keep_num/keep_den) sample by hashed id.

    Same scale shape as :func:`hash_split`: one streaming filter
    pass, no shuffle, reproducible and stable under appends — the
    sample of a grown corpus is a superset of the sample of the old
    one. The threshold is integer-exact: keep iff
    ``h < (2^64 * keep_num) // keep_den``."""
    thr = np.uint64((_U64 * keep_num) // keep_den)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        h = md5_u64(df[id_col].to_numpy(), salt)
        return df[h < thr]

    return ds.map_batches(keep, batch_format="pandas", batch_size=None)


def sample_sql_pred(id_expr: str, keep_num: int, keep_den: int,
                    salt: str = "") -> str:
    """SQL predicate replaying :func:`hash_sample` exactly."""
    thr = (_U64 * keep_num) // keep_den
    return f"{md5_u64_sql(id_expr, salt)} < {thr}"
