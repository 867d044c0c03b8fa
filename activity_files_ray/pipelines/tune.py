"""Block-granularity tuning shared by the fat per-row kernels.

Ray splits even a small single-file read into ~2×CPU splinter blocks;
for kernels costing ~0.5–5 ms/row the per-task overhead (~25 ms
scheduling+launch on this host) then dominates wall time (measured in
BASELINE.md: 64 blocks → 2.0 s vs 8 blocks → 0.9 s for the same 5 k-doc
minhash pass). These helpers right-size blocks for SMALL corpora only —
at production scale the input is many files, blocks are already fat,
and a repartition would be a pointless all-to-all exchange.
"""

from __future__ import annotations

# corpora at most this many rows are considered "small" — above it the
# input layout is trusted (and dedup switches to its shuffle plans)
SMALL_CORPUS_ROWS = 150_000


def coalesce_small(ds, target_rows_per_block: int = 512, max_blocks: int = 64):
    """Repartition a small Dataset so each block carries enough rows
    to amortize task overhead; pass-through for big inputs (see
    module docstring). ``target_rows_per_block`` ≈ 100–300 ms of
    kernel time is the sweet spot."""
    try:
        n = ds.count()
    except Exception:  # noqa: BLE001 — count unavailable → leave as-is
        return ds
    if 0 < n <= SMALL_CORPUS_ROWS:
        return ds.repartition(
            int(max(1, min(max_blocks, n // max(1, target_rows_per_block))))
        )
    return ds
