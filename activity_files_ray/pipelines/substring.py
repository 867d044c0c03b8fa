"""Corpus-scale EXACT substring/paragraph dedup (r4 verdict item 1).

MinHash/SimHash catch near-duplicate DOCUMENTS; repeated passages
inside otherwise-distinct documents need SEQUENCE-level exact dedup
(the motivation is public: Lee et al. 2021, "Deduplicating Training
Data Makes Language Models Better"; the fingerprint-bucket plan is
the rolling-hash / winnowing family, Schleimer et al., SIGMOD 2003).

Two passes, neither of which ever materializes window TEXT for the
whole corpus:

  phase 1 — fingerprint pass (no text leaves the doc): every
    stride-aligned W-token window hashes to a 64-bit md5 fp
    (``dedup._md5_64_many`` — the SQL-replayable hash family);
    (fp, doc_id) pairs are deduped per batch, then two
    ``bucketed_aggregate`` exchanges produce per-fp DISTINCT-doc
    counts, HAVING >= 2 applied inside the bucket merge. Shuffle
    rows are 16 bytes each, ~n_tokens per doc at stride 1.

  phase 2 — extract pass: the candidate fp set (typically a tiny
    fraction of windows — boilerplate/shared paragraphs) is
    broadcast ONCE via ``ray.put`` as a sorted int64 array and
    resolved per worker (actor-pool ``__init__``); a rescan emits
    (fp, win, doc_id, pos) rows ONLY for candidate fps, and a
    ``groupby(fp)`` co-locates each candidate's occurrences so the
    EXACT verify (group by the window STRING — md5 collisions split
    here) runs inside the group. The driver never sees window text.

Partitioning assumptions (documented per the task brief):
  * a document is one row (windows never straddle batches);
  * the candidate set fits the object store (loud raise past
    ``broadcast_max``; at higher duplication shard the candidate
    array and run phase 2 per shard — same plan, k rounds);
  * per-fp group size = occurrences of one shared window; a
    boilerplate window repeated across millions of docs makes a hot
    group — ``max_group`` caps emission per fp (None = exact).

``stride`` > 1 is the approximate scale knob (windows every stride
tokens; stride <= W still guarantees any shared passage of
>= 2·W − 1 tokens shares an aligned window). Default stride=1 is
EXACT for passages >= W tokens and is what the DuckDB oracle replays.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd

from . import agg
from .dedup import _md5_64_many
from ..functions.text import _TOKEN_RE

DEFAULT_W = 8

_EMPTY_OCC = pd.DataFrame(
    {
        "doc_id": pd.Series(dtype="int64"),
        "pos": pd.Series(dtype="int64"),
        "n_docs": pd.Series(dtype="int64"),
    }
)


def _doc_windows(text: str, w: int, stride: int) -> tuple[list[str], np.ndarray]:
    """All stride-aligned w-token window strings + their 0-based
    start-token positions for one document."""
    toks = _TOKEN_RE.findall(text or "")
    n = len(toks) - w + 1
    if n <= 0:
        return [], np.empty(0, dtype=np.int64)
    pos = np.arange(0, n, stride, dtype=np.int64)
    return [" ".join(toks[p : p + w]) for p in pos], pos


def _fp_of(wins: list[str]) -> np.ndarray:
    return _md5_64_many(wins).astype(np.int64)


class _CandidateExtractor:
    """Phase-2 actor: holds the broadcast sorted candidate-fp array
    (resolved once per actor) and emits (fp, win, doc_id, pos) rows
    only for windows whose fp is a candidate."""

    def __init__(self, cand_ref: Any, w: int, stride: int, id_col: str, text_col: str):
        import ray

        self.cands = ray.get(cand_ref) if type(cand_ref).__name__ == "ObjectRef" else cand_ref
        self.w, self.stride = w, stride
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, fps, poss, wins = [], [], [], []
        for did, txt in zip(df[self.id_col], df[self.text_col]):
            ws, pos = _doc_windows(txt, self.w, self.stride)
            if not ws:
                continue
            fp = _fp_of(ws)
            ix = np.searchsorted(self.cands, fp)
            ix[ix >= len(self.cands)] = len(self.cands) - 1 if len(self.cands) else 0
            hit = (
                self.cands[ix] == fp if len(self.cands) else np.zeros(len(fp), bool)
            )
            for j in np.flatnonzero(hit):
                ids.append(did)
                fps.append(fp[j])
                poss.append(pos[j])
                wins.append(ws[j])
        return pd.DataFrame(
            {
                "fp": np.asarray(fps, dtype=np.int64),
                "win": pd.Series(wins, dtype="object"),
                "doc_id": np.asarray(ids, dtype=np.int64),
                "pos": np.asarray(poss, dtype=np.int64),
            }
        )


def substring_dupes(
    ds,
    w: int = DEFAULT_W,
    stride: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_max: int = 10_000_000,
    max_group: int | None = None,
    n_buckets: int | None = None,
):
    """Dataset(doc_id, text) → Dataset(doc_id, pos, n_docs): one row
    per w-token window occurrence whose EXACT window string appears
    in >= 2 distinct documents; ``n_docs`` is that string's distinct
    doc count. Returns a Dataset (duplicated-window volume tracks
    corpus size — stays distributed)."""
    import ray

    def fp_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids, fps = [], []
        for did, txt in zip(df[id_col], df[text_col]):
            ws, _pos = _doc_windows(txt, w, stride)
            if not ws:
                continue
            fp = np.unique(_fp_of(ws))
            fps.append(fp)
            ids.append(np.full(len(fp), did, dtype=np.int64))
        if not fps:
            return pd.DataFrame(
                {"fp": pd.Series(dtype="int64"), "doc_id": pd.Series(dtype="int64")}
            )
        return pd.DataFrame(
            {"fp": np.concatenate(fps), "doc_id": np.concatenate(ids)}
        )

    pairs = ds.map_batches(fp_pairs, batch_format="pandas", batch_size=None)
    # exact distinct-doc count per fp: collapse (fp, doc_id) first
    # (robust to duplicate doc rows), then count per fp with the
    # HAVING filter applied inside the bucket merge
    uniq = agg.bucketed_aggregate(
        pairs, ["fp", "doc_id"], {"n": ("", "count")}, n_buckets=n_buckets
    )
    cand_ds = agg.bucketed_aggregate(
        uniq,
        ["fp"],
        {"nd": ("", "count")},
        n_buckets=n_buckets,
        having=lambda out: out[out["nd"] >= 2],
    )
    cand = cand_ds.to_pandas()
    cand = (
        cand["fp"].to_numpy(np.int64)
        if "fp" in cand.columns
        else np.empty(0, dtype=np.int64)  # all-empty buckets drop schema
    )
    if len(cand) == 0:  # no window shared by 2 docs anywhere
        import ray.data as rd

        return rd.from_pandas(_EMPTY_OCC.copy())
    if len(cand) > broadcast_max:
        raise MemoryError(
            f"substring_dupes: {len(cand)} candidate fingerprints exceed "
            f"broadcast_max={broadcast_max}; shard the candidate set and "
            "run the extract pass per shard"
        )
    cand_ref = ray.put(np.sort(cand))

    occ = ds.map_batches(
        _CandidateExtractor,
        fn_constructor_kwargs={
            "cand_ref": cand_ref,
            "w": w,
            "stride": stride,
            "id_col": id_col,
            "text_col": text_col,
        },
        batch_format="pandas",
        batch_size=None,
        concurrency=(1, 8),
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _win, sub in g.groupby("win", sort=False):
            nd = sub["doc_id"].nunique()
            if nd < 2:
                continue  # md5 collision artifact or single-doc repeat
            keep = sub if max_group is None else sub.head(max_group)
            outs.append(
                pd.DataFrame(
                    {
                        "doc_id": keep["doc_id"].to_numpy(np.int64),
                        "pos": keep["pos"].to_numpy(np.int64),
                        "n_docs": np.full(len(keep), nd, dtype=np.int64),
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "pos": pd.Series(dtype="int64"),
                    "n_docs": pd.Series(dtype="int64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    return occ.groupby("fp").map_groups(verify, batch_format="pandas")


def merge_spans(occ_ds, w: int = DEFAULT_W):
    """(doc_id, pos) occurrences → per-doc MAXIMAL duplicated spans:
    merge the [pos, pos+w) windows that overlap or touch (gap <= w)
    into (doc_id, start_tok, end_tok) islands — the span output a
    dedup job actually cuts from documents. One doc_id exchange;
    vectorized island detection per group."""

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        pos = np.unique(g["pos"].to_numpy(np.int64))
        brk = np.concatenate([[True], (pos[1:] - pos[:-1]) > w])
        island = np.cumsum(brk) - 1
        n = island[-1] + 1
        start = pos[brk]
        end = np.zeros(n, dtype=np.int64)
        np.maximum.at(end, island, pos + w)
        return pd.DataFrame(
            {
                "doc_id": np.full(n, np.int64(g["doc_id"].iloc[0])),
                "start_tok": start,
                "end_tok": end,
            }
        )

    return occ_ds.groupby("doc_id").map_groups(per_doc, batch_format="pandas")
