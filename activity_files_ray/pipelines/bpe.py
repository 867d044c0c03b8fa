"""Corpus-scale BPE merge-pair training (r4 verdict item 6): the
actual tokenizer-training loop — iterative most-frequent-adjacent-pair
merges (Sennrich et al. 2016, public algorithm; `bigram_topk` is
round 0 of the same idea at token granularity).

The corpus TEXT is touched exactly once: one `bucketed_aggregate`
pass builds the (word, freq) table — the classic BPE state, whose
size is the DISTINCT vocabulary, not the corpus. Every merge round
then runs over that table only:

  1. pair counts — ``map_batches`` over (syms, freq) emits one
     (left, right, n) partial per batch (adjacent positions × word
     freq, collapsed in-batch);
  2. argmax — ``bucketed_topk`` k=1 with the deterministic
     (−n, left, right) tie-break: the driver sees ≤ n_buckets rows;
  3. apply — ``map_batches`` rewrites each word's symbol sequence
     with the greedy left-to-right non-overlapping merge (the
     reference semantics), and the table is re-materialized so the
     lineage stays one round deep.

Scale: rounds × (one word-table pass + one tiny exchange). The word
table is hash-bucket distributed; the merged pair is a closure-
captured 2-tuple (broadcast small side). Determinism: counts are
exact integers and the tie-break is total, so distributed == the
single-process reference BPE on any corpus (pytest-pinned), and the
sf0.01 merge table is golden-pinned in the oracle suite.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import agg
from ..functions.text import _TOKEN_RE

END = "</w>"


def word_freq_table(ds, text_col: str = "text", n_buckets: int | None = None):
    """One corpus pass → Dataset(word, freq): the only stage that
    reads document text."""

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        toks: dict[str, int] = {}
        for t in df[text_col]:
            for w in _TOKEN_RE.findall(t or ""):
                toks[w] = toks.get(w, 0) + 1
        return pd.DataFrame(
            {"word": list(toks), "freq": np.fromiter(toks.values(), np.int64, len(toks))}
        )

    return agg.bucketed_aggregate(
        ds.map_batches(counts, batch_format="pandas", batch_size=None),
        ["word"],
        {"freq": ("freq", "sum")},
        n_buckets=n_buckets,
    )


def merge_word(syms: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge — the reference
    BPE apply semantics."""
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(
    ds,
    n_merges: int = 10,
    text_col: str = "text",
    n_buckets: int | None = None,
) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges over a Dataset(text) corpus.
    Returns the merge table (rank, left, right, n) in learning order
    — ``n`` is the pair's global count when it was merged."""
    words = word_freq_table(ds, text_col, n_buckets)

    def to_syms(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "syms": [list(w) + [END] for w in df["word"]],
                "freq": df["freq"].to_numpy(np.int64),
            }
        )

    # right-size the round state: the word table is vocabulary-sized,
    # so at bench scale it collapses to a handful of blocks — per-round
    # scheduling cost tracks block count, not rows. (At a 10^9-word
    # vocabulary the same call just keeps more blocks.)
    n_state_blocks = max(1, (n_buckets or agg.default_n_buckets()) // 8)
    table = (
        words.map_batches(to_syms, batch_format="pandas", batch_size=None)
        .repartition(n_state_blocks)
        .materialize()
    )

    merges = []
    for rank in range(n_merges):

        def pair_counts(df: pd.DataFrame) -> pd.DataFrame:
            c: dict[tuple[str, str], int] = {}
            for syms, f in zip(df["syms"], df["freq"]):
                f = int(f)
                for a, b in zip(syms[:-1], syms[1:]):
                    c[(a, b)] = c.get((a, b), 0) + f
            if not c:
                return pd.DataFrame(
                    {
                        "left": pd.Series(dtype="object"),
                        "right": pd.Series(dtype="object"),
                        "cnt": pd.Series(dtype="int64"),
                    }
                )
            ks = list(c)
            return pd.DataFrame(
                {
                    "left": [k[0] for k in ks],
                    "right": [k[1] for k in ks],
                    "cnt": np.fromiter(c.values(), np.int64, len(c)),
                }
            )

        top = agg.bucketed_topk(
            table.map_batches(pair_counts, batch_format="pandas", batch_size=None),
            ["left", "right"],
            {"n": ("cnt", "sum")},
            sort_by=["n", "left", "right"],
            ascending=[False, True, True],
            k=1,
            n_buckets=n_buckets,
        )
        if len(top) == 0:
            break
        left, right = str(top["left"].iloc[0]), str(top["right"].iloc[0])
        merges.append(
            {
                "rank": np.int64(rank),
                "left": left,
                "right": right,
                "n": np.int64(top["n"].iloc[0]),
            }
        )

        def apply_merge(df: pd.DataFrame, _l=left, _r=right) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "syms": [merge_word(s, _l, _r) for s in df["syms"]],
                    "freq": df["freq"].to_numpy(np.int64),
                }
            )

        table = table.map_batches(
            apply_merge, batch_format="pandas", batch_size=None
        ).materialize()

    return pd.DataFrame(merges, columns=["rank", "left", "right", "n"])


def bpe_reference(word_freqs: dict[str, int], n_merges: int) -> pd.DataFrame:
    """Single-process reference BPE (same representation, same
    greedy apply, same (−n, left, right) tie-break) — the oracle the
    distributed trainer must equal exactly."""
    vocab = {w: list(w) + [END] for w in word_freqs}
    merges = []
    for rank in range(n_merges):
        stats: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            syms = vocab[w]
            for a, b in zip(syms[:-1], syms[1:]):
                stats[(a, b)] = stats.get((a, b), 0) + f
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), n = best
        merges.append(
            {"rank": np.int64(rank), "left": left, "right": right, "n": np.int64(n)}
        )
        vocab = {w: merge_word(s, left, right) for w, s in vocab.items()}
    return pd.DataFrame(merges, columns=["rank", "left", "right", "n"])


def tokenize_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply a learned merge list (in rank order) to one word — the
    inference-side BPE tokenizer."""
    syms = list(word) + [END]
    for left, right in merges:
        if len(syms) < 2:
            break
        syms = merge_word(syms, left, right)
    return syms


def bpe_token_counts(
    ds,
    merges: pd.DataFrame,
    text_col: str = "text",
    n_buckets: int | None = None,
):
    """Corpus tokenization under a learned merge table → global
    symbol counts, Dataset(sym, n). The merge list is a broadcast
    small side (closure-captured); each batch tokenizes its DISTINCT
    words once (per-batch word cache) and multiplies by word counts,
    so the apply cost tracks vocabulary, not corpus rows; one
    bucketed exchange folds the per-batch (sym, cnt) partials."""
    mlist = [
        (str(l), str(r))
        for l, r in zip(merges["left"], merges["right"])
    ]

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        wc: dict[str, int] = {}
        for t in df[text_col]:
            for w in _TOKEN_RE.findall(t or ""):
                wc[w] = wc.get(w, 0) + 1
        sym_c: dict[str, int] = {}
        for w, c in wc.items():
            for s in tokenize_word(w, mlist):
                sym_c[s] = sym_c.get(s, 0) + c
        return pd.DataFrame(
            {
                "sym": list(sym_c),
                "n": np.fromiter(sym_c.values(), np.int64, len(sym_c)),
            }
        )

    return agg.bucketed_aggregate(
        ds.map_batches(counts, batch_format="pandas", batch_size=None),
        ["sym"],
        {"n": ("n", "sum")},
        n_buckets=n_buckets,
    )
