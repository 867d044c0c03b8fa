"""Distributed BPE trainer (r5): exact equality with the
single-process reference on planted and random corpora, greedy-apply
semantics, tie-break determinism. The registered query's golden-pin
oracle runs in test_queries_oracle."""

import numpy as np
import pandas as pd
import pytest

from activity_files_ray.pipelines import bpe


def _run(texts, n_merges, **kw):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"text": texts}))
    return bpe.bpe_train(ds, n_merges, n_buckets=8, **kw).reset_index(drop=True)


def _wf(texts):
    from activity_files_ray.functions.text import _TOKEN_RE

    wf = {}
    for t in texts:
        for w in _TOKEN_RE.findall(t or ""):
            wf[w] = wf.get(w, 0) + 1
    return wf


@pytest.mark.usefixtures("ray_session")
class TestBpe:
    def test_textbook_corpus(self):
        # the classic low/lower/newest/widest example family
        texts = ["low low low low low", "lower lower", "newest newest newest", "widest"]
        got = _run(texts, 8)
        ref = bpe.bpe_reference(_wf(texts), 8).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref)
        # round 0 merges the most frequent adjacent pair
        assert got.loc[0, "n"] == int(got["n"].max())

    def test_random_corpus_distributed_equals_reference(self):
        rng = np.random.RandomState(7)
        vocab = ["".join(rng.choice(list("abcdef"), rng.randint(2, 8))) for _ in range(40)]
        texts = [
            " ".join(rng.choice(vocab, 30)) for _ in range(50)
        ]
        got = _run(texts, 15)
        ref = bpe.bpe_reference(_wf(texts), 15).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref)

    def test_merge_word_greedy_nonoverlapping(self):
        assert bpe.merge_word(list("aaaa"), "a", "a") == ["aa", "aa"]
        assert bpe.merge_word(list("aaa"), "a", "a") == ["aa", "a"]
        assert bpe.merge_word(["x", "y", "x", "y"], "x", "y") == ["xy", "xy"]
        assert bpe.merge_word(["q"], "a", "a") == ["q"]

    def test_exhausts_gracefully(self):
        # single 2-symbol word (incl. </w>) runs out of pairs fast
        got = _run(["a a a"], 50)
        ref = bpe.bpe_reference({"a": 3}, 50).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref)
        assert len(got) < 50

    def test_tiebreak_is_lexicographic(self):
        # all four pairs tie at n=2; ('a','</w>') is the lexicographic
        # minimum ('<' sorts before 'b') — and must match the reference
        texts = ["ab ab", "ba ba"]
        got = _run(texts, 1)
        ref = bpe.bpe_reference(_wf(texts), 1).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref)
        assert (got.loc[0, "left"], got.loc[0, "right"]) == ("a", "</w>")


@pytest.mark.usefixtures("ray_session")
class TestBpeTokenize:
    def test_apply_matches_reference_vocab(self):
        texts = ["low low lower lowest", "new newer newest", "wide wider widest"]
        merges = _run(texts, 8)
        mlist = list(zip(merges["left"], merges["right"]))
        # reference apply: re-derive symbol counts word by word
        wf = _wf(texts)
        ref = {}
        for w, c in wf.items():
            for s in bpe.tokenize_word(w, mlist):
                ref[s] = ref.get(s, 0) + c
        import ray.data as rd

        got = (
            bpe.bpe_token_counts(
                rd.from_pandas(pd.DataFrame({"text": texts})), merges, n_buckets=8
            )
            .to_pandas()
            .set_index("sym")["n"]
            .to_dict()
        )
        assert got == ref
        # learned merges actually fire: some multi-char symbol exists
        assert any(len(s.replace("</w>", "x")) > 1 for s in got)

    def test_tokenize_word_rank_order(self):
        # merges must apply in rank order: (l,o) then (lo,w)
        merges = [("l", "o"), ("lo", "w")]
        assert bpe.tokenize_word("low", merges) == ["low", "</w>"]
        assert bpe.tokenize_word("lol", merges) == ["lo", "l", "</w>"]
