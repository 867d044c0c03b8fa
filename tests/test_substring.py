"""Exact substring/paragraph dedup (r5): planted shared paragraphs
are found with exact spans, non-shared text never fires, within-doc
repeats alone don't count, and the scale knobs (stride, max_group,
broadcast cap) behave as documented. The registered queries'
sf0.01 DuckDB oracles run in test_queries_oracle."""

import numpy as np
import pandas as pd
import pytest

from activity_files_ray.pipelines import substring

W = 4


def _tok(n, prefix):
    return " ".join(f"{prefix}{i}" for i in range(n))


def _run(df, **kw):
    import ray.data as rd

    out = substring.substring_dupes(rd.from_pandas(df), w=W, **kw).to_pandas()
    if out.empty:
        return pd.DataFrame(columns=["doc_id", "pos", "n_docs"]).astype("int64")
    return out.sort_values(["doc_id", "pos"]).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
class TestSubstringDupes:
    def test_planted_paragraph_found_with_exact_positions(self):
        para = "alpha beta gamma delta epsilon zeta"  # 6 tokens, W=4 → 3 windows
        df = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    _tok(5, "a") + " " + para,            # para at tokens 5..10
                    para + " " + _tok(7, "b"),            # para at tokens 0..5
                    _tok(12, "c"),                        # clean doc
                ],
            }
        )
        got = _run(df)
        # 3 windows per occurrence, 2 docs → 6 rows, all n_docs == 2
        assert len(got) == 6
        assert (got["n_docs"] == 2).all()
        assert got[got.doc_id == 1]["pos"].tolist() == [5, 6, 7]
        assert got[got.doc_id == 2]["pos"].tolist() == [0, 1, 2]
        assert 3 not in set(got["doc_id"])

    def test_spans_merge_to_the_maximal_paragraph(self):
        para = "p0 p1 p2 p3 p4 p5 p6 p7"  # 8 tokens
        df = pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [_tok(3, "x") + " " + para, para + " " + _tok(3, "y")],
            }
        )
        import ray.data as rd

        occ = substring.substring_dupes(rd.from_pandas(df), w=W)
        spans = (
            substring.merge_spans(occ, w=W)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert spans.values.tolist() == [[1, 3, 11], [2, 0, 8]]

    def test_within_doc_repeat_alone_does_not_fire(self):
        rep = "r0 r1 r2 r3"
        df = pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [rep + " mid " + rep, _tok(9, "z")],  # repeat only inside doc 1
            }
        )
        assert len(_run(df)) == 0

    def test_three_docs_n_docs_counts_distinct(self):
        para = "q0 q1 q2 q3"
        df = pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [para, para + " tail1 tail2", "head " + para],
            }
        )
        got = _run(df)
        assert (got["n_docs"] == 3).all()
        assert len(got) == 3  # one window occurrence per doc

    def test_stride_aligned_window_still_found(self):
        # stride == W: a shared passage of >= 2W-1 tokens must share an
        # aligned window in every doc that starts it at a multiple of W
        para = " ".join(f"s{i}" for i in range(2 * W - 1))
        df = pd.DataFrame({"doc_id": [1, 2], "text": [para, para]})
        got = _run(df, stride=W)
        assert len(got) >= 2  # at least the pos-0 window in both docs

    def test_broadcast_cap_raises_loudly(self):
        para = "c0 c1 c2 c3 c4"
        df = pd.DataFrame({"doc_id": [1, 2], "text": [para, para]})
        with pytest.raises(MemoryError, match="broadcast_max"):
            _run(df, broadcast_max=0)

    def test_max_group_caps_emission_per_window(self):
        para = "m0 m1 m2 m3"
        df = pd.DataFrame({"doc_id": list(range(6)), "text": [para] * 6})
        got = _run(df, max_group=2)
        assert len(got) == 2  # capped
        assert (got["n_docs"] == 6).all()  # count still exact

    def test_short_docs_and_empty_text(self):
        df = pd.DataFrame({"doc_id": [1, 2], "text": ["one two", None]})
        assert len(_run(df)) == 0
