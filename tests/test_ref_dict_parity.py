"""Ground-truth diff against the reference's OWN data artifact.

``/root/reference/data/dictIndex.dat`` is the only real reference-data
snapshot shipped with the repo: the suggestion dictionary
(term, count) plus the codepoint -> word-position index the reference
built from it (`Dictionary.hpp:221-228`).  Rebuilding the char index
from the artifact's dict with OUR ``build_char_index`` and comparing
against the artifact's own ``index_`` checks A7 semantics against the
reference's real output, not a reimplementation.
"""

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo/tools")

REF_DAT = "/root/reference/data/dictIndex.dat"


@pytest.fixture(scope="module")
def artifact():
    from ref_dict import parse_dict_index
    return parse_dict_index(REF_DAT)


class TestReferenceDictParity:
    def test_artifact_parses_exactly(self, artifact):
        dict_, index_ = artifact
        assert len(dict_) == 51562
        assert len(index_) == 3138
        # counts are positive, terms non-empty and M4-folded (no A-Z:
        # the reference folds uppercase into '!'..':' before dict build)
        assert all(c > 0 for _, c in dict_[:1000])
        assert not any(any("A" <= ch <= "Z" for ch in w)
                       for w, _ in dict_)

    def test_char_index_matches_reference_artifact(self, artifact):
        from searchenginesimple_ray.pipelines.suggest import build_char_index
        dict_, index_ = artifact
        pdf = pd.DataFrame({
            "term": [w for w, _ in dict_],
            "count": [c for _, c in dict_],
            "term_id": np.arange(len(dict_), dtype=np.int64),
        })
        ours = build_char_index(pdf)
        our_map = {int(r.codepoint): list(r.term_ids)
                   for r in ours.itertuples()}
        ref_map = {cp: ids for cp, ids in index_.items()}
        assert set(our_map) == set(ref_map)
        for cp in ref_map:
            assert our_map[cp] == ref_map[cp], hex(cp)

    def test_suggester_topk_on_reference_dict(self, artifact):
        """A9/G9 over the real artifact: the Suggester's candidate
        union + edit-distance top-k equals a brute force over all
        terms sharing >= 1 codepoint with the query."""
        from searchenginesimple_ray.pipelines.suggest import (
            Suggester, build_char_index, levenshtein)
        dict_, _ = artifact
        pdf = pd.DataFrame({
            "term": [w for w, _ in dict_],
            "count": [c for _, c in dict_],
            "term_id": np.arange(len(dict_), dtype=np.int64),
        })
        s = Suggester(pdf, build_char_index(pdf))
        terms = pdf["term"].to_numpy()
        for q in ["hello", "wrold", "中文", "12ab", "linux"]:
            got = [(r["term"], r["distance"]) for r in s.suggest(q, k=10)]
            qchars = set(q)
            cand = [t for t in terms if qchars & set(t)]
            dists = sorted(((levenshtein(q, t), t) for t in cand))[:10]
            want = [(t, d) for d, t in dists]
            assert got == want, q
