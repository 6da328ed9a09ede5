"""Suggestion module (dict G5, char index A7, Levenshtein + top-k G9)."""

import numpy as np
import pandas as pd
import pytest

from searchenginesimple_ray.pipelines.suggest import (Suggester,
                                                      build_char_index,
                                                      build_dict,
                                                      levenshtein)


def _lev_ref(a, b):
    m, n = len(a), len(b)
    d = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        d[i][0] = i
    for j in range(n + 1):
        d[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
    return d[m][n]


class TestLevenshtein:
    def test_known_cases(self):
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("", "abc") == 3
        assert levenshtein("abc", "") == 3
        assert levenshtein("same", "same") == 0

    def test_codepoint_not_byte(self):
        # one CJK substitution = distance 1 (3 bytes differ in UTF-8)
        assert levenshtein("世界", "世男") == 1

    def test_fuzz_vs_bruteforce(self):
        rng = np.random.RandomState(7)
        alpha = list("abxy世界")
        for _ in range(200):
            a = "".join(rng.choice(alpha, rng.randint(0, 9)))
            b = "".join(rng.choice(alpha, rng.randint(0, 9)))
            assert levenshtein(a, b) == _lev_ref(a, b), (a, b)


@pytest.fixture(scope="module")
def suggester(ray_session, t1_index):
    from searchenginesimple_ray.pipelines.index_build import index_doc_terms
    d = build_dict(index_doc_terms(t1_index["dir"]))
    return Suggester(d, build_char_index(d)), d


class TestSuggester:
    def test_dict_sorted_with_ids(self, suggester):
        _, d = suggester
        assert list(d["term"]) == sorted(d["term"])
        assert list(d["term_id"]) == list(range(len(d)))
        assert (d["count"] > 0).all()

    def test_exact_term_is_rank0_distance0(self, suggester):
        s, d = suggester
        term = d["term"].iloc[len(d) // 2]
        top = s.suggest(term, k=5)
        assert top[0]["term"] == term
        assert top[0]["distance"] == 0

    def test_order_is_distance_then_term(self, suggester):
        s, _ = suggester
        top = s.suggest("qxzj", k=10)
        keys = [(r["distance"], r["term"]) for r in top]
        assert keys == sorted(keys)

    def test_no_shared_char_empty(self, suggester):
        s, _ = suggester
        assert s.suggest("быт", k=10) == []  # cyrillic

    def test_distances_exact(self, suggester):
        s, _ = suggester
        for r in s.suggest("merg", k=10):
            assert r["distance"] == _lev_ref("merg", r["term"])

    def test_candidates_are_char_union(self, suggester):
        """Every suggestion shares >= 1 codepoint with the query (A9)."""
        s, _ = suggester
        for r in s.suggest("xyzq", k=10):
            assert set("xyzq") & set(r["term"])


class TestSuggesterParquetRoundtrip:
    def test_write_load_suggest(self, suggester, tmp_path):
        from searchenginesimple_ray.pipelines.suggest import write_dict_index
        s, d = suggester
        write_dict_index(str(tmp_path), d, build_char_index(d))
        s2 = Suggester(str(tmp_path))
        q = d["term"].iloc[3]
        assert s.suggest(q, 10) == s2.suggest(q, 10)
