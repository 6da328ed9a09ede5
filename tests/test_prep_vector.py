"""VectorizedPrepStage == PrepStage, column for column, bit for bit.

Ray-free: both stages are plain batch callables once the bases ref is
passed as a (conv array, base array) tuple, so hypothesis can drive
thousands of adversarial batches cheaply (mixed-case ASCII, digit-led
tokens, CJK with newlines, stop words, min-length boundary, high-tf
repeats, top_n cut).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from searchenginesimple_ray.stages.prep import (PrepStage,
                                                VectorizedPrepStage)

WORDS = ["foo", "Foo", "FOO", "fooBar", "the", "42", "42abc", "x",
         "中", "文", "中文混foo", "naïve", "Ärger", "longword" * 3]
STOP = ("foo", "the", "*OO")   # '*OO' hits nothing; 'foo' folded form


def _texts(draw):
    n_tok = draw(st.integers(0, 30))
    parts = [draw(st.sampled_from(WORDS)) for _ in range(n_tok)]
    sep = draw(st.sampled_from([" ", "\n", ", ", "!", "中\n中"]))
    return sep.join(parts)


@st.composite
def _batch(draw):
    n = draw(st.integers(0, 12))
    texts = [_texts(draw) for _ in range(n)]
    convs = [f"c{draw(st.integers(0, 3))}" for _ in range(n)]
    tidx = list(range(n))
    return pa.table({
        "conv_id": pa.array(convs, pa.string()),
        "turn_idx": pa.array(tidx, pa.int32()),
        "text": pa.array(texts, pa.string()),
    })


BASES = (np.array(["c0", "c1", "c2", "c3"], dtype=object),
         np.array([0, 1000, 2000, 3000], dtype=np.int64))


def _assert_equal(got: pa.Table, want: pa.Table):
    assert got.column_names == want.column_names
    assert got.num_rows == want.num_rows
    for c in want.column_names:
        a, b = got[c].to_pylist(), want[c].to_pylist()
        assert a == b, f"column {c}: {a} != {b}"


class TestVectorizedPrep:
    @given(_batch(), st.sampled_from([0, 5]),
           st.sampled_from([(), STOP]), st.sampled_from([1, 10]))
    @settings(max_examples=150, deadline=None)
    def test_equals_scalar(self, batch, top_n, stop, min_len):
        scalar = PrepStage(BASES, stop_words=stop, top_n=top_n,
                           min_len=min_len)
        vec = VectorizedPrepStage(BASES, stop_words=stop, top_n=top_n,
                                  min_len=min_len)
        _assert_equal(vec(batch), scalar(batch))

    def test_fixture_corpus(self):
        """Deterministic non-hypothesis pass over richer rows."""
        rows = [
            "Hello WORLD the quick Brown FOX 42 jumps 42 42",
            "中文\n混合 ascii TEXT with 中\n文 newline joins",
            "",
            "short",
            "foo foo foo foo bar bar BAZ 中 中 中",
            "MiXeD MiXeD MiXeD mixed MIXED",
            "!!! ???",
        ]
        batch = pa.table({
            "conv_id": pa.array(["c0"] * len(rows), pa.string()),
            "turn_idx": pa.array(range(len(rows)), pa.int32()),
            "text": pa.array(rows, pa.string()),
        })
        for top_n in (0, 3):
            scalar = PrepStage(BASES, stop_words=STOP, top_n=top_n,
                               min_len=4)
            vec = VectorizedPrepStage(BASES, stop_words=STOP,
                                      top_n=top_n, min_len=4)
            _assert_equal(vec(batch), scalar(batch))

    def test_cache_reuse_across_batches(self):
        vec = VectorizedPrepStage(BASES, stop_words=(), top_n=0,
                                  min_len=1)
        scalar = PrepStage(BASES, stop_words=(), top_n=0, min_len=1)
        for texts in (["alpha BETA gamma"], ["BETA beta ALPHA alpha"],
                      ["gamma gamma gamma"]):
            batch = pa.table({
                "conv_id": pa.array(["c1"] * len(texts), pa.string()),
                "turn_idx": pa.array(range(len(texts)), pa.int32()),
                "text": pa.array(texts, pa.string()),
            })
            _assert_equal(vec(batch), scalar(batch))
