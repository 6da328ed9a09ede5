"""Serving-path parity helpers: URL codecs (M6/M7), suggestion actor
LRU cache (T6), click sink (S7)."""

import glob

import numpy as np
import pyarrow.parquet as pq
import pytest

import ray

from searchenginesimple_ray.functions.urlcodec import (base64url_decode,
                                                       base64url_encode,
                                                       double_percent_decode,
                                                       percent_decode)


class TestUrlCodec:
    def test_single_decode(self):
        assert percent_decode("a%20b%2Fc") == "a b/c"
        assert percent_decode("plus+stays") == "plus+stays"  # no '+'→space

    def test_double_decode(self):
        # double-encoded key, decoded twice (WebServer.cc:187-200)
        assert double_percent_decode("%2520") == " "
        assert double_percent_decode("%25E4%25B8%25AD") == "中"

    def test_base64url_roundtrip(self):
        for payload in [b"", b"x", b'{"url": "http://a/b?c=1"}',
                        "中文".encode()]:
            assert base64url_decode(base64url_encode(payload)) == payload

    def test_base64url_unpadded(self):
        assert base64url_decode("aGk") == b"hi"


class TestSuggesterActorCache:
    def test_lru_hits_and_eviction(self, ray_session, t1_index, tmp_path):
        import ray.data

        from searchenginesimple_ray.pipelines.suggest import (
            SuggesterActor, build_char_index, build_dict, write_dict_index)
        from searchenginesimple_ray.pipelines.index_build import \
            index_doc_terms
        d = build_dict(index_doc_terms(t1_index["dir"]))
        write_dict_index(str(tmp_path), d, build_char_index(d))
        actor = SuggesterActor.options(num_cpus=0.5).remote(str(tmp_path))
        try:
            q = d["term"].iloc[0]
            r1 = ray.get(actor.suggest.remote(q, 10))
            r2 = ray.get(actor.suggest.remote(q, 10))
            assert r1 == r2
            stats = ray.get(actor.cache_stats.remote())
            assert stats["hits"] == 1 and stats["misses"] == 1
            # fill past capacity: oldest entry evicted
            for i in range(35):
                ray.get(actor.suggest.remote(f"zz{i}", 10))
            stats = ray.get(actor.cache_stats.remote())
            assert stats["size"] <= 30
        finally:
            ray.kill(actor)


class TestClickSink:
    def test_write_partitioned_by_day(self, ray_session, tmp_path):
        from searchenginesimple_ray.pipelines.clicks import (clicks_table,
                                                            write_clicks)
        rows = [
            {"ts": 1_700_000_000_000_000, "url": "http://a", "query": "q1",
             "doc_id": 1, "rank": 0},
            {"ts": 1_700_000_000_000_000 + 86_400_000_000, "url": "http://b",
             "query": "q2", "doc_id": 2, "rank": 1},
        ]
        out = str(tmp_path / "clicks")
        write_clicks(clicks_table(rows), out)
        files = glob.glob(f"{out}/**/*.parquet", recursive=True)
        days = {p.split("day=")[1].split("/")[0] for p in files}
        assert len(days) == 2
        total = sum(pq.read_metadata(f).num_rows for f in files)
        assert total == 2
