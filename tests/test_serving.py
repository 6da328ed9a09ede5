"""Serving-path parity helpers: URL codecs (M6/M7), suggestion actor
LRU cache (T6), click sink (S7)."""

import glob

import numpy as np
import pyarrow as pa
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

    def test_durable_cache_survives_actor_restart(self, ray_session,
                                                  t1_index, tmp_path):
        """S8 full parity (KeyServer.cc:165-219): LRU miss -> durable
        GET; durable miss -> compute + durable SET.  A fresh actor
        (restart) serves the prior actor's queries from the durable
        tier without recomputing."""
        from searchenginesimple_ray.pipelines.index_build import \
            index_doc_terms
        from searchenginesimple_ray.pipelines.suggest import (
            SuggesterActor, build_char_index, build_dict, write_dict_index)
        d = build_dict(index_doc_terms(t1_index["dir"]))
        write_dict_index(str(tmp_path / "dict"), d, build_char_index(d))
        cache_dir = str(tmp_path / "qcache")
        mk = lambda: SuggesterActor.options(num_cpus=0.5).remote(  # noqa: E731
            str(tmp_path / "dict"), cache_dir=cache_dir)
        a1 = mk()
        qs = [d["term"].iloc[i] for i in range(3)]
        try:
            want = [ray.get(a1.suggest.remote(q, 10)) for q in qs]
            ray.get(a1.flush_cache.remote())
            s1 = ray.get(a1.cache_stats.remote())
            assert s1["misses"] == 3 and s1["durable_size"] == 3
        finally:
            ray.kill(a1)
        a2 = mk()
        try:
            got = [ray.get(a2.suggest.remote(q, 10)) for q in qs]
            assert got == want
            s2 = ray.get(a2.cache_stats.remote())
            # no recompute: every answer came from the durable tier
            assert s2["misses"] == 0 and s2["hits_durable"] == 3
            # and the durable hit filled the LRU: a repeat is a mem hit
            assert ray.get(a2.suggest.remote(qs[0], 10)) == want[0]
            assert ray.get(a2.cache_stats.remote())["hits"] == 1
        finally:
            ray.kill(a2)

    def test_durable_cache_invalidated_by_dict_rebuild(
            self, ray_session, t1_index, tmp_path):
        """Keys are namespaced by a content digest of the dictionary
        artifacts: a REBUILT dictionary must not serve prior (stale)
        cached results, while an identical dictionary still hits."""
        from searchenginesimple_ray.pipelines.index_build import \
            index_doc_terms
        from searchenginesimple_ray.pipelines.suggest import (
            SuggesterActor, build_char_index, build_dict, write_dict_index)
        d = build_dict(index_doc_terms(t1_index["dir"]))
        dict_dir = str(tmp_path / "dict")
        cache_dir = str(tmp_path / "qcache")
        write_dict_index(dict_dir, d, build_char_index(d))
        q = d["term"].iloc[0]
        a1 = SuggesterActor.options(num_cpus=0.5).remote(
            dict_dir, cache_dir=cache_dir)
        try:
            ray.get(a1.suggest.remote(q, 10))
            ray.get(a1.flush_cache.remote())
        finally:
            ray.kill(a1)
        # rebuild the dictionary with CHANGED content (counts bumped)
        d2 = d.copy()
        d2["count"] = d2["count"] + 1
        write_dict_index(dict_dir, d2, build_char_index(d2))
        a2 = SuggesterActor.options(num_cpus=0.5).remote(
            dict_dir, cache_dir=cache_dir)
        try:
            ray.get(a2.suggest.remote(q, 10))
            s = ray.get(a2.cache_stats.remote())
            assert s["hits_durable"] == 0 and s["misses"] == 1
        finally:
            ray.kill(a2)

    def test_durable_kvcache_semantics(self, tmp_path):
        """Last-write-wins across segments, flush batching, compact."""
        from searchenginesimple_ray.state.kvcache import DurableKVCache
        c1 = DurableKVCache(str(tmp_path), flush_every=2)
        c1.put("a", "1")          # buffered
        assert c1.get("a") == "1"
        c1.put("b", "2")          # triggers flush (2 pending)
        c1.put("a", "3")          # new segment after flush()
        c1.flush()
        c2 = DurableKVCache(str(tmp_path))
        assert c2.get("a") == "3" and c2.get("b") == "2"
        assert c2.get("zzz") is None and len(c2) == 2
        c2.compact()
        import glob as g
        assert len(g.glob(str(tmp_path / "seg-*.parquet"))) == 1
        c3 = DurableKVCache(str(tmp_path))
        assert c3.get("a") == "3" and len(c3) == 2


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


class TestHttpGateway:
    """End-to-end HTTP topology (WebServer.cc parity): /s, /sug, /link
    over the real scorer actor pool + suggester + click sink."""

    def test_endpoints(self, ray_session, t1_engine, t1_index, tmp_path):
        import json
        import urllib.parse
        import urllib.request

        from searchenginesimple_ray.functions.urlcodec import \
            base64url_encode
        from searchenginesimple_ray.pipelines.index_build import \
            index_doc_terms
        from searchenginesimple_ray.pipelines.serve import (SearchGateway,
                                                            start_server)
        from searchenginesimple_ray.pipelines.suggest import (
            Suggester, build_char_index, build_dict)
        from searchenginesimple_ray.sources.transcripts import \
            generate_queries
        d = build_dict(index_doc_terms(t1_index["dir"]))
        gw = SearchGateway(t1_engine, Suggester(d, build_char_index(d)),
                           clicks_dir=str(tmp_path / "clicks"))
        srv, _ = start_server(gw)
        port = srv.server_address[1]
        base = f"http://127.0.0.1:{port}"
        try:
            q = generate_queries()[0]
            # /s/<key>: double-encoded query -> same results as direct
            enc = urllib.parse.quote(urllib.parse.quote(q, safe=""),
                                     safe="")
            with urllib.request.urlopen(f"{base}/s/{enc}") as r:
                got = json.loads(r.read())
            want = t1_engine.bm25_topk(q, k=10)
            assert got == want and len(got) > 0

            # /sug/<key>
            term = d["term"].iloc[0]
            enc = urllib.parse.quote(urllib.parse.quote(term, safe=""),
                                     safe="")
            with urllib.request.urlopen(f"{base}/sug/{enc}") as r:
                sug = json.loads(r.read())
            assert sug and sug[0]["distance"] == 0

            # /link/<b64(json)>: 302 + click recorded
            info = {"ts": 1_700_000_000_000_000,
                    "url": "http://example.test/doc",
                    "data": {"query": q, "doc_id": int(want[0]["doc_id"]),
                             "rank": 0}}
            b64 = base64url_encode(json.dumps(info).encode())
            req = urllib.request.Request(f"{base}/link/{b64}")

            class NoRedirect(urllib.request.HTTPRedirectHandler):
                def redirect_request(self, *a, **kw):
                    return None
            opener = urllib.request.build_opener(NoRedirect)
            try:
                opener.open(req)
                assert False, "expected 302"
            except urllib.error.HTTPError as e:
                assert e.code == 302
                assert e.headers["Location"] == info["url"]
            assert gw.flush_clicks() == 1
            import glob as g
            files = g.glob(str(tmp_path / "clicks" / "**" / "*.parquet"),
                           recursive=True)
            t = pq.read_table(files)
            assert t.num_rows == 1
            assert t["url"][0].as_py() == info["url"]

            # unknown path -> 404
            try:
                urllib.request.urlopen(f"{base}/nope")
                assert False
            except urllib.error.HTTPError as e:
                assert e.code == 404
        finally:
            srv.shutdown()


class TestGatewayHardening:
    """Review-found serving hazards: header injection, actor backend,
    click flush on shutdown."""

    def test_crlf_redirect_rejected(self, ray_session, t1_engine,
                                    tmp_path):
        import json as _json
        import urllib.error
        import urllib.request

        from searchenginesimple_ray.functions.urlcodec import \
            base64url_encode
        from searchenginesimple_ray.pipelines.serve import (SearchGateway,
                                                            stop_server,
                                                            start_server)
        gw = SearchGateway(t1_engine, None,
                           clicks_dir=str(tmp_path / "c"))
        srv, th = start_server(gw)
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        try:
            evil = {"url": "http://x/\r\nSet-Cookie: pwn=1", "ts": 0,
                    "data": {}}
            b64 = base64url_encode(_json.dumps(evil).encode())
            try:
                urllib.request.urlopen(f"{base}/link/{b64}")
                assert False, "expected 500"
            except urllib.error.HTTPError as e:
                assert e.code == 500
            # non-latin-1 URL: percent-encoded, served as a clean 302
            uni = {"url": "http://x/p→q", "ts": 0, "data": {}}
            b64 = base64url_encode(_json.dumps(uni).encode())

            class NoRedirect(urllib.request.HTTPRedirectHandler):
                def redirect_request(self, *a, **kw):
                    return None
            opener = urllib.request.build_opener(NoRedirect)
            try:
                opener.open(f"{base}/link/{b64}")
                assert False, "expected 302"
            except urllib.error.HTTPError as e:
                assert e.code == 302
                assert "%E2%86%92" in e.headers["Location"]
        finally:
            # stop_server flushes the buffered clicks (1 valid click)
            n = stop_server(srv, th, gw)
            assert n == 1

    def test_redirect_scheme_guard(self, ray_session, t1_engine,
                                   tmp_path):
        """Dangerous schemes 500; relative / scheme-less targets keep
        their 302 AND their click analytics (they are legitimate
        corpus links, not open-redirect vectors)."""
        import json as _json
        import urllib.error
        import urllib.request

        from searchenginesimple_ray.functions.urlcodec import \
            base64url_encode
        from searchenginesimple_ray.pipelines.serve import (SearchGateway,
                                                            stop_server,
                                                            start_server)
        gw = SearchGateway(t1_engine, None,
                           clicks_dir=str(tmp_path / "c"))
        srv, th = start_server(gw)
        base = f"http://127.0.0.1:{srv.server_address[1]}"

        class NoRedirect(urllib.request.HTTPRedirectHandler):
            def redirect_request(self, *a, **kw):
                return None
        opener = urllib.request.build_opener(NoRedirect)
        try:
            for bad in ("javascript:alert(1)", "data:text/html,x",
                        "file:///etc/passwd"):
                b64 = base64url_encode(_json.dumps(
                    {"url": bad, "ts": 0, "data": {}}).encode())
                try:
                    opener.open(f"{base}/link/{b64}")
                    assert False, f"expected 500 for {bad}"
                except urllib.error.HTTPError as e:
                    assert e.code == 500, bad
            for ok in ("/local/path?x=1", "www.example.com/page",
                       "//host.example/p"):
                b64 = base64url_encode(_json.dumps(
                    {"url": ok, "ts": 0, "data": {}}).encode())
                try:
                    opener.open(f"{base}/link/{b64}")
                    assert False, "expected 302"
                except urllib.error.HTTPError as e:
                    assert e.code == 302, ok
                    assert e.headers["Location"] == ok
        finally:
            n = stop_server(srv, th, gw)
            assert n == 3   # the three allowed clicks were recorded

    def test_actor_suggester_backend(self, ray_session, t1_index,
                                     tmp_path):
        """The documented SuggesterActor backend actually serves."""
        import json as _json
        import urllib.parse
        import urllib.request

        from searchenginesimple_ray.pipelines.index_build import \
            index_doc_terms
        from searchenginesimple_ray.pipelines.serve import (SearchGateway,
                                                            start_server)
        from searchenginesimple_ray.pipelines.suggest import (
            SuggesterActor, build_char_index, build_dict)
        d = build_dict(index_doc_terms(t1_index["dir"]))
        dict_dir = tmp_path / "dict"
        dict_dir.mkdir()
        pq.write_table(pa.Table.from_pandas(d, preserve_index=False),
                       str(dict_dir / "dict.parquet"))
        pq.write_table(pa.Table.from_pandas(build_char_index(d),
                                            preserve_index=False),
                       str(dict_dir / "char_index.parquet"))
        actor = SuggesterActor.remote(str(dict_dir))
        gw = SearchGateway(None, actor)
        srv, _ = start_server(gw)
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        try:
            term = d["term"].iloc[0]
            enc = urllib.parse.quote(urllib.parse.quote(term, safe=""),
                                     safe="")
            with urllib.request.urlopen(f"{base}/sug/{enc}") as r:
                sug = _json.loads(r.read())
            assert sug and sug[0]["distance"] == 0
        finally:
            srv.shutdown()
