"""pq_encode (pipelines/similarity.py): product-quantization encode —
brute-force oracle, invariants vs kmeans_assign, seed guards."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from searchenginesimple_ray.pipelines.similarity import (kmeans_assign,
                                                         pq_encode)


def _emb_table(rng, n=80, dim=64):
    V = rng.normal(size=(n, dim)).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([v for v in V],
                              pa.list_(pa.float32()))})


def brute_pq(t: pa.Table, n_sub=4, n_codes=8) -> pd.DataFrame:
    V = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    Vq = np.floor(V * 1e6 + 0.5).astype(np.int64)
    ids = t["vec_id"].to_numpy()
    Cq = Vq[np.argsort(ids)][:n_codes]
    w = V.shape[1] // n_sub
    rows = []
    for i in range(len(ids)):
        codes, tot = [], 0
        for s in range(n_sub):
            d = [int(((Vq[i, s*w:(s+1)*w] - Cq[j, s*w:(s+1)*w]) ** 2).sum())
                 for j in range(n_codes)]
            c = int(np.argmin(d))
            codes.append(c); tot += d[c]
        rows.append((int(ids[i]), *codes, tot))
    return pd.DataFrame(rows, columns=["vec_id", "code_0", "code_1",
                                       "code_2", "code_3", "dist_q"]) \
        .sort_values("vec_id").reset_index(drop=True)


class TestPqEncode:
    def test_matches_bruteforce(self, ray_session):
        t = _emb_table(np.random.default_rng(2))
        ds = ray.data.from_arrow(t).repartition(4)
        got = pq_encode(ds).to_pandas().sort_values("vec_id") \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(got, brute_pq(t), check_dtype=False)

    def test_seed_rows_have_zero_error(self, ray_session):
        t = _emb_table(np.random.default_rng(4), n=40)
        got = pq_encode(ray.data.from_arrow(t)).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        seeds = got[got["vec_id"] < 8]
        assert (seeds["dist_q"] == 0).all()
        for s in range(4):
            assert seeds[f"code_{s}"].tolist() == list(range(8))

    def test_pq_error_never_exceeds_whole_vector_assign(self, ray_session):
        # per-subspace argmin <= any single whole-vector codeword, so
        # the PQ reconstruction error is <= the kmeans E-step distance
        t = _emb_table(np.random.default_rng(6), n=60)
        ds = ray.data.from_arrow(t)
        pq = pq_encode(ds).to_pandas().sort_values("vec_id")
        km = kmeans_assign(ds).to_pandas().sort_values("vec_id")
        assert (pq["dist_q"].to_numpy()
                <= km["dist_q"].to_numpy()).all()

    def test_bad_seed_ids_refused(self, ray_session):
        t = _emb_table(np.random.default_rng(1), n=30)
        t = t.set_column(0, "vec_id",
                         pa.array(np.arange(30, dtype=np.int64) + 5))
        with pytest.raises(ValueError, match="seed codewords"):
            pq_encode(ray.data.from_arrow(t))

    def test_indivisible_dim_refused(self, ray_session):
        rng = np.random.default_rng(3)
        V = rng.normal(size=(10, 30)).astype(np.float32)
        t = pa.table({"vec_id": pa.array(np.arange(10, dtype=np.int64)),
                      "embedding": pa.array([v for v in V],
                                            pa.list_(pa.float32()))})
        with pytest.raises(ValueError, match="divisible"):
            pq_encode(ray.data.from_arrow(t), n_sub=4)


class TestPqAdcTopk:
    def test_matches_bruteforce(self, ray_session):
        from searchenginesimple_ray.pipelines.similarity import pq_adc_topk
        rng = np.random.default_rng(9)
        t = _emb_table(rng, n=120)
        got = pq_adc_topk(ray.data.from_arrow(t).repartition(4),
                          query_ids=[0, 1, 2], k=10)
        # brute: ADC = sum_s lut[q, s, code_s] over brute codes
        V = np.stack(t["embedding"].to_pandas().to_numpy()) \
            .astype(np.float64)
        Vq = np.floor(V * 1e6 + 0.5).astype(np.int64)
        Cq, w = Vq[:8], 16
        codes = brute_pq(t)[["code_0", "code_1", "code_2",
                             "code_3"]].to_numpy()
        rows = []
        for q in (0, 1, 2):
            adc = np.zeros(len(V), np.int64)
            for s in range(4):
                lut = np.array([int(((Vq[q, s*w:(s+1)*w]
                                      - Cq[j, s*w:(s+1)*w]) ** 2).sum())
                                for j in range(8)], np.int64)
                adc += lut[codes[:, s]]
            o = np.lexsort((np.arange(len(V)), adc))[:10]
            for r, v in enumerate(o):
                rows.append((q, r, int(v), int(adc[v])))
        exp = pd.DataFrame(rows, columns=["query_id", "rank",
                                          "vec_id", "adc_q"])
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                      check_dtype=False)

    def test_query_finds_itself_first_when_zero_error(self, ray_session):
        # a seed codeword (vec_id < 8) encodes with zero reconstruction
        # error, so querying BY it puts itself at ADC 0, rank 0
        from searchenginesimple_ray.pipelines.similarity import pq_adc_topk
        t = _emb_table(np.random.default_rng(12), n=50)
        got = pq_adc_topk(ray.data.from_arrow(t), query_ids=[2], k=5)
        assert got.loc[0, "vec_id"] == 2 and got.loc[0, "adc_q"] == 0

    def test_missing_query_id_refused(self, ray_session):
        from searchenginesimple_ray.pipelines.similarity import pq_adc_topk
        t = _emb_table(np.random.default_rng(1), n=20)
        with pytest.raises(ValueError, match="not all present"):
            pq_adc_topk(ray.data.from_arrow(t), query_ids=[999])


def brute_ivfpq(t: pa.Table, qid: int, k=10, n_coarse=8, n_sub=4,
                n_codes=8, nprobe=2):
    V = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    ids = t["vec_id"].to_numpy()
    order = np.argsort(ids)
    Vq = np.floor(V * 1e6 + 0.5).astype(np.int64)
    S = Vq[order]
    Cc = S[:n_coarse]
    w = V.shape[1] // n_sub

    def coarse_of(v):
        d = [int(((v - Cc[j]) ** 2).sum()) for j in range(n_coarse)]
        return int(np.argmin(d)), d

    carriers = S[n_coarse:n_coarse + n_codes]
    Cr = np.stack([c - Cc[coarse_of(c)[0]] for c in carriers])

    def codes_of(r):
        return [int(np.argmin([int(((r[s*w:(s+1)*w]
                                     - Cr[j, s*w:(s+1)*w]) ** 2).sum())
                               for j in range(n_codes)]))
                for s in range(n_sub)]

    qv = Vq[ids.tolist().index(qid)]
    _, qd = coarse_of(qv)
    probes = np.argsort(np.array(qd), kind="stable")[:nprobe]
    cand = []
    for i in range(len(ids)):
        c, _ = coarse_of(Vq[i])
        if c not in probes:
            continue
        r = Vq[i] - Cc[c]
        cs = codes_of(r)
        rq = qv - Cc[c]
        adc = sum(int(((rq[s*w:(s+1)*w]
                        - Cr[cs[s], s*w:(s+1)*w]) ** 2).sum())
                  for s in range(n_sub))
        cand.append((adc, int(ids[i])))
    cand.sort()
    return [(r, v, a) for r, (a, v) in enumerate(cand[:k])]


class TestIvfPqTopk:
    def test_matches_bruteforce(self, ray_session):
        from searchenginesimple_ray.pipelines.similarity import ivfpq_topk
        t = _emb_table(np.random.default_rng(17), n=140)
        got = ivfpq_topk(ray.data.from_arrow(t).repartition(4),
                         query_ids=[0, 1, 2], k=10)
        for q in (0, 1, 2):
            g = got[got["query_id"] == q]
            exp = brute_ivfpq(t, q)
            assert list(zip(g["rank"], g["vec_id"], g["adc_q"])) == exp

    def test_candidates_only_from_probed_lists(self, ray_session):
        from searchenginesimple_ray.pipelines.similarity import (
            ivfpq_topk, kmeans_assign)
        t = _emb_table(np.random.default_rng(19), n=100)
        ds = ray.data.from_arrow(t)
        got = ivfpq_topk(ds, query_ids=[1], k=100, nprobe=1)
        km = kmeans_assign(ds).to_pandas().set_index("vec_id")
        q_cluster = int(km.loc[1, "cluster_id"])
        for v in got["vec_id"]:
            assert int(km.loc[int(v), "cluster_id"]) == q_cluster

    def test_seed_guard(self, ray_session):
        from searchenginesimple_ray.pipelines.similarity import ivfpq_topk
        t = _emb_table(np.random.default_rng(2), n=10)   # < 16 seeds
        with pytest.raises(ValueError, match="seed vectors"):
            ivfpq_topk(ray.data.from_arrow(t), query_ids=[0])


class TestPqAdcEmptyQueries:
    def test_empty_query_ids_empty_typed_result(self, ray_session):
        # nq=0 previously crashed in np.concatenate([]); now an empty
        # frame with the full (query_id, rank, vec_id, adc_q) schema
        from searchenginesimple_ray.pipelines.similarity import pq_adc_topk
        t = _emb_table(np.random.default_rng(3), n=20)
        got = pq_adc_topk(ray.data.from_arrow(t), query_ids=[])
        assert list(got.columns) == ["query_id", "rank", "vec_id",
                                     "adc_q"]
        assert len(got) == 0
