"""Training-data operator suite: ANN similarity search, text analysis,
MinHash / n-gram / embedding dedup, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


@pytest.fixture(scope="module")
def embeddings_ds(ray_session):
    return ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


@pytest.fixture(scope="module")
def documents_ds(ray_session):
    return ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                                 columns=["doc_id", "text"])


class TestAnn:
    def test_brute_force_matches_numpy(self, embeddings_ds):
        from searchenginesimple_ray.pipelines.similarity import (
            _normalize, brute_force_topk)
        import pyarrow.parquet as pq
        t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
        ids = t["vec_id"].to_numpy()
        V = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                                 for v in t["embedding"].to_pylist()]))
        qv = V[:3]
        res = brute_force_topk(embeddings_ds, "vec_id", "embedding",
                               [0, 1, 2], qv, k=10)
        # oracle: full matmul
        S = V @ qv.T
        for qi in range(3):
            order = np.lexsort((ids, -S[:, qi]))[:10]
            got = res[res.query_id == qi].sort_values("rank")
            assert got["vec_id"].tolist() == ids[order].tolist()
            np.testing.assert_allclose(got["cosine"].to_numpy(),
                                       S[order, qi], atol=1e-12)

    def test_ivf_recall(self, embeddings_ds):
        """IVF with nprobe=all partitions must equal brute force."""
        from searchenginesimple_ray.pipelines.similarity import (
            brute_force_topk, ivf_topk)
        import pyarrow.parquet as pq
        t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
        qv = np.stack([np.asarray(v, dtype=np.float64)
                       for v in t["embedding"].to_pylist()[:2]])
        exact = brute_force_topk(embeddings_ds, "vec_id", "embedding",
                                 [0, 1], qv, k=5)
        approx = ivf_topk(embeddings_ds, "vec_id", "embedding", [0, 1], qv,
                          k=5, n_centroids=8, nprobe=8)
        assert approx[["query_id", "rank", "vec_id"]].values.tolist() == \
            exact[["query_id", "rank", "vec_id"]].values.tolist()

    def test_ivf_partial_probe_recall(self, embeddings_ds):
        from searchenginesimple_ray.pipelines.similarity import (
            brute_force_topk, ivf_topk)
        import pyarrow.parquet as pq
        t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
        qv = np.stack([np.asarray(v, dtype=np.float64)
                       for v in t["embedding"].to_pylist()[:3]])
        exact = brute_force_topk(embeddings_ds, "vec_id", "embedding",
                                 [0, 1, 2], qv, k=10)
        approx = ivf_topk(embeddings_ds, "vec_id", "embedding", [0, 1, 2],
                          qv, k=10, n_centroids=8, nprobe=4)
        # recall@10 of the bucketed path should be high on this data
        hits = 0
        for qi in range(3):
            e = set(exact[exact.query_id == qi]["vec_id"])
            a = set(approx[approx.query_id == qi]["vec_id"])
            hits += len(e & a)
        assert hits >= 20  # >= 2/3 average recall

    def test_ivf_pruned_reads_partition_subset(self, embeddings_ds,
                                               tmp_path):
        """The on-disk IVF probe must READ only the probed partitions'
        files, and match the in-memory variant given the same plan."""
        import glob
        import os

        import numpy as np
        import pyarrow.parquet as pq

        from searchenginesimple_ray.pipelines.similarity import (
            build_ivf_index, ivf_probed_paths, ivf_topk, ivf_topk_pruned)
        idx = build_ivf_index(embeddings_ds, "vec_id", "embedding",
                              str(tmp_path / "ivf"), n_centroids=8)
        t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
        qv = np.stack([np.asarray(v, dtype=np.float64)
                       for v in t["embedding"].to_pylist()[:2]])
        all_parts = sorted(glob.glob(os.path.join(idx, "vectors",
                                                  "ivf_partition=*")))
        probed = ivf_probed_paths(idx, qv, nprobe=2)
        assert 0 < len(probed) < len(all_parts)   # pruned, not full scan
        pruned = ivf_topk_pruned(idx, "vec_id", "embedding", [0, 1], qv,
                                 k=5, nprobe=2)
        centroids = np.load(os.path.join(idx, "centroids.npy"))
        mem = ivf_topk(embeddings_ds, "vec_id", "embedding", [0, 1], qv,
                       k=5, centroids=centroids, nprobe=2)
        assert pruned[["query_id", "rank", "vec_id"]].values.tolist() == \
            mem[["query_id", "rank", "vec_id"]].values.tolist()
        # nprobe=all over the pruned index equals the full scan exactly
        exact = ivf_topk_pruned(idx, "vec_id", "embedding", [0, 1], qv,
                                k=5, nprobe=8)
        full = ivf_topk(embeddings_ds, "vec_id", "embedding", [0, 1], qv,
                        k=5, centroids=centroids, nprobe=8)
        assert exact[["query_id", "rank", "vec_id"]].values.tolist() == \
            full[["query_id", "rank", "vec_id"]].values.tolist()

    def test_self_match_rank0(self, embeddings_ds):
        from searchenginesimple_ray.pipelines.similarity import \
            brute_force_topk
        import pyarrow.parquet as pq
        t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
        qv = np.stack([np.asarray(v, dtype=np.float64)
                       for v in t["embedding"].to_pylist()[:2]])
        res = brute_force_topk(embeddings_ds, "vec_id", "embedding",
                               [0, 1], qv, k=3)
        for qi in (0, 1):
            top = res[(res.query_id == qi) & (res["rank"] == 0)]
            assert top["vec_id"].iloc[0] == qi
            assert abs(top["cosine"].iloc[0] - 1.0) < 1e-9


class TestTextStats:
    def test_stage_matches_scalar_kernels(self, documents_ds):
        from searchenginesimple_ray.functions.textstats import (
            bpe_token_count, lang_id, quality_stats, rolling_fingerprint,
            whitespace_token_count)
        from searchenginesimple_ray.config import DEFAULT_STOP_WORDS
        from searchenginesimple_ray.stages.textstages import text_stats
        out = text_stats(documents_ds, stop_words=DEFAULT_STOP_WORDS) \
            .to_pandas().set_index("doc_id")
        import pyarrow.parquet as pq
        t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                          columns=["doc_id", "text"]).to_pandas()
        stop = frozenset(DEFAULT_STOP_WORDS)
        for _, row in t.head(50).iterrows():
            r = out.loc[row.doc_id]
            assert r.n_ws_tokens == whitespace_token_count(row.text)
            assert r.n_bpe_tokens == bpe_token_count(row.text)
            assert r.lang_pred == lang_id(row.text)
            assert int(r.fingerprint) == rolling_fingerprint(row.text)
            qs = quality_stats(row.text, stop)
            assert abs(r.stop_ratio - qs["stop_ratio"]) < 1e-12
            assert abs(r.punct_ratio - qs["punct_ratio"]) < 1e-12

    def test_quality_score_bounds(self, documents_ds):
        from searchenginesimple_ray.stages.textstages import text_stats
        out = text_stats(documents_ds).to_pandas()
        assert ((out.quality_score >= 0) & (out.quality_score <= 1)).all()


class TestRepetitionAndContamination:
    TEXTS = [
        "a b c a b c a b c",          # heavy 3-gram repetition
        "x y z w v u t s",            # all distinct
        "a a a a",                    # one token repeated
        "q r",                        # below trigram width
        "solo",                       # below bigram width
        "",                           # empty
    ]

    def _brute(self, text):
        toks = text.split()
        from collections import Counter
        bi = Counter(zip(toks, toks[1:]))
        tri = Counter(zip(toks, toks[1:], toks[2:]))
        return (len(toks), len(set(toks)),
                max(bi.values()) if bi else 0,
                sum(tri.values()) - len(tri))

    def test_repetition_matches_brute_force(self, ray_session):
        from searchenginesimple_ray.stages.textstages import repetition_stats
        ds = ray.data.from_items(
            [{"doc_id": i, "text": t} for i, t in enumerate(self.TEXTS)])
        out = repetition_stats(ds).to_pandas().set_index("doc_id")
        for i, t in enumerate(self.TEXTS):
            nt, nd, top2, dup3 = self._brute(t)
            r = out.loc[i]
            assert (r.n_tokens, r.n_distinct_tokens,
                    r.top_bigram_count, r.n_dup_trigrams) == \
                (nt, nd, top2, dup3), (i, t)

    def test_decontaminate_counts(self, ray_session):
        from searchenginesimple_ray.stages.textstages import decontaminate
        vocab = "alpha beta gamma delta epsilon zeta eta theta iota " \
                "kappa lam mu nu xi".split()
        bench_text = " ".join(vocab)                       # 14 tokens
        clean_text = " ".join(reversed(vocab))
        partial = " ".join(vocab[:13] + ["OTHER", "WORDS"])
        bench = ray.data.from_items([{"doc_id": 0, "text": bench_text}])
        corpus = ray.data.from_items([
            {"doc_id": 1, "text": bench_text},     # full copy: 2 hits
            {"doc_id": 2, "text": clean_text},     # 0 hits
            {"doc_id": 3, "text": partial},        # first 13-gram only
            {"doc_id": 4, "text": "too short"},    # no grams at all
        ])
        out = decontaminate(corpus, bench, n=13) \
            .to_pandas().set_index("doc_id")
        assert out.loc[1].n_grams == 2 and out.loc[1].n_overlap == 2
        assert out.loc[2].n_grams == 2 and out.loc[2].n_overlap == 0
        assert out.loc[3].n_grams == 3 and out.loc[3].n_overlap == 1
        assert out.loc[4].n_grams == 0 and out.loc[4].n_overlap == 0


class TestDedupFamily:
    def test_minhash_detects_near_identical(self, ray_session):
        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep dark forest tonight")
        rows = {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [base, base + " extra", base.replace("quick", "quack"),
                     "completely different text about ray data pipelines",
                     "another unrelated document mentioning nothing shared",
                     base],
        }
        ds = ray.data.from_arrow(pa.table(rows))
        from searchenginesimple_ray.stages.dedup import minhash_lsh_dedup
        pairs = minhash_lsh_dedup(ds, "doc_id", "text",
                                  jaccard_threshold=0.7)
        got = dict(zip(pairs["id"], pairs["rep_id"]))
        # 0, 1, 2, 5 are near-identical; 3 and 4 are not
        assert got.get(5) == 0
        assert 3 not in got and 4 not in got
        # the count-prefilter (distributed) path must agree
        pairs2 = minhash_lsh_dedup(ds, "doc_id", "text",
                                   jaccard_threshold=0.7, driver_limit=0)
        assert pairs2.values.tolist() == pairs.values.tolist()

    def test_minhash_exchange_carries_no_signatures(self, ray_session):
        # SCALE invariant: the 16x band explosion must be 24-byte rows —
        # signatures live only in the compact per-doc table
        from searchenginesimple_ray.stages.dedup import (_bands_batch,
                                                         _minhash_sig_batch)
        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": ["some document text here", "another one"]})
        sig_t = _minhash_sig_batch(t, 64, 5, 7)
        assert sig_t.column_names == ["id", "sig"]
        assert sig_t.num_rows == 2          # one row per doc, no explosion
        bands = _bands_batch(sig_t, 16)
        assert bands.column_names == ["id", "band_id", "band_key"]
        assert bands.num_rows == 32
        assert "sig" not in bands.column_names

    def test_minhash_bucket_pairwise_not_star(self):
        # two docs similar to EACH OTHER but not to the bucket min must
        # still pair (star-vs-min verification missed these)
        from searchenginesimple_ray.stages.dedup import minhash_bucket_edges
        rng = np.random.RandomState(0)
        sig1 = rng.randint(0, 2**31 - 1, 64).astype(np.uint32)
        sig2 = rng.randint(0, 2**31 - 1, 64).astype(np.uint32)
        sig3 = sig2.copy()
        sig3[:4] = sig3[:4] + 1          # est(2,3) = 60/64 ≈ 0.94
        sigs = np.stack([sig1, sig2, sig3])
        edges = minhash_bucket_edges(np.array([1, 2, 3]), sigs,
                                     threshold=0.8)
        got = {(int(r.src), int(r.dst)) for r in edges.itertuples()}
        assert got == {(2, 3)}

    def test_minhash_batch_kernels_match_scalar(self):
        from searchenginesimple_ray.functions.minhash import (
            _permutations, char_shingles, lsh_band_keys,
            lsh_band_keys_batch, minhash_signature,
            minhash_signatures_batch)
        texts = ["the quick brown fox", "pack my box with five dozen",
                 "zz", ""]
        perms = _permutations(64, 7)
        sets = [char_shingles(t) for t in texts]
        batch = minhash_signatures_batch(sets, 64, perms=perms)
        for i, s in enumerate(sets):
            np.testing.assert_array_equal(
                batch[i], minhash_signature(s, 64, perms=perms))
        keys = lsh_band_keys_batch(batch, 16)
        for i in range(len(texts)):
            np.testing.assert_array_equal(keys[i],
                                          lsh_band_keys(batch[i], 16))

    def test_ngram_exact_vs_bruteforce(self, ray_session):
        # the prefix filter is candidate-exact: engine pairs must equal
        # brute-force word-3-gram Jaccard >= t over all pairs
        from searchenginesimple_ray.functions.minhash import (jaccard,
                                                              word_ngrams)
        from searchenginesimple_ray.stages.dedup import ngram_jaccard_pairs
        rng = np.random.RandomState(11)
        vocab = [f"w{i}" for i in range(30)]
        texts = []
        for i in range(12):
            base = [vocab[rng.randint(30)] for _ in range(12)]
            texts.append(" ".join(base))
            mut = list(base)
            mut[rng.randint(12)] = vocab[rng.randint(30)]
            texts.append(" ".join(mut))          # near-dup partner
        texts.append("a b")                       # < n tokens edge case
        texts.append("a b")
        ids = np.arange(len(texts), dtype=np.int64)
        t = 0.6
        expect = set()
        gsets = [word_ngrams(tx.split(), 3) for tx in texts]
        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                if jaccard(gsets[i], gsets[j]) >= t:
                    expect.add((i, j))
        ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
        pairs = ngram_jaccard_pairs(ds, "doc_id", "text", n=3, threshold=t)
        got = {(int(r.src), int(r.dst)) for r in pairs.itertuples()}
        assert got == expect

    def test_ngram_jaccard_pairs(self, ray_session):
        a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        ds = ray.data.from_arrow(pa.table({
            "doc_id": np.array([1, 2, 3], dtype=np.int64),
            "text": [a, a + " lambda", "totally different words here now"],
        }))
        from searchenginesimple_ray.stages.dedup import ngram_jaccard_pairs
        pairs = ngram_jaccard_pairs(ds, "doc_id", "text", n=3, threshold=0.7)
        assert [(int(r.src), int(r.dst)) for r in pairs.itertuples()] == [(1, 2)]

    def test_ngram_bucketed_verify_matches_driver(self, ray_session):
        """The distributed key-bucketed verify (forced via
        driver_limit=0) must produce exactly the driver-path pairs on a
        dup-heavy randomized corpus, including jaccard values."""
        from searchenginesimple_ray.stages.dedup import ngram_jaccard_pairs
        rng = np.random.RandomState(23)
        vocab = [f"tok{i}" for i in range(40)]
        texts = []
        for i in range(160):
            base = [vocab[rng.randint(40)] for _ in range(12)]
            texts.append(" ".join(base))
            if rng.rand() < 0.5:   # near-dup: mutate one token
                mut = list(base)
                mut[rng.randint(12)] = vocab[rng.randint(40)]
                texts.append(" ".join(mut))
        ids = np.arange(len(texts), dtype=np.int64)
        ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
        t = 0.5
        drv = ngram_jaccard_pairs(ds, "doc_id", "text", n=3, threshold=t)
        dist = ngram_jaccard_pairs(ds, "doc_id", "text", n=3, threshold=t,
                                   driver_limit=0, num_buckets=7)
        assert len(drv) > 0
        pd.testing.assert_frame_equal(
            drv.reset_index(drop=True), dist.reset_index(drop=True))

    def test_minhash_dedup_keep_streaming_filter(self, ray_session):
        """keep == all docs minus non-representative cluster members,
        exactly complementing minhash_lsh_dedup's (id, rep_id) map."""
        from searchenginesimple_ray.stages.dedup import (
            minhash_dedup_keep, minhash_lsh_dedup)
        rng = np.random.RandomState(5)
        base = ["the quick brown fox jumps over the lazy dog " * 3,
                "pack my box with five dozen liquor jugs " * 3,
                "sphinx of black quartz judge my vow " * 3]
        texts = []
        for i in range(60):
            t = base[i % 3]
            if i % 4 == 0:   # near-dup: flip one character
                j = rng.randint(len(t))
                t = t[:j] + "Z" + t[j + 1:]
            texts.append(t + f" tail{i % 3}")
        ids = np.arange(60, dtype=np.int64)
        tab = pa.table({"doc_id": ids, "text": texts,
                        "extra": np.arange(60, dtype=np.int64) * 2})
        ds = ray.data.from_arrow(tab)
        clusters = minhash_lsh_dedup(ds, "doc_id", "text",
                                     jaccard_threshold=0.8)
        kept = minhash_dedup_keep(ds, "doc_id", "text",
                                  jaccard_threshold=0.8).to_pandas()
        dropped = set(clusters["id"])
        assert len(dropped) > 0
        assert sorted(kept["doc_id"]) == sorted(set(ids) - dropped)
        # non-id columns pass through the streaming filter untouched
        assert (kept["extra"].to_numpy()
                == kept["doc_id"].to_numpy() * 2).all()

    def test_ngram_dedup_keep_complements_pairs(self, ray_session):
        from searchenginesimple_ray.stages.dedup import (
            components_min_rep, ngram_dedup_keep, ngram_jaccard_pairs)
        texts = ["alpha beta gamma delta epsilon zeta"] * 3 + \
                ["one two three four five six seven"] * 2 + \
                [f"unique doc number {i} with words" for i in range(5)]
        ids = np.arange(len(texts), dtype=np.int64)
        ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
        pairs = ngram_jaccard_pairs(ds, "doc_id", "text", n=3,
                                    threshold=0.8)
        dropped = set(components_min_rep(pairs[["src", "dst"]]))
        assert dropped == {1, 2, 4}
        kept = ngram_dedup_keep(ds, "doc_id", "text", n=3,
                                threshold=0.8).to_pandas()
        assert sorted(kept["doc_id"]) == sorted(set(ids) - dropped)

    def test_ngram_null_text_treated_empty(self, ray_session):
        from searchenginesimple_ray.stages.dedup import ngram_jaccard_pairs
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(np.array([1, 2, 3], np.int64)),
            "text": pa.array(["a b c d e", None, "a b c d e"],
                             pa.string())}))
        pairs = ngram_jaccard_pairs(ds, "doc_id", "text", n=2,
                                    threshold=0.8)
        assert [(int(r.src), int(r.dst)) for r in pairs.itertuples()] \
            == [(1, 3)]

    def test_pair_intersections_chunked_exact(self):
        """Tiny budget forces many chunks; result must equal the
        single-pass kernel exactly."""
        from searchenginesimple_ray.stages.dedup import (
            _pair_intersections, _pair_intersections_chunked)
        rng = np.random.RandomState(11)
        rows = [np.unique(rng.randint(0, 50, size=rng.randint(1, 20))
                          .astype(np.int64)) for _ in range(30)]
        lens = np.array([len(r) for r in rows], np.int64)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        flat = np.concatenate(rows)
        pi = rng.randint(0, 30, size=200).astype(np.int64)
        pj = rng.randint(0, 30, size=200).astype(np.int64)
        want = _pair_intersections(flat, starts, lens, pi, pj)
        got = _pair_intersections_chunked(flat, starts, lens, pi, pj,
                                          budget=16)
        np.testing.assert_array_equal(got, want)

    def test_embedding_near_dup(self, ray_session):
        rng = np.random.RandomState(3)
        base = rng.randn(8, 16).astype(np.float32)
        vecs = np.vstack([base, base[0] + 0.001 * rng.randn(16).astype(np.float32)])
        ds = ray.data.from_arrow(pa.table({
            "vec_id": np.arange(9, dtype=np.int64),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }))
        from searchenginesimple_ray.stages.dedup import \
            embedding_near_dup_pairs
        pairs = embedding_near_dup_pairs(ds, "vec_id", "embedding",
                                         cosine_threshold=0.99)
        assert (0, 8) in {(int(r.src), int(r.dst))
                          for r in pairs.itertuples()}

    def test_embedding_lsh_subset_of_exact(self, ray_session):
        """LSH bucketed pairs must be a subset of the exact all-pairs
        kernel (no false positives) and find the planted near-dup."""
        rng = np.random.RandomState(3)
        base = rng.randn(8, 16).astype(np.float32)
        vecs = np.vstack([base,
                          base[0] + 0.001 * rng.randn(16).astype(np.float32)])
        ds = ray.data.from_arrow(pa.table({
            "vec_id": np.arange(9, dtype=np.int64),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }))
        from searchenginesimple_ray.stages.dedup import (
            embedding_near_dup_pairs, embedding_pairs_exact)
        exact = {(int(r.src), int(r.dst)) for r in
                 embedding_pairs_exact(ds, "vec_id", "embedding",
                                       0.99).itertuples()}
        lsh = {(int(r.src), int(r.dst)) for r in
               embedding_near_dup_pairs(ds, "vec_id", "embedding",
                                        cosine_threshold=0.99).itertuples()}
        assert (0, 8) in exact
        assert lsh <= exact
        assert (0, 8) in lsh   # recall on the planted pair

    def test_embedding_pairs_quantized_vs_python_ints(self, ray_session):
        """The quantized integer edge rule must match a pure-Python
        arbitrary-precision integer implementation exactly — including
        vectors engineered to land near the cosine threshold."""
        import math

        from searchenginesimple_ray.stages.dedup import \
            embedding_pairs_quantized
        rng = np.random.RandomState(11)
        vecs = rng.randn(40, 16).astype(np.float32) * 0.3
        # engineered near-threshold pairs: b ~ a rotated to cosine~0.4
        a = vecs[0] / np.linalg.norm(vecs[0])
        perp = rng.randn(16).astype(np.float32)
        perp -= perp @ a * a
        perp /= np.linalg.norm(perp)
        for i, eps in enumerate((-1e-7, 0.0, 1e-7)):
            c = 0.4 + eps
            vecs[30 + i] = (c * a + math.sqrt(max(0, 1 - c * c)) * perp) \
                .astype(np.float32)
        vecs[35] = 0.0                      # zero vector: never an edge
        ds = ray.data.from_arrow(pa.table({
            "vec_id": np.arange(40, dtype=np.int64),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }))
        got = {(int(r.src), int(r.dst)) for r in embedding_pairs_quantized(
            ds, "vec_id", "embedding", 2, 5).itertuples()}
        q = [[int(math.floor(float(x) * 1024.0 + 0.5)) for x in
              np.asarray(v, np.float64)] for v in vecs]
        want = set()
        for i in range(40):
            for j in range(i + 1, 40):
                na = sum(x * x for x in q[i])
                nb = sum(x * x for x in q[j])
                dp = sum(x * y for x, y in zip(q[i], q[j]))
                if na > 0 and nb > 0 and dp >= 0 \
                        and 25 * dp * dp >= 4 * na * nb:
                    want.add((i, j))
        assert got == want
        assert not any(35 in p for p in got)

    def test_embedding_pairs_quantized_matches_duckdb(self, ray_session):
        """The exact oracle-side SQL formulation (list_dot_product over
        quantized integer-valued doubles) reproduces the kernel."""
        import duckdb

        from searchenginesimple_ray.stages.dedup import \
            embedding_pairs_quantized
        rng = np.random.RandomState(5)
        vecs = rng.randn(30, 8).astype(np.float32) * 0.4
        pdf = pd.DataFrame({
            "vec_id": np.arange(30, dtype=np.int64),
            "embedding": [list(map(float, v)) for v in vecs]})
        ds = ray.data.from_arrow(pa.table({
            "vec_id": pa.array(pdf["vec_id"]),
            "embedding": pa.array(pdf["embedding"],
                                  pa.list_(pa.float32()))}))
        got = embedding_pairs_quantized(ds, "vec_id", "embedding", 2, 5)
        con = duckdb.connect()
        con.register("embeddings", pd.DataFrame({
            "vec_id": pdf["vec_id"],
            "embedding": [np.asarray(v, np.float32) for v in
                          pdf["embedding"]]}))
        want = con.execute("""
WITH q AS (
  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
                                x -> floor(x * 1024 + 0.5)) AS qv
  FROM embeddings
), nq AS (
  SELECT vec_id, qv,
         CAST(list_dot_product(CAST(qv AS DOUBLE[]),
                               CAST(qv AS DOUBLE[])) AS BIGINT) AS qn
  FROM q
), pr AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         CAST(list_dot_product(CAST(a.qv AS DOUBLE[]),
                               CAST(b.qv AS DOUBLE[])) AS BIGINT) AS dp,
         a.qn AS na, b.qn AS nb
  FROM nq a JOIN nq b ON a.vec_id < b.vec_id
)
SELECT src, dst FROM pr
WHERE na > 0 AND nb > 0 AND dp >= 0 AND 25*dp*dp >= 4*na*nb
ORDER BY src, dst""").df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True),
            want.astype({"src": np.int64, "dst": np.int64}))

    def test_min_label_components_match_unionfind(self, ray_session):
        """The distributed min-label-propagation scale path must give
        the same components as the driver union-find on random graphs
        (including chains, which need multiple propagation rounds)."""
        from searchenginesimple_ray.stages.dedup import (
            components_min_label_distributed, components_min_rep)
        rng = np.random.RandomState(5)
        edges = []
        # random sparse graph over 0..199
        for _ in range(120):
            a, b = rng.randint(0, 200, 2)
            if a != b:
                edges.append((min(a, b), max(a, b)))
        # a long chain 500..540 (diameter 40: exercises many rounds)
        edges += [(i, i + 1) for i in range(500, 540)]
        pdf = pd.DataFrame(edges, columns=["src", "dst"]).astype(np.int64)
        want = components_min_rep(pdf)
        ds = ray.data.from_arrow(pa.Table.from_pandas(pdf,
                                                      preserve_index=False))
        got_df = components_min_label_distributed(ds, num_buckets=8)
        got = {int(k): int(v) for k, v in
               zip(got_df["id"], got_df["rep_id"]) if int(k) != int(v)}
        # union-find returns only non-root members; the label version
        # also returns the roots (mapped to themselves) — same clusters
        assert got == {k: v for k, v in want.items() if k != v}

    def test_min_label_deep_chain_converges(self, ray_session):
        """A path graph with diameter far above the iteration cap must
        still fully merge: pointer doubling gives O(log diameter)
        rounds, and the loop runs to an exact sum fixed point (the old
        one-hop version silently under-merged past max_iters hops)."""
        from searchenginesimple_ray.stages.dedup import \
            components_min_label_distributed
        n = 600   # diameter 599 >> max_iters
        pdf = pd.DataFrame({"src": np.arange(n - 1, dtype=np.int64),
                            "dst": np.arange(1, n, dtype=np.int64)})
        ds = ray.data.from_arrow(pa.Table.from_pandas(pdf,
                                                      preserve_index=False))
        got = components_min_label_distributed(ds, num_buckets=4,
                                               max_iters=24)
        assert (got["rep_id"].to_numpy() == 0).all()
        assert len(got) == n

    def test_exact_dedup_first(self, ray_session):
        ds = ray.data.from_arrow(pa.table({
            "doc_id": np.array([5, 3, 9, 7], dtype=np.int64),
            "text": ["x", "x", "y", "y"],
        }))
        from searchenginesimple_ray.stages.dedup import exact_dedup_first
        kept = sorted(exact_dedup_first(ds, "text", "doc_id")
                      .to_pandas()["doc_id"])
        assert kept == [3, 7]

    def test_exact_dedup_first_randomized_vs_pandas(self, ray_session):
        """Hash-key plan == groupby(text).min(doc_id) ground truth on a
        randomized corpus with heavy duplication, unique rows, empty
        strings and nulls."""
        from searchenginesimple_ray.stages.dedup import exact_dedup_first
        rng = np.random.RandomState(17)
        pool = [f"text body {i}" for i in range(40)]
        texts = [pool[rng.randint(len(pool))] if rng.rand() < 0.7
                 else f"unique {i}" for i in range(500)]
        texts[10] = ""
        texts[20] = ""
        texts[30] = None
        texts[40] = None
        ids = rng.permutation(500).astype(np.int64)
        pdf = pd.DataFrame({"doc_id": ids, "text": texts})
        want = sorted(pdf.fillna({"text": "<null-sentinel>"})
                      .groupby("text")["doc_id"].min())
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(ids), "text": pa.array(texts, pa.string())}))
        got = sorted(exact_dedup_first(ds, "text", "doc_id")
                     .to_pandas()["doc_id"])
        assert got == want

    def test_exact_dedup_first_bucketed_equals_driver(self, ray_session):
        """Above ``driver_limit`` the winner resolution buckets by
        h1 % B into Ray tasks — result must be identical to the driver
        lexsort path (and to the pandas ground truth)."""
        from searchenginesimple_ray.stages.dedup import exact_dedup_first
        rng = np.random.RandomState(23)
        pool = [f"dup body {i}" for i in range(30)]
        texts = [pool[rng.randint(len(pool))] if rng.rand() < 0.6
                 else f"solo {i}" for i in range(400)]
        ids = rng.permutation(400).astype(np.int64)
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(ids),
            "text": pa.array(texts, pa.string())})).repartition(7)
        driver = sorted(exact_dedup_first(
            ds, "text", "doc_id",
            driver_limit=10**9).to_pandas()["doc_id"])
        bucketed = sorted(exact_dedup_first(
            ds, "text", "doc_id", driver_limit=0,
            num_buckets=5).to_pandas()["doc_id"])
        want = sorted(pd.DataFrame({"doc_id": ids, "text": texts})
                      .groupby("text")["doc_id"].min())
        assert bucketed == driver == want

    def test_exact_dedup_first_bucketed_tie_refused(self, ray_session):
        """The tie-at-minimum refusal must fire through the bucketed
        path too (the kernel runs inside Ray tasks there)."""
        from searchenginesimple_ray.stages.dedup import exact_dedup_first
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(np.array([5, 5, 9], np.int64)),
            "text": ["x", "x", "x"]}))
        with pytest.raises(Exception, match="tie at the minimum"):
            exact_dedup_first(ds, "text", "doc_id", driver_limit=0,
                              num_buckets=3).materialize()

    def test_exact_dedup_first_no_dups_passthrough(self, ray_session):
        from searchenginesimple_ray.stages.dedup import exact_dedup_first
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(20, dtype=np.int64)),
            "text": [f"t{i}" for i in range(20)]}))
        got = exact_dedup_first(ds, "text", "doc_id").to_pandas()
        assert sorted(got["doc_id"]) == list(range(20))

    def test_exact_dedup_first_int_key_double_hash(self, ray_session):
        """Non-string key columns must still get TWO independent
        hashes (hash_pandas_object applies hash_key only to object
        dtype — the kernel casts to string first) and dedupe
        correctly."""
        from searchenginesimple_ray.stages.dedup import (
            _XD_K1, _XD_K2, _hash_key_batch, exact_dedup_first)
        t = pa.table({
            "k": pa.array(np.array([7, 7, 8, 9, 9, 9], np.int64)),
            "doc_id": pa.array(np.arange(6, dtype=np.int64))})
        hb = _hash_key_batch(t, "k", "doc_id")
        h1 = hb["h1"].to_numpy()
        h2 = hb["h2"].to_numpy()
        assert not np.array_equal(h1, h2), \
            "second hash collapsed to the first (hash_key ignored)"
        assert _XD_K1 != _XD_K2
        ds = ray.data.from_arrow(t)
        kept = sorted(exact_dedup_first(ds, "k", "doc_id")
                      .to_pandas()["doc_id"])
        assert kept == [0, 2, 3]

    def test_exact_dedup_first_min_tie_refused(self, ray_session):
        """A duplicate group tying at the minimum order value cannot
        be resolved by value filtering — must raise, not under-dedup."""
        from searchenginesimple_ray.stages.dedup import exact_dedup_first
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(np.array([5, 5, 9], np.int64)),
            "text": ["x", "x", "x"]}))
        with pytest.raises(ValueError, match="tie at the minimum"):
            exact_dedup_first(ds, "text", "doc_id").materialize()

    def test_exact_dedup_first_float_order(self, ray_session):
        from searchenginesimple_ray.stages.dedup import exact_dedup_first
        ds = ray.data.from_arrow(pa.table({
            "score": pa.array([5.25, 3.5, 9.0, 7.125], pa.float64()),
            "text": ["x", "x", "y", "y"]}))
        kept = sorted(exact_dedup_first(ds, "text", "score")
                      .to_pandas()["score"])
        assert kept == [3.5, 7.125]


class TestMultimodal:
    def test_image_stage_plumbing(self, ray_session):
        from searchenginesimple_ray.stages.multimodal import (
            decode_images, media_table_from_texts)
        t = media_table_from_texts(np.arange(5),
                                   [f"payload text number {i} " * (i + 2)
                                    for i in range(5)], kind="image")
        out = decode_images(ray.data.from_arrow(t), batch_size=2).to_pandas()
        assert len(out) == 5
        assert {"img_mean", "img_std", "img_edge_energy"} <= set(out.columns)
        assert (out.img_mean > 0).all()
        # deterministic across runs
        out2 = decode_images(ray.data.from_arrow(t), batch_size=3).to_pandas()
        pd.testing.assert_frame_equal(
            out.sort_values("media_id").reset_index(drop=True),
            out2.sort_values("media_id").reset_index(drop=True))

    def test_audio_stage_plumbing(self, ray_session):
        from searchenginesimple_ray.stages.multimodal import (
            frame_audio, media_table_from_texts)
        t = media_table_from_texts(np.arange(3),
                                   ["a" * 4000, "b" * 100, "c" * 2048],
                                   kind="audio")
        out = frame_audio(ray.data.from_arrow(t)).to_pandas()
        assert (out.n_frames >= 1).all()
        assert all(len(r) == n for r, n in zip(out.frame_rms, out.n_frames))

    def test_audio_rms_integer_exact(self, ray_session):
        # frame RMS must equal sqrt(sum((b-128)^2) / (cnt * 128^2)) on
        # exact integer sums — the property the SQL oracle relies on
        from searchenginesimple_ray.stages.multimodal import (
            frame_audio, media_table_from_texts)
        texts = ["x" * 700, "short", "", "y" * 256, "z" * 257]
        t = media_table_from_texts(np.arange(5), texts, kind="audio")
        out = (frame_audio(ray.data.from_arrow(t),
                           frame_len=256, hop=128, max_frames=64)
               .to_pandas().sort_values("media_id").reset_index(drop=True))
        for i, txt in enumerate(texts):
            raw = np.frombuffer(txt.encode(), dtype=np.uint8)
            if raw.size == 0:
                raw = np.full(256, 128, np.uint8)
            starts = np.arange(0, max(1, raw.size - 256 + 1), 128)[:64]
            assert out.n_frames[i] == len(starts)
            for j, s in enumerate(starts):
                seg = raw[s:s + 256].astype(np.int64) - 128
                want = np.sqrt(int((seg * seg).sum())
                               / (max(len(seg), 1) * 16384.0))
                assert out.frame_rms[i][j] == want  # bitwise, not approx

    def test_video_stage_plumbing(self, ray_session):
        from searchenginesimple_ray.stages.multimodal import (
            media_table_from_texts, sample_video_frames)
        texts = ["frame data " * 40, "tiny", "x" * 2000]
        t = media_table_from_texts(np.arange(3), texts, kind="video")
        out = (sample_video_frames(ray.data.from_arrow(t), batch_size=2)
               .to_pandas().sort_values("media_id").reset_index(drop=True))
        assert (out.n_sampled >= 1).all()
        assert all(len(m) == n for m, n in zip(out.frame_mean,
                                               out.n_sampled))
        # frame means are exact integer sums over the tiled stream
        for i, txt in enumerate(texts):
            p = txt.encode()
            w = max(4, min(32, len(p) // 8))
            h = max(4, w // 2)
            nf = max(1, min(100, len(p) // 16))
            raw = np.frombuffer(p or b"\x00", dtype=np.uint8)
            tiled = np.tile(raw, int(np.ceil(nf * w * h / raw.size)) + 1)
            for j, f in enumerate(range(0, nf, 2)[:16]):
                seg = tiled[f * w * h:(f + 1) * w * h]
                assert out.frame_mean[i][j] == int(seg.sum()) / float(w * h)

    def test_real_codec_constructs_and_rejects_unknown(self):
        # round 4: codec="real" is genuinely real (pure-stdlib PNG /
        # WAV / Y4M parsers — see tests/test_codecs.py); unknown codec
        # names fail fast at construction
        from searchenginesimple_ray.stages.multimodal import (
            AudioFrameStage, ImageDecodeStage, VideoFrameSampleStage)
        for cls in (ImageDecodeStage, AudioFrameStage,
                    VideoFrameSampleStage):
            cls(codec="real")
            with pytest.raises(ValueError):
                cls(codec="pillow")


class TestHashSplit:
    """stages/sampling.py: deterministic, SQL-exact split & sample."""

    def test_split_matches_duckdb_oracle(self, ray_session):
        import duckdb
        import ray.data

        from searchenginesimple_ray.stages.sampling import hash_split
        docs = pd.DataFrame({"doc_id": np.arange(10_000, dtype=np.int64)})
        got = hash_split(ray.data.from_pandas(docs), key="doc_id",
                         splits={"train": 0.8, "val": 0.1, "test": 0.1},
                         seed=0).to_pandas().sort_values("doc_id")
        want = duckdb.sql("""
            SELECT doc_id,
                   CASE WHEN hv < 3435973836 THEN 'train'
                        WHEN hv < 3865470566 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         ((doc_id % 2147483648) * 2654435761)
                             % 4294967296 AS hv
                  FROM docs) ORDER BY doc_id""").df()
        assert got["split"].tolist() == want["split"].tolist()
        # all three splits populated, fractions roughly right
        frac = got["split"].value_counts(normalize=True)
        assert abs(frac["train"] - 0.8) < 0.02
        assert abs(frac["val"] - 0.1) < 0.02

    def test_split_datasets_partition_and_bernoulli(self, ray_session):
        import ray.data

        from searchenginesimple_ray.stages.sampling import (
            bernoulli_sample, hash_split, split_datasets)
        docs = pd.DataFrame({"doc_id": np.arange(5_000, dtype=np.int64)})
        ds = ray.data.from_pandas(docs)
        parts = {k: set(v.to_pandas()["doc_id"])
                 for k, v in split_datasets(ds, key="doc_id").items()}
        assert sum(len(s) for s in parts.values()) == 5_000
        assert parts["train"] | parts["val"] | parts["test"] \
            == set(range(5_000))
        # the split column agrees with the filtered datasets
        col = hash_split(ds, key="doc_id").to_pandas()
        for name, ids in parts.items():
            assert set(col.loc[col["split"] == name, "doc_id"]) == ids
        # Bernoulli(0.8) with the same seed == the train split
        samp = set(bernoulli_sample(ds, 0.8, key="doc_id")
                   .to_pandas()["doc_id"])
        assert samp == parts["train"]

    def test_seed_changes_assignment_and_negative_key_raises(self):
        from searchenginesimple_ray.stages.sampling import hash_u32
        k = np.arange(1000, dtype=np.int64)
        assert not np.array_equal(hash_u32(k, 0), hash_u32(k, 1))
        with pytest.raises(ValueError):
            hash_u32(np.array([-1], dtype=np.int64))

    def test_quota_by_group_matches_window_oracle(self, ray_session):
        import duckdb
        import ray.data

        from searchenginesimple_ray.stages.sampling import quota_by_group
        rng = np.random.default_rng(7)
        docs = pd.DataFrame({
            "doc_id": np.arange(2_000, dtype=np.int64),
            "source": rng.integers(0, 17, 2_000).astype(str)})
        got = quota_by_group(ray.data.from_pandas(docs), "source", 13,
                             key="doc_id", seed=0).to_pandas()
        got = got.sort_values("doc_id").reset_index(drop=True)
        want = duckdb.sql("""
            SELECT doc_id, source FROM (
              SELECT doc_id, source, row_number() OVER (
                  PARTITION BY source
                  ORDER BY ((doc_id % 2147483648) * 2654435761)
                           % 4294967296, doc_id) AS rn
              FROM docs) WHERE rn <= 13 ORDER BY doc_id""").df()
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert (got.groupby("source").size() <= 13).all()


class TestHeavyHitters:
    """stages/sketches.py: Misra-Gries phi-heavy-hitters with an exact
    recount pass — output must be EXACT despite the bounded sketch."""

    @staticmethod
    def _exact(texts, phi_num, phi_den):
        toks = [t for s in texts for t in s.split()]
        c = pd.Series(toks).value_counts()
        total = len(toks)
        out = c[c * phi_den > total * phi_num]
        return {t: int(n) for t, n in out.items()}

    def test_exact_on_adversarial_stream(self, ray_session):
        """Many distinct rare terms per block force MG compression in
        every partial; heavy terms must still come out with EXACT
        counts (superset guarantee + recount)."""
        import ray.data

        from searchenginesimple_ray.stages.sketches import heavy_hitters
        rng = np.random.default_rng(3)
        texts = []
        for i in range(400):
            # each doc: 20 unique-ish rare tokens + some heavies
            rare = [f"r{i}_{j}" for j in range(20)]
            heavy = ["alpha"] * 3 + (["beta"] * 2 if i % 2 else []) \
                + (["gamma"] if i % 10 == 0 else [])
            toks = rare + heavy
            rng.shuffle(toks)
            texts.append(" ".join(toks))
        ds = ray.data.from_pandas(
            pd.DataFrame({"text": texts})).repartition(8)
        got = heavy_hitters(ds, "text", phi_num=1, phi_den=50, cap=50)
        want = self._exact(texts, 1, 50)
        assert dict(zip(got["term"], got["n_occurrences"])) == want
        assert "alpha" in want  # the test is vacuous otherwise

    def test_kll_exact_quantiles_unbounded(self, ray_session):
        """KLL-window + exact recount == numpy quantile_disc ground
        truth on unbounded floats with heavy duplication and NaNs,
        at every tested k (the sketch only proposes windows)."""
        import ray.data

        from searchenginesimple_ray.stages.sketches import \
            exact_quantiles_unbounded
        rng = np.random.RandomState(9)
        vals = np.concatenate([
            rng.lognormal(3, 2, 4000),          # unbounded heavy tail
            np.repeat(rng.lognormal(3, 2, 10), 200),   # duplicates
            [np.nan] * 50])
        rng.shuffle(vals)
        ds = ray.data.from_pandas(
            pd.DataFrame({"value": vals})).repartition(6)
        clean = np.sort(vals[~np.isnan(vals)])
        qs = (0.25, 0.5, 0.75, 0.9, 0.99)
        import math
        want = [float(clean[max(1, math.ceil(q * len(clean))) - 1])
                for q in qs]
        for k in (8, 256):     # k=8: windows WILL miss -> retry path
            got = exact_quantiles_unbounded(ds, "value", qs=qs, k=k)
            assert got["value"].tolist() == want, k
        # tiny initial slack forces the doubling retry loop explicitly
        got = exact_quantiles_unbounded(ds, "value", qs=qs, k=256,
                                        _initial_slack=1)
        assert got["value"].tolist() == want

    def test_kll_exact_quantiles_with_infinities(self, ray_session):
        """Real +-inf values are legal in an unbounded domain and must
        not be conflated with the below-window marker (regression: the
        old -inf sentinel made a quantile inside a -inf run loop
        forever)."""
        import ray.data

        from searchenginesimple_ray.stages.sketches import \
            exact_quantiles_unbounded
        vals = np.array([-np.inf] * 10 + [1.0] * 25 + [2.0] * 10
                        + [np.inf] * 5)
        ds = ray.data.from_pandas(
            pd.DataFrame({"value": vals})).repartition(3)
        got = exact_quantiles_unbounded(
            ds, "value", qs=(0.1, 0.5, 0.95), k=16, _initial_slack=2)
        assert got["value"].tolist() == [-np.inf, 1.0, np.inf]

    def test_kll_sketch_rank_estimates(self):
        from searchenginesimple_ray.stages.sketches import KLLSketch
        rng = np.random.RandomState(2)
        a = KLLSketch(k=128, seed=1)
        b = KLLSketch(k=128, seed=2)
        va = rng.randn(30_000)
        vb = rng.randn(20_000) + 0.5
        a.update(va)
        b.update(vb)
        a.merge(b)
        allv = np.sort(np.concatenate([va, vb]))
        n = len(allv)
        assert a.n == n
        for q in (0.1, 0.5, 0.9):
            r = int(q * n)
            est = a.est_rank(float(allv[r]))
            assert abs(est - r) < 0.05 * n   # loose sanity bound
        # sketch memory stays O(k log n)
        assert sum(len(lv) for lv in a.levels) < 128 * 24

    def test_empty_and_no_hitters(self, ray_session):
        import ray.data

        from searchenginesimple_ray.stages.sketches import heavy_hitters
        # uniform stream: nothing exceeds 1/50
        texts = [" ".join(f"t{i}_{j}" for j in range(30))
                 for i in range(100)]
        ds = ray.data.from_pandas(pd.DataFrame({"text": texts}))
        got = heavy_hitters(ds, "text", phi_num=1, phi_den=50)
        assert len(got) == 0
        empty = ray.data.from_pandas(pd.DataFrame({"text": [""] * 5}))
        assert len(heavy_hitters(empty, "text")) == 0

    def test_matches_duckdb_oracle(self, ray_session):
        import importlib.util

        import duckdb
        spec = importlib.util.spec_from_file_location(
            "__ray_entry__", "/root/repo/__ray_entry__.py")
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        got = m.queries()["heavy_hitters"]("/root/testdata/sf0.001")
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    "'/root/testdata/sf0.001/documents.parquet'")
        want = con.execute(m.oracle_sql()["heavy_hitters"]).df()
        cols = sorted(want.columns)
        got = got[cols].sort_values(cols).reset_index(drop=True)
        want = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(want) > 0  # sf0.001 vocab is tiny: hitters exist
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestTokenLenQuantiles:
    """stages/sketches.token_count_quantiles: histogram-combine
    quantiles must implement DuckDB's quantile_disc rank rule."""

    def test_matches_duckdb_on_random_groups(self, ray_session):
        import duckdb
        import ray.data

        from searchenginesimple_ray.stages.sketches import \
            token_count_quantiles
        rng = np.random.default_rng(11)
        # odd/even/singleton group sizes stress the ceil(q*n) rule
        sizes = {"a": 101, "b": 100, "c": 1, "d": 7}
        rows = []
        for g, n in sizes.items():
            for _ in range(n):
                rows.append({"source": g,
                             "text": " ".join(
                                 "tok" for _ in range(rng.integers(0, 40)))})
        rng.shuffle(rows)
        docs = pd.DataFrame(rows)
        got = token_count_quantiles(
            ray.data.from_pandas(docs).repartition(6), "text", "source")
        want = duckdb.sql(r"""
            WITH tl AS (SELECT source,
                length(regexp_extract_all(text, '\S+')) AS v FROM docs)
            SELECT source, count(*) AS n_docs, min(v) AS min_tokens,
                   quantile_disc(v, 0.25) AS p25,
                   quantile_disc(v, 0.50) AS p50,
                   quantile_disc(v, 0.75) AS p75,
                   max(v) AS max_tokens
            FROM tl GROUP BY source ORDER BY source""").df()
        got = got.sort_values("source").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_driver_entry_matches_oracle(self, ray_session):
        import importlib.util

        import duckdb
        spec = importlib.util.spec_from_file_location(
            "__ray_entry__", "/root/repo/__ray_entry__.py")
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        got = m.queries()["token_len_quantiles"]("/root/testdata/sf0.001")
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    "'/root/testdata/sf0.001/documents.parquet'")
        want = con.execute(m.oracle_sql()["token_len_quantiles"]).df()
        cols = sorted(want.columns)
        got = got[cols].sort_values(cols).reset_index(drop=True)
        want = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(want) > 0
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestPiiScrub:
    """stages/textstages.pii_scrub: Arrow RE2 vs DuckDB RE2 parity."""

    def test_counts_and_redaction(self, ray_session):
        import ray.data

        from searchenginesimple_ray.stages.textstages import pii_scrub
        docs = pd.DataFrame({
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["mail a@b.co or https://x.org/y from 10.0.0.7 end",
                     "two a@b.io c%d-e@f.co.uk emails",
                     "no pii here 1.2.3.4567",
                     ""]})
        out = pii_scrub(ray.data.from_pandas(docs)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert out["n_email"].tolist() == [1, 2, 0, 0]
        assert out["n_url"].tolist() == [1, 0, 0, 0]
        assert out["n_ipv4"].tolist() == [1, 0, 0, 0]
        assert out["clean_text"][0] == \
            "mail <EMAIL> or <URL> from <IP> end"
        assert out["clean_text"][2] == "no pii here 1.2.3.4567"

    def test_driver_entry_matches_oracle(self, ray_session):
        import importlib.util

        import duckdb
        spec = importlib.util.spec_from_file_location(
            "__ray_entry__", "/root/repo/__ray_entry__.py")
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        got = m.queries()["pii_scrub"]("/root/testdata/sf0.001")
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    "'/root/testdata/sf0.001/documents.parquet'")
        want = con.execute(m.oracle_sql()["pii_scrub"]).df()
        cols = sorted(want.columns)
        got = got[cols].sort_values("doc_id").reset_index(drop=True)
        want = want[cols].sort_values("doc_id").reset_index(drop=True)
        assert (want["n_email"] >= 1).all()  # injection worked
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestSemDeDup:
    """pipelines/similarity.semdedup: cluster-then-greedy semantic
    dedup; kernel exactness vs an independent reference."""

    def test_greedy_kernel_known_case(self):
        from searchenginesimple_ray.pipelines.similarity import \
            _semdedup_greedy
        # 0 and 2 near-identical; 1 orthogonal.  Lower id wins.
        V = np.array([[1.0, 0.0], [0.0, 1.0], [0.999, 0.04]])
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        keep = _semdedup_greedy(np.array([5, 1, 9]), V, 0.95)
        # ascending-id order: 1 kept, 5 kept, 9 dropped (dup of 5)
        assert keep.tolist() == [True, True, False]

    def test_matches_reference_on_embeddings(self, ray_session):
        import pyarrow.parquet as pq
        import ray.data

        from searchenginesimple_ray.pipelines.similarity import (
            _normalize, _semdedup_greedy, semdedup, train_centroids)
        path = "/root/testdata/sf0.001/embeddings.parquet"
        # the sf embeddings have no near-dups (max pairwise cosine
        # ~0.48), so inject near-copies of the first 20 vectors to
        # exercise actual drops
        t = pq.read_table(path)
        base_ids = t["vec_id"].to_numpy()
        baseV = np.stack(
            [np.asarray(v, np.float64) for v in t["embedding"].to_pylist()])
        rng = np.random.default_rng(2)
        dupV = baseV[:20] + rng.normal(0, 1e-3, baseV[:20].shape)
        ids = np.concatenate([base_ids, base_ids[:20] + 100_000])
        Vraw = np.concatenate([baseV, dupV])
        tbl = pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([r.astype(np.float32).tolist()
                                   for r in Vraw],
                                  pa.list_(pa.float32()))})
        ds = ray.data.from_arrow(tbl).repartition(4)
        got = semdedup(ds, "vec_id", "embedding", threshold=0.9,
                       n_clusters=8).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        # reference: same deterministic centroids, driver-side assign,
        # independent per-cluster greedy
        V = _normalize(np.stack([np.asarray(v, np.float64)
                                 for v in tbl["embedding"].to_pylist()]))
        C = train_centroids(ds.select_columns(["embedding"]), "embedding",
                            8)
        assign = np.argmax(V @ C.T, axis=1)
        want_keep = {}
        for c in np.unique(assign):
            m = assign == c
            for i, k in zip(ids[m], _semdedup_greedy(ids[m], V[m], 0.9)):
                want_keep[int(i)] = bool(k)
        assert got["keep"].tolist() == \
            [want_keep[int(i)] for i in got["vec_id"]]
        assert len(got) == len(ids)
        # the injected near-copies (higher ids) were dropped, the
        # originals kept
        dropped = set(got.loc[~got["keep"], "vec_id"])
        assert dropped == set(base_ids[:20] + 100_000)


class TestDistinctAndTopkByGroup:
    """grouped_distinct_tokens + topk_by_group: window/distinct
    semantics vs DuckDB."""

    def test_distinct_tokens_random(self, ray_session):
        import duckdb
        import ray.data

        from searchenginesimple_ray.stages.sketches import \
            grouped_distinct_tokens
        rng = np.random.default_rng(13)
        docs = pd.DataFrame({
            "source": rng.integers(0, 5, 300).astype(str),
            "text": [" ".join(f"w{rng.integers(0, 40)}"
                              for _ in range(rng.integers(0, 25)))
                     for _ in range(300)]})
        got = grouped_distinct_tokens(
            ray.data.from_pandas(docs).repartition(5), "text", "source")
        want = duckdb.sql(r"""
            WITH tok AS (SELECT source,
                unnest(list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> '')) AS term FROM docs)
            SELECT source, count(DISTINCT term) AS n_distinct_terms
            FROM tok GROUP BY source ORDER BY source""").df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_topk_by_group_window_semantics(self, ray_session):
        import duckdb
        import ray.data

        from searchenginesimple_ray.stages.sampling import topk_by_group
        rng = np.random.default_rng(17)
        docs = pd.DataFrame({
            "doc_id": np.arange(1000, dtype=np.int64),
            "source": rng.integers(0, 9, 1000).astype(str),
            "score": rng.integers(0, 20, 1000).astype(np.int64)})  # ties!
        got = topk_by_group(ray.data.from_pandas(docs).repartition(4),
                            "source", "score", 5, key="doc_id") \
            .to_pandas().sort_values(["source", "doc_id"]) \
            .reset_index(drop=True)
        want = duckdb.sql("""
            SELECT source, score, doc_id FROM (
              SELECT source, score, doc_id, row_number() OVER (
                 PARTITION BY source ORDER BY score DESC, doc_id) rn
              FROM docs) WHERE rn <= 5
            ORDER BY source, doc_id""").df()
        pd.testing.assert_frame_equal(got[["source", "score", "doc_id"]],
                                      want, check_dtype=False)

    @pytest.mark.parametrize("name", ["distinct_tokens",
                                      "source_top_docs"])
    def test_driver_entries_match_oracle(self, ray_session, name):
        import importlib.util

        import duckdb
        spec = importlib.util.spec_from_file_location(
            "__ray_entry__", "/root/repo/__ray_entry__.py")
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        got = m.queries()[name]("/root/testdata/sf0.001")
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    "'/root/testdata/sf0.001/documents.parquet'")
        want = con.execute(m.oracle_sql()[name]).df()
        cols = sorted(want.columns)
        got = got[cols].sort_values(cols).reset_index(drop=True)
        want = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(want) > 0
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestSketchGuards:
    """Review-found guard rails: exactness preconditions fail loudly."""

    def test_heavy_hitters_refuses_small_cap(self, ray_session):
        import ray.data

        from searchenginesimple_ray.stages.sketches import heavy_hitters
        ds = ray.data.from_pandas(pd.DataFrame({"text": ["a b c"]}))
        with pytest.raises(ValueError, match="superset"):
            heavy_hitters(ds, phi_num=1, phi_den=50, cap=5)

    def test_distinct_tokens_int_group(self, ray_session):
        import ray.data

        from searchenginesimple_ray.stages.sketches import \
            grouped_distinct_tokens
        docs = pd.DataFrame({"gid": np.array([1, 1, 2], np.int64),
                             "text": ["a b", "b c", "a"]})
        got = grouped_distinct_tokens(ray.data.from_pandas(docs),
                                      "text", "gid")
        assert got["gid"].tolist() == [1, 2]
        assert got["n_distinct_terms"].tolist() == [3, 1]

    def test_broadcast_join_refuses_outer(self, ray_session):
        import pyarrow as pa
        import ray.data

        from searchenginesimple_ray.stages.joins import broadcast_join
        ds = ray.data.range(1)
        t = pa.table({"id": [0]})
        with pytest.raises(ValueError, match="shuffle_join"):
            broadcast_join(ds, t, keys="id", join_type="full outer")


class TestMultimodalGuards:
    """Review-found guards: invalid media dims fail loudly; unknown
    media kind refused at the call site; gram identity stays in parity
    between textstages and dedup (the decontaminate oracle relies on
    it)."""

    def test_null_and_zero_dims_raise(self, ray_session):
        import pyarrow as pa
        import ray.data

        from searchenginesimple_ray.stages.multimodal import \
            ImageDecodeStage
        stage = ImageDecodeStage()
        t_null = pa.table({"payload": pa.array([b"xx"], pa.binary()),
                           "width": pa.array([None], pa.int32()),
                           "height": pa.array([4], pa.int32())})
        with pytest.raises(ValueError, match="null"):
            stage(t_null)
        t_zero = pa.table({"payload": pa.array([b"xx"], pa.binary()),
                           "width": pa.array([0], pa.int32()),
                           "height": pa.array([4], pa.int32())})
        with pytest.raises(ValueError, match="positive"):
            stage(t_zero)

    def test_unknown_media_kind_refused(self):
        from searchenginesimple_ray.stages.multimodal import \
            media_table_from_texts
        with pytest.raises(ValueError, match="unknown media kind"):
            media_table_from_texts(np.array([1]), ["x"], kind="img")

    def test_gram_identity_parity_with_dedup(self):
        from searchenginesimple_ray.functions.hashing import fnv1a64
        from searchenginesimple_ray.stages.dedup import _gram_signature
        from searchenginesimple_ray.stages.textstages import (
            _flat_token_hashes, _gram_keys)
        texts = ["alpha beta gamma delta epsilon", "one two three"]
        flat, counts = _flat_token_hashes(texts)
        rows = np.repeat(np.arange(2, dtype=np.int64), counts)
        k3, r3 = _gram_keys(flat, rows, 3)
        for i, t in enumerate(texts):
            toks = t.split()
            th = {w: fnv1a64(w) for w in toks}
            sig = set(_gram_signature(toks, th, 3).tolist())
            mine = set(np.unique(
                k3[r3 == i]).view(np.uint64).tolist())
            assert mine == sig
