"""CLI (`python -m searchenginesimple_ray`): build -> query ->
suggest -> append -> compact against a tiny corpus, exercised through
``main(argv)`` in-process (the session Ray fixture doubles as the CLI
session — `_init_ray` is a no-op when Ray is already up)."""

import json
import os

import pytest

from searchenginesimple_ray.__main__ import main

TEST_ROOT = "/tmp/sesr_pytest/cli"


@pytest.fixture(scope="module")
def cli_corpus(ray_session):
    from searchenginesimple_ray.sources.transcripts import \
        generate_transcripts
    return generate_transcripts(f"{TEST_ROOT}/corpus", n_convs=40,
                                seed=12)


def test_build_query_suggest_append_compact(cli_corpus, capsys):
    import shutil
    idx = f"{TEST_ROOT}/idx"
    # a previous session's run appended into this dir; build correctly
    # refuses appended indexes, so start fresh
    shutil.rmtree(idx, ignore_errors=True)

    assert main(["build", "--input", cli_corpus, "--out", idx]) == 0
    built = json.loads(capsys.readouterr().out.strip())
    assert built["n_docs"] > 0
    assert os.path.exists(os.path.join(idx, "meta.json"))

    # a real corpus term (from the doc store) must return hits
    import pyarrow.parquet as pq
    text = pq.read_table(os.path.join(idx, "docs"),
                         columns=["text"])["text"][0].as_py()
    term = text.split()[0]
    # 4-CPU test session: cap the scorer pool (prod defaults would
    # request one full CPU per doc shard and starve the scheduler)
    qargs = ["--actors", "2", "--actor-cpus", "0.5"]
    assert main(["query", "--index", idx, "-k", "3", *qargs, term]) == 0
    hits = [json.loads(l) for l in
            capsys.readouterr().out.strip().splitlines()]
    assert hits and hits[0]["rank"] == 0 and "score" in hits[0]

    assert main(["suggest", "--index", idx, "-k", "2", term]) == 0
    sug = [json.loads(l) for l in
           capsys.readouterr().out.strip().splitlines()]
    assert sug and sug[0]["distance"] == 0     # exact term is in dict
    # suggest artifacts are cached inside the index
    assert os.path.exists(os.path.join(idx, "suggest", "dict.parquet"))

    from searchenginesimple_ray.sources.transcripts import \
        generate_transcripts
    delta = generate_transcripts(f"{TEST_ROOT}/delta", n_convs=6,
                                 seed=13, conv_prefix="convz-")
    assert main(["append", "--input", delta, "--index", idx]) == 0
    appended = json.loads(capsys.readouterr().out.strip())
    assert appended["n_new_docs"] >= built["n_docs"]

    assert main(["compact", "--index", idx]) == 0
    assert json.loads(capsys.readouterr().out.strip())["compacted"]

    # the queried term still resolves identically after append+compact
    assert main(["query", "--index", idx, "-k", "3", *qargs, term]) == 0
    hits2 = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert hits2[0]["doc_id"] == hits[0]["doc_id"]


def test_input_files_skips_sidecars(cli_corpus):
    from searchenginesimple_ray.__main__ import _input_files
    files = _input_files(cli_corpus)
    assert files and all("part-" in os.path.basename(f) for f in files)
    with pytest.raises(SystemExit):
        _input_files(f"{TEST_ROOT}/does-not-exist")


def test_curate_writes_split_partitions(ray_session, capsys, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(5)
    words = ["the", "and", "for", "with", "alpha", "beta", "gamma",
             "delta", "rare1", "rare2"]
    p = np.array([1.0 / (i + 1) for i in range(len(words))])
    p /= p.sum()
    texts = [" ".join(rng.choice(words, p=p,
                                 size=int(rng.integers(2, 80))))
             for _ in range(300)]
    for i in range(0, 290, 17):
        texts[i + 3] = texts[i]
    src = tmp_path / "docs"
    src.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(300, dtype=np.int64)),
                  "text": pa.array(texts)}),
        str(src / "docs.parquet"))

    out = str(tmp_path / "curated")
    assert main(["curate", "--input", str(src), "--out", out,
                 "--min-tokens", "30"]) == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["n_rows"] > 0
    parts = sorted(os.listdir(out))
    assert parts and all(p.startswith("split=") for p in parts)

    # the LM-banded variant writes a (possibly smaller) valid output
    out2 = str(tmp_path / "curated_lm")
    assert main(["curate", "--input", str(src), "--out", out2,
                 "--min-tokens", "30", "--lm-centibits", "403"]) == 0
    r2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < r2["n_rows"] <= r["n_rows"]
