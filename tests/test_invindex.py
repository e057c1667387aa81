"""Persisted inverted index — text/invindex.py."""
import json
import os

import pyarrow as pa
import pytest

from geoflow.text.invindex import (build_keyword_index,
                                   search_keyword_index)


@pytest.fixture()
def corpus_index(ray_session, tmp_path):
    import ray.data as rd
    docs = [
        {"doc_id": 0, "text": "scan join window scan"},
        {"doc_id": 1, "text": "scan scan scan join window window"},
        {"doc_id": 2, "text": "scan only here"},
        {"doc_id": 3, "text": "join window"},
        {"doc_id": 4, "text": "Scan JOIN window!"},
        {"doc_id": 5, "text": ""},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(docs))
    idx = str(tmp_path / "idx")
    meta = build_keyword_index(ds, idx, n_buckets=4)
    return idx, meta


def _hits(idx, tokens, k=10):
    return [(r["doc_id"], r["tf"]) for r in
            search_keyword_index(idx, tokens, k=k).take_all()]


def test_and_semantics_and_ranking(corpus_index):
    idx, meta = corpus_index
    assert meta["n_docs"] == 6
    # doc 5 is empty; total_tokens = 4+6+3+2+3
    assert meta["total_tokens"] == 18
    got = _hits(idx, ["scan", "join", "window"])
    assert got == [(1, 6), (0, 4), (4, 3)]   # AND drops docs 2,3,5


def test_single_token_and_case_fold(corpus_index):
    idx, _ = corpus_index
    got = _hits(idx, ["SCAN"])
    assert got == [(1, 3), (0, 2), (2, 1), (4, 1)]


def test_k_limit_and_tie_order(corpus_index):
    idx, _ = corpus_index
    got = _hits(idx, ["window"], k=2)
    assert got == [(1, 2), (0, 1)]   # tie 0 vs 3 vs 4 → doc_id asc


def test_missing_token_empty(corpus_index):
    idx, _ = corpus_index
    assert _hits(idx, ["zzznope"]) == []
    assert _hits(idx, ["scan", "zzznope"]) == []   # AND fails


def test_layout_is_bucket_partitioned(corpus_index):
    idx, meta = corpus_index
    buckets = os.listdir(os.path.join(idx, "postings"))
    assert all(b.startswith("bucket=") for b in buckets)
    assert "bucket=-1" in buckets   # doclen sentinel partition
    assert 2 <= len(buckets) <= meta["n_buckets"] + 1
    with open(os.path.join(idx, "meta.json")) as f:
        assert json.load(f)["n_buckets"] == 4


def test_doclens_partition(corpus_index):
    from geoflow.text.invindex import read_doclens
    idx, meta = corpus_index
    dl = {r["doc_id"]: r["dl"] for r in read_doclens(idx).take_all()}
    assert dl == {0: 4, 1: 6, 2: 3, 3: 2, 4: 3, 5: 0}
    assert meta["total_tokens"] == sum(dl.values())


def test_bm25_over_index_matches_corpus_pass(corpus_index,
                                             ray_session):
    import ray.data as rd
    from geoflow.text.invindex import search_keyword_index_bm25
    from geoflow.text.search import bm25_score
    idx, _ = corpus_index
    docs = [
        {"doc_id": 0, "text": "scan join window scan"},
        {"doc_id": 1, "text": "scan scan scan join window window"},
        {"doc_id": 2, "text": "scan only here"},
        {"doc_id": 3, "text": "join window"},
        {"doc_id": 4, "text": "Scan JOIN window!"},
        {"doc_id": 5, "text": ""},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(docs))
    toks = ["scan", "window"]
    got = {r["doc_id"]: (r["dl"], r["bm25"]) for r in
           search_keyword_index_bm25(idx, toks, k=10).take_all()}
    ref = {r["doc_id"]: (r["dl"], r["bm25"]) for r in
           bm25_score(ds, toks).take_all() if r["bm25"] != 0.0}
    assert got == ref          # bit-identical on hit docs


def test_bm25_index_rank_order_and_k(corpus_index):
    from geoflow.text.invindex import search_keyword_index_bm25
    idx, _ = corpus_index
    rows = search_keyword_index_bm25(idx, ["only"], k=3).take_all()
    assert [r["doc_id"] for r in rows] == [2]
