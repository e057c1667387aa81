"""KWIC concordance + int8 MIPS top-k."""

import numpy as np
import pyarrow as pa
import ray.data

from geoflow.text.kwic import kwic_batch
from geoflow.vector.quant import int8_mips_topk


def _batch(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_kwic_contexts():
    out = kwic_batch(_batch(["alpha beta QUERY gamma delta epsilon",
                             "query starts here",
                             "ends with query"]),
                     ["query"], window=2).to_pylist()
    assert out == [
        {"doc_id": 0, "pos": 3, "term": "query",
         "left_ctx": "alpha beta", "right_ctx": "gamma delta"},
        {"doc_id": 1, "pos": 1, "term": "query",
         "left_ctx": "", "right_ctx": "starts here"},
        {"doc_id": 2, "pos": 3, "term": "query",
         "left_ctx": "ends with", "right_ctx": ""},
    ]


def test_kwic_multiple_terms_and_repeats():
    out = kwic_batch(_batch(["a b a b a"]), ["a", "b"],
                     window=1).to_pylist()
    assert [(r["pos"], r["term"]) for r in out] == \
        [(1, "a"), (2, "b"), (3, "a"), (4, "b"), (5, "a")]
    assert out[2]["left_ctx"] == "b" and out[2]["right_ctx"] == "b"


def test_int8_mips_exact(ray_session):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(40), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))}))
    out = int8_mips_topk(ds, [3, 7], k=5).to_pandas()
    # brute-force check with the same quantization
    m = vecs.astype(np.float64)
    scale = np.abs(m).max(axis=1)
    c = np.floor(m / scale[:, None] * 127.0 + 0.5).astype(np.int64)
    for q in (3, 7):
        s = c @ c[q]
        order = [i for i in np.lexsort((np.arange(40), -s))
                 if i != q][:5]
        mine = out[out.qid == q]
        assert mine.vec_id.tolist() == order
        assert mine.score.tolist() == s[order].tolist()
