"""Token n-gram containment (geoflow/text/containment.py). Driver
gate is the `shingle_containment` oracle query; these tests pin the
asymmetric quote-in-article semantics Jaccard misses."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.text.containment import containment_pairs, doc_gram_rows


def _pairs(texts, **kw):
    import ray
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts}))
    df = containment_pairs(ds, **kw).to_pandas()
    return {(int(r.a), int(r.b)):
            (int(r.inter), int(r.n_a), int(r.n_b),
             float(r.cont_a), float(r.cont_b))
            for r in df.itertuples()}


def test_quote_fully_contained(ray_session):
    quote = "alpha beta gamma delta epsilon"   # 5 tokens -> 3 grams
    article = ("intro words here " + quote +
               " and a much longer tail of unique prose follows")
    got = _pairs([quote, article])
    inter, na, nb, ca, cb = got[(0, 1)]
    assert inter == 3 and na == 3
    assert ca == 1.0          # the quote is fully inside the article
    assert cb == 3.0 / nb < 0.4


def test_disjoint_docs_absent(ray_session):
    got = _pairs(["aa bb cc dd ee", "vv ww xx yy zz"])
    assert got == {}


def test_identical_docs_symmetric(ray_session):
    t = "one two three four five six"
    got = _pairs([t, t])
    inter, na, nb, ca, cb = got[(0, 1)]
    assert ca == 1.0 and cb == 1.0 and na == nb == inter == 4


def test_min_inter_filter(ray_session):
    a = "p q r s"            # grams: pqr qrs
    b = "p q r zz ww"        # shares only pqr
    got = _pairs([a, b], min_inter=2)
    assert got == {}
    got1 = _pairs([a, b], min_inter=1)
    assert got1[(0, 1)][0] == 1


def test_duplicate_grams_counted_once():
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": ["x y z x y z x y z"]})
    out = doc_gram_rows(t)
    # grams xyz yzx zxy repeat; distinct set size 3... plus wrap runs
    assert len(out) == len(set(out.column("gram").to_pylist()))
