"""HTML table extraction (text/htmltables.py) + TF-IDF keyword
extraction (text/tfidf.py). Driver gates are the `html_tables` and
`tfidf_topk` oracle queries; these tests pin cell lineage/entity
semantics and the scoring/tiebreak order."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.text.htmltables import extract_tables_batch


def _cells(htmls):
    t = pa.table({"doc_id": np.arange(len(htmls), dtype=np.int64),
                  "html": htmls})
    return extract_tables_batch(t).to_pandas()


def test_basic_table():
    df = _cells(['<table><tr><th>H</th></tr>'
                 '<tr><td>a</td><td>b</td></tr></table>'])
    assert df["cell_text"].tolist() == ["H", "a", "b"]
    assert df["is_header"].tolist() == [1, 0, 0]
    assert df["row_idx"].tolist() == [0, 1, 1]
    assert df["col_idx"].tolist() == [0, 0, 1]


def test_multiple_tables_and_docs():
    df = _cells(['<table><tr><td>x</td></tr></table>'
                 '<table><tr><td>y</td></tr></table>',
                 'no tables here',
                 '<table><tr><td>z</td></tr></table>'])
    assert df["doc_id"].tolist() == [0, 0, 2]
    assert df["table_idx"].tolist() == [0, 1, 0]
    assert df["cell_text"].tolist() == ["x", "y", "z"]


def test_case_insensitive_and_attrs():
    df = _cells(['<TABLE border="1"><TR><TD align="c"> v1 </TD>'
                 '<TH scope="col">v2</TH></TR></TABLE>'])
    assert df["cell_text"].tolist() == ["v1", "v2"]
    assert df["is_header"].tolist() == [0, 1]


def test_entities_and_inner_tags():
    df = _cells(['<table><tr><td>a &amp;&lt;b&gt; <b>bold</b>'
                 '&nbsp;&quot;q&quot;</td></tr></table>'])
    assert df["cell_text"].tolist() == ['a &<b> bold "q"']


def test_whitespace_collapse():
    df = _cells(['<table><tr><td>  a\n\n  b\t c </td></tr></table>'])
    assert df["cell_text"].tolist() == ["a b c"]


def test_tfidf_topk(ray_session):
    import ray

    from geoflow.text.tfidf import tfidf_topk
    texts = ["apple banana apple cherry",
             "banana banana date cherry",
             "apple date date date cherry"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(3, dtype=np.int64), "text": texts}))
    out = tfidf_topk(ds, k=2, min_df=1).to_pandas() \
        .sort_values(["doc_id", "score", "token"],
                     ascending=[True, False, True])
    import math
    idf = {t: math.log(4.0 / (1.0 + d)) + 1.0
           for t, d in [("apple", 2), ("banana", 2), ("cherry", 3),
                        ("date", 2)]}
    # doc 0: apple tf2 -> 2*idf(apple) top; banana/cherry tf1 ->
    # idf(banana) > idf(cherry), banana second
    d0 = out[out.doc_id == 0]
    assert d0["token"].tolist() == ["apple", "banana"]
    assert d0["score"].tolist() == [2 * idf["apple"], idf["banana"]]
    # doc 2: date tf3 top, then apple (idf tie class: apple vs cherry
    # -> apple has higher idf since df 2 < 3)
    d2 = out[out.doc_id == 2]
    assert d2["token"].tolist() == ["date", "apple"]


def test_tfidf_tiebreak_token_asc(ray_session):
    import ray

    from geoflow.text.tfidf import tfidf_topk
    # two tokens with identical tf and df -> identical score; token
    # ascending breaks the tie deterministically
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": ["zebra apple", "zebra apple"]}))
    out = tfidf_topk(ds, k=1, min_df=1).to_pandas()
    assert out["token"].tolist() == ["apple", "apple"]
