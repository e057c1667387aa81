"""Gopher document-level quality rules (text/analysis.py
gopher_rules_batch — Rae et al. 2021 §A1.1). The driver-facing value
gate is the `gopher_quality` oracle query; these tests pin the rule
semantics on hand-built documents where every threshold is exercised
from both sides."""

import numpy as np
import pyarrow as pa

from geoflow.text.analysis import gopher_filter, gopher_rules_batch


def _run(texts):
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    return gopher_rules_batch(t)


GOOD = ("the quick brown fox jumps over the lazy dog and runs far away "
        "with great speed that nobody can match in this whole field " * 3)


def test_good_doc_keeps():
    g = _run([GOOD])
    assert g.column("gopher_keep")[0].as_py() == 1
    assert g.column("n_words")[0].as_py() >= 50
    assert g.column("n_stopwords")[0].as_py() >= 2


def test_word_count_bounds():
    short = "the cat sat with that dog"          # < 50 words
    g = _run([short])
    assert g.column("gopher_keep")[0].as_py() == 0
    assert g.column("n_words")[0].as_py() == 6


def test_mean_word_len_bounds():
    # 60 single-char words -> mean word length 1 < 3
    g = _run([" ".join(["a"] * 60)])
    assert abs(g.column("mean_word_len")[0].as_py() - 1.0) < 1e-12
    assert g.column("gopher_keep")[0].as_py() == 0


def test_symbol_ratio():
    doc = GOOD + " " + "# " * 20                 # hash marks push ratio
    g = _run([doc])
    assert g.column("symbol_ratio")[0].as_py() > 0.1
    assert g.column("gopher_keep")[0].as_py() == 0
    # ellipsis variants both count
    g2 = _run(["x ... y … z"])
    assert g2.column("symbol_ratio")[0].as_py() == 2 / 5


def test_bullet_and_ellipsis_lines():
    bullets = "\n".join(f"- item {i} of the list" for i in range(10))
    g = _run([bullets])
    assert g.column("bullet_frac")[0].as_py() == 1.0
    assert g.column("gopher_keep")[0].as_py() == 0
    ell = "\n".join(f"line {i} trails off..." for i in range(10))
    g2 = _run([ell])
    assert g2.column("ellipsis_frac")[0].as_py() == 1.0
    assert g2.column("gopher_keep")[0].as_py() == 0


def test_alpha_word_fraction():
    doc = GOOD + " " + "12345 " * 40             # numeric words dilute
    g = _run([doc])
    assert g.column("alpha_frac")[0].as_py() < 0.8
    assert g.column("gopher_keep")[0].as_py() == 0


def test_stopword_gate():
    # 60 content words, zero Gopher stopwords
    doc = " ".join(["apple banana cherry durian elder fig grape"] * 9)
    g = _run([doc])
    assert g.column("n_stopwords")[0].as_py() == 0
    assert g.column("gopher_keep")[0].as_py() == 0


def test_empty_and_null_safe():
    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "text": pa.array(["", None], type=pa.string())})
    g = gopher_rules_batch(t)
    assert g.column("n_words").to_pylist() == [0, 0]
    assert g.column("gopher_keep").to_pylist() == [0, 0]


def test_gopher_filter_dataset(ray_session):
    import ray
    texts = [GOOD, "too short", GOOD + " extra tail of words"]
    t = pa.table({"doc_id": pa.array(range(3), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    out = gopher_filter(ray.data.from_arrow(t)).take_all()
    assert sorted(r["doc_id"] for r in out) == [0, 2]


def test_ratio_bit_parity_shape():
    """Ratios must be single int/int double divisions (IEEE-identical
    to the SQL oracle) — spot-check the arithmetic identity."""
    g = _run([GOOD])
    nw = g.column("n_words")[0].as_py()
    ns = int(sum(len(w) for w in GOOD.split()))
    assert g.column("mean_word_len")[0].as_py() == np.float64(ns) / nw
