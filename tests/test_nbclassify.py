"""Naive-Bayes classifier (geoflow/text/nbclassify.py). Driver gates:
`nb_train_counts` (integer model state, exact) and `nb_classify`
(argmax with planted margins). These tests pin the training counts,
pruning semantics, scoring math and OOV handling on tiny corpora."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.text.nbclassify import NBModel, classify_nb, train_nb


def _corpus(rows):
    import ray
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(rows)), type=pa.int64()),
        "text": pa.array([r[0] for r in rows], type=pa.string()),
        "label": pa.array([r[1] for r in rows], type=pa.string())}))


def test_train_counts_exact(ray_session):
    ds = _corpus([("cat cat dog", "a"), ("dog dog", "b"),
                  ("cat fish", "a")])
    m = train_nb(ds)
    assert m.labels == ["a", "b"]
    t = m.counts_table().to_pandas().set_index(["token", "label"])["cnt"]
    assert t[("cat", "a")] == 3 and t[("dog", "a")] == 1
    assert t[("dog", "b")] == 2 and t[("fish", "a")] == 1
    assert ("cat", "b") not in t.index  # zero rows not emitted
    assert m.class_docs.tolist() == [2, 1]


def test_classify_obvious(ray_session):
    train = _corpus([("spam buy now", "spam"), ("buy spam spam", "spam"),
                     ("meeting notes agenda", "ham"),
                     ("agenda for meeting", "ham")])
    m = train_nb(train)
    test = _corpus([("spam spam buy", "?"), ("notes on the agenda", "?")])
    out = classify_nb(test, m).to_pandas().sort_values("doc_id")
    assert out["pred_label"].tolist() == ["spam", "ham"]


def test_scoring_math_matches_numpy(ray_session):
    """Score = log prior + sum of log((cnt+a)/(tot+aV)) over token
    occurrences — verify argmax against a hand-rolled dense compute."""
    rows = [("x x y", "p"), ("y z z", "q"), ("x z", "p")]
    ds = _corpus(rows)
    m = train_nb(ds)
    out = classify_nb(ds, m).to_pandas().sort_values("doc_id")
    vocab = {t: i for i, t in enumerate(m.vocab.tolist())}
    for r, pred in zip(rows, out["pred_label"].tolist()):
        toks = r[0].split()
        scores = m.logprior.copy()
        for t in toks:
            scores = scores + m.loglik[vocab[t]]
        assert m.labels[int(np.argmax(scores))] == pred


def test_oov_tokens_skipped(ray_session):
    train = _corpus([("alpha alpha", "a"), ("beta beta", "b")])
    m = train_nb(train)
    test = _corpus([("alpha unseen wordz", "?")])
    out = classify_nb(test, m).to_pandas()
    assert out["pred_label"].tolist() == ["a"]


def test_min_count_prunes_pairs(ray_session):
    ds = _corpus([("rare common common", "a"), ("common common", "b")])
    m = train_nb(ds, min_count=2)
    toks = set(m.counts_table().to_pandas()["token"])
    assert toks == {"common"}
    assert "rare" not in m.vocab.tolist()


def test_lowercase_fold(ray_session):
    ds = _corpus([("Cat CAT cat", "a")])
    m = train_nb(ds)
    t = m.counts_table().to_pandas()
    assert t["token"].tolist() == ["cat"] and t["cnt"].tolist() == [3]


def test_model_rows_cap(ray_session):
    ds = _corpus([("a b c d e f g h", "x")])
    with pytest.raises(ValueError):
        train_nb(ds, max_model_rows=3)


def test_empty_text_gets_prior_argmax(ray_session):
    train = _corpus([("w w w", "big"), ("w", "small"), ("w", "big")])
    m = train_nb(train)
    test = _corpus([("", "?")])
    out = classify_nb(test, m).to_pandas()
    assert out["pred_label"].tolist() == ["big"]  # prior 2/3 wins
