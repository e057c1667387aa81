"""Sentence splitting (text/sentences.py) + lexical diversity
(text/analysis.lexical_diversity_batch)."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.text.analysis import lexical_diversity_batch
from geoflow.text.sentences import split_sentences_batch


def _sents(texts):
    t = pa.table({"doc_id": np.arange(len(texts), dtype=np.int64),
                  "text": texts})
    return split_sentences_batch(t).to_pandas()


def test_basic_split():
    df = _sents(["One two. Three four! Five?  Six."])
    assert df["sentence"].tolist() == ["One two", "Three four",
                                       "Five", "Six."]
    assert df["sent_idx"].tolist() == [0, 1, 2, 3]


def test_terminator_runs_and_trailing():
    df = _sents(["Wait... what?! Yes. "])
    # trailing ". " leaves an empty final fragment -> dropped, gap in
    # sent_idx is NOT created (empty is last)
    assert df["sentence"].tolist() == ["Wait", "what", "Yes"]


def test_no_terminator_single_fragment():
    df = _sents(["no punctuation here"])
    assert df["sentence"].tolist() == ["no punctuation here"]
    assert df["sent_idx"].tolist() == [0]


def test_multi_doc_lineage():
    df = _sents(["A one. B two.", "C three."])
    assert df["doc_id"].tolist() == [0, 0, 1]
    assert df["sentence"].tolist() == ["A one", "B two.", "C three."]


def test_null_and_empty():
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array([None, ""], pa.string())})
    df = split_sentences_batch(t).to_pandas()
    assert len(df) == 0


def _lex(texts):
    t = pa.table({"doc_id": np.arange(len(texts), dtype=np.int64),
                  "text": texts})
    return lexical_diversity_batch(t).to_pandas()


def test_lexdiv_counts():
    df = _lex(["the cat and the dog and the bird"])
    r = df.iloc[0]
    # tokens: the x3, cat, and x2, dog, bird -> 8 tokens, 5 distinct,
    # 3 hapax (cat dog bird)
    assert (r.n_tokens, r.n_distinct, r.n_hapax) == (8, 5, 3)
    assert r.ttr == 5.0 / 8.0


def test_lexdiv_case_folding():
    df = _lex(["The THE the"])
    r = df.iloc[0]
    assert (r.n_tokens, r.n_distinct, r.n_hapax) == (3, 1, 0)


def test_lexdiv_empty_doc():
    df = _lex(["", "one"])
    assert df["n_tokens"].tolist() == [0, 1]
    assert df["ttr"].tolist() == [0.0, 1.0]
