"""RAKE keyword extraction (text/rake.py)."""

import pyarrow as pa
import ray.data

from geoflow.text.rake import (rake_candidates, rake_word_scores)


def _ds(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))


def test_candidates_islands(ray_session):
    # stopwords ('the','of','and','is') split the stream into runs
    out = rake_candidates(_ds(
        ["the quick brown fox and lazy dog is here"])).to_pandas()
    assert out.phrase.tolist() == ["quick brown fox", "lazy dog",
                                   "here"]
    assert out.phrase_idx.tolist() == [1, 2, 3]
    assert out.n_words.tolist() == [3, 2, 1]


def test_candidates_edge_docs(ray_session):
    out = rake_candidates(_ds(
        ["the of and", "", "solo", "alpha the alpha"])).to_pandas()
    got = out.groupby("doc_id").phrase.apply(list).to_dict()
    assert got == {2: ["solo"], 3: ["alpha", "alpha"]}


def test_word_scores(ray_session):
    # paper-style: freq counts occurrences, deg sums phrase lengths
    out = rake_word_scores(_ds(
        ["deep learning of deep neural networks",
         "deep dive"])).to_pandas().set_index("token")
    # phrases: [deep learning], [deep neural networks], [deep dive]
    assert out.loc["deep"].freq == 3
    assert out.loc["deep"].deg == 2 + 3 + 2
    assert out.loc["networks"].freq == 1
    assert out.loc["networks"].deg == 3
    # score(deep) = 7/3 would be the client-side float
