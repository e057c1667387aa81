"""Readability ingredients + JSON int-field extraction
(text/analysis.py). Driver gate: `readability` / `props_extract`
oracles over real tables; here: kernel semantics on hand-built rows
(pure batch functions, no Ray session needed)."""

import pyarrow as pa

from geoflow.text.analysis import (json_int_field_batch,
                                   readability_batch)


def test_readability_counts():
    t = pa.table({"doc_id": [0, 1, 2], "text": [
        "The quick brown fox. It jumped!? Yes...",
        "AEIOU aeiou xyz",   # one vowel run each word w/ vowels
        "",
    ]})
    out = readability_batch(t)
    # doc0: 7 word runs; sentences: '.', '!?', '...' -> 3 runs
    assert out.column("n_words").to_pylist() == [7, 3, 0]
    assert out.column("n_sentences").to_pylist() == [3, 0, 0]
    # doc0 vowel runs: e,ui,o,o,I,u,e,Ye = 8
    assert out.column("n_syllables").to_pylist()[0] == 8
    # doc1: AEIOU + aeiou are separate runs, y in xyz counts
    assert out.column("n_syllables").to_pylist()[1] == 3


def test_json_int_field():
    t = pa.table({"props": [
        '{"k": 87}', '{"k":-3}', '{"j": 5}', None, '{"k": 12, "j": 0}',
    ]})
    out = json_int_field_batch(t, "props", "k", "prop_k")
    assert out.column("prop_k").to_pylist() == [87, -3, None, None, 12]
