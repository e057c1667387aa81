"""Vectorized pre-tokenizer (geoflow/text/pretoken.py) — exact parity
vs Python re.findall on the BPE split pattern, including the edge cases
the state machine special-cases (contractions, space-steal, lone
apostrophes, doc boundaries, NUL fallback)."""

import re

import numpy as np
import pyarrow as pa

from geoflow.text.bpetrain import BPE_SPLIT_PATTERN_PY
from geoflow.text.pretoken import Pretok, pretokenize, token_spans

RX = re.compile(BPE_SPLIT_PATTERN_PY)


def _ref(texts):
    return [RX.findall(s or "") for s in texts]


def _fast(texts):
    spans = token_spans(texts)
    assert spans is not None
    joined, cp, ts, te, doc_of = spans
    out = [[] for _ in texts]
    for a, b, d in zip(ts, te, doc_of):
        out[d].append(joined[a:b])
    return out


HAND_CASES = [
    "hello world",
    " hello  world   x",
    "isn't can't we're you've I'm he'll she'd",
    "'still 'rex '' 'l x''s a's",
    "don'tx 'sx 'llx 'veq",
    "a_b __ %_% #'# _a a_",
    "tab\there \t x  \ty",
    "digits 123 a1 1a  42",
    "mixed: punct!! ...end?",
    "",
    "   ",
    " ",
    "'",
    "' '",
    "a'",
    "nbsp x en quad",
    "café naïve 日本語テスト",
    "roman Ⅻ num ①Ⓧ sup²",
    "arabic ٣٤٥ digits",
    "emoji \U0001f600\U0001f680 astral \U00010400",
    "upper'S case'T 'S 'RE",  # contractions are lowercase-only
    "end with space ",
    " 'hello",
    "\t'sx",
    "a  'll",
]


def test_hand_cases_parity():
    assert _fast(HAND_CASES) == _ref(HAND_CASES)


def test_fuzz_parity():
    # stress alphabet: every class + multibyte + contraction suffixes
    alpha = list("ab sz tZ'_09%.\t\n") + [
        " ", "'", "s", "t", "m", "d", "r", "e", "v", "l",
        "é", "中", "Ⅻ", "①", "٣", " ",
        " ", "\U0001f600", "́", "­"]
    rng = np.random.default_rng(20260819)
    docs = []
    for i in range(400):
        k = int(rng.integers(0, 60))
        docs.append("".join(rng.choice(alpha, k)))
    assert _fast(docs) == _ref(docs)


def test_fuzz_parity_long_runs():
    rng = np.random.default_rng(7)
    segs = ["aaa", "   ", "''", "'s", " x", "123", "!!!", "\t\t",
            "éé", "_", " ", "q'll", "e're"]
    docs = ["".join(rng.choice(segs, int(rng.integers(0, 40))))
            for _ in range(300)]
    assert _fast(docs) == _ref(docs)


def test_nul_falls_back_to_re():
    texts = ["plain doc", "has\x00nul inside", "tail"]
    assert token_spans(texts) is None
    p = pretokenize(pa.array(texts))
    ref = _ref(texts)
    # reconstruct per-doc token lists from the distinct-rate view
    got = [[] for _ in texts]
    for j, d in zip(p.inv, p.doc_of):
        got[d].append(p.words[j])
    assert got == ref


def test_pretok_counts_and_inverse():
    texts = ["the cat the cat", "the dog", ""]
    p = pretokenize(pa.array(texts))
    assert isinstance(p, Pretok)
    ref = _ref(texts)
    flat_ref = [w for d in ref for w in d]
    assert len(p.inv) == len(flat_ref)
    # reconstruct and compare
    got = [p.words[j] for j in p.inv]
    assert got == flat_ref
    # counts per distinct word agree with a Counter
    from collections import Counter
    c = Counter(flat_ref)
    for w, n in zip(p.words, p.counts):
        assert c[w] == n
    assert p.n_docs == 3
    assert np.bincount(p.doc_of, minlength=3).tolist() == [4, 2, 0]


def test_span_hash_no_alias_on_prefixes():
    texts = ["a aa aaa aaaa b ab ba"]
    p = pretokenize(pa.array(texts))
    assert len(set(p.words)) == len(p.words)
    assert sorted(p.words) == sorted(set(RX.findall(texts[0])))
