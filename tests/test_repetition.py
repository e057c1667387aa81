"""Gopher §A1.2 repetition signals (text/repetition.py). The
driver-facing value gate is the `gopher_repetition` oracle query
(green at sf0.001/0.01/0.1); these tests pin the definitions against a
brute-force Counter reference on hand-built and fuzzed documents."""

import re
from collections import Counter

import numpy as np
import pyarrow as pa

from geoflow.text.repetition import (DUP_NGRAM_THRESHOLDS,
                                     TOP_NGRAM_THRESHOLDS,
                                     gopher_repetition_batch,
                                     gopher_repetition_filter)

_TOK = re.compile(r"[^\W\s]+", re.UNICODE)


def _tokens(text):
    return re.findall(r"[\w]+", text.lower(), re.UNICODE)


def _brute(text):
    out = {}
    for kind, frags in [
            ("line", [f for f in text.split("\n") if f != ""]),
            ("para", [f for f in re.split(r"\n\n+", text) if f != ""])]:
        n = len(frags)
        c = Counter(frags)
        nd = len(c)
        ch = sum(len(f) for f in frags)
        chd = sum(len(f) for f in c)
        out[f"dup_{kind}_frac"] = (n - nd) / max(n, 1)
        out[f"dup_{kind}_char_frac"] = (ch - chd) / max(ch, 1)
        out[f"n_{kind}s"] = n
    tk = _tokens(text)
    total = max(len(text), 1)
    for n, _, _ in TOP_NGRAM_THRESHOLDS:
        grams = [" ".join(tk[i:i + n]) for i in range(len(tk) - n + 1)]
        c = Counter(grams)
        if not c:
            out[f"top_{n}gram_char_frac"] = 0.0
            continue
        ct = max(c.values())
        lt = max(len(g) for g, v in c.items() if v == ct)
        out[f"top_{n}gram_char_frac"] = ct * lt / total
    for n, _, _ in DUP_NGRAM_THRESHOLDS:
        grams = [" ".join(tk[i:i + n]) for i in range(len(tk) - n + 1)]
        c = Counter(grams)
        num = sum(v * len(g) for g, v in c.items() if v > 1)
        out[f"dup_{n}gram_char_frac"] = num / total
    return out


def _run(texts):
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    return gopher_repetition_batch(t)


def _assert_matches(texts):
    g = _run(texts)
    for i, text in enumerate(texts):
        ref = _brute(text)
        for col, want in ref.items():
            got = g.column(col)[i].as_py()
            assert got == want, (i, col, got, want, text[:80])


def test_planted_line_dup():
    doc = "alpha\nbeta\nalpha\ngamma\nalpha"
    g = _run([doc])
    assert g.column("n_lines")[0].as_py() == 5
    assert g.column("dup_line_frac")[0].as_py() == 2 / 5
    # chars: alpha*3 + beta + gamma = 15+4+5=24; distinct = 5+4+5=14
    assert g.column("dup_line_char_frac")[0].as_py() == 10 / 24
    _assert_matches([doc])


def test_planted_para_dup():
    doc = "para one here\n\npara two\n\n\npara one here"
    _assert_matches([doc])
    g = _run([doc])
    assert g.column("n_paras")[0].as_py() == 3
    assert g.column("dup_para_frac")[0].as_py() == 1 / 3


def test_top_ngram_and_tie():
    # "ab cd" and "xy zz" both occur twice -> tie on count, longer gram
    # ("xy zzz" vs "ab cd") wins the char numerator
    doc = "ab cd q ab cd w xy zzz e xy zzz"
    _assert_matches([doc])


def test_dup_ngram_overlap_counting():
    # "a b a b a b" -> 5-grams "a b a b a"(1) "b a b a b"(1): no dups;
    # extend so a 5-gram repeats
    doc = "a b c d e f a b c d e f"
    _assert_matches([doc])
    g = _run([doc])
    assert g.column("dup_5gram_char_frac")[0].as_py() > 0


def test_empty_and_degenerate():
    _assert_matches(["", "\n\n\n", "one", "word " * 3])
    g = _run([""])
    assert g.column("repetition_keep")[0].as_py() == 1  # all-zero signals


def test_keep_flag_matches_thresholds():
    # long varied doc: every token distinct so no n-gram repeats and
    # each single occurrence covers a tiny char fraction
    varied = " ".join(f"w{i}x{i * 7 % 91}" for i in range(120))
    texts = [varied,
             "spam line\n" * 40,                      # dup lines >> 0.3
             ("the same five gram block " * 30)]      # dup 5-grams
    g = _run(texts)
    assert g.column("repetition_keep")[0].as_py() == 1
    assert g.column("repetition_keep")[1].as_py() == 0
    assert g.column("repetition_keep")[2].as_py() == 0


def test_fuzz_against_brute():
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gg", "delta", "x", "yy", "zzz"]
    texts = []
    for _ in range(40):
        n_lines = int(rng.integers(0, 8))
        lines = []
        for _ in range(n_lines):
            nw = int(rng.integers(0, 14))
            lines.append(" ".join(
                vocab[int(i)] for i in rng.integers(0, len(vocab), nw)))
        sep = ["\n", "\n\n", "\n\n\n"]
        doc = ""
        for j, ln in enumerate(lines):
            doc += ln + (sep[int(rng.integers(0, 3))] if j + 1 < n_lines
                         else "")
        texts.append(doc)
    _assert_matches(texts)


def test_filter_dataset():
    import ray.data
    texts = [" ".join(f"w{i}x{i * 7 % 91}" for i in range(120)),
             "dup\ndup\ndup\ndup\ndup\ndup"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": pa.array(texts, type=pa.string())}))
    kept = gopher_repetition_filter(ds).take_all()
    assert [r["doc_id"] for r in kept] == [0]
