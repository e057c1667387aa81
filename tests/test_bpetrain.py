"""BPE tokenizer training (geoflow/text/bpetrain.py).

The merge loop is validated against an independent naive reference
(full pair recount + argmax every iteration) on randomized histograms;
the encode walk against the classic property that encoding a training
word reproduces its final training segmentation; and the end-to-end
Ray path against the planted probe corpus's closed-form token counts
(the same invariants the driver's SQL oracle checks).
"""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.text.bpetrain import (BPE_PROBE_WORDS, bpe_encode,
                                   bpe_probe_corpus_batch,
                                   corpus_word_counts, learn_merges,
                                   train_bpe)


# ---------------------------------------------------------------------------
# naive reference: recount all pairs from scratch every iteration
# ---------------------------------------------------------------------------

def _naive_bpe(word_counts, num_merges, min_count=2):
    seqs = {}
    for w, c in word_counts.items():
        b = w.encode("utf-8") if isinstance(w, str) else bytes(w)
        if len(b) >= 2 and c > 0:
            seqs[tuple(b[i:i + 1] for i in range(len(b)))] = int(c)
    merges = []
    for _ in range(num_merges):
        pc = {}
        for seq, c in seqs.items():
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                pc[p] = pc.get(p, 0) + c
        cand = [p for p, c in pc.items() if c >= min_count]
        if not cand:
            break
        best = min(cand, key=lambda p: (-pc[p], p))
        merges.append(best)
        new = {}
        for seq, c in seqs.items():
            out, i = [], 0
            while i < len(seq):
                if (i + 1 < len(seq) and seq[i] == best[0]
                        and seq[i + 1] == best[1]):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + c
        seqs = new
    return merges


def _naive_segment(word, merges):
    seq = [word[i:i + 1] for i in range(len(word))]
    for a, b in merges:  # training order == rank order
        out, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(seq[i])
                i += 1
        seq = out
    return seq


# ---------------------------------------------------------------------------
# merge-loop unit tests (no Ray)
# ---------------------------------------------------------------------------

def test_learn_merges_classic_example():
    # Sennrich et al. 2016 flavor: 'es' then 'est' dominate
    wc = {"newest": 6, "widest": 3, "low": 5, "lower": 2}
    merges = learn_merges(wc, 3, min_count=2)
    assert merges == _naive_bpe(wc, 3, 2)
    assert merges[0] == (b"e", b"s")          # count 9
    assert merges[1] == (b"es", b"t")         # count 9


def test_learn_merges_tiebreak_pair_bytes_asc():
    # two pairs with identical counts: smaller byte pair must win
    wc = {"ab": 3, "cd": 3}
    merges = learn_merges(wc, 2, min_count=2)
    assert merges == [(b"a", b"b"), (b"c", b"d")]


def test_learn_merges_min_count_stops():
    wc = {"abc": 1, "abd": 1}   # (a,b) count 2, everything else 1
    assert learn_merges(wc, 10, min_count=2) == [(b"a", b"b")]
    assert learn_merges(wc, 10, min_count=3) == []


def test_learn_merges_matches_naive_on_random_histograms():
    rng = np.random.default_rng(20260818)
    alphabet = "abcdef"
    for trial in range(25):
        n_words = int(rng.integers(2, 40))
        wc = {}
        for _ in range(n_words):
            ln = int(rng.integers(1, 9))
            w = "".join(alphabet[i] for i in rng.integers(0, 6, ln))
            wc[w] = wc.get(w, 0) + int(rng.integers(1, 30))
        nm = int(rng.integers(1, 30))
        mc = int(rng.integers(1, 5)) + 1
        assert learn_merges(wc, nm, mc) == _naive_bpe(wc, nm, mc), \
            f"trial {trial}: {wc} nm={nm} mc={mc}"


def test_encode_reproduces_training_segmentation():
    # classic BPE property: rank-greedy encode == training segmentation
    from geoflow.text.bpetrain import _segment
    rng = np.random.default_rng(7)
    wc = {}
    for _ in range(60):
        ln = int(rng.integers(2, 10))
        w = "".join("abcd"[i] for i in rng.integers(0, 4, ln))
        wc[w] = wc.get(w, 0) + int(rng.integers(1, 20))
    merges = learn_merges(wc, 40, min_count=2)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in wc:
        wb = w.encode()
        assert _segment(wb, ranks, {}) == _naive_segment(wb, merges), w


def test_split_pattern_py_matches_re2():
    # the Python-re twin must partition text identically to the RE2
    # pattern Arrow/DuckDB run (count parity + lossless reconstruction)
    import re

    import pyarrow.compute as pc

    from geoflow.text.analysis import BPE_SPLIT_PATTERN
    from geoflow.text.bpetrain import BPE_SPLIT_PATTERN_PY
    rx = re.compile(BPE_SPLIT_PATTERN_PY)
    samples = ["Hello world, it's 2024!", " foo_bar  baz\t\nqux", "",
               "éclair très-chic 3.14", "don't we've I'll you're",
               "... !!! ??? ---", "日本語 テスト 123 mixed",
               "a_b__c _x", "tab\tsep\tvals 99.5%", "' '' '''"]
    for s in samples:
        toks = rx.findall(s)
        # lone apostrophes (not contraction-shaped) are unmatched by
        # the RE2 pattern itself — reconstruction holds everywhere else
        if "'" not in s.replace("'s", "").replace("'t", "") \
                       .replace("'ve", "").replace("'ll", "") \
                       .replace("'re", ""):
            assert "".join(toks) == s, s
        arrow_n = pc.count_substring_regex(
            pa.array([s]), BPE_SPLIT_PATTERN)[0].as_py()
        assert len(toks) == arrow_n, (s, toks)


def test_learn_merges_unicode_and_empty():
    assert learn_merges({}, 5) == []
    assert learn_merges({"a": 100}, 5) == []     # 1-byte word: no pairs
    merges = learn_merges({"héhé": 4}, 20, min_count=2)
    # é is 2 UTF-8 bytes; the word must fully merge into one symbol
    ranks = {p: i for i, p in enumerate(merges)}
    from geoflow.text.bpetrain import _segment
    assert _segment("héhé".encode(), ranks, {}) == ["héhé".encode()]


def test_encode_ids_roundtrip_and_vocab():
    import re

    from geoflow.text.bpetrain import (BPE_SPLIT_PATTERN_PY, _segment,
                                       bpe_decode_ids, bpe_vocab,
                                       learn_merges)
    wc = {"hello": 9, "world": 7, "low": 5, "lower": 3, "héhé": 4}
    merges = learn_merges(wc, 64, min_count=2)
    vocab = bpe_vocab(merges)
    assert len(vocab) == 256 + len(merges)
    assert vocab[:256] == [bytes([b]) for b in range(256)]
    ranks = {p: i for i, p in enumerate(merges)}
    sym_id = {p[0] + p[1]: 256 + i for i, p in enumerate(merges)}
    rx = re.compile(BPE_SPLIT_PATTERN_PY)
    for text in ["hello world", " low lower hello", "héhé!", "",
                 "unseen wörds 42 all-bytes \x01\x7f"]:
        ids = []
        for w in rx.findall(text):
            wb = w.encode()
            ids.extend(sym_id[s] if len(s) > 1 else s[0]
                       for s in _segment(wb, ranks, {}))
        assert bpe_decode_ids(ids, merges) == text, text


def test_encode_ids_distributed_matches_counts():
    import ray
    from geoflow.text.bpetrain import (bpe_decode_ids, bpe_encode,
                                       bpe_encode_ids, learn_merges)
    texts = ["hello hello world", "", "low lower", "héhé héhé"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)),
                                       type=pa.int64()),
                    "text": pa.array(texts, type=pa.string())})
    merges = learn_merges({"hello": 2, "héhé": 2}, 32, min_count=2)
    ds = ray.data.from_arrow(tbl)
    ids = {r["doc_id"]: r["token_ids"]
           for r in bpe_encode_ids(ds, merges).take_all()}
    counts = {r["doc_id"]: r["n_bpe_tokens"]
              for r in bpe_encode(ray.data.from_arrow(tbl),
                                  merges).take_all()}
    for k, t in enumerate(texts):
        assert len(ids[k]) == counts[k], (k, t)
        assert bpe_decode_ids(ids[k], merges) == t, (k, t)


# ---------------------------------------------------------------------------
# distributed path (Ray session from conftest)
# ---------------------------------------------------------------------------

def _probe_ds(n):
    import ray
    tbl = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
    return ray.data.from_arrow(tbl).map_batches(
        bpe_probe_corpus_batch, batch_format="pyarrow")


def test_corpus_word_counts_distributed():
    ds = _probe_ds(64)
    words, counts = corpus_word_counts(ds, "text")
    wc = dict(zip(words, counts.tolist()))
    # every frequent word occupies 10 slots of 64 docs, (k+i)%16 → 40 each
    for w in BPE_PROBE_WORDS:
        assert wc[" " + w] == 40, w
    # histogram is sorted count DESC, word ASC
    assert list(counts) == sorted(counts, reverse=True)


def test_probe_corpus_closed_form_counts():
    n = 96
    ds = _probe_ds(n)
    merges = train_bpe(ds, "text", num_merges=512,
                       min_count=max(2, n // 8))
    out = bpe_encode(_probe_ds(n), merges).take_all()
    assert len(out) == n
    for r in out:
        k = r["doc_id"]
        c3, c2 = int(k % 3 == 1), int(k % 2 == 0)
        assert r["n_pretokens"] == 10 + c3 + c2, r
        assert r["n_bpe_tokens"] == 10 + 2 * c3 + 4 * c2, r
        exp_bytes = sum(len(BPE_PROBE_WORDS[(k + i) % 16]) + 1
                        for i in range(10))
        exp_bytes += c3 * (len(BPE_PROBE_WORDS[(7 * k + 3) % 16]) + 2)
        exp_bytes += c2 * 5
        assert r["n_word_bytes"] == exp_bytes, r


def test_train_bpe_deterministic():
    ds = _probe_ds(48)
    m1 = train_bpe(ds, "text", num_merges=64, min_count=6)
    m2 = train_bpe(_probe_ds(48), "text", num_merges=64, min_count=6)
    assert m1 == m2 and len(m1) > 0


def test_tokenizer_feeds_sequence_packing():
    # end-to-end training-data chain: train BPE -> encode counts ->
    # pack into fixed-length sequences; token mass is conserved
    from geoflow.text.packing import pack_sequences
    n, seq_len = 60, 32
    ds = _probe_ds(n)
    merges = train_bpe(ds, "text", num_merges=512, min_count=max(2, n // 8))
    enc = bpe_encode(_probe_ds(n), merges).map_batches(
        lambda b: b.select(["doc_id", "n_bpe_tokens"]).rename_columns(
            ["doc_id", "n_tokens"]),
        batch_format="pyarrow")
    packed = {r["doc_id"]: r for r in
              pack_sequences(enc, ntok_col="n_tokens", key_col="doc_id",
                             seq_len=seq_len).take_all()}
    assert set(packed) == set(range(n))
    # one bucket (n < bucket_docs): recompute stream offsets from the
    # closed-form counts and check every doc's sequence span
    off = 0
    for k in range(n):
        nt = 10 + 2 * (k % 3 == 1) + 4 * (k % 2 == 0)
        assert packed[k]["n_tokens"] == nt, k
        assert packed[k]["seq_first"] == off // seq_len, k
        assert packed[k]["seq_last"] == (off + nt - 1) // seq_len, k
        off += nt


def test_encode_handles_null_and_empty_text():
    import ray
    tbl = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                    "text": pa.array(["hello hello", None, ""],
                                     type=pa.string())})
    ds = ray.data.from_arrow(tbl)
    merges = learn_merges({"hello": 2}, 8, min_count=2)
    out = {r["doc_id"]: r for r in
           bpe_encode(ds, merges).take_all()}
    assert out[1]["n_bpe_tokens"] == 0 and out[2]["n_bpe_tokens"] == 0
    assert out[0]["n_pretokens"] == 2
    # "hello" fully merged; " hello" (space-prefixed) falls back to
    # [" ", "hello"]? no — ' hello' is one pretoken whose space byte
    # never appeared in training, so it segments as [' ', hello]
    assert out[0]["n_bpe_tokens"] == 1 + 2
