"""Distributed BPE tokenizer training + encoding (Sennrich et al.
2016, arXiv:1508.07909; byte-level alphabet as in GPT-2's public
tokenizer description).

This is the tokenizer-training step of a pretraining-data pipeline:
learn a merge table from the corpus, then encode documents with it.

Distributed shape (100 TB):

- WORD HISTOGRAM (the only corpus-wide pass): pre-tokenize each batch
  with the shared RE2 pattern (analysis.BPE_SPLIT_PATTERN), collapse
  to per-batch (word, count) partials with np.unique — Zipfian text
  shrinks the head by orders of magnitude before the exchange — then
  one (word → Σcount) groupby and a driver-side prune to the top-V
  words by (count DESC, word ASC).  Every published BPE trainer
  (subword-nmt, SentencePiece, HF tokenizers) runs its merge loop on
  exactly this histogram; Heaps' law bounds it (~10⁷ distinct words at
  web scale, and top 10⁶ carries ≈99% of token mass), so the prune
  bound is a documented memory knob, not an approximation of the loop.
- MERGE LOOP: inherently sequential (merge k+1's counts depend on
  merge k), so it runs on the driver over the pruned histogram with
  the classic incremental algorithm — pair→count plus a pair→words
  inverted index; each merge touches only the words containing its
  pair.  Deterministic: ties break by (count DESC, pair bytes ASC).
- ENCODE: one map_batches pass; the merge-rank table broadcasts once
  via ray.put (read through the per-worker cache), and a per-worker
  word→segmentation memo makes the per-word merge walk amortize to
  the distinct-word rate (Zipf again), not the token rate.

No end-of-word marker: merges never cross pre-token boundaries
(the GPT-2 convention — the split pattern keeps leading spaces with
the word, so word boundaries are already explicit).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["corpus_word_counts", "train_bpe", "bpe_encode_batch",
           "bpe_encode", "learn_merges", "bpe_probe_corpus_batch",
           "BPE_PROBE_WORDS", "BPE_SPLIT_PATTERN_PY", "bpe_vocab",
           "bpe_encode_ids", "bpe_encode_ids_batch", "bpe_decode_ids"]

# Python-`re` twin of analysis.BPE_SPLIT_PATTERN (RE2 syntax): Python
# has no \p{L}/\p{N}, so letters are [^\W\d_] and digits \d. The only
# divergence is \p{N}⊃\d on non-decimal numerals (Ⅻ, ①ⓧ etc. — No/Nl
# categories), which RE2 counts as number runs and this pattern as
# "other" runs; match COUNTS still agree (both make one token), only
# the boundary between a numeral and an adjacent symbol run can differ.
# test_bpetrain asserts count parity vs Arrow's RE2 on mixed samples.
BPE_SPLIT_PATTERN_PY = (r"'(?:s|t|re|ve|m|ll|d)"
                        r"| ?[^\W\d_]+| ?\d+| ?(?:[^\s\w']|_)+|\s+")


# Pre-tokenization runs the vectorized codepoint-class machine in
# pretoken.py (exact parity with this pattern, fuzz-tested); Python
# work happens only at the distinct-word rate. The per-doc re.findall
# fallback lives in pretoken._pretok_re (NUL-containing documents).


def corpus_word_counts(ds, text_col: str = "text",
                       top_words: int = 1_000_000):
    """Distributed (word → count) histogram, pruned to top_words by
    (count DESC, word ASC). Returns (words: list[str], counts:
    np.int64 array), driver-resident (vocab-bounded, see module doc)."""
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        # vectorized pre-tokenization (pretoken.py): Python work only
        # at the distinct-word rate, parity-fuzzed vs the re pattern
        from .pretoken import pretokenize
        p = pretokenize(batch.column(text_col))
        return pa.table({"w": pa.array(p.words, type=pa.string()),
                         "c": pa.array(p.counts, type=pa.int64())})

    agg = ds.map_batches(partials, batch_format="pyarrow") \
        .groupby("w").aggregate(Sum("c"))
    ws, cs = [], []
    for b in agg.iter_batches(batch_format="pyarrow", batch_size=65536):
        if b.num_rows == 0 or "w" not in b.schema.names:
            continue
        ws.extend(b.column("w").to_pylist())
        cs.append(b.column("sum(c)").to_numpy(zero_copy_only=False))
    if not ws:
        return [], np.empty(0, np.int64)
    words = np.asarray(ws, dtype=object)
    counts = np.concatenate(cs).astype(np.int64)
    order = np.lexsort((words.astype(str), -counts))[:top_words]
    return words[order].tolist(), counts[order]


def learn_merges(word_counts: dict, num_merges: int,
                 min_count: int = 2) -> list:
    """Classic incremental BPE merge loop over a {word: count} dict.
    Returns the ordered merge list [(left: bytes, right: bytes), ...].

    Pure function of its input, deterministic tiebreak: count DESC,
    pair bytes ASC. Best-pair selection is a lazy-deletion max-heap
    (entries invalidated by comparing against the live count on pop),
    so each merge costs O(touched_pairs·log) instead of a full
    pair-table rescan — the shape that holds at a 10⁶-word histogram
    with ~10⁷ live pairs."""
    import heapq

    # words as lists of byte-symbols; skip 1-byte words (no pairs)
    seqs, counts = [], []
    for w, c in word_counts.items():
        b = w.encode("utf-8") if isinstance(w, str) else bytes(w)
        if len(b) >= 2 and c > 0:
            seqs.append([b[i:i + 1] for i in range(len(b))])
            counts.append(int(c))

    pair_count: dict = {}
    pair_words: dict = {}

    def add_word_pairs(wi, sign, touched):
        seq = seqs[wi]
        c = counts[wi] * sign
        for i in range(len(seq) - 1):
            p = (seq[i], seq[i + 1])
            pair_count[p] = pair_count.get(p, 0) + c
            touched.add(p)
            if sign > 0:
                pair_words.setdefault(p, set()).add(wi)

    init_touched: set = set()
    for wi in range(len(seqs)):
        add_word_pairs(wi, +1, init_touched)

    # heap of (-count, pair); stale entries skipped on pop
    heap = [(-c, p) for p, c in pair_count.items() if c >= min_count]
    heapq.heapify(heap)

    merges = []
    while len(merges) < num_merges:
        best = None
        while heap:
            nc, p = heapq.heappop(heap)
            if pair_count.get(p, 0) == -nc:
                best = p
                break
        if best is None:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        affected = pair_words.pop(best, set())
        touched: set = set()
        for wi in sorted(affected):
            seq = seqs[wi]
            add_word_pairs(wi, -1, touched)
            out = []
            i = 0
            while i < len(seq):
                if (i + 1 < len(seq) and seq[i] == best[0]
                        and seq[i + 1] == best[1]):
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[wi] = out
            add_word_pairs(wi, +1, touched)
        touched.discard(best)
        for p in touched:
            c = pair_count.get(p, 0)
            if c <= 0:
                pair_count.pop(p, None)
                pair_words.pop(p, None)
            elif c >= min_count:
                heapq.heappush(heap, (-c, p))
        pair_count.pop(best, None)
    return merges


def train_bpe(ds, text_col: str = "text", num_merges: int = 1024,
              top_words: int = 1_000_000, min_count: int = 2):
    """Corpus → ordered merge list (see module doc for the shape)."""
    words, counts = corpus_word_counts(ds, text_col, top_words)
    return learn_merges(dict(zip(words, counts.tolist())), num_merges,
                        min_count)


def _segment(word_b: bytes, ranks: dict, memo: dict) -> list:
    """Encode one UTF-8 word with the merge-rank table (lowest rank
    first — the standard BPE encode walk), memoized per worker."""
    seg = memo.get(word_b)
    if seg is not None:
        return seg
    seq = [word_b[i:i + 1] for i in range(len(word_b))]
    while len(seq) >= 2:
        best_i = -1
        best_r = None
        for i in range(len(seq) - 1):
            r = ranks.get((seq[i], seq[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        seq = (seq[:best_i] + [seq[best_i] + seq[best_i + 1]]
               + seq[best_i + 2:])
    memo[word_b] = seq
    return seq


_BPE_CACHE: dict = {}


def _ranks_get(ref):
    key = ref.hex()
    m = _BPE_CACHE.get(key)
    if m is None:
        import ray
        merges = ray.get(ref)
        m = ({p: i for i, p in enumerate(merges)}, {})
        _BPE_CACHE.clear()
        _BPE_CACHE[key] = m
    return m


def bpe_encode_batch(batch: pa.Table, merges_ref,
                     text_col: str = "text") -> pa.Table:
    """Per-doc BPE stats: n_pretokens, n_bpe_tokens, n_bytes.
    Broadcast merge table + per-worker word→segmentation memo."""
    ranks, memo = _ranks_get(merges_ref)
    from .pretoken import pretokenize
    p = pretokenize(batch.column(text_col))
    k = len(p.words)
    seglen = np.empty(k, np.int64)
    wbyte = np.empty(k, np.int64)
    for i, w in enumerate(p.words):  # distinct-rate only (memoized)
        wb = w.encode("utf-8")
        wbyte[i] = len(wb)
        seglen[i] = len(_segment(wb, ranks, memo))
    n_pre = np.bincount(p.doc_of, minlength=p.n_docs).astype(np.int64)
    # float64 weights are exact below 2^53 — batch-bounded counts
    n_tok = np.bincount(p.doc_of, weights=seglen[p.inv].astype(np.float64),
                        minlength=p.n_docs).astype(np.int64)
    n_bytes = np.bincount(p.doc_of, weights=wbyte[p.inv].astype(np.float64),
                          minlength=p.n_docs).astype(np.int64)
    return batch.append_column(
        "n_pretokens", pa.array(n_pre)).append_column(
        "n_bpe_tokens", pa.array(n_tok)).append_column(
        "n_word_bytes", pa.array(n_bytes))


# --- planted probe corpus (oracle gate for the whole train+encode path) ---
#
# Deterministic corpus derived from integer doc keys whose BPE token
# counts are CLOSED-FORM, so a plain-SQL oracle can gate the full
# distributed histogram → merge loop → broadcast encode path:
#
#   * 10 "frequent" slots per doc, word (k+i) % 16 from a fixed
#     16-word lowercase vocab — each word carries ~10/16 of corpus
#     mass, far above min_count = N//8, so BPE fully merges it to ONE
#     token (every intermediate pair of a word with count ≥ min_count
#     itself has count ≥ min_count, so merging runs to completion).
#   * docs with k%3==1 add one "class-C" word: frequent base +
#     uppercase suffix chr(65+(5k+1)%16) ('A'..'P'). The string is
#     determined by k mod 48 (k%3==1 selects 16 residues mod 48; base
#     (7k+3)%16 and suffix (5k+1)%16 both repeat with period 48 on
#     them), so each distinct class-C string has count ~N/48 —
#     below min_count = N//8 with a 6x margin — and its final pair
#     (base, suffix) stays unmergeable → exactly 2 tokens.
#   * docs with k%2==0 add one "rare" word ' Q'+base26((k*2654435761
#     mod 2^32) mod 17576): (' ','Q') has count N/2 → merges; every
#     deeper pair is spread over ≥26 continuations (arithmetic-
#     progression spread, ≤ ~N/52 < N/8) → exactly 4 tokens.
#
# Hence per doc: n_pretokens = 10 + [k%3==1] + [k%2==0],
# n_bpe_tokens = 10 + 2·[k%3==1] + 4·[k%2==0], and n_word_bytes is a
# fixed-length table lookup — all SQL-expressible. Suffix chars stop at
# 'P' so they never collide with the rare-word prefix 'Q'.

BPE_PROBE_WORDS = ("tera", "bond", "marsh", "quill", "vapor", "jinx",
                   "crag", "whelp", "fizz", "drum", "oxbow", "glint",
                   "spry", "chalk", "dune", "verge")


def bpe_probe_corpus_batch(batch: pa.Table,
                           key_col: str = "doc_id") -> pa.Table:
    """(key) batch → (key, text) planted-BPE probe corpus (see above).
    Pure int64 modular arithmetic on the key — bit-reproducible in SQL."""
    k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
    texts = []
    for kk in k.tolist():
        parts = [" " + BPE_PROBE_WORDS[(kk + i) % 16] for i in range(10)]
        if kk % 3 == 1:
            parts.append(" " + BPE_PROBE_WORDS[(7 * kk + 3) % 16]
                         + chr(65 + (5 * kk + 1) % 16))
        if kk % 2 == 0:
            v = (kk * 2654435761) % 4294967296 % 17576
            parts.append(" Q" + chr(65 + v // 676)
                         + chr(65 + (v // 26) % 26) + chr(65 + v % 26))
        texts.append("".join(parts))
    return pa.table({key_col: pa.array(k),
                     "text": pa.array(texts, type=pa.string())})


def bpe_encode(ds, merges, text_col: str = "text"):
    """Dataset → Dataset with n_pretokens / n_bpe_tokens / n_word_bytes
    columns; ``merges`` is the train_bpe output (broadcast once)."""
    import ray
    ref = ray.put(list(merges))
    return ds.map_batches(bpe_encode_batch, batch_format="pyarrow",
                          fn_kwargs={"merges_ref": ref,
                                     "text_col": text_col})


# --- token-id emission (the training-data product) ---------------------

def bpe_vocab(merges) -> list:
    """Ordered vocabulary: ids 0..255 are raw bytes (byte-level
    alphabet), id 256+i is merge i's combined symbol — the GPT-2 id
    convention minus the byte-to-unicode display remap (ids and
    segmentations are identical; only the printable alias differs)."""
    return [bytes([b]) for b in range(256)] + [a + b for a, b in merges]


def bpe_encode_ids_batch(batch: pa.Table, merges_ref,
                         text_col: str = "text",
                         out_col: str = "token_ids") -> pa.Table:
    """Append a list<int32> token-id column (full encode, not counts).
    Broadcast merge table; per-worker word→ids memo (Zipf-amortized)."""
    ranks, memo = _ranks_get(merges_ref)
    sym_id = memo.setdefault(
        "__sym_id__", {p[0] + p[1]: 256 + i for i, p in
                       enumerate(sorted(ranks, key=ranks.get))})
    id_memo = memo.setdefault("__ids__", {})
    from .pretoken import pretokenize
    p = pretokenize(batch.column(text_col))
    dlists = []
    for w in p.words:  # distinct-rate only (memoized across batches)
        wb = w.encode("utf-8")
        cached = id_memo.get(wb)
        if cached is None:
            cached = np.asarray(
                [sym_id[s] if len(s) > 1 else s[0]
                 for s in _segment(wb, ranks, memo)], np.int32)
            id_memo[wb] = cached
        dlists.append(cached)
    if dlists:
        dlen = np.fromiter((len(a) for a in dlists), np.int64, len(dlists))
        dstart = np.zeros(len(dlists), np.int64)
        np.cumsum(dlen[:-1], out=dstart[1:])
        dconcat = np.concatenate(dlists)
        # vectorized gather: token i copies dconcat[dstart[j]:+dlen[j]]
        tok_len = dlen[p.inv]
        total = int(tok_len.sum())
        csum = np.zeros(len(tok_len), np.int64)
        np.cumsum(tok_len[:-1], out=csum[1:])
        idx = (np.repeat(dstart[p.inv], tok_len)
               + np.arange(total) - np.repeat(csum, tok_len))
        flat = dconcat[idx]
        doc_len = np.bincount(p.doc_of, weights=tok_len.astype(np.float64),
                              minlength=p.n_docs).astype(np.int64)
    else:
        flat = np.empty(0, np.int32)
        doc_len = np.zeros(p.n_docs, np.int64)
    offsets = np.zeros(p.n_docs + 1, np.int64)
    np.cumsum(doc_len, out=offsets[1:])
    lst = pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32), type=pa.int32()),
        pa.array(flat, type=pa.int32()))
    return batch.append_column(out_col, lst)


def bpe_encode_ids(ds, merges, text_col: str = "text",
                   out_col: str = "token_ids"):
    """Dataset → Dataset with a list<int32> token-id column."""
    import ray
    ref = ray.put(list(merges))
    return ds.map_batches(bpe_encode_ids_batch, batch_format="pyarrow",
                          fn_kwargs={"merges_ref": ref,
                                     "text_col": text_col,
                                     "out_col": out_col})


def bpe_decode_ids(ids, merges) -> str:
    """Token ids → text (lossless inverse of bpe_encode_ids wherever
    pre-tokenization is lossless — see BPE_SPLIT_PATTERN_PY note on
    lone apostrophes)."""
    vocab = bpe_vocab(merges)
    return b"".join(vocab[int(i)] for i in ids).decode(
        "utf-8", errors="replace")
