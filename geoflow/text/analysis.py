"""Text analysis stages: language-ID, quality scoring, token counting,
document fingerprinting. All stateless-vectorizable map_batches kernels;
the language profiles / stopword tables are module-level constants loaded
once per worker process."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# character/stopword n-gram profiles per language (public common-word lists)
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "une", "des", "dans", "pour", "que"},
    "es": {"el", "la", "los", "las", "es", "una", "por", "con", "para", "que"},
    "zh": set(),  # CJK handled by script detection below
}

_TOKEN_RE = re.compile(r"[a-zA-ZÀ-ÿ]+")
_CJK_RE = re.compile(r"[一-鿿]")
_STOPWORDS_EN = _LANG_MARKERS["en"] | {"a", "an", "was", "are", "on", "as",
                                       "at", "by", "be", "this", "from"}
# BPE-ish subword split: words, numbers, punctuation runs (public GPT-2-style
# pre-tokenizer shape, simplified)
_BPE_RE = re.compile(r"\w+|[^\w\s]+")


def detect_language(text: str) -> str:
    """n-gram/stopword-marker heuristic language ID."""
    if not text:
        return "und"
    if _CJK_RE.search(text):
        return "zh"
    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return "und"
    ts = set(toks)
    best, best_n = "und", 0
    for lang, markers in _LANG_MARKERS.items():
        n = len(ts & markers)
        if n > best_n:
            best, best_n = lang, n
    return best


def langid_batch(batch: pa.Table, text_col="text",
                 out_col="lang_pred") -> pa.Table:
    preds = [detect_language(t) for t in batch.column(text_col).to_pylist()]
    return batch.append_column(out_col, pa.array(preds, type=pa.string()))


def quality_batch(batch: pa.Table, text_col="text") -> pa.Table:
    """Quality signals: n_chars, n_tokens (whitespace), n_subtokens
    (BPE-ish regex), punct_ratio, stopword_ratio, mean_token_len,
    quality_score ∈ [0,1]."""
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    n_chars = np.zeros(n, dtype=np.int64)
    n_tokens = np.zeros(n, dtype=np.int64)
    n_sub = np.zeros(n, dtype=np.int64)
    punct = np.zeros(n)
    stop = np.zeros(n)
    mtl = np.zeros(n)
    for i, t in enumerate(texts):
        if not t:
            continue
        n_chars[i] = len(t)
        toks = t.split()
        n_tokens[i] = len(toks)
        sub = _BPE_RE.findall(t)
        n_sub[i] = len(sub)
        np_punct = sum(1 for c in t if not c.isalnum() and not c.isspace())
        punct[i] = np_punct / max(1, len(t))
        low = [w.strip(".,;:!?").lower() for w in toks]
        stop[i] = sum(1 for w in low if w in _STOPWORDS_EN) / max(1, len(toks))
        mtl[i] = float(np.mean([len(w) for w in toks])) if toks else 0.0
    # simple monotone quality blend: long enough, readable token lengths,
    # not punctuation-soup
    score = (np.clip(n_tokens / 64.0, 0, 1) * 0.4
             + np.clip(1.0 - punct * 4.0, 0, 1) * 0.3
             + np.clip(mtl / 8.0, 0, 1) * 0.3)
    out = batch
    for name, arr in [("n_chars_q", n_chars), ("n_tokens", n_tokens),
                      ("n_subtokens", n_sub), ("punct_ratio", punct),
                      ("stopword_ratio", stop), ("mean_token_len", mtl),
                      ("quality_score", score)]:
        out = out.append_column(name, pa.array(arr))
    return out


def token_count_batch(batch: pa.Table, text_col="text") -> pa.Table:
    """Whitespace token count, fully vectorized in Arrow compute (no
    Python loop): number of \\S+ runs (empty string → 0, matching the SQL
    regexp_extract_all oracle; utf8_split_whitespace would yield 1)."""
    toks = pc.count_substring_regex(
        pc.cast(batch.column(text_col), pa.string()), r"\S+")
    return batch.append_column("n_tokens_ws",
                               pc.cast(toks, pa.int64()))


def fingerprint_batch(batch: pa.Table, text_col="text", window: int = 16,
                      out_col="doc_fingerprint") -> pa.Table:
    """Winnowing-style document fingerprint: min rolling hash over
    `window`-char windows (deterministic; numpy-vectorized per doc)."""
    from .dedup import _mix64
    texts = batch.column(text_col).to_pylist()
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        if not t:
            continue
        b = np.frombuffer(t.encode(errors="ignore"), dtype=np.uint8)
        if len(b) < window:
            out[i] = _mix64(np.array([len(b)], dtype=np.uint64)
                            + b.sum().astype(np.uint64))[0]
            continue
        acc = np.zeros(len(b) - window + 1, dtype=np.uint64)
        for w in range(window):
            acc = _mix64(acc * np.uint64(31) + b[w:len(b) - window + 1 + w])
        out[i] = acc.min()
    return batch.append_column(out_col, pa.array(out.view(np.int64)))
