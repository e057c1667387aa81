"""Text analysis stages: language-ID, quality scoring, token counting,
document fingerprinting. All batch-vectorized (Arrow RE2 kernels + numpy
over Arrow buffers — no per-row Python); the language-marker / stopword
hash tables are module-level constants computed once per worker process.

Regex semantics note: counting kernels use RE2 via pyarrow.compute — the
same engine DuckDB uses — so every count here is reproducible in oracle
SQL with the identical pattern.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import _offsets_data, hash64, mix64, tokenize

# stopword-marker profiles per language (public common-word lists)
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "une", "des", "dans", "pour", "que"},
    "es": {"el", "la", "los", "las", "es", "una", "por", "con", "para", "que"},
}
_LANGS = list(_LANG_MARKERS)   # tie-break: first language wins (en,de,fr,es)
_MARKER_HASHES = {
    lang: np.sort(hash64(pa.array(sorted(words), type=pa.string())))
    for lang, words in _LANG_MARKERS.items()
}
_CJK_PATTERN = "[一-鿿]"

_STOPWORDS_EN = _LANG_MARKERS["en"] | {"a", "an", "was", "are", "on", "as",
                                       "at", "by", "be", "this", "from"}
_STOPWORD_HASHES = np.sort(hash64(pa.array(sorted(_STOPWORDS_EN),
                                           type=pa.string())))

# BPE-ish subword split: words, numbers, punctuation runs (public
# GPT-2-style pre-tokenizer shape, simplified; RE2 \w is ASCII)
_BPE_PATTERN = r"\w+|[^\w\s]+"


def _count_regex(texts, pattern) -> np.ndarray:
    c = pc.fill_null(pc.count_substring_regex(texts, pattern), 0)
    return c.to_numpy(zero_copy_only=False).astype(np.int64)


def _distinct_marker_counts(th: np.ndarray, parent: np.ndarray, n_docs: int,
                            marker_hashes: np.ndarray) -> np.ndarray:
    """Per-doc count of DISTINCT tokens present in the marker set."""
    pos = np.clip(np.searchsorted(marker_hashes, th), 0,
                  max(len(marker_hashes) - 1, 0))
    member = (marker_hashes[pos] == th) if len(marker_hashes) else \
        np.zeros(len(th), dtype=bool)
    if not member.any():
        return np.zeros(n_docs, dtype=np.int64)
    p, t = parent[member], th[member]
    o = np.lexsort((t, p))
    p, t = p[o], t[o]
    first = np.ones(len(p), dtype=bool)
    first[1:] = (p[1:] != p[:-1]) | (t[1:] != t[:-1])
    return np.bincount(p[first], minlength=n_docs)


def langid_batch(batch: pa.Table, text_col="text",
                 out_col="lang_pred") -> pa.Table:
    """Language ID: CJK script → zh; else the language with the most
    DISTINCT marker stopwords present (first language wins ties); und
    when no tokens or no markers."""
    texts = pc.cast(batch.column(text_col), pa.string())
    n = len(texts)
    cjk = _count_regex(texts, _CJK_PATTERN) > 0
    flat, parent = tokenize(texts)
    th = hash64(flat)
    counts = np.zeros((n, len(_LANGS)), dtype=np.int64)
    for li, lang in enumerate(_LANGS):
        counts[:, li] = _distinct_marker_counts(th, parent, n,
                                                _MARKER_HASHES[lang])
    best = counts.argmax(axis=1)
    best_n = counts.max(axis=1) if n else np.empty(0, dtype=np.int64)
    names = np.array(_LANGS, dtype=object)
    preds = np.where(best_n > 0, names[best], "und")
    preds = np.where(cjk, "zh", preds)
    return batch.append_column(out_col, pa.array(preds, type=pa.string()))


def detect_language(text: str) -> str:
    """Single-string convenience wrapper over the batch kernel."""
    t = pa.table({"text": pa.array([text], type=pa.string())})
    return langid_batch(t).column("lang_pred")[0].as_py()


def quality_batch(batch: pa.Table, text_col="text") -> pa.Table:
    """Quality signals: n_chars, n_tokens (\\S+ runs), n_subtokens
    (BPE-ish regex), punct_ratio, stopword_ratio, mean_token_len,
    quality_score ∈ [0,1]. Every count is an RE2 kernel; every ratio is
    an IEEE op-for-op expression reproducible in oracle SQL."""
    texts = pc.cast(batch.column(text_col), pa.string())
    n = len(texts)
    n_chars = pc.fill_null(pc.utf8_length(texts), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    n_tokens = _count_regex(texts, r"\S+")
    n_sub = _count_regex(texts, _BPE_PATTERN)
    punct_cnt = _count_regex(texts, r"[^\p{L}\p{N}\s]")
    nonspace = _count_regex(texts, r"\S")
    punct = punct_cnt / np.maximum(1, n_chars)
    # stopword occurrences: whitespace tokens, stripped of edge
    # punctuation, lowercased, membership-tested via sorted hash table
    wlists = pc.utf8_split_whitespace(texts)
    wflat = pc.list_flatten(wlists)
    wparent = pc.list_parent_indices(wlists).to_numpy(zero_copy_only=False)
    wnorm = pc.utf8_lower(pc.utf8_trim(wflat, characters=".,;:!?"))
    wh = hash64(wnorm)
    if len(wh):
        pos = np.clip(np.searchsorted(_STOPWORD_HASHES, wh), 0,
                      len(_STOPWORD_HASHES) - 1)
        member = _STOPWORD_HASHES[pos] == wh
        stop_cnt = np.bincount(wparent[member], minlength=n)
    else:
        stop_cnt = np.zeros(n, dtype=np.int64)
    stop = stop_cnt / np.maximum(1, n_tokens)
    # mean whitespace-token length = non-space chars / token count
    mtl = nonspace / np.maximum(1, n_tokens)
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


def readability_batch(batch: pa.Table, text_col="text") -> pa.Table:
    """Flesch-style readability INGREDIENTS, all integer counts (the
    206.835 − 1.015·(w/s) − 84.6·(syll/w) score is two client-side
    float ops — floats never hash cross-engine): n_words = token runs
    ([\\p{L}\\p{N}_]+, the repo token rule), n_syllables = vowel-group
    runs [aeiouyAEIOUY]+ (the standard dictionary-free syllable
    proxy; an explicit case class instead of lower() so no engine's
    Unicode case-mapping version can enter the hash), n_sentences =
    [.!?]+ runs. Three RE2 count kernels, zero shuffle; DuckDB
    regexp_extract_all is the same RE2 (CLAUDE.md bpe_tokens
    precedent)."""
    s = pc.cast(batch.column(text_col), pa.string())
    out = batch.append_column(
        "n_words", pc.cast(pc.fill_null(pc.count_substring_regex(
            s, r"[\p{L}\p{N}_]+"), 0), pa.int64()))
    out = out.append_column(
        "n_syllables", pc.cast(pc.fill_null(pc.count_substring_regex(
            s, r"[aeiouyAEIOUY]+"), 0), pa.int64()))
    return out.append_column(
        "n_sentences", pc.cast(pc.fill_null(pc.count_substring_regex(
            s, r"[.!?]+"), 0), pa.int64()))


def json_int_field_batch(batch: pa.Table, col: str, field: str,
                         out_col: str | None = None) -> pa.Table:
    """Extract an integer field from a flat JSON-object string column
    via ONE RE2 extract ("field"\\s*:\\s*(-?digits)) — the
    schema-on-read fast path for event property blobs; a full JSON
    parser is overkill for fixed-shape telemetry and RE2 keeps the
    DuckDB twin (regexp_extract group 1) bit-identical. Missing field
    → null."""
    pat = '"' + field + r'"\s*:\s*(?P<v>-?\d+)'
    ex = pc.extract_regex(pc.cast(batch.column(col), pa.string()), pat)
    val = pc.cast(pc.struct_field(ex, "v"), pa.int64())
    return batch.append_column(out_col or field, val)


def repetition_batch(batch: pa.Table, text_col="text") -> pa.Table:
    """Gopher-style within-document repetition signals (public corpus
    filtering heuristics — Rae et al. 2021 §A1.1): over lowercased
    word tokens, ``dup_token_ratio`` = 1 - distinct/total (mass of
    repeated tokens) and ``top_token_ratio`` = most-frequent-token
    count / total. Empty docs score 0. One Arrow-RE2 tokenize + one
    lexsort across the whole batch; per-doc counts via bincount /
    run-length reduceat — no per-doc Python."""
    texts = pc.cast(batch.column(text_col), pa.string())
    n = len(texts)
    flat, parent = tokenize(texts)
    th = hash64(flat).view(np.int64)
    nt = np.bincount(parent, minlength=n)
    mc = np.zeros(n, dtype=np.int64)
    nd = np.zeros(n, dtype=np.int64)
    if len(th):
        order = np.lexsort((th, parent))
        ps, hs = parent[order], th[order]
        new_run = np.ones(len(hs), dtype=bool)
        new_run[1:] = (ps[1:] != ps[:-1]) | (hs[1:] != hs[:-1])
        run_parent = ps[new_run]
        run_len = np.diff(np.append(np.nonzero(new_run)[0], len(hs)))
        nd = np.bincount(run_parent, minlength=n)
        ne = np.nonzero(nd > 0)[0]
        starts = np.searchsorted(run_parent, ne)
        mc[ne] = np.maximum.reduceat(run_len, starts)
    ntf = nt.astype(np.float64)
    safe = np.maximum(nt, 1)
    dup = np.where(nt > 0, 1.0 - nd.astype(np.float64) / safe, 0.0)
    top = np.where(nt > 0, mc.astype(np.float64) / safe, 0.0)
    out = batch
    for name, arr in [("n_tokens_alpha", nt),
                      ("dup_token_ratio", dup),
                      ("top_token_ratio", top)]:
        out = out.append_column(name, pa.array(arr))
    return out


# Gopher document-level quality rules (Rae et al. 2021 §A1.1, public
# corpus-filtering heuristics; reference has no equivalent — this is
# part of the training-data-pipeline layer). Every signal is one RE2
# count (same engine as DuckDB) + at most one int/int double division,
# so the whole row — including the keep flag — is oracle-reproducible
# bit-for-bit. Thresholds are the published Gopher values.
GOPHER_STOP_PATTERN = r"(?i)\b(?:the|be|to|of|and|that|have|with)\b"
_GOPHER_PATTERNS = {
    "n_words": r"\S+",
    "nonspace": r"\S",
    "n_sym": r"#|\.\.\.|…",                      # hash + ellipsis marks
    "n_nl": r"\n",
    "n_bullet": r"(?m)^[ \t]*[-•*]",             # bullet-led lines
    "n_ell": r"(?m)(?:\.\.\.|…)[ \t]*$",         # ellipsis-ended lines
    "n_alpha": r"\S*\p{L}\S*",                   # words with a letter
    "n_stop": GOPHER_STOP_PATTERN,
}


def gopher_rules_batch(batch: pa.Table, text_col="text") -> pa.Table:
    """Gopher quality rules per document: word count, mean word length,
    symbol-to-word ratio (# / ellipsis), bullet-led and ellipsis-ended
    line fractions, alpha-word fraction, stopword count, and the
    combined ``gopher_keep`` flag (published thresholds: 50 ≤ words ≤
    100k, 3 ≤ mean word length ≤ 10, symbol ratio ≤ 0.1, bullet lines
    < 90%, ellipsis lines < 30%, ≥80% words contain a letter, ≥2
    stopwords). Complements repetition_batch (the §A1.1 repetition
    signals live there)."""
    texts = pc.cast(batch.column(text_col), pa.string())
    c = {k: _count_regex(texts, p) for k, p in _GOPHER_PATTERNS.items()}
    n_words = c["n_words"]
    safe_w = np.maximum(1, n_words)
    n_lines = c["n_nl"] + 1
    mwl = c["nonspace"] / safe_w
    sym = c["n_sym"] / safe_w
    bullet = c["n_bullet"] / n_lines
    ell = c["n_ell"] / n_lines
    alpha = c["n_alpha"] / safe_w
    keep = ((n_words >= 50) & (n_words <= 100_000)
            & (mwl >= 3.0) & (mwl <= 10.0)
            & (sym <= 0.1) & (bullet < 0.9) & (ell < 0.3)
            & (alpha >= 0.8) & (c["n_stop"] >= 2)).astype(np.int64)
    out = batch
    for name, arr in [("n_words", n_words), ("mean_word_len", mwl),
                      ("symbol_ratio", sym), ("bullet_frac", bullet),
                      ("ellipsis_frac", ell), ("alpha_frac", alpha),
                      ("n_stopwords", c["n_stop"]),
                      ("gopher_keep", keep)]:
        out = out.append_column(name, pa.array(arr))
    return out


def gopher_filter(ds, text_col="text"):
    """Dataset-level Gopher filter: keep only rows passing all rules."""
    def fn(b: pa.Table) -> pa.Table:
        g = gopher_rules_batch(b, text_col=text_col)
        return b.filter(pc.equal(g.column("gopher_keep"), 1))
    return ds.map_batches(fn, batch_format="pyarrow")


# scheme://[userinfo@]HOST[:port]/... — RE2-safe, identical result in
# DuckDB regexp_extract (both engines run RE2)
URL_HOST_PATTERN = (r"^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?"
                    r"(?P<host>[^/?#:]+)")


def url_host_batch(batch: pa.Table, url_col="url", out_col="host",
                   strip_www=True) -> pa.Table:
    """Host (domain) per URL — the real-world source-derivation step
    for per-source corpus caps (curate(per_source_cap=...) groups by
    the column this emits). Vectorized RE2 extract; non-URLs → ''
    (matching SQL regexp_extract's no-match value); a leading 'www.'
    is stripped by default so host grouping treats www and bare domains
    as one source."""
    ex = pc.extract_regex(pc.cast(batch.column(url_col), pa.string()),
                          URL_HOST_PATTERN)
    host = pc.fill_null(pc.struct_field(ex, "host"), "")
    if strip_www:
        www = pc.starts_with(host, "www.")
        host = pc.if_else(www, pc.utf8_slice_codeunits(host, 4, 2**30),
                          host)
    return batch.append_column(out_col, host)


# GPT-2-style pre-tokenizer pattern, restricted to RE2 syntax (no
# lookaheads — Arrow and DuckDB both run RE2, so counts agree exactly):
# contraction suffixes, space-prefixed letter/digit/punct runs, whitespace
BPE_SPLIT_PATTERN = (r"'(?:s|t|re|ve|m|ll|d)"
                     r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}']+|\s+")


def bpe_token_count_batch(batch: pa.Table, text_col="text") -> pa.Table:
    """BPE-style pre-token count (the unit LLM tokenizers split on
    before merges — the standard corpus 'token budget' measure, unlike
    the coarser \\S+ whitespace count): number of BPE_SPLIT_PATTERN
    matches, fully vectorized in Arrow RE2."""
    toks = pc.count_substring_regex(
        pc.cast(batch.column(text_col), pa.string()), BPE_SPLIT_PATTERN)
    return batch.append_column("n_tokens_bpe",
                               pc.cast(toks, pa.int64()))


def fingerprint_batch(batch: pa.Table, text_col="text", window: int = 16,
                      out_col="doc_fingerprint") -> pa.Table:
    """Winnowing-style document fingerprint: min rolling hash over
    `window`-byte windows — vectorized across ALL docs in the batch (one
    global byte array, window loop over byte positions, per-doc min via
    reduceat)."""
    texts = pc.cast(batch.column(text_col), pa.string())
    n_docs = len(texts)
    starts, lens, data = _offsets_data(texts.combine_chunks()
                                       if isinstance(texts, pa.ChunkedArray)
                                       else texts)
    out = np.zeros(n_docs, dtype=np.uint64)
    N = len(data)
    long = lens >= window
    if long.any() and N >= window:
        nw = N - window + 1
        acc = np.zeros(nw, dtype=np.uint64)
        d64 = data.astype(np.uint64)
        for w in range(window):
            acc = mix64(acc * np.uint64(31) + d64[w:nw + w])
        # valid window start positions per doc: [starts, starts+len-window]
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        valid = np.zeros(nw, dtype=bool)
        li = np.nonzero(long)[0]
        # mark ranges via diff trick
        marks = np.zeros(nw + 1, dtype=np.int64)
        np.add.at(marks, starts[li], 1)
        np.add.at(marks, starts[li] + lens[li] - window + 1, -1)
        valid = np.cumsum(marks[:-1]) > 0
        vpos = np.nonzero(valid)[0]
        vdoc = doc_of[vpos]
        seg = np.searchsorted(vdoc, li)
        mins = np.minimum.reduceat(acc[vpos], seg)
        out[li] = mins
    # short docs (0 < len < window): mix of length + byte sum
    short = np.nonzero((lens > 0) & ~long)[0]
    for i in short:
        b = data[starts[i]:starts[i] + lens[i]]
        out[i] = mix64(np.array([lens[i]], dtype=np.uint64)
                       + b.sum().astype(np.uint64))[0]
    return batch.append_column(out_col, pa.array(out.view(np.int64)))


def doc_frequency_partials(batch: pa.Table, text_col="text") -> pa.Table:
    """(token, partial document-frequency) rows for one batch: per-doc
    DISTINCT lowercased tokens (one lexsort pair-dedup — each doc lives
    wholly in its row, so per-batch pair dedup is global), collapsed to
    per-batch counts. Only the distinct-token projection enters the
    groupby shuffle; with Zipfian text the partials collapse the head
    tokens ~batch-size-fold before the exchange."""
    from .hashing import tokenize

    flat, parent = tokenize(batch.column(text_col))
    if len(parent) == 0:
        return pa.table({"token": pa.array([], type=pa.string()),
                         "df_part": pa.array([], type=pa.int64())})
    # distinct (token, doc) pairs via sort over (hash, doc) — then the
    # string tokens are gathered only for the surviving pair reps
    from .hashing import hash64
    h = hash64(flat)
    order = np.lexsort((parent, h))
    hs, ds_ = h[order], parent[order]
    first = np.empty(len(hs), dtype=bool)
    first[0] = True
    first[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
    rep_idx = order[first]           # one flat-index per (token, doc)
    hu = hs[first]
    # per-batch df: run length per hash (pairs are hash-sorted)
    tok_first = np.empty(len(hu), dtype=bool)
    tok_first[0] = True
    tok_first[1:] = hu[1:] != hu[:-1]
    df = np.diff(np.append(np.nonzero(tok_first)[0], len(hu)))
    toks = flat.take(pa.array(rep_idx[tok_first], type=pa.int64()))
    return pa.table({"token": toks,
                     "df_part": pa.array(df.astype(np.int64))})


def document_frequency(ds, text_col="text", min_df: int = 1):
    """Dataset (token, df): number of distinct documents containing
    each lowercased token. Per-batch partials (doc_frequency_partials)
    feed a (token, int64) groupby-sum; tokens below ``min_df`` are
    dropped after the aggregate."""
    from ray.data.aggregate import Sum

    agg = ds.map_batches(
        lambda b: doc_frequency_partials(b, text_col),
        batch_format="pyarrow").groupby("token").aggregate(Sum("df_part"))

    def finish(b: pa.Table) -> pa.Table:
        if "token" not in b.schema.names:
            return pa.table({"token": pa.array([], type=pa.string()),
                             "df": pa.array([], type=pa.int64())})
        df = pc.cast(b.column("sum(df_part)"), pa.int64())
        out = pa.table({"token": b.column("token"), "df": df})
        return out.filter(pc.greater_equal(df, min_df))

    return agg.map_batches(finish, batch_format="pyarrow")


def top_df_tokens(ds, k: int = 30, text_col="text"):
    """Top-k tokens by document frequency (stopword discovery —
    deterministic tiebreak on the token itself). The aggregate output
    is token-cardinality-sized; the sort moves only (token, df)."""
    return document_frequency(ds, text_col).sort(
        ["df", "token"], descending=[True, False]).limit(k)


def normalize_text_batch(batch: pa.Table, text_col="text",
                         out_col="text_norm", form="NFC") -> pa.Table:
    """Unicode normalization (UAX #15) of a string column — the
    standard first step of corpus text canonicalization before
    tokenization/hashing (composes decomposed combining sequences;
    folds compatibility ligatures under NFKC).

    Arrow's utf8_normalize in this container (pyarrow 16.1) only
    DECOMPOSES — verified: NFC(e+U+0301) stays decomposed and NFC of
    composed U+00E9 comes back decomposed — so it cannot implement NFC
    at all. Instead: every normalization form is the identity on pure
    ASCII, so the batch short-circuits on a vectorized
    pc.string_is_ascii mask and only the non-ASCII rows (the small
    minority in web corpora) go through CPython's unicodedata
    (UAX #15-conformant; output bit-identical to DuckDB's
    nfc_normalize, which the nfc_norm driver oracle checks)."""
    import unicodedata
    s = pc.cast(batch.column(text_col), pa.string())
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    is_ascii = pc.fill_null(pc.string_is_ascii(s), False) \
        .to_numpy(zero_copy_only=False).astype(bool)
    if bool(np.all(is_ascii)):
        out = s
    else:
        vals = s.to_pylist()
        out = pa.array(
            [v if a or v is None else unicodedata.normalize(form, v)
             for v, a in zip(vals, is_ascii)], type=pa.string())
    if out_col == text_col:
        i = batch.schema.get_field_index(text_col)
        return batch.set_column(i, text_col, out)
    return batch.append_column(out_col, out)


# Unicode script inventory for script_profile_batch — fixed order;
# dominant-script ties break toward the EARLIER entry (np.argmax
# first-max semantics, mirrored by the oracle's CASE chain order).
SCRIPTS = ("Latin", "Cyrillic", "Greek", "Han", "Arabic", "Hebrew",
           "Devanagari", "Hangul", "Hiragana", "Katakana", "Thai")


def script_profile_batch(batch: pa.Table, text_col="text") -> pa.Table:
    """Per-document Unicode script profile: one RE2
    ``\\p{Script}`` count per entry of SCRIPTS (count_substring_regex
    — the same RE2 DuckDB runs, so counts are bit-reproducible in
    SQL), total letters ``\\p{L}``, the dominant script label
    (argmax over SCRIPTS order; all-zero rows get SCRIPTS[0]) and its
    fraction of the scripted total. The workhorse behind
    language/script routing in multilingual corpus pipelines."""
    s = pc.cast(batch.column(text_col), pa.string())
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    counts = np.stack([
        np.asarray(pc.count_substring_regex(
            s, pattern=r"\p{%s}" % name), dtype=np.int64)
        for name in SCRIPTS])
    n_letters = np.asarray(
        pc.count_substring_regex(s, pattern=r"\p{L}"), dtype=np.int64)
    dom = np.argmax(counts, axis=0)          # first max wins
    total = counts.sum(axis=0)
    dom_cnt = counts[dom, np.arange(counts.shape[1])]
    cols = {"doc_id": batch.column("doc_id")} \
        if "doc_id" in batch.schema.names else {}
    for i, name in enumerate(SCRIPTS):
        cols["n_" + name.lower()] = pa.array(counts[i])
    cols["n_letters"] = pa.array(n_letters)
    cols["script"] = pa.array(
        np.asarray(SCRIPTS, dtype=object)[dom], pa.string())
    cols["script_frac"] = pa.array(
        dom_cnt.astype(np.float64) / np.maximum(total, 1))
    return pa.table(cols)


def compression_ratio_batch(batch: pa.Table, text_col="text",
                            level: int = 6) -> pa.Table:
    """Compressibility quality signal (the classic "too repetitive /
    too random" filter — e.g. the compression-ratio heuristic in
    large-corpus curation pipelines): per document, zlib-compressed
    size over raw UTF-8 size. Boilerplate/spam compresses far below
    natural text; encrypted/binary junk barely compresses. zlib is
    C-speed per doc (linear, no Python char loops); the ratio itself
    is library-deterministic but NOT SQL-computable, so oracle gating
    selects PLANTED ratio classes with wide margins (CLAUDE.md
    float-selection rule) rather than hashing ratio bytes.

    Emits n_bytes (UTF-8 length), c_bytes (compressed length) and
    ratio = c_bytes / max(n_bytes, 1)."""
    import zlib

    s = pc.cast(batch.column(text_col), pa.string())
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    n = len(s)
    n_bytes = pc.fill_null(pc.binary_length(
        pc.cast(s, pa.binary())), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    c_bytes = np.zeros(n, dtype=np.int64)
    # per-doc zlib (C speed); the flat-buffer view avoids per-row
    # Python string materialization
    from geoflow.text.hashing import _offsets_data
    arr = pc.cast(s, pa.binary()).combine_chunks() \
        if isinstance(pc.cast(s, pa.binary()), pa.ChunkedArray) \
        else pc.cast(s, pa.binary())
    starts, lens, data = _offsets_data(arr)
    buf = data.tobytes()
    for i in range(n):
        if lens[i] > 0:
            c_bytes[i] = len(zlib.compress(
                buf[starts[i]: starts[i] + lens[i]], level))
    ratio = c_bytes.astype(np.float64) / np.maximum(n_bytes, 1)
    out = batch
    for name, arr_ in [("n_bytes", n_bytes), ("c_bytes", c_bytes),
                       ("compress_ratio", ratio)]:
        out = out.append_column(name, pa.array(arr_))
    return out


def compression_filter(ds, text_col="text", lo: float = 0.25,
                       hi: float = 0.95):
    """Keep documents whose compression ratio lies in [lo, hi] —
    drops boilerplate repeats (below lo) and random junk (above hi).
    One map_batches pass, no shuffle."""
    def fn(b: pa.Table) -> pa.Table:
        t = compression_ratio_batch(b, text_col)
        r = t.column("compress_ratio").to_numpy(zero_copy_only=False)
        return t.filter(pa.array((r >= lo) & (r <= hi)))
    return ds.map_batches(fn, batch_format="pyarrow")


def lexical_diversity_batch(batch: pa.Table, text_col="text") -> pa.Table:
    """Lexical-diversity signals per document: n_tokens, n_distinct,
    n_hapax (tokens occurring exactly once in the doc), and
    ttr = n_distinct / max(n_tokens, 1) (type-token ratio — ONE float
    division of exact ints, IEEE-reproducible in SQL). Tokenization is
    the repo-standard RE2 word pattern (hashing.tokenize, lowercased),
    identical to DuckDB regexp_extract_all — the `lexical_diversity`
    driver gate runs both over the real documents.text.

    Distinctness is computed on 64-bit token hashes (collision odds
    ~V^2/2^64 — the repo-wide convention, see tfidf.py)."""
    from .hashing import hash64, tokenize

    ids_n = batch.num_rows
    flat, parent = tokenize(batch.column(text_col))
    n_tokens = np.bincount(parent, minlength=ids_n).astype(np.int64) \
        if len(parent) else np.zeros(ids_n, np.int64)
    n_distinct = np.zeros(ids_n, dtype=np.int64)
    n_hapax = np.zeros(ids_n, dtype=np.int64)
    if len(parent):
        h = hash64(flat)
        order = np.lexsort((h, parent))
        hs, ps = h[order], parent[order]
        first = np.r_[True, (hs[1:] != hs[:-1]) | (ps[1:] != ps[:-1])]
        starts = np.flatnonzero(first)
        runs = np.diff(np.r_[starts, len(hs)])
        np.add.at(n_distinct, ps[starts], 1)
        np.add.at(n_hapax, ps[starts[runs == 1]], 1)
    ttr = n_distinct.astype(np.float64) / np.maximum(n_tokens, 1)
    out = batch
    for name, arr in [("n_tokens", n_tokens),
                      ("n_distinct", n_distinct),
                      ("n_hapax", n_hapax)]:
        out = out.append_column(name, pa.array(arr))
    return out.append_column("ttr", pa.array(ttr))


def token_burstiness(ds, text_col: str = "text"):
    """Per-token burstiness ingredients (Church & Gale 1995): over
    the per-document count series of each token, n_docs (documents
    containing it), sum_c and sum_c2 — the Fano factor var/mean is
    one client-side division. All int64, hash-exact vs a per-doc
    GROUP BY oracle.

    Shape: each document's counts are complete inside its batch row,
    so one map pass emits per-batch PRE-SUMMED (token, nd, s, s2)
    partials (value_counts per doc via a (doc, token) lexsort) and a
    single token groupby-sum finishes."""
    import pyarrow.compute as _pc

    from ray.data.aggregate import Sum

    from .hashing import tokenize

    empty = pa.table({"token": pa.array([], pa.string()),
                      "nd": pa.array([], pa.int64()),
                      "s": pa.array([], pa.int64()),
                      "s2": pa.array([], pa.int64())})

    def partial(b: pa.Table) -> pa.Table:
        flat, parent = tokenize(b.column(text_col))
        if len(flat) == 0:
            return empty
        enc = _pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nv = len(enc.dictionary)
        key = parent * nv + codes
        uk, c = np.unique(key, return_counts=True)
        c = c.astype(np.int64)
        tok = (uk % nv)
        nd = np.bincount(tok, minlength=nv).astype(np.int64)
        s = np.bincount(tok, weights=c.astype(np.float64),
                        minlength=nv).astype(np.int64)
        s2 = np.bincount(tok, weights=(c * c).astype(np.float64),
                         minlength=nv).astype(np.int64)
        return pa.table({"token": enc.dictionary,
                         "nd": pa.array(nd), "s": pa.array(s),
                         "s2": pa.array(s2)})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("nd"), Sum("s"), Sum("s2"))

    def fin(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "token" not in b.schema.names:
            return pa.table({"token": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "sum_c": pa.array([], pa.int64()),
                             "sum_c2": pa.array([], pa.int64())})
        return pa.table({"token": b.column("token"),
                         "n_docs": b.column("sum(nd)"),
                         "sum_c": b.column("sum(s)"),
                         "sum_c2": b.column("sum(s2)")})

    return agg.map_batches(fin, batch_format="pyarrow")
