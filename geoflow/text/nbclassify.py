"""Multinomial Naive-Bayes document classifier: distributed count
training + broadcast vectorized scoring.

The "train a lightweight quality/language classifier over the corpus,
then score every document" stage of a web-curation stack (the public
fastText/CCNet-style recipe, with NB in place of the logistic layer —
NB training is a pure count aggregation, which is exactly the shape
that distributes: one tokenize+count pass, one (token,label) groupby,
a driver-side model no bigger than the kept vocabulary).

Exactness: training counts are integers (order-independent sums —
the `nb_train_counts` oracle gates the aggregated model state
bit-for-bit). Predictions compare float log-score sums, which are NOT
reproducible across engines op-for-op; the `nb_classify` gate therefore
follows the repo's planted-margin pattern (DSIR, CLAUDE.md): the
probe corpus guarantees every document's winning class by >= 1 nat,
dwarfing cross-engine libm drift (~1e-12).

Pruning semantics (SQL-mirrorable by construction): a (token, label)
pair is kept iff its count >= min_count; the vocabulary is the union
of kept tokens; kept-vocab pairs with no kept row score as count 0
(Laplace alpha); tokens outside the vocabulary are skipped entirely.
min_count=1 keeps everything (exact small-corpus mode); at scale
min_count > 1 bounds the driver model by the Heaps'-law heavy tail,
the same defense text/bpetrain.py uses.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from geoflow.text.hashing import tokenize

_SEP = "\x1f"  # never produced by TOKEN_MATCH (not a word char)


class NBModel:
    """Immutable trained model: sorted vocab, sorted labels, (V, C)
    int64 count matrix, per-class token totals and doc counts."""

    def __init__(self, vocab: np.ndarray, labels: list,
                 counts: np.ndarray, class_docs: np.ndarray,
                 alpha: int = 1):
        self.vocab = vocab            # sorted unicode array
        self.labels = labels          # sorted python list
        self.counts = counts          # (V, C) int64
        self.class_docs = class_docs  # (C,) int64 docs per class
        self.alpha = alpha
        tot = counts.sum(axis=0)      # (C,) tokens per class
        v = len(vocab)
        # per-(token, class) log-likelihood + class log-prior, float64
        self.loglik = np.log(
            (counts + alpha).astype(np.float64)
            / (tot + alpha * v).astype(np.float64))
        self.logprior = np.log(
            class_docs.astype(np.float64) / class_docs.sum())
        # unseen-but-in-vocab is already count 0 in `counts`

    def counts_table(self) -> pa.Table:
        """(token, label, cnt) rows for the NONZERO counts — the
        integer model state, exactly reproducible in SQL."""
        vi, ci = np.nonzero(self.counts)
        return pa.table({
            "token": pa.array(self.vocab[vi].tolist(), type=pa.string()),
            "label": pa.array([self.labels[c] for c in ci]),
            "cnt": pa.array(self.counts[vi, ci])})


def _partial_counts(batch: pa.Table, text_col: str, label_col: str,
                    lower: bool) -> pa.Table:
    """Per-batch (label SEP token) -> count partials, Arrow group_by
    (C++ hash aggregation, no Python per-token work). Class doc
    counts ride the SAME shuffle as reserved empty-token keys
    (``label SEP``) — TOKEN_MATCH never emits an empty token, so the
    key space can't collide; this saves a whole second hash aggregate
    (multi-second spin-up at small scale, one fewer all-to-all at
    large)."""
    labels = pc.cast(batch.column(label_col), pa.string())
    toks, parent = tokenize(batch.column(text_col), lower=lower)
    if len(toks):
        lab_per_tok = labels.take(pa.array(parent, type=pa.int64()))
        keys = pc.binary_join_element_wise(lab_per_tok, toks, _SEP)
    else:
        keys = pa.array([], type=pa.string())
    doc_keys = pc.binary_join_element_wise(
        labels, pa.scalar(""), _SEP)
    t = pa.table({"key": pa.concat_arrays(
        [pc.cast(keys, pa.string()).combine_chunks()
         if isinstance(keys, pa.ChunkedArray) else keys,
         doc_keys.combine_chunks()
         if isinstance(doc_keys, pa.ChunkedArray) else doc_keys])})
    g = t.group_by("key").aggregate([("key", "count")])
    return pa.table({"key": g.column("key"),
                     "cnt": pc.cast(g.column("key_count"), pa.int64())})


def train_nb(ds, text_col: str = "text", label_col: str = "label", *,
             lower: bool = True, alpha: int = 1, min_count: int = 1,
             max_model_rows: int = 20_000_000) -> NBModel:
    """One distributed tokenize+count pass -> groupby(key).sum ->
    driver model build. The driver receives only (label, token) pairs
    with count >= min_count (bounded by max_model_rows, checked)."""
    agg = ds.map_batches(
        lambda b: _partial_counts(b, text_col, label_col, lower),
        batch_format="pyarrow").groupby("key").sum("cnt")

    keys_l, cnts_l, doc_rows = [], [], {}
    for b in agg.iter_batches(batch_format="pyarrow"):
        if "key" not in b.schema.names or b.num_rows == 0:
            continue  # Ray 2.49 empty aggregator partitions (CLAUDE.md)
        ks = np.asarray(b.column("key"))
        c = b.column("sum(cnt)").to_numpy(zero_copy_only=False)
        # reserved empty-token rows = class doc counts (never pruned)
        is_doc = np.array([k.endswith(_SEP) for k in ks.tolist()])
        for k, n in zip(ks[is_doc].tolist(), c[is_doc].tolist()):
            doc_rows[k[:-1]] = int(n)
        keep = (~is_doc) & (c >= min_count)
        keys_l.extend(ks[keep].tolist())
        cnts_l.append(c[keep])
        if sum(len(x) for x in cnts_l) > max_model_rows:
            raise ValueError(
                f"NB model exceeds max_model_rows={max_model_rows}; "
                f"raise min_count (Heaps'-law prune) or the cap")
    cnts = np.concatenate(cnts_l) if cnts_l else np.empty(0, np.int64)
    pairs = [k.split(_SEP, 1) for k in keys_l]
    lab_arr = np.array([p[0] for p in pairs], dtype=object)
    tok_arr = np.array([p[1] for p in pairs], dtype=object)
    labels = sorted(doc_rows)
    vocab = np.unique(tok_arr) if len(tok_arr) else \
        np.empty(0, dtype=object)
    li = {l: i for i, l in enumerate(labels)}
    counts = np.zeros((len(vocab), len(labels)), dtype=np.int64)
    if len(tok_arr):
        vi = np.searchsorted(vocab, tok_arr)
        ci = np.fromiter((li[l] for l in lab_arr.tolist()),
                         dtype=np.int64, count=len(lab_arr))
        counts[vi, ci] = cnts.astype(np.int64)
    class_docs = np.array([doc_rows[l] for l in labels], dtype=np.int64)
    return NBModel(vocab, labels, counts, class_docs, alpha)


def classify_nb(ds, model: NBModel, text_col: str = "text",
                out_col: str = "pred_label", lower: bool = True):
    """Score every document against the broadcast model (ray.put once,
    zero-copy numpy read per task): per-batch tokenize -> vocab id via
    searchsorted -> scatter-add of per-token log-likelihood rows ->
    argmax class. OOV tokens are skipped (see module docstring)."""
    import ray

    vocab_list = model.vocab.tolist()
    ref = ray.put((np.array(vocab_list, dtype=object), model.loglik,
                   model.logprior, np.array(model.labels, dtype=object)))

    def score(batch: pa.Table) -> pa.Table:
        vocab, loglik, logprior, labels = ray.get(ref)
        toks, parent = tokenize(batch.column(text_col), lower=lower)
        n = batch.num_rows
        scores = np.tile(logprior, (n, 1))
        if len(toks):
            tok_np = np.asarray(toks).astype(object)
            vi = np.searchsorted(vocab, tok_np)
            vi_c = np.clip(vi, 0, max(len(vocab) - 1, 0))
            inv = (vocab[vi_c] == tok_np) if len(vocab) else \
                np.zeros(len(tok_np), dtype=bool)
            np.add.at(scores, parent[inv], loglik[vi_c[inv]])
        pred = labels[np.argmax(scores, axis=1)]
        return batch.append_column(
            out_col, pa.array(pred.tolist(), type=pa.string()))

    return ds.map_batches(score, batch_format="pyarrow")
