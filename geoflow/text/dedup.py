"""Deduplication stages for large-scale training-data pipelines.

Beyond the reference surface (RDF makes triples unique by construction —
SURVEY.md §2.7); these are first-class engine components for the 100 TB
corpus use case:

- exact dedup: tiny (hash, key) shuffle picks winners; the payload is
  then FILTERED against the broadcast winner set — the text column never
  enters a shuffle.
- MinHash-LSH near-dup: shingle → minhash signature (batch-vectorized
  numpy over Arrow buffers, no per-token Python) → band buckets →
  groupby(bucket) emits candidate pairs (bucket-size-capped, vectorized)
  → groupby(pair) dedups across bands. Only (key, bucket) rows are
  shuffled — signatures stay in the map stage.
- SimHash: 64-bit fingerprint from token hashes, hamming-ball buckets.
- n-gram Jaccard verification for candidate pairs.

All hashes are process-independent (see hashing.py) — required for
deterministic task retries / resume.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import _GOLD, hash64, mix64, tokenize

# back-compat alias (analysis.py and external callers import _mix64)
_mix64 = mix64


def content_hash(texts) -> pa.Array:
    """Stable 64-bit hex content hash per text — vectorized through
    hash64 (round-3: was a per-row hashlib.blake2b loop; the hex values
    changed, which is fine — the hash is an opaque dedup key, nothing
    persists it across versions)."""
    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(list(texts), type=pa.string())
    nulls = pc.is_null(texts)
    h = content_hash64(texts)
    hexes = np.char.mod("%016x", h)
    return pa.array(
        np.where(nulls.to_numpy(zero_copy_only=False), None, hexes),
        type=pa.string())


def add_content_hash(batch: pa.Table, text_col="text",
                     out_col="content_hash") -> pa.Table:
    return batch.append_column(out_col,
                               content_hash(batch.column(text_col)))


def content_hash64(texts) -> np.ndarray:
    """Vectorized uint64 content hash over full text bytes (cap disabled:
    exact dedup must distinguish texts sharing a 64-byte prefix)."""
    return hash64(pc.cast(texts, pa.string()), cap=1 << 62)


def exact_dedup(ds, text_col="text", key_col=None,
                winner_mode="broadcast"):
    """Exact dedup: keep one representative (min key) per identical text.

    Scale shape (100 TB): the payload NEVER enters a shuffle.
      1. project each row to (content_hash64, key) — map stage only;
      2. groupby(hash).min(key) — a tiny 16-byte/row shuffle — yields the
         winner key set;
      3. broadcast the sorted winner keys (`ray.put`), re-read the input
         and keep rows whose key is in the set (np.isin, vectorized).
    The input lineage executes twice (two read passes) — at scale a
    second columnar read is far cheaper than an all-to-all shuffle of the
    text payload. Winner set must fit in the object store: output_rows ×
    8 B (e.g. 10^9 survivors ≈ 8 GB) — beyond that pass
    winner_mode="join": step 3 becomes a key-partitioned hash join
    (join/semijoin.partitioned_key_filter) — the payload then crosses
    the wire once, but nothing is driver-materialized at ANY winner
    cardinality.

    With key_col=None falls back to a single groupby(hash) shuffle
    carrying the payload (small-data convenience path)."""
    if key_col is None:
        ds2 = ds.map_batches(lambda b: add_content_hash(b, text_col),
                             batch_format="pyarrow")
        return ds2.groupby("content_hash").map_groups(
            lambda g: g.slice(0, 1), batch_format="pyarrow")

    def project(batch: pa.Table) -> pa.Table:
        h = content_hash64(batch.column(text_col))
        return pa.table({"h64": pa.array(h.view(np.int64)),
                         key_col: batch.column(key_col)})

    winners_ds = ds.map_batches(project, batch_format="pyarrow") \
        .groupby("h64").min(key_col)
    if winner_mode == "join":
        from ..join.semijoin import partitioned_key_filter
        wk = winners_ds.map_batches(
            lambda b: pa.table({key_col: b.column(f"min({key_col})")}),
            batch_format="pyarrow")
        return partitioned_key_filter(ds, wk, key_col)
    keys = []
    for b in winners_ds.iter_batches(batch_format="pyarrow"):
        keys.append(b.column(f"min({key_col})").to_numpy(zero_copy_only=False))
    winner_keys = np.sort(np.concatenate(keys)) if keys else np.empty(0, np.int64)
    import ray
    ref = ray.put(winner_keys)

    def keep_winners(batch: pa.Table) -> pa.Table:
        wk = _winner_cache_get(ref)
        kv = batch.column(key_col).to_numpy(zero_copy_only=False)
        if len(wk) == 0:
            mask = np.zeros(len(kv), dtype=bool)
        else:
            pos = np.clip(np.searchsorted(wk, kv), 0, len(wk) - 1)
            mask = wk[pos] == kv
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep_winners, batch_format="pyarrow")


def exact_dup_loser_keys(ds, text_col="text", key_col="doc_id",
                         num_partitions=None):
    """Dataset of ``loser`` keys: every doc whose text is an exact
    duplicate of a SMALLER-keyed doc (the complement of exact_dedup's
    winner set, as keys to DROP). Shape: (h64, key) 16-byte projection
    → groupby(h64).min → hash-join the min back onto the projection on
    h64 → keep key != min. Nothing is driver-materialized, so the
    loser set may be arbitrarily large (duplicate-heavy web corpora).
    Used by the resumable curation job's checkpointed drop-set phase."""
    import ray

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        num_partitions = max(2, min(cpus // 4, 16))

    def project(batch: pa.Table) -> pa.Table:
        h = content_hash64(batch.column(text_col))
        return pa.table({"h64": pa.array(h.view(np.int64)),
                         key_col: batch.column(key_col)})

    from ..join.semijoin import drop_schemaless_blocks
    # Sanitize the projection BEFORE both consumers: an upstream filter
    # that empties a block short-circuits the rest of the fused map
    # chain (Ray 2.49), so the empty block reaches the join with its
    # PRE-projection schema (no h64) and poisons the partition —
    # same family as the schema-less hash-agg empties the helper
    # documents. Materializing also reuses the (h64,key) pass for both
    # the groupby and the join left side instead of re-executing the
    # corpus lineage twice.
    proj, _keep_p = drop_schemaless_blocks(
        ds.map_batches(project, batch_format="pyarrow"))
    if proj is None:  # empty corpus -> no losers
        return ray.data.from_arrow(
            pa.table({"loser": pa.array([], type=pa.int64())}))
    winners, _keep = drop_schemaless_blocks(proj.groupby("h64").min(key_col))
    if winners is None:
        return ray.data.from_arrow(
            pa.table({"loser": pa.array([], type=pa.int64())}))
    joined = proj.join(winners, join_type="inner",
                       num_partitions=num_partitions, on=("h64",))

    def non_min(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        w = batch.column(f"min({key_col})").to_numpy(zero_copy_only=False)
        return pa.table({"loser": pa.array(k[k != w])})

    out = joined.map_batches(non_min, batch_format="pyarrow")
    out._geoflow_keepalive = (_keep_p, _keep)
    return out


# per-worker-process cache of fetched winner arrays (task pool pattern:
# workers persist across tasks; one ray.get per worker, not per batch)
_WINNER_CACHE: dict = {}


def _winner_cache_get(ref):
    key = ref.hex()
    arr = _WINNER_CACHE.get(key)
    if arr is None:
        import ray
        arr = ray.get(ref)
        _WINNER_CACHE.clear()
        _WINNER_CACHE[key] = arr
    return arr


class MinHasher:
    """Stateful minhash signature stage: permutation parameters generated
    once per actor/worker in __init__; __call__ is batch-vectorized —
    tokenization in Arrow (RE2), token hashing as a numpy byte loop,
    shingling and per-doc minima via reduceat. No per-row Python."""

    def __init__(self, num_hashes: int = 128, shingle_k: int = 5, seed: int = 13):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 61, size=num_hashes,
                              dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 1 << 61, size=num_hashes, dtype=np.uint64)
        self.k = shingle_k
        self.num = num_hashes

    def _shingles(self, texts):
        """(shingle hashes uint64, doc index per shingle, n_docs). Every
        doc contributes ≥1 shingle: docs with < k tokens get a fallback
        hash of their combined token hashes + count."""
        n_docs = len(texts)
        flat, parent = tokenize(texts)
        th = hash64(flat)
        k = self.k
        n_tok = len(th)
        counts = np.bincount(parent, minlength=n_docs) if n_tok else \
            np.zeros(n_docs, dtype=np.int64)
        # rolling k-window combine over the flat token-hash array; windows
        # crossing doc boundaries masked out
        if n_tok >= k:
            nw = n_tok - k + 1
            acc = np.zeros(nw, dtype=np.uint64)
            for i in range(k):
                acc = mix64(acc + th[i:i + nw] * _GOLD)
            valid = parent[:nw] == parent[k - 1:]
            sh = acc[valid]
            sh_doc = parent[:nw][valid]
        else:
            sh = np.empty(0, dtype=np.uint64)
            sh_doc = np.empty(0, dtype=np.int64)
        # fallback for short docs (< k tokens, incl. empty): order-free
        # combine of the doc's token hashes
        short = np.nonzero(counts < k)[0]
        if len(short):
            seg = np.zeros(n_docs, dtype=np.uint64)
            if n_tok:
                np.add.at(seg, parent, mix64(th))
            fb = mix64(seg[short] + counts[short].astype(np.uint64) + _GOLD)
            sh = np.concatenate([sh, fb])
            sh_doc = np.concatenate([sh_doc, short])
        order = np.argsort(sh_doc, kind="stable")
        return sh[order], sh_doc[order], n_docs

    def signatures(self, texts) -> np.ndarray:
        """(n_docs, num_hashes) uint64 signature matrix."""
        sh, sh_doc, n_docs = self._shingles(texts)
        starts = np.searchsorted(sh_doc, np.arange(n_docs))
        out = np.empty((n_docs, self.num), dtype=np.uint64)
        # chunk the hash functions: full (num × n_shingles) would be GBs
        step = 8
        for c in range(0, self.num, step):
            v = self.a[c:c + step, None] * sh[None, :] + self.b[c:c + step, None]
            out[:, c:c + step] = np.minimum.reduceat(v, starts, axis=1).T
        return out

    def signature(self, text: str) -> np.ndarray:
        return self.signatures(pa.array([text or ""]))[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.signatures(batch.column("text"))
        return batch.append_column(
            "minhash", pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.ravel(), type=pa.uint64()), self.num))


class CharMinHasher(MinHasher):
    """MinHash over CHARACTER n-gram shingles — the n-gram-Jaccard
    dedup family (byte windows over UTF-8; == char n-grams for ASCII).
    Signature/banding machinery shared with the word-shingle MinHasher,
    so lsh_band_pairs works unchanged on its output; the LSH collision
    probability then estimates CHARACTER n-gram Jaccard."""

    def __init__(self, num_hashes: int = 128, ngram: int = 3,
                 seed: int = 13):
        super().__init__(num_hashes=num_hashes, shingle_k=ngram,
                         seed=seed)

    def _shingles(self, texts):
        from .hashing import byte_ngram_hashes
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if not isinstance(texts, pa.Array):
            texts = pa.array(list(texts), type=pa.string())
        sh, sh_doc = byte_ngram_hashes(texts, self.k)
        return sh, sh_doc, len(texts)


def _band_bucket_fn(num_hashes, bands, key_col):
    """Batch fn: minhash signature rows → `bands` (key, bucket) rows,
    16 bytes each (band index mixed into the 64-bit bucket hash so one
    groupby key covers all bands)."""
    rows_per_band = num_hashes // bands

    def to_buckets(batch: pa.Table) -> pa.Table:
        sig = batch.column("minhash")
        if isinstance(sig, pa.ChunkedArray):
            sig = sig.combine_chunks()
        flat = np.asarray(sig.flatten(), dtype=np.uint64)
        sigs = flat.reshape(-1, num_hashes)
        n = len(sigs)
        keys = batch.column(key_col)
        out_bucket = np.empty(n * bands, dtype=np.uint64)
        for b in range(bands):
            seg = sigs[:, b * rows_per_band:(b + 1) * rows_per_band]
            h = np.full(n, np.uint64(b + 1), dtype=np.uint64) * _GOLD
            for c in range(rows_per_band):
                h = mix64(h + seg[:, c] * _GOLD)
            out_bucket[b * n:(b + 1) * n] = h
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), bands))
        return pa.table({
            key_col: keys.take(idx),
            "bucket": pa.array(out_bucket.view(np.int64)),
        })

    return to_buckets


def lsh_loser_keys(ds, num_hashes=128, bands=32, key_col="doc_id"):
    """``loser`` keys for representative near-dup DEDUP: every doc that
    shares some LSH band bucket with a SMALLER key. This is exactly the
    loser set of the drop-iff-smaller-partner rule over the full
    candidate-pair output — a key x is a pair loser iff some bucket
    containing x also contains a smaller key, i.e. iff x is not the
    minimum of every one of its buckets — but computed WITHOUT
    materializing pairs: per bucket, emit the non-min keys (n-1 rows —
    the star emission, here exact, not a cap heuristic) and skip the
    per-pair band-count aggregate entirely. On duplicate-heavy corpora
    the pair multiset is O(members² × bands) per near-dup family while
    this is O(members × bands); measured 4-5× faster end-to-end at 200k
    docs (BENCH/BASELINE.md §r3). Output may repeat a key (once per
    bucket); consumers dedup (np.unique / duplicate-safe anti-join).

    Use lsh_band_pairs when the pairs themselves (or est_jaccard) are
    the product; use this when only the drop set is."""
    buckets = ds.map_batches(_band_bucket_fn(num_hashes, bands, key_col),
                             batch_format="pyarrow")

    def non_min(group: pa.Table) -> pa.Table:
        k = group.column(key_col).to_numpy(zero_copy_only=False)
        if len(k) < 2:
            return pa.table({"loser": pa.array([], type=pa.int64())})
        mn = k.min()
        out = np.unique(k[k != mn])
        return pa.table({"loser": pa.array(out, type=pa.int64())})

    return buckets.groupby("bucket").map_groups(non_min,
                                                batch_format="pyarrow")


# per-worker-process cache for the broadcast (nodes, labels) mapping
_CLUSTER_CACHE: dict = {}


def _cluster_cache_get(ref):
    key = ref.hex()
    v = _CLUSTER_CACHE.get(key)
    if v is None:
        import ray
        v = ray.get(ref)
        _CLUSTER_CACHE.clear()
        _CLUSTER_CACHE[key] = v
    return v


def lsh_cluster_labels(ds, num_hashes=128, bands=32, key_col="doc_id",
                       cc_mode: str = "auto",
                       max_driver_edges: int = 2_000_000,
                       max_rounds: int = 16, attach_ds=None):
    """(key, cluster) for EVERY doc: cluster = the minimum doc key of
    the doc's connected component in the MinHash-LSH candidate graph;
    singletons get their own key. This is the published fuzzy-dedup
    "cluster, then keep/sample one per cluster" shape (SlimPajama,
    BigCode/The-Stack dedup): unlike lsh_loser_keys (drop-iff-smaller-
    partner, band-local), cluster labels are TRANSITIVE — A~B~C puts C
    in A's cluster even when A and C never share a bucket.

    Scale shape: edges are per-bucket STARS to the bucket minimum
    (n-1 rows per bucket — identical connected components to the full
    clique at O(members x bands) instead of O(members^2 x bands);
    same argument as lsh_loser_keys). Connected components then run in
    dbscan's two modes (ops/clustering.py): the edge list — bounded by
    duplicated content, metadata-sized relative to the corpus — is
    solved driver-side with the vectorized hash-to-min loop and the
    labels broadcast back into one attach pass; beyond
    ``max_driver_edges`` it switches to the distributed hash-to-min +
    pointer-jumping label propagation in 16-byte (key,label) shuffle
    rows, O(log diameter) rounds.

    ``ds`` is consumed twice (bucket pass + attach/init pass); since
    the attach pass only reads ``key_col``, pass ``attach_ds`` — any
    dataset with the same key set but WITHOUT the signature lineage
    (e.g. the raw docs projection) — to avoid recomputing MinHash
    signatures on the second consumption."""
    import ray
    from ..ops.clustering import (_cc_min_labels, _propagate_min,
                                  _shortcut)

    if cc_mode not in ("auto", "driver", "distributed"):
        raise ValueError("cc_mode must be auto|driver|distributed")
    buckets = ds.map_batches(_band_bucket_fn(num_hashes, bands, key_col),
                             batch_format="pyarrow")

    def star_edges(group: pa.Table) -> pa.Table:
        k = np.unique(group.column(key_col).to_numpy(zero_copy_only=False))
        if len(k) < 2:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64())})
        return pa.table({
            "a": pa.array(np.full(len(k) - 1, k[0]), type=pa.int64()),
            "b": pa.array(k[1:], type=pa.int64())})

    edges = buckets.groupby("bucket").map_groups(
        star_edges, batch_format="pyarrow").materialize()

    if cc_mode == "driver" or (cc_mode == "auto"
                               and edges.count() <= max_driver_edges):
        a_l, b_l = [], []
        for blk in edges.iter_batches(batch_format="pyarrow"):
            if blk.num_rows == 0 or "a" not in blk.schema.names:
                continue  # 0-column blocks from empty map_groups parts
            a_l.append(blk.column("a").to_numpy(zero_copy_only=False))
            b_l.append(blk.column("b").to_numpy(zero_copy_only=False))
        a = np.concatenate(a_l) if a_l else np.empty(0, np.int64)
        b = np.concatenate(b_l) if b_l else np.empty(0, np.int64)
        nodes, labels = _cc_min_labels(a, b)
        ref = ray.put((nodes, labels))

        def attach(batch: pa.Table) -> pa.Table:
            nds, lbs = _cluster_cache_get(ref)
            k = pc.cast(batch.column(key_col), pa.int64()) \
                .to_numpy(zero_copy_only=False)
            lab = k.copy()
            if len(nds):
                pos = np.clip(np.searchsorted(nds, k), 0, len(nds) - 1)
                hit = nds[pos] == k
                lab[hit] = lbs[pos[hit]]
            return pa.table({key_col: pa.array(k),
                             "cluster": pa.array(lab)})

        return (attach_ds if attach_ds is not None else ds) \
            .map_batches(attach, batch_format="pyarrow")

    # distributed: propagation needs both edge directions (a receives
    # labels from its edge-partners b)
    def both_dirs(batch: pa.Table) -> pa.Table:
        an = batch.column("a").to_numpy(zero_copy_only=False)
        bn = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(np.concatenate([an, bn])),
                         "b": pa.array(np.concatenate([bn, an]))})

    cedges = edges.map_batches(both_dirs, batch_format="pyarrow")

    def init_labels(batch: pa.Table) -> pa.Table:
        k = pc.cast(batch.column(key_col), pa.int64())
        return pa.table({"key": k, "label": k})

    labels = (attach_ds if attach_ds is not None else ds) \
        .map_batches(init_labels, batch_format="pyarrow").materialize()
    prev_sum = None
    for _ in range(max_rounds):
        labels = _propagate_min(labels, cedges)
        labels = _shortcut(labels).materialize()
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s
    else:
        import logging
        logging.getLogger(__name__).warning(
            "lsh_cluster_labels hit max_rounds=%d before the monotone "
            "label sum stabilized; labels may be non-minimal", max_rounds)
    return labels.map_batches(
        lambda bt: pa.table({key_col: bt.column("key"),
                             "cluster": bt.column("label")}),
        batch_format="pyarrow")


def lsh_band_pairs(ds, num_hashes=128, bands=32, key_col="doc_id",
                   bucket_cap=512, prefilter=False):
    """MinHash-LSH candidate pairs, scale-safe.

    Stage 1 (map): per doc, hash each of `bands` signature segments with
    the band index mixed in → `bands` rows of (key, bucket) — 16 bytes
    each; the 1 KB signature never enters the shuffle.
    Stage 2 (groupby bucket): rows in one bucket collide on that band —
    emit all pairs (vectorized triu). Buckets larger than `bucket_cap`
    (boilerplate hot buckets, ubiquitous in web corpora) emit a STAR to
    the minimum key instead: n-1 pairs, preserving connected-component /
    representative-dedup semantics at O(n) instead of O(n²).
    Stage 3 (groupby pair): count the bands each pair collided in →
    one output row per pair, est_jaccard = (n_bands/bands)^(1/r)
    (inverse of the band-collision probability J^r).

    Returns Dataset (key_a, key_b, est_jaccard), key_a < key_b, each pair
    once."""
    rows_per_band = num_hashes // bands
    buckets = ds.map_batches(_band_bucket_fn(num_hashes, bands, key_col),
                             batch_format="pyarrow")
    if prefilter:
        # OPTIONAL collision-bucket prefilter. Measured (tools/
        # bench_lsh_scale.py, BENCH/BASELINE.md round 3): on Ray 2.49
        # the single-pass sort-based map_groups handles singleton
        # buckets at ~constant per-row cost and the prefilter's second
        # full aggregate pass makes it uniformly ~2x SLOWER at every
        # measured scale (5k-200k docs, ratio 0.48-0.57 with no
        # crossover) — so it is OFF by default; hot-bucket quadratics
        # are handled by bucket_cap independently.
        from .hashing import filter_to_collision_buckets
        buckets = filter_to_collision_buckets(buckets)

    def emit_pairs(group: pa.Table) -> pa.Table:
        n = len(group)
        empty = pa.table({"key_a": pa.array([], type=pa.int64()),
                          "key_b": pa.array([], type=pa.int64())})
        if n < 2:
            return empty
        keys = np.unique(group.column(key_col).to_numpy(zero_copy_only=False))
        n = len(keys)
        if n < 2:
            return empty
        if n <= bucket_cap:
            ii, jj = np.triu_indices(n, k=1)
            ka, kb = keys[ii], keys[jj]
        else:
            # hot bucket: star to the min key — O(n) rows, same connected
            # components as the full clique
            ka = np.full(n - 1, keys[0])
            kb = keys[1:]
        return pa.table({"key_a": pa.array(ka, type=pa.int64()),
                         "key_b": pa.array(kb, type=pa.int64())})

    pairs = buckets.groupby("bucket").map_groups(emit_pairs,
                                                 batch_format="pyarrow")
    counted = pairs.groupby(["key_a", "key_b"]).count()

    def finish(batch: pa.Table) -> pa.Table:
        c = batch.column("count()").to_numpy(zero_copy_only=False)
        est = np.minimum(c / bands, 1.0) ** (1.0 / rows_per_band)
        return pa.table({"key_a": batch.column("key_a"),
                         "key_b": batch.column("key_b"),
                         "est_jaccard": pa.array(est)})

    return counted.map_batches(finish, batch_format="pyarrow")


def _sig_matrix(col, num_hashes) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col.flatten(),
                      dtype=np.uint64).reshape(-1, num_hashes)


def estimate_pair_jaccard(pairs_ds, sig_ds, key_col="doc_id",
                          num_hashes=128, max_broadcast_pairs=1_000_000,
                          num_partitions=None):
    """Signature-level est_jaccard for candidate pairs. Returns Dataset
    (key_a, key_b, sig_jaccard).

    Shape picked by pair count (same rule as cosine_near_dup_pairs): up
    to `max_broadcast_pairs` the pair set is collected, the signature
    Dataset broadcast-filtered to just those keys, and signatures
    compared in one vectorized pass; beyond that — duplicate-heavy
    corpora where pairs are O(corpus) — the signature column is
    hash-joined onto the pair set (key_a then key_b) and compared inside
    map_batches, fully distributed."""
    import ray
    from ..join.semijoin import drop_schemaless_blocks
    pairs, _keep = drop_schemaless_blocks(
        pairs_ds.select_columns(["key_a", "key_b"]))
    n_pairs = pairs.count() if pairs is not None else 0
    if n_pairs == 0:
        return ray.data.from_arrow(pa.table({
            "key_a": pa.array([], type=pa.int64()),
            "key_b": pa.array([], type=pa.int64()),
            "sig_jaccard": pa.array([], type=pa.float64())}))

    if n_pairs > max_broadcast_pairs:
        from ..vector.ann import pack_rows, unpack_rows
        if num_partitions is None:
            cpus = int(ray.cluster_resources().get("CPU", 4)) \
                if ray.is_initialized() else 4
            num_partitions = max(2, min(cpus // 4, 16))

        def side(out_key, out_sig):
            def f(batch: pa.Table) -> pa.Table:
                m = _sig_matrix(batch.column("minhash"), num_hashes)
                return pa.table({out_key: batch.column(key_col),
                                 out_sig: pack_rows(m, np.uint64)})
            return f

        j1 = pairs.join(sig_ds.map_batches(side("key_a", "sig_a"),
                                           batch_format="pyarrow"),
                        join_type="inner", num_partitions=num_partitions,
                        on=("key_a",))
        j2 = j1.join(sig_ds.map_batches(side("key_b", "sig_b"),
                                        batch_format="pyarrow"),
                     join_type="inner", num_partitions=num_partitions,
                     on=("key_b",))

        def score(batch: pa.Table) -> pa.Table:
            ma = unpack_rows(batch.column("sig_a"), num_hashes, np.uint64)
            mb = unpack_rows(batch.column("sig_b"), num_hashes, np.uint64)
            sj = (ma == mb).mean(axis=1)
            return pa.table({"key_a": batch.column("key_a"),
                             "key_b": batch.column("key_b"),
                             "sig_jaccard": pa.array(sj,
                                                     type=pa.float64())})

        out = j2.map_batches(score, batch_format="pyarrow")
        out._geoflow_keepalive = _keep  # pin sanitized pair blocks
        return out

    ka_parts, kb_parts = [], []
    for b in pairs.iter_batches(batch_format="pyarrow"):
        ka_parts.append(b.column("key_a").to_numpy(zero_copy_only=False))
        kb_parts.append(b.column("key_b").to_numpy(zero_copy_only=False))
    ka = np.concatenate(ka_parts).astype(np.int64)
    kb = np.concatenate(kb_parts).astype(np.int64)
    need_arr = np.unique(np.concatenate([ka, kb]))
    ref = ray.put(need_arr)

    def filt(batch: pa.Table) -> pa.Table:
        wk = _winner_cache_get(ref)
        kv = batch.column(key_col).to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(wk, kv), 0, max(len(wk) - 1, 0))
        mask = (wk[pos] == kv) if len(wk) else np.zeros(len(kv), bool)
        return batch.select([key_col, "minhash"]).filter(pa.array(mask))

    key_parts, sig_parts = [], []
    for b in sig_ds.map_batches(filt, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        key_parts.append(b.column(key_col).to_numpy(zero_copy_only=False))
        sig_parts.append(_sig_matrix(b.column("minhash"), num_hashes))
    allk = np.concatenate(key_parts).astype(np.int64)
    sigs = np.vstack(sig_parts)
    order = np.argsort(allk)
    allk, sigs = allk[order], sigs[order]
    sj = (sigs[np.searchsorted(allk, ka)]
          == sigs[np.searchsorted(allk, kb)]).mean(axis=1)
    return ray.data.from_arrow(pa.table({
        "key_a": pa.array(ka), "key_b": pa.array(kb),
        "sig_jaccard": pa.array(sj, type=pa.float64())}))


class SimHasher:
    """64-bit SimHash fingerprints — batch-vectorized: token bit matrix
    summed per doc with one reduceat pass."""

    def __init__(self, text_col="text", out_col="simhash"):
        self.text_col = text_col
        self.out_col = out_col

    @staticmethod
    def fingerprints(texts) -> np.ndarray:
        """uint64 fingerprint per text (empty/tokenless → 0)."""
        if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = pa.array(list(texts), type=pa.string())
        n_docs = len(texts)
        flat, parent = tokenize(texts)
        th = hash64(flat)
        if len(th) == 0:
            return np.zeros(n_docs, dtype=np.uint64)
        # per-doc majority vote per bit, one hash BYTE at a time (the
        # full (n_tok, 64) matrix would be 512 B/token of intermediate)
        tb = th.view(np.uint8).reshape(-1, 8)   # little-endian byte j =
        starts = np.searchsorted(parent, np.arange(n_docs))  # bits 8j..8j+7
        # trailing tokenless docs get starts == len(th), out of range for
        # reduceat — pad the bit matrix with one zero sentinel row so that
        # index is valid (clipping starts instead would shrink the
        # PRECEDING doc's segment). Zero-token rows are zeroed by the
        # ntok==0 mask below either way.
        ntok = np.bincount(parent, minlength=n_docs)
        shifts = np.arange(8, dtype=np.uint8)
        fp = np.zeros(n_docs, dtype=np.uint64)
        for j in range(8):
            bits = ((tb[:, j, None] >> shifts[None, :])
                    & np.uint8(1)).astype(np.int32)
            bits = np.vstack([bits, np.zeros((1, 8), dtype=np.int32)])
            cnt = np.add.reduceat(bits, starts, axis=0)
            # signed sum = 2*cnt - ntok; bit set iff sum > 0
            pos = (2 * cnt) > ntok[:, None]
            w = np.uint64(1) << (np.arange(8, dtype=np.uint64)
                                 + np.uint64(8 * j))
            fp |= (pos.astype(np.uint64) * w[None, :]).sum(
                axis=1, dtype=np.uint64)
        # docs with zero tokens: reduceat returned a neighbor's row — mask
        fp[ntok == 0] = np.uint64(0)
        return fp

    @staticmethod
    def fingerprint(text: str) -> int:
        return int(SimHasher.fingerprints([text or ""])[0])

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = self.fingerprints(batch.column(self.text_col))
        return batch.append_column(self.out_col,
                                   pa.array(fps.view(np.int64)))


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (np.asarray(a).view(np.uint64) ^ np.asarray(b).view(np.uint64))
    cnt = np.zeros(x.shape, dtype=np.int64)
    while True:
        nz = x != 0
        if not nz.any():
            break
        cnt += nz.astype(np.int64) & (x & np.uint64(1)).astype(np.int64)
        cnt += 0
        x = x >> np.uint64(1)
    return cnt


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Character n-gram Jaccard similarity (verification metric for LSH
    candidates)."""
    sa = {a[i:i + n] for i in range(max(1, len(a) - n + 1))}
    sb = {b[i:i + n] for i in range(max(1, len(b) - n + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def simhash_near_dup_pairs(ds, max_hamming=3, key_col="doc_id",
                           sim_col="simhash", bucket_cap=4096,
                           prefilter=False):
    """SimHash hamming-ball near-dup pairs: band the 64-bit fingerprint
    into 4 × 16-bit segments — two fingerprints within hamming distance
    3 must agree on at least one band (pigeonhole), so banding gives
    guaranteed recall; in-bucket pairs are verified by exact hamming.
    The shuffle carries (key, bucket, fingerprint) = 24 bytes/row.
    Returns Dataset (key_a, key_b, hamming)."""

    def to_buckets(batch: pa.Table) -> pa.Table:
        fp = batch.column(sim_col).to_numpy(zero_copy_only=False) \
            .view(np.uint64)
        keys = batch.column(key_col)
        n = len(fp)
        idx = pa.array(np.tile(np.arange(n, dtype=np.int64), 4))
        buckets = np.empty(4 * n, dtype=np.uint64)
        for b in range(4):
            seg = (fp >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            buckets[b * n:(b + 1) * n] = mix64(
                seg + np.uint64(b + 1) * _GOLD)
        return pa.table({key_col: keys.take(idx),
                         "bucket": pa.array(buckets.view(np.int64)),
                         sim_col: batch.column(sim_col).take(idx)})

    buckets = ds.map_batches(to_buckets, batch_format="pyarrow")
    if prefilter:
        # off by default — see the measurement note in lsh_band_pairs
        from .hashing import filter_to_collision_buckets
        buckets = filter_to_collision_buckets(buckets)

    def emit(group: pa.Table) -> pa.Table:
        empty = pa.table({"key_a": pa.array([], type=pa.int64()),
                          "key_b": pa.array([], type=pa.int64()),
                          "hamming": pa.array([], type=pa.int64())})
        keys = group.column(key_col).to_numpy(zero_copy_only=False)
        fps = group.column(sim_col).to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        keys, fps = keys[order], fps[order]
        first = np.ones(len(keys), dtype=bool)
        first[1:] = keys[1:] != keys[:-1]
        keys, fps = keys[first], fps[first]
        n = len(keys)
        if n < 2:
            return empty
        if n > bucket_cap:
            ka = np.full(n - 1, keys[0])
            kb, fb = keys[1:], fps[1:]
            fa = np.full(n - 1, fps[0])
        else:
            ii, jj = np.triu_indices(n, k=1)
            ka, kb = keys[ii], keys[jj]
            fa, fb = fps[ii], fps[jj]
        hd = hamming_distance(fa, fb)
        keep = hd <= max_hamming
        return pa.table({"key_a": pa.array(ka[keep]),
                         "key_b": pa.array(kb[keep]),
                         "hamming": pa.array(hd[keep])})

    pairs = buckets.groupby("bucket").map_groups(emit,
                                                 batch_format="pyarrow")
    dedup = pairs.groupby(["key_a", "key_b"]).min("hamming")

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"key_a": batch.column("key_a"),
                         "key_b": batch.column("key_b"),
                         "hamming": pc.cast(batch.column("min(hamming)"),
                                            pa.int64())})

    return dedup.map_batches(rename, batch_format="pyarrow")
