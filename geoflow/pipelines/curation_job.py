"""Worker-side pieces of the resumable curation job.

Lives in the package (not jobs/) so Ray workers can import the remote
`run_partition` by reference — jobs/run_curation.py is the thin CLI
orchestrator. See its module docstring for the two-phase checkpoint
contract."""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa

# per-worker-process cache of loaded key arrays: (path, chain) -> ndarray
_KEYS_CACHE: dict = {}


def _load_keys(path: str, chain: str) -> np.ndarray:
    import pyarrow.parquet as pq
    k = (path, chain)
    arr = _KEYS_CACHE.get(k)
    if arr is None:
        if path and os.path.exists(path):
            arr = pq.read_table(path).column("key").to_numpy(
                zero_copy_only=False)
        else:
            arr = np.empty(0, dtype=np.int64)
        # a job holds a handful of artifacts (dropkeys, droplines,
        # benchgrams, blocklist); evict oldest beyond that instead of
        # clearing wholesale (which would thrash between them)
        while len(_KEYS_CACHE) >= 8:
            _KEYS_CACHE.pop(next(iter(_KEYS_CACHE)))
        _KEYS_CACHE[k] = arr
    return arr


def phase1_chain(files: list, *, neardup: bool, languages: str,
                 min_quality: float, key_col: str, text_col: str,
                 prep: str = "-") -> str:
    from ..io.lineage import op_chain_hash
    desc = (f"curation_dropkeys:v1|neardup:{neardup}"
            f"|langs:{languages}|minq:{min_quality}"
            f"|key:{key_col}|text:{text_col}|prep:{prep}"
            "|files:" + ",".join(files))
    return op_chain_hash(desc)


# ---------------------------------------------------------------------------
# PHASE 0 (optional prep artifacts): boilerplate-line drop set and
# benchmark decontamination gram set — each a global, checkpointed
# array under _state/, chained like the drop-key set, applied inside
# phase 1 AND every phase-2 partition (so their semantics match
# curate(line_dedup_min_docs=..., decontam_ds=...)).
# ---------------------------------------------------------------------------

def droplines_chain(files: list, *, text_col: str, min_docs: int,
                    c4: bool = False) -> str:
    from ..io.lineage import op_chain_hash
    return op_chain_hash(f"curation_droplines:v1|min_docs:{min_docs}"
                         f"|text:{text_col}|c4:{int(c4)}|files:"
                         + ",".join(files))


def compute_drop_lines(files: list, state_dir: str, chain: str, *,
                       text_col: str, min_docs: int,
                       c4: bool = False) -> int:
    """Distributed repeated-line hash set (text/linededup partials →
    16-byte groupby-sum), checkpointed to _state/droplines.parquet."""
    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Sum

    from ..text.linededup import _pair_partials

    def partials(batch: pa.Table) -> pa.Table:
        if c4 and batch.num_rows:
            from ..text.c4 import c4_clean_table
            batch = c4_clean_table(batch, text_col=text_col,
                                   out_col=None)
        h, c = _pair_partials(batch, text_col)
        return pa.table({"lh": pa.array(h.view(np.int64)),
                         "c": pa.array(c)})

    agg = ray.data.read_parquet(files, columns=[text_col]).map_batches(
        partials, batch_format="pyarrow").groupby("lh").aggregate(Sum("c"))
    parts = []
    for b in agg.iter_batches(batch_format="pyarrow", batch_size=65536):
        if b.num_rows == 0 or "lh" not in b.schema.names:
            continue
        tot = b.column("sum(c)").to_numpy(zero_copy_only=False)
        parts.append(b.column("lh").to_numpy(
            zero_copy_only=False)[tot >= min_docs])
    # stored in UINT64 order (the searchsorted order of the hash view)
    keys = np.sort(np.concatenate(parts).view(np.uint64)) \
        .view(np.int64) if parts else np.empty(0, np.int64)
    _write_state(state_dir, "droplines", keys, chain)
    return int(len(keys))


def benchgrams_chain(bench_files: list, *, text_col: str,
                     ngram: int) -> str:
    from ..io.lineage import op_chain_hash
    return op_chain_hash(f"curation_benchgrams:v1|n:{ngram}"
                         f"|text:{text_col}|files:"
                         + ",".join(bench_files))


def compute_bench_grams(bench_files: list, state_dir: str, chain: str,
                        *, text_col: str, ngram: int) -> int:
    """Distinct benchmark n-gram hashes (bounded by the benchmark, not
    the corpus), checkpointed to _state/benchgrams.parquet."""
    import ray.data

    from ..text.decontaminate import token_ngram_hashes

    def grams(batch: pa.Table) -> pa.Table:
        g, _ = token_ngram_hashes(batch.column(text_col), ngram)
        return pa.table({"g": pa.array(np.unique(g).view(np.int64))})

    parts = [b.column("g").to_numpy(zero_copy_only=False)
             for b in ray.data.read_parquet(
                 bench_files, columns=[text_col]).map_batches(
                 grams, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")
             if b.num_rows and "g" in b.schema.names]
    # stored in UINT64 order (the searchsorted order of the hash view)
    keys = np.sort(np.unique(np.concatenate(parts)).view(np.uint64)) \
        .view(np.int64) if parts else np.empty(0, np.int64)
    _write_state(state_dir, "benchgrams", keys, chain)
    return int(len(keys))


def dupgrams_chain(files: list, *, text_col: str, k: int,
                   prep: str = "-") -> str:
    from ..io.lineage import op_chain_hash
    return op_chain_hash(f"curation_dupgrams:v1|k:{k}|text:{text_col}"
                         f"|prep:{prep}|files:" + ",".join(files))


def compute_dup_grams(files: list, state_dir: str, chain: str, *,
                      text_col: str, k: int,
                      droplines_path: str = "",
                      droplines_chain_: str = "",
                      benchgrams_path: str = "",
                      benchgrams_chain_: str = "",
                      ngram: int = 13, c4: bool = False) -> int:
    """Duplicated k-token-window hash set (text/substrdedup — the
    ExactSubstr count pass: per-batch partials → 16-byte groupby-sum,
    duplicated subset only), checkpointed to _state/dupgrams.parquet.
    Counted over the text phase 1/2 will actually strip — i.e. AFTER
    the line-strip and decontamination prep artifacts — so its chain
    includes theirs (any upstream artifact change invalidates it)."""
    import ray.data
    from ray.data.aggregate import Sum

    from ..text.substrdedup import window_hash_partials

    def partials(batch: pa.Table) -> pa.Table:
        lines = _load_keys(droplines_path, droplines_chain_)
        grams = _load_keys(benchgrams_path, benchgrams_chain_)
        t = apply_prep(batch, lines, grams, text_col, ngram, c4)
        u, c = window_hash_partials(t, text_col, k, raw_tokens=True)
        return pa.table({"gh": pa.array(u.view(np.int64)),
                         "c": pa.array(c)})

    agg = ray.data.read_parquet(files, columns=[text_col]).map_batches(
        partials, batch_format="pyarrow").groupby("gh").aggregate(Sum("c"))
    parts = []
    for b in agg.iter_batches(batch_format="pyarrow", batch_size=65536):
        if b.num_rows == 0 or "gh" not in b.schema.names:
            continue
        tot = b.column("sum(c)").to_numpy(zero_copy_only=False)
        parts.append(b.column("gh").to_numpy(
            zero_copy_only=False)[tot >= 2])
    # stored in UINT64 order (the searchsorted order of the hash view)
    keys = np.sort(np.concatenate(parts).view(np.uint64)) \
        .view(np.int64) if parts else np.empty(0, np.int64)
    _write_state(state_dir, "dupgrams", keys, chain)
    return int(len(keys))


def dsirratio_chain(files: list, target_files: list, *, text_col: str,
                    m: int, prep: str = "-") -> str:
    from ..io.lineage import op_chain_hash
    return op_chain_hash(f"curation_dsirratio:v1|m:{m}|text:{text_col}"
                         f"|prep:{prep}|target:" + ",".join(target_files)
                         + "|files:" + ",".join(files))


def compute_dsir_ratio(files: list, target_files: list, state_dir: str,
                       chain: str, *, text_col: str, m: int = 0,
                       droplines_path: str = "",
                       droplines_chain_: str = "",
                       benchgrams_path: str = "",
                       benchgrams_chain_: str = "",
                       dupgrams_path: str = "",
                       dupgrams_chain_: str = "", substr_k: int = 0,
                       ngram: int = 13, c4: bool = False) -> int:
    """DSIR log-ratio artifact (text/dsir.py — Xie et al. 2023):
    Laplace-smoothed feature models of the TARGET corpus vs the
    PREP-APPLIED raw corpus, collapsed to one (feature_key, log_ratio)
    table + the unseen-feature default, checkpointed to
    _state/dsirratio.parquet. Raw counts run over exactly the text
    phases 1/2 will score (after every prep artifact), so the chain
    embeds theirs."""
    import pyarrow.parquet as pq
    import ray.data

    from ..text.dsir import feature_counts

    def prep(batch: pa.Table) -> pa.Table:
        lines = _load_keys(droplines_path, droplines_chain_)
        grams = _load_keys(benchgrams_path, benchgrams_chain_)
        t = apply_prep(batch, lines, grams, text_col, ngram, c4)
        if substr_k:
            t = apply_substr(t, _load_keys(dupgrams_path,
                                           dupgrams_chain_),
                             text_col, substr_k)
        return t

    raw = ray.data.read_parquet(files, columns=[text_col]).map_batches(
        prep, batch_format="pyarrow")
    tgt = ray.data.read_parquet(target_files, columns=[text_col])
    tk, tc, T = feature_counts(tgt, text_col, m)
    rk, rc, R = feature_counts(raw, text_col, m)
    union = np.union1d(tk, rk)
    V = m if m else len(union)
    ct = np.zeros(len(union), np.int64)
    ct[np.searchsorted(union, tk)] = tc
    cr = np.zeros(len(union), np.int64)
    cr[np.searchsorted(union, rk)] = rc
    ratio = (np.log(ct + 1.0) - np.log(float(T + V))
             - np.log(cr + 1.0) + np.log(float(R + V)))
    ratio0 = float(-np.log(float(T + V)) + np.log(float(R + V)))
    os.makedirs(state_dir, exist_ok=True)
    tmp = os.path.join(state_dir, ".dsirratio.tmp")
    pq.write_table(pa.table({"key": pa.array(union),
                             "ratio": pa.array(ratio)}), tmp)
    os.replace(tmp, os.path.join(state_dir, "dsirratio.parquet"))
    with open(os.path.join(state_dir, "dsirratio.json"), "w") as f:
        json.dump({"op_chain_hash": chain, "n_keys": int(len(union)),
                   "ratio0": ratio0}, f)
    return int(len(union))


# per-worker cache: (path, chain) -> (keys_sorted, ratio, ratio0)
_DSIR_CACHE: dict = {}


def _load_dsir(path: str, chain: str):
    import pyarrow.parquet as pq
    k = (path, chain)
    v = _DSIR_CACHE.get(k)
    if v is None:
        t = pq.read_table(path)
        with open(path.replace(".parquet", ".json")) as f:
            ratio0 = json.load(f)["ratio0"]
        v = (t.column("key").to_numpy(zero_copy_only=False),
             t.column("ratio").to_numpy(zero_copy_only=False), ratio0)
        _DSIR_CACHE.clear()
        _DSIR_CACHE[k] = v
    return v


def apply_dsir(table: pa.Table, path: str, chain: str, *,
               text_col: str, threshold: float, m: int) -> pa.Table:
    """DSIR selection against the checkpointed ratio artifact — keeps
    rows whose log importance weight exceeds ``threshold``. Runs after
    every prep transform (the artifact was counted over that text)."""
    if table.num_rows == 0:
        return table
    from ..text.dsir import _doc_features
    keys, ratio, ratio0 = _load_dsir(path, chain)
    fk, parent = _doc_features(table.column(text_col), m, False)
    n = table.num_rows
    if len(fk) and len(keys):
        pos = np.clip(np.searchsorted(keys, fk), 0, len(keys) - 1)
        hit = keys[pos] == fk
        vals = np.where(hit, ratio[pos], ratio0)
        w = np.bincount(parent, weights=vals, minlength=n)
    else:
        w = np.zeros(n, np.float64)
    return table.filter(pa.array(w > threshold))


def _write_state(state_dir: str, name: str, keys: np.ndarray,
                 chain: str):
    import pyarrow.parquet as pq
    os.makedirs(state_dir, exist_ok=True)
    tmp = os.path.join(state_dir, f".{name}.tmp")
    pq.write_table(pa.table({"key": pa.array(keys)}), tmp)
    os.replace(tmp, os.path.join(state_dir, f"{name}.parquet"))
    with open(os.path.join(state_dir, f"{name}.json"), "w") as f:
        json.dump({"op_chain_hash": chain, "n_keys": int(len(keys))}, f)


def state_done(state_dir: str, name: str, chain: str) -> bool:
    meta = os.path.join(state_dir, f"{name}.json")
    if not (os.path.exists(meta)
            and os.path.exists(os.path.join(state_dir,
                                            f"{name}.parquet"))):
        return False
    try:
        with open(meta) as f:
            return json.load(f).get("op_chain_hash") == chain
    except (OSError, ValueError):
        return False


def apply_prep(table: pa.Table, lines_sorted: np.ndarray,
               grams_sorted: np.ndarray, text_col: str,
               ngram: int, c4: bool = False) -> pa.Table:
    """The phase-0 transforms on one table, in curate()'s order: C4
    heuristic cleaning first (stateless, doc-local — no artifact),
    then line strip (text-mutating), then decontamination filter."""
    if c4 and table.num_rows:
        from ..text.c4 import c4_clean_table
        table = c4_clean_table(table, text_col=text_col, out_col=None)
    if len(lines_sorted):
        from ..text.linededup import strip_lines_table
        table = strip_lines_table(table, lines_sorted.view(np.uint64),
                                  text_col=text_col)
    if len(grams_sorted) and table.num_rows:
        from ..text.decontaminate import contaminated_mask
        bad = contaminated_mask(table, grams_sorted.view(np.uint64),
                                text_col=text_col, n=ngram)
        table = table.filter(pa.array(~bad))
    return table


def apply_substr(table: pa.Table, dupgrams_sorted: np.ndarray,
                 text_col: str, k: int) -> pa.Table:
    """ExactSubstr strip against the checkpointed dup-gram artifact —
    runs AFTER apply_prep (the artifact was counted over prep-applied
    text) and before the language/quality filter."""
    if len(dupgrams_sorted) == 0 or table.num_rows == 0:
        return table
    from ..text.substrdedup import strip_dup_windows_text_table
    return strip_dup_windows_text_table(
        table, dupgrams_sorted.view(np.uint64), text_col=text_col, k=k)


def _parse_langs(languages: str):
    return tuple(s for s in languages.split(",") if s) or None


def compute_drop_keys(files: list, state_dir: str, chain: str, *,
                      neardup: bool, languages: str, min_quality: float,
                      key_col: str, text_col: str,
                      droplines_path: str = "", droplines_chain_: str = "",
                      benchgrams_path: str = "",
                      benchgrams_chain_: str = "", ngram: int = 13,
                      dupgrams_path: str = "",
                      dupgrams_chain_: str = "",
                      substr_k: int = 0, c4: bool = False,
                      dsir_path: str = "", dsir_chain_: str = "",
                      dsir_threshold: float = 0.0,
                      dsir_m: int = 0) -> int:
    """PHASE 1: distributed drop-key computation + checkpoint write.
    Returns the number of drop keys. Phase-0 prep artifacts (line strip
    / decontamination) apply BEFORE the filter so winner competition
    sees the same text phase 2 emits."""
    import pyarrow.parquet as pq
    import ray.data

    from ..text.dedup import exact_dup_loser_keys
    from .curation import make_filter_fn, neardup_loser_keys

    filt = make_filter_fn(text_col, _parse_langs(languages), min_quality)

    def prep_and_filter(batch: pa.Table) -> pa.Table:
        lines = _load_keys(droplines_path, droplines_chain_)
        grams = _load_keys(benchgrams_path, benchgrams_chain_)
        t = apply_prep(batch, lines, grams, text_col, ngram, c4)
        if substr_k:
            t = apply_substr(t, _load_keys(dupgrams_path,
                                           dupgrams_chain_),
                             text_col, substr_k)
        if dsir_path:
            t = apply_dsir(t, dsir_path, dsir_chain_,
                           text_col=text_col,
                           threshold=dsir_threshold, m=dsir_m)
        return filt(t)

    ds = ray.data.read_parquet(files, columns=[key_col, text_col])
    ds = ds.map_batches(prep_and_filter, batch_format="pyarrow")
    if neardup:
        losers = neardup_loser_keys(ds, key_col=key_col,
                                    text_col=text_col)
    else:
        losers = exact_dup_loser_keys(ds, text_col=text_col,
                                      key_col=key_col)
    parts = [b.column("loser").to_numpy(zero_copy_only=False)
             for b in losers.iter_batches(batch_format="pyarrow")]
    keys = np.unique(np.concatenate(parts)) if parts else \
        np.empty(0, dtype=np.int64)

    os.makedirs(state_dir, exist_ok=True)
    tmp = os.path.join(state_dir, ".dropkeys.tmp")
    pq.write_table(pa.table({"key": pa.array(keys)}), tmp)
    os.replace(tmp, os.path.join(state_dir, "dropkeys.parquet"))
    with open(os.path.join(state_dir, "dropkeys.json"), "w") as f:
        json.dump({"op_chain_hash": chain, "n_keys": int(len(keys))}, f)
    return int(len(keys))


def dropkeys_done(state_dir: str, chain: str) -> bool:
    meta = os.path.join(state_dir, "dropkeys.json")
    if not (os.path.exists(meta)
            and os.path.exists(os.path.join(state_dir,
                                            "dropkeys.parquet"))):
        return False
    try:
        with open(meta) as f:
            return json.load(f).get("op_chain_hash") == chain
    except (OSError, ValueError):
        return False


def run_partition(pid: int, files: list, out_dir: str, chain: str,
                  dropkeys_path: str, drop_chain: str,
                  blocklist_path: str, blocklist_key: str,
                  key_col: str, text_col: str, languages: str,
                  min_quality: float, droplines_path: str = "",
                  droplines_chain_: str = "", benchgrams_path: str = "",
                  benchgrams_chain_: str = "", ngram: int = 13,
                  dupgrams_path: str = "", dupgrams_chain_: str = "",
                  substr_k: int = 0, c4: bool = False,
                  dsir_path: str = "", dsir_chain_: str = "",
                  dsir_threshold: float = 0.0,
                  dsir_m: int = 0) -> dict:
    """PHASE 2: one partition (runs inside a Ray task)."""
    import pyarrow.parquet as pq

    from ..io.lineage import write_partition
    from .curation import make_filter_fn

    t0 = time.monotonic()
    base_filt = make_filter_fn(text_col, _parse_langs(languages),
                               min_quality)

    def filt(table: pa.Table) -> pa.Table:
        lines = _load_keys(droplines_path, droplines_chain_)
        grams = _load_keys(benchgrams_path, benchgrams_chain_)
        t = apply_prep(table, lines, grams, text_col, ngram, c4)
        if substr_k:
            t = apply_substr(t, _load_keys(dupgrams_path,
                                           dupgrams_chain_),
                             text_col, substr_k)
        if dsir_path:
            t = apply_dsir(t, dsir_path, dsir_chain_,
                           text_col=text_col,
                           threshold=dsir_threshold, m=dsir_m)
        return base_filt(t)

    drop = _load_keys(dropkeys_path, drop_chain)
    block = np.sort(pq.read_table(blocklist_path)
                    .column(blocklist_key).to_numpy(
                        zero_copy_only=False)) \
        if blocklist_path else np.empty(0, np.int64)

    outs, rows_in = [], 0
    for f in files:
        table = pq.read_table(f)
        rows_in += table.num_rows
        t = filt(table)
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        mask = np.ones(len(keys), dtype=bool)
        for ks in (drop, block):
            if len(ks):
                pos = np.clip(np.searchsorted(ks, keys), 0, len(ks) - 1)
                mask &= ks[pos] != keys
        outs.append(t.filter(pa.array(mask)))
    result = pa.concat_tables(outs) if outs else pa.table({})
    return write_partition(out_dir, pid, result, chain, rows_in,
                           input_desc=json.dumps(files), t_start=t0)


def cap_chain(part_chains: list, cap: int, source_col: str,
              key_col: str) -> str:
    from ..io.lineage import op_chain_hash
    return op_chain_hash(f"curation_cap:v1|cap:{cap}|src:{source_col}"
                         f"|key:{key_col}|parts:" + ",".join(part_chains))


def cap_done(out_dir: str, chain: str) -> bool:
    meta = os.path.join(out_dir, "_capped", "_meta.json")
    if not os.path.exists(meta):
        return False
    try:
        with open(meta) as f:
            return json.load(f).get("op_chain_hash") == chain
    except (OSError, ValueError):
        return False


def run_cap_phase(out_dir: str, chain: str, cap: int, source_col: str,
                  key_col: str) -> int:
    """PHASE 3 (optional): per-source quality cap over the completed
    phase-2 parts — a global top-k, so it runs as ONE resumable unit
    keyed by the hash of every part chain it consumed (any re-run part
    or changed cap invalidates it). Output under out_dir/_capped/."""
    import glob

    import pyarrow.parquet as pq
    import ray.data

    from ..ops.grouped import grouped_topk

    parts = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))
    ds = ray.data.read_parquet(parts)
    capped = grouped_topk(ds, source_col, "quality_score", cap,
                          tie_col=key_col)
    dest = os.path.join(out_dir, "_capped")
    os.makedirs(dest, exist_ok=True)
    for f in glob.glob(os.path.join(dest, "*.parquet")):
        os.remove(f)
    capped.write_parquet(dest)
    n = sum(pq.read_metadata(f).num_rows
            for f in glob.glob(os.path.join(dest, "*.parquet")))
    with open(os.path.join(dest, "_meta.json"), "w") as f:
        json.dump({"op_chain_hash": chain, "rows": int(n)}, f)
    return int(n)
