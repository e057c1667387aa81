"""Crossover evidence for the MinHash-LSH collision-bucket prefilter
(round-2 VERDICT: near_dup's multi-pass prefilter doubled its toy-scale
time; this must amortize at real scale).

Generates a seeded synthetic doc corpus (unique-token text + 10%
planted exact dups) at two scales — toy (sf0.1-like, 5k docs) and
sf≥1 (50k+ docs) — and times lsh_band_pairs with the prefilter
(scale-safe multi-pass) vs without (the round-1 single-pass
groupby-all-buckets shape). Run:

    python tools/bench_lsh_scale.py [n_docs ...]       # default 5000 50000 200000

One JSON line per scale: {"n_docs": N, "prefilter_s": x,
"single_pass_s": y, "ratio": y/x}. ratio > 1 ⇒ prefilter wins.
Results recorded in BENCH/BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def make_docs(n):
    import ray
    rng_tokens = 20

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = [" ".join(f"w{i}x{j}" for j in range(rng_tokens))
                 for i in ids]
        sel = np.nonzero(ids % 10 == 0)[0]
        return pa.table({
            "doc_id": pa.array(np.concatenate([ids, ids[sel] + 10**9])),
            "text": pa.array(texts + [texts[i] for i in sel],
                             type=pa.string())})

    base = ray.data.range(n).map_batches(
        lambda b: pa.table({"doc_id": b["id"]}), batch_format="numpy")
    return base.map_batches(gen, batch_format="pyarrow")


def run(n_docs):
    import ray
    from geoflow.text import MinHasher
    from geoflow.text.dedup import lsh_band_pairs
    sigs = make_docs(n_docs).map_batches(
        MinHasher(), batch_format="pyarrow", concurrency=4).materialize()
    out = {}
    for label, pref in (("prefilter_s", True), ("single_pass_s", False)):
        t0 = time.monotonic()
        pairs = lsh_band_pairs(sigs, key_col="doc_id", prefilter=pref)
        n_pairs = pairs.count()
        out[label] = round(time.monotonic() - t0, 3)
        out.setdefault("n_pairs", n_pairs)
        assert n_pairs >= n_docs // 10   # planted dups recovered
    # pair-free drop set (lsh_loser_keys): the representative-dedup
    # path — must stay linear in n and beat the pair pipelines
    from geoflow.text.dedup import lsh_loser_keys
    t0 = time.monotonic()
    losers = lsh_loser_keys(sigs, key_col="doc_id")
    uniq = len(np.unique(np.concatenate(
        [b.column("loser").to_numpy(zero_copy_only=False)
         for b in losers.iter_batches(batch_format="pyarrow")]
        or [np.empty(0, np.int64)])))
    out["loser_keys_s"] = round(time.monotonic() - t0, 3)
    assert uniq >= n_docs // 10
    out["n_losers"] = uniq
    out["n_docs"] = n_docs
    out["ratio_single_over_prefilter"] = round(
        out["single_pass_s"] / out["prefilter_s"], 3)
    return out


def main():
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)
    scales = [int(a) for a in sys.argv[1:]] or [5000, 50000, 200000]
    for n in scales:
        print(json.dumps(run(n)))
    ray.shutdown()


if __name__ == "__main__":
    main()
