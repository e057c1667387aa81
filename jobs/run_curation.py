"""Resumable corpus-curation job — `ray job submit` entry point.

    ray job submit -- python jobs/run_curation.py \
        --input /data/corpus --output /data/curated \
        --partitions 64 --languages en,de --min-quality 0.6

Two checkpointed phases (north_rule: "resumable from checkpoint with
per-partition lineage + metrics"):

  PHASE 1 — drop-key set (global, checkpointed once). The LSH near-dup
  loser keys (or, with --no-neardup, the exact-duplicate non-winner
  keys) over the FILTERED corpus are computed distributed
  (pipelines/curation.neardup_loser_keys / text/dedup.
  exact_dup_loser_keys — 16-byte shuffle rows, payload never shuffles)
  and written to `out/_state/dropkeys.parquet` with a chain-hash
  record. A re-run whose params + input file list hash to the same
  chain SKIPS the phase entirely. The key set is driver-uniquified at
  write (documented bound: 8 B/dropped-doc — the same bound phase 2's
  per-task load implies; corpora beyond it should run the library
  `curate(filter_mode="join")` as one non-checkpointed pass instead).

  PHASE 2 — per-partition apply (embarrassingly parallel, resumable
  per partition). Each partition reads its file group, applies the
  SAME filter kernel (pipelines/curation.make_filter_fn — bit-identical
  semantics to curate()), drops dropkeys + optional blocklist keys
  (sorted-array searchsorted, loaded once per worker process via a
  module cache), and writes part-N.parquet + _lineage/part-N.json
  atomically. The partition chain hash covers params + phase-1 chain +
  the exact file group, so changing any input or knob re-runs exactly
  the affected partitions; a killed job resumes where it stopped with
  byte-identical output (deterministic kernels).

  PHASE 3 (optional, --per-source-cap N) — per-source quality cap.
  A global top-k over the final parts, so it is ONE resumable unit
  whose chain hash covers every part chain it consumed plus the cap
  params: any re-run partition or changed knob re-runs it, otherwise
  it resumes. Output parquet under out/_capped/ (the uncapped parts
  remain the canonical per-partition output).

  PHASE 0 (optional prep, each artifact checkpointed + chain-hashed
  like dropkeys): --c4 stateless C4 page cleaning (first, no
  artifact), 0a repeated-line drop set (--line-dedup-min-docs), 0b
  benchmark decontamination grams (--benchmark), 0c duplicated
  k-token-window set for ExactSubstr substring dedup
  (--substr-dedup-k; counted over c4/0a/0b-applied text, so its chain
  embeds theirs), 0d DSIR importance-selection log-ratio table
  (--dsir-target/--dsir-threshold/--dsir-m; raw model counted over
  fully prep-applied text). Phases 1 and 2 apply them in that order
  before the language/quality filter.

Worker-side logic lives in geoflow/pipelines/curation_job.py (the
package is importable on Ray workers; this file is the thin CLI).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="corpus parquet dir")
    ap.add_argument("--output", required=True, help="output dir")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--parallel", type=int, default=0)
    ap.add_argument("--languages", default="",
                    help="comma-separated lang_pred keep-set; empty = no filter")
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument("--no-neardup", action="store_true",
                    help="exact-dup drop set instead of LSH near-dup")
    ap.add_argument("--blocklist", default="",
                    help="parquet file of keys to drop")
    ap.add_argument("--blocklist-key", default="key")
    ap.add_argument("--key-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--per-source-cap", type=int, default=0,
                    help="phase 3: keep the k best-quality docs per "
                         "source (0 = skip); output under _capped/")
    ap.add_argument("--source-col", default="source")
    ap.add_argument("--line-dedup-min-docs", type=int, default=0,
                    help="phase 0a: strip lines repeated across >= N "
                         "docs before everything else (0 = skip)")
    ap.add_argument("--benchmark", default="",
                    help="phase 0b: parquet dir of benchmark docs; "
                         "documents sharing any --decontam-ngram-gram "
                         "are dropped")
    ap.add_argument("--decontam-ngram", type=int, default=13)
    ap.add_argument("--c4", action="store_true",
                    help="phase 0 prep: C4 heuristic page/line "
                         "cleaning (text/c4.py), applied before every "
                         "other stage")
    ap.add_argument("--dsir-target", default="",
                    help="phase 0d: DSIR importance selection (Xie et "
                         "al. 2023) — directory of target-corpus "
                         "parquet; docs below --dsir-threshold log "
                         "weight are dropped")
    ap.add_argument("--dsir-threshold", type=float, default=0.0)
    ap.add_argument("--dsir-m", type=int, default=0,
                    help="hashed feature buckets (0 = exact vocab)")
    ap.add_argument("--substr-dedup-k", type=int, default=0,
                    help="phase 0c: ExactSubstr — strip every k-token "
                         "window duplicated anywhere in the (prep-"
                         "applied) corpus (0 = skip)")
    args = ap.parse_args()

    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)

    from geoflow.io.lineage import (is_partition_done, op_chain_hash,
                                    read_lineage)
    from geoflow.pipelines import curation_job as cj

    files = sorted(os.path.join(args.input, f)
                   for f in os.listdir(args.input)
                   if f.endswith(".parquet"))
    state_dir = os.path.join(args.output, "_state")
    t_start = time.monotonic()

    # PHASE 0a (optional): repeated-line drop set
    dl_path = dl_chain = ""
    if args.line_dedup_min_docs > 0:
        dl_chain = cj.droplines_chain(
            files, text_col=args.text_col,
            min_docs=args.line_dedup_min_docs, c4=args.c4)
        dl_path = os.path.join(state_dir, "droplines.parquet")
        if cj.state_done(state_dir, "droplines", dl_chain):
            print("phase0a: resumed drop-line set from checkpoint")
        else:
            n = cj.compute_drop_lines(
                files, state_dir, dl_chain, text_col=args.text_col,
                min_docs=args.line_dedup_min_docs, c4=args.c4)
            print(f"phase0a: computed {n} drop-line hashes")

    # PHASE 0b (optional): benchmark decontamination gram set
    bg_path = bg_chain = ""
    if args.benchmark:
        bench_files = sorted(
            os.path.join(args.benchmark, f)
            for f in os.listdir(args.benchmark)
            if f.endswith(".parquet"))
        bg_chain = cj.benchgrams_chain(bench_files,
                                       text_col=args.text_col,
                                       ngram=args.decontam_ngram)
        bg_path = os.path.join(state_dir, "benchgrams.parquet")
        if cj.state_done(state_dir, "benchgrams", bg_chain):
            print("phase0b: resumed benchmark grams from checkpoint")
        else:
            n = cj.compute_bench_grams(
                bench_files, state_dir, bg_chain,
                text_col=args.text_col, ngram=args.decontam_ngram)
            print(f"phase0b: computed {n} benchmark gram hashes")

    # PHASE 0c (optional): duplicated-window (ExactSubstr) gram set —
    # counted over prep-applied text, so it runs after 0a/0b and its
    # chain embeds theirs
    dg_path = dg_chain = ""
    if args.substr_dedup_k > 0:
        dg_chain = cj.dupgrams_chain(
            files, text_col=args.text_col, k=args.substr_dedup_k,
            prep=f"{dl_chain or '-'}:{bg_chain or '-'}"
                 f":{args.decontam_ngram}:c4={int(args.c4)}")
        dg_path = os.path.join(state_dir, "dupgrams.parquet")
        if cj.state_done(state_dir, "dupgrams", dg_chain):
            print("phase0c: resumed dup-gram set from checkpoint")
        else:
            n = cj.compute_dup_grams(
                files, state_dir, dg_chain, text_col=args.text_col,
                k=args.substr_dedup_k, droplines_path=dl_path,
                droplines_chain_=dl_chain, benchgrams_path=bg_path,
                benchgrams_chain_=bg_chain, ngram=args.decontam_ngram,
                c4=args.c4)
            print(f"phase0c: computed {n} duplicated-window hashes")

    # PHASE 0d (optional): DSIR log-ratio artifact — raw counts run
    # over fully prep-applied text, so it is LAST in the prep chain
    dr_path = dr_chain = ""
    if args.dsir_target:
        tgt_files = sorted(os.path.join(args.dsir_target, f)
                           for f in os.listdir(args.dsir_target)
                           if f.endswith(".parquet"))
        dr_chain = cj.dsirratio_chain(
            files, tgt_files, text_col=args.text_col, m=args.dsir_m,
            prep=f"{dl_chain or '-'}:{bg_chain or '-'}"
                 f":{args.decontam_ngram}:{dg_chain or '-'}"
                 f":{args.substr_dedup_k}:c4={int(args.c4)}")
        dr_path = os.path.join(state_dir, "dsirratio.parquet")
        if cj.state_done(state_dir, "dsirratio", dr_chain):
            print("phase0d: resumed DSIR ratio artifact from checkpoint")
        else:
            n = cj.compute_dsir_ratio(
                files, tgt_files, state_dir, dr_chain,
                text_col=args.text_col, m=args.dsir_m,
                droplines_path=dl_path, droplines_chain_=dl_chain,
                benchgrams_path=bg_path, benchgrams_chain_=bg_chain,
                dupgrams_path=dg_path, dupgrams_chain_=dg_chain,
                substr_k=args.substr_dedup_k,
                ngram=args.decontam_ngram, c4=args.c4)
            print(f"phase0d: computed DSIR ratios over {n} features")

    prep_sig = (f"{dl_chain or '-'}:{bg_chain or '-'}"
                f":{args.decontam_ngram}:{dg_chain or '-'}"
                f":{args.substr_dedup_k}:c4={int(args.c4)}"
                f":dsir={dr_chain or '-'}:{args.dsir_threshold}"
                f":{args.dsir_m}")
    params = dict(neardup=not args.no_neardup, languages=args.languages,
                  min_quality=args.min_quality, key_col=args.key_col,
                  text_col=args.text_col)
    prep_kw = dict(droplines_path=dl_path, droplines_chain_=dl_chain,
                   benchgrams_path=bg_path, benchgrams_chain_=bg_chain,
                   ngram=args.decontam_ngram, dupgrams_path=dg_path,
                   dupgrams_chain_=dg_chain,
                   substr_k=args.substr_dedup_k, c4=args.c4,
                   dsir_path=dr_path, dsir_chain_=dr_chain,
                   dsir_threshold=args.dsir_threshold,
                   dsir_m=args.dsir_m)
    p1 = cj.phase1_chain(files, prep=prep_sig, **params)
    if cj.dropkeys_done(state_dir, p1):
        with open(os.path.join(state_dir, "dropkeys.json")) as f:
            n_drop = json.load(f)["n_keys"]
        print(f"phase1: resumed from checkpoint ({n_drop} drop keys)")
    else:
        n_drop = cj.compute_drop_keys(files, state_dir, p1, **params,
                                      **prep_kw)
        print(f"phase1: computed {n_drop} drop keys")
    p1_wall = time.monotonic() - t_start

    groups = [files[i::args.partitions] for i in range(args.partitions)]
    chains = [op_chain_hash(
        f"curation_apply:v1|p1:{p1}|prep:{prep_sig}"
        f"|blk:{args.blocklist}:"
        f"{args.blocklist_key}|nparts:{args.partitions}"
        "|files:" + ",".join(grp)) for grp in groups]

    # orphan cleanup mirrors run_pipeline (pid >= partitions)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from run_pipeline import cleanup_orphan_partitions
    cleanup_orphan_partitions(args.output, args.partitions)

    todo = [(pid, grp) for pid, grp in enumerate(groups)
            if grp and not is_partition_done(args.output, pid,
                                             chains[pid])]
    print(f"partitions: {args.partitions} total, {len(todo)} to run "
          f"({args.partitions - len(todo)} resumed from checkpoint)")

    dk_path = os.path.join(state_dir, "dropkeys.parquet")
    task = ray.remote(num_cpus=1)(cj.run_partition)
    max_parallel = args.parallel or int(
        ray.cluster_resources().get("CPU", 8))

    pending = []
    for pid, grp in todo:
        pending.append(task.remote(
            pid, grp, args.output, chains[pid], dk_path, p1,
            args.blocklist, args.blocklist_key, args.key_col,
            args.text_col, args.languages, args.min_quality,
            dl_path, dl_chain, bg_path, bg_chain,
            args.decontam_ngram, dg_path, dg_chain,
            args.substr_dedup_k, args.c4, dr_path, dr_chain,
            args.dsir_threshold, args.dsir_m))
        if len(pending) >= max_parallel:
            ready, pending = ray.wait(pending, num_returns=1)
            ray.get(ready)
    ray.get(pending)

    cap_rows = None
    if args.per_source_cap > 0:
        c3 = cj.cap_chain([chains[pid] for pid in range(args.partitions)],
                          args.per_source_cap, args.source_col,
                          args.key_col)
        if cj.cap_done(args.output, c3):
            print("phase3: resumed from checkpoint")
        else:
            cap_rows = cj.run_cap_phase(args.output, c3,
                                        args.per_source_cap,
                                        args.source_col, args.key_col)
            print(f"phase3: capped to {cap_rows} rows")

    recs = read_lineage(args.output)
    wall = time.monotonic() - t_start
    run_pids = {pid for pid, _ in todo}
    rows_this_run = sum(r["rows_in"] for r in recs
                        if r["partition"] in run_pids)
    print(json.dumps({
        "partitions_run": len(todo), "partitions_total": len(recs),
        "drop_keys": n_drop, "phase1_wall_s": round(p1_wall, 2),
        "rows_in": sum(r["rows_in"] for r in recs),
        "rows_out": sum(r["rows_out"] for r in recs),
        "wall_s": round(wall, 2),
        "rows_per_sec": round(rows_this_run / wall, 1)
        if wall > 0.01 and rows_this_run else None,
    }))


if __name__ == "__main__":
    main()
