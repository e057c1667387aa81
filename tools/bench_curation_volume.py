"""Volume validation of the FULL resumable curation job (all phase-0
artifacts: C4 + line dedup + decontamination + ExactSubstr + DSIR,
then the LSH near-dup drop set and per-partition apply).

Generates a multi-line keyed corpus purpose-built so every stage does
real work at volume — boilerplate lines shared across ~1/50 of docs,
near-dup text families, a quality/language mix, per-doc sentence
structure that C4's line rules actually cut — then runs
jobs/run_curation.py twice (cold + resume) and prints wall times.

Usage: python tools/bench_curation_volume.py [rows] [out_dir]
(defaults 800_000 rows, /tmp/geoflow_vol). Owns its Ray session.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa


_BOILER = ("This standard license boilerplate paragraph is repeated "
           "verbatim across a fifth of the corpus and therefore gets "
           "stripped by the exact substring deduplication phase.")


def make_block(block_id: int, rows: int) -> pa.Table:
    """Every stage does real work AND a predictable majority survives:
    - shared header/promo/closing lines → line dedup drops them;
    - 'nav home menu' / javascript lines → C4 line rules drop them;
    - two per-DOC-unique body sentences → each doc keeps content;
    - a fixed >=k-token boilerplate paragraph in 1/5 of docs → the
      ExactSubstr phase strips it (from all occurrences, documented
      substrdedup semantics) without emptying the doc;
    - docs with i%10 in {7,8,9} use the FAMILY id in their body text →
      3-doc near-dup families for the LSH drop set (expect ~2/3 of
      that 30% dropped, i.e. rows_out ≈ 0.8 * rows)."""
    vocab = [f"w{v:03d}" for v in range(997)]
    base = block_id * rows
    ids = np.arange(base, base + rows, dtype=np.int64)
    # Body-sentence token indices, splitmix64-mixed (public domain —
    # same scheme as geoflow's deterministic hashing). Any POLYNOMIAL
    # mix mod 997 has algebraic structure (global shift cycles /
    # mirror marks) that makes unrelated docs share long token runs —
    # the first two corpus attempts died exactly that way; a bit mix
    # has no such structure.
    fam = ids - (ids % 10) + 7
    mark = np.where(ids % 10 >= 7, fam, ids).astype(np.uint64)
    j1 = np.arange(18, dtype=np.uint64)[None, :]
    j2 = np.arange(16, dtype=np.uint64)[None, :]

    def mix(v):
        v = (v + np.uint64(0x9E3779B97F4A7C15))
        v ^= v >> np.uint64(30)
        v *= np.uint64(0xBF58476D1CE4E5B9)
        v ^= v >> np.uint64(27)
        v *= np.uint64(0x94D049BB133111EB)
        v ^= v >> np.uint64(31)
        return v

    with np.errstate(over="ignore"):
        idx1 = mix(mark[:, None] * np.uint64(64) + j1) % np.uint64(997)
        idx2 = mix(mark[:, None] * np.uint64(64) + np.uint64(32) + j2) \
            % np.uint64(997)
    texts = []
    for r, i in enumerate(ids):
        i = int(i)
        # One doc-UNIQUE token per sentence (a11 / b3) keeps every
        # family-shared token run <= 14 < k=15 (so ExactSubstr can't
        # gut the families before LSH) while family 5-shingle Jaccard
        # stays ~0.57 (96% recall at the 32x4 band curve).
        t1 = [vocab[v] for v in idx1[r]]
        t1[11] = f"u{i}x0"
        t2 = [vocab[v] for v in idx2[r]]
        t2[3] = f"u{i}x1"
        s1 = " ".join(t1)
        s2 = " ".join(t2)
        lines = [
            f"Header sentence number {i % 50} is definitely long "
            "enough to keep.",
            "nav home menu",  # C4 drops: no terminal punctuation
            f"Topic {s1} ends here.",
            f"Also {s2} closes now.",
            f"promo footer shared across documents {i % 50}.",
            f"A closing remark number {i % 7} finishes the page "
            "properly.",
        ]
        if i % 5 == 0:
            # boilerplate EMBEDDED in a per-doc-unique line: line dedup
            # can't drop it (unique line), so the ExactSubstr phase has
            # real duplicated >=15-token windows to strip
            lines.insert(4, f"Note n{i} says: {_BOILER}")
        if i % 31 == 0:
            lines.insert(2, "Please enable javascript to view maps.")
        texts.append("\n".join(lines))
    return pa.table({
        "doc_id": pa.array(ids),
        "text": pa.array(texts, type=pa.string()),
    })


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/geoflow_vol"
    corpus = os.path.join(out, "corpus")
    target = os.path.join(out, "target")
    jobout = os.path.join(out, "job_out")
    if not os.path.exists(os.path.join(corpus, "_DONE")):
        import pyarrow.parquet as pq
        os.makedirs(corpus, exist_ok=True)
        n_files = 200
        per = rows // n_files
        for b in range(n_files):
            pq.write_table(make_block(b, per),
                           os.path.join(corpus, f"f{b:04d}.parquet"))
        os.makedirs(target, exist_ok=True)
        pq.write_table(pa.table({
            "doc_id": pa.array(np.arange(50, dtype=np.int64)),
            "text": pa.array([
                f"Body sentence about topic {z} with unique marker "
                f"m{z} and several more filler words here."
                for z in range(50)], type=pa.string())}), os.path.join(
                target, "t0.parquet"))
        with open(os.path.join(corpus, "_DONE"), "w") as f:
            f.write("ok")

    args = [sys.executable, "jobs/run_curation.py",
            "--input", corpus, "--output", jobout,
            "--partitions", "64", "--languages", "",
            "--min-quality", "0.0",
            "--c4", "--line-dedup-min-docs", "1000",
            "--substr-dedup-k", "15",
            "--dsir-target", target, "--dsir-threshold", "-1000000"]
    for label in ("cold", "resume"):
        t0 = time.monotonic()
        r = subprocess.run(args, capture_output=True, text=True,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        dt = time.monotonic() - t0
        tail = [l for l in r.stdout.splitlines() if l.strip()][-6:]
        print(f"--- {label}: {dt:.1f}s rc={r.returncode}")
        print("\n".join(tail))
        if r.returncode:
            print(r.stderr[-2000:])
            sys.exit(1)
    print(json.dumps({"metric": "curation_volume_full_phases",
                      "rows": rows, "unit": "see stdout"}))


if __name__ == "__main__":
    main()
