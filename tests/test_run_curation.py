"""Resumable curation job CLI (jobs/run_curation.py): phase-1 drop-set
checkpoint, per-partition resume with byte-identical output, and
equivalence with the library curate() pipeline."""

import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

JOBS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "jobs")


def _job_main(argv):
    sys.path.insert(0, JOBS)
    import run_curation
    old = sys.argv
    sys.argv = ["run_curation.py"] + argv
    try:
        run_curation.main()
    finally:
        sys.argv = old


def _corpus_files(tmp_path, n_files=4):
    sys.path.insert(0, os.path.dirname(JOBS))
    from tests.test_curation import _corpus
    t = _corpus()
    d = str(tmp_path / "corpus")
    os.makedirs(d, exist_ok=True)
    step = (t.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        pq.write_table(t.slice(i * step, step), f"{d}/f{i}.parquet")
    return d, t


class TestRunCuration:
    def test_run_resume_and_library_equivalence(self, ray_session,
                                                tmp_path, capsys):
        inp, t = _corpus_files(tmp_path)
        out = str(tmp_path / "out")
        args = ["--input", inp, "--output", out, "--partitions", "3"]

        _job_main(args)
        first = capsys.readouterr().out
        assert "3 to run (0 resumed" in first
        metrics = json.loads(first.strip().splitlines()[-1])
        assert metrics["partitions_run"] == 3

        # full resume: nothing re-runs, same totals
        _job_main(args)
        second = capsys.readouterr().out
        assert "0 to run (3 resumed" in second
        m2 = json.loads(second.strip().splitlines()[-1])
        assert m2["rows_out"] == metrics["rows_out"]
        assert "phase1: resumed" in second

        # output rows == library curate() on the same corpus
        import ray
        from geoflow.pipelines.curation import curate
        lib = curate(ray.data.from_arrow(t), languages=None,
                     min_quality=0.0, near_dup=True)
        lib_ids = sorted(r["doc_id"] for r in lib.take_all())
        got = pq.read_table(out).column("doc_id").to_pylist()
        assert sorted(got) == lib_ids == list(range(30))

    def test_partial_run_byte_identical(self, ray_session, tmp_path,
                                        capsys):
        """A run missing two partitions (as after a crash) re-runs
        exactly those and reproduces byte-identical part files."""
        inp, _ = _corpus_files(tmp_path)
        full = str(tmp_path / "full")
        resumed = str(tmp_path / "resumed")
        args = lambda o: ["--input", inp, "--output", o,
                          "--partitions", "4"]

        _job_main(args(full))
        _job_main(args(resumed))
        capsys.readouterr()

        # simulate the crash: partitions 1 and 3 never completed
        for pid in (1, 3):
            os.remove(os.path.join(resumed, f"part-{pid:05d}.parquet"))
            os.remove(os.path.join(resumed, "_lineage",
                                   f"part-{pid:05d}.json"))

        _job_main(args(resumed))
        outtxt = capsys.readouterr().out
        assert "2 to run (2 resumed from checkpoint" in outtxt
        assert "phase1: resumed" in outtxt

        for pid in range(4):
            p = f"part-{pid:05d}.parquet"
            fa, fb = os.path.join(full, p), os.path.join(resumed, p)
            with open(fa, "rb") as a, open(fb, "rb") as b:
                assert a.read() == b.read()

    def test_blocklist_and_param_invalidation(self, ray_session,
                                              tmp_path, capsys):
        inp, _ = _corpus_files(tmp_path)
        out = str(tmp_path / "out")
        blk = str(tmp_path / "block.parquet")
        pq.write_table(pa.table({"key": pa.array([7, 8], pa.int64())}),
                       blk)
        _job_main(["--input", inp, "--output", out, "--partitions", "2"])
        capsys.readouterr()
        # adding a blocklist invalidates phase 2 but NOT phase 1
        _job_main(["--input", inp, "--output", out, "--partitions", "2",
                   "--blocklist", blk, "--blocklist-key", "key"])
        txt = capsys.readouterr().out
        assert "phase1: resumed" in txt
        assert "2 to run (0 resumed" in txt
        ids = pq.read_table(out).column("doc_id").to_pylist()
        assert 7 not in ids and 8 not in ids and 9 in ids

    def test_cap_phase_and_partition_invariance(self, ray_session,
                                                tmp_path, capsys):
        import glob
        inp, t = _corpus_files(tmp_path)
        out2 = str(tmp_path / "p2")
        out4 = str(tmp_path / "p4")
        cap_args = ["--min-quality", "0.0", "--per-source-cap", "4"]
        _job_main(["--input", inp, "--output", out2,
                   "--partitions", "2"] + cap_args)
        first = capsys.readouterr().out
        assert "phase3: capped to" in first
        # resume: phase 3 skipped
        _job_main(["--input", inp, "--output", out2,
                   "--partitions", "2"] + cap_args)
        assert "phase3: resumed" in capsys.readouterr().out
        # changing the cap re-runs ONLY phase 3
        _job_main(["--input", inp, "--output", out2,
                   "--partitions", "2", "--min-quality", "0.0",
                   "--per-source-cap", "3"])
        txt = capsys.readouterr().out
        assert "0 to run (2 resumed" in txt and "phase3: capped" in txt

    def test_partition_count_invariance(self, ray_session, tmp_path,
                                        capsys):
        """Same input at --partitions 2 vs 4: identical curated row
        set (the drop set is global; partitioning is only layout)."""
        inp, _ = _corpus_files(tmp_path)
        rows = {}
        for nparts in (2, 4):
            out = str(tmp_path / f"n{nparts}")
            _job_main(["--input", inp, "--output", out,
                       "--partitions", str(nparts)])
            capsys.readouterr()
            rows[nparts] = sorted(
                pq.read_table(out).column("doc_id").to_pylist())
        assert rows[2] == rows[4] and len(rows[2]) == 30

    def test_prep_phases_resume_and_equivalence(self, ray_session,
                                                tmp_path, capsys):
        import pyarrow as pa
        docs = pa.table({
            "doc_id": pa.array(range(8), type=pa.int64()),
            "text": [
                "subscribe now\nreal body zero",
                "subscribe now\nreal body one",
                "subscribe now\nthe secret benchmark sentence is here",
                "subscribe now",
                "subscribe now\nreal body four",
                "subscribe now\nreal body five",
                "subscribe now\nreal body zero",   # dup of doc 0
                "subscribe now\nanother clean body",
            ],
        })
        inp = str(tmp_path / "corpus")
        os.makedirs(inp, exist_ok=True)
        pq.write_table(docs.slice(0, 4), inp + "/f0.parquet")
        pq.write_table(docs.slice(4, 4), inp + "/f1.parquet")
        bench_dir = str(tmp_path / "bench")
        os.makedirs(bench_dir, exist_ok=True)
        pq.write_table(pa.table({
            "doc_id": pa.array([99], type=pa.int64()),
            "text": ["well the secret benchmark sentence is here"],
        }), bench_dir + "/b.parquet")

        out = str(tmp_path / "out")
        args = ["--input", inp, "--output", out, "--partitions", "2",
                "--no-neardup", "--line-dedup-min-docs", "3",
                "--benchmark", bench_dir, "--decontam-ngram", "5"]
        _job_main(args)
        first = capsys.readouterr().out
        assert "phase0a: computed" in first
        assert "phase0b: computed" in first
        got = pq.read_table(out)
        rows = {r["doc_id"]: r["text"] for r in got.to_pylist()}
        # min_docs=3: only 'subscribe now' (8 docs) strips — the
        # 2-doc 'real body zero' line survives; doc 2 contaminated;
        # doc 3 emptied by the strip; doc 6 an exact dup of doc 0
        # AFTER stripping (min key 0 wins)
        assert sorted(rows) == [0, 1, 4, 5, 7]
        assert rows[0] == "real body zero"

        # everything resumes
        _job_main(args)
        second = capsys.readouterr().out
        assert "phase0a: resumed" in second
        assert "phase0b: resumed" in second
        assert "phase1: resumed" in second
        assert "0 to run (2 resumed" in second

        # changing the benchmark invalidates 0b + phase1 + partitions
        # chains cover the input FILE LIST (immutable-input
        # contract, as for the corpus): swap the benchmark by name
        os.remove(bench_dir + "/b.parquet")
        pq.write_table(pa.table({
            "doc_id": pa.array([99], type=pa.int64()),
            "text": ["completely unrelated benchmark content this "
                     "time around honestly"],
        }), bench_dir + "/b2.parquet")
        _job_main(args)
        third = capsys.readouterr().out
        assert "phase0b: computed" in third
        assert "phase0a: resumed" in third
        assert "2 to run (0 resumed" in third
        rows3 = sorted(pq.read_table(out).column("doc_id").to_pylist())
        assert rows3 == [0, 1, 2, 4, 5, 7]  # doc 2 no longer dirty

        # library equivalence on the final configuration
        import ray
        from geoflow.pipelines.curation import curate
        bench_t = pq.read_table(bench_dir + "/b2.parquet")
        lib = curate(ray.data.from_arrow(docs), languages=None,
                     min_quality=0.0, near_dup=False,
                     line_dedup_min_docs=3,
                     decontam_ds=ray.data.from_arrow(bench_t),
                     decontam_ngram=5)
        lib_ids = sorted(r["doc_id"] for r in lib.take_all())
        assert rows3 == lib_ids

    def test_substr_dedup_phase(self, ray_session, tmp_path, capsys):
        import pyarrow as pa
        docs = pa.table({
            "doc_id": pa.array(range(5), type=pa.int64()),
            "text": [
                "Alpha Beta Gamma Delta Epsilon unique zero words",
                "one prefix Alpha Beta Gamma Delta Epsilon tail",
                "Alpha Beta Gamma Delta Epsilon",   # only the phrase
                "independent text three with plenty tokens",
                "another body four",
            ],
        })
        inp = str(tmp_path / "corpus")
        os.makedirs(inp, exist_ok=True)
        pq.write_table(docs.slice(0, 3), inp + "/f0.parquet")
        pq.write_table(docs.slice(3, 2), inp + "/f1.parquet")
        out = str(tmp_path / "out")
        args = ["--input", inp, "--output", out, "--partitions", "2",
                "--no-neardup", "--substr-dedup-k", "5"]
        _job_main(args)
        first = capsys.readouterr().out
        assert "phase0c: computed" in first
        rows = {r["doc_id"]: r["text"]
                for r in pq.read_table(out).to_pylist()}
        # the shared 5-token phrase strips from ALL its occurrences
        # (original spelling preserved); doc 2 empties and is dropped
        assert rows == {0: "unique zero words",
                        1: "one prefix tail",
                        3: "independent text three with plenty tokens",
                        4: "another body four"}

        # full resume
        _job_main(args)
        second = capsys.readouterr().out
        assert "phase0c: resumed" in second
        assert "phase1: resumed" in second
        assert "0 to run (2 resumed" in second

        # changing k invalidates the artifact, phase 1 and partitions
        args_k4 = args[:-1] + ["4"]
        _job_main(args_k4)
        third = capsys.readouterr().out
        assert "phase0c: computed" in third
        assert "2 to run (0 resumed" in third

    def test_c4_prep_flag(self, ray_session, tmp_path, capsys):
        import pyarrow as pa
        docs = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": [
                "Good first sentence with enough words.\n"
                "nav junk\n"
                "Another proper sentence that is kept!\n"
                "Third proper sentence keeps the page alive.",
                "Page with a curly { bracket dies entirely.\n"
                "Another proper sentence that is kept!\n"
                "Third proper sentence keeps the page alive.",
                "Good first sentence with enough words.\n"
                "Another proper sentence that is kept!\n"
                "Third proper sentence keeps the page alive.",
                "Good first sentence with enough words.\n"
                "Another proper sentence that is kept!\n"
                "Third proper sentence keeps the page alive.",
            ],
        })
        inp = str(tmp_path / "corpus")
        os.makedirs(inp, exist_ok=True)
        pq.write_table(docs.slice(0, 2), inp + "/f0.parquet")
        pq.write_table(docs.slice(2, 2), inp + "/f1.parquet")
        out = str(tmp_path / "out")
        args = ["--input", inp, "--output", out, "--partitions", "2",
                "--no-neardup", "--c4"]
        _job_main(args)
        capsys.readouterr()
        rows = {r["doc_id"]: r["text"]
                for r in pq.read_table(out).to_pylist()}
        clean = ("Good first sentence with enough words.\n"
                 "Another proper sentence that is kept!\n"
                 "Third proper sentence keeps the page alive.")
        # doc 1 page-dropped (curly); docs 0/2/3 identical after the
        # line strip -> exact dedup keeps min key 0
        assert rows == {0: clean}

        # resume, then flipping the flag invalidates phase 1+2
        _job_main(args)
        assert "phase1: resumed" in capsys.readouterr().out
        _job_main(args[:-1])
        third = capsys.readouterr().out
        assert "phase1: computed" in third
        assert "2 to run (0 resumed" in third

    def test_dsir_phase(self, ray_session, tmp_path, capsys):
        import pyarrow as pa
        texts_by_c = [" ".join([f"aa{j}" for j in range(c)]
                               + [f"bb{j}" for j in range(c, 10)])
                      for c in range(11)]
        docs = pa.table({
            "doc_id": pa.array(range(22), type=pa.int64()),
            "text": [texts_by_c[i % 11] for i in range(22)],
        })
        inp = str(tmp_path / "corpus")
        os.makedirs(inp, exist_ok=True)
        pq.write_table(docs.slice(0, 11), inp + "/f0.parquet")
        pq.write_table(docs.slice(11, 11), inp + "/f1.parquet")
        tgt = str(tmp_path / "target")
        os.makedirs(tgt, exist_ok=True)
        pq.write_table(pa.table({
            "doc_id": pa.array(range(5), type=pa.int64()),
            "text": [" ".join(f"aa{j}" for j in range(10))] * 5,
        }), tgt + "/t0.parquet")
        out = str(tmp_path / "out")
        args = ["--input", inp, "--output", out, "--partitions", "2",
                "--no-neardup", "--dsir-target", tgt]
        _job_main(args)
        first = capsys.readouterr().out
        assert "phase0d: computed" in first
        kept = sorted(r["doc_id"] for r in pq.read_table(out).to_pylist())
        # weight is monotone in c = doc_id % 11 with ~unit-nat gaps:
        # only the most target-like classes pass threshold 0 (and the
        # exact dedup keeps the first copy of each class)
        assert kept, "dsir dropped everything"
        cs = sorted({k % 11 for k in kept})
        assert min(cs) >= 7  # only high-target-fraction classes survive
        assert all(c >= min(cs) for c in cs)
        # library parity: same selection via dsir_weights threshold
        import ray

        from geoflow.text import dsir_resample
        lib = dsir_resample(
            ray.data.from_arrow(docs),
            ray.data.from_arrow(pq.read_table(tgt + "/t0.parquet")),
            threshold=0.0).take_all()
        lib_classes = sorted({r["doc_id"] % 11 for r in lib})
        assert lib_classes == cs

        # resume: artifact + phases all cached
        _job_main(args)
        second = capsys.readouterr().out
        assert "phase0d: resumed" in second
        assert "0 to run (2 resumed" in second

        # threshold change invalidates phase 1/2 but NOT the artifact
        _job_main(args + ["--dsir-threshold", "5.0"])
        third = capsys.readouterr().out
        assert "phase0d: resumed" in third
        assert "2 to run (0 resumed" in third
