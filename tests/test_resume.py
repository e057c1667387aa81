"""Checkpoint/resume: partial run + restart → byte-identical output
(SURVEY.md §5.2 layer 3)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from geoflow.io.lineage import (is_partition_done, op_chain_hash,
                                read_lineage, write_partition)
from geoflow.io.synth import make_corpus_block


def _run(out_dir, partitions, chain, fail_after=None):
    """Simulated partitioned job: each partition extracts + writes."""
    import time
    from geoflow.extract import ExtractWkt
    done = 0
    for pid in range(partitions):
        if is_partition_done(out_dir, pid, chain):
            continue
        if fail_after is not None and done >= fail_after:
            raise RuntimeError("simulated crash")
        t0 = time.monotonic()
        block = make_corpus_block(pid, 200)
        out = ExtractWkt()(block.select(["url", "text"]))
        write_partition(out_dir, pid, out, chain, rows_in=block.num_rows,
                        input_desc=f"synth:block={pid}", t_start=t0)
        done += 1


def test_resume_byte_identical(tmp_path):
    chain = op_chain_hash("extract_wkt:v1")
    full = str(tmp_path / "full")
    resumed = str(tmp_path / "resumed")

    _run(full, 6, chain)

    # partial run crashes after 3 partitions, then resumes
    try:
        _run(resumed, 6, chain, fail_after=3)
    except RuntimeError:
        pass
    assert len(read_lineage(resumed)) == 3
    _run(resumed, 6, chain)

    for pid in range(6):
        a = pq.read_table(os.path.join(full, f"part-{pid:05d}.parquet"))
        b = pq.read_table(os.path.join(resumed, f"part-{pid:05d}.parquet"))
        assert a.equals(b)


def test_chain_hash_invalidates(tmp_path):
    out = str(tmp_path / "out")
    c1 = op_chain_hash("v1")
    _run(out, 2, c1)
    assert is_partition_done(out, 0, c1)
    assert not is_partition_done(out, 0, op_chain_hash("v2"))


def test_partition_chains_cover_files_and_count():
    """Changing the partition count or the input file set changes every
    affected partition's chain hash (the resume gate), so stale output is
    re-run, never silently skipped."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jobs.run_pipeline import partition_chains
    files = [f"/in/f{i}.parquet" for i in range(8)]
    g4, c4 = partition_chains(files, 4, 12, 2000)
    g4b, c4b = partition_chains(files, 4, 12, 2000)
    assert c4 == c4b and g4 == g4b          # deterministic
    _, c2 = partition_chains(files, 2, 12, 2000)
    assert set(c4).isdisjoint(c2)           # partition count in the hash
    _, c4x = partition_chains(files[:-1], 4, 12, 2000)
    assert c4 != c4x                        # file list in the hash
    _, c4z = partition_chains(files, 4, 13, 2000)
    assert set(c4).isdisjoint(c4z)          # op params in the hash


def test_lineage_records(tmp_path):
    out = str(tmp_path / "out")
    chain = op_chain_hash("v1")
    _run(out, 3, chain)
    recs = read_lineage(out)
    assert len(recs) == 3
    for r in recs:
        assert r["rows_in"] == 200
        assert r["rows_out"] > 0
        assert r["op_chain_hash"] == chain
        assert r["wall_ms"] >= 0
import os
def test_cleanup_orphans_with_gaps(tmp_path):
    from jobs.run_pipeline import cleanup_orphan_partitions
    out = tmp_path / "out"
    (out / "_lineage").mkdir(parents=True)
    for pid in (0, 1, 4, 9):   # gaps at 2-3 and 5-8
        (out / f"part-{pid:05d}.parquet").write_bytes(b"x")
        (out / "_lineage" / f"part-{pid:05d}.json").write_text("{}")
    cleanup_orphan_partitions(str(out), 2)
    kept = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    assert kept == ["part-00000.parquet", "part-00001.parquet"]
    kept_l = sorted(os.listdir(out / "_lineage"))
    assert kept_l == ["part-00000.json", "part-00001.json"]
