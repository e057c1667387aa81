"""Phrase matching: scan path (text/phrase.py) and positional-index
path (text/invindex.py). Driver gates: `phrase_match`,
`indexed_phrase` vs the LATERAL-window SQL; here: overlap semantics,
doc boundaries, duplicate-token phrases, path equality."""

import numpy as np
import pyarrow as pa
import ray.data


def _corpus():
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "batch batch batch stream",      # 2 overlapping hits
            "Merge slow! merge SLOW merge",  # case-fold: 2 hits
            "merge fast slow merge",         # 0 (not adjacent)
            "slow merge",                    # 0 (wrong order)
        ])}))


def test_phrase_counts_overlap_and_case(ray_session):
    from geoflow.text.phrase import phrase_counts
    out = phrase_counts(_corpus(), "batch batch").to_pandas()
    assert dict(zip(out.doc_id, out.n_hits)) == {0: 2}
    out = phrase_counts(_corpus(), "merge slow").to_pandas()
    assert dict(zip(out.doc_id, out.n_hits)) == {1: 2}


def test_phrase_never_crosses_doc_boundary(ray_session):
    from geoflow.text.phrase import phrase_counts
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["alpha beta", "beta alpha"])}))
    # 'beta beta' spans the two docs in the flat token stream only
    out = phrase_counts(ds, "beta beta").to_pandas()
    assert len(out) == 0


def test_positional_index_matches_scan(ray_session, tmp_path):
    from geoflow.text.invindex import (build_positional_index,
                                       search_phrase_index)
    from geoflow.text.phrase import phrase_counts
    idx = str(tmp_path / "pidx")
    build_positional_index(_corpus(), idx, n_buckets=4)
    for ph in ("merge slow", "batch batch", "batch batch batch"):
        a = phrase_counts(_corpus(), ph).to_pandas()
        b = search_phrase_index(idx, ph).to_pandas()
        assert dict(zip(a.doc_id, a.n_hits)) == \
            dict(zip(b.doc_id, b.n_hits)), ph
