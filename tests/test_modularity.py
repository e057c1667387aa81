"""Partition modularity (graph/modularity.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from geoflow.graph.modularity import modularity_counts


def _ds(tbl):
    return ray.data.from_arrow(tbl)


def _edges(pairs):
    s, d = zip(*pairs)
    return _ds(pa.table({"src": pa.array(s, pa.int64()),
                         "dst": pa.array(d, pa.int64())}))


def _labels(m):
    return _ds(pa.table({"node": pa.array(list(m), pa.int64()),
                         "label": pa.array(list(m.values()),
                                           pa.int64())}))


def test_two_cliques_bridge(ray_session):
    # K3 {0,1,2} + K3 {3,4,5} + bridge (2,3); perfect 2-community
    # labeling. m=7, per community: intra=3, dsum=7, nn=3.
    pairs = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    lab = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    out = modularity_counts(_edges(pairs), _labels(lab)).to_pandas() \
        .sort_values("label").reset_index(drop=True)
    assert out.label.tolist() == [0, 1]
    assert out.n_nodes.tolist() == [3, 3]
    assert out.intra_edges.tolist() == [3, 3]
    assert out.degree_sum.tolist() == [7, 7]
    assert out.m_edges.tolist() == [7, 7]
    assert out.q_num4m2.tolist() == [4 * 7 * 3 - 49] * 2
    q = out.q_num4m2.sum() / (4 * 49)
    assert q == pytest.approx(6 / 7 - 2 * (7 / 14) ** 2)


def test_dedup_selfloops_direction(ray_session):
    # duplicates, reversed duplicates and self-loops collapse
    pairs = [(0, 1), (1, 0), (0, 1), (2, 2), (1, 2)]
    lab = {0: 5, 1: 5, 2: 9}
    out = modularity_counts(_edges(pairs), _labels(lab)).to_pandas() \
        .sort_values("label").reset_index(drop=True)
    assert out.m_edges.tolist() == [2, 2]
    assert out.intra_edges.tolist() == [1, 0]
    assert out.degree_sum.tolist() == [3, 1]
    assert out.n_nodes.tolist() == [2, 1]


def test_singleton_partition_negative_q(ray_session):
    # every node its own community: intra=0 everywhere, Q < 0
    pairs = [(0, 1), (1, 2), (2, 0)]
    lab = {0: 0, 1: 1, 2: 2}
    out = modularity_counts(_edges(pairs), _labels(lab)).to_pandas()
    assert (out.intra_edges == 0).all()
    assert out.q_num4m2.sum() < 0


def test_missing_label_raises(ray_session):
    with pytest.raises(Exception):
        modularity_counts(_edges([(0, 1)]),
                          _labels({0: 0})).to_pandas()
