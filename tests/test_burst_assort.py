"""Token burstiness + degree assortativity."""

import numpy as np
import pyarrow as pa
import ray.data

from geoflow.graph.triangles import degree_assortativity
from geoflow.text.analysis import token_burstiness


def test_burstiness_known(ray_session):
    texts = ["a a a b", "a b b", "c"]
    ds = ray.data.from_arrow(pa.table({
        "text": pa.array(texts, pa.string())}))
    out = token_burstiness(ds).to_pandas().set_index("token")
    assert out.loc["a"].tolist() == [2, 4, 10]    # counts 3,1
    assert out.loc["b"].tolist() == [2, 3, 5]     # counts 1,2
    assert out.loc["c"].tolist() == [1, 1, 1]


def test_assortativity_star_vs_path(ray_session):
    # star K1,3: edges (0,1)(0,2)(0,3); degs: 3,1,1,1
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 0, 0, 1], pa.int64()),
        "dst": pa.array([1, 2, 3, 0], pa.int64())}))  # dup decoy
    out = degree_assortativity(ds).to_pandas()
    # pairs (3,1)x3 + (1,3)x3
    assert out.n_pairs.tolist() == [6]
    assert out.sum_x.tolist() == [12]      # 3*(3+1)
    assert out.sum_x2.tolist() == [30]     # 3*(9+1)
    assert out.sum_xy.tolist() == [18]     # 6*3
    # perfect disassortativity: r = -1
    n, sx, sx2, sxy = out.iloc[0]
    num = n * sxy - sx * sx
    den = n * sx2 - sx * sx
    assert num / den == -1.0
