"""HRW rendezvous sharding (ops/sampling.py)."""

import numpy as np




def test_hrw_minimal_disruption():
    from geoflow.ops.sampling import hrw_shard
    k = np.arange(5000, dtype=np.int64)
    a = hrw_shard(k, 12)
    b = hrw_shard(k, 11)  # shard 11 removed
    moved = a != b
    # exactly the keys that lived on the removed shard move
    assert (moved == (a == 11)).all()
    # and they scatter across the survivors roughly uniformly
    assert len(np.unique(b[moved])) == 11


def test_hrw_balance_and_salt():
    from geoflow.ops.sampling import hrw_shard
    k = np.arange(80000, dtype=np.int64)
    a = hrw_shard(k, 8)
    counts = np.bincount(a, minlength=8)
    assert counts.min() > 0.9 * len(k) / 8
    assert counts.max() < 1.1 * len(k) / 8
    assert (hrw_shard(k, 8, salt=1) != a).mean() > 0.5
