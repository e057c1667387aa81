"""Unit edges for session-4 tail operators (oracle-gated at two
scales in __ray_entry__; these pin the kernel semantics directly)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def test_gini_sorted_identity():
    # Σ|xi-xj| over all ordered pairs == 2Σ(2i-n+1)x(i)
    rng = np.random.default_rng(4)
    for _ in range(20):
        x = rng.integers(0, 50, rng.integers(1, 40))
        c = np.sort(x.astype(np.int64))
        n = len(c)
        i = np.arange(n)
        fast = 2 * int(((2 * i - n + 1) * c).sum())
        brute = int(np.abs(x[:, None] - x[None, :]).sum())
        assert fast == brute


def test_mk_stats_shared_core():
    from geoflow.ops.timeseries import mk_stats
    v = np.array([1, 2, 2, 3], np.int64)
    s, var18 = mk_stats(v)
    assert (s, var18) == (5, 138)
    # antitone series: S = -C(n,2) with distinct values
    v = np.arange(10, 0, -1)
    s, var18 = mk_stats(v)
    assert s == -45 and var18 == 10 * 9 * 25


def test_count_substring_matches_replace_identity():
    # both engines count NON-overlapping occurrences
    arr = pa.array(["aaa", "aaaa", "abab", ""])
    assert pc.count_substring(arr, "aa").to_pylist() == [1, 2, 0, 0]


def test_streak_islands():
    days = np.array([3, 4, 5, 9, 10, 20], np.int64)
    start = np.flatnonzero(np.r_[True, np.diff(days) != 1])
    lens = np.diff(np.r_[start, len(days)])
    assert lens.tolist() == [3, 2, 1]


def test_quadkey_vector():
    from geoflow.cells.tiles import tiles_to_quadkey
    assert tiles_to_quadkey([3], [5], 3)[0] == "213"


def test_hrw_shard_stability_under_growth():
    # ADDING a shard only pulls keys INTO the new shard
    from geoflow.ops.sampling import hrw_shard
    k = np.arange(3000, dtype=np.int64)
    a = hrw_shard(k, 9)
    b = hrw_shard(k, 10)
    moved = a != b
    assert (b[moved] == 9).all()
