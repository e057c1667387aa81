"""PerceptualHash stage (geoflow/media/stages.py): dHash/aHash with
exact cross-multiplied integer cell means. Driver gate is the
`image_phash` oracle query (planted block-constant PNGs); these tests
pin the bit layout and the brightness/contrast invariances the
cross-multiplication design guarantees."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.media import PerceptualHash


def _hash(imgs):
    """imgs: list of HxWxC uint8 arrays."""
    t = pa.table({
        "key": pa.array(np.arange(len(imgs), dtype=np.int64)),
        "pixels": pa.array([a.tobytes() for a in imgs], pa.binary()),
        "width": pa.array([a.shape[1] for a in imgs], pa.int32()),
        "height": pa.array([a.shape[0] for a in imgs], pa.int32()),
        "channels": pa.array([a.shape[2] for a in imgs], pa.int32())})
    out = PerceptualHash()(t)
    return (out.column("dhash").to_pylist(),
            out.column("ahash").to_pylist())


def _img(fn, h=64, w=72, c=1):
    y, x = np.mgrid[0:h, 0:w]
    return fn(x, y).astype(np.uint8).reshape(h, w, 1).repeat(c, 2)


def test_block_constant_bits_exact():
    # blocks (bx, by) of 8x8 px with value (7*bx + 13*by) % 251
    img = _img(lambda x, y: (7 * (x // 8) + 13 * (y // 8)) % 251)
    dh, ah = _hash([img])
    # expected: bit (y,x) = v(x,y) > v(x+1,y)
    exp = 0
    for y in range(8):
        for x in range(8):
            if (7 * x + 13 * y) % 251 > (7 * (x + 1) + 13 * y) % 251:
                exp |= 1 << (y * 8 + x)
    exp = np.uint64(exp).astype(np.int64)
    assert dh[0] == exp


def test_brightness_invariance():
    base = _img(lambda x, y: (x * 3 + y * 5) % 200)
    brighter = np.clip(base.astype(np.int64) + 40, 0, 255) \
        .astype(np.uint8)
    (d0, d1), (a0, a1) = _hash([base, brighter])
    assert d0 == d1 and a0 == a1


def test_identical_images_same_hash():
    img = _img(lambda x, y: (x * x + 3 * y) % 251)
    dh, ah = _hash([img, img.copy()])
    assert dh[0] == dh[1] and ah[0] == ah[1]


def test_different_images_differ():
    a = _img(lambda x, y: x * 2)        # increasing left->right
    b = _img(lambda x, y: 200 - x * 2)  # strictly decreasing
    dh, _ = _hash([a, b])
    assert dh[0] != dh[1]
    # monotone rows: all 64 dhash bits clear / set respectively
    assert dh[0] == 0
    assert np.uint64(dh[1]) == np.uint64(0xFFFFFFFFFFFFFFFF)


def test_rgb_channel_sum_matches_gray():
    g = _img(lambda x, y: (x * 7 + y * 11) % 251)
    rgb = g.repeat(3, axis=2)
    (d0, d1), (a0, a1) = _hash([g, rgb])
    assert d0 == d1 and a0 == a1


def test_non_divisible_dims_exact():
    # 50x37 image: ragged cells exercise the cross-multiply path
    img = _img(lambda x, y: (x * 5 + y * 3) % 251, h=50, w=37)
    dh, ah = _hash([img, img.copy()])
    assert dh[0] == dh[1] and ah[0] == ah[1]


def test_tiny_image_zero_hash():
    img = _img(lambda x, y: x + y, h=4, w=4)
    dh, ah = _hash([img])
    assert dh[0] == 0 and ah[0] == 0
