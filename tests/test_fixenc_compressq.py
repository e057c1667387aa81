"""Mojibake repair (geoflow/text/fixenc.py) + compression-ratio
quality signal (text/analysis.compression_ratio_batch). Driver gates
are the `mojibake_fix` and `compress_quality` oracle queries; these
tests pin repair semantics per codec and the ratio-class margins."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.text.analysis import (compression_filter,
                                   compression_ratio_batch)
from geoflow.text.fixenc import _try_fix, fix_mojibake_batch


def _fix(texts):
    t = pa.table({"doc_id": np.arange(len(texts), dtype=np.int64),
                  "text": texts})
    out = fix_mojibake_batch(t)
    return (out.column("text_fixed").to_pylist(),
            out.column("fixed").to_pylist(),
            out.column("enc").to_pylist())


def test_latin1_mojibake_repaired():
    orig = "café déjà vu"
    moji = orig.encode("utf-8").decode("latin-1")
    fixed, flag, enc = _fix([moji])
    assert fixed == [orig] and flag == [1] and enc == ["latin-1"]


def test_cp1252_mojibake_repaired():
    # NB chars whose UTF-8 bytes avoid cp1252's undefined slots
    # (0x81/0x8D/0x8F/0x90/0x9D): ” (…9D) would not strictly decode
    orig = "café – “it’s €5 résumé"
    moji = orig.encode("utf-8").decode("cp1252")
    fixed, flag, enc = _fix([moji])
    assert fixed == [orig] and flag == [1] and enc == ["cp1252"]


def test_ascii_untouched():
    fixed, flag, enc = _fix(["plain ascii text 42"])
    assert fixed == ["plain ascii text 42"] and flag == [0]


def test_genuine_accents_untouched():
    # real accented text re-encodes to invalid UTF-8 -> not flagged
    fixed, flag, enc = _fix(["naïve résumé ok"])
    assert fixed == ["naïve résumé ok"] and flag == [0]


def test_null_text():
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array([None], pa.string())})
    out = fix_mojibake_batch(t)
    assert out.column("fixed").to_pylist() == [0]


def test_double_encoded_repairs_one_layer():
    orig = "é"
    once = orig.encode("utf-8").decode("latin-1")
    twice = once.encode("utf-8").decode("latin-1")
    fixed, flag, enc = _fix([twice])
    assert fixed == [once] and flag == [1]


def test_compression_ratio_classes():
    rep = "ab " * 100
    rnd = "kq9f3zx7 " + "".join(
        format((i * 2654435761) % 2**32, "08x") for i in range(16))
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": [rep, rnd]})
    out = compression_ratio_batch(t)
    r = out.column("compress_ratio").to_numpy(zero_copy_only=False)
    assert r[0] < 0.25 and r[1] > 0.5
    nb = out.column("n_bytes").to_pylist()
    assert nb[0] == len(rep.encode()) and nb[1] == len(rnd.encode())


def test_compression_filter(ray_session):
    import ray
    words = ("time year people way day man thing woman life child "
             "world school state family student group country problem "
             "hand part place case week company system program "
             "question work government number night point home water "
             "room mother area money story fact month lot right study "
             "book eye job word business issue side kind head house "
             "service friend father power hour game line end member "
             "law car city community name").split()
    natural = " ".join(
        words[((i * i * 2654435761 + i * 97 + 13) >> 7) % len(words)]
        for i in range(220))  # ~1.3 KB, zlib ratio ~0.40
    texts = ["xy " * 120,  # ~0.04: repetitive boilerplate
             natural,
             "".join(format((i * 40503 + 7) * 2654435761 % 2**32,
                            "08x") for i in range(64))]  # ~0.7 junk
    ds = ray.data.from_arrow(pa.table({
        "doc_id": np.arange(3, dtype=np.int64), "text": texts}))
    kept = compression_filter(ds, lo=0.25, hi=0.5).to_pandas()
    assert kept["doc_id"].tolist() == [1]


def test_utf8_multibyte_length():
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": ["é€"]})
    out = compression_ratio_batch(t)
    assert out.column("n_bytes").to_pylist() == [5]  # 2 + 3 bytes
