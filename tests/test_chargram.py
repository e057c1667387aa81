"""Character trigram profiles (geoflow/text/chargram.py)."""
from collections import Counter

import pyarrow as pa
import ray.data

from geoflow.text.chargram import char_trigram_profiles


def _brute(rows, k=10):
    per_lang = {}
    for lang, text in rows:
        c = per_lang.setdefault(lang, Counter())
        for i in range(len(text) - 2):
            c[text[i:i + 3]] += 1
    out = {}
    for lang, c in per_lang.items():
        if not c:
            continue                      # no grams -> no profile row
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[lang] = [(g, n, i + 1) for i, (g, n) in enumerate(ranked)]
    return out


def test_profiles_match_brute(ray_session):
    rows = [("en", "the cat sat on the mat"),
            ("en", "the hat and the bat"),
            ("de", "der die das der die"),
            ("de", "die der"),
            ("xx", "ab")]                     # too short -> no grams
    ds = ray.data.from_arrow(pa.table({
        "lang": pa.array([r[0] for r in rows]),
        "text": pa.array([r[1] for r in rows])}))
    df = char_trigram_profiles(ds, k=10).to_pandas()
    got = {}
    for r in df.itertuples():
        got.setdefault(r.lang, []).append((r.gram, r.cnt, r.rk))
    for lang in got:
        got[lang].sort(key=lambda t: t[2])
    want = _brute(rows)
    assert got == want
    assert "xx" not in got


def test_no_cross_document_windows(ray_session):
    # "ab"+"cd" must NOT produce "abc"/"bcd"
    ds = ray.data.from_arrow(pa.table({
        "lang": pa.array(["en", "en"]),
        "text": pa.array(["abz", "cdz"])}))
    df = char_trigram_profiles(ds, k=10).to_pandas()
    assert set(df.gram) == {"abz", "cdz"}
