"""Soundex (geoflow/text/phonetic.py) — published vectors + rule
edge cases + a reference-implementation fuzz."""
import numpy as np

from geoflow.text.phonetic import soundex

VECTORS = {
    # NARA / Knuth classics
    "Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
    "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
    "Honeyman": "H555", "Washington": "W252", "Lee": "L000",
    "Gutierrez": "G362", "Jackson": "J250", "VanDeusen": "V532",
}


def test_published_vectors():
    got = soundex(np.array(list(VECTORS), dtype=str))
    assert dict(zip(VECTORS, got)) == VECTORS


def _ref_soundex(name: str) -> str:
    """Straight-line reference implementation of the NARA rules."""
    letters = [c for c in name.lower() if c.isalpha()]
    if not letters:
        return ""
    table = {}
    for grp, c in (("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
                   ("l", "4"), ("mn", "5"), ("r", "6")):
        for ch in grp:
            table[ch] = c
    first = letters[0]
    prev = table.get(first)                 # None for vowels/h/w
    if first in "hw":
        prev = None
    digits = []
    for ch in letters[1:]:
        if ch in "hw":
            continue                        # transparent
        c = table.get(ch)
        if c is None:                       # vowel separates
            prev = None
        else:
            if c != prev:
                digits.append(c)
            prev = c
    return (first.upper() + "".join(digits[:3])).ljust(4, "0")


def test_fuzz_vs_reference():
    rng = np.random.default_rng(3)
    alph = list("abcdefghijklmnopqrstuvwxyz")
    names = ["".join(rng.choice(alph, int(rng.integers(1, 12))))
             for _ in range(500)]
    got = soundex(np.array(names, dtype=str))
    for nm, g in zip(names, got):
        assert g == _ref_soundex(nm), nm


def test_empty_and_case():
    got = soundex(np.array(["", "ROBERT", "robert"], dtype=str))
    assert got.tolist() == ["", "R163", "R163"]
