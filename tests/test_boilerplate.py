"""Per-host boilerplate removal — text/boilerplate.py."""
import numpy as np
import pyarrow as pa

from geoflow.text.boilerplate import (host_boilerplate_dedup,
                                      host_boilerplate_keys,
                                      strip_host_boilerplate)


def _ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.Table.from_pylist(rows)).materialize()


def _clean(rows, **kw):
    out = host_boilerplate_dedup(_ds(rows), **kw).take_all()
    return {r["doc_id"]: r["text_clean"] for r in out}


def test_host_conditional_not_global(ray_session):
    # 'menu' is in EVERY doc of host a (dropped there) but only one
    # doc of host b (kept there) — a global count would drop both.
    rows = [
        {"doc_id": 0, "host": "a", "text": "menu\nalpha 0"},
        {"doc_id": 1, "host": "a", "text": "menu\nalpha 1"},
        {"doc_id": 2, "host": "b", "text": "menu\nbeta 2"},
        {"doc_id": 3, "host": "b", "text": "beta 3"},
        {"doc_id": 4, "host": "b", "text": "beta 4"},
    ]
    got = _clean(rows)
    assert got[0] == "alpha 0" and got[1] == "alpha 1"
    assert got[2] == "menu\nbeta 2"


def test_fraction_boundary(ray_session):
    # 2*c >= n: c=2 of n=4 drops (2*2>=4); c=2 of n=5 keeps.
    rows4 = [{"doc_id": i, "host": "h",
              "text": ("ad\n" if i < 2 else "") + f"u {i}"}
             for i in range(4)]
    got = _clean(rows4)
    assert got[0] == "u 0" and got[3] == "u 3"
    rows5 = [{"doc_id": i, "host": "h",
              "text": ("ad\n" if i < 2 else "") + f"u {i}"}
             for i in range(5)]
    got = _clean(rows5)
    assert got[0] == "ad\nu 0"


def test_min_count_protects_single_doc_hosts(ray_session):
    rows = [{"doc_id": 0, "host": "solo", "text": "nav\nbody"}]
    got = _clean(rows)
    assert got[0] == "nav\nbody"   # c=1 < min_count=2


def test_trim_identity_and_empty_lines(ray_session):
    # identity is trimmed form; empty lines never dropped
    rows = [
        {"doc_id": 0, "host": "h", "text": "  nav \n\nbody 0"},
        {"doc_id": 1, "host": "h", "text": "nav\n\nbody 1"},
    ]
    got = _clean(rows)
    assert got[0] == "\nbody 0"
    assert got[1] == "\nbody 1"


def test_all_lines_dropped_doc_disappears(ray_session):
    rows = [
        {"doc_id": 0, "host": "h", "text": "nav"},
        {"doc_id": 1, "host": "h", "text": "nav"},
        {"doc_id": 2, "host": "h", "text": "nav\nkeep me"},
    ]
    got = _clean(rows)
    assert set(got) == {2} and got[2] == "keep me"


def test_custom_frac_and_separator(ray_session):
    # frac=(1,4): 2 of 8 docs is enough to drop (2*4 >= 8*1), which
    # the default 1/2 rule would keep; paragraphs via sep="\n\n"
    rows = [{"doc_id": i, "host": "h",
             "text": ("promo para" + "\n\n" if i < 2 else "")
             + f"unique {i}"} for i in range(8)]
    ref = host_boilerplate_keys(_ds(rows), frac=(1, 4), sep="\n\n")
    out = strip_host_boilerplate(_ds(rows), ref, sep="\n\n").take_all()
    got = {r["doc_id"]: r["text_clean"] for r in out}
    assert got[0] == "unique 0" and got[7] == "unique 7"
    # default 1/2 keeps it (2*2 < 8)
    got2 = _clean(rows)
    assert got2[0] == "promo para\n\nunique 0"


def test_keys_empty_when_nothing_repeats(ray_session):
    import ray
    rows = [{"doc_id": i, "host": f"h{i}", "text": f"only {i}"}
            for i in range(6)]
    arr = ray.get(host_boilerplate_keys(_ds(rows)))
    assert isinstance(arr, np.ndarray) and len(arr) == 0
