"""_sql_mix64_chain (__ray_entry__.py): the DuckDB splitmix64 twin
must stay bit-exact vs text/hashing.mix64 — the hll_registers and
cms_counters oracles are generated from it."""

import importlib.util
import os
import sys

import duckdb
import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry():
    spec = importlib.util.spec_from_file_location(
        "entry_for_mix64", os.path.join(_ROOT, "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    sys.path.insert(0, _ROOT)
    spec.loader.exec_module(m)
    return m


def test_sql_mix64_bit_exact_vs_numpy():
    from geoflow.text.hashing import mix64
    m = _entry()
    rng = np.random.default_rng(20260819)
    vals = np.concatenate([
        np.array([0, 1, 2, 2**31, 2**32 - 1, 2**32, 2**62 + 12345,
                  2**63 - 1], dtype=np.uint64),
        rng.integers(0, 2**63, 64, dtype=np.int64).view(np.uint64),
        # top-bit-set inputs (arrive as negative int64 in a table)
        rng.integers(2**63, 2**64, 16, dtype=np.uint64),
    ])
    expect = mix64(vals)
    con = duckdb.connect()
    lits = ", ".join(str(int(v)) for v in vals)
    src = (f"(SELECT CASE WHEN x < 0 THEN CAST(x AS HUGEINT) "
           f"+ {m._SQL_U64} ELSE CAST(x AS HUGEINT) END AS u, x "
           f"FROM (SELECT unnest([{lits}]::HUGEINT[]) AS x) raw) t")
    sql = m._sql_mix64_chain(src, "u", "h", ("x",))
    got = {int(r[0]): int(r[1]) for r in con.execute(sql).fetchall()}
    for v, e in zip(vals, expect):
        assert got[int(v)] == int(e), v


def test_sql_mix64_carry_columns_pass_through():
    m = _entry()
    con = duckdb.connect()
    sql = m._sql_mix64_chain(
        "(SELECT 7 AS u, 'tag' AS label, 42 AS extra) s",
        "u", "hh", ("label", "extra"))
    row = con.execute(sql).fetchone()
    from geoflow.text.hashing import mix64
    exp = int(mix64(np.array([7], np.uint64))[0])
    assert row == ("tag", 42, exp)
