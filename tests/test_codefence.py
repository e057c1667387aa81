"""Fenced-code extraction (text/codefence.py). Driver gate: the
planted `code_fences` query; here: parse semantics on hand-built
markdown — closed/unclosed/inline/no-newline fences and ordering."""

import pyarrow as pa
import ray.data

from geoflow.text.codefence import extract_code_fences


def _run(texts):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    df = extract_code_fences(ds).to_pandas()
    if len(df) == 0:   # Ray 2.49 to_pandas drops columns on 0 rows
        return []
    return [(r.doc_id, r.fence_idx, r.lang, r.code)
            for r in df.sort_values(["doc_id", "fence_idx"])
                       .itertuples()]


def test_basic_fence_and_order():
    got = _run(["pre\n```py\na=1\nb=2\n```\nmid\n```\nraw\n```\npost"])
    assert got == [(0, 0, "py", "a=1\nb=2\n"),
                   (0, 1, "", "raw\n")]


def test_unterminated_fence_dropped():
    got = _run(["x\n```lost\nnever closed", "ok ```a\nc\n``` end"])
    assert got == [(1, 0, "a", "c\n")]


def test_inline_fence_no_newline():
    # ```abc``` : info string only, empty code
    got = _run(["t ```abc``` t"])
    assert got == [(0, 0, "abc", "")]


def test_no_fences_and_empty_doc():
    assert _run(["plain `tick` text", ""]) == []


def test_adjacent_fences():
    got = _run(["```a\n1\n``````b\n2\n```"])
    # split: ['', 'a\n1\n', '', 'b\n2\n', ''] -> fences at 1 and 3
    assert got == [(0, 0, "a", "1\n"), (0, 1, "b", "2\n")]
