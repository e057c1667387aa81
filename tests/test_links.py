"""Link (anchor) extraction — text/links.py."""
import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from geoflow.text.links import LINK_RE_SQL, extract_links_batch, href_host


def _extract(htmls, ids=None):
    ids = list(range(len(htmls))) if ids is None else ids
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "html": pa.array(htmls, type=pa.string())})
    out = extract_links_batch(t)
    return list(zip(out.column("doc_id").to_pylist(),
                    out.column("href").to_pylist(),
                    out.column("anchor").to_pylist()))


class TestExtract:
    def test_basic_and_multiple(self):
        rows = _extract([
            '<p>no links</p>',
            'x <a href="https://a.com/1">One</a> y '
            '<a href="https://b.com/2">Two words</a> z',
        ])
        assert rows == [(1, "https://a.com/1", "One"),
                        (1, "https://b.com/2", "Two words")]

    def test_case_attrs_multiline(self):
        rows = _extract([
            '<A CLASS="z" HREF="https://c.com/" rel=nofollow>Caps\n'
            'two lines</A> <a data-x="1" href="https://d.com">d</a>'])
        assert rows == [(0, "https://c.com/", "Caps\ntwo lines"),
                        (0, "https://d.com", "d")]

    def test_skips_hrefless_unclosed_and_nulls(self):
        rows = _extract([
            '<a name="anchor">not a link</a>',
            '<a href="https://e.com">unclosed before <a '
            'href="https://f.com">ok</a>',
            None])
        # the unclosed first anchor is dropped, the following one kept
        assert rows == [(1, "https://f.com", "ok")]

    def test_key_passthrough_multi(self):
        t = pa.table({"doc_id": pa.array([7], type=pa.int64()),
                      "url": ["https://src.com"],
                      "html": ['<a href="https://t.com">t</a>']})
        out = extract_links_batch(t, key_cols=("doc_id", "url"))
        assert out.column("url").to_pylist() == ["https://src.com"]
        assert out.column("doc_id").to_pylist() == [7]

    def test_sql_mirror_parity(self):
        """Fragment-scan == DuckDB whole-document regexp_extract_all
        (both RE2) on non-nested anchors, junk included."""
        htmls = [
            '<html><a name="d">decoy</a><p><a href="https://h0.com/p">'
            'L0</a><A HREF="https://h1.com">L 1</A></p></html>',
            'plain text, no anchors at all',
            '<a href="">empty href</a><a href="https://h2.com/x?q=1#f">'
            'q</a>',
            '<a\nhref="https://nl.com">newline in tag</a>',
        ]
        got = _extract(htmls)
        con = duckdb.connect()
        con.execute("CREATE TABLE t(i BIGINT, html VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)",
                        list(enumerate(htmls)))
        want = con.execute(f"""
            SELECT i,
                unnest(regexp_extract_all(html, '{LINK_RE_SQL}', 1)),
                unnest(regexp_extract_all(html, '{LINK_RE_SQL}', 2))
            FROM t ORDER BY i""").fetchall()
        assert got == [tuple(r) for r in want]

    def test_empty_batch(self):
        out = extract_links_batch(
            pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "html": pa.array([], type=pa.string())}))
        assert out.num_rows == 0
        assert out.column_names == ["doc_id", "href", "anchor"]


class TestHrefHost:
    def test_hosts(self):
        h = href_host(pa.array([
            "https://Www.Ex.com/p?q=1", "http://h:8080/x",
            "ftp://files.org", "/relative/path", "mailto:a@b.c",
            "javascript:void(0)", None]))
        assert h.to_pylist() == [
            "Www.Ex.com", "h", "files.org", None, None, None, None]
        # mailto has no '//' so no host — documented

    def test_agg_shape(self):
        t = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                      "html": pa.array(
                          ['<a href="https://x.com/a">a</a>'
                           '<a href="https://x.com/b">bb</a>'])})
        out = extract_links_batch(t)
        host = href_host(out.column("href"))
        assert pc.unique(host).to_pylist() == ["x.com"]
        assert pc.sum(pc.utf8_length(out.column("anchor"))).as_py() == 3


class TestNestedDivergence:
    def test_inner_anchor_wins_documented(self):
        # documented contract: nested (invalid) anchors — the inner
        # one is extracted; the outer, lacking a close before the next
        # '<a', is dropped.
        rows = _extract(['<a href="https://outer.com">o '
                         '<a href="https://inner.com">i</a></a>'])
        assert rows == [(0, "https://inner.com", "i")]
