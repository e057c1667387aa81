"""Sitemap protocol parsing — text/sitemap.py."""
import pyarrow as pa

from geoflow.text.sitemap import parse_sitemap_batch


def _parse(xmls, ids=None):
    ids = list(range(len(xmls))) if ids is None else ids
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "xml": pa.array(xmls, pa.string())})
    return parse_sitemap_batch(t)


def test_urlset_fields_any_order_and_entities():
    out = _parse(["""<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
 <url><loc>https://a.com/p?x=1&amp;y=&lt;2&gt;</loc>
      <lastmod>2024-01-05</lastmod><priority>0.8</priority></url>
 <url><priority>0.3</priority><loc> https://a.com/q </loc>
      <changefreq>daily</changefreq></url>
 <url><loc>https://a.com/r</loc></url>
</urlset>"""])
    rows = out.to_pylist()
    assert [r["loc"] for r in rows] == [
        "https://a.com/p?x=1&y=<2>", "https://a.com/q",
        "https://a.com/r"]
    assert [r["lastmod"] for r in rows] == ["2024-01-05", None, None]
    assert [r["priority"] for r in rows] == [0.8, 0.3, None]
    assert [r["changefreq"] for r in rows] == [None, "daily", None]
    assert all(r["kind"] == "url" for r in rows)


def test_sitemapindex_and_non_sitemap_docs():
    out = _parse([
        "<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc>"
        "</sitemap><sitemap><loc>https://a.com/s2.xml</loc>"
        "</sitemap></sitemapindex>",
        "<html>not a sitemap</html>",
    ])
    rows = out.to_pylist()
    assert len(rows) == 2
    assert {r["loc"] for r in rows} == {"https://a.com/s1.xml",
                                        "https://a.com/s2.xml"}
    assert all(r["kind"] == "sitemap" and r["doc_id"] == 0
               for r in rows)


def test_truncated_entry_skipped():
    out = _parse(["<urlset><url><loc>https://ok.com/1</loc></url>"
                  "<url><loc>https://truncated.com/2</loc>"])
    assert out.to_pylist()[0]["loc"] == "https://ok.com/1"
    assert out.num_rows == 1


def test_entry_without_loc_skipped_and_empty_output_schema():
    out = _parse(["<urlset><url><lastmod>2024-01-01</lastmod></url>"
                  "</urlset>"])
    assert out.num_rows == 0
    assert out.schema.names == ["doc_id", "kind", "loc", "lastmod",
                                "changefreq", "priority"]
    assert out.schema.field("priority").type == pa.float64()


def test_case_insensitive_tags_multiline():
    out = _parse(["<URLSET><URL>\n<LOC>\nhttps://a.com/x\n</LOC>\n"
                  "</URL></URLSET>"])
    assert out.to_pylist()[0]["loc"] == "https://a.com/x"


class TestHtmlMeta:
    """extract_meta_batch (text/htmlmeta.py)."""

    def _meta(self, htmls):
        from geoflow.text.htmlmeta import extract_meta_batch
        t = pa.table({"doc_id": list(range(len(htmls))),
                      "html": pa.array(htmls, pa.string())})
        return extract_meta_batch(t).to_pylist()

    def test_fields_orders_entities_decoys(self):
        rows = self._meta([
            '<head><meta name="keywords" content="decoy">'
            '<title> A &amp; &lt;B&gt; </title>'
            '<meta name="description" content="d one">'
            '<link rel="canonical" href="https://c/1">'
            '<meta name="robots" content="NOINDEX, nofollow"></head>'
            '<body><title>body decoy</title></body>',
            '<head><meta content="rev" name="description">'
            '<link href="https://c/2" rel="canonical"></head>',
            '<p>nothing</p>',
        ])
        assert rows[0]["title"] == "A & <B>"
        assert rows[0]["description"] == "d one"
        assert rows[0]["canonical"] == "https://c/1"
        assert rows[0]["noindex"] and rows[0]["nofollow"]
        assert rows[1]["description"] == "rev"
        assert rows[1]["canonical"] == "https://c/2"
        assert not rows[1]["noindex"] and not rows[1]["nofollow"]
        assert rows[2]["title"] is None
        assert rows[2]["robots_meta"] is None

    def test_noindex_word_boundary(self):
        rows = self._meta([
            '<meta name="robots" content="no-noindexing here">'])
        # 'noindexing' must not trip the \bnoindex\b flag
        assert rows[0]["noindex"] is False


class TestFeeds:
    """parse_feed_batch (text/feeds.py)."""

    def _parse(self, xmls):
        from geoflow.text.feeds import parse_feed_batch
        t = pa.table({"doc_id": list(range(len(xmls))),
                      "xml": pa.array(xmls, pa.string())})
        return parse_feed_batch(t).to_pylist()

    def test_rss_items_channel_decoys_entities(self):
        rows = self._parse(["""<?xml version="1.0"?>
<rss version="2.0"><channel><title>Chan decoy</title>
<link>https://site/decoy</link>
<item><title>Post &amp; one</title><link>https://site/p1</link>
<pubDate>Mon, 01 Jan 2024</pubDate></item>
<item><link>https://site/p2</link></item>
<item><title>no link skipped</title></item>
</channel></rss>"""])
        assert [(r["link"], r["title"], r["updated"]) for r in rows] \
            == [("https://site/p1", "Post & one", "Mon, 01 Jan 2024"),
                ("https://site/p2", None, None)]
        assert all(r["kind"] == "rss" for r in rows)

    def test_atom_entries_and_feed_decoys(self):
        rows = self._parse(["""<feed xmlns="http://www.w3.org/2005/Atom">
<title>Feed decoy</title><link href="https://site/self" rel="self"/>
<entry><title>A1</title><link rel="alternate"
 href="https://site/a1"/><updated>2024-02-03T00:00:00Z</updated></entry>
<entry><link href="https://site/a2"/></entry>
</feed>"""])
        assert [(r["kind"], r["link"], r["title"], r["updated"])
                for r in rows] == \
            [("atom", "https://site/a1", "A1", "2024-02-03T00:00:00Z"),
             ("atom", "https://site/a2", None, None)]

    def test_non_feed_vanishes_with_schema(self):
        from geoflow.text.feeds import parse_feed_batch
        t = pa.table({"doc_id": [9], "xml": ["<html>page</html>"]})
        out = parse_feed_batch(t)
        assert out.num_rows == 0
        assert out.schema.names == ["doc_id", "kind", "link",
                                    "title", "updated"]
